package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives the crawl/data pipeline needs at corpus
  * scale: connected components (dedup pair-clustering — the step AFTER
  * MinHash/SimHash pair generation that turns near-dup PAIRS into dedup
  * CLUSTERS with one kept representative) and fixed-iteration PageRank (the
  * batch companion of the crawler's online OPIC score, A3).
  *
  * Both are expressed as iterated Catalyst plans — equi-join + hash
  * aggregation per superstep, the only shapes that survive at 10^10 edges —
  * never as driver-side graph walks. No RDDs, no collect of vertex data.
  */
object Graph {

  /** Connected components over an undirected edge list via hash-min label
    * propagation: every vertex starts as its own component and each
    * superstep takes the min component id over itself and its neighbors,
    * until a fixpoint (no label changed) or `maxIter`.
    *
    * Input: two columns (`aCol`, `bCol`) of long vertex ids, one row per
    * (unordered) edge. Output: (id BIGINT, comp BIGINT) — `comp` is the
    * minimum vertex id reachable from `id`; vertices are the edge
    * endpoints (isolated vertices have no edges to carry them here and
    * trivially form singleton components upstream).
    *
    * Scale shape: each superstep is one shuffled equi-join (messages along
    * edges) plus one hash aggregation (min per vertex) — map-side partial
    * mins bound the exchange. Convergence is detected WITHOUT an extra
    * pass: the changed-label count rides the superstep's own materializing
    * action via `Dataset.observe` (each superstep observes its own fresh
    * Observation, so the one-action-per-observation rule holds). Hash-min
    * converges in O(component diameter) supersteps — near-dup clusters are
    * shallow (stars around a popular document), so the practical bound is
    * small; a pathological chain is cut off by `maxIter` with the labels
    * still a sound (if unconverged) under-approximation, and the
    * large-star/small-star variant (Kiveris et al., "Connected Components
    * in MapReduce") is the drop-in upgrade if O(log²) worst-case bounds are
    * ever needed. Each superstep's result is persisted and the previous
    * one unpersisted, so lineage never recomputes an earlier superstep.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("d"))
    // symmetrize once; both directions are needed so min labels flow both ways
    val und = e.unionAll(e.select(col("d").as("s"), col("s").as("d")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var verts = und.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    verts.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor messages ∪ self; min(comp) per vertex. The self row also
      // carries the previous label so "changed" is computable in the same
      // aggregation (min over at most one non-null old value per id).
      val msgs = und.join(verts, und("s") === verts("id"))
        .select(col("d").as("id"), col("comp"), lit(null).cast("long").as("old"))
      val self = verts.select(col("id"), col("comp"), col("comp").as("old"))
      val obs = new Observation(s"cc_iter_$iter")
      val next = msgs.unionByName(self)
        .groupBy("id")
        .agg(min("comp").as("comp"), min("old").as("old"))
        .observe(obs, coalesce(
          sum(when(col("comp") < col("old"), 1L).otherwise(0L)), lit(0L)).as("n_changed"))
        .select("id", "comp")
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      converged = obs.get("n_changed").asInstanceOf[Long] == 0L
      verts.unpersist()
      verts = next
      iter += 1
    }
    und.unpersist()
    verts
  }

  /** Dedup clustering: near-dup pairs → connected components → one kept
    * representative (the min doc id) per cluster. Output per document that
    * appears in at least one pair: (doc_id, cluster_id, cluster_size,
    * keep) — `keep` marks the cluster representative; every other member
    * is a near-duplicate to drop. This is the operator a training-data
    * pipeline actually runs after MinHash/LSH: pair lists are not
    * actionable, keep/drop decisions are.
    */
  def dedupClusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val sizes = cc.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, Seq("comp"))
      .select(
        col("id").as("doc_id"),
        col("comp").as("cluster_id"),
        col("cluster_size"),
        (col("id") === col("comp")).as("keep"))
  }

  /** Fixed-iteration PageRank over a directed edge list, in integer
    * micro-units (1e9 = total teleport-normalized mass 1.0) so the
    * per-vertex sums are order-exact — the same determinism move as the
    * engine's [SPEC-O1] `scoreKey` and the A3 OPIC oracle: a double sum
    * depends on accumulation order (hash-agg merge order here, DuckDB
    * thread scheduling there); long sums do not. Each edge contribution is
    * quantized ONCE (`round(damping * pr / outdeg)` as a long) and then
    * summed exactly.
    *
    * Semantics (deliberately oracle-expressible): pr₀ = round(1e9 / N) per
    * vertex; prₜ₊₁(v) = round((1-d)·1e9 / N) + Σ_{u→v} round(d · prₜ(u) /
    * outdeg(u)). Dangling vertices leak their damped mass (no
    * redistribution) — the classic simplified formulation, stated so the
    * DuckDB oracle can mirror it term for term.
    *
    * Scale shape: per iteration one equi-join of edges against the rank
    * table (shuffle on the source id) + one hash aggregation on the
    * destination id; the edge×outdeg table is computed once and persisted.
    * At cluster scale both sides would be pre-bucketed by the join key in
    * Iceberg, making each superstep shuffle-free on the edge side.
    */
  def pagerankMicro(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .distinct()
    val nodes = e.select(col("s").as("id")).unionAll(e.select(col("d").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val eDeg = e.join(e.groupBy("s").agg(count(lit(1)).as("od")), "s")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // both constants follow the exact double-expression the oracle uses:
    // (1-d) evaluated in IEEE double, then ×1e9, then /n, then half-up round
    val pr0 = math.round(1e9 / n)
    val teleport = math.round((1.0 - damping) * 1e9 / n)
    var pr = nodes.withColumn("pr", lit(pr0))
    for (_ <- 1 to iters) {
      val contribs = eDeg.join(pr, eDeg("s") === pr("id"))
        .select(col("d").as("id"),
          round(lit(damping) * col("pr") / col("od"), 0).cast("long").as("c"))
        .groupBy("id").agg(sum("c").as("inmass"))
      pr = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"), (lit(teleport) + coalesce(col("inmass"), lit(0L))).as("pr"))
    }
    // materialize the (vertex-sized) result, then drop the edge-sized
    // intermediates — otherwise nodes/eDeg cached blocks outlive the call
    // for the session lifetime (same discipline as connectedComponents; the
    // returned frame is persisted, callers unpersist it when done)
    val result = pr.select(col("id"), col("pr").as("pr_micro"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    nodes.unpersist()
    eDeg.unpersist()
    result
  }
}
