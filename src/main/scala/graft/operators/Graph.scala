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

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** [[connectedComponentsWithStatus]]'s result: the (id, comp) frame
    * (localCheckpoint-backed — call [[CCResult.release]] when done), whether
    * the fixpoint was reached, and how many supersteps ran. An unconverged
    * result is a SOUND under-approximation (every label is the min over some
    * reachable subset, so clusters may be split, never wrongly merged).
    */
  final case class CCResult(components: DataFrame, converged: Boolean, iters: Int) {
    /** Free the checkpoint blocks backing `components` (Dataset.unpersist
      * cannot: localCheckpoint persistence lives at the RDD level, outside
      * the CacheManager).
      */
    def release(): Unit = releaseCheckpoint(components)
  }

  /** Unpersist the RDD behind a localCheckpoint-backed frame (no-op for any
    * other plan shape — memory hygiene degrades gracefully, correctness
    * never depends on it).
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }

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
    * ever needed. The cutoff is OBSERVABLE, not silent (round-5 advice):
    * the returned [[CCResult]] carries `converged`/`iters`, so callers can
    * warn, retry wider, or fail.
    *
    * Each superstep `localCheckpoint`s its result (round 5): a superstep
    * references the previous labels twice (messages ∪ self), so carrying
    * lineage forward DOUBLES both the logical plan and the RDD dependency
    * graph per superstep — at ~30 supersteps (a diameter-30 component)
    * plan analysis explodes as 2^30 and task serialization overflows the
    * stack, even though execution would hit the cache. localCheckpoint
    * truncates BOTH (constant-size plan and dependency graph per step);
    * the previous superstep's blocks are released as soon as the next is
    * materialized. The trade is the standard iterative-graph one (GraphX
    * checkpointing): recovery of a lost executor's checkpoint blocks
    * re-runs the job instead of recomputing lineage.
    */
  def connectedComponentsWithStatus(
      edges: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 20): CCResult = {
    val spark = edges.sparkSession
    val e = edges.select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("d"))
    // symmetrize once; both directions are needed so min labels flow both ways
    val und = e.unionAll(e.select(col("d").as("s"), col("s").as("d")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // eager localCheckpoint: materializes AND truncates plan + RDD deps at
    // every superstep boundary (see scaladoc)
    var verts = und.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
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
      // the eager checkpoint's own materializing action fires the observation
      val next = msgs.unionByName(self)
        .groupBy("id")
        .agg(min("comp").as("comp"), min("old").as("old"))
        .observe(obs, coalesce(
          sum(when(col("comp") < col("old"), 1L).otherwise(0L)), lit(0L)).as("n_changed"))
        .select("id", "comp")
        .localCheckpoint(true)
      converged = obs.get("n_changed").asInstanceOf[Long] == 0L
      // release AFTER `next` is materialized: nothing recomputes
      releaseCheckpoint(verts)
      verts = next
      iter += 1
    }
    und.unpersist()
    CCResult(verts, converged, iter)
  }

  /** [[connectedComponentsWithStatus]] with the legacy DataFrame-only
    * surface; a maxIter cutoff is logged as a warning rather than returned.
    * The result is re-persisted through the CacheManager (one extra
    * vertex-sized pass) so the legacy contract — callers `unpersist()` when
    * done — keeps working now that the internal frames are
    * localCheckpoint-backed; plan-composing callers use
    * [[connectedComponentsWithStatus]] + [[CCResult.release]] directly.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 20): DataFrame = {
    val r = connectedComponentsWithStatus(edges, aCol, bCol, maxIter)
    if (!r.converged) log.warn(
      s"connectedComponents stopped at maxIter=$maxIter before the fixpoint; " +
        "labels are a sound under-approximation (clusters may be split)")
    val out = r.components.select(col("id"), col("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    r.release()
    out
  }

  /** Dedup clustering: near-dup pairs → connected components → one kept
    * representative (the min doc id) per cluster. Output per document that
    * appears in at least one pair: (doc_id, cluster_id, cluster_size,
    * keep) — `keep` marks the cluster representative; every other member
    * is a near-duplicate to drop. This is the operator a training-data
    * pipeline actually runs after MinHash/LSH: pair lists are not
    * actionable, keep/drop decisions are.
    *
    * Convergence surface (round-5 advice): `maxIter` is exposed; hitting it
    * logs a warning by default — the labels are then a sound
    * under-approximation (split clusters whose keep representative may be
    * missing or duplicated — a truncated min label needn't be a member of
    * the group it labels — but never a wrong merge) — or throws when
    * `requireConverged` is set.
    * The returned frame is PERSISTED and materialized here so the inner CC
    * cache can be dropped before returning (it was previously unreachable
    * for the session lifetime); callers unpersist the result when done,
    * the same contract as [[pagerankMicro]].
    */
  def dedupClusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIter: Int = 20, requireConverged: Boolean = false): DataFrame = {
    val r = connectedComponentsWithStatus(pairs, aCol, bCol, maxIter)
    if (!r.converged) {
      val msg = s"dedupClusters: connected components unconverged at maxIter=$maxIter — " +
        "cluster ids are a sound under-approximation (some clusters split; a split " +
        "cluster's keep representative may be missing or duplicated)"
      if (requireConverged) { r.release(); throw new IllegalStateException(msg) }
      log.warn(msg)
    }
    val cc = r.components
    val sizes = cc.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    val out = cc.join(sizes, Seq("comp"))
      .select(
        col("id").as("doc_id"),
        col("comp").as("cluster_id"),
        col("cluster_size"),
        (col("id") === col("comp")).as("keep"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    r.release()
    out
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
