package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Graph-primitive correctness: connected components against an in-test
  * union-find reference on randomized graphs (plus convergence on shapes
  * that stress hash-min: chains, stars, rings), dedup clustering's
  * keep/size semantics, and PageRank against an in-test reference that
  * mirrors the micro-unit quantization exactly.
  */
class GraphSpec extends AnyFunSuite with SparkTestSession {

  /** Plain union-find reference (path compression, no ranks). */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are not guaranteed min under arbitrary union order — normalize
    val byRoot = parent.keys.toSeq.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  test("connectedComponents ≡ union-find on randomized graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 200 + trial * 100
      val edges = Seq.fill(n)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
        .filter { case (a, b) => a != b }
      val got = Graph.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ufComponents(edges)
      assert(got == want, s"trial $trial: ${got.size} vs ${want.size} vertices")
    }
  }

  test("connectedComponents converges on chains, stars and rings") {
    import spark.implicits._
    val chain = (0L until 15L).sliding(2).map(s => (s(0), s(1))).toSeq
    val star = (1L to 20L).map(i => (0L, i))
    val ring = (0L until 12L).map(i => (100L + i, 100L + (i + 1) % 12))
    val all = chain ++ star ++ ring
    val got = Graph.connectedComponents(all.toDF("a", "b"), maxIter = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ufComponents(all))
    // chain+star share vertex 0..: chain 0-14 and star 0-20 merge to comp 0
    assert((0L to 20L).forall(got(_) == 0L))
    assert((100L until 112L).forall(got(_) == 100L))
  }

  test("dedupClusters: one kept representative per cluster, correct sizes") {
    import spark.implicits._
    // components: {1,2,3} (triangle), {10,11} (pair), {20,21,22,23} (chain)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L))
    val rows = Graph.dedupClusters(pairs.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.keySet == Set(1L, 10L, 20L))
    assert(byCluster(1L).map(_._1).toSet == Set(1L, 2L, 3L))
    assert(byCluster(1L).forall(_._3 == 3L))
    assert(byCluster(20L).forall(_._3 == 4L))
    // exactly one keep per cluster, and it is the min id
    rows.foreach { case (id, comp, _, keep) => assert(keep == (id == comp)) }
    assert(rows.count(_._4) == 3)
  }

  test("connectedComponents maxIter cutoff is observable and sound (pathological chain)") {
    import spark.implicits._
    // a 30-vertex path has diameter 29; hash-min needs ~diameter supersteps,
    // so maxIter = 3 MUST cut off before the fixpoint
    val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val r = Graph.connectedComponentsWithStatus(chain.toDF("a", "b"), maxIter = 3)
    val got = r.components.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.release()
    assert(!r.converged && r.iters == 3)
    // sound under-approximation: every label is a real reachable vertex id
    // that is ≤ the vertex's own id (min over a subset), and labels are NOT
    // all 0 yet (the cutoff genuinely truncated propagation)
    assert(got.forall { case (id, comp) => comp <= id && comp >= 0L })
    assert(got.values.toSet.size > 1, "3 supersteps cannot finish a 29-diameter chain")
    // and with enough supersteps the same input converges to one component
    val full = Graph.connectedComponentsWithStatus(chain.toDF("a", "b"), maxIter = 64)
    assert(full.converged && full.iters < 64)
    assert(full.components.collect().forall(_.getLong(1) == 0L))
    full.release()
  }

  test("connectedComponentsStars ≡ hash-min ≡ union-find on randomized graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 150 + trial * 120
      val edges = Seq.fill(n)((rnd.nextInt(140).toLong, rnd.nextInt(140).toLong))
        .filter { case (a, b) => a != b }
      val r = Graph.connectedComponentsStars(edges.toDF("a", "b"))
      val got = r.components.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      r.release()
      assert(r.converged, s"trial $trial must converge")
      assert(got == ufComponents(edges), s"trial $trial")
    }
  }

  test("stars arm keeps self-loop-only vertices, matching the hash-min arm") {
    import spark.implicits._
    // vertex 5's only edge is (5,5); vertex 9 has a self-loop AND a real
    // edge — both arms must emit every edge endpoint, self-loops included
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 5L), (9L, 9L), (9L, 1L)).toDF("a", "b")
    val stars = Graph.connectedComponentsStars(edges)
    val hashmin = Graph.connectedComponentsWithStatus(edges)
    val s = stars.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hm = hashmin.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    stars.release(); hashmin.release()
    assert(s == hm, s"arms diverged: stars=$s hashmin=$hm")
    assert(s == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 9L -> 1L))
  }

  test("stars arm converges logarithmically where hash-min hits its iteration cap") {
    import spark.implicits._
    // a 200-vertex path: diameter 199 — hash-min at maxIter=20 MUST cut off,
    // the star rounds shortcut exponentially and finish in a handful
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val hm = Graph.connectedComponentsWithStatus(chain.toDF("a", "b"), maxIter = 20)
    hm.release()
    assert(!hm.converged, "hash-min cannot finish a 199-diameter chain in 20 supersteps")
    val st = Graph.connectedComponentsStars(chain.toDF("a", "b"), maxRounds = 20)
    val got = st.components.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    st.release()
    assert(st.converged, "star rounds must reach the fixpoint")
    assert(st.iters <= 10, s"star rounds should be ~log(diameter), got ${st.iters}")
    assert(got.size == 200 && got.values.forall(_ == 0L))
    // and an unconverged stars cutoff is flagged + sound, like hash-min
    val cut = Graph.connectedComponentsStars(chain.toDF("a", "b"), maxRounds = 1)
    val cutLabels = cut.components.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    cut.release()
    assert(!cut.converged && cut.iters == 1)
    assert(cutLabels.forall { case (id, comp) => comp <= id && comp >= 0L })
  }

  test("dedupClusters(algorithm = stars) matches the hash-min clustering") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L))
    val a = Graph.dedupClusters(pairs.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val b = Graph.dedupClusters(pairs.toDF("a", "b"), algorithm = "stars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Graph.dedupClusters(pairs.toDF("a", "b"), algorithm = "nope")
    }
  }

  test("dedupClusters surfaces non-convergence: warn-and-return or throw") {
    import spark.implicits._
    val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    // default: sound under-approximation returned — the one real component
    // is SPLIT into multiple cluster ids (note a split cluster's keep
    // representative can be missing entirely: the truncated min label
    // needn't be a member of the group it labels — e.g. cluster_id 1 here
    // holds vertex 4 only, while vertex 1 itself labels as 0)
    val rows = Graph.dedupClusters(chain.toDF("a", "b"), maxIter = 3)
    assert(rows.select("cluster_id").distinct().count() > 1,
      "a 3-superstep cutoff must leave a 29-diameter chain split")
    rows.unpersist()
    // strict: the cutoff throws
    val e = intercept[IllegalStateException] {
      Graph.dedupClusters(chain.toDF("a", "b"), maxIter = 3, requireConverged = true)
    }
    assert(e.getMessage.contains("unconverged"))
  }

  /** In-test PageRank reference mirroring pagerankMicro's quantization. */
  private def prReference(edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.length
    val od = e.groupBy(_._1).map { case (s, es) => s -> es.length }
    var pr = nodes.map(_ -> math.round(1e9 / n)).toMap
    val teleport = math.round((1.0 - d) * 1e9 / n)
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (s, _) =>
          BigDecimal(d * pr(s) / od(s)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
      }
      pr = nodes.map(v => v -> (teleport + in.getOrElse(v, 0L))).toMap
    }
    pr
  }

  test("pagerankMicro ≡ quantized reference on a randomized digraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(600)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val got = Graph.pagerankMicro(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = prReference(edges, iters = 3, d = 0.85)
    assert(got == want)
  }

  test("pagerankMicro: sinks keep teleport mass; hubs accumulate") {
    import spark.implicits._
    // star: everything points at 0; 0 points nowhere (dangling)
    val edges = (1L to 9L).map(i => (i, 0L))
    val got = Graph.pagerankMicro(edges.toDF("src", "dst"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 10)
    // leaves get exactly the teleport floor after iteration 1+
    val teleport = math.round((1.0 - 0.85) * 1e9 / 10)
    assert((1L to 9L).forall(got(_) == teleport))
    assert(got(0L) > got(1L) * 5)
  }
}
