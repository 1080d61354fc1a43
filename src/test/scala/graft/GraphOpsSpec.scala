package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** [[GraphOps.connectedComponents]] against a driver-side union-find on
  * graphs chosen to stress the algorithm: long chains (worst case for
  * label propagation — many star-contraction rounds), cliques (dedup's
  * common case), disjoint mixtures, and a seeded random graph.
  */
class GraphOpsSpec extends SparkSpec {

  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    // self-loops connect nothing — the operator drops them, so a node with
    // ONLY a self-loop is absent from its output by design
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    GraphOps.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit =
    assert(run(edges) === bruteComponents(edges))

  test("chain of 40 nodes collapses to one component rooted at the min") {
    check((0L until 39L).map(i => i -> (i + 1)))
  }

  test("reversed/shuffled chain (orientation-independent)") {
    check(new scala.util.Random(3).shuffle(
      (0L until 39L).map(i => (i + 1) -> i)).toSeq)
  }

  test("two cliques plus a bridge-free singleton pair") {
    val cliqueA = for (i <- 0L until 6L; j <- (i + 1) until 6L) yield (i, j)
    val cliqueB = for (i <- 10L until 15L; j <- (i + 1) until 15L) yield (j, i)
    check(cliqueA ++ cliqueB ++ Seq((100L, 101L)))
  }

  test("self-loops and duplicate edges are tolerated") {
    check(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L)))
  }

  test("seeded random graph matches union-find") {
    val rng = new scala.util.Random(42)
    val edges = Seq.fill(120)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    check(edges)
  }

  test("empty edge set yields empty assignment") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(df).count() === 0L)
  }

  test("keeper flag semantics: exactly one keep=1 per cluster (q29 shape)") {
    import spark.implicits._
    val edges = Seq((5L, 9L), (9L, 7L), (20L, 21L)).toDF("a", "b")
    val cc = GraphOps.connectedComponents(edges)
      .select(col("node"), col("cluster"),
        when(col("node") === col("cluster"), 1L).otherwise(0L).as("keep"))
    val perCluster = cc.groupBy("cluster").agg(sum("keep").as("keeps")).collect()
    assert(perCluster.forall(_.getLong(1) == 1L))
    assert(cc.filter(col("cluster") === 5L).count() === 3L)
  }

  test("pageRank: symmetric 2-cycle is an exact integer fixpoint at 1e6") {
    import spark.implicits._
    // 1 <-> 2: r' = 150000 + (85·1000000) div 100 = 1000000 — the start IS
    // the fixpoint, bit-exact under the integer recurrence
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphOps.pageRank(nodes, edges, iters = 30)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === r(2L))
    assert(r(1L) === 1000000L)
  }

  test("pageRank: acyclic star + chain reaches its exact integer fixpoint") {
    import spark.implicits._
    val n = 20L
    val nodes = (1L to n).toDF("node")
    // spokes 3..20 point at hub 1; hub points at 2; 2 dangles (leaks mass).
    // Acyclic, so ranks hit the exact fixpoint well inside 10 rounds:
    // spokes = 150000; r(1) = 150000 + (18·150000·85) div 100 = 2445000;
    // r(2) = 150000 + (2445000·85) div 100 = 2228250.
    val edges = ((3L to n).map(i => (i, 1L)) :+ (1L, 2L)).toDF("src", "dst")
    val r = GraphOps.pageRank(nodes, edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === 2445000L)
    assert(r(2L) === 2228250L)
    assert((3L to n).forall(i => r(i) === 150000L)) // no in-links: damping floor
  }

  test("pageRank is deterministic across partitionings (integer fixed-point)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val nodes = (0L until 60L).toDF("node")
    val edgeSeq = Seq.fill(200)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    val r1 = GraphOps.pageRank(nodes, edgeSeq.toDF("src", "dst"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val r8 = GraphOps.pageRank(nodes.repartition(8),
        edgeSeq.toDF("src", "dst").repartition(7))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r1 === r8)
  }
}
