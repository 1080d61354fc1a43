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
}
