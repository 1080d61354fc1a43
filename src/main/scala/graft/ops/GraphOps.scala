package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline.
  *
  * Near-dup detection (q21/q28/q35) emits PAIRS, but the decision a
  * training-data pipeline actually needs is per-GROUP: which documents form
  * one duplicate cluster, and which single representative to keep. That is
  * connected components over the similarity graph — the canonical final
  * stage of every production dedup pass.
  */
object GraphOps {

  /** Connected components by the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014 — a public MapReduce-era result, re-expressed here
    * as DataFrame joins). Input: undirected edges as columns `(a, b)` (any
    * orientation; self-loops and duplicates tolerated). Output:
    * `(node, cluster)` for every node incident to at least one edge, where
    * `cluster` is the component's minimum node id.
    *
    * Why this and not plain min-label propagation: label propagation
    * converges in O(diameter) rounds — a chain of pairwise-similar docs
    * (each adjacent pair over threshold) makes that O(n). The alternating
    * star contraction converges in O(log² n) rounds on ANY graph, each
    * round a constant number of key-partitioned shuffles:
    *
    *  - large-star: every node u connects its LARGER neighbors to
    *    m = min(Γ(u) ∪ {u}) — per-node min is a map-side-combinable
    *    aggregate, the emit is linear in |E|;
    *  - small-star: on the (big → small)-oriented result, every node u
    *    rewires its smaller neighborhood (and itself) to its minimum.
    *
    * Both steps strictly never increase Σ labels and preserve
    * connectivity; the fixpoint is a star forest centered at component
    * minima. Skew posture: a giant component's root accumulates degree
    * O(|component|), but every per-root operation here is an aggregate or
    * an equi-join probe — linear work, no per-key quadratic blowup.
    *
    * Each round is `localCheckpoint`ed to truncate the iterative lineage
    * (on a real cluster with a checkpoint dir, `checkpoint()` — same call
    * shape). Convergence is an exact set comparison (count + empty
    * `except`), two O(|E|) jobs per round — at 10^9 edges that is the same
    * order as the round itself, not a new bottleneck.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val init = pairs
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var e = init.localCheckpoint(true)
    var eCnt = e.count()
    var converged = eCnt == 0L
    var iter = 0
    while (!converged) {
      iter += 1
      require(iter <= 64, "connectedComponents: no fixpoint after 64 rounds")
      // large-star
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = bidir.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = bidir.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star (edges arrive (big → small)-oriented from large-star)
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = ls.join(ssMin, "u").select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(true)
      // counts-first: the O(|E|)-shuffle except runs only on rounds whose
      // edge count already matches (early rounds shrink the set every time)
      val ssCnt = ss.count()
      converged = ssCnt == eCnt && ss.except(e).isEmpty
      eCnt = ssCnt
      e = ss
    }
    // fixpoint is a star forest (member → component-min root)
    e.select(col("u").as("node"), col("v").as("cluster"))
      .union(e.select(col("v"), col("v")).distinct()
        .toDF("node", "cluster"))
  }
}
