package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * shape). Convergence = the edge set IS a star forest (out-degree 1
    * per source and no target is also a source) — by Kiveris et al. the
    * round-fixpoints are exactly the min-rooted star forests, the rounds
    * preserve both the represented connectivity and the (big → small)
    * orientation, so the first star forest reached is already the answer.
    * The check is one tiny aggregate + one semi-join on the checkpointed
    * edges per round, and it fires ONE ROUND EARLIER than the
    * set-identity test it replaces (which had to run a full O(|E|) round
    * just to observe nothing changed, plus a count + `except` pass —
    * measured: 3 rounds → 2 on the bench edge sets, the saved round being
    * pure identity work).
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val init = pairs
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // Star-forest test on a distinct (big → small)-oriented edge set:
    // every source points to exactly ONE target (out-degree 1 — a source
    // with two targets still straddles two prospective roots) AND no
    // target is itself a source (no chains — targets are pure sinks, i.e.
    // roots). Both hold ⇔ the set is a disjoint union of min-rooted stars.
    def isStarForest(f: DataFrame): Boolean =
      f.groupBy(col("u")).agg(count(lit(1)).as("d")).filter(col("d") > 1).isEmpty &&
        f.as("x").join(f.as("y"), col("x.v") === col("y.u"), "left_semi").isEmpty
    var e = init.localCheckpoint(true)
    var converged = isStarForest(e)
    var iter = 0
    while (!converged) {
      iter += 1
      require(iter <= 64, "connectedComponents: no fixpoint after 64 rounds")
      // large-star
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = bidir.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // no distinct here: small-star's aggregates and its own final
      // distinct tolerate duplicate edges (|ls| stays ≤ |bidir|, linear),
      // and dropping it removes one full exchange per round
      val ls = bidir.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star (edges arrive (big → small)-oriented from large-star)
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = ls.join(ssMin, "u").select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(true)
      converged = isStarForest(ss)
      e = ss
    }
    // fixpoint is a star forest (member → component-min root)
    e.select(col("u").as("node"), col("v").as("cluster"))
      .union(e.select(col("v"), col("v")).distinct()
        .toDF("node", "cluster"))
  }

  /** Fixed-point iterations for [[pageRank]]/q51 (plan constant, shared with
    * the oracle SQL generator so the two can't drift).
    */
  private[ops] val PageRankIters = 10

  /** Link-authority scoring by PageRank — the signal production crawls feed
    * back into frontier prioritization (the reference exposes per-job
    * `priority` for exactly this: /root/reference/src/job.js and the
    * priority dequeue surveyed as O2; web-scale curation pipelines rank
    * hosts/pages the same way, cf. Common Crawl's harmonic-centrality
    * rankings). Input: a `node` table and directed edges `(src, dst)`;
    * dangling nodes (no out-edges) simply contribute nothing.
    *
    * ENGINE-PORTABLE INTEGER FIXED-POINT: ranks are x1e6 longs; one
    * iteration is `r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div deg(u))) div 100`
    * — i.e. damping 0.85 with every division an integer floor. Summation of
    * longs is order-independent, so after the fixed [[PageRankIters]]
    * rounds BOTH engines hold bit-identical ranks (a float PageRank would
    * diverge across engines by summation order). Dangling mass: nodes whose
    * every candidate link is a self-loop contribute nothing (the standard
    * leaked-mass simplification, identical in the oracle).
    *
    * Scale shape: per iteration, ONE equi-join of ranks against the
    * (src-partitioned) edge list + one map-side-combinable sum by dst —
    * high-indegree pages aggregate partially before the shuffle, so a hub
    * with 10^8 in-links costs its partitions, not a hot reducer. Ranks are
    * `localCheckpoint`ed each round to truncate the iterative lineage
    * (`checkpoint()` on a real cluster); the edge+degree relation is
    * materialized ONCE and reused by all rounds.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = PageRankIters): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edeg = edges.join(deg, "src").localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    (1 to iters).foreach { _ =>
      val contribs = edeg.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("coalesce(sc, 0L) * 85 div 100")).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** The deterministic pseudo-link rules for q51's graph over `documents`:
    * doc d links to `(d·a + b) mod N` for each (a, b) here (distinct targets,
    * self-loops dropped) — a fixed affine web both engines derive
    * identically from the node table, since the driver testdata carries no
    * natural link column.
    */
  private val LinkRules: Seq[(Long, Long)] = Seq((31L, 7L), (131L, 13L), (17L, 1L))

  /** q51: PageRank over the synthesized document link graph — the iterative
    * fixed-point operator class (everything else in the pack is single-pass
    * or log-round). Emits every doc's x1e6 integer rank after
    * [[PageRankIters]] rounds.
    */
  def q51PageRank(s: SparkSession, dir: String): DataFrame = {
    // materialize the node list ONCE: every one of the 10 rank rounds joins
    // against it, and without this each round's plan re-scanned the corpus
    // from parquet — 10 scans at 100 TB where one pays (the count() below
    // reads the same materialized rows, so no extra scan for N either)
    val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
      .localCheckpoint(true)
    // N is one scalar of metadata (the modulus of the link rules), not data
    val n = d.count()
    val edges = d.select(col("doc_id").as("src"),
        array_distinct(array(LinkRules.map { case (a, b) =>
          (col("doc_id") * a + b) % n }: _*)).as("ts"))
      .select(col("src"), explode(col("ts")).as("dst"))
      .filter(col("src") =!= col("dst"))
    pageRank(d.select(col("doc_id").as("node")), edges)
      .select(col("node").as("doc_id"), col("r").as("rank_x1e6"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[q51PageRank]]: the fixed iteration count is unrolled
    * as a CTE chain pr0..pr{iters} (no GROUP BY inside a recursive CTE to
    * worry about), every arithmetic step the same integer op as Spark's.
    */
  private def pageRankSql(iters: Int): String = {
    val prs = (1 to iters).map { i =>
      s"""pr$i AS (
           SELECT nd.doc_id AS node,
                  150000 + (COALESCE(c.sc, 0) * 85) // 100 AS r
           FROM nodes nd LEFT JOIN (
             SELECT e.dst, SUM(p.r // dg.deg) AS sc
             FROM edges e JOIN deg dg ON dg.src = e.src
                          JOIN pr${i - 1} p ON p.node = e.src
             GROUP BY e.dst) c ON c.dst = nd.doc_id)"""
    }.mkString(",\n         ")
    val linkList = LinkRules.map { case (a, b) =>
      s"(doc_id*$a + $b) % (SELECT COUNT(*) FROM documents)" }.mkString(", ")
    // MATERIALIZED: DuckDB 1.0's binder hits an internal error when the
    // unnest CTE is re-inlined at each of the 10 pr_i references
    s"""WITH nodes AS (SELECT doc_id FROM documents),
         edges AS MATERIALIZED (
           SELECT src, dst FROM (
             SELECT doc_id AS src, unnest(list_distinct([$linkList])) AS dst
             FROM nodes)
           WHERE src <> dst),
         deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
         pr0 AS (SELECT doc_id AS node, 1000000::BIGINT AS r FROM nodes),
         $prs
       SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_x1e6
       FROM pr$iters ORDER BY doc_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_pagerank" -> q51PageRank _)

  val oracle: Map[String, String] = Map(
    "q51_pagerank" -> pageRankSql(PageRankIters))
}
