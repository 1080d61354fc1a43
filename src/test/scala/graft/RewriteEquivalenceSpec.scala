package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 optimization rewrites, pinned against the exact shapes they
  * replaced: each test recomputes the ROUND-5 plan form inline (window
  * argmax / exploded-shingle verify) and asserts row-identical output with
  * the optimized operator. This is the oracle-independent regression pin for
  * "the rewrite changed the plan, not the answer".
  */
class RewriteEquivalenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q02: max(struct) argmax equals the row_number window top-1") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val old = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .orderBy(col("o_custkey"))
    assert(rows(graft.ops.RelationalQueries.q02PriorityTopk(spark, dir)) == rows(old))
  }

  test("q07: max(struct) LWW equals the row_number window top-1") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val old = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"))
    assert(rows(graft.ops.RelationalQueries.q07UpsertMerge(spark, dir)) == rows(old))
  }

  test("q13: group sum equals the running-total window's final row") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val old = events
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("running_cents", sum(col("cents")).over(w))
      .withColumn("rn", row_number().over(ranked))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("running_cents").as("total_cents"))
      .orderBy(col("user_id"))
    assert(rows(graft.ops.RelationalQueries.q13RunningTotal(spark, dir)) == rows(old))
  }

  test("q28: array_intersect verify equals the exploded (doc, shh) join verify") {
    // the round-5 verify: explode every doc's shingle set, equi-join on
    // (doc, shh), groupBy-count the common rows, join two size aggregates
    import graft.functions.TextHashExprs.text_shingles
    val arr = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), text_shingles(col("text")).as("sharr"))
      .filter(size(col("sharr")) > 0)
    val sets = arr.select(col("doc_id"), explode(col("sharr")).as("shh"))
    val sizes = arr.select(col("doc_id"), size(col("sharr")).cast("long").as("sz"))
    val newPairs = graft.ops.TextOps.q28MinhashVerify(spark, dir)
    val cand = newPairs.select(col("doc_a"), col("doc_b")) // same candidate set
    val old = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shh")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shh")), Seq("doc_b", "shh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(lit(1000.0) * col("common") / (col("sza") + col("szb") - col("common")))
          .cast("long").as("jac_x1000"))
      .orderBy(col("doc_a"), col("doc_b"))
    assert(rows(newPairs) == rows(old))
    // and the intersect arithmetic itself: J >= the verify threshold on
    // every emitted pair (the filter survived the rewrite)
    assert(newPairs.filter(col("jac_x1000") < 400).count() == 0)
  }

  test("q62: grouped argmax best-match equals the window rank; verify equals exploded join") {
    // recompute q62's round-5 shape end to end (full old-side explode +
    // window best-match) and compare the final keep/dup_of/jac table
    import graft.functions.TextHashExprs.text_shingles
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def sharr(f: DataFrame): DataFrame =
      f.select(col("doc_id"), text_shingles(col("text")).as("sharr"))
        .filter(size(col("sharr")) > 0)
    val oldArr = sharr(d.filter(col("doc_id") % 2 === 0))
    val newArr = sharr(d.filter(col("doc_id") % 2 === 1))
    def bands(a: DataFrame): DataFrame = {
      val sigs = a.select(col("doc_id"),
        graft.functions.TextHashExprs.minhash_sigs(col("sharr"), 128).as("mh"))
      sigs.select(col("doc_id"), posexplode(array(
        (0 until 32).map(b => concat_ws(":",
          (0 until 4).map(r => element_at(col("mh"), 4 * b + r + 1)): _*)): _*))
        .as(Seq("band", "sig")))
    }
    val cand = bands(newArr).as("n").join(bands(oldArr).as("o"),
        col("n.band") === col("o.band") && col("n.sig") === col("o.sig"))
      .select(col("n.doc_id").as("doc_new"), col("o.doc_id").as("doc_old"))
      .distinct()
    val newSets = newArr.select(col("doc_id").as("doc_new"), explode(col("sharr")).as("shh"))
    val oldSets = oldArr.select(col("doc_id").as("doc_old"), explode(col("sharr")).as("shh"))
    val sizesNew = newArr.select(col("doc_id").as("doc_new"), size(col("sharr")).cast("long").as("szn"))
    val sizesOld = oldArr.select(col("doc_id").as("doc_old"), size(col("sharr")).cast("long").as("szo"))
    val verified = cand
      .join(newSets, Seq("doc_new"))
      .join(oldSets, Seq("doc_old", "shh"))
      .groupBy(col("doc_new"), col("doc_old"))
      .agg(count(lit(1)).as("common"))
      .join(sizesNew, Seq("doc_new")).join(sizesOld, Seq("doc_old"))
      .withColumn("jac_x1000", round(lit(1000.0) * col("common") /
        (col("szn") + col("szo") - col("common"))).cast("long"))
      .filter(col("jac_x1000") >= 400)
    val w = Window.partitionBy(col("doc_new"))
      .orderBy(col("jac_x1000").desc, col("doc_old").asc)
    val best = verified.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_new").as("doc_id"), col("doc_old"), col("jac_x1000"))
    val old = d.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_old").isNull, 1L).otherwise(0L).as("keep"),
        coalesce(col("doc_old"), lit(-1L)).as("dup_of"),
        coalesce(col("jac_x1000"), lit(0L)).as("jac_x1000"))
      .orderBy(col("doc_id"))
    assert(rows(graft.ops.TextOps.q62IncrementalDedup(spark, dir)) == rows(old))
  }

  test("scan-width guard: widens a narrow scan, no-ops on an already-wide relation") {
    import graft.ops.Scans
    val p = spark.sparkContext.defaultParallelism
    val narrow = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    assume(narrow.rdd.getNumPartitions < p, "testdata no longer single-row-group")
    val widened = Scans.spread(narrow, col("doc_id"))
    assert(widened.rdd.getNumPartitions == p,
      s"spread left ${widened.rdd.getNumPartitions} partitions, expected $p")
    // deterministic: same rows, and a second spread of a wide input is a no-op
    val wide = narrow.repartition(p, col("doc_id"))
    assert(Scans.spread(wide, col("doc_id")) eq wide)
    assert(widened.select(sum(col("doc_id"))).head().getLong(0) ==
      narrow.select(sum(col("doc_id"))).head().getLong(0))
  }
}
