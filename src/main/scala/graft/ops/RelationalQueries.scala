package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the driver testdata — each entry is the
  * testdata-expressible analogue of a crawl-engine operator from SURVEY.md §2
  * (the engine itself is exercised on the synthetic corpus; these run the
  * same Spark primitives over the TPC-H-ish tables so the driver's DuckDB
  * oracle can verify them).
  *
  * Float-safety convention for oracle parity: money-like doubles become
  * cents (`ROUND(x*100)` per row, then BIGINT sums — exact in both engines);
  * doubles are never summed directly.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * lit(100)).cast("long")

  /** O18 stats accounting: grouped sums/counts. */
  def q01StatsAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** O2 priority dequeue: top-1 per group by (priority desc, key asc).
    * Expressed as a max(struct) aggregate, not a window: the argmax
    * combines MAP-SIDE (a window must shuffle + sort every row of the
    * group), so at 10^10 orders each partition forwards one candidate per
    * key instead of its whole slice. The struct comparator (price asc,
    * negated key asc) picks exactly the window's (price desc, key asc)
    * first row — same double compared, same integer tiebreak.
    */
  def q02PriorityTopk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("o_totalprice"), (-col("o_orderkey")).as("nk"))).as("b"))
      .select(col("o_custkey"), (-col("b.nk")).as("o_orderkey"),
        cents(col("b.o_totalprice")).as("price_cents"))
      .orderBy(col("o_custkey"))

  /** O3 eligibility filter: predicate + isin-negation. */
  def q03EligibilityFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(!col("o_orderstatus").isin("F") && col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** O4 per-host politeness cap: top-k per key by time. */
  def q04PolitenessCap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("last_event_id"))
      .orderBy(col("user_id"))
  }

  /** O1 seen-set dedup: left anti join (customers with no orders). */
  def q05SeenAntijoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** O8 route-registry lookup: broadcast join small dim + aggregate. */
  def q06BroadcastLookup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("p_brand"))

  /** O9 item upsert: last-writer-wins per key. max(struct) argmax instead
    * of a window for the same map-side-combine reason as [[q02PriorityTopk]]
    * — LWW is "keep the max (ts, event_id) row per key", a partial-aggregable
    * fold (event_id is the unique writer id, so the struct compare never
    * reaches the payload field).
    */
  def q07UpsertMerge(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("b"))
      .select(col("user_id"), col("b.event_id").as("event_id"),
        col("b.event_type").as("event_type"))
      .orderBy(col("user_id"))

  /** frontier growth: union + distinct (set semantics). */
  def q08UnionDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy(col("nationkey"))

  /** sort + global limit (top-k dequeue). */
  def q09TopGlobal(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)

  /** O14 sanitize: scalar string functions. */
  def q10ScalarSanitize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        trim(lower(col("c_name"))).as("clean_name"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"))
      .orderBy(col("c_custkey"))

  /** O16/O17 pagination + state carry: per-key page counts and extremes. */
  def q11SessionStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id"))

  /** O13 error policy: filtered failure-class aggregation. */
  def q12ErrorClasses(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_errors"))
      .filter(col("n_errors") >= 3)
      .orderBy(col("user_id"))

  /** analytic frame: running total (cents) per user, reporting the final
    * row. The final row of a running sum IS the group sum, so the operator
    * is one map-side-combinable aggregate — the two windows this replaces
    * (a cumulative frame + a rank to pick its last row) shuffled and sorted
    * every event twice to produce the same per-user integer. Values are
    * identical: cents are per-row rounded longs and long addition is
    * associative, which is exactly why the oracle was already the GROUP BY
    * form.
    */
  def q13RunningTotal(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(cents(col("value"))).as("total_cents"))
      .orderBy(col("user_id"))

  /** rollup aggregation (grouping sets family). */
  def q14Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** streaming analogue: tumbling 1-hour event-time windows (batch form —
    * the Structured Streaming variant is exercised in StreamingSpec).
    */
  def q15TumblingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hour"), col("event_type"))

  /** semi join (EXISTS): orders with any high-quantity line. */
  def q16SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem").filter(col("l_quantity") >= 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** JSON extraction (page.js JSON auto-detect analogue): props k value. */
  def q17JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"))

  /** multi-way star join with two broadcast dims. */
  def q18StarJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_cents"))
      .orderBy(col("r_name"))

  val oracle: Map[String, String] = Map(
    "q01_stats_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
         COUNT(*) AS n
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q02_priority_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rn FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q03_eligibility_filter" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
         WHERE o_orderstatus NOT IN ('F') AND o_totalprice > 1000.0
         GROUP BY 1 ORDER BY 1""",
    "q04_politeness_cap" ->
      """SELECT user_id, COUNT(*) AS n, MAX(event_id) AS last_event_id
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) rn FROM events)
         WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""",
    "q05_seen_antijoin" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q06_broadcast_lookup" ->
      """SELECT p_brand, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY 1""",
    "q07_upsert_merge" ->
      """SELECT user_id, event_id, event_type
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "q08_union_dedup" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
         ORDER BY nationkey""",
    "q09_top_global" ->
      """SELECT l_orderkey, l_linenumber, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
         FROM lineitem ORDER BY price_cents DESC, l_orderkey ASC, l_linenumber ASC LIMIT 20""",
    "q10_scalar_sanitize" ->
      """SELECT c_custkey, trim(lower(c_name)) AS clean_name,
         CAST(length(c_name) AS BIGINT) AS name_len,
         concat_ws('/', c_mktsegment, c_name) AS seg_name
         FROM customer ORDER BY c_custkey""",
    "q11_session_stats" ->
      """SELECT user_id, COUNT(*) AS n_events, MIN(event_id) AS first_event,
         MAX(event_id) AS last_event, COUNT(DISTINCT event_type) AS n_types
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q12_error_classes" ->
      """SELECT user_id, COUNT(*) AS n_errors FROM events
         WHERE event_type = 'error' GROUP BY user_id HAVING COUNT(*) >= 3
         ORDER BY user_id""",
    "q13_running_total" ->
      """SELECT user_id, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q15_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "q16_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
         GROUP BY 1 ORDER BY 1""",
    "q17_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "q18_star_join" ->
      """SELECT r_name, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_stats_agg" -> q01StatsAgg _,
    "q02_priority_topk" -> q02PriorityTopk _,
    "q03_eligibility_filter" -> q03EligibilityFilter _,
    "q04_politeness_cap" -> q04PolitenessCap _,
    "q05_seen_antijoin" -> q05SeenAntijoin _,
    "q06_broadcast_lookup" -> q06BroadcastLookup _,
    "q07_upsert_merge" -> q07UpsertMerge _,
    "q08_union_dedup" -> q08UnionDedup _,
    "q09_top_global" -> q09TopGlobal _,
    "q10_scalar_sanitize" -> q10ScalarSanitize _,
    "q11_session_stats" -> q11SessionStats _,
    "q12_error_classes" -> q12ErrorClasses _,
    "q13_running_total" -> q13RunningTotal _,
    "q14_rollup" -> q14Rollup _,
    "q15_tumbling_window" -> q15TumblingWindow _,
    "q16_semi_join" -> q16SemiJoin _,
    "q17_json_extract" -> q17JsonExtract _,
    "q18_star_join" -> q18StarJoin _)
}
