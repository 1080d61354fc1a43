package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Driver-contract surface of [[graft.streaming.EventStreams]]: each entry
  * runs the streaming transform to a settled result so the DuckDB oracle can
  * verify it like any batch query — streaming is a first-class, gated
  * operator, not a side demo.
  */
object StreamingOps {

  /** Tumbling-window counts computed BY AN ACTUAL STREAM (file source →
    * watermarked window agg → memory sink, complete mode), then returned as
    * the settled table — the streaming twin of q15, same oracle SQL.
    */
  def q60StreamHourly(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    // the file stream source requires a DIRECTORY; the testdata table is a
    // single file — stage a symlink to it in a temp dir
    val stage = java.nio.file.Files.createTempDirectory("q60_events")
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("events.parquet"),
      java.nio.file.Paths.get(path).toAbsolutePath)
    // deliberate state sizing: shuffle partitions at query START become the
    // stream's state-store partition count for its lifetime. The hourly-
    // window key space is small (hours × event types), so 8 stores suffice;
    // a batch-sized 32 paid 4× the per-batch store init/commit IO for
    // nothing (measured 2.6 s → 1.4 s warm at sf0.1). A real deployment
    // sizes this to state volume, not to batch shuffle width. The override
    // is SCOPED to a cloned session (own SQLConf, shared SparkContext) —
    // mutating the caller's global conf around start() could be observed by
    // a concurrently planned job under the engine's FAIR-pool background
    // commits.
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      math.min(8, s.conf.get("spark.sql.shuffle.partitions").toInt).toString)
    val in = s2.readStream.schema(schema).parquet(stage.toString)
    val name = "q60_stream_hourly_sink"
    s2.catalog.dropTempView(name) // idempotent re-run within one session
    // AvailableNow: process everything present, then stop — the deliberate
    // run-to-completion trigger for a bounded backfill (vs. the default
    // micro-batch trigger, which needs an external processAllAvailable to
    // decide doneness)
    val q = EventStreams.hourlyCounts(in)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      // unstage: repeated invocations (bench reps) must not leak a temp
      // dir + symlink per call
      java.nio.file.Files.deleteIfExists(stage.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(stage)
    }
    s2.table(name)
      // driver testdata stores ts as TIMESTAMP_NTZ; session TZ is UTC so the
      // cast back is exact and the schema matches the batch twin (q15)
      .select(col("hour").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Per-user error-streak state via mapGroupsWithState (same function the
    * streaming spec drives incrementally; batch execution replays each group
    * once). Oracled with a gaps-and-islands SQL equivalent.
    */
  def q61ErrorStreaks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = s.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)]
    EventStreams.errorStreaks(ev, s).toDF()
      .select(col("userId").as("user_id"), col("nEvents").as("n_events"),
        col("errorStreak").cast("long").as("error_streak"), col("flagged"))
      .orderBy(col("user_id"))
  }

  /** q63: the streaming dedup guard run as an ACTUAL stream (file source →
    * watermarked `dropDuplicatesWithinWatermark` → memory sink, append
    * mode), settled into per-type kept/dropped counts. WHICH physical row
    * survives a duplicate group depends on intra-batch processing order, so
    * the gated output aggregates the KEY SET — deterministic by
    * construction: kept = distinct (hour, user, type) keys, dropped =
    * total − kept; the oracle computes the same from the batch table. This
    * closes the one pipeline family the streaming surface didn't touch:
    * dedup was batch-only (q20/q22/q62), while a continuously-crawling
    * ingest needs the at-least-once-delivery guard ON the stream.
    */
  def q63StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    val stage = java.nio.file.Files.createTempDirectory("q63_events")
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("events.parquet"),
      java.nio.file.Paths.get(path).toAbsolutePath)
    // same scoped-session state sizing rationale as q60
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      math.min(8, s.conf.get("spark.sql.shuffle.partitions").toInt).toString)
    val in = s2.readStream.schema(schema).parquet(stage.toString)
    val name = "q63_stream_dedup_sink"
    s2.catalog.dropTempView(name)
    val q = EventStreams.dedupGuard(in)
      .select(col("hour"), col("user_id"), col("event_type"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      java.nio.file.Files.deleteIfExists(stage.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(stage)
    }
    val kept = s2.table(name)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_kept"))
    val totals = s2.read.parquet(path)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
    totals.join(kept, Seq("event_type"))
      .select(col("event_type"), col("n_kept"),
        (col("n_total") - col("n_kept")).as("n_dropped"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_stream_hourly" -> q60StreamHourly _,
    "q61_error_streaks" -> q61ErrorStreaks _,
    "q63_stream_dedup" -> q63StreamDedup _)

  val oracle: Map[String, String] = Map(
    "q60_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "q63_stream_dedup" ->
      """WITH k AS (
           SELECT event_type, COUNT(*) AS n_kept FROM (
             SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id, event_type
             FROM events)
           GROUP BY 1),
         t AS (SELECT event_type, COUNT(*) AS n_total FROM events GROUP BY 1)
         SELECT t.event_type, k.n_kept, t.n_total - k.n_kept AS n_dropped
         FROM t JOIN k USING (event_type) ORDER BY 1""",
    "q61_error_streaks" ->
      """WITH g AS (
           SELECT user_id, event_id, event_type,
                  SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
                    OVER (PARTITION BY user_id ORDER BY event_id) AS grp
           FROM events),
         runs AS (
           SELECT user_id, grp, COUNT(*) AS len
           FROM g WHERE event_type = 'error' GROUP BY user_id, grp),
         lastrun AS (
           SELECT g.user_id, COUNT(*) AS tail_len
           FROM g
           LEFT JOIN (SELECT user_id, MAX(event_id) AS m FROM events
                      WHERE event_type <> 'error' GROUP BY user_id) ne
             ON g.user_id = ne.user_id
           WHERE g.event_type = 'error' AND (ne.m IS NULL OR g.event_id > ne.m)
           GROUP BY g.user_id),
         base AS (
           SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
         flags AS (
           SELECT user_id, MAX(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS f
           FROM runs GROUP BY user_id)
         SELECT b.user_id, b.n_events,
                COALESCE(lr.tail_len, 0) AS error_streak,
                COALESCE(f.f, 0) = 1 AS flagged
         FROM base b
         LEFT JOIN flags f ON b.user_id = f.user_id
         LEFT JOIN lastrun lr ON b.user_id = lr.user_id
         ORDER BY b.user_id""")
}
