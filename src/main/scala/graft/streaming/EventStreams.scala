package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine.
  *
  * The crawl itself is deliberately batch-BSP (the reference's poll loop has
  * no watermarks/late-data semantics, and checkpoint-resume maps to snapshot
  * tables — SURVEY.md §1.5), but the events/metrics side of a production
  * crawl is a stream: these transforms are the `readStream` form of the
  * batch aggregations in [[graft.ops.RelationalQueries]], sharing the same
  * logic so batch and streaming results agree (asserted by StreamingSpec).
  */
object EventStreams {

  /** Tumbling 1-hour event-time window counts with a watermark — the
    * streaming twin of q15. Append-mode capable (watermark closes windows).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      // driver testdata stores ts as TIMESTAMP_NTZ; watermarks require
      // TimestampType (session TZ is pinned UTC, so the cast is exact)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"))

  /** Streaming exact-duplicate guard — the ingest twin of the batch dedup
    * family (q20): drop re-deliveries of the same logical event within the
    * watermark horizon. Uses Spark's built-in, state-store-backed
    * `dropDuplicatesWithinWatermark` (the built-in expresses the semantics
    * exactly, so no custom mapGroupsWithState is justified): state is keyed
    * by the dedup key and evicted automatically once the watermark passes
    * an entry's event time — which is precisely what bounds state at
    * 10^10 events/day: live state ≈ keys seen within the watermark window,
    * never the stream's history. Dedup key = (hour, user_id, event_type) —
    * an exact re-delivery within the same hour window; the key's hour
    * component keeps any two same-key events inside the 2-hour watermark,
    * so dedup within a key is COMPLETE, not best-effort.
    */
  def dedupGuard(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .withColumn("hour", date_trunc("hour", col("ts")))
      .dropDuplicatesWithinWatermark("hour", "user_id", "event_type")

  case class UserSession(userId: Long, nEvents: Long, errorStreak: Int, flagged: Boolean)

  /** Custom state: per-user error-streak tracking via mapGroupsWithState —
    * the KeyValueGroupedDataset stateful path (flags users with ≥3
    * consecutive 'error' events; the streaming analogue of the engine's
    * retry/dead-letter accounting).
    *
    * MEMORY BOUND: the in-function sort buffers ONE user's events from ONE
    * micro-batch (`rows` is a single group's slice of the batch), so the
    * executor bound is max-events-per-user-per-trigger — for clickstream-
    * shaped data a few thousand rows, never the table. A pathological
    * single-user firehose should cap the trigger (`maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger`) or pre-sort within partitions and switch to
    * flatMapGroupsWithState; the cross-batch streak state itself is O(1)
    * per user.
    */
  def errorStreaks(events: Dataset[(Long, Long, String)], spark: SparkSession)
      : Dataset[UserSession] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserSession, UserSession](GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[UserSession]) =>
          var st = state.getOption.getOrElse(UserSession(userId, 0, 0, flagged = false))
          // event order within a micro-batch group is not guaranteed by the
          // shuffle — sort by event id for deterministic streak semantics
          rows.toSeq.sortBy(_._2).foreach { case (_, _, eventType) =>
            val streak = if (eventType == "error") st.errorStreak + 1 else 0
            st = UserSession(userId, st.nEvents + 1, streak,
              st.flagged || streak >= 3)
          }
          state.update(st)
          st
      }
  }
}
