package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStreams

/** Structured Streaming coverage: the streaming transforms must agree with
  * their batch twins on the same data (driven synchronously via the memory
  * sink + processAllAvailable).
  */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed hourly window counts equal the batch aggregation") {
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    // file-stream sources take directories; stage the single parquet file
    val streamDir = tmpDir("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$streamDir/events.parquet"))
    val stream = spark.readStream
      .schema(batchDf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .select("hour", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = EventStreams.hourlyCounts(batchDf).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch, s"diff=${streamed.diff(batch) ++ batch.diff(streamed)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("dedup guard drops re-deliveries ACROSS micro-batches, keeps distinct keys") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:${min}%02d:00")
    val q = EventStreams.dedupGuard(
        src.toDF().toDF("ts", "user_id", "event_type"))
      .select(col("user_id"), col("event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_guard")
      .start()
    try {
      // batch 1: one key delivered twice inside the batch + one other key
      src.addData((ts(0), 1L, "view"), (ts(20), 1L, "view"), (ts(5), 2L, "click"))
      q.processAllAvailable()
      val afterB1 = spark.table("dedup_guard").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(afterB1.sorted.toSeq === Seq((1L, "view"), (2L, "click")).sorted,
        s"batch-1 kept: ${afterB1.mkString(",")}")
      // batch 2: the batch-1 key re-delivered (state must remember it),
      // plus a genuinely new key
      src.addData((ts(30), 1L, "view"), (ts(31), 3L, "view"))
      q.processAllAvailable()
      val afterB2 = spark.table("dedup_guard").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(afterB2.length === 3, s"cross-batch dup not dropped: ${afterB2.mkString(",")}")
      assert(afterB2.count(_ == ((1L, "view"))) === 1)
      assert(afterB2.contains((3L, "view")))
    } finally q.stop()
  }

  test("stateful error-streak flags match a sequential replay") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)]
    val got = EventStreams.errorStreaks(ev, spark).collect()
      .map(s => s.userId -> s).toMap

    // sequential oracle
    val expected = ev.collect().sortBy(_._2).groupBy(_._1).map { case (u, rows) =>
      var streak = 0; var flagged = false
      rows.sortBy(_._2).foreach { case (_, _, t) =>
        streak = if (t == "error") streak + 1 else 0
        if (streak >= 3) flagged = true
      }
      u -> ((rows.length.toLong, flagged))
    }
    expected.foreach { case (u, (n, fl)) =>
      assert(got(u).nEvents == n, s"user $u count")
      assert(got(u).flagged == fl, s"user $u flagged")
    }
    assert(got.values.exists(_.flagged), "fixture should flag someone")
  }
}
