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
