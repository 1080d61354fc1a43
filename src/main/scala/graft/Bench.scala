package graft
import org.apache.spark.sql.SparkSession

/** Driver bench harness: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. The N-vs-4N scaling-efficiency evidence lives in
  * graft.ScalingBench (writes BENCH.md); this main stays on the driver's
  * single-line contract.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // FAIR: the crawl engine's pipelined commit runs in its own pool and
      // must share task slots with the next superstep (FIFO serializes it)
      .config("spark.scheduler.mode", "FAIR")
      // task-side file commit (v1 renames serially on the driver)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, shuffle machinery, parquet reader classes)
    // so the first timed query isn't charged JVM startup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write executes the FULL plan (projections, sorts, expression
      // work) — a count() let Catalyst prune everything but the scan, so
      // map-only queries timed the parquet reader instead of the operator.
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
