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
    // noop write executes the FULL plan (projections, sorts, expression
    // work) — a count() let Catalyst prune everything but the scan, so
    // map-only queries timed the parquet reader instead of the operator.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // This box's minute-to-minute drift is ~2× (q50 has measured 27.8 s and
    // 7.3 s on identical code), so a single rep cannot evidence a
    // regression or a fix on the expensive queries. Queries whose first rep
    // exceeds the threshold get two more reps and report the MEDIAN; the
    // many sub-threshold queries stay single-rep to keep total bench
    // runtime sane (the noise there is absolute-small).
    val MedianThresholdSec = 3.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val first = once(fn)
      val sec =
        if (first < MedianThresholdSec) first
        else Seq(first, once(fn), once(fn)).filter(_ >= 0) match {
          case reps if reps.nonEmpty => reps.sorted.apply(reps.size / 2)
          case _ => -1.0
        }
      (name, sec)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
