package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-6 evidence tool: write `explain("formatted")` for a set of
  * SparkEntry queries to a directory (plans/r06/<query>_<tag>.txt), so plan
  * claims in OPTIMIZATION_r06.md are checkable without running Spark.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> [comma-separated query
  * prefixes; default = all]. Same session shape as graft.Bench (local
  * master, shuffle partitions = cores, AQE on) so the captured initial plans
  * match what the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val nameFilter: String => Boolean = args.lift(2) match {
      case Some(f) => n => f.split(',').exists(n.startsWith)
      case None => _ => true
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => nameFilter(q._1))
      // the crawl/stream queries run side-effecting work at build time and
      // have no single declarative plan to dump
      .filterNot(q => Set("q50_crawl_e2e", "q60_stream_hourly",
        "q63_stream_dedup").contains(q._1))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
