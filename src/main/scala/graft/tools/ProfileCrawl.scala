package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
import graft.corpus.{CorpusSpec, SiteRoutes, SyntheticCorpus}
import graft.engine.{CrawlEngine, EngineConfig}
import graft.fetch.CorpusFetcher

/** Dev tool: per-superstep wall clock + Spark job counts for the q50 crawl. */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = js.stageInfos.headOption.map(si => si.name.takeWhile(_ != '(') +
          ":" + si.details.linesIterator.filter(_.contains("graft"))
            .take(1).mkString.trim).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t, site) =>
          val d = System.nanoTime() - t
          agg.merge(site, (d, 1), (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    })
    val spec = CorpusSpec(hosts = 2, listPages = 2, detailsPerList = 6)
    val t0 = System.nanoTime()
    val eng = new CrawlEngine(spark, SiteRoutes.registry(spec),
      new CorpusFetcher(SyntheticCorpus.buildLocal(spec)), Nil,
      EngineConfig(
        statePath = java.nio.file.Files.createTempDirectory("graft-prof").toString,
        hostBudget = 8, bloomPartitions = 4, bloomCapacityPerShard = 1 << 18))
    println(f"construct: ${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs.get}")
    var t = System.nanoTime()
    eng.seed(SyntheticCorpus.seeds(spec))
    println(f"seed: ${(System.nanoTime() - t) / 1e9}%.2f s, jobs=${jobs.get}")
    var going = true
    var i = 0
    while (going) {
      t = System.nanoTime()
      val j0 = jobs.get
      going = eng.step()
      i += 1
      println(f"step $i: ${(System.nanoTime() - t) / 1e9}%.2f s, jobs=${jobs.get - j0} (went=$going)")
    }
    t = System.nanoTime()
    val n = eng.items.count()
    println(f"items count=$n: ${(System.nanoTime() - t) / 1e9}%.2f s; total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    agg.asScala.toSeq.sortBy(-_._2._1).take(25).foreach { case (site, (ns, cnt)) =>
      println(f"  $site%-40s ${ns / 1e9}%7.2f s  x$cnt")
    }
    spark.stop()
  }
}
