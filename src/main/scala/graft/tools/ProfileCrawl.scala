package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
import scala.util.chaining._
import graft.corpus.{CorpusSpec, SiteRoutes, SynthFetcher, SyntheticCorpus}
import graft.engine.{CrawlEngine, EngineConfig}
import graft.fetch.CorpusFetcher

/** Dev tool: per-superstep wall clock + Spark job counts/time for a crawl.
  * Usage: ProfileCrawl [hosts details budget img cores] — with args, uses the
  * ScalingBench-style SynthFetcher workload; without, the small q50 corpus.
  */
object ProfileCrawl {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(4).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
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
    val t0 = System.nanoTime()
    val eng = if (args.nonEmpty) {
      val spec = CorpusSpec(hosts = args(0).toInt, listPages = 1,
        detailsPerList = args(1).toInt,
        imgW = args.lift(3).map(_.toInt).getOrElse(224),
        imgH = args.lift(3).map(_.toInt).getOrElse(224))
      new CrawlEngine(spark,
        SiteRoutes.registry(spec, detailConcurrency = args(2).toInt),
        new SynthFetcher(spec), Nil,
        EngineConfig(
          statePath = java.nio.file.Files.createTempDirectory("graft-prof").toString,
          hostBudget = args(2).toInt, retryBackoffSteps = 0,
          bloomPartitions = 8, bloomCapacityPerShard = 1 << 20,
          fetchSplits = 8)) // synth fetcher: politeness not at stake
        .tap(_.seed(SyntheticCorpus.seeds(spec)))
    } else {
      val spec = CorpusSpec(hosts = 2, listPages = 2, detailsPerList = 6)
      new CrawlEngine(spark, SiteRoutes.registry(spec),
        new CorpusFetcher(SyntheticCorpus.buildLocal(spec)), Nil,
        EngineConfig(
          statePath = java.nio.file.Files.createTempDirectory("graft-prof").toString,
          hostBudget = 8, bloomPartitions = 4, bloomCapacityPerShard = 1 << 18))
        .tap(_.seed(SyntheticCorpus.seeds(spec)))
    }
    println(f"construct+seed: ${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs.get}")
    var t = System.nanoTime()
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
