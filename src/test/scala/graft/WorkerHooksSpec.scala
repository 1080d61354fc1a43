package graft

import java.util.concurrent.atomic.AtomicInteger
import graft.corpus._
import graft.engine.{CrawlEngine, EngineConfig}
import graft.fetch.CorpusFetcher
import graft.model._
import graft.oracle.NestOracle

object WorkerHooksSpec {
  /** local-mode tasks share the JVM, so a static counter observes executor-
    * side hook invocations */
  val initCount = new AtomicInteger(0)
  /** url → fetch mode recorded by [[RecordingFetcher]] */
  val fetchModes = new java.util.concurrent.ConcurrentHashMap[String, String]()

  class RecordingFetcher(inner: graft.fetch.Fetcher) extends graft.fetch.Fetcher {
    override def fetch(url: String, a: Int) = {
      fetchModes.put(url, "static"); inner.fetch(url, a)
    }
    override def fetchDynamic(url: String, a: Int) = {
      fetchModes.put(url, "dynamic"); inner.fetch(url, a)
    }
  }
}

/** O20 — worker hooks: per-task initialize (reference: src/worker.js:57-65),
  * getJobQuery dequeue predicate (src/nest.js:142-166), custom process
  * bypassing fetch+scrape (src/worker.js:195-199).
  */
class WorkerHooksSpec extends SparkSpec {

  val spec = CorpusSpec(hosts = 2, listPages = 2, detailsPerList = 4)
  lazy val fetcher = new CorpusFetcher(SyntheticCorpus.buildLocal(spec))
  lazy val routes = SiteRoutes.registry(spec)

  def engine(dir: String, hooks: WorkerHooks): CrawlEngine =
    new CrawlEngine(spark, routes, fetcher, Nil,
      EngineConfig(statePath = tmpDir(dir), hostBudget = 2,
        phashThreshold = -1, bloomPartitions = 4,
        bloomCapacityPerShard = 1 << 16), hooks)

  test("initialize runs once per fetch task before any job") {
    WorkerHooksSpec.initCount.set(0)
    val eng = engine("hooks-init",
      WorkerHooks(initialize = Some(() => { WorkerHooksSpec.initCount.incrementAndGet(); () })))
    eng.seed(SyntheticCorpus.seeds(spec))
    val sum = eng.run()
    val inits = WorkerHooksSpec.initCount.get
    assert(inits > 0, "initialize never ran")
    assert(inits <= sum.fetched, s"more inits ($inits) than fetches (${sum.fetched}) — not once-per-task")
  }

  test("jobFilter gates dequeue like the worker's getJobQuery — engine == oracle") {
    val filter: CrawlJob => Boolean = _.routeId != SyntheticCorpus.DETAIL
    val eng = engine("hooks-filter", WorkerHooks(jobFilter = Some(filter)))
    eng.seed(SyntheticCorpus.seeds(spec))
    eng.run()
    // details were spawned into the frontier but never dequeued
    val details = eng.frontier.collect().filter(_.routeId == SyntheticCorpus.DETAIL)
    assert(details.nonEmpty && details.forall(j => !j.state.finished && j.stats.pages == 0))
    assert(eng.items.count() == 0)

    val oracle = new NestOracle(routes, fetcher, Nil, 2,
      hooks = WorkerHooks(jobFilter = Some(filter)))
    oracle.seed(SyntheticCorpus.seeds(spec))
    oracle.run()
    assert(eng.frontier.collect().map(_.url).toSet == oracle.seenUrls)
    assert(eng.frontier.collect()
      .map(j => j.urlKey -> ((j.stats.pages, j.stats.spawned, j.state.finished))).toMap
      == oracle.jobStats)
  }

  test("dynamic routes dispatch to fetchDynamic; forceDynamic overrides all (O11)") {
    import scala.jdk.CollectionConverters._
    // detail marked dynamic, listing left static
    val reg = routes.map { case (k, r) =>
      k -> (if (k == SyntheticCorpus.DETAIL) r.copy(dynamic = true) else r)
    }
    WorkerHooksSpec.fetchModes.clear()
    val eng = new CrawlEngine(spark, reg,
      new WorkerHooksSpec.RecordingFetcher(fetcher), Nil,
      EngineConfig(statePath = tmpDir("hooks-dyn"), hostBudget = 2,
        phashThreshold = -1, bloomPartitions = 4,
        bloomCapacityPerShard = 1 << 16))
    eng.seed(SyntheticCorpus.seeds(spec))
    eng.run()
    val modes = WorkerHooksSpec.fetchModes.asScala.toMap
    assert(modes.nonEmpty)
    modes.foreach { case (url, mode) =>
      if (url.contains("/img/")) assert(mode == "dynamic", s"$url fetched $mode")
      else assert(mode == "static", s"$url fetched $mode")
    }

    WorkerHooksSpec.fetchModes.clear()
    val forced = new CrawlEngine(spark, routes,
      new WorkerHooksSpec.RecordingFetcher(fetcher), Nil,
      EngineConfig(statePath = tmpDir("hooks-dyn-force"), hostBudget = 2,
        phashThreshold = -1, bloomPartitions = 4,
        bloomCapacityPerShard = 1 << 16, forceDynamic = true))
    forced.seed(SyntheticCorpus.seeds(spec))
    forced.run()
    assert(WorkerHooksSpec.fetchModes.asScala.values.forall(_ == "dynamic"))
  }

  test("step listeners receive each committed step's fetch log (event fan-out)") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val listener = new CrawlEngine.StepListener {
      def onStepCommitted(step: Int, log: org.apache.spark.sql.Dataset[graft.engine.FetchLog]): Unit = {
        val rows = log.collect()
        seen += ((step, rows.length.toLong, rows.count(_.finished).toLong))
      }
    }
    val eng = new CrawlEngine(spark, routes, fetcher, Nil,
      EngineConfig(statePath = tmpDir("hooks-listener"), hostBudget = 2,
        phashThreshold = -1, bloomPartitions = 4,
        bloomCapacityPerShard = 1 << 16), WorkerHooks(), Seq(listener))
    eng.seed(SyntheticCorpus.seeds(spec))
    val sum = eng.run()
    assert(seen.size == sum.steps, s"one event per committed step: $seen")
    assert(seen.map(_._2).sum == sum.fetched, "event logs cover every fetch")
    // every job that ever finished appears as exactly one finished event
    val finishedEvents = seen.map(_._3).sum
    val finishedJobs = eng.frontier.collect().count(_.state.finished)
    assert(finishedEvents == finishedJobs,
      s"finished events $finishedEvents != finished jobs $finishedJobs")
  }

  test("CrawlEvents selectors split a step log into the reference's event streams") {
    // the reference's per-event callbacks (scraped:page, job:finish,
    // job:next, jobs:created — worker.js:95-161) as typed filters; their
    // union/overlap algebra must tie out against the run's own metrics
    val tallies = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val listener = new CrawlEngine.StepListener {
      def onStepCommitted(step: Int, log: org.apache.spark.sql.Dataset[graft.engine.FetchLog]): Unit = {
        import graft.engine.CrawlEvents._
        val cached = log.cache()
        try {
          tallies("scraped") += scrapedPages(cached).count()
          tallies("finished") += jobsFinished(cached).count()
          tallies("paginating") += jobsPaginating(cached).count()
          tallies("retried") += jobsRetried(cached).count()
          tallies("dead") += jobsDeadLettered(cached).count()
          tallies("spawnedFrom") += jobsCreated(cached).count()
          tallies("itemsCreated") += itemsCreated(cached)
            .collect().map(_.itemsCreated).sum
        } finally cached.unpersist()
      }
    }
    val eng = new CrawlEngine(spark, routes, fetcher, Nil,
      EngineConfig(statePath = tmpDir("hooks-events"), hostBudget = 2,
        phashThreshold = -1, bloomPartitions = 4,
        bloomCapacityPerShard = 1 << 16), WorkerHooks(), Seq(listener))
    eng.seed(SyntheticCorpus.seeds(spec))
    val sum = eng.run()
    val m = eng.metrics.collect()
    assert(tallies("scraped") == m.map(_.ok).sum)
    assert(tallies("retried") == m.map(_.retried).sum)
    assert(tallies("dead") == sum.deadLettered)
    assert(tallies("itemsCreated") == sum.items)
    assert(tallies("finished") == eng.frontier.collect().count(_.state.finished))
    // every ok fetch either finished its job or paginated on
    assert(tallies("scraped") ==
      tallies("paginating") + (tallies("finished") - tallies("dead")))
    assert(tallies("spawnedFrom") > 0)
  }

  test("custom process bypasses fetch+scrape for matching jobs — engine == oracle") {
    // details are answered synthetically (no fetch, no image decode);
    // listings fall through to the normal path
    val proc: CrawlJob => Option[ScrapeResult] = job =>
      if (job.routeId != SyntheticCorpus.DETAIL) None
      else Some(ScrapeResult(items = Seq(ImageItem(
        key = job.url.toLowerCase, name = "processed", itemType = "content",
        link = job.url, route = job.routeId, routeWeight = 50, createdStep = -1,
        image_id = job.url.substring(job.url.lastIndexOf('/') + 1),
        bytes = Array[Byte](1), w = 1, h = 1, fmt = "raw",
        caption = "via custom process", phash = 0L))))
    val hooks = WorkerHooks(process = Some(proc))
    val eng = engine("hooks-process", hooks)
    eng.seed(SyntheticCorpus.seeds(spec))
    eng.run()
    val items = eng.items.collect()
    // EVERY detail (even planted 404s — never fetched) produced an item
    assert(items.length == spec.totalDetails)
    assert(items.forall(_.caption == "via custom process"))

    val oracle = new NestOracle(routes, fetcher, Nil, 2, hooks = hooks)
    oracle.seed(SyntheticCorpus.seeds(spec))
    oracle.run()
    assert(items.map(_.key).toSet == oracle.finalItemKeys)
    assert(eng.frontier.collect().map(_.url).toSet == oracle.seenUrls)
  }

  test("scraper state carries right-wins across pages — engine == oracle (O17)") {
    // details "scrape" three pages, each page emitting per-page state plus
    // an overwritten cursor — the reference's state carry between pagination
    // calls (worker.js:230-233, README state example). The final job state
    // must hold the UNION of page keys with the LAST page's cursor value.
    val proc: CrawlJob => Option[ScrapeResult] = job =>
      if (job.routeId != SyntheticCorpus.DETAIL) None
      else {
        val p = job.state.currentPage
        Some(ScrapeResult(
          hasNextPage = p < 3,
          state = Map(s"p$p" -> s"v$p", "cursor" -> s"c$p")))
      }
    val hooks = WorkerHooks(process = Some(proc))
    val eng = engine("hooks-state", hooks)
    eng.seed(SyntheticCorpus.seeds(spec))
    eng.run()

    val oracle = new NestOracle(routes, fetcher, Nil, 2, hooks = hooks)
    oracle.seed(SyntheticCorpus.seeds(spec))
    oracle.run()

    val engData = eng.frontier.collect().map(j => j.urlKey -> j.state.data).toMap
    assert(engData == oracle.jobData, {
      val diff = (engData.keySet ++ oracle.jobData.keySet)
        .filter(k => engData.get(k) != oracle.jobData.get(k)).take(3)
      s"state.data mismatch on $diff: eng=${diff.map(engData.get)} oracle=${diff.map(oracle.jobData.get)}"
    })
    // sanity: the carry really accumulated and right-wins applied
    val detailData = eng.frontier.collect()
      .filter(_.routeId == SyntheticCorpus.DETAIL).map(_.state.data)
    assert(detailData.nonEmpty)
    detailData.foreach { d =>
      assert(d == Map("p1" -> "v1", "p2" -> "v2", "p3" -> "v3", "cursor" -> "c3"), d)
    }
  }
}
