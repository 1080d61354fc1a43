package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.canon.UrlCanon
import graft.corpus.CorpusRow
import graft.fetch.{CorpusFetcher, FetchStage, Fetcher, StepOutcome}
import graft.frontier.{BloomSeen, BloomShard, Politeness}
import graft.items.Items
import graft.model._
import graft.robots.Robots
import graft.state.SnapshotStore

/** A permanently-failed fetch (retries exhausted or a 4xx "stop") — the
  * reference throws and abandons the job (src/spider.js:239-244); we land it
  * in a queryable dead-letter table instead.
  */
case class DeadLetter(urlKey: Long, url: String, host: String, routeId: String,
    status: Int, errorCount: Int, step: Int)

/** One row per fetch — the engine's dequeue/crawl-ordering record (north
  * rule: ordering parity vs the oracle is asserted on this log; within a
  * (step, host) wave rows are unordered parallel fetches, compared after
  * sorting by the scheduler's own (priority, createdStep, urlKey) order).
  */
case class FetchLog(step: Int, host: String, urlKey: Long, url: String,
    page: Int, status: Int, priority: Int, createdStep: Int)

case class EngineConfig(
    statePath: String,
    /** max fetches per host per superstep — the politeness budget. */
    hostBudget: Int = 2,
    maxSteps: Int = 10000,
    disabledRoutes: Set[String] = Set.empty,
    /** phash hamming threshold for near-dup suppression; -1 disables. */
    phashThreshold: Int = 3,
    /** extra supersteps of backoff before retrying a 5xx (reference: fixed
      * 3500 ms vs 1 s poll ≈ a few polls, spider.js:248). */
    retryBackoffSteps: Int = 1,
    bloomPartitions: Int = 8,
    bloomCapacityPerShard: Long = 1L << 20,
    bloomFpp: Double = 0.01,
    saltBuckets: Int = 16,
    /** snapshots older than latest-N are expired after each commit. */
    retainSnapshots: Int = 4)

/** Per-run roll-up returned by [[CrawlEngine.run]]. */
case class RunSummary(steps: Int, fetched: Long, items: Long, deadLettered: Long)

/** The BSP superstep crawl driver — the engine's analogue of the reference's
  * worker pool + poll loop (reference: src/nest.js:47-61, src/worker.js:86-162).
  *
  * Each superstep (one call to [[step]]):
  *
  *  1. politeness-scheduled wave off the frontier (shuffle 1: by salted host)
  *  2. `mapPartitions` fetch+extract — narrow, embarrassingly parallel
  *  3. item merge-on-key (shuffle 2: by item key)
  *  4. spawned-job dedup: bloom probe → exact anti-join on the survivors
  *     (shuffle 3: by urlKey)
  *  5. frontier/state/metrics rewrite + atomic snapshot commit
  *
  * Three shuffles per superstep, none carrying image bytes except the item
  * merge (bytes never enter the frontier or seen-set paths). Every commit is
  * a resume point: [[resume]] continues from the latest snapshot with
  * identical results (kill-safe via the store's atomic rename).
  */
final class CrawlEngine(
    spark: SparkSession,
    routes: Map[String, RouteSpec],
    fetcher: Fetcher,
    robotsRules: Seq[RobotsRule],
    cfg: EngineConfig) {

  import spark.implicits._

  private val store = new SnapshotStore(cfg.statePath)
  private val routesBc = spark.sparkContext.broadcast(routes)
  private val fetcherBc = spark.sparkContext.broadcast(fetcher)
  private val routeCaps: Map[String, Int] = routes.map { case (k, r) => k -> r.concurrency }
  private val hostDelay: Map[String, Int] = Robots.delayByHost(robotsRules)

  // ---- state table IO -------------------------------------------------

  private def readFrontier(v: Int): Dataset[CrawlJob] =
    spark.read.parquet(store.tablePath(v, "frontier")).as[CrawlJob]
  private def readItems(v: Int): Dataset[ImageItem] =
    spark.read.parquet(store.tablePath(v, "items")).as[ImageItem]
  private def readBloom(v: Int): Dataset[BloomShard] =
    spark.read.parquet(store.tablePath(v, "bloom")).as[BloomShard]
  private def readMetrics(v: Int): Dataset[StepMetrics] =
    spark.read.parquet(store.tablePath(v, "metrics")).as[StepMetrics]
  private def readDead(v: Int): Dataset[DeadLetter] =
    spark.read.parquet(store.tablePath(v, "dead")).as[DeadLetter]
  private def readFetchLog(v: Int): Dataset[FetchLog] =
    spark.read.parquet(store.tablePath(v, "fetchlog")).as[FetchLog]

  def currentVersion: Option[Int] = store.latestVersion
  def stepOf(v: Int): Int = {
    val m = store.manifest(v)
    """"step":(-?\d+)""".r.findFirstMatchIn(m).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"manifest of v$v lacks step"))
  }

  def frontier: Dataset[CrawlJob] = readFrontier(currentVersion.get)
  def items: Dataset[ImageItem] = readItems(currentVersion.get)
  def metrics: Dataset[StepMetrics] = readMetrics(currentVersion.get)
  def deadLetters: Dataset[DeadLetter] = readDead(currentVersion.get)
  def fetchLog: Dataset[FetchLog] = readFetchLog(currentVersion.get)

  // ---- seeding --------------------------------------------------------

  /** Initialize snapshot v0 from seed (routeId, url) pairs — the analogue of
    * `nest.queue(...)` (reference: src/nest.js:86-97): canonicalize, dedup,
    * robots-filter, land as the v0 frontier.
    */
  def seed(seeds: Seq[(String, String)]): Unit = {
    val seedJobs = seeds.toDF("routeId", "rawUrl")
      .withColumn("url", graft.canon.CanonUdfs.canonUdf(col("rawUrl")))
      .withColumn("host", graft.canon.CanonUdfs.hostUdf(col("url")))
      .withColumn("urlKey", xxhash64(col("url")))
    val deduped = seedJobs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("urlKey")).orderBy(col("routeId"))))
      .filter(col("rn") === 1).drop("rn", "rawUrl")
    val allowedSeeds = Robots.allowed(deduped, robotsRules)
    val prioByRoute = typedLit(routes.map { case (k, r) => k -> r.priority })
    val jobs = allowedSeeds
      .withColumn("priority", coalesce(element_at(prioByRoute, col("routeId")), lit(50)))
      .select(col("urlKey").as("_1"), col("url").as("_2"), col("host").as("_3"),
        col("routeId").as("_4"), col("priority").cast("int").as("_5"))
      .as[(Long, String, String, String, Int)]
      .map { case (k, u, h, r, p) => CrawlJob(k, u, h, r, priority = p) }

    val jobsP = jobs.persist(StorageLevel.MEMORY_AND_DISK)
    val n = jobsP.count()
    val bloom = BloomSeen.insert(
      BloomSeen.empty(spark, cfg.bloomPartitions, cfg.bloomCapacityPerShard, cfg.bloomFpp),
      jobsP.map(_.urlKey), cfg.bloomPartitions)
    store.commit(0, SnapshotStore.manifestJson(
      "version" -> 0, "step" -> -1, "frontier" -> n, "items" -> 0L,
      "dead" -> 0L)) { dir =>
      jobsP.write.parquet(s"$dir/frontier")
      spark.emptyDataset[ImageItem].write.parquet(s"$dir/items")
      spark.emptyDataset[StepMetrics].write.parquet(s"$dir/metrics")
      spark.emptyDataset[DeadLetter].write.parquet(s"$dir/dead")
      spark.emptyDataset[FetchLog].write.parquet(s"$dir/fetchlog")
      bloom.write.parquet(s"$dir/bloom")
    }
    jobsP.unpersist()
  }

  // ---- one superstep --------------------------------------------------

  /** Execute the next superstep. Returns false (and commits nothing) when no
    * eligible work remains — the analogue of the worker's empty-poll exit
    * (reference: src/worker.js:108-110).
    */
  def step(): Boolean = {
    val v = currentVersion.getOrElse(
      throw new IllegalStateException("seed() first — no snapshot"))
    var s = stepOf(v) + 1

    val front = readFrontier(v)
    var wave = Politeness.wave(front, s, cfg.hostBudget, routeCaps,
        cfg.disabledRoutes, cfg.saltBuckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var waveN = wave.count()
    if (waveN == 0) {
      // Nothing eligible *now*, but retry-backoff / crawl-delay jobs may be
      // waiting on a future step — jump the clock to the earliest one (the
      // analogue of the reference worker's idle poll-sleep, worker.js:108-110).
      wave.unpersist()
      val pending = front
        .filter(!col("state.finished"))
        .filter(if (cfg.disabledRoutes.isEmpty) lit(true)
                else !col("routeId").isin(cfg.disabledRoutes.toSeq: _*))
        .agg(min(col("notBeforeStep"))).head()
      if (pending.isNullAt(0)) return false
      val nxt = pending.getInt(0)
      if (nxt <= s) return false // safety: no forward progress possible
      s = nxt
      wave = Politeness.wave(front, s, cfg.hostBudget, routeCaps,
          cfg.disabledRoutes, cfg.saltBuckets)
        .persist(StorageLevel.MEMORY_AND_DISK)
      waveN = wave.count()
      if (waveN == 0) { wave.unpersist(); return false }
    }

    // -- fetch+extract (narrow; wave is already salted-partitioned) ------
    val outcomes = FetchStage.run(wave, routesBc, fetcherBc)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- items path ------------------------------------------------------
    val prevItems = readItems(v)
    val landedRaw = outcomes.flatMap(o =>
      o.items.map(it => Items.Landed(o.job.urlKey, it.copy(createdStep = s))))
    val landed =
      if (cfg.phashThreshold >= 0) {
        val keep = Items.suppressNearDups(
          landedRaw.map(_.item), prevItems, cfg.phashThreshold)
          .select(col("key")).distinct()
        landedRaw.join(keep, landedRaw("item.key") === keep("key"), "left_semi")
          .as[Items.Landed]
      } else landedRaw
    val (mergedItems, flags) = Items.merge(prevItems, landed)
    val flagAgg = flags.groupBy(col("srcJob"))
      .agg(sum(when(col("wasNew"), 1L).otherwise(0L)).as("createdCnt"),
           sum(when(col("wasNew"), lit(0L)).otherwise(1L)).as("updatedCnt"))

    // -- spawned-jobs path ----------------------------------------------
    val spawnedRaw = outcomes.flatMap { o =>
      val redirect = o.action match {
        case a if a.startsWith("redirect:") =>
          Seq(SpawnedJob(o.job.routeId, a.substring("redirect:".length)))
        case _ => Nil
      }
      (o.spawned ++ redirect).map(sj => (sj.routeId, sj.url))
    }.toDF("routeId", "rawUrl")
    val known = spawnedRaw.filter(col("routeId").isin(routes.keys.toSeq: _*))
    val canonical = known
      .withColumn("url", graft.canon.CanonUdfs.canonUdf(col("rawUrl")))
      .withColumn("host", graft.canon.CanonUdfs.hostUdf(col("url")))
      .withColumn("urlKey", xxhash64(col("url")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("urlKey")).orderBy(col("routeId"))))
      .filter(col("rn") === 1).drop("rn", "rawUrl")
    val allowedJobs = Robots.allowed(canonical, robotsRules)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val bloom = readBloom(v)
    val probed = BloomSeen.probe(bloom, allowedJobs.select(col("urlKey")).as[Long],
      cfg.bloomPartitions).toDF("urlKey", "might")
    val definitelyNew = allowedJobs.join(probed.filter(!col("might")).drop("might"),
      Seq("urlKey"), "left_semi")
    val maybeSeen = allowedJobs.join(probed.filter(col("might")).drop("might"),
      Seq("urlKey"), "left_semi")
    // exact anti-join only on the bloom-positive sliver (false positives)
    val confirmedNew = maybeSeen.join(
      front.select(col("urlKey")), Seq("urlKey"), "left_anti")
    val prioByRoute = typedLit(routes.map { case (k, r) => k -> r.priority })
    val fresh = definitelyNew.unionByName(confirmedNew)
      .withColumn("priority", coalesce(element_at(prioByRoute, col("routeId")), lit(50)))
      .select(col("urlKey").as("_1"), col("url").as("_2"), col("host").as("_3"),
        col("routeId").as("_4"), col("priority").cast("int").as("_5"))
      .as[(Long, String, String, String, Int)]
      .map { case (k, u, h, r, p) =>
        CrawlJob(k, u, h, r, priority = p, createdStep = s + 1, notBeforeStep = s + 1)
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    // -- job-state updates ----------------------------------------------
    // locals only in executor closures — capturing fields would serialize `this`
    val routesLocal = routesBc
    val backoffLocal = cfg.retryBackoffSteps
    val outDf = outcomes.map(o => (o.job, o.status, o.action, o.hasNextPage,
        o.newState, o.spawned.size))
      .toDF("job", "status", "action", "hasNext", "newState", "spawnCount")
    val updatedWave = outDf
      .join(flagAgg, outDf("job.urlKey") === flagAgg("srcJob"), "left")
      .na.fill(0L, Seq("createdCnt", "updatedCnt"))
      .select(col("job").as("_1"), col("status").as("_2"), col("action").as("_3"),
        col("hasNext").as("_4"), col("newState").as("_5"), col("spawnCount").as("_6"),
        col("createdCnt").as("_7"), col("updatedCnt").as("_8"))
      .as[(CrawlJob, Int, String, Boolean, Map[String, String], Int, Long, Long)]
      .map { case (job, _, action, hasNext, newState, spawnCount, created, updated) =>
        val tdel = routesLocal.value.get(job.routeId).map(_.transitionDelay).getOrElse(0)
        val stats2 = job.stats.copy(
          pages = job.stats.pages + (if (action == "ok") 1 else 0),
          items = job.stats.items + created.toInt,
          updated = job.stats.updated + updated.toInt,
          spawned = job.stats.spawned + spawnCount)
        val started = if (job.state.startedStep < 0) s else job.state.startedStep
        action match {
          case "ok" if hasNext =>
            job.copy(stats = stats2,
              notBeforeStep = s + 1 + tdel,
              state = job.state.copy(currentPage = job.state.currentPage + 1,
                startedStep = started,
                data = job.state.data ++ newState))
          case "ok" =>
            job.copy(stats = stats2,
              state = job.state.copy(finished = true, startedStep = started,
                finishedStep = s, data = job.state.data ++ newState))
          case "retry" =>
            job.copy(errorCount = job.errorCount + 1,
              notBeforeStep = s + 1 + backoffLocal,
              stats = stats2,
              state = job.state.copy(startedStep = started))
          case _ => // stop or redirect: this job terminates
            job.copy(stats = stats2,
              state = job.state.copy(finished = true, startedStep = started,
                finishedStep = s))
        }
      }


    // -- dead letters ----------------------------------------------------
    val newDead = outcomes
      .filter(o => o.status >= 400 && o.action == "stop")
      .map(o => DeadLetter(o.job.urlKey, o.job.url, o.job.host, o.job.routeId,
        o.status, o.job.errorCount, s))
    val dead = readDead(v).unionByName(newDead)

    // -- frontier rewrite + per-host crawl-delay bump --------------------
    val waveKeys = wave.select(col("urlKey"))
    val untouched = front.join(waveKeys, Seq("urlKey"), "left_anti").as[CrawlJob]
    val frontier2 = untouched.unionByName(updatedWave).unionByName(fresh)
    val frontier3 =
      if (hostDelay.isEmpty) frontier2
      else {
        val delayLit = typedLit(hostDelay)
        val fetchedHosts = wave.groupBy(col("host")).agg(count(lit(1)).as("_n"))
          .withColumn("_hostNext", lit(s) + element_at(delayLit, col("host")))
          .filter(col("_hostNext").isNotNull)
          .select(col("host"), col("_hostNext"))
        frontier2.toDF()
          .join(broadcast(fetchedHosts), Seq("host"), "left")
          .withColumn("notBeforeStep",
            when(col("_hostNext").isNotNull && !col("state.finished"),
              greatest(col("notBeforeStep"), col("_hostNext").cast("int")))
            .otherwise(col("notBeforeStep")))
          .drop("_hostNext")
          .as[CrawlJob]
      }

    // -- bloom update -----------------------------------------------------
    val bloom2 = BloomSeen.insert(bloom, fresh.map(_.urlKey), cfg.bloomPartitions)

    // -- metrics ----------------------------------------------------------
    val perHost = outcomes.map(o => (o.job.host,
        if (o.action == "ok") 1L else 0L,
        if (o.status >= 400) 1L else 0L,
        if (o.action == "retry") 1L else 0L,
        if (o.status >= 400 && o.action != "retry") 1L else 0L,
        o.spawned.size.toLong))
      .toDF("host", "ok", "err", "retried", "deadLettered", "spawned")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("fetched"), sum(col("ok")).as("ok"),
        sum(col("err")).as("errors"), sum(col("retried")).as("retried"),
        sum(col("deadLettered")).as("deadLettered"),
        sum(col("spawned")).as("jobsSpawned"))
    val itemHost = flags.join(outDf.select(col("job.urlKey").as("srcJob"),
        col("job.host").as("host")), Seq("srcJob"))
      .groupBy(col("host"))
      .agg(sum(when(col("wasNew"), 1L).otherwise(0L)).as("itemsCreated"),
        sum(when(col("wasNew"), lit(0L)).otherwise(1L)).as("itemsUpdated"))
    val freshHost = fresh.groupBy(col("host")).agg(count(lit(1)).as("freshJobs"))
    val spawnTargets = allowedJobs.groupBy(col("host")).agg(count(lit(1)).as("spawnCandidates"))
    val stepMetrics = perHost
      .join(itemHost, Seq("host"), "left")
      .join(spawnTargets.join(freshHost, Seq("host"), "left")
        .withColumn("jobsDeduped",
          col("spawnCandidates") - coalesce(col("freshJobs"), lit(0L)))
        .select(col("host"), col("jobsDeduped")), Seq("host"), "outer")
      .na.fill(0L)
      .select(lit(s).as("step"), col("host"),
        col("fetched"), col("ok"), col("errors"), col("retried"),
        col("deadLettered"), col("itemsCreated"), col("itemsUpdated"),
        col("jobsSpawned"), col("jobsDeduped"))
      .as[StepMetrics]
    val metrics2 = readMetrics(v).unionByName(stepMetrics)
    val fetchLog2 = readFetchLog(v).unionByName(outcomes.map(o =>
      FetchLog(s, o.job.host, o.job.urlKey, o.job.url, o.job.state.currentPage,
        o.status, o.job.priority, o.job.createdStep)))

    // -- commit -----------------------------------------------------------
    val itemsP = mergedItems.persist(StorageLevel.MEMORY_AND_DISK)
    val frontierP = frontier3.persist(StorageLevel.MEMORY_AND_DISK)
    val nItems = itemsP.count()
    val nFrontier = frontierP.count()
    val nDead = dead.count()
    store.commit(v + 1, SnapshotStore.manifestJson(
      "version" -> (v + 1), "step" -> s, "frontier" -> nFrontier,
      "items" -> nItems, "dead" -> nDead, "fetched" -> waveN)) { dir =>
      frontierP.write.parquet(s"$dir/frontier")
      itemsP.write.parquet(s"$dir/items")
      metrics2.write.parquet(s"$dir/metrics")
      fetchLog2.write.parquet(s"$dir/fetchlog")
      dead.write.parquet(s"$dir/dead")
      bloom2.write.parquet(s"$dir/bloom")
    }
    store.expire(v + 1 - cfg.retainSnapshots + 1)

    Seq(wave, outcomes, allowedJobs, fresh, itemsP, frontierP).foreach(_.unpersist())
    true
  }

  /** Run supersteps until the frontier drains or maxSteps is hit. */
  def run(): RunSummary = {
    var steps = 0
    while (steps < cfg.maxSteps && step()) steps += 1
    summary(steps)
  }

  /** Continue from the latest snapshot — the kill-resume path. */
  def resume(): RunSummary = run()

  private def summary(steps: Int): RunSummary = {
    val m = metrics
    val fetched = if (m.isEmpty) 0L else m.agg(sum(col("fetched"))).head.getLong(0)
    RunSummary(steps, fetched, items.count(), deadLetters.count())
  }
}
