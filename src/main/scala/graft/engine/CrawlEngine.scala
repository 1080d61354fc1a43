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

/** One row per fetch — the engine's dequeue/crawl-ordering record AND the
  * source of all observability: metrics and dead letters are aggregations /
  * filters over this log at READ time, so supersteps pay exactly one
  * narrow log write (north rule: per-partition lineage + fetch metrics;
  * ordering parity vs the oracle is asserted on this log — within a
  * (step, host) wave rows are unordered parallel fetches, compared after
  * sorting by the scheduler's own (priority, createdStep, urlKey) order).
  */
case class FetchLog(step: Int, host: String, urlKey: Long, url: String,
    routeId: String, page: Int, status: Int, priority: Int, createdStep: Int,
    action: String, errorCount: Int, spawnCount: Int,
    itemsCreated: Long, itemsUpdated: Long)

case class EngineConfig(
    statePath: String,
    /** max fetches per host per superstep — the politeness budget. */
    hostBudget: Int = 2,
    maxSteps: Int = 10000,
    disabledRoutes: Set[String] = Set.empty,
    /** phash hamming threshold for near-dup suppression; -1 disables. */
    phashThreshold: Int = 6,
    /** extra supersteps of backoff before retrying a 5xx (reference: fixed
      * 3500 ms vs 1 s poll ≈ a few polls, spider.js:248). */
    retryBackoffSteps: Int = 1,
    bloomPartitions: Int = 8,
    bloomCapacityPerShard: Long = 1L << 20,
    bloomFpp: Double = 0.01,
    saltBuckets: Int = 16,
    /** snapshots older than latest-N are expired after each commit. */
    retainSnapshots: Int = 4,
    /** probe the seen-set via broadcast sketches while total size fits. */
    bloomBroadcastMaxBytes: Long = 256L << 20)

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

  // explicit schemas skip per-read footer-inference jobs (one driver-side
  // Spark job per read.parquet call otherwise — material at superstep rate)
  private val jobSchema = org.apache.spark.sql.Encoders.product[CrawlJob].schema
  private val shardSchema = org.apache.spark.sql.Encoders.product[BloomShard].schema
  private val itemSchema = org.apache.spark.sql.Encoders.product[ImageItem].schema
  private val fetchLogSchema = org.apache.spark.sql.Encoders.product[FetchLog].schema
  private def dropStep(t: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(t.filterNot(_.name == "step"))

  private def readFrontier(v: Int): Dataset[CrawlJob] =
    spark.read.schema(jobSchema).parquet(store.tablePath(v, "frontier")).as[CrawlJob]
  private def readBloom(v: Int): Dataset[BloomShard] =
    spark.read.schema(shardSchema).parquet(store.tablePath(v, "bloom")).as[BloomShard]

  // Item deltas and observability logs are APPEND-ONLY side tables, written
  // once per superstep into step=N partition dirs and never rewritten
  // (Iceberg merge-on-read shape: O(step) IO instead of O(items·steps)
  // copy-on-write). Only {frontier, bloom} — the resume-critical state — are
  // snapshot-versioned; readers filter partitions to the committed step, so
  // an uncommitted delta from a killed run is invisible (and is cleaned and
  // deterministically rewritten on resume).
  private def deltaDir = s"${cfg.statePath}/items_delta"
  private def logDir(name: String) = s"${cfg.statePath}/logs/$name"

  private def readStepPartitioned(base: String, upToStep: Int): Option[DataFrame] = {
    val d = new java.io.File(base)
    if (!d.isDirectory || d.listFiles() == null || d.listFiles().isEmpty) None
    else Some(spark.read.parquet(base).filter(col("step") <= upToStep))
  }

  private def readStepPartitioned(base: String, upToStep: Int,
      dataSchema: org.apache.spark.sql.types.StructType): Option[DataFrame] = {
    val d = new java.io.File(base)
    if (!d.isDirectory || d.listFiles() == null || d.listFiles().isEmpty) None
    else Some(spark.read.schema(dataSchema.add("step", "int"))
      .parquet(base).filter(col("step") <= upToStep))
  }

  private def readItemDeltas(upToStep: Int): Dataset[ImageItem] =
    readStepPartitioned(deltaDir, upToStep, itemSchema)
      .map(_.drop("step").as[ImageItem])
      .getOrElse(spark.emptyDataset[ImageItem])

  private def readFetchLogUpTo(upToStep: Int): Dataset[FetchLog] =
    readStepPartitioned(logDir("fetchlog"), upToStep, dropStep(fetchLogSchema))
      .map(_.as[FetchLog]).getOrElse(spark.emptyDataset[FetchLog])

  /** Remove step partitions newer than the committed step (left by a killed
    * run between delta write and snapshot commit).
    */
  private def cleanStale(base: String, committed: Int): Unit = {
    val d = new java.io.File(base)
    if (d.isDirectory) Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if (n.startsWith("step=") && n.substring(5).toInt > committed) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(f.toPath).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.delete)
      }
    }
  }

  def currentVersion: Option[Int] = store.latestVersion
  def stepOf(v: Int): Int = {
    val m = store.manifest(v)
    """"step":(-?\d+)""".r.findFirstMatchIn(m).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"manifest of v$v lacks step"))
  }

  def frontier: Dataset[CrawlJob] = readFrontier(currentVersion.get)
  def items: Dataset[ImageItem] =
    Items.resolve(readItemDeltas(stepOf(currentVersion.get)))
  def fetchLog: Dataset[FetchLog] = readFetchLogUpTo(stepOf(currentVersion.get))

  /** Read-time aggregation of the fetch log (see [[FetchLog]]). */
  def metrics: Dataset[StepMetrics] =
    fetchLog.groupBy(col("step"), col("host"))
      .agg(count(lit(1)).as("fetched"),
        sum(when(col("action") === "ok", 1L).otherwise(0L)).as("ok"),
        sum(when(col("status") >= 400, 1L).otherwise(0L)).as("errors"),
        sum(when(col("action") === "retry", 1L).otherwise(0L)).as("retried"),
        sum(when(col("status") >= 400 && col("action") === "stop", 1L).otherwise(0L))
          .as("deadLettered"),
        sum(col("itemsCreated")).as("itemsCreated"),
        sum(col("itemsUpdated")).as("itemsUpdated"),
        sum(col("spawnCount").cast("long")).as("jobsSpawned"))
      .as[StepMetrics]

  /** Read-time filter of the fetch log: permanently-failed fetches. */
  def deadLetters: Dataset[DeadLetter] =
    fetchLog.filter(col("status") >= 400 && col("action") === "stop")
      .select(col("urlKey"), col("url"), col("host"),
        col("routeId"), col("status"), col("errorCount"), col("step"))
      .as[DeadLetter]

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
      "version" -> 0, "step" -> -1, "frontier" -> n)) { dir =>
      jobsP.write.parquet(s"$dir/frontier")
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
    val committed = stepOf(v)
    var s = committed + 1
    Seq(deltaDir, logDir("fetchlog")).foreach(cleanStale(_, committed))

    val front = readFrontier(v)
    // localCheckpoint (eager) on shared intermediates: truncates lineage so
    // every downstream action analyzes a shallow scan instead of re-planning
    // the whole superstep tree — catalyst planning time was ~half of each
    // superstep's wall clock before this (measured via SparkListener).
    var wave = Politeness.wave(front, s, cfg.hostBudget, routeCaps,
        cfg.disabledRoutes, cfg.saltBuckets)
      .localCheckpoint(true)
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
        .localCheckpoint(true)
      waveN = wave.count()
      if (waveN == 0) { wave.unpersist(); return false }
    }

    // -- fetch+extract (narrow; wave is already salted-partitioned) ------
    val outcomes = FetchStage.run(wave, routesBc, fetcherBc)
      .localCheckpoint(true)

    // -- items path (append-only deltas; merge-on-read) ------------------
    val prevDeltas = readItemDeltas(committed)
      .select(col("key"), col("phash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val landedRaw = outcomes.flatMap(o =>
      o.items.map(it => Items.Landed(o.job.urlKey, it.copy(createdStep = s))))
    val landed =
      if (cfg.phashThreshold >= 0) {
        val keep = Items.suppressNearDups(
          landedRaw.map(_.item), prevDeltas, cfg.phashThreshold)
          .select(col("key")).distinct()
        landedRaw.join(broadcast(keep), landedRaw("item.key") === keep("key"), "left_semi")
          .as[Items.Landed]
      } else landedRaw
    val (delta0, flags0) = Items.mergeDelta(prevDeltas.select(col("key")), landed)
    val delta = delta0.localCheckpoint(true)
    val flags = flags0.localCheckpoint(true)
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
      .localCheckpoint(true)

    val bloom = readBloom(v)
    val sketchBytes = cfg.bloomPartitions *
      BloomSeen.estimatedShardBytes(cfg.bloomCapacityPerShard, cfg.bloomFpp)
    // While total sketch size fits the broadcast budget (i.e. until the
    // frontier reaches billions of keys) the shards live driver-side:
    // zero-shuffle broadcast probe + driver-merged insert. Beyond that the
    // cogroup paths take over — same semantics, fully distributed.
    val shardsLocal: Option[Array[BloomShard]] =
      if (sketchBytes <= cfg.bloomBroadcastMaxBytes) Some(readBloom(v).collect())
      else None
    val probed = (if (shardsLocal.isDefined) {
      val shardMap = shardsLocal.get.map(sh => sh.pid -> sh.sketch).toMap
      BloomSeen.probeBroadcast(spark.sparkContext.broadcast(shardMap),
        allowedJobs.select(col("urlKey")).as[Long], cfg.bloomPartitions)
    } else {
      BloomSeen.probe(bloom, allowedJobs.select(col("urlKey")).as[Long],
        cfg.bloomPartitions)
    }).toDF("urlKey", "might").persist(StorageLevel.MEMORY_AND_DISK)
    val definitelyNew = allowedJobs.join(
      broadcast(probed.filter(!col("might")).drop("might")), Seq("urlKey"), "left_semi")
    val maybeSeen = allowedJobs.join(
      broadcast(probed.filter(col("might")).drop("might")), Seq("urlKey"), "left_semi")
    // Exact check only on the bloom-positive sliver (true hits + fpp·new).
    // Flipped to two broadcast joins so the frontier is only column-scanned,
    // never shuffled: confirm which sliver keys exist, then anti-join the
    // sliver against that (small) confirmation set.
    val seenConfirmed = front.select(col("urlKey"))
      .join(broadcast(maybeSeen.select(col("urlKey"))), Seq("urlKey"), "left_semi")
    val confirmedNew = maybeSeen.join(
      broadcast(seenConfirmed), Seq("urlKey"), "left_anti")
    val prioByRoute = typedLit(routes.map { case (k, r) => k -> r.priority })
    val fresh = definitelyNew.unionByName(confirmedNew)
      .withColumn("priority", coalesce(element_at(prioByRoute, col("routeId")), lit(50)))
      .select(col("urlKey").as("_1"), col("url").as("_2"), col("host").as("_3"),
        col("routeId").as("_4"), col("priority").cast("int").as("_5"))
      .as[(Long, String, String, String, Int)]
      .map { case (k, u, h, r, p) =>
        CrawlJob(k, u, h, r, priority = p, createdStep = s + 1, notBeforeStep = s + 1)
      }
      .localCheckpoint(true)

    // -- job-state updates ----------------------------------------------
    // locals only in executor closures — capturing fields would serialize `this`
    val routesLocal = routesBc
    val backoffLocal = cfg.retryBackoffSteps
    val outDf = outcomes.map(o => (o.job, o.status, o.action, o.hasNextPage,
        o.newState, o.spawned.size))
      .toDF("job", "status", "action", "hasNext", "newState", "spawnCount")
    // One enriched relation feeds BOTH the frontier rewrite and the fetch
    // log — joined once, persisted, consumed twice.
    val enriched = outDf
      .join(broadcast(flagAgg), outDf("job.urlKey") === flagAgg("srcJob"), "left")
      .na.fill(0L, Seq("createdCnt", "updatedCnt"))
      .localCheckpoint(true)
    val updatedWave = enriched
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


    // -- frontier rewrite + per-host crawl-delay bump --------------------
    // wave is bounded (hosts × budget) → broadcast anti-join: the frontier
    // is scanned, not shuffled — the superstep's frontier rewrite is narrow.
    val waveKeys = wave.select(col("urlKey"))
    val untouched = front.join(broadcast(waveKeys), Seq("urlKey"), "left_anti").as[CrawlJob]
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
    val bloom2 = shardsLocal match {
      case Some(shards) =>
        val byPid = fresh.map(_.urlKey).collect()
          .groupBy(k => BloomSeen.pidOf(k, cfg.bloomPartitions))
        spark.createDataset(shards.map(sh =>
          byPid.get(sh.pid).map(ks => BloomSeen.insertLocal(sh, ks)).getOrElse(sh)).toSeq)
      case None =>
        BloomSeen.insert(bloom, fresh.map(_.urlKey), cfg.bloomPartitions)
    }

    // -- fetch log (single observability write; see FetchLog scaladoc) ----
    val stepFetchLog = enriched.select(
      lit(s).as("step"), col("job.host").as("host"), col("job.urlKey").as("urlKey"),
      col("job.url").as("url"), col("job.routeId").as("routeId"),
      col("job.state.currentPage").as("page"), col("status"),
      col("job.priority").as("priority"), col("job.createdStep").as("createdStep"),
      col("action"), col("job.errorCount").as("errorCount"), col("spawnCount"),
      col("createdCnt").as("itemsCreated"), col("updatedCnt").as("itemsUpdated"))

    // -- append-only writes (invisible until the snapshot commit below) ---
    // full write parallelism — item deltas carry the image bytes, and a
    // capped coalesce made this write a fixed serial cost that broke N-vs-4N
    // scaling (measured). Small steps produce small files; compaction is a
    // maintenance job, not a superstep cost.
    delta.write.mode("overwrite").parquet(s"$deltaDir/step=$s")
    stepFetchLog.drop("step").coalesce(1).write.mode("overwrite")
      .parquet(s"${logDir("fetchlog")}/step=$s")

    // -- commit: only resume-critical state is versioned ------------------
    store.commit(v + 1, SnapshotStore.manifestJson(
      "version" -> (v + 1), "step" -> s, "fetched" -> waveN)) { dir =>
      frontier3.write.parquet(s"$dir/frontier")
      bloom2.write.parquet(s"$dir/bloom")
    }
    store.expire(v + 1 - cfg.retainSnapshots + 1)

    Seq(wave, outcomes, allowedJobs, fresh, prevDeltas, delta, flags, probed,
        enriched).foreach(_.unpersist())
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
