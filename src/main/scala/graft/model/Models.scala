package graft.model

/** Typed data model of the crawl engine.
  *
  * Mirrors the reference's three record kinds (reference: src/db/queue.js:16-40
  * jobs, src/db/item.js:12-49 items, src/route.js:22-66 routes) re-expressed
  * as Spark-encodable case classes. All time/ordering fields are logical
  * (superstep sequence numbers), never wall-clock — the engine is fully
  * deterministic for oracle parity.
  */

/** Per-job counters (reference: src/db/queue.js:23-29; `results` is a dead
  * field there and is dropped here).
  */
case class JobStats(
    pages: Int = 0,
    items: Int = 0,
    updated: Int = 0,
    spawned: Int = 0)

/** Mutable crawl-progress state (reference: src/db/queue.js:31-37). `data` is
  * the scraper-defined carry-over state merged across pages (right-wins,
  * reference: src/worker.js:231-233).
  */
case class JobState(
    currentPage: Int = 1,
    finished: Boolean = false,
    startedStep: Int = -1,
    finishedStep: Int = -1,
    data: Map[String, String] = Map.empty)

/** A frontier entry. Identity for the URL-seen set is `urlKey =
  * xxhash64(canonical url)` — pagination continuations keep the SAME identity
  * (the reference mutates one job doc across pages rather than re-enqueueing,
  * src/worker.js:223-229, so page number is internal state, not identity).
  *
  * `createdStep` = superstep at which the job entered the frontier (seed
  * jobs: 0); ties inside a (host, priority, createdStep) group break on
  * `urlKey` — the deterministic dequeue order the oracle replicates.
  */
case class CrawlJob(
    urlKey: Long,
    url: String,
    host: String,
    routeId: String,
    priority: Int = 50,
    createdStep: Int = 0,
    errorCount: Int = 0,
    notBeforeStep: Int = 0,
    stats: JobStats = JobStats(),
    state: JobState = JobState(),
    /** URL-template parameters this job was enqueued with (the reference's
      * `job.query`, queue.js:18; URL built via `route.getUrl(job)`,
      * route.js:31-37). The engine resolves the template at ENQUEUE time —
      * `url` is always concrete — so identity stays xxhash64(canon(url))
      * and the frontier never re-runs user code per fetch.
      */
    query: Map[String, String] = Map.empty)

/** A landed item (reference: src/db/item.js + BASELINE input_hint payload).
  * Core columns mirror the reference's fixed schema; the image payload is the
  * driver-mandated shape `(image_id, bytes, w, h, fmt, caption, phash)`;
  * `props` carries the reference's open-schema remainder (item.js:49
  * strict:false).
  */
case class ImageItem(
    key: String,
    name: String,
    itemType: String,
    link: String,
    route: String,
    routeWeight: Int,
    createdStep: Int,
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long,
    props: Map[String, String] = Map.empty)

/** Transient fetch result handed to scrapers (reference: src/page.js:32-53).
  * `meta` plays the role of response headers/surroundings (e.g. the caption
  * for an image response). JSON bodies are detected by contentType, mirroring
  * page.js's JSON auto-detect (page.js:14-23).
  */
case class FetchedPage(
    url: String,
    host: String,
    status: Int,
    contentType: String,
    body: Array[Byte],
    meta: Map[String, String] = Map.empty) {
  def isJson: Boolean = contentType.startsWith("application/json")
  def bodyString: String =
    if (body == null) "" else new String(body, java.nio.charset.StandardCharsets.UTF_8)
}

/** One scraper invocation's output (reference: src/spider.js:290-334 —
  * `{items, jobs, hasNextPage, state}` with defaults at spider.js:296-300).
  */
/** A job emitted by a scraper: either a concrete `url`, or `query` params
  * resolved through the target route's `urlTemplate` (the reference's
  * spawned op shape `{routeId, query}`, worker.js:281-292).
  */
case class SpawnedJob(routeId: String, url: String,
    query: Map[String, String] = Map.empty)
case class ScrapeResult(
    items: Seq[ImageItem] = Nil,
    jobs: Seq[SpawnedJob] = Nil,
    hasNextPage: Boolean = false,
    state: Map[String, String] = Map.empty)

/** Route definition (reference: src/route.js:22-66). Scrapers are plain Scala
  * functions shipped to executors via the broadcast route registry —
  * the reference's UDTF-like user surface (route.scraper, route.js:40-42).
  *
  * `concurrency` = max in-flight fetches for this route per host per
  * superstep (-1 = unlimited, route.js:56); `transitionDelay` = min
  * supersteps between successive pages of one job (route.js:59 ms → logical
  * steps); `retryCount` default 3 (spider.js:23).
  */
/** Per-route self-test declaration (reference: `route.test =
  * {query, shouldSpawnJobs, shouldCreateItems}`, route.js:53; harness
  * test/routes.js:68-97 — positive-only assertions). Driven by
  * [[graft.testkit.RouteHarness]].
  */
case class RouteTest(
    query: Map[String, String] = Map.empty,
    shouldSpawnJobs: Boolean = false,
    shouldCreateItems: Boolean = false)

case class RouteSpec(
    key: String,
    urlTemplate: Map[String, String] => String,
    scraper: FetchedPage => ScrapeResult,
    /** Effective fetch URL for page N of a job (reference interpolates
      * `state.currentPage` into the URL template, README.md:223). Identity
      * (urlKey) stays that of page 1.
      */
    paginate: (String, Int) => String = (u, _) => u,
    checkStatus: FetchedPage => Int = p => p.status,
    onError: (Int, Int) => ErrorAction = (_, _) => ErrorAction.Retry,
    concurrency: Int = -1,
    transitionDelay: Int = 0,
    retryCount: Int = 3,
    priority: Int = 50,
    test: Option[RouteTest] = None,
    /** fetch pages with the dynamic (headless-browser) fetcher — the
      * reference's `route.dynamic` (spider.js:52,185). */
    dynamic: Boolean = false)

/** Engine-level worker hooks (reference: src/worker.js + src/nest.js).
  * All run inside fetch tasks / the scheduler — pure Scala functions shipped
  * by broadcast, no driver round-trips.
  */
case class WorkerHooks(
    /** Per-fetch-task setup, run once before a task's first job — the
      * worker's `initialize` (reference: src/worker.js:57-65; the
      * `shouldReinitialize`-on-route-change variant, worker.js:145-155, has
      * no analogue because our tasks are route-heterogeneous by design).
      */
    initialize: Option[() => Unit] = None,
    /** Extra dequeue predicate ANDed into wave eligibility — the worker's
      * `getJobQuery` extra query constraints (reference: src/nest.js:142-166).
      * Jobs failing it stay in the frontier, undequeued.
      */
    jobFilter: Option[CrawlJob => Boolean] = None,
    /** Replaces fetch+scrape wholesale for matching jobs — the worker's
      * custom `process(job, route)` (reference: src/worker.js:195-199).
      * Returning None falls through to the normal fetch path for that job.
      * Output still passes sanitize, exactly like a scraped result.
      */
    process: Option[CrawlJob => Option[ScrapeResult]] = None)

sealed trait ErrorAction
object ErrorAction {
  /** Re-emit into a later wave while errorCount <= retryCount (spider.js:226-227). */
  case object Retry extends ErrorAction
  /** Give up immediately → dead-letter (reference 'stop', spider.js:239-244). */
  case object Stop extends ErrorAction
  /** Jump to a different URL, same lineage (spider.js:253-258). */
  case class Redirect(url: String) extends ErrorAction
}

/** robots.txt rule row (north-rule addition; broadcast-joined). Longest
  * matching `pathPrefix` wins per host; `allow=false` blocks the URL;
  * `crawlDelaySteps` lower-bounds supersteps between fetches of that host.
  */
case class RobotsRule(host: String, pathPrefix: String, allow: Boolean, crawlDelaySteps: Int)

/** Per-superstep, per-host fetch metrics row (north rule: per-partition
  * lineage + fetch metrics; replaces the reference's event emitter
  * counters, src/emitter.js + worker.js:137-142). Derived at read time by
  * aggregating the per-fetch log — the engine never spends superstep wall
  * time on observability aggregation.
  */
case class StepMetrics(
    step: Int,
    host: String,
    fetched: Long,
    ok: Long,
    errors: Long,
    retried: Long,
    deadLettered: Long,
    itemsCreated: Long,
    itemsUpdated: Long,
    jobsSpawned: Long)
