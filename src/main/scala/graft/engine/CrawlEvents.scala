package graft.engine

import org.apache.spark.sql.Dataset

/** The reference's fine-grained worker event taxonomy, re-expressed as
  * typed filters over a committed step's [[FetchLog]] — the batch analogue
  * of per-job callbacks (reference: src/worker.js:95-161 `job:assigned`,
  * `job:noop`, `job:start`, `jobs:created`, `scraped:page`, `job:next`,
  * `job:finish`; src/emitter.js:53-63 fan-out chain).
  *
  * A [[CrawlEngine.StepListener]] receives each committed step's log once;
  * these selectors split it into the reference's per-event streams, so a
  * consumer subscribing to "finished jobs" writes
  * `CrawlEvents.jobsFinished(stepLog)` instead of re-deriving the flag
  * algebra. All are narrow filters over the already-landed byte-free log —
  * no extra scans, no shuffles, composable with further Dataset ops.
  */
object CrawlEvents {

  /** Pages fetched + scraped successfully — `scraped:page`
    * (worker.js:120-127). */
  def scrapedPages(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(_.action == "ok")

  /** Jobs that terminated this step (last page, dead-letter or redirect) —
    * `job:finish` (worker.js:137-142). */
  def jobsFinished(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(_.finished)

  /** Jobs continuing to their next page — `job:next` pagination
    * (worker.js:223-233). */
  def jobsPaginating(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(l => l.action == "ok" && !l.finished)

  /** Retryable failures re-queued into a later wave (spider.js:226-248). */
  def jobsRetried(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(_.action == "retry")

  /** Permanent failures — the dead-letter rows (spider.js:239-244). */
  def jobsDeadLettered(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(l => l.status >= 400 && l.action == "stop")

  /** Fetches whose scrape spawned new frontier jobs — `jobs:created`
    * (worker.js:111-118). */
  def jobsCreated(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(_.spawnCount > 0)

  /** Fetches that landed at least one NEW item — the item-side of
    * `scraped:page` stats (worker.js:120-127, db/item.js:86-99 upsert
    * inserted-vs-updated split). */
  def itemsCreated(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(_.itemsCreated > 0)

  /** Fetches that only updated existing items (the upsert's other half). */
  def itemsUpdated(log: Dataset[FetchLog]): Dataset[FetchLog] =
    log.filter(l => l.itemsUpdated > 0 && l.itemsCreated == 0)
}
