package graft.fetch

import graft.corpus.CorpusRow
import graft.model.FetchedPage

/** Fetch abstraction — the reference's static/dynamic fetch pair
  * (request-promise `openStatic` spider.js:66-83; Puppeteer `openDynamic`
  * spider.js:90-110, selected per route by `route.dynamic` and globally by
  * FORCE_DYNAMIC, spider.js:21,52,185). Production shape: one
  * connection-pooled HTTP client (+ one headless-browser pool for dynamic)
  * per executor partition. The sandbox has zero egress, so the test
  * implementation resolves against the deterministic synthetic corpus.
  */
trait Fetcher extends Serializable {
  def fetch(url: String, attempt: Int): FetchedPage

  /** Headless-browser fetch for `dynamic` routes. Default falls back to the
    * static fetch — no browser runtime exists in this sandbox; a real
    * deployment overrides this with a per-partition browser pool (the
    * engine-side dispatch, retry policy, and scrape pipeline are identical
    * either way).
    */
  def fetchDynamic(url: String, attempt: Int): FetchedPage = fetch(url, attempt)
}

/** Corpus-backed fetcher. `attempt` models the reference's retry loop
  * (spider.js:226-248): a row with `failTimes = f` returns 500 for the first
  * f attempts, then its real status. Unknown URLs are 404.
  */
final class CorpusFetcher(index: Map[String, CorpusRow]) extends Fetcher {
  override def fetch(url: String, attempt: Int): FetchedPage =
    index.get(url) match {
      case None =>
        FetchedPage(url, graft.canon.UrlCanon.host(url), 404, "text/plain",
          Array.emptyByteArray)
      case Some(row) if attempt < row.failTimes =>
        FetchedPage(url, row.host, 500, "text/plain", Array.emptyByteArray)
      case Some(row) =>
        val meta = if (row.caption != null) Map("caption" -> row.caption)
                   else Map.empty[String, String]
        FetchedPage(url, row.host, row.statusCode, row.contentType, row.body, meta)
    }
}
