package graft.fetch

import graft.corpus.CorpusRow
import graft.model.FetchedPage

/** Fetch abstraction. Production shape: one connection-pooled HTTP client per
  * executor partition (the reference's request-promise / Puppeteer pair,
  * src/spider.js:66-121, collapses to this single interface — `fetchMode`
  * would dispatch decode paths). The sandbox has zero egress, so the test
  * implementation resolves against the deterministic synthetic corpus.
  */
trait Fetcher extends Serializable {
  def fetch(url: String, attempt: Int): FetchedPage
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
