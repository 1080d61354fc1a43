package graft.corpus

import graft.fetch.Fetcher
import graft.model.FetchedPage

/** Fetcher that synthesizes the corpus page ON DEMAND from the URL — no
  * prebuilt index, no broadcast: each executor generates (deterministically)
  * exactly the pages it fetches. This is the bench-scale fetcher: the per-URL
  * work (render + encode on the "server" side, decode + phash in the
  * scraper) stands in for network+parse cost, and the data volume scales to
  * millions of URLs without any driver-side corpus build.
  *
  * Byte-identical to [[SyntheticCorpus.buildLocal]] + [[graft.fetch.CorpusFetcher]]
  * for every URL of the spec's site (asserted by SynthFetcherSpec).
  */
final class SynthFetcher(spec: CorpusSpec) extends Serializable with Fetcher {

  private val ListRe = "^http://h(\\d+)\\.test/list\\?p=(\\d+)$".r
  private val ImgRe = "^http://h(\\d+)\\.test/img/(\\d+)$".r

  private def toPage(row: CorpusRow, attempt: Int): FetchedPage =
    if (attempt < row.failTimes)
      FetchedPage(row.url, row.host, 500, "text/plain", Array.emptyByteArray)
    else {
      val meta = if (row.caption != null) Map("caption" -> row.caption)
                 else Map.empty[String, String]
      FetchedPage(row.url, row.host, row.statusCode, row.contentType, row.body, meta)
    }

  override def fetch(url: String, attempt: Int): FetchedPage = url match {
    case ListRe(h, p) if h.toInt < spec.hosts && p.toInt >= 1 && p.toInt <= spec.listPages =>
      toPage(SyntheticCorpus.listingRow(spec, h.toInt, p.toInt), attempt)
    case ImgRe(h, id) if h.toInt < spec.hosts && id.toLong < spec.totalDetails &&
        spec.hostOf(id.toLong) == h.toInt =>
      toPage(SyntheticCorpus.detailRow(spec, id.toLong, withPhash = false), attempt)
    case _ =>
      FetchedPage(url, graft.canon.UrlCanon.host(url), 404, "text/plain",
        Array.emptyByteArray)
  }
}
