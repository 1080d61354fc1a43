package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{CorpusSpec, SynthFetcher, SyntheticCorpus}
import graft.fetch.CorpusFetcher

/** SynthFetcher (on-demand, bench-scale) must be byte-identical to the
  * prebuilt-index CorpusFetcher for every URL of the site.
  */
class SynthFetcherSpec extends AnyFunSuite {
  test("on-demand fetcher equals prebuilt corpus fetcher") {
    val spec = CorpusSpec(hosts = 2, listPages = 2, detailsPerList = 5)
    val pre = new CorpusFetcher(SyntheticCorpus.buildLocal(spec))
    val syn = new SynthFetcher(spec)
    val urls =
      (0 until spec.hosts).flatMap(h => (1 to spec.listPages).map(p => spec.listUrl(h, p))) ++
      (0L until spec.totalDetails).map(id => spec.detailUrl(spec.hostOf(id), id)) ++
      Seq("http://h0.test/img/999999", "http://nohost.test/x", "http://h1.test/list?p=99")
    urls.foreach { u =>
      (0 to 1).foreach { attempt =>
        val a = pre.fetch(u, attempt)
        val b = syn.fetch(u, attempt)
        assert(a.status == b.status, s"$u status")
        assert(a.contentType == b.contentType, s"$u ct")
        assert(a.meta == b.meta, s"$u meta")
        assert(java.util.Arrays.equals(a.body, b.body), s"$u body")
      }
    }
  }
}
