package graft

import graft.corpus._
import graft.engine.{CrawlEngine, EngineConfig}
import graft.fetch.{CorpusFetcher, Fetcher}
import graft.model.FetchedPage

/** A mock headless browser behind the [[Fetcher]] contract: the static
  * fetch returns only the page "shell" (what the HTTP body contains before
  * scripts run — no scrapable content), while `fetchDynamic` returns the
  * RENDERED page (the reference's Puppeteer `openDynamic` + jQuery-injected
  * DOM, spider.js:90-121). A production browser pool implements exactly
  * this surface — per-partition Browser instances created lazily, a nav
  * timeout mapping to a retryable status — see DEPLOY.md.
  */
final class MockBrowserFetcher(rendered: CorpusFetcher) extends Fetcher {
  /** JS-shell page: 200 but nothing scrapable (an empty JSON doc — the
    * listing scraper finds no links, spawns nothing). */
  override def fetch(url: String, attempt: Int): FetchedPage =
    FetchedPage(url, graft.canon.UrlCanon.host(url), 200, "application/json",
      "{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  override def fetchDynamic(url: String, attempt: Int): FetchedPage =
    rendered.fetch(url, attempt)
}

/** Dynamic-only-route end-to-end: proves the Fetcher trait contract is
  * sufficient for a real browser-backed deployment — a site whose content
  * exists only after rendering is fully crawlable when its routes are
  * marked `dynamic`, and lands nothing through the static path.
  */
class DynamicFetchSpec extends SparkSpec {

  val spec = CorpusSpec(hosts = 1, listPages = 2, detailsPerList = 4)
  def liveIds: Seq[Long] = (0L until spec.totalDetails).filter(_ % spec.deadMod != 7)
  def suppressed: Int = (0L until spec.totalDetails)
    .count(id => id % spec.nearDupMod == 3 && id > 0 &&
      id % spec.deadMod != 7 && (id - 1) % spec.deadMod != 7)

  private def crawl(dynamicRoutes: Boolean): CrawlEngine = {
    val routes = SiteRoutes.registry(spec)
      .map { case (k, r) => k -> r.copy(dynamic = dynamicRoutes) }
    val eng = new CrawlEngine(spark, routes,
      new MockBrowserFetcher(new CorpusFetcher(SyntheticCorpus.buildLocal(spec))),
      Nil, EngineConfig(statePath = tmpDir("dyn"), hostBudget = 4,
        bloomPartitions = 4, bloomCapacityPerShard = 1 << 16))
    eng.seed(SyntheticCorpus.seeds(spec))
    eng.run()
    eng
  }

  test("dynamic-only routes crawl the rendered site end-to-end") {
    val eng = crawl(dynamicRoutes = true)
    val items = eng.items.collect()
    assert(items.length == liveIds.size - suppressed,
      s"items=${items.length} live=${liveIds.size} suppressed=$suppressed")
    // rendered content really flowed through fetchDynamic: captions + bytes
    val corpus = SyntheticCorpus.buildLocal(spec)
    items.foreach { it =>
      assert(it.caption == corpus(it.link).caption)
      assert(java.util.Arrays.equals(it.bytes, corpus(it.link).body))
    }
  }

  test("the same site through the static path lands nothing (content is JS-rendered)") {
    val eng = crawl(dynamicRoutes = false)
    assert(eng.items.count() == 0, "static shell pages must scrape empty")
  }
}
