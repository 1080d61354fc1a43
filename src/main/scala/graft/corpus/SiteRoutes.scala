package graft.corpus

import com.fasterxml.jackson.databind.ObjectMapper
import graft.canon.UrlCanon
import graft.model._

/** RouteSpecs for the synthetic 2-route site — the user-surface analogue of
  * the reference's route modules (reference: src/route.js:22-66; scraper
  * contract src/spider.js:290-334). Scrapers are pure Scala functions
  * shipped in the broadcast route registry.
  */
object SiteRoutes {

  private val mapper = new ObjectMapper()

  /** listing: JSON page → spawn one detail job per link + pagination bit.
    * concurrency 1 per host (mirrors the reference's concurrency-1 test
    * route, test/mocks/route.js:3-13); priority 60 > detail's 50 so listings
    * drain first — deterministic, oracle-replicated.
    */
  def listing(spec: CorpusSpec, concurrency: Int = 1): RouteSpec = RouteSpec(
    key = SyntheticCorpus.LISTING,
    urlTemplate = q => s"http://${q("host")}/list?p=1",
    paginate = (url, page) => {
      // swap the p= query param; identity stays the page-1 URL
      UrlCanon.canonicalize(url.replaceAll("([?&])p=\\d+", s"$$1p=$page"))
    },
    scraper = page => {
      if (page.status != 200) ScrapeResult()
      else {
        val root = mapper.readTree(page.bodyString)
        val links = (0 until root.path("links").size())
          .map(i => root.path("links").get(i).asText())
        val jobs = links.map(l =>
          SpawnedJob(SyntheticCorpus.DETAIL, UrlCanon.resolve(page.url, l)))
        ScrapeResult(
          jobs = jobs,
          hasNextPage = root.path("hasNext").asBoolean(false),
          state = Map("lastListing" -> page.url))
      }
    },
    onError = (status, _) =>
      if (status >= 500) ErrorAction.Retry else ErrorAction.Stop,
    concurrency = concurrency,
    priority = 60,
    test = Some(RouteTest(query = Map("host" -> "h0.test"),
      shouldSpawnJobs = true)))

  /** detail: image page → one ImageItem. Caption arrives in page.meta (the
    * synthetic stand-in for surrounding HTML); phash recomputed from the
    * fetched bytes so fidelity is checked against what actually landed.
    */
  def detail(spec: CorpusSpec, concurrency: Int = 4): RouteSpec = RouteSpec(
    key = SyntheticCorpus.DETAIL,
    urlTemplate = q => q("url"),
    scraper = page => {
      if (page.status != 200 || page.body == null) ScrapeResult()
      else {
        val fmt = if (page.contentType == "image/jpeg") "jpeg" else "png"
        val img = Images.decode(page.body)
        val id = page.url.substring(page.url.lastIndexOf('/') + 1)
        val item = ImageItem(
          key = UrlCanon.canonicalize(page.url).toLowerCase.trim,
          name = s"image $id",
          itemType = "content",
          link = page.url,
          route = SyntheticCorpus.DETAIL,
          routeWeight = 50,
          createdStep = -1, // stamped by the engine
          image_id = id,
          bytes = page.body,
          w = img.getWidth,
          h = img.getHeight,
          fmt = fmt,
          caption = page.meta.getOrElse("caption", ""),
          phash = Images.phash(img))
        ScrapeResult(items = Seq(item))
      }
    },
    onError = (status, _) =>
      if (status >= 500) ErrorAction.Retry else ErrorAction.Stop,
    concurrency = concurrency,
    priority = 50,
    test = Some(RouteTest(query = Map("url" -> "http://h0.test/img/0"),
      shouldCreateItems = true)))

  def registry(spec: CorpusSpec, listingConcurrency: Int = 1,
      detailConcurrency: Int = 4): Map[String, RouteSpec] =
    Seq(listing(spec, listingConcurrency), detail(spec, detailConcurrency))
      .map(r => r.key -> r).toMap

  /** Query-templated variant of the registry — the reference's primary
    * enqueue surface (`nest.queue(routeKey, {query})`, nest.js:86-97;
    * spawned ops `{routeId, query}`, worker.js:281-292): the listing spawns
    * detail jobs by (host, id) QUERY params instead of URLs, and the detail
    * route builds its URL from the template. Crawl results must be
    * identical to [[registry]]'s URL-driven run (same final URLs).
    */
  def queryRegistry(spec: CorpusSpec, listingConcurrency: Int = 1,
      detailConcurrency: Int = 4): Map[String, RouteSpec] = {
    val base = listing(spec, listingConcurrency)
    val qListing = base.copy(
      scraper = page => {
        if (page.status != 200) ScrapeResult()
        else {
          val root = mapper.readTree(page.bodyString)
          val links = (0 until root.path("links").size())
            .map(i => root.path("links").get(i).asText())
          val jobs = links.map { l =>
            val id = l.substring(l.lastIndexOf('/') + 1)
            SpawnedJob(SyntheticCorpus.DETAIL, url = "",
              query = Map("host" -> page.host, "id" -> id))
          }
          ScrapeResult(jobs = jobs,
            hasNextPage = root.path("hasNext").asBoolean(false),
            state = Map("lastListing" -> page.url))
        }
      })
    val qDetail = detail(spec, detailConcurrency).copy(
      urlTemplate = q => s"http://${q("host")}/img/${q("id")}")
    Seq(qListing, qDetail).map(r => r.key -> r).toMap
  }
}
