package graft.testkit

import graft.fetch.{FetchStage, Fetcher}
import graft.model.{RouteSpec, ScrapeResult}

/** Generic per-route test harness — the Spark-library twin of the
  * reference's route test generator (reference: test/routes.js:68-97:
  * build a job from `route.test.query`, fetch via `route.getUrl`, scrape,
  * then POSITIVE-only assertions — `shouldSpawnJobs` ⇒ jobs nonempty,
  * `shouldCreateItems` ⇒ items nonempty).
  *
  * Pure single-page check, no Spark session needed: a user points it at
  * their RouteSpec registry + a Fetcher and gets one pass/fail per route —
  * e.g. from a ScalaTest suite:
  * {{{
  * routes.values.filter(_.test.isDefined).foreach { r =>
  *   test(s"route ${r.key}") { assert(RouteHarness.check(r, fetcher).isRight) }
  * }
  * }}}
  */
object RouteHarness {

  /** Run one route's declared self-test. Right(scraped) on success; Left
    * explains the failure (no test declared / fetch error / expectation
    * miss). Scrape output passes through the engine's sanitize, so
    * expectations see exactly what a crawl would land.
    */
  def check(route: RouteSpec, fetcher: Fetcher): Either[String, ScrapeResult] =
    route.test match {
      case None => Left(s"route ${route.key} declares no test (route.test)")
      case Some(t) =>
        val url =
          try route.urlTemplate(t.query)
          catch { case e: Exception =>
            return Left(s"route ${route.key}: urlTemplate failed on test query: $e") }
        val page = fetcher.fetch(route.paginate(url, 1), 0)
        val status = route.checkStatus(page)
        if (status >= 400)
          Left(s"route ${route.key}: fetch of $url failed, status=$status")
        else {
          val scraped = FetchStage.sanitize(route.scraper(page), route.key)
          if (t.shouldSpawnJobs && scraped.jobs.isEmpty)
            Left(s"route ${route.key}: new crawling jobs were not spawned")
          else if (t.shouldCreateItems && scraped.items.isEmpty)
            Left(s"route ${route.key}: no items scraped from page")
          else Right(scraped)
        }
    }

  /** Check every tested route in a registry; routes without a declared test
    * are skipped with a hint (reference: test/routes.js:24-26).
    * @return (routeKey → failure message) for each failing route.
    */
  def checkAll(routes: Map[String, RouteSpec], fetcher: Fetcher)
      : Map[String, String] =
    routes.values.filter(_.test.isDefined).flatMap { r =>
      check(r, fetcher).left.toOption.map(r.key -> _)
    }.toMap
}
