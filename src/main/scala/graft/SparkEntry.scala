package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.corpus.{CorpusSpec, SiteRoutes, SyntheticCorpus}
import graft.engine.{CrawlEngine, EngineConfig}
import graft.fetch.CorpusFetcher
import graft.ops.{GraphOps, MultimodalOps, RelationalQueries, StreamingOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Run a deterministic end-to-end crawl of a synthetic image+caption site
    * and return the landed items table. sfDir-independent (the crawl corpus
    * is the engine's own; driver testdata has no URL graph).
    */
  private def crawl(s: SparkSession, spec: CorpusSpec, budget: Int): DataFrame = {
    val eng = new CrawlEngine(s, SiteRoutes.registry(spec),
      new CorpusFetcher(SyntheticCorpus.buildLocal(spec)), Nil,
      EngineConfig(
        statePath = java.nio.file.Files.createTempDirectory("graft-crawl").toString,
        hostBudget = budget, bloomPartitions = 4,
        bloomCapacityPerShard = 1 << 18))
    eng.seed(SyntheticCorpus.seeds(spec))
    eng.run()
    eng.items.select(col("key"), col("image_id"), col("w"), col("h"),
        col("fmt"), col("caption"), col("phash"))
      .orderBy(col("key"))
  }

  /** Flagship: full crawl superstep loop on a small site; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    crawl(spark, CorpusSpec(hosts = 1, listPages = 2, detailsPerList = 4), budget = 4)

  /** One entry per implemented operator from SURVEY.md §2 + the
    * training-data-pipeline ops (dedup / similarity / text / multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextOps.queries ++ VectorOps.queries ++
      MultimodalOps.queries ++ StreamingOps.queries ++ GraphOps.queries ++ Map(
        "q50_crawl_e2e" -> ((s: SparkSession, _: String) =>
          crawl(s, CorpusSpec(hosts = 2, listPages = 2, detailsPerList = 6), budget = 8)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Hash-based / engine-corpus ops are intentionally
    * absent → driver records the weaker rows-only check for those.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextOps.oracle ++ VectorOps.oracle ++
      MultimodalOps.oracle ++ StreamingOps.oracle ++ GraphOps.oracle
}
