package graft.frontier

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.CrawlJob

/** Per-host politeness wave scheduler.
  *
  * Replaces the reference's serialized priority dequeue + per-route
  * concurrency gate (reference: src/nest.js:170-173 sort by priority,
  * nest.js:238-261 concurrency cap) with a deterministic BSP wave:
  * each superstep takes, per host, the top `hostBudget` eligible jobs in
  * (priority DESC, createdStep ASC, urlKey ASC) order, after dropping jobs
  * beyond their route's per-host concurrency cap — exactly the sequential
  * "dequeue highest-priority, skip capped routes" semantics, computed as two
  * ranking windows.
  *
  * Skew (a hot host with millions of pending jobs) is handled by a two-phase
  * top-k: a first ranking over (host, salt) — `salt = pmod(urlKey, S)` spreads
  * one host over S partitions, each keeping at most its local budget — then
  * the exact ranking over the ≤ S·k survivors per host. The second window
  * sees bounded input regardless of frontier skew, so no single task ever
  * ranks a whole hot host. (north rule: salted repartition + secondary sort.)
  */
object Politeness {

  val orderCols = Seq(col("priority").desc, col("createdStep").asc, col("urlKey").asc)

  /** Select the wave for `step`. `routeCaps` maps routeId → per-host cap
    * (-1 = unlimited, reference route.js:56); `disabled` routes are excluded
    * entirely (reference: config/engine.js:5-8 disabledRoutes).
    */
  def wave(
      frontier: Dataset[CrawlJob],
      step: Int,
      hostBudget: Int,
      routeCaps: Map[String, Int],
      disabled: Set[String] = Set.empty,
      saltBuckets: Int = 16): Dataset[CrawlJob] = {
    val spark = frontier.sparkSession
    import spark.implicits._

    val caps = typedLit(routeCaps.filter(_._2 >= 0))
    val eligible = frontier
      .filter(!col("state.finished") && col("notBeforeStep") <= lit(step))
      .filter(if (disabled.isEmpty) lit(true) else !col("routeId").isin(disabled.toSeq: _*))

    // Phase 1 — salted pre-top-k: bounds any single ranking partition.
    // Ranked per (host, salt, route) so that each route retains its own
    // top-hostBudget candidates: the sequential dequeue can backfill a
    // route-capped slot from any other route, so no route's candidates may
    // be crowded out by another's during pre-truncation. Survivors per host
    // ≤ saltBuckets · routes · hostBudget — bounded, whatever the skew.
    val salted = Window
      .partitionBy(col("host"), pmod(col("urlKey"), lit(saltBuckets)), col("routeId"))
      .orderBy(orderCols: _*)
    val phase1 = eligible
      .withColumn("rs", row_number().over(salted))
      .filter(col("rs") <= lit(hostBudget))
      .drop("rs")

    // Phase 2 — exact per-(host, route) cap, then per-host budget, over the
    // bounded survivor set.
    val byHostRoute = Window.partitionBy(col("host"), col("routeId")).orderBy(orderCols: _*)
    val byHost = Window.partitionBy(col("host")).orderBy(orderCols: _*)
    phase1
      .withColumn("routeRank", row_number().over(byHostRoute))
      .withColumn("cap", element_at(caps, col("routeId")))
      .filter(col("cap").isNull || col("routeRank") <= col("cap"))
      .withColumn("hostRank", row_number().over(byHost))
      .filter(col("hostRank") <= lit(hostBudget))
      .drop("routeRank", "cap", "hostRank")
      .as[CrawlJob]
  }
}
