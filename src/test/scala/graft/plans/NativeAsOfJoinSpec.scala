package graft.plans

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{AsOfJoin, NativeAsOfJoin}

/** The native-plan as-of join (AsOfJoinPlan → GraftStrategy →
  * AsOfJoinExec) against its composed twin and against hand-computed
  * truth — plus the plan-shape assertions that make it a real physical
  * operator, not a decorated shuffle.
  */
class NativeAsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def trades: DataFrame = Seq(
    ("t1", "a", 10L), ("t2", "a", 20L), ("t3", "a", 5L),
    ("t4", "b", 7L), ("t5", "c", 100L)
  ).toDF("trade_id", "acct", "ts")

  private def quotes: DataFrame = Seq(
    ("a", 8L, 1.0), ("a", 10L, 2.0), ("a", 15L, 3.0),
    ("b", 9L, 4.0), ("d", 1L, 9.9)
  ).toDF("acct", "q_ts", "px")

  test("native backward: latest right <= left time, per key, left-outer") {
    val out = NativeAsOfJoin.asofJoin(trades, quotes, "acct", "ts", "q_ts",
      Seq("q_ts", "px"))
      .select("trade_id", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out === Map(
      "t1" -> Some(2.0),  // q_ts=10 ties left ts → inclusive
      "t2" -> Some(3.0),
      "t3" -> None,       // no quote at or before 5
      "t4" -> None,       // b's only quote is at 9 > 7
      "t5" -> None))      // key c has no quotes
  }

  test("native forward: earliest right >= left time, per key") {
    val out = NativeAsOfJoin.asofJoin(trades, quotes, "acct", "ts", "q_ts",
      Seq("q_ts", "px"), direction = "forward")
      .select("trade_id", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out === Map(
      "t1" -> Some(2.0),  // inclusive at 10
      "t2" -> None,       // nothing at/after 20
      "t3" -> Some(1.0),
      "t4" -> Some(4.0),
      "t5" -> None))
  }

  test("duplicate right timestamps resolve to the payload-max row, both directions, matching the composed operator") {
    val dupQuotes = Seq(
      ("a", 10L, 1.0), ("a", 10L, 7.0), ("a", 10L, 3.0)
    ).toDF("acct", "q_ts", "px")
    for (dir <- Seq("backward", "forward")) {
      val native = NativeAsOfJoin.asofJoin(
        trades.filter($"trade_id" === "t1"), dupQuotes,
        "acct", "ts", "q_ts", Seq("px"), dir)
        .select("asof_px").as[Option[Double]].head()
      val composed = AsOfJoin.asofJoin(
        trades.filter($"trade_id" === "t1"), dupQuotes,
        "acct", "ts", "q_ts", Seq("px"), dir)
        .select("asof_px").as[Option[Double]].head()
      assert(native === Some(7.0), s"dir=$dir")
      assert(native === composed, s"dir=$dir")
    }
  }

  test("null keys and null left timestamps never match; null right timestamps never match (DuckDB ASOF semantics)") {
    val l = Seq(
      (Some("a"), Some(10L), "ok"),
      (None: Option[String], Some(10L), "nullkey"),
      (Some("a"), None: Option[Long], "nullts")
    ).toDF("k", "ts", "tag")
    val r = Seq(
      (Some("a"), Some(5L), 1.0),
      (Some("a"), None: Option[Long], 99.0), // null ts: must never match
      (None: Option[String], Some(1L), 50.0) // null key: must never match
    ).toDF("k", "q_ts", "px")
    val out = NativeAsOfJoin.asofJoin(l, r, "k", "ts", "q_ts", Seq("px"))
      .select("tag", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out === Map(
      "ok" -> Some(1.0), "nullkey" -> None, "nullts" -> None))
  }

  test("randomized parity with the composed operator (20 seeds, both directions, self-join shape)") {
    for (seed <- 1 to 20; dir <- Seq("backward", "forward")) {
      val rnd = new Random(seed)
      // small key space + small time space → dense ties and misses
      val lRows = Seq.fill(60)(
        (rnd.nextInt(6).toString, rnd.nextInt(30).toLong, rnd.nextInt(1000)))
      val rRows = Seq.fill(60)(
        (rnd.nextInt(8).toString, rnd.nextInt(30).toLong, rnd.nextDouble()))
      val l = lRows.toDF("k", "ts", "tag")
      val r = rRows.toDF("k", "q_ts", "px")
      val native = NativeAsOfJoin
        .asofJoin(l, r, "k", "ts", "q_ts", Seq("q_ts", "px"), dir)
        .select("k", "ts", "tag", "asof_q_ts", "asof_px")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val composed = AsOfJoin
        .asofJoin(l, r, "k", "ts", "q_ts", Seq("q_ts", "px"), dir)
        .select("k", "ts", "tag", "asof_q_ts", "asof_px")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(native === composed, s"seed=$seed dir=$dir")
    }
  }

  test("self-join on one source resolves (shared exprIds re-aliased)") {
    val e = graft.core.Tables.load(spark, sf0001, "events")
    val errors = e.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"value".as("click_value"))
    val native = NativeAsOfJoin.asofJoin(
      errors, clicks, "user_id", "ts", "click_ts",
      Seq("click_ts", "click_value"))
    val composed = AsOfJoin.asofJoin(
      errors, clicks, "user_id", "ts", "click_ts",
      Seq("click_ts", "click_value"))
    assert(native.collect().map(_.toSeq).sortBy(_.mkString("|")) ===
      composed.collect().map(_.toSeq).sortBy(_.mkString("|")))
  }

  test("plan shape: AsOfJoinExec present, exactly one exchange + one sort per side, output reusable") {
    val l = (1 to 100).map(i => (i % 7, i.toLong, i)).toDF("k", "ts", "v")
    val r = (1 to 100).map(i => (i % 5, i.toLong, i * 1.0)).toDF("k", "q_ts", "px")
    val df = NativeAsOfJoin.asofJoin(l, r, "k", "ts", "q_ts", Seq("px"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) { case e: AsOfJoinExec => e }
    assert(execs.size === 1, plan.toString)
    val shuffles = collect(plan) {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s }
    assert(shuffles.size === 2, s"want the two key exchanges, got:\n$plan")
    val sorts = collect(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.size === 2, s"want one spillable sort per side, got:\n$plan")
    // grouping downstream on the as-of key must NOT re-shuffle: the
    // exec declares left partitioning as its own
    val agg = df.groupBy("k").count()
    agg.collect()
    val aggShuffles = collect(agg.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s }
    assert(aggShuffles.size === 2,
      s"agg on the join key must reuse the join's partitioning:\n${agg.queryExecution.executedPlan}")
  }
}
