package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asofJoin picks the latest right row <= left time, per key") {
    val trades = Seq(
      (1L, ts(100), "t1"), (1L, ts(205), "t2"), (2L, ts(150), "t3"),
      (1L, ts(50), "t0")) // before any quote
      .toDF("acct", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts(90), 10.0), (1L, ts(200), 11.0), (1L, ts(300), 12.0),
      (2L, ts(150), 20.0)) // equal timestamp → matches (<=)
      .toDF("acct", "q_ts", "px")
    val out = AsOfJoin.asofJoin(trades, quotes, "acct", "ts", "q_ts",
      Seq("q_ts", "px"))
      .select("trade_id", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(10.0)) // 100 → quote@90
    assert(out("t2").contains(11.0)) // 205 → quote@200
    assert(out("t3").contains(20.0)) // equal ts matches
    assert(out("t0").isEmpty)        // no quote yet
  }

  test("asofJoin forward picks the earliest right row >= left time, per key") {
    val trades = Seq(
      (1L, ts(100), "t1"), (1L, ts(205), "t2"), (2L, ts(150), "t3"),
      (1L, ts(400), "t4")) // after every quote
      .toDF("acct", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts(90), 10.0), (1L, ts(200), 11.0), (1L, ts(300), 12.0),
      (2L, ts(150), 20.0)) // equal timestamp → matches (>=)
      .toDF("acct", "q_ts", "px")
    val out = AsOfJoin.asofJoin(trades, quotes, "acct", "ts", "q_ts",
      Seq("q_ts", "px"), direction = "forward")
      .select("trade_id", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(11.0)) // 100 → next quote@200
    assert(out("t2").contains(12.0)) // 205 → next quote@300
    assert(out("t3").contains(20.0)) // equal ts matches
    assert(out("t4").isEmpty)        // nothing after
  }

  test("asofJoin resolves duplicate right timestamps to the same row in both directions") {
    val trades = Seq((1L, ts(200), "t1")).toDF("acct", "ts", "trade_id")
    val quotes = Seq( // two quotes at the exact matching timestamp
      (1L, ts(200), 11.0), (1L, ts(200), 13.0))
      .toDF("acct", "q_ts", "px")
    def pick(direction: String): Option[Double] =
      AsOfJoin.asofJoin(trades, quotes, "acct", "ts", "q_ts",
        Seq("q_ts", "px"), direction = direction)
        .select("asof_px").as[Option[Double]].head()
    assert(pick("backward") == pick("forward"),
      "equal-timestamp duplicate right rows must resolve identically")
    assert(pick("backward").contains(13.0), "tie resolves to the max payload")
  }

  test("asofJoin forward matches the naive range-join formulation on events") {
    val e = graft.core.Tables.load(spark, sf0001, "events")
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("click_ts"))
    val naive = errors.join(clicks,
        col("user_id") === col("c_uid") && col("click_ts") >= col("ts"))
      .groupBy("event_id").agg(min("click_ts").as("click_ts"))
      .select(col("event_id"), col("click_ts")).as[(Long, Timestamp)]
      .collect().toMap
    val fast = AsOfJoin.asofJoin(errors, clicks.withColumnRenamed("c_uid", "user_id"),
        "user_id", "ts", "click_ts", Seq("click_ts"), direction = "forward")
      .filter(col("asof_click_ts").isNotNull)
      .select(col("event_id"), col("asof_click_ts")).as[(Long, Timestamp)]
      .collect().toMap
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("asofJoin carries NULL payload values from the matching row, atomically") {
    // the latest quote has px=NULL: as-of must emit that NULL, not an
    // older row's px — and must not mix fields across right rows
    val trades = Seq((1L, ts(200), "t1")).toDF("acct", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts(100), Option(10.0), Option("early")),
      (1L, ts(150), Option.empty[Double], Option("late")))
      .toDF("acct", "q_ts", "px", "tag")
    val out = AsOfJoin.asofJoin(trades, quotes, "acct", "ts", "q_ts",
      Seq("px", "tag"))
      .select("trade_id", "asof_px", "asof_tag")
      .as[(String, Option[Double], Option[String])].collect()
    assert(out.toSeq == Seq(("t1", None, Some("late"))))
  }

  test("asofJoin carries unorderable (map) payload columns") {
    // map payloads can't join the sort tie-break but must still be
    // carried atomically with the matching row
    val trades = Seq((1L, ts(200), "t1")).toDF("acct", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts(100), Map("src" -> "early")),
      (1L, ts(150), Map("src" -> "late")))
      .toDF("acct", "q_ts", "attrs")
    val out = AsOfJoin.asofJoin(trades, quotes, "acct", "ts", "q_ts",
      Seq("q_ts", "attrs"))
      .select("trade_id", "asof_attrs")
      .as[(String, Map[String, String])].collect()
    assert(out.toSeq == Seq(("t1", Map("src" -> "late"))))
  }

  test("asofJoin result matches the naive range-join formulation on events") {
    val e = graft.core.Tables.load(spark, sf0001, "events")
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("click_ts"))
    // naive: max matching click per error, via range join + agg
    val naive = errors.join(clicks,
        col("user_id") === col("c_uid") && col("click_ts") <= col("ts"))
      .groupBy("event_id").agg(max("click_ts").as("click_ts"))
      .select(col("event_id"), col("click_ts")).as[(Long, Timestamp)]
      .collect().toMap
    val fast = AsOfJoin.asofJoin(errors, clicks.withColumnRenamed("c_uid", "user_id"),
        "user_id", "ts", "click_ts", Seq("click_ts"))
      .filter(col("asof_click_ts").isNotNull)
      .select(col("event_id"), col("asof_click_ts")).as[(Long, Timestamp)]
      .collect().toMap
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("saltedJoin is row-identical to the plain join") {
    val large = (1 to 2000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("k", "v") // 10% of rows on one hot key
    val small = Seq(("hot", "H"), ("k7", "A"), ("k13", "B")).toDF("k", "tag")
    val plain = large.join(small, "k").orderBy("v")
      .as[(String, Int, String)].collect().toSeq
    val salted = SkewJoin.saltedJoin(large, small, "k").orderBy("v")
      .as[(String, Int, String)].collect().toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 200)
  }

  test("saltedJoin spreads the hot key across salt buckets") {
    val large = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val salts = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(16)).cast("int"))
      .groupBy("_salt").count().collect()
    assert(salts.length > 8, s"salt only hit ${salts.length} buckets")
  }
}
