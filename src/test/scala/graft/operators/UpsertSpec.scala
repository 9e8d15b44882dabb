package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE semantics: matched keys take the delta row wholesale (even
  * null non-key fields), unmatched base rows survive untouched,
  * delta-only keys insert.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  test("update wins, insert lands, untouched rows survive") {
    val delta = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val out = Upsert(base, delta, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("a matched delta row overwrites with its nulls (whole-row semantics)") {
    val delta = Seq((3L, Option.empty[String], 0.0)).toDF("k", "s", "v")
    val out = Upsert(base, delta, Seq("k"))
      .select(col("s")).where(col("k") === 3).as[Option[String]].head()
    assert(out.isEmpty, "matched row must take the delta's null, not keep base")
  }

  test("composite keys match on all columns") {
    val b = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val delta = Seq((1L, "y", 9.0)).toDF("k1", "k2", "v")
    val out = Upsert(b, delta, Seq("k1", "k2"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "x", 1.0), (1L, "y", 9.0)))
  }

  test("schema and key contracts are enforced") {
    intercept[IllegalArgumentException] {
      Upsert(base, base.drop("v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Upsert(base, base, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Upsert(base, base, Seq("nope"))
    }
  }

  test("column names containing dots resolve as columns, not field paths") {
    // regression: keys once resolved via col("b.<name>"), so a key
    // named "order.key" parsed as a nested-field path and the merge
    // failed analysis (or worse, bound to a real struct field)
    val b = Seq((1L, 10.0), (2L, 20.0)).toDF("order.key", "the.value")
    val delta = Seq((2L, 99.0), (3L, 30.0)).toDF("order.key", "the.value")
    val out = Upsert(b, delta, Seq("order.key"))
      .as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("column order differences between base and delta do not matter") {
    val delta = Seq(("z", 2L, 7.0)).toDF("s", "k", "v")
    val out = Upsert(base, delta, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "z", 7.0), (3L, "c", 30.0)))
  }
}
