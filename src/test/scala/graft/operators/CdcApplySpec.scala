package graft.operators

import graft.SparkSpec

/** Changelog-apply semantics: last op per key wins, trailing deletes
  * remove the key, re-inserts after a delete resurrect it.
  */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  test("last op wins; delete removes; re-insert after delete resurrects") {
    val log = Seq(
      // key 1: I then U — update wins
      (1L, "a", 0L, "I"), (1L, "A", 1L, "U"),
      // key 2: I then D — gone
      (2L, "b", 0L, "I"), (2L, null.asInstanceOf[String], 1L, "D"),
      // key 3: I, D, I — resurrected with the new payload
      (3L, "c", 0L, "I"), (3L, null.asInstanceOf[String], 1L, "D"),
      (3L, "c2", 2L, "I"),
      // key 4: bare insert
      (4L, "d", 0L, "I")
    ).toDF("k", "s", "seq", "op")
    val out = CdcApply(log, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "A"), (3L, "c2"), (4L, "d")))
  }

  test("seq and op columns are dropped from the snapshot") {
    val log = Seq((1L, "a", 0L, "I")).toDF("k", "s", "seq", "op")
    assert(CdcApply(log, Seq("k"), "seq", "op").columns.toSeq == Seq("k", "s"))
  }

  test("missing columns are rejected") {
    val log = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      CdcApply(log, Seq("k"), "seq", "op")
    }
  }
}
