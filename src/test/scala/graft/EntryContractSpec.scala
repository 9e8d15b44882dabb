package graft

/** Guards on the driver contract itself — failures here would surface
  * as confusing driver-side gaps, not test failures, without this
  * suite.
  */
class EntryContractSpec extends SparkSpec {

  test("query names are unique across catalogs (Map merge must drop nothing)") {
    val perCatalog = SparkEntry.catalogs.map(_.queries.keySet)
    val merged = perCatalog.reduce(_ ++ _)
    assert(perCatalog.map(_.size).sum == merged.size,
      s"duplicate query keys: ${perCatalog.flatMap(_.toSeq).groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }}")
  }

  test("every oracle key has a registered query, and names follow qNN_") {
    val qs = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    assert(oracled.subsetOf(qs), s"orphan oracles: ${oracled.diff(qs)}")
    assert(qs.forall(_.matches("q\\d+_[a-z0-9_]+")), qs.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("entry() (driver smoke query) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
