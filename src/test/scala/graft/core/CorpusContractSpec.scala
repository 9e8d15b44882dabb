package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, ArrayType, FloatType}

import graft.SparkSpec

/** The driver regenerates /root/testdata between rounds, and its
  * physical details have drifted before (r7: temporal columns went
  * from TIMESTAMP(NANOS) to naive micros and broke 22 tests with
  * cryptic analysis errors). This spec pins every assumption the
  * catalog makes about the corpus so the NEXT drift fails here, once,
  * with a message naming the drifted property — not as a scatter of
  * downstream query failures.
  */
class CorpusContractSpec extends SparkSpec {

  private def t(sf: String, name: String) = Tables.load(spark, sf, name)

  test("temporal columns normalize to TimestampType at every SF") {
    for (sf <- Seq(sf0001, sf001, sf01)) {
      assert(t(sf, "events").schema("ts").dataType == TimestampType,
        s"$sf events.ts must normalize to TimestampType (Tables.normalizeTs)")
      assert(t(sf, "orders").schema("o_orderdate").dataType == TimestampType,
        s"$sf orders.o_orderdate must normalize to TimestampType")
      assert(t(sf, "lineitem").schema("l_shipdate").dataType == TimestampType,
        s"$sf lineitem.l_shipdate must normalize to TimestampType")
    }
  }

  test("every table is present and non-empty; fact/dim size relations hold") {
    val counts = Tables.all.map(n => n -> t(sf0001, n).count()).toMap
    counts.foreach { case (n, c) => assert(c > 0, s"$n is empty") }
    assert(counts("lineitem") >= counts("orders"),
      "lineitem must be the largest fact")
    assert(counts("region") <= counts("nation"),
      "region/nation are constant-size dims")
  }

  test("events.props carries an integer k on every row (q21/q125 contract)") {
    val ev = t(sf0001, "events")
    val bad = ev.filter(
      get_json_object(col("props"), "$.k").cast("long").isNull).count()
    assert(bad == 0, s"$bad events rows lack an integer props.k")
  }

  test("documents.lang stays inside the q83 language-dimension fixture") {
    // q83's broadcast dim enumerates these langs; a new lang would
    // silently drop its partition from the DPP join (oracle mirrors,
    // so the gate would stay green while the fixture quietly narrows)
    val known = Set("en", "de", "fr", "es", "zh")
    val langs = t(sf0001, "documents").select(col("lang"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(known),
      s"corpus langs $langs exceed the q83 dim fixture $known — extend it")
  }

  test("planted near-duplicates exist (the dedup family's fixtures are live)") {
    // the q26/q27/q59 oracles all assume the generator plants
    // high-jaccard pairs; an unplanted corpus would leave every
    // near-dup query vacuously green on zero rows
    val docs = t(sf0001, "documents")
      .select(col("doc_id"),
        array_distinct(split(lower(col("text")), " ")).as("ws"))
    val ex = docs.select(col("doc_id"), explode(col("ws")).as("w"))
    val shared = ex.as("a").join(ex.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id"))
      .agg(count(lit(1)).as("inter"))
    val sizes = docs.select(col("doc_id"), size(col("ws")).as("sz"))
    val pairs = shared
      .join(sizes.toDF("d1", "sz1"), col("a.doc_id") === col("d1"))
      .join(sizes.toDF("d2", "sz2"), col("b.doc_id") === col("d2"))
      .filter(col("inter") * 10 >= (col("sz1") + col("sz2") - col("inter")) * 8)
      .count()
    assert(pairs > 0, "no high-jaccard document pairs — dedup fixtures are dead")
  }

  test("r8 fixtures: key headroom, gate-label balance, query terms present") {
    for (sf <- Seq(sf0001, sf001, sf01)) {
      // q145's guaranteed-non-member probes are c_custkey + 1_000_000
      // and q58's planted image ids are media_id + 1_000_000 — a
      // corpus generation whose keys grow into that range would turn
      // "guaranteed absent" into silent collisions
      val maxCust = t(sf, "orders").agg(max(col("o_custkey"))).head.getLong(0)
      assert(maxCust < 1000000L,
        s"$sf: o_custkey reaches $maxCust — q145's shifted non-member " +
          "probes would collide")
      // q142's distillation label (>= 55 whitespace tokens) needs both
      // classes populated or the GD gradient degenerates
      val docs = t(sf, "documents").filter(length(col("text")) > 0)
        .select(size(split(lower(col("text")), " ")).as("n"))
      val pos = docs.filter(col("n") >= 55).count()
      val neg = docs.filter(col("n") < 55).count()
      assert(pos > 10 && neg > 10,
        s"$sf: token-gate label split degenerate ($pos/$neg)")
      // q137's fixed query terms must keep matching documents - with
      // q137's OWN tokenization (exact whitespace-split equality), not
      // a looser word-boundary regex that punctuation-adjacent
      // occurrences would satisfy while every tf stays 0
      val toks = split(lower(col("text")), " ")
      val hits = t(sf, "documents").filter(
        array_contains(toks, "table") || array_contains(toks, "hash") ||
          array_contains(toks, "merge")).count()
      assert(hits > 0, s"$sf: no document tokenizes to a q137 query term")
    }
  }

  test("events.value stays exact-2-decimal and inside q149's long-safe range") {
    // q149 computes in integer cents with LONG arithmetic: the z²
    // numerator 900·dev² needs dev = 10c − S ≤ ~3e9 to stay 4 orders
    // under Long.MaxValue, i.e. value ≤ ~$50k (the shipped max is
    // ~$560). The oracle side rides HUGEINT and would NOT overflow, so
    // a silently grown value range would surface as a baffling gate
    // mismatch — pin it here with the property named instead. The
    // 2-decimal exactness is what makes cents exact in the first
    // place (also load-bearing for q01-family sum stability).
    for (sf <- Seq(sf0001, sf001, sf01)) {
      val ev = t(sf, "events").select(col("value"))
      assert(ev.filter(col("value") =!= round(col("value"), 2)).count() == 0,
        s"$sf: events.value must be exact 2-decimal")
      assert(ev.filter(abs(col("value")) > 50000.0).count() == 0,
        s"$sf: |events.value| must stay <= 50000 (q149 long-cents bound)")
    }
  }

  test("embeddings are fixed-dimension float vectors with a small label set") {
    val em = t(sf0001, "embeddings")
    assert(em.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true) ||
      em.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${em.schema("embedding").dataType}")
    val dims = em.select(size(col("embedding")).as("d")).distinct().count()
    assert(dims == 1, "embedding dimension must be constant across rows")
    val labels = em.select(col("label")).distinct().count()
    assert(labels > 1 && labels <= 64,
      s"IVF/centroid fixtures assume a small label set, got $labels")
  }
}
