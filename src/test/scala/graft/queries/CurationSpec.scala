package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the curation catalog that the DuckDB value gate can't
  * express: closure properties of the dup groups, scrub completeness,
  * filter-rule consistency, rank/packing invariants.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("q61: dup groups are the transitive closure of the q26 pairs") {
    val pairs = Dedup.queries("q26_dedup_ngram_jaccard").fn(spark, sf001)
      .select("doc1", "doc2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val groups = Dedup.queries("q61_dedup_groups").fn(spark, sf001)
      .select("doc_id", "group_id", "group_sz", "kept")
      .as[(Long, Long, Long, Int)].collect()
    val label = groups.map(g => g._1 -> g._2).toMap
    // every near-dup pair landed in the same group
    for ((a, b) <- pairs) assert(label(a) == label(b), s"pair ($a,$b) split")
    // group id is the member minimum; kept marks exactly it
    val byGroup = groups.groupBy(_._2)
    for ((gid, members) <- byGroup) {
      assert(members.map(_._1).min == gid)
      assert(members.count(_._4 == 1) == 1)
      assert(members.find(_._4 == 1).get._1 == gid)
      assert(members.forall(_._3 == members.length))
    }
    // groups partition the corpus
    assert(groups.length ==
      spark.read.parquet(s"$sf001/documents.parquet").count())
  }

  test("q61: chained pairs collapse into one group (A~B, B~C without A~C)") {
    val pairs = Dedup.queries("q26_dedup_ngram_jaccard").fn(spark, sf001)
      .select("doc1", "doc2").as[(Long, Long)].collect()
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // the sf0.01 corpus plants at least one 3-chain (verified in data);
    // require one so this test never passes vacuously
    val chained = adj.exists { case (_, nbrs) => nbrs.size >= 2 }
    assert(chained, "corpus no longer contains a chained near-dup — test needs new data")
    val groups = Dedup.queries("q61_dedup_groups").fn(spark, sf001)
    assert(groups.filter(col("group_sz") >= 3).count() > 0)
  }

  test("q62: scrub removes every match it counted; non-PII text survives") {
    val r = Curation.queries("q62_pii_scrub").fn(spark, sf001)
    val rows = r.select("doc_id", "n_email", "n_phone", "n_ip", "scrubbed")
      .as[(Long, Int, Int, Int, String)].collect()
    assert(rows.nonEmpty)
    for ((_, ne, np, ni, scrubbed) <- rows) {
      assert(ne >= 1 && np >= 1 && ni >= 1, "injection guarantees ≥1 of each")
      assert(!scrubbed.matches(".*[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}.*"))
      assert(!scrubbed.contains("+1-555-"))
      assert(scrubbed.contains("[EMAIL]") && scrubbed.contains("[PHONE]") &&
        scrubbed.contains("[IP]"))
    }
    // originals survive: scrubbed still starts with the source text
    val src = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, _, _, _, scrubbed) <- rows.take(20))
      assert(scrubbed.startsWith(src(id)))
  }

  test("q63: passes is exactly the conjunction of its published rules") {
    val rows = Curation.queries("q63_quality_filter").fn(spark, sf001)
      .select("n_words", "mean_wlen", "repetition", "passes")
      .as[(Int, Double, Double, Int)].collect()
    assert(rows.nonEmpty)
    for ((nw, mwl, rep, p) <- rows) {
      val want = nw >= 20 && nw <= 200 && mwl >= 3.0 && mwl <= 10.0 && rep < 0.9
      assert(p == (if (want) 1 else 0))
    }
  }

  test("q65: per-doc ranks are 1..3 with non-increasing scores") {
    val rows = Curation.queries("q65_tfidf_top_terms").fn(spark, sf001)
      .select("doc_id", "score", "rk").as[(Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    for ((_, perDoc) <- rows.groupBy(_._1)) {
      val byRank = perDoc.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1L to byRank.length).toSeq)
      assert(byRank.length <= 3)
      for (Array(a, b) <- byRank.sliding(2).map(_.toArray).toSeq
           if byRank.length > 1)
        assert(a._2 >= b._2, "scores must be non-increasing in rank")
    }
  }

  test("q66: packs respect the budget and never reorder or split sources") {
    val rows = Curation.queries("q66_sequence_packing").fn(spark, sf001)
      .select("source", "doc_id", "n_tokens", "pack_id")
      .as[(String, Long, Int, Long)].collect()
    assert(rows.nonEmpty)
    for ((_, perSource) <- rows.groupBy(_._1)) {
      val inOrder = perSource.sortBy(_._2)
      // pack ids start at 0 and only ever step by +1 in doc order
      assert(inOrder.head._4 == 0L)
      for (Array(a, b) <- inOrder.sliding(2).map(_.toArray).toSeq)
        assert(b._4 == a._4 || b._4 == a._4 + 1)
      // a multi-doc pack never exceeds the budget (a single oversized
      // doc is allowed to overflow its own pack by design)
      for ((_, pk) <- inOrder.groupBy(_._4) if pk.length > 1)
        assert(pk.map(_._3.toLong).sum <= 256L,
          s"pack over budget: ${pk.map(_._3).mkString("+")}")
    }
    // greedy property: a doc opens a new pack only because it would
    // have overflowed the previous one
    for ((_, perSource) <- rows.groupBy(_._1)) {
      val inOrder = perSource.sortBy(_._2)
      var fill = 0L
      var prevPack = -1L
      for ((_, _, nt, pack) <- inOrder) {
        if (pack != prevPack) {
          if (prevPack >= 0) assert(fill + nt > 256L, "opened a pack too early")
          fill = nt.toLong
          prevPack = pack
        } else fill += nt
      }
    }
  }

  test("q68: dedup keeps first occurrences in order; injected copies always go") {
    val rows = Curation.queries("q68_repetition_removal").fn(spark, sf001)
      .select("doc_id", "dedup_text", "n_removed")
      .as[(Long, String, Int)].collect()
    assert(rows.nonEmpty)
    // every doc's injected duplicate segments were removed
    assert(rows.count(_._3 > 0) == rows.length,
      "the injection guarantees at least one removable segment per doc")
    for ((id, text, _) <- rows) {
      val segs = text.split(" ").grouped(5).map(_.mkString(" ")).toSeq
      assert(segs.distinct == segs, s"doc $id still has repeated segments")
    }
  }

  test("q77: the judge filter keeps exactly the docs whose fake score >= 50") {
    // independently recompute the deterministic judge decision from the
    // raw corpus — same prompt construction, driver-side
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expect = docs.collect {
      case (id, text)
          if math.floorMod(scala.util.hashing.MurmurHash3.stringHash(
            s"rate the quality of: $text"), 100) >= 50 =>
        id.toString
    }.toSet
    assert(expect.nonEmpty && expect.size < docs.length,
      "bar must split the corpus for the test to mean anything")
    val kept = Sources.queries("q77_llm_judge_filter").fn(spark, sf001)
      .select("id").as[String].collect().toSet
    assert(kept == expect,
      s"missing=${expect.diff(kept).take(5)} extra=${kept.diff(expect).take(5)}")
  }
}
