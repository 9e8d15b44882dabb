package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (Array[Float] column) — SURVEY.md §2B E12 and the
  * BASELINE.json training-data mandate.
  *
  * Two paths:
  *  - exact brute force (q30): the correctness baseline. Written as
  *    per-partition top-k + merge (TakeOrdered-style via ranking
  *    window), not a global sort.
  *  - hyperplane LSH (q31): the scale path — bucket join instead of
  *    cross join; candidates reranked with EXACT cosine so emitted
  *    scores are true, only recall is approximate.
  */
object Similarity extends Catalog {

  private val K = 10
  private val NumQueries = 5

  /** LSH geometry: `Tables` × `BitsPerTable` sign-random hyperplanes,
    * components ±1 derived from MurmurHash3 (deterministic, no RNG
    * state — survives task retry and resume).
    */
  private val LshTables = 8
  private val BitsPerTable = 6
  private val Dim = 64

  private[queries] def planeSign(p: Int, c: Int): Double =
    if ((scala.util.hashing.MurmurHash3.stringHash(s"plane:$p:$c") & 1) == 1) 1.0 else -1.0

  private def embeddings(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** cosine similarity of pre-normed rows */
  private def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    dot(va, vb) / (na * nb)

  /** 0/1 sign-bit string of the vector against all hyperplanes */
  private def lshBits(v: Column): Column = {
    val planes = typedlit(
      (0 until LshTables * BitsPerTable).map(p =>
        (0 until Dim).map(c => planeSign(p, c))))
    concat_ws("", transform(sequence(lit(0), lit(LshTables * BitsPerTable - 1)),
      p => when(dot(v, element_at(planes, p + 1)) > 0, "1").otherwise("0")))
  }

  override def queries: Map[String, Q] = Map(

    // ----- exact top-k cosine search (baseline) ---------------------
    "q30_knn_bruteforce" -> Q(
      fn = (s, d) => {
        val e = embeddings(s, d)
        val q = e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("norm").as("qnorm"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))
        e.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("cosine", cosine(col("v"), col("qv"), col("norm"), col("qnorm")))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= K)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("cosine"), col("rnk"))
      },
      sql = Some(s"""
        SELECT query_id, neighbor_id, cosine, rnk FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cosine,
                 CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC,
                   e.vec_id) AS BIGINT) AS rnk
          FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
          WHERE q.vec_id < $NumQueries)
        WHERE rnk <= $K"""),
      scaleNote = "queries broadcast; corpus never shuffles; rank-window prunes to per-partition top-k before the merge (WindowGroupLimit) — 100 TB cost is one scan"),

    // ----- LSH-bucketed ANN (scale path) ----------------------------
    "q31_knn_lsh" -> Q(
      fn = (s, d) => {
        val e = embeddings(s, d).withColumn("bits", lshBits(col("v")))
        val buckets = e.select(col("vec_id"), col("v"), col("norm"),
          explode(transform(sequence(lit(0), lit(LshTables - 1)),
            t => struct(t.as("t"),
              col("bits").substr(t * BitsPerTable + 1, lit(BitsPerTable)).as("sig"))))
            .as("b"))
          .select(col("vec_id"), col("v"), col("norm"), col("b.t"), col("b.sig"))
        val q = buckets.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("norm").as("qnorm"), col("t"), col("sig"))
        val cand = buckets.join(q,
            Seq("t", "sig"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"), col("v"), col("norm"),
            col("qv"), col("qnorm"))
          .dropDuplicates("query_id", "vec_id")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))
        cand
          .withColumn("cosine", cosine(col("v"), col("qv"), col("norm"), col("qnorm")))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= K)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("cosine"), col("rnk"))
      },
      sql = None, // approximate by construction — correctness contract
      // (candidates ⊆ corpus, exact rerank, recall floor) is asserted in
      // SimilaritySpec against q30
      scaleNote = "replaces the cross join with a (table,signature) bucket equi-join; signature computation is codegen'd; recall tunes via tables × bits per data distribution"),

    // ----- LSH-bucketed near-dup pairs (scale path for q29) ---------
    "q49_embedding_neardup_lsh" -> Q(
      fn = (s, d) => {
        // verify-then-emit: hyperplane buckets generate candidates, the
        // exact cosine decides — emitted pairs carry TRUE similarities,
        // only recall is approximate (rows-only check + spec subset
        // assertion against q29's brute force)
        val e = embeddings(s, d).withColumn("bits", lshBits(col("v")))
        val buckets = e.select(col("vec_id"), col("v"), col("norm"),
          explode(transform(sequence(lit(0), lit(LshTables - 1)),
            t => struct(t.as("t"),
              col("bits").substr(t * BitsPerTable + 1, lit(BitsPerTable)).as("sig"))))
            .as("b"))
          .select(col("vec_id"), col("v"), col("norm"), col("b.t"), col("b.sig"))
        buckets.as("a").join(buckets.as("b"),
            col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec1"), col("b.vec_id").as("vec2"),
            (dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
              .as("cosine"))
          .dropDuplicates("vec1", "vec2")
          .filter(col("cosine") >= 0.4)
      },
      sql = None,
      scaleNote = "the 100 TB form of q29: (table,signature) equi-join replaces the O(n²) sweep; candidate count scales with bucket occupancy, not corpus²"),

    // ----- per-label centroids (embedding aggregation) --------------
    "q32_embedding_centroids" -> Q(
      fn = (s, d) =>
        Tables.load(s, d, "embeddings")
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .groupBy(col("label"), col("dim").cast("long").as("dim"))
          .agg(avg(col("x")).as("centroid"), count(lit(1)).as("n")),
      sql = Some("""
        SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
               avg(x) AS centroid, count(*) AS n
        FROM (SELECT label,
                     unnest(generate_series(0, len(embedding) - 1)) AS dim,
                     unnest(embedding::DOUBLE[]) AS x
              FROM embeddings)
        GROUP BY 1, 2"""),
      scaleNote = "posexplode fans 64× but partial agg collapses per partition before the shuffle; output is |labels|×dim rows regardless of input size")
  )
}
