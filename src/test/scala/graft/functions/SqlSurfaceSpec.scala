package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GraftExtensions claims the native expressions "resolve in SQL text
  * and via call_function" — the call_function half is exercised
  * everywhere; this pins the SQL-text half, which a BI tool or
  * spark.sql() user would hit.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("all registered native functions resolve and agree from SQL text") {
    spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(50).createOrReplaceTempView("sqlsurface_docs")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Int, Int, Int, Long)].collect().sortBy(_._1).toSeq
    val viaSql = canon(spark.sql("""
      SELECT doc_id,
             simhash64(split(lower(text), ' ')) AS sh,
             size(cdc_chunks(text)) AS n_chunks,
             size(shingle_hashes(lower(text), 3)) AS n_shingles,
             size(minhash_bands(shingle_hashes(lower(text), 3), 8, 2)) AS n_bands,
             token_stats(lower(text)).ws_tokens AS ws
      FROM sqlsurface_docs WHERE length(text) > 0"""))
    val viaApi = canon(spark.table("sqlsurface_docs")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        call_function("simhash64", split(lower(col("text")), " ")).as("sh"),
        size(call_function("cdc_chunks", col("text"))).as("n_chunks"),
        size(call_function("shingle_hashes", lower(col("text")), lit(3))).as("n_shingles"),
        size(call_function("minhash_bands",
          call_function("shingle_hashes", lower(col("text")), lit(3)),
          lit(8), lit(2))).as("n_bands"),
        call_function("token_stats", lower(col("text"))).getField("ws_tokens").as("ws")))
    assert(viaSql.nonEmpty)
    assert(viaSql == viaApi)
  }

  test("vec_dot and lsh_sigs resolve from SQL text on embeddings") {
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(20).createOrReplaceTempView("sqlsurface_vecs")
    val rows = spark.sql("""
      SELECT vec_id,
             vec_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS sq,
             size(lsh_sigs(CAST(embedding AS ARRAY<DOUBLE>), 8, 6)) AS n_sigs
      FROM sqlsurface_vecs""").as[(Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, sq, n) => assert(sq > 0.0 && n == 8) }
  }

  test("wrong arity in SQL text raises a descriptive error, not an internal one") {
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(ARRAY(1.0D)) AS x").collect()
    }
    assert(e.getMessage.contains("vec_dot"), e.getMessage)
  }
}
