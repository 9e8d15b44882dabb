package graft.core

import org.apache.spark.sql.types._

/** The reference engine's one user-facing data shape — a JSONL record
  * `{id, texts, images}` (reference docs/example/input-output.jsonl:1-14,
  * lib/job_processor.rb:43-47).
  *
  * `texts` has OPEN-ENDED keys (schema-on-read labels), which is why the
  * canonical Spark type is MapType, not a struct: a fixed StructType
  * would break on heterogeneous batches. `images` carries base64 JPEG
  * strings (reference lib/job_processor.rb:226).
  */
object Record {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("texts", MapType(StringType, StringType), nullable = true),
    StructField("images", ArrayType(StringType), nullable = true)))

  /** typed view for API edges and tests */
  final case class R(
      id: String,
      texts: Map[String, String],
      images: Seq[String])
}
