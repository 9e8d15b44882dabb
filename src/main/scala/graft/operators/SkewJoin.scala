package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * skew-join split can't apply, e.g. bucketed inputs or non-shuffle
  * joins at 100 TB).
  *
  * The skewed (large) side gets a random-but-deterministic salt in
  * [0, buckets); the small side is replicated `buckets` times; the join
  * key becomes (key, salt), spreading one hot key over `buckets`
  * reducers. Result is row-identical to the plain join.
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int = 16): DataFrame = {
    // deterministic salt (hash of the whole row's key + a row fingerprint
    // would break duplicates; positive pmod of a per-row hash is enough
    // and survives task retry because xxhash64 is input-deterministic)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)), lit(buckets)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
