package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper: salt the hot side, replicate the small side.
  *
  * A shuffle join on a skewed key sends every row of the hot key to one
  * reducer. [[saltedJoin]] splits each key into `buckets` sub-keys: the big
  * side gets a deterministic per-row salt (hash of the whole row — no RNG
  * state, reproducible), the small side is exploded `buckets`× so every
  * (key, salt) pair finds its match. Result set is identical to the plain
  * join; only the partitioning changes. AQE's skew-join handles moderate
  * skew automatically — this is for the pathological keys AQE splits can't
  * fix (e.g. one key = 30% of the table).
  */
object Skew {

  /** The big side's deterministic per-row salt (hash of the whole row, mod
    * `buckets`) — exposed so specs can measure the salted shuffle-key
    * distribution the join actually partitions on.
    */
  def withSalt(big: DataFrame, buckets: Int): DataFrame =
    big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets)).cast("int"))

  def saltedJoin(
      big: DataFrame, small: DataFrame,
      keys: Seq[String], buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val bigSalted = withSalt(big, buckets)
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
