package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for training-data mixes. Random sampling is the
  * wrong tool at corpus scale — a rerun must select the SAME rows (resumable
  * jobs, reproducible ablations, cross-engine audits), so selection here is a
  * pure function of (salt, id):
  *
  *  - [[hashSample]]: Bernoulli by hash threshold — keep a row iff the
  *    32-bit md5 prefix of `salt:id` falls below `fraction`·2³². A narrow
  *    filter: pushes after the scan, no shuffle, no RNG state, composes with
  *    any plan. Changing the salt draws an independent sample.
  *  - [[quotaPerGroup]]: fixed per-group quotas (the "mix" in a training-data
  *    mix, e.g. N docs per language/domain) — rank rows inside each group by
  *    the same deterministic hash (tie-broken by id) and keep the first `n`.
  *    One shuffle on the group key; the hash order makes the quota a uniform
  *    "random" subset that never changes across runs.
  *
  * Both mirror bit-for-bit in SQL (md5 prefix → BIGINT), so they are
  * oracle-checkable like every other operator.
  */
object Sampling {

  /** 32-bit selection hash of `salt:id` as BIGINT in [0, 2³²). */
  def selectionHash(idCol: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), idCol.cast(StringType))), 1, 8), 16, 10)
      .cast(LongType)

  def hashSample(df: DataFrame, idCol: String, fraction: Double, salt: String): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    df.filter(selectionHash(col(idCol), salt) < math.round(fraction * 4294967296.0))
  }

  def quotaPerGroup(
      df: DataFrame, groupCol: String, idCol: String, n: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(selectionHash(col(idCol), salt), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }
}
