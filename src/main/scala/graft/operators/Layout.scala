package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaved sort keys — the multi-dimensional data
  * CLUSTERING primitive (Morton 1966; the layout pass behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`): interleaving the bits of two dimension keys makes
  * rows close on the Z-curve close in BOTH dimensions, so fixed-size files
  * cut from the curve carry tight per-file min/max spans on every
  * participating column and parquet row-group / file skipping prunes on any
  * of them — where a linear layout only ever bounds its single sort key.
  *
  * The write-side production pass at 100 TB is
  * `repartitionByRange(morton16(a, b)).sortWithinPartitions(...)` before the
  * parquet write: one range shuffle, the same cost as any global sort, paid
  * once at layout time to make every later scan prunable.
  *
  * The bit spread is the classic mask-shift cascade — O(log bits) integer
  * ops, pure codegen-able Column arithmetic, bit-identical on any engine.
  */
object Layout {

  private val Steps = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
    2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spreads the low 16 bits of `c` to even bit positions (0,2,4,…,30).
    * Dimensions wider than 16 bits must be bucketed/truncated first (a
    * 32-bit variant just extends the cascade one step).
    */
  def spread16(c: Column): Column =
    Steps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of two 16-bit dimension keys: bits of `a` on even
    * positions, bits of `b` on odd.
    */
  def morton16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Hilbert-curve index (0‥65535) of two 8-bit dimension keys — the
    * clustering curve with STRICTLY better locality than [[morton16]]'s
    * Z-curve: consecutive Hilbert indices are always grid-adjacent
    * (|Δx|+|Δy| = 1, no Z-curve "jumps" across the midline), so equal-count
    * files cut from the curve carry tighter per-file min/max spans on both
    * dimensions (Faloutsos & Roseman, PODS '89 — the curve behind Hilbert
    * clustering in modern lakehouse OPTIMIZE implementations).
    *
    * The classic xy→d walk (one rotation-flip step per bit, high to low) is
    * unrolled into 8 chained projections: each `withColumn` stage holds ONE
    * step's state (x, y, accumulated d) as named columns, so the plan is 8
    * stacked Projects inside one WholeStageCodegen span — NOT one
    * exponentially nested expression tree (CollapseProject declines to
    * inline multi-referenced non-trivial aliases, which is exactly what the
    * per-step state columns are). Pure 64-bit integer arithmetic
    * (two's-complement `&` on the post-rotation negatives included) —
    * bit-identical on any engine; the oracle states the same 8 steps as
    * chained CTEs.
    */
  def hilbert8(df: org.apache.spark.sql.DataFrame, xCol: String, yCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.LongType
    val steps = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
    val init = df
      .withColumn("__hx", col(xCol).cast(LongType))
      .withColumn("__hy", col(yCol).cast(LongType))
      .withColumn(outCol, lit(0L))
    val walked = steps.foldLeft(init) { (d, s) =>
      d.withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(outCol,
          col(outCol) + lit(s * s) * (col("__rx") * 3).bitwiseXOR(col("__ry")))
        // ry=1 → unchanged; ry=0 → swap, with an rx=1 pre-flip (s−1−v)
        .withColumn("__nx",
          when(col("__ry") === 1, col("__hx"))
            .when(col("__rx") === 1, lit(s - 1) - col("__hy"))
            .otherwise(col("__hy")))
        .withColumn("__ny",
          when(col("__ry") === 1, col("__hy"))
            .when(col("__rx") === 1, lit(s - 1) - col("__hx"))
            .otherwise(col("__hx")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    walked.drop("__hx", "__hy", "__rx", "__ry", "__nx", "__ny")
  }
}
