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
}
