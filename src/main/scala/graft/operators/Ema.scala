package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive exponential smoothing: `y_t = α·x_t + (1−α)·y_{t−1}`, seeded
  * `y_0 = x_0` — pandas `ewm(adjust=False).mean()` semantics, the one operator
  * in the reference that no built-in Spark aggregate expresses
  * (SURVEY.md §2.4 / §7.3).
  *
  * Implementation: repartition by the series key, sort within partitions by
  * (key, order), then a single `mapPartitions` pass carries the recurrence and
  * resets state on key change. Per-key state is O(#specs) doubles, so this
  * scales to any number of series (one task per partition of keys); a single
  * global series necessarily runs on one task — callers with one series keep
  * it small (e.g. one row per day) by aggregating first.
  *
  * Numerics: the recurrence is evaluated as `α*x + (1−α)*y` in double with
  * `1−α` precomputed once — bit-identical to an oracle that evaluates the same
  * expression, which is what the DuckDB recursive-CTE oracles in
  * [[graft.queries]] do.
  *
  * `minPeriods` masks output until that many non-null observations have been
  * seen (pandas `min_periods`); the recurrence itself still advances.
  *
  * Null handling is selectable per call:
  *  - `ignoreNa = true` (default): null inputs emit null and leave state
  *    untouched — pandas `ignore_na=True`, the null-transparent semantics the
  *    engine's oracle-checked paths use.
  *  - `ignoreNa = false`: pandas' DEFAULT gap re-weighting (and the
  *    reference transformer's behavior on coerce-failed rows): a gap of g
  *    nulls decays the old weight to `(1−α)^(g+1)`, the next observation
  *    averages as `(w·y + α·x)/(w + α)`, and null rows emit the CARRIED value
  *    once seeded (pandas `ewma` aggregation, including its skip-update-when-
  *    equal quirk). On gap-free series both modes produce bit-identical
  *    values (the division reduces to the pure recurrence; verified against
  *    pandas in `IndicatorsSpec`).
  */
object Ema {
  final case class Spec(valueCol: String, outCol: String, alpha: Double, minPeriods: Int = 0)

  def withEma(
      df: DataFrame,
      specs: Seq[Spec],
      orderCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      ignoreNa: Boolean = true): DataFrame = {
    require(specs.nonEmpty)
    val inSchema = df.schema
    val outSchema = specs.foldLeft(inSchema)((s, sp) => s.add(sp.outCol, DoubleType, nullable = true))
    val keyIdx = partitionCols.map(inSchema.fieldIndex).toArray
    val valIdx = specs.map(sp => inSchema.fieldIndex(sp.valueCol)).toArray
    val alphas = specs.map(_.alpha).toArray
    val betas = specs.map(sp => 1.0 - sp.alpha).toArray
    val minP = specs.map(_.minPeriods).toArray
    val nSpecs = specs.size
    val ignNa = ignoreNa

    val parted =
      if (partitionCols.isEmpty) df.coalesce(1)
      else df.repartition(partitionCols.map(col): _*)
    val sorted = parted.sortWithinPartitions((partitionCols ++ orderCols).map(col): _*)

    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      val state = new Array[Double](nSpecs)
      val oldWt = new Array[Double](nSpecs)
      val seeded = new Array[Boolean](nSpecs)
      val seen = new Array[Int](nSpecs)
      it.map { row =>
        val k = keyIdx.map(row.get).toSeq
        if (curKey == null || k != curKey) {
          curKey = k
          java.util.Arrays.fill(seeded, false)
          java.util.Arrays.fill(seen, 0)
          java.util.Arrays.fill(oldWt, 1.0)
        }
        val outs = new Array[Any](nSpecs)
        var i = 0
        while (i < nSpecs) {
          val v = row.get(valIdx(i))
          if (v == null) {
            if (ignNa) outs(i) = null
            else {
              // pandas ignore_na=False: decay the old weight, emit the carried
              // value once seeded and past min_periods
              if (seeded(i)) oldWt(i) *= betas(i)
              outs(i) = if (seeded(i) && seen(i) >= minP(i))
                java.lang.Double.valueOf(state(i)) else null
            }
          } else {
            val x = v match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float  => f.doubleValue()
              case n: java.lang.Number => n.doubleValue()
            }
            val y =
              if (!seeded(i)) { seeded(i) = true; oldWt(i) = 1.0; x }
              else if (ignNa) alphas(i) * x + betas(i) * state(i)
              else {
                val w = oldWt(i) * betas(i)
                oldWt(i) = 1.0
                // pandas ewma skips the update when cur equals the carried avg
                if (state(i) != x) (w * state(i) + alphas(i) * x) / (w + alphas(i))
                else state(i)
              }
            state(i) = y
            seen(i) += 1
            outs(i) = if (seen(i) >= minP(i)) java.lang.Double.valueOf(y) else null
          }
          i += 1
        }
        Row.fromSeq(row.toSeq ++ outs)
      }
    }(Encoders.row(outSchema))
  }
}
