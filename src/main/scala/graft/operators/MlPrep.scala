package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature/target preparation mirroring the reference's `predict.py`.
  *
  * - M2 target creation: `target_return = (close.shift(−1) − close)/close·100`
  *   with the final row dropped (`predict.py:39-44`) — expressed as `lead`
  *   over the date order plus a null filter.
  * - M3 time-series CV: scikit-learn `TimeSeriesSplit(n_splits)` — expanding
  *   train window, contiguous next block as test, `test_size = n ÷ (n_splits+1)`,
  *   deterministic from row order alone (`predict.py:52,61-63`).
  */
object MlPrep {

  /** M2 — next-step percentage return as the supervised target. */
  def withTargetReturn(df: DataFrame, closeCol: String, orderCol: String,
      outCol: String = "target_return", partitionCols: Seq[String] = Nil): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(orderCol)
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
    val nxt = lead(col(closeCol), 1).over(w)
    df.withColumn("__next", nxt)
      .filter(col("__next").isNotNull)
      .withColumn(outCol, (col("__next") - col(closeCol)) / col(closeCol) * 100.0)
      .drop("__next")
  }

  final case class Fold(fold: Long, trainRows: Long, testRows: Long)

  /** Driver-side split arithmetic — identical to scikit-learn's. */
  def timeSeriesSplitBounds(n: Long, nSplits: Int): Seq[Fold] = {
    val testSize = n / (nSplits + 1)
    (1 to nSplits).map { f =>
      val trainEnd = n - (nSplits - f + 1) * testSize
      Fold(f.toLong, trainEnd, testSize)
    }
  }

  /** M3 — one row per fold: train size and the test block's bounds, derived
    * purely from `row_number` over `orderCol` (deterministic; matches the
    * reference's fold indices exactly).
    */
  def timeSeriesSplitSummary(df: DataFrame, orderCol: String, nSplits: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val folds = timeSeriesSplitBounds(n, nSplits)
      .toDF("fold", "train_rows", "test_rows")
    val rn = df.withColumn("rn", row_number().over(Window.orderBy(orderCol)))
    rn.join(folds,
        col("rn") > col("train_rows") && col("rn") <= col("train_rows") + col("test_rows"))
      .groupBy("fold", "train_rows", "test_rows")
      .agg(
        min(col(orderCol)).as("test_start"),
        max(col(orderCol)).as("test_end"))
      .orderBy("fold")
  }
}
