package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators composed from built-ins (preference order (a) —
  * no custom strategy needed).
  *
  * [[asofJoin]] is the classic merge-asof: for each left row, the latest
  * right row with `rightTime <= leftTime` within the same key group.
  * Implementation: tag and union both sides, then one `last(_, ignoreNulls)`
  * over a (key, time, tag)-ordered running window — a single shuffle on the
  * key, no range-explosion, skew-bounded by the key cardinality. This is the
  * scalable shape: at any corpus size it costs one sort-shuffle, versus the
  * naive inequality join's quadratic blowup.
  */
object Temporal {

  /** Left as-of join returning `left.*` plus `outCols` (renamed right value
    * columns) filled from the latest right row at-or-before the left time.
    *
    * @param valueCols right columns to carry (name → output name)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      valueCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 = right (wins ties: right at equal time is "at-or-before"), 1 = left
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(timeCol).as("__t") :+ lit(0).as("__tag")) ++
        valueCols.map { case (from, to) => col(from).as(s"__v_$to") } ++
        leftCols.filterNot(c => keyCols.contains(c) || c == timeCol)
          .map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(timeCol).as("__t") :+ lit(1).as("__tag")) ++
        valueCols.map { case (_, to) => lit(null).as(s"__v_$to") } ++
        leftCols.filterNot(c => keyCols.contains(c) || c == timeCol).map(col): _*)
    val unioned = taggedRight.unionByName(taggedLeft)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.values.foldLeft(unioned) { (d, to) =>
      d.withColumn(to, last(col(s"__v_$to"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1)
      .withColumn(timeCol, col("__t"))
      .select((leftCols ++ valueCols.values).map(col): _*)
  }
}
