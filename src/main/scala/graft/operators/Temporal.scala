package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Nearest-in-time as-of join with tolerance — pandas
    * `merge_asof(direction='nearest', tolerance=...)` semantics under a
    * pinned tie rule: for each left row, the right row (same keys)
    * minimizing |Δt|, provided |Δt| ≤ `toleranceUs`; an exact tie between
    * the latest at-or-before and the earliest after goes BACKWARD (the
    * at-or-before side — at Δt = 0 both candidates are the same instant,
    * so the rule only shows on symmetric straddles).
    *
    * Same scale shape as [[asofJoin]] — union the two sides, ONE keyed
    * sort per direction (ascending fill for the backward candidate,
    * descending for the forward), no join: cost is two window passes over
    * one shuffle-sorted frame regardless of size. Appends `outCol`
    * (timestamp of the matched right row, NULL when nothing within
    * tolerance) and `${outCol}_delta_us` (signed: negative = matched
    * backward).
    */
  def asofNearest(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      toleranceUs: Long, outCol: String): DataFrame = {
    require(toleranceUs >= 0, "asofNearest: tolerance must be >= 0")
    val leftCols = left.columns.toSeq
    val us = (c: Column) => unix_micros(c)
    // tag 0 = right sorts before left at equal time in BOTH directions, so
    // an equal-time right row is visible to each side's running fill
    val taggedRight = right.select(
      (keyCols.map(col) :+ us(col(timeCol)).as("__t") :+ lit(0).as("__tag") :+
        us(col(timeCol)).as("__rus")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ us(col(timeCol)).as("__t") :+ lit(1).as("__tag") :+
        lit(null).cast(LongType).as("__rus")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = taggedRight.unionByName(taggedLeft)
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn("__bus", last(col("__rus"), ignoreNulls = true).over(wB))
      .withColumn("__fus", last(col("__rus"), ignoreNulls = true).over(wF))
    val db = col("__t") - col("__bus")
    val df_ = col("__fus") - col("__t")
    val bOk = col("__bus").isNotNull && db <= toleranceUs
    val fOk = col("__fus").isNotNull && df_ <= toleranceUs
    val pickUs = when(bOk && (!fOk || db <= df_), col("__bus"))
      .when(fOk, col("__fus"))
    filled.filter(col("__tag") === 1)
      .withColumn(outCol, timestamp_micros(pickUs))
      .withColumn(s"${outCol}_delta_us",
        when(pickUs.isNotNull, pickUs - col("__t")))
      .select((leftCols ++ Seq(outCol, s"${outCol}_delta_us")).map(col): _*)
  }

  /** Gap-based batch sessionization: appends a per-key `session_id` (1-based)
    * that increments whenever the gap to the key's previous event exceeds
    * `gapUs`. One shuffle (hash-partition by key, sort by time), then two
    * narrow window passes: `lag` → new-session flag → running sum. Rows tied
    * on the timestamp share a session (RANGE frame peers), so the assignment
    * is deterministic regardless of tie order. This is the batch dual of
    * [[graft.streaming.EventsStream]]'s stateful sessionizer, and the
    * standard at-scale shape: cost is one keyed sort-shuffle no matter the
    * corpus size, state bounded by a single key's rows per partition.
    */
  def sessionize(
      df: DataFrame, keyCols: Seq[String], timeCol: String,
      gapUs: Long, sessionCol: String = "session_id"): DataFrame = {
    require(gapUs > 0, "sessionize: gap must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    val t = unix_micros(col(timeCol))
    val prev = lag(t, 1).over(w)
    val isNew = when(prev.isNull || t - prev > gapUs, 1L).otherwise(0L)
    df.withColumn(sessionCol, sum(isNew).over(w))
  }

  /** SCD Type-2 version build: collapse a per-key event stream into the
    * attribute's change history — one row per (key, consecutive attribute
    * run) with `valid_from` (the change row's `validFromCol`), `valid_to`
    * (the NEXT change's `valid_from`, null while current) and `is_current`
    * (1/0 as long, for cross-engine type stability). The warehouse
    * slowly-changing-dimension builder: run it over a raw change feed to
    * (re)materialize the versioned dimension.
    *
    * Deterministic by construction: `seqCols` must be a TOTAL order within
    * each key (e.g. event date + a unique id) — change detection compares
    * each row to its predecessor in that order (null-safe), so ties can
    * never flip versions between runs. Cost is one keyed sort-shuffle; both
    * windows share the same partitioning, so Catalyst plans a single
    * exchange — the same shape as [[sessionize]].
    */
  def scd2Versions(
      df: DataFrame, keyCols: Seq[String], seqCols: Seq[String],
      attrCol: String, validFromCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(seqCols.map(col): _*)
    val changed = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // rn=1 keeps a leading NULL-attribute run (indistinguishable from
      // "no previous row" by the null-safe compare alone)
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .drop("__prev", "__rn")
    changed
      .withColumn("valid_from", col(validFromCol))
      .withColumn("valid_to", lead(col(validFromCol), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
  }

  /** Banded range join: all pairs with equal `keyCols` and
    * `right.time ∈ [left.time + lowerUs, left.time + upperUs]` (µs bounds,
    * inclusive/exclusive per `upperExclusive`).
    *
    * The naive inequality join degenerates to a per-key cartesian; here both
    * sides map to fixed-width time buckets (width = band size): a left row's
    * band overlaps at most TWO buckets, a right row lives in exactly one, so
    * the pair space becomes a (keys, bucket) EQUI-join — one ordinary
    * hash-partitioned shuffle, each true pair examined at most twice, then
    * the exact band predicate filters. This is the standard range-join
    * decomposition and scales like any keyed join.
    *
    * Output: `left.*` joined to the right columns selected via `rightCols`
    * (name → output name). Output names must not collide with left columns —
    * validated up front (rename via the map, e.g. `"ts" -> "r_ts"`).
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTimeCol: String, rightTimeCol: String,
      lowerUs: Long, upperUs: Long,
      rightCols: Map[String, String],
      upperExclusive: Boolean = true): DataFrame = {
    require(upperUs > lowerUs, "rangeJoin: empty band")
    val collisions = rightCols.values.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rangeJoin: rightCols output names collide with left columns: " +
        s"${collisions.mkString(", ")} — rename via the rightCols map")
    val w = upperUs - lowerUs
    // buckets via exact integer FLOOR division, valid for any sign (a float
    // divide could mis-bucket a row sitting exactly on a boundary; `div`
    // truncates toward zero for negatives)
    def fdiv(a: String): String = s"(($a) - pmod($a, ${w}L)) div ${w}L"
    val l = left
      .withColumn("__lt", unix_micros(col(leftTimeCol)))
      .withColumn("__lbkt", explode(array_distinct(array(
        expr(fdiv(s"__lt + ${lowerUs}L")),
        expr(fdiv(s"__lt + ${upperUs}L"))))))
    val r = right.select(
      (keyCols.map(c => col(c).as(s"__rk_$c")) :+
        unix_micros(col(rightTimeCol)).as("__rt")) ++
        rightCols.map { case (from, to) => col(from).as(to) }.toSeq: _*)
      .withColumn("__rbkt", expr(fdiv("__rt")))
    val keyCond = keyCols.map(c => col(c) === col(s"__rk_$c")).reduce(_ && _)
    val upperPred =
      if (upperExclusive) col("__rt") < col("__lt") + lit(upperUs)
      else col("__rt") <= col("__lt") + lit(upperUs)
    l.join(r, keyCond && col("__lbkt") === col("__rbkt"))
      .filter(col("__rt") >= col("__lt") + lit(lowerUs) && upperPred)
      .drop("__lbkt", "__rbkt", "__lt", "__rt")
      .drop(keyCols.map(c => s"__rk_$c"): _*)
  }

  /** Merged-interval coverage per key: each row opens [startUs, startUs +
    * durationUs); overlapping or touching intervals within a key merge via
    * the running-max-end sweep (a new island starts when this interval's
    * start exceeds the max end of every earlier one), and the result is one
    * row per key: merged-interval count and total covered microseconds —
    * the "actual active time" a naive per-row duration sum overcounts.
    *
    * `tieCol` must make (startUs, tieCol) a TOTAL order within each key:
    * both windows use it, so the island flags ride a deterministic order in
    * every engine. Cost: one keyed sort-shuffle shared by both windows plus
    * a keyed aggregate — the [[sessionize]] shape.
    */
  def intervalUnion(
      df: DataFrame, keyCols: Seq[String], startUsCol: String,
      tieCol: String, durationUs: Long): DataFrame = {
    require(durationUs > 0, "intervalUnion: duration must be positive")
    val wPrev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startUsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startUsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__e", col(startUsCol) + durationUs)
      .withColumn("__prev_max_e", max(col("__e")).over(wPrev))
      .withColumn("__island", sum(
        when(col("__prev_max_e").isNull || col(startUsCol) > col("__prev_max_e"), 1L)
          .otherwise(0L)).over(wRun))
      .groupBy((keyCols.map(col) :+ col("__island")): _*)
      .agg(min(col(startUsCol)).as("__st"), max(col("__e")).as("__en"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__en") - col("__st")).as("covered_us"))
  }

  /** EXACT sliding-window distinct count — per window-end day, the number of
    * distinct `keyCol` values active in the trailing `windowDays` days (the
    * "7-day active users" metric an approx-HLL dashboard only estimates).
    *
    * Shape: the row scale first collapses to the (day, key) presence grid
    * (one shuffle, map-side combinable), which then fans out by the BOUNDED
    * factor `windowDays` map-side — each presence day contributes to the
    * windows ending on day .. day+w−1 — and one distinct-aggregate per
    * (window_end, key) produces the counts. Window ends are restricted to
    * OBSERVED days via a broadcast semi-join (no phantom ends past the data,
    * no driver-side max() job). Cost at any corpus size: two keyed shuffles
    * of at most w×|day×key| rows — never a per-window rescan, never a
    * global window. Early days yield partial (shorter) windows by design.
    */
  def rollingDistinct(
      df: DataFrame, dayCol: String, keyCol: String, windowDays: Int): DataFrame = {
    require(windowDays > 0, "rollingDistinct: windowDays must be positive")
    val presence = df.select(col(dayCol).as("__d"), col(keyCol).as("__k")).distinct()
    val days = presence.select(col("__d").as("w_end")).distinct()
    val offsets = df.sparkSession.range(windowDays.toLong)
      .select(col("id").cast(org.apache.spark.sql.types.IntegerType).as("__o"))
    presence
      .crossJoin(broadcast(offsets))
      .select(date_add(col("__d"), col("__o")).as("w_end"), col("__k"))
      .join(broadcast(days), Seq("w_end"), "left_semi")
      .groupBy(col("w_end"))
      .agg(count_distinct(col("__k")).as("active_keys"))
  }
}
