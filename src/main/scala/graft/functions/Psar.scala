package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Parabolic SAR (Wilder 1978, "New Concepts in Technical Trading
  * Systems" — public literature) as a native Catalyst window function,
  * the same declarative-state pattern as [[Ewm]]: a per-key running
  * frame carries the full SAR state machine (trend, sar, ep, af, prior
  * bar's high/low) through pure expression updates, so the whole
  * indicator runs inside one keyed WindowExec with no reshuffle beyond
  * the window sort and composes with neighboring window functions over
  * the same spec.
  *
  * Semantics implemented (documented variant — conventions differ across
  * charting vendors; this one is pinned so the SQL oracle can replay it
  * bit-for-bit):
  *   - seed at each key's first row: uptrend, sar = low, ep = high,
  *     af = af0; the first row emits NULL (warmup).
  *   - each later row, from prior state: raw = sar + af·(ep − sar),
  *     clamped so the SAR never enters the PREVIOUS bar's range
  *     (min vs prior low in an uptrend, max vs prior high in a
  *     downtrend — the one-bar form of Wilder's two-bar clamp);
  *   - reversal when the current bar crosses the clamped SAR (low <
  *     SAR in an uptrend, high > SAR in a downtrend): SAR resets to the
  *     prior run's extreme point, EP restarts at the crossing bar's
  *     extreme, af back to af0;
  *   - otherwise EP extends to the new run extreme and af steps by
  *     `step` (capped at afMax) only on rows where EP improved.
  *
  * Every update is a fixed IEEE sequence of +,·,min,max on doubles, so a
  * recursive-CTE oracle carrying (trend, sar, ep, af, ph, pl) replays it
  * exactly (the w17_adx single-CTE discipline). NULL high/low inputs
  * leave the state untouched and emit NULL.
  *
  * Returns STRUCT(sar DOUBLE, up BOOLEAN).
  */
case class Psar(high: Expression, low: Expression,
    af0: Double, step: Double, afMax: Double)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(high, low)
  override def dataType: DataType = StructType(Seq(
    StructField("sar", DoubleType), StructField("up", BooleanType)))
  override def nullable: Boolean = true

  private lazy val trend = AttributeReference("trend", BooleanType, nullable = false)()
  private lazy val sar = AttributeReference("sar", DoubleType, nullable = false)()
  private lazy val ep = AttributeReference("ep", DoubleType, nullable = false)()
  private lazy val af = AttributeReference("af", DoubleType, nullable = false)()
  private lazy val ph = AttributeReference("ph", DoubleType, nullable = false)()
  private lazy val pl = AttributeReference("pl", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", IntegerType, nullable = false)()
  private lazy val lastNull = AttributeReference("lastNull", BooleanType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(trend, sar, ep, af, ph, pl, seen, lastNull)

  override val initialValues: Seq[Expression] = Seq(
    Literal(true), Literal(0.0), Literal(0.0), Literal(af0),
    Literal(0.0), Literal(0.0), Literal(0), Literal(false))

  private def h: Expression = Cast(high, DoubleType)
  private def l: Expression = Cast(low, DoubleType)
  private def inNull: Expression = Or(IsNull(high), IsNull(low))

  // All expressions evaluate against the PRE-update buffer; the buffer is
  // overwritten at once afterwards. Shared sub-states (raw, clamped SAR,
  // reversal flags) are re-derived in each slot — expressions cannot bind
  // local temps, and the duplicated arithmetic is branch-free codegen.
  private def raw: Expression =
    Add(sar, Multiply(af, Subtract(ep, sar)))
  private def clamped: Expression =
    If(trend, Least(Seq(raw, pl)), Greatest(Seq(raw, ph)))
  private def revUp: Expression = And(trend, LessThan(l, clamped))
  private def revDn: Expression = And(Not(trend), GreaterThan(h, clamped))
  private def rev: Expression = Or(revUp, revDn)
  private def epImproved: Expression =
    And(Not(rev), If(trend, GreaterThan(h, ep), LessThan(l, ep)))

  override val updateExpressions: Seq[Expression] = Seq(
    // trend
    If(inNull, trend,
      If(EqualTo(seen, Literal(0)), Literal(true),
        If(revUp, Literal(false), If(revDn, Literal(true), trend)))),
    // sar
    If(inNull, sar,
      If(EqualTo(seen, Literal(0)), l,
        If(rev, ep, clamped))),
    // ep
    If(inNull, ep,
      If(EqualTo(seen, Literal(0)), h,
        If(revUp, l, If(revDn, h,
          If(trend, Greatest(Seq(ep, h)), Least(Seq(ep, l))))))),
    // af
    If(inNull, af,
      If(EqualTo(seen, Literal(0)), Literal(af0),
        If(rev, Literal(af0),
          If(epImproved, Least(Seq(Add(af, Literal(step)), Literal(afMax))), af)))),
    // ph / pl: always the latest non-null bar
    If(inNull, ph, h),
    If(inNull, pl, l),
    If(inNull, seen, Add(seen, Literal(1))),
    inNull)

  // warmup row 1 and null-input rows emit NULL
  override val evaluateExpression: Expression =
    If(And(GreaterThanOrEqual(seen, Literal(2)), Not(lastNull)),
      CreateNamedStruct(Seq(
        Literal("sar"), sar, Literal("up"), trend)),
      Literal(null, dataType))

  override def prettyName: String = "psar"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Psar =
    copy(high = newChildren(0), low = newChildren(1))
}
