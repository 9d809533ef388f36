package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** SuperTrend final-band recursion as a native Catalyst window function —
  * the conditional-carry companion to [[Psar]]. Inputs are the BASIC
  * bands (already derived from ATR by the caller, so the function stays a
  * pure 3-column state machine) and the close:
  *
  *   - final upper band ratchets DOWN: fub ← bub if bub < fub or the
  *     previous close broke above fub, else carry fub;
  *   - final lower band ratchets UP symmetrically;
  *   - direction: a downtrend flips up when close crosses above the new
  *     fub; an uptrend flips down when close crosses below the new flb;
  *   - the SuperTrend line is fub in a downtrend, flb in an uptrend.
  *
  * Seeding: the state starts at each key's first row where BOTH basic
  * bands are non-null (the caller's ATR warmup produces leading NULLs),
  * with direction up iff close > bub. NULL input rows leave the state
  * untouched and emit NULL. Every update is a fixed IEEE compare/select
  * over doubles, so a recursive-CTE oracle carrying
  * (fub, flb, up, prev_close) replays it bit-for-bit.
  *
  * Returns STRUCT(fub DOUBLE, flb DOUBLE, line DOUBLE, up BOOLEAN).
  */
case class SuperTrend(bub: Expression, blb: Expression, close: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(bub, blb, close)
  override def dataType: DataType = StructType(Seq(
    StructField("fub", DoubleType), StructField("flb", DoubleType),
    StructField("line", DoubleType), StructField("up", BooleanType)))
  override def nullable: Boolean = true

  private lazy val fub = AttributeReference("fub", DoubleType, nullable = false)()
  private lazy val flb = AttributeReference("flb", DoubleType, nullable = false)()
  private lazy val up = AttributeReference("up", BooleanType, nullable = false)()
  private lazy val pc = AttributeReference("pc", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", IntegerType, nullable = false)()
  private lazy val lastNull = AttributeReference("lastNull", BooleanType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(fub, flb, up, pc, seen, lastNull)

  override val initialValues: Seq[Expression] = Seq(
    Literal(0.0), Literal(0.0), Literal(false), Literal(0.0),
    Literal(0), Literal(true))

  private def ub: Expression = Cast(bub, DoubleType)
  private def lb: Expression = Cast(blb, DoubleType)
  private def c: Expression = Cast(close, DoubleType)
  private def inNull: Expression =
    Or(Or(IsNull(bub), IsNull(blb)), IsNull(close))

  // Evaluated against the PRE-update buffer; shared sub-states (the new
  // bands) are re-derived per slot — expressions cannot bind temps.
  private def nFub: Expression =
    If(Or(LessThan(ub, fub), GreaterThan(pc, fub)), ub, fub)
  private def nFlb: Expression =
    If(Or(GreaterThan(lb, flb), LessThan(pc, flb)), lb, flb)
  private def nUp: Expression =
    If(up, Not(LessThan(c, nFlb)), GreaterThan(c, nFub))

  override val updateExpressions: Seq[Expression] = Seq(
    If(inNull, fub, If(EqualTo(seen, Literal(0)), ub, nFub)),
    If(inNull, flb, If(EqualTo(seen, Literal(0)), lb, nFlb)),
    If(inNull, up,
      If(EqualTo(seen, Literal(0)), GreaterThan(c, ub), nUp)),
    If(inNull, pc, c),
    If(inNull, seen, Add(seen, Literal(1))),
    inNull)

  override val evaluateExpression: Expression =
    If(And(GreaterThanOrEqual(seen, Literal(1)), Not(lastNull)),
      CreateNamedStruct(Seq(
        Literal("fub"), fub, Literal("flb"), flb,
        Literal("line"), If(up, flb, fub), Literal("up"), up)),
      Literal(null, dataType))

  override def prettyName: String = "supertrend"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SuperTrend =
    copy(bub = newChildren(0), blb = newChildren(1), close = newChildren(2))
}
