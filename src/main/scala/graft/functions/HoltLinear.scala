package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Holt's linear-trend (double exponential) smoothing — Holt 1957 /
  * Hyndman & Athanasopoulos, "Forecasting: Principles and Practice"
  * §8.2 (public literature) — as a native Catalyst window function in
  * the [[Ewm]]/[[Psar]] declarative-state pattern: the coupled
  * level/trend recursion
  *
  *   ŷ_t = l_{t−1} + b_{t−1}                       (one-step forecast)
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * is a 2-state linear system no single EWMA expresses (the level feeds
  * the trend and the trend feeds the level), so it carries both states
  * through pure expression updates inside one keyed WindowExec — no
  * reshuffle beyond the window sort, composes with neighboring window
  * functions over the same spec.
  *
  * Pinned conventions (so a SQL oracle can replay bit-for-bit):
  *   - seed at each key's first non-null row: l = y, b = 0; that row
  *     emits (l, b, fitted = NULL) — with no prior state there is no
  *     one-step forecast;
  *   - every update is the fixed IEEE sequence
  *     `α·y + (1−α)·(l+b)` then `β·(l_new − l) + (1−β)·b`, with α, β
  *     and their complements taken from the literals verbatim (no
  *     re-derivation of 1−α at runtime);
  *   - NULL inputs leave the state untouched and emit NULL (the
  *     [[SuperTrend]] discipline).
  *
  * A single recursive CTE carrying (l, b) replays the sequence exactly
  * (the w17_adx single-CTE discipline).
  *
  * Returns STRUCT(level DOUBLE, trend DOUBLE, fitted DOUBLE).
  */
case class HoltLinear(value: Expression, alpha: Double, beta: Double)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(value)
  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("trend", DoubleType),
    StructField("fitted", DoubleType)))
  override def nullable: Boolean = true

  private lazy val l = AttributeReference("l", DoubleType, nullable = false)()
  private lazy val b = AttributeReference("b", DoubleType, nullable = false)()
  private lazy val fit = AttributeReference("fit", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", IntegerType, nullable = false)()
  private lazy val lastNull = AttributeReference("lastNull", BooleanType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(l, b, fit, seen, lastNull)

  override val initialValues: Seq[Expression] = Seq(
    Literal(0.0), Literal(0.0), Literal(0.0), Literal(0), Literal(true))

  private def y: Expression = Cast(value, DoubleType)
  private def inNull: Expression = IsNull(value)

  // Evaluated against the PRE-update buffer; the new level is re-derived
  // inside the trend slot — expressions cannot bind temps.
  private def nL: Expression =
    Add(Multiply(Literal(alpha), y),
      Multiply(Literal(1.0 - alpha), Add(l, b)))
  private def nB: Expression =
    Add(Multiply(Literal(beta), Subtract(nL, l)),
      Multiply(Literal(1.0 - beta), b))

  override val updateExpressions: Seq[Expression] = Seq(
    If(inNull, l, If(EqualTo(seen, Literal(0)), y, nL)),
    If(inNull, b, If(EqualTo(seen, Literal(0)), Literal(0.0), nB)),
    If(inNull, fit, Add(l, b)), // pre-update state = the one-step forecast
    If(inNull, seen, Add(seen, Literal(1))),
    inNull)

  override val evaluateExpression: Expression =
    If(And(GreaterThanOrEqual(seen, Literal(1)), Not(lastNull)),
      CreateNamedStruct(Seq(
        Literal("level"), l, Literal("trend"), b,
        Literal("fitted"),
        If(EqualTo(seen, Literal(1)), Literal(null, DoubleType), fit))),
      Literal(null, dataType))

  override def prettyName: String = "holt"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltLinear =
    copy(value = newChildren(0))
}
