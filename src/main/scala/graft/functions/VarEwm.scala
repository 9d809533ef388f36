package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Variable-alpha exponential smoothing — the recursion behind Kaufman's
  * Adaptive Moving Average (Kaufman, "Smarter Trading", 1995; public
  * literature) and any EMA whose smoothing constant is itself a per-row
  * signal:
  *
  *   k_t = k_{t−1} + a_t · (y_t − k_{t−1})
  *
  * [[Ewm]] pins alpha at plan time; here alpha is a full per-row CHILD
  * EXPRESSION, so the adaptive smoothing constant can be computed
  * declaratively upstream (rolling efficiency ratios, volatility gates,
  * regime flags) and fed into one keyed WindowExec alongside the price —
  * no reshuffle beyond the window sort, composes with neighboring window
  * functions over the same spec.
  *
  * Pinned conventions (so a SQL oracle can replay bit-for-bit):
  *   - a row is ACTIVE iff BOTH value and alpha are non-null; inactive
  *     rows leave the state untouched and emit NULL (the [[SuperTrend]]
  *     discipline) — this is what lets a warmup window (alpha undefined
  *     until its lookbacks fill) delay the seed;
  *   - the FIRST active row per key seeds k = y (alpha unused) and emits
  *     the seed;
  *   - every later active row applies the fixed IEEE sequence
  *     `k + a·(y − k)` — one subtract, one multiply, one add, never
  *     algebraically rearranged — and emits the new k.
  *
  * A single recursive CTE carrying k replays the sequence exactly (the
  * w17_adx single-CTE discipline): seed `SELECT ..., y AS k` at the first
  * row with a non-null alpha, step `r.k + g.a * (g.y − r.k)`.
  */
case class VarEwm(value: Expression, alpha: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(value, alpha)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val k = AttributeReference("k", DoubleType, nullable = false)()
  private lazy val seeded = AttributeReference("seeded", BooleanType, nullable = false)()
  private lazy val lastActive = AttributeReference("lastActive", BooleanType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(k, seeded, lastActive)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(false), Literal(false))

  private def y: Expression = Cast(value, DoubleType)
  private def a: Expression = Cast(alpha, DoubleType)
  private def active: Expression = And(IsNotNull(value), IsNotNull(alpha))

  // k + a·(y − k), evaluated against the PRE-update buffer.
  private def step: Expression = Add(k, Multiply(a, Subtract(y, k)))

  override val updateExpressions: Seq[Expression] = Seq(
    If(active, If(seeded, step, y), k),
    Or(seeded, active),
    active)

  override val evaluateExpression: Expression =
    If(And(seeded, lastActive), k, Literal(null, DoubleType))

  override def prettyName: String = "var_ewm"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VarEwm =
    copy(value = newChildren(0), alpha = newChildren(1))
}
