package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Holt–Winters additive seasonal smoothing (Winters 1960; Hyndman &
  * Athanasopoulos §8.3 — public literature) as a native Catalyst window
  * function: the triple-coupled recursion
  *
  *   ŷ_t = l_{t−1} + b_{t−1} + s_{t−m}                    (fitted)
  *   l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *   s_t = γ·(y_t − (l_{t−1} + b_{t−1})) + (1−γ)·s_{t−m}
  *
  * extends the [[HoltLinear]] 2-state machine with a VECTOR of m
  * seasonal states. The period is a plan-time literal, so the vector
  * unrolls into m scalar Double buffer slots that shift by one each row
  * (s₀ is always s_{t−m}) — every update stays a pure primitive-typed
  * expression, whole-stage-codegen-friendly, one keyed WindowExec, no
  * per-row allocation.
  *
  * Pinned conventions (so a SQL oracle can replay bit-for-bit):
  *   - seed at each key's first non-null row: l = y, b = 0, seasonal
  *     vector all ZERO and untouched (the operational zero-seeded
  *     convention — no classical two-season initialization pass; a
  *     caller wanting it can pre-bias the series), fitted NULL;
  *   - each later update is the fixed IEEE sequence above, evaluated
  *     left-to-right exactly as written (y − s_old first, l+b reused
  *     as written, never rearranged);
  *   - NULL inputs leave all state untouched and emit NULL (the
  *     [[SuperTrend]] discipline).
  *
  * A single recursive CTE carrying (l, b, s1..s_m) replays the sequence
  * exactly (the w17_adx single-CTE discipline; the chained nL→nB→nS
  * bindings nest as subqueries, the w20_trix pattern).
  *
  * Returns STRUCT(level, trend, seasonal, fitted) — `seasonal` is the
  * s_t just written (0.0 on the seed row).
  */
case class HoltWinters(value: Expression, alpha: Double, beta: Double,
    gamma: Double, period: Int)
    extends AggregateWindowFunction {

  require(period >= 2, "holt_winters: period must be >= 2")

  override def children: Seq[Expression] = Seq(value)
  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("trend", DoubleType),
    StructField("seasonal", DoubleType), StructField("fitted", DoubleType)))
  override def nullable: Boolean = true

  private lazy val l = AttributeReference("l", DoubleType, nullable = false)()
  private lazy val b = AttributeReference("b", DoubleType, nullable = false)()
  private lazy val fit = AttributeReference("fit", DoubleType, nullable = false)()
  private lazy val seen = AttributeReference("seen", IntegerType, nullable = false)()
  private lazy val lastNull = AttributeReference("lastNull", BooleanType, nullable = false)()
  // s(0) = s_{t−m} (the oldest), s(period−1) = s_{t−1} (the newest)
  private lazy val s: IndexedSeq[AttributeReference] =
    IndexedSeq.tabulate(period)(i =>
      AttributeReference(s"s$i", DoubleType, nullable = false)())

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(l, b, fit, seen, lastNull) ++ s

  override val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0), Literal(0), Literal(true)) ++
      Seq.fill(period)(Literal(0.0))

  private def y: Expression = Cast(value, DoubleType)
  private def inNull: Expression = IsNull(value)
  private def seedRow: Expression = EqualTo(seen, Literal(0))

  // All evaluated against the PRE-update buffer (s(0) = s_{t−m}).
  private def nL: Expression =
    Add(Multiply(Literal(alpha), Subtract(y, s(0))),
      Multiply(Literal(1.0 - alpha), Add(l, b)))
  private def nB: Expression =
    Add(Multiply(Literal(beta), Subtract(nL, l)),
      Multiply(Literal(1.0 - beta), b))
  private def nS: Expression =
    Add(Multiply(Literal(gamma), Subtract(y, Add(l, b))),
      Multiply(Literal(1.0 - gamma), s(0)))

  override val updateExpressions: Seq[Expression] =
    Seq(
      If(inNull, l, If(seedRow, y, nL)),
      If(inNull, b, If(seedRow, Literal(0.0), nB)),
      If(inNull, fit, Add(Add(l, b), s(0))),
      If(inNull, seen, Add(seen, Literal(1))),
      inNull) ++
    // shift the seasonal vector by one; the newest slot takes s_t
    Seq.tabulate(period) { i =>
      val shifted = if (i < period - 1) s(i + 1) else nS
      If(inNull, s(i), If(seedRow, s(i), shifted))
    }

  override val evaluateExpression: Expression =
    If(And(GreaterThanOrEqual(seen, Literal(1)), Not(lastNull)),
      CreateNamedStruct(Seq(
        Literal("level"), l, Literal("trend"), b,
        Literal("seasonal"), s(period - 1),
        Literal("fitted"),
        If(EqualTo(seen, Literal(1)), Literal(null, DoubleType), fit))),
      Literal(null, dataType))

  override def prettyName: String = "holt_winters"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltWinters =
    copy(value = newChildren(0))
}
