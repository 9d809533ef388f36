package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 61-bit content hash: the first eight MD5 bytes of the
  * UTF-8 string (an unsigned 64-bit value) reduced mod p = 2^61 − 1 —
  * exactly `CAST(concat('0x', substr(md5(s),1,16)) AS UBIGINT) % p` (the
  * round-14 MinHash field hash, [[graft.operators.Dedup.MinhashPrime]]),
  * in one JVM call that participates in whole-stage codegen.
  *
  * This is [[Hash32Expr]]'s scale-safe sibling: the 32-bit space enters
  * the birthday regime around 10⁵ distinct grams per bucket-population
  * and saturates outright at 100 TB corpus gram counts (≫ 2^32), which
  * turns hash-keyed df caps, span grouping and novelty estimates into
  * collision noise. 2^61 keeps the expected collision count ≪ 1 at
  * trillion-gram scale. (SimHash bit sketches and mod-256 feature hashing
  * keep hash32 — collision behavior is their documented semantics.)
  */
case class Hash61Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hash61 requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Hash61Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash61Expr.hash($c)")

  override def prettyName: String = "hash61"
  override protected def withNewChildInternal(newChild: Expression): Hash61Expr =
    copy(child = newChild)
}

object Hash61Expr {
  val P: Long = (1L << 61) - 1
  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.remainderUnsigned(v, P)
  }
}
