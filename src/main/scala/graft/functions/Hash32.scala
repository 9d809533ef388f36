package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 32-bit content hash: the first four MD5 bytes of the
  * UTF-8 string, big-endian, as an unsigned long — exactly
  * `conv(substring(md5(s),1,8),16,10)` (the minhash/simhash token hash),
  * but one JVM call instead of a three-expression chain with hex-string
  * round-trips, and it participates in whole-stage codegen (`doGenCode`
  * emits a direct static call, no interpreted fallback).
  */
case class Hash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hash32 requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Hash32Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash32Expr.hash($c)")

  override def prettyName: String = "hash32"
  override protected def withNewChildInternal(newChild: Expression): Hash32Expr =
    copy(child = newChild)
}

object Hash32Expr {
  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
