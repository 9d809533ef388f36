package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries top-k as a NATIVE mergeable aggregate function
  * (`TypedImperativeAggregate` — the same extension tier as Spark's own
  * HLL/percentile sketches): `mg_topk(s, k)` summarizes any string column
  * into a ≤k-counter frequency sketch whose counts undercount by at most
  * n/(k+1) (the classic MG bound), in ONE pass with map-side partial
  * aggregation — each task keeps one k-entry map, partials merge by the
  * pair-and-cancel rule ([[graft.operators.Sketches.mgAdd]], the SAME
  * kernel as the RDD-tier `mgCandidatesWithTotal`), and only ≤k-entry
  * sketches ever cross the wire. This is the aggregate form the
  * GROUP-BY-heavy-hitters-per-segment query needs (`mg_topk(term, 50)
  * GROUP BY source`): the RDD/treeAggregate path can't group, a real
  * exact count can't bound memory — the native aggregate does both.
  *
  * Output: array<struct<term, cnt_lower>> sorted by (cnt_lower DESC, term)
  * — deterministic given deterministic merge order; like every MG summary
  * the ENTRIES are layout-dependent near the cancellation floor, so gated
  * queries must exact-verify candidates (the tx10 discipline) rather than
  * hash the raw sketch.
  */
case class MgTopK(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.Map[String, Long]] {

  require(k > 0, "mg_topk: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt_lower", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mg_topk requires a string argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): scala.collection.mutable.Map[String, Long] =
    scala.collection.mutable.Map.empty[String, Long]

  override def update(
      buf: scala.collection.mutable.Map[String, Long],
      input: InternalRow): scala.collection.mutable.Map[String, Long] = {
    val v = child.eval(input)
    if (v != null) graft.operators.Sketches.mgAdd(buf, k, v.toString, 1L)
    buf
  }

  override def merge(
      buf: scala.collection.mutable.Map[String, Long],
      other: scala.collection.mutable.Map[String, Long]): scala.collection.mutable.Map[String, Long] = {
    other.foreach { case (v, c) => graft.operators.Sketches.mgAdd(buf, k, v, c) }
    buf
  }

  override def eval(buf: scala.collection.mutable.Map[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: scala.collection.mutable.Map[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.Map[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = scala.collection.mutable.Map.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgTopK = copy(child = newChildren.head)
  override def prettyName: String = "mg_topk"
}
