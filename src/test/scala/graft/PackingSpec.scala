package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packSequences: every doc in exactly one bin, no bin over budget, bounded waste") {
    val budget = 2048L
    val docs = spark.range(1, 1001).toDF("doc_id")
      .withColumn("n_tokens", (col("doc_id") * 131 % 651) + 50) // 50..700
    val packed = graft.operators.Packing.packSequences(docs, "doc_id", "n_tokens", budget)
      .cache()
    // every doc assigned exactly once
    assert(packed.count() == 1000)
    assert(packed.select("doc_id").distinct().count() == 1000)
    // no bin exceeds the budget
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("toks"), count(lit(1)).as("n"))
      .collect()
    assert(bins.forall(_.getAs[Long]("toks") <= budget),
      s"over-budget bins: ${bins.filter(_.getAs[Long]("toks") > budget).mkString(",")}")
    // waste bound: BFD within partitions ≈ optimal; allow 20% + one
    // under-filled bin per partition (4 test partitions)
    val totalTokens = docs.agg(sum("n_tokens")).head.getLong(0)
    val lowerBound = (totalTokens + budget - 1) / budget
    assert(bins.length <= math.ceil(lowerBound * 1.2).toLong + 4,
      s"${bins.length} bins vs lower bound $lowerBound")
    packed.unpersist()
  }

  test("packSequences: oversize docs land in singleton bins, others still respect budget") {
    val docs = Seq((1L, 5000L), (2L, 100L), (3L, 200L), (4L, 6000L))
      .toDF("doc_id", "n_tokens")
    val packed = graft.operators.Packing.packSequences(docs, "doc_id", "n_tokens", 1024L)
    val byBin = packed.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id"))
    val binOf = byBin.toMap
    // the two oversize docs are alone in their bins
    assert(byBin.count(_._2 == binOf(1L)) == 1)
    assert(byBin.count(_._2 == binOf(4L)) == 1)
    // the small docs pack together (200 + 100 ≤ 1024) when co-partitioned
    val sums = packed.groupBy("bin_id").agg(sum("n_tokens").as("t")).collect()
      .map(_.getAs[Long]("t"))
    assert(sums.count(_ > 1024L) == 2) // exactly the singletons exceed
  }

  test("mx21 multimodal packing: budget respected, modality split sums, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.MiscQueries.mx21MultimodalPacking
    val rows = q.run(TestSpark.spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_examples"))
      val tot = r.getLong(r.fieldIndex("tokens_total"))
      val fill = r.getLong(r.fieldIndex("fill_ppm"))
      // no bin over the 4096 budget (over-budget examples were excluded)
      assert(tot <= 4096L && fill <= 1000000L)
      assert(fill == 1000000L * tot / 4096L)
      // the modality split partitions the bin
      assert(r.getLong(r.fieldIndex("n_image")) + r.getLong(r.fieldIndex("n_audio"))
        + r.getLong(r.fieldIndex("n_video")) == n)
    }
    // every under-budget example lands in exactly one bin
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val expected = graft.Tables.documents(spark2, dir).count() // all docs fit: max
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_examples"))).sum <= expected)
    // deterministic: a second run reproduces the report bit-for-bit
    val again = q.run(TestSpark.spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
