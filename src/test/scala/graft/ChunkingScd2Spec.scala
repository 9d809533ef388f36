package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ChunkingScd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("slidingWindows: full coverage, stride advance, short tail chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),   // n=10 > window
      (2L, "a b c"),                                     // n=3 <= window → 1 chunk
      (3L, (1 to 8).map(i => s"u$i").mkString(" "))      // n=8=window boundary → 1 chunk
    ).toDF("doc_id", "text")
    val out = graft.operators.Chunking
      .slidingWindows(docs, "doc_id", "text", window = 8, stride = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_text")))
      .sortBy(t => (t._1, t._2))
    // doc 1: n=10 → ceil((10-8)/4)+1 = 2 chunks at starts 0, 4
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 8L), (1L, 4L, 6L)))
    assert(d1(0)._5 == (1 to 8).map(i => s"t$i").mkString(" "))
    assert(d1(1)._5 == (5 to 10).map(i => s"t$i").mkString(" ")) // short tail
    // every token of doc 1 appears in at least one chunk
    val covered = d1.flatMap(_._5.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    // docs 2 and 3: exactly one chunk, full text
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L, "a b c")))
    assert(out.count(_._1 == 3L) == 1)
  }

  test("scd2Versions: runs collapse, intervals abut, leading null run kept") {
    val d = java.sql.Date.valueOf(_: String)
    val feed = Seq(
      // key 1: A A B A — 3 versions
      (1L, d("2024-01-01"), 10L, "A"),
      (1L, d("2024-01-05"), 11L, "A"),
      (1L, d("2024-02-01"), 12L, "B"),
      (1L, d("2024-03-01"), 13L, "A"),
      // key 2: leading null attribute, then a value
      (2L, d("2024-01-02"), 20L, null),
      (2L, d("2024-01-09"), 21L, "C")
    ).toDF("k", "eff", "seq", "attr")
    val v = graft.operators.Temporal
      .scd2Versions(feed, Seq("k"), Seq("eff", "seq"), "attr", "eff")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getDate(2)).map(_.toString).orNull,
        Option(r.getDate(3)).map(_.toString).orNull, r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    assert(v.filter(_._1 == 1L).toSeq == Seq(
      (1L, "A", "2024-01-01", "2024-02-01", 0L),
      (1L, "B", "2024-02-01", "2024-03-01", 0L),
      (1L, "A", "2024-03-01", null, 1L)))
    assert(v.filter(_._1 == 2L).toSeq == Seq(
      (2L, null, "2024-01-02", "2024-01-09", 0L),
      (2L, "C", "2024-01-09", null, 1L)))
    // exactly one current version per key
    assert(v.groupBy(_._1).forall(_._2.count(_._5 == 1L) == 1))
  }

  test("weightedHashSample: weight-monotone per row, 0 keeps none, 1 keeps all") {
    val docs = spark.range(1, 2001).toDF("doc_id")
    def kept(w: Double): Set[Long] = graft.operators.Sampling
      .weightedHashSample(docs, "doc_id", lit(w), "mono")
      .collect().map(_.getLong(0)).toSet
    assert(kept(0.0).isEmpty)
    assert(kept(1.0).size == 2000)
    // per-row monotonicity: raising the weight can only ADD rows — the
    // property that makes quality-weighted mixes stable under re-weighting
    val w25 = kept(0.25); val w50 = kept(0.5); val w75 = kept(0.75)
    assert(w25.subsetOf(w50) && w50.subsetOf(w75))
    // and the rate tracks the weight
    assert(math.abs(w50.size - 1000) < 100, s"got ${w50.size} at weight 0.5")
  }

  test("labelCentroidSums: partial frames merge to the full answer (mergeability)") {
    val a = Seq((0, Seq(0.5f, -0.25f)), (1, Seq(1.0f, 2.0f))).toDF("label", "embedding")
    val b = Seq((0, Seq(0.25f, 0.75f))).toDF("label", "embedding")
    def sums(df: org.apache.spark.sql.DataFrame) = graft.operators.Similarity
      .labelCentroidSums(df, "label", "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val whole = sums(a.union(b))
    val merged = (sums(a).toSeq ++ sums(b).toSeq).groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.map(_._2._1).sum, vs.map(_._2._2).sum)) }
    assert(whole == merged)
    assert(whole((0L, 0L)) == ((500000L + 250000L, 2L)))
  }
}
