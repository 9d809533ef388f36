package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Skew, Temporal}

class TemporalSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000)

  test("asofJoin picks the latest right row at-or-before, per key") {
    val left = Seq(
      (1L, ts(10), "p1"), (1L, ts(20), "p2"), (1L, ts(5), "p0"),
      (2L, ts(10), "q1")).toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts(8), 100.0), (1L, ts(15), 200.0),
      (3L, ts(1), 999.0)).toDF("user_id", "ts", "price")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", Map("price" -> "last_price"))
      .orderBy("user_id", "ts")
      .select("user_id", "name", "last_price")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (1L, "p0", None),          // before any right row
      (1L, "p1", Some(100.0)),   // ts(8) is latest ≤ 10
      (1L, "p2", Some(200.0)),   // ts(15) is latest ≤ 20
      (2L, "q1", None)))         // no right rows for key 2
  }

  test("asofJoin treats equal timestamps as at-or-before") {
    val left = Seq((1L, ts(10), "p")).toDF("user_id", "ts", "name")
    val right = Seq((1L, ts(10), 5.0)).toDF("user_id", "ts", "price")
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "ts", Map("price" -> "last_price"))
    assert(out.select("last_price").head().getDouble(0) == 5.0)
  }

  test("asofNearest: tie-goes-backward, inclusive tolerance boundary, per key") {
    val tol = 600000000L // 10 min in µs
    val left = Seq(
      (1L, ts(100), "straddle_tie"),   // right at 90 and 110: symmetric → backward
      (2L, ts(100), "forward_nearer"), // right at 80 and 105: forward wins
      (3L, ts(100), "boundary_in"),    // right at exactly +tol: inclusive → in
      (4L, ts(100), "boundary_out"),   // right at +tol+1min: out → no match
      (5L, ts(100), "equal_time"),     // right at 100: delta 0, backward path
      (6L, ts(100), "no_right")        // no right rows for this key
    ).toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts(90)), (1L, ts(110)),
      (2L, ts(80)), (2L, ts(105)),
      (3L, ts(110)),
      (4L, ts(111)),
      (5L, ts(100)),
      (7L, ts(100))                    // foreign key: must never leak
    ).toDF("user_id", "ts")
    val out = Temporal.asofNearest(left, right, Seq("user_id"), "ts", tol, "near_ts")
      .orderBy("user_id")
      .collect()
      .map { r =>
        val nearMin = if (r.isNullAt(r.fieldIndex("near_ts"))) None
          else Some(r.getTimestamp(r.fieldIndex("near_ts")).getTime / 60000)
        val delta = if (r.isNullAt(r.fieldIndex("near_ts_delta_us"))) None
          else Some(r.getLong(r.fieldIndex("near_ts_delta_us")))
        (r.getLong(r.fieldIndex("user_id")), nearMin, delta)
      }.toSeq
    assert(out == Seq(
      (1L, Some(90L), Some(-600000000L)),  // tie → backward, delta signed negative
      (2L, Some(105L), Some(300000000L)),  // nearer forward
      (3L, Some(110L), Some(600000000L)),  // |delta| == tol is IN (inclusive)
      (4L, None, None),                    // just outside tolerance
      (5L, Some(100L), Some(0L)),          // equal-time right row, delta 0
      (6L, None, None)))                   // key isolation
    // output schema: all left columns + the two appended ones, nothing else
    assert(Temporal.asofNearest(left, right, Seq("user_id"), "ts", tol, "near_ts")
      .columns.toSeq == Seq("user_id", "ts", "name", "near_ts", "near_ts_delta_us"))
  }

  test("rangeJoin: inclusive lower, exclusive upper, per key, boundary-exact") {
    // band = [left.ts − 10 min, left.ts): right rows at exactly −10 min are
    // IN, at exactly 0 are OUT — boundary rows sit on bucket edges, so this
    // also exercises the integer floor-div bucketing
    val left = Seq((1L, ts(100), "L1"), (2L, ts(100), "L2")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(90), "in_lower_edge"),   // == lt - 10min → in
      (1L, ts(95), "in_mid"),
      (1L, ts(100), "out_upper_edge"), // == lt → out (exclusive)
      (1L, ts(89), "out_before"),
      (2L, ts(95), "in_other_key"),
      (3L, ts(95), "out_wrong_key")).toDF("user_id", "ts", "label")
    val out = Temporal.rangeJoin(left, right, Seq("user_id"), "ts", "ts",
      lowerUs = -600000000L, upperUs = 0L, rightCols = Map("label" -> "label"))
    val got = out.select("tag", "label").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("L1", "in_lower_edge"), ("L1", "in_mid"), ("L2", "in_other_key")))
  }

  test("sessionize splits on gap > threshold, per key, 1-based ids") {
    val df = Seq(
      (1L, ts(0), "a"), (1L, ts(10), "b"),   // gap 10 ≤ 30 → same session
      (1L, ts(50), "c"),                     // gap 40 > 30 → new session
      (1L, ts(70), "d"),
      (2L, ts(0), "x"), (2L, ts(200), "y")   // key 2 independent
    ).toDF("user_id", "ts", "tag")
    val out = Temporal.sessionize(df, Seq("user_id"), "ts", gapUs = 30L * 60000000L)
      .select("user_id", "tag", "session_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, "a", 1L), (1L, "b", 1L), (1L, "c", 2L), (1L, "d", 2L),
      (2L, "x", 1L), (2L, "y", 2L)))
  }

  test("sessionize: timestamp ties share a session (RANGE peers), exact-gap stays") {
    // two rows at the identical timestamp after a session break: both must
    // land in the NEW session regardless of tie order (the running sum uses
    // a RANGE frame, so peers see the same prefix)
    val df = Seq(
      (1L, ts(0), "a"), (1L, ts(100), "t1"), (1L, ts(100), "t2"),
      (1L, ts(130), "edge")                  // gap == 30 min exactly → same
    ).toDF("user_id", "ts", "tag")
    val out = Temporal.sessionize(df, Seq("user_id"), "ts", gapUs = 30L * 60000000L)
      .select("tag", "session_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("a" -> 1L, "t1" -> 2L, "t2" -> 2L, "edge" -> 2L))
  }

  test("saltedJoin skew bound: hot key's max partition input shrinks ~1/buckets") {
    import org.apache.spark.sql.{Column, DataFrame}
    val n = 20000
    val buckets = 8
    // pathological skew AQE splits can't fix by planning: ONE key holds 60%
    // of the big side; the remaining 40% spreads over 100 keys
    val big = spark.range(n).toDF("i").select(
      when(col("i") % 10 < 6, 0L).otherwise(pmod(col("i"), lit(100L)) + 1).as("k"),
      col("i").as("v"))
    // a shuffle join hash-partitions its big side on the join keys; measure
    // that distribution directly — rows per partition under hashpartitioning
    // on (k) vs on (k, __salt), with enough partitions that sub-keys separate
    def maxPartRows(df: DataFrame, keys: Column*): Long =
      df.repartition(128, keys: _*).rdd
        .mapPartitions(it => Iterator(it.size.toLong)).collect().max
    val unsaltedMax = maxPartRows(big, col("k"))
    val saltedMax = maxPartRows(graft.operators.Skew.withSalt(big, buckets),
      col("k"), col("__salt"))
    assert(unsaltedMax >= (0.6 * n).toLong,
      s"hot key should funnel into one partition unsalted, max=$unsaltedMax")
    // each of the `buckets` sub-keys carries ~1/buckets of the hot key; allow
    // 2x for sub-keys that hash-collide into one partition plus cold-key share
    assert(saltedMax <= unsaltedMax * 2 / buckets,
      s"salted max partition $saltedMax should be ~unsalted/$buckets (=${unsaltedMax / buckets})")
    // and the salted join still returns exactly the plain join's rows
    val small = (0L to 100L).map(kk => (kk, s"name$kk")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), buckets).select("k", "v", "name")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val big = (1 to 1000).map(i => (i % 3L, i.toLong)).toDF("k", "v") // skewed: 3 keys
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (9L, "unmatched")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), buckets = 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
