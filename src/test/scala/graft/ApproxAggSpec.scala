package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Error-bound contract for the sketch aggregates in `q_approx_stats`: no
  * SQL oracle can pin sketch estimates (HLL/KLL parameters are
  * implementation-defined), so this spec asserts them against the EXACT
  * values on the same data — the check a user of approximate profiling
  * actually cares about. Also pins single-pass plan shape: sketches must
  * partial-aggregate (one exchange, no sort/window).
  */
class ApproxAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 3x rsd of exact; percentiles within rank tolerance") {
    val approx = graft.queries.MiscQueries.qApproxStats.run(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("o_custkey")).as("nd"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((seg, a) <- approx) {
      val e = exact(seg)
      val nd = e.getAs[Long]("nd").toDouble
      assert(math.abs(a.getAs[Long]("approx_customers") - nd) / nd <= 0.03,
        s"$seg: HLL estimate ${a.getAs[Long]("approx_customers")} vs exact $nd")
      // percentile_approx(accuracy=10000) guarantees rank error ≤ n/10000;
      // translate to a loose value tolerance via the exact p45/p95 envelope
      val lo50 = e.getAs[Double]("p50") * 0.9; val hi50 = e.getAs[Double]("p50") * 1.1
      val p50 = a.getAs[Double]("approx_p50")
      assert(p50 >= lo50 && p50 <= hi50, s"$seg: approx p50 $p50 outside ±10% of exact")
      val p90 = a.getAs[Double]("approx_p90")
      val e90 = e.getAs[Double]("p90")
      assert(math.abs(p90 - e90) / e90 <= 0.1, s"$seg: approx p90 $p90 vs exact $e90")
    }
  }

  test("q_profile_approx: HLL profile within 3x rsd of the exact profile, no Expand") {
    val exact = graft.queries.MiscQueries.qProfile.run(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.queries.MiscQueries.qProfileApprox.run(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((c, a) <- approx) {
      val e = exact(c)
      // rows and null counts are exact in BOTH plans — must match exactly
      assert(a.getAs[Long]("n_rows") == e.getAs[Long]("n_rows"), s"$c: n_rows")
      assert(a.getAs[Long]("n_null") == e.getAs[Long]("n_null"), s"$c: n_null")
      val nd = e.getAs[Long]("n_distinct").toDouble
      val hll = a.getAs[Long]("n_distinct_approx").toDouble
      assert(math.abs(hll - nd) / nd <= 0.06,
        s"$c: HLL estimate $hll vs exact $nd (outside 3x the configured rsd 0.02)")
    }
    // the reason this is the 100 TB plan: no Expand fan-out, unlike q_profile
    val pApprox = graft.queries.MiscQueries.qProfileApprox.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!pApprox.contains("Expand"), "HLL profile must aggregate in one flat pass")
    val pExact = graft.queries.MiscQueries.qProfile.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pExact.contains("Expand"),
      "exact multi-distinct profile plans an Expand — if this changed, revisit the doc")
  }

  test("q_profile_li_approx: lineitem HLL profile within 3x rsd, no Expand") {
    val exact = graft.queries.MiscQueries.qProfileLi.run(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.queries.MiscQueries.qProfileLiApprox.run(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((c, a) <- approx) {
      val e = exact(c)
      assert(a.getAs[Long]("n_rows") == e.getAs[Long]("n_rows"), s"$c: n_rows")
      assert(a.getAs[Long]("n_null") == e.getAs[Long]("n_null"), s"$c: n_null")
      val nd = e.getAs[Long]("n_distinct").toDouble
      val hll = a.getAs[Long]("n_distinct_approx").toDouble
      assert(math.abs(hll - nd) / nd <= 0.06,
        s"$c: HLL estimate $hll vs exact $nd (outside 3x the configured rsd 0.02)")
    }
    val pApprox = graft.queries.MiscQueries.qProfileLiApprox.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!pApprox.contains("Expand"), "HLL profile must aggregate in one flat pass")
  }

  test("Misra-Gries heavy hitters: candidates cover every true hitter; output is exact") {
    import spark.implicits._
    // skewed stream: "hot" 40%, "warm" 15%, tail spread over 1000 values
    val n = 20000
    val vals = spark.range(n).map { i =>
      if (i % 10 < 4) "hot"                          // 40%
      else if (i % 20 >= 4 && i % 20 < 7) "warm"     // 15%
      else s"tail_${i % 1000}"
    }.toDF("value").repartition(8)
    val k = 9 // threshold = n/10 — "hot" and "warm" qualify, the tail cannot
    val exact = vals.groupBy("value").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n / (k + 1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == Set("hot", "warm"), s"test data drifted: $exact")
    // superset guarantee: every true hitter appears among the ≤k candidates
    val cand = graft.operators.Sketches.mgCandidates(vals, col("value"), k)
    assert(cand.size <= k)
    assert(exact.keySet.subsetOf(cand.keySet),
      s"MG summary lost a true heavy hitter: have ${cand.keySet}")
    // end-to-end exactness: sketch-then-verify equals the full GROUP BY
    val got = graft.operators.Sketches.heavyHitters(vals, col("value"), k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("in-run bounds witness: all three no-oracle sketch queries report bounds_ok; a corrupted estimate is caught") {
    for (name <- Seq("q_approx_stats", "q_profile_approx", "q_profile_li_approx")) {
      val back = graft.SparkEntry.queries(name)(spark, sf)
      val (ok, rep) = graft.queries.MiscQueries.approxBounds(name, spark, sf, back)
        .getOrElse(fail(s"$name must have a bounds witness"))
      assert(ok, s"$name bounds violated:\n$rep")
      assert(rep.contains("\"bounds_ok\":true"))
    }
    // injected corruption: a 2x-inflated HLL estimate must flip bounds_ok
    val corrupted = graft.queries.MiscQueries.qProfileApprox.run(spark, sf)
      .withColumn("n_distinct_approx", col("n_distinct_approx") * 2L)
    val (ok2, rep2) = graft.queries.MiscQueries.approxBounds(
      "q_profile_approx", spark, sf, corrupted).get
    assert(!ok2 && rep2.contains("\"bounds_ok\":false"), rep2)
    // non-sketch queries have no witness
    assert(graft.queries.MiscQueries.approxBounds("q1_agg", spark, sf,
      spark.range(1).toDF()).isEmpty)
  }

  test("sketch aggregation is a single-pass partial aggregate — one exchange, no sort") {
    val p = graft.queries.MiscQueries.qApproxStats.run(spark, sf)
      .queryExecution.executedPlan.toString
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // one exchange for the join (customer side broadcasts) + one for the agg
    assert(hashEx <= 2, s"expected at most join+agg exchanges, got $hashEx:\n$p")
    assert(p.contains("partial_approx_count_distinct") ||
      p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "sketches must map-side partial-aggregate")
    assert(!p.contains("Window "), "no window/sort pass for sketch stats")
  }
}
