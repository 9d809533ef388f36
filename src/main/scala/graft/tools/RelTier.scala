package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× relational-tier smoke (round 15 — VERDICT r14 #3): the graph and
  * incremental kernels carry 20M-node/doc measured tiers, but the ~100-query
  * relational/analytic family had only ever executed at sf0.1 (~600k
  * lineitem). This tool
  *
  *  1. `gen <srcDir> <outDir> [replicas]` — materializes an sf1-equivalent
  *     tier by REPLICATING the sf0.1 tables `replicas`× with disjoint key
  *     spaces (every key column shifted by `i · 10⁸` per replica, original
  *     dtypes kept), nation/region copied once (TPC-H dims are
  *     SF-invariant). Join fan-outs scale exactly like a real SF bump —
  *     each replica's orders join only its own customers/lineitems — while
  *     value distributions (prices, dates, flags) are preserved verbatim.
  *     Non-key attribute values repeat across replicas (names, comments);
  *     the smoke queries aggregate/join on keys and measures, so the
  *     repetition is harmless and documented in docs/SCALE.md.
  *
  *  2. `run <sf01Dir> <sf1Dir> [query...]` — executes each query (default:
  *     the bench record's most expensive relational entries) on BOTH tiers
  *     through the noop sink, records wall / shuffle read+write / final-
  *     AQE-plan shape, and REQUIREs the shape (join-strategy multiset +
  *     shuffle-exchange count) is STABLE across the 10× bump — the
  *     broadcast→SMJ surprise and new-Exchange regressions PlanShapeSpec
  *     pins at one scale, here pinned across scales.
  *
  * Shape equality is on the FINAL adaptive plan, so a query whose broadcast
  * decision depends on runtime sizes (an AQE flip at 10×) fails loudly —
  * the fix is an explicit broadcast (if the side is bounded by design) or a
  * documented plan-shape note, never silence.
  */
object RelTier {

  private val Off = 100000000L // replica key shift; 9 replicas stay < 2³¹ for int keys

  private final class ShuffleMeter extends org.apache.spark.scheduler.SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
      ()
    }
    def reset(): Unit = { read.set(0); write.set(0) }
  }

  private def gen(spark: SparkSession, src: String, out: String, reps: Int): Unit = {
    def load(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[reltier] wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def replicate(name: String, keys: Seq[String]): Unit = {
      val base = load(name)
      val all = (0 until reps).map { i =>
        keys.foldLeft(base) { (df, k) =>
          val dt = base.schema(k).dataType
          df.withColumn(k, (col(k).cast("long") + lit(Off * i)).cast(dt))
        }
      }.reduce(_ unionByName _)
      write(all, name)
    }
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    write(load("nation"), "nation") // SF-invariant dims: copied once
    write(load("region"), "region")
  }

  /** The bench record's most expensive relational/analytic entries — the
    * ones whose 10× behavior the r14 verdict asked to measure.
    */
  val DefaultQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q9_nation_profit", "q18_large_orders",
    "q_abc_by_nation", "q_cohort_retention", "q_scd2_priority", "q_rfm",
    "q_zorder_layout", "q_hilbert_layout",
    "q_equi_depth_hist", "q_market_basket", "q_pareto")

  /** Flips that are CORRECT adaptivity, not regressions — each with the
    * reason a reviewer needs. A flip here still prints, but doesn't fail.
    */
  val DocumentedFlips: Map[String, String] = Map(
    "q18_large_orders" ->
      ("AQE demotes the qty>150 per-order aggregate from broadcast to " +
        "sort-merge once it outgrows the 10 MB threshold — that side scales " +
        "WITH orders (unbounded by design), so SMJ on the already-" +
        "aggregated orderkey partitioning IS the 100 TB plan; the sf0.1 " +
        "broadcast is small-data luck, and pinning it would ship a plan " +
        "that cannot run at scale. Shuffle stays linear (one orders pass)."))

  /** Join-strategy multiset + shuffle-exchange count of the FINAL adaptive
    * plan (rendered post-execution, so AQE's runtime choices are what's
    * compared). BroadcastExchange is counted separately from shuffle
    * Exchange; `(?<![A-Za-z])` keeps the two disjoint.
    */
  private[tools] def planShape(planStr: String): Map[String, Int] =
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "Exchange")
      .map { n =>
        n -> ("(?<![A-Za-z])" + n + "(?![A-Za-z])").r.findAllIn(planStr).length
      }.filter(_._2 > 0).toMap

  private def runTier(spark: SparkSession, meter: ShuffleMeter,
      name: String, dir: String): (Double, Long, Long, Map[String, Int]) = {
    org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
    meter.reset()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    org.apache.spark.graft.ListenerBusDrain.waitUntilEmpty(spark.sparkContext)
    val wall = (System.nanoTime() - t0) / 1e9
    val shape = planShape(df.queryExecution.executedPlan.toString)
    // release per-query reuse caches so tiers don't cross-subsidize
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.catalog.clearCache()
    graft.queries.Shared.clear()
    (wall, meter.read.get, meter.write.get, shape)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "gen" :: src :: out :: rest =>
        gen(spark, src, out, rest.headOption.map(_.toInt).getOrElse(10))
      case "run" :: sf01 :: sf1 :: rest =>
        val meter = new ShuffleMeter
        spark.sparkContext.addSparkListener(meter)
        val queries = if (rest.nonEmpty) rest else DefaultQueries.toList
        var flipped = List.empty[String]
        println(f"${"query"}%-24s ${"sf0.1 wall"}%10s ${"sf1 wall"}%9s ${"×"}%5s " +
          f"${"sf0.1 shfl MB"}%13s ${"sf1 shfl MB"}%12s ${"×"}%5s  shape")
        queries.foreach { q =>
          // warm each tier's JIT on the SMALL tier first (untimed), so the
          // sf1/sf0.1 wall ratio compares plans, not first-run compilation
          runTier(spark, meter, q, sf01)
          val (w0, r0, s0, shape0) = runTier(spark, meter, q, sf01)
          val (w1, r1, s1, shape1) = runTier(spark, meter, q, sf1)
          val same = shape0 == shape1
          val documented = !same && DocumentedFlips.contains(q)
          if (!same && !documented) flipped ::= q
          println(f"$q%-24s $w0%10.2f $w1%9.2f ${w1 / w0}%5.1f " +
            f"${(r0 + s0) / 1048576.0}%13.1f ${(r1 + s1) / 1048576.0}%12.1f " +
            f"${if (r0 + s0 == 0) 0.0 else (r1 + s1).toDouble / (r0 + s0)}%5.1f  " +
            (if (same) s"stable $shape1"
             else if (documented)
               s"flip DOCUMENTED sf0.1=$shape0 sf1=$shape1 — ${DocumentedFlips(q)}"
             else s"FLIPPED sf0.1=$shape0 sf1=$shape1"))
        }
        require(flipped.isEmpty,
          s"plan shape flipped at 10× for: ${flipped.reverse.mkString(", ")} — " +
            "fix with an explicit broadcast (bounded side) or document the flip")
        println("[reltier] all plan shapes stable across the 10x tier")
      case other => sys.error(
        s"usage: RelTier gen <srcDir> <outDir> [replicas] | " +
          s"RelTier run <sf01Dir> <sf1Dir> [query...]  (got: $other)")
    }
    spark.stop()
  }
}
