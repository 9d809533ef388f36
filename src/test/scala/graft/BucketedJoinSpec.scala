package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing demo: pre-bucketing both join sides on the join key makes the
  * sort-merge join shuffle-free (co-located) — the technique that turns the
  * repeated big-fact join at 100 TB from a per-query shuffle into a one-time
  * layout cost.
  */
class BucketedJoinSpec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  test("bucketed join on the bucket key plans without shuffle exchanges") {
    val dir = Files.createTempDirectory("graft-buckets")
    val sf = "/root/testdata/sf0.001"
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/li").mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/ord").mode("overwrite").saveAsTable("ord_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert("Bucketed: true".r.findAllIn(plan).size >= 2)
      // every exchange must be the groupBy's (o_orderstatus); the JOIN KEYS
      // must never be shuffled — that's the co-location payoff
      val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.nonEmpty && exchanges.forall(_.contains("o_orderstatus")),
        s"join-key shuffle present:\n$plan")
      assert(!exchanges.exists(l => l.contains("l_orderkey") || l.contains("o_orderkey")))

      // and the unbucketed equivalent DOES shuffle the join keys
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      plain.collect()
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") &&
          (l.contains("l_orderkey") || l.contains("o_orderkey"))))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("near-dedup store index bucketed by (band, key): only the delta side shuffles") {
    // substantiates Incremental.nearDedupDelta's production layout claim:
    // persist the EXPLODED (band, key, doc_id) band index bucketed on the
    // band-bucket key, and a later delivery's candidate join moves only the
    // delta's band rows — the historical index is read co-located.
    import org.apache.spark.sql.functions.posexplode
    val dir = Files.createTempDirectory("graft-sig-buckets")
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val sigs = graft.operators.Dedup.minhashSignaturesWithBands(
      docs, "doc_id", "text", shingleK = 3, k = 64, bands = 16)
    sigs.select(col("doc_id"), posexplode(col("bk")).as(Seq("band", "key")))
      .write.bucketBy(8, "band", "key").sortBy("band", "key")
      .option("path", s"$dir/store_index").mode("overwrite")
      .saveAsTable("store_index_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // a "delta" band frame (stand-in: the same kernel over a doc slice)
      val delta = graft.operators.Dedup.minhashSignaturesWithBands(
          docs.filter(col("doc_id") % 7 === 0), "doc_id", "text",
          shingleK = 3, k = 64, bands = 16)
        .select(col("doc_id").as("d_id"), posexplode(col("bk")).as(Seq("band", "key")))
      val cand = delta.join(spark.table("store_index_bucketed"), Seq("band", "key"))
        .filter(col("d_id") =!= col("doc_id"))
        .select(col("d_id"), col("doc_id").as("e_id"))
      cand.collect()
      val root = cand.queryExecution.executedPlan
      val smjs = collect(root) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, root.toString)
      // the side whose subtree holds the bucketed scan must contain NO
      // shuffle — the historical index is read co-located; only the delta
      // side exchanges (assert structurally: the AQE plan STRING duplicates
      // the final and initial plans, so line-counting is unreliable)
      def bucketedScans(p: org.apache.spark.sql.execution.SparkPlan) =
        collect(p) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.relation.bucketSpec.isDefined => s
        }
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan) =
        collect(p) {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
      val smj = smjs.head
      val (storeSide, deltaSide) =
        if (bucketedScans(smj.right).nonEmpty) (smj.right, smj.left)
        else (smj.left, smj.right)
      assert(bucketedScans(storeSide).nonEmpty, "bucketed index scan not found")
      assert(shuffles(storeSide).isEmpty,
        s"store side must read co-located, got:\n$storeSide")
      assert(shuffles(deltaSide).nonEmpty, "delta side should exchange to the buckets")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS store_index_bucketed")
    }
  }

  test("incremental_near_dedup plugin delivery 2: bucketed-at-rest stores are NEVER re-shuffled") {
    // the round-14 at-rest layout (judge task #5): signatures bucketed by
    // doc_id + band index bucketed by (band, key), committed by the plugin
    // itself — delivery 2's banding join, hot-bucket cap aggregation, cap
    // anti-join and estimator verify join must all read the stores
    // co-located, with only delta-derived rows crossing an exchange.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val dir = Files.createTempDirectory("graft-ndstate").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, "s1").otherwise("s0").as("source"),
        col("text"))
    val st1 = new graft.transformers.Transformers.IncrementalNearDedupTransformer(
      Map("state_dir" -> dir))
    val surv1 = st1.transform(docs.filter(col("source") === "s0"))
    val n1 = surv1.count()
    st1.commit()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val st2 = new graft.transformers.Transformers.IncrementalNearDedupTransformer(
        Map("state_dir" -> dir))
      val out = st2.transform(docs)
      val n2 = out.count()
      val plan = out.queryExecution.executedPlan
      // RAW bucketed-store rows below a shuffle (joins/exchanges cut the
      // lineage: rows above them are candidate/aggregate output, which may
      // move freely — they are delta-bounded)
      def rawBucketedBelow(p: SparkPlan): Boolean = p match {
        case s: FileSourceScanExec => s.relation.bucketSpec.isDefined
        case _: BaseJoinExec => false
        case _: ShuffleExchangeLike => false
        case other => other.children.exists(rawBucketedBelow)
      }
      val offending = collect(plan) {
        case e: ShuffleExchangeLike if rawBucketedBelow(e.child) => e
      }
      assert(offending.isEmpty,
        s"store rows re-shuffled:\n${offending.mkString("\n")}")
      val bucketedScans = collect(plan) {
        case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => s
      }
      // both stores appear co-located: the (band,key) index and the
      // doc_id-keyed signature store (verify join side)
      assert(bucketedScans.map(_.relation.location.rootPaths.head.getName).toSet
        == Set("band_index", "signatures"), bucketedScans.mkString("\n"))

      // and the results equal the plain (unbucketed, in-memory) operator path
      val emptySigs = graft.operators.Dedup.minhashSignaturesWithBands(
        docs.limit(0), "doc_id", "text", 3, 64, 16)
      val m0 = docs.select(col("source")).limit(0)
      val (k1, sig1) = graft.operators.Incremental.nearDedupDelta(
        docs.filter(col("source") === "s0"), m0, "source", emptySigs, "doc_id", "text")
      assert(k1.count() == n1)
      val m1 = docs.filter(col("source") === "s0").select(col("source")).distinct()
      val (k2, _) = graft.operators.Incremental.nearDedupDelta(
        docs, m1, "source", sig1, "doc_id", "text")
      assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        k2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
      assert(n2 == k2.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
