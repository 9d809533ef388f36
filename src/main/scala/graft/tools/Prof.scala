package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the dedup pipeline stages. */
object Prof {
  def t[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir)
    println(s"docs: ${docs.count()} partitions: ${docs.rdd.getNumPartitions}")
    // mirror minhashNearDuplicates stage by stage, spread like the library
    val base = docs.select(col("doc_id"), col("text").as("txt")).repartition(32)
    val withSh = base
      .withColumn("ts", split(lower(col("txt")), " "))
      .filter(size(col("ts")) >= 3)
      .withColumn("sh", Dedup.wordShinglesExpr("ts", 3))
      .withColumn("hv", Dedup.shingleHashesExpr("sh"))
      .withColumn("sig", Dedup.minhashSignatureExpr("hv", 64))
      .select("doc_id", "sh", "sig")
      .persist()
    t("sig materialize")(withSh.count())
    val bandsDf = withSh.select(col("doc_id"),
      posexplode(expr(s"""transform(sequence(0, 15), b ->
        array_join(transform(slice(sig, b*4 + 1, 4), x -> cast(x as string)), '-'))""")))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
    t("bands")(bandsDf.count())
    val a = bandsDf.as("a"); val b = bandsDf.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    t("candidates")(cand.count())
    t("verify")(Dedup.verifyJaccard(cand, withSh.select(col("doc_id"), col("sh")), 0.8).count())
    withSh.unpersist()
    val full = t("full pipeline")(
      Dedup.minhashNearDuplicates(docs, "doc_id", "text").count())
    println(s"pairs: $full")
    spark.stop()
  }
}
