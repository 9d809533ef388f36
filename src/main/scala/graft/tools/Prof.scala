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
    val withSh = docs
      .select(col("doc_id"), col("text").as("txt"))
      .withColumn("ts", split(lower(col("txt")), " "))
      .filter(size(col("ts")) >= 3)
      .withColumn("sh", Dedup.wordShinglesExpr("ts", 3))
      .withColumn("hv", Dedup.shingleHashesExpr("sh"))
    t("shingles+hash")(withSh.select(sum(size(col("hv")))).head())
    val sig = withSh.withColumn("sig", Dedup.minhashSignatureExpr("hv", 64))
    t("signatures")(sig.select(sum(size(col("sig")))).head())
    t("signatures(rep4)")(sig.repartition(32).select(sum(size(col("sig")))).head())
    val bandsDf = sig.select(col("doc_id"),
      posexplode(expr(s"""transform(sequence(0, 15), b ->
        array_join(transform(slice(sig, b*4 + 1, 4), x -> cast(x as string)), '-'))""")))
    t("bands")(bandsDf.count())
    val full = t("full pipeline")(
      Dedup.minhashNearDuplicates(docs, "doc_id", "text").count())
    println(s"pairs: $full")
    spark.stop()
  }
}
