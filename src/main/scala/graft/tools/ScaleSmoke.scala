package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Large-n smoke for the narrow-pass operators (prefix sum, packing,
  * sampling): n defaults to 2M rows — ~3 orders above the spec scale — to
  * catch accidental driver funnels or quadratic behavior before a cluster
  * would. Usage: runMain graft.tools.ScaleSmoke [n]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = spark.range(1, n + 1).toDF("doc_id")
      .withColumn("n_tokens", (col("doc_id") * 131 % 997) + 1)
    t(s"prefix_sum n=$n") {
      val out = graft.operators.PrefixSum
        .withStartOffset(docs, "doc_id", "n_tokens", "off")
      val mx = out.agg(max(col("off") + col("n_tokens"))).head.getLong(0)
      val expect = docs.agg(sum("n_tokens")).head.getLong(0)
      require(mx == expect, s"prefix sum end $mx != total $expect")
    }
    t(s"context_windows n=$n") {
      val bad = graft.operators.PrefixSum
        .contextWindows(docs, "doc_id", "n_tokens", budget = 2048L)
        .filter(col("window_offset") >= 2048 || col("window_offset") < 0).count()
      require(bad == 0)
    }
    t(s"packing n=$n") {
      val packed = graft.operators.Packing
        .packSequences(docs, "doc_id", "n_tokens", budget = 2048L)
      val over = packed.groupBy("bin_id").agg(sum("n_tokens").as("t"))
        .filter(col("t") > 2048L).count()
      require(over == 0, s"$over over-budget bins")
    }
    t(s"hash_sample n=$n") {
      val m = graft.operators.Sampling.hashSample(docs, "doc_id", 0.25, "s").count()
      require(math.abs(m - n * 0.25) < n * 0.01, s"sample size $m far from 25%")
    }
    t(s"sliding_windows n=$n") {
      // synthetic text: token count varies 1..96 per doc; chunk math must
      // hold for every row (window 64 / stride 32)
      val texts = docs.withColumn("text",
        array_join(transform(sequence(lit(1), (col("doc_id") % 96 + 1).cast("int")),
          i => concat(lit("w"), i)), " "))
      val out = graft.operators.Chunking
        .slidingWindows(texts, "doc_id", "text", window = 64, stride = 32)
      val nChunks = out.count()
      val bad = out.filter(col("n_chunk_tokens") <= 0 ||
        col("n_chunk_tokens") > 64 || col("tok_start") % 32 =!= 0).count()
      require(bad == 0, s"$bad malformed chunks")
      require(nChunks >= n, "every doc must emit at least one chunk")
    }
    spark.stop()
  }
}
