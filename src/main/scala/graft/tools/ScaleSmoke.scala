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
    t(s"gini n=$n") {
      // all-equal values → exactly 0 at any n (and the rank kernel scales)
      val g = graft.operators.Eval
        .giniCoefficient(docs.withColumn("v", lit(5L)), "doc_id", "v").head()
      require(g.getLong(3) == 0L, s"uniform gini ${g.getLong(3)} != 0")
    }
    t(s"rolling_distinct n=$n") {
      // key k active every day → every full 7-day window counts all keys
      val ev = docs.select(
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("doc_id") % 30).cast("int")).as("d"),
        (expr("doc_id div 30") % 5000).as("k")) // independent of the day coord
      val out = graft.operators.Temporal.rollingDistinct(ev, "d", "k", 7)
      val low = out.filter(col("active_keys") < 5000L).count()
      require(low == 0, s"$low windows lost keys")
    }
    t(s"ordinal_assoc n=$n") {
      // y = x (mod-quantized): strictly concordant on the grid → gamma 10000
      val xy = docs.select((col("doc_id") % 50).as("x"), (col("doc_id") % 50).as("y"))
      val r = graft.operators.Eval.ordinalAssociation(xy, "x", "y").head()
      require(r.getLong(4) == 10000L, s"gamma ${r.getLong(4)}")
    }
    t(s"poisson_bootstrap n=$n") {
      val r = graft.operators.Eval
        .poissonBootstrap(docs.withColumn("v", lit(100L)), "doc_id", "v", 4)
        .collect()
      r.foreach { row =>
        require(math.abs(row.getLong(1) - n) < 6 * math.sqrt(n.toDouble),
          s"replica mass ${row.getLong(1)} far from $n")
        require(row.getLong(3) == 100000L, "constant series mean must be exact")
      }
    }
    t(s"mg_topk n=$n") {
      graft.functions.GraftFunctions.register(spark)
      // one key holds 20% of the stream; must survive any merge order
      val vals = docs.select(
        when(col("doc_id") % 5 === 0, "hot")
          .otherwise(concat(lit("t"), col("doc_id") % 10000)).as("v"))
      val sk = vals.agg(expr("mg_topk(v, 9)")).head()
        .getSeq[org.apache.spark.sql.Row](0)
      require(sk.exists(_.getString(0) == "hot"), "heavy hitter lost at scale")
    }
    t(s"hilbert n=$n") {
      // bijectivity of the curve key over the full normalized grid at n rows
      val pts = docs.select((col("doc_id") % 256).as("x"),
        (expr("doc_id div 256") % 256).as("y"))
      val h = graft.operators.Layout.hilbert8(pts, "x", "y", "h")
      val mm = h.agg(min("h"), max("h"), count_distinct(col("h"))).head()
      require(mm.getLong(0) == 0L && mm.getLong(1) == 65535L && mm.getLong(2) == 65536L)
    }
    spark.stop()
  }
}
