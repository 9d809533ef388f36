package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline. A
  *   broadcast join of the (small) query set against the corpus: one scan,
  *   no shuffle of the corpus side, scales linearly.
  * - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH — the scale path.
  *   Hyperplane coefficients are derived from a deterministic LCG so
  *   signatures are reproducible across engines and runs (no RNG state).
  *   Bucketing turns ANN into an equi-join on the signature, which
  *   partitions evenly at any corpus size.
  *
  * Dot products fold left-to-right over the vector (Spark `aggregate` /
  * DuckDB `list_sum`), giving engine-identical doubles for identical inputs.
  */
object Similarity {

  /** Vector as double array (floats widen exactly). */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast(DoubleType))

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact top-k neighbors by cosine for each query vector (query set is
    * broadcast; ranking ties broken by neighbor id).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = prepared(corpus, idCol, vecCol)
    val q = prepared(queries, idCol, vecCol)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("cosine", dot(col("q_v"), col("v")) / (col("q_nrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor"), col("cosine"), col("rnk"))
  }

  /** All pairs (a < b) with cosine ≥ threshold — exact near-duplicate scan.
    * Quadratic: suitable for corpora that fit a cross-join budget; use
    * [[lshBuckets]] + bucket-local pairing at scale.
    */
  def nearDuplicatePairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val p = prepared(df, idCol, vecCol)
    val a = p.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = p.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane j, dim d):
    * LCG over the flattened index, mapped to [−0.5, 0.5). Exact integer
    * arithmetic + one exact power-of-two division → engine-identical.
    */
  private def planeCoefSql(j: String, i: String, dims: Int): String =
    s"(((1103515245 * cast($j * $dims + ($i - 1) as bigint) + 12345) % 2147483648) / 2147483648.0 - 0.5)"

  /** Signature bucket: `bits`-bit sign pattern of dots with the hyperplanes. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, bits: Int, dims: Int): DataFrame = {
    val sig = expr(
      s"""aggregate(transform(sequence(0, ${bits - 1}), j ->
         |  IF(aggregate(transform(sequence(1, $dims), i ->
         |        element_at(v, i) * ${planeCoefSql("j", "i", dims)}),
         |      cast(0.0 as double), (acc, x) -> acc + x) > 0.0,
         |     shiftleft(cast(1 as bigint), j), cast(0 as bigint))),
         |  cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin)
    prepared(df, idCol, vecCol).withColumn("bucket", sig)
  }

  /** Approximate top-k: exact cosine ranking within the query's LSH bucket.
    * Deterministic; recall depends on bits/bucket balance.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = lshBuckets(corpus, idCol, vecCol, bits, dims)
    val q = lshBuckets(queries, idCol, vecCol, bits, dims)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"), col("bucket"))
    val joined = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cosine", dot(col("q_v"), col("v")) / (col("q_nrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    joined.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor"), col("cosine"), col("rnk"))
  }
}
