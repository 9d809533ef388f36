package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Overlapping sliding-window chunking — the training-data step that turns
  * each document into fixed-size model inputs with a stride overlap (window
  * 64 / stride 32 = 50% overlap), so no span longer than the stride is ever
  * seen only at a window boundary. Complements [[PrefixSum.contextWindows]]
  * (which packs the CONCATENATED token stream into disjoint windows): here
  * each document chunks independently, so the whole operator is one narrow
  * codegen'd projection + explode — no shuffle, no cross-document state,
  * embarrassingly parallel at any scale.
  *
  * Chunk count = 1 if n ≤ window, else ⌈(n − window) / stride⌉ + 1 — the
  * final chunk may be shorter than `window` but every token lands in ≥1
  * chunk and chunk starts advance exactly by `stride`.
  */
object Chunking {

  /** Explodes each row into its sliding chunks: adds `chunk_id` (0-based),
    * `tok_start` (0-based token offset), `n_chunk_tokens`, and `chunk_text`
    * (the space-joined token slice). Tokens are the raw space-split of
    * `textCol` (empty tokens from repeated spaces count, matching the
    * corpus-wide token-count convention).
    */
  def slidingWindows(
      df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = split(col(textCol), " ")
    val n = size(toks).cast(LongType)
    // integer ceil((n - window) / stride) + 1, exact in doubles below 2^53
    val nChunks = when(n <= window, lit(1L))
      .otherwise(floor((n - window + stride - 1) / lit(stride)).cast(LongType) + 1L)
    df.withColumn("_toks", toks)
      .withColumn("_n", n)
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("tok_start", col("chunk_id") * stride)
      .withColumn("n_chunk_tokens",
        least(lit(window.toLong), col("_n") - col("tok_start")))
      .withColumn("chunk_text",
        array_join(slice(col("_toks"), (col("tok_start") + 1).cast(IntegerType),
          lit(window)), " "))
      .drop("_toks", "_n")
  }
}
