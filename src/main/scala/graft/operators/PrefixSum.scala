package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global prefix sum — the primitive behind token-stream
  * chunking: concatenate documents in a total order and cut the stream into
  * fixed-size context windows (`window = floor(start_offset / budget)`).
  *
  * `SUM(...) OVER (ORDER BY k)` expresses this declaratively, but Spark
  * plans an un-partitioned window as ONE task holding the whole corpus — the
  * classic scale cliff. This operator is the standard two-pass prefix-sum
  * instead:
  *
  *  1. range-partition by the order key and sort within partitions — a
  *     total order across partitions, each task holding a contiguous range
  *     (RangePartitioner's sampled boundaries are seed-deterministic for a
  *     given input layout, so the split is reproducible);
  *  2. pass 1: per-partition totals — #partitions longs to the driver
  *     (bounded, like any broadcast dim);
  *  3. pass 2: each partition streams once more, adding the exclusive scan
  *     of the totals before its own running sum.
  *
  * Work is two narrow passes + one tiny collect; no task ever holds more
  * than its partition. Values are exact (long arithmetic), so the DuckDB
  * `SUM() OVER` oracle matches bit-for-bit.
  *
  * The order key must be UNIQUE — a tie would make "global order" ambiguous
  * (the oracle and the engine could legitimately disagree).
  */
object PrefixSum {

  /** Adds `outCol` = exclusive prefix sum of `valueCol` (long) in ascending
    * `orderCol` order — i.e. each row's START offset in the concatenated
    * stream. Inclusive sum = outCol + valueCol.
    */
  def withStartOffset(
      df: DataFrame, orderCol: String, valueCol: String, outCol: String): DataFrame =
    withStartOffsets(df, orderCol, Seq(valueCol -> outCol))

  /** Multi-column variant: one range shuffle and two narrow passes produce
    * the exclusive prefix sum of EVERY listed (valueCol → outCol) pair —
    * the shape a two-sample ECDF comparison needs (cumulative counts of
    * both samples in one scan) without paying the shuffle per column.
    */
  def withStartOffsets(
      df: DataFrame, orderCol: String, cols: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, col(orderCol))
      .sortWithinPartitions(orderCol)
    val valIdxs = cols.map { case (v, _) => df.schema.fieldIndex(v) }.toArray
    val nCols = valIdxs.length
    // ONE materialized RDD serves both passes. Two invariants hang on this:
    //  - boundary stability: RangePartitioner samples its range bounds when
    //    the shuffle dependency is created; re-planning `parted` per action
    //    would re-sample and pass 1's bases could describe different
    //    partitions than pass 2 reads. A single RDD instance has a single
    //    shuffle dependency, so every action sees the same bounds (and the
    //    map stage is skipped on re-execution — the shuffle files are reused).
    //  - index stability: `mapPartitionsWithIndex` hands each closure the
    //    SPLIT index of this RDD, which survives any downstream narrow
    //    transformation. `TaskContext.getPartitionId()` does NOT — a
    //    downstream coalesce(1) fuses all splits into one task whose id is 0,
    //    which would apply partition 0's base offset everywhere.
    // Persisted so pass 2 (and the caller's action) re-reads cached blocks
    // instead of re-sorting the shuffle output; the result frame is lazy, so
    // release is deferred to Spark's ContextCleaner, which auto-unpersists
    // once the returned frame (the only reference) is dropped by the caller.
    val rdd = parted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition totals keyed by split index (tiny: nCols longs each)
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = new Array[Long](nCols)
      it.foreach { r =>
        var i = 0
        while (i < nCols) { s(i) += r.getLong(valIdxs(i)); i += 1 }
      }
      Iterator.single(pid -> s)
    }.collect().sortBy(_._1).map(_._2)
    // exclusive scan of the totals = each partition's global base offsets
    val bases = partTotals.scanLeft(new Array[Long](nCols)) { (acc, t) =>
      Array.tabulate(nCols)(i => acc(i) + t(i))
    }
    val basesBc = spark.sparkContext.broadcast(bases)
    val outSchema = cols.foldLeft(df.schema) { case (s, (_, out)) =>
      s.add(out, LongType, nullable = false)
    }
    // pass 2: same splits by construction, add base + local running sums
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val running = basesBc.value(pid).clone()
      it.map { r =>
        val starts = new Array[Any](nCols)
        var i = 0
        while (i < nCols) {
          starts(i) = running(i)
          running(i) += r.getLong(valIdxs(i))
          i += 1
        }
        Row.fromSeq(r.toSeq ++ starts)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** CUSUM (cumulative-sum control chart, Page 1954) over a drift column:
    * adds `outCol` = S_i = P_i − min(0, min_{j≤i} P_j), where P is the
    * inclusive prefix sum of `valueCol` in ascending `orderCol` order —
    * algebraically identical to the textbook recurrence
    * S_i = max(0, S_{i−1} + x_i), S_0 = 0, but expressible as a SCAN
    * instead of a sequential loop: the reflected-at-zero running max is a
    * prefix sum minus a prefix min, and BOTH are distributed with the same
    * two-pass kernel as [[withStartOffsets]] (per-partition totals carry
    * (sum, minOfLocalPrefix); the exclusive combine is (Σ sums before p,
    * min over q<p of base_q + minPrefix_q)). One range shuffle, two narrow
    * passes, a #partitions×2-long collect — no single-partition window, so
    * the change-point sweep runs at any series length. Long arithmetic
    * throughout → bit-exact against a windowed-SQL oracle.
    */
  def withCusum(
      df: DataFrame, orderCol: String, valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, col(orderCol))
      .sortWithinPartitions(orderCol)
    val valIdx = df.schema.fieldIndex(valueCol)
    // Same single-RDD discipline as withStartOffsets: one shuffle dependency
    // (stable range bounds across both passes), split indices from
    // mapPartitionsWithIndex (stable under downstream coalesce).
    val rdd = parted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: (partition sum, min over the partition's local inclusive
    // prefix sums) — the monoid the exclusive combine needs
    val partStats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; var m = Long.MaxValue
      it.foreach { r =>
        s += r.getLong(valIdx)
        if (s < m) m = s
      }
      Iterator.single((pid, s, m))
    }.collect().sortBy(_._1)
    // exclusive scan: base_p = Σ sums before p; minBefore_p = min(0,
    // min over q<p of base_q + minPrefix_q) — 0 is P_0, the empty prefix,
    // which anchors S_0 = 0 exactly as the recurrence does.
    val bases = new Array[(Long, Long)](partStats.length + 1)
    bases(0) = (0L, 0L)
    partStats.zipWithIndex.foreach { case ((_, s, m), i) =>
      val (base, minBefore) = bases(i)
      val localMin = if (m == Long.MaxValue) minBefore else math.min(minBefore, base + m)
      bases(i + 1) = (base + s, localMin)
    }
    val basesBc = spark.sparkContext.broadcast(bases)
    val outSchema = df.schema.add(outCol, LongType, nullable = false)
    // pass 2: running P from base_p, running min from minBefore_p
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var p = basesBc.value(pid)._1
      var mn = basesBc.value(pid)._2
      it.map { r =>
        p += r.getLong(valIdx)
        if (p < mn) mn = p
        Row.fromSeq(r.toSeq :+ (p - mn))
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Token-stream chunking: assign each document its start offset and the
    * context-window index it begins in (`floor(offset / budget)`), plus its
    * offset within that window — exactly the bookkeeping a pretraining
    * pipeline needs to cut a document stream into fixed windows.
    */
  def contextWindows(
      df: DataFrame, orderCol: String, tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    // integer division — exact for any offset, no double rounding at 2^53+
    withStartOffset(df, orderCol, tokenCol, "start_offset")
      .withColumn("window_id", expr(s"start_offset div ${budget}L"))
      .withColumn("window_offset", col("start_offset") % budget)
  }
}
