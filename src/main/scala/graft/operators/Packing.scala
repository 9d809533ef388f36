package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: assign documents to bins of at most `budget` tokens —
  * the step that turns a filtered corpus into fixed-size training sequences
  * with minimal padding waste. (Distinct from [[PrefixSum.contextWindows]],
  * which CONCATENATES the stream in a fixed order and lets documents straddle
  * window boundaries; packing keeps each document whole in exactly one bin.)
  *
  * Bin minimization is NP-hard, so like every production pipeline this is
  * greedy best-fit-decreasing, distributed the standard way: range-partition
  * by DESCENDING length (the "decreasing" sort, now global across
  * partitions), then pack each partition independently in one narrow pass.
  * BFD inside a partition guarantees ≤ 11/9·OPT + 2/3 bins; packing
  * partitions independently adds at most one under-filled bin per partition
  * on top — negligible when a partition holds millions of tokens.
  *
  * Scale notes, per the partition-identity invariant (docs/SCALE.md): bin
  * ids are made globally unique from the SPLIT index handed to
  * `mapPartitionsWithIndex` (never `TaskContext.getPartitionId`), and the
  * per-partition state is a capacity-keyed TreeMap of OPEN bins only —
  * best-fit lookup is O(log open-bins) per document, memory O(open bins),
  * never the whole partition.
  *
  * Documents longer than `budget` get a singleton bin each (whether to
  * truncate or split them is the caller's policy, upstream of packing).
  */
object Packing {

  /** Adds `bin_id` (long, globally unique) such that every bin's token sum
    * is ≤ `budget` (singleton oversize docs excepted).
    *
    * Fully deterministic: best fit = smallest remaining capacity that still
    * holds the doc; capacity ties break to the LOWEST bin id. That tie-break
    * (rather than a LIFO stack) makes the single-partition assignment
    * replicable by a sequential oracle — bin id == order of bin creation ==
    * list position in the DuckDB recursive-CTE oracle (`mx8`).
    *
    * `numPartitions` defaults to the cluster parallelism (the scale path);
    * pass 1 to pin the exact global-BFD assignment for oracle comparison.
    */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String, budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val nPart =
      if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val parted = df
      .repartitionByRange(nPart, col(tokenCol).desc, col(idCol))
      .sortWithinPartitions(col(tokenCol).desc, col(idCol))
    val tokIdx = df.schema.fieldIndex(tokenCol)
    val outSchema = df.schema.add("bin_id", LongType, nullable = false)
    val out = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      // open bins keyed by remaining capacity → local bin ids, lowest first;
      // best fit = smallest remaining capacity that still holds the doc
      val open = new java.util.TreeMap[Long, java.util.TreeSet[Integer]]()
      var nextLocal = 0
      val base = pid.toLong << 32 // globally unique: split id in the high bits
      it.map { r =>
        val n = r.getLong(tokIdx)
        val binLocal: Int = {
          val entry = open.ceilingEntry(n)
          if (n < budget && entry != null) {
            val ids = entry.getValue
            val b = ids.pollFirst() // lowest bin id among capacity ties
            if (ids.isEmpty) open.remove(entry.getKey)
            val remaining = entry.getKey - n
            if (remaining > 0)
              open.computeIfAbsent(remaining, _ => new java.util.TreeSet[Integer]()).add(b)
            b
          } else { // no open bin fits (or doc fills/exceeds the budget)
            val b = nextLocal
            nextLocal += 1
            val remaining = budget - n
            if (remaining > 0)
              open.computeIfAbsent(remaining, _ => new java.util.TreeSet[Integer]()).add(b)
            b
          }
        }
        Row.fromSeq(r.toSeq :+ (base | binLocal.toLong))
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
