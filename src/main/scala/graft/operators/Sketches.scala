package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequent-items sketch (Misra–Gries) — completes the sketch
  * family next to HLL distinct counts and the quantile sketch
  * (`q_approx_stats`): find every value whose frequency exceeds n/(k+1)
  * without a full-cardinality shuffle.
  *
  * Shape: one narrow pass builds a k-counter MG summary per partition;
  * summaries merge pairwise (error stays additive-bounded) up a treeReduce —
  * the driver holds exactly ONE k-sized map, never the value domain. The MG
  * guarantee (any value with true count > n/(k+1) survives every decrement
  * round) makes the candidate set a SUPERSET of the true heavy hitters, so
  * one exact count of the ≤k candidates (broadcast semi-join — the big
  * column is never shuffled on its full domain) turns the sketch into an
  * EXACT, deterministic answer: precisely the values above threshold, with
  * their true counts. That is why [[heavyHitters]] is oracle-checkable
  * bit-for-bit while the intermediate sketch is approximate.
  *
  * At 100 TB the full `GROUP BY value` alternative shuffles one row per
  * DISTINCT value (web-scale token domains: billions); this plan shuffles
  * at most k rows per partition.
  */
object Sketches extends Serializable {

  /** One Misra–Gries update: add `c` occurrences of `v` to a ≤k-counter
    * summary; on overflow, the decrement round subtracts the smallest
    * involved count from everyone (MG's "pair up and cancel"). Object-level
    * (and the object Serializable) so executor closures can reference it.
    */
  @annotation.tailrec
  private[graft] def mgAdd(
      m: scala.collection.mutable.Map[String, Long], k: Int,
      v: String, c: Long): Unit = {
    if (m.contains(v)) m(v) += c
    else if (m.size < k) m(v) = c
    else {
      val dec = math.min(c, m.values.min)
      val dead = scala.collection.mutable.ArrayBuffer[String]()
      m.keysIterator.foreach { key =>
        val nv = m(key) - dec
        if (nv <= 0) dead += key else m(key) = nv
      }
      dead.foreach(m.remove)
      if (c > dec) mgAdd(m, k, v, c - dec)
    }
  }

  /** Per-partition Misra–Gries summaries of a string column, tree-aggregated
    * to one k-counter map on the driver, alongside the exact total row count
    * (carried for free by the same pass). Candidate counts UNDERCOUNT by at
    * most n/(k+1) (the classic MG bound); use [[heavyHitters]] for exact
    * output. `treeAggregate` with an empty-map zero also makes the
    * empty/zero-partition input well-defined (treeReduce would throw).
    */
  def mgCandidatesWithTotal(
      df: DataFrame, valueCol: Column, k: Int): (Map[String, Long], Long) = {
    require(k > 0)
    import org.apache.spark.sql.Encoders
    val vals = df.select(valueCol.cast("string")).na.drop()
    val perPartition = vals.mapPartitions { it =>
      val m = scala.collection.mutable.Map[String, Long]()
      var n = 0L
      it.foreach { r => mgAdd(m, k, r.getString(0), 1L); n += 1 }
      Iterator.single((m.toMap, n))
    }(Encoders.kryo[(Map[String, Long], Long)])
    perPartition.rdd.treeAggregate((Map.empty[String, Long], 0L))(
      seqOp = { case ((a, na), (b, nb)) => (mgMerge(a, b, k), na + nb) },
      combOp = { case ((a, na), (b, nb)) => (mgMerge(a, b, k), na + nb) })
  }

  def mgCandidates(df: DataFrame, valueCol: Column, k: Int): Map[String, Long] =
    mgCandidatesWithTotal(df, valueCol, k)._1

  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map[String, Long]() ++= a
    b.foreach { case (v, c) => mgAdd(m, k, v, c) }
    m.toMap
  }

  /** EXACT heavy hitters via the MG candidate set: every value of
    * `valueCol` with count strictly greater than `total div (k+1)`, with its
    * exact count — deterministic, so a plain GROUP-BY/HAVING oracle matches
    * bit-for-bit. The exact pass touches only the ≤k candidate values
    * (broadcast isin filter), never the full domain.
    */
  def heavyHitters(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val vals = df.select(valueCol.cast("string").as("value")).na.drop()
    // ONE sketch pass yields candidates AND the exact total (two input scans
    // overall: sketch + candidate verify — not three)
    val (candMap, total) = mgCandidatesWithTotal(df, valueCol, k)
    val threshold = total / (k + 1)
    val cand = candMap.keys.toSeq
    if (cand.isEmpty) {
      vals.limit(0).withColumn("cnt", lit(0L)).select("value", "cnt")
    } else {
      vals.filter(col("value").isin(cand: _*))
        .groupBy(col("value"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > threshold)
    }
  }
}
