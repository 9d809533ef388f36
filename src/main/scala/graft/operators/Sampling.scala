package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling for training-data mixes. Random sampling is the
  * wrong tool at corpus scale — a rerun must select the SAME rows (resumable
  * jobs, reproducible ablations, cross-engine audits), so selection here is a
  * pure function of (salt, id):
  *
  *  - [[hashSample]]: Bernoulli by hash threshold — keep a row iff the
  *    32-bit md5 prefix of `salt:id` falls below `fraction`·2³². A narrow
  *    filter: pushes after the scan, no shuffle, no RNG state, composes with
  *    any plan. Changing the salt draws an independent sample.
  *  - [[quotaPerGroup]]: fixed per-group quotas (the "mix" in a training-data
  *    mix, e.g. N docs per language/domain) — rank rows inside each group by
  *    the same deterministic hash (tie-broken by id) and keep the first `n`.
  *    One shuffle on the group key; the hash order makes the quota a uniform
  *    "random" subset that never changes across runs.
  *
  * Both mirror bit-for-bit in SQL (md5 prefix → BIGINT), so they are
  * oracle-checkable like every other operator.
  */
object Sampling {

  /** 32-bit selection hash of `salt:id` as BIGINT in [0, 2³²). */
  def selectionHash(idCol: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), idCol.cast(StringType))), 1, 8), 16, 10)
      .cast(LongType)

  def hashSample(df: DataFrame, idCol: String, fraction: Double, salt: String): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    df.filter(selectionHash(col(idCol), salt) < math.round(fraction * 4294967296.0))
  }

  /** Per-row WEIGHTED Bernoulli sample: row kept with probability
    * `weight` (a [0,1] Column, e.g. a quality score) — the
    * quality-weighted inclusion step of LLM-corpus curation, where
    * high-quality documents are kept at a higher rate instead of a hard
    * quantile cut. Same determinism contract as [[hashSample]]: identical
    * row set on every run and engine (the threshold is the weight double
    * scaled by 2³², each compared against the salt-keyed id hash), still
    * a pure narrow filter.
    */
  def weightedHashSample(
      df: DataFrame, idCol: String, weight: Column, salt: String): DataFrame =
    df.filter(selectionHash(col(idCol), salt).cast(DoubleType)
      < weight * 4294967296.0)

  /** GROUP-AWARE holdout split: every row is labeled train/test by the
    * selection hash of its GROUP id (user, domain, document cluster) —
    * never the row id — so an entity's rows land wholly on one side.
    * This is the leakage guard row-level splits ([[hashSample]]) cannot
    * give: a user with events in both train and test leaks future
    * behavior into training. Pure narrow projection (the hash is a
    * codegen'd Column over the group column already on the row): no
    * shuffle, no assignment table to join — group-consistency holds by
    * construction because the label is a pure function of (salt, group).
    */
  def hashSplit(
      df: DataFrame, groupCol: String, trainFraction: Double, salt: String,
      outCol: String = "split"): DataFrame = {
    require(trainFraction >= 0.0 && trainFraction <= 1.0,
      s"trainFraction out of range: $trainFraction")
    df.withColumn(outCol,
      when(selectionHash(col(groupCol), salt)
          < math.round(trainFraction * 4294967296.0), "train")
        .otherwise("test"))
  }

  /** DEDUP-AWARE holdout split: [[hashSplit]] keyed by each document's
    * near-duplicate-cluster representative rather than its own id, so a
    * cluster of near-duplicates lands wholly on one side — the
    * decontamination guarantee a row-id split cannot give (a paraphrase
    * of a training document inside the validation set is leakage, not
    * signal). `labels` is an (id, comp) component frame (min reachable
    * id per node, e.g. [[Dedup.connectedComponents]]); documents absent
    * from it are singletons and split by their own id — which IS their
    * would-be component label, so the convention is seamless.
    *
    * Scale: one LEFT join against the clustered subset (tiny next to the
    * corpus — broadcastable in practice) plus the codegen'd hash; the
    * split label stays a pure function of (salt, representative).
    */
  def clusterAwareSplit(
      df: DataFrame, idCol: String, labels: DataFrame, trainFraction: Double,
      salt: String, outCol: String = "split"): DataFrame = {
    require(trainFraction >= 0.0 && trainFraction <= 1.0,
      s"trainFraction out of range: $trainFraction")
    df.join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn(outCol,
        when(selectionHash(coalesce(col("comp"), col(idCol)), salt)
            < math.round(trainFraction * 4294967296.0), "train")
          .otherwise("test"))
      .drop("comp")
  }

  def quotaPerGroup(
      df: DataFrame, groupCol: String, idCol: String, n: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(selectionHash(col(idCol), salt), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Fixed-SIZE uniform sample — the reservoir-sampling use case, done
    * deterministically: rank ALL rows by the selection hash (ties by id) and
    * keep the first `n`. Plans as TakeOrderedAndProject: each partition
    * keeps its local top-n by hash order, the driver merges per-partition
    * heads — no reservoir state, and unlike a reservoir the result is
    * identical on every run/engine and is a SUBSET of any larger `n` with
    * the same salt.
    *
    * Size the call honestly: the driver merge materializes O(n) rows, and
    * past `spark.sql.execution.topKSortFallbackThreshold` Spark falls back
    * to a global sort — so this is for BOUNDED n (up to ~10⁵–10⁶ rows).
    * For a huge fixed-size draw from a huge corpus, take [[hashSample]] at
    * a fraction slightly above n/total (distributed, no driver funnel) and
    * trim the overshoot with one rank over the much smaller result.
    */
  def fixedSizeSample(df: DataFrame, idCol: String, n: Int, salt: String): DataFrame = {
    require(n >= 0)
    df.orderBy(selectionHash(col(idCol), salt), col(idCol)).limit(n)
  }

  /** Deterministic STRATIFIED Bernoulli sample — per-group fractions, the
    * ratio knob of a training-data mix ("50% en, 25% de, 10% everything
    * else"). Same hash-threshold selection as [[hashSample]], so each
    * group's subset is reproducible and a group's sample is a SUPERSET of
    * the same group's sample at any smaller fraction (threshold
    * monotonicity — lets a mix be dialed down without re-selecting).
    * Still a pure narrow filter: the per-group threshold enters as a CASE
    * expression, no shuffle, no per-group pass.
    */
  def stratifiedHashSample(
      df: DataFrame, groupCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double,
      salt: String): DataFrame = {
    (defaultFraction +: fractions.values.toSeq).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of range: $f"))
    def thr(f: Double): Long = math.round(f * 4294967296.0)
    val threshold = fractions.toSeq.sortBy(_._1) match {
      case (k0, f0) +: rest =>
        rest.foldLeft(when(col(groupCol) === k0, lit(thr(f0)))) {
          case (acc, (k, f)) => acc.when(col(groupCol) === k, lit(thr(f)))
        }.otherwise(lit(thr(defaultFraction)))
      case _ => lit(thr(defaultFraction))
    }
    df.filter(selectionHash(col(idCol), salt) < threshold)
  }

  /** Keep each group's TOP `keepFraction` rows by a score — the
    * quality-quantile gate of a corpus pipeline ("drop the worst quartile
    * per language"). Rank-based rather than value-threshold-based so the cut
    * is exact, deterministic (ties broken by id), and engine-independent —
    * no percentile interpolation semantics involved: keep
    * `row_number ≤ floor(keepFraction · group_count)`, one shuffle on the
    * group key sharing the window partitioning.
    */
  def topQuantileByGroup(
      df: DataFrame, groupCol: String, scoreCol: Column, idCol: String,
      keepFraction: Double): DataFrame = {
    require(keepFraction >= 0.0 && keepFraction <= 1.0)
    import org.apache.spark.sql.expressions.Window
    // project the score ONCE before the window: inlining a large score
    // expression into the window sort key makes codegen compile it into the
    // sort comparator (slow to compile, evaluated per comparison)
    val w = Window.partitionBy(col(groupCol))
    val rk = row_number().over(w.orderBy(col("__score").desc, col(idCol)))
    val cnt = count(lit(1)).over(w)
    df.withColumn("__score", scoreCol)
      .withColumn("__rk", rk).withColumn("__cnt", cnt)
      .filter(col("__rk") <= floor(col("__cnt") * keepFraction))
      .drop("__score", "__rk", "__cnt")
  }
}
