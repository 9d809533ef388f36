package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest-driven INCREMENTAL curation — the production re-run shape: a
  * 100 TB corpus grows by shards (crawl snapshots, source drops, dated
  * partitions), and re-running the whole curation DAG per delivery is the
  * single largest avoidable cost in a recurring pipeline. The wrapper here
  * processes ONLY shards not yet recorded in a processed-shard manifest,
  * unions the fresh results with the carried-over prior outputs, and emits
  * the updated manifest for the next run.
  *
  * Scale contract:
  *  - The manifest is SHARD-count-sized (thousands of rows at most), never
  *    data-sized — both the anti-join (what's new) and the semi-join
  *    (what's covered) broadcast it, so delta selection costs one corpus
  *    scan with a map-side filter: no shuffle of the corpus at all. With
  *    shard-partitioned parquet the broadcast filter collapses further
  *    into partition PRUNING (the scan skips covered directories).
  *  - `process` sees only the delta frame; whatever shuffles it performs
  *    are sized by the DELTA, not the corpus — the whole point.
  *  - Prior results are read back from storage (data-sized, but a plain
  *    scan-and-union: no recompute, no shuffle).
  *
  * Correctness caveat (documented, inherent to shard-incremental curation):
  * stages whose state is GLOBAL (cross-shard dedup, corpus-level quotas)
  * are only exactly incremental when their state travels alongside the
  * manifest (e.g. the dedup fingerprint store); a per-shard `process` is
  * exact for per-document stages (filters, token counts, per-doc scores).
  */
object Incremental {

  /** Split `corpus` into (delta, covered) by the processed-shard manifest:
    * rows whose `shardCol` is absent from / present in `manifest`. The
    * manifest side is broadcast (shard-count-sized by contract).
    */
  def deltaShards(
      corpus: DataFrame, manifest: DataFrame, shardCol: String): (DataFrame, DataFrame) = {
    val m = broadcast(manifest.select(col(shardCol)).distinct())
    // using-joins move the key column first; restore the corpus's order so
    // delta/covered frames are drop-in for the caller's DAG
    val orig = corpus.columns.toSeq.map(col)
    (corpus.join(m, Seq(shardCol), "left_anti").select(orig: _*),
      corpus.join(m, Seq(shardCol), "left_semi").select(orig: _*))
  }

  /** Run `process` over ONLY the shards the manifest doesn't cover, union
    * with the prior run's outputs, and return `(results, newManifest)`.
    *
    * `prior` is the previous run's RESULT set (read from storage; its
    * schema must match what `process` emits — enforced by `unionByName`).
    * The new manifest is the old one plus the delta's distinct shard keys,
    * emitted under the same single-column schema so it round-trips:
    * feeding `newManifest` back in with an unchanged corpus yields an
    * EMPTY delta and `process` runs over zero rows — idempotent re-runs.
    */
  def processDelta(
      corpus: DataFrame, manifest: DataFrame, shardCol: String,
      prior: DataFrame)(process: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val (delta, _) = deltaShards(corpus, manifest, shardCol)
    val results = prior.unionByName(process(delta))
    val newManifest = manifest.select(col(shardCol))
      .union(delta.select(col(shardCol)).distinct())
      .distinct()
    (results, newManifest)
  }

  /** Incremental EXACT deduplication with STATE TRAVEL — the concrete
    * answer to the global-state caveat above for the most common global
    * stage: content-hash dedup. The manifest delta is deduplicated against
    * (a) the prior runs' fingerprint store and (b) itself
    * (first-occurrence-within-delta by `idCol`), returning
    * `(survivors, newFingerprints)`; feeding `newFingerprints` (and the
    * grown manifest) back in makes the next run see every historical
    * fingerprint without ever recomputing one. Fingerprints are
    * `md5(textCol)` — the exact-dedup key, content-sized never
    * corpus-growing (one row per DISTINCT content ever seen).
    *
    * Scale: the within-delta pick is one fingerprint-keyed window over the
    * DELTA only; the store anti-join shuffles on the fingerprint — with
    * the store parquet BUCKETED by fingerprint (the production layout)
    * only the delta side moves. Store size is what it must be: the
    * complete dedup state; nothing here materializes the corpus.
    */
  def dedupDelta(
      corpus: DataFrame, manifest: DataFrame, shardCol: String,
      priorFingerprints: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val (delta, _) = deltaShards(corpus, manifest, shardCol)
    val fp = md5(col(textCol))
    val firstInDelta = delta
      .withColumn("__fp", fp)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val kept = firstInDelta
      .join(priorFingerprints.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
    val newFingerprints = priorFingerprints.select(col("fp"))
      .union(kept.select(col("__fp").as("fp")))
    (kept.drop("__fp"), newFingerprints)
  }
}
