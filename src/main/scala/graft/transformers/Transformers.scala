package graft.transformers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Registries, Transformer}
import graft.core.PluginConfig._
import graft.operators.{Cleaning, Indicators, Validation}

/** Config-driven transformer plugins wrapping the operator library — the four
  * transformer types of the reference
  * (`/root/reference/src/data_extractor/transformers/__init__.py`).
  */
object Transformers {
  @volatile private var done = false

  def register(): Unit = synchronized {
    if (done) return
    done = true
    Registries.transformers.register("pass_through")((_, _) => PassThrough)
    Registries.transformers.register("data_cleaning")((_, c) => new DataCleaningTransformer(c))
    Registries.transformers.register("pydantic_validation")((_, c) => new ValidationTransformer(c))
    Registries.transformers.register("technical_indicators")((_, c) => new IndicatorsTransformer(c))
    Registries.transformers.register("corpus_clean")((_, c) => new CorpusCleanTransformer(c))
    Registries.transformers.register("quality_filter")((_, c) => new QualityFilterTransformer(c))
    Registries.transformers.register("exact_dedup")((_, c) => new ExactDedupTransformer(c))
    Registries.transformers.register("group_quota")((_, c) => new GroupQuotaTransformer(c))
    Registries.transformers.register("sequence_packing")((_, c) => new SequencePackingTransformer(c))
    Registries.transformers.register("near_dedup")((_, c) => new NearDedupTransformer(c))
    Registries.transformers.register("sem_dedup")((_, c) => new SemDedupTransformer(c))
    Registries.transformers.register("pii_scrub")((_, c) => new PiiScrubTransformer(c))
    Registries.transformers.register("language_filter")((_, c) => new LanguageFilterTransformer(c))
    Registries.transformers.register("embedding_guard")((_, c) => new EmbeddingGuardTransformer(c))
    Registries.transformers.register("incremental_dedup")((_, c) => new IncrementalDedupTransformer(c))
    Registries.transformers.register("incremental_near_dedup")((_, c) => new IncrementalNearDedupTransformer(c))
    Registries.transformers.register("incremental_vocab")((_, c) => new IncrementalVocabTransformer(c))
  }

  /** Beyond-reference: the mx17 curation DAG's stages as INDIVIDUAL
    * config-driven plugins, so quality-filter → exact-dedup → quota →
    * packing composes from a pipeline YAML exactly like the reference's
    * `data_cleaning` chain (`configs/curation_pipeline.yaml`;
    * EnginePipelineSpec reproduces mx17's gated row set end-to-end).
    * Defaults are mx17's parameters.
    */
  class QualityFilterTransformer(conf: Conf) extends Transformer {
    private val textCol = conf.strOr("text_column", "text")
    private val minWords = conf.intOr("min_words", 30)
    private val maxWords = conf.intOr("max_words", 5000)
    private val stopwords = {
      val s = conf.strSeq("stopwords")
      if (s.nonEmpty) s else Seq("the", "a", "of", "and", "is")
    }
    private val minStopwordTypes = conf.intOr("min_stopword_types", 2)
    private val minMeanWordLen = conf.dblOr("min_mean_word_len", 4.5)
    private val maxMeanWordLen = conf.dblOr("max_mean_word_len", 8.0)

    override def validate(df: DataFrame): Unit =
      require(df.columns.contains(textCol),
        s"quality_filter: requires column '$textCol', got ${df.columns.mkString(", ")}")

    def transform(df: DataFrame): DataFrame = {
      val ws = split(col(textCol), " ")
      val nw = size(ws)
      // 2× mean word length as an exact integer (chars excluding the
      // nw−1 separators, doubled) — the comparisons against n·bound are
      // exact in double far past any real document length
      val halfMean = (length(col(textCol)) - (nw - 1)) * 2
      df.filter(nw.between(minWords, maxWords) &&
        size(array_distinct(filter(ws, t => t.isin(stopwords: _*)))) >= minStopwordTypes &&
        halfMean >= nw * lit(2 * minMeanWordLen) &&
        halfMean <= nw * lit(2 * maxMeanWordLen))
    }
  }

  /** dd1's keep-first exact dedup ([[graft.operators.Dedup.dropExactDuplicates]])
    * as a pipeline stage.
    */
  class ExactDedupTransformer(conf: Conf) extends Transformer {
    private val idCol = conf.strOr("id_column", "doc_id")
    private val textCol = conf.strOr("text_column", "text")

    override def validate(df: DataFrame): Unit = {
      val have = df.columns.toSet
      require(have.contains(idCol) && have.contains(textCol),
        s"exact_dedup: requires columns '$idCol' and '$textCol', got ${have.mkString(", ")}")
    }

    def transform(df: DataFrame): DataFrame =
      graft.operators.Dedup.dropExactDuplicates(df, idCol, textCol)
  }

  /** Per-group head quota (mx2's shape): keep the first `quota` rows of
    * each group in `order_column` order — one keyed window, no collect.
    */
  class GroupQuotaTransformer(conf: Conf) extends Transformer {
    private val groupCol = conf.strOr("group_column", "source")
    private val orderCol = conf.strOr("order_column", "doc_id")
    private val quota = conf.intOr("quota", 10)

    override def validate(df: DataFrame): Unit = {
      val have = df.columns.toSet
      require(have.contains(groupCol) && have.contains(orderCol),
        s"group_quota: requires columns '$groupCol' and '$orderCol', got ${have.mkString(", ")}")
    }

    def transform(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("__rn", row_number().over(
          Window.partitionBy(col(groupCol)).orderBy(col(orderCol))))
        .filter(col("__rn") <= quota)
        .drop("__rn")
    }
  }

  /** Best-fit-decreasing sequence packing
    * ([[graft.operators.Packing.packSequences]], mx8's kernel) as the
    * chain's terminal stage: counts tokens from `text_column`, drops the
    * text, appends (n_tokens, bin_id). `num_partitions: 1` pins the exact
    * single-node BFD (the oracle-comparable setting); the default 0 packs
    * per split at cluster parallelism — the 100 TB path.
    */
  class SequencePackingTransformer(conf: Conf) extends Transformer {
    private val idCol = conf.strOr("id_column", "doc_id")
    private val textCol = conf.strOr("text_column", "text")
    private val budget = conf.intOr("budget", 256).toLong
    private val numPartitions = conf.intOr("num_partitions", 0)

    override def validate(df: DataFrame): Unit = {
      val have = df.columns.toSet
      require(have.contains(idCol) && have.contains(textCol),
        s"sequence_packing: requires columns '$idCol' and '$textCol', got ${have.mkString(", ")}")
    }

    def transform(df: DataFrame): DataFrame =
      graft.operators.Packing.packSequences(
        df.withColumn("n_tokens",
            graft.operators.TextAnalysis.tokenCount(col(textCol)).cast("long"))
          .drop(textCol),
        idCol, "n_tokens", budget, numPartitions)
  }

  /** dd2's MinHash-LSH near-duplicate REMOVAL as its own pipeline stage —
    * the flagship scale-path dedup (banded signatures → bucket join →
    * exact-Jaccard verify), with [[graft.operators.Dedup.cleanCorpus]]'s
    * survivor policy: for every verified pair the LOWER id survives, so
    * the dropped set is the distinct `doc_b` side. Unlike `corpus_clean`
    * this composes freely (quality_filter → exact_dedup → near_dedup →
    * quota → packing all from YAML) and keeps EVERY input column — the
    * anti-join is id-keyed, the text is never rewritten.
    */
  class NearDedupTransformer(conf: Conf) extends Transformer {
    private val idCol = conf.strOr("id_column", "doc_id")
    private val textCol = conf.strOr("text_column", "text")
    private val shingleK = conf.intOr("shingle_k", 3)
    private val bands = conf.intOr("bands", 16)
    private val rowsPerBand = conf.intOr("rows_per_band", 4)
    private val threshold = conf.dblOr("jaccard_threshold", 0.8)
    private val maxBucket = conf.intOr("max_bucket", 100000)

    override def validate(df: DataFrame): Unit = {
      val have = df.columns.toSet
      require(have.contains(idCol) && have.contains(textCol),
        s"near_dedup: requires columns '$idCol' and '$textCol', got ${have.mkString(", ")}")
    }

    def transform(df: DataFrame): DataFrame = {
      val losers = graft.operators.Dedup.minhashNearDuplicates(
          df, idCol, textCol, shingleK, bands, rowsPerBand, threshold, maxBucket)
        .select(col("doc_b").as(idCol)).distinct()
      df.join(losers, Seq(idCol), "left_anti")
    }
  }

  /** dd26's embedding-space semantic dedup (SemDeDup, Abbas et al. 2023)
    * as a pipeline stage: spherical-k-means cells over `embedding_column`,
    * within-cell pairs at cosine ≥ threshold grouped by connected
    * components, one survivor per group (lowest cosine to its cell
    * centroid — the member FARTHEST from the semantic cluster center
    * carries the most marginal information; ties → lowest id). Keeps every
    * input column via an id-keyed semi-join on the survivor set.
    *
    * Rows the assignment pass cannot assess (null/empty/zero-norm
    * embeddings — cosine undefined) are PRESERVED, not dropped: a dedup
    * stage must never delete what it cannot compare. Put
    * `embedding_guard` in front to drop them explicitly instead.
    */
  class SemDedupTransformer(conf: Conf) extends Transformer {
    private val idCol = conf.strOr("id_column", "vec_id")
    private val vecCol = conf.strOr("embedding_column", "embedding")
    private val k = conf.intOr("cells", 8)
    private val iters = conf.intOr("iters", 5)
    private val threshold = conf.dblOr("cosine_threshold", 0.7)

    override def validate(df: DataFrame): Unit = {
      val have = df.columns.toSet
      require(have.contains(idCol) && have.contains(vecCol),
        s"sem_dedup: requires columns '$idCol' and '$vecCol', got ${have.mkString(", ")}")
    }

    def transform(df: DataFrame): DataFrame = {
      val labeled = graft.operators.Dedup.cachedForReuse(
        graft.operators.Dedup.semDedup(df, idCol, vecCol, k, iters, threshold)
          .select(col(idCol), col("keep")))
      val keepIds = labeled.filter(col("keep")).select(col(idCol))
      df.join(keepIds, Seq(idCol), "left_semi")
        // unassessed rows (not in the labeled frame at all) pass through
        .unionByName(df.join(labeled.select(col(idCol)), Seq(idCol), "left_anti"))
    }
  }

  /** tx19's PII redaction ([[graft.operators.TextAnalysis.piiScrub]]) as a
    * pipeline stage: emails/IPv4s/phone-shaped runs → typed placeholders in
    * pinned stage order, with per-type counts appended. One codegen'd
    * projection — the zero-shuffle stage of the chain.
    */
  class PiiScrubTransformer(conf: Conf) extends Transformer {
    private val textCol = conf.strOr("text_column", "text")

    override def validate(df: DataFrame): Unit =
      require(df.columns.contains(textCol),
        s"pii_scrub: requires column '$textCol', got ${df.columns.mkString(", ")}")

    def transform(df: DataFrame): DataFrame =
      graft.operators.TextAnalysis.piiScrub(df, textCol)
  }

  /** tx4's n-gram-marker language ID as a FILTER stage: keep documents
    * whose predicted language is in `languages`. The predictor is the
    * deterministic marker-score argmax of
    * [[graft.operators.TextAnalysis.languageId]] — a narrow projection, no
    * shuffle, no model artifact to ship.
    */
  class LanguageFilterTransformer(conf: Conf) extends Transformer {
    private val textCol = conf.strOr("text_column", "text")
    private val languages = {
      val s = conf.strSeq("languages")
      if (s.nonEmpty) s else Seq("en")
    }

    override def validate(df: DataFrame): Unit =
      require(df.columns.contains(textCol),
        s"language_filter: requires column '$textCol', got ${df.columns.mkString(", ")}")

    def transform(df: DataFrame): DataFrame =
      df.filter(graft.operators.TextAnalysis.languageId(col(textCol))
        .isin(languages: _*))
  }

  /** Embedding-hygiene gate for the vector stages: drops rows whose
    * embedding is null, empty, or zero-norm — the documented PRECONDITION
    * of every cosine consumer downstream (`sem_dedup`, IVF assignment,
    * SemDeDup state travel: a zero vector's cosine is 0/0 → NaN, whose
    * argmax is engine-dependent — the mx28 note made enforceable in the
    * pipeline itself). With `normalize: true` the surviving vectors are
    * L2-normalized in place (double precision), which turns downstream
    * cosine into plain dot product. One narrow codegen'd projection+filter
    * via the native `dotp` norm — no shuffle, linear at any corpus size.
    */
  class EmbeddingGuardTransformer(conf: Conf) extends Transformer {
    private val vecCol = conf.strOr("embedding_column", "embedding")
    private val normalize = conf.bool("normalize")

    override def validate(df: DataFrame): Unit =
      require(df.columns.contains(vecCol),
        s"embedding_guard: requires column '$vecCol', got ${df.columns.mkString(", ")}")

    def transform(df: DataFrame): DataFrame = {
      import graft.operators.Similarity
      graft.functions.GraftFunctions.register(df.sparkSession)
      val v = Similarity.asDouble(col(vecCol))
      val nrm = Similarity.norm(v)
      val kept = df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0 && nrm > 0.0)
      if (normalize) {
        // nrm must be a projected ATTRIBUTE before the per-element lambda:
        // an expression referenced inside the HOF re-evaluates PER ELEMENT
        // (O(dims²) per row for an O(dims) norm). The HOF itself is
        // fully-qualified — the class's own transform(df) shadows it.
        // The temp column dodges existing names so an input frame that
        // already carries "__nrm" is never clobbered-then-dropped.
        val tmp = Iterator.from(0).map(i => s"__nrm$i")
          .find(n => !df.columns.contains(n)).get
        kept.withColumn(tmp, nrm)
          .withColumn(vecCol,
            org.apache.spark.sql.functions.transform(v, x => x / col(tmp)))
          .drop(tmp)
      } else kept
    }
  }

  /** Beyond-reference: the dd8 corpus-curation chain (quality gate → exact
    * dedup → MinHash near-dup removal, [[graft.operators.Dedup.cleanCorpus]])
    * as a config-driven transformer — so the SAME YAML engine that runs the
    * reference's pipelines runs an LLM-curation pipeline
    * (`configs/corpus_pipeline.yaml`): jsonl in → curated jsonl out.
    */
  class CorpusCleanTransformer(conf: Conf) extends Transformer {
    private val idCol = conf.strOr("id_column", "doc_id")
    private val textCol = conf.strOr("text_column", "text")
    private val maxDupWordFraction = conf.dblOr("max_dup_word_fraction", 0.5)
    private val maxSymbolRatio = conf.dblOr("max_symbol_ratio", 0.3)
    private val minTokens = conf.intOr("min_tokens", 5)
    private val threshold = conf.dblOr("jaccard_threshold", 0.8)

    override def validate(df: DataFrame): Unit = {
      val have = df.columns.toSet
      require(have.contains(idCol) && have.contains(textCol),
        s"corpus_clean: requires columns '$idCol' and '$textCol', got ${have.mkString(", ")}")
    }

    def transform(df: DataFrame): DataFrame =
      graft.operators.Dedup.cleanCorpus(df, idCol, textCol,
        maxDupWordFraction = maxDupWordFraction,
        maxSymbolRatio = maxSymbolRatio,
        minTokens = minTokens, threshold = threshold)
  }

  /** Incremental EXACT dedup as a config-driven pipeline stage — the
    * state-travel family ([[graft.operators.Incremental.dedupDelta]])
    * exposed through the SAME engine machinery that drives the reference's
    * cursor-style incrementality (S9–S11): `state_dir` holds the
    * processed-shard manifest and the md5 fingerprint store as parquet;
    * each run deduplicates ONLY the shards the manifest doesn't cover —
    * against the store and within the delta — and emits the survivors.
    * The grown state is STAGED at transform time and persisted by the
    * engine's post-load [[graft.core.StatefulTransformer.commit]] hook,
    * the cursor's save-after-load discipline extended to operator state: a
    * failed load leaves both stores untouched, so the next run re-processes
    * the same delta (EnginePipelineSpec pins this with a failing loader).
    *
    * Scale: state IO is store-sized parquet (production would bucket the
    * fingerprint store by `fp` so only the delta side of the anti-join
    * moves — BucketedJoinSpec's layout); the commit's rewrite-the-store
    * write is the simple-filesystem stand-in for a transactional table
    * format, staged to a temp dir and swapped in.
    */
  /** Parquet state IO shared by the incremental stage plugins: read a
    * store directory or bootstrap from a schema-matched empty frame, and
    * commit the grown store by writing a temp sibling (the plan READS the
    * old store) then swapping — crash-safe up to the final directory move
    * (the simple-filesystem stand-in for a transactional table format).
    */
  private object IncrState {
    def readOr(spark: org.apache.spark.sql.SparkSession,
        path: String, fallback: => DataFrame): DataFrame =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
        spark.read.parquet(path)
      else fallback

    /** Two-phase store+manifest commit: BOTH frames write to temp siblings
      * first (their plans still read the old stores), then the MANIFEST
      * swaps before the store — a crash between the swaps leaves
      * "manifest covers the delta, store lacks it", which degrades to
      * missed future dedup / an undercounted store; the opposite order
      * would re-process a delta against a store that already contains it
      * and silently drop its legitimate survivors (data loss). A crash
      * during the writes leaves both stores untouched.
      */
    def commitPair(store: DataFrame, storePath: String,
        manifest: DataFrame, manifestPath: String): Unit = {
      val tStore = writeTmp(store, storePath)
      val tMani = writeTmp(manifest, manifestPath)
      swap(tMani, manifestPath)
      swap(tStore, storePath)
    }

    private def writeTmp(df: DataFrame, path: String): String = {
      val tmp = s"$path.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
      df.write.mode("overwrite").parquet(tmp)
      tmp
    }

    private def swap(tmp: String, path: String): Unit = {
      val target = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isDirectory(target)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(target).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), target)
    }

    /** One consistent snapshot of the stage input: a LAZY localCheckpoint,
      * materialized by the load action itself, so the staged state plans
      * executed at commit time read the loaded snapshot's BLOCKS — a live
      * source (JDBC, API) is never re-queried after the load, and the
      * committed state can never describe rows that were not loaded.
      */
    def snapshot(df: DataFrame): DataFrame = df.localCheckpoint(false)

    def requireCols(what: String, df: DataFrame, cols: Seq[String]): Unit = {
      val have = df.columns.toSet
      require(cols.forall(have.contains),
        s"$what: requires columns ${cols.mkString("'", "', '", "'")}, " +
          s"got ${have.mkString(", ")}")
    }
  }

  class IncrementalDedupTransformer(conf: Conf) extends graft.core.StatefulTransformer {
    private val idCol = conf.strOr("id_column", "doc_id")
    private val textCol = conf.strOr("text_column", "text")
    private val shardCol = conf.strOr("shard_column", "source")
    private val stateDir = conf.str("state_dir").getOrElse(
      throw new IllegalArgumentException("incremental_dedup: state_dir is required"))
    private var staged: Option[(DataFrame, DataFrame)] = None

    override def validate(df: DataFrame): Unit =
      IncrState.requireCols("incremental_dedup", df, Seq(idCol, textCol, shardCol))

    def transform(df0: DataFrame): DataFrame = {
      val df = IncrState.snapshot(df0)
      val spark = df.sparkSession
      val fps = IncrState.readOr(spark, s"$stateDir/fingerprints",
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          new org.apache.spark.sql.types.StructType()
            .add("fp", org.apache.spark.sql.types.StringType)))
      val manifest = IncrState.readOr(spark, s"$stateDir/manifest",
        df.select(col(shardCol)).limit(0))
      val (survivors, newFps) = graft.operators.Incremental.dedupDelta(
        df, manifest, shardCol, fps, idCol, textCol)
      val newManifest = manifest.select(col(shardCol))
        .union(df.select(col(shardCol))).distinct()
      staged = Some((newFps, newManifest))
      survivors
    }

    def commit(): Unit = staged.foreach { case (fps, manifest) =>
      IncrState.commitPair(fps, s"$stateDir/fingerprints",
        manifest, s"$stateDir/manifest")
      staged = None
    }
  }

  /** [[IncrementalDedupTransformer]]'s banded-LSH sibling — mx26's
    * [[graft.operators.Incremental.nearDedupDelta]] as a config-driven
    * stage: the carried `(doc_id, sig, bk)` MinHash-signature store and
    * the processed-shard manifest live as parquet under `state_dir`, a
    * run near-deduplicates only uncovered shards against (store ∪ delta),
    * and the grown store commits save-after-load. `broadcast_delta: true`
    * opts into the scan-only store path for shard-sized deliveries
    * (measured 25× less delivery shuffle at a 20M-doc store — SCALE.md
    * round 13).
    */
  class IncrementalNearDedupTransformer(conf: Conf) extends graft.core.StatefulTransformer {
    private val idCol = conf.strOr("id_column", "doc_id")
    private val textCol = conf.strOr("text_column", "text")
    private val shardCol = conf.strOr("shard_column", "source")
    private val shingleK = conf.intOr("shingle_k", 3)
    private val bands = conf.intOr("bands", 16)
    private val rowsPerBand = conf.intOr("rows_per_band", 4)
    private val maxBucket = conf.intOr("max_bucket", 100000)
    private val broadcastDelta = conf.bool("broadcast_delta")
    // the carried store arrives from parquet: scanning it per consumer
    // beats writing a transient state-sized checkpoint copy first — the
    // operator's own documented storage discipline, so the default is OFF
    private val materializeState = conf.bool("materialize_state")
    private val stateDir = conf.str("state_dir").getOrElse(
      throw new IllegalArgumentException("incremental_near_dedup: state_dir is required"))
    private var staged: Option[(DataFrame, DataFrame)] = None

    override def validate(df: DataFrame): Unit =
      IncrState.requireCols("incremental_near_dedup", df, Seq(idCol, textCol, shardCol))

    def transform(df0: DataFrame): DataFrame = {
      val df = IncrState.snapshot(df0)
      val spark = df.sparkSession
      val sigs = IncrState.readOr(spark, s"$stateDir/signatures",
        graft.operators.Dedup.minhashSignaturesWithBands(
          df.limit(0), idCol, textCol, shingleK, bands * rowsPerBand, bands))
      // a store trained under DIFFERENT banding parameters must fail fast:
      // zip_with over mismatched signature lengths null-pads, the verify
      // predicate goes null, and every store-side pair silently drops
      sigs.select(size(col("sig")), size(col("bk"))).take(1).foreach { r =>
        require(r.getInt(0) == bands * rowsPerBand && r.getInt(1) == bands,
          s"incremental_near_dedup: carried store at $stateDir has k=${r.getInt(0)}/" +
            s"bands=${r.getInt(1)} but the stage is configured k=${bands * rowsPerBand}/" +
            s"bands=$bands — signature stores are parameter-bound; retrain or " +
            "point state_dir elsewhere")
      }
      val manifest = IncrState.readOr(spark, s"$stateDir/manifest",
        df.select(col(shardCol)).limit(0))
      val (survivors, newSigs) = graft.operators.Incremental.nearDedupDelta(
        df, manifest, shardCol, sigs, idCol, textCol,
        shingleK = shingleK, bands = bands, rowsPerBand = rowsPerBand,
        maxBucket = maxBucket, materializeState = materializeState,
        broadcastDelta = broadcastDelta)
      val newManifest = manifest.select(col(shardCol))
        .union(df.select(col(shardCol))).distinct()
      staged = Some((newSigs, newManifest))
      survivors
    }

    def commit(): Unit = staged.foreach { case (sigs, manifest) =>
      IncrState.commitPair(sigs, s"$stateDir/signatures",
        manifest, s"$stateDir/manifest")
      staged = None
    }
  }

  /** The vocabulary/document-frequency store ([[graft.operators
    * .Incremental.vocabDelta]]) as a config-driven stage: carried
    * `(term, df)` state under `state_dir`, delta-only tokenization, and
    * the stage's OUTPUT is the touched-term drift report
    * `(term, df_prior, df_delta, df_total)` — the feed a tokenizer health
    * monitor loads (new terms are `df_prior = 0`). Store commits
    * save-after-load like its siblings.
    */
  class IncrementalVocabTransformer(conf: Conf) extends graft.core.StatefulTransformer {
    private val textCol = conf.strOr("text_column", "text")
    private val shardCol = conf.strOr("shard_column", "source")
    private val stateDir = conf.str("state_dir").getOrElse(
      throw new IllegalArgumentException("incremental_vocab: state_dir is required"))
    private var staged: Option[(DataFrame, DataFrame)] = None

    override def validate(df: DataFrame): Unit =
      IncrState.requireCols("incremental_vocab", df, Seq(textCol, shardCol))

    def transform(df0: DataFrame): DataFrame = {
      val df = IncrState.snapshot(df0)
      val spark = df.sparkSession
      val vocab = IncrState.readOr(spark, s"$stateDir/vocab",
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          new org.apache.spark.sql.types.StructType()
            .add("term", org.apache.spark.sql.types.StringType)
            .add("df", org.apache.spark.sql.types.LongType)))
      val manifest = IncrState.readOr(spark, s"$stateDir/manifest",
        df.select(col(shardCol)).limit(0))
      val (report, newVocab) = graft.operators.Incremental.vocabDelta(
        df, manifest, shardCol, vocab, textCol)
      val newManifest = manifest.select(col(shardCol))
        .union(df.select(col(shardCol))).distinct()
      staged = Some((newVocab, newManifest))
      report
    }

    def commit(): Unit = staged.foreach { case (vocab, manifest) =>
      IncrState.commitPair(vocab, s"$stateDir/vocab",
        manifest, s"$stateDir/manifest")
      staged = None
    }
  }

  /** P1 — identity (`transformers/pass_through.py:15-20`; the copy contract
    * is free on immutable DataFrames).
    */
  object PassThrough extends Transformer {
    def transform(df: DataFrame): DataFrame = df.select("*")
  }

  /** C1–C11 in the fixed reference order, configured with the reference's
    * YAML keys.
    */
  class DataCleaningTransformer(conf: Conf) extends Transformer {
    private val cfg = Cleaning.Config(
      dropColumns = conf.strSeq("drop_columns"),
      renameColumns = conf.strMap("rename_columns"),
      lowercaseColumns = conf.bool("lowercase_columns"),
      stripWhitespace = conf.bool("strip_whitespace"),
      fillNulls = conf.anyMap("fill_nulls"),
      dropNulls = conf.bool("drop_nulls"),
      dropNullColumns = conf.strSeq("drop_null_columns"),
      deduplicate = conf.bool("deduplicate"),
      deduplicateColumns = conf.strSeq("deduplicate_columns"),
      standardizeDates = conf.strSeq("standardize_dates"),
      castTypes = conf.strMap("cast_types"),
      orderColumn = conf.str("order_column"))

    def transform(df: DataFrame): DataFrame = Cleaning(df, cfg)
  }

  /** V1 — schema-predicate filter; `chunk_size`/`strict` are accepted for
    * config parity but superseded by partitioning / the predicate itself.
    */
  class ValidationTransformer(conf: Conf) extends Transformer {
    private val schemaName = conf.str("schema").orElse(conf.str("model")).getOrElse(
      throw new IllegalArgumentException("pydantic_validation: 'schema' (or 'model') is required"))

    def transform(df: DataFrame): DataFrame = Validation.validate(df, schemaName)
  }

  /** W1–W4 — the finance indicator chain with the reference's config keys and
    * defaults (`finance_transformer.py:35-41`).
    */
  class IndicatorsTransformer(conf: Conf) extends Transformer {
    private val cfg = Indicators.Config(
      rsiPeriod = conf.intOr("rsi_period", 14),
      smaPeriod = conf.intOr("sma_period", 50),
      bbPeriod = conf.intOr("bb_period", 20),
      bbStd = conf.int("bb_std").map(_.toDouble).getOrElse(2.0),
      macdFast = conf.intOr("macd_fast", 12),
      macdSlow = conf.intOr("macd_slow", 26),
      macdSignal = conf.intOr("macd_signal", 9))
    private val partitionCols = conf.strSeq("partition_columns")

    override def validate(df: DataFrame): Unit = {
      val required = Seq("date", "open", "high", "low", "close", "volume")
      val have = df.columns.map(_.toLowerCase).toSet
      val missing = required.filterNot(have.contains)
      require(missing.isEmpty,
        s"technical_indicators: missing required columns: ${missing.mkString(",")}")
    }

    def transform(df: DataFrame): DataFrame =
      Indicators.technicalIndicators(df, cfg, partitionCols)
  }
}
