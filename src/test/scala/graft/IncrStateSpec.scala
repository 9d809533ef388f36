package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.transformers.Transformers
import graft.transformers.Transformers.IncrState

/** Round-14 state-machinery contracts: version stamps (the 61-bit MinHash
  * migration gate), all-or-nothing state presence, interrupted-swap
  * detection, rename-aside swaps, bucketed at-rest store reads, and the
  * two new state-travel plugins (incremental_sem_dedup / incremental_ivf)
  * matching their operators across two deliveries.
  */
class IncrStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): Path = Files.createTempDirectory("graft-incrstate")

  private def docs2(shard1: String, shard2: String) = Seq(
    (1L, shard1, "the quick brown fox jumps over the lazy dog today fine"),
    (2L, shard1, "a completely different document about spark engines here now"),
    (11L, shard2, "the quick brown fox jumps over the lazy dog today fine"),
    (12L, shard2, "fresh unique words nowhere else in this tiny corpus at all")
  ).toDF("doc_id", "source", "text")

  test("near-dedup plugin: two-delivery state travel over bucketed v2 stores; dropped twin") {
    val dir = tmp().toString
    def stage() = new Transformers.IncrementalNearDedupTransformer(
      Map("state_dir" -> dir))
    val all = docs2("s0", "s1")
    val s1 = stage()
    val out1 = s1.transform(all.filter(col("source") === "s0"))
    assert(out1.count() == 2)
    s1.commit()
    // version stamps present on both stores
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/signatures/_GRAFT_STATE_VERSION"))
      == s"${IncrState.SigStoreVersion};buckets=32")
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/band_index/_GRAFT_STATE_VERSION"))
      == s"${IncrState.BandIndexVersion};buckets=32")
    val s2 = stage()
    val out2 = s2.transform(all)
    // doc 11 is an exact twin of carried doc 1 -> dropped by the store
    assert(out2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(12L))
    s2.commit()
    // grown store has all 4 signatures; band index matches its explode
    val sigs = spark.read.parquet(s"$dir/signatures")
    assert(sigs.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 11L, 12L))
    val idx = spark.read.parquet(s"$dir/band_index")
    assert(idx.count() == sigs.count() * 16)
  }

  test("version gate: a tampered or missing signature-store stamp fails loudly") {
    val dir = tmp().toString
    val s1 = new Transformers.IncrementalNearDedupTransformer(Map("state_dir" -> dir))
    s1.transform(docs2("s0", "s1").filter(col("source") === "s0"))
    s1.commit()
    val vf = java.nio.file.Paths.get(s"$dir/signatures/_GRAFT_STATE_VERSION")
    // tampered stamp (a store from a different kernel build); drop the
    // local-FS checksum sidecar so the read sees the new bytes, not a CRC
    // error — a store written BY that other build would carry its own CRC
    Files.writeString(vf, "minhash-sig-v1-32bit-lcg")
    Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/signatures/._GRAFT_STATE_VERSION.crc"))
    val e1 = intercept[IllegalStateException] {
      new Transformers.IncrementalNearDedupTransformer(Map("state_dir" -> dir))
        .transform(docs2("s0", "s1"))
    }
    assert(e1.getMessage.contains("not interchangeable"), e1.getMessage)
    // missing stamp (a pre-round-14 store): signature stores must REJECT
    Files.delete(vf)
    val e2 = intercept[IllegalStateException] {
      new Transformers.IncrementalNearDedupTransformer(Map("state_dir" -> dir))
        .transform(docs2("s0", "s1"))
    }
    assert(e2.getMessage.contains("no _GRAFT_STATE_VERSION"), e2.getMessage)
  }

  test("unversioned legacy store is ACCEPTED for value-compatible kinds (fp) and upgraded on commit") {
    val dir = tmp().toString
    // fabricate a pre-r14 plain-parquet fingerprint store + manifest
    Seq("00000000000000000000000000000000").toDF("fp")
      .write.parquet(s"$dir/fingerprints")
    Seq("s_old").toDF("source").write.parquet(s"$dir/manifest")
    val st = new Transformers.IncrementalDedupTransformer(Map("state_dir" -> dir))
    val out = st.transform(docs2("s0", "s1"))
    assert(out.count() == 3) // 4 docs, one exact-dup pair -> 3 survivors
    st.commit()
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/fingerprints/_GRAFT_STATE_VERSION"))
      == s"${IncrState.FpStoreVersion};buckets=32")
  }

  test("partial state fails loudly instead of half-bootstrapping") {
    val dir = tmp().toString
    Seq("s_old").toDF("source").write.parquet(s"$dir/manifest")
    val e = intercept[IllegalStateException] {
      new Transformers.IncrementalDedupTransformer(Map("state_dir" -> dir))
        .transform(docs2("s0", "s1"))
    }
    assert(e.getMessage.contains("PARTIAL state"), e.getMessage)
    assert(e.getMessage.contains("fingerprints"))
  }

  test("interrupted swap (.bak without live dir) fails loudly with the recovery rename") {
    val dir = tmp().toString
    val s1 = new Transformers.IncrementalDedupTransformer(Map("state_dir" -> dir))
    s1.transform(docs2("s0", "s1").filter(col("source") === "s0"))
    s1.commit()
    // simulate a crash between "live -> .bak" and "tmp -> live"
    Files.move(java.nio.file.Paths.get(s"$dir/fingerprints"),
      java.nio.file.Paths.get(s"$dir/fingerprints.bak"))
    val e = intercept[IllegalStateException] {
      new Transformers.IncrementalDedupTransformer(Map("state_dir" -> dir))
        .transform(docs2("s0", "s1"))
    }
    assert(e.getMessage.contains("interrupted"), e.getMessage)
    assert(e.getMessage.contains(".bak"))
  }

  test("rename-aside commit preserves readable state across repeated commits") {
    val dir = tmp().toString
    def stage() = new Transformers.IncrementalVocabTransformer(Map("state_dir" -> dir))
    val all = docs2("s0", "s1")
    val s1 = stage(); s1.transform(all.filter(col("source") === "s0")); s1.commit()
    val s2 = stage(); s2.transform(all); s2.commit()
    val vocab = spark.read.parquet(s"$dir/vocab")
    // "the" appears in docs 1 and 11 -> df 2; term store survived two swaps
    assert(vocab.filter(col("term") === "the").select("df").as[Long].head() == 2L)
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/vocab.bak")))
  }

  test("incremental_sem_dedup plugin: two-delivery verdicts match the operator; bucketed state") {
    val dir = tmp()
    val stateDir = dir.resolve("state").toString
    val centPath = dir.resolve("cents").toString
    // two well-separated cells on the unit circle
    Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("c_id", "cv")
      .write.parquet(centPath)
    def vec(x: Double, y: Double) = Array(x, y)
    val corpus = Seq(
      (1L, "s0", vec(1.0, 0.05)),   // cell 0
      (2L, "s0", vec(0.05, 1.0)),   // cell 1
      (11L, "s1", vec(1.0, 0.06)),  // near-dup of 1 (same cell, cos ~1)
      (12L, "s1", vec(-0.2, 1.0))   // cell 1, far from 2
    ).toDF("vec_id", "source", "embedding")
    def stage() = new Transformers.IncrementalSemDedupTransformer(Map(
      "state_dir" -> stateDir, "centroids_path" -> centPath, "threshold" -> 0.98))
    val s1 = stage()
    val v1 = s1.transform(corpus.filter(col("source") === "s0"))
    assert(v1.filter(!col("keep")).count() == 0) // no dups within delivery 1
    s1.commit()
    val s2 = stage()
    val v2 = s2.transform(corpus)
    s2.commit()
    // operator replay: same two deliveries composed directly
    import org.apache.spark.sql.types._
    val stateSchema = new StructType()
      .add("vec_id", LongType).add("v", ArrayType(DoubleType))
      .add("nrm", DoubleType).add("cell", LongType)
      .add("cell_cos", DoubleType).add("grp", LongType).add("keep", BooleanType)
    val emptyState = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), stateSchema)
    val cents = spark.read.parquet(centPath)
      .select(col("c_id"), col("cv"), graft.operators.Similarity.norm(col("cv")).as("cn"))
    val m0 = corpus.select(col("source")).limit(0)
    val (_, st1) = graft.operators.Incremental.semDedupDelta(
      corpus.filter(col("source") === "s0"), m0, "source", cents, emptyState,
      "vec_id", "embedding", 0.98)
    val (v2op, _) = graft.operators.Incremental.semDedupDelta(
      corpus, Seq("s0").toDF("source"), "source", cents, st1,
      "vec_id", "embedding", 0.98)
    val got = v2.select("vec_id", "cell", "grp", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    val want = v2op.select(col("vec_id"), col("cell"), col("grp"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(got == want)
    // the near-dup of carried doc 1 is grouped with it; keep-farthest picks
    // doc 11 (smaller cell_cos), retroactively demoting doc 1 in the store
    assert(got.find(_._1 == 11L).exists(r => r._3 == 1L && r._4))
    val state = spark.read.parquet(s"$stateDir/state")
    assert(state.filter(col("grp") === 1L && col("keep")).count() == 1)
    assert(state.filter(col("vec_id") === 1L).select("keep").as[Boolean].head() == false)
    assert(Files.readString(java.nio.file.Paths.get(s"$stateDir/state/_GRAFT_STATE_VERSION"))
      == s"${IncrState.SemStoreVersion};buckets=32")
  }

  test("incremental_quota plugin: carried counts cap across deliveries == one global run") {
    val dir = tmp().toString
    // groups by source-letter prefix; quota 2 per group, order by doc_id
    val rows = Seq(
      (1L, "s0", "a"), (2L, "s0", "a"), (3L, "s0", "b"),
      (11L, "s1", "a"), (12L, "s1", "b"), (13L, "s1", "b")
    ).toDF("doc_id", "source", "grp")
    def stage() = new Transformers.IncrementalQuotaTransformer(Map(
      "state_dir" -> dir, "group_column" -> "grp", "order_column" -> "doc_id",
      "quota" -> 2))
    val s1 = stage()
    val k1 = s1.transform(rows.filter(col("source") === "s0"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(k1 == Seq(1L, 2L, 3L)) // a: 1,2 (quota full); b: 3
    s1.commit()
    val s2 = stage()
    val k2 = s2.transform(rows).select("doc_id").as[Long].collect().sorted.toSeq
    // a is full; b has 1 kept -> 12 only (13 over quota)
    assert(k2 == Seq(12L))
    s2.commit()
    // == one global run: first 2 per group over the (delivery, doc_id) order
    val (kAll, _) = graft.operators.Incremental.quotaDelta(
      rows, rows.select(col("source")).limit(0), "source",
      rows.select(col("grp")).limit(0).withColumn("n_kept", lit(0L)),
      "grp", "doc_id", 2L)
    assert((k1 ++ k2).sorted == kAll.select("doc_id").as[Long].collect().sorted.toSeq)
    val counts = spark.read.parquet(s"$dir/counts")
      .as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 2L, "b" -> 2L))
  }

  test("incremental_contamination plugin: retroactive hits travel; bucketed gram stores") {
    val dir = tmp().toString
    // delivery 1: eval doc 100 + train doc 1 (no overlap yet);
    // delivery 2: train doc 11 SHARES a 5-gram with eval doc 100 ->
    // retroactive contamination of the historical eval doc
    val evalTxt = "alpha beta gamma delta epsilon zeta"
    val rows = Seq(
      (1L, "s0", "one two three four five six", false),
      (100L, "s0", evalTxt, true),
      (11L, "s1", "xx alpha beta gamma delta epsilon yy", false)
    ).toDF("doc_id", "source", "text", "is_bench")
    def stage() = new Transformers.IncrementalContaminationTransformer(Map(
      "state_dir" -> dir, "shingle_k" -> 5))
    val s1 = stage()
    val r1 = s1.transform(rows.filter(col("source") === "s0"))
      .as[(Long, Long, Long)].collect()
    // eval doc 100 has 2 distinct 5-grams, 0 hits yet
    assert(r1.toSeq == Seq((100L, 2L, 0L)))
    s1.commit()
    val s2 = stage()
    val r2 = s2.transform(rows).as[(Long, Long, Long)].collect()
    // doc 11's "alpha beta gamma delta epsilon" retroactively hits doc 100
    assert(r2.toSeq == Seq((100L, 2L, 1L)))
    s2.commit()
    assert(spark.read.parquet(s"$dir/hits").as[(Long, Long, Long)].collect().toSeq
      == Seq((100L, 2L, 1L)))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/train_grams/_GRAFT_STATE_VERSION"))
      == s"${IncrState.GramStoreVersion};buckets=32")
    // idempotent re-run: grown manifest -> empty delta, counters unchanged
    val s3 = stage()
    assert(s3.transform(rows).as[(Long, Long, Long)].collect().toSeq
      == Seq((100L, 2L, 1L)))
  }

  test("an EMPTY committed store (bootstrap with no stateful rows) reads back cleanly") {
    val dir = tmp().toString
    // every doc is below shingle_k tokens -> no signatures, empty stores
    val tiny = Seq((1L, "s0", "one two"), (2L, "s0", "three")).toDF("doc_id", "source", "text")
    def stage() = new Transformers.IncrementalNearDedupTransformer(Map("state_dir" -> dir))
    val s1 = stage()
    assert(s1.transform(tiny).count() == 2) // sig-less docs always kept
    s1.commit()
    // second delivery must not die on schema inference over the file-less store
    val more = tiny.union(Seq((11L, "s1",
      "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "source", "text"))
    val s2 = stage()
    assert(s2.transform(more).select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L))
    s2.commit()
    assert(spark.read.parquet(s"$dir/signatures").count() == 1)
  }

  test("every shipped pipeline config parses and resolves its plugin types") {
    graft.core.Registries.bootstrap()
    val dir = java.nio.file.Paths.get("configs")
    val yamls = java.nio.file.Files.list(dir).iterator()
    val parsed = scala.jdk.CollectionConverters.IteratorHasAsScala(yamls).asScala
      .filter(_.toString.endsWith(".yaml")).map { p =>
        val cfg = graft.core.Config.load(p.toString)
        // every step type must resolve in its registry (catches a config
        // shipping ahead of — or typo'd against — the plugin surface)
        graft.core.Registries.extractors.resolve(cfg.extract.stepType)
        cfg.transform.foreach(t => graft.core.Registries.transformers.resolve(t.stepType))
        graft.core.Registries.loaders.resolve(cfg.load.stepType)
        p.getFileName.toString
      }.toList
    assert(parsed.contains("ann_index_pipeline.yaml"))
    assert(parsed.size >= 7, parsed.mkString(", "))
  }

  test("incremental_ivf plugin: assignments/counts travel; retrain stages next-delivery codebook") {
    val dir = tmp()
    val stateDir = dir.resolve("state").toString
    val centPath = dir.resolve("cents").toString
    Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("c_id", "cv")
      .write.parquet(centPath)
    val corpus = Seq(
      (1L, "s0", Array(0.9, 0.1)), (2L, "s0", Array(0.1, 0.9)),
      (11L, "s1", Array(0.8, 0.2)), (12L, "s1", Array(0.2, 0.8))
    ).toDF("vec_id", "source", "embedding")
    def stage(retrain: Boolean) = new Transformers.IncrementalIvfTransformer(Map(
      "state_dir" -> stateDir, "centroids_path" -> centPath,
      "retrain" -> retrain))
    val s1 = stage(retrain = true)
    val a1 = s1.transform(corpus.filter(col("source") === "s0"))
    assert(a1.as[(Long, Long)].collect().sorted.toSeq == Seq((1L, 0L), (2L, 1L)))
    s1.commit()
    // retrain staged delivery-1 means: cell 0 centroid -> (0.9, 0.1)
    val carried = spark.read.parquet(s"$stateDir/centroids")
      .select("c_id", "cv").as[(Long, Array[Double])].collect().toMap
    assert(carried(0L).toSeq == Seq(0.9, 0.1))
    assert(carried(1L).toSeq == Seq(0.1, 0.9))
    val s2 = stage(retrain = false)
    val a2 = s2.transform(corpus)
    // delta-only: docs 11/12 assigned under the RETRAINED carried codebook
    assert(a2.as[(Long, Long)].collect().sorted.toSeq == Seq((11L, 0L), (12L, 1L)))
    s2.commit()
    val counts = spark.read.parquet(s"$stateDir/counts")
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 2L, 1L -> 2L))
  }

  test("legacy near_dedup state (signatures without band_index) gets the MIGRATION message, not 'restore the missing dirs'") {
    val dir = tmp().toString
    // fabricate a pre-round-14 store: unstamped signatures + manifest, no
    // band_index (that dir arrived with the v2 layout)
    Seq((1L, Seq(1L, 2L), Seq(3L, 4L))).toDF("doc_id", "sig", "bk")
      .write.parquet(s"$dir/signatures")
    Seq("s_old").toDF("source").write.parquet(s"$dir/manifest")
    val e = intercept[IllegalStateException] {
      new Transformers.IncrementalNearDedupTransformer(Map("state_dir" -> dir))
        .transform(docs2("s0", "s1"))
    }
    // the remedy for an unmigratable store is rebuild — the generic partial-
    // state "restore the missing dirs" guidance would be wrong here
    assert(e.getMessage.contains("no _GRAFT_STATE_VERSION"), e.getMessage)
    assert(e.getMessage.contains("clear the state_dir"), e.getMessage)
    assert(!e.getMessage.contains("PARTIAL state"), e.getMessage)
  }

  test("bucketed-store catalog names use a full-width path digest, not 32-bit hashCode") {
    // "Aa" and "BB" collide under String.hashCode (the failure mode: two
    // state paths silently binding to one catalog registration)
    assert("Aa".hashCode == "BB".hashCode)
    assert(IncrState.md5Hex("Aa") != IncrState.md5Hex("BB"))
    assert(IncrState.md5Hex("Aa").length == 32)
  }
}
