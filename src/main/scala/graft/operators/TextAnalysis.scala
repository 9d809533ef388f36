package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, heuristic language ID, quality scoring, and document
  * fingerprinting. All are single-pass, codegen-friendly Column expressions —
  * no UDFs, no shuffles — so they scale linearly with the corpus.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count (pandas `str.split().len()` shape). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-style pre-tokenization pattern (the GPT-2 pattern's shape, reduced
    * to classes both Java regex and RE2 interpret identically): letter runs,
    * digit runs, and non-alphanumeric-non-space runs each become one
    * pre-token. Counting these approximates subword-token budget ~linearly —
    * the cheap "how many tokens is this corpus" estimator.
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]+"

  /** BPE-ish pre-token count via the codegen'd regexp machinery. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Marker stopwords per language, used by [[languageId]]. Deliberately tiny:
    * this is the classic n-gram/stopword-presence heuristic, not a model.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "les", "des", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Distinct-marker hit count for one language. */
  def langScore(toks: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(array_intersect(toks, array(markers.map(lit): _*)))
  }

  /** Predicted language: argmax of marker scores, ties broken by the fixed
    * language order (de, en, es, fr, zh). Pure CASE chain — deterministic.
    */
  def languageId(text: Column): Column = {
    val toks = tokens(text)
    val langs = langMarkers.map(_._1)
    val scores = langs.map(l => l -> langScore(toks, l)).toMap
    langs.init.zipWithIndex.foldLeft(when(lit(false), lit(""))) { case (acc, (l, i)) =>
      val rest = langs.drop(i + 1)
      val cond = rest.map(r => scores(l) >= scores(r)).reduce(_ && _)
      acc.when(cond, lit(l))
    }.otherwise(lit(langs.last))
  }

  /** Heuristic quality score in [0,1]: length, stopword density and word
    * shape. Components are exact-integer ratios, so the score is
    * cross-engine deterministic.
    */
  def qualityScore(text: Column): Column = {
    val nTokens = size(split(text, " "))
    val nChars = length(text)
    val stops = langMarkers.toMap.apply("en")
    val stopOcc = size(filter(split(lower(text), " "), t => t.isin(stops: _*)))
    val avgWordLen = (nChars - (nTokens - 1)) / nTokens
    lit(0.5) * (least(nTokens, lit(100)) / 100.0) +
      lit(0.3) * (stopOcc / nTokens) +
      lit(0.2) * (least(avgWordLen, lit(10.0)) / 10.0)
  }

  /** Normalized-token fingerprint: md5 over the sorted distinct lowercase
    * tokens — the standard "fingerprint" key for exact-after-normalization
    * dedup (case/word-order/duplication insensitive).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  // ------------------------------------------- repetition (Gopher-style)

  /** Fraction of word occurrences that are repeats of an earlier word —
    * the cheap per-document repetition filter (Gopher's duplicate-fraction
    * family) applied before any expensive near-dup pass. Exact-integer
    * ratio → cross-engine deterministic.
    */
  def dupWordFraction(text: Column): Column = {
    val ws = tokens(text)
    lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws).cast("double")
  }

  /** Mean word length (total word chars / word count, exact ints). */
  def meanWordLength(text: Column): Column = {
    val ws = split(text, " ")
    aggregate(transform(ws, w => length(w)), lit(0), (a, x) => a + x).cast("double") /
      size(ws).cast("double")
  }

  /** Fraction of characters outside [a-zA-Z0-9 ] — the symbol-to-text ratio
    * quality signal.
    */
  def symbolRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** The tx16 C4-style keep predicate (Raffel et al. 2020 §2.2 adapted):
    * word-count band [30, 5000], ≥½ distinct words, ≥2 distinct core
    * stopwords, mean word length in [4.5, 8] chars — all-integer
    * comparisons (cross-multiplied fractions), one codegen'd projection.
    * Shared verbatim by the tx16 audit query (per-rule booleans) and the
    * mx17 curation pipeline (the composed filter stage).
    */
  def c4Keep(text: Column, nChars: Column): Column = {
    val ws = split(text, " ")
    val nw = size(ws)
    val rLen = nw.between(30, 5000)
    val rDistinct = size(array_distinct(ws)) * 2 >= nw
    val rStop = size(array_distinct(filter(ws,
      t => t.isin("the", "a", "of", "and", "is")))) >= 2
    val halfMean = (nChars - (nw - 1)) * 2
    val rWordlen = halfMean >= nw * 9 && halfMean <= nw * 16
    rLen && rDistinct && rStop && rWordlen
  }

  /** BPE merge-rule TRAINING (Sennrich et al. 2016, the subword-nmt
    * algorithm): starting from character-level symbol sequences over the
    * corpus's word-frequency table, repeatedly find the most frequent
    * adjacent symbol pair and fuse it, emitting the learned merge list
    * `(rank, left, right, pair_count)` — the tokenizer-training step an
    * LLM data pipeline runs before token accounting ([[bpeTokenCount]] is
    * the heuristic stand-in; this is the real learner). Deterministic:
    * pair-count ties break lexicographically on (left, right), and each
    * round's merge applies greedily left-to-right (leftmost
    * non-overlapping occurrences — "aaa" under merge (a,a) yields
    * ["aa","a"]), via a codegen'd `aggregate` fold, no UDF. Training stops
    * early when no pair occurs twice.
    *
    * Scale shape: the corpus is tokenized and shuffled ONCE into the
    * word-frequency grid (vocabulary-bounded — Heaps' law, not corpus
    * scale) and cached; every round then runs one pair-count aggregate
    * over that bounded grid plus one driver-side top-1 (a single row —
    * the merge rule itself — crosses the driver boundary, never data).
    * Rounds = `nMerges`, the vocabulary budget, fixed and small relative
    * to corpus size. Not SQL-expressible (each round's tokenization
    * depends on the previous round's learned rule), so the gate is the
    * hand-replayed spec, not a DuckDB oracle.
    */
  def learnBpeMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(nMerges >= 1, "nMerges must be >= 1")
    // fixed-shape round loop: AQE would schedule every exchange as its own
    // job to observe sizes it cannot exploit here (the grid is tiny) —
    // static plans keep each round at ONE scheduler job (SCALE.md, the
    // round-8 job lever)
    graft.operators.Dedup.withStaticPlan(spark) {
    val words = graft.operators.Dedup.cachedForReuse(
      graft.operators.Dedup.spread(df)
        .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .select(split(col("w"), "").as("syms"), col("cnt")))
    def pairCounts(cur: DataFrame): DataFrame =
      cur.select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
    def applyMerge(cur: DataFrame, a: String, b: String): DataFrame =
      cur.withColumn("syms",
        when(size(col("syms")) <= 1, col("syms")).otherwise(
          aggregate(
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            slice(col("syms"), lit(1), lit(1)),
            (acc, x) => when(element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x))))))
    var cur = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = pairCounts(cur)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) exhausted = true
      else {
        r += 1
        val (a, b, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((r.toLong, a, b, c))
        cur = applyMerge(cur, a, b)
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
    }
  }

  /** Apply an ordered BPE merge list (the [[learnBpeMerges]] output, or any
    * fixed vocabulary's rules) to a text column: each word becomes its
    * subword symbol sequence after replaying every merge rule in rank
    * order with the same greedy leftmost-non-overlapping semantics the
    * trainer used. Returns the per-document SUBWORD TOKEN COUNT — the
    * number a context-budget planner actually needs (and the exact
    * counterpart of [[bpeTokenCount]]'s regex estimate).
    *
    * The merge list is a plain driver-side Seq (rules are vocabulary-sized
    * by definition — they ARE the vocabulary budget) compiled into a
    * chain of `nRules` codegen'd `aggregate` folds over each word's symbol
    * array: one narrow projection, no shuffle, no UDF; the corpus streams
    * through once. At realistic vocab sizes (30–100k rules) the fold chain
    * exceeds codegen limits — then the same fold runs as a per-partition
    * trie walk; the `nRules ≤ 64` expression path here keeps the oracle
    * story (pure Column expressions) for the budgets the suite trains.
    */
  def bpeTokenCountLearned(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.length <= 64,
      "expression-path applyBpe is bounded at 64 rules; see scaladoc")
    val words = split(lower(col(textCol)), "\\s+")
    val chars = transform(filter(words, w => length(w) > 0), w => split(w, ""))
    val folded = merges.foldLeft(chars) { case (acc, (a, b)) =>
      transform(acc, syms =>
        when(size(syms) <= 1, syms).otherwise(
          aggregate(
            slice(syms, lit(2), size(syms) - 1),
            slice(syms, lit(1), lit(1)),
            (st, x) => when(element_at(st, -1) === lit(a) && x === lit(b),
                concat(slice(st, lit(1), size(st) - 1), array(lit(a + b))))
              .otherwise(concat(st, array(x))))))
    }
    graft.operators.Dedup.spread(df).select(col(idCol).as("doc_id"),
      aggregate(folded, lit(0L), (acc, syms) => acc + size(syms))
        .as("n_subword_tokens"))
  }

  /** Corpus-trained bigram LM fluency score per document — the CCNet-style
    * "is this text predictable under a language model?" curation signal,
    * in the repo's LOG-FREE exact-integer form: for every bigram occurrence
    * the conditional probability of its second word given its first,
    * P(w₂|w₁) = c(w₁,w₂)/c(w₁·), quantized to parts-per-million by integer
    * division, then averaged per document (again by integer division). A
    * true cross-entropy would sum ln P — but ln() is not correctly rounded
    * and differs across libm implementations (the tx9/tx15 rule), while
    * mean conditional probability ranks documents by the same
    * "predictability under the corpus model" signal with every step exact.
    * Documents with fewer than 2 non-empty tokens have no bigrams and are
    * absent from the output (no model evidence either way).
    *
    * Plan shape (the tx15 lesson, applied from birth): the bigram stream is
    * built once; the bigram count c(w₁,w₂) and the context count c(w₁·) are
    * WINDOW counts over that stream (partition by (w₁,w₂) / by w₁), then
    * one groupBy(doc) mean — three keyed shuffles of the bigram stream,
    * zero joins, zero vocabulary-sized broadcasts. At 100 TB each shuffle
    * partitions by high-cardinality keys (no hot single reducer beyond
    * natural stopword skew, which AQE's skew handling splits).
    */
  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents" — public literature): candidate
    * phrases are the maximal token runs between stopword/boundary
    * delimiters; each content word scores `degree/freq` (degree = summed
    * length of the phrases its occurrences sit in, freq = occurrence
    * count); a phrase scores the sum of its words' scores; the per-doc
    * top-k phrases are the document's keywords.
    *
    * Pinned conventions (bit-exact gate):
    *   - the stopword delimiter set is [[langMarkers]]' English list (the
    *     corpus's marker vocabulary — deliberately tiny, documented);
    *   - phrase extraction is a REGEX SPLIT on `\b(?:stop|…)\b` over the
    *     lowercased text — no positional window needed; segments trim to
    *     phrases, empties drop, and runs longer than `maxLen` words are
    *     discarded (the rake-nltk max_length knob);
    *   - word score in milli-units: `degree·1000 div freq` (truncating);
    *     phrase score = Σ word-score over the phrase's words WITH
    *     multiplicity — all integer, so ranking is exact;
    *   - identical phrase strings within a doc are ONE candidate
    *     (occurrence count carried as `n_occ`); ties rank phrase-asc.
    *
    * 100 TB shape: ONE codegen'd split/explode chain — text → phrase
    * occurrences → word positions — then every stat is a doc-keyed
    * WINDOW over that single frame (occurrence number over
    * (doc, phrase); freq/degree over (doc, word)) and one doc-keyed
    * group-by folds words back to ranked phrases. No self-joins, no
    * second corpus scan, nothing global, no broadcasts.
    */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 3, maxLen: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val stops = langMarkers.toMap.apply("en")
    val splitRe = "\\b(?:" + stops.mkString("|") + ")\\b"
    val ph = graft.operators.Dedup.spread(df).select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), splitRe)).as("seg"))
      .select(col("doc_id"), trim(col("seg")).as("phrase"))
      .filter(col("phrase") =!= "")
      .withColumn("plen", size(split(col("phrase"), " ")).cast(LongType))
      .filter(col("plen") <= maxLen)
    // one word-position row per phrase OCCURRENCE (standard RAKE: every
    // occurrence of a word contributes its phrase's length to the degree)
    val words = ph.select(col("doc_id"), col("phrase"), col("plen"),
      explode(split(col("phrase"), " ")).as("w"))
    val ww = Window.partitionBy("doc_id", "w")
    val withScore = words
      .withColumn("degree", sum(col("plen")).over(ww))
      .withColumn("freq", count(lit(1)).over(ww))
      .withColumn("wscore_milli", expr("degree * 1000 div freq"))
    // fold word rows back to phrases: each occurrence contributed exactly
    // plen word rows, so n_occ = rows div plen, and the occurrence copies
    // are identical, so the per-occurrence score is sum div n_occ — both
    // divisions exact (no truncation loss)
    val scored = withScore.groupBy("doc_id", "phrase", "plen")
      .agg(count(lit(1)).as("nrows"), sum(col("wscore_milli")).as("stot"))
      .withColumn("n_occ", expr("nrows div plen"))
      .withColumn("score_milli", expr("stot div n_occ"))
    val rw = Window.partitionBy("doc_id")
      .orderBy(col("score_milli").desc, col("phrase"))
    scored.withColumn("rank", row_number().over(rw).cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("phrase"), col("n_occ"),
        col("score_milli"))
  }

  /** Flesch reading-ease (Flesch 1948 — public literature) in exact
    * milli-units: `206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words)`, computed as `206835 − (1015·W) div S − (84600·Y) div W`
    * with truncating Long division, so the score is integral and
    * bit-identical cross-engine (no doubles anywhere).
    *
    * Pinned counting conventions (deterministic, engine-parity):
    *   - words W: single-space tokens ([[tokenCount]]'s convention;
    *     empty text counts 1 — never a zero divisor);
    *   - sentences S: regex matches of `[.!?]+` runs, floored at 1
    *     (punctuation-free corpora read as one long sentence);
    *   - syllables Y: vowel-group runs `[aeiou]+` over the lowercased
    *     text — whitespace breaks groups, so the per-text count equals
    *     the per-word sum with no explode; no per-word minimum (the
    *     vowel-group heuristic, not a dictionary).
    *
    * 100 TB shape: a pure codegen'd projection — no shuffle, no joins,
    * no explode; the regex counts are per-row scalar work.
    */
  def fleschReadability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    df.select(col(idCol).as("doc_id"),
        tokenCount(col(textCol)).cast(LongType).as("n_words"),
        greatest(size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0)))
          .cast(LongType), lit(1L)).as("n_sentences"),
        size(regexp_extract_all(lower(col(textCol)), lit("[aeiou]+"), lit(0)))
          .cast(LongType).as("n_syllables"))
      .withColumn("flesch_milli",
        expr("206835L - (1015L * n_words) div n_sentences" +
          " - (84600L * n_syllables) div n_words"))
  }

  /** Heaps'-law vocabulary-growth curve: the corpus in `buckets` equal
    * id-range slices, reporting per slice the token volume, the number
    * of NEW word types (first corpus occurrence falls in that slice) and
    * the cumulative vocabulary. Sublinear growth (new_types flattening)
    * is the expected natural-language shape; a late-slice spike is the
    * classic signal of a distribution shift in corpus assembly order.
    *
    * Pinned conventions: ids must be dense 0-based Longs (the documents
    * convention — for general ids, densify first; a global row_number
    * over 100 TB is exactly what this avoids); slice =
    * `doc_id·buckets div (max_id+1)`; words are [[tokens]]' single-space
    * convention with empties dropped; "first occurrence" orders by
    * doc_id. All integer arithmetic.
    *
    * 100 TB shape: one explode pass, ONE word-keyed aggregate for first
    * occurrences (min slice — monotone in doc_id, so min slice == the
    * slice of the min doc), two bounded `buckets`-row aggregates, and a
    * single-row max broadcast. Nothing global beyond the bounded curve.
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    require(buckets >= 1, "buckets must be >= 1")
    val toks = graft.operators.Dedup.spread(df)
      .select(col(idCol).cast(LongType).as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val scale = df.select((max(col(idCol)).cast(LongType) + 1L).as("__n"))
    val t = toks.crossJoin(broadcast(scale))
      .withColumn("bucket", expr(s"doc_id * $buckets div __n"))
    val vol = t.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val firsts = t.groupBy("w").agg(min(col("bucket")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    vol.join(firsts, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_types", sum(col("new_types")).over(w))
      .select("bucket", "n_tokens", "new_types", "cum_types")
  }

  /** Pairwise total-variation distance between per-group unigram
    * distributions, in exact ppm: TV(P,Q) = ½·Σ_w |P(w) − Q(w)| — the
    * LOG-FREE distribution-drift metric (KL/JS need ln(), which is not
    * correctly rounded cross-libm; TV is pure rational arithmetic, so it
    * follows the repo's tx9 exactness rule). With integer counts,
    * ½·Σ|c₁/n₁ − c₂/n₂| = Σ|c₁·n₂ − c₂·n₁| / (2·n₁·n₂) — one truncating
    * decimal division per pair at the very end.
    *
    * 100 TB shape: the corpus reduces ONCE to the (group, word) count
    * grid (map-side combinable); everything after runs on the
    * vocab×groups grid (words missing from a group enter as 0 via the
    * densified grid — their mass must count or TV is underestimated),
    * and the pair join is grid-sized, never corpus-sized. Output is
    * groups·(groups−1)/2 rows. Exact while |c·n| fits decimal(38,0) —
    * astronomically beyond any real corpus.
    */
  def sourceTvDistance(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val D = DecimalType(38, 0)
    val cnt = df.select(col(groupCol).as("src"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("src", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("src").agg(sum(col("c")).as("n"))
    val grid = cnt.select("w").distinct()
      .crossJoin(tot)
      .join(cnt, Seq("src", "w"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val a = grid.select(col("src").as("source_a"), col("n").as("na"),
      col("w"), col("c").as("ca"))
    val b = grid.select(col("src").as("source_b"), col("n").as("nb"),
      col("w"), col("c").as("cb"))
    a.join(b, "w").filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b", "na", "nb")
      .agg(sum(abs(col("ca").cast(D) * col("nb") - col("cb").cast(D) * col("na")))
        .as("s"))
      .select(col("source_a"), col("source_b"),
        expr("s * 1000000 div (cast(2 as decimal(38,0)) * na * nb)")
          .cast(LongType).as("tv_ppm"))
      .orderBy("source_a", "source_b")
  }

  def bigramFluencyPpm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = tokens(col(textCol))
    val bg = graft.operators.Dedup.spread(df)
      .select(col(idCol).as("doc_id"),
        explode(zip_with(
          slice(l, lit(1), size(l) - 1), slice(l, lit(2), size(l) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bgm"))
      .select(col("doc_id"), col("bgm.w1").as("w1"), col("bgm.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    bg
      .withColumn("c2", count(lit(1)).over(Window.partitionBy("w1", "w2")))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("w1")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(c2 * 1000000 div c1) div count(1)").as("fluency_ppm"))
  }

  /** Standardized type-token ratio (STTR — Kubát & Milička's segment-wise
    * form of the classic lexical-diversity signal; public literature):
    * raw TTR = types/tokens shrinks with document length, so the
    * comparable statistic averages TTR over fixed-size NON-OVERLAPPING
    * token segments. Pinned conventions: 0-based token position,
    * segment = pos div `segTokens`, only FULL segments count (a trailing
    * partial segment is dropped — the rolling full-window-only
    * discipline), per-segment ttr_milli = 1000·types div segTokens and
    * the per-doc mean both truncating integer divisions. Documents with
    * no full segment are absent from the output.
    *
    * Plan: one posexplode, one (doc, segment) aggregate, one doc
    * aggregate — all keyed by doc_id, nothing global; segments never
    * span documents, so the shape is embarrassingly parallel at any
    * corpus size.
    */
  def sttr(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 25): DataFrame = {
    require(segTokens >= 1, "sttr: segTokens must be >= 1")
    val seg = graft.operators.Dedup.spread(df)
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "w")))
      .withColumn("seg", expr(s"pos div $segTokens"))
      .groupBy(col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("w")).as("n_types"))
      .filter(col("n_tok") === segTokens)
      .withColumn("ttr_milli", expr(s"(1000 * n_types) div $segTokens"))
    seg.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        expr("sum(ttr_milli) div count(1)").as("sttr_milli"))
  }

  /** PII patterns restricted to constructs Java regex and RE2 interpret
    * identically (character classes, counted quantifiers — the
    * [[bpePreTokenCount]] rule), so scrubbing is engine-deterministic.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern = "\\+?[0-9][0-9-]{7,}[0-9]"

  /** PII scrubbing — the redaction pass a public-corpus release runs:
    * emails → `<EMAIL>`, IPv4s → `<IP>`, phone-shaped digit runs →
    * `<PHONE>`, applied in PINNED stage order (email, then IP, then
    * phone) with each per-type count taken on that stage's INPUT — the
    * order is semantic: an email's digits must not be miscounted as a
    * phone, so later patterns see earlier placeholders, never raw text.
    * Appends `n_emails`/`n_ips`/`n_phones` and replaces `textCol` with
    * the scrubbed text. One codegen'd projection, no shuffle.
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailPattern)).cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), EmailPattern, "<EMAIL>"))
      .withColumn("n_ips",
        regexp_count(col(textCol), lit(Ipv4Pattern)).cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), Ipv4Pattern, "<IP>"))
      .withColumn("n_phones",
        regexp_count(col(textCol), lit(PhonePattern)).cast("long"))
      .withColumn(textCol, regexp_replace(col(textCol), PhonePattern, "<PHONE>"))
}
