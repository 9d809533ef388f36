package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact, engine-portable model-evaluation statistics.
  *
  * The reference's ML stage (predict.py) reports float RMSEs; at corpus scale
  * the evaluation statistics a data pipeline actually gates on (does this
  * feature rank the label? are these two categoricals independent?) must be
  * reproducible across engines and runs, so everything here is computed in
  * INTEGER rational arithmetic — counts, pair counts, and integer-division
  * quantizations (basis points / centi-units) — never floating-point sums.
  * The same tx15/m14 discipline: a hash-gateable result at any scale.
  *
  *  - [[rankAuc]]: ROC AUC via the Mann–Whitney U statistic. AUC =
  *    (#concordant + ½·#tied) / (#pos·#neg) over all pos×neg pairs; both
  *    terms come from per-score-value counts, so the plan is one groupBy on
  *    the score plus an exclusive prefix sum — no per-pair work, no O(n²).
  *    Result is the exact rational (auc_num / auc_den, with auc_num =
  *    2·concordant + ties against auc_den = 2·pos·neg to stay integral).
  *  - [[chi2Contingency]]: Pearson chi-square over the FULL a×b grid
  *    (absent combinations contribute their expected count, so the grid is
  *    rebuilt from the margins, not just observed cells). Per-cell statistic
  *    (O·N − rT·cT)² · 100 / (N·rT·cT) in 128-bit decimal to survive the
  *    squared term at large N, floored to integer centi-units.
  *
  * 100 TB shape: both reduce the input to one shuffle over a bounded key
  * space (distinct score values / category pairs); the prefix sum in
  * [[rankAuc]] is the distributed two-pass [[PrefixSum]], not a
  * single-partition window.
  */
object Eval {

  /** Exact ROC AUC of `scoreCol` (numeric, higher = predicted positive)
    * against boolean `labelCol`. One output row:
    * pos_n, neg_n, auc_num, auc_den, auc_bp (= auc_num·10⁴ // auc_den).
    */
  def rankAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    // Exclusive prefix sum of negatives in score order = for each score
    // value, the number of negative examples ranked strictly below it.
    val withCum = PrefixSum.withStartOffset(perScore, "s", "neg", "cum_neg")
    // conc/ties accumulate pair counts (up to n²/2) and auc_bp multiplies by
    // 10⁴ on top — pure long arithmetic overflows around 4×10⁷ balanced rows
    // (ANSI mode: a runtime throw). Everything from the pair products up runs
    // in decimal(38,0), mirroring the DuckDB oracle's HUGEINT accumulation,
    // so both engines stay exact to ~10¹⁹ rows. Degenerate single-class
    // input (pos·neg = 0) yields NULL auc_bp instead of a divide-by-zero
    // throw (the oracle SQL carries the same CASE).
    withCum
      .agg(
        sum(col("pos").cast(DecimalType(38, 0)) * col("cum_neg")).as("conc"),
        sum(col("pos").cast(DecimalType(38, 0)) * col("neg")).as("ties"),
        sum(col("pos")).as("p"),
        sum(col("neg")).as("nn"))
      .select(
        col("p").cast(LongType).as("pos_n"),
        col("nn").cast(LongType).as("neg_n"),
        // internals ACCUMULATE in decimal(38,0) (long pair products wrap at
        // ~4×10⁷ balanced rows); the n²-scale REPORT columns project to
        // DOUBLE — the faster-than-corpus-magnitude rule (m29 det / sim11
        // dot / spearmanRho): auc_den = 2·p·nn would overflow an int64
        // projection past ~2.1×10⁹ rows per class (an ANSI throw), while
        // decimal→double of the same exact integer is correctly rounded
        // identically in both gate lanes (parquet→pyarrow vs
        // DuckDB→pandas both render float64) — bit-stable at any SF.
        (col("conc") * 2 + col("ties")).cast(DoubleType).as("auc_num"),
        (col("p").cast(DecimalType(38, 0)) * col("nn") * 2)
          .cast(DoubleType).as("auc_den"),
        when(col("p") === 0 || col("nn") === 0, lit(null).cast(LongType))
          .otherwise(expr(
            "(conc * 2 + ties) * 10000 div (cast(p as decimal(38,0)) * nn * 2)"))
          .as("auc_bp"))
  }

  /** Pearson chi-square contingency over `aCol` × `bCol`: the full grid
    * (cartesian of observed margins) with per-cell observed count,
    * expected count in milli-units, and chi-square contribution in
    * centi-units. Margins are tiny aggregates, so the grid build is a
    * broadcast nested-loop over two broadcast sides — never a shuffle.
    */
  def chi2Contingency(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val rowT = obs.groupBy(col("a")).agg(sum(col("obs")).as("rt"))
    val colT = obs.groupBy(col("b")).agg(sum(col("obs")).as("ct"))
    val tot  = obs.agg(sum(col("obs")).as("n"))
    rowT.crossJoin(broadcast(colT))
      .join(obs, Seq("a", "b"), "left")
      .na.fill(0L, Seq("obs"))
      .crossJoin(broadcast(tot))
      .select(
        // operands widen to decimal BEFORE any product: rt·ct and obs·n in
        // long overflow around 10⁸–3×10⁹ total rows with concentrated
        // margins — the decimal(38,0) guard must cover the inner products,
        // not just the squaring (the oracle computes these in HUGEINT).
        col("a"), col("b"), col("obs").cast(LongType).as("obs"),
        expr("cast(rt as decimal(38,0)) * ct * 1000 div n").as("exp_milli"),
        expr(
          """cast((cast(obs as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct)
            |     * (cast(obs as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct) * 100
            |  div (cast(n as decimal(38,0)) * rt * ct) as bigint)""".stripMargin)
          .as("chi2_cbp"))
      .orderBy(col("a"), col("b"))
  }

  /** Confusion-matrix threshold sweep: for each candidate decision threshold
    * t (predict positive iff score ≥ t), the full confusion counts plus
    * precision/recall/F1 in integer basis points. The input is first reduced
    * to per-score-value (pos, neg) counts — the same bounded-key-space move
    * as [[rankAuc]] — so the sweep joins a BOUNDED frame against a
    * literal threshold list instead of rescanning the corpus per threshold:
    * one shuffle total, k output rows, any number of thresholds.
    */
  def thresholdMetrics(
      df: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Long]): DataFrame = {
    val perScore = df
      .groupBy(col(scoreCol).cast(LongType).as("s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val th = df.sparkSession
      .createDataFrame(df.sparkSession.sparkContext
        .parallelize(thresholds.map(Tuple1(_)), 1))
      .toDF("threshold")
    perScore.crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("s") >= col("threshold"), col("pos")).otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("threshold"), col("neg")).otherwise(0L)).as("fp"),
        sum(when(col("s") < col("threshold"), col("pos")).otherwise(0L)).as("fn"),
        sum(when(col("s") < col("threshold"), col("neg")).otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        // integer-division bp metrics; degenerate denominators → NULL on
        // both engines (DuckDB's // throws on 0, so the CASE is load-bearing)
        expr("case when tp + fp = 0 then null else tp * 10000 div (tp + fp) end")
          .as("precision_bp"),
        expr("case when tp + fn = 0 then null else tp * 10000 div (tp + fn) end")
          .as("recall_bp"),
        expr("case when 2*tp + fp + fn = 0 then null " +
          "else 2 * tp * 10000 div (2*tp + fp + fn) end").as("f1_bp"))
      .orderBy(col("threshold"))
  }

  /** Per-group exact ROC AUC — [[rankAuc]] segmented by `groupCol` (one AUC
    * per market segment / data source / model slice — the sliced-eval shape
    * a fairness or drift report needs). Same Mann–Whitney pair counting,
    * but the exclusive negative prefix sum runs as a window PARTITIONED by
    * the group: with many groups the work distributes per key (the global
    * operator needs the two-pass [[PrefixSum]] precisely because it has no
    * such key), and the window's input is already reduced to per-(group,
    * score) counts, so each partition holds distinct score values, not raw
    * rows. Degenerate single-class groups → NULL auc_bp.
    */
  def groupedRankAuc(
      df: DataFrame, groupCol: String, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = df
      .groupBy(col(groupCol).as("g"), col(scoreCol).as("s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("cum_neg", coalesce(sum(col("neg")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(
        sum(col("pos").cast(DecimalType(38, 0)) * col("cum_neg")).as("conc"),
        sum(col("pos").cast(DecimalType(38, 0)) * col("neg")).as("ties"),
        sum(col("pos")).as("p"),
        sum(col("neg")).as("nn"))
      .select(
        col("g").as(groupCol),
        col("p").cast(LongType).as("pos_n"),
        col("nn").cast(LongType).as("neg_n"),
        // n²-scale report columns project to DOUBLE — see [[rankAuc]]
        (col("conc") * 2 + col("ties")).cast(DoubleType).as("auc_num"),
        (col("p").cast(DecimalType(38, 0)) * col("nn") * 2)
          .cast(DoubleType).as("auc_den"),
        when(col("p") === 0 || col("nn") === 0, lit(null).cast(LongType))
          .otherwise(expr(
            "(conc * 2 + ties) * 10000 div (cast(p as decimal(38,0)) * nn * 2)"))
          .as("auc_bp"))
      .orderBy(col(groupCol))
  }

  /** Cohen's kappa: chance-corrected agreement between two categorical
    * "raters" (predicted vs actual class, two annotators, a rule vs a
    * model). One output row: n, the diagonal agreement count, the
    * margin-product sum Σₖ rowₖ·colₖ, and
    * `kappa_bp = 10⁴·(n·agree − Σrc) div (n² − Σrc)` — the textbook
    * (pₒ−pₑ)/(1−pₑ) cleared of denominators into one integer rational.
    *
    * All products run in decimal(38,0) (n² overflows long past ~3×10⁹ rows
    * — the [[rankAuc]] lesson); `kappa_bp` assumes non-negative agreement
    * (truncating `div` and floor agree there; a below-chance rater pair is
    * a data bug upstream of this statistic). Constant-rater degenerate
    * input (n² = Σrc) → NULL.
    *
    * Shape: one groupBy on the (a,b) class grid (bounded keys, map-side
    * combine), then margins and scalars from that tiny frame — a single
    * shuffle at any corpus size.
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ct = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val rowT = ct.groupBy(col("a").as("cls")).agg(sum(col("cnt")).as("rn"))
    val colT = ct.groupBy(col("b").as("cls")).agg(sum(col("cnt")).as("cn"))
    val src = rowT.join(colT, Seq("cls"))
      .agg(sum(col("rn").cast(DecimalType(38, 0)) * col("cn")).as("src"))
    val scalars = ct.agg(
      sum(col("cnt")).as("n"),
      sum(when(col("a") === col("b"), col("cnt")).otherwise(0L)).as("agree_n"))
    scalars.crossJoin(broadcast(src))
      .select(
        col("n").cast(LongType).as("n"),
        col("agree_n").cast(LongType).as("agree_n"),
        // long report projection over decimal internals — see [[rankAuc]]
        col("src").cast(LongType).as("margin_prod_sum"),
        expr("""case when cast(n as decimal(38,0)) * n = src then null
               |else (cast(n as decimal(38,0)) * agree_n - src) * 10000
               |     div (cast(n as decimal(38,0)) * n - src) end""".stripMargin)
          .cast(LongType).as("kappa_bp"))
  }

  /** Kendall tau-a and Goodman–Kruskal gamma: exact ordinal association
    * between two (quantized) numeric columns, from concordant/discordant
    * pair counts — the rank-association profile a feature report pairs with
    * [[rankAuc]] (AUC *is* tau against a binary label, rescaled).
    *
    * The corpus first reduces to the (x, y) VALUE GRID with counts — one
    * bounded-key groupBy, map-side combinable — and every pair statistic
    * then comes from the grid's self-join on `x₁ < x₂` (each unordered
    * x-distinct pair counted once): concordant adds c₁·c₂ where y₁ < y₂,
    * discordant where y₁ > y₂; ties (either axis) are neither. The join is
    * G² over grid cells, not n² over rows, so the contract is the same as
    * [[chi2Contingency]]: inputs must be quantized/categorical (bounded
    * distinct values). tau_a_bp divides by the FULL pair count n(n−1)/2
    * (ties dilute), gamma_bp by C+D (ties excluded) — both exact integer
    * rationals in decimal(38,0) (C,D ≈ n²/2 wrap long at ~4×10⁹ rows).
    *
    * 100 TB shape: one shuffle to the grid, then a broadcast nested-loop
    * self-join of a ≤G-row frame — no row-scale pair work anywhere.
    */
  def ordinalAssociation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val grid = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val a = grid.select(col("x").as("x1"), col("y").as("y1"), col("c").as("c1"))
    val b = grid.select(col("x").as("x2"), col("y").as("y2"), col("c").as("c2"))
    val pairs = a.join(broadcast(b), col("x1") < col("x2"))
      .agg(
        sum(when(col("y1") < col("y2"),
          col("c1").cast(DecimalType(38, 0)) * col("c2")).otherwise(lit(0L)))
          .cast(DecimalType(38, 0)).as("conc"),
        sum(when(col("y1") > col("y2"),
          col("c1").cast(DecimalType(38, 0)) * col("c2")).otherwise(lit(0L)))
          .cast(DecimalType(38, 0)).as("disc"))
    val n = grid.agg(sum(col("c")).as("n"))
    pairs.crossJoin(broadcast(n))
      .select(
        // long report projection over decimal internals — see [[rankAuc]]
        col("n").cast(LongType).as("n"),
        col("conc").cast(LongType).as("conc"),
        col("disc").cast(LongType).as("disc"),
        // tau-a: den = n(n−1)/2; cleared to (C−D)·2·10⁴ div n(n−1) so the
        // halving never leaves the integers. n < 2 → NULL (no pairs).
        // Negative association is legal here, and truncating `div` (Spark)
        // vs flooring `//` (DuckDB) DIVERGE on negative numerators — so
        // divide magnitudes and reapply the sign, identical on both engines.
        when(col("n") < 2, lit(null).cast(LongType))
          .otherwise(expr(
            """case when conc >= disc then 1 else -1 end
              | * (abs(conc - disc) * 2 * 10000
              |    div (cast(n as decimal(38,0)) * (n - 1)))""".stripMargin))
          .cast(LongType).as("tau_a_bp"),
        when(col("conc") + col("disc") === 0, lit(null).cast(LongType))
          .otherwise(expr(
            """case when conc >= disc then 1 else -1 end
              | * (abs(conc - disc) * 10000 div (conc + disc))""".stripMargin))
          .cast(LongType).as("gamma_bp"))
  }

  /** Poisson bootstrap (Owen & Eckles 2012; the web-scale bootstrap): B
    * resampled replicas of a sum/mean statistic in ONE pass, no per-replica
    * rescan and no shared RNG state — each (row, replica) pair draws its
    * multiplicity w ~ Poisson(1) INDEPENDENTLY from a deterministic hash,
    * which is why this is the bootstrap that distributes: a true multinomial
    * resample needs the global n at draw time; Poisson(1) multiplicities
    * approximate it with per-row independence (total replica mass
    * concentrates at n ± √n).
    *
    * Determinism: w comes from a 32-bit md5-derived uniform (the m24/mx1
    * hash convention, identical in any engine) cut at the Poisson(1) CDF
    * quantized to 2⁻³² — eight literal thresholds, multiplicities capped at
    * 8 (P(X>8|λ=1) ≈ 1.0×10⁻⁵, and the cap is part of the deterministic
    * definition, identically on both engines).
    *
    * Shape at 100 TB: a broadcast ×B fan-out that stays map-side, then ONE
    * partial-aggregating shuffle onto B keys — replica sums combine
    * map-side, so the shuffle moves B rows per input partition regardless
    * of corpus size. Weighted sums widen to decimal(38,0) (the [[rankAuc]]
    * overflow discipline); the replica mean is an exact integer rational
    * in milli-units — assuming a NON-NEGATIVE value column (truncating
    * `div` ≡ flooring `//` there; a signed statistic needs the
    * [[ordinalAssociation]] sign-split form).
    */
  def poissonBootstrap(
      df: DataFrame, idCol: String, valueCol: String, replicas: Int): DataFrame = {
    require(replicas > 0, "poissonBootstrap: replicas must be positive")
    // floor(2^32 · P(X ≤ k)) for X ~ Poisson(1), k = 0..7
    val cdf = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L)
    val reps = df.sparkSession.range(replicas.toLong).select(col("id").as("b"))
    val h = conv(substring(md5(
      concat_ws(":", col(idCol).cast(StringType), col("b").cast(StringType))),
      1, 8), 16, 10).cast(LongType)
    val w = cdf.zipWithIndex.foldRight(lit(8L)) { case ((t, k), rest) =>
      when(h < t, k.toLong).otherwise(rest)
    }
    df.select(col(idCol), col(valueCol).cast(LongType).as("__v"))
      .crossJoin(broadcast(reps))
      .withColumn("__w", w)
      .groupBy(col("b"))
      .agg(
        sum(col("__w")).as("n_eff"),
        sum(col("__w").cast(DecimalType(38, 0)) * col("__v"))
          .cast(DecimalType(38, 0)).as("w_sum"))
      .select(col("b"), col("n_eff").cast(LongType).as("n_eff"),
        // long report projection over decimal internals — see [[rankAuc]]
        col("w_sum").cast(LongType).as("w_sum"),
        when(col("n_eff") === 0, lit(null).cast(LongType))
          .otherwise(expr("w_sum * 1000 div cast(n_eff as decimal(38,0))"))
          .cast(LongType).as("mean_milli"))
      .orderBy(col("b"))
  }

  /** Exact Gini coefficient of a non-negative measure (token mass, revenue,
    * sample weight) — the concentration scalar behind "is 1% of documents
    * carrying 60% of the tokens?", the single-number companion to the
    * cumulative-share curve (q_pareto). For x sorted ascending with ranks
    * i = 1..n: G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) — an exact integer
    * rational once ranks are deterministic, emitted in basis points.
    *
    * Ranks come from the distributed [[PrefixSum]] (no single-partition
    * ROW_NUMBER window); the total order is (value, id), encoded as the
    * integral key v·2³³ + id for the exact equal-width path — callers
    * guarantee v < 2³⁰ and 0 ≤ id < 2³³ (token counts and doc ids here;
    * wider domains pre-bucket v or fall back to a struct key). n and Σx
    * ride out of pass 1 as literals (no extra aggregate job), and the
    * rank-weighted sum is one decimal(38,0) aggregate over the ranked
    * frame. G ≥ 0 by the ascending sort, so truncating `div` ≡ floor.
    */
  def giniCoefficient(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val base = df
      .select(col(idCol).cast(LongType).as("__id"),
        col(valueCol).cast(LongType).as("__v"))
      .withColumn("__k", expr("__v * 8589934592L + __id"))
      .withColumn("__one", lit(1L))
    val (ranked, totals) = PrefixSum.withStartOffsetsAndTotals(
      base, "__k", Seq("__one" -> "__rn0", "__v" -> "__cum_unused"))
    val (n, sumV) = (totals(0), totals(1))
    ranked
      .agg(sum((col("__rn0") + 1).cast(DecimalType(38, 0)) * col("__v"))
        .cast(DecimalType(38, 0)).as("rank_weighted_sum"))
      .select(
        lit(n).as("n"), lit(sumV).as("sum_v"),
        // rank_weighted_sum ~ n·Σx is n²-scale → DOUBLE report column, not
        // long (an int64 projection would ANSI-throw past ~2.1×10⁹
        // row-weighted units) — see [[rankAuc]]
        col("rank_weighted_sum").cast(DoubleType).as("rank_weighted_sum"),
        (if (n == 0 || sumV == 0) lit(null).cast(LongType)
         else expr(
           s"""(rank_weighted_sum * 2 - (cast(${n}L as decimal(38,0)) + 1) * ${sumV}L)
              | * 10000 div (cast(${n}L as decimal(38,0)) * ${sumV}L)""".stripMargin)
           .cast(LongType)).as("gini_bp"))
  }

  /** EXACT two-feature OLS fit (y = b0 + b1·x1 + b2·x2) by normal
    * equations + Cramer's rule — the distributed closed-form regression:
    * ONE map-combinable aggregate scan produces the 9 moment sums (n, Σx1,
    * Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y), and the coefficients are
    * scalar 3×3 determinant ratios over those sums — no gradient loop, no
    * per-row second pass, no driver-side matrix library. This is the fit a
    * feature report can afford at 100 TB: same cost as any corpus sum.
    *
    * All determinant arithmetic runs in decimal(38,0) over integer-valued
    * inputs (the oracle mirrors in HUGEINT); with small-integer features
    * (|x| ≤ ~10²) and a cents-scale target, triple products stay inside
    * 38 digits to ~10⁸ rows — past that, pre-center/rescale the moments.
    * Coefficients emit as exact integer rationals in MICRO-units with the
    * sign-split division ([[ordinalAssociation]] — coefficients are
    * signed, and truncate-vs-floor only agree on non-negative operands).
    * A singular moment matrix (det = 0: collinear or constant features)
    * yields NULL coefficients instead of a divide throw.
    */
  def olsNormalEq2(
      df: DataFrame, x1Col: String, x2Col: String, yCol: String): DataFrame =
    olsNormalEq2Impl(df, x1Col, x2Col, yCol, groupCols = Nil)

  /** Per-GROUP [[olsNormalEq2]] — one fit per segment (source, symbol,
    * market) from the SAME single moment scan, now keyed: the groupBy is
    * map-side combinable (9 sums per group), so fitting 10⁶ segments
    * costs one shuffle of 9-number rows — the per-segment elasticity
    * report no gradient-based fit could afford at that fan-out.
    */
  def groupedOlsNormalEq2(
      df: DataFrame, groupCol: String,
      x1Col: String, x2Col: String, yCol: String): DataFrame =
    olsNormalEq2Impl(df, x1Col, x2Col, yCol, groupCols = Seq(groupCol))
      .orderBy(col(groupCol))

  private def olsNormalEq2Impl(
      df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      groupCols: Seq[String]): DataFrame = {
    val D = DecimalType(38, 0)
    val (x1, x2, y) =
      (col(x1Col).cast(D), col(x2Col).cast(D), col(yCol).cast(D))
    val aggs = Seq(
      count(lit(1)).cast(D).as("n"),
      sum(x1).cast(D).as("s1"), sum(x2).cast(D).as("s2"),
      sum(y).cast(D).as("sy"),
      sum(x1 * x1).cast(D).as("s11"), sum(x1 * x2).cast(D).as("s12"),
      sum(x2 * x2).cast(D).as("s22"),
      sum(x1 * y).cast(D).as("s1y"), sum(x2 * y).cast(D).as("s2y"))
    val m =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // Cramer over A = [[n,S1,S2],[S1,S11,S12],[S2,S12,S22]], b = (Sy,S1y,S2y)
    val withDets = m.select(col("*"),
      expr("""n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
             |  + s2 * (s1 * s12 - s11 * s2)""".stripMargin).as("det"),
      expr("""sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
             |  + s2 * (s1y * s12 - s11 * s2y)""".stripMargin).as("det0"),
      expr("""n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2)
             |  + s2 * (s1 * s2y - s1y * s2)""".stripMargin).as("det1"),
      expr("""n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s2 * s1y)
             |  + sy * (s1 * s12 - s11 * s2)""".stripMargin).as("det2"))
    def coef(dn: String) =
      when(col("det") === 0, lit(null).cast(LongType))
        .otherwise(expr(
          s"""case when ($dn >= 0) = (det >= 0) then 1 else -1 end
             | * (abs($dn) * 1000000 div abs(det))""".stripMargin))
        .cast(LongType).as(s"b${dn.drop(3)}_micro")
    withDets.select(
      groupCols.map(col) ++ Seq(
        col("n").cast(LongType).as("n"),
        // det is n³-scale (3.8×10²⁰ already at 6×10⁵ rows) — the one report
        // column here that cannot ride int64. DOUBLE is the lane-safe type
        // past 2⁶³: both gate lanes render float64, and decimal→double
        // (Spark) and HUGEINT→double (DuckDB) are both correctly rounded,
        // so the bits match. The coefficient rationals below still divide
        // the EXACT decimal det.
        col("det").cast(DoubleType).as("det"),
        coef("det0"), coef("det1"), coef("det2")): _*)
  }

  /** Reliability-diagram calibration bins: fixed-width score bins (width
    * `binWidth`, top bin open-ended at `nBins-1`), per bin the sample count,
    * positive count, exact integer score sum, and the two integer-division
    * rates a calibration check compares: observed positive rate vs mean
    * score, both in basis points of `fullScale`. One bounded aggregate —
    * the 100 TB plan is a single map-side-combinable groupBy on ≤nBins keys.
    */
  def calibrationBins(
      df: DataFrame, scoreCol: String, labelCol: String,
      binWidth: Long, nBins: Int, fullScale: Long): DataFrame =
    df.select(
        col(scoreCol).cast(LongType).as("s"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      // integer floor-div binning (a float divide here would round-trip
      // through double and diverge from the oracle's // at bin edges)
      .withColumn("bin",
        least(expr(s"s div ${binWidth}L"), lit(nBins - 1L)).cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("s")).as("score_sum"))
      .select(col("bin"), col("n"), col("pos"), col("score_sum"),
        expr("pos * 10000 div n").as("pos_rate_bp"),
        expr(s"score_sum * 10000 div (n * ${fullScale}L)").as("mean_score_bp"))
      .orderBy(col("bin"))

  /** Brier score with Murphy's decomposition (Murphy 1973, public
    * literature): reliability − resolution + uncertainty over pre-binned
    * probability forecasts, every statistic in exact truncating integer
    * arithmetic. `pBp` is the forecast probability in basis points
    * (0..10⁴), `y` the 0/1 outcome, `bin` the forecast bin (the
    * [[calibrationBins]] binning contract). With per-bin
    * n_k / o_k = Σy / a_k = Σp_bp and grand totals N, P:
    *
    *   brier_ppm = 10⁶·Σ(p_bp − 10⁴y)²               div (10⁸·N)
    *   rel_ppm   = [Σ_k 10⁶·(a_k − 10⁴·o_k)²  div (10⁸·n_k)]   div N
    *   res_ppm   = [Σ_k 10⁶·(o_k·N − P·n_k)²  div (n_k·N²)]    div N
    *   unc_ppm   = 10⁶·P·(N−P) div N²
    *
    * Each div runs in the same order in both engines, so the four
    * outputs are bit-exact. NOTE the classic identity
    * brier = rel − res + unc is exact only when the forecast is
    * CONSTANT within each bin (bins = distinct forecast values); under
    * fixed-width binning the residual is the within-bin
    * variance/covariance term of the generalized (Stephenson et al.)
    * decomposition — rel/res remain the standard reliability-diagram
    * summaries either way. All sums/products in
    * decimal(38,0): (o_k·N)² needs ~4·log₁₀N digits, so the exact range
    * is N ≲ 10⁸ rows — shard or rescale beyond (documented bound, same
    * discipline as spearmanRho). One grouped aggregate over rows, one
    * bounded bin-level pass, one single-row broadcast.
    */
  def brierDecomposition(
      df: DataFrame, pBp: Column, y: Column, bin: Column): DataFrame = {
    val D = DecimalType(38, 0)
    val k = df.select(bin.cast(LongType).as("bin"), pBp.cast(LongType).as("p"),
        y.cast(LongType).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("nk"), sum(col("y")).as("ok"), sum(col("p")).as("ak"),
        sum((col("p") - lit(10000L) * col("y")).cast(D)
          * (col("p") - lit(10000L) * col("y"))).as("sqk"))
    val t = k.agg(sum(col("nk")).as("n"), sum(col("ok")).as("pos"),
      sum(col("sqk")).as("sq"))
    val terms = k.crossJoin(broadcast(t))
      .select(
        expr("(cast(ak as decimal(38,0)) - cast(10000 as decimal(38,0)) * ok)")
          .as("dk"),
        expr("cast(ok as decimal(38,0)) * n - cast(pos as decimal(38,0)) * nk")
          .as("ek"),
        col("nk"), col("n"))
      .agg(
        sum(expr("dk * dk * 1000000 div (cast(100000000 as decimal(38,0)) * nk)"))
          .as("rel_num"),
        sum(expr("ek * ek * 1000000 div (cast(nk as decimal(38,0)) * n * n)"))
          .as("res_num"))
    t.crossJoin(broadcast(terms))
      .select(col("n"), col("pos"),
        expr("sq * 1000000 div (cast(100000000 as decimal(38,0)) * n)")
          .cast(LongType).as("brier_ppm"),
        expr("rel_num div cast(n as decimal(38,0))").cast(LongType).as("rel_ppm"),
        expr("res_num div cast(n as decimal(38,0))").cast(LongType).as("res_ppm"),
        expr("cast(pos as decimal(38,0)) * (n - pos) * 1000000" +
          " div (cast(n as decimal(38,0)) * n)").cast(LongType).as("unc_ppm"))
  }

  /** Wilcoxon signed-rank test — the PAIRED companion to [[mannWhitneyU]]
    * (public literature: Wilcoxon 1945): given per-pair integer
    * differences d (QUANTIZED by the caller — same bounded-value-grid
    * contract as spearmanRho/mannWhitneyU, so ranking never touches a
    * row-scale window), zero differences drop (the standard convention),
    * |d| midranks come from the value grid with doubled ranks keeping
    * .5 midranks integral, W⁺ = Σ ranks of positive d, and the
    * tie-corrected normal approximation
    *
    *   z = (W⁺ − n(n+1)/4) / sqrt( n(n+1)(2n+1)/24 − Σ(c³−c)/48 )
    *
    * is emitted in half-up-rounded basis points through a PINNED IEEE op
    * order (cast num → ·10⁴ → / (2·sqrt(var_num/48)) → +0.5 → floor), so
    * the integer output is bit-exact cross-engine. Everything before the
    * final doubles is exact decimal(38,0).
    */
  def wilcoxonSignedRank(df: DataFrame, dCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val nz = df.select(col(dCol).cast(LongType).as("d")).filter(col("d") =!= 0L)
    val grid = nz.groupBy(abs(col("d")).as("a"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("cpos"))
    val w = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grid.withColumn("r2",
      coalesce(sum(col("c")).over(w), lit(0L)) * 2 + col("c") + 1)
    ranked.agg(
        sum(col("c")).cast(D).as("n"),
        sum(col("cpos").cast(D) * col("r2")).cast(D).as("wp2"),
        sum(col("c").cast(D) * col("c") * col("c") - col("c")).cast(D).as("tie_sum"))
      .select(
        col("n").cast(LongType).as("n_pairs"),
        col("wp2").cast(LongType).as("w_plus_x2"),
        col("tie_sum").cast(LongType).as("tie_sum"),
        // num = wp2 − n(n+1)/2 (doubled centering; n(n+1) is even → exact)
        (col("wp2") - expr("n * (n + 1) div 2")).cast(D).as("num"),
        (lit(2).cast(D) * col("n") * (col("n") + 1) * (lit(2).cast(D) * col("n") + 1)
          - col("tie_sum")).cast(D).as("var_num"))
      .withColumn("z_bp",
        when(col("var_num") <= 0, lit(null).cast(LongType))
          .otherwise(
            floor(col("num").cast(DoubleType) * 10000.0
              / (lit(2.0) * sqrt(col("var_num").cast(DoubleType) / 48.0)) + 0.5)
              .cast(LongType)))
      .select("n_pairs", "w_plus_x2", "tie_sum", "z_bp")
  }

  /** Spearman rank correlation with average ("midrank") tie handling —
    * Pearson over ranks, the monotone-association sibling of
    * [[ordinalAssociation]] (tau counts pair inversions; rho weights them by
    * rank distance). Same quantized-input contract as the other grid
    * statistics: the corpus first reduces to per-axis VALUE GRIDS with
    * counts (two bounded-key groupBys, map-side combinable), so ranks never
    * touch a row-scale window — each distinct value's doubled midrank is
    * 2·(cumulative count of smaller values) + own count + 1, one running
    * sum over the ≤G-row grid (doubling keeps .5 midranks integral).
    * Ranks broadcast-join back onto the (x, y) cell grid, and the five
    * moment sums come from ONE decimal(38,0) aggregate over it.
    *
    * Output: num = n·Sxy − Sx·Sy and the two variance terms var_x, var_y
    * as DOUBLE report columns (the doubled midranks scale with ROW count,
    * so var ~ n³ and num ~ n⁴ — n²-or-faster magnitudes must emit as
    * double, never int64: a long projection would ANSI-throw around
    * ~5·10⁴ distinct-valued rows), plus rho_bp derived from those doubles.
    * Every double step is cross-engine deterministic: both engines cast
    * the SAME exact decimals with round-to-nearest, and IEEE sqrt/divide
    * on identical doubles are identical — no order-dependent float
    * accumulation anywhere, so the output hash-compares exactly at any
    * scale even where the double rounds past 2⁵³. Degenerate axes
    * (constant x or y → var = 0) yield NULL rho_bp.
    *
    * 100 TB shape: two grid groupBys + two broadcast joins + one aggregate;
    * the decimal(38,0) INTERNAL moments hold exactly to ~10⁸ rows at
    * doubled-rank magnitudes (past that, pre-bucket the axes — the same
    * note as [[ordinalAssociation]]).
    */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val grid = df.groupBy(col(xCol).cast(LongType).as("x"),
        col(yCol).cast(LongType).as("y"))
      .agg(count(lit(1)).as("c"))
    def axisRanks(axis: String) = {
      import org.apache.spark.sql.expressions.Window
      // grid-sized running sum: bounded rows by the quantized-input
      // contract, so the unpartitioned window is a ≤G-row sort, not a
      // corpus-scale one (same stance as ordinalAssociation's G² loop)
      val w = Window.orderBy(axis).rowsBetween(Window.unboundedPreceding, -1)
      grid.groupBy(col(axis)).agg(sum(col("c")).as("cc"))
        .withColumn("r2",
          coalesce(sum(col("cc")).over(w), lit(0L)) * 2 + col("cc") + 1)
        .select(col(axis), col("r2").as(s"r2$axis"))
    }
    val joined = grid
      .join(broadcast(axisRanks("x")), "x")
      .join(broadcast(axisRanks("y")), "y")
    joined.agg(
        sum(col("c")).cast(D).as("n"),
        sum(col("c").cast(D) * col("r2x")).cast(D).as("sx"),
        sum(col("c").cast(D) * col("r2y")).cast(D).as("sy"),
        sum(col("c").cast(D) * col("r2x") * col("r2x")).cast(D).as("sxx"),
        sum(col("c").cast(D) * col("r2y") * col("r2y")).cast(D).as("syy"),
        sum(col("c").cast(D) * col("r2x") * col("r2y")).cast(D).as("sxy"))
      .select(
        // num/var_x/var_y are DOUBLE report columns, not long: the doubled
        // midranks scale with ROW count (r2 ≤ 2n), so var ~ n·(2n)² ~ n³ —
        // a LongType projection would ANSI-throw around ~5·10⁴ distinct-
        // valued rows. DOUBLE is the faster-than-corpus-magnitude rule
        // (the m29 det / sim11 dot discipline): both gate lanes render
        // float64, and decimal→double of the same exact integer is
        // correctly rounded identically on any engine — bit-stable at any
        // SF, and rho_bp below consumes the SAME doubles either way.
        col("n").cast(LongType).as("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType).as("var_x"),
        (col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType).as("var_y"))
      .withColumn("rho_bp",
        when(col("var_x") === 0.0 || col("var_y") === 0.0, lit(null).cast(LongType))
          .otherwise(
            // floor(x + 0.5): explicit half-up rounding, identical on any
            // engine (a bare floor truncates the 9999.999… that float sqrt
            // leaves at exact ±1 down to 9999)
            floor(col("num") * 10000.0
              / sqrt(col("var_x"))
              / sqrt(col("var_y")) + 0.5).cast(LongType)))
  }

  /** McNemar's test for paired classifiers: do models a and b disagree
    * symmetrically on the SAME rows? Only the discordant cells matter —
    * b01 = a right / b wrong, b10 = a wrong / b right — and the
    * continuity-corrected statistic is (|b01−b10|−1)² / (b01+b10), emitted
    * as an exact integer rational in basis points (widened to decimal(38,0)
    * before the square — the [[rankAuc]] overflow discipline). No
    * discordant rows → NULL (the test is undefined, not zero). One
    * map-side-combinable aggregate over boolean flags; nothing about the
    * shape changes at 100 TB.
    */
  def mcnemar(
      df: DataFrame, truthCol: String, aCol: String, bCol: String): DataFrame = {
    val aOk = col(aCol) === col(truthCol)
    val bOk = col(bCol) === col(truthCol)
    df.agg(
        count(lit(1)).as("n"),
        sum(when(aOk && !bOk, 1L).otherwise(0L)).as("b01"),
        sum(when(!aOk && bOk, 1L).otherwise(0L)).as("b10"))
      .select(col("n"), col("b01"), col("b10"),
        when(col("b01") + col("b10") === 0, lit(null).cast(LongType))
          .otherwise(expr(
            """(abs(cast(b01 as decimal(38,0)) - b10) - 1)
              | * (abs(cast(b01 as decimal(38,0)) - b10) - 1)
              | * 10000 div (cast(b01 as decimal(38,0)) + b10)""".stripMargin)
            .cast(LongType)).as("chi2_cc_bp"))
  }

  /** Per-group distribution moments: n, mean (exact centi-units), and the
    * shape diagnostics — sample skewness g₁ = (√n·M₃)/M₂^1.5 and excess
    * kurtosis g₂ = M₄/M₂² − 3 — every power sum Σv, Σv², Σv³, Σv⁴
    * accumulated EXACTLY in decimal(38,0) (the m21 discipline). The
    * binding magnitude bound is the S₁⁴ / n³S₄ terms: quantize v so that
    * `(n·max|v|)⁴ < 10³⁸`, i.e. n·max|v| ≲ 3·10⁹ per group — whole units
    * rather than cents at corpus scale (document the quantization at the
    * call site; ANSI throws past the bound rather than wrapping), central
    * moments derived by the standard power-sum identities still in exact
    * decimals, and only the final ratios passing through double in a
    * pinned op order to milli-units. Degenerate groups (n < 2 or zero
    * variance) yield NULL shape stats. One map-side-combinable aggregate —
    * the 100 TB plan is a single scan.
    *
    * Identities used (all exact): n²·M₂ = n·S₂ − S₁²,
    * n³·M₃ = n²·S₃ − 3n·S₁S₂ + 2S₁³,
    * n⁴·M₄ = n³·S₄ − 4n²·S₁S₃ + 6n·S₁²S₂ − 3S₁⁴; the normalizer powers
    * fold into the final double ratio.
    */
  def momentsByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val v = col(valueCol).cast(LongType)
    df.select(col(groupCol).as("g"), v.as("v"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).cast(D).as("s1"),
        sum(col("v").cast(D) * col("v")).cast(D).as("s2"),
        sum(col("v").cast(D) * col("v") * col("v")).cast(D).as("s3"),
        sum(col("v").cast(D) * col("v") * col("v") * col("v")).cast(D).as("s4"))
      .select(col("g"), col("n"),
        expr("s1 * 100 div n").cast(LongType).as("mean_centi"),
        expr("cast(n as decimal(38,0)) * s2 - s1 * s1").cast(D).as("m2_n2"),
        expr("""cast(n as decimal(38,0)) * n * s3
               | - 3 * cast(n as decimal(38,0)) * s1 * s2
               | + 2 * s1 * s1 * s1""".stripMargin).cast(D).as("m3_n3"),
        expr("""cast(n as decimal(38,0)) * n * n * s4
               | - 4 * cast(n as decimal(38,0)) * n * s1 * s3
               | + 6 * cast(n as decimal(38,0)) * s1 * s1 * s2
               | - 3 * s1 * s1 * s1 * s1""".stripMargin).cast(D).as("m4_n4"))
      .select(col("g"), col("n"), col("mean_centi"),
        // population g₁ = M₃/M₂^1.5: the n-powers cancel exactly
        // (n³ against (n²)^1.5), so the ratio is m3_n3 / m2_n2^1.5.
        // x^1.5 is computed as x·√x — multiply and sqrt are both correctly
        // rounded IEEE ops, where pow(x, 1.5) is NOT and differs by ulps
        // across libm implementations (the tx9 ln() rule, applied to pow).
        when(col("n") < 2 || col("m2_n2") <= 0, lit(null).cast(LongType))
          .otherwise(floor(
            col("m3_n3").cast(DoubleType)
              / (col("m2_n2").cast(DoubleType) * sqrt(col("m2_n2").cast(DoubleType)))
              * 1000.0 + 0.5).cast(LongType)).as("skew_milli"),
        // population excess g₂ = M₄/M₂² − 3: n-powers cancel likewise
        when(col("n") < 2 || col("m2_n2") <= 0, lit(null).cast(LongType))
          .otherwise(floor(
            (col("m4_n4").cast(DoubleType)
              / (col("m2_n2").cast(DoubleType) * col("m2_n2").cast(DoubleType))
              - 3.0) * 1000.0 + 0.5).cast(LongType)).as("kurt_milli"))
  }

  /** Wald–Wolfowitz runs test — is a sequence's above/below-median pattern
    * RANDOM, or does it trend/oscillate? The classic regime-shift screen
    * for a monitored series (daily revenue, error rates): too few runs =
    * sticky trends, too many = oscillation. Values equal to the median
    * drop (the standard convention); the median itself is the exact
    * nearest-rank pick from the value grid. Exact outputs `n1`, `n2`
    * (above/below counts) and `runs`; `z_milli` is the normal
    * approximation `(R − μ)/σ` (μ = 2n₁n₂/n + 1,
    * σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n − 1))) derived from exact integers
    * through a pinned double op order. Either side empty or n < 2 → NULL z.
    *
    * The run counting is one lag window over the ORDERED kept sequence —
    * single-series, so the window is as bounded as the series itself (the
    * docs/SCALE.md single-series stance: a calendar-bounded grid, not
    * corpus-scale); with a partitioned variant the same window distributes
    * per key.
    */
  def runsTest(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(orderCol).as("o"), col(valueCol).cast(LongType).as("v"))
    val grid = v.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val med = grid
      .withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(grid.agg(sum(col("c")).as("nn"))))
      .filter(col("cum") >= expr("(nn + 1) div 2"))
      .agg(min(col("v")).as("med"))
    val kept = v.crossJoin(broadcast(med)).filter(col("v") =!= col("med"))
      .withColumn("s", col("v") > col("med"))
    val wOrd = Window.orderBy("o")
    val marked = kept.withColumn("chg",
      when(lag(col("s"), 1).over(wOrd).isNull, 1L)
        .when(lag(col("s"), 1).over(wOrd) =!= col("s"), 1L).otherwise(0L))
    marked.agg(
        sum(when(col("s"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("s"), 1L).otherwise(0L)).as("n2"),
        sum(col("chg")).as("runs"))
      .select(col("n1"), col("n2"), col("runs"),
        when(col("n1") === 0 || col("n2") === 0 || col("n1") + col("n2") < 2,
            lit(null).cast(LongType))
          .otherwise(floor(
            expr("cast(runs * (n1 + n2) - 2 * n1 * n2 - (n1 + n2) as double)")
              / expr("cast(n1 + n2 as double)")
              / sqrt(
                expr("cast(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) as double)")
                / expr("cast((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) as double)"))
            * 1000.0 + 0.5).cast(LongType)).as("z_milli"))
  }

  /** Welch's unequal-variance t-test — the parametric companion to
    * [[mannWhitneyU]] on the same two-sample framing: does group 1's MEAN
    * value differ from group 0's?
    * `t = (m̄₁ − m̄₂) / √(s₁²/n₁ + s₂²/n₂)` with the Welch–Satterthwaite
    * degrees of freedom. One map-side-combinable aggregate collects the
    * exact integer moments (n, Σv, Σv² per group, decimal(38,0) — the m21
    * overflow discipline); the t and dof normalizations pass through
    * double in a PINNED op order (every operand is the same exact decimal
    * in both engines; IEEE divide/sqrt on identical doubles are
    * identical), rounded half-up to milli-units. Degenerate inputs
    * (either group < 2 rows, or both sample variances zero) yield NULL
    * t/dof. Nothing about the single-aggregate shape changes at 100 TB.
    */
  def welchT(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val g = when(col(groupCol), 1L).otherwise(0L)
    val v = col(valueCol).cast(LongType)
    val agg = df.select(g.as("g"), v.as("v")).agg(
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("g") === 0, 1L).otherwise(0L)).as("n2"),
      sum(when(col("g") === 1, col("v")).otherwise(0L)).cast(D).as("s1"),
      sum(when(col("g") === 0, col("v")).otherwise(0L)).cast(D).as("s2"),
      sum(when(col("g") === 1, col("v").cast(D) * col("v")).otherwise(lit(0).cast(D)))
        .cast(D).as("q1"),
      sum(when(col("g") === 0, col("v").cast(D) * col("v")).otherwise(lit(0).cast(D)))
        .cast(D).as("q2"))
    // aᵢ = sᵢ²/nᵢ as double, each factor derived from exact decimals with
    // one fixed division order: (nᵢQᵢ − Sᵢ²) / (nᵢ(nᵢ−1)) / nᵢ
    val a1 = expr("cast(n1 * q1 - s1 * s1 as double)") /
      expr("cast(n1 as double) * (n1 - 1)") / expr("cast(n1 as double)")
    val a2 = expr("cast(n2 * q2 - s2 * s2 as double)") /
      expr("cast(n2 as double) * (n2 - 1)") / expr("cast(n2 as double)")
    val dMean = expr("cast(s1 * n2 - s2 * n1 as double)") /
      expr("cast(n1 as double) * n2")
    val se2 = a1 + a2
    val tM = floor(dMean / sqrt(se2) * 1000.0 + 0.5).cast(LongType)
    val dofM = floor(se2 * se2
      / (a1 * a1 / expr("cast(n1 - 1 as double)")
         + a2 * a2 / expr("cast(n2 - 1 as double)")) * 1000.0 + 0.5)
      .cast(LongType)
    val degenerate = col("n1") < 2 || col("n2") < 2 ||
      (expr("n1 * q1 - s1 * s1") === 0 && expr("n2 * q2 - s2 * s2") === 0)
    agg.select(
      col("n1"), col("n2"),
      col("s1").cast(LongType).as("sum1"),
      col("s2").cast(LongType).as("sum2"),
      when(degenerate, lit(null).cast(LongType)).otherwise(tM).as("t_milli"),
      when(degenerate, lit(null).cast(LongType)).otherwise(dofM).as("dof_milli"))
  }

  /** Interpolated percentiles (SQL `PERCENTILE_CONT` / pandas
    * `quantile(interpolation='linear')` semantics) per group, as EXACT
    * integers: for percent p over n values, the 0-based position is
    * `p·(n−1)/100`; with `idx100 = p·(n−1)`, `lo = idx100 div 100` and
    * fractional part `fn = idx100 mod 100`, the result is
    * `v[lo]·100 + (v[lo+1] − v[lo])·fn` — the linear interpolation scaled
    * ×100 ("centi-units") so it stays integral, no float division anywhere.
    * The companion to the nearest-rank q_percentile_report: THIS is what
    * pandas/NumPy report by default, so parity matters for anyone porting
    * quantile-based quality gates.
    *
    * Same bounded-value-grid shape as the rank report: one grid groupBy,
    * one per-group cumulative window over ≤G rows, then conditional MINs
    * pick v[lo] and v[lo+1] for every requested p in one aggregate — the
    * percentile list multiplies expressions, not passes. Groups with a
    * single value interpolate to themselves (v[lo+1] falls back to v[lo]).
    */
  def percentileCont(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 100))
    val grid = df.select(col(groupCol).as("g"), col(valueCol).cast(LongType).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("g")
    val cumd = grid
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val pCols = ps.flatMap { p =>
      val idx100 = expr(s"$p * (n - 1)")
      val lo = expr(s"$p * (n - 1) div 100")
      val fn = idx100 - lo * 100
      val vlo = min(when(col("cum") >= lo + 1, col("v")))
      val vhi = min(when(col("cum") >= lo + 2, col("v")))
      // fn is group-constant (derives from n); max() carries it through agg
      Seq((vlo * 100 + (coalesce(vhi, vlo) - vlo) * max(fn)).as(s"p${p}_centi"))
    }
    // idx100/lo/fn are per-row constants within a group (n is), so the
    // conditional mins see consistent thresholds; max() collapses them
    val aggd = cumd.groupBy(col("g"))
      .agg(max(col("n")).as("n"), pCols: _*)
    aggd.select(col("g") +: col("n") +: ps.map(p => col(s"p${p}_centi")): _*)
  }

  /** Per-group Tukey boxplot (five-number summary + 1.5·IQR fences +
    * outlier counts — Tukey, "Exploratory Data Analysis", 1977; public
    * literature): the profiling operator behind every box-and-whisker
    * readout. Quartiles come from [[percentileCont]] (PERCENTILE_CONT
    * parity in exact integer centi-units); the fences stay exact by
    * carrying DOUBLED centi-units (1.5·IQR = 3·IQR/2 needs no division
    * when everything else is ×2 — the m33 u1_x2 convention):
    *
    *   lo_x2 = 2·q1 − 3·IQR,  hi_x2 = 2·q3 + 3·IQR,
    *   outlier ⇔ 200·v < lo_x2  (resp. >)
    *
    * Plan: the quartile pass (grid aggregate + bounded-grid windows),
    * then the |groups|-row fence table re-enters as a BROADCAST join
    * against the raw values for the outlier counts — one more scan, no
    * second shuffle of the data. Everything integer-exact.
    */
  def boxplot(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val vals = df.select(col(groupCol).as("g"), col(valueCol).cast(LongType).as("v"))
    val fences = percentileCont(vals, "g", "v", Seq(25, 50, 75))
      .withColumn("iqr_centi", col("p75_centi") - col("p25_centi"))
      .withColumn("lo_fence_centi_x2", col("p25_centi") * 2 - col("iqr_centi") * 3)
      .withColumn("hi_fence_centi_x2", col("p75_centi") * 2 + col("iqr_centi") * 3)
    vals.join(broadcast(fences), "g")
      .groupBy(col("g"))
      .agg(
        max(col("n")).as("n"),
        max(col("p25_centi")).as("p25_centi"),
        max(col("p50_centi")).as("p50_centi"),
        max(col("p75_centi")).as("p75_centi"),
        max(col("iqr_centi")).as("iqr_centi"),
        max(col("lo_fence_centi_x2")).as("lo_fence_centi_x2"),
        max(col("hi_fence_centi_x2")).as("hi_fence_centi_x2"),
        sum(when(col("v") * 200 < col("lo_fence_centi_x2"), 1L).otherwise(0L))
          .as("n_low_outliers"),
        sum(when(col("v") * 200 > col("hi_fence_centi_x2"), 1L).otherwise(0L))
          .as("n_high_outliers"))
  }

  /** Cramér's V — the [0, 1]-normalized effect size of a two-way
    * contingency association, `V = √(χ² / (n·min(r−1, c−1)))`: the "how
    * strong is this dependence?" companion to [[chi2Contingency]]'s "is
    * there one?". The per-cell χ² contributions come from the SAME exact
    * integer-rational quantization as m16 (centi-bp per cell, HUGEINT/
    * decimal(38,0) inner products), summed to one exact integer; only the
    * final normalization passes through double (identical IEEE
    * divide/sqrt on the same exact inputs in both engines, half-up bp
    * rounding). Degenerate tables (a single row or column level, or an
    * empty frame) yield NULL v_bp. One margins-sized aggregate on top of
    * the broadcast grid — nothing about the shape changes at 100 TB.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = chi2Contingency(df, aCol, bCol)
    cells.agg(
        sum(col("obs")).as("n"),
        countDistinct(col("a")).as("r"),
        countDistinct(col("b")).as("c"),
        sum(col("chi2_cbp")).as("chi2_cbp"))
      .withColumn("dof_min", least(col("r") - 1, col("c") - 1))
      .select(
        col("n"), col("r"), col("c"), col("chi2_cbp"),
        when(col("dof_min") <= 0 || col("n") <= 0, lit(null).cast(LongType))
          .otherwise(
            floor(sqrt(col("chi2_cbp").cast(DoubleType) / lit(100.0)
                / col("n") / col("dof_min")) * 10000.0 + 0.5)
              .cast(LongType)).as("v_bp"))
  }

  /** Gini-impurity information gain per candidate feature — the CART
    * split-quality criterion as a feature-selection screen, and the
    * LOG-FREE stand-in for entropy mutual information (the tx9 ln() rule:
    * ln is not correctly rounded cross-libm, Gini gain is pure rational
    * arithmetic, and both rank features near-identically).
    *
    * For each feature F with values x and label values y:
    *   base  Gini = 1 − Σ_y (n_y/N)²
    *   child Gini = Σ_x (n_x/N)·(1 − Σ_y (n_xy/n_x)²)
    *   gain       = base − child
    * Quantization (documented, identical in both engines): per value x,
    * `purity_ppm_x = (Σ_y n_xy² · 10⁶) div n_x`; per feature,
    * `child_purity_ppm = (Σ_x purity_ppm_x) div N` and
    * `base_purity_ppm = (Σ_y n_y² · 10⁶) div N²` — every step a
    * truncating integer division over decimal(38,0) sums, so the result
    * hash-compares bit-for-bit (exact to ~10¹⁶ rows: n_y²·10⁶ ≤ 10³⁸).
    *
    * 100 TB shape: ONE corpus pass (the stacked explode multiplies rows
    * by |features|, all map-side-combinable into the (feature, value,
    * label) cell grid); everything after is arithmetic over the bounded
    * grid. No joins against the corpus, no windows, no broadcasts of
    * data-sized frames.
    *
    * Output: one row per feature — `feature, n_values, base_gini_ppm,
    * child_gini_ppm, gain_ppm`, ordered by gain desc (feature asc on
    * ties).
    */
  def giniGain(df: DataFrame, features: Seq[(String, Column)],
      label: Column): DataFrame = {
    require(features.nonEmpty, "giniGain: need at least one feature")
    val D = DecimalType(38, 0)
    val stacked = df.select(
        explode(array(features.map { case (n, c) =>
          struct(lit(n).as("feature"), c.cast(StringType).as("v"))
        }: _*)).as("fv"),
        label.cast(StringType).as("y"))
      .select(col("fv.feature").as("feature"), col("fv.v").as("v"), col("y"))
    val cells = stacked.groupBy("feature", "v", "y")
      .agg(count(lit(1)).as("n_xy"))
    val byVal = cells.groupBy("feature", "v")
      .agg(sum(col("n_xy")).as("n_x"),
        sum(col("n_xy").cast(D) * col("n_xy")).as("s_x"))
      .withColumn("purity_ppm_x", expr("s_x * 1000000 div n_x"))
    val perFeature = byVal.groupBy("feature")
      .agg(count(lit(1)).as("n_values"),
        sum(col("purity_ppm_x").cast(D)).as("sp"))
    val lab = cells.groupBy("feature", "y")
      .agg(sum(col("n_xy")).as("n_y"))
      .groupBy("feature")
      .agg(sum(col("n_y").cast(D) * col("n_y")).as("sy2"),
        sum(col("n_y")).as("n"))
    perFeature.join(lab, "feature")
      .select(col("feature"), col("n_values"),
        (lit(1000000L) - expr("sy2 * 1000000 div (cast(n as decimal(38,0)) * n)"))
          .cast(LongType).as("base_gini_ppm"),
        (lit(1000000L) - expr("sp div n")).cast(LongType).as("child_gini_ppm"),
        (expr("sp div n")
          - expr("sy2 * 1000000 div (cast(n as decimal(38,0)) * n)"))
          .cast(LongType).as("gain_ppm"))
      .orderBy(col("gain_ppm").desc, col("feature"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) with average-rank tie handling and
    * normal approximation — the nonparametric two-sample location test
    * (does group 1's value distribution stochastically dominate group 0's?).
    *
    * Same quantized-input contract as [[spearmanRho]]: the corpus reduces
    * to a per-VALUE grid `(v → total count c, group-1 count c1)` in one
    * map-side-combinable groupBy, so ranking never touches a row-scale
    * window — each distinct value's doubled midrank is
    * `2·(cumulative count of smaller values) + c + 1` (doubling keeps .5
    * midranks integral), one running sum over the ≤G-row grid.
    *
    * Output (exact integers, hash-compare bit-for-bit): `n1`, `n2`,
    * `u1_x2` = 2·U₁ = 2·R₁ − n₁(n₁+1), `tie_sum` = Σ(c³−c), and `z_bp` —
    * the tie-corrected z statistic in basis points, derived through double
    * from exact decimals only:
    * `z = (2U₁ − n₁n₂) / (2·√(n₁n₂·((n+1)·n·(n−1) − T) / (12·n·(n−1))))`.
    * Both engines cast the SAME exact decimals with round-to-nearest and
    * IEEE divide/sqrt on identical doubles are identical; `floor(x·10⁴+0.5)`
    * fixes half-up rounding cross-engine. Degenerate inputs (either group
    * empty, or every value tied → zero variance) yield NULL z.
    *
    * 100 TB shape: one grid groupBy + one bounded-grid window + one
    * single-row aggregate; decimal(38,0) holds 2·R₁ ≤ 2n² to ~10¹⁸ rows.
    */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val grid = df.select(
        when(col(groupCol), 1L).otherwise(0L).as("g"),
        col(valueCol).cast(LongType).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"), sum(col("g")).as("c1"))
    // grid-sized running sum (bounded by the quantized-input contract)
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grid.withColumn("r2",
      coalesce(sum(col("c")).over(w), lit(0L)) * 2 + col("c") + 1)
    ranked.agg(
        sum(col("c")).cast(D).as("n"),
        sum(col("c1")).cast(D).as("n1"),
        sum(col("c1").cast(D) * col("r2")).cast(D).as("r1_x2"),
        sum(col("c").cast(D) * col("c") * col("c") - col("c")).cast(D).as("tie_sum"))
      .select(
        col("n1").cast(LongType).as("n1"),
        (col("n") - col("n1")).cast(LongType).as("n2"),
        // long report projection over decimal internals — see [[rankAuc]]
        (col("r1_x2") - col("n1") * (col("n1") + 1)).cast(LongType).as("u1_x2"),
        col("tie_sum").cast(LongType).as("tie_sum"),
        (col("n1") * (col("n") - col("n1"))
          * ((col("n") + 1) * col("n") * (col("n") - 1) - col("tie_sum")))
          .cast(D).as("var_num"),
        (lit(12).cast(D) * col("n") * (col("n") - 1)).cast(D).as("var_den"),
        (col("n1") * (col("n") - col("n1"))).cast(D).as("n1n2"))
      .withColumn("z_bp",
        when(col("var_num") <= 0, lit(null).cast(LongType))
          .otherwise(
            floor((col("u1_x2") - col("n1n2")).cast(DoubleType) * 10000.0
              / (lit(2.0) * sqrt(col("var_num").cast(DoubleType)
                / col("var_den").cast(DoubleType))) + 0.5).cast(LongType)))
      .select("n1", "n2", "u1_x2", "tie_sum", "z_bp")
  }

  /** Friedman test (Friedman 1937; tie handling per Conover,
    * "Practical Nonparametric Statistics" — public literature): do the k
    * treatments rank consistently WITHIN blocks? The repeated-measures
    * member completing the rank-test family (m33 two-sample, m41 paired,
    * m42 k-group, m43 ordered). Input: ONE row per (block, treatment)
    * with an exact integer value; only COMPLETE blocks (all k
    * treatments present) enter, k = `treatments.length`.
    *
    * Within each block the k values take doubled midranks
    * r2 = 2·rank_min + (ties − 1) (integers under ties), and Conover's
    * tie-corrected statistic collapses to a PURE INTEGER RATIONAL in
    * doubled units:
    *
    *   χ²_F = (k−1)·Σ_j (R2_j − n(k+1))² / (Σ_{ij} r2² − n·k·(k+1)²)
    *
    * reported in truncating milli-units — NO floating point anywhere.
    * All-tied-everywhere input zeroes the denominator → NULL.
    *
    * Plan: one (block, treatment) pre-aggregated input, per-block rank
    * windows (partitions of exactly k rows — nothing global), one
    * k-row treatment aggregate, one scalar row. Embarrassingly parallel
    * in blocks at any scale.
    */
  def friedman(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String, treatments: Seq[String]): DataFrame = {
    require(treatments.nonEmpty && treatments.distinct == treatments,
      "friedman: treatments must be a distinct, non-empty literal list")
    val k = treatments.length
    val D = DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(blockCol).as("b"), col(treatmentCol).as("t"),
        col(valueCol).cast(LongType).as("v"))
      .filter(col("t").isin(treatments: _*))
    // complete blocks only: exactly one row per (block, treatment), all k present
    val complete = base.groupBy(col("b"))
      .agg(count(lit(1)).as("__nrows"), countDistinct(col("t")).as("__nt"))
      .filter(col("__nrows") === k && col("__nt") === k)
      .select(col("b"))
    val wb = Window.partitionBy(col("b")).orderBy(col("v"))
    val wv = Window.partitionBy(col("b"), col("v"))
    val ranked = base.join(complete, "b")
      .withColumn("r2", rank().over(wb) * 2 + count(lit(1)).over(wv) - 1)
    val aggCols =
      Seq(expr(s"cast(count(1) div $k as decimal(38,0))").as("n"),
        sum(col("r2").cast(D) * col("r2")).cast(D).as("a2")) ++
      treatments.zipWithIndex.map { case (t, i) =>
        sum(when(col("t") === t, col("r2")).otherwise(0L)).cast(D).as(s"r2_$i") }
    val num = treatments.indices.map { i =>
      val d = col(s"r2_$i") - col("n") * (k + 1)
      d * d
    }.reduce(_ + _)
    ranked.agg(aggCols.head, aggCols.tail: _*)
      .withColumn("__num", (num * (k - 1)).cast(D))
      .withColumn("__den",
        (col("a2") - col("n") * k * (k + 1) * (k + 1)).cast(D))
      .select(Seq(
        col("n").cast(LongType).as("n_blocks")) ++
        treatments.zipWithIndex.map { case (t, i) =>
          col(s"r2_$i").cast(LongType).as(s"r2_$t") } ++
        Seq(when(col("__den") > 0,
          expr("(__num * 1000) div __den").cast(LongType))
          .as("chi2_milli")): _*)
  }

  /** Jonckheere–Terpstra trend test (Jonckheere 1954; Terpstra 1952;
    * variance with ties per Lehmann, "Nonparametrics" — public
    * literature): is there a MONOTONE trend in location across the
    * ordered groups g₁ < g₂ < … < g_k? More powerful than
    * [[kruskalWallis]] when the alternative is ordered. Same bounded
    * value-grid contract (`valueCol` pre-quantized Longs); `groups` is
    * the literal ordered list.
    *
    * J is the sum over group pairs i<j of the Mann–Whitney count
    * #{a<b} + ½#{ties}; doubled (J2) it is exact:
    *
    *   J2 = Σ_v Σ_{i<j} c_j(v)·(2·P_i(v⁻) + c_i(v)),  E2 = Σ_{i<j} nᵢ·nⱼ
    *
    * computed from per-grid-value pivot counts and ONE running-sum
    * window over the grid (P_i = prefix count below v). The tie-corrected
    * null variance is assembled from five exact decimal aggregates
    * (A = N(N−1)(2N+5) − Σnᵢ(nᵢ−1)(2nᵢ+5) − Σt(t−1)(2t+5), B, C, D, E per
    * Lehmann) and only then passes through the pinned IEEE sequence
    *   var = A/72 + B/(36·C) + D/(8·E),  z = (J2−E2)/(2·√var)
    * → half-up basis points. Degenerate variance (all values tied) pins
    * z NULL. Decimal(38,0) holds every product up to ~10¹² rows.
    *
    * Plan: one grid aggregate, one bounded-grid window, one single-row
    * aggregate — the m33/m42 shape; nothing data-sized is global.
    */
  def jonckheereTerpstra(df: DataFrame, groupCol: String, valueCol: String,
      groups: Seq[String]): DataFrame = {
    require(groups.nonEmpty && groups.distinct == groups,
      "jonckheereTerpstra: groups must be a distinct, ordered, non-empty literal list")
    val D = DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val grid = df.select(col(groupCol).as("g"), col(valueCol).cast(LongType).as("v"))
      .filter(col("g").isin(groups: _*))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"),
        groups.zipWithIndex.map { case (grp, i) =>
          sum(when(col("g") === grp, 1L).otherwise(0L)).as(s"c$i")
        }: _*)
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val pre = grid.select(Seq(col("v"), col("c")) ++
      groups.indices.map(i => col(s"c$i")) ++
      groups.indices.map(i =>
        coalesce(sum(col(s"c$i")).over(w), lit(0L)).as(s"p$i")): _*)
    // per-row J2 contribution: all ordered pairs i < j, written order
    val contrib = (for {
      j <- groups.indices; i <- 0 until j
    } yield col(s"c$j").cast(D) * (col(s"p$i") * 2 + col(s"c$i")))
      .reduce(_ + _)
    val aggCols =
      Seq(sum(col("c")).cast(D).as("n"),
        sum(contrib).cast(D).as("j2"),
        sum(col("c").cast(D) * (col("c") - 1) * (col("c") * 2 + 5)).cast(D).as("tv_a"),
        sum(col("c").cast(D) * (col("c") - 1) * (col("c") - 2)).cast(D).as("tv_b"),
        sum(col("c").cast(D) * (col("c") - 1)).cast(D).as("tv_d")) ++
      groups.indices.map(i => sum(col(s"c$i")).cast(D).as(s"n$i"))
    // E2 = Σ_{i<j} nᵢ·nⱼ — the doubled null mean, an exact product sum
    val e2sum = (for { j <- groups.indices; i <- 0 until j }
      yield col(s"n$i") * col(s"n$j")).reduce(_ + _)
    val gA = groups.indices.map(i =>
      col(s"n$i") * (col(s"n$i") - 1) * (col(s"n$i") * 2 + 5)).reduce(_ + _)
    val gB = groups.indices.map(i =>
      col(s"n$i") * (col(s"n$i") - 1) * (col(s"n$i") - 2)).reduce(_ + _)
    val gD = groups.indices.map(i =>
      col(s"n$i") * (col(s"n$i") - 1)).reduce(_ + _)
    pre.agg(aggCols.head, aggCols.tail: _*)
      .withColumn("e2", e2sum.cast(D))
      .withColumn("va", (col("n") * (col("n") - 1) * (col("n") * 2 + 5)
        - gA - col("tv_a")).cast(D))
      .withColumn("vb", (gB * col("tv_b")).cast(D))
      .withColumn("vc", (col("n") * (col("n") - 1) * (col("n") - 2)).cast(D))
      .withColumn("vd", (gD * col("tv_d")).cast(D))
      .withColumn("ve", (col("n") * (col("n") - 1)).cast(D))
      .withColumn("__var",
        col("va").cast(DoubleType) / 72.0
          + col("vb").cast(DoubleType) / (lit(36.0) * col("vc").cast(DoubleType))
          + col("vd").cast(DoubleType) / (lit(8.0) * col("ve").cast(DoubleType)))
      .select(Seq(
        col("n").cast(LongType).as("n"),
        col("j2").cast(LongType).as("j2"),
        col("e2").cast(LongType).as("e2")) ++
        groups.zipWithIndex.map { case (grp, i) =>
          col(s"n$i").cast(LongType).as(s"n_$grp") } ++
        Seq(when(col("__var") > 0.0,
          floor((col("j2") - col("e2")).cast(DoubleType) * 10000.0
            / (lit(2.0) * sqrt(col("__var"))) + 0.5).cast(LongType))
          .as("z_bp")): _*)
  }

  /** Kruskal–Wallis H (Kruskal & Wallis 1952, public literature) — the
    * k-group generalization of [[mannWhitneyU]]: do the groups' value
    * distributions share a location? Same bounded-value-grid contract:
    * `valueCol` must be pre-quantized Longs, midranks come from ONE
    * running sum over the grid (doubled, so they stay integers under
    * ties), and every per-group rank sum is an exact integer.
    *
    * `groups` is the LITERAL group list (alphabetically sorted — the
    * pinned summation order below); rows outside it are dropped. With
    * R2ᵢ = 2·Σranksᵢ exact:
    *
    *   H = 3·T/(N(N+1)) − 3(N+1),  T = Σᵢ R2ᵢ²/nᵢ
    *   H_c = H / (1 − Σ(t³−t)/(N³−N))          (tie correction)
    *
    * Double discipline (the m33 z_bp conventions): T sums its k terms in
    * the WRITTEN group order (left-associative `+` in both engines), each
    * term `double(R2ᵢ)·double(R2ᵢ)/double(nᵢ)` — three correctly-rounded
    * IEEE ops on exact inputs (R2ᵢ < 2⁵³ up to ~10¹² rows/group); H and
    * H_c are fixed scalar IEEE sequences from exact integers; outputs in
    * half-up basis points. All-tied input (tie_sum = N³−N) pins H_c NULL;
    * an empty listed group contributes 0 to T. N³ casts to double
    * exactly below ~2×10¹⁷ rows — far past any per-partition gate, and
    * the exact integer inputs (n, tie_sum, per-group n/R2) ship alongside
    * so a reader can re-derive H at any scale.
    *
    * Plan: one grid aggregate (shuffle on v), one grid-sized running-sum
    * window (bounded by the quantization contract, the m33 shape), one
    * single-row aggregate. Nothing data-sized crosses a window or the
    * driver.
    */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String,
      groups: Seq[String]): DataFrame = {
    require(groups.nonEmpty && groups == groups.sorted &&
      groups.distinct == groups,
      "kruskalWallis: groups must be a sorted, distinct, non-empty literal list")
    val D = DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val grid = df.select(col(groupCol).as("g"), col(valueCol).cast(LongType).as("v"))
      .filter(col("g").isin(groups: _*))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("c"),
        groups.map(grp =>
          sum(when(col("g") === grp, 1L).otherwise(0L)).as(s"c_$grp")): _*)
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grid.withColumn("r2",
      coalesce(sum(col("c")).over(w), lit(0L)) * 2 + col("c") + 1)
    val aggCols =
      Seq(sum(col("c")).cast(D).as("n"),
        sum(col("c").cast(D) * col("c") * col("c") - col("c")).cast(D).as("tie_sum")) ++
      groups.flatMap(grp => Seq(
        sum(col(s"c_$grp")).cast(D).as(s"n_$grp"),
        sum(col(s"c_$grp").cast(D) * col("r2")).cast(D).as(s"r2x2_$grp")))
    val t = groups.map { grp =>
      when(col(s"n_$grp") > 0,
        col(s"r2x2_$grp").cast(DoubleType) * col(s"r2x2_$grp").cast(DoubleType)
          / col(s"n_$grp").cast(DoubleType))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val outInts =
      Seq(col("n").cast(LongType).as("n"), col("tie_sum").cast(LongType).as("tie_sum")) ++
      groups.flatMap(grp => Seq(
        col(s"n_$grp").cast(LongType).as(s"n_$grp"),
        col(s"r2x2_$grp").cast(LongType).as(s"r2x2_$grp")))
    ranked.agg(aggCols.head, aggCols.tail: _*)
      .withColumn("__t", t)
      .withColumn("__nnn", (col("n") * col("n") * col("n") - col("n")).cast(D))
      .withColumn("__h",
        lit(3.0) * col("__t") / (col("n") * (col("n") + 1)).cast(DoubleType)
          - lit(3.0) * (col("n").cast(DoubleType) + lit(1.0)))
      .select(outInts ++ Seq(
        floor(col("__h") * 10000.0 + 0.5).cast(LongType).as("h_bp"),
        when(col("tie_sum") < col("__nnn"),
          floor(col("__h") / (lit(1.0) - col("tie_sum").cast(DoubleType)
              / col("__nnn").cast(DoubleType)) * 10000.0 + 0.5)
            .cast(LongType)).as("hc_bp")): _*)
  }
}
