package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity search over the `embeddings` table: exact brute-force top-k
  * (baseline), exact near-duplicate pair scan, and the LSH-bucketed
  * approximate variant (scale path).
  */
object SimilarityQueries {

  /** Shared SQL: vectors as doubles with L2 norms. */
  private val NormedSql =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |        sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i]))) AS nrm
      |      FROM e)""".stripMargin

  val sim1BruteTopK: Q = Q(
    "sim1_ann_brute_topk",
    s"""WITH $NormedSql,
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
       |s AS (SELECT q.q_id, c.vec_id AS neighbor,
       |        list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*c.v[i])) / (q.qn*c.nrm) AS cosine
       |      FROM q JOIN n c ON c.vec_id <> q.q_id),
       |r AS (SELECT q_id, neighbor, cosine,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS BIGINT) AS rnk
       |      FROM s)
       |SELECT q_id, neighbor, cosine, rnk FROM r WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 10)
      .orderBy(col("q_id"), col("rnk"))
  }

  val dd5EmbeddingNearDup: Q = Q(
    "dd5_dedup_embedding",
    s"""WITH $NormedSql
       |SELECT * FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) / (a.nrm*b.nrm) AS cosine
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin) { (spark, dir) =>
    Similarity.nearDuplicatePairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val sim2LshTopK: Q = {
    val coef = "(((1103515245 * (j*64 + (i - 1)) + 12345) % 2147483648) / 2147483648.0 - 0.5)"
    Q(
      "sim2_ann_lsh_topk",
      s"""WITH $NormedSql,
         |sg AS (SELECT vec_id, v, nrm,
         |  CAST(list_sum(list_transform(range(0, 6), j ->
         |    CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * $coef)) > 0.0
         |         THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
         |  FROM n),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket FROM sg WHERE vec_id < 10),
         |s AS (SELECT q.q_id, c.vec_id AS neighbor,
         |        list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*c.v[i])) / (q.qn*c.nrm) AS cosine
         |      FROM q JOIN sg c ON c.bucket = q.bucket AND c.vec_id <> q.q_id),
         |r AS (SELECT q_id, neighbor, cosine,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS BIGINT) AS rnk
         |      FROM s)
         |SELECT q_id, neighbor, cosine, rnk FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, bits = 6, dims = 64)
        .orderBy(col("q_id"), col("rnk"))
    }
  }

  /** The scale path for dd5: bucket-local candidate pairs (same hyperplane
    * signature CTE as sim2) + exact cosine verify — Σ n_b² work instead of n².
    */
  val dd7EmbeddingLshNearDup: Q = {
    val coef = "(((1103515245 * (j*64 + (i - 1)) + 12345) % 2147483648) / 2147483648.0 - 0.5)"
    Q(
      "dd7_dedup_embedding_lsh",
      s"""WITH $NormedSql,
         |sg AS (SELECT vec_id, v, nrm,
         |  CAST(list_sum(list_transform(range(0, 6), j ->
         |    CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * $coef)) > 0.0
         |         THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
         |  FROM n)
         |SELECT * FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) / (a.nrm*b.nrm) AS cosine
         |  FROM sg a JOIN sg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin) { (spark, dir) =>
      Similarity.lshNearDuplicatePairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
        threshold = 0.4, bits = 6, dims = 64)
        .orderBy(col("vec_a"), col("vec_b"))
    }
  }

  val sim3IvfTopK: Q = Q(
    "sim3_ann_ivf_topk",
    s"""WITH $NormedSql,
       |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
       |a AS (SELECT vec_id, v, nrm, c_id AS cell FROM (
       |  SELECT n.vec_id, n.v, n.nrm, c.c_id,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |      list_sum(list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])) / (n.nrm*c.cn) DESC,
       |      c.c_id) AS rn
       |  FROM n CROSS JOIN c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell FROM a WHERE vec_id < 10),
       |s AS (SELECT q.q_id, x.vec_id AS neighbor,
       |        list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*x.v[i])) / (q.qn*x.nrm) AS cosine
       |      FROM q JOIN a x ON x.cell = q.cell AND x.vec_id <> q.q_id),
       |r AS (SELECT q_id, neighbor, cosine,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS BIGINT) AS rnk
       |      FROM s)
       |SELECT q_id, neighbor, cosine, rnk FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    Similarity.ivfTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, nCells = 16)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Brute-force ANN over int8-QUANTIZED codes (floor(x·127/max|x|)): scales
    * cancel in the cosine so ranking runs on exact integer arithmetic — the
    * 4×-compression scale lever, oracle-exact.
    */
  val sim4QuantizedTopK: Q = Q(
    "sim4_ann_quantized_topk",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |sc AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS s FROM e),
      |qz AS (SELECT vec_id,
      |    CASE WHEN s = 0 THEN list_transform(v, x -> CAST(0 AS DOUBLE))
      |         ELSE list_transform(v, x -> CAST(CAST(FLOOR(x * 127.0 / s) AS INT) AS DOUBLE)) END AS qd
      |  FROM sc),
      |n AS (SELECT vec_id, qd,
      |        sqrt(list_sum(list_transform(range(1, len(qd)+1), i -> qd[i]*qd[i]))) AS nrm
      |      FROM qz),
      |q AS (SELECT vec_id AS q_id, qd AS q_qd, nrm AS q_nrm FROM n WHERE vec_id < 10),
      |s AS (SELECT q.q_id, c.vec_id AS neighbor,
      |        list_sum(list_transform(range(1, len(q.q_qd)+1), i -> q.q_qd[i]*c.qd[i])) / (q.q_nrm*c.nrm) AS cosine
      |      FROM q JOIN n c ON c.vec_id <> q.q_id),
      |r AS (SELECT q_id, neighbor, cosine,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS BIGINT) AS rnk
      |      FROM s)
      |SELECT q_id, neighbor, cosine, rnk FROM r WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 10)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Product-quantization ADC top-5 ([[graft.operators.Similarity.pqTopK]]):
    * codes-only scoring with deterministic codebooks (subspace slices of the
    * first 16 vectors — the sim3 fixed-seed convention), m=8 subspaces over
    * 64 dims. The oracle reproduces the encode (argmin subspace L2, ties →
    * lowest code) and the ADC sums in the identical index order, so the
    * approximate scores compare bit-exactly.
    */
  val sim5PqTopK: Q = Q(
    "sim5_ann_pq_topk",
    s"""WITH $NormedSql,
       |vn AS (SELECT vec_id, list_transform(range(1, len(v)+1), i -> v[i]/nrm) AS u FROM n),
       |cbl AS (SELECT list(u ORDER BY vec_id) AS cbs FROM vn WHERE vec_id < 16),
       |enc0 AS (SELECT x.vec_id, t.j, c.c,
       |    ROW_NUMBER() OVER (PARTITION BY x.vec_id, t.j ORDER BY
       |      list_sum(list_transform(range(1, 9), i ->
       |        (x.u[CAST(t.j*8+i AS INT)] - cbl.cbs[CAST(c.c+1 AS INT)][CAST(t.j*8+i AS INT)])^2)) ASC,
       |      c.c) AS rn
       |  FROM vn x CROSS JOIN range(0, 8) t(j) CROSS JOIN range(0, 16) c(c) CROSS JOIN cbl),
       |enc AS (SELECT vec_id, list(c ORDER BY j) AS codes FROM enc0 WHERE rn = 1 GROUP BY vec_id),
       |q AS (SELECT vec_id AS q_id, u AS qu FROM vn WHERE vec_id < 10),
       |s AS (SELECT q.q_id, e.vec_id AS neighbor,
       |    list_sum(list_transform(range(0, 8), j ->
       |      list_sum(list_transform(range(1, 9), i ->
       |        q.qu[CAST(j*8+i AS INT)] * cbl.cbs[CAST(e.codes[CAST(j+1 AS INT)]+1 AS INT)][CAST(j*8+i AS INT)])))) AS adc
       |  FROM q CROSS JOIN enc e CROSS JOIN cbl WHERE e.vec_id <> q.q_id),
       |r AS (SELECT q_id, neighbor, adc,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc DESC, neighbor) AS BIGINT) AS rnk
       |  FROM s)
       |SELECT q_id, neighbor, adc, rnk FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    Similarity.pqTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, m = 8, codebookSize = 16)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** k-NN label prediction ([[graft.operators.Similarity.knnPredictLabels]]):
    * majority label among the 10 nearest corpus neighbors, with the true
    * label alongside — the embedding-space eval that exercises the `label`
    * column. Queries = vec_id < 20; corpus = the rest.
    */
  val sim6KnnLabel: Q = Q(
    "sim6_knn_label",
    s"""WITH $NormedSql,
       |lab AS (SELECT vec_id, label FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 20),
       |c AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= 20),
       |s AS (SELECT q.q_id, c.vec_id AS neighbor,
       |        list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*c.v[i])) / (q.qn*c.nrm) AS cosine
       |      FROM q JOIN c ON true),
       |r AS (SELECT q_id, neighbor,
       |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS rnk
       |      FROM s),
       |v AS (SELECT r.q_id, lab.label AS n_label, COUNT(*) AS votes
       |      FROM r JOIN lab ON lab.vec_id = r.neighbor WHERE r.rnk <= 10
       |      GROUP BY r.q_id, lab.label),
       |p AS (SELECT q_id, n_label AS pred_label, CAST(votes AS BIGINT) AS votes,
       |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY votes DESC, n_label) AS rn
       |      FROM v)
       |SELECT p.q_id, CAST(t.label AS BIGINT) AS true_label,
       |  CAST(p.pred_label AS BIGINT) AS pred_label, p.votes
       |FROM p JOIN lab t ON t.vec_id = p.q_id
       |WHERE p.rn = 1 ORDER BY p.q_id""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 20)
    val corpus = emb.filter(col("vec_id") >= 20)
    Similarity.knnPredictLabels(corpus, queries, "vec_id", "embedding", "label", k = 10)
      .join(queries.select(col("vec_id").as("q_id"),
        col("label").cast("long").as("true_label")), "q_id")
      .select(col("q_id"), col("true_label"),
        col("pred_label").cast("long").as("pred_label"), col("votes"))
      .orderBy(col("q_id"))
  }

  /** Per-label class centroids as fixed-point accumulators
    * ([[Similarity.labelCentroidSums]]): the mean-embedding-per-class
    * computation (nearest-centroid classifiers, class-prototype dedup)
    * shipped as order-independent BIGINT sums so the gate is bit-exact —
    * float means would be accumulation-order-dependent across engines.
    */
  val sim7LabelCentroids: Q = Q(
    "sim7_label_centroids",
    """WITH x0 AS (SELECT label, embedding,
      |                   unnest(generate_series(1, len(embedding))) AS i
      |            FROM embeddings),
      |x AS (SELECT CAST(label AS BIGINT) AS label,
      |             CAST(i - 1 AS BIGINT) AS dim,
      |             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS qv
      |      FROM x0)
      |SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS qsum,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin) { (spark, dir) =>
    Similarity.labelCentroidSums(Tables.embeddings(spark, dir), "label", "embedding")
      .orderBy(col("label"), col("dim"))
  }

  /** Maximal-Marginal-Relevance diverse top-5 for query vector 0
    * ([[graft.operators.Similarity.mmrSelect]]): greedy
    * `argmax (rel − max-sim-to-selected)` with vec_id tiebreaks — the
    * curation-grade alternative to sim1's plain top-k (which returns 5
    * near-copies when the corpus has a duplicate cluster near the query).
    * The oracle unrolls the 5 greedy rounds as chained CTEs, one argmax
    * LIMIT 1 per round — same pattern as q_pagerank's iteration CTEs.
    */
  val sim8MmrSelect: Q = {
    def cosSql(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a.v)+1), i -> $a.v[i]*$b.v[i])) / ($a.nrm*$b.nrm)"
    def selU(j: Int) = (1 until j).map(i => s"SELECT vec_id FROM sel$i")
      .mkString(" UNION ALL ")
    def step(j: Int) =
      s"""ms$j AS (
         |  SELECT r.vec_id, r.rel, MAX(${cosSql("r", "s")}) AS ms
         |  FROM rels r JOIN n s ON s.vec_id IN (${selU(j)})
         |  WHERE r.vec_id NOT IN (${selU(j)})
         |  GROUP BY r.vec_id, r.rel),
         |sel$j AS (SELECT vec_id, rel, ms, rel - ms AS score,
         |          CAST($j AS BIGINT) AS rnk
         |          FROM ms$j ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    Q(
      "sim8_mmr_select",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v,
         |        sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i]))) AS nrm
         |      FROM e),
         |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
         |rels AS (SELECT n.vec_id, n.v, n.nrm,
         |    list_sum(list_transform(range(1, len(n.v)+1), i -> n.v[i]*q.qv[i])) / (n.nrm*q.qn) AS rel
         |  FROM n, q WHERE n.vec_id <> 0),
         |sel1 AS (SELECT vec_id, rel, CAST(NULL AS DOUBLE) AS ms, rel AS score,
         |         CAST(1 AS BIGINT) AS rnk
         |         FROM rels ORDER BY rel DESC, vec_id LIMIT 1),
         |${(2 to 5).map(step).mkString(",\n")}
         |SELECT rnk, vec_id, rel, ms, score FROM (
         |  ${(1 to 5).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")})
         |ORDER BY rnk""".stripMargin) { (spark, dir) =>
      Similarity.mmrSelect(Tables.embeddings(spark, dir), "vec_id", "embedding",
        queryId = 0L, k = 5)
    }
  }

  /** PQ top-k with Lloyd-TRAINED per-subspace codebooks
    * ([[Similarity.pqTopKTrained]]): the quality path past sim5's fixed
    * convention. Training is deterministic end-to-end — sample = first 2048
    * vectors by id, init = first 16 subvectors, 10 Lloyd rounds, argmin-L2
    * ties to the lowest code, empty cells keep their centroid — and the
    * ORACLE REPLAYS THE TRAINING ITSELF: a recursive CTE carries all 8×16
    * centroids per iteration and recomputes assignment + fold-order mean
    * updates with DuckDB list lambdas (ordered folds match the Scala
    * trainer's point-order accumulation bit-for-bit; same discipline as the
    * dd11 reachability and mx8 packing recursive oracles). Encode + ADC
    * then follow the sim5 pattern with per-subspace (8-dim) codebooks.
    * Recall vs exact brute force is pinned ≥ 0.8 in KmeansIvfSpec.
    */
  val sim9PqTrainedTopK: Q = Q(
    "sim9_ann_pq_trained_topk",
    s"""WITH RECURSIVE $NormedSql,
       |vn AS (SELECT vec_id, list_transform(range(1, len(v)+1), i -> v[i]/nrm) AS u FROM n),
       |smp AS (SELECT vec_id, u FROM vn ORDER BY vec_id LIMIT 2048),
       |pts0 AS (SELECT t.j, list(list_transform(range(1,9), i -> s.u[CAST(t.j*8+i AS INT)]) ORDER BY s.vec_id) AS ps
       |         FROM smp s CROSS JOIN range(0,8) t(j) GROUP BY t.j),
       |lloyd AS (
       |  SELECT 0 AS it, j, ps[1:16] AS cents, ps FROM pts0
       |  UNION ALL
       |  SELECT it+1, j,
       |    list_transform(range(1,17), c ->
       |      CASE WHEN len(list_filter(zp, z -> z.l2 = c)) = 0 THEN cents[CAST(c AS INT)]
       |           ELSE list_transform(range(1,9), i ->
       |             list_sum(list_transform(list_filter(zp, z -> z.l2 = c), z -> z.l1[CAST(i AS INT)]))
       |             / len(list_filter(zp, z -> z.l2 = c)))
       |      END),
       |    ps
       |  FROM (
       |    SELECT it, j, cents, ps,
       |      list_transform(
       |        list_zip(ps, list_transform(ps, p ->
       |          list_position(
       |            list_transform(range(1,17), c2 -> list_sum(list_transform(range(1,9), i2 ->
       |              (p[CAST(i2 AS INT)]-cents[CAST(c2 AS INT)][CAST(i2 AS INT)])^2))),
       |            list_min(
       |            list_transform(range(1,17), c2 -> list_sum(list_transform(range(1,9), i2 ->
       |              (p[CAST(i2 AS INT)]-cents[CAST(c2 AS INT)][CAST(i2 AS INT)])^2))))))),
       |        z -> {'l1': z[1], 'l2': z[2]}) AS zp
       |    FROM lloyd WHERE it < 10)),
       |cbj AS (SELECT list(cents ORDER BY j) AS cb FROM lloyd WHERE it = 10),
       |enc0 AS (SELECT x.vec_id, t.j, c.c,
       |    ROW_NUMBER() OVER (PARTITION BY x.vec_id, t.j ORDER BY
       |      list_sum(list_transform(range(1, 9), i ->
       |        (x.u[CAST(t.j*8+i AS INT)] - cbj.cb[CAST(t.j+1 AS INT)][CAST(c.c+1 AS INT)][CAST(i AS INT)])^2)) ASC,
       |      c.c) AS rn
       |  FROM vn x CROSS JOIN range(0, 8) t(j) CROSS JOIN range(0, 16) c(c) CROSS JOIN cbj),
       |enc AS (SELECT vec_id, list(c ORDER BY j) AS codes FROM enc0 WHERE rn = 1 GROUP BY vec_id),
       |q AS (SELECT vec_id AS q_id, u AS qu FROM vn WHERE vec_id < 10),
       |s AS (SELECT q.q_id, e2.vec_id AS neighbor,
       |    list_sum(list_transform(range(0, 8), j ->
       |      list_sum(list_transform(range(1, 9), i ->
       |        q.qu[CAST(j*8+i AS INT)] * cbj.cb[CAST(j+1 AS INT)][CAST(e2.codes[CAST(j+1 AS INT)]+1 AS INT)][CAST(i AS INT)])))) AS adc
       |  FROM q CROSS JOIN enc e2 CROSS JOIN cbj WHERE e2.vec_id <> q.q_id),
       |r AS (SELECT q_id, neighbor, adc,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc DESC, neighbor) AS BIGINT) AS rnk
       |  FROM s)
       |SELECT q_id, neighbor, adc, rnk FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    Similarity.pqTopKTrained(Tables.embeddings(spark, dir), "vec_id", "embedding",
      queryPred = col("vec_id") < 10, k = 5, m = 8, codebookSize = 16,
      iters = 10, sampleN = 2048)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Retrieval-quality eval ([[Similarity.retrievalMrr]]): per query, the
    * rank of the first same-label corpus neighbor under exact cosine
    * ranking, the reciprocal rank in integer basis points, and hit@10 — the
    * embedding-index acceptance metric (MRR / recall@k) computed with the
    * sim6 query/corpus split. Queries with no same-label neighbor keep a
    * NULL-rank row, so the output is one row per query by construction.
    */
  val m19RetrievalMrr: Q = Q(
    "m19_retrieval_mrr",
    s"""WITH $NormedSql,
       |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
       |q AS (SELECT n.vec_id AS q_id, v AS qv, nrm AS qn, lab.label AS true_label
       |      FROM n JOIN lab ON lab.vec_id = n.vec_id WHERE n.vec_id < 20),
       |c AS (SELECT n.vec_id, v, nrm, lab.label AS n_label
       |      FROM n JOIN lab ON lab.vec_id = n.vec_id WHERE n.vec_id >= 20),
       |s AS (SELECT q.q_id, q.true_label, c.vec_id AS neighbor, c.n_label,
       |        list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*c.v[i])) / (q.qn*c.nrm) AS cosine
       |      FROM q JOIN c ON true),
       |r AS (SELECT q_id, true_label, n_label,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS BIGINT) AS rnk
       |      FROM s),
       |fh AS (SELECT q_id, MIN(rnk) AS first_rank
       |       FROM r WHERE n_label = true_label GROUP BY q_id)
       |SELECT q.q_id, q.true_label, fh.first_rank,
       |  CAST(COALESCE(10000 // fh.first_rank, 0) AS BIGINT) AS rr_bp,
       |  CAST(CASE WHEN fh.first_rank <= 10 THEN 1 ELSE 0 END AS BIGINT) AS hit_at_k
       |FROM q LEFT JOIN fh USING (q_id) ORDER BY q.q_id""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    Similarity.retrievalMrr(
      emb.filter(col("vec_id") >= 20), emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", "label", kHit = 10)
  }

  /** NDCG@10 per query ([[Similarity.retrievalNdcg]]) with the m19
    * query/corpus split — binary relevance (same label), rank discounts
    * pre-scaled to millionth BIGINTs so DCG/IDCG/ndcg_bp are all exact
    * integers; the identical weight and prefix-sum literals are interpolated
    * into BOTH engines' plans from one driver-side computation.
    */
  val m23RetrievalNdcg: Q = {
    val k = 10
    val wts = (1 to k).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
    val pfx = wts.scanLeft(0L)(_ + _).tail
    val wVals = wts.zipWithIndex.map { case (x, i) => s"(${i + 1}, $x)" }.mkString(",")
    val pVals = pfx.zipWithIndex.map { case (x, i) => s"(${i + 1}, $x)" }.mkString(",")
    Q(
      "m23_retrieval_ndcg",
      s"""WITH $NormedSql,
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |q AS (SELECT n.vec_id AS q_id, v AS qv, nrm AS qn, lab.label AS true_label
         |      FROM n JOIN lab ON lab.vec_id = n.vec_id WHERE n.vec_id < 20),
         |c AS (SELECT n.vec_id, v, nrm, lab.label AS n_label
         |      FROM n JOIN lab ON lab.vec_id = n.vec_id WHERE n.vec_id >= 20),
         |s AS (SELECT q.q_id, q.true_label, c.vec_id AS neighbor, c.n_label,
         |        list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*c.v[i])) / (q.qn*c.nrm) AS cosine
         |      FROM q JOIN c ON true),
         |r AS (SELECT q_id, true_label, n_label,
         |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor) AS rnk
         |      FROM s),
         |wts AS (SELECT * FROM (VALUES $wVals) AS t(rnk, w)),
         |pfx AS (SELECT * FROM (VALUES $pVals) AS t(nrel, idcg)),
         |dcg AS (SELECT q_id,
         |          SUM(CASE WHEN n_label = true_label THEN w ELSE 0 END) AS dcg_s
         |        FROM r JOIN wts USING (rnk) WHERE rnk <= $k GROUP BY q_id),
         |lc AS (SELECT n_label AS label, COUNT(*) AS cnt FROM c GROUP BY 1),
         |base AS (SELECT q.q_id, q.true_label,
         |           CAST(COALESCE(lc.cnt, 0) AS BIGINT) AS n_rel
         |         FROM q LEFT JOIN lc ON lc.label = q.true_label)
         |SELECT b.q_id, b.true_label, b.n_rel,
         |  CAST(COALESCE(d.dcg_s, 0) AS BIGINT) AS dcg_s,
         |  CAST(p.idcg AS BIGINT) AS idcg_s,
         |  CAST(COALESCE(d.dcg_s, 0) * 10000 // p.idcg AS BIGINT) AS ndcg_bp
         |FROM base b
         |LEFT JOIN dcg d USING (q_id)
         |LEFT JOIN pfx p ON p.nrel = LEAST(b.n_rel, $k) AND b.n_rel > 0
         |ORDER BY b.q_id""".stripMargin) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      Similarity.retrievalNdcg(
        emb.filter(col("vec_id") >= 20), emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", "label", k = k)
    }
  }

  /** IVF recall audit ([[Similarity.ivfRecallReport]]): recall@10 of
    * IVF search vs exact brute-force ground truth at probe depths 1, 2, 4 —
    * the dd27 discipline for the vector path. sim3 pins that the IVF plan is
    * correct; this pins what the probe knob BUYS (recall should climb with
    * nProbe). The corpus is assigned once and one candidate frame (probe
    * rank ≤ 4) is scored once; per-probe results are three bounded window
    * passes over it. The oracle replays assignment, probe ranking, scoring,
    * per-probe top-k, and the recall division over the same 32-query set.
    */
  val sim10IvfRecall: Q = Q(
    "sim10_ivf_recall",
    s"""WITH $NormedSql,
       |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
       |a AS (SELECT vec_id, v, nrm, c_id AS cell FROM (
       |  SELECT n.vec_id, n.v, n.nrm, c.c_id,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |      list_sum(list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])) / (n.nrm*c.cn) DESC,
       |      c.c_id) AS rn
       |  FROM n CROSS JOIN c) WHERE rn = 1),
       |qc AS (SELECT * FROM (
       |  SELECT n.vec_id AS q_id, n.v AS qv, n.nrm AS qn, c.c_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |      list_sum(list_transform(range(1, len(n.v)+1), i -> n.v[i]*c.cv[i])) / (n.nrm*c.cn) DESC,
       |      c.c_id) AS crn
       |  FROM n CROSS JOIN c WHERE n.vec_id < 32) WHERE crn <= 4),
       |cand AS (SELECT qc.q_id, x.vec_id AS neighbor,
       |    list_sum(list_transform(range(1, len(qc.qv)+1), i -> qc.qv[i]*x.v[i])) / (qc.qn*x.nrm) AS cosine,
       |    qc.crn
       |  FROM qc JOIN a x ON x.cell = qc.cell AND x.vec_id <> qc.q_id),
       |probes AS (SELECT CAST(1 AS BIGINT) AS n_probe UNION ALL
       |           SELECT 2 UNION ALL SELECT 4),
       |ivf AS (SELECT n_probe, q_id, neighbor FROM (
       |  SELECT p.n_probe, cand.q_id, cand.neighbor,
       |    ROW_NUMBER() OVER (PARTITION BY p.n_probe, cand.q_id
       |      ORDER BY cand.cosine DESC, cand.neighbor) AS rnk
       |  FROM probes p JOIN cand ON cand.crn <= p.n_probe) WHERE rnk <= 10),
       |q2 AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 32),
       |truth AS (SELECT q_id, neighbor FROM (
       |  SELECT q2.q_id, x.vec_id AS neighbor,
       |    ROW_NUMBER() OVER (PARTITION BY q2.q_id ORDER BY
       |      list_sum(list_transform(range(1, len(q2.qv)+1), i -> q2.qv[i]*x.v[i])) / (q2.qn*x.nrm) DESC,
       |      x.vec_id) AS rnk
       |  FROM q2 JOIN n x ON x.vec_id <> q2.q_id) WHERE rnk <= 10),
       |hit AS (SELECT n_probe, CAST(COUNT(*) AS BIGINT) AS n_hit
       |  FROM ivf JOIN truth USING (q_id, neighbor) GROUP BY n_probe),
       |t AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries,
       |  CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
       |SELECT p.n_probe, t.n_queries, t.n_truth,
       |  COALESCE(h.n_hit, 0) AS n_hit,
       |  COALESCE(h.n_hit, 0) * 10000 // t.n_truth AS recall_bp
       |FROM probes p CROSS JOIN t LEFT JOIN hit h USING (n_probe)
       |ORDER BY p.n_probe""".stripMargin) { (spark, dir) =>
    Similarity.ivfRecallReport(Tables.embeddings(spark, dir), "vec_id", "embedding",
      queryPred = col("vec_id") < 32, k = 10, nCells = 16, probes = Seq(1, 2, 4))
  }

  /** Inter-class centroid separation matrix — pairwise cosine between the
    * sim7 label centroids, the "are my classes distinguishable in
    * embedding space?" audit (low separation predicts label noise /
    * embedding collapse before any classifier is trained). The mean-vector
    * normalizers cancel in the cosine, so the whole statistic reduces to
    * exact integer sums of the QUANTIZED per-(label, dim) sums sim7
    * already defines: dot and both squared norms accumulate in
    * decimal(38,0) (the m21 discipline), and only the final
    * `dot/√·√·` passes through the pinned double order to basis points.
    * Label-pair grid is |labels|²/2 rows over a 64-dim frame — bounded
    * everywhere; the corpus is touched once by the sim7 aggregate.
    */
  val sim11LabelSeparation: Q = Q(
    "sim11_label_separation",
    """WITH x0 AS (SELECT label, embedding,
      |                   unnest(generate_series(1, len(embedding))) AS i
      |            FROM embeddings),
      |x AS (SELECT CAST(label AS BIGINT) AS label,
      |             CAST(i - 1 AS BIGINT) AS dim,
      |             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS qv
      |      FROM x0),
      |s AS (SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS qsum
      |      FROM x GROUP BY label, dim),
      |nrm AS (SELECT label, SUM(CAST(qsum AS HUGEINT) * qsum) AS norm2
      |        FROM s GROUP BY label),
      |pair AS (SELECT a.label AS label_a, b.label AS label_b,
      |    SUM(CAST(a.qsum AS HUGEINT) * b.qsum) AS dot
      |  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT p.label_a, p.label_b,
      |  CAST(p.dot AS DOUBLE) AS dot,
      |  CAST(na.norm2 AS DOUBLE) AS norm2_a,
      |  CAST(nb.norm2 AS DOUBLE) AS norm2_b,
      |  CAST(CASE WHEN na.norm2 = 0 OR nb.norm2 = 0 THEN NULL
      |    ELSE FLOOR(CAST(p.dot AS DOUBLE) / SQRT(CAST(na.norm2 AS DOUBLE))
      |      / SQRT(CAST(nb.norm2 AS DOUBLE)) * 10000.0 + 0.5) END AS BIGINT) AS cos_bp
      |FROM pair p
      |JOIN nrm na ON na.label = p.label_a
      |JOIN nrm nb ON nb.label = p.label_b
      |ORDER BY p.label_a, p.label_b""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val D = DecimalType(38, 0)
    val s = Similarity.labelCentroidSums(Tables.embeddings(spark, dir),
        "label", "embedding")
      .select(col("label"), col("dim"), col("qsum"))
    val sM = graft.operators.Dedup.cachedForReuse(s)
    val nrm = sM.groupBy(col("label"))
      .agg(sum(col("qsum").cast(D) * col("qsum")).cast(D).as("norm2"))
    val pair = sM.as("a").join(sM.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.qsum").cast(D) * col("b.qsum")).cast(D).as("dot"))
    pair
      .join(broadcast(nrm.select(col("label").as("label_a"), col("norm2").as("norm2_a"))), "label_a")
      .join(broadcast(nrm.select(col("label").as("label_b"), col("norm2").as("norm2_b"))), "label_b")
      .select(col("label_a"), col("label_b"),
        // report projections over decimal internals (the Eval.rankAuc
        // discipline) — as DOUBLE, not BIGINT: the per-(label, dim)
        // quantized sums grow with the corpus, so dot/norm2 are n²-scale
        // and would cross 2⁶³ around 10⁷ vectors/label; both gate lanes
        // render float64 and both engines' casts from the same exact
        // decimal are correctly rounded, so the bits match at any scale.
        // cos_bp below still derives from the exact decimals.
        col("dot").cast(DoubleType).as("dot"),
        col("norm2_a").cast(DoubleType).as("norm2_a"),
        col("norm2_b").cast(DoubleType).as("norm2_b"),
        when(col("norm2_a") === 0 || col("norm2_b") === 0, lit(null).cast(LongType))
          .otherwise(floor(col("dot").cast("double")
            / sqrt(col("norm2_a").cast("double"))
            / sqrt(col("norm2_b").cast("double")) * 10000.0 + 0.5)
            .cast(LongType)).as("cos_bp"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Hyperplane-LSH recall/cost audit across prefix widths
    * ([[Similarity.lshRecallReport]]): the sim10 tradeoff report for the
    * LSH path — per signature width (2/4/6 of sim2's planes), how many
    * exact top-10 neighbors still share the query's bucket prefix
    * (recall, exact bp) and how big the candidate buckets are (cost —
    * computed from prefix POPULATIONS, no pairwise work). The oracle
    * replays the planes, the exact ranking, the `&`-mask agreements and
    * the prefix counts.
    */
  val sim12LshRecall: Q = {
    val coef = "(((1103515245 * (j*64 + (i - 1)) + 12345) % 2147483648) / 2147483648.0 - 0.5)"
    val widths = Seq(2, 4, 6)
    def mask(w: Int): Long = (1L << w) - 1
    val hitCols = widths.map(w =>
      s"SUM(CASE WHEN (qb & ${mask(w)}) = (nb & ${mask(w)}) THEN 1 ELSE 0 END) AS h$w")
      .mkString(",\n         |    ")
    val pfxUnion = widths.map(w =>
      s"SELECT CAST($w AS BIGINT) AS w, bucket & ${mask(w)} AS pfx FROM sg")
      .mkString("\n         |  UNION ALL ")
    val qpUnion = widths.map(w =>
      s"SELECT q_id, CAST($w AS BIGINT) AS w, qb & ${mask(w)} AS pfx FROM q")
      .mkString("\n         |  UNION ALL ")
    val hStack = widths.map(w =>
      s"SELECT CAST($w AS BIGINT) AS width_bits, n_queries, n_truth, h$w AS n_hits FROM hits")
      .mkString("\n         |  UNION ALL ")
    Q(
      "sim12_lsh_recall",
      s"""WITH $NormedSql,
         |sg AS (SELECT vec_id, v, nrm,
         |  CAST(list_sum(list_transform(range(0, 6), j ->
         |    CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * $coef)) > 0.0
         |         THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
         |  FROM n),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS qb
         |      FROM sg WHERE vec_id < 10),
         |tr AS (SELECT q_id, neighbor, qb, nb FROM (
         |    SELECT q.q_id, c.vec_id AS neighbor, q.qb, c.bucket AS nb,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |        list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*c.v[i]))
         |          / (q.qn*c.nrm) DESC, c.vec_id) AS rnk
         |    FROM q JOIN sg c ON c.vec_id <> q.q_id)
         |  WHERE rnk <= 10),
         |hits AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries,
         |    CAST(COUNT(*) AS BIGINT) AS n_truth,
         |    $hitCols
         |  FROM tr),
         |pf AS (SELECT w, pfx, CAST(COUNT(*) AS BIGINT) AS c FROM (
         |  $pfxUnion) GROUP BY w, pfx),
         |qp AS ($qpUnion),
         |cand AS (SELECT qp.w,
         |    CAST(SUM(pf.c) - COUNT(DISTINCT qp.q_id) AS BIGINT) AS n_candidates
         |  FROM qp JOIN pf ON pf.w = qp.w AND pf.pfx = qp.pfx GROUP BY qp.w),
         |h AS ($hStack)
         |SELECT h.width_bits, h.n_queries, h.n_truth,
         |  CAST(h.n_hits AS BIGINT) AS n_hits,
         |  CAST((h.n_hits * 10000) // h.n_truth AS BIGINT) AS recall_bp, cand.n_candidates
         |FROM h JOIN cand ON cand.w = h.width_bits
         |ORDER BY h.width_bits""".stripMargin) { (spark, dir) =>
      Similarity.lshRecallReport(Tables.embeddings(spark, dir), "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 10, widths = widths,
          bits = 6, dims = 64)
        .orderBy(col("width_bits"))
    }
  }

  val all: Seq[Q] = Seq(sim1BruteTopK, dd5EmbeddingNearDup, dd7EmbeddingLshNearDup,
    sim8MmrSelect,
    sim2LshTopK, sim3IvfTopK, sim4QuantizedTopK, sim5PqTopK, sim6KnnLabel,
    sim7LabelCentroids, sim9PqTrainedTopK, m19RetrievalMrr, m23RetrievalNdcg,
    sim10IvfRecall, sim11LabelSeparation, sim12LshRecall)
}
