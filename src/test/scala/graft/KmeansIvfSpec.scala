package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Spherical k-means coarse quantizer + IVF search against its centroids:
  * the production path the trivial-quantizer `sim3` oracle query stands in
  * for (same assignment/equi-join structure, learned centroids).
  */
class KmeansIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus = Similarity.preparedCorpus(
    Tables.embeddings(spark, sf), "vec_id", "embedding")

  test("kmeans: k centroids, deterministic, objective does not degrade") {
    val c0 = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 0) // init only
    val c3 = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 3)
    assert(c3.count() == 8)
    assert(c3.filter(col("cn") <= 0.0 || col("cn").isNull).count() == 0)

    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.assignCells(corpus, cents)
        .agg(sum(col("cell_cos"))).head().getDouble(0)
    // Lloyd improves (or keeps) the summed assignment similarity
    assert(objective(c3) >= objective(c0) - 1e-9)

    // determinism: same inputs, same centroids
    val c3b = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 3)
    assert(c3.orderBy("c_id").collect().toSeq == c3b.orderBy("c_id").collect().toSeq)
  }

  test("ivf with kmeans centroids: k neighbors per query, all from the query's cell") {
    val cents = Similarity.kmeansCentroids(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 2)
    val res = Similarity.ivfTopKWithCentroids(corpus, cents, col("vec_id") < 5, k = 3)
    val byQ = res.groupBy("q_id").count().collect()
    assert(byQ.nonEmpty && byQ.forall(_.getLong(1) <= 3))

    val cells = Similarity.assignCells(corpus, cents).select(col("vec_id"), col("cell"))
    val joined = res
      .join(cells.withColumnRenamed("vec_id", "q_id").withColumnRenamed("cell", "q_cell"), "q_id")
      .join(cells.withColumnRenamed("vec_id", "neighbor").withColumnRenamed("cell", "n_cell"), "neighbor")
    assert(joined.filter(col("q_cell") =!= col("n_cell")).count() == 0)
  }
}
