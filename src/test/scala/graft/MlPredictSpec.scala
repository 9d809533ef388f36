package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Config, Engine}
import graft.ml.Predict
import graft.operators.MlPrep

/** M1 + M4–M7 end-to-end on the reference's protocol (`predict.py:31-72`):
  * the finance pipeline loads `daily_price_features` into Derby, `Predict`
  * reads it BACK from the database (not from parquet), and expanding-window
  * CV runs both models with fold boundaries matching `timeSeriesSplitBounds`.
  */
class MlPredictSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("M1: features read back from the loaded DB table; M4-M7: CV folds + finite RMSE for GBT and ridge") {
    // load (idempotent upsert — safe whether or not FinancePipelineSpec ran first)
    new Engine(spark).run(Config.load("configs/finance_pipeline.yaml"))

    val df = Predict.featuresFromDb(
      spark, "jdbc:derby:memory:financedb;create=true", "daily_price_features").cache()
    assert(Predict.FeatureCols.forall(df.columns.contains),
      s"missing feature columns in read-back frame: ${df.columns.mkString(",")}")
    val n = df.count()
    assert(n == 70) // 71 loaded rows − 1 dropped by the next-day target

    val bounds = MlPrep.timeSeriesSplitBounds(n, 5)
    val byModel = Seq(
      "gbt" -> Predict.gbt("target_return"),
      "ridge" -> Predict.ridge("target_return"))
    byModel.foreach { case (name, fit) =>
      val folds = Predict.timeSeriesCv(df, "target_return", "date", fit)
      assert(folds.map(f => (f.fold, f.trainRows, f.testRows)) ==
        bounds.map(b => (b.fold, b.trainRows, b.testRows)),
        s"$name: fold boundaries diverge from TimeSeriesSplit(5)")
      assert(folds.forall(f => java.lang.Double.isFinite(f.rmse) && f.rmse >= 0.0),
        s"$name: non-finite RMSE in $folds")
    }

    // M7 — full-data GBT importances: top-5, non-negative, from the 12 features
    val imp = Predict.topImportances(df, "target_return")
    assert(imp.size == 5)
    assert(imp.forall { case (c, w) => Predict.FeatureCols.contains(c) && w >= 0.0 })

    // M7 artifact parity: a sorted JSON file on disk (reference writes a PNG)
    val artifact = java.nio.file.Files.createTempFile("fi", ".json")
    Predict.writeImportances(imp, artifact.toString)
    val body = new String(java.nio.file.Files.readAllBytes(artifact), "UTF-8")
    assert(imp.forall { case (c, _) => body.contains(s""""feature": "$c"""") })
    java.nio.file.Files.delete(artifact)

    // M7 chart parity: the SVG bar chart (the PNG's role, no plotting lib) —
    // one labeled bar per feature, widths monotone in the sorted weights
    val svg = Predict.importancesSvg(imp)
    assert(svg.startsWith("<svg ") && svg.contains("</svg>"))
    assert(imp.forall { case (c, _) => svg.contains(s">$c</text>") })
    val widths = """<rect [^/]*width="([0-9.]+)"""".r
      .findAllMatchIn(svg).map(_.group(1).toDouble).toSeq
    assert(widths.size == imp.size)
    assert(widths.zip(widths.tail).forall { case (a, b) => a >= b },
      s"bar widths must follow the importance sort: $widths")
    df.unpersist()
  }
}
