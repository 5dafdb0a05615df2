package graft.ml

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.SparkSession

/** M2 with a real gradient-boosted regressor: the reference serves
  * pre-trained XGBoost pickles (app.py:211-218) whose training code is
  * absent from the repo; our equivalent trains Spark MLlib's GBTRegressor
  * on lag-window features and plugs into the same recursive-forecast
  * mechanism ([[Forecaster.LagModel]]).
  *
  * Training is distributed (MLlib over a DataFrame of lag windows);
  * inference inside the 24-step recursion is driver-side single-vector
  * `model.predict` — exactly the reference's serving shape.
  */
object GbtLagModel {

  final case class Wrapped(model: GBTRegressionModel, windowSize: Int)
      extends Forecaster.LagModel {
    def predict(window: Array[Double]): Double =
      model.predict(Vectors.dense(window))
  }

  /** Train on a (scaled) chronological series: features = each
    * `windowSize`-length lag window, label = the next value.
    */
  def train(spark: SparkSession, series: Array[Double], windowSize: Int,
      maxIter: Int = 20, maxDepth: Int = 3): Wrapped = {
    require(series.length > windowSize + 1,
      s"need > ${windowSize + 1} points, got ${series.length}")
    import spark.implicits._
    val rows = series.sliding(windowSize + 1)
      .map(w => (Vectors.dense(w.take(windowSize)), w.last)).toSeq
    val df = rows.toDF("features", "label")
    val m = new GBTRegressor()
      .setMaxIter(maxIter)
      .setMaxDepth(maxDepth)
      .setSeed(42L)
      .fit(df)
    Wrapped(m, windowSize)
  }
}
