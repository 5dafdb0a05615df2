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
  * DIFFERENCED formulation: features are the window's w−1 first
  * differences, the label is the NEXT difference, and serving adds the
  * predicted delta to the last level. Tree ensembles cannot extrapolate
  * outside the trained input/label range, so a level-on-level model
  * saturates as soon as a trend or random walk drifts past the training
  * span — measured on held-out hours it was WORSE than the persistence
  * baseline (RMSE 2.16 vs 1.55 seasonal, 3.33 vs 0.57 on the fixture
  * walk). Differencing makes both features and target stationary;
  * GbtLagModelSpec pins GBT ≤ persistence on held-out hours.
  *
  * Training is distributed (MLlib over a DataFrame of lag windows);
  * inference inside the 24-step recursion is driver-side single-vector
  * `model.predict` — exactly the reference's serving shape.
  */
object GbtLagModel {

  /** Persisted-bundle format: 2 = differenced target (model arity
    * windowSize−1). Format 1 (level-on-level, arity windowSize) carried
    * no version key; load() maps its absence to 1.
    */
  val FormatVersion = 2

  private def diffs(window: Array[Double]): Array[Double] = {
    val d = new Array[Double](window.length - 1)
    var i = 0
    while (i < d.length) { d(i) = window(i + 1) - window(i); i += 1 }
    d
  }

  final case class Wrapped(model: GBTRegressionModel, windowSize: Int)
      extends Forecaster.LagModel {
    def predict(window: Array[Double]): Double =
      window.last + model.predict(Vectors.dense(diffs(window)))
  }

  /** Train on a (scaled) chronological series: features = the w−1 first
    * differences of each `windowSize`-length lag window, label = the next
    * difference.
    */
  def train(spark: SparkSession, series: Array[Double], windowSize: Int,
      maxIter: Int = 20, maxDepth: Int = 3): Wrapped = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    require(series.length > windowSize + 1,
      s"need > ${windowSize + 1} points, got ${series.length}")
    import spark.implicits._
    val rows = series.sliding(windowSize + 1)
      .map { w =>
        (Vectors.dense(diffs(w.take(windowSize))), w.last - w(windowSize - 1))
      }.toSeq
    val df = rows.toDF("features", "label")
    val m = new GBTRegressor()
      .setMaxIter(maxIter)
      .setMaxDepth(maxDepth)
      .setSeed(42L)
      .fit(df)
    Wrapped(m, windowSize)
  }

  /** Fit the scaler on the raw series, train on the scaled series, return
    * the pair that must travel together (Forecaster.Bundle).
    */
  def trainBundle(spark: SparkSession, closes: Array[Double], windowSize: Int,
      maxIter: Int = 20, maxDepth: Int = 3): Forecaster.Bundle = {
    val scaler = Forecaster.MinMaxScaler.fit(closes.toSeq)
    Forecaster.Bundle(train(spark, closes.map(scaler.transform), windowSize,
      maxIter, maxDepth), scaler)
  }

  /** Persist the trained pair: MLlib writer for the GBT trees + a
    * properties file for the scaler bounds and window size — the M-series
    * analogue of the reference's pickled (model, scaler) artifacts
    * (app.py:211-218).
    */
  def save(bundle: Forecaster.Bundle, path: String): Unit = {
    val wrapped = bundle.model match {
      case w: Wrapped => w
      case other => throw new IllegalArgumentException(
        s"can only persist GBT-backed models, got ${other.getClass.getName}")
    }
    wrapped.model.write.overwrite().save(s"$path/gbt")
    val props = new java.util.Properties()
    // Bundle format 2 = differenced target (numFeatures == windowSize-1).
    // Version-stamping lets load() distinguish "old format, retrain" from
    // genuine corruption — the generic M4 arity message misdiagnoses a
    // format change.
    props.setProperty("formatVersion", GbtLagModel.FormatVersion.toString)
    props.setProperty("windowSize", wrapped.windowSize.toString)
    props.setProperty("dataMin", bundle.scaler.dataMin.toString)
    props.setProperty("dataMax", bundle.scaler.dataMax.toString)
    val out = java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path, "scaler.properties"))
    try props.store(out, "graft forecaster bundle") finally out.close()
  }

  /** Load a persisted pair; validates model arity against the stored
    * window size (M4 — the reference refuses a model whose n_features
    * disagrees with its lag window, app.py:214-217).
    */
  def load(spark: SparkSession, path: String): Forecaster.Bundle = {
    val m = GBTRegressionModel.load(s"$path/gbt")
    val props = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(path, "scaler.properties"))
    try props.load(in) finally in.close()
    val windowSize = props.getProperty("windowSize").toInt
    // Pre-versioning bundles (format 1, undifferenced target) carry no
    // formatVersion key: fail with the actionable message, not M4's.
    val fmt = Option(props.getProperty("formatVersion")).map(_.toInt).getOrElse(1)
    require(fmt == GbtLagModel.FormatVersion,
      s"bundle format $fmt predates the differenced-target format " +
        s"${GbtLagModel.FormatVersion}: retrain and re-save the bundle")
    // M4: the differenced model takes windowSize - 1 features
    require(m.numFeatures == windowSize - 1,
      s"model expects ${m.numFeatures} features but bundle window is $windowSize") // M4
    Forecaster.Bundle(Wrapped(m, windowSize),
      Forecaster.MinMaxScaler(props.getProperty("dataMin").toDouble,
        props.getProperty("dataMax").toDouble))
  }
}
