package graft.ml

import graft.SparkSpec

class GbtLagModelSpec extends SparkSpec {

  test("GBT lag model learns a deterministic pattern and drives the " +
    "recursive forecast (M2+M3 with real MLlib)") {
    // strictly periodic series: 0,1,2,3,0,1,2,3,... — a depth-3 tree
    // ensemble over a 4-lag window can learn it exactly
    val series = Array.tabulate(400)(i => (i % 4).toDouble)
    val scaler = Forecaster.MinMaxScaler.fit(series.toSeq)
    val scaled = series.map(scaler.transform)
    val model = GbtLagModel.train(spark, scaled, windowSize = 4)

    // one-step prediction accuracy on the pattern
    val pred = model.predict(Array(0.0, 1.0, 2.0, 3.0).map(scaler.transform))
    assert(math.abs(scaler.inverse(pred) - 0.0) < 0.1,
      s"expected ~0 after [0,1,2,3], got ${scaler.inverse(pred)}")

    // recursive multi-step: pattern continues for 8 steps
    val fc = Forecaster.recursiveForecast(model, scaler,
      series.takeRight(4), lastKnownMs = 0L, stepMs = 1000L, steps = 8)
    val expected = Seq(0.0, 1.0, 2.0, 3.0, 0.0, 1.0, 2.0, 3.0)
    fc.map(_.predictedPrice).zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 0.2, s"recursion diverged: got $got want $exp")
    }
  }

  test("bundle persistence round-trip: identical forecasts, M4 load validation") {
    val series = Array.tabulate(300)(i => 50.0 + (i % 5).toDouble)
    val trained = GbtLagModel.trainBundle(spark, series, windowSize = 5,
      maxIter = 5)
    val dir = java.nio.file.Files.createTempDirectory("gbt-bundle").toString
    GbtLagModel.save(trained, dir)
    val loaded = GbtLagModel.load(spark, dir)
    assert(loaded.scaler == trained.scaler, "scaler must round-trip exactly")
    assert(loaded.model.windowSize == 5)
    val tail = series.takeRight(5)
    val a = Forecaster.recursiveForecast(trained.model, trained.scaler, tail,
      0L, 1000L, steps = 6)
    val b = Forecaster.recursiveForecast(loaded.model, loaded.scaler, tail,
      0L, 1000L, steps = 6)
    assert(a == b, "loaded bundle must forecast identically to the trained one")
    // M4: a tampered windowSize fails arity validation at load
    val props = java.nio.file.Paths.get(dir, "scaler.properties")
    java.nio.file.Files.writeString(props,
      "windowSize=7\ndataMin=50.0\ndataMax=54.0\n")
    intercept[IllegalArgumentException] { GbtLagModel.load(spark, dir) }
  }
}
