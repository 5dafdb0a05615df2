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

  test("forecast quality: GBT beats persistence RMSE on held-out hours " +
    "(seasonal series)") {
    // hourly shape a lag model can exploit: daily + weekly cycles, mild
    // trend, small deterministic noise
    val rnd = new scala.util.Random(7)
    val series = Array.tabulate(600) { i =>
      100.0 + 8.0 * math.sin(2 * math.Pi * i / 24.0) +
        3.0 * math.sin(2 * math.Pi * i / 168.0) +
        0.02 * i + rnd.nextGaussian() * 0.4
    }
    val split = 500 // train on the first 500 h, hold out the last 100 h
    val bundle = GbtLagModel.trainBundle(spark, series.take(split),
      windowSize = 24)
    val gbt = Forecaster.oneStepRmse(bundle.model, bundle.scaler, series, split)
    val persist = Forecaster.oneStepRmse(
      Forecaster.PersistenceModel(24), bundle.scaler, series, split)
    assert(gbt <= persist,
      f"GBT RMSE $gbt%.3f worse than persistence $persist%.3f on held-out hours")
    // and not just barely: the cyclic structure should be genuinely learned
    assert(gbt <= 0.7 * persist,
      f"GBT RMSE $gbt%.3f did not materially beat persistence $persist%.3f")
  }

  test("forecast quality parity on the random-walk fixture (no train skew)") {
    // the OHLCV fixture series is a seeded random walk — persistence is
    // near-optimal there, so the pin is parity (no blow-up from scaling
    // bugs or train/serve skew), not superiority
    val closes = graft.ingest.FixtureGen
      .candles("BTC_USDT", 1720000000000L, 3600000L, 600)
      .map(_.close).toArray
    val split = 500
    val bundle = GbtLagModel.trainBundle(spark, closes.take(split),
      windowSize = 5)
    val gbt = Forecaster.oneStepRmse(bundle.model, bundle.scaler, closes, split)
    val persist = Forecaster.oneStepRmse(
      Forecaster.PersistenceModel(5), bundle.scaler, closes, split)
    assert(gbt <= 1.3 * persist,
      f"GBT RMSE $gbt%.3f blew past persistence $persist%.3f on the fixture walk")
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
      "formatVersion=2\nwindowSize=7\ndataMin=50.0\ndataMax=54.0\n")
    val m4 = intercept[IllegalArgumentException] { GbtLagModel.load(spark, dir) }
    assert(m4.getMessage.contains("features"), m4.getMessage)
    // a bundle saved BEFORE the differenced format (no formatVersion key)
    // fails with the retrain message, not M4's misdiagnosis
    java.nio.file.Files.writeString(props,
      "windowSize=5\ndataMin=50.0\ndataMax=54.0\n")
    val old = intercept[IllegalArgumentException] { GbtLagModel.load(spark, dir) }
    assert(old.getMessage.contains("retrain"), old.getMessage)
  }
}
