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
}
