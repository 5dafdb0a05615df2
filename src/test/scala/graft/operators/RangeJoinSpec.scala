package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("points land in exactly the intervals containing them, once each") {
    import spark.implicits._
    val intervals = Seq(
      (1L, ts(0), ts(100)),     // [0, 100)
      (2L, ts(50), ts(150)),    // overlaps interval 1
      (3L, ts(1000), ts(1100))
    ).toDF("iv_id", "start_ts", "end_ts")
    val points = Seq(
      (10L, ts(75)),   // in 1 and 2
      (11L, ts(100)),  // end-exclusive: only in 2
      (12L, ts(149)),  // in 2
      (13L, ts(150)),  // end-exclusive: nowhere
      (14L, ts(1000)), // start-inclusive: in 3
      (15L, ts(5000))  // nowhere
    ).toDF("pt_id", "pt_ts")
    // deliberately small granule: intervals span multiple granules and the
    // once-per-pair property must still hold
    val got = RangeJoin.pointsInIntervals(points, "pt_ts", intervals,
      "start_ts", "end_ts", granuleSeconds = 30L)
      .select("iv_id", "pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair emitted more than once")
    assert(got.toSet == Set(
      (1L, 10L), (2L, 10L), (2L, 11L), (2L, 12L), (3L, 14L)))
  }

  test("randomized cross-check against driver-side brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val ivs = (1 to 80).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, ts(s), ts(s + 1 + rnd.nextInt(400)))
    }
    val pts = (1 to 400).map(i => (100L + i, ts(rnd.nextInt(5500).toLong)))
    val got = RangeJoin.pointsInIntervals(
      pts.toDF("pt_id", "pt_ts"), "pt_ts",
      ivs.toDF("iv_id", "start_ts", "end_ts"), "start_ts", "end_ts",
      granuleSeconds = 97L) // deliberately unaligned granule width
      .select("iv_id", "pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expect = (for {
      (iv, s, e) <- ivs
      (p, t) <- pts
      if !t.before(s) && t.before(e)
    } yield (iv, p)).sorted
    assert(got == expect)
  }

  test("plan: granule equi-join, no nested loop") {
    import spark.implicits._
    val intervals = Seq((1L, ts(0), ts(100))).toDF("iv_id", "start_ts", "end_ts")
    val points = Seq((10L, ts(75))).toDF("pt_id", "pt_ts")
    val plan = RangeJoin.pointsInIntervals(points, "pt_ts", intervals,
      "start_ts", "end_ts").queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    assert(plan.collect { case j: BaseJoinExec => j }.nonEmpty)
    assert(plan.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: CartesianProductExec => c
    }.isEmpty, s"range join must not plan a nested loop:\n$plan")
  }
}
