package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val left = {
    import spark.implicits._
    Seq(
      (1L, "u1", ts(100), 10.0), // after u1's t=50 click
      (2L, "u1", ts(200), 20.0), // exactly at u1's t=200 click (<= matches)
      (3L, "u1", ts(40), 30.0),  // before any click → null
      (4L, "u2", ts(500), 40.0)  // u2 has no clicks → null
    ).toDF("event_id", "user_id", "ts", "value")
  }

  private lazy val right = {
    import spark.implicits._
    Seq(
      ("u1", ts(50), 901L, 1.5),
      ("u1", ts(200), 902L, 2.5),
      ("u3", ts(10), 903L, 3.5)
    ).toDF("user_id", "c_ts", "click_id", "click_value")
  }

  private def runAsOf(tol: Option[Long] = None) =
    AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "c_ts",
      Seq("c_ts", "click_id", "click_value"), tol)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap // click_id

  test("leftAsOf matches the latest right row at or before each left time") {
    assert(runAsOf() == Map(
      1L -> Some(901L), // t=100 → click at 50
      2L -> Some(902L), // t=200 → click at 200 (equal time matches)
      3L -> None,       // t=40 → nothing before
      4L -> None))      // no clicks for u2
  }

  test("tolerance nulls out matches older than the bound") {
    // 1: 100-50=50 > 30 → dropped; 2: 200-200=0 <= 30 → kept
    assert(runAsOf(Some(30L)) == Map(
      1L -> None, 2L -> Some(902L), 3L -> None, 4L -> None))
  }

  test("innerAsOf drops unmatched left rows") {
    val ids = AsOfJoin.innerAsOf(left, right, Seq("user_id"), "ts", "c_ts",
      Seq("click_id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("plan: one key shuffle, no range nested-loop join") {
    // AQE off so executedPlan is the prepared plan (exchanges inserted,
    // no adaptive wrapper); sparkPlan is pre-EnsureRequirements
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "c_ts",
        Seq("click_id"))
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
      assert(plan.collect {
        case b: BroadcastNestedLoopJoinExec => b
        case c: CartesianProductExec => c
      }.isEmpty, s"as-of must not plan a nested-loop join:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 1,
        s"as-of should cost exactly one key exchange, got ${shuffles.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("left duplicates and per-key independence hold under random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ls = (1 to 300).map(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", ts(rnd.nextInt(1000).toLong), 0.0))
    val rs = (1 to 100).map(i =>
      (s"u${rnd.nextInt(5)}", ts(rnd.nextInt(1000).toLong), 1000L + i, 0.0))
      .distinct
      // unique per (key, time): keep max click_id
      .groupBy(t => (t._1, t._2)).values.map(_.maxBy(_._3)).toSeq
    val l = ls.toDF("event_id", "user_id", "ts", "value")
    val r = rs.toDF("user_id", "c_ts", "click_id", "click_value")
    val got = AsOfJoin.leftAsOf(l, r, Seq("user_id"), "ts", "c_ts",
      Seq("click_id")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(4)) -1L else x.getLong(4)))
      .toMap
    // brute-force reference on the driver
    val byKey = rs.groupBy(_._1)
    val expect = ls.map { case (id, u, t0, _) =>
      val cands = byKey.getOrElse(u, Nil).filter(!_._2.after(t0))
      id -> (if (cands.isEmpty) -1L
             else cands.maxBy(c => (c._2.getTime, c._3))._3)
    }.toMap
    assert(got == expect)
  }
}
