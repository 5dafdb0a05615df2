package graft.stream

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Stream-stream interval join: qualifying pairs emitted across batches,
  * out-of-window pairs never, and the time bound keeps state bounded.
  */
class StreamJoinSpec extends SparkSpec {

  private val t0 = 1717200000000L
  private def ts(sec: Long) = new Timestamp(t0 + sec * 1000L)

  test("view-purchase interval join emits in-window pairs across batches," +
      " never out-of-window ones") {
    import spark.implicits._
    val views = MemoryStream[(Long, Timestamp, Long)](21)(
      implicitly, spark.sqlContext)
    val purchases = MemoryStream[(Long, Timestamp, Long)](22)(
      implicitly, spark.sqlContext)
    val joined = StreamJoin.viewPurchaseJoin(
      views.toDF().toDF("v_user", "v_ts", "view_id"),
      purchases.toDF().toDF("p_user", "p_ts", "purchase_id"),
      delay = "10 seconds", windowSec = 3600L)
    val q = joined.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ssj-ckpt").toString)
      .format("memory").queryName("ssj_out")
      .start()
    try {
      def rows() = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // batch 1: u1 views at t+0; u2 purchases at t+50 (no view yet)
      views.addData((1L, ts(0), 100L))
      purchases.addData((2L, ts(50), 900L))
      q.processAllAvailable()
      // batch 2: u1 purchases in-window (t+600); u2's view arrives AFTER
      // its purchase (t+100) — no pair (purchase must follow the view);
      // u3 view + out-of-window purchase (t+5000 > 3600)
      purchases.addData((1L, ts(600), 901L))
      views.addData((2L, ts(100), 101L), (3L, ts(0), 102L))
      purchases.addData((3L, ts(5000), 902L))
      q.processAllAvailable()
      assert(rows().toSet == Set((1L, 100L, 901L)), rows().mkString(","))
      // batch 3: u2 purchases again inside ITS view window -> pair;
      // a second in-window purchase for u1 joins too (every pair, not
      // first-only — the relational semantics)
      purchases.addData((2L, ts(200), 903L), (1L, ts(700), 904L))
      q.processAllAvailable()
      assert(rows().toSet == Set((1L, 100L, 901L), (2L, 101L, 903L),
        (1L, 100L, 904L)), rows().mkString(","))
    } finally q.stop()
  }
}
