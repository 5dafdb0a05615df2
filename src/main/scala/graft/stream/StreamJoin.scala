package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-STREAM event-time interval join — the last piece of the
  * streaming surface the suite didn't exercise (stream-static joins:
  * [[StreamNearDup]]; windowed aggs + stateful ops: [[OhlcvStreamJob]] /
  * [[StatefulOps]]). Both sides are watermarked and the join carries a
  * time-range bound, so Spark buffers each side in the state store only
  * until the watermark proves no future match can arrive — bounded state
  * by construction, the property an unconstrained stream join lacks
  * (Spark rejects an un-watermarked append-mode stream-stream join
  * outright).
  */
object StreamJoin {

  /** views ⋈ purchases per user within `windowSec` AFTER the view — the
    * stream-stream form of the batch `f1_funnel_conversion` pair step
    * (f1/StatefulOps pick the FIRST pair; this emits every qualifying
    * pair, the relational join semantics). Late rows beyond the
    * watermark are dropped; buffered rows are evicted once the
    * watermark passes `v_ts + windowSec`.
    *
    * Input schemas: views(v_user LONG, v_ts TIMESTAMP, view_id LONG),
    * purchases(p_user LONG, p_ts TIMESTAMP, purchase_id LONG).
    */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
      delay: String = "10 seconds", windowSec: Long = 3600L): DataFrame = {
    val v = views.withWatermark("v_ts", delay)
    val p = purchases.withWatermark("p_ts", delay)
    v.join(p, expr(
      s"""v_user = p_user AND
          p_ts > v_ts AND
          p_ts <= v_ts + interval $windowSec seconds"""))
      .select("v_user", "view_id", "purchase_id", "v_ts", "p_ts")
  }
}
