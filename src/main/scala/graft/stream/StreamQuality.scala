package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stateless streaming QUALITY gate — the streaming mirror of the
  * composed pipeline's stage 1 (Gopher integer rules + char-entropy
  * floor), sitting in FRONT of the stateful dedup gates
  * ([[StreamDedup]]/[[StreamNearDup]]/[[StreamSemDedup]]): pure
  * codegen'd projections, no watermark, no state, so it filters at
  * scan speed and shrinks everything downstream.
  *
  * Both predicates are the SAME code paths the batch operators
  * evaluate ([[graft.ext.TextAnalysis.gopherKeptSql]] /
  * [[graft.ext.TextAnalysis.withEntNano]]) — StreamQualitySpec pins that
  * a document stream filtered here equals the batch-gated set exactly.
  */
object StreamQuality {

  /** Filter a (… text …) stream to quality survivors. `minWords` is
    * forwarded to the Gopher rule (benches over short synthetic
    * fixtures relax it; production keeps the published 30).
    *
    * PRECONDITION (fail loudly, never clobber): the entropy scorer
    * stages through the reserved `__ent_*`/`__q_ent` temp columns and
    * this gate drops them afterwards — an input stream that already
    * carries a same-named column would be silently overwritten, so it
    * is rejected up front instead.
    */
  def qualityGate(stream: DataFrame,
      entropyFloorNano: Long = 1500000000L,
      textCol: String = "text", minWords: Int = 30): DataFrame = {
    val clash = stream.columns
      .filter(c => c.startsWith("__ent_") || c == "__q_ent")
    require(clash.isEmpty,
      s"qualityGate: input columns ${clash.mkString(", ")} collide with " +
        "the gate's reserved temp columns (__ent_*, __q_ent) — rename " +
        "them before gating")
    graft.ext.TextAnalysis.withEntNano(stream, textCol, "__q_ent")
      .filter(
        expr(graft.ext.TextAnalysis.gopherKeptSql(textCol,
          minWords = minWords)) &&
          col("__q_ent") >= entropyFloorNano)
      .drop("__q_ent", "__ent_n")
  }
}
