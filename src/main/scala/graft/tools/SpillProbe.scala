package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.plans.{TopKPerGroup, TopKPerGroupExec}

/** Proves the TopKPerGroup spill machinery trips on REAL at-scale data
  * (VERDICT r5 item 6: at sf0.1 the thresholds never trigger, so spill
  * correctness rested on unit tests alone). Runs the grouped top-k over
  * the scaled documents corpus with a lowered row threshold, then walks
  * the executed plan and reports the spillCount metric — and re-runs the
  * same query UNCAPPED to assert the spilled result is identical.
  *
  * Usage: sbt "runMain graft.tools.SpillProbe [sfDir] [thresholdRows] [k]"
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf1")
    val threshold = args.lift(1).map(_.toInt).getOrElse(1000)
    val k = args.lift(2).map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off: its query-stage wrappers hide the TopKPerGroupExec nodes
      // from the metric walk, and it has no bearing on spill behavior
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"), col("n_chars"))
    def run(): (Long, Long, Array[org.apache.spark.sql.Row]) = {
      val df = TopKPerGroup.topK(docs, Seq("source"), "n_chars", k,
        desc = true, tiebreakCols = Seq("doc_id"))
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan
      val finalized = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val spills = finalized.collect {
        case e: TopKPerGroupExec => e.metrics("spillCount").value
      }
      (spills.sum, spills.length.toLong, rows)
    }

    spark.conf.set(TopKPerGroup.SpillThresholdKey, threshold.toString)
    val (spilled, nodes, rowsSpilled) = run()
    spark.conf.unset(TopKPerGroup.SpillThresholdKey)
    val (unspilled, _, rowsClean) = run()
    val same = rowsSpilled.map(_.toString).sorted
      .sameElements(rowsClean.map(_.toString).sorted)
    println(s"[spillprobe] sfDir=$sfDir thresholdRows=$threshold k=$k " +
      s"topkNodes=$nodes spillCount=$spilled cleanRunSpills=$unspilled " +
      s"rows=${rowsSpilled.length} resultsIdentical=$same")
    spark.stop()
    if (spilled <= 0 || !same) {
      System.err.println("[spillprobe] FAILED: expected spills > 0 and identical results")
      sys.exit(1)
    }
  }
}
