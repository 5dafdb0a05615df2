package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-waste sweep: builds every SparkEntry query against a small SF
  * dir (no execution) and flags operators that are usually shuffle or
  * row-count waste at scale — Expand (multi-countDistinct), cartesian
  * products, broadcast nested-loop joins. Dev tool; findings feed
  * targeted rewrites. `sbt "runMain graft.tools.PlanLint [sfDir]"`.
  */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flags = Seq("Expand", "CartesianProduct", "BroadcastNestedLoopJoin")
    var clean = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val hits = flags.filter(plan.contains)
        if (hits.nonEmpty) println(s"[planlint] $name: ${hits.mkString(", ")}")
        else clean += 1
      } catch {
        case e: Throwable =>
          println(s"[planlint] $name: BUILD-ERROR ${e.getClass.getSimpleName}")
      }
    }
    println(s"[planlint] clean: $clean of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
