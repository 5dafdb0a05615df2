package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 decomposition probe: where do g1's warm seconds go?
  * Times the co-order edge build alone, then pageRank at 0..3
  * iterations, plus a stage/job count per run (AQE stage reuse is the
  * suspect — if marginal cost per iteration ≈ edge-build cost, lazy
  * unrolling is re-running the build per round). Dev tool.
  */
object G1Decomp extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  @volatile var jobs = 0
  @volatile var stages = 0
  spark.sparkContext.addSparkListener(
    new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; stages += j.stageInfos.size
      }
    })
  def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
    jobs = 0; stages = 0
    val t0 = System.nanoTime()
    f.write.mode("overwrite").format("noop").save()
    println(f"[g1d] $tag ${(System.nanoTime() - t0) / 1e9}%.2f " +
      s"jobs=$jobs stages=$stages")
  }
  // warmup
  spark.range(1000000).selectExpr("sum(id)").collect()
  // Candidate rewrite: deg pre-joined into the edge table ONCE
  // (loop-invariant), final left-join dropped (symmetric graph: the
  // dst set IS the node set, so the left join keeps nothing extra).
  def pr3Lean(): org.apache.spark.sql.DataFrame = {
    val edges = graft.ext.Graph.coOrderEdges(spark, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(deg, "src")
    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      pr = ed
        .join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst")
        .agg(sum(col("share")).as("in_pr"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"))
    }
    pr.select(col("node").as("part_key"), col("pr").as("pr_micro"))
  }
  for (_ <- 1 to 2) {
    time("pr3 cur  ") { graft.ext.Graph.pageRank(spark, dir, 3) }
    time("pr3 lean ") { pr3Lean() }
  }
  // exactness check: same rows?
  val cur = graft.ext.Graph.pageRank(spark, dir, 3)
  val lean = pr3Lean()
  val d1 = cur.exceptAll(lean).count()
  val d2 = lean.exceptAll(cur).count()
  println(s"[g1d] exceptAll cur-lean=$d1 lean-cur=$d2")
  spark.stop()
}
