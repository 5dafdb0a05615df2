package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 probe: g2 edge-table strategies (persist vs lazy) and a lean g3
  * (degrees pre-joined once, left-join dropped via the symmetric-
  * incidence argument). Dev tool.
  */
object G2G3Probe extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def time(tag: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.mode("overwrite").format("noop").save()
    println(f"[g23] $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
  spark.range(1000000).selectExpr("sum(id)").collect()

  // g2 with a LAZY edge table (no persist, no managed checkpoint)
  def g2Lazy(): DataFrame = {
    val edges = graft.ext.Graph.coOrderEdges(spark, dir)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      labels = edges
        .join(broadcast(labels.select(col("node").as("src"), col("label"))),
          "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).cast("long").as("label"))
    }
    labels.select(col("node").as("part_key"), col("label"))
  }

  // lean g3: pdeg/odeg pre-joined into the incidence ONCE; left join
  // dropped (all parts appear in partIn — every ord is in orderMass).
  def g3Lean(): DataFrame = {
    val inc = graft.ext.Graph.orderPartEdges(spark, dir)
    val pdeg = inc.groupBy("part").agg(count(lit(1)).as("pd"))
    val odeg = inc.groupBy("ord").agg(count(lit(1)).as("od"))
    val incP = inc.join(pdeg, "part")
    val incO = inc.join(odeg, "ord")
    var pr = pdeg.select(col("part"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      val orderMass = incP
        .join(pr, "part")
        .select(col("ord"), expr("pr div pd").as("share"))
        .groupBy("ord")
        .agg(sum(col("share")).as("om"))
      pr = incO
        .join(orderMass, "ord")
        .select(col("part"), expr("om div od").as("share"))
        .groupBy("part")
        .agg(sum(col("share")).as("in_pr"))
        .select(col("part"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"))
    }
    pr.select(col("part").as("part_key"), col("pr").as("pr_micro"))
  }

  // g4 with NO per-round eager checkpoints — 3 fixed rounds, lazy,
  // AQE stage reuse dedupes the loop-invariant inc subtrees.
  def g4Lazy(): DataFrame = {
    val inc = graft.ext.Graph.orderPartEdges(spark, dir)
    def majority(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(key)
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col(key), (-col("m.nl")).cast("long").as("label"))
    var labels = inc.select(col("part")).distinct()
      .withColumn("label", col("part"))
    for (_ <- 1 to 3) {
      val ordLabels = majority(inc.join(labels, "part"), "ord")
      labels = majority(inc.join(ordLabels, "ord"), "part")
    }
    labels.select(col("part").as("part_key"), col("label"))
  }
  // g2 lazy edges + managed eager checkpoint of the node-sized result
  def g2LazyMng(): DataFrame = {
    val out = g2Lazy()
    val pinned = out.localCheckpoint(true)
    pinned
  }
  for (_ <- 1 to 2) {
    time("g2 cur (persist+mng)") { graft.ext.Graph.labelProp(spark, dir, 3) }
    time("g2 lazy             ") { g2Lazy() }
    time("g2 lazy+mng         ") { g2LazyMng() }
    time("g3 cur              ") { graft.ext.Graph.pageRankBipartite(spark, dir, 3) }
    time("g3 lean             ") { g3Lean() }
    time("g4 cur              ") { graft.ext.Graph.labelPropBipartite(spark, dir, 3) }
    time("g4 lazy             ") { g4Lazy() }
  }
  val dE = graft.ext.Graph.labelPropBipartite(spark, dir, 3)
    .exceptAll(g4Lazy()).count()
  val dF = g4Lazy()
    .exceptAll(graft.ext.Graph.labelPropBipartite(spark, dir, 3)).count()
  println(s"[g23] g4 diff $dE/$dF")
  val dA = graft.ext.Graph.labelProp(spark, dir, 3).exceptAll(g2Lazy()).count()
  val dB = g2Lazy().exceptAll(graft.ext.Graph.labelProp(spark, dir, 3)).count()
  val dC = graft.ext.Graph.pageRankBipartite(spark, dir, 3)
    .exceptAll(g3Lean()).count()
  val dD = g3Lean()
    .exceptAll(graft.ext.Graph.pageRankBipartite(spark, dir, 3)).count()
  println(s"[g23] g2 diff $dA/$dB  g3 diff $dC/$dD")
  spark.stop()
}
