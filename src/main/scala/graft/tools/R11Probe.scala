package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 scale probes (dev tool, not library surface): candidate
  * degree distributions and capped-vs-exact behavior for the d3/d7
  * exact-verify wall, and sf10 completion runs. Usage:
  *   sbt "runMain graft.tools.R11Probe <mode> <sfDir> [args...]"
  * modes: deg | d3 <cap> | d7 <cap>
  */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_MEM", "48g"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "deg" =>
        val p = graft.ext.Dedup
          .prefixJaccardPairs(spark, dir, k = 3, jaccardMin = 0.4)
        val deg = p.select(col("doc_a").as("d"))
          .unionAll(p.select(col("doc_b").as("d")))
          .groupBy("d").count()
        println(s"[probe] d3 pairs=${p.count()} " +
          s"maxdeg=${deg.agg(max("count")).head.getLong(0)}")
        val w = graft.ext.Dedup.winnowPairs(spark, dir)
        val wdeg = w.select(col("doc_a").as("d"))
          .unionAll(w.select(col("doc_b").as("d")))
          .groupBy("d").count()
        println(s"[probe] d7 pairs=${w.count()} " +
          s"maxdeg=${wdeg.agg(max("count")).head.getLong(0)}")
      case "d3" =>
        val cap = args(2).toInt
        val toks = args.lift(3).map(_.toInt).getOrElse(0)
        val t0 = System.nanoTime()
        val n = graft.ext.Dedup
          .prefixJaccardPairs(spark, dir, k = 3, jaccardMin = 0.4,
            candCap = cap, candTokens = toks)
          .count()
        println(s"[probe] d3 cap=$cap tokens=$toks pairs=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "d7" =>
        val cap = args(2).toInt
        val t0 = System.nanoTime()
        val n = graft.ext.Dedup.winnowPairs(spark, dir, candCap = cap)
          .count()
        println(s"[probe] d7 cap=$cap pairs=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "g3" =>
        val t0 = System.nanoTime()
        val n = graft.ext.Graph.pageRankBipartite(spark, dir).count()
        println(s"[probe] g3 rows=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "g4" =>
        val t0 = System.nanoTime()
        val n = graft.ext.Graph.labelPropBipartite(spark, dir).count()
        println(s"[probe] g4 rows=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "g1" =>
        val t0 = System.nanoTime()
        val n = graft.ext.Graph.pageRank(spark, dir).count()
        println(s"[probe] g1 rows=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "g4p" =>
        // interleaved A/B: stock labelPropBipartite vs a variant whose
        // incidence is hash-pre-partitioned on each hop's join key ONCE
        // (cached partitioning satisfies the join's distribution, so the
        // 60M-row side never re-exchanges; only the node-sized label
        // table shuffles per hop)
        import org.apache.spark.sql.DataFrame
        def majority(df: DataFrame, key: String): DataFrame =
          df.groupBy(col(key), col("label"))
            .agg(count(lit(1)).as("cnt"))
            .groupBy(key)
            .agg(max(struct(col("cnt"),
              (-col("label")).as("nl"))).as("m"))
            .select(col(key), (-col("m.nl")).cast("long").as("label"))
        def prepart(): Long = {
          val base = graft.ext.Graph.orderPartEdges(spark, dir)
          val incByPart = base.repartition(col("part")).persist()
          val incByOrd = base.repartition(col("ord")).persist()
          incByPart.count(); incByOrd.count()
          var labels = incByPart.select(col("part")).distinct()
            .withColumn("label", col("part"))
          for (_ <- 1 to 3) {
            val prev = labels
            val ordLabels = majority(incByPart.join(labels, "part"), "ord")
            labels = majority(incByOrd.join(ordLabels, "ord"), "part")
              .localCheckpoint(true)
            prev.unpersist(false)
          }
          val n = labels.count()
          incByPart.unpersist(false); incByOrd.unpersist(false)
          n
        }
        for (round <- 1 to 2) {
          val t0 = System.nanoTime()
          val a = graft.ext.Graph.labelPropBipartite(spark, dir).count()
          val t1 = System.nanoTime()
          val b = prepart()
          val t2 = System.nanoTime()
          println(f"[probe] g4p round=$round stock=${(t1 - t0) / 1e9}%.1f " +
            f"prepart=${(t2 - t1) / 1e9}%.1f rowsA=$a rowsB=$b")
        }
      case "curateab" =>
        // same-JVM interleaved A/B: delta with vs without the forced
        // decontamination broadcast, two rounds each, alternating
        val splitId = args(2).toLong
        val st = graft.ext.CuratePipeline.corpusState(spark, dir, splitId)
        for (round <- 1 to 2; bcast <- Seq(true, false)) {
          val t0 = System.nanoTime()
          val (delta, _) = graft.ext.CuratePipeline.curateDelta(spark, dir,
            st, decontamBroadcast = bcast)
          val n = delta.count()
          println(f"[probe] curateab round=$round bcast=$bcast rows=$n " +
            f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
        }
      case "curate" =>
        val splitId = args(2).toLong
        val t0 = System.nanoTime()
        val st = graft.ext.CuratePipeline.corpusState(spark, dir, splitId)
        val t1 = System.nanoTime()
        val (delta, dc) = graft.ext.CuratePipeline.curateDelta(spark, dir, st)
        val t2 = System.nanoTime()
        val (full, _) = graft.ext.CuratePipeline.curateFrozen(spark, dir,
          splitId)
        val t3 = System.nanoTime()
        println(s"[probe] curate split=$splitId " +
          s"prev=${st.prevFinal.count()} delta=${delta.count()} " +
          s"full=${full.count()} " +
          f"stateSec=${(t1 - t0) / 1e9}%.1f deltaSec=${(t2 - t1) / 1e9}%.1f " +
          f"fullSec=${(t3 - t2) / 1e9}%.1f " +
          s"deltaCounts=${dc.map(c => c.stage + ":" + c.docs).mkString(",")}")
      case "g4x" =>
        def t[A](tag: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"[probe] g4x $tag ${(System.nanoTime() - t0) / 1e9}%.1f")
          r
        }
        val inc = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("ord"), col("l_partkey").as("part"))
          .distinct().persist()
        t("inc")(inc.count())
        val labels0 = inc.select(col("part")).distinct()
          .withColumn("label", col("part"))
        val j = inc.join(labels0, "part")
        t("join")(j.count())
        val oc = j.groupBy(col("ord"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        t("oc")(oc.count())
        val o1 = oc.groupBy("ord")
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
          .select(col("ord"), (-col("m.nl")).cast("long").as("label"))
        t("o1")(o1.count())
        val pc = inc.join(o1, "ord").groupBy(col("part"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        val p1 = pc.groupBy("part")
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
          .select(col("part"), (-col("m.nl")).cast("long").as("label"))
        t("p1")(p1.count())
        t("p1-checkpoint")(p1.localCheckpoint(true).count())
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
