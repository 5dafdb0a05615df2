package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, SkewSafe}

/** Stage decomposition of the e3 kNN join at scale — which of the four
  * stages (bucket build, candidate pair generation + distinct, embedding
  * re-attach + cosine, top-k) owns the sf10 wall-clock. Mirrors
  * [[Similarity.knnJoin]]'s exact shapes; not on any gate path.
  *
  * Usage: tools/jrun.sh graft.tools.E3Decomp [sfDir]
  */
object E3Decomp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "1024")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[e3decomp] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val planes = Similarity.resolveKnnPlanes(spark, dir, 0)
    val tables = Similarity.resolveKnnTables(spark, dir, 0)
    println(s"[e3decomp] planes=$planes tables=$tables")
    val b = Similarity.lshBucketsMulti(spark, dir, planes, tables)
      .select("vec_id", "table_id", "bucket")
    time("1-buckets")(b.write.mode("overwrite").format("noop").save())
    val probes = array((Seq(col("bucket")) ++ (0 until planes).map(i =>
      col("bucket").bitwiseXOR(lit(1L << i)))): _*)
    val l = b.select(col("vec_id").as("src_id"), col("table_id"),
      explode(probes).as("bucket"))
    val r = b.select(col("vec_id").as("nb_id"), col("table_id"),
      col("bucket"))
    val rawPairs = SkewSafe.cappedEquiJoin(l, r, Seq("table_id", "bucket"),
        xxhash64(col("nb_id")), cap = 1024)
      .filter(col("src_id") =!= col("nb_id"))
      .select("src_id", "nb_id")
    val nRaw = time("2-rawpairs")(rawPairs.count())
    println(s"[e3decomp] raw candidate rows = $nRaw")
    val pairs = rawPairs.distinct()
    val nPairs = time("3-distinct")(pairs.count())
    println(s"[e3decomp] deduped pairs = $nPairs")
    val pairsCp = pairs.localCheckpoint(true)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        graft.functions.Expressions.normF(col("embedding")).as("nrm"))
    val cand = pairsCp
      .join(e.select(col("vec_id").as("src_id"),
        col("embedding").as("src_emb"), col("nrm").as("src_nrm")),
        Seq("src_id"))
      .join(e.select(col("vec_id").as("nb_id"),
        col("embedding").as("nb_emb"), col("nrm").as("nb_nrm")),
        Seq("nb_id"))
      .select(col("src_id"), col("nb_id"),
        graft.functions.Expressions.cosinePreF(col("src_emb"),
          col("src_nrm"), col("nb_emb"), col("nb_nrm")).as("cosine"))
    time("4-attach-cosine")(
      cand.write.mode("overwrite").format("noop").save())
    val top = graft.plans.TopKPerGroup.topK(cand, Seq("src_id"), "cosine",
      3, desc = true, tiebreakCols = Seq("nb_id"))
    time("5-attach-cosine-topk")(
      top.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
