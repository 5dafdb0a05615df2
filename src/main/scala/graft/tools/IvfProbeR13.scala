package graft.tools
import org.apache.spark.sql.SparkSession
object IvfProbeR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01","/root/testdata/sf0.1")) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val nl = graft.ext.Similarity.autoNlist(n)
      println(s"[ivfprobe] == $dir n=$n autoNlist=$nl")
      val t0=System.nanoTime
      val x8v = graft.queries.ExtQueries.x8vIvfSubsetExact(spark, dir).count()
      // floor=2.0 forces the recall row out (recall < 2 always): the
      // probe wants the measured VALUE, not the violation check
      val x19r = graft.ext.ProductQuant.x19rIvfPqRecall(spark, dir, floor = 2.0)
        .collect().map(_.getDouble(1)).headOption.getOrElse(-1.0)
      val np = graft.ext.Similarity.autoNprobe(nl)
      println(f"[ivfprobe] nprobe=$np x8v_violations=$x8v x19r_recall=$x19r%.3f sec=${(System.nanoTime-t0)/1e9}%.1f")
    }
    spark.stop()
  }
}
