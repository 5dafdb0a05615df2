package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume probe for the d7 capped miner (r14): the sf100 probe
  * VERDICT r13 item 6 asked for died twice filling the box's scratch
  * disk, so before re-running blind, measure WHERE the bytes go at sf10 —
  * per-stage shuffle write/read plus spill — and extrapolate. The capped
  * SNM slider emits ≤ cap pair rows per posting; between sf10 and sf100
  * ScaleGen's replication pushes every bucket past cap saturation, so the
  * emitted-pair volume is the suspect.
  *
  * Usage: runMain graft.tools.D7ShuffleProbe [sfDir]
  */
object D7ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "1024")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "zstd"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long,
        Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        stages.add((e.stageInfo.stageId,
          e.stageInfo.name.takeWhile(_ != '\n').take(60),
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead,
          m.diskBytesSpilled, m.outputMetrics.bytesWritten)): Unit
      }
    })
    val t0 = System.nanoTime()
    graft.queries.ExtQueries.d7WinnowPairs(spark, dir)
      .write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    import scala.jdk.CollectionConverters._
    val rows = stages.asScala.toSeq.sortBy(_._1)
    var (w, r, sp) = (0L, 0L, 0L)
    println(f"${"stage"}%6s ${"shufWrite"}%12s ${"shufRead"}%12s " +
      f"${"diskSpill"}%12s  name")
    rows.foreach { case (id, name, sw, sr, spl, _) =>
      w += sw; r += sr; sp += spl
      if (sw > 0 || sr > 0 || spl > 0)
        println(f"$id%6d ${sw / 1e9}%11.2fG ${sr / 1e9}%11.2fG " +
          f"${spl / 1e9}%11.2fG  $name")
    }
    println(f"TOTAL shuffleWrite=${w / 1e9}%.2f GB shuffleRead=" +
      f"${r / 1e9}%.2f GB diskSpill=${sp / 1e9}%.2f GB sec=$sec%.1f " +
      s"dir=$dir")
    spark.stop()
  }
}
