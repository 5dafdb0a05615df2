package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed serving store: Parquet tables with merge-on-key (upsert) semantics.
  *
  * Replaces the reference's Elasticsearch serving layer (SURVEY.md §1.3).
  * The reference writes with `es.write.operation=upsert` keyed on an
  * application-generated `doc_id` (batch_processor.py:142-148) and
  * `es.write.operation=index` (overwrite-by-id) from streaming foreachBatch
  * (stream_processor.py:92-105). Both are idempotent-by-key; we reproduce
  * that with an anti-join merge + atomic directory swap:
  *
  *   new_table = old_table ANTI JOIN incoming ON key  UNION ALL  incoming
  *
  * written to a temp dir then renamed into place (crash-safe: the swap is a
  * rename; a re-run is idempotent because keys are deterministic).
  *
  * 100 TB posture: the anti-join shuffles both sides by key — at scale the
  * store should be day-partitioned (see [[upsertPartitioned]]) so a merge
  * touches only the partitions present in the incoming batch (partition
  * pruning on read, dynamic overwrite on write), not the whole table.
  */
final class ServingStore(val root: String)(implicit spark: SparkSession) {

  private def tableDir(table: String): Path = Paths.get(root, table)

  def exists(table: String): Boolean = {
    val dir = tableDir(table)
    Files.isDirectory(dir) &&
      Files.list(dir).anyMatch(p => p.getFileName.toString.endsWith(".parquet") ||
        p.getFileName.toString.startsWith("part-") || Files.isDirectory(p))
  }

  /** Read a table; empty DataFrame with the given schema if absent. */
  def table(name: String): DataFrame = {
    require(exists(name), s"ServingStore table '$name' does not exist under $root")
    spark.read.parquet(tableDir(name).toString)
  }

  def tableOr(name: String, fallback: => DataFrame): DataFrame =
    if (exists(name)) table(name) else fallback

  /** Upsert `incoming` into `name` keyed on `keyCol`. Last write wins per
    * key within a batch is resolved by the caller (incoming must be unique
    * per key — enforced here with dropDuplicates on the key for safety, as
    * ES bulk upsert also collapses to one doc per id).
    */
  def upsert(name: String, keyCol: String, incoming: DataFrame): Unit = {
    val dir = tableDir(name)
    val incomingDedup = incoming.dropDuplicates(keyCol)
    val merged =
      if (!exists(name)) incomingDedup
      else {
        val old = spark.read.parquet(dir.toString)
        // keep old rows whose key is NOT being replaced
        old.join(incomingDedup.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(incomingDedup)
      }
    atomicSwapWrite(dir, merged)
  }

  /** Day-partitioned upsert for the chart-data table: the incoming batch
    * only touches the event-dates it contains, so we overwrite just those
    * partitions (the 100 TB path — a micro-batch never rewrites history).
    * Reproduces the reference's daily rolling index
    * `crypto_ohlcv_1m_chartdata-YYYY-MM-DD` (stream_processor.py:153-155),
    * but partitioned by EVENT date, not processing date (SURVEY.md §4.3.6).
    */
  def upsertPartitioned(name: String, keyCol: String, partCol: String,
      incoming: DataFrame): Unit = {
    val dir = tableDir(name)
    val incomingDedup = incoming.dropDuplicates(keyCol)
    if (!exists(name)) {
      incomingDedup.write.partitionBy(partCol)
        .mode(SaveMode.Overwrite).parquet(dir.toString)
    } else {
      val touched = incomingDedup.select(partCol).distinct()
        .collect().map(_.get(0))
      val old = spark.read.option("basePath", dir.toString)
        .parquet(dir.toString)
        .filter(col(partCol).isin(touched.toIndexedSeq: _*)) // partition-pruned scan
      val merged = old
        .join(incomingDedup.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(incomingDedup)
      // dynamic partition overwrite: replace only the touched partitions
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        // materialize first: the merge plan reads the partitions we are
        // about to overwrite
        val tmp = dir.resolveSibling(dir.getFileName.toString + ".staging")
        deleteRecursively(tmp)
        merged.write.partitionBy(partCol).mode(SaveMode.Overwrite)
          .parquet(tmp.toString)
        spark.read.option("basePath", tmp.toString).parquet(tmp.toString)
          .write.partitionBy(partCol).mode(SaveMode.Overwrite)
          .parquet(dir.toString)
        deleteRecursively(tmp)
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    }
  }

  /** Retention sweep: drop partitions of `name` whose `partCol` value is
    * strictly older than `keepFrom` (ISO date string). Reproduces the
    * reference's 2 h ILM delete on chartdata-* (README.md:74-82) as a
    * janitor job over partition directories — a pure metadata operation,
    * no data scan.
    */
  def dropPartitionsBefore(name: String, partCol: String, keepFrom: String): Unit = {
    val dir = tableDir(name)
    if (!Files.isDirectory(dir)) return
    Files.list(dir).forEach { p =>
      val fn = p.getFileName.toString
      if (fn.startsWith(partCol + "=") &&
          fn.stripPrefix(partCol + "=") < keepFrom) {
        deleteRecursively(p)
      }
    }
  }

  /** Append-log sink: O(batch) per micro-batch — each batch lands as new
    * files, duplicates (foreachBatch replays) are tolerated in the log and
    * removed by [[compact]] or at read time via [[tableDeduped]]. This is
    * the high-throughput streaming path: the merge-on-write [[upsert]]
    * costs O(partition) per batch, which dominates micro-batch latency
    * once partitions outgrow batches (measured in StreamBench).
    */
  def appendLog(name: String, incoming: DataFrame): Unit =
    incoming.write.mode(SaveMode.Append).parquet(tableDir(name).toString)

  /** Read the append-log with exactly-once semantics restored: keep one row
    * per key, newest file wins is not defined — so the log must be
    * value-deterministic per key (true for our doc_id-keyed candles, where
    * a replay writes identical values).
    */
  def tableDeduped(name: String, keyCol: String): DataFrame =
    table(name).dropDuplicates(keyCol)

  /** Compaction: rewrite the log as one deduped snapshot (run periodically
    * or by a janitor; readers see either the old or the new snapshot —
    * atomic swap).
    */
  def compact(name: String, keyCol: String): Unit =
    atomicSwapWrite(tableDir(name), tableDeduped(name, keyCol))

  /** Epoch-tagged append-log for UPDATE-mode sinks: each batch appends with
    * its epoch id; the latest epoch per key wins at read. This extends the
    * O(batch) log pattern to sinks whose values change per key (window
    * corrections), where plain dedup can't pick the newest.
    */
  def appendLogVersioned(name: String, incoming: DataFrame, epochId: Long): Unit =
    appendLog(name, incoming.withColumn("_epoch", lit(epochId)))

  /** Latest-epoch-wins read over a versioned log. */
  def tableLatestByEpoch(name: String, keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("_epoch").desc)
    table(name)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_epoch")
  }

  /** Compact a versioned log to its latest-epoch snapshot (epoch column
    * retained so further appends keep working).
    */
  def compactVersioned(name: String, keyCol: String): Unit = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("_epoch").desc)
    atomicSwapWrite(tableDir(name),
      table(name).withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn"))
  }

  /** Full overwrite (for `es.write.operation=index` complete-mode sinks on
    * tiny tables, e.g. latest-candle-per-symbol).
    */
  def overwrite(name: String, df: DataFrame): Unit =
    atomicSwapWrite(tableDir(name), df)

  /** Write df to `<dir>.staging`, then swap into place. The final rename is
    * atomic on POSIX; on failure the old table is intact.
    */
  private def atomicSwapWrite(dir: Path, df: DataFrame): Unit = {
    val staging = dir.resolveSibling(dir.getFileName.toString + ".staging")
    val retired = dir.resolveSibling(dir.getFileName.toString + ".retired")
    deleteRecursively(staging)
    deleteRecursively(retired)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (Files.exists(dir)) Files.move(dir, retired, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(retired)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
