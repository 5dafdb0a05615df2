package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one home for the memoize-to-temp-parquet pattern every offline
  * artifact in this package uses (dedup pair graphs, cluster tables,
  * miner outputs, knn joins): build once per key, cache the PATH —
  * session-free, so a frame read from it is valid in any SparkSession
  * of the JVM (a cached DataFrame would be bound to the session that
  * built it). Keys are caller-prefixed ("pairs|", "knn|", …) into one
  * shared map so the discipline — and any future fix (cleanup, failed-
  * write handling) — lives in exactly one place.
  */
private[ext] object ArtifactCache {

  private val paths = CorpusMemos.register(
    new ConcurrentHashMap[String, String]())

  /** Parquet path for `key`, building via `write(out)` on first use. */
  def path(key: String)(write: String => Unit): String =
    paths.computeIfAbsent(key, _ => {
      val out = java.nio.file.Files
        .createTempDirectory("graft-artifact").toString
      write(out)
      out
    })

  /** The artifact as a frame — the common caller shape. */
  def frame(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    s.read.parquet(path(key)(out =>
      build.write.mode("overwrite").parquet(out)))
}
