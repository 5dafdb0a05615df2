package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the incremental-ingest equivalence: mining a new batch against
  * an existing corpus (new×corpus + new×new) unioned with the corpus's
  * own pairs must equal the full recompute over corpus ∪ new, exactly —
  * the property that lets a 100 TB pipeline pay O(batch) per ingest.
  */
class IncrementalDedupSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("incremental MinHash pairs + corpus pairs == full recompute") {
    val full = sf("sf0.001")
    val all = spark.read.parquet(s"$full/documents.parquet")
    val corpusDocs = all.filter(col("doc_id") % 5 =!= 0)
    val newDocs = all.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text")
    val corpusDir =
      java.nio.file.Files.createTempDirectory("graft-incr-mh").toString
    corpusDocs.write.mode("overwrite")
      .parquet(s"$corpusDir/documents.parquet")
    def mh(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullPairs = mh(Dedup.minhashLshPairs(spark, full))
    val corpusPairs = mh(Dedup.minhashLshPairs(spark, corpusDir))
    val corpusSigs = Dedup.minhashSignatures(
      Dedup.shingles(spark.read
        .parquet(s"$corpusDir/documents.parquet"), 5), 32)
    val incr = mh(Dedup.incrementalMinhashPairsOf(corpusSigs, newDocs))
    assert(fullPairs.nonEmpty && incr.nonEmpty,
      s"degenerate fixture: full=${fullPairs.size} incr=${incr.size}")
    assert((corpusPairs & incr).isEmpty)
    assert(corpusPairs ++ incr == fullPairs,
      s"full=${fullPairs.size} corpus=${corpusPairs.size} incr=${incr.size}")
  }

  test("incremental pairs + corpus pairs == full recompute, exactly") {
    val full = sf("sf0.001")
    val all = spark.read.parquet(s"$full/documents.parquet")
    // split 80/20 by id — corpus written out as its own table dir
    val corpusDocs = all.filter(col("doc_id") % 5 =!= 0)
    val newDocs = all.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text")
    val corpusDir =
      java.nio.file.Files.createTempDirectory("graft-incr").toString
    corpusDocs.write.mode("overwrite")
      .parquet(s"$corpusDir/documents.parquet")

    val fullPairs = pairSet(Dedup.simhashNearDupPairs(spark, full))
    val corpusPairs = pairSet(Dedup.simhashNearDupPairs(spark, corpusDir))
    val incr = pairSet(
      Dedup.incrementalSimhashPairs(spark, corpusDir, newDocs))

    assert(fullPairs.nonEmpty && incr.nonEmpty,
      s"degenerate fixture: full=${fullPairs.size} incr=${incr.size}")
    // the two sources partition the full pair set: corpus-internal pairs
    // from the previous run, everything touching the new batch from the
    // incremental miner
    assert((corpusPairs & incr).isEmpty,
      "incremental pairs must not re-emit corpus-internal pairs")
    assert(corpusPairs ++ incr == fullPairs,
      s"full=${fullPairs.size} corpus=${corpusPairs.size} incr=${incr.size}")
  }
}
