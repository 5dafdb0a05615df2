package graft.stream

import org.apache.spark.sql.SparkSession

/** Shuffle/state partition sizing for streaming queries.
  *
  * The r9 ingest-gate measurement (BASELINE.md) established that at
  * micro-batch scale the dominant gate cost is PER-EPOCH FIXED, not
  * per-row: every epoch commits one state-store delta per
  * `spark.sql.shuffle.partitions` state partition and compiles the
  * foreachBatch plan, so a 2 000-row epoch spread over 32 core-count
  * partitions pays 32 state commits of ~60 rows each — the commit
  * overhead dwarfs the row work (380 docs/s at 32 partitions vs
  * 955 docs/s at 8, same data). The right size tracks the EPOCH VOLUME,
  * not the core count.
  *
  * NOTE: a streaming query's STATE partition count is fixed at first
  * start (it is baked into the checkpoint); this must run BEFORE
  * `.start()`, and restarting from an existing checkpoint keeps the
  * original count regardless. At 100 TB-scale ingest (millions of rows
  * per epoch) the clamp lands back on the parallelism ceiling and this
  * is a no-op — the tune only bites where it helps, at small epochs.
  */
object StreamTuning {

  /** Set `spark.sql.shuffle.partitions` to ~one partition per
    * `rowsPerPartition` rows of expected epoch volume, clamped to
    * [2, ceiling] where ceiling is the session default (the parallelism
    * already configured for batch work). Returns the chosen count.
    */
  def sizeShufflePartitionsForEpoch(spark: SparkSession,
      expectedEpochRows: Long, rowsPerPartition: Long = 500): Int = {
    val ceiling = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val chosen = math.max(2L,
      math.min(ceiling.toLong, expectedEpochRows / rowsPerPartition)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", chosen)
    chosen
  }
}
