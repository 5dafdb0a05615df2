package graft.ext

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-pruned join — the runtime-filter pattern as an explicit,
  * composable operator.
  *
  * At 100 TB the expensive part of `fact ⨝ dim` is shuffling the fact
  * side: every fact row crosses the exchange, including the (often vast)
  * majority whose key has no match in the filtered dim. Spark's own
  * InjectRuntimeFilter does this transparently when statistics justify
  * it; this operator is the deterministic, caller-controlled form for
  * pipelines that KNOW the dim side is selective (e.g. joining 100 TB of
  * events against this week's flagged entities):
  *
  *   1. aggregate the dim keys into one bloom filter — a distributed
  *      TypedImperativeAggregate (partial buffers merge like any agg;
  *      ~`-n·ln(fpp)/ln²2` bits, 1.2 MB at 1M keys / 3% fpp), using the
  *      same codegen'd `BloomFilterAggregate` Spark's runtime filters use;
  *   2. embed the serialized filter in a `BloomFilterMightContain`
  *      predicate on the fact scan — evaluated BEFORE the exchange, so
  *      only possible matches (true positives + ≤ fpp false positives)
  *      are shuffled;
  *   3. run the real join, which removes the false positives.
  *
  * The result is row-identical to the plain join — the bloom can only
  * pass extra rows into the join, never drop a matching one (no false
  * negatives) — so the oracle for a pruned-join query is the plain SQL
  * join. Null fact keys: the filter may pass them (xxhash64 of null), the
  * join drops them, semantics unchanged.
  *
  * The materialized filter rides the closure as a binary literal, the
  * same way Spark's runtime filter materializes its bloom subquery
  * result; for multi-GB blooms prefer raising fpp over expectedItems.
  */
object BloomPrune {

  /** ~bits for `n` items at false-positive rate `fpp` (standard bloom
    * sizing formula, what `BloomFilter.create` uses internally).
    */
  private def optimalNumBits(n: Long, fpp: Double): Long =
    math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong

  /** The serialized bloom filter of `keys` (one binary value, built by a
    * distributed aggregate over the keyed column).
    */
  def buildFilter(dim: DataFrame, dimKey: Column, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(dimKey))),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp)))
    dim.agg(GraftBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** `fact` filtered to rows whose `factKey` MIGHT be in `dim`'s
    * `dimKey` set — the pre-shuffle pruning step. Safe to join afterwards
    * (no false negatives); do not use alone where exactness matters.
    *
    * Key types are coerced to the join's common type BEFORE hashing:
    * XxHash64 hashes an Int and a Long of the same value differently, so
    * hashing mismatched raw key types would produce false NEGATIVES (the
    * plain join would coerce and match; the bloom would prune) — the one
    * failure mode a bloom prune must never have.
    */
  def prunedFact(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val ft = fact.select(factKey).schema.head.dataType
    val dt = dim.select(dimKey).schema.head.dataType
    val (fk, dk) =
      if (ft == dt) (factKey, dimKey)
      else {
        val common = org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findTightestCommonType(ft, dt).getOrElse(
            throw new IllegalArgumentException(
              s"bloom prune: no common type for fact key $ft vs dim key $dt"))
        (factKey.cast(common.sql), dimKey.cast(common.sql))
      }
    val bf = buildFilter(dim, dk, expectedItems, fpp)
    if (bf == null) fact.limit(0) // empty dim: nothing can join
    else fact.filter(GraftBridge.column(BloomFilterMightContain(
      Literal(bf, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(fk))))))
  }

  /** Inner equi-join with the fact side bloom-pruned before the shuffle.
    * Row-identical to `fact.join(dim, factKey === dimKey)`.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, expectedItems: Long, fpp: Double = 0.03): DataFrame =
    prunedFact(fact, dim, factKey, dimKey, expectedItems, fpp)
      .join(dim, factKey === dimKey)
}
