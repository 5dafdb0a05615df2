package graft.ext

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-pruned join: result identical to the plain join, the pruning
  * filter really sits on the fact side before the exchange, and the
  * pruned row count is bounded by matches + fpp of the rest.
  */
class BloomPruneSpec extends SparkSpec {

  private def factDim(n: Int) = {
    import spark.implicits._
    // fact keys 0..n-1, dim keeps multiples of 37 (selective)
    val fact = (0 until n).map(i => (i.toLong, i % 13)).toDF("fk", "v")
    val dim = (0 until n).filter(_ % 37 == 0)
      .map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    (fact, dim)
  }

  test("pruned join equals the plain join row-for-row") {
    val (fact, dim) = factDim(20000)
    val pruned = BloomPrune.prunedJoin(fact, dim, col("fk"), col("dk"),
        expectedItems = 1000L)
      .select("fk", "v", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(pruned == plain)
    assert(pruned.size == 20000 / 37 + 1)
  }

  test("pruning actually drops non-matching fact rows before the join") {
    val (fact, dim) = factDim(20000)
    val pruned = BloomPrune.prunedFact(fact, dim, col("fk"), col("dk"),
      expectedItems = 1000L, fpp = 0.01)
    val kept = pruned.count()
    val matches = 20000 / 37 + 1
    // no false negatives...
    assert(kept >= matches)
    // ...and ≤ matches + ~fpp of the rest (3σ slack on 1% of 19 459)
    assert(kept <= matches + (0.01 * 20000 * 3).toLong,
      s"bloom pruned too little: kept $kept of 20000 (want ≈$matches)")
  }

  test("the might_contain predicate sits in a Filter on the fact scan") {
    val (fact0, dim) = factDim(2000)
    // a real file scan: over a local Seq relation the optimizer folds the
    // filter into the LocalTableScan and there is no node to assert on
    val dir = java.nio.file.Files.createTempDirectory("bloom-fact").toString
    fact0.write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val q = BloomPrune.prunedFact(fact, dim, col("fk"), col("dk"), 1000L)
    val filters = q.queryExecution.sparkPlan.collect {
      case f: FilterExec if f.condition.exists(
        _.isInstanceOf[BloomFilterMightContain]) => f
    }
    assert(filters.nonEmpty,
      s"no BloomFilterMightContain filter in:\n${q.queryExecution.sparkPlan}")
  }

  test("mismatched key types coerce before hashing (no false negatives)") {
    import spark.implicits._
    // int fact key vs long dim key: raw xxhash64 would hash them
    // differently and prune every real match
    val fact = (0 until 1000).map(i => (i, i % 7)).toDF("fk", "v")
    val dim = (0 until 1000).filter(_ % 37 == 0)
      .map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val pruned = BloomPrune.prunedJoin(fact, dim, col("fk"), col("dk"), 100L)
      .select("fk").collect().map(_.getInt(0)).toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk").collect().map(_.getInt(0)).toSet
    assert(pruned == plain && plain.nonEmpty,
      s"type-mismatched keys lost matches: pruned=$pruned plain=$plain")
  }

  test("empty dim prunes everything") {
    val (fact, dim) = factDim(1000)
    assert(BloomPrune.prunedJoin(fact, dim.filter(col("dk") < 0),
      col("fk"), col("dk"), 10L).count() == 0)
  }
}
