package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.ExtQueries

/** Round-6 additions: kNN recall floor (e3r), LSH skew caps, and the
  * invariant/operator query-set split.
  */
class Round6Spec extends SparkSpec {

  test("e3r: multi-table+probe kNN join clears the pinned recall floor") {
    // floor = 0.30; measured 0.39/0.31/0.36..0.43 across sf0.001..sf0.1
    // with nTables=4 + Hamming-1 probes (worst-case near-random vectors)
    assert(ExtQueries.e3rKnnRecall(spark, sf("sf0.01")).count() == 0L)
  }

  test("e3: multi-table candidates carry no duplicate (src, nb) pairs") {
    val dup = Similarity.knnJoin(spark, sf("sf0.01"), k = 3)
      .groupBy("src_id", "nb_id").count().filter(col("count") > 1).count()
    assert(dup == 0L)
  }
}
