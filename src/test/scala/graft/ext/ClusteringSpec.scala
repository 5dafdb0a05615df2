package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic clustering + SemDeDup (Clustering.scala): canonical-relabel
  * properties, the independent nearest-centroid invariant, and exact
  * drop/keep semantics on a constructed corpus where the right answer is
  * known without trusting k-means internals.
  */
class ClusteringSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("e4: every vector assigned once; cluster ids are member minima") {
    val a = Clustering.e4KmeansAssign(spark, d).cache()
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(a.count() == n, "one assignment row per vector")
    assert(a.select("vec_id").distinct().count() == n)
    // canonical labels: each cluster id IS the min vec_id of its members
    val bad = a.groupBy("cluster").agg(min("vec_id").as("mn"))
      .filter(col("mn") =!= col("cluster")).count()
    assert(bad == 0L, "cluster id != min member vec_id")
    val k = a.select("cluster").distinct().count()
    assert(k > 1 && k <= 10, s"expected 2..10 nonempty clusters, got $k")
  }

  test("e4v: assignments are nearest-centroid under the independent " +
      "HOF recomputation") {
    assert(Clustering.e4vKmeansNearest(spark, d).count() == 0L)
  }

  test("e5/e5v on the real fixture: invariant holds, drops reference " +
      "lower kept ids") {
    val drops = Clustering.e5SemanticDedup(spark, d).cache()
    assert(drops.filter(col("rep_id") >= col("drop_id")).count() == 0L,
      "a representative must have a lower id than what it replaces")
    assert(Clustering.e5vSemdedupSubset(spark, d).count() == 0L)
  }

  test("e5 exact semantics on a constructed corpus: identical vectors " +
      "dedup to the lowest id, orthogonal vectors survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sem-t").toString
    def oneHot(i: Int): Array[Float] = {
      val a = Array.fill(64)(0f); a(i) = 1f; a
    }
    // ids 0..9: mutually orthogonal (cosine 0 < tau, never dropped);
    // id 10 duplicates 0, id 11 duplicates 3 (cosine 1 — always in the
    // duplicate's cell, since identical points get identical distances)
    val rows = (0 to 9).map(i => (i.toLong, i, oneHot(i))) ++
      Seq((10L, 0, oneHot(0)), (11L, 3, oneHot(3)))
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Clustering.e5SemanticDedup(spark, dir)
      .select("drop_id", "rep_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 0L), (11L, 3L)), s"got $got")
  }
}
