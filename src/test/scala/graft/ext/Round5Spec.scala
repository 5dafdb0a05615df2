package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{CoreQueries, ExtQueries}

/** Round-5 additions: temperature mix, length histogram, SimHash band
  * completeness, TPC-H Q18/Q12 shapes.
  */
class Round5Spec extends SparkSpec {

  test("c5 temperature mix: quotas sum ~target and upweight rare sources") {
    val d = sf("sf0.01")
    val mix = ExtQueries.c5TemperatureMix(spark, d)
    val perSource = mix.groupBy("source")
      .agg(count(lit(1)).as("kept"), max("quota").as("quota")).collect()
    // floor in each quota loses < 1 row per source — bound by the TOTAL
    // source count (a source whose quota floors to 0 emits no output row)
    val nSources = spark.read.parquet(s"$d/documents.parquet")
      .select("source").distinct().count()
    val totalQuota = perSource.map(_.getLong(2)).sum
    assert(totalQuota <= 200 && totalQuota > 200 - nSources,
      s"quota total $totalQuota over $nSources sources")
    // kept == min(quota, n_source) per source; dedup determinism: rerun equal
    assert(perSource.forall(r => r.getLong(1) <= r.getLong(2)))
    val again = ExtQueries.c5TemperatureMix(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == mix.select("doc_id").collect().map(_.getLong(0)).toSet)
    // temperature flattens: rare sources keep a LARGER fraction than
    // dominant ones (sqrt weighting) — compare extremes
    val counts = spark.read.parquet(s"$d/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = perSource.map(r =>
      (counts(r.getString(0)), r.getLong(2).toDouble / counts(r.getString(0))))
    val rare = fracs.minBy(_._1)
    val dominant = fracs.maxBy(_._1)
    assert(rare._2 >= dominant._2,
      s"rare source kept ${rare._2}, dominant kept ${dominant._2}")
  }

  test("h1 histogram covers every doc exactly once") {
    val d = sf("sf0.01")
    val h = ExtQueries.h1LengthHistogram(spark, d).collect()
    val total = h.map(_.getLong(1)).sum
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(total == nDocs)
    assert(h.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 19))
    assert(h.forall(r => r.getLong(2) <= r.getLong(3)))
  }

  test("d8v: banded SimHash miner finds every Hamming<=3 pair (pigeonhole)") {
    assert(ExtQueries.d8vSimhashBandComplete(spark, sf("sf0.01")).count() == 0L)
  }

  test("e3 knn join: <=k neighbors per vector, ranked by cosine desc") {
    val rows = ExtQueries.e3KnnJoin(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, c) => c >= -1.0001 && c <= 1.0001 })
    rows.groupBy(_._1).foreach { case (src, ns) =>
      assert(ns.length <= 3, s"vector $src got ${ns.length} neighbors")
      assert(ns.map(_._2).distinct.length == ns.length,
        s"vector $src has duplicate neighbors")
    }
  }

  test("e3 multi-probe widens candidates: every same-bucket pair survives, coverage grows") {
    val d = sf("sf0.01")
    // defaults are probes=ON, tables=4 since r6 — pin the single-table
    // no-probe base explicitly so this stays a real comparison
    val base = Similarity.knnJoin(spark, d, k = 3, nPlanes = 8,
      hamming1Probes = false, nTables = 1)
    val probed = Similarity.knnJoin(spark, d, k = 3, nPlanes = 8,
      hamming1Probes = true, nTables = 1)
    val baseSrcs = base.select("src_id").distinct().count()
    val probedSrcs = probed.select("src_id").distinct().count()
    assert(probedSrcs >= baseSrcs,
      s"multi-probe covered $probedSrcs sources vs $baseSrcs")
    // per source, the probed top-1 cosine is never worse than same-bucket
    val b1 = base.groupBy("src_id").agg(max("cosine").as("c_base"))
    val p1 = probed.groupBy("src_id").agg(max("cosine").as("c_probe"))
    val worse = b1.join(p1, "src_id")
      .filter(col("c_probe") < col("c_base") - 1e-12).count()
    assert(worse == 0L, s"$worse sources regressed under multi-probe")
    // no duplicate (src, nb) pairs from the probe explosion
    assert(probed.groupBy("src_id", "nb_id").count()
      .filter(col("count") > 1).count() == 0L)
  }

  test("f2 cohort retention: offset-0 row covers every cohort user") {
    val d = sf("sf0.01")
    val ret = ExtQueries.f2CohortRetention(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ret.nonEmpty && ret.forall(_._2 >= 0))
    // every user appears in their own cohort's offset-0 cell
    val offset0 = ret.filter(_._2 == 0L).map(_._3).sum
    val nUsers = spark.read.parquet(s"$d/events.parquet")
      .select("user_id").distinct().count()
    assert(offset0 == nUsers, s"offset-0 total $offset0 != users $nUsers")
  }

  test("q18/q12 shapes return stable non-empty results") {
    val d = sf("sf0.001")
    val q18 = CoreQueries.q18LargeOrders(spark, d).collect()
    assert(q18.nonEmpty && q18.length <= 100)
    // every returned order genuinely exceeds the quantity threshold
    assert(q18.forall(_.getDouble(4) > 300))
    val q12 = CoreQueries.q12PriorityCounts(spark, d).collect()
    assert(q12.length == 3) // three return flags
    assert(q12.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 0))
  }
}
