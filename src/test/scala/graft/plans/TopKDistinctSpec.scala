package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r16 focused operator test: `TopKPerGroup.topK(distinctRows = true)`
  * must make top-k over a MULTISET equal top-k over its deduped set —
  * including through the partial-pass flush and the final pass's
  * spill-to-runs merge, where duplicates of one row arrive from
  * different partitions and different runs.
  */
class TopKDistinctSpec extends SparkSpec {

  private def multiset(seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // ~60 groups x ~40 distinct rows, each duplicated 1..6 times with
    // ties in the order column so the tiebreak is load-bearing
    val rows = for {
      g <- 0 until 60
      t <- 0 until 40
      dup <- 0 until (1 + rnd.nextInt(6))
    } yield (g.toLong, rnd.nextInt(12).toDouble, t.toLong)
    rnd.shuffle(rows).toDF("g", "score", "tb").repartition(16)
  }

  test("top-k(distinctRows) over a duplicated candidate multiset equals " +
      "top-k over the deduped set (in-memory path)") {
    val df = multiset(1)
    val got = TopKPerGroup.topK(df, Seq("g"), "score", 5,
      desc = true, tiebreakCols = Seq("tb"), distinctRows = true)
      .collect().map(_.toSeq).toSet
    val want = TopKPerGroup.topK(df.distinct(), Seq("g"), "score", 5,
      desc = true, tiebreakCols = Seq("tb"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.size == 60 * 5)
  }

  test("top-k(distinctRows) survives partial flushes and final-pass " +
      "spilled-run merges (duplicates folded across runs)") {
    val df = multiset(2)
    val want = TopKPerGroup.topK(df.distinct(), Seq("g"), "score", 5,
      desc = true, tiebreakCols = Seq("tb"))
      .collect().map(_.toSeq).toSet
    val old = spark.conf.getOption(TopKPerGroup.SpillThresholdKey)
    spark.conf.set(TopKPerGroup.SpillThresholdKey, "37")
    try {
      val got = TopKPerGroup.topK(df, Seq("g"), "score", 5,
        desc = true, tiebreakCols = Seq("tb"), distinctRows = true)
        .collect().map(_.toSeq).toSet
      assert(got == want)
    } finally old match {
      case Some(v) => spark.conf.set(TopKPerGroup.SpillThresholdKey, v)
      case None => spark.conf.unset(TopKPerGroup.SpillThresholdKey)
    }
  }

  test("distinctRows leaves already-distinct input untouched (flag is a " +
      "no-op on sets)") {
    val df = multiset(3).distinct()
    val a = TopKPerGroup.topK(df, Seq("g"), "score", 4,
      desc = false, tiebreakCols = Seq("tb"), distinctRows = true)
      .collect().map(_.toSeq).toSet
    val b = TopKPerGroup.topK(df, Seq("g"), "score", 4,
      desc = false, tiebreakCols = Seq("tb"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
