package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpaceSavingSpec extends SparkSpec {

  test("below capacity: exact counts with zero error") {
    import spark.implicits._
    val df = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c")
    val rows = df.toDF("v").repartition(8)
      .agg(SpaceSaving.topK(col("v"), k = 3, capacity = 16).as("top"))
      .select(explode(col("top")).as("t"))
      .select("t.term", "t.cnt", "t.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 40L, 0L), ("b", 25L, 0L), ("c", 10L, 0L)))
  }

  test("over capacity: heavy hitters survive with bounded overestimates " +
    "across partition merges") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 2 heavy items (~1000 each) buried in 500 rare items (~4 each)
    val data = Seq.fill(1000)("HEAVY-A") ++ Seq.fill(900)("HEAVY-B") ++
      (1 to 2000).map(_ => s"rare-${rnd.nextInt(500)}")
    val shuffled = rnd.shuffle(data)
    val out = shuffled.toDF("v").repartition(16)
      .agg(SpaceSaving.topK(col("v"), k = 10, capacity = 100).as("top"))
      .select(explode(col("top")).as("t"))
      .select("t.term", "t.cnt", "t.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val byTerm = out.map(t => t._1 -> t).toMap
    // SpaceSaving guarantee: any item with freq > N/capacity is reported
    assert(byTerm.contains("HEAVY-A") && byTerm.contains("HEAVY-B"))
    // reported count overestimates truth by at most the recorded error
    for ((term, truth) <- Seq("HEAVY-A" -> 1000L, "HEAVY-B" -> 900L)) {
      val (_, cnt, err) = byTerm(term)
      assert(cnt >= truth, s"$term undercounted: $cnt < $truth")
      assert(cnt - err <= truth,
        s"$term count $cnt exceeds truth $truth by more than error $err")
    }
    // the two heavy items rank first
    assert(out.take(2).map(_._1).toSet == Set("HEAVY-A", "HEAVY-B"))
  }
}
