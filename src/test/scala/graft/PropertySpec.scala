package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.store.ServingStore

/** Property-style tests over seeded random inputs — the fixed-fixture
  * golden tests pin known answers; these check the algebraic properties on
  * arbitrary data.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("property: rolling SMA-7 equals a naive per-key scan on random series") {
    import spark.implicits._
    val rows = samples(
      for {
        key <- Gen.chooseNum(0, 3)
        ts <- Gen.chooseNum(0L, 1000L)
        v <- Gen.chooseNum(-1000, 1000)
      } yield (key, ts, v / 100.0 * 100 / 100.0), 300, 7L)
      .distinct
    val df = rows.toDF("k", "ts", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("ts"), col("v"))
      .rowsBetween(-6, 0)
    val got = df.withColumn("sma", avg(col("v")).over(w))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    // naive oracle
    rows.groupBy(_._1).foreach { case (k, grp) =>
      val sorted = grp.sortBy(t => (t._2, t._3))
      sorted.indices.foreach { i =>
        val lo = math.max(0, i - 6)
        val exp = sorted.slice(lo, i + 1).map(_._3).sum / (i - lo + 1)
        val key = (k, sorted(i)._2, sorted(i)._3)
        assert(math.abs(got(key) - exp) < 1e-9,
          s"SMA mismatch at $key: ${got(key)} vs $exp")
      }
    }
  }

  test("property: repeated keyed upserts converge to last-write-wins") {
    implicit val s = spark
    import spark.implicits._
    val store = new ServingStore(Files.createTempDirectory("prop-store").toString)
    val batches = samples(
      Gen.listOfN(8, for {
        k <- Gen.chooseNum(0, 9)
        v <- Gen.chooseNum(0, 10000)
      } yield (s"key$k", v)), 10, 99L)
    val expected = scala.collection.mutable.Map[String, Int]()
    batches.foreach { batch =>
      // within a batch ServingStore collapses dups arbitrarily — make the
      // batch unique per key first (like the reference's one-doc-per-id
      // bulk), keeping the LAST occurrence
      val uniq = batch.reverse.distinctBy(_._1)
      uniq.foreach { case (k, v) => expected(k) = v }
      store.upsert("t", "k", uniq.toDF("k", "v"))
    }
    val got = store.table("t").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == expected.toMap)
  }

  test("property: MinHash signature agreement estimates Jaccard within 0.25") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{MinHash, Shingle}
    val texts = samples(Gen.listOfN(60,
      Gen.oneOf("spark", "data", "table", "row", "hash", "scan", "agg",
        "join", "key", "col")).map(_.mkString(" ")), 12, 1234L)
    for (a <- texts.take(4); b <- texts.take(8) if a != b) {
      val sa = Shingle.hashes(UTF8String.fromString(a), 5)
      val sb = Shingle.hashes(UTF8String.fromString(b), 5)
      val setA = (0 until sa.numElements()).map(sa.getLong).toSet
      val setB = (0 until sb.numElements()).map(sb.getLong).toSet
      val trueJ = setA.intersect(setB).size.toDouble / setA.union(setB).size
      val k = 64
      val (ma, mb) = (MinHash.signature(sa, k), MinHash.signature(sb, k))
      val agree = (0 until k).count(i => ma.getLong(i) == mb.getLong(i))
      val estJ = agree.toDouble / k
      assert(math.abs(estJ - trueJ) < 0.25,
        s"minhash estimate $estJ too far from true $trueJ")
    }
  }

  test("property: GramHashArray aligns 1:1 with GramArray — same length," +
      " equal grams hash equal, unequal grams hash unequal (incl unicode)") {
    import spark.implicits._
    val gen = Gen.oneOf(
      Gen.stringOfN(40, Gen.oneOf('a', 'b', 'c', ' ')),
      Gen.stringOfN(30, Gen.oneOf('é', 'ü', '中', 'a')),
      Gen.stringOf(Gen.alphaNumChar))
    val texts = samples(gen, 60, 77L).filter(_.nonEmpty)
    val rows = texts.toDF("text")
      .select(
        graft.functions.Expressions.gramArray(col("text"), 5).as("g"),
        graft.functions.Expressions.gramHashArray(col("text"), 5).as("h"))
      .collect()
    val pairs = rows.flatMap { r =>
      val g = r.getSeq[String](0)
      val h = r.getSeq[Long](1)
      assert(g.length == h.length)
      g.zip(h)
    }
    // hash is a pure function of the gram text: one hash per gram, and
    // no two distinct grams collide on this sample
    val byGram = pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(byGram.values.forall(_.size == 1))
    val byHash = pairs.groupBy(_._2).view.mapValues(_.map(_._1).distinct)
    assert(byHash.values.forall(_.size == 1))
  }

  test("Morton zkey8 is a bijection on [0,256)^2 (exhaustive)") {
    import graft.functions.Morton
    val seen = new java.util.BitSet(65536)
    for (x <- 0L until 256L; y <- 0L until 256L) {
      val z = Morton.zkey8(x, y)
      assert(z >= 0L && z < 65536L, s"zkey8($x,$y)=$z out of range")
      assert(!seen.get(z.toInt), s"zkey8 collision at ($x,$y) -> $z")
      seen.set(z.toInt)
      assert(Morton.compact8(z >> 1) == x && Morton.compact8(z) == y,
        s"compact8 does not invert zkey8 at ($x,$y)")
    }
    assert(seen.cardinality() == 65536)
  }
}
