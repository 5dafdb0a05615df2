package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Round11Spec extends SparkSpec {

  test("ds1: dsir weights replay driver-side, no log-ratio sits on a " +
      "floor boundary, and the target slice self-scores higher") {
    val dir = sf("sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // exact integer frequency tables, as the operator builds them
    val occs = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(w => (id, lang == "en", w))
    }
    val freq = occs.groupBy(_._3).map { case (w, os) =>
      w -> (os.length.toLong, os.count(_._2).toLong)
    }
    val nq = freq.valuesIterator.map(_._1).sum
    val nt = freq.valuesIterator.map(_._2).sum
    val v = freq.size.toLong
    def lrMicro(qc: Long, tc: Long): Long = {
      val x = (math.log((tc + 1).toDouble / (nt + v)) -
        math.log((qc + 1).toDouble / (nq + v))) * 1000000
      // margin guard: the floor must not sit within 1e-6 of an integer
      // (500x a double ulp at this magnitude) — the t10 boundary risk
      assert(math.abs(x - math.rint(x)) > 1e-6 || x == math.rint(x),
        f"(qc=$qc, tc=$tc): $x%.9f on a floor boundary")
      math.floor(x).toLong
    }
    val expected = occs.groupBy(_._1).map { case (id, os) =>
      id -> ((os.length.toLong,
        os.map(o => { val (qc, tc) = freq(o._3); lrMicro(qc, tc) }).sum))
    }
    val got = TextAnalysis.dsirWeights(spark, dir, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == expected)
    // semantic sanity: the English slice should self-score higher on
    // average than the rest (it defines the target distribution)
    val byLang = docs.map { case (id, lang, _) =>
      (lang == "en", got(id)._2.toDouble) }
    val enMean = byLang.filter(_._1).map(_._2).sum /
      byLang.count(_._1)
    val restMean = byLang.filterNot(_._1).map(_._2).sum /
      byLang.count(p => !p._1)
    assert(enMean > restMean,
      s"target slice does not self-score higher: $enMean <= $restMean")
  }

  test("g2/labelProp is self-managing: edge cache released, at most the " +
      "result checkpoint stays pinned — WITHOUT a clearCache fallback") {
    val dir = sf("sf0.001")
    def pinnedIds() = spark.sparkContext.getPersistentRDDs.keySet
    val before = pinnedIds()
    val got = Graph.labelProp(spark, dir, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // unpersist is async; give it a bounded window, but NO clearCache —
    // the managed path must release its own edge cache (the r10 leak
    // specs needed the cached-frames exclusion exactly because it
    // didn't; this pins the fix)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def leakedNow(): Int = (pinnedIds() -- before).size
    var leaked = leakedNow()
    while (leaked > 1 && System.nanoTime() < deadline) {
      Thread.sleep(200)
      leaked = leakedNow()
    }
    val names = (pinnedIds() -- before).flatMap(id =>
      spark.sparkContext.getPersistentRDDs.get(id).map(r =>
        s"$id:${r.name}"))
    assert(leaked <= 1,
      s"$leaked RDDs still pinned after managed labelProp: $names")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d3/d7 candidate cap: non-binding cap reproduces the exact pair " +
      "set row-for-row (the d3c gate precondition)") {
    val dir = sf("sf0.01")
    val exact = pairSet(Dedup.prefixJaccardPairs(spark, dir,
      k = 3, jaccardMin = 0.4))
    val capped = pairSet(Dedup.prefixJaccardPairs(spark, dir,
      k = 3, jaccardMin = 0.4, candCap = 64))
    assert(capped == exact,
      s"cap=64 binds on sf0.01: ${(exact -- capped).size} dropped, " +
        s"${(capped -- exact).size} spurious")
    val wExact = pairSet(Dedup.winnowPairs(spark, dir))
    val wCapped = pairSet(Dedup.winnowPairs(spark, dir, candCap = 64))
    assert(wCapped == wExact)
  }

  test("d3 candidate cap, binding: sound subset, unchanged jaccards, " +
      "and high doc coverage under the overlap ranking") {
    val dir = sf("sf0.01")
    val exact = Dedup.prefixJaccardPairs(spark, dir, k = 3,
      jaccardMin = 0.4)
    val capped = Dedup.prefixJaccardPairs(spark, dir, k = 3,
      jaccardMin = 0.4, candCap = 2)
    val e = pairSet(exact)
    val c = pairSet(capped)
    assert(c.subsetOf(e), "capped emitted a pair the exact join does not")
    assert(c.size < e.size, "cap=2 did not bind — coverage check vacuous")
    // recall above the cap is heuristic (capCandidates Scaladoc): a doc
    // whose top-cap candidates all fail the verify loses its partners.
    // Pin that the overlap ranking keeps that loss rare even at the
    // aggressive cap=2 — ≥90% of paired docs keep at least one partner.
    val exactDocs = e.flatMap(p => Seq(p._1, p._2))
    val cappedDocs = c.flatMap(p => Seq(p._1, p._2))
    val coverage = cappedDocs.size.toDouble / exactDocs.size
    assert(cappedDocs.subsetOf(exactDocs))
    assert(coverage >= 0.9,
      f"only $coverage%.2f of paired docs kept a partner at cap=2")
    // jaccard values on surviving pairs are unchanged (same verify tail)
    val ej = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    capped.collect().foreach { r =>
      assert(ej((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
  }

  test("d3 candTokens truncation: sound subset, unchanged jaccards, " +
      "and bounded loss at the gate scale") {
    val dir = sf("sf0.01")
    val exact = Dedup.prefixJaccardPairs(spark, dir, k = 3,
      jaccardMin = 0.4)
    val trunc = Dedup.prefixJaccardPairs(spark, dir, k = 3,
      jaccardMin = 0.4, candCap = 64, candTokens = 16)
    val e = pairSet(exact)
    val t = pairSet(trunc)
    assert(t.subsetOf(e), "truncated path emitted a non-pair")
    // the P rarest df>=2 tokens retain the well-shared pairs; the loss
    // is the weak tail (pairs sharing only common tokens). Pin the
    // retention floor so a regression in the ranking shows up here.
    assert(t.size >= (e.size * 0.8).toInt,
      s"retention ${t.size}/${e.size} below 80%")
    val ej = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    trunc.collect().foreach { r =>
      assert(ej((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
  }

  test("g3: bipartite PageRank on a hand-traced path graph reaches its " +
      "integer fixpoint after one round") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-g3").toString
    // orders 10:(1,2), 20:(2,3) — part 2 bridges; traced by hand:
    // om1 = 1.5e6 both orders; p1/p3 = 150000 + (750000*85)//100,
    // p2 = 150000 + (1500000*85)//100; round 2 reproduces round 1
    Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.pageRankBipartite(spark, dir, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 787500L, 2L -> 1425000L, 3L -> 787500L), got)
  }

  test("g4: bipartite label propagation on the hand-traced g2 fixture " +
      "converges components without oscillation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-g4").toString
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 3L), (20L, 4L),
      (30L, 5L), (30L, 6L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.labelPropBipartite(spark, dir, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unlike clique-graph LPA (which oscillates on the {5,6} 2-cycle —
    // Round10Session5Spec), the two-hop pass is stable: an isolated
    // pair agrees through its shared order's majority
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L), got)
  }

  test("rrf1: hybrid fusion equals a driver-side replay of the two " +
      "ranked lists (integer RRF, full-outer semantics)") {
    val dir = sf("sf0.01")
    val lex = TextAnalysis.bm25TopK(spark, dir,
      terms = Seq("hash", "join", "scan"), k = 100).collect()
      .sortBy(r => (-r.getDouble(1), r.getLong(0)))
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1) }.toMap
    val sem = Similarity.cosineTopK(spark, dir, queryId = 0L, k = 100)
      .collect()
      .sortBy(r => (-r.getDouble(2), r.getLong(0)))
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1) }.toMap
    def term(r: Option[Int]): Long =
      r.map(x => 1000000000L / (60L + x)).getOrElse(0L)
    val expected = (lex.keySet ++ sem.keySet).toSeq
      .map(d => d -> (term(lex.get(d)) + term(sem.get(d))))
      .sortBy { case (d, s) => (-s, d) }
      .take(20)
    val got = Similarity.hybridRrfTopK(spark, dir,
      terms = Seq("hash", "join", "scan")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    // at least one doc must appear in both lists for the fusion to be
    // non-vacuous on this fixture
    assert((lex.keySet intersect sem.keySet).nonEmpty)
  }

  test("ds3: the Gumbel-top-k draw replays driver-side, sits off the " +
      "floor boundaries, and actually perturbs the pure-weight order") {
    val dir = sf("sf0.01")
    val w = TextAnalysis.dsirWeights(spark, dir, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), xxhash64(col("doc_id")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def gMicro(h: Long): Long = {
      val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
      val x = -math.log(-math.log(u)) * 1000000
      // floor-boundary margin (the t10 discipline): a draw within 1e-6
      // of an integer micro boundary could floor differently across
      // engines' ln implementations
      assert(math.abs(x - math.rint(x)) > 1e-6,
        f"doc hash $h: gumbel micro $x%.9f on a floor boundary")
      math.floor(x).toLong
    }
    val expected = w.toSeq
      .map { case (id, wm) => (id, wm + gMicro(hs(id))) }
      .sortBy { case (id, key) => (-key, id) }.take(64)
    val got = graft.queries.ExtQueries.ds3DsirResample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // the noise is live: the draw must differ from pure-weight top-64
    val pure = w.toSeq.sortBy { case (id, wm) => (-wm, id) }
      .take(64).map(_._1)
    assert(got.map(_._1) != pure,
      "gumbel draw degenerated to the deterministic weight order")
  }

  test("ct2: semantic contamination equals a driver-side brute force " +
      "over the frozen eval slice") {
    val dir = sf("sf0.01")
    val h2 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        substring(md5(col("text")), 1, 2).as("h2")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val evals = embs.keys.filter(id => h2(id) < "10").toSeq.sorted
      .map(embs)
    val expected = embs.keys.filter(id => h2(id) >= "10").toSeq.flatMap {
      id =>
        val r6s = evals.map(q => r6(cos(embs(id), q)))
        val hits = r6s.count(_ >= 0.32).toLong
        if (hits >= 1) Some(id -> ((hits, r6s.max))) else None
    }.toMap
    val got = graft.queries.ExtQueries.ct2SemanticContamination(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "threshold flags nothing — spec vacuous")
    // no eval doc leaks into the flagged set
    assert(got.keys.forall(id => h2(id) >= "10"))
  }

  test("mmr1: unrolled greedy equals a driver-side integer MMR replay " +
      "and actually diversifies vs pure relevance") {
    val dir = sf("sf0.01")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def micro(x: Double): Long = math.floor(x * 1000000 + 0.5).toLong
    val q = embs(0L)
    val cands = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(50).map(_._1)
    val rel = cands.map(id => id -> micro(cos(embs(id), q))).toMap
    var picked = Vector.empty[Long]
    while (picked.size < 10) {
      val best = cands.filterNot(picked.contains).map { c =>
        val sims = picked.map(p => micro(cos(embs(c), embs(p))))
        val ms = if (sims.isEmpty) 0L else sims.max
        (7L * rel(c) - 3L * ms, c)
      }.minBy { case (s, id) => (-s, id) }
      picked :+= best._2
    }
    val got = Similarity.mmrTopK(spark, dir).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1)).toVector
    assert(got == picked, s"got=$got expected=$picked")
    // diversity is non-vacuous on this fixture: the MMR order must
    // differ from the pure-relevance prefix
    assert(got != cands.take(10).toVector)
  }

  test("managed and lazy labelProp agree exactly") {
    val dir = sf("sf0.001")
    val managed = Graph.labelProp(spark, dir, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lazyRun = Graph.labelProp(spark, dir, iters = 3, managed = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(managed == lazyRun)
  }
}
