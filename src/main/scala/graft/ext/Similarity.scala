package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Expressions.{cosineF, dotF}

/** Similarity search over an embedding column (ArrayType(FloatType)) —
  * SURVEY.md §7.4. Brute-force cosine top-k as the exact baseline; a
  * random-hyperplane LSH bucketed variant as the 100 TB path (candidates
  * from matching signature buckets only, then exact re-rank).
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Exact top-k cosine neighbors of one query vector: broadcast the
    * single-row query side, score with the native dot expression (stays in
    * whole-stage codegen), TakeOrderedAndProject for the top-k — the fact
    * side is never shuffled. This is the pattern that scales: at 100 TB the
    * scan is embarrassingly parallel and only k rows reach the driver.
    */
  def cosineTopK(s: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 20): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosine", cosineF(col("embedding"), col("q_embedding")))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"),
        (floor(col("cosine") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .as("cosine_r6"))
  }

  /** Exact near-duplicate pairs by embedding cosine above a threshold.
    * All-pairs within blocks: at test scale a full self-join; the scale
    * path is [[lshBuckets]] candidates → this exact filter.
    */
  def cosineNearDupPairs(s: SparkSession, dir: String,
      minCosine: Double = 0.8): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    val l = e.alias("l")
    val r = e.alias("r")
    l.join(r, col("l.vec_id") < col("r.vec_id"))
      .withColumn("cosine", cosineF(col("l.embedding"), col("r.embedding")))
      .filter(col("cosine") >= minCosine)
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        (floor(col("cosine") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .as("cosine_r6"))
  }

  /** Exact near-duplicate pairs via an evenly-BLOCKED pair join — the
    * scale-safe shape for exact all-pairs similarity. An unconditioned
    * `a.id < b.id` self-join plans as BroadcastNestedLoopJoin: it must
    * broadcast one entire side (OOM at cluster scale) and pins the
    * quadratic work on however many partitions the stream side has.
    * Instead: hash every vector into one of `blocks` even blocks, build
    * the tiny ordered block-pair table {(i,j) : i ≤ j} on the driver
    * (B(B+1)/2 rows), and expand via two equi-joins:
    *
    *   vectors ⋈⟨blk=bi⟩ blockPairs ⋈⟨bj=blk⟩ vectors
    *
    * Each task scores one block-pair — n²/B² dot products, bounded memory
    * — and the B(B+1)/2 tasks spread evenly across the cluster (blocks
    * are hash-assigned, so no skew). Pair uniqueness: for bi < bj every
    * (l, r) combination is a distinct unordered pair; for bi = bj keep
    * l.vec_id < r.vec_id. Total work stays Θ(n²) dot products — exact
    * low-threshold similarity admits no complete sub-quadratic candidate
    * generator (at the 0.45 oracle threshold, hyperplane-LSH band recall
    * is ~42% per band — unusable) — but the plan is now two equi-joins
    * with no full-table broadcast and no single-task hotspot. For
    * realistic near-dup thresholds (≥0.85) use [[lshBuckets]] candidates.
    */
  def cosineNearDupPairsBlocked(s: SparkSession, dir: String,
      minCosine: Double = 0.8, blocks: Int = 16): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      .withColumn("blk", pmod(xxhash64(col("vec_id")), lit(blocks)).cast("int"))
    val blockPairs = (for { i <- 0 until blocks; j <- i until blocks }
      yield (i, j)).toDF("bi", "bj")
    val l = e.alias("l")
    val r = e.alias("r")
    l.join(broadcast(blockPairs), col("l.blk") === col("bi"))
      .join(r, col("bj") === col("r.blk"))
      .filter(col("bi") < col("bj") ||
        (col("bi") === col("bj") && col("l.vec_id") < col("r.vec_id")))
      .withColumn("cosine", cosineF(col("l.embedding"), col("r.embedding")))
      .filter(col("cosine") >= minCosine)
      .select(
        least(col("l.vec_id"), col("r.vec_id")).as("vec_a"),
        greatest(col("l.vec_id"), col("r.vec_id")).as("vec_b"),
        (floor(col("cosine") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .as("cosine_r6"))
  }

  /** Random-hyperplane LSH signature (Charikar 2002): `nPlanes` seeded
    * hyperplanes; bit i = sign(v · plane_i). Embeds as one integer bucket
    * key — cosine-close vectors collide with high probability.
    */
  def lshBuckets(s: SparkSession, dir: String, nPlanes: Int = 16,
      seed: Long = 42L): DataFrame = {
    val dim = 64 // embeddings fixture dim (TESTDATA.md)
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val planeCols = planes.map(p => array(p.toIndexedSeq.map(x => lit(x)): _*))
    val sigBits = planeCols.zipWithIndex.map { case (p, i) =>
      when(dotF(col("embedding"), p.cast("array<float>")) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }
    emb(s, dir).withColumn("bucket", sigBits.reduce(_ + _))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer (MLlib, seeded) →
    * each vector assigned to its nearest of `nlist` centroids → a query
    * probes the `nprobe` nearest centroid cells and exact-reranks inside.
    * At 100 TB the cell id is a partition/cluster key: the scan prunes to
    * nprobe/nlist of the corpus. Centroid training is distributed; the
    * tiny centroid table (nlist × dim floats) broadcasts to the probe.
    */
  def ivfTopK(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 20,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = emb(s, dir).withColumn("fv",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(e)
    val assigned = model.transform(e)
    val qRow = assigned.filter(col("vec_id") === queryId)
      .select("embedding", "fv").head()
    val qVec = qRow.getAs[org.apache.spark.ml.linalg.Vector]("fv")
    val cells = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        (i, org.apache.spark.ml.linalg.Vectors.sqdist(c, qVec))
      }
      .sortBy(_._2).take(nprobe).map(_._1)
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    assigned
      .filter(col("cell").isin(cells.toIndexedSeq.map(Integer.valueOf): _*) &&
        col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cosine", cosineF(col("embedding"), col("q_embedding")))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("cell"), col("cosine"))
  }

  /** ANN top-k via LSH: score only vectors in the query's bucket (plus
    * Hamming-1 neighbor buckets for recall), exact cosine re-rank inside.
    * At 100 TB: bucket column is a partition/cluster key → the scan prunes
    * to a handful of buckets instead of the full corpus.
    */
  def annTopK(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 20,
      nPlanes: Int = 16): DataFrame = {
    val b = lshBuckets(s, dir, nPlanes)
    val q = b.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"), col("bucket").as("q_bucket"))
    val neighborBuckets = array(
      (Seq(col("q_bucket")) ++
        (0 until nPlanes).map(i => col("q_bucket").bitwiseXOR(lit(1L << i)))): _*)
    b.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q.withColumn("cand_buckets", neighborBuckets)))
      .filter(array_contains(col("cand_buckets"), col("bucket")))
      .withColumn("cosine", cosineF(col("embedding"), col("q_embedding")))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("cosine"))
  }
}
