package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Expressions.cosineF

/** Semantic clustering + SemDeDup-style semantic deduplication over the
  * embedding column — SURVEY.md §7.4 similarity/dedup extension (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"; the k-means-then-within-cluster-pairs design
  * is exactly how web-scale corpora are semantically deduped, because the
  * clustering bounds the pairwise stage to O(Σ n_c²) instead of O(n²)).
  *
  * OFFLINE BUILD / ONLINE QUERY split mirrors [[Similarity]]'s IVF: the
  * seeded k-means fit is a scheduled index job (memoized per
  * (dir, k, seed) in this JVM), the dedup query reads its artifact.
  *
  * Scale: cluster count k grows with the corpus so per-cluster size stays
  * bounded (SemDeDup runs k=110k on LAION); the within-cluster self-join
  * is an equi-join on the cell key, so Spark distributes it per cell and
  * AQE splits a skewed cell's sort-merge. Nothing here ever forms a
  * corpus-wide cross join.
  */
object Clustering {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private case class Built(path: String, dim: Int)

  private val built =
    CorpusMemos.register(
      new java.util.concurrent.ConcurrentHashMap[String, Built]())

  /** Most recent artifact (Verify runs one sf dir per JVM); lets
    * [[graft.SparkEntry.oracleSql]] emit DuckDB oracles for e4/e5 that
    * re-derive assignment + SemDeDup drops through the centroid parquet
    * this JVM wrote — the x14 dynamic-oracle pattern.
    */
  @volatile private var lastBuilt: Built = null

  /** Build (or reuse) the clustering artifact: `assign/` (vec_id, label,
    * cell) and `centroids/` (cell, centroid: array<double>).
    * `trainBelow` restricts the FIT to vec_id < x — the epoch-aware
    * index build (centroids are a versioned offline artifact; an
    * incremental ingest assigns new vectors to the CORPUS epoch's
    * centroids instead of refitting, [[CuratePipeline]] r11).
    */
  def clusterDir(s: SparkSession, dir: String, k: Int = 10,
      seed: Long = 42L, trainBelow: Option[Long] = None): String = {
    val b = built.computeIfAbsent(s"$dir|$k|$seed|${trainBelow.getOrElse(-1L)}",
      _ => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e0 = emb(s, dir)
      val e = trainBelow.fold(e0)(x => e0.filter(col("vec_id") < x))
        .withColumn("fv",
          array_to_vector(col("embedding").cast("array<double>")))
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val model = new KMeans().setK(k).setSeed(seed).setMaxIter(5)
        .setFeaturesCol("fv").setPredictionCol("cell")
        .fit(e)
      val out = java.nio.file.Files.createTempDirectory("graft-sem").toString
      model.transform(e).select("vec_id", "label", "cell")
        .write.parquet(s"$out/assign")
      import s.implicits._
      model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }.toIndexedSeq
        .toDF("cell", "centroid").coalesce(1)
        .write.parquet(s"$out/centroids")
      Built(out, dim)
    })
    lastBuilt = b
    b.path
  }

  /** DuckDB oracles for e4/e5, available once this JVM has built the
    * artifact: assignment is re-derived as the argmin centroid (QUALIFY
    * over the centroid table on disk — not MLlib's norm-trick distance),
    * canonical relabel and the within-cell SemDeDup drop set follow
    * relationally. Double arithmetic is element-ordered on both sides
    * (Vec.dot and DuckDB list_sum are sequential left folds), so the
    * cosines compare exactly.
    */
  def oracleEntries(tau: Double = 0.35): Seq[(String, String)] =
    Option(lastBuilt).toSeq.flatMap { b =>
      val dim = b.dim
      def sq(e1: String, e2: String): String =
        s"""list_sum(list_transform(range(1, ${dim + 1}),
           |  i -> (CAST($e1[i] AS DOUBLE) - $e2[i])
           |     * (CAST($e1[i] AS DOUBLE) - $e2[i])))""".stripMargin
      def dot(e1: String, e2: String): String =
        s"""list_sum(list_transform(range(1, ${dim + 1}),
           |  i -> CAST($e1[i] AS DOUBLE) * CAST($e2[i] AS DOUBLE)))"""
          .stripMargin
      val assignCte =
        s"""books AS (
             SELECT cell, centroid
             FROM read_parquet('${b.path}/centroids/*.parquet')),
           scored AS (
             SELECT e.vec_id, b.cell, ${sq("e.embedding", "b.centroid")} AS d2
             FROM embeddings e CROSS JOIN books b),
           assign AS (
             SELECT vec_id, cell FROM scored
             QUALIFY row_number() OVER (
               PARTITION BY vec_id ORDER BY d2, cell) = 1)"""
      val cos = s"""(${dot("e1.embedding", "e2.embedding")}
        / (sqrt(${dot("e1.embedding", "e1.embedding")})
         * sqrt(${dot("e2.embedding", "e2.embedding")})))"""
      Seq(
        "e4_kmeans_assign" ->
          s"""WITH $assignCte,
             canon AS (SELECT cell, min(vec_id) AS cluster
                       FROM assign GROUP BY cell)
             SELECT a.vec_id, c.cluster
             FROM assign a JOIN canon c USING (cell)""",
        "e5_semantic_dedup" ->
          s"""WITH $assignCte,
             pairs AS (
               SELECT a1.vec_id AS l_id, a2.vec_id AS r_id,
                      a1.cell AS cell, $cos AS cos
               FROM assign a1
               JOIN assign a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
               JOIN embeddings e1 ON e1.vec_id = a1.vec_id
               JOIN embeddings e2 ON e2.vec_id = a2.vec_id)
             SELECT r_id AS drop_id, min(l_id) AS rep_id, cell
             FROM pairs WHERE cos >= $tau GROUP BY r_id, cell""")
    }

  /** Assign arbitrary embeddings to the NEAREST centroid of an existing
    * codebook — the online half of the offline/online split, shared by
    * every epoch-aware curation path so prev/delta/full runs assign
    * identically (MLlib's stored assignment is NOT reused here: the
    * incremental contract needs one deterministic assignment function
    * applied to all epochs). Distance is the e4v SQL shape
    * (zip_with + aggregate, sequential left fold — engine-exact);
    * ties break to the smallest cell via the struct min. The k-row
    * centroid table broadcasts; the k-way fan-out is map-side.
    */
  def assignToCentroids(s: SparkSession, embDf: DataFrame,
      root: String): DataFrame = {
    val cents = s.read.parquet(s"$root/centroids")
    val d2 = expr(
      """aggregate(zip_with(CAST(embedding AS array<double>), centroid,
        |                   (x, c) -> (x - c) * (x - c)),
        |          0D, (acc, v) -> acc + v)""".stripMargin)
    embDf.crossJoin(broadcast(cents))
      .withColumn("d2", d2)
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cell"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"))
  }

  /** e4: cluster assignment with CANONICAL labels — k-means cell ids are
    * arbitrary (init order), so each cell is relabeled to the minimum
    * vec_id it contains, making the output stable under any cluster
    * numbering the fitter picks. The relabel map is k rows, broadcast.
    */
  def e4KmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val a = s.read.parquet(s"${clusterDir(s, dir)}/assign")
    val canon = a.groupBy("cell").agg(min("vec_id").as("cluster"))
    a.join(broadcast(canon), Seq("cell"))
      .select(col("vec_id"), col("cluster"))
  }

  /** e4v violation oracle: every vector's assigned centroid must be the
    * nearest of the model's final centroids, recomputed through an
    * INDEPENDENT path — SQL higher-order functions over the raw arrays
    * (zip_with + aggregate), not MLlib's distance code. The k-row
    * centroid table broadcasts; the k-way fan-out is map-side. Tolerance
    * 1e-9 absorbs float→double widening order; ties (measure zero on
    * this data) pass by the ≤ comparison. Oracle: the empty relation.
    */
  def e4vKmeansNearest(s: SparkSession, dir: String): DataFrame = {
    val root = clusterDir(s, dir)
    val a = s.read.parquet(s"$root/assign")
      .join(emb(s, dir).select("vec_id", "embedding"), Seq("vec_id"))
    val d2 = expr(
      """aggregate(zip_with(CAST(embedding AS array<double>), centroid,
        |                   (x, c) -> (x - c) * (x - c)),
        |          0D, (acc, v) -> acc + v)""".stripMargin)
    val scored = a.crossJoin(
        broadcast(s.read.parquet(s"$root/centroids")
          .withColumnRenamed("cell", "cand_cell")))
      .withColumn("d2", d2)
    scored.groupBy("vec_id", "cell")
      .agg(min(when(col("cand_cell") === col("cell"), col("d2")))
          .as("d2_assigned"),
        min("d2").as("d2_nearest"))
      .filter(col("d2_assigned") > col("d2_nearest") + 1e-9)
      .select(col("vec_id"), col("d2_assigned"), col("d2_nearest"))
  }

  /** e5: SemDeDup — within each k-means cluster, a vector is DROPPED if a
    * lower-id vector in the same cluster is cosine-similar above `tau`;
    * the kept representative reported is the minimum such partner
    * (deterministic). The pair stage is the cell equi-join described in
    * the header, run through [[SkewSafe.cappedEquiJoin]]: the within-cell
    * work is inherently O(n_c²), and the cap spreads a hot cluster's
    * block across ⌈n_c/cap⌉ tasks instead of pinning one reducer — the
    * same guard the three LSH candidate joins use. The keep-min
    * reduction is one agg on the drop id.
    */
  def e5SemanticDedup(s: SparkSession, dir: String,
      tau: Double = 0.35): DataFrame = {
    // per-row norm hoisted out of the within-cell pair join
    // (bit-identical — see Expressions.cosinePreF)
    val a = s.read.parquet(s"${clusterDir(s, dir)}/assign")
      .join(emb(s, dir).select("vec_id", "embedding"), Seq("vec_id"))
      .withColumn("nrm",
        graft.functions.Expressions.normF(col("embedding")))
    val l = a.select(col("cell"), col("vec_id").as("l_id"),
      col("embedding").as("l_emb"), col("nrm").as("l_nrm"))
    val r = a.select(col("cell"), col("vec_id").as("r_id"),
      col("embedding").as("r_emb"), col("nrm").as("r_nrm"))
    SkewSafe.cappedEquiJoin(l, r, Seq("cell"), hash(col("r_id")))
      .filter(col("l_id") < col("r_id") &&
        graft.functions.Expressions.cosinePreF(col("l_emb"), col("l_nrm"),
          col("r_emb"), col("r_nrm")) >= tau)
      .groupBy(col("r_id").as("drop_id"))
      .agg(min(col("l_id")).as("rep_id"), first(col("cell")).as("cell"))
  }

  /** e5v violation oracle: on the vec_id < 150 subset, recompute the
    * SemDeDup drop set from scratch — all pairs brute-force (no LSH, no
    * cell join order), cosine via SQL higher-order functions instead of
    * the native [[cosineF]] expression — and emit one row per id the
    * operator got wrong. A drop decision depends only on lower ids, so
    * the subset is closed under the operator. The two cosine paths
    * differ in float→double widening order, so the check is banded: an
    * id clearly above tau (by eps) must be dropped, an id dropped must
    * be at least tau−eps; a pair INSIDE the band is legitimately
    * undecidable between the paths and can't flag. Oracle: the empty
    * relation.
    */
  def e5vSemdedupSubset(s: SparkSession, dir: String,
      tau: Double = 0.35): DataFrame = {
    val lim = 150L
    val eps = 1e-6
    val a = s.read.parquet(s"${clusterDir(s, dir)}/assign")
      .join(emb(s, dir).select("vec_id", "embedding"), Seq("vec_id"))
      .filter(col("vec_id") < lim)
      .select(col("cell"), col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
    val cos = expr(
      """aggregate(zip_with(l.e, r.e, (x, y) -> x * y), 0D,
        |          (acc, v) -> acc + v)
        | / (sqrt(aggregate(l.e, 0D, (acc, x) -> acc + x * x))
        |    * sqrt(aggregate(r.e, 0D, (acc, x) -> acc + x * x)))"""
        .stripMargin)
    def expected(bar: Double) = a.as("l").join(a.as("r"),
        col("l.cell") === col("r.cell") &&
          col("l.vec_id") < col("r.vec_id"))
      .filter(cos >= bar)
      .select(col("r.vec_id").as("drop_id")).distinct()
    val got = e5SemanticDedup(s, dir, tau)
      .filter(col("drop_id") < lim).select("drop_id")
    expected(tau + eps).exceptAll(got).withColumn("side", lit("missing"))
      .unionAll(got.exceptAll(expected(tau - eps))
        .withColumn("side", lit("spurious")))
  }
}
