package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join — the "remaining lever" SCALING.md's
  * join section promises: both fact tables are written bucketed (and
  * per-file sorted) on the join key, so an equi-join on that key reads
  * each side's matching bucket files directly and the SortMergeJoin
  * needs NO exchange on either input. At 100 TB this removes the two
  * largest shuffles of the fact⋈fact pattern entirely — the join cost
  * becomes a co-partitioned streaming merge, repaid on every subsequent
  * join against the same key.
  *
  * The build is the offline layout job (same standing as the IVF index
  * or PQ codebook builds): write once with `bucketBy`, join forever.
  * Spark's in-memory catalog holds the bucket metadata per session, so
  * the build memoizes per (dir, buckets) within the JVM and OVERWRITES
  * any stale on-disk table from a previous session.
  */
object Bucketing {

  private val built = CorpusMemos.register(
    new ConcurrentHashMap[String, (String, String)]())

  /** Fingerprint of the two SOURCE parquet dirs a bucketed twin pair was
    * built from (file names + lengths + mtimes). Stored as a `_graft_src`
    * marker inside each table dir (underscore-prefixed files are invisible
    * to Spark's file listing, the `_SUCCESS` convention), so a memo MISS
    * can prove the on-disk table still matches the corpus and adopt it
    * instead of destructively rebuilding. Rebuild-on-every-miss was a
    * correctness hazard: `CorpusMemos.clearAll()` (corpus-regen hook, also
    * fired by tests) made the next caller DELETE + rewrite the table under
    * any in-flight reader planned against the old file list →
    * FAILED_READ_FILE mid-query. Now the delete happens only when the
    * source corpus actually changed — where every plan against the old
    * table is invalid anyway.
    */
  private def srcFingerprint(dir: String): String = {
    def files(sub: String): Seq[String] = {
      val d = new java.io.File(dir, sub)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}").toSeq
    }
    (files("orders.parquet") ++ files("customer.parquet")).mkString("\n")
  }

  /** Bucketed twin tables of orders/customer for `dir`, keyed on the
    * o_custkey = c_custkey join; returns their catalog names.
    */
  def ensureBucketed(s: SparkSession, dir: String,
      buckets: Int = 8): (String, String) = {
    // deterministic per-corpus name — sf0.01 and sf0.1 must not share.
    // The tag is the SANITIZED path, not a hashCode: a 32-bit hash
    // collision between two corpora would silently alias their tables.
    val tag = s"${dir}_$buckets".replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+", "").toLowerCase
    val names = (s"graft_orders_b_$tag", s"graft_customer_b_$tag")
    // the memo is JVM-wide but catalog registration is SESSION-scoped:
    // a later SparkSession in the same JVM has a fresh in-memory
    // catalog, so a map hit must still verify the tables exist there
    if (built.containsKey(s"$dir|$buckets") &&
        s.catalog.tableExists(names._1) && s.catalog.tableExists(names._2))
      return names
    built.remove(s"$dir|$buckets")
    built.computeIfAbsent(s"$dir|$buckets", _ => {
      val (ot, ct) = names
      val wh = new java.net.URI(
        s.conf.get("spark.sql.warehouse.dir")).getPath
      val fp = srcFingerprint(dir)
      def marker(t: String) = new java.io.File(new java.io.File(wh, t),
        "_graft_src")
      def markerOk(t: String): Boolean = {
        val m = marker(t)
        m.isFile && new String(java.nio.file.Files.readAllBytes(
          m.toPath), "UTF-8") == fp
      }
      // memo lost (e.g. CorpusMemos.clearAll) but the session catalog
      // still holds both tables AND their stored source fingerprints
      // match the corpus on disk → the tables are current; adopt them.
      if (s.catalog.tableExists(ot) && s.catalog.tableExists(ct) &&
          markerOk(ot) && markerOk(ct)) {
        Dedup.logRoute("bucketing", "adopted existing tables",
          s"dir=$dir buckets=$buckets")
        (ot, ct)
      } else {
        // a FRESH session's in-memory catalog doesn't know about a
        // previous JVM's on-disk table, and saveAsTable refuses to reuse
        // the location — drop both sides of the stale state before writing
        for (t <- Seq(ot, ct)) {
          s.sql(s"DROP TABLE IF EXISTS $t")
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(): Unit
          }
          rm(new java.io.File(wh, t))
        }
        s.read.parquet(s"$dir/orders.parquet").write.mode("overwrite")
          .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
          .format("parquet").saveAsTable(ot)
        s.read.parquet(s"$dir/customer.parquet").write.mode("overwrite")
          .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
          .format("parquet").saveAsTable(ct)
        for (t <- Seq(ot, ct))
          java.nio.file.Files.write(marker(t).toPath, fp.getBytes("UTF-8"))
        (ot, ct)
      }
    })
  }

  /** Write an arbitrary frame as a bucketed + per-file-sorted catalog
    * table on ONE key (the generic offline layout job behind
    * [[ensureBucketed]], reused by CuratePipeline's eval-gram
    * decontamination artifact): repartitioned to `buckets` on the key
    * first, so each write task holds exactly one bucket (Spark's
    * repartition hash IS the bucket hash) → one sorted file per bucket
    * and the bucketed side of a later sort-merge join needs neither
    * exchange NOR sort. Drops any stale same-name table (catalog and
    * warehouse dir) before writing — the ensureBucketed discipline.
    */
  def writeBucketedTable(s: SparkSession, name: String, df: DataFrame,
      keyCol: String, buckets: Int = 8): String = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.net.URI(
      s.conf.get("spark.sql.warehouse.dir")).getPath
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(wh, name))
    df.repartition(buckets, col(keyCol))
      .write.mode("overwrite")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(name)
    name
  }

  /** Deterministic catalog-safe table name for a per-corpus artifact
    * (sanitized path, not a hashCode — see [[ensureBucketed]]).
    */
  def tableName(prefix: String, key: String): String =
    s"${prefix}_${key.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+", "").toLowerCase}"

  /** j2's join/agg over the bucketed layout — row-identical to
    * `j2_shuffle_join_agg` (same oracle SQL), but the join itself is
    * exchange-free: the only shuffle left in the plan is the final
    * 4-group aggregate. The merge hint pins SortMergeJoin so the
    * bucketed distribution is what satisfies the join's requirement
    * (an auto-broadcast would demonstrate nothing).
    */
  def bucketedJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val (ot, ct) = ensureBucketed(s, dir)
    s.table(ot).hint("merge")
      .join(s.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.functions.Expressions.moneyDec2(col("o_totalprice"), 18))
          .cast("double")
          .as("total_price"))
  }
}
