package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain-level curation (r14, VERDICT r13 item 8) — the RefinedWeb /
  * CCNet moves that operate on a document's PROVENANCE rather than its
  * content (Penedo et al. 2023 §3.1, public): URL parsing, per-domain
  * document caps (a handful of template-heavy hosts otherwise dominate a
  * crawl), and a registered-domain blocklist.
  *
  * The fixture corpus carries no URL column (reference schema:
  * doc_id/text/lang/source/n_chars — Big_Data_Pr's crawler keys rows by
  * symbol, not URL), so the operators take any URL column and the gate
  * queries exercise them on a DETERMINISTIC url derived from the
  * provenance fields ([[urlCol]]). The operator under test is the
  * parser / cap / blocklist machinery, which is input-agnostic.
  *
  * Everything is engine-exact: parsing is three RE2-compatible
  * `regexp_extract`s (no lookaround — the PII-redact compatibility
  * discipline), the cap rides the bounded-heap TopKPerGroup operator
  * (never a WindowExec full-partition sort), and the blocklist is a
  * size-gated anti-join. At 100 TB: parse is map-only; the cap ships
  * ≤ n rows per domain per partition; the blocklist side routes through
  * [[graft.queries.JoinHints.gated]] — a real blocklist is millions of
  * registrable domains and scales independently of the corpus, so its
  * broadcast is an assertion to measure, not believe.
  */
object Domains {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deterministic per-doc URL from provenance fields (see object doc):
    * host = www.<source><lang>.com (~|sources|·|langs| registered
    * domains), path keys the doc, a query string exercises the parser's
    * path/query split.
    */
  def urlCol: Column =
    concat(lit("https://www."), col("source"), col("lang"),
      lit(".com/docs/"), col("doc_id"), lit("?ref=crawl"))

  /** RE2-safe URL anatomy: host = authority up to the first `/ : ? #`;
    * registered domain = the last two dot-labels of the host, or the
    * last THREE when the host ends in a known multi-label public
    * suffix ([[MultiLabelSuffixes]]); path = from the authority's end
    * to `? #`.
    */
  val HostRe = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"
  val RegDomainRe = "([^.]+\\.[^.]+)$"
  val PathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Embedded snapshot of the COMMON multi-label public suffixes
    * (VERDICT r14 item 7): under the bare two-label rule every `co.uk`
    * host collapsed to the registrable domain "co.uk", merging the
    * whole UK commercial web into one cap/blocklist bucket. The full
    * Mozilla Public Suffix List is external data this container cannot
    * fetch, so this is a literal snapshot of the high-traffic
    * country-code second-level domains (the same ones every PSL
    * digest leads with); hosts under any other suffix keep the
    * documented two-label fallback.
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.za", "org.za", "web.za",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.tw", "org.tw", "idv.tw",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar",
    "com.sg", "org.sg", "edu.sg",
    "com.hk", "org.hk", "edu.hk",
    "com.my", "net.my", "org.my",
    "co.th", "or.th", "ac.th", "go.th",
    "co.id", "or.id", "ac.id", "web.id",
    "com.tr", "net.tr", "org.tr",
    "co.il", "org.il", "ac.il",
    "com.vn", "net.vn", "org.vn",
    "com.ph", "net.ph", "org.ph",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.ng", "com.ua")

  /** Three-label extraction anchored on the suffix snapshot — one RE2
    * alternation, shared verbatim with the DuckDB oracles (non-
    * capturing group, no lookaround). A host that IS a bare suffix
    * ("co.uk") has no registrable label and falls through to the
    * two-label rule.
    */
  val RegDomainMultiRe: String =
    "([^.]+\\.(?:" +
      MultiLabelSuffixes.map(_.replace(".", "\\.")).mkString("|") +
      "))$"

  def hostOf(url: Column): Column = regexp_extract(url, HostRe, 1)
  def regDomainOf(url: Column): Column = {
    val host = hostOf(url)
    val multi = regexp_extract(host, RegDomainMultiRe, 1)
    when(multi =!= "", multi)
      .otherwise(regexp_extract(host, RegDomainRe, 1))
  }
  def pathOf(url: Column): Column = regexp_extract(url, PathRe, 1)

  /** The registered-domain rule as DuckDB SQL over a host expression —
    * the ONE place the oracle replay and [[regDomainOf]] must agree.
    */
  def regDomainSql(hostExpr: String): String =
    s"""CASE WHEN regexp_extract($hostExpr, '$RegDomainMultiRe', 1) <> ''
         THEN regexp_extract($hostExpr, '$RegDomainMultiRe', 1)
         ELSE regexp_extract($hostExpr, '$RegDomainRe', 1) END"""

  /** u2: parse every doc's URL — map-only projection, no shuffle. */
  def u2UrlParse(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("url", urlCol)
      .select(col("doc_id"), col("url"),
        hostOf(col("url")).as("host"),
        regDomainOf(col("url")).as("reg_domain"),
        pathOf(col("url")).as("path"))

  /** u4: per-registered-domain document cap — keep ≤ `n` docs per
    * domain by (content hash, doc_id): deterministic, uniform-ish (md5
    * order is data-independent), and replayable. Composes the
    * bounded-heap TopKPerGroup operator, so no domain's documents are
    * ever sorted in full — the WindowExec alternative buffers whole
    * partitions, the exact whale-bucket failure the r13 SNM slider
    * killed elsewhere.
    */
  def u4DomainCaps(s: SparkSession, dir: String, n: Int = 20): DataFrame =
    graft.plans.TopKPerGroup.topK(
      docs(s, dir).withColumn("url", urlCol)
        .select(col("doc_id"),
          regDomainOf(col("url")).as("reg_domain"),
          md5(col("text")).as("h")),
      Seq("reg_domain"), "h", n, desc = false, tiebreakCols = Seq("doc_id"))

  /** The gate blocklist: a fixed, SQL-expressible registered-domain set
    * (a production run feeds a table; the fixture one must replay in
    * the DuckDB oracle as literals).
    */
  val GateBlocklist: Seq[String] =
    Seq("src1en.com", "src2de.com", "src3fr.com", "src4es.com")

  /** u5: registered-domain blocklist as a LEFT ANTI join. The blocklist
    * side is hinted through the measured broadcast gate: this fixture's
    * four rows broadcast for free, but a real blocklist scales with the
    * web, not the corpus — over the cap the planner's exchange anti-join
    * takes over, row-identically.
    */
  def u5DomainBlocklist(s: SparkSession, dir: String,
      blocklist: Seq[String] = GateBlocklist): DataFrame = {
    import s.implicits._
    val bl = blocklist.toDF("reg_domain")
    docs(s, dir).withColumn("url", urlCol)
      .select(col("doc_id"),
        regDomainOf(col("url")).as("reg_domain"))
      .join(graft.queries.JoinHints.gated(bl, s"$dir|u5.blocklist"),
        Seq("reg_domain"), "left_anti")
      .select(col("doc_id"), col("reg_domain"))
  }
}
