package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain hygiene for a web-scale corpus: registered-domain extraction,
  * per-domain statistics, blocklist filtering, and per-domain document caps
  * (domain balancing) — the C4-style curation stages that run BEFORE the
  * text-level filters, on metadata alone (no payload reads).
  *
  * Scale shape: domain extraction is a narrow regex map; stats/caps shuffle
  * once on the domain key. Web corpora are domain-skewed (one host can be
  * percents of the crawl), but the aggregates here are partial-aggregable
  * counts and the cap is a streaming row_number window — both spill-safe;
  * a salted two-phase top-k slots in if a single domain outgrows a
  * partition's sort spill budget.
  */
object Urls {

  /** Host of an absolute URL (`scheme://host[/...]`); empty when the value
    * is not an absolute URL. The regex is restricted to the
    * java.util.regex/RE2 common subset (shared with the DuckDB oracle);
    * whitespace is excluded from the host explicitly — a newline smuggled
    * into the authority would otherwise make Java's `$` (which matches
    * before a final line terminator) and RE2's `$` (end of input only)
    * extract different domains. */
  val HostPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/ \\t\\r\\n]+)"

  /** Last two dot-labels of the host. */
  val DomainPat = "([^.]+\\.[^.]+)$"

  def host(urlCol: Column): Column = regexp_extract(urlCol, HostPat, 1)

  /** Registered domain = last two labels of the host — a documented
    * public-suffix-list-less heuristic (exact for .com/.org/.test-style
    * corpora; a PSL lookup slots in here for ccSLDs like .co.uk). */
  def registeredDomain(urlCol: Column): Column =
    regexp_extract(host(urlCol), DomainPat, 1)

  /** Drop rows whose registered domain is blocklisted. The list is a
    * driver-side literal: real blocklists are 10^4-10^5 entries — still
    * literal/broadcast scale, never a shuffle. */
  def filterBlocklist(df: DataFrame, urlCol: String, block: Seq[String]): DataFrame =
    df.where(!registeredDomain(col(urlCol)).isin(block: _*))

  /** Keep at most `cap` docs per registered domain in a DETERMINISTIC
    * order (earliest crawl first, then url) — domain balancing so a
    * handful of giant hosts cannot dominate a training mix. One shuffle
    * on the domain key. */
  def capPerDomain(df: DataFrame, urlCol: String, tsCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = Window.partitionBy(registeredDomain(col(urlCol)))
      .orderBy(col(tsCol), col(urlCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") <= cap).drop("_rn")
  }

  /** Per-domain corpus statistics: doc count, distinct urls, the count
    * surviving [[capPerDomain]] at `cap`, the lexicographic max url of the
    * KEPT set, and the blocklist flag.
    *
    * `kept_after_cap` alone is identically min(docs, cap) under ANY window
    * ordering — the min/max urls of the KEPT set are the columns that make
    * the cap's earliest-crawl ordering observable (a cap keeping a
    * different subset reports different extrema), so the d13 oracle
    * genuinely re-checks the ordering, not just the count. */
  def domainStats(df: DataFrame, urlCol: String, tsCol: String, cap: Int,
      block: Seq[String]): DataFrame = {
    val kept = capPerDomain(df, urlCol, tsCol, cap)
      .groupBy(registeredDomain(col(urlCol)).as("domain"))
      .agg(count(lit(1)).as("kept_after_cap"),
        min(col(urlCol)).as("min_kept_url"),
        max(col(urlCol)).as("max_kept_url"))
    df.groupBy(registeredDomain(col(urlCol)).as("domain"))
      .agg(count(lit(1)).as("docs"), countDistinct(col(urlCol)).as("unique_urls"))
      .join(kept, Seq("domain"), "left")
      .select(col("domain"), col("docs"), col("unique_urls"),
        coalesce(col("kept_after_cap"), lit(0L)).as("kept_after_cap"),
        coalesce(col("min_kept_url"), lit("")).as("min_kept_url"),
        coalesce(col("max_kept_url"), lit("")).as("max_kept_url"),
        col("domain").isin(block: _*).cast("int").as("is_blocked"))
  }
}
