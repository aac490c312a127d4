package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextStats, Urls}
import graft.table.SnapshotTable

/** Training-data curation over a committed extraction table — the batch,
  * user-facing composition of the corpus-hygiene operators the driver
  * queries exercise individually (d01 exact dedup, d12 PII scrubbing,
  * d13 domain curation):
  *
  *   finished rows -> exact text dedup (smallest url per identical text,
  *   the shared 128-bit key of Dedup.exact) -> domain blocklist ->
  *   per-domain cap -> PII redaction + per-category counts -> parquet.
  *
  * Plan shape (skew-aware): the dedup never shuffles text payloads — the
  * winner urls are found on ~24-byte (hash, hash, len) rows (uniform key,
  * the Dedup.exact shape) and joined back left_semi on the uniform url
  * key, so a text repeated 10^6 times costs one hot AGGREGATE cell, not a
  * one-task window sort of 10^6 full-text rows. The domain cap is the one
  * window (domain key, capped output); the blocklist is a literal
  * predicate; PII work is codegen'd regex in the final projection. The
  * domain is computed ONCE as a column and reused by filter, window and
  * projection. Kept count is captured DURING the write via `observe`
  * (the SnapshotTable.commit precedent — no re-read of fresh output).
  */
object Curate {

  case class Result(snapshotId: Long, kept: Long)

  /** Curated schema: url, warc_ts (crawl time of the winning version),
    * domain, mimeType, textBytes (ORIGINAL length — the quality signal),
    * PII counts, and the REDACTED text.
    * `paraMaxDocs > 0` enables the passage-dedup stage AFTER the exact
    * dedup — the ordering stripRepeatedParagraphs requires: on a corpus
    * where whole articles are mirrored across many urls, running passage
    * dedup first would mark EVERY paragraph of a mirrored article hot and
    * annihilate all copies to empty text (and blow the hot-set broadcast)
    * instead of letting one representative survive. */
  def curate(data: DataFrame, cap: Int, block: Seq[String],
      paraMaxDocs: Int = 0): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val finished = data.where(col("status") === "finished")
      .select(col("url"), col("warc_ts"), col("mimeType"), col("textBytes"),
        col("text").cast("string").as("text"),
        Urls.registeredDomain(col("url")).as("domain"))
    // exact dedup, payloads never shuffled: winners on 24-byte key rows
    val winners = finished
      .select((col("url") +: Dedup.exactKeyCols(col("text"))): _*)
      .groupBy(col("_h1"), col("_h2"), col("_len"))
      .agg(min(col("url")).as("url"))
      .select("url")
    val deduped = finished.join(winners, Seq("url"), "left_semi")
    // passage dedup over the REPRESENTATIVES only. A doc whose EVERY
    // paragraph was hot is pure boilerplate: it is DROPPED here (inner
    // join on n_kept > 0) rather than emitted as an empty-text training
    // row still carrying its nonzero original-textBytes quality signal.
    val stripped =
      if (paraMaxDocs <= 0) deduped
      else deduped.drop("text").join(
        Dedup.stripRepeatedParagraphs(deduped.select(col("url"), col("text")),
            idCol = "url", textCol = "text", maxDocs = paraMaxDocs)
          .where(col("n_kept") > 0)
          .select(col("url"), col("text")),
        Seq("url"))
    val unblocked = stripped.where(!col("domain").isin(block: _*))
    // earliest-crawl-first cap, tie-broken by url — the SAME deterministic
    // (warc_ts, url) ordering as Urls.capPerDomain on raw pages: a training
    // mix keeps a domain's earliest crawls, not its lexicographically
    // smallest urls (extraction now carries the winning crawl's warc_ts)
    val w = Window.partitionBy(col("domain")).orderBy(col("warc_ts"), col("url"))
    val capped = unblocked.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap).drop("_rn")
    // counts via the fused one-pass PiiScan; the redacted TEXT still needs
    // the replace passes (4 regex passes total instead of 6)
    val st = org.apache.spark.sql.graftexpr.GraftExpr.pii_scan(col("text"))
    capped.select(
      col("url"), col("warc_ts"), col("domain"), col("mimeType"), col("textBytes"),
      element_at(st, 1).cast("int").as("n_emails"),
      element_at(st, 2).cast("int").as("n_phones"),
      element_at(st, 3).cast("int").as("n_ipv4"),
      TextStats.redactPii(col("text")).as("text"))
  }

  /** Read the committed snapshot under `outputRoot`, curate, write to
    * `curatedDir`. Returns the source snapshot id (captured BEFORE the
    * write, so a concurrent commit cannot be misreported as the curated
    * source) and the kept count. */
  def run(spark: SparkSession, outputRoot: String, curatedDir: String,
      cap: Int, block: Seq[String], paraMaxDocs: Int = 0): Option[Result] = {
    val table = new SnapshotTable(outputRoot)
    for {
      id <- table.currentSnapshotId
      data <- table.read(spark)
    } yield {
      val obs = org.apache.spark.sql.Observation(s"graft-curate-$id")
      curate(data, cap, block, paraMaxDocs)
        .observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").parquet(curatedDir)
      Result(id, obs.get("rows").asInstanceOf[Long])
    }
  }
}
