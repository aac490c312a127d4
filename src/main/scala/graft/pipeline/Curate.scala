package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{TextStats, Urls}
import graft.table.SnapshotTable

/** Training-data curation over a committed extraction table — the batch,
  * user-facing composition of the corpus-hygiene operators the driver
  * queries exercise individually (d01 exact dedup, d12 PII scrubbing,
  * d13 domain curation):
  *
  *   finished rows -> exact text dedup (keep smallest url per identical
  *   text, 128-bit key) -> domain blocklist -> per-domain cap -> PII
  *   redaction + per-category counts -> curated parquet.
  *
  * Plan shape: one hash-window on the 128-bit text key (the dedup), one
  * window on the domain key (the cap) — two shuffles total; everything
  * else is narrow. The blocklist is a literal predicate; PII work is
  * codegen'd regex in the final projection. Single pass, single write.
  */
object Curate {

  case class Result(snapshotId: Long, kept: Long)

  /** Curated schema: url, domain, mimeType, textBytes (ORIGINAL length —
    * the quality signal), PII counts, and the REDACTED text. */
  def curate(data: DataFrame, cap: Int, block: Seq[String]): DataFrame = {
    val finished = data.where(col("status") === "finished")
      .select(col("url"), col("mimeType"), col("textBytes"),
        col("text").cast("string").as("text"))
    // exact dedup: smallest url wins per identical text; two independent
    // 64-bit hashes + length = 128+ bits (the d01 collision argument)
    val w = Window
      .partitionBy(xxhash64(col("text")),
        xxhash64(lit(0x9e3779b9L), col("text")), length(col("text")))
      .orderBy(col("url"))
    val deduped = finished.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    val unblocked = Urls.filterBlocklist(deduped, "url", block)
    // deterministic cap order: url (extraction output carries no crawl
    // timestamp — the pipeline already kept the latest crawl per url)
    val capped = Urls.capPerDomain(unblocked, "url", "url", cap)
    capped.select(
      col("url"),
      Urls.registeredDomain(col("url")).as("domain"),
      col("mimeType"), col("textBytes"),
      size(regexp_extract_all(col("text"), lit(TextStats.EmailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(TextStats.PhonePat), lit(0))).as("n_phones"),
      size(regexp_extract_all(col("text"), lit(TextStats.Ipv4Pat), lit(0))).as("n_ipv4"),
      TextStats.redactPii(col("text")).as("text"))
  }

  /** Read the committed snapshot under `outputRoot`, curate, write to
    * `curatedDir`. Returns the source snapshot id and the kept count. */
  def run(spark: SparkSession, outputRoot: String, curatedDir: String,
      cap: Int, block: Seq[String]): Option[Result] = {
    val table = new SnapshotTable(outputRoot)
    table.read(spark).flatMap { data =>
      curate(data, cap, block).write.mode("overwrite").parquet(curatedDir)
      table.currentSnapshotId.map { id =>
        Result(id, spark.read.parquet(curatedDir).count())
      }
    }
  }
}
