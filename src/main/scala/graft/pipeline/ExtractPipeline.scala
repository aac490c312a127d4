package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{ExtractedRow, Heuristics, Page}
import graft.extract.Extractor
import graft.table.SnapshotTable

/** The main extraction job: the Spark re-expression of the reference's
  * convert pipeline (docsbox/docs/views.py:158-202 + tasks.py:80-166) as a
  * declarative plan:
  *
  * {{{
  *   scan pages -> dedup latest per url -> [resume anti-join]
  *     -> salted repartition on url-hash (giant docs split out)
  *     -> mapPartitions(sniff -> route -> extract -> validate -> stamp)
  *     -> output + _counters + _lineage
  * }}}
  *
  * Scale notes (designed for 10^12 rows / 1000 executors, tested local):
  *  - the ONLY shuffles are the dedup window (required for last-write-wins
  *    semantics) and the explicit salted repartition; extraction itself is
  *    a narrow map with per-partition init (UnoServer-warmup analog,
  *    docsbox/__init__.py:64-65).
  *  - skew: payloads are Zipf-ish in size; docs above `giantThreshold` are
  *    split into a round-robin repartition so one task never holds many
  *    giants (the 100 MB nginx body-cap analog, nginx.conf:46-47). AQE skew
  *    handling does not apply to map stages, hence explicit.
  *  - the dedup window can be skipped (`assumeUnique`) when the source
  *    guarantees unique urls — at 100 TB that window is the dominant shuffle.
  *  - resume uses a left_anti join against committed urls; Catalyst
  *    broadcast-selects when the committed side is small, SMJ otherwise.
  */
object ExtractPipeline {

  case class Config(
      partitions: Int = 32,
      giantThreshold: Int = 100 * 1024,
      inputSnapshotId: Long = 0L,
      assumeUnique: Boolean = false)

  /** Last-write-wins per url: row_number over (url, warc_ts desc) with a
    * content-hash tiebreak for full determinism (Redis key overwrite analog,
    * views.py:255,271). */
  def dedupLatest(pages: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, xxhash64(col("html")).desc)
    pages.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Salted repartition keyed on url-hash, giant docs split out round-robin
    * (north_rule partitioning/skew requirement). Content of the output is
    * partitioning-independent; only placement changes. */
  def partitionForExtraction(pages: DataFrame, cfg: Config): DataFrame = {
    val sized = pages.withColumn("_sz", length(col("html")))
    val small = sized.where(col("_sz") <= cfg.giantThreshold)
      .repartition(cfg.partitions, pmod(xxhash64(col("url")), lit(cfg.partitions)))
    val giant = sized.where(col("_sz") > cfg.giantThreshold)
      .repartition(cfg.partitions) // round-robin: ~1 giant per task
    small.unionByName(giant).drop("_sz")
  }

  /** The typed map stage. Never throws; bad rows become status rows. */
  def extractStage(pages: Dataset[Page], cfg: Config): Dataset[ExtractedRow] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      it.map { p =>
        val e = Extractor.extract(p.url, if (p.html == null) Array.emptyByteArray else p.html)
        ExtractedRow(e.url, e.status, e.mimeType, e.text, e.spans, e.textBytes,
          e.message, e.heuristicsVersion, pid, cfg.inputSnapshotId)
      }
    }
  }

  /** Full pipeline (no sink): pages DataFrame -> extracted Dataset. */
  def run(pages: DataFrame, cfg: Config = Config()): Dataset[ExtractedRow] = {
    import pages.sparkSession.implicits._
    val unique = if (cfg.assumeUnique) pages else dedupLatest(pages)
    val placed = partitionForExtraction(unique, cfg)
    extractStage(placed.as[Page], cfg)
  }

  /** Per-status counters (log_task_completion analog, tasks.py:203-220):
    * partial+final HashAggregate, map-side combined by Catalyst. */
  def counters(extracted: Dataset[ExtractedRow]): DataFrame =
    extracted.groupBy(col("status"))
      .agg(count(lit(1)).as("docs"), sum(col("textBytes")).as("bytes"))

  /** Per-partition lineage (north_rule: partition id, input snapshot id,
    * heuristics version, row counts). */
  def lineage(extracted: Dataset[ExtractedRow]): DataFrame =
    extracted.groupBy(col("partitionId"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("textBytes")).as("bytes"),
        first(col("inputSnapshotId")).as("inputSnapshotId"),
        first(col("heuristicsVersion")).as("heuristicsVersion"))

  /** End-to-end job with commit + idempotent resume: extract only urls not in
    * the committed output (read-through-cache analog, views.py:249-272),
    * append a snapshot, write `_counters`/`_lineage` sidecars.
    * Returns the committed snapshot id, or -1 if nothing was left to do. */
  def runAndCommit(
      spark: SparkSession,
      pages: DataFrame,
      outputRoot: String,
      cfg: Config = Config()): Long = {
    val table = new SnapshotTable(outputRoot)
    val unique = if (cfg.assumeUnique) pages else dedupLatest(pages)
    val todo = table.read(spark) match {
      case Some(done) =>
        unique.join(done.select(col("url")).distinct(), Seq("url"), "left_anti")
      case None => unique
    }
    if (todo.isEmpty) return -1L
    import spark.implicits._
    val placed = partitionForExtraction(todo, cfg)
    val extracted = extractStage(placed.as[Page], cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val id = table.commit(extracted.toDF(), Map(
        "heuristicsVersion" -> Heuristics.Version,
        "inputSnapshotId" -> cfg.inputSnapshotId.toString))
      counters(extracted).write.mode("overwrite")
        .parquet(s"$outputRoot/_counters/snap-$id")
      lineage(extracted).write.mode("overwrite")
        .parquet(s"$outputRoot/_lineage/snap-$id")
      id
    } finally extracted.unpersist()
  }
}
