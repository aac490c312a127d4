package graft.core

import java.sql.Timestamp

/** Input row: one Common-Crawl-style page (BASELINE.json input_hint shape).
  * Analog of the reference's document = payload bytes + flat metadata
  * (docsbox/docs/classes/file/file_info.py:1-23).
  */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Narrow row for the extraction map stage: everything after dedup needs
  * only (url, payload) — crawler columns (text, lang) and warc_ts are
  * dropped before the shuffle so they never travel. */
case class RawDoc(url: String, html: Array[Byte])

/** A contiguous region of the extracted text (byte offsets into `text`).
  * `kind` is the source block tag ("p", "h1", "line", "attachment:<name>"...).
  */
case class Span(kind: String, start: Long, end: Long)

/** Error-as-value extraction result. The extractor NEVER throws — bad input
  * becomes a status row, mirroring the reference's FileInfoException contract
  * (docsbox/docs/classes/file/file_info_exception.py:1-20, tasks.py:102-103).
  */
case class Extracted(
    url: String,
    status: String,
    mimeType: String,
    text: Array[Byte],
    spans: Seq[Span],
    textBytes: Long,
    message: String, // null when status == finished
    heuristicsVersion: String)

/** Pipeline output row = Extracted + per-row lineage columns
  * (north_rule: per-partition lineage — input snapshot id, partition id).
  * Lineage columns are NOT part of the byte-identity invariant (they vary
  * with parallelism); `url -> (status, mimeType, text, spans, message)` is.
  */
case class ExtractedRow(
    url: String,
    status: String,
    mimeType: String,
    text: Array[Byte],
    spans: Seq[Span],
    textBytes: Long,
    message: String,
    heuristicsVersion: String,
    partitionId: Int,
    inputSnapshotId: Long)

/** Status state machine, mirroring the reference
  * (docsbox/docs/views.py:133-137, tasks.py:55-63, README.md:148). */
object Status {
  val Finished = "finished"
  val Failed = "failed"
  val Corrupted = "corrupted"
  val NonConvertable = "non-convertable"
  val PasswordProtected = "password-protected"
  val All: Seq[String] =
    Seq(Finished, Failed, Corrupted, NonConvertable, PasswordProtected)
}

object Heuristics {
  /** Bump whenever an extraction heuristic changes — goldens are keyed to it.
    * Analog of the XMP provenance stamp (docsbox/docs/utils.py:267-283). */
  val Version = "v1"
}
