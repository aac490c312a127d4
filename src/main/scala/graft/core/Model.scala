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

/** Narrow row for the extraction map stage: crawler columns (text, lang)
  * are dropped before the shuffle so they never travel; `warc_ts` IS
  * carried (12 bytes next to KB-MB payloads) because the crawl timestamp
  * is the curation ordering key downstream — per-domain caps keep the
  * earliest crawls, so extraction output must preserve it. */
case class RawDoc(url: String, warc_ts: Timestamp, html: Array[Byte])

/** A contiguous region of the extracted text (byte offsets into `text`).
  * `kind` is the source block tag ("p", "h1", "line", "attachment:<name>"...).
  */
case class Span(kind: String, start: Long, end: Long)

/** An embedded file extracted from a document, bytes included — the nested
  * analog of the reference's Attachment (docsbox/docs/classes/attachment.py:5-12,
  * utils.py:440-461): name, payload, and the filespec props that survive a
  * re-attach (/Desc, /CreationDate, /ModDate — utils.py:488-495). */
case class Attachment(
    name: String,
    bytes: Array[Byte],
    props: Map[String, String])

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
    heuristicsVersion: String,
    /** Type family routed to: html | pdf | text | ooxml | odf | rtf |
      * ole2 | iwork | epub | zip | image | audio | video | unknown (detect
      * result the reference returns on every request,
      * docsbox/docs/views.py:82-95). */
    detectedKind: String,
    /** PDF/A version "partN + conformance" ("1B") when the XMP metadata
      * carries pdfaid; "" otherwise (utils.py:118-125,223-238). */
    pdfVersion: String,
    /** Embedded files with payload bytes + filespec props. */
    attachments: Seq[Attachment])

/** Pipeline output row = Extracted + per-row lineage columns
  * (north_rule: per-partition lineage — input snapshot id, partition id).
  * Lineage columns are NOT part of the byte-identity invariant (they vary
  * with parallelism); `url -> (status, mimeType, text, spans, message)` is.
  */
case class ExtractedRow(
    url: String,
    /** Crawl timestamp of the winning (deduped) page version — carried
      * through extraction so curation can order per-domain caps
      * earliest-crawl-first (the same (warc_ts, url) ordering as
      * Urls.capPerDomain). Not part of the byte-identity invariant. */
    warc_ts: java.sql.Timestamp,
    status: String,
    mimeType: String,
    text: Array[Byte],
    spans: Seq[Span],
    textBytes: Long,
    message: String,
    heuristicsVersion: String,
    detectedKind: String,
    pdfVersion: String,
    attachments: Seq[Attachment],
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
  /** Encrypted but the empty user password decrypts — the reference's
    * partial state (utils.py:241-256: decrypt("") in (1, 2)). */
  val PasswordProtectedPartial = "password-protected-partial"
  val All: Seq[String] =
    Seq(Finished, Failed, Corrupted, NonConvertable, PasswordProtected,
      PasswordProtectedPartial)
}

object Heuristics {
  /** Bump whenever an extraction heuristic changes — goldens are keyed to it.
    * Analog of the XMP provenance stamp (docsbox/docs/utils.py:267-283).
    * v2: OOXML/ODF zip-member detection + extraction, trailer-restricted
    * PDF /Encrypt probe, metadata-restricted pdfaid probe, pdfVersion +
    * detectedKind + attachment payloads.
    * v3: RIFF form-type classification (webp/avi no longer sniff as wav),
    * xref-stream /Encrypt detection (PDF 1.5+), embedded-PDF stream
    * isolation, spec-correct JPEG marker walk.
    * v4: full ODF family (ods/odp/odg) + StarOffice sx* routed through the
    * content.xml extractor (with exact tag-boundary opener matching), RTF
    * extraction, OLE2/CFB + RTF + TIFF + HEIC/HEIF signatures, iWork/epub
    * zip classification.
    * v5: legacy OLE2 Office EXTRACTION — CFB FAT/ministream reader, MS-DOC
    * piece-table text, BIFF8 SST, PPT text atoms; CFB sniffing upgraded
    * from byte scan to a real directory walk.
    * v6: text/csv naming on the plain-text branch (>= 3 complete lines,
    * equal nonzero comma counts); MS-DOC main text not fully consumed
    * surfaces as failed ("text exceeds the extraction cap" / "piece table
    * incomplete") instead of a silently shortened finished row; zip member
    * probe walks 32 headers; CFB byte-scan fallback requires the
    * directory-entry NUL terminator; RTF \ucN group-scoped and pending
    * fallback skips cancelled at group boundaries. */
  val Version = "v6"
}
