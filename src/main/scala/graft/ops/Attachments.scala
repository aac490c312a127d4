package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Attachment re-attach filter policy — the Spark re-expression of the
  * reference's output-pdf-version rules (docsbox/docs/utils.py:464-507):
  * PDF/A-1 supports no attachments, PDF/A-2 only PDF attachments, PDF/A-3
  * any. Expressed as a nested higher-order `filter()` over the
  * `attachments: array<struct<name,bytes,props>>` column — runs inside
  * whole-stage codegen, no UDF, no explode/regroup shuffle. */
object Attachments {

  private val PdfMagic = "%PDF-".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Keep the attachments the target PDF/A version supports.
    * v2's pdf-only check sniffs the PAYLOAD bytes (magic prefix), not the
    * file name — mirroring the reference's get_file_mimetype_from_data
    * re-detection (utils.py:484-486). */
  def applyPolicy(attachments: Column, outputPdfVersion: String): Column =
    outputPdfVersion match {
      case "1" => filter(attachments, _ => lit(false)) // PDF/A-1: none
      case "2" => filter(attachments, a =>
        startswith(a.getField("bytes"), lit(PdfMagic))) // PDF/A-2: pdf only
      case "3" => attachments // PDF/A-3: all
      case other =>
        throw new IllegalArgumentException(
          s"Invalid 'output_pdf_version' value. Allowed are 1, 2 and 3 (got $other)")
    }
}
