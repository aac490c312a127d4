package graft.pipeline

/** Job-level option validation — the Spark re-expression of the reference's
  * set_options request-validation matrix (docsbox/docs/utils.py:45-96):
  * per-type-family allowed conversion formats, `output-pdf-version` in
  * {1,2,3}, thumbnails size as "WxH". Invalid input is rejected up front
  * with a message (the 400-response analog) — a bad option must fail the
  * job BEFORE a 100 TB scan starts, not per row. */
object JobOptions {

  /** Validated job options. `outputPdfVersion` drives the attachment
    * re-attach policy (ops.Attachments.applyPolicy); `conversionFormat`
    * the committed projection ("spans" = full rows, "text" = text-only). */
  final case class Options(
      conversionFormat: String = "spans",
      outputPdfVersion: String = "3",
      thumbnails: Option[(Int, Int)] = None)

  /** Allowed target formats per detected type family — the
    * CONVERTABLE_MIMETYPES["formats"] analog (config/config.yml:34-153).
    * Every family can emit plain text; span-preserving output exists for
    * families with structural spans. Only formats the pipeline actually
    * implements are listed — validation accepting an unimplemented format
    * would poison the snapshot chain's meta for no behavior. */
  val FormatsByKind: Map[String, Set[String]] = Map(
    "html" -> Set("text", "spans"),
    "pdf" -> Set("text", "spans"),
    "ooxml" -> Set("text", "spans"),
    "odf" -> Set("text", "spans"), // whole family: odt/ods/odp/odg + sx*
    "rtf" -> Set("text", "spans"),
    "text" -> Set("text"))

  private val KnownKeys =
    Set("conversion-format", "output-pdf-version", "thumbnails")

  /** Validate `key=value` options. Left(message) on the FIRST violation —
    * mirrors set_options raising ValueError. */
  def validate(kv: Map[String, String]): Either[String, Options] = {
    val unknown = kv.keySet -- KnownKeys
    if (unknown.nonEmpty)
      return Left(s"unknown option(s): ${unknown.toSeq.sorted.mkString(", ")}")

    var opts = Options()

    kv.get("conversion-format").foreach { f =>
      val allowedSomewhere = FormatsByKind.values.exists(_.contains(f))
      if (!allowedSomewhere)
        return Left(s"'$f' is not a supported conversion format " +
          s"(allowed: ${FormatsByKind.values.flatten.toSeq.distinct.sorted.mkString(", ")})")
      opts = opts.copy(conversionFormat = f)
    }

    kv.get("output-pdf-version").foreach { v =>
      if (!Set("1", "2", "3").contains(v))
        return Left("Invalid 'output_pdf_version' value. Allowed are 1, 2 and 3")
      opts = opts.copy(outputPdfVersion = v)
    }

    kv.get("thumbnails").foreach { t =>
      t.split("x", -1) match {
        case Array(w, h) =>
          val (wi, hi) =
            try (w.trim.toInt, h.trim.toInt)
            catch { case _: NumberFormatException => return Left("Invalid 'size' value") }
          if (wi <= 0 || hi <= 0) return Left("Invalid 'size' value")
          opts = opts.copy(thumbnails = Some((wi, hi)))
        case _ => return Left("Invalid 'size' value")
      }
    }

    Right(opts)
  }

  /** Parse trailing `key=value` CLI args into the validated options. */
  def parseArgs(args: Seq[String]): Either[String, Options] = {
    val kv = Map.newBuilder[String, String]
    args.foreach { a =>
      val eq = a.indexOf('=')
      if (eq <= 0) return Left(s"malformed option '$a' (expected key=value)")
      kv += a.substring(0, eq) -> a.substring(eq + 1)
    }
    validate(kv.result())
  }
}
