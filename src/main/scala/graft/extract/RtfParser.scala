package graft.extract

import java.nio.charset.StandardCharsets
import scala.util.control.NonFatal

/** Rich Text Format text extraction — the reference converts text/rtf via
  * LibreOffice (docsbox/config/config.yml:71-74); here a bounded hand-written
  * control-word/group stripper in the HtmlParser/OoxmlParser mold.
  *
  * Scope (deterministic, documented): body text with paragraph structure —
  * `\par`/`\line`/`\sect` become newlines, `\tab`/`\cell` tabs, `\'xx`
  * cp1252 hex escapes and `\uN` unicode escapes (with `\ucN` fallback
  * skipping) decode, destination groups that carry no body text (font/color
  * tables, stylesheets, info, pictures, embedded objects, headers/footers)
  * and all `{\*...}` starred destinations are skipped. Formatting control
  * words are dropped.
  *
  * Never throws: failures are error-as-value results (reuses
  * OoxmlParser.Result so the dispatcher routes uniformly). Work is O(n)
  * single pass; output is capped.
  */
object RtfParser {

  import OoxmlParser.{OoxmlFailure, Result}

  private val MaxOutChars = 4 << 20

  /** cp1252 byte -> char table (RTF's default ANSI codepage). */
  private val Cp1252: Array[Char] = {
    val bytes = Array.tabulate[Byte](256)(_.toByte)
    new String(bytes, java.nio.charset.Charset.forName("windows-1252")).toCharArray
  }

  /** Destination control words whose whole group is dropped (no body text). */
  private val SkipDestinations: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "footnote", "ftnsep", "ftnsepc",
    "aftnsep", "aftnsepc", "annotation", "fldinst", "themedata",
    "filetbl", "listtable", "listoverridetable", "revtbl", "xmlnstbl",
    "generator", "datastore", "latentstyles", "rsidtbl",
    "colorschememapping", "background", "docvar", "pgptbl")

  def extract(payload: Array[Byte]): Result = {
    try {
      val s = new String(payload, StandardCharsets.ISO_8859_1)
      if (!s.startsWith("{\\rtf")) return OoxmlFailure("not an rtf payload")
      val sb = new java.lang.StringBuilder(1024)
      val len = s.length
      var i = 0
      var depth = 0
      var skipDepth = Int.MaxValue // skipping while depth >= skipDepth
      // \ucN is GROUP-SCOPED per the RTF spec (a {\uc0 ...} group must not
      // leak its skip count past its closing brace): push on '{', pop on '}'
      var ucSkip = 1
      var ucStack = new Array[Int](32)
      var ucTop = 0
      var pendingUcSkip = 0

      def skipping: Boolean = depth >= skipDepth
      def emit(c: Char): Unit =
        if (pendingUcSkip > 0) pendingUcSkip -= 1
        else if (!skipping && sb.length < MaxOutChars) sb.append(c)

      while (i < len && depth >= 0) {
        val c = s.charAt(i)
        if (c == '{') {
          depth += 1
          if (ucTop == ucStack.length)
            ucStack = java.util.Arrays.copyOf(ucStack, ucStack.length * 2)
          ucStack(ucTop) = ucSkip
          ucTop += 1
          pendingUcSkip = 0 // \uN fallback text never crosses a group boundary
          i += 1
        }
        else if (c == '}') {
          depth -= 1
          if (ucTop > 0) { ucTop -= 1; ucSkip = ucStack(ucTop) }
          pendingUcSkip = 0 // an unconsumed skip must not eat outer body text
          i += 1
          if (depth < skipDepth) skipDepth = Int.MaxValue
        } else if (c == '\r' || c == '\n') i += 1 // raw newlines are ignored
        else if (c != '\\') { emit(c); i += 1 }
        else if (i + 1 >= len) i = len
        else {
          val n = s.charAt(i + 1)
          if ((n >= 'a' && n <= 'z') || (n >= 'A' && n <= 'Z')) {
            // control word: letters, optional signed numeric param,
            // optional ONE space delimiter (consumed)
            var j = i + 2
            while (j < len && { val x = s.charAt(j)
              (x >= 'a' && x <= 'z') || (x >= 'A' && x <= 'Z') }) j += 1
            val word = s.substring(i + 1, j)
            var neg = false
            if (j < len && s.charAt(j) == '-') { neg = true; j += 1 }
            val ps = j
            while (j < len && Character.isDigit(s.charAt(j))) j += 1
            val param: Long =
              if (j == ps) Long.MinValue // absent
              else {
                val digits = s.substring(ps, math.min(j, ps + 10))
                val v = digits.toLong
                if (neg) -v else v
              }
            if (j < len && s.charAt(j) == ' ') j += 1 // delimiter consumed
            i = j
            word match {
              case "u" if param != Long.MinValue =>
                val cp = (if (param < 0) param + 65536 else param).toInt
                if (!skipping && cp >= 0 && cp <= 0x10ffff &&
                    Character.isValidCodePoint(cp) && sb.length < MaxOutChars)
                  sb.appendCodePoint(cp)
                pendingUcSkip = ucSkip
              case "uc" if param != Long.MinValue =>
                ucSkip = math.max(0, math.min(param, 8)).toInt
              case "par" | "line" | "sect" | "page" | "row" => emit('\n')
              case "tab" | "cell" => emit('\t')
              case "emdash" => emit('—')
              case "endash" => emit('–')
              case "bullet" => emit('•')
              case "lquote" => emit('‘')
              case "rquote" => emit('’')
              case "ldblquote" => emit('“')
              case "rdblquote" => emit('”')
              case "bin" if param > 0 =>
                // raw binary run: skip exactly param bytes
                i = math.min(len.toLong, i + param).toInt
              case w if SkipDestinations.contains(w) =>
                if (depth < skipDepth) skipDepth = depth
              case _ => // formatting control word: dropped
            }
          } else {
            n match {
              case '\'' => // \'xx cp1252 hex escape
                if (i + 3 < len) {
                  val hi = Character.digit(s.charAt(i + 2), 16)
                  val lo = Character.digit(s.charAt(i + 3), 16)
                  if (hi >= 0 && lo >= 0) {
                    emit(Cp1252((hi << 4) | lo))
                    i += 4
                  } else i += 2
                } else i = len
              case '\\' | '{' | '}' => emit(n); i += 2
              case '*' => // starred destination: skip the enclosing group
                if (depth < skipDepth) skipDepth = depth
                i += 2
              case '~' => emit(' '); i += 2 // non-breaking space
              case '_' => emit('-'); i += 2 // non-breaking hyphen
              case '-' => i += 2 // optional hyphen: dropped
              case '\r' | '\n' => emit('\n'); i += 2 // \<CRLF> == \par
              case _ => i += 2 // unknown control symbol: dropped
            }
          }
        }
      }
      OoxmlParser.paragraphsToResult(sb.toString.split("\n", -1).toSeq, "p")
    } catch {
      case NonFatal(_) | _: StackOverflowError => OoxmlFailure("rtf parse error")
    }
  }
}
