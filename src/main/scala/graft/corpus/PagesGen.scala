package graft.corpus

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import graft.core.Page

/** SplitMix64 — splittable, per-row-index seeded RNG so generated content is
  * a pure function of (seed, rowIndex) and therefore independent of Spark
  * partitioning (SURVEY.md §7 M0 determinism requirement). */
final class Rng(seed: Long) {
  private var state: Long = seed
  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def nextInt(bound: Int): Int = {
    require(bound > 0)
    ((nextLong() >>> 33) % bound).toInt
  }
  def nextBool(p: Double): Boolean = ((nextLong() >>> 11) * 1.1102230246251565e-16) < p
}

object Rng {
  def forRow(seed: Long, idx: Long): Rng =
    new Rng(seed * 0x100000001b3L ^ (idx + 1) * 0xc2b2ae3d27d4eb4fL)
}

/** Deterministic synthetic Common-Crawl-style pages corpus
  * (BASELINE.json input_hint shape; categories mirror the reference's
  * fixture expectation tables, tests/test_dependencies.py — see FIXTURES.md
  * §3). Pure function of (seed, index): safe to generate inside Spark tasks.
  */
object PagesGen {

  val Seed = 42L

  /** Bump when generated content changes — cache paths embed it so stale
    * materialized corpora are never reused.
    * c3: ooxml/odf/zip categories, pdf-encrypted-partial, pdf-encrypt-text,
    * attachment filespec props.
    * c5: pdf-attachments sometimes attach a nested PDF (v2 policy + parser
    * isolation coverage); media-junk adds gif/jpeg/wav variants with
    * parseable headers.
    * c6: full format registry — ods/odp/odg, legacy OLE2 doc/xls/ppt, rtf,
    * StarOffice sx*, iWork/epub zips; media-junk adds tiff + webp-VP8X;
    * category map re-sliced (dup pair now 83/84).
    * c7: the OLE2 categories carry REAL Office content (MS-DOC FIB + piece
    * table, BIFF8 SST, PPT text atoms in a proper multi-stream CFB with
    * ministream) and extract as finished.
    * c8: csv category (text/csv naming, config.yml:191); media-junk grows a
    * heif/heic variant (ftyp + meta/iprp/ipco/ispe with real dims) and
    * rotates variants PER ROW so all 9 appear within 500 rows.
    * c9: ~15% of html-clean article paragraphs carry a planted PII
    * sentence (ASCII email, +CC phone, dotted-quad IP) inline so the d12
    * scrubbing op is corpus-exercised on text that survives boilerplate
    * removal.
    * c10: ~20% of html-clean pages append one of four FIXED disclaimer
    * paragraphs inside the article (repeated-boilerplate that page-level
    * extraction keeps — the d14 passage-dedup target).
    * c11: the key%7==5 host becomes a ccSLD host with a subdomain
    * (`news.example-5.co.uk`) so PSL-aware registered-domain extraction
    * (Urls.CcSlds) is corpus-exercised: the registered domain must be the
    * THREE-label `example-5.co.uk`, not `co.uk`.
    * c12: ~40% of planted PII sentences additionally carry an IPv6
    * address (compressed form) and a space-grouped payment-card number —
    * the r6 PiiScan categories, exercised on text that survives
    * boilerplate removal.
    * c13: hosts 1/2/4/6 exercise the structured PSL rule classes —
    * `www.example-1.kawasaki.jp` (2-label wildcard -> 4-label registered
    * domain), `shop.example-2.ck` (1-label wildcard -> 3 labels),
    * `example-4.city.kawasaki.jp` (3-label exception ->
    * `city.kawasaki.jp`), `example-6.www.ck` (2-label exception ->
    * `www.ck`).
    * c14/c15: non-Latin word pools (ru Cyrillic, el Greek, zh CJK) join the
    * lang rotation so the widened 22-language ID (TextStats
    * StopLists/ScriptLangs) is exercised on corpus text that survives
    * extraction — incl. a script-scored language with no whitespace
    * tokens.
    * c16: ja (kana-only pool) and ko (Hangul) join the rotation — every
    * script-scored branch of the language ID is corpus-exercised. */
  val CorpusVersion = "c16"

  // fixed multilingual word pools (fi / sv / en flavor for `lang` variety)
  private val WordsEn = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "data",
    "pipeline", "document", "content", "extraction", "analysis", "system",
    "report", "value", "public", "service", "record", "archive", "crawl",
    "measure", "quality", "number", "window", "stream", "batch", "cluster",
    "partition", "schema", "column", "table", "engine", "result", "model")
  private val WordsFi = Array(
    "asiakirja", "palvelu", "tieto", "järjestelmä", "sisältö", "raportti",
    "arvo", "julkinen", "arkisto", "laatu", "määrä", "ikkuna", "virta",
    "erä", "osio", "taulukko", "moottori", "tulos", "malli", "sivu",
    "verkko", "haku", "kieli", "teksti", "oikeus", "ministeriö", "laki",
    // function words (c15): real fi text carries them, and they are the
    // TextStats lang-id signal — without them fi docs guess 'und' (c15)
    "ja", "on", "ei", "että", "myös", "niin", "kun")
  private val WordsSv = Array(
    "dokument", "tjänst", "innehåll", "rapport", "värde", "offentlig",
    "arkiv", "kvalitet", "antal", "fönster", "ström", "parti", "tabell",
    "motor", "resultat", "modell", "sida", "nät", "sök", "språk", "text",
    "rätt", "departement", "lag", "myndighet",
    "och", "att", "som", "är", "med", "för", "inte") // function words (c15)
  // non-Latin pools (c14): each mixes that language's FUNCTION words (the
  // TextStats stoplist signal) with content nouns, like a real text would
  private val WordsRu = Array(
    "и", "в", "не", "на", "что", "это", "как", "мы", "они", "было", "есть",
    "данные", "система", "файл", "отчет", "архив", "качество", "значение",
    "таблица", "модель", "страница", "поиск", "язык", "текст", "закон")
  private val WordsEl = Array(
    "και", "το", "να", "του", "με", "για", "είναι", "από", "δεν", "θα",
    "δεδομένα", "σύστημα", "αρχείο", "υπηρεσία", "ποιότητα", "αξία",
    "πίνακας", "μοντέλο", "σελίδα", "γλώσσα", "κείμενο", "νόμος")
  private val WordsZh = Array(
    "数据", "系统", "文件", "内容", "服务", "报告", "价值", "公共", "档案",
    "质量", "数量", "窗口", "批次", "分区", "表格", "引擎", "结果", "模型",
    "页面", "网络", "搜索", "语言", "文本", "法律")
  // ja pool is deliberately KANA-only (katakana loanwords + hiragana
  // particles, no kanji): kanji chars live in the CJK-ideograph range the
  // zh score counts, and a kanji-heavy pool would (correctly, per the
  // documented heuristic) classify as zh — the corpus exercises the
  // kana-range branch
  private val WordsJa = Array(
    "データ", "システム", "ファイル", "サービス", "モデル", "ページ",
    "テキスト", "アーカイブ", "クラスタ", "パーティション", "エンジン",
    "ストリーム", "バッチ", "これ", "それ", "など", "です", "ます",
    "から", "まで", "ください", "について")
  private val WordsKo = Array(
    "데이터", "시스템", "파일", "내용", "서비스", "보고서", "가치", "공공",
    "기록", "품질", "수량", "창", "흐름", "배치", "파티션", "표", "엔진",
    "결과", "모델", "페이지", "네트워크", "검색", "언어", "텍스트")

  private def pool(lang: String): Array[String] = lang match {
    case "fi" => WordsFi
    case "sv" => WordsSv
    case "ru" => WordsRu
    case "el" => WordsEl
    case "zh" => WordsZh
    case "ja" => WordsJa
    case "ko" => WordsKo
    case _ => WordsEn
  }

  def sentence(r: Rng, lang: String): String = {
    val w = pool(lang)
    val n = 4 + r.nextInt(9)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      val word = w(r.nextInt(w.length))
      if (i == 0) {
        sb.append(Character.toUpperCase(word.charAt(0)))
        sb.append(word, 1, word.length)
      } else {
        sb.append(' ').append(word)
      }
      i += 1
    }
    sb.append('.')
    sb.toString
  }

  def paragraph(r: Rng, lang: String, sentences: Int): String =
    (0 until sentences).map(_ => sentence(r, lang)).mkString(" ")

  // weighted rotation; ru/el/zh joined in c14, ja/ko in c16 — all five
  // non-Latin scripts (incl. both CJK script-scored branches) flow
  // through extraction, curation and the d17 language query
  private val Langs = Array("en", "fi", "sv", "en", "ru", "fi", "el", "en",
    "zh", "sv", "ja", "ko")

  /** Category by row index — fixed proportions (FIXTURES.md §3). The c6
    * slice covers the reference's whole 24-mimetype registry
    * (config.yml:34-153): convertable documents, legacy OLE2, RTF, the full
    * ODF + StarOffice families, iWork/epub, media, and the failure modes. */
  def category(idx: Long): String = (idx % 100) match {
    case m if m < 33 => "html-clean"
    case 33 => "csv"
    case m if m < 47 => "html-messy"
    case m if m < 56 => "html-linkfarm"
    case m if m < 66 => "pdf-simple"
    case m if m < 69 => "pdf-attachments"
    case m if m < 71 => "pdf-already-done"
    case 71 => "pdf-encrypted"
    case 72 => "pdf-encrypted-partial"
    case m if m < 75 => "pdf-bad-coords"
    case m if m < 77 => "media-junk"
    case m if m < 79 => "random-junk"
    case m if m < 81 => "truncated"
    case 81 => "empty"
    case 82 => "giant"
    case 83 | 84 => "dup-url" // 83 = first crawl, 84 = re-crawl of 83's url
    case 85 => "docx"
    case 86 => "odt"
    case 87 => "pptx"
    case 88 => "xlsx"
    case 89 => "zip-plain"
    case 90 => "pdf-encrypt-text" // "/Encrypt" + "pdfaid:part" as TEXT
    case 91 => "ods"
    case 92 => "odp"
    case 93 => "odg"
    case 94 => "cfb-doc" // legacy binary Word (OLE2 compound)
    case 95 => "cfb-xls"
    case 96 => "cfb-ppt"
    case 97 => "rtf"
    case 98 => "staroffice" // sx* rotating writer/calc/impress/draw
    case _ => "exotic-zip" // 99: iWork / epub rotating
  }

  /** Expected extraction status per category (expectation-table-as-code,
    * the test_dependencies.py analog). */
  def expectedStatus(cat: String): String = cat match {
    case "pdf-already-done" => "non-convertable"
    case "pdf-encrypted" => "password-protected"
    case "pdf-encrypted-partial" => "password-protected-partial"
    case "pdf-bad-coords" => "failed"
    case "media-junk" => "non-convertable"
    case "random-junk" => "corrupted"
    case "truncated" => "corrupted"
    case "empty" => "corrupted"
    case "zip-plain" => "non-convertable"
    // detected + correctly typed; iWork/epub the reference does not convert
    case "exotic-zip" => "non-convertable"
    case _ => "finished"
  }

  def url(idx: Long): String = {
    val cat = category(idx)
    // dup pair shares one url, keyed to the first crawl's index
    val key = if (cat == "dup-url" && idx % 100 == 84) idx - 1 else idx
    // hosts 1/2/4/5/6 exercise the PSL rule classes (c11/c13) — every
    // registered-domain branch of Urls.registeredDomain appears in the
    // corpus: wildcard *.kawasaki.jp, wildcard *.ck, exception
    // !city.kawasaki.jp, plain ccSLD co.uk, exception !www.ck
    val host = (key % 7) match {
      case 1 => "www.example-1.kawasaki.jp" // -> www.example-1.kawasaki.jp
      case 2 => "shop.example-2.ck"         // -> shop.example-2.ck
      case 4 => "example-4.city.kawasaki.jp" // -> city.kawasaki.jp
      case 5 => "news.example-5.co.uk"      // -> example-5.co.uk
      case 6 => "example-6.www.ck"          // -> www.ck
      case n => s"example-$n.test"          // -> example-N.test
    }
    s"https://$host/$cat/doc-$key"
  }

  def warcTs(idx: Long): Timestamp = {
    val base = 1735689600000L // 2025-01-01T00:00:00Z
    val bump = if (category(idx) == "dup-url" && idx % 100 == 84) 7200000L else 0L
    new Timestamp(base + idx * 1000L + bump)
  }

  /** Generate row `idx` of the corpus. Pure; never throws. */
  def page(idx: Long): Page = {
    val r = Rng.forRow(Seed, idx)
    val lang = Langs(r.nextInt(Langs.length))
    val cat = category(idx)
    // sizes approximate the Common-Crawl page-size distribution: most pages
    // 3-15 KB of markup, a long tail, ~1% giants (the 100 MB cap analog)
    val html: Array[Byte] = cat match {
      case "html-clean" => htmlClean(r, lang, 8 + r.nextInt(18))
      case "html-messy" => htmlMessy(r, lang)
      case "html-linkfarm" => htmlLinkfarm(r, lang)
      case "pdf-simple" =>
        PdfGen.build(PdfGen.PdfSpec(pdfPages(r, lang, 2 + r.nextInt(4))))
      case "pdf-attachments" =>
        // half also attach a NESTED PDF: exercises the v2 (pdf-only)
        // re-attach policy and the parser's stream-extent isolation (inner
        // content/trailer/filespec keywords must not leak into the outer doc)
        val atts = Seq(
          s"att-${r.nextInt(100)}.txt" -> sentence(r, lang).getBytes(StandardCharsets.UTF_8)) ++
          (if (r.nextBool(0.5))
            Seq(s"att-${r.nextInt(100)}.pdf" ->
              PdfGen.build(PdfGen.PdfSpec(Seq(Seq(sentence(r, lang))))))
          else Nil)
        PdfGen.build(PdfGen.PdfSpec(pdfPages(r, lang, 1 + r.nextInt(2)),
          attachments = atts))
      case "pdf-already-done" =>
        PdfGen.build(PdfGen.PdfSpec(pdfPages(r, lang, 1), pdfaMarker = true))
      case "pdf-encrypted" =>
        PdfGen.build(PdfGen.PdfSpec(pdfPages(r, lang, 1), encrypted = true))
      case "pdf-encrypted-partial" =>
        PdfGen.build(PdfGen.PdfSpec(pdfPages(r, lang, 1), encryptedPartial = true))
      case "pdf-encrypt-text" =>
        // a NORMAL pdf whose prose mentions the probe markers — must extract
        // as finished (probe-restriction regression fixture)
        PdfGen.build(PdfGen.PdfSpec(Seq(
          Seq(s"Discussing /Encrypt dictionaries and pdfaid:part markers in prose.",
            sentence(r, lang), sentence(r, lang), sentence(r, lang)))))
      case "docx" =>
        ZipGen.docx((0 until 4 + r.nextInt(8)).map(_ => paragraph(r, lang, 2 + r.nextInt(3))))
      case "odt" =>
        ZipGen.odt(sentence(r, lang),
          (0 until 3 + r.nextInt(6)).map(_ => paragraph(r, lang, 2 + r.nextInt(3))))
      case "pptx" =>
        ZipGen.pptx((0 until 1 + r.nextInt(3)).map(_ =>
          (0 until 2 + r.nextInt(4)).map(_ => sentence(r, lang))))
      case "xlsx" =>
        ZipGen.xlsx((0 until 5 + r.nextInt(10)).map(_ => sentence(r, lang)))
      case "zip-plain" =>
        ZipGen.zip(Seq("data/readme.bin" -> junkBytes(r, 64 + r.nextInt(128))))
      case "ods" =>
        ZipGen.ods((0 until 4 + r.nextInt(8)).map(_ => sentence(r, lang)))
      case "odp" =>
        ZipGen.odp((0 until 1 + r.nextInt(3)).map(_ =>
          (0 until 2 + r.nextInt(3)).map(_ => sentence(r, lang))))
      case "odg" =>
        ZipGen.odg((0 until 2 + r.nextInt(4)).map(_ => sentence(r, lang)))
      case "cfb-doc" =>
        LegacyGen.doc((0 until 3 + r.nextInt(6)).map(_ => paragraph(r, lang, 2 + r.nextInt(3))))
      case "cfb-xls" =>
        LegacyGen.xls((0 until 5 + r.nextInt(10)).map(_ => sentence(r, lang)))
      case "cfb-ppt" =>
        LegacyGen.ppt((0 until 1 + r.nextInt(3)).map(_ =>
          (0 until 2 + r.nextInt(3)).map(_ => sentence(r, lang))))
      case "rtf" =>
        LegacyGen.rtf((0 until 3 + r.nextInt(6)).map(_ => paragraph(r, lang, 2 + r.nextInt(3))))
      case "staroffice" =>
        val app = Array("writer", "calc", "impress", "draw").apply(((idx / 100) % 4).toInt)
        ZipGen.sx(app, (0 until 3 + r.nextInt(5)).map(_ => paragraph(r, lang, 2)))
      case "exotic-zip" =>
        ((idx / 100) % 4).toInt match {
          case 0 => ZipGen.iwork("pages", junkBytes(r, 128 + r.nextInt(128)))
          case 1 => ZipGen.iwork("keynote", junkBytes(r, 128 + r.nextInt(128)))
          case 2 => ZipGen.iwork("numbers", junkBytes(r, 128 + r.nextInt(128)))
          case _ => ZipGen.epub((0 until 3).map(_ => paragraph(r, lang, 2)))
        }
      case "csv" => csvPayload(r, lang)
      case "pdf-bad-coords" =>
        PdfGen.build(PdfGen.PdfSpec(pdfPages(r, lang, 1), badCoords = true))
      case "media-junk" =>
        // per-ROW variant rotation (2 media rows per 100-block at 75/76):
        // all 9 variants — incl. heif/heic — appear within the first 500
        // rows, so goldens/expected.tsv and the m01 export exercise each
        mediaJunk(r, (((idx / 100) * 2 + (idx % 100 - 75)) % 9).toInt)
      case "random-junk" => randomJunk(r)
      case "truncated" =>
        // valid PDF prefix cut before any content stream completes
        val full = PdfGen.build(PdfGen.PdfSpec(pdfPages(r, lang, 2)))
        java.util.Arrays.copyOf(full, math.min(full.length, 120 + r.nextInt(60)))
      case "empty" => Array.emptyByteArray
      case "giant" => htmlClean(r, lang, 2000) // skew stressor (~0.6 MB)
      case "dup-url" =>
        // re-crawl (…93) gets extra paragraphs: dedup must pick it
        val paras = 8 + (if (idx % 100 == 93) 4 else 0)
        htmlClean(Rng.forRow(Seed, idx), lang, paras)
      case _ => htmlClean(r, lang, 6 + r.nextInt(10))
    }
    val crawlText = // the crawler's own (unused) text guess
      if (cat.startsWith("html")) paragraph(Rng.forRow(Seed + 1, idx), lang, 2)
      else null
    Page(url(idx), warcTs(idx), html, crawlText, lang)
  }

  // ------------------------------------------------------------ builders

  private def navBlock(r: Rng, lang: String): String = {
    val w = pool(lang)
    val items = (0 until 12 + r.nextInt(12)).map { _ =>
      s"""<li><a href="/${w(r.nextInt(w.length))}">${w(r.nextInt(w.length))}</a></li>"""
    }.mkString
    s"""<nav class="main-nav"><ul>$items</ul></nav>"""
  }

  private def footerBlock(r: Rng, lang: String): String = {
    val w = pool(lang)
    val links = (0 until 4).map(_ =>
      s"""<a href="/${w(r.nextInt(w.length))}">${w(r.nextInt(w.length))}</a>""").mkString(" | ")
    s"""<footer><p>© 2025 Example ${w(r.nextInt(w.length))}</p><p>$links</p></footer>"""
  }

  private def sidebarBlock(r: Rng, lang: String): String = {
    val w = pool(lang)
    val items = (0 until 10 + r.nextInt(8)).map(_ =>
      s"""<li><a href="/${w(r.nextInt(w.length))}">${sentence(r, lang).take(24)}</a></li>""").mkString
    s"""<aside class="sidebar"><h3>${w(r.nextInt(w.length))}</h3><ul>$items</ul></aside>"""
  }

  /** Planted PII (ASCII-only so the Java-regex and RE2 oracles agree on
    * every char class): email, international-format phone, IPv4 — and in
    * ~40% of cases an IPv6 (compressed form) plus a space-grouped card
    * number (c12). Appended INSIDE a long content paragraph so
    * boilerplate removal keeps it. */
  private def piiSentence(r: Rng): String = {
    val u = WordsEn(r.nextInt(WordsEn.length))
    val u2 = WordsEn(r.nextInt(WordsEn.length))
    val dom = WordsEn(r.nextInt(WordsEn.length))
    val phone = "+3584" + (1000000 + r.nextInt(9000000))
    val ip = s"10.${r.nextInt(256)}.${r.nextInt(256)}.${r.nextInt(256)}"
    val base = s"Contact $u.$u2@$dom.example, tel $phone, host $ip."
    if (!r.nextBool(0.4)) base
    else {
      def hx() = Integer.toHexString(1 + r.nextInt(0xffff))
      val v6 = s"2001:db8:${hx()}:${hx()}::${hx()}"
      val card = s"4${100 + r.nextInt(900)} ${1000 + r.nextInt(9000)} " +
        s"${1000 + r.nextInt(9000)} ${1000 + r.nextInt(9000)}"
      s"$base Node $v6, card $card."
    }
  }

  /** FIXED cross-page disclaimer paragraphs: in-article boilerplate that
    * page-level extraction correctly keeps (normal length, no links) —
    * exactly what passage-level dedup (d14) exists to remove. */
  val Disclaimers: Array[String] = Array(
    "All content on this site is provided for general information purposes only and may change without notice.",
    "Subscribe to our newsletter to receive weekly updates and service announcements from the editorial team.",
    "This article is licensed for personal reading and may not be redistributed without prior written permission.",
    "Comments are moderated and will appear after review by the site administrators during normal office hours.")

  def htmlClean(r: Rng, lang: String, paras: Int): Array[Byte] = {
    val title = sentence(r, lang)
    val heading = sentence(r, lang)
    val bodyParas = (0 until paras)
      .map { _ =>
        val base = paragraph(r, lang, 2 + r.nextInt(4))
        val text = if (r.nextBool(0.15)) base + " " + piiSentence(r) else base
        s"<p>$text</p>"
      } ++
      (if (r.nextBool(0.2)) Seq(s"<p>${Disclaimers(r.nextInt(4))}</p>") else Nil)
    val body = bodyParas.mkString("\n")
    val html =
      s"""<!DOCTYPE html>
         |<html lang="$lang"><head><meta charset="utf-8"><title>$title</title></head>
         |<body>
         |<header class="site-header"><h1>Example Site</h1>${navBlock(r, lang)}</header>
         |<div class="content"><article>
         |<h1>$heading</h1>
         |$body
         |</article></div>
         |${sidebarBlock(r, lang)}
         |${footerBlock(r, lang)}
         |</body></html>""".stripMargin
    html.getBytes(StandardCharsets.UTF_8)
  }

  def htmlMessy(r: Rng, lang: String): Array[Byte] = {
    // unclosed tags, stray end tags, bad entities, unquoted attrs,
    // windows-1252 declared charset with 8-bit punctuation bytes
    val p1 = paragraph(r, lang, 3)
    val p2 = paragraph(r, lang, 4)
    val p3 = paragraph(r, lang, 2)
    val html =
      s"""<html><head><meta charset=windows-1252><title>${sentence(r, lang)}</head>
         |<body>
         |<div class=wrap>
         |<h2>${sentence(r, lang)}
         |<p>$p1 &nosuch; &amp; <b>bold $p2
         |<p>$p3 quoted &#8212; end</div>
         |</span></em>
         |${footerBlock(r, lang)}
         |${(0 until 6 + r.nextInt(8)).map(_ => s"<p>${paragraph(r, lang, 2 + r.nextInt(4))}").mkString("\n")}""".stripMargin
    // encode as windows-1252 so the declared charset is honest
    html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
  }

  def htmlLinkfarm(r: Rng, lang: String): Array[Byte] = {
    val w = pool(lang)
    val farms = (0 until 16).map { _ =>
      val links = (0 until 14 + r.nextInt(14)).map(_ =>
        s"""<a href="/${w(r.nextInt(w.length))}-${r.nextInt(1000)}">${w(r.nextInt(w.length))} ${w(r.nextInt(w.length))}</a>""").mkString(" ")
      s"<div>$links</div>"
    }.mkString("\n")
    val main = s"<p>${paragraph(r, lang, 5)}</p><p>${paragraph(r, lang, 4)}</p><p>${paragraph(r, lang, 5)}</p>"
    val html =
      s"""<!DOCTYPE html><html><head><title>${sentence(r, lang)}</title></head>
         |<body>$farms<article>$main</article>$farms</body></html>""".stripMargin
    html.getBytes(StandardCharsets.UTF_8)
  }

  def pdfPages(r: Rng, lang: String, n: Int): Seq[Seq[String]] =
    (0 until n).map { _ =>
      (0 until 20 + r.nextInt(25)).map(_ => sentence(r, lang))
    }

  /** Plain CSV: header + data rows, every line the same comma count — the
    * shape the sniffer's text/csv heuristic names (reference FILEMIMETYPES
    * magic fallback, config.yml:191). */
  def csvPayload(r: Rng, lang: String): Array[Byte] = {
    val w = pool(lang)
    val cols = 3 + r.nextInt(4)
    val header = (0 until cols).map(i => s"${w(r.nextInt(w.length))}_$i").mkString(",")
    val rows = (0 until 8 + r.nextInt(20)).map { _ =>
      (0 until cols).map(_ =>
        if (r.nextBool(0.3)) r.nextInt(100000).toString
        else w(r.nextInt(w.length))).mkString(",")
    }
    (header +: rows).mkString("\n").getBytes(StandardCharsets.UTF_8)
  }

  private def mediaJunk(r: Rng, variant: Int): Array[Byte] = {
    // every variant has a VALID, parseable header (the part ops.Multimodal
    // really reads) followed by junk body bytes
    val sig: Array[Byte] = variant match {
      case 0 => Array[Byte](0, 0, 0, 0x20, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm') // mp4
      case 1 => "fLaC".getBytes(StandardCharsets.US_ASCII) // flac
      case 2 => // png with a VALID IHDR chunk so header metadata is parseable
        val w = 16 + r.nextInt(2048)
        val h = 16 + r.nextInt(2048)
        Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
          0, 0, 0, 13, 'I', 'H', 'D', 'R',
          (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
          (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
          8, 2, 0, 0, 0)
      case 3 => // gif: logical screen size LE16 at 6/8
        val w = 16 + r.nextInt(2048)
        val h = 16 + r.nextInt(2048)
        "GIF89a".getBytes(StandardCharsets.US_ASCII) ++
          Array[Byte](w.toByte, (w >>> 8).toByte, h.toByte, (h >>> 8).toByte, 0, 0, 0)
      case 4 => // jpeg: SOI + SOF0 frame header (height BE16 +5, width +7)
        val w = 16 + r.nextInt(2048)
        val h = 16 + r.nextInt(2048)
        Array[Byte](0xff.toByte, 0xd8.toByte,
          0xff.toByte, 0xc0.toByte, 0, 17, 8,
          (h >>> 8).toByte, h.toByte, (w >>> 8).toByte, w.toByte,
          3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      case 5 => // wav: RIFF/WAVE + canonical fmt chunk (rate LE32, channels LE16)
        val rate = Array(8000, 16000, 22050, 44100, 48000)(r.nextInt(5))
        val ch = 1 + r.nextInt(2)
        "RIFF".getBytes(StandardCharsets.US_ASCII) ++
          Array[Byte](36, 1, 0, 0) ++
          "WAVEfmt ".getBytes(StandardCharsets.US_ASCII) ++
          Array[Byte](16, 0, 0, 0, 1, 0, ch.toByte, 0,
            rate.toByte, (rate >>> 8).toByte, (rate >>> 16).toByte, (rate >>> 24).toByte,
            0, 0, 0, 0, 0, 0, 16, 0) ++
          "data".getBytes(StandardCharsets.US_ASCII) ++ Array[Byte](0, 1, 0, 0)
      case 6 => // tiff (LE): IFD at 8 with ImageWidth/ImageLength SHORT tags
        val w = 16 + r.nextInt(2048)
        val h = 16 + r.nextInt(2048)
        Array[Byte]('I', 'I', 0x2a, 0, 8, 0, 0, 0, // header + IFD offset 8
          2, 0, // 2 entries
          0, 1, 3, 0, 1, 0, 0, 0, w.toByte, (w >>> 8).toByte, 0, 0, // tag 256
          1, 1, 3, 0, 1, 0, 0, 0, h.toByte, (h >>> 8).toByte, 0, 0, // tag 257
          0, 0, 0, 0) // next IFD: none
      case 7 => // webp VP8X: canvas size as 24-bit LE minus-one fields
        val w = 16 + r.nextInt(2048)
        val h = 16 + r.nextInt(2048)
        "RIFF".getBytes(StandardCharsets.US_ASCII) ++
          Array[Byte](0x40, 1, 0, 0) ++
          "WEBPVP8X".getBytes(StandardCharsets.US_ASCII) ++
          Array[Byte](10, 0, 0, 0, 0, 0, 0, 0,
            (w - 1).toByte, ((w - 1) >>> 8).toByte, ((w - 1) >>> 16).toByte,
            (h - 1).toByte, ((h - 1) >>> 8).toByte, ((h - 1) >>> 16).toByte)
      case 8 => // heif/heic: ftyp + meta>iprp>ipco>ispe box walk, real dims
        val w = 16 + r.nextInt(2048)
        val h = 16 + r.nextInt(2048)
        val brand = if (r.nextBool(0.5)) "heic" else "mif1"
        def be(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
          (v >>> 8).toByte, v.toByte)
        def a(s: String) = s.getBytes(StandardCharsets.US_ASCII)
        be(16) ++ a("ftyp") ++ a(brand) ++ be(0) ++ // major brand + minor
          be(48) ++ a("meta") ++ be(0) ++ // FullBox version/flags
          be(36) ++ a("iprp") ++
          be(28) ++ a("ipco") ++
          be(20) ++ a("ispe") ++ be(0) ++ be(w) ++ be(h)
      case _ => // unreachable (variant is %9); keep mp4 for safety
        Array[Byte](0, 0, 0, 0x20, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm')
    }
    val tail = new Array[Byte](256 + r.nextInt(256))
    var i = 0
    while (i < tail.length) { tail(i) = (r.nextLong() & 0xff).toByte; i += 1 }
    sig ++ tail
  }

  private def junkBytes(r: Rng, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = (r.nextLong() & 0xff).toByte; i += 1 }
    b
  }

  private def randomJunk(r: Rng): Array[Byte] = {
    val b = new Array[Byte](128 + r.nextInt(512))
    var i = 0
    while (i < b.length) {
      b(i) = (r.nextLong() & 0xff).toByte
      i += 1
    }
    // ensure no accidental magic prefix: force a NUL first byte
    if (b.length > 0) b(0) = 0
    b
  }
}
