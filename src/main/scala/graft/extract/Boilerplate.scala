package graft.extract

import scala.collection.mutable.ArrayBuffer

import graft.core.Span

/** Text-block segmentation + text/link-density boilerplate classification
  * (Boilerpipe/Readability-style, per north_star). This is the extraction
  * core — the Spark-side analog of the reference's conversion engine
  * (docsbox/docs/unoconv/converter.py:36-69), re-expressed as deterministic
  * density heuristics over the lightweight DOM.
  *
  * The block classifier is the NumWordsRules decision tree published in
  * Kohlschütter, Fankhauser, Nejdl, "Boilerplate Detection using Shallow
  * Text Features" (WSDM 2010) — fixed thresholds, heuristicsVersion v1.
  */
object Boilerplate {

  final case class Block(
      text: String,
      words: Int,
      linkWords: Int,
      tag: String,
      boilerCtx: Boolean) {
    def linkDensity: Double = if (words == 0) 0.0 else math.min(linkWords, words).toDouble / words
    def heading: Boolean =
      tag.length == 2 && tag.charAt(0) == 'h' && tag.charAt(1) >= '1' && tag.charAt(1) <= '6'
  }

  final case class Result(text: String, spans: Vector[Span], totalWords: Int, contentBlocks: Int)

  /** Elements that delimit text blocks. */
  val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "dl",
    "dt", "dd", "td", "th", "tr", "table", "thead", "tbody", "blockquote",
    "pre", "article", "section", "main", "figure", "figcaption", "nav",
    "header", "footer", "aside", "form", "fieldset", "address", "center",
    "body", "html")

  /** Structural boilerplate containers. */
  val BoilerTags: Set[String] = Set("nav", "header", "footer", "aside", "form")

  /** class/id tokens that mark boilerplate containers (substring match). */
  val BoilerHints: Array[String] = Array(
    "nav", "menu", "footer", "header", "sidebar", "banner", "cookie",
    "breadcrumb", "advert", "-ad-", "promo", "social", "share", "related",
    "comment", "widget")

  /** Subtrees skipped entirely. */
  val SkipTags: Set[String] = Set(
    "script", "style", "noscript", "textarea", "head", "title", "svg",
    "iframe", "select", "button", "object", "template")

  private def hasBoilerHint(e: Elem): Boolean = {
    var as = e.attrs
    while (as.nonEmpty) {
      val (k, v) = as.head
      if (k == "class" || k == "id" || k == "role") {
        val lv = v.toLowerCase
        var i = 0
        while (i < BoilerHints.length) {
          if (lv.contains(BoilerHints(i))) return true
          i += 1
        }
      }
      as = as.tail
    }
    false
  }

  /** Segment the DOM into text blocks with word/link-word counts. */
  def segment(root: Elem): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val sb = new java.lang.StringBuilder(256)
    var pendingSpace = false // whitespace collapsed on the fly: one copy,
    var linkWords = 0        // not build-then-normalize (allocation hot path)
    var blockTag = "p"
    var blockBoiler = false

    def appendNormalized(t: String, from: Int, n: Int): Unit = {
      var i = from
      while (i < n) {
        val c = t.charAt(i)
        if (Character.isWhitespace(c)) { pendingSpace = true; i += 1 }
        else {
          // bulk-append the maximal non-whitespace run (r7: one ranged
          // append instead of per-char appends — same output, the walk
          // was the top post-entity-fix profile entry)
          var j = i + 1
          while (j < n && !Character.isWhitespace(t.charAt(j))) j += 1
          if (pendingSpace && sb.length() > 0) sb.append(' ')
          sb.append(t, i, j)
          pendingSpace = false
          i = j
        }
      }
    }

    def flush(): Unit = {
      if (sb.length() > 0) {
        val t = sb.toString
        val w = countWords(t)
        out += Block(t, w, math.min(linkWords, w), blockTag, blockBoiler)
      }
      sb.setLength(0)
      pendingSpace = false
      linkWords = 0
    }

    def walk(n: Node, anchorDepth: Int, boilerDepth: Int): Unit = n match {
      case TextNode(src, from, until) =>
        if (until > from) {
          pendingSpace = true // node boundary acts as a separator
          appendNormalized(src, from, until)
          if (anchorDepth > 0) linkWords += countWords(src, from, until)
        }
      case e: Elem =>
        val tag = e.tag
        if (!SkipTags.contains(tag)) {
          val boiler = boilerDepth > 0 || BoilerTags.contains(tag) || hasBoilerHint(e)
          val bd = if (boiler) boilerDepth + 1 else boilerDepth
          val ad = if (tag == "a") anchorDepth + 1 else anchorDepth
          if (BlockTags.contains(tag)) {
            flush()
            val prevTag = blockTag
            val prevBoiler = blockBoiler
            blockTag = tag
            blockBoiler = boiler
            var i = 0
            while (i < e.children.length) { walk(e.children(i), ad, bd); i += 1 }
            flush()
            blockTag = prevTag
            blockBoiler = prevBoiler
          } else {
            var i = 0
            while (i < e.children.length) { walk(e.children(i), ad, bd); i += 1 }
          }
        }
    }

    walk(root, 0, 0)
    flush()
    out.result()
  }

  private def countWords(s: String): Int = countWords(s, 0, s.length)

  private def countWords(s: String, from: Int, until: Int): Int = {
    var n = 0
    var inWord = false
    var i = from
    while (i < until) {
      val ws = Character.isWhitespace(s.charAt(i)) || s.charAt(i) == ' '
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }

  /** NumWordsRules decision tree (Kohlschütter et al., WSDM 2010, fig. 5),
    * with a hard boilerplate-context override for nav/header/footer/aside
    * and hinted containers. */
  def classify(blocks: Vector[Block], relaxed: Boolean): Array[Boolean] = {
    val n = blocks.length
    val content = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val curr = blocks(i)
      val prev = if (i > 0) blocks(i - 1) else EmptyBlock
      val next = if (i + 1 < n) blocks(i + 1) else EmptyBlock
      content(i) =
        if (curr.boilerCtx) false
        else if (relaxed) curr.words >= 3 && curr.linkDensity <= 0.5
        else if (curr.linkDensity > 0.333333) false
        else if (prev.linkDensity <= 0.555556) {
          if (curr.words <= 16) {
            if (next.words <= 15) prev.words > 4
            else true
          } else true
        } else {
          if (curr.words <= 40) next.words > 17
          else true
        }
      i += 1
    }
    // second pass: keep headings that introduce content
    i = 0
    while (i < n) {
      val b = blocks(i)
      if (!content(i) && b.heading && !b.boilerCtx && b.linkDensity == 0.0 && b.words >= 1) {
        var j = i + 1
        while (j < n && blocks(j).heading) j += 1
        if (j < n && content(j)) content(i) = true
      }
      i += 1
    }
    content
  }

  private val EmptyBlock = Block("", 0, 0, "p", boilerCtx = false)

  /** Full HTML main-content extraction over a parsed DOM. */
  def extract(root: Elem, relaxed: Boolean): Result = {
    val blocks = segment(root)
    val content = classify(blocks, relaxed)
    val sb = new java.lang.StringBuilder(1024)
    val spans = new ArrayBuffer[Span](16)
    var byteOff = 0L
    var kept = 0
    var i = 0
    while (i < blocks.length) {
      if (content(i)) {
        if (kept > 0) { sb.append('\n'); byteOff += 1 }
        val t = blocks(i).text
        val blen = utf8Len(t)
        spans += Span(blocks(i).tag, byteOff, byteOff + blen)
        sb.append(t)
        byteOff += blen
        kept += 1
      }
      i += 1
    }
    val totalWords = blocks.iterator.map(_.words).sum
    Result(sb.toString, spans.toVector, totalWords, kept)
  }

  def utf8Len(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c) && i + 1 < s.length &&
        Character.isLowSurrogate(s.charAt(i + 1))) { n += 4; i += 1 }
      else n += 3
      i += 1
    }
    n
  }
}
