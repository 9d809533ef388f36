package graft.sources

/** Minimal HTML DOM + CSS-subset engine backing [[ScraperExtractor]]'s
  * reference-shaped selectors (no browser / jsoup on the offline classpath).
  *
  * Supported selector grammar — enough for the reference's shipped scraper
  * configs (`/root/reference/configs/sources/webscrape_example.yaml`,
  * e.g. `article.product_pod h3 a`, `.price_color`):
  *
  *   simple    := [tag | *] ( '#' id | '.' class )*
  *   selector  := simple ( ' ' simple )*        (descendant combinator)
  *
  * `textContent` mirrors the browser's: the concatenation of all descendant
  * text, entities decoded; [[ScraperExtractor]] applies the reference's
  * `.strip()` (`playwright_scraper.py:60-63`).
  *
  * The parser is tolerant of real-world HTML: void elements, self-closing
  * tags, raw-text `script`/`style` bodies, comments/doctype, and stray close
  * tags are all handled; unclosed elements are implicitly closed at EOF.
  */
object MiniHtml {

  final class Elem(val tag: String, val attrs: Map[String, String]) {
    var children: Vector[Either[String, Elem]] = Vector.empty
    def classes: Set[String] =
      attrs.get("class").map(_.trim.split("\\s+").toSet).getOrElse(Set.empty)
  }

  private val Voids = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")

  private val TagRe =
    """(?s)<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^>"']|"[^"]*"|'[^']*')*?)(/?)>""".r
  private val AttrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r
  private val NoiseRe = """(?s)<!--.*?-->|<![^>]*>""".r

  private def parseAttrs(raw: String): Map[String, String] =
    AttrRe.findAllMatchIn(raw).map { m =>
      val v = Seq(m.group(2), m.group(3), m.group(4)).find(_ != null).getOrElse("")
      m.group(1).toLowerCase -> v
    }.toMap

  /** Basic entity decode (named set + numeric). */
  private[sources] def decodeEntities(s: String): String = {
    val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> " ")
    """&(#x?[0-9a-fA-F]+|[a-zA-Z]+);""".r.replaceAllIn(s, m => {
      val body = m.group(1)
      val rep =
        if (body.startsWith("#x") || body.startsWith("#X"))
          new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
        else if (body.startsWith("#"))
          new String(Character.toChars(body.drop(1).toInt))
        else named.getOrElse(body, m.matched)
      java.util.regex.Matcher.quoteReplacement(rep)
    })
  }

  /** Parse to a synthetic `#root` element holding the document forest. */
  def parse(html: String): Elem = {
    val src = NoiseRe.replaceAllIn(html, " ")
    val lower = src.toLowerCase
    val root = new Elem("#root", Map.empty)
    var stack: List[Elem] = List(root)
    def addText(t: String): Unit =
      if (t.nonEmpty) stack.head.children :+= Left(decodeEntities(t))

    val m = TagRe.pattern.matcher(src)
    var pos = 0
    var going = true
    while (going && pos <= src.length) {
      if (m.find(pos)) {
        if (m.start > pos) addText(src.substring(pos, m.start))
        val closing = m.group(1) == "/"
        val tag = m.group(2).toLowerCase
        val selfClose = m.group(4) == "/"
        pos = m.end
        if (closing) {
          if (stack.exists(_.tag == tag)) // stray close tags are ignored
            stack = stack.dropWhile(_.tag != tag) match {
              case _ :: rest if rest.nonEmpty => rest
              case other => other
            }
        } else {
          val el = new Elem(tag, parseAttrs(m.group(3)))
          stack.head.children :+= Right(el)
          if (tag == "script" || tag == "style") {
            // raw-text elements: consume verbatim up to the literal close tag
            val close = lower.indexOf(s"</$tag", pos)
            val end = if (close < 0) src.length else close
            if (end > pos) el.children :+= Left(src.substring(pos, end))
            val gt = if (close < 0) -1 else src.indexOf('>', close)
            pos = if (gt < 0) src.length else gt + 1
          } else if (!selfClose && !Voids(tag)) {
            stack ::= el
          }
        }
      } else {
        addText(src.substring(pos))
        going = false
      }
    }
    root
  }

  /** Concatenated descendant text (browser `textContent`). */
  def textContent(el: Elem): String =
    el.children.map {
      case Left(t) => t
      case Right(e) => textContent(e)
    }.mkString

  final case class Simple(tag: Option[String], id: Option[String], classes: Seq[String])

  private val SimpleRe = """^([a-zA-Z][a-zA-Z0-9-]*|\*)?((?:[#.][-\w]+)*)$""".r

  private def parseSimple(s: String): Option[Simple] = s match {
    case SimpleRe(tag, quals) if tag != null || (quals != null && quals.nonEmpty) =>
      val toks = if (quals == null) Seq.empty
        else quals.split("(?=[#.])").toSeq.filter(_.nonEmpty)
      Some(Simple(
        Option(tag).filter(_ != "*"),
        toks.find(_.startsWith("#")).map(_.drop(1)),
        toks.filter(_.startsWith(".")).map(_.drop(1))))
    case _ => None
  }

  /** None ⇒ not in the supported CSS subset (caller may fall back to regex). */
  def parseSelector(css: String): Option[Seq[Simple]] = {
    val parts = css.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (parts.isEmpty) None
    else {
      val simples = parts.map(parseSimple)
      if (simples.forall(_.isDefined)) Some(simples.map(_.get)) else None
    }
  }

  private def matches(el: Elem, s: Simple): Boolean =
    s.tag.forall(_ == el.tag) &&
      s.id.forall(i => el.attrs.get("id").contains(i)) &&
      s.classes.forall(el.classes.contains)

  /** All elements matching the descendant chain, in document order. */
  def selectAll(root: Elem, chain: Seq[Simple]): Seq[Elem] = {
    val out = Vector.newBuilder[Elem]
    // ancestors is nearest-first; greedy nearest-first subsequence matching is
    // exact for the descendant combinator
    def ancestorsMatch(ancestors: List[Elem], rest: List[Simple]): Boolean = rest match {
      case Nil => true
      case s :: more =>
        val at = ancestors.dropWhile(a => !matches(a, s))
        at.nonEmpty && ancestorsMatch(at.tail, more)
    }
    val revInit = chain.init.reverse.toList
    def dfs(el: Elem, ancestors: List[Elem]): Unit = {
      if (el.tag != "#root" && matches(el, chain.last) && ancestorsMatch(ancestors, revInit))
        out += el
      el.children.foreach {
        case Right(c) => dfs(c, el :: ancestors)
        case _ => ()
      }
    }
    dfs(root, Nil)
    out.result()
  }
}
