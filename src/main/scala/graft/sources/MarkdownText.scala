package graft.sources

/** Markdown section extraction for the reference's EXTRACTOR path
  * (extract.py:78-88: llama-index `MarkdownReader.load_data`, document
  * texts joined with \n). The API `/embed` path reads .md raw
  * (app.py:236-243) and stays the default in [[DocumentReader]].
  *
  * Modeled on MarkdownReader's published behavior:
  *  - images `![alt](url)` are removed, hyperlinks `[label](url)` keep
  *    their label;
  *  - content splits into (header, body) sections at ATX headers
  *    (`#`-prefixed lines); text before the first header is a
  *    headerless section;
  *  - a header section renders as `\n\n<header-without-#>\n<body>`,
  *    a headerless one as its body;
  *  - section texts join with `\n`.
  */
object MarkdownText {

  private val ImagePattern = """!\[[^\]]*\]\([^)]*\)""".r
  private val LinkPattern = """\[([^\]]*)\]\([^)]*\)""".r
  private val HeaderPattern = """^#+\s+.*""".r

  /** Remove image links entirely; collapse hyperlinks to their label. */
  def stripLinks(md: String): String =
    LinkPattern.replaceAllIn(ImagePattern.replaceAllIn(md, ""),
      m => scala.util.matching.Regex.quoteReplacement(m.group(1)))

  /** (header text without '#', body) sections in order; `None` header
    * for leading content. Bodies keep their internal newlines. */
  def sections(md: String): Vector[(Option[String], String)] = {
    val out = Vector.newBuilder[(Option[String], String)]
    var header: Option[String] = None
    val body = new StringBuilder()
    var sawAny = false
    stripLinks(md).split("\n", -1).foreach { line =>
      if (HeaderPattern.matches(line)) {
        if (sawAny || body.nonEmpty) out += header -> body.result()
        header = Some(line.dropWhile(_ == '#').trim)
        body.clear()
        sawAny = true
      } else {
        body.append(line).append('\n')
      }
    }
    out += header -> body.result()
    out.result()
  }

  /** The extractor-path whole-document form: llama-index document texts
    * joined with \n. */
  def extractText(md: String): String =
    sections(md).map {
      case (Some(h), body) => s"\n\n$h\n$body"
      case (None, body) => body
    }.mkString("\n")
}
