package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** DOCX text extraction with JDK-only parts (reference extract.py:74-76 /
  * app.py:232-234: python-docx `"\n".join(p.text for p in doc.paragraphs)`).
  *
  * A .docx is a zip archive; body text lives in `word/document.xml` as
  * WordprocessingML: paragraphs are `<w:p>`, text runs are `<w:t>`
  * (xml:space-preserving), tabs `<w:tab/>`, and explicit line breaks
  * `<w:br/>` / `<w:cr/>`. python-docx's `Paragraph.text` is the
  * concatenation of its runs' `<w:t>` contents with `\t` for tabs and
  * `\n` for breaks — replicated exactly; paragraphs join with `\n`.
  */
object DocxText {

  /** Paragraph texts of `word/document.xml`, in document order. */
  def extractParagraphs(docx: Array[Byte]): Vector[String] = {
    val zip = new ZipInputStream(new ByteArrayInputStream(docx))
    try {
      var entry = zip.getNextEntry
      while (entry != null && entry.getName != "word/document.xml")
        entry = zip.getNextEntry
      if (entry == null) Vector.empty
      else parseDocumentXml(zip)
    } finally zip.close()
  }

  /** The reference's whole-document form: paragraphs joined with \n. */
  def extractText(docx: Array[Byte]): String =
    extractParagraphs(docx).mkString("\n")

  private def parseDocumentXml(in: java.io.InputStream): Vector[String] = {
    val f = XMLInputFactory.newInstance()
    // no DTD/external-entity resolution on untrusted input
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(in)
    val paragraphs = Vector.newBuilder[String]
    val current = new StringBuilder()
    var inParagraph = false
    var inText = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "p" => inParagraph = true; current.clear()
              case "t" if inParagraph => inText = true
              case "tab" if inParagraph => current.append('\t')
              case "br" | "cr" if inParagraph => current.append('\n')
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inText) current.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "p" if inParagraph =>
                paragraphs += current.result()
                inParagraph = false
              case "t" => inText = false
              case _ =>
            }
          case _ =>
        }
      }
      paragraphs.result()
    } finally r.close()
  }
}
