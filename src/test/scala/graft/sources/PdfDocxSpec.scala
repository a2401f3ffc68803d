package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class PdfDocxSpec extends AnyFunSuite {

  private val fixtureDir = "/root/reference/src/api/tests/fixtures"

  test("reference test_pdf.pdf: 42 pages, full word-for-word recovery of the source text") {
    val pdf = Files.readAllBytes(Paths.get(s"$fixtureDir/test_pdf.pdf"))
    val pages = PdfText.extractPages(pdf)
    assert(pages.length == 42)
    // the PDF is test_text.txt typeset in Courier; layout wraps lines,
    // so parity is exact at the word-sequence level
    val src = Files.readString(Paths.get(s"$fixtureDir/test_text.txt"))
    val srcWords = src.split("\\s+").filter(_.nonEmpty).toSeq
    val gotWords = PdfText.extractText(pdf).split("\\s+").filter(_.nonEmpty).toSeq
    assert(gotWords.length == srcWords.length,
      s"word counts: got ${gotWords.length}, want ${srcWords.length}")
    assert(gotWords == srcWords, "extracted word sequence must equal the source")
  }

  test("hand-built uncompressed PDF: literal escapes, hex strings, line operators") {
    val content =
      "BT /F1 12 Tf 72 700 Td (Hello \\(world\\)) Tj 0 -14 Td " +
        "[(Kerned) -20 ( pa) 5 (irs)] TJ T* (third\\tline) Tj ET " +
        "BT 72 600 Td <48692068657821> Tj ET"
    val pdf = miniPdf(content)
    val pages = PdfText.extractPages(pdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(pages.length == 1)
    val lines = pages.head.split("\n").toSeq
    assert(lines(0) == "Hello (world)")
    assert(lines(1) == "Kerned pairs")
    assert(lines(2) == "third\tline")
    assert(lines(3) == "Hi hex!")
  }

  test("octal escapes and WinAnsi high bytes decode") {
    // \050 = '(' ; byte 0x93/0x94 are curly quotes in WinAnsi
    val content = "BT (\\050ok\\051 \\223q\\224) Tj ET"
    val pdf = miniPdf(content)
    val pages = PdfText.extractPages(pdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(pages.head == "(ok) \u201Cq\u201D")
  }

  test("DOCX: paragraphs joined with newline; runs, tabs and breaks inside a paragraph") {
    val documentXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body>
        |<w:p><w:r><w:t>First paragraph, </w:t></w:r><w:r><w:t>two runs.</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Col A</w:t><w:tab/><w:t>Col B</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Line one</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
        |<w:p/>
        |<w:p><w:r><w:t xml:space="preserve"> spaced </w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val docx = zip("word/document.xml" -> documentXml.getBytes(StandardCharsets.UTF_8),
      "[Content_Types].xml" -> "<Types/>".getBytes(StandardCharsets.UTF_8))
    assert(DocxText.extractParagraphs(docx) ==
      Vector("First paragraph, two runs.", "Col A\tCol B", "Line one\nline two", "", " spaced "))
    assert(DocxText.extractText(docx) ==
      "First paragraph, two runs.\nCol A\tCol B\nLine one\nline two\n\n spaced ")
  }

  test("page dicts inside a /Type/ObjStm object stream are found") {
    // modern writers keep page/catalog dicts in object streams; build one
    // with the Pages node (2) and the Page dict (3) embedded
    val body2 = "<</Type/Pages/Count 1/Kids[3 0 R]>>"
    val body3 = "<</Type/Page/Parent 2 0 R/Contents 4 0 R>>"
    val header = s"2 0 3 ${body2.length}"
    val first = header.length + 1
    val payload = header + "\n" + body2 + body3
    val content = "BT 72 700 Td (from objstm) Tj ET"
    val pdf =
      s"""%PDF-1.5
         |1 0 obj
         |<</Type/Catalog/Pages 2 0 R>>
         |endobj
         |5 0 obj
         |<</Type/ObjStm/N 2/First $first/Length ${payload.length}>>
         |stream
         |$payload
         |endstream
         |endobj
         |4 0 obj
         |<</Length ${content.length}>>
         |stream
         |$content
         |endstream
         |endobj
         |%%EOF""".stripMargin
    val pages = PdfText.extractPages(pdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(pages == Vector("from objstm"))
  }

  test("Markdown: links stripped, header sections, extractor-path join") {
    val md =
      """intro before any header
        |# Title
        |Some text with a [link](http://x) and an image ![alt](img.png).
        |## Sub
        |more body
        |""".stripMargin
    val secs = MarkdownText.sections(md)
    assert(secs.map(_._1) == Vector(None, Some("Title"), Some("Sub")))
    assert(secs(1)._2 == "Some text with a link and an image .\n")
    assert(secs(2)._2 == "more body\n\n")
    val joined = MarkdownText.extractText(md)
    assert(joined.contains("\n\nTitle\nSome text with a link"))
    // default dispatch stays the /embed raw-read branch
    val raw = DocumentReader.extractText()(md.getBytes(StandardCharsets.UTF_8), ".md")
    assert(raw == md)
    val sectioned = DocumentReader.extractText(markdownSections = true)(
      md.getBytes(StandardCharsets.UTF_8), ".md")
    assert(sectioned == joined)
  }

  test("DocumentReader dispatch routes real bytes through the extractors") {
    val pdf = Files.readAllBytes(Paths.get(s"$fixtureDir/test_pdf.pdf"))
    val extract = DocumentReader.extractText()
    val viaPdf = extract(pdf, ".pdf")
    assert(viaPdf.startsWith("Welcome to vector flow!!!"))
    val docx = zip("word/document.xml" ->
      """<w:document xmlns:w="x"><w:body><w:p><w:r><w:t>docx body</w:t></w:r></w:p></w:body></w:document>"""
        .getBytes(StandardCharsets.UTF_8))
    assert(extract(docx, ".docx") == "docx body")
    // junk still degrades to the countable placeholder, never throws
    assert(extract(Array[Byte](1, 2, 3), ".pdf").startsWith("[pdf:unextractable:"))
    assert(extract(Array[Byte](1, 2, 3), ".docx").startsWith("[docx:unextractable:"))
  }

  private def miniPdf(content: String): String = {
    s"""%PDF-1.4
       |1 0 obj
       |<</Type/Catalog/Pages 2 0 R>>
       |endobj
       |2 0 obj
       |<</Type/Pages/Count 1/Kids[3 0 R]>>
       |endobj
       |3 0 obj
       |<</Type/Page/Parent 2 0 R/Contents 4 0 R>>
       |endobj
       |4 0 obj
       |<</Length ${content.length}>>
       |stream
       |$content
       |endstream
       |endobj
       |trailer
       |<</Root 1 0 R>>
       |%%EOF""".stripMargin
  }

  private def zip(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(bytes)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }
}
