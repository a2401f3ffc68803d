package graft.sources

import java.util.zip.Inflater

import scala.collection.mutable.ArrayBuffer

/** Minimal self-contained PDF text extractor for the format subset the
  * reference ingests (reference extract.py:93-97 / app.py:249-254: fitz
  * per-page `get_text()`, pages concatenated).
  *
  * Scope (enough for Word/LibreOffice-style text PDFs, incl. the
  * reference fixture `src/api/tests/fixtures/test_pdf.pdf`):
  *  - regular `N G obj … endobj` objects located by scanning (no xref
  *    needed — works with both xref tables and xref streams);
  *  - `/Filter/FlateDecode` and unfiltered content streams
  *    (`java.util.zip.Inflater`);
  *  - page order from `/Pages → /Kids`, `/Contents` as a single ref or
  *    an array of refs;
  *  - text operators: `Tj`, `TJ` (kerning numbers dropped), `'`, `"`;
  *    line breaks from `Tm` y-movement, `Td`/`TD` with non-zero ty, and
  *    `T*`;
  *  - literal strings with octal/char escapes, hex strings, WinAnsi
  *    (CP-1252) byte decoding.
  *
  * Out of scope (returns what it can, never throws): CID/Type0 fonts
  * with ToUnicode CMaps, object streams (/ObjStm) holding page dicts,
  * encryption, LZW/ASCII85 filters. Unextractable PDFs yield pages with
  * empty text rather than an error, mirroring fitz's lenient behavior.
  */
object PdfText {

  /** Per-page text, in document page order. */
  def extractPages(pdf: Array[Byte]): Vector[String] = {
    val ordered = scanObjects(pdf)
    val objs = ordered.toMap
    val pageIds = pageOrder(ordered, objs)
    pageIds.map { pid =>
      contentRefs(objs(pid))
        .flatMap(objs.get)
        .flatMap(streamBytes)
        .map(extractContent)
        .mkString
    }
  }

  /** fitz-parity page normalization: `get_text` ends each non-empty
    * page's last line with \n. ONE definition — the p10 query and the
    * whole-document form must never drift apart on this rule. */
  def pageWithTrailingNewline(p: String): String =
    if (p.isEmpty || p.endsWith("\n")) p else p + "\n"

  /** The reference's whole-document form: per-page text concatenated
    * with a trailing newline per page. */
  def extractText(pdf: Array[Byte]): String =
    extractPages(pdf).map(pageWithTrailingNewline).mkString

  // ---- object scan ----

  private val ObjPattern =
    java.util.regex.Pattern.compile("""(?<![0-9])(\d+) (\d+) obj\b""")

  private val StandardCharsets8859 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** (objectNumber, body bytes) in file order: regular `N G obj` objects
    * located lexically, then objects embedded in /Type/ObjStm object
    * streams (where most modern writers keep page and catalog dicts).
    * On duplicate ids the regular object wins (no xref consulted). */
  private def scanObjects(pdf: Array[Byte]): Vector[(Int, Array[Byte])] = {
    // latin1-decode so byte offsets == char offsets
    val s = new String(pdf, StandardCharsets8859)
    val m = ObjPattern.matcher(s)
    val regular = Vector.newBuilder[(Int, Array[Byte])]
    while (m.find()) {
      val end = s.indexOf("endobj", m.end())
      if (end > 0)
        regular += m.group(1).toInt -> java.util.Arrays.copyOfRange(pdf, m.end(), end)
    }
    val reg = regular.result()
    val seen = reg.map(_._1).toSet
    val embedded = reg.flatMap { case (_, body) => parseObjStm(body) }
      .filterNot { case (id, _) => seen(id) }
    reg ++ embedded
  }

  /** Objects embedded in an object stream: the inflated payload starts
    * with /N (objnum, offset) integer pairs; object i's body runs from
    * /First + offset(i) to the next offset. Streams themselves cannot
    * nest in an ObjStm, so these bodies are dict/array objects only. */
  private def parseObjStm(body: Array[Byte]): Vector[(Int, Array[Byte])] = {
    val head = new String(body, 0, math.min(body.length, 512), StandardCharsets8859)
    if (!head.contains("/ObjStm")) Vector.empty
    else (for {
      payload <- streamBytes(body)
      n <- """/N\s+(\d+)""".r.findFirstMatchIn(head).map(_.group(1).toInt)
      first <- """/First\s+(\d+)""".r.findFirstMatchIn(head).map(_.group(1).toInt)
      if first <= payload.length
    } yield {
      val header = new String(payload, 0, first, StandardCharsets8859)
        .trim.split("\\s+").filter(_.nonEmpty).map(_.toInt)
      val pairs = header.grouped(2).take(n).collect { case Array(id, off) => (id, off) }.toVector
      pairs.zipWithIndex.map { case ((id, off), i) =>
        val from = math.min(first + off, payload.length)
        val until = if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, payload.length)
                    else payload.length
        id -> java.util.Arrays.copyOfRange(payload, from, until)
      }
    }).getOrElse(Vector.empty)
  }

  private val PagesType = """/Type\s*/Pages\b""".r
  private val PageType = """/Type\s*/Page\b(?!s)""".r

  /** Page object ids in document order: recursive walk of the /Pages
    * tree (writers like iText nest intermediate /Pages nodes, so a
    * one-level /Kids read would lose every leaf below them), else every
    * /Type/Page object in file order. */
  private def pageOrder(ordered: Vector[(Int, Array[Byte])],
                        objs: Map[Int, Array[Byte]]): Vector[Int] = {
    def bodyOf(id: Int): String = new String(objs(id), StandardCharsets8859)
    def kidsOf(b: String): Vector[Int] = {
      val kids = """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(b).map(_.group(1)).getOrElse("")
      """(\d+)\s+\d+\s+R""".r.findAllMatchIn(kids).map(_.group(1).toInt).toVector
    }
    // depth-first, kid order = document order; visited-set guards
    // malformed cyclic trees
    def walk(id: Int, visited: Set[Int]): Vector[Int] =
      if (visited(id) || !objs.contains(id)) Vector.empty
      else {
        val b = bodyOf(id)
        if (PagesType.findFirstIn(b).isDefined || kidsOf(b).nonEmpty && PageType.findFirstIn(b).isEmpty)
          kidsOf(b).flatMap(walk(_, visited + id))
        else if (PageType.findFirstIn(b).isDefined) Vector(id)
        else Vector.empty
      }
    // prefer the catalog's /Pages ref (the true root — the first
    // Pages-typed object in file order may be a nested intermediate)
    val fromCatalog = ordered.collectFirst {
      case (_, body) if """/Type\s*/Catalog\b""".r
          .findFirstIn(new String(body, StandardCharsets8859)).isDefined =>
        """/Pages\s+(\d+)\s+\d+\s+R""".r
          .findFirstMatchIn(new String(body, StandardCharsets8859)).map(_.group(1).toInt)
    }.flatten
    val root = fromCatalog.orElse(ordered.find { case (_, body) =>
      PagesType.findFirstIn(new String(body, StandardCharsets8859)).isDefined
    }.map(_._1))
    val fromTree = root.toVector.flatMap(walk(_, Set.empty))
    if (fromTree.nonEmpty) fromTree
    else ordered.collect {
      case (id, body) if PageType.findFirstIn(new String(body, StandardCharsets8859)).isDefined => id
    }
  }

  /** /Contents N 0 R  or  /Contents[ a 0 R b 0 R ]. */
  private def contentRefs(body: Array[Byte]): Vector[Int] = {
    val s = new String(body, StandardCharsets8859)
    """/Contents\s*\[([^\]]*)\]""".r.findFirstMatchIn(s) match {
      case Some(arr) =>
        """(\d+)\s+\d+\s+R""".r.findAllMatchIn(arr.group(1)).map(_.group(1).toInt).toVector
      case None =>
        """/Contents\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(s).map(_.group(1).toInt).toVector
    }
  }

  /** Extract and (if Flate) inflate a stream object's payload. */
  private def streamBytes(body: Array[Byte]): Option[Array[Byte]] = {
    val s = new String(body, StandardCharsets8859)
    val sm = """stream\r?\n""".r.findFirstMatchIn(s)
    sm.map { m =>
      val dataStart = m.end
      val endIdx = s.indexOf("endstream", m.end)
      var dataEnd = if (endIdx >= 0) endIdx else body.length
      // strip the EOL that precedes `endstream`
      if (dataEnd > dataStart && body(dataEnd - 1) == '\n') dataEnd -= 1
      if (dataEnd > dataStart && body(dataEnd - 1) == '\r') dataEnd -= 1
      val raw = java.util.Arrays.copyOfRange(body, dataStart, dataEnd)
      if (s.substring(0, m.start).contains("FlateDecode")) inflate(raw) else raw
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray // corrupt: stop
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => out.toByteArray
    } finally inf.end()
  }

  // ---- content-stream interpretation ----

  /** WinAnsi (CP-1252) high bytes that differ from latin-1. */
  private val WinAnsiHigh: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8a -> 'Š', 0x8b -> '‹', 0x8c -> 'Œ',
    0x8e -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9a -> 'š', 0x9b -> '›',
    0x9c -> 'œ', 0x9e -> 'ž', 0x9f -> 'Ÿ')

  private def decodeWinAnsi(bytes: Array[Byte]): String = {
    val b = new StringBuilder(bytes.length)
    bytes.foreach { x =>
      val u = x & 0xff
      b.append(WinAnsiHigh.getOrElse(u, u.toChar))
    }
    b.result()
  }

  /** Interpret one content stream: shows appended in order, newline on
    * vertical text-matrix movement. */
  private[sources] def extractContent(cs: Array[Byte]): String = {
    val out = new StringBuilder()
    var lastY = Double.NaN
    val nums = new ArrayBuffer[Double]()
    var pendingStr: Array[Byte] = null
    var inArray = false
    val arrayParts = new ArrayBuffer[Array[Byte]]()
    var i = 0
    val n = cs.length

    def parseLiteral(): Array[Byte] = {
      // cs(i) is just past '('
      var depth = 1
      val buf = new java.io.ByteArrayOutputStream()
      while (i < n && depth > 0) {
        val c = cs(i) & 0xff
        if (c == '\\') {
          i += 1
          if (i < n) {
            val e = cs(i) & 0xff
            e match {
              case 'n' => buf.write('\n'); i += 1
              case 'r' => buf.write('\r'); i += 1
              case 't' => buf.write('\t'); i += 1
              case 'b' => buf.write('\b'); i += 1
              case 'f' => buf.write('\f'); i += 1
              case '(' | ')' | '\\' => buf.write(e); i += 1
              case '\r' =>
                i += 1; if (i < n && cs(i) == '\n') i += 1 // line continuation
              case '\n' => i += 1
              case d if d >= '0' && d <= '7' =>
                var oct = 0; var k = 0
                while (k < 3 && i < n && (cs(i) & 0xff) >= '0' && (cs(i) & 0xff) <= '7') {
                  oct = oct * 8 + ((cs(i) & 0xff) - '0'); i += 1; k += 1
                }
                buf.write(oct & 0xff)
              case other => buf.write(other); i += 1
            }
          }
        } else if (c == '(') { depth += 1; buf.write(c); i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) buf.write(c); i += 1 }
        else { buf.write(c); i += 1 }
      }
      buf.toByteArray
    }

    def parseHex(): Array[Byte] = {
      // cs(i) is just past '<'
      val buf = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (i < n && !done) {
        val c = cs(i) & 0xff
        if (c == '>') { done = true; i += 1 }
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) { if (hi < 0) hi = d else { buf.write(hi * 16 + d); hi = -1 } }
          i += 1
        }
      }
      if (hi >= 0) buf.write(hi * 16)
      buf.toByteArray
    }

    def show(bytes: Array[Byte]): Unit = out.append(decodeWinAnsi(bytes))
    def newline(): Unit =
      if (out.nonEmpty && out.charAt(out.length - 1) != '\n') out.append('\n')

    def onString(b: Array[Byte]): Unit =
      if (inArray) arrayParts += b else pendingStr = b

    def clear(): Unit = { nums.clear(); pendingStr = null }

    while (i < n) {
      val c = cs(i) & 0xff
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0) i += 1
      else if (c == '(') { i += 1; onString(parseLiteral()) }
      else if (c == '<' && i + 1 < n && (cs(i + 1) & 0xff) == '<') i += 2
      else if (c == '<') { i += 1; onString(parseHex()) }
      else if (c == '[') { inArray = true; arrayParts.clear(); i += 1 }
      else if (c == ']') {
        inArray = false
        val merged = new java.io.ByteArrayOutputStream()
        arrayParts.foreach(merged.write)
        pendingStr = merged.toByteArray
        i += 1
      } else if (c == '/') {
        i += 1
        while (i < n && !isDelim(cs(i) & 0xff)) i += 1
      } else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < n && { val x = cs(i) & 0xff; x == '+' || x == '-' || x == '.' || (x >= '0' && x <= '9') }) i += 1
        try nums += new String(cs, start, i - start, StandardCharsets8859).toDouble
        catch { case _: NumberFormatException => }
      } else {
        val start = i
        i += 1
        while (i < n && !isDelim(cs(i) & 0xff)) i += 1
        val op = new String(cs, start, i - start, StandardCharsets8859)
        op match {
          case "Tm" =>
            if (nums.length >= 6) {
              val y = nums.last
              if (!lastY.isNaN && math.abs(y - lastY) > 0.1) newline()
              lastY = y
            }
            clear()
          case "Td" | "TD" =>
            if (nums.length >= 2 && math.abs(nums.last) > 0.1) newline()
            clear()
          case "T*" => newline(); clear()
          case "Tj" | "TJ" =>
            if (pendingStr != null) show(pendingStr)
            clear()
          case "'" | "\"" =>
            newline()
            if (pendingStr != null) show(pendingStr)
            clear()
          case _ => clear()
        }
      }
    }
    out.result()
  }

  private def isDelim(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0 ||
      c == '/' || c == '[' || c == ']' || c == '(' || c == ')' || c == '<' || c == '>'
}
