package graft.core

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenizer with the exact cl100k_base algorithm:
  * pre-tokenize with the published cl100k regex, then greedily merge the
  * byte pair with the lowest rank until no adjacent pair is in the rank
  * table (reference behavior: src/worker/worker.py:191-193 windows
  * tiktoken cl100k_base tokens).
  *
  * The merge table itself (~100k byte-sequence ranks) is DATA, not
  * algorithm, and cannot be synthesized offline — it ships separately in
  * tiktoken's public `.tiktoken` format (one `base64(bytes) rank` pair
  * per line) and is loaded from, in order:
  *
  *   1. the `graft.bpe.ranks` system property / `GRAFT_BPE_RANKS` env var
  *      (a path to a ranks file), or
  *   2. the classpath resource `/cl100k_base.tiktoken`.
  *
  * With the genuine cl100k_base.tiktoken in place, token boundaries are
  * byte-exact with the reference. Without it, [[Tokenizers.default]]
  * falls back to [[GraftTokenizer]], whose 4-chars-per-long-word shape
  * matches the reference's golden fixtures but not arbitrary corpora.
  *
  * Losslessness: BPE tokens partition the UTF-8 bytes of each
  * pre-token. Because the [[Tokenizer]] contract returns STRING tokens
  * whose concatenation must reproduce the input, a token that ends
  * mid-character is merged forward with its successor(s) until the byte
  * span is char-aligned (only possible inside a multi-byte scalar; ASCII
  * corpora are unaffected and counts are unchanged there).
  */
final class BpeTokenizer(ranks: java.util.HashMap[BpeTokenizer.Bytes, java.lang.Integer])
    extends Tokenizer {

  import BpeTokenizer.Bytes

  override def encode(text: String): IndexedSeq[String] = {
    val out = new ArrayBuffer[String]()
    val m = BpeTokenizer.Pretokenizer.matcher(text)
    while (m.find()) {
      val piece = m.group()
      // the merge loop is quadratic in piece length and `\p{L}+` pieces
      // are unbounded — one multi-MB "word" in a crawled corpus must
      // not stall a task. Oversized pieces BPE in fixed char slices
      // (boundary merges are lost at the slice seams; real vocab
      // entries are <128 bytes, so counts shift only at the seams).
      if (piece.length <= BpeTokenizer.MaxPieceChars) encodePiece(piece, out)
      else {
        // fixed slices, never splitting a surrogate pair
        var from = 0
        while (from < piece.length) {
          var until = math.min(from + BpeTokenizer.MaxPieceChars, piece.length)
          if (until < piece.length && Character.isHighSurrogate(piece.charAt(until - 1)))
            until -= 1
          encodePiece(piece.substring(from, until), out)
          from = until
        }
      }
    }
    out.toIndexedSeq
  }

  private def encodePiece(piece: String, out: ArrayBuffer[String]): Unit = {
    val bytes = piece.getBytes(StandardCharsets.UTF_8)
    if (ranks.containsKey(new Bytes(bytes, 0, bytes.length))) out += piece
    else out ++= bpeSplit(piece, bytes)
  }

  /** Standard BPE: start from single bytes, repeatedly merge the
    * adjacent pair with the minimum rank. Boundaries are tracked as
    * offsets into `bytes`; the loop is O(n * merges) like tiktoken's
    * reference implementation — pieces are short (bounded by the
    * pre-tokenizer), so quadratic-in-piece is fine.  */
  private def bpeSplit(piece: String, bytes: Array[Byte]): Seq[String] = {
    val n = bytes.length
    if (n == 1) return Seq(piece)
    // parts(i) = start offset of part i; sentinel n at the end
    val starts = ArrayBuffer.tabulate(n + 1)(identity)
    def rankOf(i: Int): Int = {
      // rank of merging part i with part i+1
      if (i + 2 >= starts.length) Int.MaxValue
      else {
        val r = ranks.get(new Bytes(bytes, starts(i), starts(i + 2)))
        if (r == null) Int.MaxValue else r.intValue()
      }
    }
    var continue = true
    while (continue && starts.length > 2) {
      var best = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < starts.length - 2) {
        val r = rankOf(i)
        if (r < best) { best = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else starts.remove(bestIdx + 1)
    }
    // byte spans -> strings, merging forward across any span that ends
    // mid-character so concatenation reproduces `piece` exactly
    val res = new ArrayBuffer[String]()
    var from = 0
    var k = 1
    while (k < starts.length) {
      val end = starts(k)
      if (end == n || BpeTokenizer.isCharBoundary(bytes, end)) {
        res += new String(bytes, from, end - from, StandardCharsets.UTF_8)
        from = end
      }
      k += 1
    }
    res.toSeq
  }
}

object BpeTokenizer {

  /** DoS guard: pieces longer than this BPE in fixed slices (the merge
    * loop is O(piece²)). 2048 chars is ~40× any real vocab entry. */
  final val MaxPieceChars = 2048

  /** cl100k_base pre-tokenization pattern, published in tiktoken
    * (openai_public.py). Java regex: \p{L}/\p{N} are Unicode classes by
    * default on String input here because we compile with
    * UNICODE_CHARACTER_CLASS to match the Rust regex's unicode mode. */
  val Pretokenizer: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    """(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** UTF-8 continuation bytes are 10xxxxxx; any other byte starts a
    * character. */
  def isCharBoundary(bytes: Array[Byte], i: Int): Boolean =
    i == 0 || i == bytes.length || (bytes(i) & 0xC0) != 0x80

  /** Hash key over a byte slice (no copy). Serializable so a
    * ranks-backed tokenizer can ride inside UDF closures. */
  final class Bytes(val arr: Array[Byte], val from: Int, val until: Int) extends Serializable {
    override def hashCode(): Int = {
      var h = 1
      var i = from
      while (i < until) { h = 31 * h + arr(i); i += 1 }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case b: Bytes =>
        (until - from) == (b.until - b.from) && {
          var i = 0
          val len = until - from
          var same = true
          while (same && i < len) {
            same = arr(from + i) == b.arr(b.from + i); i += 1
          }
          same
        }
      case _ => false
    }
  }

  /** Parse tiktoken's public ranks format: `base64(tokenBytes) rank`
    * per line. */
  def parseRanks(lines: Iterator[String]): java.util.HashMap[Bytes, java.lang.Integer] = {
    val m = new java.util.HashMap[Bytes, java.lang.Integer]()
    var lineNo = 0
    lines.foreach { line =>
      lineNo += 1
      val t = line.trim
      if (t.nonEmpty) {
        val sp = t.indexOf(' ')
        require(sp > 0, s"ranks line $lineNo is not 'base64 rank': '$t'")
        val bytes = Base64.getDecoder.decode(t.substring(0, sp))
        m.put(new Bytes(bytes, 0, bytes.length), t.substring(sp + 1).trim.toInt)
      }
    }
    m
  }

  def fromFile(path: String): BpeTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try new BpeTokenizer(parseRanks(src.getLines())) finally src.close()
  }

  def fromRanks(tokenToRank: Map[String, Int]): BpeTokenizer = {
    val m = new java.util.HashMap[Bytes, java.lang.Integer]()
    tokenToRank.foreach { case (tok, r) =>
      val b = tok.getBytes(StandardCharsets.UTF_8)
      m.put(new Bytes(b, 0, b.length), r)
    }
    new BpeTokenizer(m)
  }
}

/** Resolution of the default tokenizer used by the chunkers. */
object Tokenizers {
  /** Real cl100k BPE when a ranks file is supplied (system property
    * `graft.bpe.ranks`, env `GRAFT_BPE_RANKS`, or classpath resource
    * `/cl100k_base.tiktoken`); otherwise the deterministic stand-in. */
  lazy val default: Tokenizer = {
    def fromProp = sys.props.get("graft.bpe.ranks").orElse(sys.env.get("GRAFT_BPE_RANKS"))
      .filter(p => new java.io.File(p).isFile)
      .map(BpeTokenizer.fromFile)
    // by-need: only the winning source is opened and parsed
    def fromResource = Option(getClass.getResourceAsStream("/cl100k_base.tiktoken")).map { in =>
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try new BpeTokenizer(BpeTokenizer.parseRanks(src.getLines())) finally src.close()
    }
    fromProp.orElse(fromResource).getOrElse(GraftTokenizer)
  }

  /** Self-trained ranks shipped as a repo resource
    * (`graft_trained.tiktoken`, exported by
    * [[graft.tools.ExportRanks]] from BpeTrain on the test corpus):
    * token boundaries that are reproducible from the training run alone
    * — the documented stand-in for the unobtainable cl100k data file.
    * NOT the default: [[default]]'s GraftTokenizer boundaries are
    * pinned by the p03/p04 oracles; opt in per call site. */
  lazy val trained: Option[Tokenizer] =
    Option(getClass.getResourceAsStream("/graft_trained.tiktoken")).map { in =>
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try new BpeTokenizer(BpeTokenizer.parseRanks(src.getLines())) finally src.close()
    }
}
