package graft.core

import scala.collection.mutable.ArrayBuffer

/** Tokenization abstraction for the token-windowed chunkers.
  *
  * The reference counts/windows tokens with tiktoken `cl100k_base`
  * (reference: src/worker/worker.py:191-193). A real BPE vocab is not
  * available in this zero-egress build, so the default implementation is a
  * deterministic stand-in with the two properties the chunkers actually
  * rely on:
  *
  *   1. '''lossless''': tokens partition the input, so decoding a token
  *      slice (concatenation) reproduces the exact covered substring —
  *      what `encoding.decode(tokens[i:j])` does in the reference.
  *   2. '''~4 chars/token on long letter runs''': long words split into
  *      4-char pieces, matching BPE's behavior on rare words and the
  *      reference's golden fixtures ("testtext"*192 = 384 tokens).
  *
  * Swap in a real BPE by implementing [[Tokenizer]]; every chunker takes
  * the tokenizer as a parameter.
  */
trait Tokenizer extends Serializable {
  /** Split `text` into consecutive token strings; concatenation of the
    * result must equal `text` exactly. */
  def encode(text: String): IndexedSeq[String]
  final def count(text: String): Int = encode(text).length
  final def decode(tokens: Seq[String]): String = tokens.mkString
}

/** Default tokenizer: GPT-2-style pretokenization (` ?letters`, ` ?digits`,
  * ` ?punctuation-run`, whitespace-run), then any piece longer than
  * [[GraftTokenizer.MaxPieceChars]] chars is split into
  * [[GraftTokenizer.SubPieceChars]]-char sub-pieces. Pure function of the
  * input — safe under Spark task retry. */
object GraftTokenizer extends Tokenizer {
  final val MaxPieceChars = 16
  final val SubPieceChars = 4

  private def isLetter(c: Char): Boolean = Character.isLetter(c)
  private def isDigit(c: Char): Boolean  = Character.isDigit(c)
  private def isSpaceLike(c: Char): Boolean = Character.isWhitespace(c)

  override def encode(text: String): IndexedSeq[String] = {
    val out = new ArrayBuffer[String]()
    val n = text.length
    var i = 0
    while (i < n) {
      var start = i
      var c = text.charAt(i)
      // single leading space attaches to the following word/number/punct
      // piece (GPT-2 pretokenizer convention), so " example" is one token
      if (c == ' ' && i + 1 < n && !isSpaceLike(text.charAt(i + 1))) {
        i += 1
        c = text.charAt(i)
      }
      if (isLetter(c)) {
        while (i < n && isLetter(text.charAt(i))) i += 1
      } else if (isDigit(c)) {
        while (i < n && isDigit(text.charAt(i))) i += 1
      } else if (isSpaceLike(c)) {
        while (i < n && isSpaceLike(text.charAt(i))) i += 1
      } else {
        while (i < n && { val x = text.charAt(i); !isLetter(x) && !isDigit(x) && !isSpaceLike(x) }) i += 1
      }
      val piece = text.substring(start, i)
      if (piece.length <= MaxPieceChars) out += piece
      else {
        var j = 0
        while (j < piece.length) {
          out += piece.substring(j, math.min(j + SubPieceChars, piece.length))
          j += SubPieceChars
        }
      }
    }
    out.toIndexedSeq
  }
}
