package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite {

  // a tiny rank table: lower rank merges first, exactly like tiktoken
  private val ranks = Map(
    "te" -> 0, "st" -> 1, "xt" -> 2, "test" -> 3, "text" -> 4)
  private val bpe = BpeTokenizer.fromRanks(ranks)

  test("merge order follows ranks: testtext -> [test, text]") {
    assert(bpe.encode("testtext") == IndexedSeq("test", "text"))
  }

  test("reference golden fixture: 'testtext'*192 is 384 tokens; EXACT chunking 1024/1024/512") {
    val data = Seq.fill(192)("testtext")
    assert(bpe.count(data.mkString) == 384)
    val chunks = Chunkers.exact(data, 256, 128, tok = bpe)
    assert(chunks.length == 3)
    assert(chunks(0).text.length == 1024)
    assert(chunks(1).text.length == 1024)
    assert(chunks(2).text.length == 512)
  }

  test("shipped trained ranks: golden counts, losslessness, exact sequences") {
    // graft_trained.tiktoken: 64 BpeTrain merges on the sf0.01 corpus,
    // exported by ExportRanks. The golden values below were computed by
    // an INDEPENDENT Python reimplementation of the rank-greedy encode
    // over the same resource file (and the 64-merge table itself was
    // re-derived independently, matching the resource) — so this pins
    // loader + encoder + resource against an external twin, the p19
    // convention.
    val tok = Tokenizers.trained.getOrElse(fail("graft_trained.tiktoken missing"))
    assert(tok.count("key agg row scan slow fast table") == 15)
    assert(tok.count("customer window spark") == 10)
    assert(tok.count("the merge batch stream") == 13)
    assert(tok.encode("customer window spark") ==
      IndexedSeq("customer", " ", "w", "in", "d", "ow", " ", "s", "par", "k"))
    // lossless partition — the Tokenizer contract the chunkers rely on
    val s = "key agg row scan slow fast table customer window spark"
    assert(tok.encode(s).mkString == s)
    // training reproducibility itself is pinned externally: the 64-merge
    // table was re-derived by the independent Python BPE and matched the
    // shipped resource token-for-token, and the p19 oracle pins the
    // 24-merge prefix of the same training run against DuckDB
  }

  test("cl100k pre-tokenizer: contractions, digit triples, space-prefixed words") {
    def pre(s: String): Seq[String] = {
      val m = BpeTokenizer.Pretokenizer.matcher(s)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    assert(pre("it's fine") == Seq("it", "'s", " fine"))
    assert(pre("12345") == Seq("123", "45"))
    assert(pre("a  b") == Seq("a", " ", " b"))
    assert(pre("hi, world!") == Seq("hi", ",", " world", "!"))
    assert(pre("line1\nline2") == Seq("line", "1", "\n", "line", "2"))
    // pieces concatenate back to the input (no byte falls through)
    val s = "It's 2026:多字节 text, with\n\nspaces  and 12345 digits!"
    assert(pre(s).mkString == s)
  }

  test("lossless on multi-byte text even when no merges apply") {
    // empty rank table: every byte is its own BPE token; the string
    // grouping must still re-align to char boundaries
    val raw = BpeTokenizer.fromRanks(Map.empty)
    val s = "héllo 世界 — ok"
    val toks = raw.encode(s)
    assert(toks.mkString == s, "concatenation must reproduce the input")
    assert(toks.forall(_.nonEmpty))
  }

  test("Tokenizers resolution: ranks file via system property activates real BPE") {
    val f = java.io.File.createTempFile("ranks", ".tiktoken")
    try {
      val w = new java.io.PrintWriter(f, "UTF-8")
      ranks.foreach { case (tok, r) =>
        w.println(java.util.Base64.getEncoder.encodeToString(
          tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + " " + r)
      }
      w.close()
      val t = BpeTokenizer.fromFile(f.getAbsolutePath)
      assert(t.encode("testtext") == IndexedSeq("test", "text"))
    } finally f.delete()
  }

  test("multi-megabyte single 'word' tokenizes in bounded time, losslessly") {
    val monster = "a" * 3000000
    val t0 = System.nanoTime()
    val toks = bpe.encode(monster)
    assert((System.nanoTime() - t0) / 1e9 < 30.0, "oversized piece must not stall")
    assert(toks.mkString == monster, "slicing must stay lossless")
    // surrogate pairs (emoji) at slice boundaries must not split
    val emojis = "😀" * 1500000
    assert(bpe.encode(emojis).mkString == emojis, "surrogate pairs survive slicing")
  }

  test("stand-in default also passes the reference golden counts") {
    // without a ranks file the default tokenizer is the stand-in, whose
    // 4-char long-word split matches the golden fixture exactly
    val data = Seq.fill(192)("testtext")
    assert(GraftTokenizer.count(data.mkString) == 384)
    val chunks = Chunkers.exact(data, 256, 128)
    assert(chunks.map(_.text.length) == Vector(1024, 1024, 512))
  }
}
