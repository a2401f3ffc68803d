package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The md5-derived hashes are ORACLE CONTRACTS: the d04/t03/d06/t18
  * DuckDB twins recompute them as hex-prefix parses of md5(s), so these
  * goldens (computed independently with Python hashlib) pin the exact
  * bit layout — first-N-hex-digits big-endian, signed carrier for the
  * 64-bit form, positive by construction for the 60/32-bit forms. */
class Md5HashSpec extends AnyFunSuite {

  test("md5Hash64: first 16 hex digits, signed 64-bit carrier") {
    assert(Dedup.md5Hash64("hello") === 6719722671305337462L)
    assert(Dedup.md5Hash64("the") === -8087290180436138277L)
    assert(Dedup.md5Hash64("") === -3162216497309240828L)
    assert(Dedup.md5Hash64("alpha beta") === 3733309422778992343L)
  }

  test("md5Hash60: first 15 hex digits, always positive (signed==unsigned order)") {
    assert(Dedup.md5Hash60("hello") === 419982666956583591L)
    assert(Dedup.md5Hash60("the") === 647465868329588333L)
    assert(Dedup.md5Hash60("") === 955282973525019424L)
    assert(Dedup.md5Hash60("alpha beta") === 233331838923687021L)
    // positivity is the ordering contract
    Seq("hello", "the", "", "alpha beta", "é中").foreach { s =>
      assert(Dedup.md5Hash60(s) >= 0L, s"md5Hash60($s) must be non-negative")
    }
  }

  test("md5U32: first 8 hex digits, unsigned 32-bit in a long") {
    assert(Dedup.md5U32("hello") === 1564557354L)
    assert(Dedup.md5U32("the") === 2411998317L)
    assert(Dedup.md5U32("") === 3558706393L)
    assert(Dedup.md5U32("alpha beta") === 869228835L)
  }

  test("hashes are UTF-8-byte based (multibyte input matches hashlib)") {
    // python: int(hashlib.md5('é中'.encode()).hexdigest()[:15], 16)
    assert(Dedup.md5Hash60("é中") === 1082831278046797851L)
  }
}
