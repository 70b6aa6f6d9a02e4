package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analysis

/** Typed-field canonical term encodings (`field_type.rs:170-190`,
  * `common/src/lib.rs` i64_to_u64 / f64_to_u64): the encoded term strings
  * must sort exactly like the values they encode, so a TermRangeQ over a
  * typed field is a numeric/date range.
  */
class TypedFieldSpec extends AnyFunSuite {

  private val rng = new java.util.Random(42L)

  test("u64 encoding is order-preserving (incl. > Long.MaxValue)") {
    for (_ <- 0 until 500) {
      val a = rng.nextLong() & Long.MaxValue; val b = rng.nextLong() & Long.MaxValue
      val (ea, eb) = (Analysis.canonicalU64(a.toString).get, Analysis.canonicalU64(b.toString).get)
      assert((a < b) == (ea < eb) && (a == b) == (ea == eb))
    }
    // unsigned tail: 2^63 and u64::MAX sort above Long.MaxValue
    val big = Analysis.canonicalU64("9223372036854775808").get
    val max = Analysis.canonicalU64("18446744073709551615").get
    val mid = Analysis.canonicalU64(Long.MaxValue.toString).get
    assert(mid < big && big < max)
    assert(Analysis.canonicalU64("-1").isEmpty && Analysis.canonicalU64("x").isEmpty)
  }

  test("i64 encoding is order-preserving across the sign boundary") {
    for (_ <- 0 until 500) {
      val a = rng.nextLong(); val b = rng.nextLong()
      val (ea, eb) = (Analysis.canonicalI64(a.toString).get, Analysis.canonicalI64(b.toString).get)
      assert((a < b) == (ea < eb))
    }
    assert(Analysis.canonicalI64("-1").get < Analysis.canonicalI64("0").get)
    assert(Analysis.canonicalI64("0").get < Analysis.canonicalI64("1").get)
  }

  test("f64 encoding is order-preserving (negatives, zero, fractions)") {
    // -0.0 is excluded from the random pool: like the reference's
    // f64_to_u64, it encodes as a DISTINCT key just below +0.0 even though
    // `==` calls them equal — asserted explicitly below
    val fixed = Seq(0.0, 1.5, -1.5, 1e-300, -1e-300, 1e300, -1e300)
    def sample(): Double =
      if (rng.nextInt(4) == 0) fixed(rng.nextInt(fixed.length))
      else (rng.nextDouble() - 0.5) * 2e12
    for (_ <- 0 until 500) {
      val a = sample(); val b = sample()
      val (ea, eb) = (Analysis.canonicalF64(a.toString).get, Analysis.canonicalF64(b.toString).get)
      assert((a < b) == (ea < eb), s"$a vs $b")
    }
    assert(Analysis.canonicalF64("-0.0").get < Analysis.canonicalF64("0.0").get)
  }

  test("bool terms: exactly true/false") {
    assert(Analysis.canonicalBool("true").contains("true"))
    assert(Analysis.canonicalBool("false").contains("false"))
    assert(Analysis.canonicalBool("TRUE").isEmpty && Analysis.canonicalBool("1").isEmpty)
  }

  test("date canonicalization: offsets normalize to UTC seconds, order == time order") {
    assert(Analysis.canonicalDate("2020-01-20T02:00:00+02:00")
      .contains("2020-01-20T00:00:00Z"))
    assert(Analysis.canonicalDate("2020-01-05T00:00:00.999Z")
      .contains("2020-01-05T00:00:00Z")) // truncated to seconds precision
    assert(Analysis.canonicalDate("2020-13-01T00:00:00Z").isEmpty)
    val a = Analysis.canonicalDate("1999-12-31T23:59:59Z").get
    val b = Analysis.canonicalDate("2000-01-01T00:00:00Z").get
    assert(a < b)
  }

  test("bytes terms: hex canonicalizes to lowercase, non-hex rejected") {
    assert(Analysis.canonicalBytesHex("00FF").contains("00ff"))
    assert(Analysis.canonicalBytesHex("abc").isEmpty)  // odd length
    assert(Analysis.canonicalBytesHex("zz").isEmpty)
  }

  test("parser + typed chains: literals and range bounds canonicalize per field") {
    import graft.query._
    val opts = Grammar.CompileOpts(fieldTokenizers = Map(
      "content" -> "default", "n" -> "u64", "ts" -> "date", "b" -> "bytes"))
    assert(QueryParser.parse("n:246", opts = opts) ==
      FieldQ("n", TermQ("00000000000000f6")))
    QueryParser.parse("ts:[2020-01-05T00:00:00Z TO 2020-01-20T02:00:00+02:00}", opts = opts) match {
      case FieldQ("ts", TermRangeQ(lo, hi)) =>
        assert(lo.contains(("2020-01-05T00:00:00Z", true)))
        assert(hi.contains(("2020-01-20T00:00:00Z", false)))
      case other => fail(s"unexpected: $other")
    }
    assert(QueryParser.parse("b:00FF", opts = opts) == FieldQ("b", TermQ("00ff")))
  }

  test("ipv6Key: u128 order where canonical text order disagrees") {
    // "::10" < "::9" lexicographically but 0x10 > 0x9 numerically — the
    // exact case that forces ip ranges off the string-order TermRangeQ path
    val k9 = Analysis.ipv6Key("2001:db8::9").get
    val k10 = Analysis.ipv6Key("2001:db8::10").get
    assert("2001:db8::10" < "2001:db8::9" && k9.compareTo(k10) < 0)
    // IPv4 maps into ::ffff:a.b.c.d space (into_ipv6_addr), above ::
    val v4 = Analysis.ipv6Key("1.2.3.4").get
    assert(v4 == Analysis.ipv6Key("::ffff:1.2.3.4").get)
    assert(Analysis.ipv6Key("::").get.signum == 0)
    assert(Analysis.ipv6Key("not-an-ip").isEmpty)
  }

  test("parser routes ip-field ranges to IpRangeQ with canonical bounds") {
    import graft.query._
    val opts = Grammar.CompileOpts(fieldTokenizers = Map(
      "content" -> "default", "ip" -> "ip"))
    QueryParser.parse("ip:[2001:0db8::0009 TO 2001:db8::10}", opts = opts) match {
      case FieldQ("ip", IpRangeQ(lo, hi)) =>
        assert(lo.contains(("2001:db8::9", true)))
        assert(hi.contains(("2001:db8::10", false)))
      case other => fail(s"unexpected: $other")
    }
    // non-ip str fields keep the TermRangeQ string-order path (content is
    // the sole default field, so scoped() drops the FieldQ wrapper)
    QueryParser.parse("content:[aa TO ab]", opts = opts) match {
      case TermRangeQ(_, _) => ()
      case other => fail(s"unexpected: $other")
    }
  }
}
