package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analysis

/** DatePrecision truncation parity (`src/schema/date_time_options.rs`):
  * values truncate (never round) to the field's precision, normalize to
  * UTC, and render fixed-width so lexicographic order == chronological
  * order within a precision.
  */
class DatePrecisionSpec extends AnyFunSuite {

  test("truncation to each precision, UTC-normalized") {
    val in = "2020-01-05T12:34:56.123956789+02:00"
    assert(Analysis.canonicalDate(in) == Some("2020-01-05T10:34:56Z"))
    assert(Analysis.canonicalDate(in, "millis") == Some("2020-01-05T10:34:56.123Z"))
    assert(Analysis.canonicalDate(in, "micros") == Some("2020-01-05T10:34:56.123956Z"))
    // truncate, not round: .9999 stays .999 at millis
    assert(Analysis.canonicalDate("2020-01-05T00:00:00.999999Z", "millis")
      == Some("2020-01-05T00:00:00.999Z"))
    // no fractional digits parse fine and render the precision's width
    assert(Analysis.canonicalDate("2020-01-05T00:00:00Z", "millis")
      == Some("2020-01-05T00:00:00.000Z"))
  }

  test("lexicographic == chronological for millis terms") {
    val instants = Seq(
      "2019-12-31T23:59:59.999Z", "2020-01-01T00:00:00.000Z",
      "2020-01-01T00:00:00.001Z", "2020-01-01T00:00:00.010Z",
      "2020-01-01T00:00:00.100Z", "2020-01-01T00:00:01.000Z",
      "2020-06-05T01:02:03.456Z")
    val canon = instants.map(s => Analysis.canonicalDate(s, "millis").get)
    assert(canon == canon.sorted)
    val parsed = canon.map(s => java.time.OffsetDateTime.parse(s).toInstant)
    assert(parsed == parsed.sortBy(_.toEpochMilli))
  }

  test("nanosecond precision: native resolution, canonical 9-digit width") {
    val in = "2020-01-05T12:34:56.123956789+02:00"
    // nanos is the DateTime's native resolution (`common/src/datetime.rs:24`)
    // — truncation is the identity, all nine digits survive
    assert(Analysis.canonicalDate(in, "nanos")
      == Some("2020-01-05T10:34:56.123956789Z"))
    // shorter fractions zero-pad to the canonical 9-digit width
    assert(Analysis.canonicalDate("2020-01-05T00:00:00.5Z", "nanos")
      == Some("2020-01-05T00:00:00.500000000Z"))
    assert(Analysis.canonicalDate("2020-01-05T00:00:00Z", "nanos")
      == Some("2020-01-05T00:00:00.000000000Z"))
    // truncation PARITY down the precision ladder: the same instant through
    // each chain drops exactly the sub-precision digits, never rounds
    assert(Analysis.canonicalDate(in, "micros")
      == Some("2020-01-05T10:34:56.123956Z"))
    assert(Analysis.canonicalDate(in, "millis")
      == Some("2020-01-05T10:34:56.123Z"))
    assert(Analysis.canonicalDate(in)
      == Some("2020-01-05T10:34:56Z"))
    val toks = Analysis.analyzeChain("date_nanos", "2020-01-05T00:00:00.000000299Z")
    assert(toks.map(_.text) == Seq("2020-01-05T00:00:00.000000299Z"))
  }

  test("lexicographic == chronological for nanos terms") {
    val instants = Seq(
      "2019-12-31T23:59:59.999999999Z", "2020-01-01T00:00:00Z",
      "2020-01-01T00:00:00.000000001Z", "2020-01-01T00:00:00.000000010Z",
      "2020-01-01T00:00:00.00000002Z", "2020-01-01T00:00:00.000001Z",
      "2020-01-01T00:00:00.001Z", "2020-01-01T00:00:01Z")
    val canon = instants.map(s => Analysis.canonicalDate(s, "nanos").get)
    assert(canon == canon.sorted)
    val parsed = canon.map(s => java.time.OffsetDateTime.parse(s).toInstant)
    assert(parsed == parsed.sortBy(i => (i.getEpochSecond, i.getNano)))
  }

  test("the date_millis analyzer chain emits the truncated canonical term") {
    val toks = Analysis.analyzeChain("date_millis", "2020-01-05T00:00:00.500999Z")
    assert(toks.map(_.text) == Seq("2020-01-05T00:00:00.500Z"))
    val micros = Analysis.analyzeChain("date_micros", "2020-01-05T00:00:00.500999800Z")
    assert(micros.map(_.text) == Seq("2020-01-05T00:00:00.500999Z"))
    // unparseable input emits no term, like the other typed chains
    assert(Analysis.analyzeChain("date_millis", "not-a-date").isEmpty)
  }
}
