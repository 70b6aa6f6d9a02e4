package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Aggregations

/** Full ES histogram request semantics (`src/aggregation/bucket/histogram/
  * histogram.rs`): gap-free axis at min_doc_count 0, extended_bounds
  * widening, hard_bounds collection filter + axis clamp, min_doc_count
  * bucket filter; plus terms `missing`/`size`/`order`
  * (`bucket/term_agg.rs`, `bucket/term_missing_agg.rs`).
  */
class HistogramBoundsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // values bucket (interval 10) to ords 0, 2, 2, 5 — ord 1, 3, 4 are gaps
  private lazy val df = Seq(1.0, 21.0, 25.0, 55.0).toDF("v")

  private def buckets(out: org.apache.spark.sql.DataFrame): Seq[(Double, Long)] =
    out.collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq

  test("min_doc_count 0 fills gaps between min and max collected bucket") {
    // histogram.rs:574-587 — one bucket per position, empties carry count 0
    assert(buckets(Aggregations.histogram(df, "v", 10.0)) ==
      Seq(0.0 -> 1L, 10.0 -> 0L, 20.0 -> 2L, 30.0 -> 0L, 40.0 -> 0L, 50.0 -> 1L))
  }

  test("extended_bounds widen the axis beyond the data") {
    // histogram.rs:560-563: min/max widened by the bounds before bucket gen
    val out = buckets(Aggregations.histogram(df, "v", 10.0,
      extendedBounds = Some((-15.0, 72.0))))
    assert(out.head == (-20.0, 0L) && out.last == (70.0, 0L))
    assert(out.size == 10 && out.map(_._2).sum == 4L)
  }

  test("hard_bounds filter collection AND clamp the axis") {
    // histogram.rs:251-253 contains = min <= v <= max; 565-567: hard_bounds
    // only CLAMP the collected min/max — they never extend it (extension is
    // extended_bounds' job), so the axis here is the single collected bucket
    val out = buckets(Aggregations.histogram(df, "v", 10.0,
      hardBounds = Some((5.0, 30.0))))
    assert(out == Seq(20.0 -> 2L))
    // with both bounds set to the range, the axis is forced to it
    // (histogram.rs:123-124: "to force a range set both ... to the same")
    val forced = buckets(Aggregations.histogram(df, "v", 10.0,
      extendedBounds = Some((5.0, 30.0)), hardBounds = Some((5.0, 30.0))))
    assert(forced == Seq(0.0 -> 0L, 10.0 -> 0L, 20.0 -> 2L, 30.0 -> 0L))
  }

  test("min_doc_count > 0 filters sparse buckets, no gap fill") {
    assert(buckets(Aggregations.histogram(df, "v", 10.0, minDocCount = 2)) ==
      Seq(20.0 -> 2L))
  }

  test("min_doc_count with extended_bounds is a request error") {
    // histogram.rs:183-186
    intercept[IllegalArgumentException] {
      Aggregations.histogram(df, "v", 10.0, minDocCount = 1,
        extendedBounds = Some((0.0, 1.0)))
    }
  }

  test("extended_bounds outside hard_bounds is a request error") {
    // histogram.rs:189-195
    intercept[IllegalArgumentException] {
      Aggregations.histogram(df, "v", 10.0,
        extendedBounds = Some((-5.0, 40.0)), hardBounds = Some((0.0, 30.0)))
    }
  }

  test("offset shifts bucket keys (key = pos*interval + offset)") {
    val out = buckets(Aggregations.histogram(df, "v", 10.0, offset = 5.0))
    // 1.0 -> ord -1 (key -5), 21 -> ord 1 (15), 25 -> ord 2 (25),
    // 55 -> ord 5 (55)
    assert(out == Seq(-5.0 -> 1L, 5.0 -> 0L, 15.0 -> 1L, 25.0 -> 1L,
      35.0 -> 0L, 45.0 -> 0L, 55.0 -> 1L))
  }

  test("parseFixedInterval: the reference's unit table (date_histogram.rs:180-213)") {
    assert(Aggregations.parseFixedInterval("30d") == 30L * 86400000)
    assert(Aggregations.parseFixedInterval("12h") == 43200000L)
    assert(Aggregations.parseFixedInterval("90s") == 90000L)
    assert(Aggregations.parseFixedInterval("250ms") == 250L)
    assert(Aggregations.parseFixedInterval("5minutes") == 300000L)
    intercept[IllegalArgumentException](Aggregations.parseFixedInterval("d"))
    intercept[IllegalArgumentException](Aggregations.parseFixedInterval("30"))
    // calendar units are rejected (fixed_interval only, date_histogram.rs:40-54)
    intercept[IllegalArgumentException](Aggregations.parseFixedInterval("1M"))
    intercept[IllegalArgumentException](Aggregations.parseFixedInterval("1y"))
  }

  test("parseOffset: signed intervals (date_histogram.rs:277-290)") {
    assert(Aggregations.parseOffset("1m") == 60000L)
    assert(Aggregations.parseOffset("+1m") == 60000L)
    assert(Aggregations.parseOffset("-1m") == -60000L)
    assert(Aggregations.parseOffset("2m") == 120000L)
    assert(Aggregations.parseOffset("-2ms") == -2L)
    intercept[IllegalArgumentException](Aggregations.parseOffset("2y"))
    intercept[IllegalArgumentException](Aggregations.parseOffset("2000"))
    intercept[IllegalArgumentException](Aggregations.parseOffset(""))
  }

  test("dateHistogram: fixed-interval buckets over epoch ms, gap-free") {
    val t = Seq("2024-01-01 00:10:00", "2024-01-01 13:00:00", "2024-01-02 14:00:00")
      .toDF("s").selectExpr("CAST(s AS TIMESTAMP) AS ts")
    val out = Aggregations.dateHistogram(t, "ts", "12h")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val base = 1704067200000.0 // 2024-01-01T00:00:00Z
    assert(out == Seq(base -> 1L, (base + 43200000) -> 1L,
      (base + 2 * 43200000) -> 0L, (base + 3 * 43200000) -> 1L))
  }

  test("empty collection with hard_bounds yields NO buckets (f64 sentinels make min > max)") {
    // all values outside the bounds: the reference's get_req_min_max
    // leaves min = f64::MAX > max = f64::MIN -> empty bucket vec
    assert(Aggregations.histogram(df, "v", 10.0,
      hardBounds = Some((200.0, 300.0))).count() == 0L)
    // but extended_bounds DO span an axis even with no data collected
    val forced = buckets(Aggregations.histogram(df, "v", 10.0,
      extendedBounds = Some((200.0, 219.0)), hardBounds = Some((200.0, 300.0))))
    assert(forced == Seq(200.0 -> 0L, 210.0 -> 0L))
  }

  test("null values produce no bucket (reference iterates existing values only)") {
    val withNulls = Seq(Some(1.0), None, None, Some(21.0)).toDF("v")
    assert(buckets(Aggregations.histogram(withNulls, "v", 10.0)) ==
      Seq(0.0 -> 1L, 10.0 -> 0L, 20.0 -> 1L))
    // minDocCount > 0 path must not emit a NULL-key bucket either
    assert(buckets(Aggregations.histogram(withNulls, "v", 10.0, minDocCount = 1)) ==
      Seq(0.0 -> 1L, 20.0 -> 1L))
  }

  test("terms without `missing` skips docs with no value") {
    val t = Seq(Some("a"), None, None, Some("b")).toDF("k")
    val out = Aggregations.terms(t, "k", name = "k", orderByCountDesc = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq("a" -> 1L, "b" -> 1L))
  }

  test("terms missing buckets nulls under the replacement key") {
    // term_missing_agg.rs: missing checks value existence, null docs get
    // the replacement key
    val t = Seq(Some("a"), None, Some("b"), None, Some("a")).toDF("k")
    val out = Aggregations.terms(t, "k", name = "k",
      orderByCountDesc = false, missing = Some("(none)"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq("(none)" -> 2L, "a" -> 2L, "b" -> 1L))
  }

  test("terms size + order-by-key cut") {
    val t = Seq("c", "a", "b", "a", "d").toDF("k")
    val out = Aggregations.terms(t, "k", name = "k", size = 2,
      orderByCountDesc = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq("a" -> 2L, "b" -> 1L))
  }

  test("terms min_doc_count filters rare keys") {
    val t = Seq("a", "a", "b").toDF("k")
    val out = Aggregations.terms(t, "k", name = "k", minDocCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq("a" -> 2L))
  }
}
