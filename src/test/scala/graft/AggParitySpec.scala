package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, IndexConfig}
import graft.ops.Aggregations
import graft.ops.Aggregations._
import graft.query._

/** The reference's own end-to-end aggregation golden tests
  * (`src/aggregation/agg_tests.rs:237-376`, corpus
  * `src/aggregation/mod.rs:530-614` `get_test_index_2_segments`): a
  * TermQuery("cool") drives avg + range aggregations over fast fields and
  * the results must equal the published golden JSON exactly — including
  * the implicit `*-3` / `20-*` edge buckets and f64 averages to the last
  * bit. Here the same corpus is indexed through the engine (fast fields =
  * docmap columns), the same term query selects the docs, and
  * `Aggregations` reproduces the numbers.
  */
class AggParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (text, score u64, score_f64, score_i64) as s_u64/s_f64/s_i64 — the
  // engine reserves `score` for BM25 output. agg_tests corpus in insertion
  // order; two commits = two segments before the merge the test performs
  // (stats are index-global either way).
  private val corpus = Seq(
    ("cool", 1L, 1.0, 1L),
    ("cool", 3L, 3.0, 3L),
    ("cool", 5L, 5.0, 5L),
    ("nohit", 6L, 6.0, 6L),
    ("cool", 7L, 7.0, 7L),
    ("cool", 11L, 11.0, 11L),
    ("cool", 14L, 14.0, 14L),
    ("cool", 44L, 44.5, 44L),
    ("nohit", 44L, 44.5, 44L))

  private lazy val (sr, hits) = {
    val d = java.nio.file.Files.createTempDirectory("graft-aggpar").toString
    val docs = corpus.zipWithIndex.map { case ((t, s, f, i), ix) =>
      ("r0", s"p$ix", "c0", "rust", t, s, f, i)
    }.toDF("repo", "path", "commit", "lang", "content",
      "s_u64", "s_f64", "s_i64")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 2,
      fastFields = Seq("s_u64", "s_f64", "s_i64")))
    val sr = new Searcher(spark, d)
    val h = sr.compile(TermQ("cool"))
      .join(sr.docmap, Seq("segId", "docId"))
      .select("s_u64", "s_f64", "s_i64")
    (sr, h.cache())
  }

  test("level1 averages match the golden JSON to the last f64 bit " +
      "(agg_tests.rs:361-363)") {
    val r = hits.agg(
      avg("s_u64").as("average"),
      avg("s_f64").as("average_f64"),
      avg("s_i64").as("average_i64")).head()
    assert(r.getDouble(0) == 12.142857142857142)
    assert(r.getDouble(1) == 12.214285714285714)
    assert(r.getDouble(2) == 12.142857142857142)
  }

  test("range buckets carry the implicit edge buckets with ES keys " +
      "(agg_tests.rs:274-299)") {
    val ranges = esRanges(Seq(
      (Some(3.0), Some(7.0)), (Some(7.0), Some(20.0))))
    assert(ranges.map(_._1) == Seq("*-3", "3-7", "7-20", "20-*"))
    val out = Aggregations.run(hits, AggRequest(
      buckets = Seq(RangeAgg("s_u64", ranges, name = "key")),
      metrics = Seq(MetricAgg.count)))
      .select("key", "cnt").as[(String, Long)].collect().toMap
    assert(out == Map("*-3" -> 1L, "3-7" -> 2L, "7-20" -> 3L, "20-*" -> 1L))
  }

  test("level2: range buckets with metric sub-aggs, empty buckets emitted " +
      "gap-filled in request order (agg_tests.rs:470-510)") {
    // the level2 request: 5 explicit ranges; sub-agg = avg over the u64
    // `score` regardless of which typed field buckets the docs
    val ranges = Seq(
      ("*-3", None, Some(3.0)), ("3-7", Some(3.0), Some(7.0)),
      ("7-19", Some(7.0), Some(19.0)), ("19-20", Some(19.0), Some(20.0)),
      ("20-*", Some(20.0), None))
    for (bucketField <- Seq("s_u64", "s_f64", "s_i64")) {
      val out = Aggregations.rangeAgg(hits, bucketField, ranges,
        metrics = Seq(MetricAgg("average_in_range", avg(col("s_u64")))))
        .collect()
      assert(out.map(_.getString(0)).toSeq ==
        Seq("*-3", "3-7", "7-19", "19-20", "20-*"), s"order for $bucketField")
      assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 0L, 1L),
        s"counts for $bucketField")
      // empty bucket's metric is NULL; the 20-* doc is score 44 -> 44.0
      assert(out(3).isNullAt(2), s"19-20 average must be null ($bucketField)")
      assert(out(4).getDouble(2) == 44.0, s"20-* average ($bucketField)")
    }
  }

  test("esRanges matches extend_validate_ranges (bucket/range.rs:402-444): " +
      "no duplicate edges on open ranges, holes filled, overlaps rejected") {
    // an open-start request must NOT get a second synthetic *-bucket
    assert(esRanges(Seq((None, Some(3.0)), (Some(3.0), None)))
      .map(_._1) == Seq("*-3", "3-*"))
    // unsorted input sorts by `from`
    assert(esRanges(Seq((Some(7.0), Some(20.0)), (Some(3.0), Some(7.0))))
      .map(_._1) == Seq("*-3", "3-7", "7-20", "20-*"))
    // interior hole -> synthetic bucket
    assert(esRanges(Seq((Some(3.0), Some(7.0)), (Some(10.0), Some(20.0))))
      .map(_._1) == Seq("*-3", "3-7", "7-10", "10-20", "20-*"))
    // overlaps error like the reference
    intercept[IllegalArgumentException] {
      esRanges(Seq((Some(3.0), Some(8.0)), (Some(7.0), Some(20.0))))
    }
  }

  test("rangeAgg zero-fills count-type metric sub-aggs on empty buckets") {
    val ranges = Seq(("*-3", None, Some(3.0)), ("1000-1001", Some(1000.0), Some(1001.0)))
    val out = Aggregations.rangeAgg(hits, "s_u64", ranges,
      metrics = Seq(MetricAgg("sub_cnt", count(lit(1)), isCount = true),
        MetricAgg("sub_avg", avg(col("s_u64")))))
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("*-3", "1000-1001"))
    assert(out(1).getLong(1) == 0L)      // cnt
    assert(out(1).getLong(2) == 0L)      // count-type metric zero-filled
    assert(out(1).isNullAt(3))           // value metric stays NULL
  }

  test("the f64 range twin buckets identically (agg_tests.rs rangef64)") {
    val ranges = esRanges(Seq(
      (Some(3.0), Some(7.0)), (Some(7.0), Some(20.0))))
    val out = Aggregations.run(hits, AggRequest(
      buckets = Seq(RangeAgg("s_f64", ranges, name = "key")),
      metrics = Seq(MetricAgg.count)))
      .select("key", "cnt").as[(String, Long)].collect().toMap
    assert(out == Map("*-3" -> 1L, "3-7" -> 2L, "7-20" -> 3L, "20-*" -> 1L))
  }
}
