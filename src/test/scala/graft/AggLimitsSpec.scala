package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Aggregations
import graft.ops.Aggregations._

/** Aggregation guardrails (`src/aggregation/agg_limits.rs`,
  * `collector.rs:17`): a request whose bucket count exceeds
  * `AggLimits.maxBuckets` must ERROR (the reference's
  * `AggregationError::BucketLimitExceeded` / ES `search.max_buckets`
  * behavior) instead of materializing every bucket on the driver.
  */
class AggLimitsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val df = (0 until 1000)
    .map(i => (s"k$i", i % 7, i.toDouble)).toDF("key", "grp", "v")

  test("over-limit terms request errors with the agg_limits semantics") {
    val req = AggRequest(
      buckets = Seq(TermsAgg("key", "key")),
      metrics = Seq(MetricAgg.count))
    val e = intercept[AggLimitExceeded] {
      Aggregations.run(df, req, limits = Some(AggLimits(maxBuckets = 100))).collect()
    }
    assert(e.getMessage.contains("100"))
  }

  test("within-limit request returns identical rows to the unchecked path") {
    val req = AggRequest(
      buckets = Seq(TermsAgg("grp", "grp")),
      metrics = Seq(MetricAgg.count, MetricAgg("s", sum($"v"))))
    val unchecked = Aggregations.run(df, req).collect().toSeq
    val checked = Aggregations.run(df, req, limits = Some(AggLimits())).collect().toSeq
    assert(checked == unchecked && checked.length == 7)
  }

  test("runTree enforces the limit across grouping sets") {
    val tree = Seq(AggNode(TermsAgg("key", "key"),
      metrics = Seq(MetricAgg.count)))
    intercept[AggLimitExceeded] {
      Aggregations.runTree(df, tree, limits = Some(AggLimits(maxBuckets = 10))).collect()
    }
    // default 65000 (DEFAULT_BUCKET_LIMIT, agg_limits.rs:63) admits 1000
    assert(Aggregations.runTree(df, tree, limits = Some(AggLimits()))
      .count() == 1000L)
  }
}
