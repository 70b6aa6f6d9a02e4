package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Aggregations._

/** Arbitrary sub-aggregation trees (`agg_req.rs:120-171`) compiled to one
  * GROUPING SETS pass (`Aggregations.runTree`).
  */
class AggTreeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 10.0, "x"), ("a", 30.0, "x"), ("a", 30.0, "y"),
    ("b", 10.0, "y"), ("b", 60.0, "y"))
    .toDF("t", "v", "g")

  test("sibling sub-aggs: terms > {histogram, terms} in one pass") {
    val out = runTree(df, Seq(
      AggNode(TermsAgg("t", "t"), Seq(MetricAgg.count), Seq(
        AggNode(HistogramAgg("v", 25.0, 0.0, "bucket"), Seq(MetricAgg.count)),
        AggNode(TermsAgg("g", "g"), Seq(MetricAgg.count))))))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1),
      Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.getString(3)),
      r.getLong(4)))
    // root level: per-t counts, child keys NULL
    assert(rows.filter(_._1 == "t").map(x => (x._2, x._5)).toSet ==
      Set(("a", 3L), ("b", 2L)))
    assert(rows.filter(_._1 == "t").forall(x => x._3.isEmpty && x._4.isEmpty))
    // histogram branch
    assert(rows.filter(_._1 == "t>bucket").map(x => (x._2, x._3.get, x._5)).toSet ==
      Set(("a", 0.0, 1L), ("a", 25.0, 2L), ("b", 0.0, 1L), ("b", 50.0, 1L)))
    // sibling terms branch
    assert(rows.filter(_._1 == "t>g").map(x => (x._2, x._4.get, x._5)).toSet ==
      Set(("a", "x", 2L), ("a", "y", 1L), ("b", "y", 2L)))
    // exactly the three node levels, nothing else
    assert(rows.map(_._1).toSet == Set("t", "t>bucket", "t>g"))
  }

  test("single plan: one shuffle (Expand + one Aggregate exchange), not per-branch jobs") {
    val out = runTree(df, Seq(
      AggNode(TermsAgg("t", "t"), Seq(MetricAgg.count), Seq(
        AggNode(HistogramAgg("v", 25.0, 0.0, "bucket"), Seq(MetricAgg.count)),
        AggNode(TermsAgg("g", "g"), Seq(MetricAgg.count))))))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Expand")) // grouping sets expansion
    // one aggregate exchange (plus the final orderBy range exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges\n$plan")
  }

  test("three-level chain with metrics at every level") {
    val out = runTree(df, Seq(
      AggNode(TermsAgg("t", "t"), Seq(MetricAgg.count), Seq(
        AggNode(TermsAgg("g", "g"), Seq(MetricAgg("sum_v", sum(col("v")))), Seq(
          AggNode(HistogramAgg("v", 50.0, 0.0, "bucket"), Seq(MetricAgg.count))))))))
    val paths = out.select("agg_path").as[String].collect().distinct.sorted
    assert(paths.toSeq == Seq("t", "t>g", "t>g>bucket"))
    // metric union appears as columns for every row
    assert(out.columns.toSeq == Seq("agg_path", "t", "g", "bucket", "cnt", "sum_v"))
  }
}
