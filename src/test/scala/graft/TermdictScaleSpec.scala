package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** Size-aware termdict caching (round-5 verdict item): below the byte
  * threshold the dictionary is cached with a size-proportional partition
  * count; above it the df lookups stay plain Parquet scans with the
  * (field, term) predicates PUSHED into the scan — at 10^12 files the term
  * dictionary is TB-scale and a blanket cache would materialize it all.
  */
class TermdictScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val idxDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-termdict").toString
    val docs = Seq(
      ("r0", "p0", "c0", "x", "alpha beta gamma"),
      ("r0", "p1", "c0", "x", "beta delta epsilon"),
      ("r0", "p2", "c0", "x", "alpha zeta"))
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, docs, d, IndexConfig(numSegments = 2))
    d
  }

  test("below the threshold: cached, with a size-proportional partition count") {
    spark.conf.unset("graft.termdict.cacheBytes")
    val sr = new Searcher(spark, idxDir)
    sr.termdict.count() // materialize
    assert(sr.termdict.storageLevel.useMemory, "small termdict must be cached")
    assert(sr.termdict.rdd.getNumPartitions == 1,
      "a KB-scale termdict must not spread over many cached partitions")
    assert(sr.docFreqs(Seq("alpha", "beta", "zeta")) ==
      Map("alpha" -> 2L, "beta" -> 2L, "zeta" -> 1L))
  }

  test("above the threshold: uncached, df lookup predicates pushed into the scan") {
    spark.conf.set("graft.termdict.cacheBytes", "0")
    try {
      val sr = new Searcher(spark, idxDir)
      assert(!sr.termdict.storageLevel.useMemory, "oversized termdict must NOT be cached")
      val plan = sr.termdict
        .where($"field" === "content" && $"term".isin("alpha", "beta"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("EqualTo(field,content)") &&
        plan.contains("In(term"),
        s"df-lookup predicates must reach the Parquet scan:\n$plan")
      // same answers through the uncached path
      assert(sr.docFreqs(Seq("alpha", "beta", "zeta")) ==
        Map("alpha" -> 2L, "beta" -> 2L, "zeta" -> 1L))
    } finally spark.conf.unset("graft.termdict.cacheBytes")
  }
}
