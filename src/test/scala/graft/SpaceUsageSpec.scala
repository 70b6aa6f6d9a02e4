package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.CorpusGen
import graft.index._

/** Space-usage introspection (`src/space_usage/mod.rs` analog): exact
  * per-component on-disk bytes, logical per-(segment, field) accounting.
  */
class SpaceUsageSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("components sum real file bytes; per-segment logical units reconcile") {
    val dir = java.nio.file.Files.createTempDirectory("graft-space").toString
    val cfg = IndexConfig(numSegments = 3, blockSize = 16)
    val meta = IndexBuilder.build(spark,
      CorpusGen.corpus(spark, 120, seed = 5L, avgLines = 6).toDF(), dir, cfg)
    val u = SpaceUsage.of(spark, dir)

    // every live component reports non-zero real bytes
    for (c <- Seq("postings", "docmap", "termdict", "stats"))
      assert(u.component(c).exists(_.bytes > 0), s"$c bytes")
    assert(u.component("deletes").exists(_.bytes == 0))
    assert(u.totalBytes == u.components.map(_.bytes).sum)

    // per-segment docs match the manifest; per-field docFreq totals match
    // the termdict's
    assert(u.segments.map(s => s.segId -> s.numDocs).toMap ==
      meta.segments.map(s => s.segId -> s.rows).toMap)
    val tdDf = new query.Searcher(spark, dir).termdict
      .groupBy($"segId", $"field")
      .agg(org.apache.spark.sql.functions.sum($"docFreq").as("df"))
      .as[(Int, String, Long)].collect()
      .map { case (s, f, d) => (s, f) -> d }.toMap
    u.segments.foreach(s => s.perField.foreach { f =>
      assert(f.totalDocFreq == tdDf((f.segId, f.field)), s"df for $f")
      assert(f.numTerms > 0 && f.totalPositions >= f.totalDocFreq)
    })

    // byte-share estimates partition the component totals (within rounding)
    val estP = u.segments.flatMap(_.perField).map(_.estPostingsBytes).sum
    assert(estP <= u.component("postings").get.bytes)
    assert(estP >= u.component("postings").get.bytes - u.segments.map(_.perField.size).sum)
  }
}
