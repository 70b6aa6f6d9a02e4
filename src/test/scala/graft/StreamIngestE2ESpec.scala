package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.TermQ

/** End-to-end streaming ingestion (Engine.streamIngestedSearcher →
  * StreamIngest.startDf): the corpus staged as a 3-file stream, one
  * foreachBatch commit per file, manifest republished atomically each
  * time — and the resulting index answers EXACTLY like the batch-built
  * one over the same corpus.
  */
class StreamIngestE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("streamed index == batch index on doc sets and commit count") {
    val dir = "/root/testdata/sf0.001"
    val batch = Engine.searcher(spark, dir)
    val streamed = Engine.streamIngestedSearcher(spark, dir)
    // three micro-batches => three append commits beyond batch's segments
    assert(streamed.indexMeta.map(_.segments.map(_.batch).distinct.size).contains(3))
    for (t <- Seq("vector", "spark", "the")) {
      val a = Engine.docIds(batch, TermQ(t)).collect().map(_.getLong(0)).toSeq
      val b = Engine.docIds(streamed, TermQ(t)).collect().map(_.getLong(0)).toSeq
      assert(a == b, s"term $t")
    }
  }
}
