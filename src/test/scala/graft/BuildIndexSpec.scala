package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.CorpusGen
import graft.query.{Searcher, TermQ}

/** The spark-submit entry point (`graft.BuildIndex`) end to end: CLI args ->
  * committed, queryable index; resubmission resumes from checkpoints.
  */
class BuildIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("BuildIndex.run builds a queryable index from --input-path; resubmit resumes") {
    val base = java.nio.file.Files.createTempDirectory("graft-bi").toString
    CorpusGen.corpus(spark, 120, seed = 7L, avgLines = 6)
      .write.mode("overwrite").parquet(s"$base/corpus")
    val args = Array("--input-path", s"$base/corpus", "--index", s"$base/idx",
      "--segments", "3", "--batches", "2")
    val meta = BuildIndex.run(spark, args)
    assert(meta.totalRows == 120 && meta.segments.forall(_.sha256ok))
    assert(meta.withPositions)

    val sr = new Searcher(spark, s"$base/idx")
    assert(sr.count(TermQ("def")) > 0) // hot keyword must hit

    // identical resubmission: every batch checkpoint is reused
    val meta2 = BuildIndex.run(spark, args)
    assert(meta2.segments.map(s => (s.segId, s.rows, s.tokens)).sorted ==
      meta.segments.map(s => (s.segId, s.rows, s.tokens)).sorted)
  }
}
