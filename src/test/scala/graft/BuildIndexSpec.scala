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

  test("store codec (compressors.rs None/Lz4/Zstd) reaches the docstore parquet footers") {
    import graft.index.{IndexBuilder, IndexConfig}
    def build(codec: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-cc-$codec").toString
      val docs = CorpusGen.corpus(spark, 30, seed = 3L, avgLines = 4).toDF()
      IndexBuilder.build(spark, docs, d,
        IndexConfig(numSegments = 2, storeCodec = codec))
      d
    }
    def footerCodecs(dir: String): Set[String] = {
      val files = new java.io.File(s"$dir/docmap/batch=0").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.get(0).getColumns.get(0).getCodec.name() +: Nil
        finally r.close()
      }.map(_.toLowerCase).toSet
    }
    assert(footerCodecs(build("zstd")) == Set("zstd"))
    assert(footerCodecs(build("none")) == Set("uncompressed"))
    val lz4Dir = build("lz4")
    assert(footerCodecs(lz4Dir).head.startsWith("lz4")) // LZ4 or LZ4_RAW
    // and the index remains fully queryable
    assert(new Searcher(spark, lz4Dir).count(TermQ("def")) > 0)
  }

  test("Warmer hook (reader/warming.rs): runs per new searcher generation, GC sees live gens") {
    import graft.index.IndexConfig
    val d = java.nio.file.Files.createTempDirectory("graft-warm").toString
    val docs = CorpusGen.corpus(spark, 25, seed = 5L, avgLines = 3).toDF()
    val idx = Graft.build(spark, docs, d, IndexConfig(numSegments = 2))
    val warmed = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastLive: Seq[Long] = Nil
    idx.registerWarmer(new Warmer {
      def warm(sr: graft.query.Searcher): Unit = {
        warmed += sr.generation
        sr.termdict.count() // typical warming work: materialize the cache
      }
      override def garbageCollect(live: Seq[Long]): Unit = lastLive = live
    })
    val s1 = idx.searcher
    assert(warmed == Seq(s1.generation) && lastLive == Seq(s1.generation))
    // same snapshot -> same generation; a delete changes it
    assert(idx.searcher.generation == s1.generation)
    idx.delete(graft.query.TermQ("def"))
    val s2 = idx.searcher
    assert(s2.generation != s1.generation)
    assert(warmed.size == 3 && lastLive == Seq(s2.generation))
  }

  test("MAX_DOC_LIMIT (merger.rs:24-27) enforced at build time") {
    import graft.index.{IndexBuilder, IndexConfig}
    val d = java.nio.file.Files.createTempDirectory("graft-cap").toString
    val docs = CorpusGen.corpus(spark, 40, seed = 4L, avgLines = 3).toDF()
    val ex = intercept[IllegalStateException] {
      IndexBuilder.build(spark, docs, d,
        IndexConfig(numSegments = 2, maxDocsPerSegment = 10L))
    }
    assert(ex.getMessage.contains("exceeding the limit"))
  }
}
