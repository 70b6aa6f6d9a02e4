package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{IndexConfig, Manifest, Merger}
import graft.query._

/** Port of the reference's randomized functional test
  * (`src/functional_test.rs:21-58` `test_functional_store` /
  * `test_functional_indexing_unsorted`): a seeded random sequence of
  * {delete one live doc by id term, add 0-3 new docs, commit} with the
  * searcher re-checked after every commit — the alive set must equal the
  * driver-side model exactly and the segment count must stay bounded under
  * the merge policy. Iteration count is scaled to Spark's per-commit job
  * cost (each commit is a real batch job, not an in-RAM insert).
  */
class FunctionalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def batchDf(ids: Seq[Int]) =
    ids.map(i => ("r0", s"p$i", "c0", "rust", s"common id$i payload$i"))
      .toDF("repo", "path", "commit", "lang", "content")

  test("random add/delete/commit cycles keep searcher == model " +
      "(functional_test.rs:40-57)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-func").toString
    val rng = new scala.util.Random(0xF00D)
    val idx = Graft.create(spark, dir, IndexConfig(numSegments = 2))
    val model = scala.collection.mutable.ArrayBuffer[Int]()
    var nextId = 0

    for (iter <- 0 until 10) {
      if (model.nonEmpty) {
        // delete_term on a random live id (swap_remove in the reference)
        val victim = model.remove(rng.nextInt(model.length))
        idx.delete(TermQ(s"id$victim"))
      }
      val n = rng.nextInt(4)
      if (n > 0) {
        val ids = (0 until n).map(_ => { val i = nextId; nextId += 1; i })
        model ++= ids
        idx.add(batchDf(ids))
      }
      // every commit: alive docs == model, exactly
      val sr = idx.searcher
      val alive =
        if (Manifest.read(dir).segments.isEmpty) Set.empty[String]
        else sr.compile(TermQ("common"))
          .join(sr.docmap.select($"segId", $"docId", $"path"),
            Seq("segId", "docId"))
          .select($"path").as[String].collect().toSet
      assert(alive == model.map(i => s"p$i").toSet,
        s"iter $iter: alive=$alive model=$model")
      // periodic compaction applies tombstones; results must be unchanged
      if (iter % 4 == 3) {
        idx.compact(Merger.LogMergePolicy(minNumSegments = 2,
          minLayerSize = 1))
        val sr2 = idx.searcher
        val alive2 = sr2.compile(TermQ("common"))
          .join(sr2.docmap.select($"segId", $"docId", $"path"),
            Seq("segId", "docId"))
          .select($"path").as[String].collect().toSet
        assert(alive2 == model.map(i => s"p$i").toSet)
      }
      // the reference's segment bound (check_index_content: < 20)
      assert(Manifest.read(dir).segments.length < 20)
    }
  }
}
