package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Near-dup clustering (connected components by min-label propagation):
  * component labels are the minimum doc_id, singletons keep themselves,
  * and long chains (max diameter) still converge within the round bound.
  */
class DedupClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def cluster(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val docs = ids.toDF("doc_id")
    val p = pairs.toDF("a", "b")
    Dedup.connectedComponents(docs, "doc_id", p)
      .as[(Long, Long)].collect().toMap
  }

  test("two components + a singleton label to their minima") {
    val got = cluster(Seq(1L, 2L, 3L, 10L, 11L, 20L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("a 9-hop chain converges (diameter-bound propagation)") {
    val ids = (1L to 10L)
    val chain = ids.sliding(2).map(s => (s(0), s(1))).toSeq
    val got = cluster(ids, chain)
    assert(got == ids.map(_ -> 1L).toMap)
  }

  test("edge ids absent from the doc set do not invent docs; dup texts cluster") {
    // end-to-end over texts: three exact dup groups under Jaccard >= 0.9
    val docs = Seq(
      (0L, "a b c d e f g h"), (1L, "a b c d e f g h"),
      (2L, "x y z w q r s t"), (3L, "x y z w q r s t"),
      (4L, "completely different tokens here now ok yes no"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashClusters(docs, "doc_id", "text", 0.9)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }
}
