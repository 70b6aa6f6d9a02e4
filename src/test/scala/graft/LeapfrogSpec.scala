package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.Intersect
import graft.query.Intersect.TermPostings

/** Property tests for the leapfrog intersection kernel (mirror of the
  * reference's intersection proptests, `src/query/intersection.rs` tests):
  * random sorted docId lists ⇒ leapfrog visits exactly the set intersection,
  * in ascending order, with per-list indices pointing at the matched doc.
  */
class LeapfrogSpec extends AnyFunSuite {

  private def tp(docIds: Array[Int]): TermPostings =
    new TermPostings(docIds, docIds.map(_ => 1), docIds.map(_ => 10), Array.empty, Array.empty)

  private def randomSortedList(rng: scala.util.Random, maxDoc: Int): Array[Int] =
    (0 until maxDoc).filter(_ => rng.nextDouble() < rng.nextDouble()).toArray

  test("leapfrog == set intersection over 300 random cases (seed 42)") {
    val rng = new scala.util.Random(42)
    for (caseId <- 1 to 300) {
      val n = 1 + rng.nextInt(4)
      val maxDoc = 1 + rng.nextInt(500)
      val lists = Array.fill(n)(randomSortedList(rng, maxDoc))
      val expected = lists.map(_.toSet).reduce(_ intersect _).toSeq.sorted
      val visited = scala.collection.mutable.ArrayBuffer.empty[Int]
      Intersect.leapfrog(lists.map(tp)) { (doc, idx) =>
        // every index must point at the matched doc in its own list
        for (j <- lists.indices) assert(lists(j)(idx(j)) == doc, s"case $caseId idx $j")
        visited += doc
      }
      assert(visited.toSeq == expected, s"case $caseId: n=$n maxDoc=$maxDoc")
    }
  }

  test("leapfrog handles empty lists and disjoint lists") {
    var hits = 0
    Intersect.leapfrog(Array(tp(Array(1, 2)), tp(Array.empty)))((_, _) => hits += 1)
    Intersect.leapfrog(Array(tp(Array(1, 3, 5)), tp(Array(2, 4, 6))))((_, _) => hits += 1)
    assert(hits == 0)
  }

  test("single-list leapfrog visits every doc") {
    val docs = Array(0, 5, 9, 100)
    val visited = scala.collection.mutable.ArrayBuffer.empty[Int]
    Intersect.leapfrog(Array(tp(docs)))((d, _) => visited += d)
    assert(visited.toSeq == docs.toSeq)
  }
}
