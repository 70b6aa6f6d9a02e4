package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.PhraseMatcher

/** Property fuzz of the phrase-prefix matching kernel
  * (`PhraseMatcher.prefixGatedCount`, the MultiPrefix semantics of
  * `phrase_prefix_scorer.rs:159-176`) against a set-based brute force:
  * count = #phrase starts where every fixed slot holds its offset
  * position; extended = some such start also has a prefix position at
  * start + prefixOffset. 1000 seeded random cases.
  */
class SlotPhrasePropertySpec extends AnyFunSuite {

  private def brute(offsets: Array[Int], slots: Array[Array[Int]],
                    prefixOff: Int, prefixPos: Array[Int]): (Int, Boolean) = {
    val sets = slots.map(_.toSet)
    val pset = prefixPos.toSet
    val bases = slots(0).map(_ - offsets(0))
      .filter(b => offsets.indices.forall(i => sets(i).contains(b + offsets(i))))
    (bases.length, bases.exists(b => pset.contains(b + prefixOff)))
  }

  test("prefixGatedCount == set brute force (1000 random cases, seed 7)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 1000) {
      val nSlots = 2 + rng.nextInt(3)
      // offsets strictly increasing but possibly gapped, like the parser's
      // position-carrying tokens
      val offsets = Array.iterate(0, nSlots)(o => o + 1 + rng.nextInt(2))
      val prefixOff = offsets.last + 1 + rng.nextInt(2)
      def positions(): Array[Int] = {
        val n = rng.nextInt(12)
        rng.shuffle((0 until 30).toVector).take(n).sorted.toArray
      }
      val slots = Array.fill(nSlots)(positions())
      val prefixPos = positions()
      if (slots.forall(_.nonEmpty)) {
        val got = PhraseMatcher.prefixGatedCount(offsets, slots, prefixOff, prefixPos)
        val want = brute(offsets, slots, prefixOff, prefixPos)
        assert(got == want,
          s"offsets=${offsets.toSeq} slots=${slots.map(_.toSeq).toSeq} " +
            s"prefixOff=$prefixOff prefixPos=${prefixPos.toSeq}")
      }
    }
  }

  test("slot-union phraseCount counts DISTINCT base positions (union slots)") {
    // two terms of one slot can never share a position in a real index,
    // but the union arrays are deduped anyway; verify the kernel counts
    // base positions, not (base, completion) pairs
    val offsets = Array(0, 1)
    val slot0 = Array(0, 5)
    val slot1 = Array(1, 6) // both bases complete
    assert(PhraseMatcher.phraseCount(offsets, Array(slot0, slot1), 0) == 2)
    val slot1b = Array(1) // only base 0 completes
    assert(PhraseMatcher.phraseCount(offsets, Array(slot0, slot1b), 0) == 1)
  }
}
