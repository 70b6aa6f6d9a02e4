package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.TimeLimits
import org.scalatest.time.{Seconds, Span}
import graft.query.Wand
import graft.query.Wand.{Block, TermScorer}
import graft.score.Bm25

/** Regression tests for the block-max WAND executor's termination
  * invariants (reference `block_wand.rs`).
  */
class WandSpec extends AnyFunSuite with TimeLimits {

  private def weight(w: Float): Bm25.Weight =
    Bm25.Weight(w, Array.fill(256)(1.0f), 1.0f)

  test("blockWand terminates when the pivot scorer is TERMINATED") {
    // Regression: a scorer exhausted by advanceOneScorer stays in the list
    // with doc == TERMINATED. findPivot must return None when the pivot
    // lands on it (block_wand.rs:23-34), not spin. Before the fix this
    // looped forever (observed live on the sf0.001 corpus).
    val live = new TermScorer(weight(0.5f),
      Array(Block(5, 0, 1, Array(1, 5), Array(1, 1), Array(0, 0))))
    val dead = new TermScorer(weight(0.5f),
      Array(Block(3, 0, 1, Array(3), Array(1), Array(0))))
    dead.seek(100)
    assert(dead.doc == Wand.TERMINATED)
    // threshold between live.maxScore and live.maxScore + dead.maxScore
    val th = live.maxScore + dead.maxScore * 0.5f
    var calls = 0
    failAfter(Span(10, Seconds)) {
      Wand.blockWand(Seq(live, dead), th, (_, s) => { calls += 1; s })
    }
    assert(calls == 0) // nothing can beat the threshold
  }

  test("blockWandSingle terminates on exhausted scorer") {
    val s = new TermScorer(weight(1.0f),
      Array(Block(2, 0, 1, Array(0, 2), Array(1, 1), Array(0, 0))))
    var seen = List.empty[Int]
    failAfter(Span(10, Seconds)) {
      Wand.blockWandSingle(s, Float.MinValue, (d, sc) => { seen ::= d; sc - 1e-3f })
    }
    assert(seen.reverse == List(0, 2))
  }
}
