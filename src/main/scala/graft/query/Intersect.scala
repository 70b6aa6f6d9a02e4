package graft.query

import org.apache.spark.sql.functions._
import graft.score.Bm25

/** Per-segment leapfrog intersection executor — the reference's cost-ordered
  * `Intersection` scorer (`src/query/intersection.rs:15-120`: docsets sorted
  * by cost, smallest drives, others gallop to the candidate) and its
  * positions-aware phrase variant (`phrase_scorer.rs:46-420`), run the same
  * way the WAND executor runs: ONE narrow shuffle of the query terms' packed
  * posting blocks grouped by segment, a local in-memory leapfrog per segment
  * task, per-segment (top-k, count) fruits, driver merge
  * (`top_collector.rs:102-122`).
  *
  * This is the fast collector path for pure conjunctions (`+a +b`) and
  * phrases; the Dataset join pipeline in Searcher remains the composable
  * path (arbitrary bool trees, doc-set materialization). Chained equi-joins
  * pay a shuffle barrier per join; at interactive latency the single
  * groupByKey-by-segment shuffle is the difference between ~300 ms and
  * multi-second queries, and at cluster scale it is one stage regardless of
  * clause count.
  */
object Intersect {

  /** One term's postings within one segment, blocks concatenated in docId
    * order. `positions` is empty when not requested.
    */
  final class TermPostings(val docIds: Array[Int], val tfs: Array[Int],
                           val normIds: Array[Int], val positions: Array[Array[Int]])

  /** Leapfrog over per-term sorted docId arrays (rarest first = index 0);
    * invokes `onMatch(docId, idxPerTerm)` for every doc present in all lists.
    * Pointers only move forward; seeks gallop via ranged binary search —
    * the `intersection.rs:66-101` loop without the block machinery (blocks
    * are already concatenated here; Parquet row-group pruning replaced the
    * skip lists on the way in).
    */
  def leapfrog(lists: Array[TermPostings])(onMatch: (Int, Array[Int]) => Unit): Unit = {
    val n = lists.length
    if (n == 0 || lists.exists(_.docIds.length == 0)) return
    val idx = new Array[Int](n)
    val lead = lists(0).docIds
    var i0 = 0
    while (i0 < lead.length) {
      val d = lead(i0)
      var ok = true
      var j = 1
      while (ok && j < n) {
        val arr = lists(j).docIds
        var p = java.util.Arrays.binarySearch(arr, idx(j), arr.length, d)
        if (p >= 0) idx(j) = p
        else {
          p = -p - 1
          idx(j) = p
          if (p >= arr.length) return // some list exhausted: no more matches
          ok = false
        }
        j += 1
      }
      if (ok) { idx(0) = i0; onMatch(d, idx) }
      i0 += 1
    }
  }

  private def collectSegments(searcher: Searcher, distinctTerms: Seq[String],
                              needPositions: Boolean) = {
    val spark = searcher.spark
    import spark.implicits._
    val base = searcher.postings
      .where($"field" === searcher.field && $"term".isin(distinctTerms: _*))
    val withPos =
      if (needPositions) base
      else base.withColumn("positions", typedLit(Array.empty[Array[Int]]))
    withPos
      .select($"segId", $"term", $"blockId", $"docIds", $"tfs", $"normIds", $"positions")
      .as[(Int, String, Int, Array[Int], Array[Int], Array[Int], Array[Array[Int]])]
  }

  /** Assemble each term's blocks (sorted by blockId) into one TermPostings. */
  private def assemble(
      it: Iterator[(Int, String, Int, Array[Int], Array[Int], Array[Int], Array[Array[Int]])],
      needPositions: Boolean): Map[String, TermPostings] = {
    val byTerm = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[(Int, Array[Int], Array[Int], Array[Int], Array[Array[Int]])]]
    it.foreach { case (_, term, blockId, ds, tfs, ns, ps) =>
      byTerm.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer.empty) +=
        ((blockId, ds, tfs, ns, ps))
    }
    byTerm.map { case (term, blks) =>
      val sorted = blks.sortBy(_._1)
      term -> new TermPostings(
        sorted.iterator.flatMap(_._2).toArray,
        sorted.iterator.flatMap(_._3).toArray,
        sorted.iterator.flatMap(_._4).toArray,
        if (needPositions) sorted.iterator.flatMap(_._5).toArray
        else Array.empty[Array[Int]])
    }.toMap
  }

  /** Scored conjunction of terms: top-k + total count in one pass.
    * Score = sum of per-clause BM25 term scores in clause order
    * (`SumCombiner`, `score_combiner.rs:39`), f32.
    */
  def topKMust(searcher: Searcher, clauseTerms: Seq[String], k: Int): (Array[Hit], Long) = {
    val spark = searcher.spark
    import spark.implicits._
    val distinct = clauseTerms.distinct
    val dfs = searcher.docFreqs(distinct) // one metadata job for dfs AND weights
    val weights = searcher.weightsFromDfs(dfs)
    if (distinct.exists(t => !weights.contains(t))) return (Array.empty, 0L)
    val ordered = distinct.sortBy(t => (dfs(t), t))
    // clause c reads tf/weight of its term, via the ordered index
    val ordIdx = ordered.zipWithIndex.toMap
    val clauseIdx = clauseTerms.map(ordIdx).toArray
    val wB = spark.sparkContext.broadcast(ordered.map(weights).toArray)
    val orderedB = spark.sparkContext.broadcast(ordered.toArray)

    val fruits = collectSegments(searcher, distinct, needPositions = false)
      .groupByKey(_._1).mapGroups { (segId, it) =>
        val byTerm = assemble(it, needPositions = false)
        val ws = wB.value
        val lists = orderedB.value.map(t =>
          byTerm.getOrElse(t, new TermPostings(Array.empty, Array.empty, Array.empty, Array.empty)))
        val topk = new Wand.TopK(k, segId)
        var cnt = 0L
        leapfrog(lists) { (doc, idx) =>
          val normId = lists(0).normIds(idx(0))
          var score = 0.0f
          var c = 0
          while (c < clauseIdx.length) {
            val ti = clauseIdx(c)
            score += ws(ti).score(normId, lists(ti).tfs(idx(ti)).toLong)
            c += 1
          }
          cnt += 1
          topk.insert(doc, score)
          ()
        }
        (topk.hits.toSeq.map(h => (h.segId, h.docId, h.score)), cnt)
      }.collect()

    merge(fruits, k)
  }

  /** Phrase top-k + count in one pass: leapfrog intersection, then the
    * positions check; phrase occurrence count is the tf fed to the summed-idf
    * multi-term weight (`bm25.rs:115-123`, `phrase_scorer.rs:82-143`).
    */
  def topKPhrase(searcher: Searcher, p: PhraseQ, k: Int): (Array[Hit], Long) = {
    require(searcher.indexMeta.forall(_.withPositions),
      s"phrase query needs positions, but the index at ${searcher.indexDir} was built with withPositions=false")
    val spark = searcher.spark
    import spark.implicits._
    val terms = p.terms.map(_._2)
    val distinct = terms.distinct
    val dfs = searcher.docFreqs(distinct)
    if (distinct.exists(t => !dfs.contains(t))) return (Array.empty, 0L)
    val weight = Bm25.forTerms(terms.map(dfs), searcher.totalNumDocs, searcher.avgFieldnorm)
    val ordered = distinct.sortBy(t => (dfs(t), t))
    val ordIdx = ordered.zipWithIndex.toMap
    val slotIdx = p.terms.map { case (_, t) => ordIdx(t) }.toArray
    val offsets = p.terms.map(_._1).toArray
    val slop = p.slop
    val orderedB = spark.sparkContext.broadcast(ordered.toArray)
    val weightB = spark.sparkContext.broadcast(weight)

    val fruits = collectSegments(searcher, distinct, needPositions = true)
      .groupByKey(_._1).mapGroups { (segId, it) =>
        val byTerm = assemble(it, needPositions = true)
        val lists = orderedB.value.map(t =>
          byTerm.getOrElse(t, new TermPostings(Array.empty, Array.empty, Array.empty, Array.empty)))
        val w = weightB.value
        val topk = new Wand.TopK(k, segId)
        var cnt = 0L
        val slots = new Array[Array[Int]](slotIdx.length)
        leapfrog(lists) { (doc, idx) =>
          var s = 0
          while (s < slotIdx.length) {
            slots(s) = lists(slotIdx(s)).positions(idx(slotIdx(s)))
            s += 1
          }
          val c = PhraseMatcher.phraseCount(offsets, slots, slop)
          if (c > 0) {
            cnt += 1
            topk.insert(doc, w.score(lists(0).normIds(idx(0)), c.toLong))
            ()
          }
        }
        (topk.hits.toSeq.map(h => (h.segId, h.docId, h.score)), cnt)
      }.collect()

    merge(fruits, k)
  }

  private def merge(fruits: Array[(Seq[(Int, Int, Float)], Long)], k: Int): (Array[Hit], Long) = {
    val hits = fruits.flatMap(_._1)
      .map { case (s, d, sc) => Hit(s, d, sc) }
      .sortBy(h => (-h.score, h.segId, h.docId))
      .take(k)
    (hits, fruits.map(_._2).sum)
  }
}
