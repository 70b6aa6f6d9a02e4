package graft.query

import org.apache.spark.sql.functions._
import graft.score.Bm25

/** Block-max WAND top-k executor — the headline custom operator
  * (reference `src/query/boolean_query/block_wand.rs`, implementing the
  * Block-Max WAND algorithm of Ding & Suel, "Faster Top-k Document Retrieval
  * Using Block-Max Indexes", the paper the reference itself cites).
  *
  * Catalyst cannot express threshold-ratcheted block skipping, so this runs
  * inside `flatMapGroups` over segment-grouped posting blocks: one task per
  * segment group, exactly the reference's one-rayon-task-per-segment shape
  * (`searcher.rs:220`) — and the thing that scales linearly with executors.
  * Per-segment top-k fruits are merged on the driver
  * (`top_collector.rs:102-122`).
  *
  * The scan only reads the query terms' blocks (Parquet row-group pruning on
  * the `term` predicate); within a task, whole 128-doc blocks are skipped
  * when their stored (maxNormId, maxTf) upper bound cannot beat the running
  * threshold — strict `>` semantics (`block_wand.rs:206`).
  */
object Wand {

  final val TERMINATED: Int = Int.MaxValue

  /** One posting block held columnar in memory. */
  final case class Block(lastDoc: Int, maxNormId: Int, maxTf: Int,
                         docIds: Array[Int], tfs: Array[Int], normIds: Array[Int])

  /** Decode the stored block-max tf byte (`skip.rs:29-35`): 255 -> u32::MAX. */
  @inline private def decodeMaxTf(code: Int): Long =
    if (code == 255) 0xffffffffL else code.toLong

  /** In-memory term scorer over a segment's block list for one term.
    * Mirrors `TermScorer` + `SkipReader`: a deep cursor (blockIdx, i) for
    * doc()/advance()/seek() and a shallow cursor for seek_block()/
    * block_max_score() (`skip.rs:244-283`).
    */
  final class TermScorer(val weight: Bm25.Weight, blocks: Array[Block]) {
    val maxScore: Float = weight.maxScore // term_scorer.rs:91, bm25.rs:179-181
    private var b = 0 // deep cursor: block index
    private var i = 0 // deep cursor: offset within block
    private var shallow = 0 // shallow cursor for block-max queries

    @inline def doc: Int = if (b >= blocks.length) TERMINATED else blocks(b).docIds(i)

    def advance(): Int = {
      if (b >= blocks.length) return TERMINATED
      i += 1
      if (i >= blocks(b).docIds.length) { b += 1; i = 0 }
      if (b > shallow) shallow = b
      doc
    }

    def seek(target: Int): Int = {
      while (b < blocks.length && blocks(b).lastDoc < target) { b += 1; i = 0 }
      if (b >= blocks.length) { if (shallow < b) shallow = b; return TERMINATED }
      val ids = blocks(b).docIds
      while (ids(i) < target) i += 1 // lastDoc >= target guarantees termination
      if (b > shallow) shallow = b
      ids(i)
    }

    /** Shallow block seek: position the skip cursor on the first block whose
      * lastDoc >= target without touching the deep cursor.
      */
    def seekBlock(target: Int): Unit = {
      while (shallow < blocks.length && blocks(shallow).lastDoc < target) shallow += 1
    }

    def lastDocInBlock: Int =
      if (shallow >= blocks.length) TERMINATED else blocks(shallow).lastDoc

    def blockMaxScore: Float =
      if (shallow >= blocks.length) 0.0f
      else {
        val blk = blocks(shallow)
        weight.score(blk.maxNormId, decodeMaxTf(blk.maxTf))
      }

    @inline def score: Float = {
      val blk = blocks(b)
      weight.score(blk.normIds(i), blk.tfs(i).toLong)
    }
  }

  /** Per-segment top-k accumulator with the reference's threshold semantics:
    * threshold = kth best score once full (Float.MinValue before), WAND
    * accepts strictly greater scores only, docs arrive in ascending docId so
    * threshold-tied earlier (lower) docIds are kept — matching the
    * (score desc, docId asc) tie order of `top_collector.rs:45-61`.
    */
  final class TopK(k: Int, segId: Int) {
    // min-heap: head = lowest score; among ties, the HIGHEST docId (evict it first)
    private val heap = scala.collection.mutable.PriorityQueue.empty[Hit](
      Ordering.by((h: Hit) => (-h.score, h.docId)))
    def threshold: Float = if (heap.size < k) Float.MinValue else heap.head.score
    /** callback(doc, score) -> new threshold (`block_wand.rs:148-212`). */
    def insert(doc: Int, score: Float): Float = {
      if (heap.size < k) heap.enqueue(Hit(segId, doc, score))
      else if (score > heap.head.score) { heap.dequeue(); heap.enqueue(Hit(segId, doc, score)) }
      threshold
    }
    def hits: Array[Hit] = heap.toArray
  }

  /** `find_pivot_doc` (`block_wand.rs:16-43`): scorers sorted by doc; pivot =
    * doc of the first prefix whose cumulative term max_score exceeds (>)
    * the threshold.
    */
  private def findPivot(scorers: collection.IndexedSeq[TermScorer],
                        threshold: Float): Option[(Int, Int, Int)] = {
    var maxScore = 0.0f
    var beforePivotLen = 0
    var pivotDoc = TERMINATED
    var found = false
    // NOTE: the chosen pivot scorer may itself be TERMINATED (doc ==
    // Int.MaxValue) — e.g. after advanceOneScorer exhausted it without
    // removal. The reference breaks unconditionally and maps a TERMINATED
    // pivot to None (`block_wand.rs:23-34`); looping on `pivotDoc ==
    // TERMINATED` instead would spin forever on that scorer.
    while (beforePivotLen < scorers.length && !found) {
      maxScore += scorers(beforePivotLen).maxScore
      if (maxScore > threshold) { pivotDoc = scorers(beforePivotLen).doc; found = true }
      else beforePivotLen += 1
    }
    if (pivotDoc == TERMINATED) return None
    var pivotLen = beforePivotLen + 1
    while (pivotLen < scorers.length && scorers(pivotLen).doc == pivotDoc) pivotLen += 1
    Some((beforePivotLen, pivotLen, pivotDoc))
  }

  private def restoreOrdering(s: scala.collection.mutable.ArrayBuffer[TermScorer], ord: Int): Unit = {
    val doc = s(ord).doc
    var i = ord + 1
    while (i < s.length && s(i).doc < doc) { val t = s(i); s(i) = s(i - 1); s(i - 1) = t; i += 1 }
  }

  /** `block_max_was_too_low_advance_one_scorer` (`block_wand.rs:49-80`). */
  private def advanceOneScorer(s: scala.collection.mutable.ArrayBuffer[TermScorer],
                               pivotLen: Int): Unit = {
    var scorerToSeek = pivotLen - 1
    var globalMax = s(scorerToSeek).maxScore
    var docToSeekAfter = s(scorerToSeek).lastDocInBlock
    var ord = pivotLen - 2
    while (ord >= 0) {
      if (s(ord).lastDocInBlock <= docToSeekAfter) docToSeekAfter = s(ord).lastDocInBlock
      if (s(ord).maxScore > globalMax) { globalMax = s(ord).maxScore; scorerToSeek = ord }
      ord -= 1
    }
    if (docToSeekAfter != TERMINATED) docToSeekAfter += 1
    var j = pivotLen
    while (j < s.length) {
      if (s(j).doc <= docToSeekAfter) docToSeekAfter = s(j).doc
      j += 1
    }
    s(scorerToSeek).seek(docToSeekAfter)
    restoreOrdering(s, scorerToSeek)
  }

  /** `align_scorers` (`block_wand.rs:101-124`). */
  private def alignScorers(s: scala.collection.mutable.ArrayBuffer[TermScorer],
                           pivotDoc: Int, beforePivotLen: Int): Boolean = {
    var i = beforePivotLen - 1
    while (i >= 0) {
      val newDoc = s(i).seek(pivotDoc)
      if (newDoc != pivotDoc) {
        if (newDoc == TERMINATED) {
          s(i) = s(s.length - 1); s.remove(s.length - 1) // swap_remove
          if (i < s.length) restoreOrdering(s, i)
        } else restoreOrdering(s, i)
        return false
      }
      i -= 1
    }
    true
  }

  /** `advance_all_scorers_on_pivot` (`block_wand.rs:129-146`). */
  private def advanceAllOnPivot(s: scala.collection.mutable.ArrayBuffer[TermScorer],
                                pivotLen: Int): Unit = {
    var i = 0
    while (i < pivotLen) { s(i).advance(); i += 1 }
    i = 0
    while (i < s.length) {
      if (s(i).doc == TERMINATED) { s(i) = s(s.length - 1); s.remove(s.length - 1) }
      else i += 1
    }
    s.sortInPlaceBy(_.doc)
    ()
  }

  /** The multi-scorer BMW loop (`block_wand.rs:148-212`). */
  def blockWand(scorersIn: Seq[TermScorer], threshold0: Float,
                callback: (Int, Float) => Float): Unit = {
    val s = scala.collection.mutable.ArrayBuffer.from(scorersIn.sortBy(_.doc))
    var threshold = threshold0
    var continue = true
    while (continue) {
      findPivot(s, threshold) match {
        case None => continue = false
        case Some((beforePivotLen, pivotLen, pivotDoc)) =>
          var blockMaxUpper = 0.0f
          var i = 0
          while (i < pivotLen) {
            s(i).seekBlock(pivotDoc)
            blockMaxUpper += s(i).blockMaxScore
            i += 1
          }
          if (blockMaxUpper <= threshold) {
            advanceOneScorer(s, pivotLen)
          } else if (alignScorers(s, pivotDoc, beforePivotLen)) {
            var score = 0.0f
            var j = 0
            while (j < pivotLen) { score += s(j).score; j += 1 }
            if (score > threshold) threshold = callback(pivotDoc, score)
            advanceAllOnPivot(s, pivotLen)
          }
      }
    }
  }

  /** Single-scorer specialization (`block_wand.rs:222-261`). */
  def blockWandSingle(scorer: TermScorer, threshold0: Float,
                      callback: (Int, Float) => Float): Unit = {
    var threshold = threshold0
    var doc = scorer.doc
    while (true) {
      while (scorer.blockMaxScore < threshold) {
        val last = scorer.lastDocInBlock
        if (last == TERMINATED) return
        doc = last + 1
        scorer.seekBlock(doc)
      }
      doc = scorer.seek(doc)
      if (doc == TERMINATED) return
      var inner = true
      while (inner) {
        val score = scorer.score
        if (score > threshold) threshold = callback(doc, score)
        if (doc == scorer.lastDocInBlock) inner = false
        else {
          doc = scorer.advance()
          if (doc == TERMINATED) return
        }
      }
      doc += 1
      scorer.seekBlock(doc)
    }
  }

  /** Distributed top-k disjunction: one WAND run per segment group, driver
    * merge with (score desc, segId asc, docId asc) (`top_collector.rs:102-122`).
    */
  def topK(searcher: Searcher, terms: Seq[String], k: Int,
           probeCutoff: Long = 20000000L): Array[Hit] = {
    val weights = searcher.weightsFor(terms)
    if (weights.isEmpty || k <= 0) return Array.empty
    val present = terms.distinct.filter(weights.contains).sorted
    topKImpl(searcher, present, weights, k, probeCutoff)
  }

  /** [[topK]] for a WEIGHTED disjunction — each term's clause boost folded
    * into its Bm25 weight (`bm25.rs:80-87 boost_by`), which is how the
    * reference makes `Should(Boost(Term))` trees (MoreLikeThis's shape)
    * WAND-eligible (`boolean_weight.rs:56-76`): a boosted TermScorer is
    * still a TermScorer, its max_score just scales with the boost, so every
    * pruning bound below stays sound.
    */
  def topKWeighted(searcher: Searcher, termBoosts: Seq[(String, Float)], k: Int,
                   probeCutoff: Long = 20000000L): Array[Hit] = {
    val weights = searcher.weightsForBoosted(termBoosts)
    if (weights.isEmpty || k <= 0) return Array.empty
    val present = termBoosts.map(_._1).distinct.filter(weights.contains).sorted
    topKImpl(searcher, present, weights, k, probeCutoff)
  }

  /** [[topKWithCount]] for a weighted disjunction (boosts don't change
    * which docs match, only their scores — the union count is boost-free).
    */
  def topKWithCountWeighted(searcher: Searcher, termBoosts: Seq[(String, Float)],
                            k: Int): (Array[Hit], Long) = {
    val weights = searcher.weightsForBoosted(termBoosts)
    val present = termBoosts.map(_._1).distinct.filter(weights.contains).sorted
    if (present.isEmpty || k <= 0) return (Array.empty, 0L)
    if (present.length == 1) {
      val cnt = searcher.docFreqs(present).getOrElse(present.head, 0L)
      return (topKImpl(searcher, present, weights, k, Long.MaxValue), cnt)
    }
    multiTerm(searcher, present, weights, k, tau = Float.MinValue, withCount = true)
  }

  /** TOP_10_COUNT for a pure disjunction in ONE pass: the count collector
    * must see every match (`multi_collector.rs:166`), so the map-side
    * threshold prefilter stays off, but the union COUNT is computed inside
    * the same per-segment task that runs the BMW loop — a linear merge over
    * the already-assembled sorted docId lists — instead of a second
    * groupBy-shuffle over per-doc rows (measured 300-470 ms -> the cost of
    * the plain TOP_10 disjunction).
    */
  def topKWithCount(searcher: Searcher, terms: Seq[String], k: Int): (Array[Hit], Long) = {
    val weights = searcher.weightsFor(terms)
    val present = terms.distinct.filter(weights.contains).sorted
    if (present.isEmpty || k <= 0) return (Array.empty, 0L)
    if (present.length == 1) {
      // union of one term: count IS its global doc_freq (termdict lookup,
      // no postings touched); hits via the zero-shuffle single-term path
      val cnt = searcher.docFreqs(present).getOrElse(present.head, 0L)
      return (topKImpl(searcher, present, weights, k, Long.MaxValue), cnt)
    }
    multiTerm(searcher, present, weights, k, tau = Float.MinValue, withCount = true)
  }

  /** Count of distinct docIds across sorted lists (union cardinality). */
  def unionCount(lists: Array[Array[Int]]): Long = {
    val n = lists.length
    val idx = new Array[Int](n)
    var cnt = 0L
    var done = false
    while (!done) {
      var min = Int.MaxValue
      var i = 0
      while (i < n) {
        if (idx(i) < lists(i).length && lists(i)(idx(i)) < min) min = lists(i)(idx(i))
        i += 1
      }
      if (min == Int.MaxValue) done = true
      else {
        cnt += 1
        i = 0
        while (i < n) {
          if (idx(i) < lists(i).length && lists(i)(idx(i)) == min) idx(i) += 1
          i += 1
        }
      }
    }
    cnt
  }

  private def topKImpl(searcher: Searcher, present: Seq[String],
                       weights: Map[String, Bm25.Weight], k: Int,
                       probeCutoff: Long): Array[Hit] = {
    val spark = searcher.spark
    import spark.implicits._
    if (present.isEmpty) return Array.empty

    // Single-term specialization with ZERO shuffle: per-doc scoring makes a
    // term's top-k decomposable over ANY partition of its posting list
    // (chunk top-ks ∪-merge to the global top-k), so each scan partition
    // runs `blockWandSingle` over the complete (segId-grouped) block runs it
    // holds and ships only its k best. One stage, pruned scan, driver merge —
    // the scan IS the reference's skip-capable read; no posting bytes cross
    // the network beyond k hits per task.
    if (present.length == 1) {
      val term = present.head
      val w = weights(term)
      val rows = searcher.postings
        .where(col("field") === searcher.field && col("term") === term)
        .select($"segId", $"blockId", $"lastDoc", $"maxNormId", $"maxTf",
          $"docIds", $"tfs", $"normIds")
        .as[(Int, Int, Int, Int, Int, Array[Int], Array[Int], Array[Int])]
      val fruits = rows.mapPartitions { it =>
        val bySeg = scala.collection.mutable.Map.empty[Int,
          scala.collection.mutable.ArrayBuffer[(Int, Block)]]
        it.foreach { case (segId, blockId, lastDoc, mN, mT, ds, tfs, ns) =>
          bySeg.getOrElseUpdate(segId, scala.collection.mutable.ArrayBuffer.empty) +=
            ((blockId, Block(lastDoc, mN, mT, ds, tfs, ns)))
        }
        bySeg.iterator.flatMap { case (segId, blks) =>
          val scorer = new TermScorer(w, blks.sortBy(_._1).map(_._2).toArray)
          val topk = new TopK(k, segId)
          blockWandSingle(scorer, topk.threshold, topk.insert)
          topk.hits.iterator
        }.map(h => (h.segId, h.docId, h.score))
      }.collect()
      return fruits.map { case (s, d, sc) => Hit(s, d, sc) }
        .sortBy(h => (-h.score, h.segId, h.docId)).take(k)
    }

    // For high-df disjunctions, probe an initial threshold before shuffling:
    // τ = nextDown(k-th best score of the highest-max-score term alone, via
    // the zero-shuffle single-term path). A block of term t can only hold a
    // doc scoring > τ if blockMax_t + Σ_{u≠t} termMax_u > τ, so hopeless
    // blocks are dropped MAP-SIDE before the shuffle — the distributed
    // analog of BMW's "skip without decoding". Soundness: every true top-k
    // doc's full score ≥ its single-term scores, so the true k-th best ≥ θ0;
    // nextDown keeps θ0-tied docs eligible, preserving the strict-`>`
    // threshold and (score, docId) tie semantics. The probe costs one extra
    // job, so it only arms above a df cutoff where shuffle volume dominates.
    val dfs = searcher.docFreqs(present)
    var tau = Float.MinValue
    if (dfs.values.sum > probeCutoff) {
      val probeTerm = present.maxBy(t => weights(t).maxScore)
      // recurse with THIS query's weights map (not freshly-derived ones):
      // under a weighted disjunction the probe must rank by the boosted
      // weight, or its k-th score is not a lower bound for the boosted sums
      val probeHits = topKImpl(searcher, Seq(probeTerm), weights, k, probeCutoff)
      if (probeHits.length == k)
        tau = java.lang.Math.nextDown(probeHits.last.score)
    }
    multiTerm(searcher, present, weights, k, tau, withCount = false)._1
  }

  /** DocId-range width of one multi-term task (see [[multiTerm]]): bounds
    * per-task block residency at ~`terms * chunkDocs/128` blocks no matter
    * how large a segment grows, and lets several tasks work one giant
    * segment in parallel. 2^20 docs/chunk keeps every realistic segment in
    * one chunk at test scale while capping the worst case (8-term query,
    * saturated postings) near ~100 MB per task.
    */
  final val DefaultChunkDocs: Int = 1 << 20

  /** The shared multi-term stage: one pruned scan of the query terms'
    * blocks, one narrow shuffle grouped by (segment, docId-range chunk),
    * per-chunk BMW loop (plus the union count when `withCount`), driver
    * merge.
    *
    * Chunking is sound because per-doc scores are computed entirely from
    * that doc's block entries: a doc's postings for every term land in the
    * SAME chunk (chunk = docId / chunkDocs), so each chunk's WAND sees
    * complete scores for its docs, each chunk's top-k contains every doc of
    * that chunk that can reach the global top-k (the same decomposability
    * argument as the per-segment merge, `top_collector.rs:102-122`), and
    * union counts add across disjoint chunks. A block straddling a chunk
    * boundary is SLICED map-side (exact docId/tf/normId subarrays; the
    * parent block-max metadata rides along as a still-valid upper bound).
    */
  private def multiTerm(searcher: Searcher, present: Seq[String],
                        weights: Map[String, Bm25.Weight], k: Int,
                        tau: Float, withCount: Boolean,
                        chunkDocs: Int = DefaultChunkDocs): (Array[Hit], Long) = {
    val spark = searcher.spark
    import spark.implicits._
    val wB = spark.sparkContext.broadcast(weights)
    val sumMax = present.map(weights(_).maxScore).sum
    val tauB = tau
    val cw = chunkDocs

    val rows = searcher.postings
      .where(col("field") === searcher.field && col("term").isin(present: _*))
      .select($"segId", $"term", $"blockId", $"lastDoc",
        $"maxNormId", $"maxTf", $"docIds", $"tfs", $"normIds")
      .as[(Int, String, Int, Int, Int, Int, Array[Int], Array[Int], Array[Int])]
      .filter { r =>
        tauB == Float.MinValue || {
          val w = wB.value(r._2)
          // strictly-conservative upper bound: compute in double and allow
          // 2 ulps of f32 slack — the per-doc score sums this prunes against
          // are f32 in a different association order, and a bound rounding a
          // few ulps low could drop a block holding a doc that ties tau
          val bound = (w.score(r._5, decodeMaxTf(r._6)).toDouble
            + sumMax.toDouble - w.maxScore.toDouble).toFloat
          Math.nextUp(Math.nextUp(bound)) > tauB
        }
      }

    // slice each block into its docId-range chunk(s); the common case
    // (block entirely inside one chunk) passes the arrays through untouched
    val chunked = rows.flatMap { case (segId, term, blockId, lastDoc, mN, mT, ds, tfs, ns) =>
      if (ds.isEmpty) Iterator.empty
      else {
      val lo = ds(0) / cw
      val hi = lastDoc / cw
      if (lo == hi)
        Iterator.single((segId, lo, term, blockId, Block(lastDoc, mN, mT, ds, tfs, ns)))
      else (lo to hi).iterator.flatMap { c =>
        val from = Intersect.lowerBound(ds, c.toLong * cw)
        val until = Intersect.lowerBound(ds, (c + 1).toLong * cw)
        if (from == until) Iterator.empty
        else {
          val d2 = java.util.Arrays.copyOfRange(ds, from, until)
          Iterator.single((segId, c, term, blockId, Block(d2(d2.length - 1), mN, mT,
            d2, java.util.Arrays.copyOfRange(tfs, from, until),
            java.util.Arrays.copyOfRange(ns, from, until))))
        }
      }
      }
    }

    val fruits = chunked.groupByKey(r => (r._1, r._2)).mapGroups { (key, it) =>
      val segId = key._1
      // materialize this chunk's blocks per term, ordered by blockId
      val byTerm = scala.collection.mutable.Map.empty[String,
        scala.collection.mutable.ArrayBuffer[(Int, Block)]]
      it.foreach { case (_, _, term, blockId, blk) =>
        byTerm.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer.empty) +=
          ((blockId, blk))
      }
      val ws = wB.value
      val perTerm = byTerm.toSeq.sortBy(_._1)
        .map { case (term, blks) => (term, blks.sortBy(_._1).map(_._2).toArray) }
      val cnt =
        if (withCount)
          unionCount(perTerm.map(_._2.iterator.flatMap(_.docIds).toArray).toArray)
        else -1L
      val scorers = perTerm.map { case (term, blks) => new TermScorer(ws(term), blks) }
      val topk = new TopK(k, segId)
      // pre-seed the probe threshold; the callback keeps it as a floor while
      // the heap fills (the heap's own threshold is MinValue until k hits)
      val cb: (Int, Float) => Float = (d, s) => math.max(tauB, topk.insert(d, s))
      if (scorers.length == 1)
        blockWandSingle(scorers.head, math.max(tauB, topk.threshold), cb)
      else if (scorers.nonEmpty)
        blockWand(scorers, math.max(tauB, topk.threshold), cb)
      (topk.hits.toSeq.map(h => (h.segId, h.docId, h.score)), cnt)
    }.collect()

    val hits = fruits.flatMap(_._1).map { case (s, d, sc) => Hit(s, d, sc) }
      .sortBy(h => (-h.score, h.segId, h.docId))
      .take(k)
    (hits, if (withCount) fruits.map(_._2).sum else -1L)
  }

  // chunk slicing shares Intersect.lowerBound — one binary search, one
  // slicing semantics for both executors

  /** Test seam: run the multi-term stage at a forced chunk width. */
  private[graft] def multiTermForTest(searcher: Searcher, terms: Seq[String], k: Int,
                                      chunkDocs: Int): (Array[Hit], Long) = {
    val weights = searcher.weightsFor(terms)
    val present = terms.distinct.filter(weights.contains).sorted
    if (present.isEmpty) return (Array.empty, 0L)
    multiTerm(searcher, present, weights, k, tau = Float.MinValue,
      withCount = true, chunkDocs = chunkDocs)
  }
}
