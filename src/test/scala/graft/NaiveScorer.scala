package graft

import graft.analysis.{Analysis, FieldNorm}
import graft.score.Bm25
import graft.query._

/** Brute-force oracle (FIXTURES.md §5): an independent, driver-local
  * implementation of the exact reference semantics — tokenize, exact
  * tf/df/quantized norms, BM25 in f32 in the reference operation order, sort
  * by (-score, segId, docId), take k. Every engine path (plain and
  * WAND-pruned, single- and multi-segment) must match it rank- and
  * score-identically.
  */
object NaiveScorer {

  final case class Doc(segId: Int, docId: Int, tokens: IndexedSeq[String]) {
    lazy val tf: Map[String, Int] = tokens.groupBy(identity).map { case (t, xs) => t -> xs.length }
    def tokenCount: Long = tokens.length.toLong
    def normId: Int = FieldNorm.fieldnormToId(tokenCount)
    def positionsOf(term: String): Array[Int] =
      tokens.zipWithIndex.collect { case (t, i) if t == term => i }.toArray
  }

  final class Corpus(val docs: Seq[Doc]) {
    val totalDocs: Long = docs.length.toLong
    val totalTokens: Long = docs.map(_.tokenCount).sum
    val avgFieldnorm: Float = Bm25.averageFieldnorm(totalTokens, totalDocs)
    def df(term: String): Long = docs.count(_.tf.contains(term)).toLong

    def weight(term: String): Bm25.Weight =
      Bm25.forOneTerm(df(term), totalDocs, avgFieldnorm)

    /** score map of a query — None entries for docs that do not match. */
    def scores(q: Query): Map[(Int, Int), Float] = q match {
      case EmptyQ => Map.empty
      case AllQ => docs.map(d => (d.segId, d.docId) -> 1.0f).toMap
      case TermQ(t) =>
        if (df(t) == 0) Map.empty
        else {
          val w = weight(t)
          docs.flatMap { d =>
            d.tf.get(t).map(tf => (d.segId, d.docId) -> w.score(d.normId, tf.toLong))
          }.toMap
        }
      case TermSetQ(ts) =>
        docs.flatMap { d =>
          if (ts.exists(d.tf.contains)) Some((d.segId, d.docId) -> 1.0f) else None
        }.toMap
      case RegexQ(p) =>
        val re = p.r
        docs.flatMap { d =>
          if (d.tf.keys.exists(t => re.pattern.matcher(t).matches()))
            Some((d.segId, d.docId) -> 1.0f) else None
        }.toMap
      case FuzzyQ(term, dist, transpose, prefix) =>
        docs.flatMap { d =>
          val hit = d.tf.keys.exists { c =>
            if (prefix && c.length >= term.length)
              Levenshtein.within(term, c.substring(0, term.length), dist, transpose) ||
                Levenshtein.within(term, c, dist, transpose)
            else Levenshtein.within(term, c, dist, transpose)
          }
          if (hit) Some((d.segId, d.docId) -> 1.0f) else None
        }.toMap
      case BoostQ(sub, b) =>
        // the reference propagates the boost INTO the leaf weight
        // (boost_query.rs:70-71 passes boost*self.boost down to the term
        // weight, which applies `bm25.rs:80-87 boost_by`): a boosted TERM
        // scores (w*boost)*tfFactor — fold for term-leaf chains, and only
        // post-multiply for subqueries without a Bm25 weight to fold into
        def fold(q2: Query, boost: Float): Option[Map[(Int, Int), Float]] = q2 match {
          case TermQ(t) =>
            if (df(t) == 0) Some(Map.empty)
            else {
              val w = weight(t).boostBy(boost)
              Some(docs.flatMap { d => d.tf.get(t).map(tf =>
                (d.segId, d.docId) -> w.score(d.normId, tf.toLong)) }.toMap)
            }
          case BoostQ(s2, b2) => fold(s2, boost * b2)
          case _ => None
        }
        fold(sub, b).getOrElse(scores(sub).map { case (k, v) => k -> v * b })
      case ConstScoreQ(sub, c) => scores(sub).map { case (k, _) => k -> c }
      case DisMaxQ(qs, tie) =>
        val subs = qs.map(scores)
        val keys = subs.flatMap(_.keys).distinct
        keys.map { k =>
          val vals = subs.flatMap(_.get(k))
          var mx = Float.MinValue; var sm = 0.0f
          vals.foreach { v => sm += v; if (v > mx) mx = v }
          k -> (mx + tie * (sm - mx))
        }.toMap
      case PhraseQ(terms, slop) =>
        val dfs = terms.map(_._2).distinct.map(t => t -> df(t)).toMap
        if (dfs.values.exists(_ == 0L)) Map.empty
        else {
          val w = Bm25.forTerms(terms.map(t => dfs(t._2)), totalDocs, avgFieldnorm)
          docs.flatMap { d =>
            if (!terms.forall { case (_, t) => d.tf.contains(t) }) None
            else {
              val pos = terms.map { case (_, t) => d.positionsOf(t) }.toArray
              val c = PhraseMatcher.phraseCount(terms.map(_._1).toArray, pos, slop)
              if (c > 0) Some((d.segId, d.docId) -> w.score(d.normId, c.toLong)) else None
            }
          }.toMap
        }
      case BoolQ(clauses, minShouldMatch) =>
        val positives = clauses.filter(_._1 != Occur.MustNot)
        if (positives.isEmpty) return Map.empty
        val negKeys = clauses.collect { case (Occur.MustNot, sub) => scores(sub).keySet }
          .foldLeft(Set.empty[(Int, Int)])(_ ++ _)
        val numMusts = positives.count(_._1 == Occur.Must)
        val numShoulds = positives.length - numMusts
        val minShould = if (numMusts > 0) minShouldMatch
                        else math.max(minShouldMatch, 1)
        if (minShould > numShoulds) return Map.empty
        val subs = positives.map { case (occ, sub) => (occ, scores(sub)) }
        val keys = subs.flatMap(_._2.keys).distinct
        keys.flatMap { k =>
          if (negKeys.contains(k)) None
          else {
            var mustC = 0; var shouldC = 0; var sc = 0.0f
            subs.foreach { case (occ, m) =>
              m.get(k).foreach { v =>
                if (occ == Occur.Must) mustC += 1 else shouldC += 1
                sc += v
              }
            }
            if (mustC == numMusts && shouldC >= minShould) Some(k -> sc)
            else None
          }
        }.toMap
      case RangeQ(_, _, _) | ExistsQ(_) | IpRangeQ(_, _) =>
        throw new UnsupportedOperationException("naive range/exists needs fast-field values")
    }

    def topDocs(q: Query, k: Int): Seq[Hit] =
      scores(q).toSeq
        .map { case ((s, d), sc) => Hit(s, d, sc) }
        .sortBy(h => (-h.score, h.segId, h.docId))
        .take(k)

    def count(q: Query): Long = scores(q).size.toLong
  }

  def fromContent(rows: Seq[(Int, Int, String)]): Corpus =
    new Corpus(rows.map { case (s, d, c) =>
      Doc(s, d, Analysis.defaultAnalyze(c).map(_.text).toIndexedSeq) })
}
