package graft.score

import graft.analysis.FieldNorm

/** BM25 scoring — exact replication of the reference formulas in
  * single-precision float (`/root/reference/src/query/bm25.rs`; Score = f32,
  * `src/lib.rs:309`).
  *
  * Constants K1 = 1.2, B = 0.75 (`bm25.rs:6-7`).
  * idf(n, N) = ln(1 + (N - n + 0.5)/(n + 0.5))   (`bm25.rs:50-54`)
  * weight = idf * (1 + K1)                        (`bm25.rs:153-170`)
  * score  = weight * tf / (tf + K1*(1 - B + B*fieldnorm/avgFieldnorm))
  * with the norm factor precomputed per fieldnorm id (`bm25.rs:56-67,174-188`).
  */
/** Statistics seam mirroring the reference's `Bm25StatisticsProvider`
  * (`src/query/bm25.rs:13-23`: total_num_tokens / total_num_docs /
  * doc_freq): BM25 weights can be built against ANY statistics source —
  * the default is the manifest-backed `Searcher` (which extends this), a
  * custom provider overrides corpus-level stats (e.g. global stats held
  * outside the index, as `bm25.rs:25-48` sums per-segment ones).
  */
trait Bm25StatisticsProvider {
  /** `bm25.rs:15-16` total_num_tokens(field). */
  def totalTokens(field: String): Long
  /** `bm25.rs:18-19` total_num_docs. */
  def docCount(field: String): Long
  /** `bm25.rs:21-22` doc_freq(term); 0 = absent. */
  def docFreq(field: String, term: String): Long
}

object Bm25 {
  final val K1: Float = 1.2f
  final val B: Float = 0.75f

  /** `Bm25Weight::for_one_term` driven by a [[Bm25StatisticsProvider]]
    * (`bm25.rs:96-113` for_one_term's statistics-provider overload).
    */
  def weightForTerm(p: Bm25StatisticsProvider, field: String, term: String): Weight = {
    val n = p.docCount(field)
    forOneTerm(p.docFreq(field, term), n,
      averageFieldnorm(p.totalTokens(field), n))
  }

  /** `bm25.rs:50-54`, computed in f32 exactly as the reference:
    * x = ((N - n) as f32 + 0.5) / (n as f32 + 0.5); ln(1 + x).
    * Rust f32::ln is correctly rounded via the platform libm; Java
    * Math.log(double) rounded back to float agrees on all f32 inputs we test
    * (verified by the idf(1,2) == ln(2) golden vector).
    */
  def idf(docFreq: Long, docCount: Long): Float = {
    require(docCount >= docFreq, s"docCount $docCount >= docFreq $docFreq")
    val x = ((docCount - docFreq).toFloat + 0.5f) / (docFreq.toFloat + 0.5f)
    math.log((1.0f + x).toDouble).toFloat
  }

  /** K1 * (1 - B + B * fieldnorm / avgFieldnorm), in f32 (`bm25.rs:56-59`). */
  def cachedTfComponent(fieldnorm: Long, avgFieldnorm: Float): Float =
    K1 * (1.0f - B + B * fieldnorm.toFloat / avgFieldnorm)

  /** 256-entry norm cache, one per fieldnorm id (`bm25.rs:61-67`). */
  def computeTfCache(avgFieldnorm: Float): Array[Float] =
    Array.tabulate(256)(id => cachedTfComponent(FieldNorm.idToFieldnorm(id), avgFieldnorm))

  /** Mirror of the reference `Bm25Weight` (without Explanation). */
  final case class Weight(weight: Float, cache: Array[Float], avgFieldnorm: Float) {
    /** `bm25.rs:80-87` */
    def boostBy(boost: Float): Weight = copy(weight = weight * boost)
    /** `bm25.rs:174-177` */
    @inline def score(fieldnormId: Int, termFreq: Long): Float =
      weight * tfFactor(fieldnormId, termFreq)
    /** `bm25.rs:184-188` */
    @inline def tfFactor(fieldnormId: Int, termFreq: Long): Float = {
      val tf = termFreq.toFloat
      tf / (tf + cache(fieldnormId & 0xff))
    }
    /** `bm25.rs:179-181` — term-level WAND upper bound. */
    def maxScore: Float = score(255, 2013265944L)
  }

  /** `Bm25Weight::for_one_term` (`bm25.rs:127-141`). */
  def forOneTerm(termDocFreq: Long, totalNumDocs: Long, avgFieldnorm: Float): Weight = {
    val w = idf(termDocFreq, totalNumDocs) * (1.0f + K1)
    Weight(w, computeTfCache(avgFieldnorm), avgFieldnorm)
  }

  /** `Bm25Weight::for_terms` multi-term variant (`bm25.rs:115-123`):
    * idf summed over terms (f32 accumulation in term order), same tf curve.
    */
  def forTerms(docFreqs: Seq[Long], totalNumDocs: Long, avgFieldnorm: Float): Weight = {
    var idfSum = 0.0f
    docFreqs.foreach(df => idfSum += idf(df, totalNumDocs))
    Weight(idfSum * (1.0f + K1), computeTfCache(avgFieldnorm), avgFieldnorm)
  }

  /** avgFieldnorm = totalNumTokens / totalNumDocs as f32 (`bm25.rs:106`). */
  def averageFieldnorm(totalNumTokens: Long, totalNumDocs: Long): Float =
    totalNumTokens.toFloat / totalNumDocs.toFloat

  // ---- float64 twin, used only for the DuckDB-oracle-gated query entries ----
  // (the engine's tantivy-parity path is the f32 one above; the SQL gate
  // compares against DuckDB which computes in double, so those queries run
  // the same formulas in double with a fixed term-order summation)
  object F64 {
    final val K1 = 1.2d
    final val B = 0.75d
    def idf(docFreq: Long, docCount: Long): Double =
      math.log(1.0d + ((docCount - docFreq).toDouble + 0.5d) / (docFreq.toDouble + 0.5d))
    def weight(docFreq: Long, docCount: Long): Double = idf(docFreq, docCount) * (1.0d + K1)
    def norm(fieldnorm: Long, avgFieldnorm: Double): Double =
      K1 * (1.0d - B + B * fieldnorm.toDouble / avgFieldnorm)
  }
}
