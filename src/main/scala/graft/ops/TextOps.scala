package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, document fingerprinting
  * (rolling hash + winnowing).
  *
  * Design rules, enforced throughout this package:
  *  - Everything is a narrow `DataFrame => DataFrame` transformation built
  *    from codegen'd `org.apache.spark.sql.functions` (no Scala UDFs on the
  *    hot path) so whole-stage codegen spans the full pipeline and each
  *    operator is embarrassingly parallel (map-side only, no shuffle unless
  *    the semantics require one).
  *  - All hash arithmetic is plain 64-bit integer math mod a 31-bit prime,
  *    chosen so (a) intermediate products never overflow a BIGINT and (b)
  *    the exact computation is replayable in any ANSI SQL engine — the
  *    DuckDB oracle in SparkEntry runs the identical formulas.
  *  - Scale: at 100 TB these operators read/write columnar batches with
  *    zero driver-side state; nothing here collects to the driver.
  */
object TextOps {

  /** 2^31 - 1 (Mersenne prime). a < P, b < P ==> a*31 + b < 2^36 << 2^63. */
  val P: Long = 2147483647L

  /** Whitespace tokens of a single-space-normalized text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Polynomial char hash mod P, fold-left over the code points:
    * h_0 = 0; h_i = (h_{i-1} * 31 + ord(c_i)) mod P.
    * Pure `aggregate` expression — stays inside codegen. The `filter`
    * drops the trailing empty string Java's split-by-empty-regex emits.
    */
  def charHash(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => c =!= ""),
      lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % P)

  // ---------------------------------------------------------------- language ID

  /** Word-profile language/domain classifier (the n-gram-profile language-ID
    * heuristic of Cavnar & Trenkle reduced to unigram profiles — the corpus
    * vocabulary is single-space word soup, so word unigrams ARE its n-grams).
    * Score per class = number of tokens in the class profile; predicted
    * class = argmax, ties broken by ascending class name.
    * Map-side only: one pass over tokens per row, no shuffle.
    */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "code"   -> Seq("join", "merge", "sort", "hash", "scan"),
    "db"     -> Seq("table", "row", "column", "query", "key"),
    "en"     -> Seq("the", "a", "fast", "slow", "big"),
    "stream" -> Seq("stream", "batch", "window", "value", "vector"))

  /** (docId, <one count column per class>, pred). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withCounts = profiles.foldLeft(df) { case (acc, (name, words)) =>
      acc.withColumn(s"c_$name",
        size(filter(tokens(col(textCol)), t => t.isin(words: _*))).cast("long"))
    }
    // argmax with ties to the alphabetically-first class (profiles are sorted)
    val names = profiles.map(_._1)
    val pred = names.zipWithIndex.foldRight(lit(names.last)) { case ((name, _), els) =>
      val isMax = names.filter(_ != name)
        .map(o => col(s"c_$name") >= col(s"c_$o"))
        .reduce(_ && _)
      when(isMax, lit(name)).otherwise(els)
    }
    withCounts.withColumn("pred_lang", pred)
      .select(col(idCol).cast("long").as("doc_id"),
        col("c_code"), col("c_db"), col("c_en"), col("c_stream"), col("pred_lang"))
  }

  // ------------------------------------------- language ID, fitted profiles

  /** Top trigrams kept per language profile (Cavnar & Trenkle keep 300; the
    * synthetic corpus' trigram space is small, 40 suffices).
    */
  val TriK = 40

  /** Character trigrams (all positions, spaces included — C&T profile
    * n-grams). Empty array below 3 chars.
    */
  def charTrigrams(text: Column): Column =
    when(length(text) < 3, array())
      .otherwise(transform(sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3))))

  /** FIT: per-language trigram profiles from a labeled corpus — the
    * Cavnar & Trenkle rank profile as a distributed aggregate. One narrow
    * groupBy((lang, tri)) shuffle; the result is langs x k rows (tiny at
    * any corpus scale — this is the "model").
    * Rank ties break by ascending trigram so the fit is deterministic.
    */
  def langProfiles(df: DataFrame, langCol: String, textCol: String,
                   k: Int = TriK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(langCol).as("lang"), explode(charTrigrams(col(textCol))).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(desc("cnt"), asc("tri"))))
      .where(col("rank") <= k)
      .select("lang", "tri", "rank")
  }

  /** PREDICT: score(doc, lang) = sum over the doc's DISTINCT trigrams found
    * in the lang's profile of (k + 1 - rank); predicted language = argmax,
    * ties by ascending language. The profile table is broadcast, so
    * prediction is a map-side join + one (doc_id, lang) partial aggregate —
    * embarrassingly parallel at 100 TB.
    */
  def langIdFitted(df: DataFrame, idCol: String, textCol: String,
                   profiles: DataFrame, k: Int = TriK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docTris = df.select(col(idCol).cast("long").as("doc_id"),
      explode(array_distinct(charTrigrams(col(textCol)))).as("tri"))
    val scores = docTris.join(broadcast(profiles), Seq("tri"))
      .groupBy("doc_id", "lang")
      .agg(sum(lit(k + 1) - col("rank")).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("lang"))
    scores.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("score"))
  }

  // ---------------------------------------------------------------- quality

  /** Document quality signals (length, stopword ratio, type/token ratio,
    * mean word length) + a composite score. All ratios have denominators
    * <= the per-doc token count, and every metric is a deterministic
    * function of exact integer counts, so the SQL oracle reproduces them
    * bit-for-bit before the final 6-decimal rounding.
    */
  val stopWords: Seq[String] = Seq("the", "a")

  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.select(
        col(idCol).cast("long").as("doc_id"),
        size(t).cast("long").as("n_tokens"),
        length(col(textCol)).cast("long").as("n_chars"),
        size(filter(t, x => x.isin(stopWords: _*))).cast("long").as("n_stop"),
        size(array_distinct(t)).cast("long").as("n_distinct"))
      .withColumn("mean_wlen",
        round((col("n_chars") - (col("n_tokens") - 1)) * 1.0 / col("n_tokens"), 6))
      .withColumn("stop_ratio", round(col("n_stop") * 1.0 / col("n_tokens"), 6))
      .withColumn("ttr", round(col("n_distinct") * 1.0 / col("n_tokens"), 6))
      .withColumn("quality",
        round(col("n_distinct") * 0.5 / col("n_tokens")
          + (lit(1.0) - col("n_stop") * 1.0 / col("n_tokens")) * 0.3
          + least(col("n_tokens"), lit(100)) * 0.2 / 100, 6))
  }

  // ---------------------------------------------------------------- token counting

  /** Whitespace token count + a BPE-ish regex token count (letter runs,
    * digit runs, and any other non-space byte each count as one token —
    * the classic pre-tokenizer split of byte-pair-encoding vocabularies).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+"), lit(0)))
        .cast("long").as("re_tokens"))

  // ---------------------------------------------------------------- fingerprinting

  /** Whole-document rolling hash (polynomial over all characters mod P).
    * Exact-duplicate fingerprint: equal texts <=> equal hashes (mod
    * collisions at 2^-31, acceptable for blocking; the dedup operators
    * re-verify candidates exactly).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      charHash(col(textCol)).as("fp"))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash every
    * k-char gram, slide a w-gram window, keep each window's minimum hash,
    * emit the distinct minima per document. Guarantees any shared substring
    * of length >= k + w - 1 yields a shared fingerprint.
    *
    * Spark shape: explode gram positions (map-side), window-min via a
    * partitionBy(doc) running frame, then distinct — the only shuffle is the
    * per-document window/distinct, which partitions by doc_id and therefore
    * scales linearly with documents (no global hot keys).
    */
  def winnow(df: DataFrame, idCol: String, textCol: String,
             k: Int = 8, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .where(length(col("__text")) >= k)
      .select(col("doc_id"), col("__text"),
        explode(sequence(lit(1), length(col("__text")) - (k - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        charHash(expr(s"substring(__text, i, $k)")).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    grams.select(col("doc_id"), min("h").over(win).as("fp"))
      .distinct()
  }

  /** Deterministic hash sampling: keep a row iff
    * `(doc_id * 2654435761) % P < fraction * P` — a pure map-side filter
    * that is REPRODUCIBLE (same input -> same sample, resumable pipelines
    * re-derive identical splits; Spark's `sample`/`sampleBy` RNG state is
    * neither) and replayable by any engine, so the sample itself is
    * oracle-checkable. The Knuth multiplicative hash spreads sequential
    * ids uniformly over [0, P). (Valid for ids < 2^63/2654435761 ≈ 3.4e9
    * — beyond that the int64 product overflows: Spark wraps negative so
    * the `% P < k` test degenerates, while DuckDB raises an overflow
    * error, and the two sides diverge; a 10^12-row pipeline keys the same
    * condition on `xxhash64(id) & Long.MaxValue` instead.)
    */
  def hashSampleCond(idCol: Column, fraction: Double): Column =
    (idCol.cast("long") * lit(2654435761L)) % lit(P) < lit((fraction * P).toLong)

  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(hashSampleCond(col(idCol), fraction))

  /** Stratified deterministic sampling: per-stratum fractions (e.g.
    * downsample dominant languages, keep all of rare ones) — the
    * language-balancing step of a training-data pipeline. Strata absent
    * from the map keep `defaultFraction`.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 1.0): DataFrame = {
    val fracCol = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (k, f)) => when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.where((col(idCol).cast("long") * lit(2654435761L)) % lit(P) <
      (fracCol * P).cast("long"))
  }
}
