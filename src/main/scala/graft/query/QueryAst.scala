package graft.query

/** Query ADT — the engine's `Query` tree (reference `src/query/`; the
  * parser in §3.3 compiles user text into this).
  */
sealed trait Occur
object Occur {
  /** `query-grammar/src/occur.rs:10-20` */
  case object Must extends Occur
  case object Should extends Occur
  case object MustNot extends Occur
}

sealed trait Query

/** `src/query/term_query/term_query.rs:60` — BM25-scored single term. */
final case class TermQ(term: String) extends Query

/** `src/query/boolean_query/boolean_query.rs` — Occur algebra; score = sum of
  * matching positive sub-scores (`score_combiner.rs:39`). `minShouldMatch`
  * default 0 = tantivy's default (`boolean_query.rs:180-194`): with Musts
  * present Shoulds are optional; with only Shoulds at least one must match.
  * An EXPLICIT value > 0 is honored even alongside Musts
  * (`boolean_weight.rs:176-204`, the Required + min-match branch).
  */
final case class BoolQ(clauses: Seq[(Occur, Query)], minShouldMatch: Int = 0) extends Query

/** `src/query/phrase_query/phrase_query.rs:23` — all terms at relative
  * positions (offset, term); slop = total budget; the phrase occurrence count
  * is the tf fed to BM25 (`phrase_scorer.rs:82-143`).
  */
final case class PhraseQ(terms: Seq[(Int, String)], slop: Int = 0) extends Query
object PhraseQ {
  def of(words: String*): PhraseQ = PhraseQ(words.zipWithIndex.map { case (w, i) => (i, w) })
}

/** `src/query/phrase_prefix_query/phrase_prefix_query.rs:25` — a phrase whose
  * LAST term is a prefix; the prefix expands to at most `maxExpansions`
  * matching terms from the term dictionary (ascending term order), and the
  * query matches docs where any expansion completes the phrase.
  */
final case class PhrasePrefixQ(terms: Seq[(Int, String)], prefix: (Int, String),
    maxExpansions: Int = 50) extends Query

/** `src/query/range_query/range_query.rs:71-170` — range over a fast-field
  * column of docmap, constant score 1.0. Bounds are inclusive/exclusive.
  */
final case class RangeQ(column: String,
    lower: Option[(Double, Boolean)], upper: Option[(Double, Boolean)]) extends Query

/** `src/query/set_query.rs:13` — docs containing any term of the set, const score. */
final case class TermSetQ(terms: Set[String]) extends Query

/** `src/query/range_query/range_query.rs:71-170` over an INDEXED text
  * field's term space (str fast-field range semantics): docs containing any
  * dictionary term inside the bounds. Evaluated as a distributed termdict
  * filter semi-joined into the postings scan. Bounds are (value, inclusive).
  */
final case class TermRangeQ(
    lower: Option[(String, Boolean)], upper: Option[(String, Boolean)]) extends Query

/** `src/query/range_query/range_query.rs:71-170` over an IpAddr field: the
  * reference compares addresses as u128 bits (`MonotonicallyMappableToU128`,
  * `common/src/lib.rs`), NOT as their RFC 5952 canonical text — "::10" sorts
  * before "::9" as a string but after it numerically, so ip ranges get their
  * own node instead of riding TermRangeQ's string order. Bounds are
  * canonical-IPv6 strings (the parser normalizes through the "ip" chain),
  * compared via `Analysis.ipv6Key`. Const score 1.0.
  */
final case class IpRangeQ(
    lower: Option[(String, Boolean)], upper: Option[(String, Boolean)]) extends Query

/** `src/query/fuzzy_query.rs:80-131` — Levenshtein distance <= d (max 2),
  * optional transposition cost 1, optional prefix mode; const score 1.0.
  */
final case class FuzzyQ(term: String, distance: Int = 1,
    transposition: Boolean = false, prefix: Boolean = false) extends Query

/** `src/query/regex_query.rs:57` — regex over the term dictionary, const score. */
final case class RegexQ(pattern: String) extends Query

/** `src/query/exist_query.rs:36-94` — docs where a docmap column is non-null. */
final case class ExistsQ(column: String) extends Query

/** `src/query/more_like_this/more_like_this.rs:48-66` — select the reference
  * doc's most significant terms by tf-idf, then match docs containing any
  * selected term (the reference builds a boosted-TermQuery disjunction).
  * The FULL parameter surface:
  *  - `minDocFreq` / `maxDocFreq`: keep terms with minDf <= df <= maxDf
  *    (df == 0 always dropped, `more_like_this.rs:323-345`);
  *  - `minTermFreq`: keep terms occurring >= minTf times in the doc;
  *  - `minWordLen` / `maxWordLen`: word-length bounds in UTF-8 BYTES (the
  *    reference's `is_noise_word` measures `String::len`,
  *    `more_like_this.rs:277-296`);
  *  - `stopWords`: exact-match analyzed-term stop list (`:295`);
  *  - `maxQueryTerms`: the reference's bounded heap retains UP TO
  *    `max_query_terms + 1` terms (it pushes while `len <= limit`,
  *    `more_like_this.rs:349-360`) — mirrored here, ties broken by
  *    ascending term for determinism (the reference's HashMap iteration
  *    order leaves equal-score ties unspecified);
  *  - `boostFactor`: each selected term's boost is
  *    `score * boostFactor / bestScore` (`more_like_this.rs:110-121`).
  */
final case class MoreLikeThisQ(segId: Int, docId: Int, minDocFreq: Long = 5,
    minTermFreq: Long = 1, maxQueryTerms: Int = 10,
    maxDocFreq: Option[Long] = None,
    minWordLen: Option[Int] = None, maxWordLen: Option[Int] = None,
    stopWords: Set[String] = Set.empty,
    boostFactor: Float = 1.0f) extends Query

/** `src/query/phrase_query/regex_phrase_query.rs:23` — a phrase whose terms
  * are regexes; each position expands to the matching terms from the term
  * dictionary (ascending term order, capped at `maxExpansions` per position),
  * and a doc matches when some combination completes the phrase. SCORED like
  * the reference (`regex_phrase_weight.rs:107-149`): tf = the slot-union
  * phrase count, and the BM25 weight comes from the raw PATTERN strings'
  * doc freqs (0 unless a pattern is literally a dictionary term).
  */
final case class RegexPhraseQ(terms: Seq[(Int, String)], slop: Int = 0,
    maxExpansions: Int = 1000) extends Query

/** Field scoping (`query_parser.rs:712-740` field-qualified literals +
  * `user_input_ast.rs` set_field): compile the subtree against the named
  * indexed field instead of the searcher's default field. Applies to
  * term/set/phrase/regex/fuzzy leaves; fast-field leaves (Range/Exists)
  * already carry their column name.
  */
final case class FieldQ(field: String, q: Query) extends Query

/** `src/query/all_query.rs:12-38` — every doc, score 1.0. */
case object AllQ extends Query

/** `src/query/empty_query.rs:12` — matches nothing. */
case object EmptyQ extends Query

/** `src/query/boost_query.rs:13` — multiply child scores (weight-level boost,
  * `bm25.rs:80-87`).
  */
final case class BoostQ(q: Query, boost: Float) extends Query

/** `src/query/const_score_query.rs:12-95` — replace child scores with a constant. */
final case class ConstScoreQ(q: Query, score: Float) extends Query

/** `src/query/disjunction_max_query.rs:75` — max(children) + tie * sum(others)
  * (`score_combiner.rs:60-90`).
  */
final case class DisMaxQ(qs: Seq[Query], tieBreaker: Float = 0.0f) extends Query

/** The user-facing query parser: the FULL reference grammar
  * (`query-grammar/src/query_grammar.rs`, strict variant) parsed by
  * `Grammar.parseToAst`, compiled to this ADT with `query_parser.rs`
  * semantics by `Grammar.compile`. Field-qualified literals, AND/OR/NOT,
  * parens, +/- occurs, quoted phrases with `~slop`/`*` prefix, `[a TO b]`
  * ranges, `IN [..]` sets, `^boost`, `/regex/`, `*` and `field:*`.
  */
object QueryParser {
  def parse(input: String, conjunctionByDefault: Boolean = false,
            opts: Grammar.CompileOpts = Grammar.CompileOpts()): Query =
    Grammar.compile(Grammar.parseToAst(input),
      opts.copy(conjunctionByDefault = conjunctionByDefault))

  /** `wildcard_query_to_regex_str` (`regex_phrase_query.rs:30-37`):
    * `AB*CD` -> `AB.*CD`; every other regex metacharacter is escaped
    * (the Rust side calls `regex::escape` then rewrites `\*`).
    */
  def wildcardToRegex(term: String): String = {
    val meta = "\\.+*?()|[]{}^$#&-~"
    val sb = new StringBuilder
    term.foreach { c =>
      if (c == '*') sb.append(".*")
      else if (meta.indexOf(c.toInt) >= 0) sb.append('\\').append(c)
      else sb.append(c)
    }
    sb.toString
  }
}

/** Banded Levenshtein (distance <= 2) with optional Damerau transposition,
  * over Unicode code points — semantics of the reference's Levenshtein
  * automaton (`src/query/fuzzy_query.rs`), evaluated directly per candidate
  * term (the candidate set is the distinct term dictionary, already
  * deduplicated and small relative to the corpus).
  */
object Levenshtein {
  def within(a0: String, b0: String, maxD: Int, transposition: Boolean): Boolean = {
    val a = a0.codePoints().toArray
    val b = b0.codePoints().toArray
    if (math.abs(a.length - b.length) > maxD) return false
    val prev2 = new Array[Int](b.length + 1)
    var prev = Array.tabulate(b.length + 1)(identity)
    var curr = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      var best = curr(0)
      var j = 1
      while (j <= b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        var v = math.min(math.min(prev(j) + 1, curr(j - 1) + 1), prev(j - 1) + cost)
        if (transposition && i > 1 && j > 1 &&
            a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1)) {
          v = math.min(v, prev2(j - 2) + 1)
        }
        curr(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best > maxD) return false // whole band exceeded
      System.arraycopy(prev, 0, prev2, 0, prev.length)
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(b.length) <= maxD
  }
}
