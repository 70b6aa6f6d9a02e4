package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.FieldNorm
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._
import graft.score.Bm25

/** Reference-scored PhrasePrefixQuery / RegexPhraseQuery semantics
  * (`phrase_prefix_scorer.rs:84-93`, `regex_phrase_weight.rs`):
  *  - phrase-prefix with >= 2 fixed terms scores BM25 with tf = the FIXED
  *    phrase count, weight from the fixed terms' dfs; the prefix expansion
  *    only gates matching;
  *  - phrase-prefix with 1 fixed term is const-score 1.0 (SinglePrefix);
  *  - regex phrase scores tf = slot-union phrase count with weight from
  *    the raw pattern strings' dfs (0 unless a pattern IS a term).
  */
class ScoredSlotPhraseSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (path, content); single segment so DocAddress is just docId order
  private val docs = Seq(
    ("0", "a b c a b d"), // fixed "a b" x2, prefix c extends at base 0
    ("1", "a b d"),       // fixed "a b" but no c* at slot 2
    ("2", "a b cat x"),   // "cat" extends the c-prefix; fixed count 1
    ("3", "b c a"),       // no "a b"
    ("4", "a c b x y z"))

  private lazy val sr: Searcher = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scored-slot").toString
    val df = docs.map { case (p, c) => ("r", p, "c0", "x", c) }
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, df, dir, IndexConfig(numSegments = 1))
    new Searcher(spark, dir)
  }

  private def byPath(q: Query): Map[String, Float] =
    sr.compile(q)
      .join(sr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path", $"score").as[(String, Float)].collect().toMap

  private def normId(dl: Int): Int = FieldNorm.fieldnormToId(dl.toLong)

  test("phrase-prefix with 2 fixed terms: BM25 of the fixed phrase, prefix-gated") {
    val got = byPath(PhrasePrefixQ(Seq(0 -> "a", 1 -> "b"), prefix = (2, "c")))
    // docs 0 and 2 match (prefix-extended); 1 has the phrase but no c*
    assert(got.keySet == Set("0", "2"))
    val dfs = sr.docFreqs(Seq("a", "b"))
    val w = Bm25.forTerms(Seq(dfs("a"), dfs("b")), sr.totalNumDocs, sr.avgFieldnorm)
    assert(got("0") == w.score(normId(6), 2L)) // "a b" occurs twice in doc 0
    assert(got("2") == w.score(normId(4), 1L))
  }

  test("phrase-prefix with 1 fixed term stays const-score 1.0 (SinglePrefix)") {
    val got = byPath(PhrasePrefixQ(Seq(0 -> "b"), prefix = (1, "c")))
    // "b c*": doc 0 ("b c" at 1,2), doc 2 ("b cat" — the cat expansion),
    // doc 3 ("b c" at 0,1); doc 4's "c b" is reversed
    assert(got.keySet == Set("0", "2", "3"))
    assert(got.values.toSet == Set(1.0f))
  }

  test("regex phrase: tf = union phrase count, weight from pattern-string dfs") {
    // slot 0 pattern "a" IS a dictionary term -> df("a"); slot 1 "b.*" is
    // not a term -> df 0 (idf(0, N))
    val got = byPath(RegexPhraseQ(Seq(0 -> "a", 1 -> "b.*")))
    // matches where some token 'a' is followed by a token matching b.*:
    // doc 0 ("a b" twice), doc 1 ("a b"), doc 2 ("a b")
    assert(got.keySet == Set("0", "1", "2"))
    val dfs = sr.docFreqs(Seq("a"))
    val w = Bm25.forTerms(Seq(dfs("a"), 0L), sr.totalNumDocs, sr.avgFieldnorm)
    assert(got("0") == w.score(normId(6), 2L))
    assert(got("1") == w.score(normId(3), 1L))
    assert(got("2") == w.score(normId(4), 1L))
  }

  // --- reference golden vectors (phrase_prefix_weight.rs:169-260 tests) ---
  // Note the reference quirk: PhrasePrefixScorer::phrase_count() (used only
  // by explain) counts prefix-EXTENDED occurrences, while score() delegates
  // to the wrapped PhraseScorer whose tf is the FIXED-phrase count
  // (phrase_prefix_scorer.rs:211-214 "TODO modify score??"). We replicate
  // score()'s semantics; the vectors below pin doc sets + fixed counts.
  private lazy val refSr: Searcher = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppref").toString
    val texts = Seq(
      ("0", "aa bb dd cc"),
      ("1", "aa aa bb c dd aa bb cc aa bb dc"),
      ("2", "aa bb cd")) // the reference's leading space tokenizes away
    val df = texts.map { case (p, c) => ("r", p, "c0", "x", c) }
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, df, dir, IndexConfig(numSegments = 1))
    new Searcher(spark, dir)
  }

  private def refByPath(q: Query): Map[String, Float] =
    refSr.compile(q)
      .join(refSr.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path", $"score").as[(String, Float)].collect().toMap

  test("test_phrase_count_long (phrase_prefix_weight.rs:169-199): docs 1,2 " +
      "match 'aa bb c*'; score tf = the FIXED count (3 and 1)") {
    val got = refByPath(PhrasePrefixQ(Seq(0 -> "aa", 1 -> "bb"), prefix = (2, "c")))
    assert(got.keySet == Set("1", "2"))
    val dfs = refSr.docFreqs(Seq("aa", "bb"))
    val w = Bm25.forTerms(Seq(dfs("aa"), dfs("bb")), refSr.totalNumDocs, refSr.avgFieldnorm)
    // doc 1 "aa aa bb c dd aa bb cc aa bb dc": fixed "aa bb" at bases 1,5,8
    // (count 3; only 2 extend with c*, which gates but does not score)
    assert(got("1") == w.score(normId(11), 3L))
    assert(got("2") == w.score(normId(3), 1L))
  }

  test("test_phrase_count_mid (:202-228): single fixed term 'aa b*' is the " +
      "SinglePrefix shape — const 1.0, docs 1,2") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppref-mid").toString
    val df = Seq(("0", "aa dd cc"), ("1", "aa aa bb c dd aa bb cc aa dc"), ("2", "aa bb cd"))
      .map { case (p, c) => ("r", p, "c0", "x", c) }
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, df, dir, IndexConfig(numSegments = 1))
    val sr2 = new Searcher(spark, dir)
    val got = sr2.compile(PhrasePrefixQ(Seq(0 -> "aa"), prefix = (1, "b")))
      .join(sr2.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path", $"score").as[(String, Float)].collect().toMap
    assert(got == Map("1" -> 1.0f, "2" -> 1.0f))
  }

  test("test_phrase_no_match (:252-...): 'aa cc d*' matches nothing") {
    val got = refByPath(PhrasePrefixQ(Seq(0 -> "aa", 1 -> "cc"), prefix = (2, "d")))
    assert(got.isEmpty)
  }

  // --- reference golden vectors (regex_phrase_weight.rs:355-420 tests) ---
  private def buildTmp(texts: Seq[String]): Searcher = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rp").toString
    val df = texts.zipWithIndex.map { case (c, i) => ("r", i.toString, "c0", "x", c) }
      .toDF("repo", "path", "commit", "lang", "content")
    IndexBuilder.build(spark, df, dir, IndexConfig(numSegments = 1))
    new Searcher(spark, dir)
  }

  private def rpByPath(sr2: Searcher, q: Query): Map[String, Float] =
    sr2.compile(q)
      .join(sr2.docmap.select($"segId", $"docId", $"path"), Seq("segId", "docId"))
      .select($"path", $"score").as[(String, Float)].collect().toMap

  test("regex-phrase test_phrase_count (regex_phrase_weight.rs:355-381)") {
    val sr2 = buildTmp(Seq("a c", "a a b d a b c", "a b"))
    val got = rpByPath(sr2, RegexPhraseQ(Seq(0 -> "a", 1 -> "b")))
    assert(got.keySet == Set("1", "2"))
    // both patterns ARE dictionary terms here -> real dfs feed the weight
    val dfs = sr2.docFreqs(Seq("a", "b"))
    val w = Bm25.forTerms(Seq(dfs("a"), dfs("b")), sr2.totalNumDocs, sr2.avgFieldnorm)
    assert(got("1") == w.score(normId(7), 2L)) // counts from the reference test
    assert(got("2") == w.score(normId(2), 1L))
  }

  test("regex-phrase test_phrase_wildcard (:383-410): a.* expands, bac stays out") {
    val sr2 = buildTmp(Seq("a c", "a aa b d ad b c", "ac b", "bac b"))
    val got = rpByPath(sr2, RegexPhraseQ(Seq(0 -> "a.*", 1 -> "b")))
    assert(got.keySet == Set("1", "2"))
    // pattern "a.*" is NOT a term (df 0); "b" is (df 3)
    val dfs = sr2.docFreqs(Seq("b"))
    val w = Bm25.forTerms(Seq(0L, dfs("b")), sr2.totalNumDocs, sr2.avgFieldnorm)
    assert(got("1") == w.score(normId(7), 2L))
    assert(got("2") == w.score(normId(2), 1L))
  }

  test("regex-phrase test_phrase_regex (:412-...): b?a.* matches ba and bac") {
    val sr2 = buildTmp(Seq("ba b", "a aa b d ad b c", "bac b"))
    val got = rpByPath(sr2, RegexPhraseQ(Seq(0 -> "b?a.*", 1 -> "b")))
    assert(got.keySet == Set("0", "1", "2"))
    val dfs = sr2.docFreqs(Seq("b"))
    val w = Bm25.forTerms(Seq(0L, dfs("b")), sr2.totalNumDocs, sr2.avgFieldnorm)
    assert(got("0") == w.score(normId(2), 1L))
    assert(got("1") == w.score(normId(7), 2L))
    assert(got("2") == w.score(normId(2), 1L))
  }

  test("wildcardToRegex matches the reference helper (regex_phrase_query.rs:30-37)") {
    assert(QueryParser.wildcardToRegex("AB*CD") == "AB.*CD")
    assert(QueryParser.wildcardToRegex("a.b*") == "a\\.b.*")
    assert(QueryParser.wildcardToRegex("x+y?") == "x\\+y\\?")
    // and it composes with RegexPhraseQ like the reference's usage
    val sr2 = buildTmp(Seq("a c", "a aa b d ad b c", "ac b", "bac b"))
    val viaWildcard = rpByPath(sr2, RegexPhraseQ(Seq(
      0 -> QueryParser.wildcardToRegex("a*"), 1 -> QueryParser.wildcardToRegex("b"))))
    val viaRegex = rpByPath(sr2, RegexPhraseQ(Seq(0 -> "a.*", 1 -> "b")))
    assert(viaWildcard == viaRegex)
  }

  test("f64 twins agree with the f32 path on doc sets and ~1e-6 on scores") {
    val f32pp = byPath(PhrasePrefixQ(Seq(0 -> "a", 1 -> "b"), prefix = (2, "c")))
    val f64pp = Engine.phrasePrefixScoredF64(sr, Seq(0 -> "a", 1 -> "b"), (2, "c"))
      .as[(Long, Double)].collect().toMap
    assert(f64pp.keySet.map(_.toString) == f32pp.keySet)
    // the f64 twin uses EXACT dl (not the quantized fieldnorm): same value
    // here because dl <= 23 quantizes losslessly... dl 6/4 exact, so only
    // f32-vs-f64 rounding differs
    f64pp.foreach { case (id, s64) =>
      assert(math.abs(s64 - f32pp(id.toString)) < 1e-5, s"doc $id: $s64 vs ${f32pp(id.toString)}")
    }
    val f32rp = byPath(RegexPhraseQ(Seq(0 -> "a", 1 -> "b.*")))
    val f64rp = Engine.regexPhraseScoredF64(sr, Seq(0 -> "a", 1 -> "b.*"))
      .as[(Long, Double)].collect().toMap
    assert(f64rp.keySet.map(_.toString) == f32rp.keySet)
    f64rp.foreach { case (id, s64) =>
      assert(math.abs(s64 - f32rp(id.toString)) < 1e-5, s"doc $id: $s64 vs ${f32rp(id.toString)}")
    }
  }
}
