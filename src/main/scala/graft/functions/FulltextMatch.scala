package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Predicate}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.analysis.Analysis

/** `fulltext_match(content, query)` — a native Catalyst `Expression` (the
  * optional SQL-facing surface SURVEY §4 names): true iff EVERY term of the
  * analyzed query occurs in the analyzed content. Both sides run the
  * reference's default chain (simple tokenizer -> remove-long(40) ->
  * lowercase, `tokenizer_manager.rs:60-66`), so a SQL `WHERE` filter agrees
  * exactly with the indexed engine's all-Must semantics
  * (`set_conjunction_by_default`, `query_parser.rs:283-289`) — useful for
  * filtering arbitrary tables where no inverted index exists. An empty query
  * (no surviving tokens) matches everything, mirroring the parser's
  * drop-empty-literal rule (`query_parser.rs:958-996`).
  *
  * The expression stays inside whole-stage codegen (`doGenCode` emits a call
  * on a bound reference — no UDF wrapping, null handling for free), and the
  * query's term set is precompiled once at plan time when the query side is
  * foldable (the common literal case).
  */
case class FulltextMatch(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fulltext_match requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def prettyName: String = "fulltext_match"

  // precompiled query terms when the query expression folds to a constant
  @transient private lazy val constTerms: Array[String] =
    if (right.foldable) {
      val q = right.eval(null)
      if (q == null) null else FulltextMatch.queryTerms(q.toString)
    } else null

  /** Called from both the interpreted and the generated path. */
  def doMatch(content: UTF8String, query: UTF8String): Boolean = {
    val ts =
      if (constTerms != null) constTerms
      else FulltextMatch.queryTerms(query.toString)
    FulltextMatch.matches(content.toString, ts)
  }

  override protected def nullSafeEval(c: Any, q: Any): Any =
    doMatch(c.asInstanceOf[UTF8String], q.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fulltextMatch", this, classOf[FulltextMatch].getName)
    nullSafeCodeGen(ctx, ev, (c, q) => s"${ev.value} = $ref.doMatch($c, $q);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FulltextMatch =
    copy(left = newLeft, right = newRight)
}

object FulltextMatch {

  def queryTerms(q: String): Array[String] =
    Analysis.defaultTerms(q).map(_._1).distinct.toArray

  /** All-terms-must-occur over the analyzed content; early exit once every
    * term has been seen. Vacuously true for an empty term set.
    */
  def matches(content: String, terms: Array[String]): Boolean = {
    if (terms.isEmpty) return true
    val remaining = new java.util.HashSet[String]()
    terms.foreach(remaining.add)
    val it = Analysis.defaultAnalyze(content).iterator
    while (it.hasNext && !remaining.isEmpty) remaining.remove(it.next().text)
    remaining.isEmpty
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("fulltext_match")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FulltextMatch].getName, null, "fulltext_match",
    "fulltext_match(content, query) - true iff every analyzed query term occurs in the analyzed content",
    "", "", "", "predicate_funcs", "", "", "internal")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "fulltext_match(content, query) takes exactly 2 arguments")
    FulltextMatch(args.head, args(1))
  }

  /** Programmatic registration into an existing session (the
    * `SparkSessionExtensions` route is `graft.GraftExtensions` via the
    * `spark.sql.extensions` config).
    */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(identifier, info, builder)
}
