package graft.index

import graft.analysis.Analysis

/** JSON ("schema-less") field support (`doc/src/json.md`,
  * `src/core/json_utils.rs`, `src/postings/json_postings_writer.rs`).
  *
  * A `FieldDef` whose tokenizer is `"json"` takes a string column holding a
  * JSON object per document and flattens it into terms of the form
  *
  *   `<seg1>\x01<seg2>\x01...<segN>\x00<type-tag><value-token>`
  *
  * — the reference's path/END_OF_PATH byte layout (`json.md:33-40`,
  * `common/src/json_path_writer.rs`: segments separated by `\x01`, path
  * terminated by `\x00`, then one type byte, then the value) carried here as
  * a plain string term in the existing `(field, term)` postings tables, so
  * every downstream operator (BM25, WAND, phrase, boolean) works on JSON
  * paths unchanged.
  *
  * Value typing follows `json.md:58-66`: numbers try u64, then i64, then
  * f64; strings try RFC-3339 date, else text (analyzed by the field's text
  * chain); the FIRST working type is the only term emitted at index time.
  * Arrays flatten into the same path (bag-of-terms, `json.md:114-140`);
  * nested objects extend the path; nulls emit nothing.
  */
object JsonField {
  final val Sep = '\u0001'
  final val End = '\u0000'
  // type tags, one byte after the path terminator (`json.md:37-38`)
  final val TText = 's'
  final val TU64 = 'u'
  final val TI64 = 'i'
  final val TF64 = 'f'
  final val TBool = 'b'
  final val TDate = 'd'

  private def mapper = JsonFieldMapper.m

  /** Flatten one document's JSON value into (term, position) pairs.
    * Positions restart per string value (each value is its own token
    * stream), so phrases never match across distinct values; non-text
    * values take position 0. Invalid JSON yields no terms (the reference
    * rejects the document at ingestion; in a bulk Spark pipeline, skipping
    * the field value is the operable choice — the doc stays searchable via
    * its other fields).
    */
  def flatten(json: String, textChain: String): Seq[(String, Int)] = {
    if (json == null || json.isEmpty) return Seq.empty
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Seq.empty }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    def walk(node: com.fasterxml.jackson.databind.JsonNode, path: List[String]): Unit = {
      if (node.isObject) {
        val it = node.fields()
        while (it.hasNext) { val e = it.next(); walk(e.getValue, e.getKey :: path) }
      } else if (node.isArray) {
        node.forEach(el => walk(el, path))
      } else if (node.isNull) {
        // nothing
      } else {
        val enc = pathPrefix(path.reverse)
        if (node.isBoolean) out += ((enc + TBool + node.asBoolean().toString, 0))
        else if (node.isNumber) out += ((enc + numToken(node.asText()), 0))
        else {
          val s = node.asText()
          dateMillis(s) match {
            case Some(ms) => out += ((enc + TDate + ms.toString, 0))
            case None =>
              // MAX_TOKEN_LEN applies to the TOKEN text, not the
              // path-encoded term (postings_writer.rs checks
              // token.text.len() before the path prefix is prepended)
              Analysis.analyzeChain(textChain, s)
                .filter(t => Analysis.withinMaxTokenLen(t.text))
                .foreach(t => out += ((enc + TText + t.text, t.position)))
          }
        }
      }
    }
    walk(root, Nil)
    out.toSeq
  }

  /** `<segs joined \x01>\x00` */
  def pathPrefix(segs: Seq[String]): String = segs.mkString("", Sep.toString, End.toString)

  /** Number typing priority u64 -> i64 -> f64 (`json.md:62`); the token is
    * the canonical decimal so identical values written as `5` and `5.0`
    * stay distinct types, like the reference's typed terms.
    */
  def numToken(text: String): String = {
    val asLong = text.toLongOption
    asLong match {
      case Some(v) if v >= 0 => s"$TU64$v"
      case Some(v) => s"$TI64$v"
      case None => s"$TF64${text.toDouble}"
    }
  }

  /** RFC-3339 detection (`json_utils.rs:286`): epoch millis on success. */
  def dateMillis(s: String): Option[Long] =
    if (s.length < 20 || s.charAt(4) != '-') None
    else try Some(java.time.OffsetDateTime.parse(s).toInstant.toEpochMilli)
    catch { case _: Exception => None }

  /** Query-side expansion (`json.md:68-85`): the literal's type cannot be
    * known, so emit every plausible typed term for the path — always the
    * analyzed text token(s), plus numeric and date variants when the
    * literal parses as such. Single-token literals return the variants for
    * a Should-of-TermQ; multi-token literals return one phrase (text only).
    */
  def queryVariants(path: Seq[String], literal: String, textChain: String)
      : Either[Seq[String], Seq[(Int, String)]] = {
    val enc = pathPrefix(path)
    val toks = Analysis.analyzeChain(textChain, literal)
    if (toks.length > 1) Right(toks.map(t => (t.position, enc + TText + t.text)))
    else {
      val variants = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.headOption.foreach(t => variants += enc + TText + t.text)
      if (literal.toLongOption.isDefined || literal.toDoubleOption.isDefined)
        variants += enc + numToken(literal)
      dateMillis(literal).foreach(ms => variants += enc + TDate + ms.toString)
      if (literal == "true" || literal == "false") variants += enc + TBool + literal
      Left(variants.toSeq.distinct)
    }
  }
}

/** Shared Jackson mapper (thread-safe after config). */
private object JsonFieldMapper {
  val m = new com.fasterxml.jackson.databind.ObjectMapper()
}
