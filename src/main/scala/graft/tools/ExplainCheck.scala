package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Engine
import graft.query._

/** Plan-quality audit: prints the formatted physical plans of the hot query
  * shapes and greps them for the properties that matter at scale —
  * PushedFilters reaching the Parquet scan, pruned ReadSchema, broadcast
  * joins for small sides, WholeStageCodegen coverage.
  *
  * Run: sbt "runMain graft.tools.ExplainCheck /root/testdata/sf0.01"
  */
object ExplainCheck {

  private def audit(name: String, df: org.apache.spark.sql.DataFrame,
                    expects: Seq[String]): Unit = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(s"\n========== $name ==========")
    println(plan)
    expects.foreach { e =>
      val ok = plan.contains(e)
      println(s"[audit] $name ${if (ok) "OK  " else "MISS"} expects '$e'")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sr = Engine.searcher(spark, sfDir)
    import org.apache.spark.sql.functions._

    // 1. term scan: the term predicate must reach the Parquet scan
    audit("postings term scan",
      sr.postings.where(col("field") === "content" && col("term") === "spark"),
      Seq("EqualTo(term,spark)", "EqualTo(field,content)", "In(segId"))

    // 2. scored top-k (f64 path): broadcast of the tiny df map
    audit("topKShouldF64", Engine.topKShouldF64(sr, Seq("spark", "merge"), 20),
      Seq("BroadcastHashJoin", "TakeOrderedAndProject"))

    // 3. range query: predicate pushdown on the docmap fast-field column
    audit("range on docmap",
      sr.compile(RangeQ("contentLen", Some((100.0, true)), Some((200.0, true)))).toDF(),
      Seq("PushedFilters: [IsNotNull(contentLen)"))

    // 4. docmap projection pruning: reading two columns must not read content
    audit("docmap narrow projection",
      sr.docmap.select(col("segId"), col("docId")),
      Seq("ReadSchema: struct<segId:int,docId:int>"))

    // 5. must-join: intersection compiles to a join, not a cross product
    audit("bool must",
      sr.compile(BoolQ(Seq(Occur.Must -> TermQ("spark"), Occur.Must -> TermQ("merge")))).toDF(),
      Seq.empty)

    // 6. scored slot-phrase (phrase-prefix/regex-phrase executor): one
    // pruned scan — the matched-term IN list and field equality must reach
    // the Parquet scan before the single (segId, docId) shuffle
    audit("slot-phrase counts scan",
      sr.slotPhraseCounts(Seq(Seq("join"), Seq("row")), Array(0, 1), 0,
        prefix = Some((2, sr.prefixExpansions("s", 50)))),
      Seq("EqualTo(field,content)", "In(term, ["))

    spark.stop()
  }
}
