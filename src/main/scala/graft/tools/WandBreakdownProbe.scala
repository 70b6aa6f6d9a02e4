package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.Searcher

/** One-off diagnostic: where a single-term WAND query's wall time goes —
  * stats lookup, df lookup, postings scan, shuffle+collect.
  */
object WandBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sr = new Searcher(spark, "/dev/shm/graft-bench/qsidx-600000")
    sr.postings.count(); sr.termdict.count()
    def time(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        System.err.println(f"[wb] $name #$i: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      }
    }
    time("docFreqs(def)")(sr.docFreqs(Seq("def")))
    time("postings scan collect (blocks only)") {
      sr.postings.where($"field" === "content" && $"term" === "def")
        .select($"segId", $"blockId", $"lastDoc").collect()
    }
    time("scan+groupByKey(segId)+count") {
      sr.postings.where($"field" === "content" && $"term" === "def")
        .select($"segId", $"term", $"blockId", $"lastDoc", $"maxNormId", $"maxTf",
          $"docIds", $"tfs", $"normIds")
        .as[(Int, String, Int, Int, Int, Int, Array[Int], Array[Int], Array[Int])]
        .groupByKey(_._1).mapGroups { (s, it) => (s, it.length) }.collect()
    }
    time("full topDocsWand(def)")(sr.topDocsWand(Seq("def"), 10))
    time("full topDocsWand(def, merge)")(sr.topDocsWand(Seq("def", "merge"), 10))
    spark.stop()
  }
}
