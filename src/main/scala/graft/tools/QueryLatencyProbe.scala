package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Engine

/** One-off diagnostic: per-rep latency of the WAND disjunction shapes, to
  * isolate why the 2-term disjunction medians ~3x slower than the 3-term
  * superset in the bench. Prints every rep, not just the median.
  */
object QueryLatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sr = Engine.searcher(spark, sfDir)
    sr.postings.count(); sr.docmap.count(); sr.termdict.count()

    val qs: Seq[(String, () => Unit)] = Seq(
      "disj2" -> (() => { sr.topDocsWand(Seq("spark", "merge"), 10); () }),
      "disj3" -> (() => { sr.topDocsWand(Seq("spark", "merge", "order"), 10); () }),
      "disj2b" -> (() => { sr.topDocsWand(Seq("vector", "window"), 10); () })
    )
    qs.foreach { case (n, f) => f(); f() } // warm all shapes
    for (round <- 1 to 3) {
      qs.foreach { case (name, fn) =>
        val times = (1 to 7).map { _ =>
          val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e6
        }
        System.err.println(f"[qprobe] r$round $name: " +
          times.map(t => f"$t%.0f").mkString(" ") + " ms")
      }
    }
    spark.stop()
  }
}
