package graft.tools

import org.apache.spark.sql.SparkSession
import graft.bench.QuerySet
import graft.query.Searcher

/** One-off diagnostic: per-entry latency of the full query set against the
  * memoized bench index, slowest first.
  */
object QuerySetProbe {
  def main(args: Array[String]): Unit = {
    val qsDocs = sys.env.getOrElse("SPARK_GRAFT_QS_DOCS", "600000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sr = new Searcher(spark, s"/dev/shm/graft-bench/qsidx-$qsDocs")
    sr.postings.count(); sr.docmap.count(); sr.termdict.count()
    val entries = QuerySet.generate()
    entries.foreach(e => QuerySet.run(sr, e)) // warm
    val timed = entries.map { e =>
      val t0 = System.nanoTime()
      val (hits, cnt) = QuerySet.run(sr, e)
      val ms = (System.nanoTime() - t0) / 1e6
      (ms, e, hits.length, cnt)
    }
    timed.sortBy(-_._1).foreach { case (ms, e, nh, cnt) =>
      System.err.println(f"[qsp] $ms%7.0f ms  hits=$nh%2d cnt=$cnt%8d  $e")
    }
    spark.stop()
  }
}
