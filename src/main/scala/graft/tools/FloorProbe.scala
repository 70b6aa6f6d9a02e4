package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.Searcher

/** One-off diagnostic: decompose the warm-query wall-time floor into
  * (a) Dataset/plan construction + Catalyst planning, (b) job execution with
  * a REUSED physical plan, (c) the full fresh-plan path — to find whether the
  * ~400 ms/query floor is scheduling (irreducible locally) or planning
  * (cacheable per query shape).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sr = new Searcher(spark, "/dev/shm/graft-bench/qsidx-600000")
    sr.termdict.count(); sr.statsDf.count()
    sr.docFreqs(Seq("def", "merge", "spark"))

    def times(name: String, n: Int)(f: => Any): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      System.err.println(f"[floor] $name: " + ts.map(t => f"$t%.0f").mkString(" ") + " ms")
    }

    // warm everything once
    sr.topDocsWand(Seq("def"), 10)
    sr.topDocsWand(Seq("def"), 10)

    // (a) plan-only: build the scan Dataset + force physical planning
    times("plan-only (fresh Dataset + executedPlan)", 5) {
      val ds = sr.postings
        .where(col("field") === "content" && col("term") === "def")
        .select($"segId", $"blockId", $"lastDoc", $"maxNormId", $"maxTf",
          $"docIds", $"tfs", $"normIds")
        .as[(Int, Int, Int, Int, Int, Array[Int], Array[Int], Array[Int])]
      ds.queryExecution.executedPlan
    }

    // (b) reused-plan execution: same Dataset object collected repeatedly
    val reusable = sr.postings
      .where(col("field") === "content" && col("term") === "def")
      .select($"segId", $"blockId", $"lastDoc", $"maxNormId", $"maxTf",
        $"docIds", $"tfs", $"normIds")
      .as[(Int, Int, Int, Int, Int, Array[Int], Array[Int], Array[Int])]
    reusable.collect() // warm
    times("reused-plan scan collect", 5)(reusable.collect())
    System.err.println("[floor] scan partitions: " + reusable.rdd.getNumPartitions)

    // (c) full fresh-plan query
    times("full topDocsWand(def)", 5)(sr.topDocsWand(Seq("def"), 10))
    times("full topDocsWand(def,merge)", 5)(sr.topDocsWand(Seq("def", "merge"), 10))

    // (d) pure job floor: trivial RDD job, 32 tasks, no SQL
    val rdd = spark.sparkContext.parallelize(1 to 32, 32)
    rdd.count()
    times("raw 32-task RDD job", 5)(rdd.count())

    // (e) same queries with postings cached in memory (Warmer analog)
    sr.postings.cache()
    val t0 = System.nanoTime()
    sr.postings.count()
    System.err.println(f"[floor] cache materialize: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    sr.topDocsWand(Seq("def"), 10) // warm the cached path
    times("cached topDocsWand(def)", 5)(sr.topDocsWand(Seq("def"), 10))
    times("cached topDocsWand(def,merge)", 5)(sr.topDocsWand(Seq("def", "merge"), 10))
    times("cached topDocsWand(rare)", 5)(sr.topDocsWand(Seq("xylophone17"), 10))
    val usedMb = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, free) => (max - free) / 1e6 }.sum
    System.err.println(f"[floor] storage memory used: $usedMb%.0f MB")
    spark.stop()
  }
}
