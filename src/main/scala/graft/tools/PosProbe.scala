package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: how much of the hot-phrase cost is the nested
  * positions array (Array[Array[Int]]) shuffle/encoder overhead vs the flat
  * posting columns.
  */
object PosProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sr = new graft.query.Searcher(spark, "/dev/shm/graft-bench/qsidx-600000")
    sr.termdict.count()
    val terms = Seq("def", "parser", "00")
    def times(name: String, n: Int)(f: => Any): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      System.err.println(f"[pos] $name: " + ts.map(t => f"$t%.0f").mkString(" ") + " ms")
    }
    val flat = sr.postings
      .where($"field" === "content" && $"term".isin(terms: _*))
      .select($"segId", $"term", $"blockId", $"docIds", $"tfs", $"normIds")
      .as[(Int, String, Int, Array[Int], Array[Int], Array[Int])]
    flat.collect()
    times("flat collect (3 hot terms)", 3)(flat.collect())

    val withPos = sr.postings
      .where($"field" === "content" && $"term".isin(terms: _*))
      .select($"segId", $"term", $"blockId", $"docIds", $"tfs", $"normIds", $"positions")
      .as[(Int, String, Int, Array[Int], Array[Int], Array[Int], Array[Array[Int]])]
    withPos.collect()
    times("withPos collect (3 hot terms)", 3)(withPos.collect())

    // CSR flatten map-side: ship two primitive arrays instead
    val csr = sr.postings
      .where($"field" === "content" && $"term".isin(terms: _*))
      .select($"segId", $"term", $"blockId", $"docIds", $"tfs", $"normIds",
        flatten($"positions").as("posFlat"),
        transform($"positions", p => size(p)).as("posLens"))
      .as[(Int, String, Int, Array[Int], Array[Int], Array[Int], Array[Int], Array[Int])]
    csr.collect()
    times("csr collect (3 hot terms)", 3)(csr.collect())

    // shuffle versions (groupByKey like the executor)
    times("flat shuffle+group", 3) {
      flat.groupByKey(_._1).mapGroups { (s, it) => (s, it.length) }.collect()
    }
    times("withPos shuffle+group", 3) {
      withPos.groupByKey(_._1).mapGroups { (s, it) => (s, it.length) }.collect()
    }
    times("csr shuffle+group", 3) {
      csr.groupByKey(_._1).mapGroups { (s, it) => (s, it.length) }.collect()
    }
    spark.stop()
  }
}
