package graft.tools
import org.apache.spark.sql.SparkSession
import graft.query.Searcher
object DfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sr = new Searcher(spark, "/dev/shm/graft-bench/qsidx-600000")
    val ts = Seq("def", "parser", "00", "extends", "impl", "fieldImpl3503",
      "segment", "47", "for", "val", "import", "reader", "21", "scorer", "26")
    sr.docFreqs(ts).toSeq.sortBy(-_._2).foreach { case (t, d) =>
      System.err.println(f"[df] $t%-16s $d%9d") }
    spark.stop()
  }
}
