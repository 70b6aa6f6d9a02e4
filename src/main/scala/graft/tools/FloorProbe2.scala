package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.query.Searcher

/** Follow-up to FloorProbe: is the warm single-term cost the ARRAY
  * deserialization of the hot term's blocks? Compare metadata-only vs
  * full-payload scans, and a metadata-derived block prefilter.
  */
object FloorProbe2 {
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
    System.err.println("[floor2] df(def)=" + sr.docFreqs(Seq("def")).getOrElse("def", 0L)
      + " df(merge)=" + sr.docFreqs(Seq("merge")).getOrElse("merge", 0L))

    def times(name: String, n: Int)(f: => Any): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      System.err.println(f"[floor2] $name: " + ts.map(t => f"$t%.0f").mkString(" ") + " ms")
    }

    val meta = sr.postings.where($"field" === "content" && $"term" === "def")
      .select($"segId", $"blockId", $"lastDoc", $"maxNormId", $"maxTf")
    meta.collect()
    times("metadata-only collect (def)", 5) {
      val n = meta.collect().length; n
    }
    System.err.println("[floor2] blocks(def)=" + meta.count())

    val full = sr.postings.where($"field" === "content" && $"term" === "def")
      .select($"segId", $"blockId", $"lastDoc", $"maxNormId", $"maxTf",
        $"docIds", $"tfs", $"normIds")
    full.collect()
    times("full-payload collect (def)", 5)(full.collect())

    // prefiltered payload: metadata pass finds the k-th best achieved
    // block-max, then the payload scan filters on (maxNormId, maxTf)
    // BEFORE touching the arrays
    val w = sr.weightsFor(Seq("def"))("def")
    times("two-phase: meta + filtered payload (def, k=10)", 5) {
      val ms = meta.as[(Int, Int, Int, Int, Int)].collect()
      // achieved lower bound: tf 255 stays 255; upper bound: 255 -> u32max
      val achieved = ms.map { case (_, _, _, mN, mT) => w.score(mN, mT.toLong) }
      val k = 10
      val thetaLb =
        if (achieved.length <= k) Float.MinValue
        else { java.util.Arrays.sort(achieved); achieved(achieved.length - k) }
      val denomCol = array(w.cache.map(d => lit(d.toDouble)): _*)
      val tfCol = when($"maxTf" === 255, lit(4294967295.0))
        .otherwise($"maxTf".cast("double"))
      val ubCol = tfCol / (tfCol + element_at(denomCol, $"maxNormId" + 1))
      val survived = full
        .where(ubCol * w.weight.toDouble >= thetaLb.toDouble * (1 - 1e-6))
        .collect()
      survived.length
    }
    spark.stop()
  }
}
