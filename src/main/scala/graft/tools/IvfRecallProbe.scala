package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Recall@20 of the IVF coarse-quantizer path vs the exact baseline over
  * the sf embeddings table, for the BENCH.md ANN comparison table.
  * Usage: runMain graft.tools.IvfRecallProbe [sfDir]
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = df.count()
    val q = df.where($"vec_id" === 0L).select("embedding")
      .as[Array[Float]].head().map(_.toDouble)
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    for (k <- Seq(8, 16); iters <- Seq(2); nProbe <- Seq(1, 2, 4)) {
      if (nProbe <= k) {
        val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", k, iters)
        val assign = Similarity.ivfAssign(df, "vec_id", "embedding", cents)
        val probedFrac = {
          val counts = assign.groupBy("cid").count().as[(Int, Long)].collect().toMap
          Similarity.ivfProbes(cents, q, nProbe)
            .map(c => counts.getOrElse(c, 0L)).sum.toDouble / n
        }
        val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", cents, q, 20, nProbe)
          .select("vec_id").as[Long].collect().toSet
        val recall = (exact & ivf).size.toDouble / exact.size
        println(f"K=$k%-3d iters=$iters nProbe=$nProbe%-2d scanned=${probedFrac * 100}%5.1f%% recall@20=$recall%.2f")
      }
    }
    spark.stop()
  }
}
