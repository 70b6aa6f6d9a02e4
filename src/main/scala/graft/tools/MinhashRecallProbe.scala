package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** One-off measurement: recall of the banded MinHash-LSH candidate stage
  * (`Dedup.minhashPairs`, b=4 x r=4 over 16 hashes) against the EXACT
  * token-set-Jaccard ground truth at several thresholds, on the sf0.01
  * documents table. Precision is 1.0 by construction (candidates are
  * exact-verified); the interesting number is how many true near-dup
  * pairs the banding recalls. Findings recorded in BENCH.md.
  */
object MinhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // exact ground truth: verify EVERY pair (all-pairs via a dummy
    // candidate list — fine at probe scale only)
    val ids = docs.select(col("doc_id").cast("long").as("a"))
    val allPairs = ids.crossJoin(ids.withColumnRenamed("a", "b"))
      .where(col("a") < col("b"))
    for (th <- Seq(0.5, 0.7, 0.9)) {
      val truth = Dedup.verifyJaccard(docs, "doc_id", "text", allPairs, th)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Dedup.minhashPairs(docs, "doc_id", "text", th)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = if (truth.isEmpty) 1.0
        else truth.intersect(lsh).size.toDouble / truth.size
      println(f"threshold $th%.1f: true=${truth.size} lsh=${lsh.size} " +
        f"recall=$recall%.3f")
    }
    spark.stop()
  }
}
