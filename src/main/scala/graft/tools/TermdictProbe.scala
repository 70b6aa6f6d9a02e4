package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, IndexConfig}

/** One-off diagnostic for the termdict phase's flat (non-scaling) cost:
  * builds a corpus index once, then times the termdict aggregation under
  * different input-split sizes and GC states at a given parallelism.
  * Not part of the engine; run via
  * `SPARK_GRAFT_PROBE_CPUS=16 sbt -batch "runMain graft.tools.TermdictProbe"`.
  */
object TermdictProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "16").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DOCS", "1200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val idxDir = s"/dev/shm/graft-probe/idx-$nDocs"
    if (!new java.io.File(s"$idxDir/_meta").exists()) {
      val corpus = graft.bench.CorpusGen.corpus(spark, nDocs, partitions = 128)
      IndexBuilder.build(spark, corpus.toDF(), idxDir,
        IndexConfig(numSegments = 32, withPositions = false))
    }

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def termdictJob(out: String): Unit =
      spark.read.parquet(s"$idxDir/postings/batch=0")
        .groupBy($"segId", $"field", $"term")
        .agg(sum($"blockLen").as("docFreq"), count(lit(1)).cast("int").as("numBlocks"))
        .write.mode("overwrite").parquet(out)

    // input split stats
    val files = new java.io.File(s"$idxDir/postings/batch=0")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    System.err.println(s"[probe] postings files: ${files.length}, " +
      f"total ${files.map(_.length).sum / 1e9}%.2f GB")

    time("termdict warm0 (default splits)")(termdictJob("/dev/shm/graft-probe/td0"))
    time("termdict warm1 (default splits)")(termdictJob("/dev/shm/graft-probe/td1"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
    time("termdict 16MB splits")(termdictJob("/dev/shm/graft-probe/td2"))
    spark.conf.set("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
    System.gc()
    time("termdict post-GC")(termdictJob("/dev/shm/graft-probe/td3"))
    // scan-only (no write): isolates read+agg from the output commit
    time("scan+agg only") {
      spark.read.parquet(s"$idxDir/postings/batch=0")
        .groupBy($"segId", $"field", $"term")
        .agg(sum($"blockLen").as("docFreq"), count(lit(1)).cast("int").as("numBlocks"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
