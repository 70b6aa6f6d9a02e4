package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexConfig}

/** Controlled experiment: does the postings row-group size change build
  * throughput? Interleaves builds at two sizes in ONE JVM (same session,
  * same warmed code) on the memoized corpus, local[16].
  */
object RowGroupBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1200000L)
    val reps = 3
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpusDir = new java.io.File(s"/dev/shm/graft-bench/corpus-$nDocs.parquet")
    if (!corpusDir.exists())
      graft.bench.CorpusGen.corpus(spark, nDocs, partitions = 128)
        .write.mode("overwrite").parquet(corpusDir.toString)
    val corpus = spark.read.parquet(corpusDir.toString)

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    def buildOnce(rgBytes: Long): Double = {
      sys.props("graft.postings.rowgroup.bytes") = rgBytes.toString
      val dir = java.nio.file.Files.createTempDirectory(
        new java.io.File("/dev/shm/graft-bench").toPath, "rg-").toString
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, corpus, dir, IndexConfig(numSegments = 32, withPositions = false))
      val s = (System.nanoTime() - t0) / 1e9
      rmrf(new java.io.File(dir))
      s
    }
    val sizes: Seq[Long] =
      if (args.length > 1) args.drop(1).toSeq.map(s => s.toLong << 20)
      else Seq(1L << 20, 128L << 20)
    sizes.foreach(buildOnce) // warm both paths
    val results = scala.collection.mutable.Map.empty[Long, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to reps; sz <- sizes) {
      val s = buildOnce(sz)
      results(sz) = s :: results(sz)
      System.err.println(f"[rg] ${sz >> 20} MiB: $s%.1f s (${nDocs / s}%.0f files/s)")
    }
    sizes.foreach { sz =>
      val best = results(sz).min
      System.err.println(f"[rg] BEST ${sz >> 20} MiB: $best%.1f s = ${nDocs / best}%.0f files/s")
    }
    spark.stop()
  }
}
