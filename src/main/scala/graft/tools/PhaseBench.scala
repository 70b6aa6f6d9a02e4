package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexConfig}

/** Phase-level scaling diagnosis: run the SAME build at local[4] and
  * local[16] with SPARK_GRAFT_PHASE_LOG on and compare phase RATIOS — a
  * phase whose wall time barely shrinks 4->16 is the serial residue that
  * caps scaling efficiency (Amdahl fit puts it at ~30 s/build).
  * Usage: runMain graft.tools.PhaseBench [nDocs] (default 1200000)
  */
object PhaseBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1200000L)

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    def buildOnce(cpus: Int, n: Long, label: String): Unit = {
      val spark = session(cpus)
      try {
        val corpusDir = new java.io.File(s"/dev/shm/graft-bench/corpus-$n.parquet")
        if (!corpusDir.exists())
          graft.bench.CorpusGen.corpus(spark, n, partitions = 128)
            .write.mode("overwrite").parquet(corpusDir.toString)
        val dir = java.nio.file.Files.createTempDirectory(
          new java.io.File("/dev/shm/graft-bench").toPath, "ph-").toString
        val t0 = System.nanoTime()
        System.err.println(s"[phase] ==== $label local[$cpus] $n docs")
        IndexBuilder.build(spark, spark.read.parquet(corpusDir.toString), dir,
          IndexConfig(numSegments = 32, withPositions = false))
        System.err.println(f"[phase] ==== $label TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s")
        rmrf(new java.io.File(dir))
      } finally { spark.stop(); System.gc() }
    }

    buildOnce(16, math.min(nDocs / 4, 100000L), "warm")
    buildOnce(4, math.min(nDocs / 4, 100000L), "warm")
    buildOnce(16, nDocs, "hi")
    buildOnce(4, nDocs, "lo")
    buildOnce(16, nDocs, "hi")
    buildOnce(4, nDocs, "lo")
  }
}
