package graft.bench

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexConfig}

/** Child process for the two-cluster-size scaling phase: launched once per
  * (cluster size, rep) via spark-submit on a `local-cluster[N,1,mem]`
  * master — N single-core executor JVMs whose sizing (heap, GC/JIT threads
  * via ActiveProcessorCount=1) is IDENTICAL at both cluster sizes, so
  * per-JVM effects cancel in the N vs 4N throughput ratio and the measured
  * gap is genuinely coordination (driver serial cost, shuffle, stragglers),
  * as on a real cluster. Shuffles cross JVM boundaries through netty — the
  * real multi-executor path, not local in-process handoff.
  *
  * Protocol inside one child: a warmup build (JIT/codegen across driver AND
  * executors) then `reps` measured builds; prints one
  * `[scaling-child] files_per_sec=<v>` line per measured build.
  *
  * Usage: spark-submit --master local-cluster[N,1,m] --class
  *   graft.bench.ScalingChild <jar> <corpusPath> <warmupCorpusPath> <reps>
  */
object ScalingChild {
  def main(args: Array[String]): Unit = {
    val Array(corpus, warmupCorpus, repsS) = args.take(3)
    val reps = repsS.toInt
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    def build(path: String): Double = {
      val dir = java.nio.file.Files.createTempDirectory(
        new java.io.File("/dev/shm/graft-bench").toPath, "sc-").toString
      val df = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val meta = IndexBuilder.build(spark, df, dir,
        IndexConfig(numSegments = 32, withPositions = false))
      val secs = (System.nanoTime() - t0) / 1e9
      rmrf(new java.io.File(dir))
      meta.totalRows / secs
    }

    build(warmupCorpus) // JIT/codegen warmup, not reported
    for (_ <- 1 to reps)
      println(f"[scaling-child] files_per_sec=${build(corpus)}%.1f")
    spark.stop()
  }
}
