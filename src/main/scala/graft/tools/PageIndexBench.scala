package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.query.Searcher

/** Controlled experiment: query-set latency vs postings row-group size.
  *
  * Hypothesis: with TERM-major sorted postings, large row groups plus
  * Parquet's page-level column indexes (written by default, ~1 MiB pages,
  * pruned by Spark's vectorized reader when the term filter is pushed) give
  * the same term-scan pruning as small row groups — recovering the ~12%
  * build-throughput cost of 1 MiB groups (RowGroupBench: 22.8k vs 25.9k
  * files/s at 1.2M docs) without giving back warm-query latency.
  *
  * Builds one positions-enabled 600k index per size (memoized per size),
  * then interleaves query-set rounds across sizes in one warmed JVM.
  */
object PageIndexBench {
  def main(args: Array[String]): Unit = {
    val nDocs = 600000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(s => s.toLong << 20) else Seq(1L << 20, 128L << 20)

    val corpusDir = new java.io.File(s"/dev/shm/graft-bench/corpus-$nDocs.parquet")
    if (!corpusDir.exists())
      graft.bench.CorpusGen.corpus(spark, nDocs, partitions = 128)
        .write.mode("overwrite").parquet(corpusDir.toString)

    val searchers = sizes.map { sz =>
      val idx = s"/dev/shm/graft-bench/qsidx-$nDocs-rg${sz >> 20}"
      if (!Manifest.exists(idx)) {
        sys.props("graft.postings.rowgroup.bytes") = sz.toString
        IndexBuilder.build(spark, spark.read.parquet(corpusDir.toString), idx,
          IndexConfig(numSegments = 32, withPositions = true))
      }
      val sr = new Searcher(spark, idx)
      sr.postings.count(); sr.docmap.count(); sr.termdict.count()
      sz -> sr
    }

    val entries = graft.bench.QuerySet.generate()
    // warmup pass on every index (plan compilation, page-index reads)
    searchers.foreach { case (_, sr) => entries.foreach(e => graft.bench.QuerySet.run(sr, e)) }

    val rounds = 3
    val lat = scala.collection.mutable.Map.empty[Long, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to rounds; (sz, sr) <- searchers) {
      val times = entries.map { e =>
        val t0 = System.nanoTime()
        graft.bench.QuerySet.run(sr, e)
        (System.nanoTime() - t0) / 1e6
      }
      lat(sz) = lat(sz) ++ times
      val s = times.sorted
      System.err.println(f"[pg] round $r rg=${sz >> 20}MiB: p50 ${s(s.length / 2)}%.0f ms, p95 ${s(s.length * 95 / 100 min (s.length - 1))}%.0f ms")
    }
    sizes.foreach { sz =>
      val s = lat(sz).sorted
      System.err.println(f"[pg] TOTAL rg=${sz >> 20}MiB: p50 ${s(s.length / 2)}%.0f ms, p95 ${s(s.length * 95 / 100 min (s.length - 1))}%.0f ms over ${s.length} samples")
    }
    spark.stop()
  }
}
