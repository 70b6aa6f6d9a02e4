package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** The scale-shaped dedup paths: LSH-blocked embedding pairs vs the exact
  * quadratic baseline, shingle-df-capped n-gram blocking, and the
  * partitioned-by-bucket ANN table.
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketed embeddingPairs is a subset of the exact pairs; verified cosines agree") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = Dedup.embeddingPairsExact(df, "vec_id", "embedding", 0.45)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val bucketed = Dedup.embeddingPairs(df, "vec_id", "embedding", 0.45)
      .as[(Long, Long, Double)].collect()
    assert(bucketed.nonEmpty, "blocking must find at least some near-dup pairs")
    bucketed.foreach { case (a, b, c) =>
      assert(exact.get((a, b)).contains(c),
        s"bucketed pair ($a,$b,$c) must appear in the exact set with the same cosine")
    }
  }

  test("ngram blocking with a low df cap still verifies exact jaccard for surviving pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, maxShingleDf = Long.MaxValue)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, maxShingleDf = 3L)
      .as[(Long, Long, Double)].collect()
    capped.foreach { case (a, b, j) =>
      assert(uncapped.get((a, b)).contains(j),
        s"capped pair ($a,$b) must carry the exact (full-set) jaccard")
    }
  }

  test("banded simhashPairs == quadratic ground truth for Hamming <= bands-1 (pigeonhole)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fp = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    val exact = (for {
      (a, fa) <- fp; (b, fb) <- fp if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= Dedup.SimBands - 1
    } yield (a, b, h)).sorted
    val banded = Dedup.simhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(banded == exact, "banding must have recall 1.0 up to Hamming bands-1")
    assert(banded.nonEmpty, "corpus should contain at least one simhash near-dup pair")
  }

  test("writeBucketed partitions by bucket; probe scan prunes to b+1 dirs") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-ann").toString + "/table"
    Similarity.writeBucketed(df, "vec_id", "embedding", path)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket="))
    assert(dirs.length > 1, "expected multiple bucket partitions")

    val query = df.where(col("vec_id") === 0).select(col("embedding"))
      .as[Array[Float]].head().map(_.toDouble)
    val viaBucketed = Similarity.lshTopKBucketed(spark, path, query, 20)
      .as[(Long, Double)].collect().toSeq
    val viaInline = Similarity.lshTopK(df, "vec_id", "embedding", query, 20)
      .as[(Long, Double)].collect().toSeq
    assert(viaBucketed == viaInline, "partitioned table must answer identically")
    // the physical plan must carry the partition predicate on `bucket`
    val plan = Similarity.lshTopKBucketed(spark, path, query, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bucket"), "expected a bucket partition filter in the scan")

    // probe-radius knob: radius r probes Σ_{i<=r} C(8, i) buckets, each
    // wider radius strictly widens the candidate set, and recall vs the
    // exact baseline is monotone in the radius
    assert(Similarity.probeBuckets(query, 0).length == 1)
    assert(Similarity.probeBuckets(query, 1).length == 9)
    assert(Similarity.probeBuckets(query, 2).length == 1 + 8 + 28)
    assert(Similarity.probeBuckets(query, 1).toSet
      .subsetOf(Similarity.probeBuckets(query, 2).toSet))
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 20)
      .select("vec_id").as[Long].collect().toSet
    val recalls = Seq(0, 1, 2).map { r =>
      Similarity.lshTopK(df, "vec_id", "embedding", query, 20, radius = r)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    }
    assert(recalls == recalls.sorted, s"recall must be monotone in radius: $recalls")
  }
}
