package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** IVF coarse-quantizer ANN (`Similarity.ivfCentroids/ivfAssign/ivfTopK`):
  * deterministic spherical k-means training, partition-prunable assignment,
  * recall against the exact brute-force baseline on clustered vectors.
  */
class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Dim = 8
  private val Clusters = 4

  /** 80 deterministic vectors in 4 well-separated clusters: cluster c's
    * axis is dim 2c, members = axis + small deterministic noise.
    */
  private lazy val vectors: Seq[(Long, Array[Float])] =
    (0 until 80).map { i =>
      val c = i % Clusters
      val v = new Array[Float](Dim)
      v(2 * c) = 1.0f
      (0 until Dim).foreach { d =>
        v(d) = v(d) + 0.05f * (((i * 31 + d * 17) % 11) - 5)
      }
      (i.toLong, v)
    }

  private lazy val df = vectors.toDF("vec_id", "embedding")

  test("training is deterministic: two runs agree on every centroid") {
    val a = Similarity.ivfCentroids(df, "vec_id", "embedding", Clusters, 3)
    val b = Similarity.ivfCentroids(df, "vec_id", "embedding", Clusters, 3)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    a.zip(b).foreach { case ((_, ca), (_, cb)) => assert(ca.toSeq == cb.toSeq) }
  }

  test("Lloyd rounds converge to the planted clusters: co-members share a list") {
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", Clusters, 3)
    val assign = Similarity.ivfAssign(df, "vec_id", "embedding", cents)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    // every vector of a planted cluster must land in the same list
    (0 until Clusters).foreach { c =>
      val ids = vectors.collect { case (id, _) if id % Clusters == c => id }
      assert(ids.map(assign).toSet.size == 1, s"cluster $c split across lists")
    }
  }

  test("nProbe=1 on separated clusters recalls the exact top-k") {
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", Clusters, 3)
    val query = vectors.head._2.map(_.toDouble) // a cluster-0 member
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", cents, query, 10, 1)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("probing scans only the probed lists") {
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", Clusters, 3)
    val query = vectors.head._2.map(_.toDouble)
    val probed = Similarity.ivfTopK(df, "vec_id", "embedding", cents, query, 80, 1)
      .count()
    // one list of four balanced clusters: a quarter of the corpus
    assert(probed == 20L)
  }

  test("LSH adaptive radius from scan budget (NumPlanes = 8)") {
    // expected scan fraction of radius r = Σ_{i<=r} C(8, i) / 256:
    // r0 = 1/256 ≈ 0.39%, r1 = 9/256 ≈ 3.5%, r2 = 37/256 ≈ 14.5%,
    // r3 = 93/256 ≈ 36.3%
    assert(Similarity.radiusForScanFraction(0.001) == 0)
    assert(Similarity.radiusForScanFraction(1.0 / 256) == 0) // exactly r0
    assert(Similarity.radiusForScanFraction(0.0165) == 1)
    assert(Similarity.radiusForScanFraction(0.035) == 1)     // the entry's budget
    assert(Similarity.radiusForScanFraction(0.10) == 2)
    assert(Similarity.radiusForScanFraction(0.30) == 3)
    assert(Similarity.radiusForScanFraction(1.0) == 8)       // whole space
  }
}
