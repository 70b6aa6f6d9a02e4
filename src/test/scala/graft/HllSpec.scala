package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hll

/** HyperLogLog estimator (ops/Hll.scala): standard-error bound and the
  * insert-order/duplication invariance that makes it mergeable. The DuckDB
  * replay (agg_cardinality_hll) pins the arithmetic bit-for-bit; this spec
  * pins the statistics.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def estimate(values: Seq[Long]): Double = {
    val df = values.map(("g", _)).toDF("grp", "v")
    Hll.cardinality(df, "v", "grp").collect().head.getDouble(1)
  }

  test("estimate within 3 standard errors across cardinality decades") {
    // HLL standard error = 1.04 / sqrt(m) = 1.625% at m = 4096
    val se = 1.04 / math.sqrt(Hll.M)
    for (n <- Seq(100, 1000, 5000, 20000)) {
      val est = estimate((0L until n).map(i => i * 7919L + 13))
      assert(math.abs(est - n) <= 3 * se * n + 3,
        s"n=$n est=$est (${(est - n) / n * 100}%)")
    }
  }

  test("duplicates and order leave the registers unchanged") {
    val base = (0L until 500L).toSeq
    val dup = base ++ base ++ base.reverse
    assert(estimate(base) == estimate(dup))
  }

  test("small range uses linear counting (exact-ish at tiny n)") {
    val est = estimate((0L until 10L).toSeq)
    assert(math.abs(est - 10) < 1.0, s"est=$est")
  }
}
