package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DdSketch

/** DDSketch (VLDB 2019) — key arithmetic and the relative-error GUARANTEE
  * the sketch exists for: every returned quantile is within alpha (1%) of
  * the exact value at that rank. The DuckDB oracle pins the arithmetic
  * bit-for-bit (agg_percentiles_ddsketch); this spec pins the math.
  */
class DdSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val alpha = DdSketch.DefaultAlpha
  private val g = DdSketch.gamma(alpha)

  test("bucket arithmetic: boundaries, representatives, zero bucket") {
    // gamma = 1.01/0.99; bucket k covers (gamma^(k-1), gamma^k]
    assert(math.abs(g - 1.01 / 0.99) < 1e-15)
    val df = Seq(1.0, 0.0, 1e-12, g, g * g, 0.5).toDF("v")
      .select(DdSketch.keyCol($"v").as("k")).as[Long].collect()
    // v=1: ln(1)=0 => key 0; zero and sub-minValue => ZeroKey
    assert(df(0) == 0L)
    assert(df(1) == DdSketch.ZeroKey && df(2) == DdSketch.ZeroKey)
    // v=gamma sits at bucket 1's UPPER boundary (inclusive)
    assert(df(3) == 1L)
    assert(df(4) == 2L)
    // v=0.5 < 1 lands in a negative key
    assert(df(5) < 0L)
    // representative of bucket 0 = 2/(gamma+1) = 0.99..., exactly alpha
    // away from the bucket's upper edge v=1 — the guarantee is tight there
    val rep0 = Seq(0L).toDF("k").select(DdSketch.repCol($"k")).as[Double].head()
    assert(math.abs(rep0 - 2.0 / (g + 1)) < 1e-12)
    assert(math.abs(rep0 - 1.0) <= alpha * 1.0 + 1e-12)
  }

  test("relative-error guarantee: every percentile within alpha of exact") {
    // deterministic skewed corpus, two groups, 4 decades of magnitude
    val rng = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      val grp = if (i % 3 == 0) "a" else "b"
      val v = math.exp(rng.nextDouble() * 9.2) * 0.01 // ~[0.01, 99]
      (grp, v)
    }
    val df = rows.toDF("grp", "v")
    val percents = Seq(1.0, 25, 50, 75, 95, 99)
    val out = DdSketch.percentiles(df, "v", "grp", percents)
      .collect().map(r => r.getString(0) -> r).toMap
    for (grp <- Seq("a", "b")) {
      val sorted = rows.filter(_._1 == grp).map(_._2).sorted
      val n = sorted.length
      percents.zipWithIndex.foreach { case (q, i) =>
        val rank = q / 100.0 * (n - 1)
        val exact = sorted(math.floor(rank).toInt min (n - 1))
        val got = out(grp).getDouble(i + 1)
        assert(math.abs(got - exact) <= alpha * exact + 1e-9,
          s"$grp p$q: sketch $got vs exact $exact")
      }
    }
  }

  test("zero values route through the zero bucket") {
    val df = (Seq.fill(6)(0.0) ++ Seq(5.0, 6.0, 7.0, 8.0)).map(("z", _))
      .toDF("grp", "v")
    val out = DdSketch.percentiles(df, "v", "grp", Seq(25, 90)).collect().head
    assert(out.getDouble(1) == 0.0) // p25 of 10 values, 6 zeros
    // p90 rank = 0.9*(10-1) = 8.1 -> element index 8 of the sorted list
    // [0,0,0,0,0,0,5,6,7,8] = 7
    assert(math.abs(out.getDouble(2) - 7.0) <= alpha * 7.0 + 1e-9)
  }
}
