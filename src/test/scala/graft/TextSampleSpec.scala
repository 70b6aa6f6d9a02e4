package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Deterministic hash sampling: reproducible, stratified fractions land
  * near their targets, and strata compose (a stratum's sample is the same
  * rows the flat sample at that fraction would keep).
  */
class TextSampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = (0L until 4000L)
    .map(i => (i, if (i % 4 == 0) "fr" else "en"))
    .toDF("doc_id", "lang").cache()

  test("same input -> bit-identical sample, twice") {
    val a = TextOps.hashSample(docs, "doc_id", 0.3).select("doc_id").as[Long].collect().toSeq
    val b = TextOps.hashSample(docs, "doc_id", 0.3).select("doc_id").as[Long].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("stratified fractions land near their targets and compose with flat sampling") {
    val got = TextOps.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 0.25, "fr" -> 0.75))
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    val en = byLang("en").toDouble / 3000.0
    val fr = byLang("fr").toDouble / 1000.0
    assert(math.abs(en - 0.25) < 0.05, s"en fraction $en")
    assert(math.abs(fr - 0.75) < 0.05, s"fr fraction $fr")
    // per stratum, the kept rows ARE the flat sample's rows at that fraction
    val flatEn = TextOps.hashSample(docs.where($"lang" === "en"), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val stratEn = got.where($"lang" === "en").select("doc_id").as[Long].collect().toSet
    assert(stratEn == flatEn)
  }

  test("fraction 0 keeps nothing, 1 keeps everything") {
    assert(TextOps.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(TextOps.hashSample(docs, "doc_id", 1.0).count() == 4000)
  }

  test("multimodal fitWithin: aspect-preserving integer fit, downscale only") {
    import graft.ops.Multimodal.fitWithin
    assert(fitWithin(100, 50, 128, 96) == ((100L, 50L)))   // already fits
    assert(fitWithin(640, 480, 128, 96) == ((128L, 96L)))  // exact 4:3
    assert(fitWithin(1000, 100, 128, 96) == ((128L, 12L))) // width-bound
    assert(fitWithin(100, 1000, 128, 96) == ((9L, 96L)))   // height-bound
    assert(fitWithin(10000, 1, 128, 96) == ((128L, 1L)))   // never below 1
    assert(fitWithin(1, 10000, 128, 96) == ((1L, 96L)))
    // ratio preserved within floor error: out_w/out_h ~ w/h
    val (ow, oh) = fitWithin(333, 77, 128, 96)
    assert(ow == 128 && oh == 77L * 128 / 333)
  }
}
