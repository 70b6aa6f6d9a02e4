package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DDSketch quantiles (Masson, Rim, Lee: "DDSketch: A Fast and Fully-
  * Mergeable Quantile Sketch with Relative-Error Guarantees", VLDB 2019) —
  * the SAME sketch family and default accuracy the reference's percentiles
  * aggregation uses (`src/aggregation/metric/percentiles.rs:212-217`
  * constructs `sketches_ddsketch::DDSketch` with `Config::defaults()`,
  * relative accuracy alpha = 0.01).
  *
  * The crate's source is not available in this sandbox (zero egress), so
  * bit-parity with it cannot be verified; the key and quantile arithmetic
  * below follows the paper §2.1 and is pinned by this repo's own DuckDB
  * oracle replay (bit-for-bit) plus the relative-error-guarantee test in
  * DdSketchSpec — upgrading the round-3 "different sketch than the
  * reference" divergence to "same algorithm, same default accuracy,
  * replayable arithmetic".
  *
  * Construction:
  *  - gamma = (1 + alpha) / (1 - alpha); bucket key(v) = ceil(log_gamma v)
  *    for v >= minValue, so bucket k covers (gamma^(k-1), gamma^k];
  *  - representative value of bucket k = 2·gamma^k / (gamma + 1), the
  *    choice that guarantees |rep − v| <= alpha·v for every v in the
  *    bucket;
  *  - values in [0, minValue) land in a ZERO bucket (representative 0.0)
  *    walked before the positive buckets, like the reference sketch's zero
  *    count. Negative values are out of scope here (the reference keeps a
  *    mirrored negative store; none of this engine's fields need it).
  *  - quantile(q): rank = q·(n−1); the answer is the representative of
  *    the first bucket, in ascending key order, whose cumulative count
  *    exceeds the rank.
  *
  * 100 TB shape: the sketch IS the (group, key) → count table — built by
  * one `groupBy` with map-side partial aggregation, merged across any
  * partitioning by adding counts (full mergeability is the point of the
  * algorithm), with ≤ ceil(log_gamma(max/min)) ≈ 2.3k buckets per group at
  * alpha 0.01 over 20 decades. The per-group quantile walk is a window
  * over those few-hundred bucket rows, never over raw data.
  *
  * Cross-engine determinism: the log-ratio is rounded to 9 decimals BEFORE
  * ceil on both sides, so a last-ulp difference between the JVM's and
  * DuckDB's `ln` cannot flip a bucket boundary; outputs round to 6.
  */
object DdSketch {

  val DefaultAlpha = 0.01
  val MinValue = 1e-9 // sketches-ddsketch Config::defaults() min_value
  /** Zero-bucket sentinel key: far below any reachable real key
    * (key(minValue) = ceil(ln 1e-9 / ln gamma) ≈ −1036 at alpha 0.01).
    */
  val ZeroKey: Long = -1000000L

  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Bucket key column for a non-negative value column. */
  def keyCol(v: Column, alpha: Double = DefaultAlpha): Column = {
    val lnG = math.log(gamma(alpha))
    when(v < MinValue, lit(ZeroKey))
      .otherwise(ceil(round(log(v.cast("double")) / lnG, 9)).cast("long"))
  }

  /** Representative value of a key column (0.0 for the zero bucket). */
  def repCol(k: Column, alpha: Double = DefaultAlpha): Column = {
    val g = gamma(alpha)
    when(k === ZeroKey, lit(0.0))
      .otherwise(lit(2.0) * pow(lit(g), k.cast("double")) / lit(g + 1))
  }

  /** Grouped percentiles from the sketch: one row per `groupCol` value,
    * one column `p<percent>` per requested percent, values rounded to 6.
    */
  def percentiles(df: DataFrame, field: String, groupCol: String,
                  percents: Seq[Double],
                  alpha: Double = DefaultAlpha): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(field).isNotNull && col(field) >= 0)
    val buckets = base
      .groupBy(col(groupCol), keyCol(col(field), alpha).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy(groupCol).orderBy("k")
    val wAll = Window.partitionBy(groupCol)
    val cum = buckets
      .withColumn("cum", sum("cnt").over(wOrd))
      .withColumn("n", sum("cnt").over(wAll))
    // per percentile: the smallest key whose cumulative count exceeds the
    // rank q*(n-1); MIN over a conditional is the relational form of the
    // ascending bucket walk
    // internal pick columns are keyed by the percent's SEQUENCE INDEX, not
    // a numeric encoding of the percent — (q*100).toInt truncates, so two
    // percents closer than 0.01 would collide into one alias (duplicate
    // column error / silently lost distinction)
    val picks = percents.zipWithIndex.map { case (q, i) =>
      min(when(col("cum") > lit(q / 100.0) * (col("n") - 1), col("k")))
        .as(s"__k$i")
    }
    val picked = cum.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
    val outs = percents.zipWithIndex.map { case (q, i) =>
      round(repCol(col(s"__k$i"), alpha), 6)
        .as(s"p${if (q == q.floor) q.toInt.toString else q.toString.replace('.', '_')}")
    }
    picked.select(col(groupCol) +: outs: _*).orderBy(groupCol)
  }
}
