package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES-style nested aggregation requests (reference `src/aggregation/agg_req.rs:
  * 120-171`: buckets nest arbitrarily, each bucket node carries metric
  * sub-aggs), re-expressed Spark-first.
  *
  * The reference executes the tree by walking segments and merging
  * intermediate results per bucket (`intermediate_agg_result.rs:39`). On
  * Spark the whole tree compiles to ONE declarative plan:
  *
  *  - a chain of bucket aggs (terms > histogram > ...) becomes a single
  *    `groupBy` over all levels' key expressions — one shuffle total, with
  *    map-side partial aggregation for free;
  *  - metric sub-aggs at the DEEPEST level are the agg expressions of that
  *    groupBy;
  *  - metric sub-aggs at ANCESTOR levels (the "tree" part) come from
  *    `rollup` instead of `groupBy`: Spark computes every prefix level in
  *    the same pass, which is exactly the ES response tree, flattened with
  *    NULL keys marking ancestor rows (the relational standard for it).
  *
  * All bucket types mirror the reference's request surface: terms
  * (`bucket/term_agg.rs`), histogram with interval+offset
  * (`bucket/histogram/histogram.rs`), date_histogram, range
  * (`bucket/range.rs`), filter. Metrics: count/sum/min/max/avg/stats +
  * cardinality (the reference's `src/aggregation/metric` modules).
  */
object Aggregations {

  // ---------------------------------------------------------------- request

  /** One bucket level: a name for the output key column and its key expr. */
  sealed trait BucketAgg { def name: String; def key: Column }

  /** `bucket/term_agg.rs` — group by a field's value. */
  final case class TermsAgg(field: String, name: String) extends BucketAgg {
    def key: Column = col(field)
  }
  /** `bucket/histogram/histogram.rs:30-60` — fixed-interval buckets with
    * offset: key = floor((x - offset) / interval) * interval + offset.
    */
  final case class HistogramAgg(field: String, interval: Double,
      offset: Double = 0.0, name: String = "bucket") extends BucketAgg {
    def key: Column =
      floor((col(field) - offset) / interval) * interval + offset
  }
  /** Calendar-day date histogram (`bucket/histogram/date_histogram.rs`). */
  final case class DateHistogramAgg(field: String, name: String = "day")
      extends BucketAgg {
    def key: Column = date_format(col(field), "yyyy-MM-dd")
  }
  /** `bucket/range.rs` — half-open [from, to) ranges, labeled. */
  final case class RangeAgg(field: String, ranges: Seq[(String, Option[Double], Option[Double])],
      name: String = "range") extends BucketAgg {
    def key: Column = ranges.foldRight(lit(null: String)) {
      case ((label, from, to), rest) =>
        val cond = (from, to) match {
          case (Some(a), Some(b)) => col(field) >= a && col(field) < b
          case (Some(a), None)    => col(field) >= a
          case (None, Some(b))    => col(field) < b
          case (None, None)       => lit(true)
        }
        when(cond, lit(label)).otherwise(rest)
    }
  }

  /** The reference's range-agg request-to-buckets expansion
    * (`bucket/range.rs`, golden shape in `agg_tests.rs:274-299`): requested
    * ranges are half-open [from, to), keys render as "from-to" with `*` for
    * an open end (f64 values print integral when whole), and the response
    * ALWAYS carries the implicit unbounded edge buckets `*-first` and
    * `last-*`.
    */
  def esRanges(ranges: Seq[(Option[Double], Option[Double])])
      : Seq[(String, Option[Double], Option[Double])] = {
    require(ranges.nonEmpty, "range aggregation requires at least one range")
    def fmt(d: Double): String =
      if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString
    def key(f: Option[Double], t: Option[Double]): String =
      s"${f.map(fmt).getOrElse("*")}-${t.map(fmt).getOrElse("*")}"
    def lo(r: (Option[Double], Option[Double])): Double =
      r._1.getOrElse(Double.NegativeInfinity)
    def hi(r: (Option[Double], Option[Double])): Double =
      r._2.getOrElse(Double.PositiveInfinity)
    // `extend_validate_ranges` (bucket/range.rs:402-444): sort by start,
    // add an edge bucket only when the corresponding side is not already
    // open, reject overlaps, and fill interior holes with synthetic buckets
    val sorted = ranges.sortBy(lo)
    val withLead =
      if (sorted.head._1.isEmpty) sorted
      else (Option.empty[Double], sorted.head._1) +: sorted
    val withEdges =
      if (withLead.last._2.isEmpty) withLead
      else withLead :+ (withLead.last._2, Option.empty[Double])
    val out = scala.collection.mutable.ArrayBuffer(withEdges.head)
    withEdges.tail.foreach { r =>
      val prev = out.last
      if (hi(prev) > lo(r))
        throw new IllegalArgumentException(
          s"Overlapping ranges not supported: ${key(prev._1, prev._2)}, ${key(r._1, r._2)}")
      if (hi(prev) < lo(r)) out += ((prev._2, r._1)) // hole bucket
      out += r
    }
    out.toSeq.map { case (f, t) => (key(f, t), f, t) }
  }

  /** Standalone range aggregation with the reference's response semantics
    * (`bucket/range.rs`, golden shape `agg_tests.rs:470-510`): every
    * requested bucket is emitted IN REQUEST ORDER even when empty —
    * doc_count 0 and NULL metric sub-aggs (the level2 golden asserts the
    * empty 19-20 bucket with a null average). One shuffle; the request-order
    * axis is a driver-side literal join like the histogram gap-fill.
    */
  def rangeAgg(df: DataFrame, field: String,
      ranges: Seq[(String, Option[Double], Option[Double])],
      metrics: Seq[MetricAgg] = Nil, name: String = "key"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = RangeAgg(field, ranges, name).key
    val aggs = count(lit(1)).as("cnt") +: metrics.map(m => m.expr.as(m.name))
    val grouped = df.where(col(field).isNotNull)
      .groupBy(keyed.as(name)).agg(aggs.head, aggs.tail: _*)
    val axis = ranges.map(_._1).zipWithIndex
      .toDF(name, "__ord")
    axis.join(grouped, Seq(name), "left")
      // count-type metric sub-aggs zero-fill on empty buckets like the
      // histogram gap-fill (ES reports doc-count metrics as 0, not NULL)
      .na.fill(0L, "cnt" +: metrics.filter(_.isCount).map(_.name))
      .orderBy("__ord").drop("__ord")
  }

  /** A metric sub-agg: output column name + aggregate expression. `isCount`
    * marks doc-count metrics, which ES reports as 0 (not NULL) on
    * gap-filled empty histogram buckets.
    */
  final case class MetricAgg(name: String, expr: Column, isCount: Boolean = false)

  object MetricAgg {
    /** ES metric `missing` parameter (`metric/average.rs:24-29`, same field
      * on stats/min/max/sum/...): docs without a value are treated as
      * having the given constant; without it they are simply skipped
      * (SQL aggregate NULL semantics already match that).
      */
    private def src(field: String, missing: Option[Double]): Column =
      missing.map(m => coalesce(col(field), lit(m))).getOrElse(col(field))
    def count: MetricAgg =
      MetricAgg("cnt", org.apache.spark.sql.functions.count(lit(1)), isCount = true)
    def sum(field: String, as: String = "sum", missing: Option[Double] = None): MetricAgg =
      MetricAgg(as, org.apache.spark.sql.functions.sum(src(field, missing)))
    def min(field: String, as: String = "min", missing: Option[Double] = None): MetricAgg =
      MetricAgg(as, org.apache.spark.sql.functions.min(src(field, missing)))
    def max(field: String, as: String = "max", missing: Option[Double] = None): MetricAgg =
      MetricAgg(as, org.apache.spark.sql.functions.max(src(field, missing)))
    /** round-6 avg — oracle-comparable across engines. */
    def avg(field: String, as: String = "avg", missing: Option[Double] = None): MetricAgg =
      MetricAgg(as, round(org.apache.spark.sql.functions.avg(src(field, missing)), 6))
    def cardinality(field: String, as: String = "uniq"): MetricAgg =
      MetricAgg(as, countDistinct(col(field)))
  }

  /** The request: a single bucket chain (root-to-leaf) + metric sub-aggs at
    * the leaf. `filter` is ES's filter-bucket wrapping the whole tree.
    */
  final case class AggRequest(
      buckets: Seq[BucketAgg],
      metrics: Seq[MetricAgg],
      filter: Option[Column] = None,
      /** true = also emit every ancestor level's metric rows (the full ES
        * response tree) via rollup; ancestor rows carry NULL deeper keys. */
      withAncestorLevels: Boolean = false)

  // ---------------------------------------------------------------- compile

  /** Aggregation guardrails (`src/aggregation/agg_limits.rs`,
    * `collector.rs:17`): `maxBuckets` mirrors the reference's
    * `bucket_limit` / ES's `search.max_buckets` (DEFAULT_BUCKET_LIMIT =
    * 65000, `agg_limits.rs:63,78`) — the count of buckets RETURNED, not
    * intermediate ones. Spark's shuffle spills instead of OOMing
    * executor-side, so the resource the limit actually protects here is
    * the DRIVER's result collection: an over-limit request ERRORS like the
    * reference instead of materializing millions of bucket rows.
    */
  final case class AggLimits(maxBuckets: Long = 65000)

  final class AggLimitExceeded(actual: Long, limit: Long)
    extends RuntimeException(
      s"aggregation produced > $limit buckets (observed >= $actual); " +
        "raise AggLimits.maxBuckets or narrow the request " +
        "(agg_limits.rs bucket_limit semantics)")

  /** Enforce [[AggLimits]] on a compiled bucket frame: probe at most
    * limit+1 group rows (bounded driver residency — the shuffle itself is
    * unaffected) and error past the limit.
    */
  private def enforceLimits(buckets: DataFrame, limits: Option[AggLimits]): Unit =
    limits.foreach { l =>
      val probe = buckets.limit(math.min(l.maxBuckets + 1, Int.MaxValue.toLong).toInt).count()
      if (probe > l.maxBuckets) throw new AggLimitExceeded(probe, l.maxBuckets)
    }

  /** Compile the request to one Spark plan: filter → (groupBy | rollup) over
    * all bucket keys → metric aggs → ordered by keys (nulls last, so leaf
    * rows sort before their ancestors' summary rows).
    *
    * `limits` (None = unchecked, the historical behavior) applies the
    * `agg_limits.rs` bucket-count guardrail before returning.
    */
  def run(df: DataFrame, req: AggRequest, limits: Option[AggLimits] = None): DataFrame = {
    require(req.buckets.nonEmpty || req.metrics.nonEmpty, "empty agg request")
    val base = req.filter.map(df.where).getOrElse(df)
    val keyCols = req.buckets.map(b => b.key.as(b.name))
    val aggs = req.metrics.map(m => m.expr.as(m.name))
    val grouped =
      if (req.buckets.isEmpty) base.agg(aggs.head, aggs.tail: _*)
      else {
        val g = if (req.withAncestorLevels) base.rollup(keyCols: _*)
                else base.groupBy(keyCols: _*)
        g.agg(aggs.head, aggs.tail: _*)
      }
    if (req.buckets.isEmpty) grouped
    else {
      enforceLimits(grouped, limits)
      grouped.orderBy(req.buckets.map(b => asc_nulls_last(b.name)): _*)
    }
  }

  /** Full ES histogram request semantics (`bucket/histogram/histogram.rs`):
    *
    *  - values outside `hardBounds` are never collected (per-value
    *    `bounds.contains` = min <= v <= max, `histogram.rs:251-253,421-424`);
    *  - with `minDocCount == 0` (the default) the bucket axis is GAP-FREE:
    *    from the min/max collected bucket key, widened by `extendedBounds`,
    *    clamped by `hardBounds` (`get_req_min_max`, `histogram.rs:554-572`),
    *    one bucket per position in [floor((min-offset)/interval),
    *    floor((max-offset)/interval)] (`generate_bucket_pos_with_opt_minmax`,
    *    `histogram.rs:574-587`), empty buckets carrying count 0;
    *  - with `minDocCount > 0` empty buckets are filtered instead
    *    (`histogram.rs:64-66`), and combining it with extendedBounds is a
    *    request error (`histogram.rs:183-186`), as is extendedBounds outside
    *    hardBounds (`histogram.rs:189-195`).
    *
    * Scale shape: ONE groupBy over bucket ordinals; the gap fill is a
    * single-row bounds aggregate exploded through `sequence` and
    * left-joined — the bucket axis is sized by range/interval, never by
    * data volume, so the join's build side stays broadcast-sized at 100 TB.
    */
  def histogram(df: DataFrame, field: String, interval: Double,
      offset: Double = 0.0, minDocCount: Long = 0,
      extendedBounds: Option[(Double, Double)] = None,
      hardBounds: Option[(Double, Double)] = None,
      metrics: Seq[MetricAgg] = Seq(MetricAgg.count),
      name: String = "bucket"): DataFrame = {
    require(interval > 0, "interval must be positive")
    require(minDocCount == 0 || extendedBounds.isEmpty,
      "Cannot set min_doc_count and extended_bounds at the same time")
    for (eb <- extendedBounds; hb <- hardBounds)
      require(eb._1 >= hb._1 && eb._2 <= hb._2,
        "extended_bounds have to be inside hard_bounds")
    def ordOf(x: Double): Long = math.floor((x - offset) / interval).toLong
    val v = col(field).cast("double")
    // only existing values are collected (the reference iterates fast-field
    // values; docs without one contribute no bucket)
    val nonNull = df.where(v.isNotNull)
    val collected = hardBounds
      .map { case (lo, hi) => nonNull.where(v >= lo && v <= hi) }.getOrElse(nonNull)
    // internal doc count drives minDocCount and the empty-bucket fill even
    // when the caller's metric list has no count
    val aggs = count(lit(1)).as("__cnt") +: metrics.map(m => m.expr.as(m.name))
    val grouped = collected
      .groupBy(floor((v - offset) / interval).cast("long").as("__ord"))
      .agg(aggs.head, aggs.tail: _*)
    val keyCol = (col("__ord").cast("double") * interval + offset).as(name)
    val outCols = keyCol +: metrics.map { m =>
      // ES reports doc_count 0 on filled buckets; other metrics stay NULL
      if (m.isCount) coalesce(col(m.name), lit(0L)).as(m.name) else col(m.name)
    }
    if (minDocCount > 0)
      grouped.where(col("__cnt") >= minDocCount).select(outCols: _*).orderBy(name)
    else {
      // floor is monotone, so clamping at ordinal granularity equals the
      // reference's clamp on keys followed by ordinal conversion
      var lo = min(col("__ord")).cast("long")
      var hi = max(col("__ord")).cast("long")
      for ((l, h) <- extendedBounds) {
        lo = least(coalesce(lo, lit(ordOf(l))), lit(ordOf(l)))
        hi = greatest(coalesce(hi, lit(ordOf(h))), lit(ordOf(h)))
      }
      for ((l, h) <- hardBounds) {
        // greatest/least SKIP nulls in Spark; an empty collection without
        // extended_bounds must stay null (reference: f64::MAX/f64::MIN
        // sentinels make min > max => no buckets, histogram.rs:554-572)
        lo = when(lo.isNull, lo).otherwise(greatest(lo, lit(ordOf(l))))
        hi = when(hi.isNull, hi).otherwise(least(hi, lit(ordOf(h))))
      }
      val axis = grouped.agg(lo.as("lo"), hi.as("hi"))
        .where(col("lo").isNotNull && col("lo") <= col("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("__ord"))
      axis.join(grouped, Seq("__ord"), "left").select(outCols: _*).orderBy(name)
    }
  }

  /** `parse_into_milliseconds` (`bucket/histogram/date_histogram.rs:
    * 180-213`): "<digits><unit>", units ms/s/m/h/d (with long aliases);
    * calendar units are NOT accepted — the reference only supports
    * fixed_interval (`date_histogram.rs:40-54`, calendar_interval errors).
    */
  def parseFixedInterval(input: String): Long = {
    val digits = input.takeWhile(_.isDigit)
    require(digits.nonEmpty, s"number missing in interval: $input")
    val unit = input.drop(digits.length)
    require(unit.nonEmpty, s"unit missing in interval: $input")
    val unitMs = unit match {
      case "ms" | "milliseconds" => 1L
      case "s" | "seconds"       => 1000L
      case "m" | "minutes"       => 60L * 1000
      case "h" | "hours"         => 60L * 60 * 1000
      case "d" | "days"          => 24L * 60 * 60 * 1000
      case other => throw new IllegalArgumentException(s"unit not recognized: $other")
    }
    digits.toLong * unitMs
  }

  /** `parse_offset_into_milliseconds` (`date_histogram.rs:190-208`): an
    * optionally signed fixed interval — "-1h" shifts buckets back an hour.
    */
  def parseOffset(input: String): Long = {
    require(input.nonEmpty, "invalid offset: empty")
    input.charAt(0) match {
      case '-' => -parseFixedInterval(input.substring(1))
      case '+' => parseFixedInterval(input.substring(1))
      case _   => parseFixedInterval(input)
    }
  }

  /** The reference's date_histogram (`bucket/histogram/date_histogram.rs`):
    * fixed_interval ONLY, compiled to a plain histogram over epoch
    * milliseconds (`date_histogram.rs:124`, interval in ms) — bucket keys
    * are epoch-ms doubles, ES response shape. All histogram request options
    * (offset/min_doc_count/bounds, also in ms) compose unchanged.
    */
  def dateHistogram(df: DataFrame, field: String, fixedInterval: String,
      offsetMs: Long = 0, minDocCount: Long = 0,
      extendedBoundsMs: Option[(Double, Double)] = None,
      hardBoundsMs: Option[(Double, Double)] = None,
      metrics: Seq[MetricAgg] = Seq(MetricAgg.count),
      name: String = "key"): DataFrame = {
    val ms = parseFixedInterval(fixedInterval).toDouble
    // cast covers TIMESTAMP_NTZ parquet columns: under the UTC session tz
    // the wall time is read as UTC, matching DuckDB's epoch_ms
    histogram(df.withColumn("__dh_ms",
        unix_millis(col(field).cast("timestamp")).cast("double")),
      "__dh_ms", ms, offsetMs.toDouble, minDocCount,
      extendedBoundsMs, hardBoundsMs, metrics, name)
  }

  /** ES calendar_interval date_histogram (month/quarter/year/week...).
    * BEYOND the reference: tantivy's date_histogram rejects
    * calendar_interval (`date_histogram.rs:40-54`) — this is the
    * ES-compatible extension a pipeline needs for month-level rollups,
    * expressed as `date_trunc` so Catalyst keeps it one map-side expression
    * + one shuffle.
    */
  def calendarDateHistogram(df: DataFrame, field: String, unit: String,
      metrics: Seq[MetricAgg] = Seq(MetricAgg.count),
      name: String = "key"): DataFrame = {
    val aggs = metrics.map(m => m.expr.as(m.name))
    df.where(col(field).isNotNull)
      .groupBy(date_trunc(unit, col(field).cast("timestamp")).as(name))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(name)
  }

  /** ES terms request surface (`bucket/term_agg.rs`: `size`, `order`,
    * `min_doc_count`; `bucket/term_missing_agg.rs`: `missing` buckets the
    * null-valued docs under a replacement key). One groupBy; the size cut is
    * orderBy+limit — Spark's TakeOrdered after partial aggregation is the
    * same network shape as the reference's per-segment top cut merged
    * globally.
    */
  def terms(df: DataFrame, field: String, name: String = "key",
      size: Int = Int.MaxValue, orderByCountDesc: Boolean = true,
      minDocCount: Long = 1, missing: Option[String] = None,
      metrics: Seq[MetricAgg] = Nil,
      orderByMetric: Option[(String, Boolean)] = None): DataFrame = {
    val key = missing
      .map(m => coalesce(col(field).cast("string"), lit(m))).getOrElse(col(field))
    // without `missing`, docs with no value produce NO bucket (the
    // reference's term agg iterates existing values only; only
    // term_missing_agg buckets the null docs)
    val base = if (missing.isDefined) df else df.where(col(field).isNotNull)
    val aggs = count(lit(1)).as("cnt") +: metrics.map(m => m.expr.as(m.name))
    var out = base.groupBy(key.as(name)).agg(aggs.head, aggs.tail: _*)
    if (minDocCount > 1) out = out.where(col("cnt") >= minDocCount)
    // ES `order` may name a metric sub-aggregation (`term_agg.rs` order by
    // sub-agg): sort buckets by that metric column, key ascending as the
    // tie-break — still one shuffle + TakeOrdered when sized.
    out = orderByMetric match {
      case Some((m, descending)) =>
        out.orderBy(if (descending) desc(m) else asc(m), asc(name))
      case None =>
        if (orderByCountDesc) out.orderBy(desc("cnt"), asc(name))
        else out.orderBy(asc(name))
    }
    if (size != Int.MaxValue) out.limit(size) else out
  }

  /** ES terms response bookkeeping (`bucket/term_agg.rs:85-92,125-126`):
    * `sum_other_doc_count` = docs not covered by the returned top-`size`
    * buckets, `doc_count_error_upper_bound` = 0 because this engine
    * computes the cut over the full exact aggregate (one shuffle +
    * TakeOrdered), never per-shard approximations — the same value the
    * reference reports when its segment cutoffs drop nothing. Emitted as
    * per-row constant columns (the flat twin of ES's agg-level fields).
    */
  def termsWithErrorBounds(df: DataFrame, field: String,
      name: String = "key", size: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(field).isNotNull)
    val total = base.agg(count(lit(1)).as("__total"))
    val buckets = base.groupBy(col(field).as(name))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(name)).limit(size)
    // the window spans only the <= size returned rows — driver-tiny
    buckets.crossJoin(broadcast(total))
      .withColumn("sum_other_doc_count",
        col("__total") - sum("cnt").over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("doc_count_error_upper_bound", lit(0L))
      .drop("__total")
      .orderBy(desc("cnt"), asc(name))
  }

  /** The reference's SEGMENT-CUTOFF approximation mode (`bucket/term_agg.rs:
    * 78-94` and `segment_size`/`shard_size` at `:214-225`): each segment
    * reports only its top `segmentSize` terms by count, so merged
    * doc_counts may UNDERCOUNT, and the response carries the bookkeeping a
    * caller asserting ES-style bounds expects:
    *  - `doc_count_error_upper_bound` = Σ over segments of the first
    *    UNREPORTED count (the (segmentSize+1)-th entry, 0 if the segment
    *    had no more; `cut_off_buckets` `:760-775`, assigned `:740`) — the
    *    per-segment bounds SUM unconditionally at merge
    *    (`intermediate_agg_result.rs:558-559`);
    *  - `sum_other_doc_count` = the per-segment cut sums plus the final
    *    `size` cut (`intermediate_agg_result.rs:715-722`), which
    *    telescopes to total − Σ(returned doc_counts).
    * Segment identity is the caller-supplied deterministic `shard`
    * expression (the index path would pass segId). Per-segment ties cut by
    * (count desc, key asc) for determinism — the reference's unstable sort
    * leaves equal-count ties unspecified. The exact path
    * ([[termsWithErrorBounds]]) reports bound 0; this one exhibits the
    * reference's approximation semantics end to end.
    */
  def termsApproxCutoff(df: DataFrame, field: String, shard: Column,
      name: String = "key", size: Int, segmentSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.where(col(field).isNotNull)
    // per-shard full counts, then the shard-local cutoff rank; each window
    // partition holds one shard's distinct keys (vocabulary-bounded)
    val perShard = base.groupBy(shard.as("__shard"), col(field).as(name))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("__shard").orderBy(desc("cnt"), asc(name))
    val ranked = perShard.withColumn("__rk", row_number().over(w))
    val bound = ranked.where(col("__rk") === segmentSize + 1)
      .agg(coalesce(sum("cnt"), lit(0L)).as("__err"))
    val total = base.agg(count(lit(1)).as("__total"))
    val merged = ranked.where(col("__rk") <= segmentSize)
      .groupBy(col(name)).agg(sum("cnt").as("doc_count"))
      .orderBy(desc("doc_count"), asc(name)).limit(size)
    // the final window spans only the <= size returned rows — driver-tiny
    merged.crossJoin(broadcast(bound)).crossJoin(broadcast(total))
      .withColumn("sum_other_doc_count",
        col("__total") - sum("doc_count").over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("doc_count_error_upper_bound", col("__err"))
      .drop("__total", "__err")
      .orderBy(desc("doc_count"), asc(name))
  }

  /** A node of an arbitrary sub-aggregation TREE (`agg_req.rs:120-171`):
    * a bucket agg carrying its own metric sub-aggs plus any number of
    * SIBLING child bucket aggs — the shape a chain cannot express.
    */
  final case class AggNode(bucket: BucketAgg, metrics: Seq[MetricAgg] = Nil,
      children: Seq[AggNode] = Nil)

  /** Compile an aggregation forest to ONE Spark pass via GROUPING SETS:
    * every tree node contributes the grouping set {ancestor keys + own key},
    * so sibling sub-aggregations (terms > {histogram, date_histogram}) run
    * in a single shuffle instead of one job per branch — the Spark-native
    * equivalent of the reference's one-segment-walk tree collector
    * (`src/aggregation/segment_agg_result.rs`). Output is flat: `agg_path`
    * labels the node ("a>b"), inactive key columns are NULL, and every
    * requested metric column is computed for every set (well-defined per
    * group; ES reports the node's own subset — project downstream if
    * needed).
    */
  def runTree(df: DataFrame, roots: Seq[AggNode],
              filter: Option[Column] = None,
              limits: Option[AggLimits] = None): DataFrame = {
    require(roots.nonEmpty, "empty agg forest")
    // DFS: collect (path of bucket names, node) for every node
    def walk(n: AggNode, prefix: Seq[BucketAgg]): Seq[(Seq[BucketAgg], AggNode)] = {
      val path = prefix :+ n.bucket
      (path, n) +: n.children.flatMap(walk(_, path))
    }
    val nodes = roots.flatMap(walk(_, Nil))
    val keyOrder: Seq[BucketAgg] = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, BucketAgg]
      nodes.foreach { case (path, _) => path.foreach(b =>
        if (!seen.contains(b.name)) seen(b.name) = b) }
      seen.values.toSeq
    }
    require(keyOrder.map(_.name).distinct.length == keyOrder.length,
      "bucket names must be unique across the tree")
    val metricByName = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    nodes.foreach { case (_, n) => n.metrics.foreach(m =>
      metricByName.getOrElseUpdate(m.name, m.expr)) }
    require(metricByName.nonEmpty, "agg tree needs at least one metric")

    val base = filter.map(df.where).getOrElse(df)
    // pre-project the key exprs so grouping sets reference plain columns
    val projected = keyOrder.foldLeft(base)((d, b) => d.withColumn(b.name, b.key))
    val keyCols = keyOrder.map(b => col(b.name))
    val sets: Seq[Seq[Column]] = nodes.map { case (path, _) => path.map(b => col(b.name)) }
    // grouping_id bit i (MSB-first over the listed grouping columns) is 1
    // when that column is aggregated away — compute each node's expected id
    def gidOf(path: Seq[BucketAgg]): Long = {
      val active = path.map(_.name).toSet
      keyOrder.foldLeft(0L)((acc, b) => (acc << 1) | (if (active(b.name)) 0L else 1L))
    }
    val pathLabel = nodes.foldRight(lit(null: String)) { case ((path, _), rest) =>
      when(grouping_id() === gidOf(path), lit(path.map(_.name).mkString(">")))
        .otherwise(rest)
    }
    // grouping_id() is only resolvable inside the aggregate list, so the
    // path label is computed as the first agg expression
    val aggs = pathLabel.as("agg_path") +:
      metricByName.toSeq.map { case (n, e) => e.as(n) }
    val out = projected
      .groupingSets(sets, keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((col("agg_path") +: keyCols) ++ metricByName.keys.map(col): _*)
    enforceLimits(out, limits)
    out.orderBy(asc("agg_path") +: keyOrder.map(b => asc_nulls_last(b.name)): _*)
  }

  /** The ES-shaped nested response: leaf rows regrouped so each parent
    * bucket carries an array<struct> of its child buckets — for API parity
    * demonstrations and tests (array columns are not driver-comparable, so
    * oracle entries use the flat `run` form).
    */
  def tree(df: DataFrame, req: AggRequest): DataFrame = {
    require(req.buckets.length >= 2, "tree needs >= 2 bucket levels")
    val flat = run(df, req.copy(withAncestorLevels = false))
    val parents = req.buckets.init.map(_.name)
    val leaf = req.buckets.last.name
    val childStruct = struct((col(leaf) +: req.metrics.map(m => col(m.name))): _*)
    flat.groupBy(parents.map(col): _*)
      .agg(sort_array(collect_list(childStruct)).as("buckets"))
      .orderBy(parents.map(asc): _*)
  }
}
