package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k. One codegen'd scan — dot product
  *    via `zip_with` + `aggregate` (no UDF), `ORDER BY ... LIMIT k` lowered
  *    by Catalyst to TakeOrderedAndProject (per-partition heaps + driver
  *    merge, no global sort shuffle). This is the correctness baseline and
  *    is already optimal for one query over N vectors.
  *  - `lshBuckets` / `lshTopK`: random-hyperplane LSH (Charikar, STOC 2002).
  *    Each vector maps to a b-bit signature; the query probes its own bucket
  *    plus all Hamming-distance-1 buckets. At 100 TB the bucketed table is
  *    written partitioned by `bucket`, so a probe is a partition-pruned scan
  *    of ~ (b+1)/2^b of the data instead of a full pass. Hyperplanes are
  *    deterministic integer-arithmetic pseudo-vectors (no RNG state), so any
  *    two builds — and the SQL oracle — agree on every bucket.
  */
object Similarity {

  import TextOps.P

  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Exact cosine top-k against one query vector. Output (id, cosine) with
    * cosine rounded to 6 decimals and ties broken by ascending id — a total
    * order, so LIMIT is deterministic.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val qn = math.sqrt(query.map(x => x * x).sum)
    df.select(col(idCol).cast("long").as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("cosine", round(dot(col("v"), q) / (norm(col("v")) * lit(qn)), 6))
      .select("vec_id", "cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  // ---------------------------------------------------------------- LSH

  val NumPlanes = 8

  /** Deterministic pseudo-random hyperplane component j,d in [-1, 1):
    * integer LCG-style mixing mod P, scaled. Replayable in SQL.
    */
  def planeComponent(j: Int, d: Int): Double = {
    val x = ((j * 131L + d) * 2654435761L + 1013904223L) % P
    (x.toDouble / P) * 2.0 - 1.0
  }

  /** b-bit signature: bit j = 1 iff v . plane_j >= 0. */
  def bucketOf(vec: Column): Column = {
    (0 until NumPlanes).map { j =>
      val plane = array((0 until 64).map(d => lit(planeComponent(j, d))): _*)
      when(dot(vec, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Assign every vector to its LSH bucket: (id, bucket, v). At scale this
    * is the build side, written partitioned by bucket.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", bucketOf(col("v")))

  /** The scale path's build side: write the bucketed table PARTITIONED BY
    * bucket, so a probe is a partition-pruned scan of ~(b+1)/2^b of the
    * data — the directory layout IS the index.
    */
  def writeBucketed(df: DataFrame, idCol: String, vecCol: String, path: String): Unit =
    lshBuckets(df, idCol, vecCol)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** ANN top-k over a `writeBucketed` table: the `bucket IN probes`
    * predicate prunes to b+1 partition directories before any row is read.
    */
  def lshTopKBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                      query: Array[Double], k: Int): DataFrame = {
    val probes = probeBuckets(query)
    val qn = math.sqrt(query.map(x => x * x).sum)
    val q = array(query.map(lit): _*)
    spark.read.parquet(path)
      .where(col("bucket").isin(probes: _*))
      .withColumn("cosine", round(dot(col("v"), q) / (norm(col("v")) * lit(qn)), 6))
      .select("vec_id", "cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** The query's own bucket plus all neighbors within Hamming distance
    * `radius` (the probe-radius knob: radius 0 = own bucket only, 1 =
    * 1 + NumPlanes buckets — the default — 2 adds the C(NumPlanes, 2)
    * two-bit flips, trading scan fraction for recall).
    */
  def probeBuckets(query: Array[Double], radius: Int = 1): Seq[Long] = {
    var s = 0L
    for (j <- 0 until NumPlanes) {
      val d = (0 until query.length)
        .map(i => query(i) * planeComponent(j, i)).sum
      if (d >= 0) s |= (1L << j)
    }
    (0L until (1L << NumPlanes))
      .filter(m => java.lang.Long.bitCount(m) <= radius)
      .map(m => s ^ m)
  }

  /** Adaptive probe radius: the smallest Hamming radius whose probe set
    * covers at least `targetScanFrac` of the bucket space (expected scan
    * fraction = Σ_{i<=r} C(b, i) / 2^b under near-uniform occupancy, which
    * random hyperplanes approach on isotropic data) — the caller states a
    * scan BUDGET and the engine derives the radius. Pure arithmetic on
    * (NumPlanes, targetScanFrac): no data pass, deterministic, replayable
    * by any engine, and stable as the corpus grows (the budget is a
    * fraction, not a row count).
    */
  def radiusForScanFraction(targetScanFrac: Double): Int = {
    val total = 1L << NumPlanes
    val want = targetScanFrac * total
    var covered = 0L
    var r = 0
    covered += 1 // C(b, 0)
    while (covered < want && r < NumPlanes) {
      r += 1
      covered += choose(NumPlanes, r)
    }
    r
  }

  private def choose(n: Int, k: Int): Long = {
    var acc = 1L
    for (i <- 1 to k) acc = acc * (n - i + 1) / i
    acc
  }

  /** [[lshTopK]] with the radius derived from a target scan fraction. */
  def lshTopKAdaptive(df: DataFrame, idCol: String, vecCol: String,
                      query: Array[Double], k: Int,
                      targetScanFrac: Double): DataFrame =
    lshTopK(df, idCol, vecCol, query, k, radiusForScanFraction(targetScanFrac))

  /** ANN top-k: probe the query's bucket and all Hamming-<=radius
    * neighbors, rank probed candidates by exact cosine. Recall < 1 by
    * construction (that is the approximation); candidates scanned
    * ~ Σ_{i<=radius} C(b, i) / 2^b of the corpus.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Double], k: Int, radius: Int = 1): DataFrame = {
    val probes = probeBuckets(query, radius)
    val qn = math.sqrt(query.map(x => x * x).sum)
    val q = array(query.map(lit): _*)
    lshBuckets(df, idCol, vecCol)
      .where(col("bucket").isin(probes: _*))
      .withColumn("cosine", round(dot(col("v"), q) / (norm(col("v")) * lit(qn)), 6))
      .select("vec_id", "cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  // ---------------------------------------------------------------- IVF

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path (Jégou,
    * Douze, Schmid: "Product Quantization for Nearest Neighbor Search",
    * IEEE TPAMI 2011, §IV): K spherical-k-means centroids; every vector is
    * assigned to its most-cosine-similar centroid's list; a query ranks the
    * centroids, probes the `nProbe` nearest lists, and re-ranks only those
    * by exact cosine. Candidates scanned ~ nProbe/K of the corpus, and the
    * assigned table written `partitionBy("cid")` makes each probe a
    * partition-pruned directory scan, like the LSH layout above.
    *
    * Training is DETERMINISTIC: seeds = the K lowest vec_ids' unit vectors,
    * then `iters` Lloyd rounds (assign by max dot, re-center by per-
    * dimension mean, re-normalize). No RNG state — two builds agree on
    * every assignment. Each round is one argmax projection plus one
    * (cid, dim)-grouped aggregate; centroids (K x dim doubles) stay
    * broadcast-sized at any corpus scale.
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): Array[(Int, Array[Double])] = {
    val base = unitVecs(df, idCol, vecCol).cache()
    // deterministic seeds: the K lowest ids (no RNG; reference-free)
    var centroids: Array[(Int, Array[Double])] =
      base.orderBy(asc("vec_id")).limit(k).collect()
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    var it = 0
    while (it < iters) {
      val assigned = base.withColumn("cid", assignExpr(col("v"), centroids))
      val sums = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cid", "d").agg(avg("x").as("m"))
        .collect()
      val byCid = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val m = new Array[Double](old.length)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            val n = math.sqrt(m.map(x => x * x).sum)
            (cid, if (n > 0) m.map(_ / n) else old) // empty-safe re-center
          case None => (cid, old) // empty list keeps its centroid
        }
      }
      it += 1
    }
    base.unpersist()
    centroids
  }

  /** argmax_cid dot(v, centroid_cid) as a codegen'd expression: greatest
    * over (rounded dot, cid) structs — lexicographic struct order makes the
    * tie-break (higher cid) explicit and deterministic.
    */
  private def assignExpr(v: Column, centroids: Array[(Int, Array[Double])]): Column =
    if (centroids.length == 1) lit(centroids(0)._1) // greatest() needs >= 2 args
    else greatest(centroids.map { case (cid, c) =>
      struct(round(dot(v, array(c.map(lit): _*)), 9).as("d"), lit(cid).as("cid"))
    }: _*)("cid")

  private def unitVecs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
      .where(col("n") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("v"))

  /** Assignment table (vec_id, cid, v) — at scale, write it
    * `partitionBy("cid")` so probes prune directories.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: Array[(Int, Array[Double])]): DataFrame =
    unitVecs(df, idCol, vecCol).withColumn("cid", assignExpr(col("v"), centroids))

  /** The nProbe most-query-similar centroid ids (ranked by dot with the
    * unit query, ties by ascending cid) — shared by ivfTopK and the
    * recall/coverage measurement so both always probe the same lists.
    */
  def ivfProbes(centroids: Array[(Int, Array[Double])],
                query: Array[Double], nProbe: Int): Seq[Int] = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qhat = query.map(_ / qn)
    centroids
      .map { case (cid, c) => (cid, c.zip(qhat).map { case (a, b) => a * b }.sum) }
      .sortBy { case (cid, d) => (-d, cid) }
      .take(nProbe).map(_._1).toSeq
  }

  /** IVF ANN top-k: probe the nProbe most-similar centroid lists, exact
    * cosine re-rank within them. On unit vectors cosine == dot.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              centroids: Array[(Int, Array[Double])],
              query: Array[Double], k: Int, nProbe: Int): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qhat = query.map(_ / qn)
    val probes = ivfProbes(centroids, query, nProbe)
    val q = array(qhat.map(lit): _*)
    ivfAssign(df, idCol, vecCol, centroids)
      .where(col("cid").isin(probes: _*))
      .withColumn("cosine", round(dot(col("v"), q), 6))
      .select("vec_id", "cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
