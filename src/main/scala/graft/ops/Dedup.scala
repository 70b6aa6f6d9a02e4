package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, bag-of-words
  * exact, MinHash + LSH near-dup, SimHash fingerprints, and n-gram Jaccard.
  *
  * Scale design (the 100 TB contract):
  *  - Exact dedup is one hash-groupBy — Spark's sort-based shuffle with
  *    map-side partial aggregation; the group key is a 128-bit digest, so
  *    the shuffle carries ~48 bytes/doc, not the documents.
  *  - MinHash signatures are computed map-side (one pass per doc, no
  *    shuffle); the LSH banding join shuffles only (band, 4 x 8-byte sig)
  *    keys. Candidate verification joins token sets ONLY for candidate
  *    pairs (semi-join on the candidate list), never all pairs.
  *  - SimHash is map-side only; pairing via banding of the fingerprint.
  *  - All hash math is integer arithmetic mod P (see TextOps.charHash) so
  *    the DuckDB oracle replays it exactly.
  */
object Dedup {

  import TextOps.{P, charHash, tokens}

  // ---------------------------------------------------------------- exact

  /** Exact-duplicate groups by content digest. Returns one row per distinct
    * content: (keep_id = min doc id, cnt). Downstream `cnt > 1` filters to
    * actual dup groups; keeping all groups makes the operator double as the
    * canonical-id assignment step of a dedup pipeline.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).cast("long").as("keep_id"), count(lit(1)).as("cnt"))
      .select("keep_id", "cnt")

  /** Bag-of-words exact dedup: key = sorted distinct token set. Catches
    * reordered/repeated-word duplicates that byte-exact dedup misses.
    * The key is md5-digested map-side so the shuffle key stays fixed-width
    * (32 chars) no matter how long the documents are.
    */
  def bagGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(array_join(array_sort(array_distinct(tokens(col(textCol)))), " ")).as("bag"))
      .agg(min(col(idCol)).cast("long").as("keep_id"), count(lit(1)).as("cnt"))
      .select("keep_id", "cnt")

  // ---------------------------------------------------------------- MinHash

  val NumPerms = 16
  val BandRows = 4 // 4 bands x 4 rows

  /** Permutation i: h_i(x) = (a_i * x + b_i) mod P over the token char-hash.
    * a_i odd-ish and < P, so products stay < 2^62.
    */
  def permA(i: Int): Long = ((i + 1) * 1103515245L) % P
  def permB(i: Int): Long = (i * 12345L + 6789L) % P

  /** MinHash signature, long format: (doc_id, perm, minh) — min over the
    * DISTINCT token set of h_perm(charHash(token)). Map-side only: the
    * per-doc signature is a single `transform` over a 16-element literal
    * array; no shuffle, no driver state.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = signatureArray(col(textCol))
    df.select(col(idCol).cast("long").as("doc_id"), posexplode(sig).as(Seq("perm", "minh")))
      .select(col("doc_id"), col("perm").cast("long").as("perm"), col("minh"))
  }

  /** array<long> of NumPerms minhash values for one text column. */
  def signatureArray(text: Column): Column = {
    val tokHashes = transform(array_distinct(tokens(text)), t => charHash(t))
    val perms = array((0 until NumPerms).map(lit): _*)
    transform(perms, i =>
      aggregate(tokHashes, lit(P),
        (acc, h) => least(acc, (element_at(lit((0 until NumPerms).map(permA).toArray), i + 1) * h
          + element_at(lit((0 until NumPerms).map(permB).toArray), i + 1)) % P)))
  }

  /** LSH banding: doc -> (band, bandKey) where bandKey concatenates the
    * band's BandRows signature values. Docs sharing any band key are
    * candidate pairs (prob. of sharing a band = 1-(1-j^r)^b, the classic
    * S-curve: r=4, b=4 centers the cutoff near j ~ 0.7).
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = signatureArray(col(textCol))
    val nBands = NumPerms / BandRows
    df.select(col(idCol).cast("long").as("doc_id"), sig.as("sig"))
      .select(col("doc_id"), posexplode(
        transform(array((0 until nBands).map(lit): _*), b =>
          concat_ws(",", slice(col("sig"), b * BandRows + 1, lit(BandRows))))).as(Seq("band", "key")))
  }

  /** Near-duplicate pairs: LSH candidates (same band key), verified by exact
    * token-set Jaccard >= `threshold`. Output (a, b, jaccard round 6), a < b.
    *
    * The verification join ships token-set SIZES with the candidate pair and
    * computes |intersection| by joining the exploded token tables semi-joined
    * to candidates — at scale this touches only candidate docs.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val bands = minhashBands(df, idCol, textCol).alias("l")
    val r = minhashBands(df, idCol, textCol).alias("r")
    val cand = bands.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    verifyJaccard(df, idCol, textCol, cand, threshold)
  }

  /** Exact token-set Jaccard for a candidate pair list (a, b). */
  def verifyJaccard(df: DataFrame, idCol: String, textCol: String,
                    cand: DataFrame, threshold: Double): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("t"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(toks.withColumnRenamed("doc_id", "a").withColumnRenamed("t", "ta"), Seq("a"))
      .join(toks.withColumnRenamed("doc_id", "b").withColumnRenamed("t", "tb"), Seq("b"))
      .where(col("ta") === col("tb"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), Seq("b"))
      .withColumn("jaccard",
        round(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // ---------------------------------------------------------------- SimHash

  val SimBits = 32

  def simA(j: Int): Long = ((2 * j + 1) * 2654435761L) % P
  def simB(j: Int): Long = (j * 97531L + 12345L) % P

  /** Charikar SimHash over token term frequencies: for each bit j, sum
    * tf * (+1 if bit_j(token) else -1) over the doc's tokens; fingerprint
    * bit j is set iff the sum is positive. bit_j(token) =
    * ((charHash(token) * A_j + B_j) mod P) mod 2. Map-side only.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // (token, tf) pairs per doc without a shuffle: aggregate over the sorted
    // token array is possible but opaque; explode + per-doc groupBy keeps it
    // readable and the shuffle key is (doc, token) — uniformly distributed.
    val tf = df.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .withColumn("th", charHash(col("t")))
    val bits = tf.select(col("doc_id"), col("tf"), col("th"),
        explode(sequence(lit(0), lit(SimBits - 1))).as("j"))
      .withColumn("aj", element_at(lit((0 until SimBits).map(simA).toArray), col("j") + 1))
      .withColumn("bj", element_at(lit((0 until SimBits).map(simB).toArray), col("j") + 1))
      .withColumn("contrib",
        col("tf") * (((col("th") * col("aj") + col("bj")) % P % 2) * 2 - 1))
      .groupBy("doc_id", "j").agg(sum("contrib").as("s"))
    bits.groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), cast(j as int))"))
        .otherwise(0L)).as("simhash"))
      .select(col("doc_id"), col("simhash").cast("long").as("simhash"))
  }

  /** SimHash near-dup pairs via fingerprint banding: the SimBits-bit
    * fingerprint splits into `SimBands` bands; docs sharing any band value
    * are candidates (shuffle key = (band, value) — never all pairs), then
    * the exact Hamming distance is verified on candidates only.
    *
    * Pigeonhole guarantee: two fingerprints within Hamming distance
    * `SimBands - 1` (= 3 here) MUST agree on at least one whole band, so for
    * maxHamming <= SimBands - 1 the banded path has recall exactly 1.0 vs
    * the quadratic all-pairs scan — the approximate blocking is
    * oracle-CHECKABLE, not rows-only. Output (a, b, hamming), a < b.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = SimBands - 1): DataFrame = {
    require(maxHamming <= SimBands - 1,
      s"banding only guarantees recall 1.0 up to Hamming ${SimBands - 1}")
    val bandBits = SimBits / SimBands
    val fp = simhash(df, idCol, textCol).cache()
    val bands = fp.select(col("doc_id"), posexplode(
      array((0 until SimBands).map(k =>
        shiftright(col("simhash"), k * bandBits).bitwiseAND(lit((1L << bandBits) - 1))): _*))
      .as(Seq("band", "key")))
    val cand = bands.as("l")
      .join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    cand
      .join(fp.select(col("doc_id").as("a"), col("simhash").as("fa")), Seq("a"))
      .join(fp.select(col("doc_id").as("b"), col("simhash").as("fb")), Seq("b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  val SimBands = 4

  // ---------------------------------------------------------------- n-gram Jaccard

  /** Token n-gram (shingle) arrays: hash each n-token window. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(transform(sequence(lit(1), greatest(size(t) - (n - 1), lit(0))),
      i => charHash(concat_ws(" ", slice(t, i, lit(n))))))
  }

  /** n-gram Jaccard near-dup pairs >= threshold. Candidates = pairs sharing
    * at least one shingle with document frequency <= `maxShingleDf`
    * (inverted-index blocking with a frequency cut — one boilerplate header
    * shared by 1M docs must not generate O(df^2) candidate rows; the
    * standard winnowing-style cap). The Jaccard itself is then verified
    * EXACTLY over the candidates' full shingle sets, so the cap changes
    * recall only for pairs whose every shared shingle is ultra-hot — which
    * a boilerplate shingle by definition is not evidence of near-duplication
    * anyway. Output (a, b, jaccard).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleDf: Long = 5000L): DataFrame = {
    val sh = df.select(col(idCol).cast("long").as("doc_id"),
      explode(shingles(col(textCol), n)).as("s"))
    // blocking: drop hot shingles BEFORE the self-join (candidate count per
    // shingle is then <= maxShingleDf^2 instead of df^2 on the hottest one)
    val shingleDf = sh.groupBy("s").agg(count(lit(1)).as("sdf"))
    val rare = sh.join(shingleDf.where(col("sdf") <= maxShingleDf).select("s"),
      Seq("s"), "left_semi")
    val cand = rare.withColumnRenamed("doc_id", "a")
      .join(rare.withColumnRenamed("doc_id", "b"), Seq("s"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    // exact verification over the FULL shingle sets, candidates only
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("s", "sa"), Seq("a"))
      .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("s", "sb"), Seq("b"))
      .where(col("sa") === col("sb"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), Seq("b"))
      .withColumn("jaccard",
        round(col("inter") * 1.0 / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // ---------------------------------------------------------------- embedding

  /** Embedding-cosine near-dup pairs >= threshold, SCALE PATH: random-
    * hyperplane LSH blocking (`Similarity.lshBuckets`) with multi-probing —
    * every vector lands in its own bucket plus all Hamming-1 buckets, so
    * two vectors whose signatures differ by <= 2 bits become a candidate
    * pair — followed by EXACT cosine verification of candidates only. No
    * cross join: the shuffle carries (probeBucket, id) rows and the verify
    * join touches candidate vectors only. Recall < 1 by construction (the
    * LSH S-curve); the blocking is deterministic integer arithmetic, so the
    * SQL oracle replays it bit-for-bit.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val base = Similarity.lshBuckets(df, idCol, vecCol)
      .withColumn("nrm", Similarity.norm(col("v")))
    val probeList = array(
      (col("bucket") +: (0 until Similarity.NumPlanes)
        .map(j => col("bucket").bitwiseXOR(lit(1L << j)))): _*)
    val pr = base.select(col("vec_id"), explode(probeList).as("pb"))
    val cand = pr.as("l")
      .join(pr.as("r"), col("l.pb") === col("r.pb") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b")).distinct()
    val va = base.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val vb = base.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(va, Seq("a")).join(vb, Seq("b"))
      .withColumn("cosine", round(
        aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
          / (col("na") * col("nb")), 6))
      .where(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** Near-duplicate CLUSTERS: connected components over an undirected pair
    * table, labels = the component's minimum doc_id (the canonical "keep"
    * representative a training pipeline retains). Docs in no pair are
    * singleton clusters of themselves.
    *
    * Execution is distributed min-label propagation: each round joins the
    * current labels across the edge table and takes the per-node minimum of
    * (own, neighbors') labels; a driver-side count checks convergence.
    * Rounds needed = the component diameter — near-dup components are
    * LSH-verified cliques or near-cliques (diameter 1-2), so this
    * converges in 2-3 rounds on real dedup graphs; `maxIter` bounds
    * adversarial chains (for those, the large-star/small-star rewrite of
    * Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
    * 2014, drops rounds to O(log n) — not needed at clique-like diameters).
    * `localCheckpoint` cuts the loop's lineage so plans stay flat.
    */
  def connectedComponents(docs: DataFrame, idCol: String,
                          pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct().cache()
    var labels = docs.select(col(idCol).cast("long").as("doc_id"))
      .distinct().withColumn("cluster_id", col("doc_id")).localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("src"), col("cluster_id").as("nl")), Seq("src"))
        .groupBy(col("dst").as("doc_id")).agg(min(col("nl")).as("nbl"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbl"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("cluster_id", "old"), Seq("doc_id"))
        .where(col("cluster_id") =!= col("old")).count()
      labels = next
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    edges.unpersist()
    labels
  }

  /** The full near-dup clustering pipeline entry: MinHash-LSH pairs at
    * `threshold` exact-Jaccard, clustered; output (doc_id, cluster_id).
    */
  def minhashClusters(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double): DataFrame =
    connectedComponents(df, idCol, minhashPairs(df, idCol, textCol, threshold))

  /** Exact (quadratic) variant for bounded inputs — the recall baseline the
    * bucketed path is measured against (DedupSpec).
    */
  def embeddingPairsExact(df: DataFrame, idCol: String, vecCol: String,
                          threshold: Double): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("doc_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val l = base.select(col("doc_id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val r = base.select(col("doc_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    l.crossJoin(r).where(col("a") < col("b"))
      .withColumn("cosine", round(
        aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
          / (col("na") * col("nb")), 6))
      .where(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
