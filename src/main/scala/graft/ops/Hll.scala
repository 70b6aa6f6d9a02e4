package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality (Flajolet, Fusy, Gandouet, Meunier: "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm", AofA
  * 2007) — the same algorithm family the reference's cardinality
  * aggregation uses (`src/aggregation/metric/cardinality.rs:7` pulls the
  * `hyperloglogplus` HLL++ crate).
  *
  * Bit-parity with the reference is impossible by construction — its
  * register hash is Rust's salted SipHash `DefaultHasher`
  * (`cardinality.rs:26-31`), not replayable in SQL — so this
  * implementation chooses REPLAYABILITY instead: the value hash is the
  * first 15 hex chars (60 bits) of md5(value-as-string), which Spark and
  * DuckDB compute identically, making every register and the final
  * estimate oracle-checkable bit-for-bit (`agg_cardinality_hll`). That
  * upgrades the round-3 "sketch twin, rows-only" divergence to "same
  * algorithm, deterministic shared hash, hash-gated estimate".
  *
  * Register layout: p = 12 => m = 4096 registers; bucket j = top 12 bits
  * of the 60-bit hash, payload w = the remaining W = 48 bits,
  * rho(w) = W − bitlength(w) + 1 (W + 1 when w = 0). Estimator: the
  * classic alpha_m · m² / Σ 2^(−r_j) with the small-range
  * linear-counting correction (E <= 2.5 m and empty registers present =>
  * m · ln(m / zeros)). No large-range correction is needed below 2^50.
  *
  * Determinism note: Σ 2^(−r_j) is computed as an INTEGER sum of
  * 2^(W+1−r_j) (max 4096 · 2^49 < 2^62), then divided once — a floating
  * sum of 4096 dyadic terms would need 61 mantissa bits and so would
  * depend on partition order; the integer sum is exact under any order
  * and any parallelism.
  *
  * 100 TB shape: registers are a (group, j) → max-rho table — one
  * `groupBy` with map-side partial `max`, mergeable across any
  * partitioning by `max` again (HLL's defining property); the estimate is
  * a per-group fold over <= 4096 register rows.
  */
object Hll {

  val P = 12
  val M: Int = 1 << P // 4096
  val W: Int = 60 - P // 48-bit register payload
  /** alpha_m for m >= 128 (Flajolet et al. §4). */
  val Alpha: Double = 0.7213 / (1 + 1.079 / M)

  /** 60-bit deterministic value hash: md5 hex prefix, identical in Spark
    * and DuckDB for the same string rendering of the value.
    *
    * INPUT DOMAIN: string and integer columns only. The hash is taken over
    * the value's STRING CAST, and Spark and DuckDB agree on that rendering
    * for strings and integers but NOT for double/decimal (scientific-
    * notation thresholds and trailing-zero rules differ) — hash a
    * floating-point column through an explicit canonical rendering (e.g.
    * CAST to BIGINT or a fixed-format format_string) on BOTH sides first.
    */
  def hashCol(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** Grouped cardinality estimate: (groupCol, uniq_hll rounded to 4). */
  def cardinality(df: DataFrame, field: String, groupCol: String): DataFrame = {
    val h = hashCol(col(field))
    val j = shiftright(h, W)
    val w = h.bitwiseAND(lit((1L << W) - 1))
    val rho = when(w === 0, lit(W + 1))
      .otherwise(lit(W + 1) - length(bin(w)).cast("int"))
    val regs = df.where(col(field).isNotNull)
      .select(col(groupCol), j.as("j"), rho.as("rho"))
      .groupBy(col(groupCol), col("j")).agg(max("rho").as("r"))
    // exact integer Σ 2^(W+1−r): empty registers contribute 2^(W+1) each
    val per = regs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("used"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${W + 1} - r AS INT))")).as("si"))
    val zeros = lit(M) - col("used")
    val sumInv = (col("si") + zeros * lit(1L << (W + 1))).cast("double") /
      lit(math.pow(2.0, W + 1))
    val eRaw = lit(Alpha * M.toDouble * M) / sumInv
    val est = when(eRaw <= 2.5 * M && zeros > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double")))
      .otherwise(eRaw)
    per.select(col(groupCol), round(est, 4).as("uniq_hll"))
      .orderBy(groupCol)
  }
}
