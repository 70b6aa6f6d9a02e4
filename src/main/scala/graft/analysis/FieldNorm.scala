package graft.analysis

/** Fieldnorm quantization — one byte per (doc, text field) encoding the token
  * count. BM25 reads document length exclusively through this table, so it
  * must match the reference byte-for-byte.
  *
  * The 256-entry table is generated from the reference's own decode formula
  * (`/root/reference/src/fieldnorm/code.rs:305-328`): identity for ids < 24 is
  * subsumed by the exponential part producing exact values up to 40, then
  * exponentially bucketed. `fieldnorm_to_id` rounds DOWN to the nearest
  * representable value (`code.rs:7-11`).
  */
object FieldNorm {

  private val IdentityPart = 24

  private def decodeExpPart(b: Int): Long = {
    val bits = (b & 0x07).toLong
    val shift = b >> 3
    if (shift == 0) bits else (bits | 8L) << (shift - 1)
  }

  /** FIELD_NORMS_TABLE as unsigned u32 values held in Long. */
  val Table: Array[Long] = Array.tabulate(256) { i =>
    if (i < IdentityPart) i.toLong
    else IdentityPart.toLong + decodeExpPart(i - IdentityPart)
  }

  /** id -> fieldnorm (u32 as Long). Reference `code.rs:1-4`. */
  @inline def idToFieldnorm(id: Int): Long = Table(id & 0xff)

  /** fieldnorm (token count) -> id: index of the largest table entry <= n.
    * Reference `code.rs:6-11` (binary_search with round-down on miss).
    */
  def fieldnormToId(n: Long): Int = {
    var lo = 0
    var hi = 255
    // invariant: Table(lo) <= n (Table(0)=0 <= any n >= 0)
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (Table(mid) <= n) lo = mid else hi = mid - 1
    }
    lo
  }
}
