package graft.functions

/** Rolling (Karp–Rabin) document fingerprinting — polynomial hash of the
  * whole normalized text plus window hashes for winnowing-style
  * fingerprint selection. Pure Scala so it is unit/property-testable; the
  * query surface wraps it in a (deliberately single) scalar UDF — the one
  * place a UDF is warranted because a sequential rolling recurrence has
  * no builtin-function equivalent.
  */
object TextHash {
  final val Base = 257L
  final val Mod = 1000000007L

  /** Polynomial hash of the full string: Σ c_i·B^(n-1-i) mod M (Horner). */
  def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * Base + s.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }

  /** All rolling window hashes of length `w` (Karp–Rabin recurrence:
    * each step drops the leading char and appends the next — O(n)).
    */
  def rollingHashes(s: String, w: Int): Array[Long] = {
    if (s.length < w || w <= 0) return Array.empty
    var pw = 1L // B^(w-1) mod M
    for (_ <- 1 until w) pw = pw * Base % Mod
    val out = new Array[Long](s.length - w + 1)
    var h = 0L
    var i = 0
    while (i < s.length) {
      if (i >= w) h = (h - s.charAt(i - w).toLong * pw % Mod + Mod) % Mod
      h = (h * Base + s.charAt(i).toLong) % Mod
      if (i >= w - 1) out(i - w + 1) = h
      i += 1
    }
    out
  }

  /** Winnowing-style fingerprint: the minimum rolling hash per document
    * (deterministic, robust to local edits at window granularity).
    */
  def minRollingHash(s: String, w: Int): Long = {
    val hs = rollingHashes(s, w)
    if (hs.isEmpty) polyHash(s) else hs.min
  }
}
