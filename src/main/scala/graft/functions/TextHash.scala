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

  private val Log2 = math.log(2.0)

  /** Shannon entropy in bits of the document's code-point distribution —
    * a cheap perplexity proxy for corpus quality filtering (near-zero for
    * degenerate repeated-character text, ~4.2 for natural English).
    * One pass + a sorted count map, so the p·log₂p summation order is
    * deterministic (ascending code point); 0.0 for the empty string.
    */
  def charEntropy(s: String): Double = {
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Int, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.put(cp, counts.getOrDefault(cp, 0L) + 1L)
      i += Character.charCount(cp)
      n += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h -= p * (math.log(p) / Log2)
    }
    h
  }
}
