package graft.core

import scala.collection.mutable.LongMap

/** Longest common substring via a suffix automaton of the first string,
  * O(|a| + |b|) states/time (north_star: "suffix-array longest-common-
  * substring checks" — the automaton is the linear-time equivalent; SURVEY
  * §4.3 picks it over SA-IS for implementation weight).
  *
  * Transitions live in one shared LongMap keyed by (state << 16 | char) to
  * avoid per-state map allocation in the verification hot loop.
  */
object Lcs {

  def lcsLength(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    // Build the automaton over the shorter string (build cost dominates).
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    new SuffixAutomaton(s).longestMatch(t)
  }

  /** Gate form of the LCS check: does a common substring of length
    * ≥ minRun exist? Dual 64-bit rolling hashes over all minRun-windows
    * of the shorter string (open-addressed set), then one rolling scan of
    * the longer — O(|a| + |b|) with ~constant-per-char cost and a single
    * allocation, where the exact automaton costs ~1000x more per pair in
    * the verification hot loop (allocation-heavy states + map transitions
    * made verify the worst-scaling stage at 32 cores: GC contention).
    *
    * Exact up to a 128-bit hash collision (~(n·m)/2^128) — the same risk
    * class the pipeline already accepts for hashed-shingle Jaccard.
    * `lcsLength` stays for exact lengths (tests, ad-hoc analysis). */
  def hasCommonRun(a: String, b: String, minRun: Int): Boolean = {
    if (minRun <= 0) return true
    if (a == null || b == null) return false
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val L = minRun
    if (s.length < L) return false
    val B1 = 1000003L
    val B2 = 0x9E3779B97F4A7C17L // odd
    var p1 = 1L; var p2 = 1L // B^(L-1)
    var e = 0
    while (e < L - 1) { p1 *= B1; p2 *= B2; e += 1 }

    val n = s.length - L + 1
    var cap = 4
    while (cap < 2 * n) cap <<= 1
    val mask = cap - 1
    val k1 = new Array[Long](cap)
    val k2 = new Array[Long](cap)
    val used = new Array[Boolean](cap)

    // seed hashes of s's first window, then roll and insert each window
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < L) { val c = s.charAt(i); h1 = h1 * B1 + c; h2 = h2 * B2 + c; i += 1 }
    var w = 0
    while (w < n) {
      var slot = (h1 ^ (h1 >>> 33)).toInt & mask
      var dup = false
      while (used(slot) && !dup) {
        if (k1(slot) == h1 && k2(slot) == h2) dup = true
        else slot = (slot + 1) & mask
      }
      if (!dup) { used(slot) = true; k1(slot) = h1; k2(slot) = h2 }
      if (w + 1 < n) {
        val out = s.charAt(w); val in = s.charAt(w + L)
        h1 = (h1 - out * p1) * B1 + in
        h2 = (h2 - out * p2) * B2 + in
      }
      w += 1
    }

    // roll over t, probing the set
    if (t.length < L) return false
    h1 = 0L; h2 = 0L
    i = 0
    while (i < L) { val c = t.charAt(i); h1 = h1 * B1 + c; h2 = h2 * B2 + c; i += 1 }
    val m = t.length - L + 1
    w = 0
    while (w < m) {
      var slot = (h1 ^ (h1 >>> 33)).toInt & mask
      while (used(slot)) {
        if (k1(slot) == h1 && k2(slot) == h2) return true
        slot = (slot + 1) & mask
      }
      if (w + 1 < m) {
        val out = t.charAt(w); val in = t.charAt(w + L)
        h1 = (h1 - out * p1) * B1 + in
        h2 = (h2 - out * p2) * B2 + in
      }
      w += 1
    }
    false
  }

  private final class SuffixAutomaton(s: String) {
    private val maxn = 2 * s.length + 2
    private val len = new Array[Int](maxn)
    private val link = new Array[Int](maxn)
    // outgoing transition characters per state, needed to copy a state's
    // transitions when cloning
    private val outs = new Array[StringBuilder](maxn)
    private val trans = new LongMap[Int](math.max(16, 4 * s.length))
    private var last = 0
    private var size = 1

    @inline private def key(st: Int, c: Char): Long = (st.toLong << 16) | c.toLong
    @inline private def get(st: Int, c: Char): Int = trans.getOrElse(key(st, c), -1)
    @inline private def putNew(st: Int, c: Char, to: Int): Unit = {
      trans(key(st, c)) = to
      var sb = outs(st)
      if (sb == null) { sb = new StringBuilder(2); outs(st) = sb }
      sb.append(c)
    }
    @inline private def overwrite(st: Int, c: Char, to: Int): Unit =
      trans(key(st, c)) = to

    def build(): Unit = {
      link(0) = -1
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        val cur = size; size += 1
        len(cur) = len(last) + 1
        var p = last
        while (p != -1 && get(p, c) == -1) {
          putNew(p, c, cur)
          p = link(p)
        }
        if (p == -1) link(cur) = 0
        else {
          val q = get(p, c)
          if (len(p) + 1 == len(q)) link(cur) = q
          else {
            val clone = size; size += 1
            len(clone) = len(p) + 1
            link(clone) = link(q)
            val qOuts = outs(q)
            if (qOuts != null) {
              var j = 0
              while (j < qOuts.length) {
                val ch = qOuts.charAt(j)
                putNew(clone, ch, get(q, ch))
                j += 1
              }
            }
            while (p != -1 && get(p, c) == q) {
              overwrite(p, c, clone)
              p = link(p)
            }
            link(q) = clone
            link(cur) = clone
          }
        }
        last = cur
        i += 1
      }
    }
    build()

    /** Length of the longest substring of t that is also a substring of s. */
    def longestMatch(t: String): Int = {
      var v = 0
      var l = 0
      var best = 0
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        var tr = get(v, c)
        while (v != 0 && tr == -1) {
          v = link(v); l = len(v); tr = get(v, c)
        }
        if (tr != -1) { v = tr; l += 1 }
        else { v = 0; l = 0 }
        if (l > best) best = l
        i += 1
      }
      best
    }
  }
}
