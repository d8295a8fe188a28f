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
