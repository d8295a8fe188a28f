package graft.core

import scala.collection.mutable

/** Driver/oracle-side union-find (path halving + union-by-min-id so cluster
  * representatives are deterministic: the smallest member id). The
  * distributed pipeline uses DataFrame star-contraction instead (SURVEY §2b
  * P8); this mirrors its min-id convention so cluster ids agree. */
final class UnionFind[T](implicit ord: Ordering[T]) {
  private val parent = mutable.HashMap.empty[T, T]

  def add(x: T): Unit = if (!parent.contains(x)) parent(x) = x

  def find(x0: T): T = {
    add(x0)
    var x = x0
    while (parent(x) != x) {
      val gp = parent(parent(x))
      parent(x) = gp
      x = gp
    }
    x
  }

  def union(a: T, b: T): Unit = {
    val ra = find(a); val rb = find(b)
    if (ra != rb) {
      if (ord.lteq(ra, rb)) parent(rb) = ra else parent(ra) = rb
    }
  }

  /** member → representative (min id of its component). */
  def assignments(): Map[T, T] = parent.keys.map(k => k -> find(k)).toMap

  /** Non-identity assignments as a flat array (member, root) with
    * member != root. Roots and never-seen singletons are omitted — a
    * left-join + coalesce(root, id) downstream resolves them to
    * themselves, so carrying the identity rows through parallelize →
    * broadcast was pure width-invariant overhead (the driver-UF tail is
    * serial at every cluster size). Array + iterator, no intermediate
    * immutable Map. */
  def nonIdentityAssignments(): Array[(T, T)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(T, T)](parent.size)
    val it = parent.keysIterator
    while (it.hasNext) {
      val k = it.next()
      val r = find(k)
      if (r != k) out += ((k, r))
    }
    out.toArray
  }
}
