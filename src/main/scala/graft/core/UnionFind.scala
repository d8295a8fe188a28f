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
}
