package graft.core

/** Reference-faithful single-process oracle: exact all-pairs Jaccard over
  * the SAME shingle config as the pipeline (BASELINE.json north_rule — the
  * recall ≥ 0.99 judge). Deliberately brute-force and Spark-free so it can't
  * share bugs with the distributed path (reference test philosophy:
  * golden/exact checks per SURVEY §5.1).
  */
object OracleDedup {

  final case class Truth(
      pairs: Set[(String, String)],                 // (a, b) with a < b, exact J ≥ tau
      clusters: Map[String, String])                // conv_id → min-id cluster rep

  def run(docs: Seq[(String, String)], cfg: DedupConfig): Truth = {
    val ids = docs.map(_._1).toArray
    val sh = docs.map { case (_, d) => Shingles.shinglesOf(d, cfg.shingleK, cfg.seed) }.toArray
    val uf = new UnionFind[String]()
    ids.foreach(uf.add)
    val pairs = Set.newBuilder[(String, String)]
    var i = 0
    while (i < ids.length) {
      var j = i + 1
      while (j < ids.length) {
        if (Shingles.jaccardSorted(sh(i), sh(j)) >= cfg.tauJaccard) {
          val (a, b) = if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
          pairs += ((a, b))
          uf.union(a, b)
        }
        j += 1
      }
      i += 1
    }
    Truth(pairs.result(), uf.assignments())
  }

  /** Dup-pair recall of pipeline cluster assignments vs truth pairs:
    * a truth pair counts as recalled iff both ids share a pipeline cluster. */
  def recall(truthPairs: Set[(String, String)], assign: Map[String, String]): Double = {
    if (truthPairs.isEmpty) return 1.0
    val hit = truthPairs.count { case (a, b) =>
      assign.get(a).exists(ca => assign.get(b).contains(ca))
    }
    hit.toDouble / truthPairs.size
  }
}
