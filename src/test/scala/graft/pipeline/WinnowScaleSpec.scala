package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Round-3 winnow scale contract (VERDICT r2 "What's wrong" #1): the
  * candidate-generation work on a planted TEMPLATE-FAMILY corpus (every
  * fingerprint bucket = the whole family) must grow LINEARLY with family
  * size once the family exceeds the fixed all-pairs tier — the r2
  * corpus-proportional cap made kept buckets grow with n, re-introducing
  * the O((n/20)²) hot-bucket hazard at 100x corpus.
  */
class WinnowScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val cfg = DedupConfig()

  /** Family of m docs sharing one long template (same winnow fingerprints
    * at frequency ~m) with a short unique tail per doc. */
  private def templateFamily(m: Int) = {
    val template = {
      val rnd = new scala.util.Random(11)
      (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    import spark.implicits._
    (0 until m).map(i => (f"doc-$i%06d", template + f" tail-$i%06d"))
      .toDF("conv_id", "doc")
  }

  test("tier-2: pair-stream instances grow linearly in family size") {
    def instances(m: Int, tier2PairRecall: Boolean): Long = {
      val buckets = DedupPipeline.winnowBuckets(templateFamily(m), 8, 16)
        .where(col("m") <= 100000) // no stop cap: isolate the tier split
      DedupPipeline.winnowPairStream(buckets, allPairsCap = 256,
        subBucketSize = 64, tier2PairRecall).count()
    }
    val i600 = instances(600, tier2PairRecall = true)
    val i1200 = instances(1200, tier2PairRecall = true)
    assert(i600 > 0)
    // all-pairs would grow 4x; the salted tier must stay ~linear (the
    // sub-bucket count doubles, sub-bucket size stays ~subBucketSize)
    assert(i1200.toDouble / i600 < 3.0,
      s"tier-2 stream grew superlinearly: $i600 -> $i1200")
    // links-only default: strictly less work again
    val l1200 = instances(1200, tier2PairRecall = false)
    assert(l1200 < i1200)
  }

  test("tier-2 candidate stream stays CONNECTED (chain+star + minima links)") {
    val fam = templateFamily(500) // > allPairsCap -> pure tier-2
    val buckets = DedupPipeline.winnowBuckets(fam, 8, 16)
    val stream = DedupPipeline.winnowPairStream(buckets, allPairsCap = 256,
      subBucketSize = 64).select(col("a"), col("b")).distinct()
    // the candidate graph must span all 500 docs as one component — the
    // same pre-verification connectivity level the MinHash chainStar
    // guarantees (verification then keeps only true near-dup edges)
    val cc = DedupPipeline.connectedComponents(stream, fam.select(col("conv_id")))
    val nClusters = cc.select(col("cluster_id")).distinct().count()
    assert(nClusters === 1L,
      s"tier-2 family split into $nClusters components (links must chain sub-buckets)")
  }

  test("tier2PairRecall: planted dup pair inside a tier-2-only family is emitted") {
    import spark.implicits._
    val m = 500
    val base = templateFamily(m).collect().map(r => (r.getString(0), r.getString(1)))
    // plant a near-identical partner for doc-000007 (tail char changed):
    // ALL its fingerprints live in family-frequency (tier-2) buckets
    val (id, text) = base(7)
    val docs = (base :+ (id + "-dup", text.dropRight(1) + "Z")).toSeq
      .toDF("conv_id", "doc")
    val cand = DedupPipeline.winnowCandidatePairs(docs, 8, 16, cfg,
      minFpOverlap = 0.4, tier2PairRecall = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the pair shares ~every bucket; P(same sub-bucket in none) ~ (1-1/S)^B
    // ~ 1e-2 — and the salt is deterministic, so this is a fixed outcome
    assert(cand.contains((id, id + "-dup")),
      "planted tier-2 dup pair not emitted with tier2PairRecall=true")
  }

  test("fixed tiers: true pairs in a <=256 bucket survive the exact tier-1 prefilter") {
    import spark.implicits._
    // family of 200 template docs (tier-1 bucket sizes ~200) containing 5
    // planted near-identical pairs; candidates must include all 5
    val rnd = new scala.util.Random(13)
    val template = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val base = (0 until 200).map { i =>
      (f"doc-$i%04d", template + f" middle-$i%04d " + template.take(100))
    }
    val dups = (0 until 5).map { i =>
      // duplicate of doc-000i with one trailing char changed
      val (id, text) = base(i)
      (id + "-dup", text.dropRight(1) + "Z")
    }
    val docs = (base ++ dups).toDF("conv_id", "doc")
    val cand = DedupPipeline.winnowCandidatePairs(docs, 8, 16, cfg,
      minFpOverlap = 0.6).collect().map(r => (r.getString(0), r.getString(1))).toSet
    (0 until 5).foreach { i =>
      val want = (f"doc-$i%04d", f"doc-$i%04d-dup")
      assert(cand.contains(want), s"missing planted pair $want")
    }
  }
}
