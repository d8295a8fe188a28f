package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.DedupConfig
import graft.pipeline.{DedupPipeline, SparkTestSession}

class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("winnowing: deterministic, subset of shingle hashes, match guarantee") {
    val text = "the quick brown fox jumps over the lazy dog and keeps running onward"
    val df = Seq(text).toDF("t")
    val fp1 = df.select(winnow_fingerprints(col("t"), 8, 16)).head().getSeq[Long](0)
    val fp2 = df.select(winnow_fingerprints(col("t"), 8, 16)).head().getSeq[Long](0)
    assert(fp1 === fp2)
    assert(fp1.nonEmpty)
    val allShingles = graft.core.Shingles.shinglesOf(text, 8, 9001L).toSet
    assert(fp1.forall(allShingles.contains))
    assert(fp1.size < allShingles.size) // winnowing compresses

    // guarantee: two docs sharing a long substring share a fingerprint
    val shared = "a sufficiently long shared passage that exceeds window plus k bytes easily"
    val a = "prefix one " + shared + " suffix alpha"
    val b = "other start " + shared + " different end"
    val fa = Seq(a).toDF("t").select(winnow_fingerprints(col("t"), 8, 16)).head().getSeq[Long](0).toSet
    val fb = Seq(b).toDF("t").select(winnow_fingerprints(col("t"), 8, 16)).head().getSeq[Long](0).toSet
    assert(fa.intersect(fb).nonEmpty)
  }

  test("short and empty inputs") {
    val r = Seq("", "abc", "exactly8").toDF("t")
      .select(winnow_fingerprints(col("t"), 8, 16)).collect()
    assert(r(0).getSeq[Long](0).isEmpty)
    assert(r(1).getSeq[Long](0).isEmpty) // < k bytes
    assert(r(2).getSeq[Long](0).size === 1)
  }
}

class SaltedBandsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted buckets preserve connectivity and stay linear") {
    val cfg = DedupConfig(bandSalt = 4)
    // one hot bucket with 80 members
    val hot = (1 to 80).map(i => (f"c$i%03d", 0, 42L)).toDF("conv_id", "band_idx", "band_key")
    val pairs = DedupPipeline.candidatePairs(hot, cfg)
    val n = pairs.count()
    assert(n <= 2 * 80 + 2 * 4, s"expected linear candidates, got $n")
    // connectivity: the whole bucket must still form one component
    val nodes = (1 to 80).map(i => f"c$i%03d").toDF("conv_id")
    val cc = DedupPipeline.connectedComponents(pairs.select(col("a"), col("b")), nodes)
      .select("cluster_id").distinct().count()
    assert(cc === 1L)
  }

  test("salted pipeline recall matches unsalted on the oracle corpus") {
    val turns = graft.pipeline.Transcripts.generate(150)
    val tdf = graft.pipeline.Transcripts.asDataFrame(spark, turns, 6)
    val truth = graft.core.OracleDedup.run(
      graft.pipeline.Transcripts.docsLocal(turns), DedupConfig())
    val salted = DedupPipeline.run(tdf, DedupConfig(bandSalt = 4)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val recall = graft.core.OracleDedup.recall(truth.pairs, salted)
    assert(recall >= 0.99, s"salted recall $recall")
  }
}
