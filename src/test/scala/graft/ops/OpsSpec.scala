package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.DedupConfig
import graft.pipeline.{DedupPipeline, SparkTestSession}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(spark, 300).cache()

  test("decode: typed metadata, corrupt rows isolated not fatal") {
    val meta = Multimodal.decode(media).collect()
    assert(meta.length === 300)
    assert(meta.forall(_.valid))
    meta.foreach { m =>
      m.kind match {
        case "audio" =>
          assert(m.width === 0 && Seq(8000, 16000, 22050, 44100).contains(m.sample_rate))
        case "video" =>
          assert(m.width >= 64 && m.height >= 64 && m.n_frames >= 8)
        case _ =>
          assert(m.width >= 64 && m.height >= 64 && m.n_frames === 1)
      }
    }
    // corrupt payloads → valid=false, no exception
    val corrupt = Seq(Multimodal.MediaRow(1L, "image", 3L, Array[Byte](1, 2, 3)),
      Multimodal.MediaRow(2L, "image", 0L, null)).toDS()
    val got = Multimodal.decode(corrupt).collect()
    assert(got.forall(!_.valid))
  }

  test("featureExtract: 64-dim normalized histogram, deterministic") {
    val f = Multimodal.featureExtract(media).collect()
    assert(f.forall(_.feature.length === 64))
    assert(f.forall(r => math.abs(r.feature.sum - 1.0f) < 1e-3))
    val f2 = Multimodal.featureExtract(media).collect()
    assert(f.map(_.feature.toSeq).toSet === f2.map(_.feature.toSeq).toSet)
  }

  test("frameSample: only videos, stride respected, deterministic hashes") {
    val s1 = Multimodal.frameSample(media, 2).collect()
    val metas = Multimodal.decode(media).collect().map(m => m.media_id -> m).toMap
    assert(s1.nonEmpty)
    s1.groupBy(_.media_id).foreach { case (id, frames) =>
      assert(metas(id).kind === "video")
      val expected = (0 until metas(id).n_frames by 2).size
      assert(frames.length === expected)
    }
    val s2 = Multimodal.frameSample(media, 2).collect()
    assert(s1.map(f => (f.media_id, f.frame_idx, f.frame_hash)).toSet ===
      s2.map(f => (f.media_id, f.frame_idx, f.frame_hash)).toSet)
  }

  test("resize: header rewritten, only images touched") {
    val out = Multimodal.resize(media, 0.5).collect().map(m => m.media_id -> m).toMap
    val in = media.collect()
    in.foreach { row =>
      val o = out(row.media_id)
      if (row.kind == "image") {
        val h0 = MediaCodec.decodeHeader(row.payload).get
        val h1 = MediaCodec.decodeHeader(o.payload).get
        assert(h1.width === math.max(1, (h0.width * 0.5).toInt) &&
          h1.height === math.max(1, (h0.height * 0.5).toInt))
        assert(o.payload.length < row.payload.length)
        // the resized payload is itself a fully decodable PNG
        val Some((rw, rh, bpp, px)) = MediaCodec.pngDecodePixels(o.payload)
        assert(rw === h1.width && rh === h1.height && px.length === rw * rh * bpp)
      } else {
        assert(o.payload.sameElements(row.payload))
      }
    }
  }

  test("mediaStats: per-kind dashboard with sketch columns") {
    val stats = Multimodal.mediaStats(media).collect()
    assert(stats.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    stats.foreach { r =>
      assert(r.getLong(1) === 100)       // n per kind
      assert(r.getLong(2) === 0)         // no corrupt
      assert(math.abs(r.getLong(5) - 100L) <= 5) // approx_distinct
    }
  }
}

class SimHashNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("banded simhash finds near fingerprints, skips far ones") {
    val cfg = DedupConfig()
    val base = (0 until 16).map(i =>
      s"document $i with enough distinct content to shingle " +
      s"and some shared phrasing about spark execution plans number $i").toList
    // d0/d1: identical text -> dist 0; d2: lightly edited copy of d0
    val docs = (("d0" -> base.mkString(" ")) ::
      ("d1" -> base.mkString(" ")) ::
      ("d2" -> (base.updated(3, base(3) + " extra") .mkString(" "))) ::
      (3 until 20).map(i => s"d$i" -> s"totally different content block $i " * 8).toList)
      .toDF("conv_id", "doc").withColumn("doc_len", length(col("doc")).cast("long"))
    val sigs = DedupPipeline.signatures(docs, cfg)
    val pairs = DedupPipeline.simhashNearDupPairs(sigs, maxDist = 6, cfg)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains(("d0", "d1")), s"got ${pairs.mkString(",")}")
    assert(pairs.find(p => p._1 == "d0" && p._2 == "d1").get._3 === 0)
    // the pigeonhole GUARANTEE: every pair within Hamming distance 3 (one
    // of the 4 bands must agree) is found
    val fps = sigs.select("conv_id", "simhash").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    for {
      (ida, fa) <- fps
      (idb, fb) <- fps if ida < idb
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } assert(pairSet.contains((ida, idb)), s"guaranteed pair ($ida,$idb,d=$d) missed")
    // no far pair sneaks in under the distance cap
    assert(pairs.forall(_._3 <= 6))
  }
}
