package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Murmur3x128

/** Multimodal-column operators for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run per-partition over the
  * bytes. The codec layer is [[MediaCodec]] — real pure-JVM container
  * parsing (PNG incl. full pixel decode, JPEG SOF, GIF block walk, WAV)
  * with defensive failure modes: corrupt payloads become `valid = false`
  * rows, never task failures.
  *
  * Design for 100 TB: media rows are large and skewed, so every op here is
  * a map-side `Dataset.mapPartitions` (no shuffle), with the media table
  * expected to be size-bucketed at write time (`n_bytes` feeds
  * repartitionByRange when re-bucketing).
  */
object Multimodal {

  /** media(media_id, kind, n_bytes, payload) — the opaque-binary schema. */
  final case class MediaRow(media_id: Long, kind: String, n_bytes: Long, payload: Array[Byte])

  /** Decoded header metadata (parsed from the payload bytes, never trusted
    * from row metadata). */
  final case class MediaMeta(media_id: Long, kind: String, format: String,
                             width: Int, height: Int,
                             n_frames: Int, sample_rate: Int, valid: Boolean)

  final case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Deterministic synthetic media table of REAL formats: images are PNGs
    * (8-bit RGB, deterministic pixels), videos are animated GIFs (one LZW
    * payload per frame), audio is PCM WAV — all built by [[MediaCodec]]'s
    * encoders, all parseable by any standards-conforming reader. */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(1, n / 250)).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      var s = graft.core.MinHasher.mix64(seed ^ id)
      def next(): Long = { s = graft.core.MinHasher.mix64(s); s }
      val mix = next()
      val payload = kind match {
        case "image" =>
          val w = 64 + (mix & 0x3f).toInt
          val h = 64 + ((mix >>> 8) & 0x3f).toInt
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) {
            // gradient + seeded noise: compressible, content-unique
            px(i) = (((i / 3) % w) + (next() & 0x1f)).toByte
            i += 1
          }
          MediaCodec.pngEncode(w, h, 3, px)
        case "audio" =>
          val rates = Array(8000, 16000, 22050, 44100)
          val data = new Array[Byte](256 + ((mix >>> 24) & 0x3ff).toInt)
          var i = 0
          while (i < data.length) { data(i) = (next() & 0xff).toByte; i += 1 }
          MediaCodec.wavBuild(rates(((mix >>> 2) & 3).toInt), data)
        case _ =>
          val w = 64 + (mix & 0x3f).toInt
          val h = 64 + ((mix >>> 8) & 0x3f).toInt
          val frames = 8 + ((mix >>> 16) & 0x1f).toInt
          val fd = (0 until frames).map { _ =>
            val d = new Array[Byte](48)
            var i = 0
            while (i < d.length) { d(i) = (next() & 0xff).toByte; i += 1 }
            d
          }
          MediaCodec.gifBuild(w, h, fd)
      }
      MediaRow(id, kind, payload.length.toLong, payload)
    }
  }

  /** decode: media → typed metadata via real header parsing. Map-side only;
    * corrupt rows become valid=false instead of failing the task (at 10^12
    * rows, poison rows are a certainty). */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        MediaCodec.decodeHeader(row.payload) match {
          case Some(h) =>
            MediaMeta(row.media_id, row.kind, h.format, h.width, h.height,
              h.nFrames, h.sampleRate, valid = true)
          case None =>
            MediaMeta(row.media_id, row.kind, "", 0, 0, 0, 0, valid = false)
        }
      }
    }
  }

  /** feature-extract: 64-dim byte-histogram embedding (stands in for a
    * CNN/audio embedding; deterministic). For PNGs the histogram is over
    * the DECODED pixels — real content, invariant to the compressed
    * representation; other formats histogram the container body. */
  def featureExtract(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Int](64) // reused per partition — no per-row alloc
      it.map { row =>
        java.util.Arrays.fill(hist, 0)
        val bytes = MediaCodec.pngDecodePixels(row.payload) match {
          case Some((_, _, _, px)) => px
          case None => if (row.payload == null) Array.emptyByteArray else row.payload
        }
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) >> 2) += 1
          i += 1
        }
        val total = math.max(1, bytes.length).toFloat
        val f = new Array[Float](64)
        var j = 0
        while (j < 64) { f(j) = hist(j) / total; j += 1 }
        MediaFeature(row.media_id, row.kind, f)
      }
    }
  }

  /** frame-sample: emit every `stride`-th frame's content hash for videos —
    * the dedup key stream for frame-level near-dup detection. Frames come
    * from the real GIF block walk (each frame's LZW payload is its content
    * identity). Output is a flatMap (one row per sampled frame). */
  def frameSample(media: Dataset[MediaRow], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      if (row.kind != "video") Nil
      else MediaCodec.gifFrames(row.payload) match {
        case Some(frames) if frames.nonEmpty =>
          (0 until frames.size by stride).map { fi =>
            FrameSample(row.media_id, fi,
              Murmur3x128.hashBytes64(frames(fi), Murmur3x128.DefaultSeed))
          }
        case _ => Nil
      }
    }
  }

  /** resize: real nearest-neighbor resample for PNG images (decode pixels,
    * resample, re-encode — [[MediaCodec.pngResizeNearest]]); non-image and
    * non-PNG rows pass through untouched. */
  def resize(media: Dataset[MediaRow], scale: Double): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        if (row.kind != "image") row
        else MediaCodec.pngResizeNearest(row.payload, scale) match {
          case Some(out) => row.copy(payload = out, n_bytes = out.length.toLong)
          case None => row
        }
      }
    }
  }

  /** media stats per kind — the health dashboard for a media corpus. */
  def mediaStats(media: Dataset[MediaRow]): DataFrame = {
    import graft.functions._
    val meta = decode(media).toDF()
    meta.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("valid"), 0L).otherwise(1L)).as("n_corrupt"),
        avg(col("width")).as("avg_width"),
        kll_quantiles(kll_sketch_agg(col("width").cast("double"), 200),
          array(lit(0.5), lit(0.99))).as("width_q50_q99"),
        hll_count_distinct(col("media_id"), 12).as("approx_distinct"))
      .orderBy(col("kind"))
  }
}
