package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Murmur3x128

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run per-partition over the
  * bytes. The Spark-side contract (schema, partitioning, batch shape,
  * null/corrupt handling) is real and tested; the codec itself is a
  * clearly-marked deterministic STUB — image/audio libraries are not in
  * this container, and a deployment swaps `decodeStub` for a real codec
  * without touching the plumbing.
  *
  * Design for 100 TB: media rows are large and skewed, so every op here is
  * a map-side `Dataset.mapPartitions` (no shuffle), with the media table
  * expected to be size-bucketed at write time (`n_bytes` feeds
  * repartitionByRange when re-bucketing).
  */
object Multimodal {

  /** media(media_id, kind, n_bytes, payload) — the opaque-binary schema. */
  final case class MediaRow(media_id: Long, kind: String, n_bytes: Long, payload: Array[Byte])

  /** Decoded header metadata (what a real codec would parse). */
  final case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                             n_frames: Int, sample_rate: Int, valid: Boolean)

  final case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Deterministic synthetic media table: payload bytes are a seeded
    * stream; a 16-byte fake header encodes (width, height, frames, rate). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(1, n / 250)).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val mix = graft.core.MinHasher.mix64(seed ^ id)
      val w = 64 + (mix & 0xff).toInt
      val h = 64 + ((mix >>> 8) & 0xff).toInt
      val frames = if (kind == "video") 8 + ((mix >>> 16) & 0x1f).toInt else 1
      val rate = if (kind == "audio") 16000 else 0
      val bodyLen = 256 + ((mix >>> 24) & 0x3ff).toInt
      val payload = new Array[Byte](16 + bodyLen)
      // fake header: 4 LE ints (w, h, frames, rate)
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(w); bb.putInt(h); bb.putInt(frames); bb.putInt(rate)
      var i = 16
      var s = mix
      while (i < payload.length) {
        s = graft.core.MinHasher.mix64(s)
        payload(i) = (s & 0xff).toByte
        i += 1
      }
      MediaRow(id, kind, payload.length.toLong, payload)
    }
  }

  /** STUB decode (???-equivalent): parses the 16-byte fake header. A real
    * implementation calls the codec here; everything around it — the
    * mapPartitions batch shape, null/short-payload handling, the typed
    * output schema — is the production plumbing. */
  def decodeStub(payload: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (payload == null || payload.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Some((bb.getInt(0), bb.getInt(4), bb.getInt(8), bb.getInt(12)))
  }

  /** decode: media → typed metadata. Map-side only; corrupt rows become
    * valid=false instead of failing the task (at 10^12 rows, poison rows
    * are a certainty). */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        decodeStub(row.payload) match {
          case Some((w, h, f, r)) => MediaMeta(row.media_id, row.kind, w, h, f, r, valid = true)
          case None => MediaMeta(row.media_id, row.kind, 0, 0, 0, 0, valid = false)
        }
      }
    }
  }

  /** feature-extract: 64-dim byte-histogram embedding of the payload body
    * (stands in for a CNN/audio embedding; deterministic). */
  def featureExtract(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Int](64) // reused per partition — no per-row alloc
      it.map { row =>
        java.util.Arrays.fill(hist, 0)
        var i = 16
        while (i < row.payload.length) {
          hist((row.payload(i) & 0xff) >> 2) += 1
          i += 1
        }
        val body = math.max(1, row.payload.length - 16).toFloat
        val f = new Array[Float](64)
        var j = 0
        while (j < 64) { f(j) = hist(j) / body; j += 1 }
        MediaFeature(row.media_id, row.kind, f)
      }
    }
  }

  /** frame-sample: emit every `stride`-th frame's content hash for videos —
    * the dedup key stream for frame-level near-dup detection. Output is a
    * flatMap (one row per sampled frame): the batch shape a real frame
    * decoder would produce. */
  def frameSample(media: Dataset[MediaRow], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      decodeStub(row.payload) match {
        case Some((_, _, frames, _)) if row.kind == "video" =>
          // STUB: hash the payload slice standing in for each frame
          val body = row.payload.length - 16
          (0 until frames by stride).map { fi =>
            val from = 16 + (body * fi / math.max(1, frames))
            val until = 16 + (body * (fi + 1) / math.max(1, frames))
            FrameSample(row.media_id, fi,
              Murmur3x128.hashBytes64(java.util.Arrays.copyOfRange(row.payload, from, until),
                Murmur3x128.DefaultSeed))
          }
        case _ => Nil
      }
    }
  }

  /** resize plumbing: new payload sized (w×h scaled by `scale`) with the
    * header rewritten — the byte-shuffling a real resampler would do,
    * deterministic here. */
  def resize(media: Dataset[MediaRow], scale: Double): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        decodeStub(row.payload) match {
          case Some((w, h, f, r)) if row.kind == "image" =>
            val nw = math.max(1, (w * scale).toInt)
            val nh = math.max(1, (h * scale).toInt)
            val bodyLen = math.max(16, ((row.payload.length - 16) * scale * scale).toInt)
            val out = new Array[Byte](16 + bodyLen)
            val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.putInt(nw); bb.putInt(nh); bb.putInt(f); bb.putInt(r)
            var i = 0
            while (i < bodyLen) {
              // STUB resample: stride through the source body
              out(16 + i) = row.payload(16 + (i.toLong * (row.payload.length - 16) / bodyLen).toInt)
              i += 1
            }
            row.copy(payload = out, n_bytes = out.length.toLong)
          case _ => row
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
