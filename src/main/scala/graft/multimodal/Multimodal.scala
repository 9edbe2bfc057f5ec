package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `BINARY` columns with typed metadata, and per-media operators run as
  * typed `mapPartitions` batches — the Scala/Tungsten analog of
  * `mapInPandas` (per-partition setup is amortized exactly where a real
  * decoder would init its codec once per partition, then stream rows
  * through it).
  *
  * The decode/resize steps are DETERMINISTIC STUBS — this container has
  * no image/audio codecs — but every Spark-side contract is real and
  * tested: schemas (binary + struct metadata), typed Encoders, partition
  * behavior, batch shape, and the downstream feature aggregation. A
  * production build replaces only the bodies marked "STUB" with e.g.
  * `javax.imageio` / ffmpeg calls; nothing about the plan shape changes.
  *
  * Scale notes: payload bytes never shuffle — all per-media operators are
  * map-side; only the (tiny) extracted features (histograms, dims) reach
  * the aggregation shuffle. That is the invariant that matters at 100 TB
  * of media: shuffle features, not bytes.
  */
object Multimodal {

  final case class MediaMeta(mime_type: String, width: Int, height: Int,
                             duration_ms: Long)
  final case class MediaRecord(media_id: Long, kind: String,
                               bytes: Array[Byte], meta: MediaMeta)
  final case class DecodedImage(media_id: Long, width: Int, height: Int,
                                pixels: Array[Byte])
  final case class ByteHist(media_id: Long, n_bytes: Long, hist: Array[Long])
  final case class FrameSet(media_id: Long, n_frames: Int,
                            frames: Array[Array[Byte]])

  /** Deterministic synthetic media table derived from `documents` — the
    * stand-in for a real binary ingest (S3 blobs, tar shards): payload =
    * UTF-8 text bytes, kind round-robins image/audio/video, metadata
    * derived from the payload length. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val mime = kind match {
          case "image" => "image/png"
          case "audio" => "audio/wav"
          case _       => "video/mp4"
        }
        MediaRecord(id, kind, bytes,
          MediaMeta(mime, width = 16 + (bytes.length % 64),
            height = 16 + (bytes.length % 48),
            duration_ms = bytes.length.toLong * 10))
    }
  }

  /** STUB image decode: a real implementation opens the codec once per
    * partition and decodes each payload; the fake emits `meta` dimensions
    * and the first 64 payload bytes as "pixels". Batch shape (per
    * partition, streaming rows through shared decoder state) is the real
    * contract. */
  def decodeImage(ds: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // STUB: real code -> val codec = ImageIO codec init, once per partition
      it.filter(_.kind == "image").map { m =>
        DecodedImage(m.media_id, m.meta.width, m.meta.height,
          m.bytes.take(64))
      }
    }
  }

  /** STUB resize: scales the metadata dims and subsamples every k-th
    * payload byte (a real impl resamples decoded pixels). */
  def resizeStub(ds: Dataset[DecodedImage], maxDim: Int): Dataset[DecodedImage] = {
    import ds.sparkSession.implicits._
    ds.map { d =>
      val scale = math.max(1, math.max(d.width, d.height) / maxDim)
      DecodedImage(d.media_id, d.width / scale, d.height / scale,
        d.pixels.zipWithIndex.collect { case (b, i) if i % scale == 0 => b })
    }
  }

  /** REAL byte-value histogram (256 bins) per media row — the
    * feature-extraction step; reuses one buffer per row inside a
    * partition batch. */
  def byteHistogram(ds: Dataset[MediaRecord]): Dataset[ByteHist] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val h = new Array[Long](256)
        var i = 0
        while (i < m.bytes.length) { h(m.bytes(i) & 0xff) += 1; i += 1 }
        ByteHist(m.media_id, m.bytes.length.toLong, h)
      }
    }
  }

  /** REAL frame sampling: n contiguous, evenly-sized slices of the
    * payload (a real impl seeks to keyframes; the slicing/array-of-binary
    * schema is the contract). */
  def frameSample(ds: Dataset[MediaRecord], n: Int): Dataset[FrameSet] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val len = m.bytes.length
        val frames = (0 until n).map { i =>
          m.bytes.slice(i * len / n, (i + 1) * len / n)
        }.toArray
        FrameSet(m.media_id, n, frames)
      }
    }
  }

  /** Corpus-level byte-value distribution: histograms are exploded to
    * (byte_val, count) and partially aggregated map-side — only 256-row
    * features shuffle, never payloads. */
  def corpusByteHistogram(ds: Dataset[ByteHist]): DataFrame =
    ds.select(col("media_id"), posexplode(col("hist")).as(Seq("byte_val", "c")))
      .groupBy("byte_val")
      .agg(sum("c").as("n"))
      .where(col("n") > 0)
      .orderBy("byte_val")
}
