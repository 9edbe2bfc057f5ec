package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpecBase
import graft.multimodal.Multimodal._

/** Spark-side multimodal plumbing contracts: schemas, determinism,
  * payload conservation, and feature-only shuffle shape. */
class MultimodalSpec extends AnyFunSuite with SparkSpecBase {

  import spark.implicits._

  private def docs = Seq(
    (0L, "aaab"),
    (1L, "hello world"),
    (2L, "zzzz zz"),
    (3L, "abcabc")).toDF("doc_id", "text")

  test("fromDocuments: kinds round-robin, payload bytes preserved") {
    val media = fromDocuments(docs).collect().sortBy(_.media_id)
    assert(media.map(_.kind).toSeq === Seq("image", "audio", "video", "image"))
    assert(new String(media(1).bytes, "UTF-8") === "hello world")
    assert(media(0).meta.mime_type === "image/png")
  }

  test("byteHistogram: counts sum to payload length, known char counts") {
    val hists = byteHistogram(fromDocuments(docs)).collect()
      .map(h => h.media_id -> h).toMap
    assert(hists(0L).hist.sum === 4L)
    assert(hists(0L).hist('a'.toInt) === 3L)
    assert(hists(0L).hist('b'.toInt) === 1L)
    assert(hists.values.map(_.n_bytes).sum === docs.collect()
      .map(_.getString(1).getBytes("UTF-8").length.toLong).sum)
  }

  test("corpusByteHistogram: matches direct char counting") {
    val hist = corpusByteHistogram(byteHistogram(fromDocuments(docs)))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val expected = docs.collect().flatMap(_.getString(1).getBytes("UTF-8"))
      .groupBy(b => b & 0xff).map { case (k, v) => k -> v.length.toLong }
    assert(hist === expected)
  }

  test("frameSample: n frames, concatenation reconstructs payload") {
    val fs = frameSample(fromDocuments(docs), n = 3).collect()
      .sortBy(_.media_id)
    assert(fs.forall(_.frames.length === 3))
    fs.foreach { f =>
      val joined = f.frames.flatten
      val orig = fromDocuments(docs).collect()
        .find(_.media_id == f.media_id).get.bytes
      assert(joined.toSeq === orig.toSeq)
    }
  }

  test("decodeImage stub: only images, deterministic dims from meta") {
    val dec = decodeImage(fromDocuments(docs)).collect().sortBy(_.media_id)
    assert(dec.map(_.media_id).toSeq === Seq(0L, 3L))
    val again = decodeImage(fromDocuments(docs)).collect().sortBy(_.media_id)
    assert(dec.map(_.pixels.toSeq).toSeq === again.map(_.pixels.toSeq).toSeq)
  }

  test("resizeStub: dims shrink under maxDim, pixels subsampled") {
    val dec = decodeImage(fromDocuments(docs))
    val rs = resizeStub(dec, maxDim = 8).collect()
    assert(rs.forall(d => d.width <= 16 && d.height <= 16))
  }
}
