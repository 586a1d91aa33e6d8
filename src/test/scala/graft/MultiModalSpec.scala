package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultiModal

/** The multimodal plumbing is real even though the codec is stubbed: binary
  * payload column, typed metadata, per-partition batched decode, agreement
  * between the Dataset stub and the Column-expression twin. */
class MultiModalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("media table carries opaque bytes + typed metadata") {
    val media = MultiModal.mediaTable(spark, sfDir)
    val row = media.filter(_.doc_id == 0L).head()
    assert(row.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(row.media_type))
    assert(media.count() === 500)
  }

  test("decodeStub output matches the Column-expression twin exactly") {
    import spark.implicits._
    val decoded = MultiModal.decodeStub(MultiModal.mediaTable(spark, sfDir))
      .collect().map(d => d.doc_id -> ((d.n_bytes, d.width, d.height, d.n_frames)))
      .toMap
    val expr = MultiModal.multimodalMetaQ(spark, sfDir)
      .select($"doc_id", $"n_bytes", $"width", $"height", $"n_frames")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(decoded === expr)
  }

  test("frameSampleStub output matches the Column-expression twin exactly") {
    val stub = MultiModal.frameSampleStub(MultiModal.mediaTable(spark, sfDir))
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame_ts_ms, f.frame_hash))
      .toSet
    val twin = MultiModal.multimodalFramesQ(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(stub === twin)
    assert(stub.nonEmpty)
    // stride respected
    assert(stub.forall(_._2 % MultiModal.FrameStride == 0))
  }

  test("png table holds REAL PNG bytes (magic header) that ImageIO round-trips") {
    val rows = graft.operators.MultiModal
      .pngTable(spark, "/root/testdata/sf0.001").limit(5).collect()
    val magic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte) // \x89PNG
    rows.foreach { r =>
      assert(r.png.take(4).sameElements(magic),
        s"doc ${r.doc_id}: payload is not a PNG")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.png))
      assert(img.getWidth == graft.operators.MultiModal.pngWidth(r.doc_id))
      assert(img.getHeight == graft.operators.MultiModal.pngHeight(r.doc_id))
    }
  }

  test("wav table holds REAL RIFF/WAVE bytes that AudioSystem round-trips") {
    val rows = graft.operators.MultiModal
      .wavTable(spark, "/root/testdata/sf0.001").limit(5).collect()
    rows.foreach { r =>
      assert(new String(r.wav.take(4), "US-ASCII") == "RIFF" &&
        new String(r.wav.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc ${r.doc_id}: payload is not a WAV container")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.wav))
      assert(ais.getFrameLength ==
        graft.operators.MultiModal.wavFrames(r.doc_id))
    }
  }

  test("gif table holds REAL multi-frame GIF containers (magic + frame count)") {
    val rows = graft.operators.MultiModal
      .gifTable(spark, "/root/testdata/sf0.001").limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(new String(r.gif.take(4), "US-ASCII") == "GIF8",
        s"doc ${r.doc_id}: payload is not a GIF container")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.gif))
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(iis)
      // the container really holds n independent frames, not one
      assert(reader.getNumImages(true) ==
        graft.operators.MultiModal.gifFrameCount(r.doc_id))
      iis.close()
    }
  }

  test("gif frame-sample decodes exact rule pixels at every sampled index") {
    val frames = graft.operators.MultiModal.gifDecode(
      graft.operators.MultiModal.gifTable(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % MultiModal.FrameStride == 0))
    frames.foreach { f =>
      val (r, g, b) = graft.operators.MultiModal.gifRgb(f.doc_id, f.frame_idx)
      assert((f.r, f.g, f.b) == ((r, g, b)),
        s"doc ${f.doc_id} frame ${f.frame_idx}: palette did not round-trip")
      assert(f.w == graft.operators.MultiModal.gifW(f.doc_id))
      assert(f.h == graft.operators.MultiModal.gifH(f.doc_id))
    }
  }

  test("decode preserves partitioning (no shuffle) and is deterministic") {
    val media = MultiModal.mediaTable(spark, sfDir).repartition(7)
    val decoded = MultiModal.decodeStub(media)
    assert(decoded.rdd.getNumPartitions === 7)
    val a = decoded.collect().sortBy(_.doc_id).toSeq
    val b = MultiModal.decodeStub(media).collect().sortBy(_.doc_id).toSeq
    assert(a === b)
  }
}
