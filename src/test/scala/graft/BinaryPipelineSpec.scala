package graft

import graft.multimodal.{BinaryPipeline, MediaRecord}

class BinaryPipelineSpec extends SparkSpec {

  test("media records carry binary payload + typed metadata through decode") {
    val docs = Tables.documents(spark, sfDir)
    val records = BinaryPipeline.mediaRecords(docs)
    val features = BinaryPipeline.decode(records)
    assert(features.count() == docs.count())
    val f = features.orderBy("media_id").head()
    assert(f.width >= 64 && f.height >= 64 && (1 to 3).contains(f.channels))
    // ascii text: byte length equals n_chars
    val nb = records.orderBy("media_id").head().n_bytes
    val nc = docs.orderBy("doc_id").head().getAs[Long]("n_chars")
    assert(nb == nc)
  }

  test("decode is deterministic and byte-sensitive") {
    val a = MediaRecord(1L, "hello world".getBytes("UTF-8"), "x", 11L)
    val b = MediaRecord(1L, "hello world".getBytes("UTF-8"), "x", 11L)
    val c = MediaRecord(1L, "hello worlz".getBytes("UTF-8"), "x", 11L)
    assert(BinaryPipeline.decodeOne(a) == BinaryPipeline.decodeOne(b))
    assert(BinaryPipeline.decodeOne(a) != BinaryPipeline.decodeOne(c))
  }

  test("resize fits the bounding box, preserves aspect, leaves fits alone") {
    val s = spark
    import s.implicits._
    val feats = Seq(
      graft.multimodal.MediaFeatures(1L, 1280, 720, 3, 0L, 0L), // downscale
      graft.multimodal.MediaFeatures(2L, 100, 50, 1, 0L, 0L)    // already fits
    ).toDS()
    val out = BinaryPipeline.resize(feats, 640, 640).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(out(2L) == ((100, 50)), "no upscale / no change when it fits")
    val (w, h) = out(1L)
    assert(w <= 640 && h <= 640, s"out of box: ${(w, h)}")
    // aspect 16:9 preserved within integer rounding
    assert(math.abs(w * 720 - h * 1280) <= 1280, s"aspect broken: ${(w, h)}")
  }

  test("frame sampling emits every stride-th fixed-size chunk, no shuffle") {
    val s = spark
    import s.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val rec = Seq(MediaRecord(7L, payload, "video/fake", 100L)).toDS()
    val frames = BinaryPipeline.sampleFrames(rec, frameSize = 16, stride = 2)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = frames.collect().sortBy(_.frame_idx)
    // ceil(100/16) = 7 frames, indices 0,2,4,6 sampled
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    assert(got.take(3).forall(_.frame_bytes.length == 16))
    assert(got.last.frame_bytes.length == 100 - 6 * 16) // tail frame truncated
    assert(got(1).frame_bytes.head == 32.toByte) // frame 2 starts at byte 32
  }
}
