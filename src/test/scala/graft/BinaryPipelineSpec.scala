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
}
