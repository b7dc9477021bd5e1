package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("payload/meta plumbing: binary column + byte counts") {
    val session = spark
    import session.implicits._
    val docs = Seq((1L, "hello"), (2L, "český text")).toDF("doc_id", "text")
    val out = Multimodal.withPayloadMeta(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Array[Byte]]("payload"), r.getAs[Long]("n_bytes"))).toMap
    assert(out(1L)._2 == 5L)
    assert(new String(out(1L)._1, "UTF-8") == "hello")
    // non-ASCII: n_bytes counts UTF-8 bytes, not chars
    assert(out(2L)._2 > "český text".length)
  }

  test("typed feature extraction is deterministic and batch-shaped") {
    val session = spark
    import session.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "payload-one".getBytes("UTF-8"), "text/plain", 11L),
      Multimodal.Asset(2L, "payload-two".getBytes("UTF-8"), "text/plain", 11L))
      .toDS()
    val f1 = Multimodal.extractFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(assets, dim = 8).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f1 == f2) // deterministic stub
    assert(f1(1L).length == 8)
    assert(f1(1L) != f1(2L)) // content-sensitive
  }
}
