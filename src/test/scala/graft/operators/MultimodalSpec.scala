package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {

  private lazy val docs = {
    val s = TestSpark.spark
    import s.implicits._
    Seq((0L, "hello world", 11L), (1L, "audio doc", 9L), (2L, "a video doc", 11L))
      .toDF("doc_id", "text", "n_chars")
  }

  test("assets: binary payload + typed metadata, kind cycles by id") {
    val a = Multimodal.assets(docs).orderBy(col("asset_id")).collect()
    assert(a.map(_.getString(1)).toSeq == Seq("image", "audio", "video"))
    assert(a.head.getAs[Array[Byte]]("data").length == 16) // md5 bytes
    assert(a.head.getStruct(3).getInt(0) >= 16) // width
  }

  test("extractFeatures: batched kernel, features in [0,1), deterministic") {
    val f1 = Multimodal.extractFeatures(Multimodal.assets(docs)).orderBy(col("asset_id")).collect()
    val f2 = Multimodal.extractFeatures(Multimodal.assets(docs)).orderBy(col("asset_id")).collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(r => (1 to 4).forall(i => r.getDouble(i) >= 0 && r.getDouble(i) < 1)))
  }

  test("resize caps metadata without touching payload") {
    val r = Multimodal.resize(Multimodal.assets(docs), 32, 32)
      .select(col("meta.width"), col("meta.height"), length(col("data"))).collect()
    assert(r.forall(x => x.getInt(0) <= 32 && x.getInt(1) <= 32 && x.getInt(2) == 16))
  }

  test("sampleFrames: only video assets, stride respected, offsets monotonic") {
    val f = Multimodal.sampleFrames(Multimodal.assets(docs), 2).collect()
    assert(f.nonEmpty && f.forall(_.getLong(0) == 2L)) // only doc_id 2 is video
    val offs = f.map(_.getLong(2)).toSeq
    assert(offs == offs.sorted)
    assert(f.map(_.getLong(1)).forall(_ % 2 == 0))
  }
}
