package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine._

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def media = Multimodal.mediaTable(Tables.table(spark, sf, "documents"))

  test("media schema: opaque binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    val meta = sch("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height"))
    // payload bytes round-trip to the source text
    val r = media.filter(col("media_id") === 0).select(col("payload")).head()
    val text = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text")).head().getString(0)
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == text)
  }

  test("decodeFeatures: partition-batch shape, fixed dim, deterministic") {
    val f1 = Multimodal.decodeFeatures(media, dim = 8)
    assert(f1.schema("feature").dataType.simpleString == "array<float>")
    val rows = f1.orderBy("media_id").collect()
    assert(rows.forall(_.getInt(1) == 8))
    assert(rows.forall(_.getSeq[Float](2).length == 8))
    // determinism across independent runs (fresh plan, fresh partitions)
    val again = Multimodal.decodeFeatures(media, dim = 8)
      .orderBy("media_id").collect()
    assert(rows.map(_.getSeq[Float](2)).toSeq == again.map(_.getSeq[Float](2)).toSeq)
    // repartitioning must not change per-row results (batch independence)
    val shuffled = Multimodal.decodeFeatures(media.repartition(7), dim = 8)
      .orderBy("media_id").collect()
    assert(rows.map(_.getSeq[Float](2)).toSeq == shuffled.map(_.getSeq[Float](2)).toSeq)
  }

  test("frameSample covers every payload with ceil(len/64) frames") {
    val n = media.count()
    val allFrames = Multimodal.frameSample(media, frameBytes = 64, every = 1)
    val perDoc = allFrames.groupBy("media_id").count()
      .join(media.select(col("media_id"), col("payload_len")), "media_id")
      .withColumn("expected", ceil(col("payload_len") / 64.0))
      .filter(col("count") =!= col("expected"))
    assert(perDoc.count() == 0)
    assert(allFrames.select("media_id").distinct().count() == n)
  }

  test("resizeMeta preserves aspect ratio within a bounding box") {
    val out = Multimodal.resizeMeta(media, 320, 180)
      .select(col("meta.width"), col("meta.height")).collect()
    assert(out.forall(r => r.getInt(0) <= 320 && r.getInt(1) <= 180))
    assert(out.forall(r => r.getInt(0) > 0 && r.getInt(1) > 0))
  }
}
