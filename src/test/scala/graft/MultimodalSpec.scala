package graft

import org.apache.spark.sql.types._
import graft.pipeline.Multimodal

class MultimodalSpec extends SparkSpec {

  test("multimodal metadata: typed schema and deterministic stub decode") {
    val df = Multimodal.multimodalMeta(spark, SF)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("doc_id") == LongType && types("n_bytes") == LongType)
    assert(types("magic") == StringType)
    assert(types("width") == IntegerType && types("height") == IntegerType)
    assert(types("feature_checksum") == LongType)

    val meta = rowsOf(df).map(r => r.getLong(0) -> r).toMap
    val docs = rowsOf(graft.pipeline.Docs.docs(spark, SF)).map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.take(20).foreach { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val row = meta(id)
      assert(row.getLong(row.fieldIndex("n_bytes")) == bytes.length.toLong)
      assert(row.getString(row.fieldIndex("magic")) == text.take(4))
      assert(row.getInt(row.fieldIndex("width")) == (bytes.length % 640))
      assert(row.getInt(row.fieldIndex("n_frames")) == (bytes.length % 16 + 1))
      val expected = bytes.foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L)
      assert(row.getLong(row.fieldIndex("feature_checksum")) == expected)
    }
  }
}
