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

  test("frame sampling: ≤4 evenly spaced frames, exact byte ranges, per-frame checksums") {
    val frames = rowsOf(Multimodal.frameSample(spark, SF))
    val docs = rowsOf(graft.pipeline.Docs.docs(spark, SF))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every doc gets sampled frames")
    byDoc.foreach { case (id, rows) =>
      val bytes = docs(id).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val nf = bytes.length % 16 + 1
      assert(rows.size == math.min(4, nf))
      rows.foreach { r =>
        val off = r.getLong(r.fieldIndex("frame_offset")).toInt
        val len = r.getLong(r.fieldIndex("frame_len")).toInt
        val expect = bytes.slice(off, off + len)
          .foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L)
        assert(r.getLong(r.fieldIndex("frame_checksum")) == expect)
      }
      // first and last frames are always sampled
      val idxs = rows.map(_.getInt(1)).sorted
      assert(idxs.head == 0 && (nf <= 4 || idxs.last == nf - 1))
    }
  }

  test("resize plan fits the 224 box, preserves aspect ratio, never upscales") {
    val rows = rowsOf(graft.pipeline.Multimodal.resizePlan(spark, SF))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sw, sh) = (r.getLong(r.fieldIndex("src_w")), r.getLong(r.fieldIndex("src_h")))
      val (ow, oh) = (r.getLong(r.fieldIndex("out_w")), r.getLong(r.fieldIndex("out_h")))
      assert(ow >= 1 && oh >= 1 && ow <= 224 && oh <= 224)
      assert(ow <= sw && oh <= sh, "never upscales")
      if (r.getBoolean(r.fieldIndex("resized"))) {
        // longest side pinned to the box; other side scaled proportionally
        assert(math.max(ow, oh) == 224 ||
          (math.min(sw, sh) * 224 / math.max(sw, sh)) <= 1)
        val expectW = math.max(sw * 224 / math.max(sw, sh), 1L)
        assert(ow == expectW)
      } else assert(ow == sw && oh == sh)
      assert(r.getLong(r.fieldIndex("out_bytes")) == ow * oh * 3)
    }
  }

  test("shard packing bounds every shard and packs each writer stream densely") {
    val rows = rowsOf(graft.pipeline.Multimodal.shardPack(spark, SF))
      .map(r => (r.getString(r.fieldIndex("lang")), r.getLong(r.fieldIndex("bucket")),
        r.getLong(r.fieldIndex("shard_idx")), r.getLong(r.fieldIndex("n_bytes")),
        r.getLong(r.fieldIndex("doc_id"))))
    assert(rows.nonEmpty)
    val cap = graft.pipeline.Multimodal.ShardBytes
    rows.groupBy(t => (t._1, t._2, t._3)).foreach { case (shard, members) =>
      val bytes = members.map(_._4).sum
      // a shard only exceeds capacity by (at most) its final payload —
      // the payload that crossed the boundary still lands in the shard
      // whose first byte it started in
      assert(bytes < cap + members.map(_._4).max,
        s"shard $shard over-packed: $bytes")
    }
    // shard indices per writer stream are dense from 0
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, members) =>
      val idxs = members.map(_._3).distinct.sorted
      assert(idxs == (0L until idxs.size))
    }
  }

  test("modality join accounts for every row of BOTH sides exactly once") {
    import org.apache.spark.sql.functions._
    val r = rowsOf(graft.pipeline.Multimodal.modalityJoin(spark, SF))
    assert(r.nonEmpty)
    val byModality = r.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val nDocs = Tables.documents(spark, SF).count()
    val nEmb = Tables.embeddings(spark, SF).count()
    val shared = Tables.documents(spark, SF).select(col("doc_id").as("id"))
      .join(Tables.embeddings(spark, SF).select(col("vec_id").as("id")), Seq("id"))
      .count()
    assert(byModality.getOrElse("both", 0L) == shared)
    assert(byModality.getOrElse("text_only", 0L) == nDocs - shared)
    assert(byModality.getOrElse("embedding_only", 0L) == nEmb - shared)
    // embedding-only rows carry the null-bucket language
    r.filter(_.getString(1) == "embedding_only")
      .foreach(row => assert(row.getString(0) == "--"))
  }

  test("phash dedup: exact copy at hamming 0, near copy close, stranger absent") {
    val base = Seq.tabulate(60)(i => s"w${i % 17}tok").mkString(" ")
    val near = base.replace("w3tok", "w3toq") // small payload edit
    val other = Seq.tabulate(60)(i => s"z${(i * 7) % 23}q").mkString(" ")
    val d = TestSession.docsFixture(Seq(
      (0L, base, "en", "s", base.length.toLong),
      (1L, base, "en", "s", base.length.toLong),   // exact payload copy
      (2L, near, "en", "s", near.length.toLong),   // near-dup payload
      (3L, other, "en", "s", other.length.toLong)))
    val pairs = rowsOf(graft.pipeline.Multimodal.phashDedup(spark, d))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) == 0L, "identical payloads at hamming 0")
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) <= 3L,
      s"the re-encoded copy stays within the hamming budget: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "the unrelated payload pairs with nothing")
  }
}
