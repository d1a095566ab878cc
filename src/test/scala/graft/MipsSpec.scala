package graft

import graft.pipeline.Similarity

class MipsSpec extends SparkSpec {

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("mipsTopK ranks by inner product with dense ranks and no self-matches") {
    val got = rowsOf(Similarity.mipsTopK(spark, SF))
    assert(got.nonEmpty)
    val byQuery = got.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(3)).sorted == (1L to rows.size).toSeq,
        s"query $q ranks not dense")
      assert(rows.forall(_.getLong(1) != q), s"query $q self-match")
      // ip non-increasing with rank
      val byRank = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mipsTopK agrees with a driver-side brute force for every query") {
    val vecs = rowsOf(Tables.embeddings(spark, SF)
        .selectExpr("vec_id", "cast(embedding as array<double>) as v"))
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val got = rowsOf(Similarity.mipsTopK(spark, SF))
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(3)).map(_.getLong(1))).toMap
    (0L until 10L).foreach { q =>
      val want = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          val ip = java.math.BigDecimal.valueOf(dot(vecs(q), v))
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          (id, ip)
        }
        .sortBy { case (id, ip) => (-ip, id) }.take(5).map(_._1)
      assert(got(q) == want, s"query $q")
    }
  }

  test("MIPS-ANN: banded augmentation lifts every vector to its band max; recall vs exact is high") {
    // the banded augmentation contract: ||x ++ sqrt(Mb^2-||x||^2)|| == Mb
    // within each norm band (band = fixed fraction of the global max)
    val vecs = rowsOf(Tables.embeddings(spark, SF)
        .selectExpr("cast(embedding as array<double>) as v"))
      .map(_.getSeq[Double](0).toVector)
    val gm = vecs.map(v => math.sqrt(dot(v, v))).max
    val bandOf = (v: Vector[Double]) =>
      math.min(3, math.floor(math.sqrt(dot(v, v)) / gm * 4).toInt)
    val bmax = vecs.groupBy(bandOf).view
      .mapValues(_.map(v => math.sqrt(dot(v, v))).max).toMap
    vecs.foreach { v =>
      val m = bmax(bandOf(v))
      val aug = math.sqrt(dot(v, v) + math.max(0, m * m - dot(v, v)))
      assert(math.abs(aug - m) < 1e-9)
    }
    val exact = rowsOf(Similarity.mipsTopK(spark, SF))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = rowsOf(Similarity.mipsAnn(spark, SF))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = exact.toSeq.map { case (q, top) =>
      (ann.getOrElse(q, Set.empty) & top).size.toDouble / top.size
    }
    val recall = hits.sum / hits.size
    info(f"MIPS-ANN recall@5 vs exact: $recall%.3f")
    assert(recall >= 0.75, f"MIPS-ANN recall collapsed: $recall%.3f")
  }
}
