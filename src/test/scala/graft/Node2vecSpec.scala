package graft

import org.apache.spark.sql.functions._
import graft.graph.{Clouds, TestGraph}

/** Independent-JVM replay of the node2vec biased walk: rebuilds the
  * sf0.001 graph driver-side, reimplements the capped adjacency, the
  * exponential-clock weighted choice and the p/q rule with plain Scala,
  * and asserts the operator's rows match exactly. This is a second
  * implementation of the SEMANTICS (the DuckDB oracle is the first),
  * so a shared-bug in the Spark expression tree can't self-certify. */
class Node2vecSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("node2vec walks replay an independent JVM simulation of the biased rule") {
    val canon = rowsOf(TestGraph.sharesDna(spark, SF)
      .filter(col("distance") <= TestGraph.QueryThreshold)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
      .map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = canon.toSet
    val und = canon ++ canon.map(_.swap)
    val adj: Map[Long, Seq[Long]] = und.groupBy(_._1).map { case (u, vs) =>
      u -> vs.map(_._2)
        .sortBy(v => (h60(s"$u|$v"), v)).take(Clouds.WalkAdjCap)
    }
    val nodes = rowsOf(TestGraph.phageNodes(spark, SF).select(col("id")))
      .map(_.getLong(0))

    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    nodes.foreach { start =>
      var prev = -1L // sentinel: no prev at step 1
      var cur = start
      expected += ((start, 0, start))
      var alive = true
      for (s <- 1 to Clouds.WalkLen if alive) {
        adj.get(cur).filter(_.nonEmpty) match {
          case None => alive = false
          case Some(cands) =>
            val next =
              if (s == 1) cands.minBy(v => (h60(s"$start|$s|$v"), v))
              else cands.minBy { v =>
                val u01 = (h60(s"$start|$s|$v") + 1L).toDouble / math.pow(2.0, 60)
                val w =
                  if (v == prev) 0.25
                  else if (edgeSet.contains((math.min(prev, v), math.max(prev, v)))) 1.0
                  else 4.0
                (-math.log(u01) / w, v)
              }
            expected += ((start, s, next))
            prev = cur
            cur = next
        }
      }
    }

    val got = rowsOf(Clouds.node2vecWalks(spark, SF))
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet == expected.toSet,
      s"diff: extra=${(got.toSet -- expected.toSet).take(5)} " +
        s"missing=${(expected.toSet -- got.toSet).take(5)}")
    assert(got.size == expected.size)
    // and the walks actually traverse edges
    got.groupBy(_._1).foreach { case (_, steps) =>
      steps.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, a), (_, _, b)) =>
          assert(edgeSet.contains((math.min(a, b), math.max(a, b))))
        case _ =>
      }
    }
  }
}
