package graft

import org.apache.spark.sql.functions._
import graft.relational.{Joins, Tpch}

class JoinsSpec extends SparkSpec {

  test("as-of join: every purchase row appears once; attribution never looks forward") {
    val purchases = rowsOf(
      Tables.events(spark, SF).filter(col("event_type") === "purchase"))
    val r = rowsOf(Joins.qAsofJoin(spark, SF))
    assert(r.size == purchases.size)
    r.foreach { row =>
      if (!row.isNullAt(row.fieldIndex("last_click_us")))
        assert(row.getLong(row.fieldIndex("last_click_us")) <=
          row.getLong(row.fieldIndex("purchase_us")))
    }
  }

  test("as-of join matches a per-user brute-force scan") {
    val ev = rowsOf(Tables.events(spark, SF)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type")))
    val clicksByUser = ev.filter(_.getString(2) == "click")
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val r = rowsOf(Joins.qAsofJoin(spark, SF))
    r.foreach { row =>
      val user = row.getLong(row.fieldIndex("user_id"))
      val pUs = row.getLong(row.fieldIndex("purchase_us"))
      val expect = clicksByUser.getOrElse(user, Nil).filter(_ <= pUs)
        .lastOption
      val got = if (row.isNullAt(row.fieldIndex("last_click_us"))) None
        else Some(row.getLong(row.fieldIndex("last_click_us")))
      assert(got == expect, s"user=$user purchase_us=$pUs")
    }
  }

  test("range join counts match a brute-force window scan") {
    val ev = rowsOf(Tables.events(spark, SF)
      .select(col("event_id"), unix_timestamp(col("ts")).as("sec"), col("event_type")))
    val viewSecs = ev.filter(_.getString(2) == "view").map(_.getLong(1))
    val r = rowsOf(Joins.qRangeJoin(spark, SF))
    assert(r.size == ev.count(_.getString(2) == "error"))
    r.foreach { row =>
      val sec = row.getLong(row.fieldIndex("err_sec"))
      val expect = viewSecs.count(v => math.abs(v - sec) <= Joins.RangeWindowSec)
      assert(row.getLong(row.fieldIndex("n_views")) == expect)
    }
  }

  test("range join plan is an equi-join on the bucket key, not a nested loop") {
    val plan = Joins.qRangeJoin(spark, SF).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("funnel stages match a brute-force per-user walk and cover all users") {
    val ev = rowsOf(Tables.events(spark, SF)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("sec")))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fw = Joins.FunnelWindowSec
    val expect = ev.groupBy(_._1).view.mapValues { es =>
      val s = es.filter(_._2 == "signup").map(_._3).minOption
      val c = s.flatMap(sv => es.filter(e => e._2 == "click" && e._3 >= sv && e._3 <= sv + fw)
        .map(_._3).minOption)
      val p = c.flatMap(cv => es.filter(e => e._2 == "purchase" && e._3 >= cv && e._3 <= cv + fw)
        .map(_._3).minOption)
      if (p.isDefined) 3L else if (c.isDefined) 2L else if (s.isDefined) 1L else 0L
    }.toMap
    val hist = expect.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rowsOf(Joins.qEventsFunnel(spark, SF))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hist)
    assert(got.values.sum == expect.size, "every active user is staged exactly once")
  }

  test("rollup emits leaf, subtotal, and grand-total levels that reconcile") {
    val r = rowsOf(Tpch.qRollup(spark, SF))
    val byGid = r.groupBy(_.getLong(r.head.fieldIndex("gid")))
    assert(byGid.keySet == Set(0L, 1L, 3L))
    val total = byGid(3L)
    assert(total.size == 1)
    val iN = r.head.fieldIndex("n_rows")
    val iQty = r.head.fieldIndex("sum_qty")
    assert(byGid(0L).map(_.getLong(iN)).sum == total.head.getLong(iN))
    assert(byGid(1L).map(_.getLong(iN)).sum == total.head.getLong(iN))
    assert(math.abs(byGid(1L).map(_.getDouble(iQty)).sum - total.head.getDouble(iQty)) < 1e-6)
  }

  test("cohort retention matches a brute-force per-user walk; offset 0 is always 1.0") {
    val ev = rowsOf(Tables.events(spark, SF)
      .select(col("user_id"),
        year(col("ts")) * 12 + month(col("ts")).as("mi")))
      .map(r => (r.getLong(0), r.getInt(1)))
    val months = ev.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val cohort = months.view.mapValues(_.min).toMap
    val expect = months.toSeq
      .flatMap { case (u, ms) => ms.map(m => (cohort(u), m - cohort(u))) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = rowsOf(Joins.qCohortRetention(spark, SF))
    val iCm = r.head.fieldIndex("cohort_month")
    val iOff = r.head.fieldIndex("month_offset")
    val iAct = r.head.fieldIndex("n_active")
    val iCoh = r.head.fieldIndex("n_cohort")
    val iRet = r.head.fieldIndex("retention")
    val got = r.map { row =>
      val d = row.getDate(iCm).toLocalDate
      ((d.getYear * 12 + d.getMonthValue, row.getLong(iOff).toInt),
        row.getLong(iAct))
    }.toMap
    assert(got == expect)
    r.filter(_.getLong(iOff) == 0L).foreach { row =>
      assert(row.getLong(iAct) == row.getLong(iCoh))
      assert(row.getDouble(iRet) == 1.0)
    }
    val cohortSizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    r.foreach { row =>
      val d = row.getDate(iCm).toLocalDate
      assert(row.getLong(iCoh) == cohortSizes(d.getYear * 12 + d.getMonthValue))
    }
  }
}
