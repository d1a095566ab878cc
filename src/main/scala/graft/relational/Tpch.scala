package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational/OLAP core: TPC-H-shaped queries over the driver testdata.
  *
  * Correctness-by-construction against the DuckDB oracle:
  *   - money/quantity aggregations go through DECIMAL casts (exact,
  *     order-independent) and are converted to DOUBLE only at the end, so
  *     the result is bit-identical regardless of partial-agg ordering;
  *   - timestamps in outputs are formatted to `yyyy-MM-dd` strings to dodge
  *     parquet timestamp-unit / timezone representation drift;
  *   - every result carries a total ORDER BY for deterministic top-k.
  *
  * Scale notes: each query is a declarative plan — filters and projections
  * reach the parquet scan (verified via explain), dimension sides of joins
  * are broadcast, aggregations get map-side partial combine for free.
  */
object Tpch {

  private val D12_2 = DecimalType(12, 2)
  private val D12_4 = DecimalType(12, 4)

  /** TPC-H Q1 shape: scan + filter + groupBy with exact decimal sums. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1999-06-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity".cast(D12_2)), 2).cast("double").as("sum_qty"),
        round(sum($"l_extendedprice".cast(D12_2)), 2).cast("double").as("sum_base_price"),
        round(sum($"l_extendedprice".cast(D12_4) * (lit(1.0) - $"l_discount").cast(D12_4)), 2)
          .cast("double").as("sum_disc_price"),
        round(sum($"l_extendedprice".cast(D12_4) * (lit(1.0) - $"l_discount").cast(D12_4)
          * (lit(1.0) + $"l_tax").cast(D12_4)), 2).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3 body over caller-supplied base tables — the seam that runs
    * the identical plan against raw parquet OR bucketed catalog tables
    * (LayoutSpec asserts the bucketed variant's orders⋈lineitem joins
    * with ZERO exchanges at bench SF: the shuffle was paid at write
    * time, which is the entire point of [[graft.sources.Layout]]). */
  def q3Body(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
    val ord = orders
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
    val li = lineitem
      .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      // customer is SF-proportional even segment-filtered — no forced
      // broadcast; AQE upgrades the join to broadcast at small SF
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice").cast(D12_4) *
          (lit(1.0) - col("l_discount")).cast(D12_4)), 2)
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q3 shape: selective 3-way join + agg + deterministic top-10. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame =
    q3Body(Tables.customer(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir))

  /** TPC-H Q5 shape: 6-way join. True bounded dimensions (region,
    * nation) are broadcast; CUSTOMER and SUPPLIER are scale-factor-
    * proportional (15 M / 1 M rows at sf100 — past broadcast range), so
    * they take stats/AQE-decided joins and AQE is free to upgrade them
    * to broadcast at small SF. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir)
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      // supplier is SF-proportional too (1 M rows at sf100) — like
      // customer it takes a stats/AQE-decided join, not a forced hint
      .join(supp,
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice".cast(D12_4) * (lit(1.0) - $"l_discount").cast(D12_4)), 2)
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q10 shape: the returned-item report — which customers
    * returned the most revenue in a quarter. 4-way join (lineitem ⋈
    * orders ⋈ customer ⋈ nation) with the returnflag and date filters
    * pushed to the scans, group by the full customer payload, top-20 on
    * a total order. nation is the only forced broadcast (bounded dim);
    * customer joins by stats/AQE. `q10_returned_items`. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(round(sum($"l_extendedprice".cast(D12_4) * (lit(1.0) - $"l_discount").cast(D12_4)), 2)
        .cast("double").as("revenue"))
      .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** TPC-H Q18 shape: large-volume orders (customers who placed orders
    * above a quantity threshold). The classic Q18 rewrite: ONE scan of
    * lineitem — the per-order quantity aggregate serves as both the
    * HAVING filter and the reported quantity (the spec's correlated IN
    * subquery would scan lineitem twice). The >300 filter keeps ~0.1%
    * of orders, so the orders/customer joins run with a tiny build side
    * (AQE broadcasts it at any SF). `q18_large_orders`. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qty = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(round(sum($"l_quantity".cast(D12_2)), 2).cast("double").as("total_qty"))
      .filter($"total_qty" > 300.0)
    qty.join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
        $"o_totalprice", $"total_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** TPC-H Q17 shape: small-quantity-order revenue — the CORRELATED
    * SCALAR SUBQUERY pattern (`l_quantity < 0.2 * (SELECT avg(qty) for
    * this part)`), decorrelated the way Catalyst would: the per-part
    * threshold is ONE aggregate over lineitem joined back on the part
    * key, so lineitem is scanned twice but never per-row re-queried.
    * The threshold is computed as 0.2·(decimal-exact sum / count) in
    * double — identical IEEE ops in both engines, so the `<` filter
    * decisions replay exactly (a plain double AVG would be
    * partial-order-dependent and flip boundary rows). `q17_small_qty`. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val thr = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey".as("t_partkey"))
      .agg((lit(0.2) * (sum($"l_quantity".cast(D12_2)).cast("double") /
        count(lit(1)))).as("qty_threshold"))
    val brandParts = Tables.part(spark, dir)
      .filter($"p_brand" === "Brand#23")
      .select($"p_partkey")
    Tables.lineitem(spark, dir)
      .join(brandParts, $"l_partkey" === $"p_partkey")
      .join(thr, $"l_partkey" === $"t_partkey")
      .filter($"l_quantity" < $"qty_threshold")
      .agg(round(sum($"l_extendedprice".cast(D12_2)).cast("double") / 7.0, 2)
        .as("avg_yearly"),
        count(lit(1)).as("n_small_orders"))
  }

  /** TPC-H Q4 shape: order-priority checking — orders in a quarter with
    * at least one line item shipped after the order date, counted per
    * priority. THE `EXISTS` correlated-subquery pattern, planned as a
    * LEFT-SEMI join (equi key + residual inequality): lineitem never
    * duplicates order rows, no post-join distinct. The date filter is
    * pushed to the orders scan; at 100 TB the semi join shuffles on the
    * order key only. `q4_priority_exists`. */
  def q4PriorityExists(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate",
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q12 shape: late-shipment priority audit — line items shipped
    * more than 60 days after their order, split per line status into
    * high-priority (URGENT/HIGH) vs low-priority counts. The
    * CONDITIONAL-AGGREGATION pattern: both counters fold into ONE
    * map-side-combined aggregate over the join (the naive form runs two
    * filtered scans). Join shuffles on the order key; the `CASE` sums
    * are integers, so parity is unconditional. `q12_late_priority`. */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val high = when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > to_timestamp(date_add(to_date($"o_orderdate"), 60)))
      .groupBy($"l_linestatus")
      .agg(sum(high).as("high_line_count"),
        sum(lit(1L) - high).as("low_line_count"),
        count(lit(1)).as("n_late"))
      .orderBy($"l_linestatus")
  }

  /** TPC-H Q14 shape: promotion-revenue share — what fraction of a
    * quarter's discounted revenue came from PROMO-type parts. The
    * CONDITIONAL-RATIO pattern: numerator and denominator are decimal
    * sums out of ONE aggregate (the conditional sum is null-skipping,
    * not a second scan); the single double division + round(4) is the
    * only float op. Part is SF-proportional → stats/AQE-decided join,
    * no forced broadcast. `q14_promo_revenue`. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val disc = $"l_extendedprice".cast(D12_4) * (lit(1.0) - $"l_discount").cast(D12_4)
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", disc)).as("promo_sum"),
        sum(disc).as("total_sum"))
      .select(
        round(lit(100.0) * (coalesce($"promo_sum", lit(0)).cast("double") /
          $"total_sum".cast("double")), 4).as("promo_pct"),
        round(coalesce($"promo_sum", lit(0)), 2).cast("double").as("promo_revenue"),
        round($"total_sum", 2).cast("double").as("total_revenue"))
  }

  /** TPC-H Q7 shape: volume shipping between two trading nations — for
    * each (supplier nation, customer nation) direction of the pair,
    * yearly discounted revenue. The classic DOUBLE-DIMENSION join:
    * lineitem reaches nation twice, once through supplier and once
    * through orders→customer; both nation joins are broadcast (bounded
    * dim), the pair filter prunes to the two nations BEFORE the big
    * join, and the year comes from the shipdate already in hand (no
    * extra scan). Revenue is a decimal sum. `q7_volume_shipping`. */
  def q7VolumeShipping(spark: SparkSession, dir: String,
                       nationA: String = "NATION_1",
                       nationB: String = "NATION_2"): DataFrame = {
    import spark.implicits._
    val n1 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
      .filter($"supp_nation".isin(nationA, nationB))
    val n2 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
      .filter($"cust_nation".isin(nationA, nationB))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(n1), $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"supp_nation")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(n2), $"c_nationkey" === $"c_nk")
      .select($"c_custkey", $"cust_nation")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      .agg(round(sum($"l_extendedprice".cast(D12_4) *
          (lit(1.0) - $"l_discount").cast(D12_4)), 2)
        .cast("double").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q9 shape: product-type profit by nation and year. The spec's
    * supply cost comes from partsupp (absent in this corpus); the
    * deterministic stand-in is 10% of the part's retail price, rounded
    * to cents ONCE before the decimal arithmetic so both engines
    * subtract the identical DECIMAL(12,2) unit cost. profit =
    * disc_price − unit_cost·qty, summed exactly; the widget-name filter
    * is pushed to the part scan. `q9_product_profit`. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir)
      .filter($"p_name".contains("widget"))
      .select($"p_partkey",
        round($"p_retailprice" * 0.1, 2).cast(D12_2).as("unit_cost"))
    val amount = $"l_extendedprice".cast(D12_4) *
      (lit(1.0) - $"l_discount").cast(D12_4) -
      $"unit_cost" * $"l_quantity".cast(D12_2)
    Tables.lineitem(spark, dir)
      .join(part, $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
      .agg(round(sum(amount), 2).cast("double").as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** TPC-H Q13 shape: customer order-count distribution — how many
    * customers placed 0, 1, 2… qualifying orders. The DOUBLE
    * AGGREGATION: a LEFT OUTER join keeps order-less customers (their
    * count is 0, not a missing row), the first groupBy collapses to one
    * row per customer, the second to one row per count value — the
    * second input is |customers| rows at most, so the heavy shuffle
    * happens exactly once. `q13_cust_distribution`. */
  def q13CustDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    Tables.customer(spark, dir).select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
    * (three brand/size/quantity envelopes). The join stays a single
    * equi-join on partkey with the disjunction as a residual filter;
    * per-side conjuncts that appear in EVERY branch (size ≥ 1, qty ≥ 1)
    * are pushed to the scans. One decimal-sum row out.
    * `q19_disc_revenue`. */
  def q19DiscRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val branch1 = $"p_brand" === "Brand#13" && $"p_size".between(1, 15) &&
      $"l_quantity".between(1, 20)
    val branch2 = $"p_brand" === "Brand#5" && $"p_size".between(1, 25) &&
      $"l_quantity".between(5, 30)
    val branch3 = $"p_brand" === "Brand#19" && $"p_size".between(1, 30) &&
      $"l_quantity".between(10, 40)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .filter(branch1 || branch2 || branch3)
      .agg(round(sum($"l_extendedprice".cast(D12_4) *
          (lit(1.0) - $"l_discount").cast(D12_4)), 2)
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q22 shape: dormant positive balances by country code —
    * customers whose balance beats the positive-balance average but who
    * placed no orders since mid-1997 (the spec's "no orders at all" is
    * vacuous on this corpus — nearly every customer has SOME order).
    * The scalar average is a 1-row aggregate CROSS-broadcast into the
    * filter (no driver-side collect; one decimal sum ÷ count division,
    * identical in both engines); the dormancy test is a LEFT-ANTI join
    * on the projected custkey with the date filter pushed to the
    * orders scan; the country code is the nation-key decade.
    * `q22_dormant_balance`. */
  def q22DormantBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter($"c_acctbal" > 0)
      .agg((round(sum($"c_acctbal".cast(D12_2)), 2).cast("double") /
        count(lit(1))).as("avg_bal"))
    cust
      .join(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(Tables.orders(spark, dir)
          .filter($"o_orderdate" >= lit("1997-06-01").cast("timestamp"))
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy(($"c_nationkey" % 10).cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        round(sum($"c_acctbal".cast(D12_2)), 2).cast("double").as("totacctbal"))
      .orderBy($"cntrycode")
  }

  /** PARTSUPP stand-in — the corpus ships no partsupp table, so the
    * relation is the DISTINCT (partkey, suppkey) pairs that actually
    * traded in lineitem, carrying hash-derived attributes both engines
    * rebuild identically (the q9 unit-cost precedent, generalized):
    * ps_supplycost = h("cost|pk|sk") % 900 + 100 as whole-dollar
    * DECIMAL(12,2) (integer→decimal, no division — exact in both
    * engines), ps_availqty = h("avail|pk|sk") % 1000 + 1. Feeds
    * Q2/Q11/Q16/Q20 exactly where the spec reads partsupp; the distinct
    * is one shuffle on (pk, sk) and the attributes are codegen'd
    * column expressions on top. */
  private[relational] def partsupp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def h(salt: String) = graft.Hashing.hash60(
      concat_ws("|", lit(salt), $"ps_partkey", $"ps_suppkey"))
    Tables.lineitem(spark, dir)
      .select($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"))
      .distinct()
      .withColumn("ps_supplycost", (pmod(h("cost"), lit(900L)) + 100L).cast(D12_2))
      .withColumn("ps_availqty", pmod(h("avail"), lit(1000L)) + lit(1L))
  }

  /** The DuckDB rendering of [[partsupp]] (a WITH-clause body). */
  private def partsuppSql: String = {
    def h(salt: String) = graft.Hashing.hexFoldSql(
      s"'$salt' || '|' || CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR)")
    s"""SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          CAST(${h("cost")} % 900 + 100 AS DECIMAL(12,2)) AS ps_supplycost,
          ${h("avail")} % 1000 + 1 AS ps_availqty
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"""
  }

  /** TPC-H Q2 shape: min-cost supplier per part within a region — the
    * classic ARGMIN-per-group correlated subquery, decorrelated as one
    * aggregate + rejoin: min(struct(cost, suppkey)) picks the cheapest
    * supplier with a deterministic tie-break in a single shuffle, and
    * the rejoin on (part, winner) restores the output columns. Region
    * and nation are broadcast; the part filter is pushed to its scan.
    * `q2_min_cost_supplier`. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val euroNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val euroSupp = Tables.supplier(spark, dir)
      .join(broadcast(euroNations), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val prt = Tables.part(spark, dir)
      .filter($"p_size".between(10, 20) && $"p_type" === "STANDARD")
      .select($"p_partkey", $"p_name")
    val cand = partsupp(spark, dir)
      .join(euroSupp, $"ps_suppkey" === $"s_suppkey")
      .join(prt, $"ps_partkey" === $"p_partkey")
    val best = cand.groupBy($"ps_partkey".as("bk"))
      .agg(min(struct($"ps_supplycost", $"ps_suppkey")).as("m"))
      .select($"bk", $"m.ps_suppkey".as("best_supp"))
    cand.join(best, $"ps_partkey" === $"bk" && $"ps_suppkey" === $"best_supp")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        $"ps_supplycost".cast("double").as("supplycost"))
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  /** TPC-H Q6 shape: the pure scan-kernel forecast query — no join at
    * all; the date/discount/quantity filters ALL reach the parquet
    * scan (PushedFilters), and the plan is a single whole-stage-codegen
    * scan + partial/final agg. The revenue term is extendedprice ×
    * discount (the discount given, not the discounted price).
    * `q6_forecast_revenue`. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice".cast(D12_4) * $"l_discount".cast(D12_4)), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q8 shape: national market share — of all ECONOMY-part volume
    * sold to AMERICA-region customers over two years, the fraction
    * supplied from one nation, per year. The numerator is a conditional
    * decimal sum out of the SAME aggregate as the denominator (q14's
    * ratio pattern — one scan, one shuffle, one double division).
    * `q8_market_share`. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val amCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "AMERICA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select($"n_nationkey".as("sn_nk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"sn_nk")
      .select($"s_suppkey", $"supp_nation")
    val disc = $"l_extendedprice".cast(D12_4) * (lit(1.0) - $"l_discount").cast(D12_4)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_type" === "ECONOMY")
        .select($"p_partkey"), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, dir)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(amCust, $"o_custkey" === $"c_custkey")
      .join(suppNation, $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(sum(when($"supp_nation" === "NATION_3", disc)).as("nat_sum"),
        sum(disc).as("tot_sum"))
      .select($"o_year",
        round(coalesce($"nat_sum", lit(0)).cast("double") /
          $"tot_sum".cast("double"), 4).as("mkt_share"),
        round($"tot_sum", 2).cast("double").as("total_volume"))
      .orderBy($"o_year")
  }

  /** TPC-H Q11 shape: important stock — parts whose held value exceeds
    * a fraction of the TOTAL held value. The global threshold is a
    * 1-row decimal aggregate CROSS-broadcast into the HAVING filter
    * (q22's scalar pattern — no driver collect, no second scan of the
    * grouped side); per-part and total sums are both decimal-exact.
    * Two deviations keep the result non-empty at EVERY SF where the
    * spec's constants go vacuous: the holder filter is region-level
    * (a single nation holds nothing at tiny SFs), and the threshold is
    * 2× the MEAN per-part value rather than a fixed corpus fraction
    * (the spec scales its 0.0001 by 1/SF for exactly this reason —
    * mean-relative is the SF-invariant form of the same intent).
    * `q11_important_stock`. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ps = partsupp(spark, dir)
      .join(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)
              .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "EUROPE")),
                $"n_regionkey" === $"r_regionkey")
              .select($"n_nationkey")),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey"),
        $"ps_suppkey" === $"s_suppkey")
      .withColumn("val0", $"ps_supplycost" * $"ps_availqty".cast(D12_2))
    val total = ps.agg(round(sum($"val0"), 2).cast("double").as("total_value"),
      countDistinct($"ps_partkey").as("n_parts"))
    ps.groupBy($"ps_partkey")
      .agg(round(sum($"val0"), 2).cast("double").as("value"))
      .join(broadcast(total))
      .filter($"value" > ($"total_value" / $"n_parts") * 2.0)
      .select($"ps_partkey", $"value")
      .orderBy($"value".desc, $"ps_partkey")
  }

  /** TPC-H Q15 shape: top supplier(s) by quarterly revenue — the
    * revenue VIEW is one decimal-sum aggregate, its max a 1-row
    * CROSS-broadcast scalar, and the winners an equality filter on the
    * ROUNDED revenue (exact double equality of identically-derived
    * values, so ties all surface). `q15_top_supplier`. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(round(sum($"l_extendedprice".cast(D12_4) *
          (lit(1.0) - $"l_discount").cast(D12_4)), 2)
        .cast("double").as("total_revenue"))
    val mx = rev.agg(max($"total_revenue").as("max_revenue"))
    rev.join(broadcast(mx))
      .filter($"total_revenue" === $"max_revenue")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q16 shape: supplier counts per (brand, type, size) bucket,
    * excluding flagged suppliers — the spec's complaint-comment filter
    * has no comment column here, so the deterministic stand-in is
    * negative account balance. The exclusion is a broadcast LEFT-ANTI
    * join; the count is exact COUNT DISTINCT (one extra expand round,
    * the price of exactness). `q16_parts_supplier`. */
  def q16PartsSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flagged = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    partsupp(spark, dir)
      .join(broadcast(flagged), $"ps_suppkey" === $"s_suppkey", "left_anti")
      .join(Tables.part(spark, dir)
          .filter($"p_brand" =!= "Brand#45" && $"p_type" =!= "PROMO" &&
            $"p_size".isin(1, 4, 9, 14, 19, 23, 36, 45)),
        $"ps_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** TPC-H Q20 shape: suppliers holding excess stock of promotable
    * (red-named) parts — availqty > half the quantity they actually
    * shipped in 1997. Shipped quantity is a decimal sum per
    * (part, supplier); the availability test is one double compare;
    * the supplier projection applies the region filter LAST (the
    * semantics require the full shipped aggregate first; region-level
    * rather than the spec's nation so the result is non-empty at
    * every SF). `q20_potential_part`. */
  def q20PotentialPart(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shipped = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(round(sum($"l_quantity".cast(D12_2)), 2).cast("double").as("qty_1997"))
    partsupp(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_name".startsWith("red"))
        .select($"p_partkey"), $"ps_partkey" === $"p_partkey")
      .join(shipped,
        $"ps_partkey" === $"l_partkey" && $"ps_suppkey" === $"l_suppkey")
      .filter($"ps_availqty".cast("double") > $"qty_1997" * 0.5)
      .select($"ps_suppkey").distinct()
      .join(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)
              .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "EUROPE")),
                $"n_regionkey" === $"r_regionkey")
              .select($"n_nationkey")),
            $"s_nationkey" === $"n_nationkey"),
        $"ps_suppkey" === $"s_suppkey")
      .select($"s_name", $"s_acctbal")
      .orderBy($"s_name")
  }

  /** TPC-H Q21 shape: suppliers who kept multi-supplier orders waiting
    * — the ONLY late supplier on a completed order someone else also
    * supplied. The spec's commit/receipt dates are absent; "late"
    * follows [[q12LatePriority]]'s idiom (shipped > 90 days after the
    * order date). The double-EXISTS decorrelates into one per-(order,
    * supplier) aggregate plus per-order count/sum windows — the window
    * partitions are single orders (≤ a handful of lines each), bounded
    * at any corpus size. `q21_waiting_suppliers`. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val late = ($"l_shipdate" >
      to_timestamp(date_add(to_date($"o_orderdate"), 90))).cast("long")
    val perSupp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(late).as("late_any"))
    val w = Window.partitionBy($"l_orderkey")
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum($"late_any").over(w))
      .filter($"late_any" === 1 && $"n_supp" > 1 && $"n_late" === 1)
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  /** Explicit GROUPING SETS — the two one-dimension margins plus the
    * leaf, WITHOUT the grand total (the lattice subset neither
    * [[qRollup]]'s hierarchy nor [[qCube]]'s full lattice expresses):
    * the planner expands rows once map-side per grouping set and
    * aggregates through a single shuffle, where the UNION-of-three-
    * GROUP-BYs formulation scans and shuffles three times.
    * `q_grouping_sets`. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq($"o_orderpriority", $"o_orderstatus"),
          Seq($"o_orderpriority"), Seq($"o_orderstatus")),
        $"o_orderpriority", $"o_orderstatus")
      .agg(grouping_id().as("gid"),
        round(sum($"o_totalprice".cast(DecimalType(14, 2))), 2).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n_orders"))
      .select($"o_orderpriority", $"o_orderstatus", $"gid", $"sum_price", $"n_orders")
      .orderBy($"gid", $"o_orderpriority", $"o_orderstatus")
  }

  /** Dormant-customer report: customers with NO order in the window —
    * the NOT-EXISTS pattern, planned as a LEFT-ANTI join (no row
    * duplication, no distinct; the mirror of [[q4PriorityExists]]'s
    * semi join), then a one-shuffle segment rollup of the idle
    * balances. Both sides are key-projected before the anti join, so
    * only (custkey) pairs move. `q_anti_inactive`. */
  def qAntiInactive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val active = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey")
    Tables.customer(spark, dir)
      .join(active, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_inactive"),
        round(sum($"c_acctbal".cast(D12_2)), 2).cast("double").as("idle_balance"))
      .orderBy($"c_mktsegment")
  }

  /** Per-nation account-balance quartiles: NTILE over a PARTITIONED
    * window — the distribution-window shape ([[qWindowRank]] ranks,
    * this one buckets). Deliberately partitioned by nation: a GLOBAL
    * ntile is a single-partition window (one task sorts the world —
    * wrong at any scale); per-key quantiles keep the sort distributed,
    * and a global distribution at 100 TB is [[qApproxStats]]'s sketch
    * job instead. The (acctbal desc, custkey) order is total, so both
    * engines' floor-based NTILE splits agree row-for-row.
    * `q_ntile_quartiles`. */
  def qNtileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(spark, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy($"c_nationkey", $"quartile")
      .agg(count(lit(1)).as("n_customers"),
        round(max($"c_acctbal"), 2).as("top_balance"),
        round(min($"c_acctbal"), 2).as("floor_balance"),
        round(sum($"c_acctbal".cast(D12_2)), 2).cast("double").as("sum_balance"))
      .orderBy($"c_nationkey", $"quartile")
  }

  /** Window functions: deterministic top-3 parts by retail price per brand. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    Tables.part(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"p_brand", $"p_partkey", $"p_retailprice", $"rnk")
      .orderBy($"p_brand", $"rnk")
  }

  /** Sessionization over the events stream table (batch form): a session
    * breaks after a 30-minute gap. Timestamps are truncated to epoch
    * seconds before differencing so parquet ns-vs-us precision cannot
    * shift a boundary. Scale: single shuffle on user_id; both windows
    * reuse the same partitioning.
    */
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    Tables.events(spark, dir)
      .withColumn("ts_sec", unix_timestamp($"ts"))
      .withColumn("prev_sec", lag($"ts_sec", 1).over(byUser))
      .withColumn("is_new",
        when($"prev_sec".isNull || $"ts_sec" - $"prev_sec" > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_sec").as("start_sec"), max($"ts_sec").as("end_sec"))
      .orderBy($"user_id", $"session_id")
  }

  /** Greenwald-Khanna accuracy for the percentile sketch. Pinned above
    * the test-SF row counts so the sketch degenerates to the EXACT
    * discrete quantile (GK keeps every sample while n ≤ accuracy), which
    * is what makes the DuckDB `quantile_disc` comparison bit-exact — the
    * rank convention was verified to agree (rank ceil(p·n) on 1..100 →
    * 50/95/99 in both engines). A 100 TB run would dial this back to
    * ~10^4 and accept the ±1/accuracy rank error; the operator shape
    * (mergeable map-side sketch) is identical either way. */
  private val PctAccuracy = 1000000

  /** Per-basket item cap for [[qBasketPairs]] — one pathological
    * mega-cart of k items is C(k, 2) pairs from a SINGLE join key (AQE
    * skew-split subdivides the partition, the pair count stays
    * quadratic), so baskets are hash-sampled to ≤ cap items via the
    * fleet [[graft.plans.TopKPerGroup]] idiom and the DuckDB oracle
    * replays the cap. 64 is ~10× the TPC-H schema bound (≤ 7 lineitems
    * per order), so test-SF results are cap-invariant; on a real-cart
    * corpus the cap bounds the worst basket at C(64, 2) = 2016 pairs
    * while the hash-rank keeps the kept subset deterministic. */
  val BasketItemCap = 64

  /** Market-basket pair mining over the order → part incidence: which
    * parts co-occur in the same order more often than chance (support
    * ≥ 2 pairs with their lift = P(a,b)/(P(a)·P(b))). The bounded
    * frequent-itemset shape: candidate pairs come from a self-join
    * KEYED ON THE ORDER — per-basket fan-out is C(items, 2) with
    * baskets capped at [[BasketItemCap]] hash-ranked items, never a
    * part × part product — then one (a, b) count and two frequency
    * joins (all statistics over the capped item set, replayed by the
    * oracle). Support/counts are integers; the lift is one rounded
    * double division from integer statistics, exact cross-engine.
    * `q_basket_pairs`. */
  def qBasketPairs(spark: SparkSession, dir: String,
                   cap: Int = BasketItemCap): DataFrame = {
    import spark.implicits._
    val items = graft.plans.TopKPerGroup.rankTopK(
        Tables.lineitem(spark, dir)
          .select($"l_orderkey", $"l_partkey").distinct()
          .withColumn("hkey", graft.Hashing.hash60(
            concat_ws("|", $"l_orderkey", $"l_partkey"))),
        Seq("l_orderkey"), Seq("hkey" -> false, "l_partkey" -> false), cap)
      .select($"l_orderkey", $"l_partkey")
      .localCheckpoint(true) // pair join + both frequency sides share it
    val nOrders = items.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val freq = items.groupBy($"l_partkey").agg(count(lit(1)).as("n_part"))
    val pairs = items.as("x")
      .join(items.as("y"),
        $"x.l_orderkey" === $"y.l_orderkey" && $"x.l_partkey" < $"y.l_partkey")
      .groupBy($"x.l_partkey".as("part_a"), $"y.l_partkey".as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= 2)
    pairs
      .join(freq.select($"l_partkey".as("part_a"), $"n_part".as("na")), Seq("part_a"))
      .join(freq.select($"l_partkey".as("part_b"), $"n_part".as("nb")), Seq("part_b"))
      .join(broadcast(nOrders))
      .select($"part_a", $"part_b", $"support",
        round($"support".cast("double") * $"n_orders".cast("double") /
          ($"na".cast("double") * $"nb".cast("double")), 6).as("lift"))
      .orderBy($"support".desc, $"part_a", $"part_b")
  }

  /** Sketch-based approximate statistics per return flag: HyperLogLog++
    * distinct orders and Greenwald-Khanna price percentiles. These are
    * THE 100 TB summary operators — both sketches are bounded-size and
    * mergeable, so they partial-aggregate map-side and never collect
    * exact state. `q_approx_stats`.
    *
    * Hash-gate contract: the percentiles are exact at test SFs (see
    * [[PctAccuracy]]) and compare directly. The HLL estimate is
    * implementation-defined and CANNOT be replayed by another engine, so
    * the gated projection carries the exact distinct count plus
    * `hll_sanity` = round(approx/exact) — 1 unless the sketch is off by
    * ≥ 50%, which the oracle pins to literal 1; the sketch's actual
    * precision (rsd 2%) is asserted in ScalaTest, where the bound can be
    * statistical instead of bit-exact. */
  def qApproxStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx_orders"),
        countDistinct($"l_orderkey").as("exact_orders"),
        percentile_approx($"l_extendedprice", array(lit(0.5), lit(0.95), lit(0.99)),
          lit(PctAccuracy)).as("pcts"),
        count(lit(1)).as("n_rows"))
      // scalar columns: array cells don't survive the driver's
      // sort-and-hash canonicalization of rows-only outputs
      .select($"l_returnflag",
        round($"approx_orders".cast("double") / $"exact_orders", 0).cast("long")
          .as("hll_sanity"),
        $"exact_orders",
        element_at($"pcts", 1).as("price_p50"),
        element_at($"pcts", 2).as("price_p95"),
        element_at($"pcts", 3).as("price_p99"),
        $"n_rows")
      .orderBy($"l_returnflag")
  }

  /** The pivoted event types, pinned explicitly: an explicit value list
    * keeps the output schema STATIC (a dynamic pivot would trigger a
    * driver-side distinct scan at plan time and make the schema
    * data-dependent — wrong for a 100 TB table and for the oracle). */
  val PivotEventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Daily event-type crosstab via relational PIVOT: one shuffle on the
    * day key; the pivot columns are conditional counts folded into the
    * same aggregate (map-side combined), not five separate scans.
    * `q_pivot_daily`. */
  def qPivotDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type")
      .groupBy($"day")
      .pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotEventTypes)
      .orderBy($"day")
  }

  /** UNPIVOT (melt) — the inverse reshape of [[qPivotDaily]]: the wide
    * per-day crosstab folds back into tidy (day, event_type, n) rows
    * via `stack` (a generator expression — codegen'd row explosion, not
    * a join). Zero cells drop out, so the round trip reproduces exactly
    * the long-form aggregate a GROUP BY would have produced — which is
    * what the oracle checks. `q_unpivot`. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stackArgs = PivotEventTypes.map(t => s"'$t', `$t`").mkString(", ")
    qPivotDaily(spark, dir)
      .select($"day",
        expr(s"stack(${PivotEventTypes.size}, $stackArgs) AS (event_type, n)"))
      .filter($"n" > 0)
      .orderBy($"day", $"event_type")
  }

  /** Trailing 7-day moving average of daily order revenue — the
    * RANGE-frame window shape (frame = a VALUE interval on the ordering
    * key, not a row count, so gap days shrink the frame). Two stages:
    * a distributed day-keyed aggregate, then the window over the daily
    * table — which has one row per calendar day, bounded by construction,
    * so the unpartitioned window is NOT a scale hazard. The frame
    * average is decimal-sum / count in double (exact operands), never a
    * float AVG. `q_moving_avg`. */
  def qMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .groupBy(
        date_format($"o_orderdate", "yyyy-MM-dd").as("day"),
        unix_date(to_date($"o_orderdate")).as("day_num"))
      .agg(sum($"o_totalprice".cast(DecimalType(14, 2))).as("rev"))
    val w = Window.orderBy($"day_num").rangeBetween(-6, 0)
    daily.select($"day",
        round($"rev", 2).cast("double").as("revenue"),
        // 4 dp, NOT 2: a scale-2 decimal divided by 1..7 terminates at
        // ≤ 4 decimals, so no quotient can sit exactly on a 4-dp
        // rounding midpoint (at 2 dp, sum/2 = x.xx5 did, and HALF_UP
        // engines disagree with decimal-string engines there)
        round(sum($"rev").over(w).cast("double") / count(lit(1)).over(w), 4)
          .as("avg_7d"),
        count(lit(1)).over(w).as("n_days"))
      .orderBy($"day")
  }

  /** JSON sidecar extraction: per-type stats over the `props` JSON
    * column (`$.k`). `get_json_object` is a codegen'd path expression —
    * the metadata-extraction shape every training-data pipeline has
    * (parse a JSON sidecar, aggregate by a typed field). */
  def qEventsProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"k").as("n_distinct_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        sum($"k").as("sum_k"))
      .orderBy($"event_type")
  }

  /** Hierarchical totals in one pass: GROUP BY ROLLUP over
    * (returnflag, linestatus) yields leaf, per-flag subtotal, and grand
    * total rows from a single shuffle — the alternative (three separate
    * aggregations unioned) scans and shuffles three times. The
    * grouping-id column disambiguates "grouped-out" NULLs from data
    * NULLs. `q_rollup`. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        grouping_id().as("gid"),
        round(sum($"l_quantity".cast(D12_2)), 2).cast("double").as("sum_qty"),
        round(sum($"l_extendedprice".cast(D12_4) * (lit(1.0) - $"l_discount").cast(D12_4)), 2)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .select($"l_returnflag", $"l_linestatus", $"gid",
        $"sum_qty", $"sum_disc_price", $"n_rows")
      .orderBy($"gid", $"l_returnflag", $"l_linestatus")
  }

  /** Full CUBE over (returnflag, linestatus): every grouping-set combo
    * — leaf, both one-dimension margins, grand total — from ONE shuffle
    * (the expand operator replicates rows per grouping set map-side;
    * the alternative is four scans). Complements [[qRollup]]'s
    * hierarchy with the complete lattice. `q_cube`. */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        grouping_id().as("gid"),
        round(sum($"l_quantity".cast(D12_2)), 2).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"sum_qty", $"n_rows")
      .orderBy($"gid", $"l_returnflag", $"l_linestatus")
  }

  /** SCD-2 versioning: each customer's orders become a timeline of
    * validity ranges — `valid_from` = the order date, `valid_to` = the
    * next order's date (open-ended sentinel for the current version).
    * The warehouse upsert-history shape: one window pass per key, no
    * self-join (the naive formulation joins the table to itself on
    * "next change"). Ties broken by order key so the chain is total.
    * `q_scd2`. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("next_date", lead($"o_orderdate", 1).over(w))
      .select(
        $"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format($"next_date", "yyyy-MM-dd"), lit("9999-12-31"))
          .as("valid_to"),
        $"next_date".isNull.as("is_current"),
        $"o_totalprice")
      .orderBy($"o_custkey", $"valid_from", $"o_orderkey")
  }

  val oracle: Map[String, String] = Map(
    // percentiles are exact at gate SFs (accuracy > n, see PctAccuracy);
    // hll_sanity is pinned to 1 — any ≥50% HLL drift fails the hash
    "q_basket_pairs" ->
      s"""WITH i0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         i AS (
           SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY
                      ${graft.Hashing.hexFoldSql(
                        "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR)")},
                      l_partkey) AS rn
             FROM i0)
           WHERE rn <= $BasketItemCap),
         n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM i),
         f AS (SELECT l_partkey, COUNT(*) AS n_part FROM i GROUP BY 1),
         p AS (
           SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
                  COUNT(*) AS support
           FROM i x JOIN i y ON x.l_orderkey = y.l_orderkey
                            AND x.l_partkey < y.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
                ROUND(CAST(support AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
                      / (CAST(fa.n_part AS DOUBLE) * CAST(fb.n_part AS DOUBLE)),
                      6) AS lift
         FROM p
         JOIN f fa ON fa.l_partkey = p.part_a
         JOIN f fb ON fb.l_partkey = p.part_b
         CROSS JOIN n
         ORDER BY support DESC, part_a, part_b""",
    "q_approx_stats" ->
      """SELECT l_returnflag,
                CAST(1 AS BIGINT) AS hll_sanity,
                CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
                quantile_disc(l_extendedprice, 0.5) AS price_p50,
                quantile_disc(l_extendedprice, 0.95) AS price_p95,
                quantile_disc(l_extendedprice, 0.99) AS price_p99,
                COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_disc_price,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4)) * CAST(1.0 + l_tax AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_charge,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q7_volume_shipping" ->
      """SELECT s.supp_nation, c.cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN (SELECT c_custkey, n_name AS cust_nation FROM customer
               JOIN nation ON c_nationkey = n_nationkey
               WHERE n_name IN ('NATION_1', 'NATION_2')) c
           ON o_custkey = c.c_custkey
         JOIN (SELECT s_suppkey, n_name AS supp_nation FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name IN ('NATION_1', 'NATION_2')) s
           ON l_suppkey = s.s_suppkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND s.supp_nation <> c.cust_nation
         GROUP BY s.supp_nation, c.cust_nation, l_year
         ORDER BY s.supp_nation, c.cust_nation, l_year""",
    "q9_product_profit" ->
      """SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))
                        - CAST(ROUND(p_retailprice * 0.1, 2) AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%widget%'
         GROUP BY n_name, o_year
         ORDER BY nation, o_year DESC""",
    "q13_cust_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q19_disc_revenue" ->
      """SELECT
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 5 AND 30)
            OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 40)""",
    "q22_dormant_balance" ->
      """SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
                COUNT(*) AS numcust,
                CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
         FROM customer
         WHERE c_acctbal > (
             SELECT CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(*)
             FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1997-06-01')
         GROUP BY cntrycode ORDER BY cntrycode""",
    "q2_min_cost_supplier" ->
      s"""WITH ps AS ($partsuppSql),
          es AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                 FROM supplier JOIN nation ON s_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
                 WHERE r_name = 'EUROPE'),
          cand AS (SELECT * FROM ps
                   JOIN es ON ps_suppkey = s_suppkey
                   JOIN (SELECT p_partkey, p_name FROM part
                         WHERE p_size BETWEEN 10 AND 20
                           AND p_type = 'STANDARD') p
                     ON ps_partkey = p_partkey),
          ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ps_partkey
                       ORDER BY ps_supplycost, ps_suppkey) AS rn FROM cand)
          SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                 CAST(ps_supplycost AS DOUBLE) AS supplycost
          FROM ranked WHERE rn = 1
          ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "q6_forecast_revenue" ->
      """SELECT
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q8_market_share" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         ROUND(CAST(COALESCE(SUM(CASE WHEN sn.n_name = 'NATION_3'
                  THEN CAST(l_extendedprice AS DECIMAL(12,4))
                       * CAST(1.0 - l_discount AS DECIMAL(12,4)) END), 0) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                          * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS DOUBLE), 4) AS mkt_share,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                        * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_volume
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY o_year ORDER BY o_year""",
    "q11_important_stock" ->
      s"""WITH ps AS ($partsuppSql),
          held AS (SELECT ps_partkey,
                          ps_supplycost * CAST(ps_availqty AS DECIMAL(12,2)) AS val0
                   FROM ps JOIN supplier ON ps_suppkey = s_suppkey
                   JOIN nation ON s_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey
                   WHERE r_name = 'EUROPE'),
          total AS (SELECT CAST(ROUND(SUM(val0), 2) AS DOUBLE) AS total_value,
                           CAST(COUNT(DISTINCT ps_partkey) AS BIGINT) AS n_parts FROM held)
          SELECT ps_partkey, CAST(ROUND(SUM(val0), 2) AS DOUBLE) AS value
          FROM held GROUP BY ps_partkey
          HAVING CAST(ROUND(SUM(val0), 2) AS DOUBLE) >
                 ((SELECT total_value FROM total) / (SELECT n_parts FROM total)) * 2.0
          ORDER BY value DESC, ps_partkey""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                            * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, s_acctbal, total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         ORDER BY s_suppkey""",
    "q16_parts_supplier" ->
      s"""WITH ps AS ($partsuppSql)
          SELECT p_brand, p_type, p_size,
                 CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
          FROM ps JOIN part ON ps_partkey = p_partkey
          WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
            AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
            AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          GROUP BY p_brand, p_type, p_size
          ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q20_potential_part" ->
      s"""WITH ps AS ($partsuppSql),
          shipped AS (SELECT l_partkey, l_suppkey,
                        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty_1997
                      FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate < TIMESTAMP '1998-01-01'
                      GROUP BY l_partkey, l_suppkey),
          excess AS (SELECT DISTINCT ps_suppkey FROM ps
                     JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
                     JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
                     WHERE CAST(ps_availqty AS DOUBLE) > qty_1997 * 0.5)
          SELECT s_name, s_acctbal
          FROM excess JOIN supplier ON ps_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
          ORDER BY s_name""",
    "q21_waiting_suppliers" ->
      """WITH per AS (
           SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late_any
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'
           GROUP BY l_orderkey, l_suppkey),
         f AS (
           SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                  SUM(late_any) OVER (PARTITION BY l_orderkey) AS n_late
           FROM per)
         SELECT s_name, COUNT(*) AS numwait
         FROM f JOIN supplier ON l_suppkey = s_suppkey
         WHERE late_any = 1 AND n_supp > 1 AND n_late = 1
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
         c_acctbal, n_name
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-04-01'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
                  AS sum_qty,
                COUNT(*) AS n_rows
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    "q_scd2" ->
      """WITH v AS (
           SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                  LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS next_date
           FROM orders)
         SELECT o_custkey, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
                COALESCE(strftime(next_date, '%Y-%m-%d'), '9999-12-31') AS valid_to,
                next_date IS NULL AS is_current,
                o_totalprice
         FROM v ORDER BY o_custkey, valid_from, o_orderkey""",
    "q_unpivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q_moving_avg" ->
      """WITH daily AS (
           SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                  CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num,
                  SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
           FROM orders GROUP BY 1, 2)
         SELECT day,
                CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
                ROUND(CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w, 4) AS avg_7d,
                CAST(COUNT(*) OVER w AS BIGINT) AS n_days
         FROM daily
         WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY day""",
    "q17_small_qty" ->
      """WITH thr AS (
           SELECT l_partkey AS t_partkey,
                  0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                         / COUNT(*)) AS qty_threshold
           FROM lineitem GROUP BY l_partkey)
         SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                      / 7.0, 2) AS avg_yearly,
                CAST(COUNT(*) AS BIGINT) AS n_small_orders
         FROM lineitem
         JOIN part ON p_partkey = l_partkey
         JOIN thr ON t_partkey = l_partkey
         WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold""",
    "q_pivot_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
                COUNT(*) FILTER (event_type = 'click') AS click,
                COUNT(*) FILTER (event_type = 'error') AS error,
                COUNT(*) FILTER (event_type = 'purchase') AS purchase,
                COUNT(*) FILTER (event_type = 'signup') AS signup,
                COUNT(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY strftime(ts, '%Y-%m-%d') ORDER BY day""",
    "q18_large_orders" ->
      """WITH qty AS (
           SELECT l_orderkey,
                  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
                    AS total_qty
           FROM lineitem GROUP BY l_orderkey)
         SELECT c_name, c_custkey, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                o_totalprice, total_qty
         FROM qty
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE total_qty > 300.0
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01'
           AND l_shipdate > TIMESTAMP '1998-06-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
           SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
           FROM part) t WHERE rnk <= 3 ORDER BY p_brand, rnk""",
    "q_events_props" ->
      """WITH k AS (
           SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, COUNT(*) AS n_events,
                COUNT(DISTINCT k) AS n_distinct_k,
                MIN(k) AS min_k, MAX(k) AS max_k,
                CAST(SUM(k) AS BIGINT) AS sum_k
         FROM k GROUP BY event_type ORDER BY event_type""",
    "q_events_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
             CASE WHEN LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w IS NULL
                    OR CAST(FLOOR(epoch(ts)) AS BIGINT) - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w > 1800
                  THEN 1 ELSE 0 END AS is_new
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)),
         sessions AS (
           SELECT user_id, ts_sec,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec
         FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-04-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q12_late_priority" ->
      """SELECT l_linestatus,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
                COUNT(*) AS n_late
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
         GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q14_promo_revenue" ->
      """WITH s AS (
           SELECT
             SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice AS DECIMAL(12,4))
                           * CAST(1.0 - l_discount AS DECIMAL(12,4)) END) AS promo_sum,
             SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                 * CAST(1.0 - l_discount AS DECIMAL(12,4))) AS total_sum
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01')
         SELECT ROUND(100.0 * (CAST(COALESCE(promo_sum, 0) AS DOUBLE)
                               / CAST(total_sum AS DOUBLE)), 4) AS promo_pct,
                CAST(ROUND(COALESCE(promo_sum, 0), 2) AS DOUBLE) AS promo_revenue,
                CAST(ROUND(total_sum, 2) AS DOUBLE) AS total_revenue
         FROM s""",
    "q_anti_inactive" ->
      """SELECT c_mktsegment,
                COUNT(*) AS n_inactive,
                CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
                  AS idle_balance
         FROM customer c
         WHERE NOT EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey
             AND o.o_orderdate >= TIMESTAMP '1998-01-01'
             AND o.o_orderdate < TIMESTAMP '1999-01-01')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_ntile_quartiles" ->
      """WITH q AS (
           SELECT c_nationkey, c_acctbal,
                  CAST(NTILE(4) OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile
           FROM customer)
         SELECT c_nationkey, quartile,
                COUNT(*) AS n_customers,
                ROUND(MAX(c_acctbal), 2) AS top_balance,
                ROUND(MIN(c_acctbal), 2) AS floor_balance,
                CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
                  AS sum_balance
         FROM q GROUP BY c_nationkey, quartile
         ORDER BY c_nationkey, quartile""",
    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
                CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
                  AS sum_price,
                COUNT(*) AS n_orders
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                 (o_orderpriority), (o_orderstatus))
         ORDER BY gid, o_orderpriority, o_orderstatus""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> q1PricingSummary _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q7_volume_shipping"   -> ((s: SparkSession, d: String) => q7VolumeShipping(s, d)),
    "q9_product_profit"    -> q9ProductProfit _,
    "q13_cust_distribution" -> q13CustDistribution _,
    "q19_disc_revenue"     -> q19DiscRevenue _,
    "q22_dormant_balance"  -> q22DormantBalance _,
    "q10_returned_items"   -> q10ReturnedItems _,
    "q17_small_qty"        -> q17SmallQty _,
    "q18_large_orders"     -> q18LargeOrders _,
    "q_pivot_daily"        -> qPivotDaily _,
    "q_moving_avg"         -> qMovingAvg _,
    "q_unpivot"            -> qUnpivot _,
    "q_cube"               -> qCube _,
    "q_scd2"               -> qScd2 _,
    "q5_local_supplier"    -> q5LocalSupplier _,
    "q_window_rank"        -> qWindowRank _,
    "q_events_sessionize"  -> qEventsSessionize _,
    "q_events_props"       -> qEventsProps _,
    "q_approx_stats"       -> qApproxStats _,
    "q_basket_pairs"       -> ((s: SparkSession, d: String) => qBasketPairs(s, d)),
    "q_rollup"             -> qRollup _,
    "q4_priority_exists"   -> q4PriorityExists _,
    "q12_late_priority"    -> q12LatePriority _,
    "q14_promo_revenue"    -> q14PromoRevenue _,
    "q_grouping_sets"      -> qGroupingSets _,
    "q_anti_inactive"      -> qAntiInactive _,
    "q_ntile_quartiles"    -> qNtileQuartiles _,
    "q2_min_cost_supplier" -> q2MinCostSupplier _,
    "q6_forecast_revenue"  -> q6ForecastRevenue _,
    "q8_market_share"      -> q8MarketShare _,
    "q11_important_stock"  -> q11ImportantStock _,
    "q15_top_supplier"     -> q15TopSupplier _,
    "q16_parts_supplier"   -> q16PartsSupplier _,
    "q20_potential_part"   -> q20PotentialPart _,
    "q21_waiting_suppliers" -> q21WaitingSuppliers _,
  )
}
