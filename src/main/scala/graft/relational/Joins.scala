package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join operators the built-in equi-join can't express directly
  * — each implemented as a composition that keeps the plan shuffle-
  * bounded at 100 TB instead of falling back to a broadcast-nested-loop
  * theta join (preference (a) of the custom-operator ladder: compose
  * existing ops when semantics allow).
  */
object Joins {

  /** As-of join: for every `purchase` event, the most recent `click` by
    * the same user at-or-before it (last-touch attribution).
    *
    * NOT a range join: the classic scalable plan is the union-merge —
    * tag both streams, union them, and run ONE window per user ordered
    * by (time, tag): a running max over the click timestamps is exactly
    * "latest click ≤ this row". One shuffle on `user_id`, no pair
    * blow-up, no per-row probe — the same plan at any scale. Ties at
    * identical timestamps order clicks before purchases (tag 0 < 1), so
    * an exactly-simultaneous click is eligible, matching the `>=`
    * as-of semantics. `q_asof_join`. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).withColumn("us", unix_micros($"ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"us", lit(0L).as("kind"), $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"us", lit(1L).as("kind"), $"event_id")
    val merge = Window.partitionBy($"user_id").orderBy($"us", $"kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_us", max(when($"kind" === 0, $"us")).over(merge))
      .filter($"kind" === 1)
      .select($"user_id", $"event_id".as("purchase_id"),
        $"us".as("purchase_us"), $"last_click_us")
      .orderBy($"user_id", $"purchase_id")
  }

  /** Half-width of the range-join window, seconds. */
  val RangeWindowSec = 300L

  /** Range join: per `error` event, how many `view` events (any user)
    * fell within ±[[RangeWindowSec]] of it — a pure non-equi interval
    * predicate.
    *
    * The naive plan is a broadcast-nested-loop over |errors|×|views|
    * pairs — quadratic and unshippable at scale. Instead the timeline is
    * bucketed at the window width: each view lands in exactly one
    * bucket, each error probes the ≤3 buckets its window can overlap
    * (bounded fan-out), and the match becomes an equi-join on `bucket`
    * plus a residual |Δt| filter. A view pairs with an error at most
    * once (one bucket per view), so no post-join dedup is needed.
    * At extreme scale a globally hot time bucket is the skew risk — AQE
    * skew-join splitting handles it, or salt the bucket key by a hash of
    * the view id. `q_range_join`. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = RangeWindowSec
    val ev = Tables.events(spark, dir).withColumn("sec", unix_timestamp($"ts"))
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"sec".as("err_sec"))
    val views = ev.filter($"event_type" === "view")
      .select($"sec".as("view_sec"), floor($"sec" / w).as("bucket"))
    val probes = errors.withColumn("bucket",
      explode(sequence(floor(($"err_sec" - w) / w), floor(($"err_sec" + w) / w))))
    val counts = probes.join(views, Seq("bucket"))
      .filter(abs($"view_sec" - $"err_sec") <= w)
      .groupBy($"error_id").agg(count(lit(1)).as("n"))
    errors.join(counts, Seq("error_id"), "left_outer")
      .select($"error_id", $"err_sec", coalesce($"n", lit(0L)).as("n_views"))
      .orderBy($"error_id")
  }

  /** Funnel analysis: how far each user progresses through the ordered
    * signup → click → purchase sequence (each stage's event must land
    * within [[FunnelWindowSec]] after the previous stage's first
    * event — the conversion-window form real funnel queries use).
    *
    * The three "first event of type T after X" lookups CHAIN — yet all
    * of them partition by `user_id`, so the chained window selects plan
    * over a single exchange: the per-user events shuffle once and every
    * stage is computed in place (no self-join per stage, which is the
    * naive formulation's cost). The final stage histogram is a
    * bounded-size aggregate. `q_events_funnel`. */
  val FunnelWindowSec = 3600L

  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fw = FunnelWindowSec
    val w = Window.partitionBy($"user_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_timestamp($"ts").as("sec"))
      .withColumn("s", min(when($"event_type" === "signup", $"sec")).over(w))
      .withColumn("c", min(when($"event_type" === "click" &&
        $"sec" >= $"s" && $"sec" <= $"s" + fw, $"sec")).over(w))
      .withColumn("p", min(when($"event_type" === "purchase" &&
        $"sec" >= $"c" && $"sec" <= $"c" + fw, $"sec")).over(w))
      .select($"user_id",
        when($"p".isNotNull, 3L).when($"c".isNotNull, 2L)
          .when($"s".isNotNull, 1L).otherwise(0L).as("stage"))
      .distinct()
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"stage")
  }

  /** Cohort retention matrix: users are grouped by the calendar month
    * of their FIRST event (the cohort), and for each later month the
    * query reports how many of them were still active — the classic
    * product-analytics triangle.
    *
    * Scale shape: active-months dedup and the first-event argmin both
    * shuffle on `user_id`, and Catalyst reuses that one exchange for
    * the cohort join (same key); the month offset is pure integer
    * arithmetic (year·12+month deltas — no fractional months_between,
    * which would be calendar-ambiguous cross-engine). The final
    * cohort-size join is months-count-sized, so it's an explicit
    * broadcast. Session tz is pinned UTC, so `date_trunc('month')`
    * agrees with the oracle's naive-timestamp truncation.
    * `q_cohort_retention`. */
  def qCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val am = Tables.events(spark, dir)
      .select($"user_id", to_date(date_trunc("month", $"ts")).as("em"))
      .distinct()
    val first = am.groupBy($"user_id").agg(min($"em").as("cohort_month"))
    val cohortSizes = first.groupBy($"cohort_month")
      .agg(count(lit(1)).as("n_cohort"))
    am.join(first, Seq("user_id"))
      .withColumn("month_offset",
        ((year($"em") * 12 + month($"em")) -
          (year($"cohort_month") * 12 + month($"cohort_month"))).cast("long"))
      .groupBy($"cohort_month", $"month_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort_month"))
      .select($"cohort_month", $"month_offset", $"n_active", $"n_cohort",
        round($"n_active".cast("double") / $"n_cohort".cast("double"), 6)
          .as("retention"))
      .orderBy($"cohort_month", $"month_offset")
  }

  val oracle: Map[String, String] = Map(
    "q_cohort_retention" ->
      """WITH am AS (
           SELECT DISTINCT user_id, CAST(date_trunc('month', ts) AS DATE) AS em
           FROM events),
         f AS (SELECT user_id, MIN(em) AS cohort_month FROM am GROUP BY user_id),
         coh AS (SELECT cohort_month, COUNT(*) AS n_cohort FROM f GROUP BY cohort_month),
         act AS (
           SELECT f.cohort_month,
                  CAST((year(em) * 12 + month(em)) -
                       (year(cohort_month) * 12 + month(cohort_month)) AS BIGINT)
                    AS month_offset,
                  COUNT(*) AS n_active
           FROM am JOIN f USING (user_id) GROUP BY 1, 2)
         SELECT act.cohort_month, month_offset, n_active, n_cohort,
                ROUND(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
                  AS retention
         FROM act JOIN coh USING (cohort_month)
         ORDER BY cohort_month, month_offset""",
    "q_events_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         u1 AS (
           SELECT user_id,
                  MIN(CASE WHEN event_type = 'signup' THEN sec END) AS s
           FROM e GROUP BY user_id),
         u2 AS (
           SELECT e.user_id, u1.s,
                  MIN(CASE WHEN event_type = 'click' AND sec >= s AND sec <= s + 3600 THEN sec END) AS c
           FROM e JOIN u1 USING (user_id) GROUP BY e.user_id, u1.s),
         u3 AS (
           SELECT e.user_id, u2.s, u2.c,
                  MIN(CASE WHEN event_type = 'purchase' AND sec >= c AND sec <= c + 3600 THEN sec END) AS p
           FROM e JOIN u2 USING (user_id) GROUP BY e.user_id, u2.s, u2.c)
         SELECT CAST(CASE WHEN p IS NOT NULL THEN 3
                          WHEN c IS NOT NULL THEN 2
                          WHEN s IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
                COUNT(*) AS n_users
         FROM u3 GROUP BY 1 ORDER BY stage""",
    "q_asof_join" ->
      """WITH tagged AS (
           SELECT user_id, epoch_us(ts) AS us, 0 AS kind, event_id
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, epoch_us(ts), 1, event_id
           FROM events WHERE event_type = 'purchase'),
         merged AS (
           SELECT user_id, us, kind, event_id,
             MAX(CASE WHEN kind = 0 THEN us END) OVER
               (PARTITION BY user_id ORDER BY us, kind
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
           FROM tagged)
         SELECT user_id, event_id AS purchase_id, us AS purchase_us, last_click_us
         FROM merged WHERE kind = 1 ORDER BY user_id, purchase_id""",
    "q_range_join" ->
      """WITH e AS (
           SELECT event_id AS error_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS err_sec
           FROM events WHERE event_type = 'error'),
         v AS (
           SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS view_sec
           FROM events WHERE event_type = 'view')
         SELECT e.error_id, e.err_sec,
                CAST(COUNT(v.view_sec) AS BIGINT) AS n_views
         FROM e LEFT JOIN v
           ON v.view_sec BETWEEN e.err_sec - 300 AND e.err_sec + 300
         GROUP BY e.error_id, e.err_sec ORDER BY error_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join"     -> qAsofJoin _,
    "q_range_join"    -> qRangeJoin _,
    "q_events_funnel" -> qEventsFunnel _,
    "q_cohort_retention" -> qCohortRetention _,
  )
}
