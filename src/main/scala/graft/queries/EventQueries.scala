package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over `events.parquet` (event_id BIGINT, ts
  * TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props
  * JSON-string) — batch forms of the streaming surface; the same
  * transforms are reused by [[graft.streaming.EventTransforms]] over a
  * `readStream` source, which is how one pipeline serves both batch and
  * Structured Streaming.
  *
  * Timestamps are compared cross-engine in epoch MICROseconds: the
  * testdata parquet stores nanosecond timestamps, and both Spark's
  * parquet reader and DuckDB's `epoch_us` truncate ns -> us identically.
  *
  * Scale notes: hourly rollup and sessionization shuffle once on their
  * natural keys (hour/user); the as-of join is the union-then-window
  * carry-forward form — one shuffle on user_id, no range join blowup —
  * the standard scalable as-of shape on Spark (DuckDB oracles it with a
  * native ASOF JOIN).
  */
object EventQueries extends QueryPack {

  /** Session gap: 6 hours, in microseconds. */
  val SessionGapUs: Long = 6L * 3600 * 1000000

  /** Max gap between consecutive funnel steps (24h, microseconds) —
    * calibrated so all three funnel stages are non-trivially populated
    * on the testdata (150 users -> 60 click-converters -> 25
    * purchase-converters at sf0.01). */
  val FunnelStepUs: Long = 24L * 3600 * 1000000

  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.EventSource.read(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour rollup per event type (batch twin of the streaming
    // windowed aggregation).
    "q_event_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("hour", "event_type")),

    // Gap-based sessionization: new session when > 6h since the user's
    // previous event; per-user session stats.
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val x = events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("new_sess",
          when(col("ts_us") - lag("ts_us", 1).over(w) > SessionGapUs, 1)
            .when(lag("ts_us", 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // durations stay exact integer microseconds end-to-end: a rounded
      // float average can land exactly on a rounding boundary where the
      // engines' round() implementations diverge, so the average duration
      // is emitted as integer floor-division to milliseconds instead
      val perSession = x.groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_ev"),
          (max("ts_us") - min("ts_us")).as("dur_us"))
      perSession.groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          sum("n_ev").as("n_events"),
          round(avg("n_ev"), 6).as("avg_session_events"),
          sum("dur_us").as("total_dur_us"))
        .withColumn("avg_dur_ms", expr("total_dur_us div (n_sessions * 1000)"))
        .orderBy("user_id")
    }),

    // As-of join: for each purchase, the user's most recent prior-or-equal
    // click. Union + carry-forward window — one user_id shuffle.
    "q_asof_purchase_click" -> ((s, dir) => {
      val ev = events(s, dir)
        .where(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("kind"))
      // clicks sort before purchases at equal ts so ">= c.ts" is inclusive
      val w = Window.partitionBy("user_id").orderBy("ts_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("click_us",
          last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .where(col("kind") === 1)
        .select(col("event_id"), col("click_us"))
        .orderBy("event_id")
    }),

    // Sliding 1-hour windows every 15 minutes (each event lands in 4
    // windows) via the declarative window() operator — the same call
    // works under readStream with a watermark. Window starts emitted as
    // epoch seconds (integers compare exactly across engines).
    "q_event_sliding" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(expr("unix_micros(w.start) div 1000000").as("win_start_s"),
          col("event_type"), col("n"))
        .orderBy("win_start_s", "event_type")),

    // JSON property extraction + aggregate per type.
    "q_json_props" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("k"), 6).as("avg_k"))
        .orderBy("event_type")),

    // Top-3 users by summed value within each event type (rank window).
    "q_top_users_by_type" -> ((s, dir) => {
      val totals = events(s, dir)
        .groupBy("event_type", "user_id")
        .agg(round(sum("value"), 4).as("total_value"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("total_value").desc, col("user_id"))
      totals.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .orderBy("event_type", "rnk")
    }),

    // Ordered-sequence funnel (view -> click -> purchase, each step
    // within 24h of the previous): the min-over-successors form — three
    // chained per-user window minima over ONE user_id exchange (the
    // windows share partitioning, so Spark plans a single shuffle and
    // three Window operators; no self-joins, no per-user sort). At
    // 100 TB this is the funnel shape that scales: state per user is
    // three timestamps, never the event list.
    "q_event_funnel" -> ((s, dir) => {
      val wU = Window.partitionBy("user_id")
      val x = events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_type"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts_us"))).over(wU))
        .withColumn("t2",
          min(when(col("event_type") === "click"
            && col("ts_us") >= col("t1")
            && col("ts_us") <= col("t1") + FunnelStepUs, col("ts_us"))).over(wU))
        .withColumn("t3",
          min(when(col("event_type") === "purchase"
            && col("ts_us") >= col("t2")
            && col("ts_us") <= col("t2") + FunnelStepUs, col("ts_us"))).over(wU))
      x.groupBy("user_id")
        .agg(max("t1").as("view_us"), max("t2").as("click_us"),
          max("t3").as("purchase_us"))
        .select(col("user_id"), col("view_us"), col("click_us"),
          col("purchase_us"),
          when(col("purchase_us").isNotNull, 3)
            .when(col("click_us").isNotNull, 2)
            .when(col("view_us").isNotNull, 1)
            .otherwise(0).as("stage"))
        .orderBy("user_id")
    }),

    // Cohort retention: users grouped by first-seen day, activity
    // counted per (cohort_day, day_offset) — the product-analytics
    // retention triangle. Two key-partitioned aggregations (per-user
    // first day; per (user, day) dedup) and a broadcast-size join back;
    // output is days² rows regardless of corpus size.
    "q_cohort_retention" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstDay = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.dropDuplicates("user_id", "day")
        .join(firstDay, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Trailing-window anomaly flags: hourly event counts vs the
    // trailing 24-hour mean/std (frame excludes the current hour), z
    // rounded to 4 before the |z| > 3 flag. The hourly counts are
    // DENSIFIED onto a full hour spine (corpus min..max hour × type,
    // zero-filled) — without it the row frame silently spans more than
    // 24 wall-clock hours across gaps and an outage hour (n = 0, the
    // most anomalous state) would be structurally invisible (review
    // finding). Variance from power sums in BOTH engines (same
    // expression order) so cross-engine float drift stays below the
    // rounding. Window partitions by event_type over the spine —
    // |types| × hours rows, not events.
    "q_event_anomaly" -> ((s, dir) => {
      val sparse = events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).cast("double").as("n"))
      val bounds = events(s, dir)
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
      val spine = sparse.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("hour"))
      val hourly = spine
        .join(sparse, Seq("event_type", "hour"), "left")
        .na.fill(0.0, Seq("n"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-24, -1)
      val cnt = count(col("n")).over(w)
      val sx = sum(col("n")).over(w)
      val sxx = sum(col("n") * col("n")).over(w)
      // z is computed from the ROUNDED mean/sd so both engines divide
      // identical 4-decimal inputs — drift cannot cross the final round
      hourly
        .select(col("event_type"), col("hour"), col("n").cast("long").as("n"),
          cnt.as("n_prev"),
          round(sx / cnt, 4).as("mean24"),
          round(sqrt((cnt * sxx - sx * sx) / (cnt * (cnt - 1))), 4).as("sd24"))
        .where(col("n_prev") === 24 && col("sd24") > 0)
        .select(col("event_type"), col("hour"), col("n"),
          col("mean24"), col("sd24"),
          round((col("n") - col("mean24")) / col("sd24"), 4).as("z"))
        .withColumn("anomaly", abs(col("z")) > 3.0)
        .orderBy("event_type", "hour")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_event_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY hour, event_type
        |ORDER BY hour, event_type""".stripMargin,

    "q_sessionize" ->
      s"""WITH x AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
         |             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |           > $SessionGapUs THEN 1
         |         WHEN lag(epoch_us(ts))
         |             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |           IS NULL THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM events
         |),
         |y AS (
         |  SELECT user_id, ts_us,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM x
         |),
         |per_sess AS (
         |  SELECT user_id, sess_id, count(*) AS n_ev,
         |    max(ts_us) - min(ts_us) AS dur_us
         |  FROM y GROUP BY user_id, sess_id
         |)
         |SELECT user_id,
         |  count(*) AS n_sessions,
         |  sum(n_ev)::BIGINT AS n_events,
         |  round(avg(n_ev), 6) AS avg_session_events,
         |  sum(dur_us)::BIGINT AS total_dur_us,
         |  (sum(dur_us)::BIGINT // (count(*) * 1000))::BIGINT AS avg_dur_ms
         |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_asof_purchase_click" ->
      """SELECT p.event_id, epoch_us(c.ts) AS click_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_event_sliding" ->
      """WITH x AS (
        |  SELECT event_type,
        |    unnest(list_transform(range(4),
        |      k -> (epoch_us(ts) // 900000000 - k) * 900)) AS win_start_s
        |  FROM events
        |)
        |SELECT win_start_s, event_type, count(*) AS n
        |FROM x GROUP BY win_start_s, event_type
        |ORDER BY win_start_s, event_type""".stripMargin,

    "q_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(json_extract_string(props, '$.k')::INT), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_top_users_by_type" ->
      """WITH totals AS (
        |  SELECT event_type, user_id, round(sum(value), 4) AS total_value
        |  FROM events GROUP BY event_type, user_id
        |),
        |r AS (
        |  SELECT event_type, user_id, total_value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY total_value DESC, user_id) AS rnk
        |  FROM totals
        |)
        |SELECT event_type, user_id, total_value, rnk
        |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,

    "q_event_funnel" ->
      s"""WITH x AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
         |),
         |s1 AS (
         |  SELECT user_id, ts_us, event_type,
         |    min(CASE WHEN event_type = 'view' THEN ts_us END)
         |      OVER (PARTITION BY user_id) AS t1
         |  FROM x
         |),
         |s2 AS (
         |  SELECT user_id, ts_us, event_type, t1,
         |    min(CASE WHEN event_type = 'click' AND ts_us >= t1
         |             AND ts_us <= t1 + $FunnelStepUs THEN ts_us END)
         |      OVER (PARTITION BY user_id) AS t2
         |  FROM s1
         |),
         |s3 AS (
         |  SELECT user_id, t1, t2,
         |    min(CASE WHEN event_type = 'purchase' AND ts_us >= t2
         |             AND ts_us <= t2 + $FunnelStepUs THEN ts_us END)
         |      OVER (PARTITION BY user_id) AS t3
         |  FROM s2
         |),
         |u AS (
         |  SELECT user_id, max(t1) AS view_us, max(t2) AS click_us,
         |         max(t3) AS purchase_us
         |  FROM s3 GROUP BY user_id
         |)
         |SELECT user_id, view_us, click_us, purchase_us,
         |  CASE WHEN purchase_us IS NOT NULL THEN 3
         |       WHEN click_us IS NOT NULL THEN 2
         |       WHEN view_us IS NOT NULL THEN 1
         |       ELSE 0 END AS stage
         |FROM u ORDER BY user_id""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, ts::DATE AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        |d AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT f.cohort_day, (d.day - f.cohort_day) AS day_offset,
        |       count(DISTINCT d.user_id) AS n_active
        |FROM d JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_event_anomaly" ->
      """WITH sp AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |         count(*)::DOUBLE AS n
        |  FROM events GROUP BY event_type, hour
        |),
        |b AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1
        |  FROM events
        |),
        |h AS (
        |  SELECT t.event_type, s.hour, coalesce(sp.n, 0) AS n
        |  FROM (SELECT DISTINCT event_type FROM sp) t
        |  CROSS JOIN (SELECT unnest(generate_series(h0, h1,
        |                INTERVAL 1 HOUR)) AS hour FROM b) s
        |  LEFT JOIN sp ON sp.event_type = t.event_type
        |              AND sp.hour = s.hour
        |),
        |w AS (
        |  SELECT event_type, hour, n,
        |    count(n) OVER tw AS n_prev,
        |    round(sum(n) OVER tw / count(n) OVER tw, 4) AS mean24,
        |    round(sqrt((count(n) OVER tw * sum(n * n) OVER tw
        |                - sum(n) OVER tw * sum(n) OVER tw)
        |               / (count(n) OVER tw * (count(n) OVER tw - 1))), 4)
        |      AS sd24
        |  FROM h
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour
        |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, hour, n::BIGINT AS n, mean24, sd24,
        |  round((n - mean24) / sd24, 4) AS z,
        |  (abs(round((n - mean24) / sd24, 4)) > 3.0) AS anomaly
        |FROM w WHERE n_prev = 24 AND sd24 > 0
        |ORDER BY event_type, hour""".stripMargin
  )
}
