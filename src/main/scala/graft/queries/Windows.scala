package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.E — window functions.
  *
  * Reference analogs: first-N image dumps / keep-3 checkpoints
  * (`trainer/flax_inference.ipynb` cell 7, `trainer/flax_model.py:377` —
  * top-k), cumulative epoch progress (`:349-375` — running sum), t -> t+6mo
  * deltas (`README.md:6` — lag), Gaussian smoothing (`:73,88` — moving avg),
  * 90/10 split + fixed batches (`:125-131,234-236` — ntile).
  *
  * All windows except ntile are partitioned — they scale horizontally. The
  * global ntile is inherently a total-order op (documented as the split
  * semantics of the reference); at 100 TB you'd ntile within range-partition
  * buckets instead.
  */
object Windows extends QueryPack {

  def queries: Seq[Q] = Seq(
    Q(
      "window_topk_per_group",
      Some("""SELECT c_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
             |  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY c_custkey, rn""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables(s, dir, "orders")
          .select(
            col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("int").as("rn"))
          .filter(col("rn") <= 3)
          .oracleOrder("c_custkey", "rn")
      }),

    Q(
      "window_running_sum",
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
             |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(DecimalType(18, 6))).over(w)
              .cast("double").as("running"))
          .oracleOrder(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
          .select("o_custkey", "o_orderkey", "running")
      }),

    Q(
      "window_lag_delta",
      Some("""SELECT user_id, event_id,
             |  ROUND(value - lag(value) OVER (PARTITION BY user_id
             |                                 ORDER BY ts, event_id), 6) AS delta
             |FROM events ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(s, dir, "events")
          .select(
            col("user_id"), col("event_id"),
            round(col("value") - lag(col("value"), 1).over(w), 6).as("delta"))
          .oracleOrder("user_id", "event_id")
      }),

    // Exponentially-weighted moving average (the decay-smoothing every
    // time-series/metrics pipeline ships next to the plain moving average):
    // 5-term truncated EWM per user with half-decay — weights 1, 0.5,
    // 0.25, 0.125, 0.0625 are exact powers of two, so every product and
    // the FIXED left-to-right numerator/denominator chains are
    // deterministic IEEE in both engines; partition heads shorten the
    // kernel by zeroing absent terms (the adaptive-denominator form).
    // Partition-local over user_id: one shuffle, bounded per-key state,
    // same scale shape as the lag/moving-avg family.
    Q(
      "window_ewma_decay",
      Some("""SELECT user_id, event_id,
             |  ROUND((value
             |    + CASE WHEN x1 IS NULL THEN 0e0 ELSE 5e-1 * x1 END
             |    + CASE WHEN x2 IS NULL THEN 0e0 ELSE 2.5e-1 * x2 END
             |    + CASE WHEN x3 IS NULL THEN 0e0 ELSE 1.25e-1 * x3 END
             |    + CASE WHEN x4 IS NULL THEN 0e0 ELSE 6.25e-2 * x4 END) /
             |    (1e0
             |    + CASE WHEN x1 IS NULL THEN 0e0 ELSE 5e-1 END
             |    + CASE WHEN x2 IS NULL THEN 0e0 ELSE 2.5e-1 END
             |    + CASE WHEN x3 IS NULL THEN 0e0 ELSE 1.25e-1 END
             |    + CASE WHEN x4 IS NULL THEN 0e0 ELSE 6.25e-2 END), 6) AS ewma
             |FROM (SELECT user_id, event_id, value,
             |        lag(value, 1) OVER w AS x1, lag(value, 2) OVER w AS x2,
             |        lag(value, 3) OVER w AS x3, lag(value, 4) OVER w AS x4
             |      FROM events
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
             |ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val lagged = Tables(s, dir, "events")
          .select(
            col("user_id"), col("event_id"), col("value"),
            lag(col("value"), 1).over(w).as("x1"),
            lag(col("value"), 2).over(w).as("x2"),
            lag(col("value"), 3).over(w).as("x3"),
            lag(col("value"), 4).over(w).as("x4"))
        def num(c: String, wt: Double) =
          when(col(c).isNull, 0.0).otherwise(lit(wt) * col(c))
        def den(c: String, wt: Double) =
          when(col(c).isNull, 0.0).otherwise(lit(wt))
        lagged
          .select(
            col("user_id"), col("event_id"),
            round(
              (col("value") + num("x1", 0.5) + num("x2", 0.25)
                + num("x3", 0.125) + num("x4", 0.0625)) /
                (lit(1.0) + den("x1", 0.5) + den("x2", 0.25)
                  + den("x3", 0.125) + den("x4", 0.0625)), 6).as("ewma"))
          .oracleOrder("user_id", "event_id")
      }),

    // Time-interval RANGE frame: per event, how many events the same user
    // produced in the preceding hour (inclusive). The frame is defined on
    // epoch seconds in BOTH engines (floor-truncated identically), so peers
    // at the same second are all included and the count is tie-order-free.
    // Partition-local over user_id — one shuffle, bounded per-key state.
    Q(
      "window_range_interval",
      Some("""SELECT event_id,
             |  CAST(COUNT(*) OVER (PARTITION BY user_id
             |                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             |                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS n_last_hour
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").cast("long"))
          .rangeBetween(-3600, Window.currentRow)
        Tables(s, dir, "events")
          .select(
            col("event_id"),
            count(lit(1)).over(w).cast("long").as("n_last_hour"))
          .oracleOrder("event_id")
      }),

    // Centered 3-row moving average of exact daily revenue (the 1-D
    // separable analog of the reference's Gaussian smoothing). Written as an
    // explicit lag/cur/lead chain so the summation order is pinned.
    Q(
      "window_moving_avg",
      Some("""WITH d AS (
             |  SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS rev
             |  FROM lineitem GROUP BY 1)
             |SELECT day,
             |  ROUND((coalesce(lag(rev) OVER (ORDER BY day), 0) + rev
             |         + coalesce(lead(rev) OVER (ORDER BY day), 0))
             |        / ((CASE WHEN lag(rev) OVER (ORDER BY day) IS NULL THEN 0 ELSE 1 END)
             |           + 1
             |           + (CASE WHEN lead(rev) OVER (ORDER BY day) IS NULL THEN 0 ELSE 1 END)),
             |        4) AS ma3
             |FROM d ORDER BY day""".stripMargin),
      (s, dir) => {
        // Revenue on the long fast path (Fns.cents): p·(1−d) is an exact
        // multiple of 1e-4, value-identical to the oracle's decimal sum.
        // Summed via Fns.lsumUnits (split-long partials + exact decimal
        // recombine) — no 2^53 cast cliff at any realizable rows/day.
        val daily = Tables(s, dir, "lineitem")
          .groupBy(date_trunc("day", col("l_shipdate")).cast("date").as("day"))
          .agg(lsumUnits(cents(col("l_extendedprice")) *
              (lit(100L) - cents(col("l_discount"))), 4).as("rev"))
        // Unpartitioned window is SAFE here: it runs over the daily
        // aggregate, whose cardinality is bounded by distinct ship days
        // (~2.5k rows at any fact-table scale), not over lineitem.
        val w = Window.orderBy("day")
        val lg = lag(col("rev"), 1).over(w)
        val ld = lead(col("rev"), 1).over(w)
        daily
          .select(
            col("day"),
            round((coalesce(lg, lit(0.0)) + col("rev") + coalesce(ld, lit(0.0))) /
              (when(lg.isNull, 0).otherwise(1) + lit(1) +
                when(ld.isNull, 0).otherwise(1)), 4).as("ma3"))
          .oracleOrder("day")
      }),

    // ntile(10) over a TOTAL order — but computed distributed: Spark's
    // unpartitioned `ntile().over(orderBy)` collapses to one task (a serial
    // bottleneck at 100 TB). Instead: range-partition by the order key,
    // local row_number per partition, tiny (numPartitions-row) prefix-sum of
    // partition sizes broadcast back, global rank = offset + local rank, and
    // the exact SQL-standard ntile bucket from closed-form arithmetic
    // (first n%k buckets get one extra row). Bit-identical to ntile, fully
    // parallel. Range boundaries come from sampling and may vary run to run;
    // the global rank (and thus the result) does not depend on them.
    Q(
      "window_ntile_split",
      Some("""WITH t AS (
             |  SELECT o_totalprice, ntile(10) OVER (ORDER BY o_orderkey) AS bucket
             |  FROM orders)
             |SELECT CAST(bucket AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val k = 10
        val o = Tables(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .repartitionByRange(col("o_orderkey"))
        val local = o
          .withColumn("pid", spark_partition_id())
          .withColumn("lrn",
            row_number().over(Window.partitionBy("pid").orderBy("o_orderkey")))
        // Unpartitioned prefix-sum window is SAFE here: its input is one
        // row per partition (numPartitions rows total), never data rows.
        // ONE per-partition count fold feeds both the offsets and the
        // grand total (r21: `total` was a third full pass over `local`,
        // re-running the range exchange + sampling; ntot = Σ psz needs
        // only the numPartitions-row counts table).
        val counts = local.groupBy("pid").agg(count(lit(1)).as("psz"))
          .localCheckpoint()
        val offsets = counts
          .withColumn("offset",
            coalesce(
              sum("psz").over(
                Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .select("pid", "offset")
        val total = counts.agg(sum("psz").as("ntot"))
        val ranked = local
          .join(broadcast(offsets), "pid")
          .crossJoin(broadcast(total))
          .withColumn("rank", col("offset") + col("lrn"))
        // SQL-standard ntile: q = n div k, r = n % k; the first r buckets
        // hold q+1 rows, the rest hold q.
        val cut = expr(s"(ntot % $k) * (ntot div $k + 1)")
        val bucket = when(col("rank") <= cut,
          expr(s"(rank - 1) div (ntot div $k + 1) + 1"))
          .otherwise(expr(s"ntot % $k + ((rank - 1 - (ntot % $k) * (ntot div $k + 1)) div (ntot div $k)) + 1"))
        ranked
          .select(col("o_totalprice"), bucket.cast("int").as("bucket"))
          .groupBy("bucket")
          .agg(cnt.as("n"), dsum(col("o_totalprice")).as("s"))
          .oracleOrder("bucket")
      }),

    // Relative-position windows: percent_rank (SQL-standard (rank-1)/(n-1))
    // and cume_dist, both partition-local (shuffle once on the nation key).
    Q(
      "window_percent_cume",
      Some("""SELECT s_nationkey, s_suppkey,
             |  ROUND(percent_rank() OVER (PARTITION BY s_nationkey
             |                             ORDER BY s_acctbal, s_suppkey), 6) AS pr,
             |  ROUND(cume_dist() OVER (PARTITION BY s_nationkey
             |                          ORDER BY s_acctbal, s_suppkey), 6) AS cd
             |FROM supplier ORDER BY s_nationkey, s_suppkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
        Tables(s, dir, "supplier")
          .select(
            col("s_nationkey"), col("s_suppkey"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .oracleOrder("s_nationkey", "s_suppkey")
      }),

    Q(
      "window_rank_dense_rank",
      Some("""SELECT n_name, s_suppkey, s_acctbal,
             |  CAST(rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS rnk,
             |  CAST(dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS INT) AS drnk,
             |  CAST(row_number() OVER (PARTITION BY s_nationkey
             |                          ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS rn
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |ORDER BY n_name, rn""".stripMargin),
      (s, dir) => {
        val wv = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc)
        val wr = Window.partitionBy("s_nationkey")
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        Tables(s, dir, "supplier")
          .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select(
            col("n_name"), col("s_suppkey"), col("s_acctbal"),
            rank().over(wv).cast("int").as("rnk"),
            dense_rank().over(wv).cast("int").as("drnk"),
            row_number().over(wr).cast("int").as("rn"))
          .oracleOrder("n_name", "rn")
      }),

    // Batch sessionization by inactivity gap (30 min) — the lag-flag-cumsum
    // idiom: a session break is "previous event more than the gap ago", the
    // session id is the running sum of breaks. The batch twin of
    // stream_session_windows: same event stream, same gap semantics,
    // computed as two window passes over (user_id, ts) — partitioned by
    // user, so no global sort; durations are exact integer microseconds.
    Q(
      "window_sessionize_gap",
      Some("""WITH e AS (SELECT user_id, event_id, ts FROM events
             |           WHERE user_id < 300),
             |l AS (SELECT user_id, event_id, ts,
             |        lag(ts) OVER (PARTITION BY user_id
             |                      ORDER BY ts, event_id) AS pts
             |      FROM e),
             |f AS (SELECT user_id, event_id, ts,
             |        CASE WHEN pts IS NULL
             |               OR ts > pts + INTERVAL 30 MINUTE
             |             THEN 1 ELSE 0 END AS brk
             |      FROM l),
             |s AS (SELECT user_id, ts,
             |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                       ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM f)
             |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_events,
             |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS dur_us
             |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin),
      (s, dir) => {
        val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .filter(col("user_id") < 300)
          .select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("pts", lag("ts", 1).over(wo))
          .withColumn(
            "brk",
            when(
              col("pts").isNull ||
                col("ts") > col("pts") + expr("INTERVAL 30 MINUTES"),
              1).otherwise(0))
          .withColumn("sid", sum("brk").over(wr))
          .groupBy(col("user_id"), col("sid").cast("long").as("session_id"))
          .agg(
            cnt.as("n_events"),
            (unix_micros(max("ts")) - unix_micros(min("ts")))
              .cast("long").as("dur_us"))
          .oracleOrder("user_id", "session_id")
      }),

    // first_value / last_value / nth_value — the "vs session start / vs
    // session end / vs second touch" attribution columns. Frames are spelled
    // explicitly on BOTH engines: last_value needs the full-partition frame
    // (the default RANGE..CURRENT ROW frame makes it a synonym for the
    // current row — the classic window bug), nth_value keeps the default
    // growing frame so it is NULL until the partition's 2nd row arrives.
    // Partition-local per user: one shuffle, same scale shape as lag/lead.
    Q(
      "window_first_last",
      Some("""SELECT user_id, event_id,
             |  ROUND(value - first_value(value) OVER w, 6) AS d_first,
             |  ROUND(last_value(value)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |    - value, 6) AS d_last,
             |  ROUND(nth_value(value, 2) OVER w, 6) AS second_touch
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wFull = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "events")
          .select(
            col("user_id"), col("event_id"),
            round(col("value") - first(col("value")).over(w), 6).as("d_first"),
            round(last(col("value")).over(wFull) - col("value"), 6).as("d_last"),
            round(nth_value(col("value"), 2).over(w), 6).as("second_touch"))
          .oracleOrder("user_id", "event_id")
      }),

    // Gaps-and-islands: longest consecutive-calendar-day activity streak
    // per user (the DAU-streak metric) — the calendar twin of the
    // time-gap sessionizer above. The classic identity: within a user,
    // `day - row_number(ordered by day)` is CONSTANT exactly across a run
    // of consecutive days, so each streak becomes one group key with no
    // iteration and no self-join. Shape at scale: activity dedups to
    // (user, day), then every step — row_number, island fold, per-user
    // max — stays partitioned on user_id: one shuffle end to end.
    Q(
      "window_streak_islands",
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
             |i AS (
             |  SELECT user_id, d,
             |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
             |             AS INT) AS island
             |  FROM act),
             |s AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len,
             |        MIN(d) AS start_day
             |      FROM i GROUP BY 1, 2)
             |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
             |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
             |  CAST(MAX(len) AS BIGINT) AS max_streak,
             |  MIN(start_day) AS first_day
             |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("d")
        Tables(s, dir, "events")
          .select(col("user_id"), col("ts").cast("date").as("d"))
          .distinct()
          .withColumn("island",
            date_sub(col("d"), row_number().over(w)))
          .groupBy("user_id", "island")
          .agg(cnt.as("len"), min("d").as("start_day"))
          .groupBy("user_id")
          .agg(
            sum("len").cast("long").as("n_active_days"),
            cnt.as("n_streaks"),
            max("len").cast("long").as("max_streak"),
            min("start_day").as("first_day"))
          .oracleOrder("user_id")
      }),

    // Trailing-window z-score anomaly flags: each event scored against the
    // moments of its own user's last 10 events — the standard streaming
    // outlier monitor, here in its batch form. Determinism: the window
    // moments are EXACT decimal sums (the `dstddev` policy of
    // `agg_global_mean_std`, applied per frame), so partial-agg merge order
    // can't move a value across the |z| threshold; the only doubles are the
    // final per-row divisions. Shape at scale: one shuffle on user_id serves
    // both window sums; no self-join, no second pass. The variance guard
    // (sd > 1e-9) keeps a constant-valued frame from emitting ±inf.
    Q(
      "window_anomaly_zscore",
      Some("""WITH w AS (
             |  SELECT user_id, event_id, value,
             |    CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER win AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(value*value AS DECIMAL(30,10))) OVER win AS DOUBLE) AS s2,
             |    COUNT(*) OVER win AS n
             |  FROM events
             |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  CAST(event_id AS BIGINT) AS event_id,
             |  ROUND(value, 6) AS value,
             |  ROUND((value - s1/n)/sqrt((s2 - s1*s1/n)/(n-1)), 6) AS z
             |FROM w
             |WHERE n >= 10 AND sqrt((s2 - s1*s1/n)/(n-1)) > 1e-9
             |  AND ABS((value - s1/n)/sqrt((s2 - s1*s1/n)/(n-1))) > 2.5
             |ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-9, Window.currentRow)
        val sd = sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - lit(1)))
        val z = (col("value") - col("s1") / col("n")) / sd
        Tables(s, dir, "events")
          .select(
            col("user_id").cast("long"), col("event_id").cast("long"),
            col("value"),
            sum(col("value").cast(DecimalType(18, 6))).over(win)
              .cast("double").as("s1"),
            sum((col("value") * col("value")).cast(DecimalType(30, 10)))
              .over(win).cast("double").as("s2"),
            count(lit(1)).over(win).as("n"))
          .filter(col("n") >= 10 && sd > 1e-9 && abs(z) > 2.5)
          .select(
            col("user_id"), col("event_id"),
            round(col("value"), 6).as("value"),
            round(z, 6).as("z"))
          .oracleOrder("user_id", "event_id")
      }),

    // Maximum drawdown per series: running peak via an unbounded-preceding
    // MAX window, drawdown = peak − current, max per user — the monitoring
    // metric for "how far below its best has this series fallen" (equally
    // the loss-curve regression detector for training telemetry). Exact:
    // the only arithmetic is one subtraction of raw doubles; MAX is
    // order-free. One user_id shuffle serves the window AND the final
    // group-by (same key ⇒ no second exchange).
    Q(
      "window_drawdown_max",
      Some("""WITH s AS (
             |  SELECT user_id, value,
             |    MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS peak
             |  FROM events)
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  ROUND(MAX(peak - value), 6) AS max_drawdown,
             |  ROUND(MAX(peak), 6) AS peak_value,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .select(
            col("user_id").cast("long"), col("value"),
            max("value").over(w).as("peak"))
          .groupBy("user_id")
          .agg(
            round(max(col("peak") - col("value")), 6).as("max_drawdown"),
            round(max("peak"), 6).as("peak_value"),
            cnt.as("n"))
          .oracleOrder("user_id")
      }),

    // One-sided CUSUM drift alarms (Page's change detector) per user — the
    // clamped recursion S_t = max(0, S_{t-1} + (x_t − k)) is
    // window-INEXPRESSIBLE (each state depends on every predecessor's
    // clamp), so it runs on the custom whole-operator tier:
    // graft.plans.Cusum — CusumPlan LogicalPlan + CusumStrategy +
    // CusumExec (ClusteredDistribution(user_id) + ordering ⇒ ONE hash
    // exchange + sort, then an O(1)-state streaming fold per partition).
    // The oracle replays the fold as a DuckDB recursive CTE; both engines
    // evaluate the identical max(0, s + (x−k)) double chain — bit-exact.
    Q(
      "window_cusum_alert",
      Some("""WITH RECURSIVE base AS (
             |  SELECT user_id, event_id, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |c AS (
             |  SELECT user_id, rn, event_id, GREATEST(0, value - 60.0) AS s
             |  FROM base WHERE rn = 1
             |  UNION ALL
             |  SELECT b.user_id, b.rn, b.event_id,
             |    GREATEST(0, c.s + (b.value - 60.0)) AS s
             |  FROM base b JOIN c ON b.user_id = c.user_id AND b.rn = c.rn + 1)
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  CAST(SUM(CASE WHEN s > 300.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm,
             |  ROUND(MAX(s), 6) AS max_cusum,
             |  CAST(MIN(CASE WHEN s > 300.0 THEN event_id ELSE NULL END)
             |       AS BIGINT) AS first_alarm
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val withS = graft.plans.Cusum.applied(
          Tables(s, dir, "events")
            .select(col("user_id"), col("ts"), col("event_id"), col("value")),
          k = 60.0, group = Seq("user_id"), order = Seq("ts", "event_id"),
          valueCol = "value")
        withS.groupBy(col("user_id").cast("long").as("user_id"))
          .agg(
            sum(when(col("cusum") > 300.0, 1).otherwise(0)).cast("long")
              .as("n_alarm"),
            round(max("cusum"), 6).as("max_cusum"),
            min(when(col("cusum") > 300.0, col("event_id"))).cast("long")
              .as("first_alarm"))
          .oracleOrder("user_id")
      }),

    // Trailing 9-row EXACT rolling median per user — the robust twin of the
    // moving average (outlier-immune smoother every metrics pipeline wants
    // next to the mean). The frame is pinned to EXACTLY 9 rows (row_number
    // >= 9 drops warm-up heads), so the median is the 5th order statistic —
    // a pure element SELECTION, no interpolation arithmetic, which removes
    // the (a+b)/2-vs-a+0.5*(b-a) float-knife-edge a mid-pair average would
    // reintroduce between engines. Spark has no native windowed median;
    // collect_list over the bounded ROWS frame + array_sort + element_at
    // keeps O(9) state per row — partition-local over user_id, the one
    // shuffle the whole lag/EWMA family already pays. At 100 TB the frame
    // stays 9 elements regardless of data volume; only the per-user
    // partitioning matters, and it holds.
    Q(
      "window_rolling_median",
      Some("""WITH b AS (
             |  SELECT user_id, event_id,
             |    row_number() OVER (PARTITION BY user_id
             |                       ORDER BY ts, event_id) AS rn,
             |    median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS med
             |  FROM events)
             |SELECT user_id, event_id, ROUND(med, 6) AS med9
             |FROM b WHERE rn >= 9 ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wf = wo.rowsBetween(-8, Window.currentRow)
        Tables(s, dir, "events")
          .select(
            col("user_id"), col("event_id"),
            row_number().over(wo).as("rn"),
            element_at(array_sort(collect_list(col("value")).over(wf)), 5)
              .as("med"))
          .filter(col("rn") >= 9)
          .select(col("user_id"), col("event_id"),
            round(col("med"), 6).as("med9"))
          .oracleOrder("user_id", "event_id")
      }),

    // Trailing 20-pair rolling lag-1 autocorrelation per user — the
    // mean-reversion / trend-persistence monitor quant and telemetry
    // pipelines run next to the rolling moments. Pair stream = (x, lag(x))
    // with partition heads dropped; all five sufficient statistics
    // (Σx, Σy, Σxx, Σyy, Σxy) are DECIMAL window sums of per-row ROUNDED
    // terms (the anomaly-zscore discipline) so shuffle/merge order can't
    // move r; the only doubles are the final closed-form division. The lag
    // window, the frame window, and the warm-up row_number all partition
    // on user_id — ONE shuffle end to end (Spark reuses the exchange+sort
    // across same-keyed windows). Degenerate frames (zero variance) are
    // dropped by an exact-decimal-derived guard, deterministic both
    // engines.
    Q(
      "window_rolling_corr",
      Some("""WITH p AS (
             |  SELECT user_id, event_id, ts, value AS x,
             |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
             |  FROM events),
             |f AS (SELECT * FROM p WHERE y IS NOT NULL),
             |w AS (
             |  SELECT user_id, event_id,
             |    COUNT(*) OVER win AS n,
             |    CAST(SUM(CAST(x AS DECIMAL(18,6))) OVER win AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(y AS DECIMAL(18,6))) OVER win AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(x*x AS DECIMAL(30,10))) OVER win AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(y*y AS DECIMAL(30,10))) OVER win AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(x*y AS DECIMAL(30,10))) OVER win AS DOUBLE) AS sxy
             |  FROM f
             |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  CAST(event_id AS BIGINT) AS event_id,
             |  ROUND((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r20
             |FROM w
             |WHERE n >= 20 AND (n*sxx - sx*sx) * (n*syy - sy*sy) > 1e-9
             |ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val lagW = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val win = lagW.rowsBetween(-19, Window.currentRow)
        val f = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("value").as("x"),
            lag(col("value"), 1).over(lagW).as("y"))
          .filter(col("y").isNotNull)
        // Exact-unit long path for the five sliding sums: value is an
        // exact 2-dp decimal, so x (and the lagged y) are integer cents
        // and the products are exact multiples of 1e-4 — rint(·10^k)
        // recovers the unscaled decimal integer exactly (true value is an
        // integer, double error ~1e-7 ≪ 0.5) and plain long window sums
        // (≤ 20·3.1e9 per frame) replace the DECIMAL(30,10) sliding
        // frames, whose past-18-digit BigInteger buffer cost 10M slow ops
        // per pass here. One correctly-rounded division per output frame
        // reproduces the decimal→double cast bit-for-bit.
        def u(c: org.apache.spark.sql.Column, k: Long): org.apache.spark.sql.Column =
          rint(c * k).cast("long")
        val w = f.select(
          col("user_id").cast("long"), col("event_id").cast("long"),
          count(lit(1)).over(win).as("n"),
          (sum(u(col("x"), 100L)).over(win).cast("double") / 100.0).as("sx"),
          (sum(u(col("y"), 100L)).over(win).cast("double") / 100.0).as("sy"),
          (sum(u(col("x") * col("x"), 10000L)).over(win).cast("double")
            / 10000.0).as("sxx"),
          (sum(u(col("y") * col("y"), 10000L)).over(win).cast("double")
            / 10000.0).as("syy"),
          (sum(u(col("x") * col("y"), 10000L)).over(win).cast("double")
            / 10000.0).as("sxy"))
        val den = (col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))
        val r = (col("n") * col("sxy") - col("sx") * col("sy")) / sqrt(den)
        w.filter(col("n") >= 20 && den > 1e-9)
          .select(col("user_id"), col("event_id"), round(r, 6).as("r20"))
          .oracleOrder("user_id", "event_id")
      }),

    // Time-to-conversion: for every view event, how long until that user's
    // NEXT purchase — the forward-looking attribution latency behind
    // conversion-window tuning (and the batch twin of the funnel's 1-day
    // bound). A conditional MIN over the strictly-following frame finds
    // the first future purchase in one window pass — no self-join of
    // events to events, which is the naive shape that explodes at scale.
    // Views that never convert drop out (NULL frame min). Exact integer
    // microseconds (unix_micros ≡ DuckDB epoch_us); partition-local on the
    // one user_id shuffle the window family shares.
    Q(
      "window_time_to_conversion",
      Some("""WITH nxt AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    MIN(CASE WHEN event_type = 'purchase' THEN ts END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p
             |  FROM events)
             |SELECT user_id, event_id,
             |  CAST(epoch_us(next_p) - epoch_us(ts) AS BIGINT) AS us_to_purchase
             |FROM nxt WHERE event_type = 'view' AND next_p IS NOT NULL
             |ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing)
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
            min(when(col("event_type") === "purchase", col("ts"))).over(w)
              .as("next_p"))
          .filter(col("event_type") === "view" && col("next_p").isNotNull)
          .select(col("user_id"), col("event_id"),
            (unix_micros(col("next_p")) - unix_micros(col("ts")))
              .cast("long").as("us_to_purchase"))
          .oracleOrder("user_id", "event_id")
      }),

    // STL-lite seasonal decomposition of the hourly event series — the
    // time-series readout behind capacity planning and anomaly baselines:
    // per event_type, (1) the raw stream folds to the OBSERVED hourly
    // count series (one partial-aggregated shuffle), (2) the trend is a
    // centered 24-row moving average over that compact series (one
    // event_type exchange — the series is hours-sized, never event-sized),
    // (3) the hour-of-day seasonal profile is the mean DETRENDED count per
    // (type, hod). Exactness: the trend is one double division of exact
    // integer window sums; detrended values round 6dp before the decimal
    // profile sum (shuffle-order-free — the chisq discipline); one closing
    // double division per profile cell. Zero-event hours are absent by
    // construction (observed-hour series, documented; a production
    // deployment densifies against the calendar dimension first).
    Q(
      "window_seasonal_decompose",
      Some("""WITH h AS (
             |  SELECT event_type, date_trunc('hour', ts) AS hb,
             |    CAST(COUNT(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, hb, n,
             |    ROUND(CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w, 6)
             |      AS trend
             |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hb
             |    ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
             |d AS (
             |  SELECT event_type, CAST(extract(hour FROM hb) AS INT) AS hod,
             |    ROUND(n - trend, 6) AS det
             |  FROM t)
             |SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_obs,
             |  ROUND(CAST(CAST(SUM(CAST(det AS DECIMAL(18,6))) AS VARCHAR)
             |    AS DOUBLE) / COUNT(*), 6) AS seasonal
             |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("hb")
          .rowsBetween(-11, 12)
        Tables(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hb"))
          .agg(cnt.as("n"))
          .select(col("event_type"), col("hb"), col("n"),
            round(sum("n").over(w).cast("double") /
              count(lit(1)).over(w), 6).as("trend"))
          .select(col("event_type"), hour(col("hb")).cast("int").as("hod"),
            round(col("n") - col("trend"), 6).as("det"))
          .groupBy("event_type", "hod")
          .agg(cnt.as("n_obs"),
            round(dsum(col("det")) / count(lit(1)), 6).as("seasonal"))
          .oracleOrder("event_type", "hod")
      }),

    // Bollinger bands on the daily order-revenue series: 20-day trailing
    // mean ± 2σ with breakout flags — the rolling-volatility envelope
    // (same family as window_anomaly_zscore, but band OUTPUTS and a
    // FULL-frame-only discipline: rows before day 20 are suppressed, so no
    // partial-frame denominators). Exactness at ANY scale: the daily value
    // is exact integer cents (long), the frame's Σc is a long window sum,
    // and Σc² runs as a DECIMAL(38,0) window sum of (19,0)×(19,0) products
    // — immune to the long overflow a cents² sum would hit at the 10x/30x
    // scale probes. Both exact sums convert to double over the VARCHAR
    // route (string→double is correctly rounded in both engines), and
    // every downstream op (variance expansion, sqrt, bands, flags) is the
    // identical IEEE expression tree — no terminal ROUND anywhere, so no
    // midpoint hazard. One unpartitioned window over the ~2.4k-day
    // aggregate (bounded by calendar days, not fact rows — the
    // window_moving_avg policy).
    Q(
      "window_bollinger_bands",
      Some("""WITH d AS (
             |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |w AS (
             |  SELECT day, c,
             |    ROW_NUMBER() OVER (ORDER BY day) AS rn,
             |    CAST(SUM(c) OVER (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
             |    SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
             |      OVER (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s2
             |  FROM d),
             |v AS (
             |  SELECT day, c, s,
             |    CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d
             |  FROM w WHERE rn >= 20),
             |b AS (
             |  SELECT day, CAST(c AS DOUBLE) / 100.0 AS close,
             |    CAST(s AS DOUBLE) / 20.0 / 100.0 AS mid,
             |    sqrt((s2d - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / 20.0) / 19.0) / 100.0 AS sd
             |  FROM v)
             |SELECT day, close, mid, sd,
             |  mid + 2.0 * sd AS upper, mid - 2.0 * sd AS lower,
             |  close > mid + 2.0 * sd AS above, close < mid - 2.0 * sd AS below
             |FROM b ORDER BY day""".stripMargin),
      (s, dir) => {
        val daily = Tables(s, dir, "orders")
          .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
          .agg(sum(cents(col("o_totalprice"))).cast("long").as("c"))
        val w = Window.orderBy("day")
        val frame = w.rowsBetween(-19, Window.currentRow)
        val dec19 = DecimalType(19, 0)
        val sd = col("s").cast("double")
        val sdev = sqrt((col("s2d") - sd * sd / 20.0) / 19.0) / 100.0
        val mid = sd / 20.0 / 100.0
        val close = col("c").cast("double") / 100.0
        daily
          .select(col("day"), col("c"),
            row_number().over(w).as("rn"),
            sum("c").over(frame).cast("long").as("s"),
            sum(col("c").cast(dec19) * col("c").cast(dec19)).over(frame).as("s2"))
          .filter(col("rn") >= 20)
          .select(col("day"), col("c"), col("s"),
            col("s2").cast("string").cast("double").as("s2d"))
          .select(col("day"), close.as("close"), mid.as("mid"), sdev.as("sd"))
          .select(col("day"), col("close"), col("mid"), col("sd"),
            (col("mid") + lit(2.0) * col("sd")).as("upper"),
            (col("mid") - lit(2.0) * col("sd")).as("lower"),
            (col("close") > col("mid") + lit(2.0) * col("sd")).as("above"),
            (col("close") < col("mid") - lit(2.0) * col("sd")).as("below"))
          .oracleOrder("day")
      }))
}
