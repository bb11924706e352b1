package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.C — joins.
  *
  * Reference analogs: palette lookup `np.take` (`trainer/flax_inference.ipynb`
  * cell 8 — broadcast dim join), positional alignment of
  * inputs/labels_landcover/labels_lst (`trainer/flax_model.py:62-66,108-120` —
  * multiway equi-join), all-keys-present requirement (`:62-64` — semi join),
  * dropped incomplete batch (`:235` — anti join), validity-band membership
  * (`:70-75` — theta join), and the t / t+6mo temporal pairing (`README.md:6`
  * — as-of / interval joins).
  *
  * Scale notes: dimension sides (`region`, `nation`, `customer` at dim scale)
  * are broadcast — no shuffle of the fact table; the flagship star join
  * shuffles `lineitem` once on `l_orderkey` (SMJ/SHJ chosen by Catalyst+AQE)
  * and every subsequent dim hop is broadcast. The as-of join is a
  * partition-local window over `user_id` — the 100 TB-safe formulation (no
  * O(events x signups) blow-up).
  */
object Joins extends QueryPack {

  /** Once-per-JVM staging registry for `join_dpp_partition_prune` (value =
    * path). Keyed by (pid, input dir) like the binary-blob spill: concurrent
    * harness JVMs (Verify ∥ Bench) each own a private staged copy, so an
    * overwrite in one process can never race a read in another, and repeated
    * bench samples measure the DPP join itself rather than re-paying the
    * partitioned rewrite on every invocation.
    */
  private val dppStaged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Once-per-(session, dir) catalog staging for `join_cbo_reorder`:
    * the three join inputs land as catalog tables (ANALYZE only works on
    * catalog tables) and get full column statistics. Returns the
    * dir-disambiguated table-name map.
    */
  private val cboStaged =
    scala.collection.concurrent.TrieMap.empty[(String, String), Map[String, String]]

  private[graft] def cboTables(
      s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, String] =
    cboStaged.getOrElseUpdate((org.apache.spark.sql.graft.GraftSqlBridge.sessionUUID(s), dir), {
      // pid + dir digest: concurrent harness JVMs (each with its own
      // in-memory catalog but a SHARED filesystem) must never collide on
      // a table location, so the tables are EXTERNAL over pid-private
      // tmp paths rather than managed in the repo warehouse.
      val tag = s"${ProcessHandle.current().pid()}_" +
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val slices = Map(
        "orders" -> Tables(s, dir, "orders")
          .select("o_custkey", "o_totalprice"),
        "customer" -> Tables(s, dir, "customer")
          .select("c_custkey", "c_nationkey"),
        "nation" -> Tables(s, dir, "nation")
          .select("n_nationkey", "n_name"))
      slices.map { case (name, df) =>
        val t = s"graft_cbo_${name}_$tag"
        val path =
          s"${System.getProperty("java.io.tmpdir")}/graft_cbo_${name}_$tag"
        df.write.mode("overwrite").parquet(path)
        s.sql(s"DROP TABLE IF EXISTS $t")
        s.sql(s"CREATE TABLE $t USING parquet LOCATION '$path'")
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
        name -> t
      }
    })

  /** The deliberately fact-first join text `join_cbo_reorder` hands the
    * optimizer (CboReorderSpec pins that CBO flips it dimension-first).
    */
  private[graft] def cboSql(t: Map[String, String]): String =
    s"""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
       |  ROUND(graft_dsum(o_totalprice, 18, 6), 4) AS s
       |FROM ${t("orders")} o
       |JOIN ${t("customer")} c ON o.o_custkey = c.c_custkey
       |JOIN ${t("nation")} nt ON c.c_nationkey = nt.n_nationkey
       |WHERE nt.n_name IN ('NATION_3', 'NATION_7')
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Run `body` with cost-based optimization + stats-driven join reorder
    * on, restoring both keys after. The body must EXECUTE its plan inside
    * the scope (localCheckpoint) — a lazily-returned DataFrame would be
    * re-optimized with CBO off when the harness writes it.
    */
  private[graft] def withCbo[T](
      s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val olds = keys.map(k => k -> s.conf.getOption(k))
    keys.foreach(s.conf.set(_, "true"))
    try body
    finally olds.foreach { case (k, o) =>
      o.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  /** Final executed plan of the last `join_skew_aqe` materialization —
    * captured inside the query because the skew-enabled execution happens
    * eagerly under the temporarily-lowered AQE thresholds (PlanShapeSpec
    * asserts the skew split on this string).
    */
  @volatile private[graft] var lastSkewPlan: String = ""

  @volatile private[graft] var lastBloomPlan: String = ""

  /** Exact revenue sum on the long fast path: price and discount are
    * exact 2-dp decimals, so price·(1−disc) is an exact multiple of 1e-4
    * and cents·(100−dcents) longs hold the group sums exactly (≤ ~1e9 per
    * row; group sums stay well under 2^53, so the one final division is
    * the decimal sum's correctly-rounded double cast). Value-identical to
    * `SUM(CAST(p·(1−d) AS DECIMAL(18,6)))` cast to DOUBLE, and — being a
    * plain long sum — an even purer whole-stage-codegen HashAggregate
    * pipeline than the decimal form it replaces (the pinned plan shape).
    */
  private val revenue =
    sum(rint(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - rint(col("l_discount") * 100).cast("long")))
      .cast("double") / 10000.0

  def queries: Seq[Q] = Seq(
    Q(
      "join_broadcast_dim",
      Some("""SELECT n_nationkey, n_name, r_name
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |ORDER BY n_nationkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "nation")
          .join(broadcast(Tables(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name", "r_name")
          .oracleOrder("n_nationkey")),

    // Flagship: star-schema multiway join + decimal-exact revenue rollup.
    Q(
      "join_star_multiway",
      Some("""SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(revenue.as("revenue"), cnt.as("n"))
          .oracleOrder("r_name", "o_year")),

    // The SQL-API surface of the engine: the flagship expressed as literal
    // spark.sql(...) text over per-session temp views. Same Catalyst plan
    // (AQE broadcasts every dim hop) and the identical oracle as
    // join_star_multiway — a user can drive every relational operator here
    // through plain SQL instead of the DataFrame DSL.
    Q(
      "sql_flagship_twin",
      Some("""SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        for (t <- Seq("lineitem", "orders", "customer", "nation", "region"))
          Tables(s, dir, t).createOrReplaceTempView(s"graft_$t")
        s.sql("""SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
                |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                |  CAST(COUNT(*) AS BIGINT) AS n
                |FROM graft_lineitem
                |JOIN graft_orders   ON l_orderkey = o_orderkey
                |JOIN graft_customer ON o_custkey = c_custkey
                |JOIN graft_nation   ON c_nationkey = n_nationkey
                |JOIN graft_region   ON n_regionkey = r_regionkey
                |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      }),

    Q(
      "join_left_outer",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
             |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "orders")
          .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy("o_orderstatus")
          .agg(
            cnt.as("n_rows"),
            sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).cast("long").as("n_null"))
          .oracleOrder("o_orderstatus")),

    Q(
      "join_semi",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .oracleOrder("c_custkey")),

    Q(
      "join_anti",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .oracleOrder("c_custkey")),

    Q(
      "join_theta_range",
      Some("""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN part
             |  ON l_partkey = p_partkey AND l_quantity > p_size
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")),
            col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
          .groupBy("p_brand")
          .agg(cnt.as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .oracleOrder("p_brand")),

    // As-of join: latest strictly-earlier signup of the same user, expressed
    // as a partition-local running last_value over (ts, event_id) — identical
    // window SQL on the DuckDB side, and shuffle-once-on-user_id at scale.
    Q(
      "join_asof_latest_before",
      Some("""SELECT event_id, strftime(asof_ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_signup_ts FROM (
             |  SELECT event_id,
             |    last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_ts
             |  FROM events)
             |ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir, "events")
          .select(
            col("event_id"),
            date_format(
              last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true)
                .over(w),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_signup_ts"))
          .oracleOrder("event_id")
      }),

    // Forward as-of join — the label-join direction of the as-of family:
    // for every event, the FIRST strictly-later purchase of the same user
    // ("what did this interaction lead to"), the join every
    // feature-at-time-t → outcome-after-t training-set build runs. Same
    // partition-local window dialect as join_asof_latest_before, mirrored
    // frame (1 FOLLOWING → UNBOUNDED FOLLOWING).
    Q(
      "join_asof_forward",
      Some("""SELECT event_id, strftime(next_ts, '%Y-%m-%d %H:%M:%S.%f') AS next_purchase_ts FROM (
             |  SELECT event_id,
             |    first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ts
             |  FROM events)
             |ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(1, Window.unboundedFollowing)
        Tables(s, dir, "events")
          .select(
            col("event_id"),
            date_format(
              first(when(col("event_type") === "purchase", col("ts")),
                ignoreNulls = true).over(w),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("next_purchase_ts"))
          .oracleOrder("event_id")
      }),

    // Nearest as-of join — the third direction of the as-of family: per
    // event, the temporally CLOSEST click of the same user in either
    // direction (sensor-alignment semantics: pandas merge_asof
    // direction='nearest'). Composes the backward and forward frames of
    // the two siblings and picks the smaller |Δt| (tie → the earlier,
    // i.e. the backward match, matching pandas). Same partition-local
    // window dialect — one shuffle on user_id at any scale, integer
    // microsecond deltas so both engines compare exactly.
    Q(
      "join_asof_nearest",
      Some("""SELECT event_id,
             |  strftime(CASE
             |    WHEN prev_ts IS NULL THEN next_ts
             |    WHEN next_ts IS NULL THEN prev_ts
             |    WHEN epoch_us(ts) - epoch_us(prev_ts)
             |         <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
             |    ELSE next_ts END, '%Y-%m-%d %H:%M:%S.%f') AS nearest_click_ts
             |FROM (
             |  SELECT event_id, ts,
             |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ts,
             |    first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ts
             |  FROM events)
             |ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val back = ord.rowsBetween(Window.unboundedPreceding, -1)
        val fwd = ord.rowsBetween(1, Window.unboundedFollowing)
        val clickTs = when(col("event_type") === "click", col("ts"))
        val prevTs = last(clickTs, ignoreNulls = true).over(back)
        val nextTs = first(clickTs, ignoreNulls = true).over(fwd)
        Tables(s, dir, "events")
          .select(col("event_id"), col("ts"),
            prevTs.as("prev_ts"), nextTs.as("next_ts"))
          .select(
            col("event_id"),
            date_format(
              when(col("prev_ts").isNull, col("next_ts"))
                .when(col("next_ts").isNull, col("prev_ts"))
                .when(
                  unix_micros(col("ts")) - unix_micros(col("prev_ts")) <=
                    unix_micros(col("next_ts")) - unix_micros(col("ts")),
                  col("prev_ts"))
                .otherwise(col("next_ts")),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("nearest_click_ts"))
          .oracleOrder("event_id")
      }),

    // Tolerance-bounded as-of join — the fourth knob of the as-of family
    // (pandas merge_asof `tolerance=`): the latest prior click of the same
    // user, but only if it happened within the last 24 h; staler matches
    // are rejected to NULL rather than silently joined. This is the
    // feature-freshness guard every point-in-time feature join needs (a
    // week-old "last click" is not a feature, it's leakage of a different
    // regime). Identical scale shape to join_asof_latest_before — one
    // user_id shuffle, partition-local window — plus a free post-window
    // integer-microsecond comparison; the 86400e6 µs bound splits the
    // sf0.01 events 671 no-match / 3563 fresh / 5766 stale, so all three
    // outcomes are exercised at every scale.
    Q(
      "join_asof_tolerance",
      Some("""SELECT event_id,
             |  strftime(CASE WHEN epoch_us(ts) - epoch_us(prev_ts) <= 86400000000
             |                THEN prev_ts END, '%Y-%m-%d %H:%M:%S.%f') AS fresh_click_ts
             |FROM (
             |  SELECT event_id, ts,
             |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_ts
             |  FROM events)
             |ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val back = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir, "events")
          .select(col("event_id"), col("ts"),
            last(when(col("event_type") === "click", col("ts")),
              ignoreNulls = true).over(back).as("prev_ts"))
          .select(
            col("event_id"),
            date_format(
              // NULL prev_ts fails the <= predicate, so the no-prior-click
              // case folds into the same WHEN arm as the stale case.
              when(
                unix_micros(col("ts")) - unix_micros(col("prev_ts")) <=
                  86400000000L,
                col("prev_ts")),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("fresh_click_ts"))
          .oracleOrder("event_id")
      }),

    // Bucketed co-located join: both sides pre-bucketed on the join key into
    // external tables, so the SortMergeJoin needs NO exchange (the plan-shape
    // test asserts it). This is the 100 TB big-big join strategy: pay the
    // shuffle once at layout time, every subsequent join is shuffle-free.
    // The layout is reused across JVMs the way a real bucketed warehouse
    // table would be: if the files are already on disk (tagged by source
    // path + mtime so regenerated testdata invalidates them), the table is
    // just re-registered over them via CREATE TABLE ... CLUSTERED BY ...
    // LOCATION instead of rewritten. hint("merge") keeps the small sf sides
    // from being broadcast so the bucketed path is actually exercised.
    Q(
      "join_bucketed_colocated",
      Some("""SELECT o_orderpriority,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS rev
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        import org.apache.hadoop.fs.Path
        val tmp = System.getProperty("java.io.tmpdir")
        val hconf = s.sparkContext.hadoopConfiguration
        // Layout identity: source file path + its modification time. A
        // regenerated source invalidates the tag, so a stale layout can
        // never serve a new dataset.
        def srcTag(src: String): String = {
          val p = new Path(s"$dir/$src.parquet")
          val fs = p.getFileSystem(hconf)
          val mt = if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
          java.lang.Integer.toHexString(
            scala.util.hashing.MurmurHash3.stringHash(s"$dir/$src:$mt"))
        }
        def bucketed(src: String, cols: Seq[String], key: String, base: String): String = {
          val table = s"${base}_${srcTag(src)}"
          if (!s.catalog.tableExists(table)) {
            val path = s"$tmp/graft_bucket_$table"
            val fs = new Path(path).getFileSystem(hconf)
            if (fs.exists(new Path(s"$path/_SUCCESS"))) {
              // Files already bucketed by a previous JVM: register, don't rewrite.
              val ddl = Tables(s, dir, src).select(cols.map(col): _*).schema.toDDL
              s.sql(s"""CREATE TABLE $table ($ddl) USING parquet
                       |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                       |LOCATION '$path'""".stripMargin)
            } else {
              Tables(s, dir, src).select(cols.map(col): _*)
                .write.mode("overwrite")
                .bucketBy(8, key).sortBy(key)
                .option("path", path)
                .format("parquet")
                .saveAsTable(table)
            }
          }
          table
        }
        val li = bucketed("lineitem",
          Seq("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey", "graft_li_b")
        val o = bucketed("orders",
          Seq("o_orderkey", "o_orderpriority"), "o_orderkey", "graft_o_b")
        s.table(li).hint("merge")
          .join(s.table(o), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(cnt.as("n"), revenue.as("rev"))
          .oracleOrder("o_orderpriority")
      }),

    // AQE skew-join: the join-side twin of agg_salted_skew. 75% of lineitem
    // rows are funneled onto one hot key, the dim side is kept un-broadcast
    // (hint merge), and AQE's runtime skew handling splits the hot shuffle
    // partition into advisory-sized chunks (plan-asserted in PlanShapeSpec)
    // — no manual salting of the JOIN needed. The skew thresholds are
    // lowered only while THIS query materializes (eager cache + restore),
    // because test/bench partitions are far below the production 256 MB
    // default; at real scale the defaults fire the same path.
    Q(
      "join_skew_aqe",
      Some("""WITH f AS (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0 ELSE l_orderkey END AS hk,
             |                 l_extendedprice FROM lineitem),
             |d AS (SELECT CASE WHEN o_orderkey % 4 <> 0 THEN 0 ELSE o_orderkey END AS hk,
             |             COUNT(*) AS n_orders FROM orders GROUP BY 1)
             |SELECT CASE WHEN f.hk = 0 THEN 1 ELSE 0 END AS is_hot,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s,
             |  CAST(MAX(d.n_orders) AS BIGINT) AS max_orders
             |FROM f JOIN d ON f.hk = d.hk
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val skewConfs = Seq(
          "spark.sql.adaptive.skewJoin.enabled" -> "true",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB")
        val saved = skewConfs.map { case (k, _) => k -> s.conf.getOption(k) }
        skewConfs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val hotL = when(col("l_orderkey") % 4 =!= 0, lit(0L))
            .otherwise(col("l_orderkey"))
          val hotO = when(col("o_orderkey") % 4 =!= 0, lit(0L))
            .otherwise(col("o_orderkey"))
          // Skew splitting carves a hot reduce partition along MAP-task
          // boundaries — with the whole fact in one cached partition (one
          // mapper) there is nothing to carve, so spread the map side the
          // way a real multi-file fact table already is.
          val f = Tables(s, dir, "lineitem")
            .select(hotL.as("hk"), col("l_extendedprice"))
            .repartition(8)
          // Materialize the dim first: OptimizeSkewedJoin only matches
          // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an aggregation
          // between its own shuffle and the join blocks the rewrite, and a
          // cached relation that PRESERVES hash partitioning on the join
          // key skips the join-side exchange entirely. Round-robin
          // repartition before caching discards that partitioning, so the
          // join inserts fresh ENSURE_REQUIREMENTS shuffles on both sides —
          // the exact shape the skew rule can split.
          val d = Tables(s, dir, "orders")
            .select(hotO.as("hk"))
            .groupBy("hk").agg(cnt.as("n_orders"))
            .repartition(4)
            .cache()
          d.count()
          val out = f.join(d.hint("merge"), "hk")
            .groupBy(when(col("hk") === 0, 1).otherwise(0).as("is_hot"))
            .agg(
              cnt.as("n"),
              dsum(col("l_extendedprice")).as("s"),
              max("n_orders").cast("long").as("max_orders"))
            .oracleOrder("is_hot")
          // Pin the skew-enabled execution in the cache: count() runs the
          // join eagerly while the lowered thresholds are in force, and the
          // returned (lazy) DataFrame re-reads the cached 2-row aggregate
          // instead of repeating the join under restored confs. No rows
          // cross the driver — the result stays distributed.
          out.cache()
          out.count()
          // The materialized InMemoryRelation prints its cached plan — the
          // resolved adaptive plan with the skew split — as an inner child.
          lastSkewPlan = out.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          out
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      }),

    // Runtime bloom-filter pruning (Spark's InjectRuntimeFilter): a
    // selective dim filter (p_size = 1 keeps ~2% of parts) builds a bloom
    // filter of surviving join keys at runtime, and the fact side applies
    // `might_contain` BEFORE its shuffle — at 100 TB this is the difference
    // between shuffling the whole fact table and shuffling the ~2% that can
    // join. Thresholds are lowered only while THIS query materializes
    // (same eager cache+count pinning as the skew demo): the application
    // side's scan must look > 10 GB for the rule to consider it worthwhile,
    // which is exactly true at production scale and false at sf0.1. Both
    // sides scan fresh parquet (not the session cache) because the rule
    // sizes real scans, not InMemoryRelations.
    Q(
      "join_bloom_runtime_filter",
      Some("""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size = 1 GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val confs = Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val fact = s.read.parquet(s"$dir/lineitem.parquet")
            .select("l_partkey", "l_extendedprice")
          val dim = s.read.parquet(s"$dir/part.parquet")
            .filter(col("p_size") === 1)
            .select("p_partkey", "p_brand")
          val out = fact
            .join(dim, col("l_partkey") === col("p_partkey"))
            .groupBy("p_brand")
            .agg(cnt.as("n"), dsum(col("l_extendedprice")).as("revenue"))
            .oracleOrder("p_brand")
          // Pin the bloom-enabled execution in the cache (count() runs the
          // join eagerly under the lowered thresholds; the returned lazy
          // DataFrame re-reads the tiny cached aggregate).
          out.cache()
          out.count()
          lastBloomPlan = out.queryExecution.executedPlan.toString
          out
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
      }),

    // Keyless range join, bucketized: "events within ±5 min of each error"
    // has NO equi key — naively a BroadcastNestedLoopJoin, the O(n·m)
    // scale-killer. The standard fix manufactures the key: bucket time into
    // window-radius cells, probe (b-1, b, b+1) via explode, equi-join on
    // the bucket, filter the exact predicate. Candidate work becomes
    // |probes| × 3 × bucket occupancy instead of |probes| × |events| —
    // the plan that survives 100 TB (PlanShapeSpec asserts no BNLJ /
    // cartesian). LEFT join-back keeps zero-neighbor probes.
    Q(
      "join_range_bucketed",
      Some("""SELECT e.event_id AS err_id, CAST(COUNT(o.event_id) AS BIGINT) AS n_near
             |FROM events e LEFT JOIN events o
             |  ON o.event_id <> e.event_id
             | AND o.ts >= e.ts - INTERVAL 5 MINUTE
             | AND o.ts <= e.ts + INTERVAL 5 MINUTE
             |WHERE e.event_type = 'error' AND e.event_id < 300
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val radiusUs = 5L * 60 * 1000000
        val ev = Tables(s, dir, "events")
          .select(
            col("event_id").as("o_id"), unix_micros(col("ts")).as("o_us"),
            (unix_micros(col("ts")) / radiusUs).cast("long").as("bkt"))
        val err = Tables(s, dir, "events")
          .filter(col("event_type") === "error" && col("event_id") < 300)
          .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("e_us"))
        val probes = err.withColumn(
          "bkt",
          explode(array(Seq(-1, 0, 1).map(
            d => (col("e_us") / radiusUs).cast("long") + d): _*)))
        val near = probes.join(ev, "bkt")
          .filter(
            col("o_id") =!= col("err_id") &&
              abs(col("o_us") - col("e_us")) <= radiusUs)
          .groupBy("err_id")
          .agg(cnt.as("n"))
        err.join(near, Seq("err_id"), "left_outer")
          .select(col("err_id"), coalesce(col("n"), lit(0L)).as("n_near"))
          .oracleOrder("err_id")
      }),

    // Interval-overlap join: lineitems shipped within 90 days of their
    // order's date (equi key + range predicate: no cross product at scale).
    Q(
      "join_interval_overlap",
      Some("""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             |       CAST(COUNT(*) AS BIGINT) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             | AND l_shipdate >= o_orderdate
             | AND l_shipdate < o_orderdate + INTERVAL 90 DAY
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >= col("o_orderdate") &&
              col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAY"))
          .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("month"))
          .agg(cnt.as("n"))
          .oracleOrder("month")),

    // Full outer join — cohort churn: customers who ordered before 1998,
    // after 1998, or in both periods. Full outer is the only join type that
    // keeps BOTH unmatched sides, which is exactly the churn question
    // ("who disappeared, who is new"). Scale shape: both sides are already
    // aggregates keyed on o_custkey, so the outer join shuffles two
    // pre-shrunk per-key tables (one row per customer per side), never the
    // raw fact table — the same sums would cost 2 fact shuffles if joined
    // raw-to-raw first.
    Q(
      "join_full_outer",
      Some("""WITH early AS (
             |  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_early,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev_early
             |  FROM orders WHERE o_orderdate < DATE '1998-01-01' GROUP BY 1),
             |late AS (
             |  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_late,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev_late
             |  FROM orders WHERE o_orderdate >= DATE '1998-01-01' GROUP BY 1)
             |SELECT COALESCE(early.k, late.k) AS custkey,
             |  COALESCE(n_early, 0) AS n_early, COALESCE(n_late, 0) AS n_late,
             |  COALESCE(rev_early, 0e0) AS rev_early, COALESCE(rev_late, 0e0) AS rev_late,
             |  CASE WHEN early.k IS NULL THEN 'new'
             |       WHEN late.k IS NULL THEN 'churned' ELSE 'retained' END AS cohort
             |FROM early FULL JOIN late ON early.k = late.k
             |ORDER BY custkey""".stripMargin),
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val cut = lit("1998-01-01").cast("date")
        def side(pred: org.apache.spark.sql.Column, tag: String) =
          orders.filter(pred).groupBy(col("o_custkey").as(s"k_$tag"))
            .agg(cnt.as(s"n_$tag"), dsum(col("o_totalprice")).as(s"rev_$tag"))
        side(col("o_orderdate") < cut, "early")
          .join(side(col("o_orderdate") >= cut, "late"),
            col("k_early") === col("k_late"), "full_outer")
          .select(
            coalesce(col("k_early"), col("k_late")).as("custkey"),
            coalesce(col("n_early"), lit(0L)).as("n_early"),
            coalesce(col("n_late"), lit(0L)).as("n_late"),
            coalesce(col("rev_early"), lit(0.0)).as("rev_early"),
            coalesce(col("rev_late"), lit(0.0)).as("rev_late"),
            when(col("k_early").isNull, "new")
              .when(col("k_late").isNull, "churned")
              .otherwise("retained").as("cohort"))
          .oracleOrder("custkey")
      }),

    // Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): an optional
    // dimension (JSON prop bucketed, NULL when out of the tracked range)
    // compared across two event halves — the NULL group must pair with the
    // NULL group, which a plain equi-join silently drops. Spark plans `<=>`
    // as a hash-join key (Coalesce+IsNull tuple), so the scale shape is the
    // same single shuffle as the equi case, on aggregates already shrunk to
    // one row per dim.
    Q(
      "join_null_safe_eq",
      Some("""WITH ev AS (
             |  SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) < 80
             |              THEN CAST(CAST(json_extract_string(props, '$.k') AS INT) // 20 AS INT)
             |         END AS dim,
             |         event_id, value FROM events),
             |a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_even,
             |        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_even
             |      FROM ev WHERE event_id % 2 = 0 GROUP BY 1),
             |b AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_odd,
             |        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_odd
             |      FROM ev WHERE event_id % 2 = 1 GROUP BY 1)
             |SELECT a.dim, n_even, n_odd, sum_even, sum_odd
             |FROM a JOIN b ON a.dim IS NOT DISTINCT FROM b.dim
             |ORDER BY a.dim NULLS FIRST""".stripMargin),
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("int")
        val ev = Tables(s, dir, "events")
          .select(
            when(k < 80, (k / 20).cast("int")).as("dim"),
            col("event_id"), col("value"))
        def half(rem: Int, tag: String) =
          ev.filter(col("event_id") % 2 === rem)
            .groupBy(col("dim").as(s"dim_$tag"))
            .agg(cnt.as(s"n_$tag"), dsum(col("value")).as(s"sum_$tag"))
        half(0, "even")
          .join(half(1, "odd"), col("dim_even") <=> col("dim_odd"))
          .select(
            col("dim_even").as("dim"), col("n_even"), col("n_odd"),
            col("sum_even"), col("sum_odd"))
          .oracleOrder("dim")
      }),

    // Dynamic partition pruning — THE partitioned-fact join optimization at
    // 100 TB: the fact table is laid out partitioned on the join key, the
    // dim side carries the selective filter, and the filter's key VALUES
    // are only known at runtime (they come out of the dim scan) — static
    // planning cannot prune, so Spark injects a DynamicPruningExpression
    // into the fact scan's PartitionFilters, reusing the broadcast: only
    // the 2 of 5 priority directories are ever read. The plan pin asserts
    // `dynamicpruning` survives in the scan; a regression here silently
    // reads the whole decade instead of the year. Staged like the other
    // sink ops: orders re-written partitioned by priority into tmp.
    Q(
      "join_dpp_partition_prune",
      Some("""WITH dim AS (
             |  SELECT DISTINCT o_orderpriority AS pri FROM orders
             |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             |SELECT o.o_orderpriority AS pri,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
             |FROM orders o JOIN dim ON o.o_orderpriority = dim.pri
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_dpp_orders_" +
          s"${ProcessHandle.current().pid()}_${Integer.toHexString(dir.hashCode)}"
        dppStaged.getOrElseUpdate(tmp, {
          Tables(s, dir, "orders")
            .withColumn("pri", col("o_orderpriority"))
            .write.mode("overwrite").partitionBy("pri").parquet(tmp)
          tmp
        })
        val fact = s.read.parquet(tmp)
        // Runtime-valued dim: DISTINCT over the fact's own priority column
        // with the selective predicate — the values reach the fact scan
        // only through the broadcast, which is what makes the pruning
        // dynamic rather than static partition elimination.
        val dim = Tables(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(col("o_orderpriority").as("dpri")).distinct()
        fact.join(broadcast(dim), col("pri") === col("dpri"))
          .groupBy(col("pri"))
          .agg(cnt.as("n"), dsum(col("o_totalprice")).as("s"))
          .oracleOrder("pri")
      }),

    // Cost-based join reorder (VERDICT r15 item 7) — the one classic
    // optimizer behavior the registry had no row for. The query text joins
    // FACT-FIRST (orders ⋈ customer, then the 2-of-25-nations filter last);
    // with ANALYZE'd column statistics and spark.sql.cbo.joinReorder on,
    // CostBasedJoinReorder's DP flips it DIMENSION-FIRST (customer ⋈
    // filtered nation ≈ 8% of customers, THEN the fact table) — the order a
    // human would write, recovered from stats alone. At 100 TB the flip is
    // the difference between shuffling the full fact row set through the
    // first join and shuffling 8% of it. CboReorderSpec pins that the
    // optimized join order differs from the syntax-driven one and matches
    // the dimension-first shape. Execution happens eagerly inside the CBO
    // conf scope (localCheckpoint) — the confs never leak session-wide.
    Q(
      "join_cbo_reorder",
      Some("""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
             |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS s
             |FROM orders o
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation nt ON c.c_nationkey = nt.n_nationkey
             |WHERE nt.n_name IN ('NATION_3', 'NATION_7')
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, dir) => {
        val t = cboTables(s, dir)
        withCbo(s) { s.sql(cboSql(t)).localCheckpoint() }
      }))
}
