package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extension operator surface beyond the reference (SURVEY.md §2.8):
  * aggregation, multi-way joins, top-k, window functions, set ops,
  * semi/anti joins, rollup, time-bucketed and session windows, JSON
  * extraction — each with an independent DuckDB oracle.
  *
  * Scale notes are per query; the common rules: aggregate before join
  * where legal, broadcast dimensions, keep money math `round(..., 2)`
  * so cross-engine double summation order can't flip the compare.
  */
object AnalyticsQueries {

  import RefQueries.Fn

  private def t(s: SparkSession, d: String, n: String) = Derived.table(s, d, n)

  /** q22/q28 shared inputs — the two as-of physical strategies must be
    * compared on IDENTICAL frames, so there is exactly one definition.
    */
  private def asofInputs(s: SparkSession, d: String) = {
    val ev = Derived.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("value").as("signup_value"),
        unix_micros(col("ts")).as("signup_us"))
    (purchases, signups)
  }

  private val asofOracleSql =
    """SELECT p.event_id, p.user_id, p.value,
          s.signup_value, s.signup_us
        FROM (SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
             (SELECT user_id, ts, value AS signup_value,
                     epoch_us(ts) AS signup_us
              FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND s.ts <= p.ts"""

  /** Co-purchase pairs from per-order part SETS as ONE shuffle
    * (map-side-combined collect_set + two narrow explodes) — the
    * single edge derivation behind p2/p4 (directed, a≠b) and p3/q40
    * (undirected, a<b), so the four graph queries can never drift
    * onto different edge sets.
    */
  private def copurchasePairs(
      s: SparkSession, d: String, ordered: Boolean) = {
    val base = t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("pks"))
      .select(explode(col("pks")).as("a"), col("pks"))
      .select(col("a"), explode(col("pks")).as("b"))
    if (ordered) base.where(col("a") < col("b"))
    else base.where(col("a") =!= col("b"))
  }

  /** The DISTINCT directed co-purchase edge table as a shared
    * PERSISTED fixture — p2/p4/p5/p6/p9 (and p10 through the hops
    * fixture below) all consume this identical edge set and each
    * re-derived it from lineitem per call (collect_set + double
    * explode + distinct). One derivation serves them all; every
    * query's own graph ALGORITHM (PageRank, BFS, LPA, message
    * passing) stays live and every hash is unchanged (the
    * FixtureStore pattern, round 19). q40, whose OUTPUT is the pair
    * table, keeps the live derivation.
    */
  private def copurchaseEdgesFixture(
      s: SparkSession, d: String): DataFrame =
    s.read.parquet(FixtureStore.dir(
        s"coedges-$d-${FixtureStore.fingerprint(s, d, "lineitem")}") {
      out =>
        copurchasePairs(s, d, ordered = false)
          .select(col("a").as("src"), col("b").as("dst")).distinct()
          .write.mode("overwrite").parquet(out)
    })

  /** The SUPPORT-FILTERED undirected pair table (a < b, co-purchased
    * in ≥ 2 orders, with the order count `w`) — the identical
    * market-basket prune p3/p7/p8 each re-derived per call.
    */
  private def supportedPairsFixture(
      s: SparkSession, d: String): DataFrame =
    s.read.parquet(FixtureStore.dir(
        s"copairs2-$d-${FixtureStore.fingerprint(s, d, "lineitem")}") {
      out =>
        copurchasePairs(s, d, ordered = true)
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
          .write.mode("overwrite").parquet(out)
    })

  /** The Brand#4 multi-source BFS (p5's exact derivation: same
    * copurchase edges, same seeds, same 4-round budget) as a
    * shared PERSISTED fixture — p10's reach profile is a rollup over
    * these hop rows, so one BFS legally serves both queries with both
    * hashes unchanged (the FixtureStore pattern; p5, whose headline
    * OUTPUT is the hop table, keeps its live derivation).
    */
  private def brandReachHopsFixture(
      s: SparkSession, d: String): DataFrame =
    s.read.parquet(FixtureStore.dir(
        s"bfs4-$d-${FixtureStore.fingerprint(s, d, "lineitem")}-" +
          FixtureStore.fingerprint(s, d, "part")) { out =>
      val seeds = t(s, d, "part")
        .filter(col("p_brand") === "Brand#4")
        .select(col("p_partkey").as("node"))
      graft.operators.BfsHops.run(copurchaseEdgesFixture(s, d),
          "src", "dst", seeds, "node",
          rounds = 4, checkpointEvery = 2)
        .write.mode("overwrite").parquet(out)
    })

  val entries: Map[String, (Fn, Option[String])] = Map(

    // Grouped aggregation over the fact table (TPC-H Q1 shape).
    // Map-side partial aggregation → 6-group shuffle; scans only the
    // 6 referenced columns.
    "q1_pricing_summary" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") < lit("1998-01-01"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(
              sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
                * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
          sum(l_quantity) AS sum_qty,
          round(sum(l_extendedprice), 2) AS sum_base_price,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag, l_linestatus""")
    )),

    // Four-way join + aggregation (TPC-H Q5 shape). nation (25 rows,
    // scale-invariant) broadcast by hint; customer UNHINTED — it is
    // fact-proportional (~15M rows at sf100), so AQE broadcasts it
    // from file statistics while it fits and shuffles past that;
    // lineitem⋈orders shuffles on the order key.
    "q2_revenue_by_nation" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n_items")),
      Some("""SELECT n_name,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""")
    )),

    // Top-k by aggregate: group → order → limit (TakeOrderedAndProject,
    // no global sort materialization).
    "q3_top_orders" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10),
      Some("""SELECT l_orderkey,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")
    )),

    // Ranking window: top-3 orders per customer.
    "q4_top_orders_per_customer" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3""")
    )),

    // Running-frame window: cumulative revenue per supplier in
    // ship-date order (deterministic total order → bitwise-stable sums).
    "q5_running_revenue" -> ((
      (s: SparkSession, d: String) => {
        // l_extendedprice tie-break: (orderkey, linenumber) is NOT
        // unique in the synthetic data (sf0.1 has a same-key pair with
        // two prices), and a running sum over a non-total order is
        // engine-arbitrary at the tied rows.
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber",
            "l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "lineitem")
          .withColumn("running_base",
            round(sum("l_extendedprice").over(w), 2))
          .select("l_suppkey", "l_orderkey", "l_linenumber", "running_base")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
          round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
            ROWS UNBOUNDED PRECEDING), 2) AS running_base
        FROM lineitem""")
    )),

    // Exact deduplication of a key pair.
    "q6_distinct_part_supp" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct(),
      Some("SELECT DISTINCT l_partkey, l_suppkey FROM lineitem")
    )),

    // Set difference: parts ordered in bulk but never in small lots.
    "q7_except_parts" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        li.filter(col("l_quantity") >= 45).select("l_partkey")
          .except(li.filter(col("l_quantity") <= 5).select("l_partkey"))
      },
      Some("""SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
        EXCEPT
        SELECT l_partkey FROM lineitem WHERE l_quantity <= 5""")
    )),

    // Set intersection: parts both shipped early and late.
    "q8_intersect_parts" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        li.filter(col("l_shipdate") < lit("1996-01-01")).select("l_partkey")
          .intersect(
            li.filter(col("l_shipdate") >= lit("2000-01-01")).select("l_partkey"))
      },
      Some("""SELECT l_partkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'""")
    )),

    // Left-semi join (EXISTS): customers holding a big order.
    "q9_big_spenders" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer").join(
          t(s, d, "orders").filter(col("o_totalprice") > 200000),
          col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 200000)""")
    )),

    // Left-anti join (NOT EXISTS): customers with no early orders.
    "q10_customers_without_orders" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer").join(
          t(s, d, "orders").filter(col("o_orderdate") < lit("1996-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate < TIMESTAMP '1996-01-01')""")
    )),

    // Hierarchical aggregate: rollup over flag/status.
    "q11_rollup_flag_status" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
          sum(l_quantity) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")
    )),

    // Tumbling time window over the event stream (batch twin of the
    // streaming windowed aggregation).
    // window start exported as epoch-MICROS, not a raw timestamp: raw
    // TIMESTAMP values round-trip differently through driver DuckDB
    // versions (TIMESTAMP_NS vs TIMESTAMP — the q13 incident), so
    // integers are the portable form.
    "q12_hourly_events" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy(
            unix_micros(window(col("ts"), "1 hour").getField("start"))
              .as("wstart_us"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")),
      Some("""SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS wstart_us,
          event_type, count(*) AS n, round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2""")
    )),

    // Sessionization: 30-minute-gap sessions per user via lag +
    // running count (batch twin of session_window / state timeout).
    "q13_user_sessions" -> ((
      (s: SparkSession, d: String) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Derived.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("is_new",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum("is_new").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            // Session bounds as epoch-micros BIGINTs: raw TIMESTAMP values
            // round-trip differently through driver DuckDB versions
            // (TIMESTAMP_NS vs TIMESTAMP), which hash-mismatched two rounds
            // running even with value-identical sessions. Integers are
            // portable; same remedy as q34.
            min(unix_micros(col("ts"))).as("session_start_us"),
            max(unix_micros(col("ts"))).as("session_end_us"))
      },
      // Two portability rules bind here: (1) windows ORDER BY
      // epoch_us(ts), event_id — the same micros-floored key Spark
      // orders by — so sub-microsecond TIMESTAMP_NS payloads can never
      // produce a divergent tie-break; (2) the emitted session_id is a
      // window sum, which DuckDB types HUGEINT — it decays to float64
      // through the driver's pandas fetch and hash-mismatches int64
      // unless cast back to BIGINT.
      Some("""WITH e AS (
          SELECT user_id, event_id, ts,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events),
        m AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM e),
        sess AS (
          SELECT user_id, ts,
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM m)
        SELECT user_id, session_id, count(*) AS n_events,
               min(epoch_us(ts)) AS session_start_us,
               max(epoch_us(ts)) AS session_end_us
        FROM sess GROUP BY user_id, session_id""")
    )),

    // Same gap sessions through Spark's native session_window operator
    // (merging-window aggregation — the same operator Structured
    // Streaming uses for streaming sessionization) instead of q13's
    // lag+running-sum composition. Oracle shares q13's gap-CTE logic,
    // emitting the session bounds rather than ordinals.
    "q32_session_window" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("v_sum"))
          .select(col("user_id"),
            // epoch-micros BIGINT like q13/q34: raw TIMESTAMP outputs
            // are hash-fragile across driver DuckDB versions
            unix_micros(col("session_window.start")).as("session_start_us"),
            col("n_events"), col("v_sum")),
      Some("""WITH e AS (
          SELECT user_id, event_id, value, ts,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
          FROM events),
        m AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM e),
        sess AS (
          SELECT user_id, ts, value,
                 -- event_id tie-break: the running-sum frame must order
                 -- tied timestamps identically to the lag() above, or a
                 -- tied row could land in the neighboring session
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM m)
        SELECT user_id, min(epoch_us(ts)) AS session_start_us,
               count(*) AS n_events, round(sum(value), 2) AS v_sum
        FROM sess GROUP BY user_id, session_id""")
    )),

    // Exact distinct aggregation.
    "q14_users_per_type" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("users"),
            count(lit(1)).as("n")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS users,
          count(*) AS n
        FROM events GROUP BY event_type""")
    )),

    // Sketch-based distinct (HLL++), made ORACLE-CHECKABLE through an
    // accuracy contract: the sketch value itself is engine-specific
    // (register layout/hash — no other engine reproduces it), so the
    // query outputs the EXACT distinct count plus the sketch's relative
    // error bucketed to a 15% band (rsd=0.02, so landing outside band 0
    // would be a >7-sigma sketch failure). DuckDB computes the same
    // contract columns exactly: band 0 is the pinned expectation, and a
    // broken sketch flips the hash — the approximation is now gated,
    // not just rows-counted. SketchAccuracySpec still pins the error
    // bound and shard-union merge identity.
    "q15_approx_users_per_type" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("users"),
            approx_count_distinct(col("user_id"), 0.02).as("__approx"))
          .select(col("event_type"), col("users"),
            // guard users=0 (an all-NULL user_id group): the bare
            // division would yield NULL (non-ANSI div-by-zero) vs the
            // oracle's pinned 0 — an empty sketch has zero error
            when(col("users") > 0,
              floor(abs(col("__approx") - col("users")).cast("double")
                / col("users") / 0.15).cast("long"))
              .otherwise(lit(0L)).as("err_band")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS users,
          CAST(0 AS BIGINT) AS err_band
        FROM events GROUP BY event_type""")
    )),

    // Sketch-based quantiles (KLL-style), oracle-checkable like q15:
    // percentile_approx(accuracy=1000) has rank error ≤ 1/1000, so its
    // p50 estimate must land between the EXACT 45th and 55th
    // percentiles — a boolean both engines compute (DuckDB pins TRUE,
    // Spark derives it from the live sketch). The exact p50 rides
    // along so the row carries real checked values, not just the flag.
    "q26_approx_percentiles" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy("event_type")
          .agg(
            percentile_approx(col("value"), lit(0.5), lit(1000))
              .as("__p50a"),
            expr("percentile(value, 0.45)").as("__lo"),
            expr("percentile(value, 0.55)").as("__hi"),
            round(expr("percentile(value, 0.5)"), 6).as("p50"))
          .select(col("event_type"), col("p50"),
            (col("__p50a") >= col("__lo") && col("__p50a") <= col("__hi"))
              .as("bracketed")),
      Some("""SELECT event_type,
          round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
          TRUE AS bracketed
        FROM events GROUP BY event_type""")
    )),

    // Full cube over two dimensions.
    "q17_cube_status_priority" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")
    )),

    // Sliding window (1h width, 30m slide): each event lands in two
    // overlapping buckets.
    // epoch-micros window starts for the same driver-portability
    // reason as q12
    "q18_sliding_windows" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy(
            unix_micros(
              window(col("ts"), "1 hour", "30 minutes").getField("start"))
              .as("wstart_us"),
            col("event_type"))
          .agg(count(lit(1)).as("n")),
      Some("""SELECT wstart_us, event_type, count(*) AS n FROM (
          SELECT unnest([epoch_us(time_bucket(INTERVAL '1 hour', ts)),
                         epoch_us(time_bucket(INTERVAL '1 hour', ts,
                                              INTERVAL '30 minutes'))])
                 AS wstart_us, event_type
          FROM events) GROUP BY wstart_us, event_type""")
    )),

    // Argument extremes: per user, the event type of the highest- and
    // lowest-valued event. Plain max_by/arg_min tie-break is
    // engine-arbitrary on duplicate values — lexicographic struct
    // extremes make the tie-break (value, event_type) deterministic.
    "q19_user_extremes" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy("user_id")
          .agg(
            max(struct(col("value"), col("event_type")))
              .getField("event_type").as("top_type"),
            min(struct(col("value"), col("event_type")))
              .getField("event_type").as("bottom_type"),
            round(max("value"), 2).as("top_value")),
      Some("""SELECT user_id,
          (max({'value': value, 'event_type': event_type})).event_type AS top_type,
          (min({'value': value, 'event_type': event_type})).event_type AS bottom_type,
          round(max(value), 2) AS top_value
        FROM events GROUP BY user_id""")
    )),

    // Exact interpolated percentiles per event type.
    "q20_value_percentiles" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 6).as("p50"),
            round(expr("percentile(value, 0.95)"), 6).as("p95")),
      Some("""SELECT event_type,
          round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
          round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 6) AS p95
        FROM events GROUP BY event_type""")
    )),

    // As-of join: each purchase matched to the user's latest signup at
    // or before it (union + running-window composition — one shuffle,
    // no range-condition row explosion; DuckDB's native ASOF JOIN is
    // the independent oracle).
    "q22_asof_join" -> ((
      (s: SparkSession, d: String) => {
        val (purchases, signups) = asofInputs(s, d)
        graft.operators.AsOfJoin
          .asofJoin(purchases, signups, "user_id", "ts",
            Seq("signup_value", "signup_us"))
          .select("event_id", "user_id", "value", "signup_value",
            "signup_us")
      },
      Some(asofOracleSql)
    )),

    // Same as-of semantics through the native whole-operator path:
    // AsOfJoinNode logical plan → AsOfJoinStrategy → AsOfJoinExec
    // (one shuffle per side + in-partition merge scan, no union/window
    // machinery). Shares q22's inputs AND its independent DuckDB ASOF
    // oracle — the two physical strategies are compared on identical
    // frames by construction.
    "q28_asof_native" -> ((
      (s: SparkSession, d: String) => {
        val (purchases, signups) = asofInputs(s, d)
        graft.operators.AsOfJoin
          .asofJoinNative(purchases, signups, "user_id", "ts",
            Seq("signup_value", "signup_us"))
          .select("event_id", "user_id", "value", "signup_value",
            "signup_us")
      },
      Some(asofOracleSql)
    )),

    // Self-tuning skew-salted shuffle join: a sampled key histogram
    // picks the bucket count — TPC-H order keys are uniform, so this
    // measures no skew and plans a completely plain equi-join (the
    // dimension-replication cost is only ever paid on MEASURED skew);
    // identical results either way (this oracle). SaltedJoinSpec
    // proves both the balance effect on a synthetically skewed key
    // and that unskewed input takes the plain path.
    "q29_salted_join" -> ((
      (s: SparkSession, d: String) => {
        val joined = graft.operators.SaltedJoin.auto(
          t(s, d, "lineitem"), t(s, d, "orders"),
          "l_orderkey", "o_orderkey",
          saltFrom = Seq("l_linenumber"))
        joined.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority""")
    )),

    // Binned range join: event values against overlapping value bands
    // (stride 7, width 10 → most values match 2 bands). The bin trick
    // turns the BETWEEN theta join (nested-loop, O(|P|·|I|)) into a
    // hash equi-join on bin id + exact re-check; the plain BETWEEN
    // join is the independent oracle.
    "q31_range_join" -> ((
      (s: SparkSession, d: String) => {
        val bands = s.range(14).select(
          col("id").as("band_id"),
          (col("id") * 7.0).as("lo"),
          (col("id") * 7.0 + 10.0).as("hi"))
        graft.operators.RangeJoin
          .pointInInterval(
            Derived.events(s, d).select("event_id", "value"),
            bands, "value", "lo", "hi", binWidth = 10.0)
          .groupBy("band_id")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v_sum"))
      },
      Some("""SELECT band_id, count(*) AS n, round(sum(value), 2) AS v_sum
        FROM events
        JOIN (SELECT i AS band_id, i * 7.0 AS lo, i * 7.0 + 10.0 AS hi
              FROM range(14) t(i)) bands
          ON value >= lo AND value <= hi
        GROUP BY band_id""")
    )),

    // Window-function breadth on the event stream: lead, ntile,
    // percent_rank, cume_dist — one shuffle on user_id, one
    // in-partition sort shared by all four functions.
    "q34_window_functions" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Derived.events(s, d).select(
          col("event_id"), col("user_id"),
          round(lead("value", 1).over(w), 6).as("next_value"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
      },
      Some("""SELECT event_id, user_id,
          round(lead(value, 1) OVER w, 6) AS next_value,
          ntile(4) OVER w AS quartile,
          round(percent_rank() OVER w, 6) AS pct_rank,
          round(cume_dist() OVER w, 6) AS cume
        FROM events
        -- order on epoch_us, not raw ts: the parquet is TIMESTAMP(NANOS)
        -- and Spark's side sorts at micros precision; a nanos-refined
        -- order could break micro-ties differently for these
        -- order-sensitive per-row functions
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""")
    )),

    // Scalar date/string function breadth on orders: truncation, month
    // arithmetic (end-of-month clamping), day diffs, last_day, and
    // levenshtein (the fuzzy-match primitive) — all codegen'd builtins.
    "q35_scalar_functions" -> ((
      (s: SparkSession, d: String) => {
        val od = to_date(col("o_orderdate"))
        t(s, d, "orders").select(
          col("o_orderkey"),
          trunc(od, "month").as("month_start"),
          add_months(od, 1).as("next_month"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")), od)
            .cast("long").as("days_to_end"),
          last_day(od).as("month_end"),
          levenshtein(col("o_orderpriority"), lit("1-URGENT"))
            .cast("long").as("prio_dist"),
          concat_ws("|", upper(substring(col("o_orderstatus"), 1, 1)),
            lpad(col("o_orderkey").cast("string"), 10, "0")).as("tag"))
      },
      Some("""SELECT o_orderkey,
          date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
          CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
          date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
            AS days_to_end,
          last_day(CAST(o_orderdate AS DATE)) AS month_end,
          levenshtein(o_orderpriority, '1-URGENT') AS prio_dist,
          upper(substr(o_orderstatus, 1, 1)) || '|' ||
            lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS tag
        FROM orders""")
    )),

    // SCD2 dimension history: collapse each user's event-type stream
    // into change intervals (valid_from/valid_to, open-ended current
    // row) — the slowly-changing-dimension build the reference's
    // replace-daily metadata job becomes when history must be kept.
    // One shuffle on the key; change detection and interval stitching
    // are lag/lead over the same sort.
    "q36_scd2_history" -> ((
      (s: SparkSession, d: String) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Derived.events(s, d)
          .withColumn("prev_type", lag("event_type", 1).over(byUser))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .withColumn("valid_to",
            lead("ts", 1).over(Window.partitionBy("user_id")
              .orderBy("ts", "event_id")))
          // interval bounds exported as epoch-MICROS (q12/q13 driver
          // portability rationale; null valid_to stays null)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("valid_from_us"),
            unix_micros(col("valid_to")).as("valid_to_us"),
            col("valid_to").isNull.as("is_current"))
      },
      Some("""WITH marked AS (
          SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
          FROM events),
        changes AS (
          SELECT user_id, event_id, event_type, ts FROM marked
          WHERE prev_type IS NULL OR prev_type <> event_type)
        SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
               epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                 AS valid_to_us,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL AS is_current
        FROM changes""")
    )),

    // SCD2 MERGE (apply-changes): close open history rows whose key
    // has a differing change after the cutoff, append the new open
    // version, pass everything else through — MERGE INTO semantics
    // from plain joins (left join on the key + conditional rewrite +
    // union of the appended versions), no table format required.
    // Ordered funnel: view → click → purchase, each stage's timestamp
    // strictly after the previous stage's first occurrence. Three
    // same-key conditional aggregations chained by joins — Catalyst
    // reuses the user_id hash partitioning across the chain, so the
    // funnel costs one logical shuffle of the events, not three.
    // Internal comparisons on epoch micros; integer outputs.
    "q38_funnel" -> ((
      (s: SparkSession, d: String) => {
        val e = Derived.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("t1"))
        val c = e.join(v, Seq("user_id"))
          .filter(col("event_type") === "click" && col("us") > col("t1"))
          .groupBy("user_id").agg(min("us").as("t2"))
        val p = e.join(c, Seq("user_id"))
          .filter(col("event_type") === "purchase" && col("us") > col("t2"))
          .groupBy("user_id").agg(min("us").as("t3"))
        // each side is a single global-aggregate row — broadcast
        // explicitly so the stitch is two BroadcastNestedLoopJoins by
        // construction, not by threshold luck (plan-shape consistency
        // with the rest of the file's small-side joins)
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("n_view_click"))))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("n_full_funnel"))))
      },
      Some("""WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        v AS (SELECT user_id, min(us) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN v USING (user_id)
              WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_view_click,
               (SELECT count(*) FROM p) AS n_full_funnel""")
    )),

    // Cohort retention: users grouped by first-activity week, counted
    // distinct in each subsequent week offset — the retention-matrix
    // aggregation. Weeks are integer epoch-day divisions (no calendar
    // ambiguity across engines); one aggregation for cohorts, one
    // same-key join back, one distinct count.
    "q39_retention_cohorts" -> ((
      (s: SparkSession, d: String) => {
        val e = Derived.events(s, d)
          // `div`, not `/`: Spark's / on longs is DOUBLE division
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000 div 7").as("week"))
        val cohorts = e.groupBy("user_id").agg(min("week").as("cohort_week"))
        e.join(cohorts, Seq("user_id"))
          .withColumn("offset", col("week") - col("cohort_week"))
          .filter(col("offset") <= 3)
          .groupBy("cohort_week", "offset")
          .agg(countDistinct("user_id").as("active_users"))
      },
      Some("""WITH e AS (
          SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS week
          FROM events),
        cohorts AS (
          SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
        SELECT cohort_week, week - cohort_week AS offset,
               count(DISTINCT e.user_id) AS active_users
        FROM e JOIN cohorts USING (user_id)
        WHERE week - cohort_week <= 3
        GROUP BY cohort_week, week - cohort_week""")
    )),

    // Pairwise co-purchase (frequent itemsets at k=2): parts appearing
    // together in an order, counted across orders, top-20. The pair
    // generation is a SELF-JOIN ON THE ORDER KEY (bounded: ~4 lines per
    // order → ~6 pairs), never an unkeyed cross join; one further
    // shuffle aggregates pair counts. The shape Apriori's candidate
    // counting takes on an engine.
    // Multiset set operations: EXCEPT ALL / INTERSECT ALL keep
    // per-row multiplicity (a different physical operator family from
    // q7/q8's distinct set ops — Spark plans these as aggregated
    // count-difference generators, not hash-distinct). Output rolls
    // multiplicities up per key so values (not just membership) are
    // hash-checked.
    "q42_multiset_setops" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val a = li.filter(col("l_quantity") > 30).select("l_partkey")
        val b = li.filter(col("l_discount") > 0.05).select("l_partkey")
        val ex = a.exceptAll(b).groupBy("l_partkey")
          .agg(count(lit(1)).as("multiplicity"))
          .withColumn("op", lit("except_all"))
        val in = a.intersectAll(b).groupBy("l_partkey")
          .agg(count(lit(1)).as("multiplicity"))
          .withColumn("op", lit("intersect_all"))
        ex.unionByName(in).select("op", "l_partkey", "multiplicity")
      },
      Some("""WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity > 30),
          b AS (SELECT l_partkey FROM lineitem WHERE l_discount > 0.05)
        SELECT 'except_all' AS op, l_partkey, count(*) AS multiplicity
        FROM (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b)
        GROUP BY l_partkey
        UNION ALL
        SELECT 'intersect_all' AS op, l_partkey, count(*) AS multiplicity
        FROM (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b)
        GROUP BY l_partkey""")
    )),

    // Correlated LATERAL join: per-customer top-2 orders expressed as
    // a lateral subquery (the SQL-standard correlated form) rather
    // than q4's window+filter — exercises Spark's lateral-join
    // planning (DomainJoin decorrelation). Customers without orders
    // drop out (inner lateral), ties broken by order key.
    "q41_lateral_topk" -> ((
      (s: SparkSession, d: String) => {
        Derived.table(s, d, "customer").createOrReplaceTempView("q41_customer")
        Derived.table(s, d, "orders").createOrReplaceTempView("q41_orders")
        s.sql("""
          SELECT c.c_custkey, o.o_orderkey,
                 round(o.o_totalprice, 2) AS price_r
          FROM q41_customer c,
          LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM q41_orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
          ) o""")
      },
      Some("""SELECT c.c_custkey, o.o_orderkey,
            round(o.o_totalprice, 2) AS price_r
          FROM customer c,
          LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
          ) o""")
    )),

    // Iterative graph centrality: 5 damped PageRank rounds over the
    // co-purchase graph, in exact integer fixed-point (micro-units,
    // integer division everywhere) — bit-identical across engines, so
    // an ITERATIVE operator gets a real value oracle (DuckDB unrolls
    // the same five rounds as CTEs). Each Spark round is one edge⋈rank
    // equi-join + one aggregation with checkpointed lineage — the
    // shape that survives a billion-edge graph.
    "p2_pagerank" -> ((
      (s: SparkSession, d: String) => {
        // shared co-purchase edge derivation (ONE shuffle — see
        // copurchasePairs); same edge set as the self-join formulation
        // the oracle keeps. PageRank.run dedups cross-order repeats.
        val e = copurchaseEdgesFixture(s, d)
        // checkpointEvery=2: adjacent rounds fuse into one job (the
        // broadcast-rate builds share the prior round's shuffle
        // stages), halving per-round driver synchronization — measured
        // ~8% off p2 at sf0.1 AND at the 10× scale point, while
        // checkpointing often enough that plan depth stays bounded
        // (every-5 regressed 13% at 10×: too much un-truncated
        // re-planning per broadcast build).
        graft.operators.PageRank.run(e, "src", "dst", iterations = 5,
            checkpointEvery = 2)
          .select(col("node").as("part"), col("rank"))
      },
      Some {
        val round = (i: Int, prev: String) =>
          s"""c$i AS (
            SELECT e.dst AS node, CAST(sum(r.rank // deg.d) AS BIGINT) AS s
            FROM e JOIN $prev r ON e.src = r.node
                   JOIN deg ON e.src = deg.src
            GROUP BY e.dst),
          r$i AS (
            SELECT n.node,
                   CAST(150000 + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT)
                     AS rank
            FROM nodes n LEFT JOIN c$i ON c$i.node = n.node)"""
        s"""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          e AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
          nodes AS (SELECT DISTINCT src AS node FROM e),
          r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
          ${(1 to 5).map(i => round(i, s"r${i - 1}")).mkString(",\n          ")}
        SELECT node AS part, rank FROM r5"""
      }
    )),

    // GNN-style neighbor aggregation — two rounds of mean message
    // passing over the co-purchase graph (the GraphSAGE-mean /
    // LightGCN propagation step, and what a feature-engineering
    // pipeline ships to a recommender): h₁(v) = mean of neighbors'
    // price features, h₂(v) = mean of neighbors' h₁. Exact integers:
    // features are retailprice CENTS, each mean is sum div degree
    // (operands non-negative, so Spark's truncating div IS floor and
    // matches DuckDB's //). Per round: ONE edge⋈feature equi-join +
    // a map-side-combinable per-dst aggregate — p2's shape, so a
    // billion-edge round is the same two shuffles; features stay
    // node-sized, nothing broadcasts the graph.
    "p9_neighbor_agg" -> ((
      (s: SparkSession, d: String) => {
        // the fixture is written distinct — no re-dedup pass here
        val e = copurchaseEdgesFixture(s, d)
        val cents = t(s, d, "part").select(col("p_partkey").as("node"),
          expr("CAST(floor(p_retailprice * 100D + 0.5D) AS BIGINT)")
            .as("h0"))
        val h0 = e.select(col("src").as("node")).distinct()
          .join(cents, Seq("node"))
        def mp(h: DataFrame, in: String, out: String) =
          e.join(h.select(col("node").as("src"), col(in)), Seq("src"))
            .groupBy(col("dst"))
            .agg(expr(s"CAST(sum($in) div count(1) AS BIGINT)").as(out))
            .select(col("dst").as("node"), col(out))
        val h1 = mp(h0, "h0", "h1")
        val h2 = mp(h1, "h1", "h2")
        h0.join(h1, Seq("node")).join(h2, Seq("node"))
          .select(col("node").as("part"), col("h0"), col("h1"),
            col("h2"))
      },
      Some("""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          e AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          feat AS (
            SELECT p_partkey AS node,
                   CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS h0
            FROM part),
          h0t AS (
            SELECT n.node, f.h0
            FROM (SELECT DISTINCT src AS node FROM e) n
            JOIN feat f ON n.node = f.node),
          h1 AS (
            SELECT e.dst AS node,
                   CAST(sum(h.h0) // count(*) AS BIGINT) AS h1
            FROM e JOIN h0t h ON e.src = h.node GROUP BY 1),
          h2 AS (
            SELECT e.dst AS node,
                   CAST(sum(h.h1) // count(*) AS BIGINT) AS h2
            FROM e JOIN h1 h ON e.src = h.node GROUP BY 1)
        SELECT h0t.node AS part, h0t.h0, h1.h1, h2.h2
        FROM h0t JOIN h1 USING (node) JOIN h2 USING (node)""")
    )),

    // Z-order (Morton) key derivation over (user, hour-of-epoch) — the
    // write-time layout key that makes 2-D box predicates prunable by
    // parquet min/max stats at 100 TB (see operators.ZOrder and
    // examples.LayoutBench for the measured pruning effect). The key is
    // pure bit arithmetic, so the oracle rebuilds it bit by bit and the
    // whole derivation stays inside whole-stage codegen.
    // bits=20 (not the 16-bit default): epoch-hours are ~half a
    // million, and a key that wraps mod 2^16 would alias hours
    // 65,536 apart into one cell — fine for this fixture, a silent
    // layout breaker the first time a data window straddles a wrap
    // boundary. 20 bits covers epoch-hours until 2089.
    "q44_zorder_key" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d).select(col("event_id"),
          col("user_id"),
          expr("unix_micros(ts) div 3600000000").as("epoch_hour"),
          graft.operators.ZOrder
            .zvalue(col("user_id"), expr("unix_micros(ts) div 3600000000"),
              bits = 20)
            .as("z")),
      Some(s"""SELECT event_id, user_id,
          epoch_us(ts) // 3600000000 AS epoch_hour,
          ${graft.operators.ZOrder.zvalueSql(
            "user_id", "epoch_us(ts) // 3600000000", bits = 20)} AS z
        FROM events""")
    )),

    // Incremental (materialized-view) aggregate maintenance
    // (operators.IncrementalAgg): the snapshot side (¾ of orders) is
    // summarized once into a group-cardinality MV, the delta batch
    // (¼) is summarized alone, and the published report is the MERGE
    // of the two summaries — history is never rescanned. The oracle
    // is the full recompute over ALL orders, so the hash pins the
    // algebra merge(partial(A), partial(B)) == partial(A ∪ B)
    // cross-engine. Money is quantized to integer cents BEFORE
    // summing (floor(x·100 + 0.5) — identical IEEE steps in both
    // engines) so the sum is associative and the merge law is exact,
    // not approximate. avg is derived by integer division at the end.
    "q45_incremental_agg" -> ((
      (s: SparkSession, d: String) => {
        import graft.operators.IncrementalAgg
        val keys = Seq("o_orderstatus", "o_orderpriority")
        val o = t(s, d, "orders").select(
          col("o_orderstatus"), col("o_orderpriority"),
          expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)")
            .as("cents"),
          col("o_orderkey"))
        val snapshot = o.filter(pmod(col("o_orderkey"), lit(4)) =!= 0)
        val delta = o.filter(pmod(col("o_orderkey"), lit(4)) === 0)
        val mv = IncrementalAgg.partial(snapshot, keys, "cents")
        IncrementalAgg
          .merge(Seq(mv, IncrementalAgg.partial(delta, keys, "cents")), keys)
          .select(col("o_orderstatus"), col("o_orderpriority"),
            col("cnt"), col("sum_v").as("sum_cents"),
            col("min_v").as("min_cents"), col("max_v").as("max_cents"),
            expr("sum_v div cnt").as("avg_cents"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
            CAST(count(*) AS BIGINT) AS cnt,
            CAST(sum(cents) AS BIGINT) AS sum_cents,
            CAST(min(cents) AS BIGINT) AS min_cents,
            CAST(max(cents) AS BIGINT) AS max_cents,
            CAST(sum(cents) // count(*) AS BIGINT) AS avg_cents
          FROM (SELECT o_orderstatus, o_orderpriority,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                FROM orders)
          GROUP BY 1, 2""")
    )),

    // Incremental DISTINCT-count maintenance: q45's story for the one
    // aggregate that has no exact mergeable state — n_distinct over
    // history can only be maintained by a mergeable SKETCH. Per-batch
    // Datasketches HLL sketches (hll_sketch_agg, lgK=12 ≈ 1.6% rsd)
    // are built for the snapshot and the delta separately, merged with
    // hll_union_agg (the associative MV-update step — history never
    // rescanned), and the merged estimate is contract-checked against
    // the exact distinct over everything: err_band =
    // floor(relative_error / 0.10) is 0 for every group unless the
    // MERGED sketch drifts past 10% (≈6σ for lgK=12) — the oracle pins
    // 0, so a broken union (wrong lgK, re-counted overlap, dropped
    // registers) flips the hash. The exact count rides along as the
    // checked value. At 100 TB the per-group state is 4 KB regardless
    // of user cardinality, and merge cost is group-cardinality, not
    // history.
    "q46_incremental_distinct" -> ((
      (s: SparkSession, d: String) => {
        val ev = Derived.events(s, d)
          .select(col("event_type"), col("user_id"), col("event_id"))
        val snapshot = ev.filter(pmod(col("event_id"), lit(4)) =!= 0)
        val delta = ev.filter(pmod(col("event_id"), lit(4)) === 0)
        def sketch(batch: DataFrame) = batch.groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        val merged = sketch(snapshot).unionByName(sketch(delta))
          .groupBy("event_type")
          .agg(hll_union_agg(col("sk")).as("sk"))
          .select(col("event_type"),
            hll_sketch_estimate(col("sk")).as("__est"))
        ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("users"))
          .join(merged, Seq("event_type"))
          .select(col("event_type"), col("users"),
            when(col("users") > 0,
              floor(abs(col("__est") - col("users")).cast("double")
                / col("users") / 0.10).cast("long"))
              .otherwise(lit(0L)).as("err_band"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS users,
            CAST(0 AS BIGINT) AS err_band
          FROM events GROUP BY event_type""")
    )),

    // MV CHANGESET (CDC emission): the downstream half of incremental
    // maintenance — after an update cycle, publish WHAT CHANGED in the
    // summary table as an insert/update/delete row stream (the feed a
    // downstream cache, search index, or reverse-ETL consumer applies).
    // Old state = the snapshot summary; new state = the summary after
    // rows arrived (delta) AND rows were retired (the %7 retirement
    // slice), so all three verbs genuinely occur. The diff is one
    // full-outer join of two group-cardinality summaries on the group
    // key — never a fact-table join; unchanged groups are filtered
    // out so the changeset is proportional to churn, not to the MV.
    // Key includes a customer bucket (~thousands of groups) so I/U/D
    // all appear at test scale.
    "q47_mv_changeset" -> ((
      (s: SparkSession, d: String) => {
        import graft.operators.IncrementalAgg
        val keys = Seq("o_orderstatus", "cust_bucket")
        val o = t(s, d, "orders").select(
          col("o_orderstatus"),
          pmod(col("o_custkey"), lit(1000)).as("cust_bucket"),
          expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)")
            .as("cents"),
          col("o_orderkey"))
        val oldMv = IncrementalAgg.partial(
          o.filter(pmod(col("o_orderkey"), lit(4)) =!= 0), keys, "cents")
        val newMv = IncrementalAgg.partial(
          o.filter(pmod(col("o_orderkey"), lit(7)) =!= 0), keys, "cents")
        oldMv.as("o").join(newMv.as("n"),
          col("o.o_orderstatus") === col("n.o_orderstatus")
            && col("o.cust_bucket") === col("n.cust_bucket"), "full_outer")
          .select(
            coalesce(col("o.o_orderstatus"), col("n.o_orderstatus"))
              .as("o_orderstatus"),
            coalesce(col("o.cust_bucket"), col("n.cust_bucket"))
              .as("cust_bucket"),
            when(col("o.cnt").isNull, "I")
              .when(col("n.cnt").isNull, "D")
              .when(col("o.cnt") =!= col("n.cnt")
                || col("o.sum_v") =!= col("n.sum_v")
                || col("o.min_v") =!= col("n.min_v")
                || col("o.max_v") =!= col("n.max_v"), "U")
              .otherwise("=").as("op"),
            col("n.cnt").as("cnt"), col("n.sum_v").as("sum_cents"))
          .filter(col("op") =!= "=")
      },
      Some("""WITH o AS (
            SELECT o_orderstatus, o_custkey % 1000 AS cust_bucket,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                   o_orderkey
            FROM orders),
          oldmv AS (
            SELECT o_orderstatus, cust_bucket, count(*) AS cnt,
                   CAST(sum(cents) AS BIGINT) AS sum_v,
                   min(cents) AS min_v, max(cents) AS max_v
            FROM o WHERE o_orderkey % 4 <> 0 GROUP BY 1, 2),
          newmv AS (
            SELECT o_orderstatus, cust_bucket, count(*) AS cnt,
                   CAST(sum(cents) AS BIGINT) AS sum_v,
                   min(cents) AS min_v, max(cents) AS max_v
            FROM o WHERE o_orderkey % 7 <> 0 GROUP BY 1, 2)
        SELECT * FROM (
          SELECT coalesce(a.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
                 coalesce(a.cust_bucket, b.cust_bucket) AS cust_bucket,
                 CASE WHEN a.cnt IS NULL THEN 'I'
                      WHEN b.cnt IS NULL THEN 'D'
                      WHEN a.cnt <> b.cnt OR a.sum_v <> b.sum_v
                        OR a.min_v <> b.min_v OR a.max_v <> b.max_v THEN 'U'
                      ELSE '=' END AS op,
                 b.cnt AS cnt, b.sum_v AS sum_cents
          FROM oldmv a FULL OUTER JOIN newmv b
            ON a.o_orderstatus = b.o_orderstatus
           AND a.cust_bucket = b.cust_bucket)
        WHERE op <> '='""")
    )),

    // Incremental JOIN-view maintenance (operators.IncrementalJoin):
    // the fact (orders) and the dimension (customer) BOTH receive a
    // delta batch, and the maintained enriched view is
    // V_old ∪ (ΔA ⨝ B_new) ∪ (A_old ⨝ ΔB) — the delta-rule partition
    // that never re-joins the two histories. The oracle is the plain
    // full join of the complete tables, so the hash pins
    // delta-maintained ≡ full-recompute cross-engine (a double-counted
    // ΔA⨝ΔB term, or a missed one, changes the row multiset and flips
    // the hash). At 100 TB: V_old is the stored materialization
    // (append-only), each maintenance term broadcasts its delta into
    // the one big-table scan, and history ⨝ history never runs.
    "q48_incremental_join" -> ((
      (s: SparkSession, d: String) => {
        import graft.operators.IncrementalJoin
        val a = t(s, d, "orders").select(
          col("o_custkey").as("custkey"), col("o_orderkey"),
          col("o_orderstatus"))
        val b = t(s, d, "customer").select(
          col("c_custkey").as("custkey"), col("c_mktsegment"))
        val (aOld, aDelta) = (a.filter(pmod(col("o_orderkey"), lit(4)) =!= 0),
          a.filter(pmod(col("o_orderkey"), lit(4)) === 0))
        val (bOld, bDelta) = (b.filter(pmod(col("custkey"), lit(5)) =!= 0),
          b.filter(pmod(col("custkey"), lit(5)) === 0))
        // Stand-in for the stored materialization: at scale this is a
        // parquet read of the MV table, not a recompute.
        val vOld = aOld.join(bOld, Seq("custkey"))
        IncrementalJoin.view(vOld, aOld, aDelta, bOld, bDelta,
            Seq("custkey"))
          .select(col("custkey"), col("o_orderkey"), col("o_orderstatus"),
            col("c_mktsegment"))
      },
      Some("""SELECT c.c_custkey AS custkey, o.o_orderkey,
            o.o_orderstatus, c.c_mktsegment
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")
    )),

    // Time-series RESAMPLING: regularize each event_type's stream onto
    // a dense 10-minute grid — the missing-bin repair every downstream
    // window/forecast/anomaly job assumes has already happened. The
    // spine is sequence(min_bin, max_bin) per series (explode of a
    // group-cardinality aggregate — spine size is TIME-SPAN bounded,
    // independent of fact cardinality, so at 100 TB it is still
    // types × bins rows); observed bins left-join onto it, and gaps
    // take the last observed sum via LOCF. The carry-forward uses the
    // portable two-window trick — grp = running count of non-null
    // observations, fill = max over (series, grp) — pure ANSI in both
    // engines, no IGNORE NULLS (Spark and DuckDB disagree on that
    // syntax). Window partitions are one series' bins: span-bounded,
    // never data-bounded. 10-minute bins (not hourly) so the gate-scale
    // corpus genuinely exercises the gap path (~60% of bins empty at
    // sf0.01; hourly would be dense and test nothing).
    "q49_gap_fill" -> ((
      (s: SparkSession, d: String) => {
        val binned = Derived.events(s, d).select(
          col("event_type"),
          expr("unix_micros(ts) div 600000000").as("bin"),
          expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)").as("cents"))
        val observed = binned.groupBy("event_type", "bin")
          .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("cnt"))
        val spine = observed.groupBy("event_type")
          .agg(min(col("bin")).as("b0"), max(col("bin")).as("b1"))
          .select(col("event_type"),
            explode(sequence(col("b0"), col("b1"))).as("bin"))
        val wRun = Window.partitionBy("event_type").orderBy("bin")
        val joined = spine.join(observed, Seq("event_type", "bin"), "left")
          .withColumn("grp", count(col("sum_cents")).over(wRun))
        val wGrp = Window.partitionBy("event_type", "grp")
        joined.select(col("event_type"), col("bin"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          max(col("sum_cents")).over(wGrp).as("filled_sum_cents"),
          col("sum_cents").isNull.as("is_gap"))
      },
      Some("""WITH observed AS (
            SELECT event_type, epoch_us(ts) // 600000000 AS bin,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS sum_cents,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2),
          spine AS (
            SELECT event_type, unnest(generate_series(b0, b1)) AS bin
            FROM (SELECT event_type, min(bin) AS b0, max(bin) AS b1
                  FROM observed GROUP BY 1)),
          j AS (
            SELECT s.event_type, s.bin, o.sum_cents,
                   coalesce(o.cnt, 0) AS cnt
            FROM spine s LEFT JOIN observed o
              ON s.event_type = o.event_type AND s.bin = o.bin),
          g AS (
            SELECT *, count(sum_cents) OVER (PARTITION BY event_type
                        ORDER BY bin) AS grp
            FROM j)
        SELECT event_type, bin, CAST(cnt AS BIGINT) AS cnt,
               CAST(max(sum_cents) OVER (PARTITION BY event_type, grp)
                 AS BIGINT) AS filled_sum_cents,
               (sum_cents IS NULL) AS is_gap
        FROM g""")
    )),

    // Data-quality AUDIT (the dbt-test / Deequ expectation-check
    // shape): declared rules — key uniqueness, referential integrity,
    // accepted ranges, freshness, not-null — each reduced to one
    // (rule, total, violations, pass) row. Every rule is a map-side-
    // combinable conditional aggregate: one scan per fact table
    // produces ALL its rules via stack() over a single-row aggregate
    // (no per-rule rescans), RI is a broadcast left join + null count
    // (never an anti-join recount of the same scan). Rules are chosen
    // so the live corpus exercises BOTH verdicts (freshness and the
    // events range genuinely fail; uniqueness/RI/not-null pass) — an
    // audit that can only say "pass" tests nothing. At 100 TB the
    // output is rule-cardinality rows from one pass over each table.
    "q50_dq_audit" -> ((
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val li = t(s, d, "lineitem")
        val ev = Derived.events(s, d)
        val docs = t(s, d, "documents")
        val r1 = o.agg(count(lit(1)).as("total"),
            (count(lit(1)) - countDistinct(col("o_orderkey")))
              .as("violations"))
          .select(lit("orders_orderkey_unique").as("rule"),
            col("total"), col("violations"))
        val r2 = o.select(col("o_custkey"))
          // UNHINTED: customer is fact-proportional — AQE sizes it
          .join(c.select(col("c_custkey").as("o_custkey"),
            lit(1).as("__hit")), Seq("o_custkey"), "left")
          .agg(count(lit(1)).as("total"),
            sum(when(col("__hit").isNull, 1L).otherwise(0L))
              .as("violations"))
          .select(lit("orders_custkey_ref_customer").as("rule"),
            col("total"), col("violations"))
        val r34 = li.agg(count(lit(1)).as("total"),
            sum(when(col("l_quantity").isNull
              || col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
              .otherwise(0L)).as("v_qty"),
            sum(when(col("l_shipdate")
              >= lit("1999-01-01").cast("timestamp"), 1L)
              .otherwise(0L)).as("v_fresh"))
          .select(col("total"), expr(
            """stack(2, 'lineitem_quantity_range', v_qty,
               'lineitem_shipdate_fresh', v_fresh) AS (rule, violations)"""))
          .select(col("rule"), col("total"), col("violations"))
        val r5 = ev.agg(count(lit(1)).as("total"),
            sum(when(col("value").isNull
              || col("value") < 0 || col("value") > 250, 1L)
              .otherwise(0L)).as("violations"))
          .select(lit("events_value_range").as("rule"),
            col("total"), col("violations"))
        val r6 = docs.agg(count(lit(1)).as("total"),
            sum(when(col("text").isNull, 1L).otherwise(0L))
              .as("violations"))
          .select(lit("documents_text_not_null").as("rule"),
            col("total"), col("violations"))
        Seq(r1, r2, r34, r5, r6).reduce(_.unionByName(_))
          .select(col("rule"), col("total"), col("violations"),
            (col("violations") === 0L).as("pass"))
      },
      Some("""WITH r1 AS (
            SELECT 'orders_orderkey_unique' AS rule,
                   count(*) AS total,
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                     AS violations
            FROM orders),
          r2 AS (
            SELECT 'orders_custkey_ref_customer' AS rule,
                   count(*) AS total,
                   CAST(sum(CASE WHEN c.c_custkey IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS violations
            FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey),
          li AS (
            SELECT count(*) AS total,
                   CAST(sum(CASE WHEN l_quantity IS NULL
                     OR l_quantity < 1 OR l_quantity > 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
                   CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1999-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT) AS v_fresh
            FROM lineitem),
          r34 AS (
            SELECT 'lineitem_quantity_range' AS rule, total,
                   v_qty AS violations FROM li
            UNION ALL
            SELECT 'lineitem_shipdate_fresh' AS rule, total,
                   v_fresh AS violations FROM li),
          r5 AS (
            SELECT 'events_value_range' AS rule, count(*) AS total,
                   CAST(sum(CASE WHEN value IS NULL
                     OR value < 0 OR value > 250
                     THEN 1 ELSE 0 END) AS BIGINT) AS violations
            FROM events),
          r6 AS (
            SELECT 'documents_text_not_null' AS rule, count(*) AS total,
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS violations
            FROM documents)
        SELECT rule, total, violations, (violations = 0) AS pass
        FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
              UNION ALL SELECT * FROM r34 UNION ALL SELECT * FROM r5
              UNION ALL SELECT * FROM r6)""")
    )),

    // Distinct-set ALGEBRA via theta sketches: the question
    // countDistinct can never answer compositionally — "how much does
    // audience A overlap audience B" — needs a sketch family closed
    // under INTERSECTION, which HLL (q15/q46) is not. Elements are
    // (user, active-day) pairs packed into one BIGINT (plain user_id
    // would be vacuous here: every user touches every event type, and
    // at 150 users the sketch never leaves exact mode). Per-type theta
    // sketches intersect with the purchase sketch (a 1-row broadcast
    // cross join, the established scalar pattern); the exact overlap
    // rides along via a distinct + semi-join count, and err bands
    // pin both estimates within 10% — the oracle pins 0, so a broken
    // intersection flips the hash. Accuracy contract, q15/q46 family.
    // At 100 TB: sketches are KB-sized per group regardless of
    // cardinality, and set algebra on them is driver-cheap — the exact
    // companion (distinct + semi-join) is the thing this replaces.
    "q51_audience_overlap" -> ((
      (s: SparkSession, d: String) => {
        val e = Derived.events(s, d).select(col("event_type"),
          (col("user_id") * 100000L
            + expr("unix_micros(ts) div 86400000000")).as("combo"))
        val dTyped = e.distinct()
        val pCombos = dTyped.filter(col("event_type") === "purchase")
          .select(col("combo"))
        val exact = dTyped
          .join(pCombos.withColumn("__hit", lit(1)).distinct(),
            Seq("combo"), "left")
          .groupBy("event_type")
          .agg(count(lit(1)).as("combos"),
            sum(when(col("__hit").isNotNull, 1L).otherwise(0L))
              .as("overlap"))
        val sk = e.groupBy("event_type")
          .agg(theta_sketch_agg(col("combo"), 12).as("sk"))
        val pSk = e.filter(col("event_type") === "purchase")
          .agg(theta_sketch_agg(col("combo"), 12).as("psk"))
        exact.join(sk, Seq("event_type"))
          .crossJoin(broadcast(pSk))
          .select(col("event_type"), col("combos"), col("overlap"),
            when(col("combos") > 0,
              floor(abs(theta_sketch_estimate(col("sk"))
                - col("combos")) / col("combos") / 0.10).cast("long"))
              .otherwise(0L).as("err_combos"),
            when(col("overlap") > 0,
              floor(abs(theta_sketch_estimate(
                  theta_intersection(col("sk"), col("psk")))
                - col("overlap")) / col("overlap") / 0.10).cast("long"))
              .otherwise(0L).as("err_overlap"))
      },
      Some("""WITH e AS (
            SELECT DISTINCT event_type,
                   user_id * 100000 + epoch_us(ts) // 86400000000 AS combo
            FROM events),
          p AS (SELECT combo FROM e WHERE event_type = 'purchase')
        SELECT e.event_type, count(*) AS combos,
               CAST(sum(CASE WHEN p.combo IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS overlap,
               CAST(0 AS BIGINT) AS err_combos,
               CAST(0 AS BIGINT) AS err_overlap
        FROM e LEFT JOIN p ON e.combo = p.combo
        GROUP BY 1""")
    )),

    // Period-over-period reporting: monthly revenue per order status
    // with the previous month's value, absolute delta, and percent
    // change — the month-over-month movement every finance/BI layer
    // derives from a fact table. Exact integers end to end: revenue
    // in cents (q45's quantizer), pct change in basis points via
    // (cur − prev)·10000 div prev — prev is always positive here so
    // truncating `div` (Spark) and flooring `//` (DuckDB) cannot
    // disagree... except when cur < prev makes the numerator
    // negative, so BOTH engines compute the SAME floor explicitly:
    // the numerator is scaled and divided as
    // floor(x·10000 / prev) via floating floor on exact-in-double
    // integers (both < 2^53 — one correctly-rounded divide, one
    // floor, bit-identical). Scale shape: one month-grain aggregate
    // (map-side combined), one lag window partitioned by status over
    // month-cardinality rows.
    "q59_mom_revenue" -> ((
      (s: SparkSession, d: String) => {
        val m = t(s, d, "orders")
          .groupBy(col("o_orderstatus"),
            trunc(to_date(col("o_orderdate")), "month").as("month"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)"))
            .as("rev_cents"))
        val w = Window.partitionBy("o_orderstatus").orderBy("month")
        m.withColumn("prev_cents", lag("rev_cents", 1).over(w))
          .select(col("o_orderstatus"), col("month"),
            col("rev_cents"), col("prev_cents"),
            (col("rev_cents") - col("prev_cents")).as("delta_cents"),
            when(col("prev_cents").isNotNull,
              floor((col("rev_cents") - col("prev_cents"))
                * lit(10000.0) / col("prev_cents")).cast("long"))
              .as("pct_change_bps"))
      },
      Some("""WITH m AS (
            SELECT o_orderstatus,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS rev_cents
            FROM orders GROUP BY 1, 2)
        SELECT o_orderstatus, month, rev_cents,
               lag(rev_cents) OVER w AS prev_cents,
               rev_cents - lag(rev_cents) OVER w AS delta_cents,
               CAST(floor((rev_cents - lag(rev_cents) OVER w) * 10000.0
                 / lag(rev_cents) OVER w) AS BIGINT) AS pct_change_bps
        FROM m
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY month)""")
    )),

    // Count-of-counts distribution (TPC-H Q13 shape): how many
    // customers placed exactly N orders — INCLUDING the zero-order
    // customers, which is what forces the left-outer retention (an
    // inner two-level aggregate silently loses the most interesting
    // bucket). Two aggregations: per-customer order count (the join
    // shuffles on custkey), then the count histogram (bucket
    // cardinality = max orders per customer — tiny). The classic
    // shape behind every "engagement distribution" report.
    "q60_custdist" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "customer").select(col("c_custkey"))
          .join(t(s, d, "orders")
            .select(col("o_custkey"), col("o_orderkey")),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist")),
      Some("""SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
        GROUP BY c_count""")
    )),

    // Rich-but-lapsed customers by nation (TPC-H Q22 shape): the
    // above-average positive balances with NO RECENT orders (none
    // since 1999-01-01 — in this corpus every customer has SOME
    // order, so a bare no-orders predicate is vacuous; the recency
    // cutoff keeps the anti-join live at every sf) — the anti-join
    // workhorse behind every "high-value churn risk" report. The
    // threshold compare is CROSS-MULTIPLIED exact integers
    // (cents·n > Σcents — the t28 rule): a float average would make
    // threshold-edge customers engine-dependent. Plan: one
    // customer-dim aggregate broadcast as a scalar, the big orders
    // side date-filtered AT THE SCAN then a shuffled LEFT ANTI join
    // on custkey (at 100 TB neither side broadcasts — the anti join
    // shuffles both on the key, the correct shape), then a
    // nation-cardinality aggregate.
    "q61_rich_inactive_customers" -> ((
      (s: SparkSession, d: String) => {
        val pos = t(s, d, "customer")
          .filter(col("c_acctbal") > 0)
          .select(col("c_custkey"), col("c_nationkey"),
            expr("CAST(floor(c_acctbal * 100D + 0.5D) AS BIGINT)")
              .as("cents"))
        val thr = pos.agg(sum("cents").as("s_cents"),
          count(lit(1)).as("n_pos"))
        pos.crossJoin(broadcast(thr))
          .filter(col("cents") * col("n_pos") > col("s_cents"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1999-01-01"))
            .select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_cust"), sum("cents").as("total_cents"))
      },
      Some("""WITH pos AS (
            SELECT c_custkey, c_nationkey,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
            FROM customer WHERE c_acctbal > 0),
          thr AS (SELECT sum(cents) AS s_cents, count(*) AS n_pos
                  FROM pos),
          rich AS (SELECT p.* FROM pos p, thr
                   WHERE p.cents * thr.n_pos > thr.s_cents)
        SELECT c_nationkey, count(*) AS n_cust,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM rich r
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = r.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY 1""")
    )),

    // Top supplier(s) by quarterly revenue (TPC-H Q15 shape): the
    // "view + max + join back" pattern — revenue per supplier over a
    // ship-date quarter, then EVERY supplier achieving the maximum
    // (ties must all surface, which is why this is not a LIMIT 1).
    // Revenue is per-row quantized to cents BEFORE the sum (q45's
    // exact-quantizer rule) so the max compare is integer-exact.
    // Plan: the date filter pushes into the lineitem scan, one
    // map-side-combinable supplier-keyed aggregate, the max a
    // broadcast single-row scalar, the supplier dim a broadcast join.
    "q62_top_suppliers" -> ((
      (s: SparkSession, d: String) => {
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1996-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(sum(expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
            " * 100D + 0.5D) AS BIGINT)")).as("rev_cents"))
        val mx = rev.agg(max("rev_cents").as("max_cents"))
        rev.crossJoin(broadcast(mx))
          .filter(col("rev_cents") === col("max_cents"))
          // UNHINTED: supplier grows with the data; the max-filtered
          // probe side is tiny, so AQE broadcasts whichever side fits
          .join(t(s, d, "supplier")
            .select(col("s_suppkey").as("l_suppkey"), col("s_name")),
            Seq("l_suppkey"))
          .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
            col("rev_cents"))
      },
      Some("""WITH rev AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                     * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY 1)
        SELECT r.l_suppkey AS s_suppkey, s.s_name, r.rev_cents
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)""")
    )),

    // Cross-nation trade volume (TPC-H Q7 shape) — the classic
    // multi-join STAR the rest of the q-family doesn't exercise: the
    // fact table joins orders on the order key (a BIG-BIG shuffle
    // join — both sides hash-partition on l_orderkey/o_orderkey, the
    // shape that dominates warehouse wall-clock at 100 TB), then two
    // nation legs (supplier via l_suppkey, customer via o_custkey).
    // The dim joins carry NO broadcast hint deliberately: supplier
    // and customer both grow with SF (they are not true constants
    // like nation/region), so at bench scale AQE converts them to
    // broadcasts and at 100 TB they correctly become shuffled
    // equi-joins — the plan degrades by size, not by hardcode.
    // Per-row cent quantization keeps the revenue sums exact.
    "q63_nation_trade_volume" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .select(col("l_orderkey"), col("l_suppkey"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)").as("rc"),
            year(col("l_shipdate")).cast("long").as("l_year"))
        val ord = t(s, d, "orders").select(col("o_orderkey"),
          col("o_custkey"))
        val supp = t(s, d, "supplier").select(col("s_suppkey"),
          col("s_nationkey").as("supp_nation"))
        val cust = t(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey").as("cust_nation"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(count(lit(1)).as("n_items"), sum("rc").as("rev_cents"))
      },
      Some("""SELECT s_nationkey AS supp_nation,
               c_nationkey AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               count(*) AS n_items,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND s_nationkey <> c_nationkey
        GROUP BY 1, 2, 3""")
    )),

    // Shipping-priority top-10 (TPC-H Q3 shape): revenue of orders
    // from one market segment, ordered before the cutoff but shipped
    // after it — the "filtered star + distributed top-k" classic.
    // Both date filters push into their scans; the segment filter
    // prunes customers BEFORE the join; orders⋈lineitem is the
    // big-big orderkey shuffle join (q63's shape); and the top-10
    // compiles to TakeOrderedAndProject — per-partition heaps merged
    // on the driver, never a global sort. Ties (same revenue, date)
    // break on the order key, so the cut is total and engine-exact;
    // per-row cent quantization keeps revenue sums integer.
    "q64_shipping_priority" -> ((
      (s: SparkSession, d: String) => {
        val cutoff = "1997-01-01"
        val cust = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < lit(cutoff))
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate"), col("o_orderpriority"))
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit(cutoff))
          .select(col("l_orderkey"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)").as("rc"))
        ord.join(cust, col("o_custkey") === col("c_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
          .agg(sum("rc").as("rev_cents"))
          .select(col("o_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp"))
              .as("o_orderdate_us"),
            col("o_orderpriority"), col("rev_cents"))
          .orderBy(col("rev_cents").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
               o_orderpriority,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3
        ORDER BY rev_cents DESC, o_orderkey
        LIMIT 10""")
    )),

    // Large-volume orders (TPC-H Q18 shape): orders whose TOTAL line
    // quantity clears a threshold, rejoined to their customer — the
    // "aggregate → HAVING → rejoin" plan the other q's don't exercise.
    // The qualifying-keys set derives from ONE map-side-combinable
    // quantity aggregate and then SEMI-join-gates the orders side
    // (never a second scan of lineitem); the customer leg is an
    // un-hinted equi-join (grows with SF — AQE broadcasts at bench
    // scale, shuffles at 100 TB). Quantities quantized ×100 per row
    // so the threshold compare is integer-exact.
    "q65_large_orders" -> ((
      (s: SparkSession, d: String) => {
        val qty = t(s, d, "lineitem")
          .select(col("l_orderkey"),
            expr("CAST(floor(l_quantity * 100D + 0.5D) AS BIGINT)")
              .as("qc"))
          .groupBy("l_orderkey")
          .agg(sum("qc").as("qty_c"))
          .filter(col("qty_c") > 25000L)
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)")
              .as("price_c"))
          .join(qty, col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_name")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("o_orderkey"), col("price_c"),
            col("qty_c"))
      },
      Some("""WITH qty AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS qty_c
            FROM lineitem GROUP BY 1
            HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
              > 25000)
        SELECT c_name, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
               qty_c
        FROM orders
        JOIN qty ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey""")
    )),

    // Promotion revenue share per month (TPC-H Q14 shape): the
    // conditional-aggregate-over-join ratio — what fraction of each
    // month's revenue came from PROMO parts. The part leg is an
    // un-hinted equi-join on partkey (grows with SF — AQE broadcasts
    // here, shuffles at 100 TB); both sums come out of ONE aggregate
    // over the joined rows (a second pass for the numerator would
    // re-shuffle the fact table); the share is exact ppm integer
    // division over per-row-quantized cents, through the ExactMath
    // branch — promo_cents is a corpus-level cent sum, exactly the
    // numerator class that overflows multiply-first int64 in the
    // 100 TB regime (identical below 9e12, so bundled hashes hold).
    "q66_promo_share" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"),
            date_format(col("l_shipdate"), "yyyy-MM").as("month"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)").as("rc"))
        val part = t(s, d, "part")
          .select(col("p_partkey"), (col("p_type") === "PROMO").as("promo"))
        li.join(part, col("l_partkey") === col("p_partkey"))
          .groupBy("month")
          .agg(sum(when(col("promo"), col("rc")).otherwise(0L))
            .as("promo_cents"),
            sum("rc").as("total_cents"))
          .select(col("month"), col("promo_cents"), col("total_cents"),
            expr(graft.queries.ExactMath
              .ppmExpr("promo_cents", "total_cents"))
              .as("promo_share_ppm"))
      },
      Some(s"""SELECT month, promo_cents, total_cents,
               CAST(${graft.queries.ExactMath
                 .ppmSql("promo_cents", "total_cents")} AS BIGINT)
                 AS promo_share_ppm
        FROM (
          SELECT strftime(l_shipdate, '%Y-%m') AS month,
                 CAST(sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(floor(l_extendedprice * (1 - l_discount)
                     * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS promo_cents,
                 CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                   * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1)""")
    )),

    // "Waiting supplier" (TPC-H Q21 shape) — the hardest classic
    // warehouse plan the q-family didn't exercise: a big-big
    // fact⋈orders join, then a SEMI and an ANTI SELF-join on the
    // flagged fact table, both equi on the order key with an extra
    // supplier-inequality predicate — exactly the multi-way big-big
    // self-join planning a 100 TB warehouse lives on (all three fact
    // roles hash-partition on the SAME orderkey, so the two
    // self-joins reuse the one shuffle layout; exchange reuse keeps
    // the flagged subtree single-execution). The synthetic lineitem
    // has no receipt/commit dates, so "late" is the deterministic
    // proxy l_shipdate > o_orderdate + 90 days, computed on the same
    // orders join that applies the classic o_orderstatus='F' gate.
    // A supplier kept an F-order waiting if its line was late, the
    // order had ANOTHER supplier (semi), and no OTHER supplier was
    // late on it (anti). Dims follow the q63 rule: supplier grows
    // with SF so its join is un-hinted (AQE broadcasts at bench
    // scale, shuffles at 100 TB); nation is a true 25-row constant
    // and broadcasts by hint. Top-100 = TakeOrderedAndProject
    // (partition-local heaps), never a global sort.
    "q67_waiting_suppliers" -> ((
      (s: SparkSession, d: String) => {
        val flagged = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(t(s, d, "orders")
              .filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
            (col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
        val l1 = flagged.filter(col("late"))
        // self-join columns need explicit disambiguation: alias the
        // right side before writing the mixed equi+inequality condition
        val other = flagged.select(col("ok").as("ok_r"),
          col("sk").as("sk_r"))
        val semi = l1.join(other,
          col("ok") === col("ok_r") && col("sk_r") =!= col("sk"),
          "left_semi")
        val otherLate = flagged.filter(col("late"))
          .select(col("ok").as("ok_r"), col("sk").as("sk_r"))
        val anti = semi.join(otherLate,
          col("ok") === col("ok_r") && col("sk_r") =!= col("sk"),
          "left_anti")
        anti
          .join(t(s, d, "supplier")
              .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
            col("sk") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")
              .filter(col("n_name") === "NATION_3")
              .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""WITH li AS (
            SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
                   l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F')
        SELECT s.s_name, count(*) AS numwait
        FROM li l1
        JOIN supplier s ON l1.sk = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE l1.late
          AND n.n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.ok = l1.ok AND l3.sk <> l1.sk
                            AND l3.late)
        GROUP BY 1
        ORDER BY numwait DESC, s_name
        LIMIT 100""")
    )),

    // Small-quantity revenue (TPC-H Q17 shape): revenue lost to
    // below-average-quantity lines of one brand/type slice — the
    // classic CORRELATED-scalar-aggregate plan (compare each row to
    // its own group's average) that none of the other q's exercise.
    // De-correlated to a per-key WINDOW aggregate, not the textbook
    // aggregate+rejoin: the rejoin plan re-executes the fact subtree
    // (TWO full scans of a 100 TB lineitem — explain showed exactly
    // that), while partitionBy(l_partkey) windows hash-partition the
    // GATED slice once and read the fact once. The brand/type gate
    // SEMI-joins lineitem down to the slice BEFORE the window (the
    // dim filter prunes first; the slice is ~1/150th of the fact, so
    // the shuffle moves slice-sized rows, never the full fact).
    // "quantity < 0.2*avg" compares as integer cross-multiplication
    // over per-row-quantized centiquantities (5*qc*cnt < sum_qc) —
    // no doubles, no division.
    "q68_small_qty_revenue" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("CAST(floor(l_quantity * 100D + 0.5D) AS BIGINT)")
              .as("qc"),
            expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)")
              .as("rc"))
        val slice = t(s, d, "part")
          .filter(col("p_brand") === "Brand#3" && col("p_type") === "MEDIUM")
          .select(col("p_partkey"))
        val w = Window.partitionBy("l_partkey")
        li.join(slice, col("l_partkey") === col("p_partkey"), "left_semi")
          .withColumn("sum_qc", sum("qc").over(w))
          .withColumn("cnt", count(lit(1)).over(w))
          .filter(col("qc") * col("cnt") * 5 < col("sum_qc"))
          .agg(expr("coalesce(sum(rc), 0L) div 7").as("avg_yearly_cents"))
      },
      Some("""WITH gated AS (
            SELECT l_partkey,
                   CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     AS rc
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_brand = 'Brand#3'
                                  AND p_type = 'MEDIUM')),
          stats AS (
            SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS sum_qc,
                   count(*) AS cnt
            FROM gated GROUP BY 1)
        SELECT CAST(coalesce(sum(g.rc), 0) // 7 AS BIGINT)
                 AS avg_yearly_cents
        FROM gated g JOIN stats s USING (l_partkey)
        WHERE g.qc * s.cnt * 5 < s.sum_qc""")
    )),

    // Discounted revenue from banded brand/size/quantity slices
    // (TPC-H Q19 shape): the DISJUNCTIVE OR-of-ANDs predicate that
    // mixes columns from BOTH join sides — the planning stress the
    // conjunctive q's never apply. Catalyst's constraint propagation
    // is what makes this scale: from the disjunction it derives the
    // per-side envelopes — p_brand IN (…) AND p_size ≤ 15 pushed
    // into the part scan, l_quantity ≤ 30 pushed into the lineitem
    // scan (both visible as PushedFilters) — so the join only sees
    // rows that can satisfy SOME branch, and the exact branch
    // predicate re-applies post-join. Per-brand revenue (not Q19's
    // single scalar) so the hash pins each branch separately; cents
    // quantized per-row before the sum.
    "q69_banded_revenue" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)").as("rc"))
        val p = t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
              && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
              && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
              && col("l_quantity").between(20, 30)))
          .groupBy(col("p_brand"))
          .agg(sum("rc").as("revenue_cents"))
      },
      Some("""SELECT p_brand,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 20 AND 30)
        GROUP BY 1""")
    )),

    // Order-priority check (TPC-H Q4 shape): per-priority count of
    // one quarter's orders that had at least one LATE line — an
    // EXISTS whose correlation carries an INEQUALITY against the
    // outer row (l_shipdate > o_orderdate + 60 days), so the
    // semi-join condition is mixed equi+theta: Spark hash-partitions
    // both sides on the order key and evaluates the date predicate
    // as a post-probe residual — still one shuffle, never a
    // nested-loop. The quarter filter prunes orders FIRST (the
    // selective side drives), and left_semi means lineitem rows
    // never duplicate orders — no post-join distinct. Same 60-day
    // lateness proxy family as q67 (the synthetic lineitem has no
    // commit/receipt dates).
    "q70_priority_check" -> ((
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        o.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >
                col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate
                          + INTERVAL 60 DAY)
        GROUP BY 1""")
    )),

    // Returned-item customer ranking (TPC-H Q10 shape): which
    // customers returned the most revenue in one quarter — the
    // 4-way fact⋈orders⋈customer⋈nation chain where BOTH fact sides
    // arrive pre-pruned (returnflag='R' and the quarter window each
    // push into their parquet scans, so the big-big orderkey join
    // runs on ~1/12 × ~1/3 of the tables). Customer follows the q63
    // rule (grows with SF → un-hinted; AQE broadcasts at bench scale,
    // shuffles at 100 TB); nation is the true 25-row constant and
    // broadcasts by hint. Top-20 = TakeOrderedAndProject
    // (partition-local heaps), never a global sort; cents quantized
    // per-row before the sum.
    "q71_returned_items" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)").as("rc"))
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer")
              .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
              .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum("rc").as("rev_cents"))
          .orderBy(col("rev_cents").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY 1, 2, 3
        ORDER BY rev_cents DESC, c_custkey
        LIMIT 20""")
    )),

    // Local-supplier revenue (TPC-H Q5 shape): one region's yearly
    // revenue from orders whose customer and supplier sit in the
    // SAME nation — the one classic shape with a join predicate
    // between two DIMENSIONS (c_nationkey = s_nationkey) that only
    // connects THROUGH the fact table, stressing join ordering: the
    // planner must route lineitem⋈orders⋈customer and lineitem⋈
    // supplier before the cross-dimension equality can apply.
    // Customer and supplier both follow the q63 rule (un-hinted,
    // SF-growing); nation⋈region prereduces to the region's nation
    // list and broadcasts by hint (≤25 rows). Year + region filters
    // push into their scans; cents per-row quantized.
    "q72_local_supplier_revenue" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)").as("rc"))
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val nr = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
              .filter(col("r_name") === "ASIA")
              .select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer")
              .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "supplier")
              .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum("rc").as("rev_cents"))
      },
      Some("""SELECT n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1""")
    )),

    // National market share (TPC-H Q8 shape): of one region's
    // PROMO-part revenue across two order years, the fraction
    // supplied from one nation, per year — the classic conditional-
    // aggregate-over-a-deep-join: ONE pass computes numerator and
    // denominator together (sum(CASE) / sum), never two subqueries
    // re-walking the join. The nation table joins TWICE with
    // different roles (customer-region gate vs supplier-nation
    // attribution): the gate prereduces through region to a ≤25-row
    // semi-join broadcast; the attribution side broadcasts whole.
    // Part gate = left_semi (prunes the fact before the big-big
    // orderkey join); date window pushes into the orders scan.
    // Share is integer ppm via `div` — no doubles.
    "q73_market_share" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)").as("rc"))
        val promo = t(s, d, "part")
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year"))
        val gateNations = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
              .filter(col("r_name") === "ASIA")
              .select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))
        val supN = t(s, d, "nation")
          .select(col("n_nationkey").as("sn_nationkey"), col("n_name"))
        li.join(promo, col("l_partkey") === col("p_partkey"), "left_semi")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer")
              .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(gateNations),
            col("c_nationkey") === col("n_nationkey"), "left_semi")
          .join(t(s, d, "supplier")
              .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(supN),
            col("s_nationkey") === col("sn_nationkey"))
          .groupBy(col("o_year"))
          .agg(
            sum(when(col("n_name") === "NATION_3", col("rc"))
              .otherwise(0L)).as("nation_cents"),
            sum(col("rc")).as("total_cents"))
          // nation_cents is a corpus-level cent sum — ExactMath
          // branch (overflows multiply-first past 9e12; identical
          // below, so bundled hashes hold)
          .withColumn("mkt_share_ppm",
            expr(graft.queries.ExactMath
              .ppmExpr("nation_cents", "total_cents")))
      },
      Some(s"""SELECT o_year, nation_cents, total_cents,
               CAST(${graft.queries.ExactMath
                 .ppmSql("nation_cents", "total_cents")} AS BIGINT)
                 AS mkt_share_ppm
        FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN rc
                               ELSE 0 END) AS BIGINT) AS nation_cents,
                 CAST(sum(rc) AS BIGINT) AS total_cents
          FROM (SELECT l_orderkey, l_partkey, l_suppkey,
                  CAST(floor(l_extendedprice * (1 - l_discount) * 100
                    + 0.5) AS BIGINT) AS rc
                FROM lineitem) l
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_type = 'PROMO')
          GROUP BY 1)""")
    )),

    // Product-line profit (TPC-H Q9 shape): net amount (revenue
    // minus tax, both quantized to cents PER ROW before summing —
    // the subtraction of two floors, not a floor of the difference,
    // so the oracle replays it exactly) for one part family, by
    // supplier nation and order year. The p_name LIKE gate is a
    // left_semi that prunes the fact before lineitem⋈orders — the
    // one big-big join; supplier follows the q63 rule (SF-growing →
    // un-hinted, AQE broadcasts at bench scale); nation is the
    // 25-row constant and broadcasts by hint. No date filter: the
    // year axis comes out of the join, exercising a wide group-by
    // over the full fact rather than a pruned slice.
    "q74_product_profit" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            expr("CAST(floor(l_extendedprice * (1D - l_discount)" +
              " * 100D + 0.5D) AS BIGINT)" +
              " - CAST(floor(l_extendedprice * l_tax * 100D + 0.5D)" +
              " AS BIGINT)").as("amount_cents"))
        val family = t(s, d, "part")
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"))
        val o = t(s, d, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year"))
        li.join(family, col("l_partkey") === col("p_partkey"), "left_semi")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "supplier")
              .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("o_year"))
          .agg(sum("amount_cents").as("profit_cents"))
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                        * 100 + 0.5) AS BIGINT)
                      - CAST(floor(l_extendedprice * l_tax * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS profit_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%widget%')
        GROUP BY 1, 2""")
    )),

    // Supplier variety (TPC-H Q16 shape): how many DISTINCT suppliers
    // ship each (brand, size) class outside one excluded part type,
    // excluding flagged suppliers — the count(DISTINCT)-over-a-fact
    // plan plus a NOT-IN rewritten as left_anti. The supplier pairs
    // come from the fact itself (lineitem is the part↔supplier
    // bridge); Spark plans count(DISTINCT l_suppkey) as the two-level
    // partial-dedup aggregate (dedup (keys, suppkey) map-side FIRST,
    // then count), so the shuffle carries distinct pairs, not raw
    // fact rows. The exclusion list (negative-balance suppliers) is
    // tiny and broadcast-anti-joins; the p_type<>'PROMO' gate and the
    // brand IN list push into the part scan.
    "q75_supplier_variety" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"))
        val p = t(s, d, "part")
          .filter(col("p_type") =!= "PROMO"
            && col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val flagged = t(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        // UNHINTED: flagged is a supplier-proportional slice — AQE
        // broadcasts it while it fits, shuffles the anti-join past it
        li.join(flagged,
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, CAST(p_size AS INTEGER) AS p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'PROMO'
          AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2""")
    )),

    // Revenue forecast (TPC-H Q6 shape): the pure-scan aggregate —
    // one year of below-25-quantity lines in a discount band, summed
    // as quantity-independent discount revenue. NO joins: the whole
    // query is predicate pushdown (all three ranges reach the parquet
    // scan as PushedFilters, plan-guarded) + a map-side partial sum.
    // This is the query whose 100 TB cost is pure I/O — it measures
    // the scan path with zero shuffle beyond the single-row gather,
    // which is exactly why every TPC-H kit keeps it.
    "q76_revenue_forecast" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
            && col("l_discount").between(0.05, 0.07)
            && col("l_quantity") < 25)
          .select(expr("CAST(floor(l_extendedprice * l_discount" +
            " * 100D + 0.5D) AS BIGINT)").as("rc"))
          .agg(coalesce(sum("rc"), lit(0L)).as("revenue_cents"),
            count(lit(1)).as("line_cnt"))
      },
      Some("""SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice
                 * l_discount * 100 + 0.5) AS BIGINT)), 0) AS BIGINT)
                 AS revenue_cents,
               count(*) AS line_cnt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 25""")
    )),

    // Late-line priority mix (TPC-H Q12 shape): per line status, how
    // many LATE lines (shipped >60 days after order date — the q67/
    // q70 lateness proxy) belong to urgent/high-priority orders vs
    // the rest — the conditional two-way count over a big-big join.
    // The lateness predicate correlates row-vs-row so it CANNOT push
    // into a scan; what scales the plan is everything else: both
    // sides prune to two columns each, the orderkey join is the one
    // shuffle, and both CASE sums ride a single aggregate pass (no
    // per-priority re-walk). Group cardinality is 2 — the aggregate
    // is all map-side.
    "q77_late_priority_lines" -> ((
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linestatus"),
            col("l_shipdate"))
        val o = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
              1L).otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
              0L).otherwise(1L)).as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN
                   ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN
                   ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY 1""")
    )),

    // Excess shipments (TPC-H Q20 shape): suppliers who shipped more
    // than 1.5× the per-part average (supplier, part) volume of one
    // part family — the nested-aggregate-inside-IN plan: an inner
    // per-(supplier, part) aggregate, a correlated per-part threshold,
    // and a semi join lifting the qualifying suppliers. Like q68 the
    // correlated threshold de-correlates to a WINDOW over the first
    // aggregate (partitionBy part reuses the aggregate's hash
    // partitioning — no rejoin, no second fact scan), and the
    // comparison is integer cross-multiplication over centi-quantities
    // (2·qc·cnt > 3·sum_qc). The family gate semi-joins the fact
    // before anything aggregates; supplier attaches AFTER the
    // qualifying set is supplier-sized, nation broadcasts.
    "q78_excess_shipments" -> ((
      (s: SparkSession, d: String) => {
        val family = t(s, d, "part")
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"))
        val sp = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            expr("CAST(floor(l_quantity * 100D + 0.5D) AS BIGINT)")
              .as("qc"))
          .join(family, col("l_partkey") === col("p_partkey"),
            "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum("qc").as("pair_qc"))
        val w = Window.partitionBy("l_partkey")
        val qualifying = sp
          .withColumn("sum_qc", sum("pair_qc").over(w))
          .withColumn("cnt", count(lit(1)).over(w))
          .filter(col("pair_qc") * col("cnt") * 2 > col("sum_qc") * 3)
          .select(col("l_suppkey")).distinct()
        t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
          .join(qualifying, col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .join(broadcast(t(s, d, "nation")
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      },
      Some("""WITH sp AS (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(CAST(floor(l_quantity * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS pair_qc
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%widget%')
            GROUP BY 1, 2),
          stats AS (
            SELECT l_suppkey, pair_qc,
                   CAST(sum(pair_qc) OVER (PARTITION BY l_partkey)
                     AS BIGINT) AS sum_qc,
                   count(*) OVER (PARTITION BY l_partkey) AS cnt
            FROM sp)
        SELECT DISTINCT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (SELECT l_suppkey FROM stats
                            WHERE pair_qc * cnt * 2 > sum_qc * 3)""")
    )),

    // Min-cost supplier (TPC-H Q2 shape): for every part in a
    // type/size slice, the EUROPE suppliers offering the region-wide
    // minimum cost — the correlated-MIN-subquery classic. The
    // part-supplier cost relation derives from lineitem (this schema
    // has no partsupp): per (part, supplier), min line cents — an
    // integer min, so no float drift. The correlated `cost =
    // (SELECT min ...)` de-correlates to a WINDOW min over the pair
    // aggregate (q68/q78 rule: partitionBy partkey reuses the
    // aggregate's hash partitioning — no rejoin, no second fact
    // scan). Scale: the part slice semi-joins the fact BEFORE the
    // pair aggregate (the only fact-sized shuffle); the region gate
    // is a supplier-sized broadcast semi; part/supplier/nation attach
    // to the qualifying PAIRS (slice-sized) via broadcast.
    "q79_mincost_supplier" -> ((
      (s: SparkSession, d: String) => {
        val slice = t(s, d, "part")
          .filter(col("p_type") === "STANDARD" && col("p_size") === 7)
          .select(col("p_partkey"), col("p_type"), col("p_size"))
        val euroSupp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
              .join(broadcast(t(s, d, "region")
                  .filter(col("r_name") === "EUROPE")),
                col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("s_acctbal"), col("n_name"))
        // UNHINTED semi-join prunes: the part slice and the EUROPE
        // suppliers both grow with the data — AQE broadcasts them
        // while they fit, shuffles past that
        val pairs = t(s, d, "lineitem")
          .join(slice.select("p_partkey"),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .join(euroSupp.select("s_suppkey"),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .select(col("l_partkey"), col("l_suppkey"),
            expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)")
              .as("pc"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min("pc").as("cost_c"))
        val w = Window.partitionBy("l_partkey")
        pairs
          .withColumn("min_c", min("cost_c").over(w))
          .filter(col("cost_c") === col("min_c"))
          .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
          .join(slice, col("l_partkey") === col("p_partkey"))
          .select(round(col("s_acctbal"), 2).as("acctbal_r"),
            col("s_name"), col("n_name"),
            col("l_partkey").as("p_partkey"), col("p_type"),
            col("cost_c"))
      },
      Some("""WITH euro AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
          slice AS (
            SELECT p_partkey, p_type FROM part
            WHERE p_type = 'STANDARD' AND p_size = 7),
          pairs AS (
            SELECT l_partkey, l_suppkey,
                   CAST(min(CAST(floor(l_extendedprice * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS cost_c
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM slice)
              AND l_suppkey IN (SELECT s_suppkey FROM euro)
            GROUP BY 1, 2),
          best AS (
            SELECT l_partkey, l_suppkey, cost_c,
                   CAST(min(cost_c) OVER (PARTITION BY l_partkey)
                     AS BIGINT) AS min_c
            FROM pairs)
        SELECT round(e.s_acctbal, 2) AS acctbal_r, e.s_name, e.n_name,
               b.l_partkey AS p_partkey, s.p_type, b.cost_c
        FROM best b
        JOIN euro e ON b.l_suppkey = e.s_suppkey
        JOIN slice s ON b.l_partkey = s.p_partkey
        WHERE b.cost_c = b.min_c""")
    )),

    // Important stock (TPC-H Q11 shape): parts whose shipped value
    // through ONE nation's suppliers exceeds a threshold derived from
    // the nation's total — the HAVING-vs-global-scalar plan. Value =
    // cents(extendedprice) summed per part (integer, this schema's
    // supplycost·availqty proxy); the global total re-aggregates the
    // PER-PART sums (part-cardinality rows, never a second fact
    // scan) and broadcasts as a one-row cross join. The threshold is
    // SCALE-FREE — value > 2× the mean per-part value (TPC-H itself
    // divides Q11's fraction by SF for the same reason; a fixed
    // fraction of total selects nothing once parts grow) — and the
    // compare divides the threshold side: value > (total·2) div cnt,
    // exactly equivalent to the cross-multiplication value·cnt >
    // total·2 for integers (v > ⌊t/c⌋ ⟺ v·c > t when v is an int)
    // but with max intermediate total·2 (~2e17 cents at 100 TB, fits)
    // instead of value·cnt, whose ~1e11·1e8 product would wrap int64
    // silently in non-ANSI Spark while DuckDB raised — a scale-only
    // engine divergence. Both engines decide every borderline part
    // identically.
    // Scale: the nation's supplier keys broadcast-semi the fact
    // before the one per-part shuffle; the scalar join is a
    // BroadcastNestedLoopJoin over ONE row.
    "q80_important_stock" -> ((
      (s: SparkSession, d: String) => {
        val natSupp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
              .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val perPart = t(s, d, "lineitem")
          // UNHINTED: natSupp is a supplier-proportional slice (one
          // nation's suppliers) — AQE sizes it
          .join(natSupp,
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .select(col("l_partkey"),
            expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)")
              .as("vc"))
          .groupBy(col("l_partkey"))
          .agg(sum("vc").as("value_c"))
        val total = perPart.agg(sum("value_c").as("total_c"),
          count(lit(1)).as("part_cnt"))
        perPart.join(broadcast(total))
          .filter(col("value_c") > expr("(total_c * 2L) div part_cnt"))
          .select(col("l_partkey").as("p_partkey"), col("value_c"))
      },
      Some("""WITH per_part AS (
            SELECT l_partkey,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS value_c
            FROM lineitem
            WHERE l_suppkey IN (
              SELECT s_suppkey FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3')
            GROUP BY 1)
        SELECT l_partkey AS p_partkey, value_c
        FROM per_part
        WHERE value_c >
              (SELECT CAST(sum(value_c) AS BIGINT) * 2 FROM per_part)
              // (SELECT count(*) FROM per_part)""")
    )),

    // Exact 2-D Pareto skyline — parts no other part dominates on
    // (total shipped quantity, total revenue), the multi-objective
    // "best frontier" ask (price-vs-volume catalogs, quality-vs-cost
    // corpus pruning). The textbook plans both fail at scale: the
    // NOT EXISTS dominance self-join is O(n²) (it IS the oracle), and
    // the sort-sweep needs one global running max — a SinglePartition
    // window the t14 rule forbids. This plan decomposes the sweep so
    // every step distributes, exactly:
    //   dominated(p) ⟺ max rev over SAME qty > p.rev
    //               OR max rev over HIGHER qty ≥ p.rev
    // with the higher-qty max split into (a) strictly-higher BUCKETS
    // (fixed-width qty ranges; their maxes form a bounded table whose
    // prefix-max window is over buckets, not data) and (b) strictly
    // higher qty WITHIN the bucket — a running max over the per-qty
    // GROUPED rows (distinct qty values, so a ROWS 1-preceding frame
    // is exactly "strictly higher"), partitioned by bucket. One fact
    // aggregate, two qty-keyed aggregates that reuse its partitioning,
    // a broadcast bucket table; duplicates handled by definition (two
    // identical points don't dominate each other — both survive).
    "q81_pareto_parts" -> ((
      (s: SparkSession, d: String) => {
        val W = 8192L
        val pts = t(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("CAST(floor(l_quantity * 100D + 0.5D) AS BIGINT)")
              .as("qc"),
            expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)")
              .as("rc"))
          .groupBy(col("l_partkey"))
          .agg(sum("qc").as("qty_c"), sum("rc").as("rev_c"))
          .withColumn("bucket", (col("qty_c") / W).cast("long"))
          // three consumers (points, per-qty maxes, bucket table) —
          // materialize the PART-sized aggregate once so the fact
          // scans exactly once, instead of three plan copies
          .localCheckpoint()
        // per-qty group maxes (reuses the aggregate's hash partitioning
        // up to the narrower key; map-side-combinable)
        val perQty = pts.groupBy(col("bucket"), col("qty_c"))
          .agg(max("rev_c").as("qmax"))
        val wIn = Window.partitionBy("bucket")
          .orderBy(col("qty_c").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val inBucket = perQty
          .withColumn("higher_in_bucket", max("qmax").over(wIn))
        // bounded bucket table: one row per occupied qty range
        val wB = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val buckets = perQty.groupBy(col("bucket"))
          .agg(max("qmax").as("bmax"))
          .withColumn("higher_bucket_max", max("bmax").over(wB))
          .select(col("bucket").as("b2"), col("higher_bucket_max"))
        // qmax doubles as the same-qty max (it includes p itself, so
        // "another point strictly higher" is qmax > rev); the per-qty
        // table is O(distinct qty) — equi-joined, NEVER broadcast.
        // Only the bounded bucket table broadcasts.
        pts
          .join(inBucket
              .select(col("bucket").as("b1"), col("qty_c").as("q1"),
                col("qmax"), col("higher_in_bucket")),
            col("bucket") === col("b1") && col("qty_c") === col("q1"))
          .join(broadcast(buckets), col("bucket") === col("b2"), "left")
          .withColumn("higher_qty_max",
            greatest(coalesce(col("higher_in_bucket"), lit(Long.MinValue)),
              coalesce(col("higher_bucket_max"), lit(Long.MinValue))))
          .filter(!(col("qmax") > col("rev_c")
            || col("higher_qty_max") >= col("rev_c")))
          .select(col("l_partkey").as("p_partkey"),
            col("qty_c"), col("rev_c"))
      },
      Some("""WITH pts AS (
            SELECT l_partkey,
                   CAST(sum(CAST(floor(l_quantity * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS qty_c,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS rev_c
            FROM lineitem GROUP BY 1)
        SELECT p.l_partkey AS p_partkey, p.qty_c, p.rev_c
        FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM pts o
          WHERE o.qty_c >= p.qty_c AND o.rev_c >= p.rev_c
            AND (o.qty_c > p.qty_c OR o.rev_c > p.rev_c))""")
    )),

    // ABC inventory classification — the 80/20 cumulative-share
    // bucketing every ops/inventory warehouse derives (class A =
    // parts covering the top 70% of revenue, B to 90%, C the tail).
    // The textbook plan is a GLOBAL running sum ordered by revenue
    // desc — a SinglePartition window over the whole part table. This
    // plan reuses q81's two-level decomposition so the running sum
    // distributes EXACTLY: bucket parts by fixed-width revenue band
    // (every higher band's revenues are strictly greater, so band
    // order is consistent with the global rev-desc order), take the
    // within-band running sum under a window PARTITIONED by band,
    // and add the exclusive prefix of band totals — a window over the
    // BOUNDED band table (max-revenue/W rows, independent of part
    // count), never the data. Class thresholds compare cum·10 against
    // total·7/9 — all int64 (cents ~1e16 at 100 TB, ·10 still fits);
    // the ppm share takes the ExactMath branch (the 10×-decade int64
    // lesson, refined to the TRUE bound): multiply-first is exact for
    // class revenues ≤ 9e12 cents, div-first only past it where its
    // truncation error is sub-ppm — never outgrowing int64 at either
    // decade.
    "q82_abc_inventory" -> ((
      (s: SparkSession, d: String) => {
        val W = 1L << 20
        val pr = t(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("CAST(floor(l_extendedprice * 100D + 0.5D) AS BIGINT)")
              .as("rc"))
          .groupBy(col("l_partkey")).agg(sum("rc").as("rev_c"))
          .withColumn("bucket", expr(s"rev_c div ${W}L"))
          // three consumers (rows, band totals, grand total) —
          // materialize the PART-sized aggregate once so the fact
          // scans exactly once, instead of three plan copies
          .localCheckpoint()
        val wIn = Window.partitionBy("bucket")
          .orderBy(col("rev_c").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wB = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val bands = pr.groupBy(col("bucket"))
          .agg(sum("rev_c").as("btot"))
          .withColumn("higher", coalesce(sum("btot").over(wB), lit(0L)))
          .select(col("bucket").as("b2"), col("higher"))
        val tot = pr.agg(sum("rev_c").as("total"))
        pr.join(broadcast(bands), col("bucket") === col("b2"))
          .withColumn("cum",
            col("higher") + sum("rev_c").over(wIn))
          .crossJoin(broadcast(tot))
          .withColumn("abc_class",
            when(col("cum") * 10L <= col("total") * 7L, "A")
              .when(col("cum") * 10L <= col("total") * 9L, "B")
              .otherwise("C"))
          .groupBy(col("abc_class"))
          .agg(count(lit(1)).as("n_parts"), sum("rev_c").as("rev_c"),
            first("total").as("total"))
          .withColumn("share_ppm",
            expr(graft.queries.ExactMath.ppmExpr("rev_c", "total")))
          .select(col("abc_class"), col("n_parts"), col("rev_c"),
            col("share_ppm"))
      },
      Some(s"""WITH pr AS (
            SELECT l_partkey,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS rev_c
            FROM lineitem GROUP BY 1),
          tot AS (SELECT sum(rev_c) AS total FROM pr),
          cum AS (
            SELECT l_partkey, rev_c,
                   sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)
                     AS cum
            FROM pr),
          cls AS (
            SELECT rev_c,
                   CASE WHEN cum * 10 <= t.total * 7 THEN 'A'
                        WHEN cum * 10 <= t.total * 9 THEN 'B'
                        ELSE 'C' END AS abc_class,
                   t.total
            FROM cum, tot t)
        SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev_c) AS BIGINT) AS rev_c,
               CAST(${graft.queries.ExactMath.ppmSql(
                   "sum(rev_c)", "any_value(total)")} AS BIGINT)
                 AS share_ppm
        FROM cls GROUP BY 1""")
    )),

    // Entity resolution — blocking + pairwise verify + transitive
    // clustering, the record-linkage pipeline every master-data /
    // identity system runs, demonstrated self-validatingly: each
    // record name is an md5-derived 12-hex code (so distinct entities
    // are pairwise FAR — sequential TPC-H names would chain into one
    // giant component under any edit-distance rule), and every third
    // customer gets a deterministic dirty variant (one hex char
    // replaced by 'Z' at a key-dependent position). The classic scale
    // shape: NEVER all-pairs — two substring blocking keys chosen so
    // a single substitution can break at most one (positions 6-11 and
    // 12-17; the typo hits exactly one), candidates are per-block
    // equi-self-joins (block size ~1 at any corpus size: 16^-6
    // collision odds), verification is exact Levenshtein ≤ 1 (integer,
    // engine-identical), and entities are the d8 pointer-jumping CC
    // over verified matches. Golden record = lowest rec_id (the
    // pristine original of the matched pair).
    "q83_entity_resolution" -> ((
      (s: SparkSession, d: String) => {
        val named = t(s, d, "customer")
          .select(col("c_custkey"),
            concat(lit("Cust-"),
              expr("substring(md5(CAST(c_custkey AS STRING)), 1, 12)"))
              .as("nm"))
        val base = named
          .select((col("c_custkey") * 2L).as("rec_id"), col("nm").as("name"))
        val variant = named.filter(col("c_custkey") % 3 === 0)
          .withColumn("p", (lit(6L) + col("c_custkey") % 12L).cast("int"))
          .select((col("c_custkey") * 2L + 1L).as("rec_id"),
            concat(expr("substring(nm, 1, p - 1)"), lit("Z"),
              expr("substring(nm, p + 1)")).as("name"))
        // one narrow customer-sized derivation, four consumers (two
        // block joins + the entity rollup) — materialize once
        val recs = base.unionByName(variant).localCheckpoint()
        graft.operators.EntityResolution
          .resolve(recs,
            Seq(expr("substring(name, 6, 6)"),
              expr("substring(name, 12, 6)")), maxEdits = 1)
          .groupBy(col("entity"))
          .agg(count(lit(1)).as("n_records"), min("rec_id").as("golden_rec"))
      },
      Some("""WITH RECURSIVE recs AS (
            SELECT c_custkey * 2 AS rec_id,
                   'Cust-' || substr(md5(CAST(c_custkey AS VARCHAR)),
                     1, 12) AS name
            FROM customer
            UNION ALL
            SELECT c_custkey * 2 + 1,
                   substr(nm, 1, p - 1) || 'Z' || substr(nm, p + 1)
            FROM (
              SELECT c_custkey,
                     'Cust-' || substr(md5(CAST(c_custkey AS VARCHAR)),
                       1, 12) AS nm,
                     CAST(6 + c_custkey % 12 AS INTEGER) AS p
              FROM customer WHERE c_custkey % 3 = 0)),
          cand AS (
            SELECT a.rec_id AS ra, b.rec_id AS rb,
                   a.name AS na, b.name AS nb
            FROM recs a JOIN recs b
              ON substr(a.name, 6, 6) = substr(b.name, 6, 6)
             AND a.rec_id < b.rec_id
            UNION
            SELECT a.rec_id, b.rec_id, a.name, b.name
            FROM recs a JOIN recs b
              ON substr(a.name, 12, 6) = substr(b.name, 12, 6)
             AND a.rec_id < b.rec_id),
          edges AS (
            SELECT ra, rb FROM cand WHERE levenshtein(na, nb) <= 1),
          e AS (SELECT ra AS a, rb AS b FROM edges
                UNION SELECT rb, ra FROM edges),
          reach(doc, comp) AS (
            SELECT a, a FROM e
            UNION
            SELECT e.b, r.comp FROM reach r JOIN e ON r.doc = e.a),
          comp AS (
            SELECT doc AS rec_id, min(comp) AS component
            FROM reach GROUP BY doc)
        SELECT coalesce(c.component, r.rec_id) AS entity,
               CAST(count(*) AS BIGINT) AS n_records,
               CAST(min(r.rec_id) AS BIGINT) AS golden_rec
        FROM recs r LEFT JOIN comp c USING (rec_id)
        GROUP BY 1""")
    )),

    // Entity resolution, MULTI-PASS BLOCKING edition (the round-13
    // verdict item): q83's two substring keys guarantee rescue for a
    // single SUBSTITUTION (it can hit only one key) but BOTH break
    // under an adjacent TRANSPOSITION at their shared boundary — the
    // classic blocking failure phonetic/bag keys exist for. The dirty
    // model here transposes name chars 11↔12 (the last char of key 1's
    // window and the first of key 2's), and a third blocking pass — a
    // CHARACTER-MULTISET fingerprint (Σ over positions 6..17 of the
    // salted portable hash of each char, each term reduced mod 1e12 so
    // the 12-term sum stays exactly int64 in both engines) — rescues
    // them: any transposition preserves the multiset, so the key
    // collides by construction. (For ALPHABETIC names the same key
    // Column slot takes Spark's native soundex() — proven in
    // EntityResolutionSpec, where smith/smyth pairs that every
    // substring key misses block together under S530; hex codes have
    // no phonetics, so the oracle-checked variant uses the
    // engine-exact bag key.) Each verified edge is tagged with WHICH
    // pass found it — `rescued` = found by the bag key and missed by
    // BOTH substring keys — so both verdicts stay live in the output.
    // Verification is Levenshtein ≤ 2 (a transposition is 2 plain
    // edits); distinct md5-derived entities stay pairwise far, so the
    // threshold cannot chain. Scale shape unchanged from q83: never
    // all-pairs — three equi-self-join passes with ~1-resident blocks
    // (the bag key is 12 salted 60-bit hashes summed: collision odds
    // ~16^-12 scale), CC over verified edges only.
    "q84_entity_resolution_multipass" -> ((
      (s: SparkSession, d: String) => {
        val charBag =
          "aggregate(transform(sequence(6, 17), i -> " +
            "pmod(CAST(conv(substring(md5(concat('5:', " +
            "substring(name, i, 1))), 1, 15), 16, 10) AS LONG), " +
            "1000000000000L)), 0L, (a, b) -> a + b)"
        val named = t(s, d, "customer")
          .select(col("c_custkey"),
            concat(lit("Cust-"),
              expr("substring(md5(CAST(c_custkey AS STRING)), 1, 12)"))
              .as("nm"))
        val base = named
          .select((col("c_custkey") * 2L).as("rec_id"), col("nm").as("name"))
        val variant = named.filter(col("c_custkey") % 3 === 0)
          .select((col("c_custkey") * 2L + 1L).as("rec_id"),
            expr("concat(substring(nm, 1, 10), substring(nm, 12, 1), " +
              "substring(nm, 11, 1), substring(nm, 13))").as("name"))
        val recs = base.unionByName(variant).localCheckpoint()
        val subsKeys = Seq(expr("substring(name, 6, 6)"),
          expr("substring(name, 12, 6)"))
        val eSubs = graft.operators.EntityResolution
          .matches(recs, subsKeys, maxEdits = 2).localCheckpoint()
        val eBag = graft.operators.EntityResolution
          .matches(recs, Seq(expr(charBag)), maxEdits = 2)
        val edges = eSubs.withColumn("resc", lit(0L))
          .unionByName(eBag.join(eSubs, Seq("ra", "rb"), "left_anti")
            .withColumn("resc", lit(1L)))
          .localCheckpoint()
        val comp = graft.operators.ConnectedComponents
          .run(edges.select("ra", "rb"), "ra", "rb")
          .select(col("id").as("rec_id"), col("component"))
          .localCheckpoint()
        val entResc = edges
          .join(comp, edges("ra") === comp("rec_id"))
          .groupBy(col("component"))
          .agg(max("resc").as("r"))
        recs.join(comp, Seq("rec_id"), "left")
          .withColumn("entity", coalesce(col("component"), col("rec_id")))
          .groupBy(col("entity"))
          .agg(count(lit(1)).as("n_records"),
            min("rec_id").as("golden_rec"))
          .join(entResc.select(col("component").as("entity"), col("r")),
            Seq("entity"), "left")
          .select(col("entity"), col("n_records"), col("golden_rec"),
            (coalesce(col("r"), lit(0L)) === 1L).as("rescued"))
      },
      Some("""WITH RECURSIVE recs AS (
            SELECT c_custkey * 2 AS rec_id,
                   'Cust-' || substr(md5(CAST(c_custkey AS VARCHAR)),
                     1, 12) AS name
            FROM customer
            UNION ALL
            SELECT c_custkey * 2 + 1,
                   substr(nm, 1, 10) || substr(nm, 12, 1) ||
                   substr(nm, 11, 1) || substr(nm, 13)
            FROM (
              SELECT c_custkey,
                     'Cust-' || substr(md5(CAST(c_custkey AS VARCHAR)),
                       1, 12) AS nm
              FROM customer WHERE c_custkey % 3 = 0)),
          keyed AS (
            SELECT rec_id, name,
                   list_sum([('0x' || substr(md5('5:' ||
                       substr(name, i, 1)), 1, 15))::BIGINT
                     % 1000000000000 for i in range(6, 18)]) AS bag
            FROM recs),
          cand_subs AS (
            SELECT a.rec_id AS ra, b.rec_id AS rb,
                   a.name AS na, b.name AS nb
            FROM recs a JOIN recs b
              ON substr(a.name, 6, 6) = substr(b.name, 6, 6)
             AND a.rec_id < b.rec_id
            UNION
            SELECT a.rec_id, b.rec_id, a.name, b.name
            FROM recs a JOIN recs b
              ON substr(a.name, 12, 6) = substr(b.name, 12, 6)
             AND a.rec_id < b.rec_id),
          cand_bag AS (
            SELECT a.rec_id AS ra, b.rec_id AS rb,
                   a.name AS na, b.name AS nb
            FROM keyed a JOIN keyed b
              ON a.bag = b.bag AND a.rec_id < b.rec_id),
          e_subs AS (
            SELECT ra, rb FROM cand_subs WHERE levenshtein(na, nb) <= 2),
          e_bag AS (
            SELECT ra, rb FROM cand_bag WHERE levenshtein(na, nb) <= 2),
          edges AS (
            SELECT ra, rb, 0 AS resc FROM e_subs
            UNION ALL
            SELECT b.ra, b.rb, 1 AS resc FROM e_bag b
            WHERE NOT EXISTS (SELECT 1 FROM e_subs s
                              WHERE s.ra = b.ra AND s.rb = b.rb)),
          e AS (SELECT ra AS a, rb AS b FROM edges
                UNION SELECT rb, ra FROM edges),
          reach(doc, comp) AS (
            SELECT a, a FROM e
            UNION
            SELECT e.b, r.comp FROM reach r JOIN e ON r.doc = e.a),
          comp AS (
            SELECT doc AS rec_id, min(comp) AS component
            FROM reach GROUP BY doc),
          resc AS (
            SELECT c.component, max(ed.resc) AS r
            FROM edges ed JOIN comp c ON ed.ra = c.rec_id
            GROUP BY 1)
        SELECT coalesce(c.component, r.rec_id) AS entity,
               CAST(count(*) AS BIGINT) AS n_records,
               CAST(min(r.rec_id) AS BIGINT) AS golden_rec,
               coalesce(any_value(s.r), 0) = 1 AS rescued
        FROM recs r
        LEFT JOIN comp c USING (rec_id)
        LEFT JOIN resc s ON s.component = c.component
        GROUP BY 1""")
    )),

    // RFM customer segmentation — the classic recency/frequency/
    // monetary scoring every CRM/marketing warehouse derives:
    // per customer, days since last order, order count, lifetime
    // cents (q45's exact quantizer), each quintile-scored 1..5 and
    // composed into the 3-digit segment. Scores are PER-NATION
    // ntile(5) — the business framing "relative to the local market",
    // and the scale framing: every rank window partitions by nation,
    // never a global single-partition sort (the t21/t24 rule; a
    // global quintile wants the mergeable KLL path of q52 instead).
    // ntile ties are impossible because the ordering is total
    // ((value, custkey)); both engines implement the same
    // larger-buckets-first SQL ntile, so every score is
    // engine-exact. Plan: one orders aggregate keyed by customer,
    // the nation key broadcast-joined from the customer dim, the
    // corpus max date a broadcast scalar, three per-nation windows
    // over customer-cardinality rows.
    "q57_rfm_segments" -> ((
      (s: SparkSession, d: String) => {
        // delegates to the library operator (one definition per
        // semantics — the Bm25/RangeJoin promotion rule); the query
        // keeps only the corpus binding: cents quantization (q45's
        // exact quantizer) and the nation group key
        val o = t(s, d, "orders").select(col("o_custkey"),
          to_date(col("o_orderdate")).as("od"),
          expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)")
            .as("cents"))
        val cust = t(s, d, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
        graft.operators.Segments.rfm(o, "o_custkey", "od", "cents",
          cust, "c_nationkey", buckets = 5)
      },
      Some("""WITH o AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders),
          agg AS (
            SELECT o_custkey, max(od) AS last_od,
                   count(*) AS f, CAST(sum(cents) AS BIGINT) AS m_cents
            FROM o GROUP BY 1),
          base AS (
            SELECT a.o_custkey, c.c_nationkey,
                   date_diff('day', a.last_od,
                     (SELECT max(od) FROM o)) AS recency_days,
                   a.f, a.m_cents
            FROM agg a JOIN customer c ON a.o_custkey = c.c_custkey)
        SELECT o_custkey, c_nationkey, recency_days, f, m_cents,
               CAST(ntile(5) OVER (PARTITION BY c_nationkey
                 ORDER BY recency_days DESC, o_custkey) AS BIGINT)
                 AS r_score,
               CAST(ntile(5) OVER (PARTITION BY c_nationkey
                 ORDER BY f, o_custkey) AS BIGINT) AS f_score,
               CAST(ntile(5) OVER (PARTITION BY c_nationkey
                 ORDER BY m_cents, o_custkey) AS BIGINT) AS m_score,
               CAST(ntile(5) OVER (PARTITION BY c_nationkey
                 ORDER BY recency_days DESC, o_custkey) AS BIGINT) * 100
               + CAST(ntile(5) OVER (PARTITION BY c_nationkey
                 ORDER BY f, o_custkey) AS BIGINT) * 10
               + CAST(ntile(5) OVER (PARTITION BY c_nationkey
                 ORDER BY m_cents, o_custkey) AS BIGINT) AS segment
        FROM base""")
    )),

    // Event DEBOUNCE — the ingest-dedup every clickstream ETL runs:
    // within each (user, event_type) stream, an event that fires
    // within 1 h of the previous KEPT event is a bounce/retry and is
    // dropped. NOT the naive lag-gap filter (predecessor may itself
    // be dropped — a burst of 10 rapid events must collapse to its
    // FIRST, not to "drop everything with a close predecessor"):
    // gaps-and-islands — a new burst starts when the lag gap is
    // ≥ 3600 s, burst_id is the running sum of burst starts — and the
    // kept row of each burst IS its starting row, so `kept` is just
    // new_burst = 1 (a third rank-within-burst window would re-derive
    // the same fact through an extra exchange on the burst key).
    // Exact integer micros throughout; order (ts, event_id) is total,
    // so both engines cut identical bursts. Scale shape: ONE shuffle
    // on (user, event_type) whose ordered partition serves both the
    // lag and the running sum; the 1 h window makes the stateful
    // streaming twin trivially expressible with per-key state
    // (streaming/StreamingDebounce, parity spec-pinned).
    "q56_event_debounce" -> ((
      (s: SparkSession, d: String) => {
        val wOrd = Window.partitionBy("user_id", "event_type")
          .orderBy("eus", "event_id")
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        Derived.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("eus"))
          .withColumn("gap", col("eus") - lag("eus", 1).over(wOrd))
          .withColumn("new_burst",
            when(col("gap").isNull || col("gap") >= 3600000000L, 1L)
              .otherwise(0L))
          .withColumn("burst_id", sum("new_burst").over(wCum))
          .withColumn("kept", col("new_burst") === 1L)
          .select("event_id", "user_id", "event_type", "burst_id", "kept")
      },
      Some("""WITH e AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS eus
            FROM events),
          g AS (
            SELECT *, CASE WHEN lag(eus) OVER w IS NULL
                        OR eus - lag(eus) OVER w >= 3600000000
                      THEN 1 ELSE 0 END AS new_burst
            FROM e
            WINDOW w AS (PARTITION BY user_id, event_type
                         ORDER BY eus, event_id))
        SELECT event_id, user_id, event_type,
               CAST(sum(new_burst) OVER (PARTITION BY user_id, event_type
                 ORDER BY eus, event_id ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS burst_id,
               (new_burst = 1) AS kept
        FROM g""")
    )),

    // Theta-sketch set DIFFERENCE (A-NOT-B) — the unconverted
    // audience: per event type, (user, active-day) elements that
    // never purchased that day. Completes the sketch set algebra
    // q46/q51 started (union-merge / INTERSECTION / now DIFFERENCE —
    // the two non-union operations are exactly what theta sketches
    // buy over HLL, which can only union). Same accuracy-contract
    // frame as q51: the exact values (combos, missed) ride along
    // from a left-anti-style count both engines compute, and the
    // sketch's A-NOT-B estimate must land within a 10% band —
    // err_missed pinned 0 by the oracle, so a broken difference
    // (wrong theta handling, retained-entry bias) flips the hash.
    // lgK=12 on ~16k-element day-combo sets keeps the sketches in
    // genuine estimation mode at sf0.1 (the q51 calibration). Scale
    // shape: two map-side-combinable sketch aggregates (KB state) +
    // a 5-row join; the exact companion is the thing that stops
    // scaling — which is the point of shipping the sketch.
    "q55_unconverted_audience" -> ((
      (s: SparkSession, d: String) => {
        val e = Derived.events(s, d).select(col("event_type"),
          (col("user_id") * 100000L
            + expr("unix_micros(ts) div 86400000000")).as("combo"))
        val dTyped = e.distinct()
        val pCombos = dTyped.filter(col("event_type") === "purchase")
          .select(col("combo"))
        val exact = dTyped
          .join(pCombos.withColumn("__hit", lit(1)).distinct(),
            Seq("combo"), "left")
          .groupBy("event_type")
          .agg(count(lit(1)).as("combos"),
            sum(when(col("__hit").isNull, 1L).otherwise(0L))
              .as("missed"))
        val sk = e.groupBy("event_type")
          .agg(theta_sketch_agg(col("combo"), 12).as("sk"))
        val pSk = e.filter(col("event_type") === "purchase")
          .agg(theta_sketch_agg(col("combo"), 12).as("psk"))
        exact.join(sk, Seq("event_type"))
          .crossJoin(broadcast(pSk))
          .select(col("event_type"), col("combos"), col("missed"),
            when(col("missed") > 0,
              floor(abs(theta_sketch_estimate(
                  theta_difference(col("sk"), col("psk")))
                - col("missed")) / col("missed") / 0.10).cast("long"))
              .otherwise(0L).as("err_missed"))
      },
      Some("""WITH e AS (
            SELECT DISTINCT event_type,
                   user_id * 100000 + epoch_us(ts) // 86400000000 AS combo
            FROM events),
          p AS (SELECT combo FROM e WHERE event_type = 'purchase')
        SELECT e.event_type, count(*) AS combos,
               CAST(sum(CASE WHEN p.combo IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS missed,
               CAST(0 AS BIGINT) AS err_missed
        FROM e LEFT JOIN p ON e.combo = p.combo
        GROUP BY 1""")
    )),

    // Incremental QUANTILE maintenance — the last member of the MV
    // family (counts q45, distincts q46, changesets q47, joins q48):
    // order statistics over history can only be maintained by a
    // mergeable quantile SKETCH. Per-batch KLL sketches (k=200,
    // ~1.3% rank error) are built for the snapshot and the delta
    // separately and merged with kll_merge_agg — the associative MV
    // update, history never re-sorted. Contract (q26 bracket family):
    // the MERGED sketch's p50 must land between the exact p45 and p55
    // — exact order statistics via the rank pattern, tie-broken by
    // o_orderkey so both engines cut identically — and the oracle pins
    // bracket_ok TRUE, so a broken merge (dropped levels, re-weighted
    // items) flips the hash. The exact p50 rides along as the checked
    // value. At 100 TB: per-group state is O(k log n) ≈ KBs; the
    // exact companion re-sorts history every cycle.
    "q52_incremental_quantiles" -> ((
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders").select(col("o_orderpriority"),
          expr("CAST(floor(o_totalprice * 100D + 0.5D) AS BIGINT)")
            .as("cents"),
          col("o_orderkey"))
        def sk(b: DataFrame) = b.groupBy("o_orderpriority")
          .agg(kll_sketch_agg_bigint(col("cents"), 200).as("sk"))
        val merged = sk(o.filter(pmod(col("o_orderkey"), lit(4)) =!= 0))
          .unionByName(sk(o.filter(pmod(col("o_orderkey"), lit(4)) === 0)))
          .groupBy("o_orderpriority")
          .agg(kll_merge_agg_bigint(col("sk"), 200).as("sk"))
          .select(col("o_orderpriority"),
            kll_sketch_get_quantile_bigint(col("sk"), lit(0.5))
              .as("__est_p50"))
        val wRank = Window.partitionBy("o_orderpriority")
          .orderBy(col("cents"), col("o_orderkey"))
        val wN = Window.partitionBy("o_orderpriority")
        val exact = o
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n", count(lit(1)).over(wN))
          .groupBy("o_orderpriority")
          .agg(
            min(when(col("rn") === expr("(45L * n + 99L) div 100"),
              col("cents"))).as("p45"),
            min(when(col("rn") === expr("(50L * n + 99L) div 100"),
              col("cents"))).as("p50_exact"),
            min(when(col("rn") === expr("(55L * n + 99L) div 100"),
              col("cents"))).as("p55"))
        exact.join(merged, Seq("o_orderpriority"))
          .select(col("o_orderpriority"), col("p50_exact"),
            (col("__est_p50") >= col("p45")
              && col("__est_p50") <= col("p55")).as("bracket_ok"))
      },
      Some("""WITH o AS (
            SELECT o_orderpriority,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                   o_orderkey
            FROM orders),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                        ORDER BY cents, o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM o)
        SELECT o_orderpriority,
               min(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END)
                 AS p50_exact,
               TRUE AS bracket_ok
        FROM ranked GROUP BY 1""")
    )),

    // Robust ANOMALY detection: flag events whose value sits more than
    // 1.9 MADs from its event_type's median — the median/MAD detector
    // (not mean/σ: one fat outlier inflates σ and hides its siblings;
    // the median absolute deviation has a 50% breakdown point). Both
    // statistics are EXACT order statistics via the rank pattern
    // (tie-broken by event_id) and the flag is the integer compare
    // ad·10 > mad·19 — no doubles anywhere, so both engines agree on
    // every boundary row. Two rank windows per series (one for the
    // median, one over |x − med| for the MAD), each partitioned by
    // event_type; 5-row stat tables broadcast back. At 100 TB swap
    // the rank windows for the mergeable KLL sketch (q52) and keep
    // the same integer flag — the detector's contract is unchanged.
    "q53_mad_anomaly" -> ((
      (s: SparkSession, d: String) => {
        val e = Derived.events(s, d).select(col("event_id"),
          col("event_type"),
          expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)").as("cents"))
        val wN = Window.partitionBy("event_type")
        val wMed = Window.partitionBy("event_type")
          .orderBy(col("cents"), col("event_id"))
        val med = e.withColumn("rn", row_number().over(wMed))
          .withColumn("n", count(lit(1)).over(wN))
          .groupBy("event_type")
          .agg(min(when(col("rn") === expr("(50L * n + 99L) div 100"),
            col("cents"))).as("med"))
        val dev = e.join(broadcast(med), Seq("event_type"))
          .withColumn("ad", abs(col("cents") - col("med")))
        val wMad = Window.partitionBy("event_type")
          .orderBy(col("ad"), col("event_id"))
        val mad = dev.withColumn("rn", row_number().over(wMad))
          .withColumn("n", count(lit(1)).over(wN))
          .groupBy("event_type")
          .agg(min(when(col("rn") === expr("(50L * n + 99L) div 100"),
            col("ad"))).as("mad"))
        dev.join(broadcast(mad), Seq("event_type"))
          .filter(col("ad") * 10L > col("mad") * 19L)
          .select(col("event_id"), col("event_type"), col("cents"),
            col("med"), col("mad"))
      },
      Some("""WITH e AS (
            SELECT event_id, event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events),
          rm AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY cents, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM e),
          med AS (
            SELECT event_type,
                   min(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END)
                     AS med
            FROM rm GROUP BY 1),
          dev AS (
            SELECT e.event_id, e.event_type, e.cents, med.med,
                   abs(e.cents - med.med) AS ad
            FROM e JOIN med USING (event_type)),
          rd AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY ad, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev),
          mad AS (
            SELECT event_type,
                   min(CASE WHEN rn = (50 * n + 99) // 100 THEN ad END)
                     AS mad
            FROM rd GROUP BY 1)
        SELECT d.event_id, d.event_type, d.cents, d.med, mad.mad
        FROM dev d JOIN mad USING (event_type)
        WHERE d.ad * 10 > mad.mad * 19""")
    )),

    // Multi-touch attribution: every purchase distributes its value
    // LINEARLY over the user's click/view touches in the preceding
    // hour — the marketing-credit allocation a conversion pipeline
    // computes per impression. Credit is exact int64: value → cents
    // (q45's quantizer), credit = cents·1e6 div n_touches
    // (micro-cents; the floor remainder stays on the table as
    // n·credit ≤ cents·1e6, standard largest-remainder-free
    // allocation). Scale shape: the interval join is NOT a per-user
    // theta join (a hot user's purchases × touches would be deg² in
    // one reducer) — it is the q31 binned-range-join pattern with the
    // user as a composite key: touches land in one 3600 s epoch bin,
    // each purchase's 1 h lookback explodes to the ≤ 2 bins it
    // overlaps, the join is a hash equi-join on (user, bin) with the
    // exact window predicate re-checked, and each pair meets in
    // exactly one bin (the touch's) so no dedup pass. n_touches is
    // one count window over pair-sized partitions. Purchases with no
    // in-window touch drop out (no touch row to credit); DuckDB
    // computes the same result from the plain theta join — two
    // formulations, one answer.
    "q54_attribution" -> ((
      (s: SparkSession, d: String) => {
        val ev = Derived.events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("es"),
          expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)").as("cents"))
        val touches = ev
          .filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("event_id").as("touch_id"),
            col("event_type").as("touch_type"), col("es").as("tts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("es").as("pts"), col("cents"),
            (col("es") - 3600L).as("lo"))
        // the shared keyed binned-range-join operator ([lo, hi) =
        // [pts - 3600, pts)); RangeJoinSpec property-pins it against
        // the plain theta join on boundary-heavy random data
        val pairs = graft.operators.RangeJoin.pointInIntervalKeyed(
            touches, purchases, Seq("user_id"), "tts", "lo", "pts",
            binWidth = 3600L)
          .drop("lo")
        val wP = Window.partitionBy("purchase_id")
        pairs
          .withColumn("n_touches", count(lit(1)).over(wP))
          .select(col("purchase_id"), col("touch_id"), col("touch_type"),
            col("user_id"), col("n_touches"),
            // raw ppm retained: the numerator is ONE purchase's cents
            // (≤ ~1e9), never a corpus-level sum — multiply-first
            // cannot overflow here at any corpus size
            expr("cents * 1000000L div n_touches").as("credit_microcents"))
      },
      Some("""WITH ev AS (
            SELECT event_id, user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS es,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events),
          t AS (
            SELECT user_id, event_id AS touch_id, event_type AS touch_type,
                   es AS tts
            FROM ev WHERE event_type IN ('click', 'view')),
          p AS (
            SELECT user_id, event_id AS purchase_id, es AS pts, cents
            FROM ev WHERE event_type = 'purchase'),
          pairs AS (
            SELECT p.purchase_id, t.touch_id, t.touch_type, p.user_id,
                   p.cents
            FROM p JOIN t ON p.user_id = t.user_id
              AND t.tts < p.pts AND t.tts >= p.pts - 3600)
        SELECT purchase_id, touch_id, touch_type, user_id,
               count(*) OVER (PARTITION BY purchase_id) AS n_touches,
               CAST(cents * 1000000
                 // count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
                 AS credit_microcents
        FROM pairs""")
    )),

    // PERSONALIZED (topic-sensitive) PageRank: only seed parts (one
    // brand) receive the damped reset mass, so rank measures proximity
    // to the seed topic through the co-purchase graph — "what else is
    // this brand's ecosystem" rather than global importance. Same
    // integer fixed-point machinery as p2 (bit-identical on any
    // engine); the seed table joins ONCE into the degree table, so
    // per-round cost is unchanged.
    "p4_personalized_pagerank" -> ((
      (s: SparkSession, d: String) => {
        val e = copurchaseEdgesFixture(s, d)
        val seeds = t(s, d, "part")
          .filter(col("p_brand") === "Brand#4")
          .select(col("p_partkey").as("node"))
        graft.operators.PageRank.run(e, "src", "dst", iterations = 5,
            checkpointEvery = 2, seeds = Some(seeds))
          .select(col("node").as("part"), col("rank"))
      },
      Some {
        val round = (i: Int, prev: String) =>
          s"""c$i AS (
            SELECT e.dst AS node, CAST(sum(r.rank // deg.d) AS BIGINT) AS s
            FROM e JOIN $prev r ON e.src = r.node
                   JOIN deg ON e.src = deg.src
            GROUP BY e.dst),
          r$i AS (
            SELECT n.node,
                   CAST(n.reset * 150000
                        + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT)
                     AS rank
            FROM nodesr n LEFT JOIN c$i ON c$i.node = n.node)"""
        s"""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          e AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
          nodes AS (SELECT DISTINCT src AS node FROM e),
          seeds AS (
            SELECT DISTINCT p_partkey AS node FROM part
            WHERE p_brand = 'Brand#4'),
          nodesr AS (
            SELECT n.node,
                   CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS reset
            FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
          r0 AS (
            SELECT node, CAST(reset * 1000000 AS BIGINT) AS rank
            FROM nodesr),
          ${(1 to 5).map(i => round(i, s"r${i - 1}")).mkString(",\n          ")}
        SELECT node AS part, rank FROM r5"""
      }
    )),

    // Multi-source BFS hop distance from the Brand#4 seed set through
    // the co-purchase graph (operators.BfsHops) — the HARD proximity
    // companion to p4's soft personalized-PageRank ranking, and the
    // 4th graph primitive (centrality p2/p4, communities d8/t19,
    // triangles p3, now distances). 4 unrolled relaxation rounds,
    // each one frontier⋈edges join + union + min-aggregate, both
    // shuffles hash-partitioned on the node key. All-integer
    // distances let DuckDB unroll the identical rounds as CTEs and
    // byte-match (the PageRank oracle pattern applied to distances);
    // same edge derivation as p2/p3/p4 (copurchasePairs — one
    // definition per edge set).
    "p5_bfs_hops" -> ((
      (s: SparkSession, d: String) => {
        val e = copurchaseEdgesFixture(s, d)
        val seeds = t(s, d, "part")
          .filter(col("p_brand") === "Brand#4")
          .select(col("p_partkey").as("node"))
        graft.operators.BfsHops.run(e, "src", "dst", seeds, "node",
            rounds = 4, checkpointEvery = 2)
          .select(col("node").as("part"), col("hops"))
      },
      Some {
        val round = (i: Int, prev: String) =>
          s"""d$i AS (
            SELECT node, min(d) AS d FROM (
              SELECT node, d FROM $prev
              UNION ALL
              SELECT e.dst AS node, p.d + 1 AS d
              FROM e JOIN $prev p ON e.src = p.node)
            GROUP BY node)"""
        s"""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          e AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          seeds AS (
            SELECT DISTINCT p_partkey AS node FROM part
            WHERE p_brand = 'Brand#4'),
          d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM seeds),
          ${(1 to 4).map(i => round(i, s"d${i - 1}")).mkString(",\n          ")}
        SELECT node AS part, d AS hops FROM d4"""
      }
    )),

    // Seed-set reach profile — the reachability curve network
    // analysts report from a multi-source BFS (influence/coverage
    // analyses, "how far does Brand#4's co-purchase neighborhood
    // extend"): per hop level, nodes FIRST reached there, the
    // cumulative reach, and the level's harmonic-centrality mass
    // (Σ 1e6 div h, the integer-exact harmonic contribution; hop 0 =
    // the seeds themselves contribute none, the standard convention).
    // Pure composition: p5's BfsHops derivation (same operator, same
    // edge definition) + a map-side-combinable per-hop rollup + a
    // cumulative window over the HOP table — ≤ rounds+1 rows,
    // bounded by construction, never the data (the q81 band-table
    // discipline).
    "p10_reach_profile" -> ((
      (s: SparkSession, d: String) => {
        val perHop = brandReachHopsFixture(s, d)
          .groupBy(col("hops"))
          .agg(count(lit(1)).as("n_first_reached"))
        val wCum = Window.orderBy(col("hops"))
          .rowsBetween(Window.unboundedPreceding, 0)
        perHop
          .withColumn("cum_reached",
            sum("n_first_reached").over(wCum))
          // raw ppm retained: the div runs FIRST (1e6 div hops ≤ 1e6),
          // so the product is ≤ n_first_reached·1e6 ≤ nodes·1e6 —
          // inside int64 for any node count below ~9.2e12
          .withColumn("harmonic_ppm",
            when(col("hops") === 0L, 0L)
              .otherwise(expr("n_first_reached * (1000000L div hops)")))
          .select(col("hops"), col("n_first_reached"),
            col("cum_reached"), col("harmonic_ppm"))
      },
      Some {
        val round = (i: Int, prev: String) =>
          s"""d$i AS (
            SELECT node, min(d) AS d FROM (
              SELECT node, d FROM $prev
              UNION ALL
              SELECT e.dst AS node, p.d + 1 AS d
              FROM e JOIN $prev p ON e.src = p.node)
            GROUP BY node)"""
        s"""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          e AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          seeds AS (
            SELECT DISTINCT p_partkey AS node FROM part
            WHERE p_brand = 'Brand#4'),
          d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM seeds),
          ${(1 to 4).map(i => round(i, s"d${i - 1}")).mkString(",\n          ")},
          ph AS (
            SELECT d AS hops, CAST(count(*) AS BIGINT)
                     AS n_first_reached
            FROM d4 GROUP BY 1)
        SELECT hops, n_first_reached,
               CAST(sum(n_first_reached) OVER (ORDER BY hops)
                 AS BIGINT) AS cum_reached,
               CAST(CASE WHEN hops = 0 THEN 0
                 ELSE n_first_reached * (1000000 // hops) END
                 AS BIGINT) AS harmonic_ppm
        FROM ph"""
      }
    )),

    // Community detection by deterministic label propagation
    // (operators.LabelProp) — the 5th graph primitive: majority-vote
    // communities, NOT min-label components (d8/t19's CC would flood
    // a bridge-connected component with one id; LPA's mode rule keeps
    // the dense cores apart). 3 unrolled rounds; per round one
    // labels⋈edges join + (node, label) count + per-node max_by
    // argmax, all hash-partitioned on the node key — no rank window.
    // Ties break to the smallest label, so every round is
    // deterministic and DuckDB byte-matches the same rounds unrolled
    // as CTEs (its side INDEPENDENTLY computes the argmax with a
    // row_number window — two formulations, one fixed point). Same
    // copurchasePairs edge definition as p2/p3/p4/p5.
    "p6_label_prop" -> ((
      (s: SparkSession, d: String) => {
        val e = copurchaseEdgesFixture(s, d)
        graft.operators.LabelProp.run(e, "src", "dst", rounds = 3,
            checkpointEvery = 2)
          .select(col("node").as("part"), col("label"))
      },
      Some {
        val round = (i: Int, prev: String) =>
          s"""nb$i AS (
            SELECT e.dst AS node, l.lbl, count(*) AS cnt
            FROM e JOIN $prev l ON e.src = l.node
            GROUP BY 1, 2),
          lp$i AS (
            SELECT node, lbl FROM (
              SELECT node, lbl, row_number() OVER (PARTITION BY node
                       ORDER BY cnt DESC, lbl) AS rn
              FROM nb$i)
            WHERE rn = 1)"""
        s"""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          e AS (
            SELECT DISTINCT a.pk AS src, b.pk AS dst
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          lp0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
          ${(1 to 3).map(i => round(i, s"lp${i - 1}")).mkString(",\n          ")}
        SELECT node AS part, lbl AS label FROM lp3"""
      }
    )),

    // k-CORE decomposition by iterative peeling (operators.KCore) —
    // the 7th graph primitive and the graph-CLEANING workhorse: drop
    // nodes of degree < k, recompute degrees over the survivors,
    // repeat — a high-degree node whose neighbors are all spam
    // leaves the 2-core even though a plain degree filter keeps it.
    // 4 unrolled rounds over the support-filtered co-purchase graph;
    // peeling is MONOTONE (nodes only leave), so the fixed budget is
    // deterministic and DuckDB replays identical rounds as CTEs. A
    // budget that hasn't converged leaves residual degrees below k —
    // identical on both engines, and convergence shows up as the
    // round trace going flat (measured: sf0.01 converges by round 3;
    // sf0.1 is still peeling at round 4 — exactly why the budget is
    // part of the contract). Output = surviving nodes with their
    // core-subgraph degree.
    "p8_kcore" -> ((
      (s: SparkSession, d: String) => {
        val e = supportedPairsFixture(s, d).select("a", "b")
        val sym = e.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
        graft.operators.KCore.run(sym, "src", "dst", k = 2, rounds = 4)
          .select(col("node").as("part"), col("core_deg"))
      },
      Some {
        val round = (i: Int, prev: String) =>
          s"""alive$i AS (
            SELECT dst AS node FROM $prev GROUP BY dst
            HAVING count(*) >= 2),
          s$i AS (
            SELECT e.src, e.dst FROM $prev e
            JOIN alive$i x ON e.src = x.node
            JOIN alive$i y ON e.dst = y.node)"""
        s"""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
          e0 AS (
            SELECT a.pk AS a, b.pk AS b
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY 1, 2 HAVING count(*) >= 2),
          s0 AS (SELECT a AS src, b AS dst FROM e0
                 UNION ALL SELECT b, a FROM e0),
          ${(1 to 4).map(i => round(i, s"s${i - 1}")).mkString(",\n          ")}
        SELECT dst AS part, count(*) AS core_deg FROM s4 GROUP BY dst"""
      }
    )),

    // LINK PREDICTION by neighborhood similarity — the 6th graph
    // primitive (centrality p2/p4, communities p6, components d8,
    // triangles p3, distances p5, now "which edges are missing"):
    // for every node pair sharing a neighbor in the
    // support-filtered co-purchase graph, the common-neighbor count
    // and Jaccard overlap of their neighborhoods — the classic
    // collaborative-filtering / recommend-a-part signal — plus
    // whether the pair is ALREADY linked (predictions are the
    // unlinked high-Jaccard pairs; emitting the flag instead of
    // filtering keeps the oracle row set richer). jaccard_ppm =
    // common·1e6 div (deg_a + deg_b − common), exact int64. Scale
    // shape: wedge enumeration is one adjacency self-join on the
    // center (Σ deg² — bounded here by the support prune, the same
    // bound p3 leans on; a 100 TB graph additionally caps hub
    // degrees before this join, the standard CF mitigation), one
    // (pair) count aggregate, the node-cardinality degree table
    // broadcast twice, and an edge left-join for the flag.
    "p7_link_prediction" -> ((
      (s: SparkSession, d: String) => {
        val e = supportedPairsFixture(s, d).select("a", "b")
        val adj = e.select(col("a").as("c"), col("b").as("n"))
          .unionByName(e.select(col("b").as("c"), col("a").as("n")))
        val wedges = adj.as("x").join(adj.as("y"),
            col("x.c") === col("y.c") && col("x.n") < col("y.n"))
          .groupBy(col("x.n").as("node_a"), col("y.n").as("node_b"))
          .agg(count(lit(1)).as("common"))
        val deg = adj.groupBy(col("c").as("node"))
          .agg(count(lit(1)).as("deg"))
        wedges
          // UNHINTED: deg is node-cardinality (grows with the graph)
          // — AQE broadcasts it while it fits, shuffles past that
          .join(deg.select(col("node").as("node_a"),
            col("deg").as("deg_a")), Seq("node_a"))
          .join(deg.select(col("node").as("node_b"),
            col("deg").as("deg_b")), Seq("node_b"))
          .join(e.select(col("a").as("node_a"), col("b").as("node_b"))
            .withColumn("__hit", lit(1)), Seq("node_a", "node_b"), "left")
          .select(col("node_a"), col("node_b"), col("common"),
            col("deg_a"), col("deg_b"),
            // raw ppm retained: `common` is one pair's co-neighbor
            // count, bounded by the smaller node degree — a per-pair
            // quantity, never a corpus-level sum
            expr("common * 1000000L div (deg_a + deg_b - common)")
              .as("jaccard_ppm"),
            col("__hit").isNotNull.as("already_linked"))
      },
      Some("""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
          e AS (
            SELECT a.pk AS a, b.pk AS b
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY 1, 2 HAVING count(*) >= 2),
          adj AS (
            SELECT a AS c, b AS n FROM e
            UNION ALL SELECT b AS c, a AS n FROM e),
          wedges AS (
            SELECT x.n AS node_a, y.n AS node_b, count(*) AS common
            FROM adj x JOIN adj y ON x.c = y.c AND x.n < y.n
            GROUP BY 1, 2),
          deg AS (SELECT c AS node, count(*) AS deg FROM adj GROUP BY 1)
        SELECT w.node_a, w.node_b, w.common,
               da.deg AS deg_a, db.deg AS deg_b,
               CAST(w.common * 1000000 // (da.deg + db.deg - w.common)
                 AS BIGINT) AS jaccard_ppm,
               (ee.a IS NOT NULL) AS already_linked
        FROM wedges w
        JOIN deg da ON w.node_a = da.node
        JOIN deg db ON w.node_b = db.node
        LEFT JOIN e ee ON w.node_a = ee.a AND w.node_b = ee.b""")
    )),

    // Triangle counting over the SUPPORT-FILTERED co-purchase graph
    // (edges = part pairs co-purchased in ≥ 2 orders — the standard
    // market-basket support prune, which is also what keeps the graph
    // meaningful AND sparse at 100 TB). Degree orientation bounds the
    // wedge enumeration at O(|E|^1.5) independent of skew — a hot
    // part's edges point INTO it, so no reducer ever sees deg² rows
    // (see operators.TriangleCount). The oracle re-derives the same
    // count from first principles with the identical orientation rule.
    "p3_triangle_count" -> ((
      (s: SparkSession, d: String) => {
        val edges = supportedPairsFixture(s, d)
        graft.operators.TriangleCount.run(edges, "a", "b")
          .select(col("node").as("part"), col("triangles"))
      },
      Some("""WITH li AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        e AS (
          SELECT a.pk AS a, b.pk AS b
          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY a.pk, b.pk HAVING count(*) >= 2),
        deg AS (
          SELECT n, count(*) AS deg
          FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
          GROUP BY n),
        o AS (
          SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                      THEN e.a ELSE e.b END AS u,
                 CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                      THEN e.b ELSE e.a END AS v,
                 CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                      THEN db.deg ELSE da.deg END AS dv
          FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        tri AS (
          SELECT e1.u, e1.v AS v1, e2.v AS v2
          FROM o e1
          JOIN o e2 ON e1.u = e2.u
            AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
          JOIN o e3 ON e3.u = e1.v AND e3.v = e2.v),
        pn AS (
          SELECT n, count(*) AS triangles
          FROM (SELECT u AS n FROM tri
                UNION ALL SELECT v1 FROM tri
                UNION ALL SELECT v2 FROM tri) t(n)
          GROUP BY n)
      SELECT deg.n AS part, COALESCE(pn.triangles, 0) AS triangles
      FROM deg LEFT JOIN pn ON pn.n = deg.n""")
    )),

    "q40_copurchase_pairs" -> ((
      (s: SparkSession, d: String) =>
        // shared single-shuffle pair derivation; group sizes are
        // bounded by order width, so the fan-out is O(width²) per
        // order, never O(n²)
        copurchasePairs(s, d, ordered = true)
          .select(col("a").as("part_a"), col("b").as("part_b"))
          .groupBy("part_a", "part_b")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
          .limit(20),
      Some("""WITH li AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk
        ORDER BY n_orders DESC, part_a, part_b
        LIMIT 20""")
    )),

    // Market-basket ASSOCIATION RULES over the co-purchase pairs —
    // support / confidence / lift, the classic Agrawal-Srikant
    // output q40's raw pair counts feed: for every pair co-bought in
    // ≥ 2 orders (p3's support prune, which is also what bounds the
    // pair table), both direction confidences and the symmetric lift,
    // all in exact ppm integer arithmetic (cnt·1e6 div base — no
    // float division to drift on). Scale shape: the pair derivation
    // is the shared single-shuffle copurchasePairs; item supports are
    // one distinct-(order, part) aggregate whose part-cardinality
    // result BROADCASTS onto the pair table twice; the order count is
    // a broadcast scalar. Nothing touches pairs that fail support.
    "q58_association_rules" -> ((
      (s: SparkSession, d: String) =>
        // delegates to the library miner (one definition per
        // semantics — the Bm25/RangeJoin promotion rule); its
        // internal pair derivation is the same one-shuffle
        // collect_set shape as copurchasePairs, on set semantics
        graft.operators.AssocRules.mine(
            t(s, d, "lineitem").select(col("l_orderkey").as("ok"),
              col("l_partkey").as("pk")),
            "ok", "pk", minPairSupport = 2L)
          .withColumnRenamed("item_a", "part_a")
          .withColumnRenamed("item_b", "part_b"),
      Some("""WITH li AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
          pairs AS (
            SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_ab
            FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY 1, 2 HAVING count(*) >= 2),
          item AS (SELECT pk, count(*) AS n FROM li GROUP BY 1),
          o AS (SELECT count(DISTINCT ok) AS n_orders FROM li)
        SELECT p.part_a, p.part_b, p.n_ab, ia.n AS n_a, ib.n AS n_b,
               CAST(p.n_ab * 1000000 // ia.n AS BIGINT) AS conf_ab_ppm,
               CAST(p.n_ab * 1000000 // ib.n AS BIGINT) AS conf_ba_ppm,
               CAST(p.n_ab * o.n_orders * 1000000 // (ia.n * ib.n)
                 AS BIGINT) AS lift_ppm
        FROM pairs p
        JOIN item ia ON p.part_a = ia.pk
        JOIN item ib ON p.part_b = ib.pk, o""")
    )),

    "q37_scd2_merge" -> ((
      (s: SparkSession, d: String) => {
        val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
        val ev = Derived.events(s, d)
        // history: SCD2 intervals from pre-cutoff events (q36 logic)
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val hist = ev.filter(col("ts") < cutoff)
          .withColumn("prev_type", lag("event_type", 1).over(byUser))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .withColumn("valid_to", lead("ts", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")))
          .select(col("user_id"), col("event_type"),
            col("ts").as("valid_from"), col("valid_to"))
        // changes: each user's earliest post-cutoff event
        val chg = ev.filter(col("ts") >= cutoff)
          .groupBy("user_id")
          .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
            .as("c"))
          .select(col("user_id"), col("c.ts").as("chg_ts"),
            col("c.event_type").as("chg_type"))
        val merged = hist.join(chg, Seq("user_id"), "left")
          .withColumn("closes",
            col("valid_to").isNull && col("chg_type").isNotNull &&
              col("chg_type") =!= col("event_type"))
          .select(col("user_id"), col("event_type"), col("valid_from"),
            when(col("closes"), col("chg_ts")).otherwise(col("valid_to"))
              .as("valid_to"))
        val appended = hist.filter(col("valid_to").isNull)
          .join(chg, Seq("user_id"))
          .filter(col("chg_type") =!= col("event_type"))
          .select(col("user_id"), col("chg_type").as("event_type"),
            col("chg_ts").as("valid_from"),
            lit(null).cast("timestamp").as("valid_to"))
        // epoch-micros export (q12/q13 driver portability rationale)
        merged.unionByName(appended)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("valid_from")).as("valid_from_us"),
            unix_micros(col("valid_to")).as("valid_to_us"))
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events),
        marked AS (
          SELECT user_id, event_id, event_type, ts,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
          FROM e WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        hist AS (
          SELECT user_id, event_type, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
          FROM marked
          WHERE prev_type IS NULL OR prev_type <> event_type),
        chg AS (
          SELECT user_id,
                 min({'ts': ts, 'event_id': event_id, 'event_type': event_type}).ts AS chg_ts,
                 min({'ts': ts, 'event_id': event_id, 'event_type': event_type}).event_type AS chg_type
          FROM e WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
          GROUP BY user_id),
        merged AS (
          SELECT h.user_id, h.event_type, h.valid_from,
                 CASE WHEN h.valid_to IS NULL AND c.chg_type IS NOT NULL
                           AND c.chg_type <> h.event_type
                      THEN c.chg_ts ELSE h.valid_to END AS valid_to
          FROM hist h LEFT JOIN chg c ON h.user_id = c.user_id),
        appended AS (
          SELECT h.user_id, c.chg_type AS event_type,
                 c.chg_ts AS valid_from, NULL::TIMESTAMP AS valid_to
          FROM hist h JOIN chg c ON h.user_id = c.user_id
          WHERE h.valid_to IS NULL AND c.chg_type <> h.event_type)
        SELECT user_id, event_type,
               epoch_us(valid_from) AS valid_from_us,
               epoch_us(valid_to) AS valid_to_us
        FROM (SELECT * FROM merged UNION ALL SELECT * FROM appended)""")
    )),

    // Explicit grouping sets through the engine's SQL surface.
    "q21_grouping_sets" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
            count(*) AS n, round(sum(o_totalprice), 2) AS total
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    )),

    // grouping_id disambiguation: CUBE emits NULL both for rolled-up
    // cells and for genuinely-NULL group values; grouping_id() is the
    // bitmask that tells them apart (first listed column = high bit —
    // the same convention in both engines). Emitted so downstream
    // consumers can filter exact aggregation levels.
    "q43_grouping_id" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total")),
      Some("""SELECT o_orderstatus, o_orderpriority,
            GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
            count(*) AS n, round(sum(o_totalprice), 2) AS total
          FROM orders
          GROUP BY CUBE (o_orderstatus, o_orderpriority)""")
    )),

    // Unpivot (melt): wide metric columns to long (metric, value) rows.
    "q27_unpivot_lineitem" -> ((
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "value"),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
            l_quantity AS value FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""")
    )),

    // Correlated scalar subquery (Catalyst decorrelates it into a
    // left outer aggregate join).
    "q25_correlated_subquery" -> ((
      (s: SparkSession, d: String) => {
        t(s, d, "customer").createOrReplaceTempView("customer_v")
        t(s, d, "orders").createOrReplaceTempView("orders_v2")
        s.sql("""SELECT c_custkey, c_name,
            (SELECT round(max(o_totalprice), 2) FROM orders_v2
             WHERE o_custkey = c_custkey) AS max_order
          FROM customer_v""")
      },
      Some("""SELECT c_custkey, c_name,
          (SELECT round(max(o_totalprice), 2) FROM orders
           WHERE o_custkey = c_custkey) AS max_order
        FROM customer""")
    )),

    // Pivot: event counts per user spread across type columns.
    "q23_pivot_event_types" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .groupBy("user_id")
          .pivot("event_type",
            Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0),
      Some("""SELECT user_id,
          count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
          count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
          count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
          count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
          count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events GROUP BY user_id""")
    )),

    // Range-frame window: per-user trailing-hour event-value sum,
    // framed by VALUE RANGE over epoch seconds (not row counts).
    "q24_trailing_hour_sum" -> ((
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_sec"))
          .rangeBetween(-3599, Window.currentRow)
        Derived.events(s, d)
          .withColumn("ts_sec", unix_timestamp(col("ts")))
          .withColumn("trailing_hour_sum", round(sum("value").over(w), 2))
          .select("event_id", "user_id", "ts_sec", "trailing_hour_sum")
      },
      Some("""SELECT event_id, user_id, ts_sec,
          round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_sec
            RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW), 2)
            AS trailing_hour_sum
        FROM (SELECT event_id, user_id,
                CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
              FROM events)""")
    )),

    // JSON extraction from the event payload.
    // try_cast on BOTH engines: a fractional or non-numeric $.k must
    // drop the row identically everywhere (a JSON-typed CAST in DuckDB
    // would ROUND 50.5 to 50 while Spark's string cast nulls/throws)
    "q16_json_props" -> ((
      (s: SparkSession, d: String) =>
        Derived.events(s, d)
          .select(col("event_id"),
            expr("try_cast(get_json_object(props, '$.k') AS LONG)").as("k"))
          .filter(col("k") > 50),
      Some("""SELECT event_id,
          TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""")
    )),
  )
}
