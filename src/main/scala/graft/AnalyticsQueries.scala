package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Sources

/**
 * SURVEY.md §2 rows 19-24: analytical queries over the star schema —
 * the scale exercise beyond dragnet's count-only surface. Plans are built
 * the way they should run on a 1000-executor cluster: dims broadcast,
 * facts shuffle only on their join/group keys, money math in DECIMAL so
 * results are bit-identical regardless of aggregation order (a DOUBLE sum
 * is order-dependent and would flake the hash compare — and on a real
 * cluster, would flake between runs).
 */
object AnalyticsQueries {

  /** Target relative standard deviation for the HLL sketch — the
    * single source for both the sketch precision and its gate bound. */
  private val HllRsd = 0.02

  /** Exact money term: l_extendedprice * (1 - l_discount) as DECIMAL. */
  private def revExpr = (col("l_extendedprice").cast("decimal(18,2)") *
    (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  def all: Seq[Q] = Seq(

    // #19 wide aggregation, multiple exact measures (TPC-H Q1 shape)
    Q("q1_pricing",
      (s, dir) => {
        val l = Sources.table(s, dir, "lineitem")
          .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base"),
            sum(revExpr).cast("double").as("sum_disc"),
            sum(revExpr * (lit(1).cast("decimal(18,2)") +
              col("l_tax").cast("decimal(18,2)"))).cast("double").as("sum_charge"),
            (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
          CAST(SUM($revSql) AS DOUBLE) AS sum_disc,
          CAST(SUM($revSql * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // #20 fact-fact join with a broadcast dim filter (TPC-H Q3 shape).
    // customer is the small side → broadcast; orders⋈lineitem shuffles on
    // the order key only.
    Q("q3_shipping",
      (s, dir) => {
        val cut = lit("1998-03-15").cast("timestamp")
        val c = Sources.table(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
        val o = Sources.table(s, dir, "orders").where(col("o_orderdate") < cut)
        val l = Sources.table(s, dir, "lineitem").where(col("l_shipdate") > cut)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(sum(revExpr).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(20)
      },
      Some(s"""
        SELECT o_orderkey, o_orderdate, CAST(SUM($revSql) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 20""")),

    // #21 dim-chain multi-join (TPC-H Q5 shape): region→nation→customer and
    // supplier broadcast; the only shuffles are the two fact joins.
    Q("q5_local",
      (s, dir) => {
        val r = Sources.table(s, dir, "region").where(col("r_name") === "ASIA")
        val n = Sources.table(s, dir, "nation")
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        val c = Sources.table(s, dir, "customer")
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        val sup = Sources.table(s, dir, "supplier")
        val o = Sources.table(s, dir, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                 col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val l = Sources.table(s, dir, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(revExpr).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""
        SELECT n_name, CAST(SUM($revSql) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1 ORDER BY revenue DESC, n_name""")),

    // #22 top-k with deterministic tie-break — TakeOrderedAndProject, no
    // full sort of the fact table.
    Q("q_topk_orders",
      (s, dir) => Sources.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // #23 exact distinct count per group (two-phase under the hood)
    Q("q_user_counts",
      (s, dir) => Sources.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy(col("event_type")),
      Some("""
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        FROM events GROUP BY 1 ORDER BY 1""")),

    // #23b approximate distinct (HyperLogLog++): single-pass mergeable
    // sketch — THE distinct-count at 100 TB (exact needs a key shuffle;
    // the sketch merges map-side in fixed memory). DuckDB's HLL is a
    // different implementation, so the sketch VALUE can't hash-match an
    // oracle — but the sketch's CONTRACT can: the output carries the
    // exact count plus a per-group `approx_ok` = |approx − exact| ≤
    // 3.5·rsd of exact (~3.5σ of the sketch's advertised error — wide
    // enough that a data regen or new scale factor can't legitimately
    // trip it, tight enough that a real HLL regression lands red), and
    // the oracle asserts TRUE for every group. The bound DERIVES from
    // the rsd parameter so the contract and the gate cannot drift.
    Q("q_user_counts_approx",
      (s, dir) => Sources.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), HllRsd).as("approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")) <=
            lit(3.5 * HllRsd) * col("exact_users")).as("approx_ok"))
        .orderBy(col("event_type")),
      Some("""
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
          AS exact_users, TRUE AS approx_ok
        FROM events GROUP BY 1 ORDER BY 1""")),

    // #24b hierarchical rollup: subtotals at every grouping level in one
    // pass (partial aggregation handles all levels map-side)
    Q("q_rollup",
      (s, dir) => Sources.table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""")),

    // #24c bucket-bounded percentiles of order totals: an lquantize
    // histogram (step 100 on a ~[900, 560k] price axis → a few thousand
    // occupied buckets) + a cumulative walk, NOT Spark's exact
    // `percentile` — whose merged state is a map of every distinct
    // value and whose final-merge task is the one place a 100 TB run
    // would concentrate hundreds of MB. The histogram groupBy is
    // map-side combined and the walk's state is bounded by the bucket
    // count; each percentile resolves to its bucket's lower edge.
    Q("q_percentiles",
      (s, dir) => graft.plans.Quantiles.histQuantiles(
        Sources.table(s, dir, "orders"), col("o_totalprice"), 100.0,
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)),
      Some(s"""
        SELECT CAST(p50 * 100.0 AS DOUBLE) AS p50,
               CAST(p90 * 100.0 AS DOUBLE) AS p90,
               CAST(p99 * 100.0 AS DOUBLE) AS p99
        FROM ${graft.plans.Quantiles.bucketsSql("orders", "o_totalprice",
          100.0, Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))}""")),

    // #24 window function: sessionize per user with a 30-minute gap rule —
    // one shuffle on user_id, window runs within partitions.
    Q("q_sessionize",
      (s, dir) => {
        val e = Sources.events(s, dir)
          .select(col("user_id"), col("event_id"),
            graft.functions.epochSecs(col("ts")).as("sec"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        e.withColumn("prev", lag(col("sec"), 1).over(w))
          .withColumn("new_session",
            when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L)
              .otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).cast("long").as("sessions"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH d AS (
          SELECT user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                 lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY event_id) AS prev
          FROM events)
        SELECT user_id,
               CAST(SUM(CASE WHEN prev IS NULL OR sec - prev > 1800
                             THEN 1 ELSE 0 END) AS BIGINT) AS sessions
        FROM d GROUP BY 1 ORDER BY 1""")),

    // #24b running revenue per customer over order dates (cumulative
    // window — the time-series reporting shape; DECIMAL math so the
    // running sum is order-independent-exact, then cast for output)
    Q("q_running_total",
      (s, dir) => {
        val o = Sources.table(s, dir, "orders")
          .where(col("o_custkey") <= 100)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice").cast("decimal(18,2)").as("p"))
          .withColumn("running",
            sum(col("p")).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .select(col("o_custkey").cast("long").as("o_custkey"),
            col("o_orderkey").cast("long").as("o_orderkey"),
            col("running").cast("double").as("running"))
      },
      Some("""
        SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
          CAST(o_orderkey AS BIGINT) AS o_orderkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS running
        FROM orders WHERE o_custkey <= 100""")),

    // #24c backward as-of join (kdb aj / pandas merge_asof): each error
    // event annotated with the same user's most recent click at-or-before
    // it. ScaleJoins.asofJoin is union-tag + one window pass — one
    // shuffle on user_id, linear in |errors|+|clicks|; the naive
    // formulations (theta-join on c.ts <= e.ts, or a per-row max
    // subquery) plan as a cartesian / repeated rescans and melt at
    // scale. The oracle states the SEMANTICS as the correlated subquery
    // (fine at oracle scale); the Spark side is the scalable plan.
    Q("q_asof_join",
      (s, dir) => {
        val e = Sources.events(s, dir).select(col("event_id"),
          col("user_id"), graft.functions.epochSecs(col("ts")).as("sec"),
          col("event_type"))
        val errors = e.where(col("event_type") === "error")
          .select("event_id", "user_id", "sec")
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id"), col("sec"))
        graft.plans.ScaleJoins.asofJoin(errors, clicks, "user_id", "sec",
            rightCols = Seq("sec"), prefix = "click_")
          .select(col("event_id").cast("long").as("event_id"),
            col("user_id").cast("long").as("user_id"),
            col("sec"), col("click_sec"))
      },
      Some("""
        SELECT CAST(e.event_id AS BIGINT) AS event_id,
          CAST(e.user_id AS BIGINT) AS user_id,
          CAST(floor(epoch(e.ts)) AS BIGINT) AS sec,
          (SELECT max(CAST(floor(epoch(c.ts)) AS BIGINT)) FROM events c
           WHERE c.user_id = e.user_id AND c.event_type = 'click'
             AND floor(epoch(c.ts)) <= floor(epoch(e.ts))) AS click_sec
        FROM events e WHERE e.event_type = 'error'""")),

    // #24k CUSUM changepoint estimation per event type: over the same
    // dense hour grid as q_rate_anomaly, the hour k maximizing the
    // |scaled CUSUM| |c·prefix_k(n) − k·S| — the classic single-
    // changepoint estimate, drift detection for a live pipeline. The
    // statistic is INTEGER (mean scaled away by c), the argmax is a
    // struct-min election (largest score, earliest hour on ties), so
    // the whole gate is float-free; one ordered window per type over
    // calendar-bounded rows.
    Q("q_changepoint",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourUs = 3600000000L
        val e = Sources.events(s, dir)
          .select(col("event_type"),
            graft.functions.epochMicros(col("ts")).as("tu"))
          .select(col("event_type"), expr(s"tu div ${hourUs}L").as("hour"))
        val bounds = e.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        val hours = bounds
          .select(explode(sequence(col("h0"), col("h1"))).as("hour"))
        val grid = e.select(col("event_type")).distinct()
          .crossJoin(broadcast(hours))
        val dense = grid
          .join(e.groupBy(col("event_type"), col("hour"))
            .agg(count(lit(1)).as("n")), Seq("event_type", "hour"),
            "left_outer")
          .select(col("event_type"), col("hour"),
            coalesce(col("n"), lit(0L)).as("n"))
        val stats = dense.groupBy(col("event_type"))
          .agg(count(lit(1)).as("c"), sum(col("n")).as("s"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dense.join(broadcast(stats), Seq("event_type"))
          .select(col("event_type"), col("hour"),
            (col("c") * sum(col("n")).over(w) -
              row_number().over(
                Window.partitionBy(col("event_type")).orderBy(col("hour")))
                .cast("long") * col("s")).as("dev"))
          .select(col("event_type"), col("hour"), abs(col("dev")).as("score"))
          .groupBy(col("event_type"))
          .agg(min(struct((-col("score")).as("ns"), col("hour"))).as("m"))
          .select(col("event_type"), col("m.hour").as("cp_hour"),
            (-col("m.ns")).as("cusum_stat"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hour
          FROM events),
        b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
        hrs AS (SELECT unnest(range(h0, h1 + 1)) AS hour FROM b),
        ty AS (SELECT DISTINCT event_type FROM e),
        cnt AS (SELECT event_type, hour, count(*) AS n
                FROM e GROUP BY 1, 2),
        dense AS (
          SELECT ty.event_type, hrs.hour, coalesce(cnt.n, 0) AS n
          FROM ty CROSS JOIN hrs
          LEFT JOIN cnt ON cnt.event_type = ty.event_type
            AND cnt.hour = hrs.hour),
        st AS (SELECT event_type, count(*) AS c, sum(n) AS s
               FROM dense GROUP BY 1),
        dev AS (
          SELECT d.event_type, d.hour,
            abs(st.c * sum(d.n) OVER (PARTITION BY d.event_type
                ORDER BY d.hour ROWS UNBOUNDED PRECEDING)
              - (row_number() OVER (PARTITION BY d.event_type
                  ORDER BY d.hour)) * st.s) AS score
          FROM dense d JOIN st USING (event_type)),
        pick AS (
          SELECT event_type, min({'ns': -score, 'hour': hour}) AS m
          FROM dev GROUP BY 1)
        SELECT event_type, m.hour AS cp_hour,
          CAST(-m.ns AS BIGINT) AS cusum_stat
        FROM pick""")),

    // #24j pivot: the day × event-type count matrix via the native
    // .pivot() operator with a PINNED column list (an unpinned pivot
    // would scan once just to discover columns and make the output
    // schema data-dependent — both wrong at scale). One groupBy with
    // map-side combine; output is days × 5 columns.
    Q("q_pivot_daily",
      (s, dir) => {
        val day = 86400000000L
        val types = Seq("click", "error", "purchase", "signup", "view")
        val e = Sources.events(s, dir)
          .select(graft.functions.epochMicros(col("ts")).as("tu"),
            col("event_type"))
          .select(expr(s"tu div ${day}L").as("day"), col("event_type"))
        e.groupBy(col("day")).pivot("event_type", types).count()
          .select(col("day") +:
            types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      },
      Some("""
        WITH e AS (
          SELECT epoch_us(ts) // 86400000000 AS day, event_type
          FROM events)
        SELECT day,
          CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS click,
          CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS error,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS purchase,
          CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS BIGINT) AS signup,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS "view"
        FROM e GROUP BY day""")),

    // #24i trailing-window time series: daily revenue plus its 7-day
    // RANGE-frame rolling sum — the frame type the cumulative
    // (q_running_total) and sliding-count shapes don't cover: RANGE
    // over an integer day axis skips missing days (a gap day does NOT
    // shrink the window to 7 rows of older data). Revenue aggregates
    // exactly in DECIMAL before the window, and the window input is
    // calendar-bounded (one row per active day), so the global
    // range-sort never sees corpus-shaped data.
    Q("q_rolling_7d",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Sources.table(s, dir, "orders")
          .select(datediff(col("o_orderdate").try_cast("date"),
            lit("1992-01-01").cast("date")).cast("long").as("day_num"),
            col("o_totalprice").cast("decimal(18,2)").as("p"))
          .groupBy(col("day_num"))
          .agg(sum(col("p")).as("rev"))
        val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
        daily.select(col("day_num"),
            col("rev").cast("double").as("revenue"),
            sum(col("rev")).over(w).cast("double").as("revenue_7d"))
      },
      Some("""
        WITH daily AS (
          SELECT date_diff('day', DATE '1992-01-01',
              CAST(o_orderdate AS DATE)) AS day_num,
            sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1)
        SELECT day_num,
          CAST(rev AS DOUBLE) AS revenue,
          CAST(sum(rev) OVER (ORDER BY day_num
            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS revenue_7d
        FROM daily""")),

    // #24h sessionization via the NATIVE session_window operator (the
    // Spark-first twin of q_sessionize's hand-rolled lag windows and
    // stream_sessionize's state machine): per (user, session) the
    // merged [first, last+gap) window and its event count. The oracle
    // states the same semantics as gaps-and-islands SQL — new island
    // when the gap is >= 30min (session_window's right-open merge
    // rule), island id by running sum, window end = last + gap.
    Q("q_session_window",
      (s, dir) => {
        val e = Sources.events(s, dir).select(col("user_id"),
          col("ts").try_cast("timestamp").as("ts"))
        e.groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("events"))
          .select(col("user_id").cast("long").as("user_id"),
            expr("unix_micros(w.start)").as("session_start"),
            expr("unix_micros(w.end)").as("session_end"),
            col("events").cast("long").as("events"))
      },
      Some("""
        WITH d AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
        o AS (SELECT user_id, tu,
                lag(tu) OVER (PARTITION BY user_id ORDER BY tu) AS prev
              FROM d),
        f AS (SELECT user_id, tu,
                CASE WHEN prev IS NULL OR tu - prev >= 1800000000
                     THEN 1 ELSE 0 END AS ns
              FROM o),
        g AS (SELECT user_id, tu,
                sum(ns) OVER (PARTITION BY user_id ORDER BY tu
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM f)
        SELECT CAST(user_id AS BIGINT) AS user_id,
          min(tu) AS session_start,
          max(tu) + 1800000000 AS session_end,
          CAST(count(*) AS BIGINT) AS events
        FROM g GROUP BY user_id, sid""")),

    // #20d the skew-salting primitive GATED (ScaleJoins.saltedJoin was
    // spec-only): orders⋈customer on the salted (key, salt) pair must
    // equal the plain join the oracle states — salting must never
    // change results, only spread a hot key over `salts` reducers.
    Q("q_salted_join",
      (s, dir) => {
        val o = Sources.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val c = Sources.table(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        graft.plans.ScaleJoins.saltedJoin(o, c, "o_custkey", salts = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("long").as("orders"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("revenue"))
      },
      Some("""
        SELECT c.c_mktsegment,
          CAST(count(*) AS BIGINT) AS orders,
          CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1""")),

    // #24g statistical rate anomaly detection over a DENSE time grid:
    // per (event_type, hour) counts including the zero hours (the grid
    // explodes from a single-row bounds agg × the broadcast type list —
    // calendar-shaped, never event-shaped), z-scored against that
    // type's own hourly distribution. The |z|>2 DECISION is exact
    // integer arithmetic — (c·n−S)²·(c−1) > 4c(c·SS−S²) in
    // decimal(38)/HUGEINT — so float summation can never flip a
    // boundary cell; z itself surfaces as a display double.
    Q("q_rate_anomaly",
      (s, dir) => {
        val hourUs = 3600000000L
        val e = Sources.events(s, dir)
          .select(col("event_type"),
            graft.functions.epochMicros(col("ts")).as("tu"))
          .select(col("event_type"), expr(s"tu div ${hourUs}L").as("hour"))
        val bounds = e.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        val hours = bounds
          .select(explode(sequence(col("h0"), col("h1"))).as("hour"))
        val types = e.select(col("event_type")).distinct()
        val grid = types.crossJoin(broadcast(hours))
        val counts = e.groupBy(col("event_type"), col("hour"))
          .agg(count(lit(1)).as("n"))
        val dense = grid.join(counts, Seq("event_type", "hour"), "left_outer")
          .select(col("event_type"), col("hour"),
            coalesce(col("n"), lit(0L)).as("n"))
        val stats = dense.groupBy(col("event_type")).agg(
          count(lit(1)).as("c"), sum(col("n")).as("s"),
          sum(col("n") * col("n")).as("ss"))
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        dense.join(broadcast(stats), Seq("event_type"))
          .select(col("event_type"), col("hour"), col("n"),
            ((dd(col("n")) - dd(col("s")) / dd(col("c"))) /
              sqrt((dd(col("c")) * dd(col("ss")) - dd(col("s")) * dd(col("s"))) /
                (dd(col("c")) * (dd(col("c")) - lit(1.0))))).as("z"),
            ((dec(col("c")) * dec(col("n")) - dec(col("s"))) *
              (dec(col("c")) * dec(col("n")) - dec(col("s"))) *
              (dec(col("c")) - dec(lit(1))) >
              dec(lit(4)) * dec(col("c")) *
                (dec(col("c")) * dec(col("ss")) - dec(col("s")) * dec(col("s"))))
              .as("anomalous"))
      },
      Some("""
        WITH e AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hour FROM events),
        b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
        hrs AS (SELECT unnest(range(h0, h1 + 1)) AS hour FROM b),
        ty AS (SELECT DISTINCT event_type FROM e),
        cnt AS (SELECT event_type, hour, count(*) AS n FROM e GROUP BY 1, 2),
        dense AS (
          SELECT ty.event_type, hrs.hour, coalesce(cnt.n, 0) AS n
          FROM ty CROSS JOIN hrs
          LEFT JOIN cnt ON cnt.event_type = ty.event_type
            AND cnt.hour = hrs.hour),
        st AS (SELECT event_type, count(*) AS c, sum(n) AS s,
                 sum(n*n) AS ss FROM dense GROUP BY 1)
        SELECT d.event_type, d.hour, CAST(d.n AS BIGINT) AS n,
          (CAST(d.n AS DOUBLE) - CAST(st.s AS DOUBLE) / CAST(st.c AS DOUBLE))
            / sqrt((CAST(st.c AS DOUBLE) * CAST(st.ss AS DOUBLE)
                - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
              / (CAST(st.c AS DOUBLE) * (CAST(st.c AS DOUBLE) - 1.0))) AS z,
          (CAST(st.c AS HUGEINT) * CAST(d.n AS HUGEINT)
              - CAST(st.s AS HUGEINT))
            * (CAST(st.c AS HUGEINT) * CAST(d.n AS HUGEINT)
              - CAST(st.s AS HUGEINT))
            * (CAST(st.c AS HUGEINT) - 1)
            > 4 * CAST(st.c AS HUGEINT)
              * (CAST(st.c AS HUGEINT) * CAST(st.ss AS HUGEINT)
                - CAST(st.s AS HUGEINT) * CAST(st.s AS HUGEINT)) AS anomalous
        FROM dense d JOIN st USING (event_type)""")),

    // #24e cohort retention: users cohorted by first-active day, then
    // the day-offset activity matrix for the first week — the other
    // classic product-analytics shape next to funnels. (user, day)
    // de-dups first so the final count is a plain count (a user hits
    // each (cohort, offset) cell at most once — no count-distinct
    // expand); the user-keyed groupBy and join share one partitioning.
    // Output is cohorts×7 cells, never event-shaped.
    Q("q_retention",
      (s, dir) => {
        val day = 86400000000L
        val e = Sources.events(s, dir)
          .select(col("user_id"),
            graft.functions.epochMicros(col("ts")).as("tu"))
          .select(col("user_id"), expr(s"tu div ${day}L").as("day"))
        val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        val active = e.distinct()
        active.join(cohorts, Seq("user_id"))
          .withColumn("off", col("day") - col("cohort"))
          .where(col("off").between(0, 6))
          .groupBy(col("cohort"), col("off"))
          .agg(count(lit(1)).as("active_users"))
          .select(col("cohort"), col("off"),
            col("active_users").cast("long").as("active_users"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
        a AS (SELECT DISTINCT user_id, day FROM e)
        SELECT c.cohort, a.day - c.cohort AS off,
          CAST(count(*) AS BIGINT) AS active_users
        FROM a JOIN c USING (user_id)
        WHERE a.day - c.cohort BETWEEN 0 AND 6
        GROUP BY 1, 2""")),

    // #24c funnel analysis: per user, the earliest ORDERED
    // view → click → purchase chain (each stage strictly after the
    // previous stage's time) and whether it completed inside one day —
    // product-analytics sequential pattern matching. Stage times chain
    // through three whole-partition conditional-min windows over the
    // SAME user partitioning, so Catalyst plans ONE exchange + one sort
    // serving all three (no per-stage self-joins; the oracle states the
    // semantics as the chained joins instead).
    Q("q_funnel",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
        val e = Sources.events(s, dir).select(col("user_id"),
          graft.functions.epochMicros(col("ts")).as("tu"), col("event_type"))
        e.withColumn("t1",
            min(when(col("event_type") === "view", col("tu"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("tu") > col("t1"),
              col("tu"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("tu") > col("t2"),
              col("tu"))).over(w))
          .groupBy(col("user_id"))
          .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
            min(col("t3")).as("t3"))
          .select(col("user_id").cast("long").as("user_id"),
            col("t1"), col("t2"), col("t3"),
            coalesce(col("t3") - col("t1") <= lit(86400000000L), lit(false))
              .as("completed"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
        s1 AS (SELECT user_id, min(tu) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(tu) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND tu > s1.t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(tu) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND tu > s2.t2 GROUP BY 1)
        SELECT CAST(u.user_id AS BIGINT) AS user_id, s1.t1, s2.t2, s3.t3,
          coalesce(s3.t3 - s1.t1 <= 86400000000, FALSE) AS completed
        FROM (SELECT DISTINCT user_id FROM e) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)""")),

    // #45b global time-range (interval) join: per purchase event, count
    // and sum ALL events — any user, any type — in its trailing
    // 10-minute window. No equi key exists, so the naive theta-join is
    // a |probe|×|build| nested loop; ScaleJoins.binnedRangeJoin makes
    // it bin-equi + residual (each build row in exactly one bin, each
    // probe spanning two), linear in event density. The oracle states
    // the semantics as the plain inequality join (fine at oracle
    // scale). Zero-match probes surface with n_prior=0 via the
    // aggregate-then-left-join-back composition.
    Q("q_interval_join",
      (s, dir) => {
        val winUs = 600000000L
        val e = Sources.events(s, dir).select(col("event_id"),
          graft.functions.epochMicros(col("ts")).as("tu"),
          col("event_type"), col("value"))
        val probe = e.where(col("event_type") === "purchase")
          .select(col("event_id"), col("tu"))
        val build = e.select(col("tu").as("btu"), col("value"))
        val matched = graft.plans.ScaleJoins
          .binnedRangeJoin(probe, "tu", build, "btu", winUs)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_prior"), sum(col("value")).as("v_prior"))
        probe.join(matched, Seq("event_id"), "left_outer")
          .select(col("event_id").cast("long").as("event_id"), col("tu"),
            coalesce(col("n_prior"), lit(0L)).cast("long").as("n_prior"),
            coalesce(col("v_prior"), lit(0.0)).as("v_prior"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, epoch_us(ts) AS tu, event_type, value
          FROM events),
        p AS (SELECT event_id, tu FROM e WHERE event_type = 'purchase')
        SELECT CAST(p.event_id AS BIGINT) AS event_id, p.tu,
          CAST(count(b.tu) AS BIGINT) AS n_prior,
          coalesce(sum(b.value), 0.0) AS v_prior
        FROM p LEFT JOIN e b
          ON b.tu >= p.tu - 600000000 AND b.tu < p.tu
        GROUP BY p.event_id, p.tu""")),

    // #21b anti-join: customers with no big-ticket orders (TPC-H Q22
    // flavor — the left_anti shape; at scale the orders side aggregates
    // to distinct keys before the join, so the anti probe is key-sized)
    Q("q_no_orders",
      (s, dir) => {
        val c = Sources.table(s, dir, "customer")
        val o = Sources.table(s, dir, "orders")
          .where(col("o_totalprice") > 300000.0)
          .select(col("o_custkey"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey").cast("long").as("c_custkey"),
            col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        ORDER BY c_custkey"""))
  )
}
