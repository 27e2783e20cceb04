package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.sources.Catalog

/** The relational operator inventory (SURVEY.md §2.3-§2.8) as
  * oracle-checked queries over the TPC-H-ish testdata.
  *
  * Determinism rules (SURVEY.md §5): every query carries a total-order
  * ORDER BY; no processing-time columns; money sums go through
  * `Num.moneySum` (terms cast to exact decimal before aggregation, so
  * partial-aggregation order can never flip the rounded value — see
  * Num.scala); per-row arithmetic is emitted UNROUNDED (IEEE doubles
  * are bit-deterministic — rounding would only add half-even boundary
  * risk).
  */
object RelationalQueries {

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")

  val entries: Seq[QueryDef] = Seq(

    // ---- A4/A6/P1/P5: flagship pricing summary (TPC-H Q1 shape) ------
    QueryDef("q01_pricing_summary",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        l.filter(col("l_shipdate") <= lit(ts("1998-09-02")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            Num.moneySum(col("l_quantity"), 2).as("sum_qty"),
            Num.moneySum(col("l_extendedprice"), 0).as("sum_base_price"),
            Num.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 0)
              .as("sum_disc_price"),
            Num.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax")), 0).as("sum_charge"),
            Num.moneyAvg(col("l_quantity"), 2).as("avg_qty"),
            Num.moneyAvg(col("l_extendedprice"), 2).as("avg_price"),
            Num.moneyAvg(col("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))),2) AS DOUBLE) AS sum_qty,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))),0) AS DOUBLE) AS sum_base_price,
        CAST(round(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))),0) AS DOUBLE) AS sum_disc_price,
        CAST(round(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(25,6))),0) AS DOUBLE) AS sum_charge,
        CASE WHEN sum(CAST(l_quantity AS DECIMAL(25,6))) < 0 THEN -1.0 ELSE 1.0 END
          * round(((2*abs(CAST(sum(CAST(l_quantity AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(l_quantity)*10000)
              - (2*abs(CAST(sum(CAST(l_quantity AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(l_quantity)*10000)
                % (2*count(l_quantity)*10000))
            / (2.0*count(l_quantity)*10000), 0) / 100.0 AS avg_qty,
        CASE WHEN sum(CAST(l_extendedprice AS DECIMAL(25,6))) < 0 THEN -1.0 ELSE 1.0 END
          * round(((2*abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(l_extendedprice)*10000)
              - (2*abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(l_extendedprice)*10000)
                % (2*count(l_extendedprice)*10000))
            / (2.0*count(l_extendedprice)*10000), 0) / 100.0 AS avg_price,
        CASE WHEN sum(CAST(l_discount AS DECIMAL(25,6))) < 0 THEN -1.0 ELSE 1.0 END
          * round(((2*abs(CAST(sum(CAST(l_discount AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(l_discount)*100)
              - (2*abs(CAST(sum(CAST(l_discount AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(l_discount)*100)
                % (2*count(l_discount)*100))
            / (2.0*count(l_discount)*100), 0) / 10000.0 AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- P1/P5/P6/P7/O1: filter + derived projection + limit ---------
    QueryDef("q02_filter_project",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        l.filter(col("l_returnflag") === "R" &&
            col("l_shipdate").between(ts("1995-01-01"), ts("1995-12-31")))
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"))
          .orderBy("l_orderkey", "l_linenumber").limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber,
        l_extendedprice*(1.0-l_discount) AS revenue
        FROM lineitem
        WHERE l_returnflag='R'
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1995-12-31 00:00:00'
        ORDER BY l_orderkey, l_linenumber LIMIT 100""")),

    // ---- W1/O2: top-k by recency (TakeOrderedAndProject) -------------
    QueryDef("q03_topk_recent",
      (s, dir) => Tables.load(s, dir, "orders")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        o_orderdate FROM orders
        ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 20""")),

    // ---- S6: point lookup (predicate-pushdown point scan) ------------
    QueryDef("q04_point_lookup",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") === 42)
        .orderBy("l_linenumber"),
      Some("""SELECT * FROM lineitem WHERE l_orderkey = 42
        ORDER BY l_linenumber""")),

    // ---- J1/A4: broadcast dimension join + aggregate ------------------
    QueryDef("q05_dim_join_agg",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(r("r_name") === "ASIA")
          .groupBy(n("n_name").as("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            Num.moneySum(col("c_acctbal"), 2).as("total_acctbal"),
            Num.moneyAvg(col("c_acctbal"), 2).as("avg_acctbal"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_customers,
        CAST(round(sum(CAST(c_acctbal AS DECIMAL(25,6))),2) AS DOUBLE) AS total_acctbal,
        CASE WHEN sum(CAST(c_acctbal AS DECIMAL(25,6))) < 0 THEN -1.0 ELSE 1.0 END
          * round(((2*abs(CAST(sum(CAST(c_acctbal AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(c_acctbal)*10000)
              - (2*abs(CAST(sum(CAST(c_acctbal AS DECIMAL(25,6)))*1000000 AS BIGINT)) + count(c_acctbal)*10000)
                % (2*count(c_acctbal)*10000))
            / (2.0*count(c_acctbal)*10000), 0) / 100.0 AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey=n_nationkey
        JOIN region ON n_regionkey=r_regionkey
        WHERE r_name='ASIA' GROUP BY n_name ORDER BY n_name""")),

    // ---- J2/A6: fact-to-fact shuffle join + aggregate -----------------
    QueryDef("q06_fact_join_revenue",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(countDistinct("o_orderkey").as("n_orders"),
            Num.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 0)
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
        CAST(round(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(25,6))),0) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey=l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- J3: left-outer enrich with defaults --------------------------
    QueryDef("q07_left_join_enrich",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val agg = Tables.load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(25,6)")).cast("double")
              .as("spend"))
        c.join(agg, c("c_custkey") === agg("o_custkey"), "left_outer")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            round(coalesce(col("spend"), lit(0.0)), 2).as("spend"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, coalesce(n_orders, 0) AS n_orders,
        round(coalesce(spend, 0), 2) AS spend
        FROM customer LEFT JOIN (
          SELECT o_custkey, count(*) AS n_orders,
            CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
        ORDER BY c_custkey""")),

    // ---- J4/J5: semi join (EXISTS) ------------------------------------
    QueryDef("q08_semi_join",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o.filter(col("o_totalprice") > 400000),
            c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey=c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey""")),

    // ---- J5: anti join (NOT EXISTS) ------------------------------------
    QueryDef("q09_anti_join",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
        ORDER BY c_custkey""")),

    // ---- J6/K6: last-writer-wins upsert (anti-join + union) ------------
    QueryDef("q10_upsert_merge",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val existing = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        val updates = o.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 1.05).as("o_totalprice"),
            lit("U").as("o_orderstatus"))
        Catalog.upsert(existing, updates, "o_orderkey")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            Num.moneySum(col("o_totalprice"), 0).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH updates AS (
          SELECT o_orderkey, o_totalprice*1.05 AS o_totalprice,
                 'U' AS o_orderstatus
          FROM orders WHERE o_orderkey % 10 = 0),
        merged AS (
          SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM updates u
                            WHERE u.o_orderkey = o.o_orderkey)
          UNION ALL SELECT * FROM updates)
        SELECT o_orderstatus, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))),0) AS DOUBLE) AS total
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- W1 per-group top-k via the CUSTOM physical operator -------------
    // graft.plans.TopKPerGroup: bounded per-key heaps instead of a full
    // window sort; oracle is the row_number formulation.
    QueryDef("q66_topk_per_group",
      (s, dir) => graft.plans.TopK.perGroup(
          Tables.load(s, dir, "orders").filter(col("o_custkey") < 200),
          groupCols = Seq("o_custkey"),
          order = Seq(graft.plans.TopK.desc("o_totalprice"),
            graft.plans.TopK.asc("o_orderkey")),
          k = 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc,
          col("o_orderkey")),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders WHERE o_custkey < 200) t
        WHERE rn <= 2
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")),

    // ---- custom operator: as-of join (time-series enrichment) ------------
    // Oracle: DuckDB's native ASOF LEFT JOIN. Right side deduped per
    // (user, ts) so tie-breaking can't diverge between engines.
    QueryDef("q69_asof_join",
      (s, dir) => {
        val ev = Tables.eventsWithTime(s, dir)
          .groupBy("user_id", "event_time")
          .agg(max("value").as("value"))
        val checkpoints = ev.filter(col("user_id") <= 20)
          .select("user_id").distinct()
          .withColumn("k", explode(sequence(lit(0), lit(4))))
          .withColumn("cts",
            timestamp_seconds(lit(1704067200L) + col("k") * 3600L))
          .drop("k")
        graft.operators.AsOfJoin
          .leftAsOf(checkpoints, ev, "user_id", "cts", "event_time")
          .orderBy("user_id", "cts")
      },
      Some("""WITH ev AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ets,
            max(value) AS value
          FROM events GROUP BY 1, 2),
        cp AS (
          SELECT u.user_id,
            make_timestamp(1704067200000000 + h.k * 3600 * 1000000) AS cts
          FROM (SELECT DISTINCT user_id FROM ev WHERE user_id <= 20) u,
               (SELECT unnest(range(0, 5)) AS k) h)
        SELECT cp.user_id, cp.cts, e.ets AS matched_ts, e.value
        FROM cp ASOF LEFT JOIN ev e
          ON cp.user_id = e.user_id AND cp.cts >= e.ets
        ORDER BY cp.user_id, cp.cts""")),

    // ---- custom operator: FORWARD as-of with tolerance -------------------
    // The other half of the merge_asof contract: nearest FOLLOWING right
    // row, and matches further than 30 min are nullified (map-only
    // post-pass — tolerance adds no shuffle). Oracle: DuckDB's forward
    // ASOF JOIN wrapped in the same gap test.
    QueryDef("q101_asof_forward",
      (s, dir) => {
        val ev = Tables.eventsWithTime(s, dir)
          .groupBy("user_id", "event_time")
          .agg(max("value").as("value"))
        val checkpoints = ev.filter(col("user_id") <= 20)
          .select("user_id").distinct()
          .withColumn("k", explode(sequence(lit(0), lit(4))))
          .withColumn("cts",
            timestamp_seconds(lit(1704067200L) + col("k") * 3600L))
          .drop("k")
        graft.operators.AsOfJoin
          .leftAsOf(checkpoints, ev, "user_id", "cts", "event_time",
            forward = true, toleranceSec = Some(1800L))
          .orderBy("user_id", "cts")
      },
      Some("""WITH ev AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ets,
            max(value) AS value
          FROM events GROUP BY 1, 2),
        cp AS (
          SELECT u.user_id,
            make_timestamp(1704067200000000 + h.k * 3600 * 1000000) AS cts
          FROM (SELECT DISTINCT user_id FROM ev WHERE user_id <= 20) u,
               (SELECT unnest(range(0, 5)) AS k) h)
        SELECT user_id, cts,
          CASE WHEN ok THEN ets END AS matched_ts,
          CASE WHEN ok THEN value END AS value
        FROM (SELECT cp.user_id, cp.cts, e.ets, e.value,
            abs(epoch(e.ets) - epoch(cp.cts)) <= 1800 AS ok
          FROM cp ASOF LEFT JOIN ev e
            ON cp.user_id = e.user_id AND cp.cts <= e.ets)
        ORDER BY user_id, cts""")),

    // ---- custom operator: range join (binned point-in-interval) ----------
    // Overlapping price bands × order totals; oracle is the plain
    // BETWEEN theta join.
    QueryDef("q70_range_join",
      (s, dir) => {
        val bands = s.range(0, 12).toDF("band_id")
          .withColumn("lo", col("band_id") * 50000.0)
          .withColumn("hi", col("band_id") * 50000.0 + 80000.0)
        val orders = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
        graft.operators.RangeJoin
          .pointInInterval(orders, "o_totalprice", bands, "lo", "hi",
            binWidth = 50000.0)
          .groupBy("band_id")
          .agg(count(lit(1)).as("n"),
            Num.moneySum(col("o_totalprice"), 0).as("total"))
          .orderBy("band_id")
      },
      Some("""WITH bands AS (
          SELECT k AS band_id, k * 50000.0 AS lo, k * 50000.0 + 80000.0 AS hi
          FROM (SELECT unnest(range(0, 12)) AS k))
        SELECT band_id, count(*) AS n,
          CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))),0) AS DOUBLE)
            AS total
        FROM orders JOIN bands
          ON o_totalprice BETWEEN lo AND hi
        GROUP BY band_id ORDER BY band_id""")),

    // ---- A5: distinct --------------------------------------------------
    QueryDef("q11_distinct_segments",
      (s, dir) => Tables.load(s, dir, "customer")
        .select("c_mktsegment").distinct().orderBy("c_mktsegment"),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // ---- A1/A2: hash aggregate on event type ---------------------------
    QueryDef("q12_events_by_type",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.moneySum(col("value"), 2).as("total"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(25,6))),2) AS DOUBLE) AS total
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- A6: ROLLUP -----------------------------------------------------
    QueryDef("q13_rollup_qty",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(Num.moneySum(col("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))),2) AS DOUBLE) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- A6: CUBE --------------------------------------------------------
    QueryDef("q14_cube_orders",
      (s, dir) => Tables.load(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST""")),

    // ---- W1/W3: top-n per group (row_number window) ----------------------
    QueryDef("q15_window_topn",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.load(s, dir, "customer")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
          .orderBy("c_mktsegment", "rn")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
            row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer) t
        WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    // ---- W3: lag ----------------------------------------------------------
    QueryDef("q16_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.load(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag("o_totalprice", 1).over(w).as("prev_totalprice"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        lag(o_totalprice) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_totalprice
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- W3: running sum with explicit ROWS frame ---------------------------
    QueryDef("q17_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") < 200)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            sum("l_quantity").over(w).as("running_qty"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
        sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        FROM lineitem WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- §2.8: UNION ALL ------------------------------------------------------
    QueryDef("q18_union_all",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("key"), lit("customer").as("src"))
        val sup = Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") > 9000)
          .select(col("s_suppkey").as("key"), lit("supplier").as("src"))
        c.unionByName(sup).orderBy("key", "src")
      },
      Some("""SELECT c_custkey AS key, 'customer' AS src FROM customer
        WHERE c_acctbal > 9000
        UNION ALL
        SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
        WHERE s_acctbal > 9000
        ORDER BY key, src""")),

    // ---- §2.8: INTERSECT -------------------------------------------------------
    QueryDef("q19_intersect_keys",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_nationkey").as("nk"))
        .intersect(Tables.load(s, dir, "supplier")
          .select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer
        INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""")),

    // ---- §2.8: EXCEPT ------------------------------------------------------------
    QueryDef("q20_except_keys",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("k"))
        .except(Tables.load(s, dir, "orders").select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer
        EXCEPT SELECT o_custkey AS k FROM orders ORDER BY k""")),

    // ---- W2: tumbling time-bucket aggregation (batch) -----------------------------
    QueryDef("q21_hourly_events",
      (s, dir) => Tables.events(s, dir)
        .select(expr("ts DIV 3600000000000 * 3600").as("hour_epoch"),
          col("event_type"), col("value"))
        .groupBy("hour_epoch", "event_type")
        .agg(count(lit(1)).as("n"), Num.moneySum(col("value"), 2).as("total"))
        .orderBy("hour_epoch", "event_type"),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(25,6))),2) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- P14: JSON extraction ------------------------------------------------------
    QueryDef("q22_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          regexp_extract(col("props"), "(\\d+)", 1).cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), max("k").as("max_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        CAST(sum(CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT)) AS BIGINT)
          AS sum_k,
        max(CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT)) AS max_k,
        count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- P10/P11: string parsing/normalization ---------------------------------------
    // p_type is a STRUCTURED field ("STANDARD ANODIZED TIN") parsed on
    // its literal single-space layout — deliberately NOT the corpus
    // \s+ tokenization convention, which covers free text only.
    QueryDef("q23_string_funcs",
      (s, dir) => Tables.load(s, dir, "part")
        .select(element_at(split(col("p_type"), " "), 1).as("type_word"),
          lower(regexp_replace(col("p_name"), " ", "_")).as("name_norm"))
        .groupBy("type_word")
        .agg(count(lit(1)).as("n"), min("name_norm").as("min_name"))
        .orderBy("type_word"),
      Some("""SELECT string_split(p_type, ' ')[1] AS type_word,
        count(*) AS n, min(lower(replace(p_name, ' ', '_'))) AS min_name
        FROM part GROUP BY 1 ORDER BY 1""")),

    // ---- P3: NaN→NULL normalization ----------------------------------------------------
    QueryDef("q24_nan_normalize",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val ratio = when(col("l_discount") === 0, lit(Double.NaN))
          .otherwise(col("l_tax") / col("l_discount"))
        val cleaned = when(isnan(ratio), lit(null)).otherwise(ratio)
        l.select(col("l_returnflag"), cleaned.as("cleaned"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_total"),
            count(col("cleaned")).as("n_valid"),
            Num.moneySum(col("cleaned"), 2).as("total"))
          .orderBy("l_returnflag")
      },
      Some("""WITH t AS (
          SELECT l_returnflag,
            CASE WHEN l_discount = 0 THEN CAST('NaN' AS DOUBLE)
                 ELSE l_tax / l_discount END AS ratio
          FROM lineitem),
        c AS (SELECT l_returnflag,
            CASE WHEN isnan(ratio) THEN NULL ELSE ratio END AS cleaned
          FROM t)
        SELECT l_returnflag, count(*) AS n_total, count(cleaned) AS n_valid,
          CAST(round(sum(CAST(cleaned AS DECIMAL(25,6))),2) AS DOUBLE) AS total
        FROM c GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- P4: defaulted projection --------------------------------------------------------
    QueryDef("q25_defaults",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
          lit("unknown")).as("owner"))
        .groupBy("owner").agg(count(lit(1)).as("n"))
        .orderBy("owner"),
      Some("""SELECT coalesce(nullif(c_mktsegment, 'BUILDING'), 'unknown')
          AS owner, count(*) AS n
        FROM customer GROUP BY 1 ORDER BY 1""")),

    // ---- P7: BETWEEN on timestamps ---------------------------------------------------------
    QueryDef("q26_between_dates",
      (s, dir) => Tables.load(s, dir, "orders")
        .filter(col("o_orderdate").between(ts("1995-01-01"), ts("1996-12-31")))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), Num.moneySum(col("o_totalprice"), 0).as("total"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(25,6))),0) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- P8/T2: contains predicate -----------------------------------------------------------
    QueryDef("q27_doc_contains",
      (s, dir) => Tables.load(s, dir, "documents")
        .filter(col("text").contains("spark"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n FROM documents
        WHERE contains(text, 'spark') GROUP BY lang ORDER BY lang""")),

    // ---- P9: prefix predicate -------------------------------------------------------------------
    QueryDef("q28_prefix_match",
      (s, dir) => Tables.load(s, dir, "part")
        .filter(col("p_name").startsWith("b"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n FROM part
        WHERE starts_with(p_name, 'b') GROUP BY p_brand ORDER BY p_brand""")),

    // ---- O3: global sort + limit -------------------------------------------------------------------
    QueryDef("q29_global_sort",
      (s, dir) => Tables.load(s, dir, "supplier")
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
        .limit(50)
        .select("s_suppkey", "s_name", "s_acctbal"),
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
        ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 50""")),

    // ---- A4: min/max aggregates ----------------------------------------------------------------------
    QueryDef("q30_minmax_dates",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(min("l_shipdate").as("earliest"), max("l_shipdate").as("latest"),
          min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus, min(l_shipdate) AS earliest,
        max(l_shipdate) AS latest, min(l_quantity) AS min_qty,
        max(l_quantity) AS max_qty, count(*) AS n
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- A6: GROUPING SETS (the spark.sql surface) ----------------------
    QueryDef("q91_grouping_sets",
      (s, dir) => {
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
            CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
            CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus),
            (o_orderstatus, o_orderpriority), ())
          ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus),
          (o_orderstatus, o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""")),

    // ---- A6: deterministic ordered string aggregation -------------------
    QueryDef("q92_string_agg",
      (s, dir) => Tables.load(s, dir, "nation")
        .groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy("n_regionkey"),
      Some("""SELECT n_regionkey,
          string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- A6: pivot — wide per-day event-type counts ---------------------
    // Explicit pivot value list: without it Spark runs an extra distinct
    // job to discover columns (collect on the driver — wrong at scale).
    QueryDef("q86_pivot_daily",
      (s, dir) => Tables.events(s, dir)
        // ts is epoch-nanos (see Tables.events); truncate via micros.
        // day rendered as a string: engines disagree on DATE dtype in
        // the compare layer (date vs midnight-timestamp)
        .withColumn("day", date_format(
          timestamp_micros(expr("ts DIV 1000")), "yyyy-MM-dd"))
        .filter(col("day") < lit("2024-01-08"))
        .groupBy("day")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day"),
      Some("""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
          CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS click,
          CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS error,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS purchase,
          CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS BIGINT) AS signup,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS view
        FROM events
        WHERE strftime(CAST(ts AS DATE), '%Y-%m-%d') < '2024-01-08'
        GROUP BY day ORDER BY day""")),

    // ---- W3: ntile decile bucketing --------------------------------------
    QueryDef("q87_ntile_deciles",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          ntile(10).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("c_mktsegment"))
            .orderBy(col("c_acctbal").desc, col("c_custkey").asc))
            .as("decile"),
          col("c_mktsegment"))
        .groupBy("c_mktsegment", "decile")
        .agg(count(lit(1)).as("n"), min("c_custkey").as("first_key"))
        .orderBy("c_mktsegment", "decile"),
      Some("""SELECT c_mktsegment, decile, count(*) AS n,
          min(c_custkey) AS first_key
        FROM (SELECT c_mktsegment, c_custkey,
            CAST(ntile(10) OVER (PARTITION BY c_mktsegment
              ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS decile
          FROM customer) t
        GROUP BY c_mktsegment, decile
        ORDER BY c_mktsegment, decile""")),

    // ---- A6/J5: correlated subqueries (Athena-declared SQL surface) -----
    // One statement, dialect-shared: a correlated scalar COUNT subquery
    // (Catalyst decorrelates it to an outer aggregate join), a
    // correlated EXISTS (→ left-semi join), and an uncorrelated scalar
    // AVG (→ one-row broadcast). DuckDB executes the identical text.
    QueryDef("q100_correlated_subquery",
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(RelationalQueries.correlatedSql)
      },
      Some(correlatedSql)),

    // ---- J5: LATERAL subquery join (Athena-declared SQL surface) --------
    // Spark plans the lateral as a decorrelated left-outer aggregate
    // join; DuckDB executes the identical text.
    QueryDef("q104_lateral_join",
      (s, dir) => {
        Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(RelationalQueries.lateralSql)
      },
      Some(lateralSql)),

    // ---- W3: RANGE frame with a time interval ---------------------------
    // Event-time sliding sum without tumbling buckets: every row's frame
    // is [ts - 1 hour, ts] by VALUE, not by row count — the window shape
    // q16/q17's ROWS frames can't express.
    QueryDef("q105_range_interval_window",
      (s, dir) => {
        Tables.eventsWithTime(s, dir)
          .createOrReplaceTempView("events_timed")
        s.sql(
          """SELECT user_id, event_time,
               round(sum(value) OVER (
                 PARTITION BY user_id ORDER BY event_time
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                   AND CURRENT ROW), 2) AS rolling_1h
             FROM events_timed WHERE user_id <= 5
             ORDER BY user_id, event_time""")
      },
      Some("""SELECT user_id, CAST(ts AS TIMESTAMP) AS event_time,
          round(sum(value) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
            AS rolling_1h
        FROM events WHERE user_id <= 5
        ORDER BY user_id, event_time""")))

  /** Shared Spark-SQL/DuckDB statements (both dialects parse these
    * texts identically). Lazy: referenced from `entries` above their
    * declaration during object init. */
  lazy val lateralSql: String =
    """SELECT c_custkey, top_price FROM customer c,
         LATERAL (SELECT max(o_totalprice) AS top_price FROM orders o
                  WHERE o.o_custkey = c.c_custkey) t
       WHERE top_price IS NOT NULL
       ORDER BY c_custkey LIMIT 50"""

  lazy val correlatedSql: String =
    """SELECT c_custkey, c_mktsegment,
         (SELECT count(*) FROM orders o
          WHERE o.o_custkey = c.c_custkey) AS n_orders
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
         WHERE o.o_custkey = c.c_custkey
           AND o.o_totalprice >
             (SELECT avg(o_totalprice) FROM orders))
       ORDER BY c_custkey LIMIT 50"""
}
