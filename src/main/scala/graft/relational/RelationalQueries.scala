package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The declared relational query surface (SURVEY.md §2.11): scans,
  * projection/filter, joins (broadcast/equi/semi/anti/as-of), aggregation,
  * grouping sets, windows, sorts/limits, set ops, explode, JSON access,
  * event-time bucketing and sessionization.
  *
  * Every query is written against the driver's star schema and has a DuckDB
  * oracle with identical output column names and a deterministic ORDER BY so
  * the driver's hash compare is stable.
  *
  * Scale notes (100 TB): all aggregates here are partial-aggregated map-side
  * by Catalyst before the shuffle; small dimensions (region/nation/supplier/
  * part/customer) are explicitly broadcast so the fact table never shuffles
  * for a dim join; window/sessionization queries shuffle once on their
  * partition key and reuse that single exchange for every window function
  * over the same key.
  */
object RelationalQueries {
  import Tables._

  /** Deterministic money rounding: double sums differ across engines in the
    * last ulp; inputs are 2-decimal quantities so rounding to 2 decimals is
    * stable (error ~1e-8 of the boundary at sf0.1).
    */
  private def money(c: Column): Column = round(c, 2)

  /** Money SUM in decimal, not double: double addition is not
    * associative, so a 600k-row sum can drift a cent depending on
    * partial-aggregation order — across engines (the DuckDB oracle at
    * sf0.1) and across RUNS at cluster scale (AQE/retries reorder
    * partials). Inputs are 2-decimal money and 4-decimal products, so a
    * per-term cast to DECIMAL(20,6) is lossless-for-the-purpose and the
    * sum becomes exact and order-independent. Output cast back to double
    * keeps the public schema unchanged.
    */
  private def moneySum(c: Column): Column =
    round(sum(c.cast("decimal(20,6)")), 2).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- aggregation --------------------------------------------------
    "q1_pricing_summary" -> { (s, d) =>
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          money(sum($"l_quantity")).as("sum_qty"),
          moneySum($"l_extendedprice").as("sum_base_price"),
          moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    "q6_forecast_revenue" -> { (s, d) =>
      import s.implicits._
      lineitem(s, d)
        .filter($"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(moneySum($"l_extendedprice" * $"l_discount").as("revenue"),
          count(lit(1)).as("n"))
    },
    "q11_distinct_parts" -> { (s, d) =>
      import s.implicits._
      lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"))
        .orderBy($"l_returnflag")
    },
    // --- joins --------------------------------------------------------
    "q3_customer_revenue" -> { (s, d) =>
      import s.implicits._
      // customer is small at every SF relative to lineitem: broadcast both
      // dim joins; the only shuffle is the final groupBy on o_custkey.
      val o = orders(s, d)
      val l = lineitem(s, d)
      val c = customer(s, d)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"c_custkey")
    },
    "q5_nation_revenue" -> { (s, d) =>
      import s.implicits._
      // classic star join: every dimension broadcast, single agg shuffle.
      val l = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"))
        .orderBy($"r_name", $"n_name")
    },
    "q4_part_brand_volume" -> { (s, d) =>
      import s.implicits._
      lineitem(s, d)
        .join(broadcast(part(s, d)), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(money(sum($"l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand")
    },
    "q9_semi_join" -> { (s, d) =>
      import s.implicits._
      val haveOrders = orders(s, d).select($"o_custkey")
      customer(s, d)
        .join(haveOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    },
    "q10_anti_join" -> { (s, d) =>
      import s.implicits._
      // customers with no large order: anti join against a filtered build
      // side (filter is pushed below the join, so the build side stays
      // small and broadcastable at scale).
      val bigOrders = orders(s, d)
        .filter($"o_totalprice" > 300000).select($"o_custkey")
      customer(s, d)
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    "q13_order_lines_dist" -> { (s, d) =>
      import s.implicits._
      // orders left-joined to big-line counts → distribution of counts.
      val l = lineitem(s, d).groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_lines"))
      orders(s, d)
        .join(l, $"o_orderkey" === $"l_orderkey", "left")
        .select(coalesce($"n_lines", lit(0L)).as("n_lines"))
        .groupBy($"n_lines")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"n_lines")
    },
    // --- windows ------------------------------------------------------
    "q7_running_supplier" -> { (s, d) =>
      import s.implicits._
      // one shuffle on l_suppkey feeds both window functions (same frame
      // spec), so rn and running share a single exchange+sort.
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("running",
          money(sum($"l_quantity")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))))
        .filter($"rn" <= 50)
        .select($"l_suppkey", $"rn", $"l_orderkey", $"l_linenumber",
          $"running")
        .orderBy($"l_suppkey", $"rn")
    },
    "q8_top_parts_per_brand" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey")
      part(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"p_brand", $"rk", $"p_partkey", $"p_retailprice")
        .orderBy($"p_brand", $"rk")
    },
    // --- grouping sets / set ops / sort-limit -------------------------
    "q12_cube_flags" -> { (s, d) =>
      import s.implicits._
      lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"), $"n")
        .orderBy($"rf", $"ls")
    },
    "q15_union_extremes" -> { (s, d) =>
      import s.implicits._
      val o = orders(s, d)
      val hi = o.filter($"o_totalprice" > 400000)
        .select($"o_orderkey", lit("hi").as("bucket"))
      val lo = o.filter($"o_totalprice" < 5000)
        .select($"o_orderkey", lit("lo").as("bucket"))
      hi.unionAll(lo).orderBy($"o_orderkey", $"bucket")
    },
    "q2_topk_orders" -> { (s, d) =>
      import s.implicits._
      // global top-k: Spark plans TakeOrderedAndProject — per-partition
      // heap + single driver merge, no full sort at 100 TB.
      orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", $"o_custkey", money($"o_totalprice")
          .as("o_totalprice"))
    },
    // --- events: time bucketing, sessionization, as-of, json ----------
    "q14_events_hourly" -> { (s, d) =>
      import s.implicits._
      events(s, d)
        .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm")
          .as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"), moneySum($"value").as("total"))
        .orderBy($"hour", $"event_type")
    },
    "q16_sessionize" -> { (s, d) =>
      import s.implicits._
      // batch sessionization: 30-min inactivity gap. One shuffle on
      // user_id serves the lag, the session-id running sum, and the final
      // per-session agg (Catalyst reuses the exchange).
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, d)
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L,
            1L).otherwise(0L))
        .withColumn("session_id",
          sum($"new_session")
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total"))
        .orderBy($"user_id", $"session_id")
    },
    "q17_asof_join" -> { (s, d) =>
      import s.implicits._
      val ev = events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id".as("err_id"), $"user_id".as("err_user"),
          $"ts".as("err_ts"))
      AsOfJoin.backward(purchases, errors,
        leftKey = $"user_id", rightKey = $"err_user",
        leftTime = $"ts", rightTime = $"err_ts",
        rightValues = Seq($"err_id"))
        .select($"event_id", $"err_id")
        .orderBy($"event_id")
    },
    "q108_attribution_join" -> { (s, d) =>
      import s.implicits._
      // time-bounded interval join (the attribution shape): every view by
      // the same user within the 15 minutes BEFORE each click, aggregated
      // per click. Bucketed equi-join on (user, 15-min epoch bucket) —
      // candidates bounded by 2 windows of one user's traffic, so a hot
      // user's whole history never meets itself (see IntervalJoin).
      // Left-outer keeps zero-view clicks with n_views = 0.
      val ev = events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts")
      val views = ev.filter($"event_type" === "view")
        .select($"event_id".as("view_id"), $"user_id".as("v_user"),
          $"ts".as("v_ts"))
      graft.operators.IntervalJoin.pairs(clicks, views,
          leftKey = "user_id", rightKey = "v_user",
          leftTime = "ts", rightTime = "v_ts",
          windowMicros = 15L * 60 * 1000000, leftOuter = true)
        .groupBy($"click_id")
        .agg(count($"view_id").as("n_views"),
          max($"view_id").as("last_view_id"))
        .orderBy($"click_id")
    },
    "q109_zorder_tiles" -> { (s, d) =>
      import s.implicits._
      // Z-ORDER layout math as a declared query: Morton-interleave
      // (o_custkey, epoch-day of o_orderdate) — the multi-dimensional
      // clustering key a 100 TB fact table is laid out by (see
      // io/ZOrder.writeZOrdered: repartitionByRange(z) makes every file
      // a tight (custkey, date) box so ordinary min/max statistics
      // prune 2-D box predicates). Tiles are z >> 20; the oracle
      // replays the exact five-step spread-bits chain in SQL.
      orders(s, d)
        .withColumn("z", graft.io.ZOrder.zValue($"o_custkey",
          datediff(to_date($"o_orderdate"), lit("1970-01-01"))))
        .groupBy(shiftright($"z", 20).as("tile"))
        .agg(count(lit(1)).as("n"), min($"z").as("z_min"),
          max($"z").as("z_max"))
        .orderBy($"tile")
    },
    "q18_json_props" -> { (s, d) =>
      import s.implicits._
      events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"event_type")
        .agg(round(avg($"k"), 4).as("avg_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    "q19_explode_sequence" -> { (s, d) =>
      import s.implicits._
      // explode/UNNEST surface: expand each order into its month sequence
      // between orderdate and orderdate+3 months, count per month.
      orders(s, d)
        .filter($"o_orderkey" % 100 === 0)
        .select($"o_orderkey",
          explode(sequence(lit(1), lit(3))).as("m"))
        .groupBy($"m")
        .agg(count(lit(1)).as("n"))
        .orderBy($"m")
    },
    // --- events: product analytics (funnel / retention / paths / gates) -
    "q113_funnel" -> { (s, d) =>
      import s.implicits._
      // First-touch ORDERED funnel signup -> view -> click -> purchase:
      // a step counts only if it occurs strictly after the user's
      // previous step in (ts, event_id) sequence order. Four chained
      // running-min window columns over ONE partitioning (Catalyst
      // plans four Window operators but reuses the single exchange +
      // sort on user_id); per-row state is four timestamps, so a hot
      // user costs O(events) — no self-join, no per-user collect.
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      events(s, d)
        .withColumn("s1",
          min(when($"event_type" === "signup", $"ts")).over(w))
        .withColumn("s2",
          min(when($"event_type" === "view" && $"s1".isNotNull, $"ts"))
            .over(w))
        .withColumn("s3",
          min(when($"event_type" === "click" && $"s2".isNotNull, $"ts"))
            .over(w))
        .withColumn("s4",
          min(when($"event_type" === "purchase" && $"s3".isNotNull, $"ts"))
            .over(w))
        .groupBy($"user_id")
        .agg(max(when($"s1".isNotNull, 1L).otherwise(0L)).as("r1"),
          max(when($"s2".isNotNull, 1L).otherwise(0L)).as("r2"),
          max(when($"s3".isNotNull, 1L).otherwise(0L)).as("r3"),
          max(when($"s4".isNotNull, 1L).otherwise(0L)).as("r4"))
        .agg(sum($"r1").as("signup_users"), sum($"r2").as("view_users"),
          sum($"r3").as("click_users"), sum($"r4").as("purchase_users"))
    },
    "q122_funnel_latency" -> { (s, d) =>
      import s.implicits._
      // Time-to-convert for users completing the whole funnel: the q113
      // chained running-min windows again (one exchange+sort), then per
      // user first-signup = min(s1) and first-completion = min(s4)
      // (running minima, so the per-user min IS the final value).
      // Latency stats stay INTEGER micros end to end — no float
      // aggregate anywhere.
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      events(s, d)
        .withColumn("s1",
          min(when($"event_type" === "signup", $"ts")).over(w))
        .withColumn("s2",
          min(when($"event_type" === "view" && $"s1".isNotNull, $"ts"))
            .over(w))
        .withColumn("s3",
          min(when($"event_type" === "click" && $"s2".isNotNull, $"ts"))
            .over(w))
        .withColumn("s4",
          min(when($"event_type" === "purchase" && $"s3".isNotNull, $"ts"))
            .over(w))
        .groupBy($"user_id")
        .agg(min($"s1").as("first_signup"), min($"s4").as("converted"))
        .filter($"converted".isNotNull)
        .select((unix_micros($"converted") - unix_micros($"first_signup"))
          .as("lat"))
        .agg(count(lit(1)).as("n_converted"),
          sum($"lat").as("sum_latency_us"),
          min($"lat").as("min_latency_us"),
          max($"lat").as("max_latency_us"))
    },
    "q114_retention_cohorts" -> { (s, d) =>
      import s.implicits._
      // Weekly retention triangle: cohort = a user's first active week;
      // n_users per (cohort_week, weeks since cohort). distinct
      // (user, week) first — partial-aggregated before the shuffle and
      // bounded by users x calendar weeks, so event volume never crosses
      // the wire twice; the per-user cohort min is a window over that
      // already-small frame.
      val uw = events(s, d)
        .select($"user_id",
          expr("datediff(to_date(ts), date'2024-01-01') div 7")
            .cast("long").as("week"))
        .distinct()
      uw.withColumn("cohort_week",
          min($"week").over(Window.partitionBy($"user_id")))
        .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort_week", $"week_offset")
    },
    "q115_transitions" -> { (s, d) =>
      import s.implicits._
      // Event-path Markov transition counts: per-user consecutive
      // (prev, next) event-type pairs. One shuffle+sort on user_id for
      // the lag, one partial-aggregated shuffle for the 25-cell matrix.
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, d)
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"prev_type", $"next_type")
    },
    "q119_trailing_window" -> { (s, d) =>
      import s.implicits._
      // RANGE-frame window (vs the rows frames used elsewhere): per
      // event, the sum of value CENTS over the trailing 10 minutes of
      // the SAME user by event TIME — ties and gaps handled by the
      // frame's value logic, not row positions. One exchange+sort on
      // user_id serves the range frame; the per-user max keeps output
      // small and reuses the same partitioning.
      val wRange = Window.partitionBy($"user_id")
        .orderBy(unix_micros($"ts"))
        .rangeBetween(-600000000L, 0L)
      events(s, d)
        .withColumn("c", round($"value" * 100).cast("long"))
        .withColumn("trail", sum($"c").over(wRange))
        .groupBy($"user_id")
        .agg(max($"trail").as("max_trail_cents"),
          count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },
    "q120_pivot" -> { (s, d) =>
      import s.implicits._
      // PIVOT surface: event counts per user-decade bucket, one column
      // per event type (explicit value list — deterministic schema, no
      // discovery pass over the data).
      events(s, d)
        .groupBy(($"user_id" % 10).as("bucket"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        // a (bucket, type) combination with no rows pivots to null,
        // while the oracle's conditional sum gives 0 — normalize
        .na.fill(0L)
        .orderBy($"bucket")
    },
    "q121_session_window" -> { (s, d) =>
      import s.implicits._
      // NATIVE session windows (vs q16's hand-rolled lag/cumsum): Spark's
      // session_window merges rows within a 30-min gap per user in ONE
      // grouping operator — the same operator a streaming run would use,
      // no window-function pass at all. Boundary semantics: an event
      // exactly gap after the previous one EXTENDS the session (merge on
      // `diff <= gap` — the same rule as q16's lag form; spec-pinned
      // against a constructed exact-boundary pair).
      // Cents keep the sum exact; session start is formatted (no raw
      // timestamp output).
      events(s, d)
        .withColumn("c", round($"value" * 100).cast("long"))
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), sum($"c").as("total_cents"))
        .select($"user_id",
          date_format($"sw.start", "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          $"n_events", $"total_cents")
        .orderBy($"user_id", $"session_start")
    },
    "q118_sql_exists" -> { (s, d) =>
      // SQL-TEXT entry (the spark.sql() surface): correlated EXISTS and
      // NOT EXISTS — Catalyst DECORRELATES them into one left-semi and
      // one left-anti join on l_orderkey — plus an exact scalar subquery
      // (max is bit-exact on both engines where an avg's last-ulp could
      // flip a boundary row). Same hash-agg + broadcast shapes as the
      // DataFrame forms; this query pins the SQL front door.
      // View names are PER-CALL unique and dropped right after the
      // eager analysis: createOrReplaceTempView mutates the shared
      // session catalog, and a fixed name would let two concurrent
      // builders (e.g. base-vs-scaled stress runs) silently rebind each
      // other's tables.
      val tag = java.util.UUID.randomUUID().toString.take(8)
        .replace("-", "")
      val (ov, lv) = (s"orders_v_$tag", s"lineitem_v_$tag")
      orders(s, d).createOrReplaceTempView(ov)
      lineitem(s, d).createOrReplaceTempView(lv)
      try s.sql(s"""
        SELECT o_orderpriority,
          count(*) AS n,
          sum(CASE WHEN o_totalprice >
                (SELECT max(o_totalprice) FROM $ov) / 2
              THEN 1 ELSE 0 END) AS n_above_mid
        FROM $ov o
        WHERE EXISTS (SELECT 1 FROM $lv l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity > 45)
          AND NOT EXISTS (SELECT 1 FROM $lv l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
      finally {
        s.catalog.dropTempView(ov)
        s.catalog.dropTempView(lv)
      }
    },
    "q117_pagerank" -> { (s, d) =>
      import s.implicits._
      // Iterative graph analytics, INTEGER-exact (graph/PageRank): 3
      // damped rounds over the symmetrized customer<->part co-purchase
      // graph. Node ids disjointify the two key spaces (cust*2,
      // part*2+1). Only the edge list is O(|lineitem|) and it is
      // checkpointed once; each iteration moves O(nodes) rank rows plus
      // map-side-combined contributions. Top 20 by (rank, node) — a
      // deterministic cut DuckDB replays bit-for-bit.
      val pairs = lineitem(s, d).select($"l_orderkey", $"l_partkey")
        .join(orders(s, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_partkey" * 2 + 1).as("b"))
        .distinct()
      // symmetrize in ONE pass over the pair build (a union of two
      // selects would evaluate the join+distinct twice)
      val edges = pairs.select(explode(array(
          struct($"a".as("src"), $"b".as("dst")),
          struct($"b".as("src"), $"a".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      graft.graph.PageRank.run(edges, iterations = 3)
        .orderBy($"rank".desc, $"node")
        .limit(20)
        .select(
          when($"node" % 2 === 0, "customer").otherwise("part").as("kind"),
          expr("node div 2").as("key"), $"rank")
    },
    "q133_ohlc_bars" -> { (s, d) =>
      import s.implicits._
      // OHLC downsampling — the canonical time-series resample: per
      // (event_type, 10-minute bucket) the first/max/min/last value in
      // CENTS. First/last are min_by/max_by over the composite
      // (micros, event_id) key packed into one DECIMAL(38,0) — a total
      // order both engines compare identically (arg_min/arg_max take
      // no struct key in the oracle engine), so every bar is
      // integer-exact. One partial-aggregated groupBy; no window, no
      // sort — the shape that downsamples a year of ticks in one pass.
      val key = (unix_micros($"ts").cast("decimal(38,0)") *
        lit(1000000) + $"event_id").as("key")
      events(s, d)
        .select($"event_type",
          expr("unix_micros(ts) div 600000000").as("bucket"),
          round($"value" * 100).cast("long").as("c"), key)
        .groupBy($"event_type", $"bucket")
        .agg(min_by($"c", $"key").as("open"), max($"c").as("high"),
          min($"c").as("low"), max_by($"c", $"key").as("close"),
          count(lit(1)).as("n"))
        .orderBy($"event_type", $"bucket")
    },
    "q128_triangle_count" -> { (s, d) =>
      import s.implicits._
      // Degree-oriented triangle counting (graph/Triangles) over the
      // parts-bought-together graph: parts sharing an order are
      // connected (u < v canonical, distinct). The orientation bounds
      // every node's wedge fan-out by O(sqrt(m)) — the skew story: a
      // part present in every order contributes ZERO wedges because
      // all its edges point into it. The oracle replays the count
      // with naive id-ordered joins; both orientations count each
      // triangle exactly once, so the integers agree bit-for-bit.
      val items = lineitem(s, d)
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      val edges = items.as("a")
        .join(items.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      graft.graph.Triangles.count(edges)
    },
    "q116_value_outliers" -> { (s, d) =>
      import s.implicits._
      // 3-sigma outlier gate, INTEGER-exact: cents c = round(value*100)
      // (inputs are 2-decimal money, so c is exact on both engines);
      // flag iff (c*n - S)^2 > 9*(n*SS - S^2) with S = sum c,
      // SS = sum c^2 — the population z-score test cleared of division,
      // every aggregate a 64-bit integer and the final comparison in
      // DECIMAL(38,0) so a 10x corpus cannot overflow. The stats side is
      // one row per event_type — broadcast back, so the fact scan never
      // shuffles; the only exchange is the tiny final agg.
      val ev = events(s, d)
        .withColumn("c", round($"value" * 100).cast("long"))
      val stats = ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"c").as("s"),
          sum($"c" * $"c").as("ss"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val diff = dec($"c" * $"n" - $"s")
      ev.join(broadcast(stats), "event_type")
        .filter(diff * diff >
          lit(9) * (dec($"n") * dec($"ss") - dec($"s") * dec($"s")))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_outliers"), min($"event_id").as("first_id"),
          max($"event_id").as("last_id"))
        .orderBy($"event_type")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(CAST(l_extendedprice AS DECIMAL(20,6))), 2)::DOUBLE AS sum_base_price,
         round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q6_forecast_revenue" ->
      """SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(20,6))), 2)::DOUBLE AS revenue,
         count(*) AS n
         FROM lineitem
         WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q11_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q3_customer_revenue" ->
      """SELECT c_custkey, c_name,
         round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q5_nation_revenue" ->
      """SELECT r_name, n_name,
         round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))), 2)::DOUBLE AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q4_part_brand_volume" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q9_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "q13_order_lines_dist" ->
      """WITH l AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem
           GROUP BY l_orderkey)
         SELECT coalesce(n_lines, 0) AS n_lines, count(*) AS n_orders
         FROM orders LEFT JOIN l ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY n_lines""",
    "q7_running_supplier" ->
      """WITH w AS (
           SELECT l_suppkey,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
             l_orderkey, l_linenumber,
             round(sum(l_quantity) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING), 2) AS running
           FROM lineitem)
         SELECT * FROM w WHERE rn <= 50 ORDER BY l_suppkey, rn""",
    "q8_top_parts_per_brand" ->
      """WITH w AS (
           SELECT p_brand,
             row_number() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey) AS rk,
             p_partkey, p_retailprice
           FROM part)
         SELECT * FROM w WHERE rk <= 3 ORDER BY p_brand, rk""",
    "q12_cube_flags" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
         coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q15_union_extremes" ->
      """SELECT o_orderkey, 'hi' AS bucket FROM orders
           WHERE o_totalprice > 400000
         UNION ALL
         SELECT o_orderkey, 'lo' AS bucket FROM orders
           WHERE o_totalprice < 5000
         ORDER BY o_orderkey, bucket""",
    "q2_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q14_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
         event_type, count(*) AS n, round(sum(CAST(value AS DECIMAL(20,6))), 2)::DOUBLE AS total
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q16_sessionize" ->
      """WITH g AS (
           SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sx AS (
           SELECT user_id, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
           FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
           round(sum(CAST(value AS DECIMAL(20,6))), 2)::DOUBLE AS total
         FROM sx GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q17_asof_join" ->
      """SELECT p.event_id AS event_id, e.err_id AS err_id
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id AS err_user, ts AS err_ts
               FROM events WHERE event_type = 'error') e
         ON p.user_id = e.err_user AND p.ts >= e.err_ts
         ORDER BY p.event_id""",
    "q108_attribution_join" ->
      """WITH clicks AS (SELECT event_id AS click_id, user_id, ts
             FROM events WHERE event_type = 'click'),
         views AS (SELECT event_id AS view_id, user_id AS v_user, ts AS v_ts
             FROM events WHERE event_type = 'view')
         SELECT c.click_id AS click_id,
           count(v.view_id) AS n_views,
           max(v.view_id) AS last_view_id
         FROM clicks c LEFT JOIN views v
           ON c.user_id = v.v_user
           AND epoch_us(v.v_ts) BETWEEN epoch_us(c.ts) - 900000000
                                    AND epoch_us(c.ts)
         GROUP BY c.click_id ORDER BY c.click_id""",
    "q109_zorder_tiles" ->
      """WITH base AS (SELECT o_custkey AS x0,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS y0
           FROM orders),
         s1 AS (SELECT (x0 & 2147483647) AS x,
             (CAST(y0 AS BIGINT) & 2147483647) AS y FROM base),
         s2 AS (SELECT ((x | (x << 16)) & 281470681808895) AS x,
             ((y | (y << 16)) & 281470681808895) AS y FROM s1),
         s3 AS (SELECT ((x | (x << 8)) & 71777214294589695) AS x,
             ((y | (y << 8)) & 71777214294589695) AS y FROM s2),
         s4 AS (SELECT ((x | (x << 4)) & 1085102592571150095) AS x,
             ((y | (y << 4)) & 1085102592571150095) AS y FROM s3),
         s5 AS (SELECT ((x | (x << 2)) & 3689348814741910323) AS x,
             ((y | (y << 2)) & 3689348814741910323) AS y FROM s4),
         s6 AS (SELECT ((x | (x << 1)) & 6148914691236517205) AS x,
             ((y | (y << 1)) & 6148914691236517205) AS y FROM s5),
         zs AS (SELECT (x | (y << 1)) AS z FROM s6)
         SELECT (z >> 20) AS tile, count(*) AS n,
           min(z) AS z_min, max(z) AS z_max
         FROM zs GROUP BY tile ORDER BY tile""",
    "q18_json_props" ->
      """SELECT event_type,
         round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
           AS avg_k,
         max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q19_explode_sequence" ->
      """SELECT m, count(*) AS n
         FROM orders, unnest([1, 2, 3]) AS t(m)
         WHERE o_orderkey % 100 = 0
         GROUP BY m ORDER BY m""",
    "q113_funnel" ->
      """WITH s1 AS (
           SELECT user_id, ts, event_id, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS s1
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         s2 AS (
           SELECT *, min(CASE WHEN event_type = 'view' AND s1 IS NOT NULL
               THEN ts END) OVER w AS s2
           FROM s1
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         s3 AS (
           SELECT *, min(CASE WHEN event_type = 'click' AND s2 IS NOT NULL
               THEN ts END) OVER w AS s3
           FROM s2
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         s4 AS (
           SELECT *, min(CASE WHEN event_type = 'purchase' AND s3 IS NOT NULL
               THEN ts END) OVER w AS s4
           FROM s3
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         per_user AS (
           SELECT user_id,
             max(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS r1,
             max(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END) AS r2,
             max(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END) AS r3,
             max(CASE WHEN s4 IS NOT NULL THEN 1 ELSE 0 END) AS r4
           FROM s4 GROUP BY user_id)
         SELECT CAST(sum(r1) AS BIGINT) AS signup_users,
           CAST(sum(r2) AS BIGINT) AS view_users,
           CAST(sum(r3) AS BIGINT) AS click_users,
           CAST(sum(r4) AS BIGINT) AS purchase_users
         FROM per_user""",
    "q122_funnel_latency" ->
      """WITH s1 AS (
           SELECT user_id, ts, event_id, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS s1
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         s2 AS (
           SELECT *, min(CASE WHEN event_type = 'view' AND s1 IS NOT NULL
               THEN ts END) OVER w AS s2
           FROM s1
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         s3 AS (
           SELECT *, min(CASE WHEN event_type = 'click' AND s2 IS NOT NULL
               THEN ts END) OVER w AS s3
           FROM s2
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         s4 AS (
           SELECT *, min(CASE WHEN event_type = 'purchase' AND s3 IS NOT NULL
               THEN ts END) OVER w AS s4
           FROM s3
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)),
         conv AS (
           SELECT user_id, min(s1) AS first_signup, min(s4) AS converted
           FROM s4 GROUP BY user_id),
         lat AS (
           SELECT epoch_us(converted) - epoch_us(first_signup) AS lat
           FROM conv WHERE converted IS NOT NULL)
         SELECT count(*) AS n_converted,
           CAST(sum(lat) AS BIGINT) AS sum_latency_us,
           min(lat) AS min_latency_us,
           max(lat) AS max_latency_us
         FROM lat""",
    "q114_retention_cohorts" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
             CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT)
               AS week
           FROM events),
         c AS (
           SELECT user_id, week,
             min(week) OVER (PARTITION BY user_id) AS cohort_week
           FROM uw)
         SELECT cohort_week, week - cohort_week AS week_offset,
           count(*) AS n_users
         FROM c GROUP BY cohort_week, week_offset
         ORDER BY cohort_week, week_offset""",
    "q115_transitions" ->
      """WITH t AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
           FROM events)
         SELECT prev_type, event_type AS next_type, count(*) AS n
         FROM t WHERE prev_type IS NOT NULL
         GROUP BY prev_type, next_type
         ORDER BY prev_type, next_type""",
    "q119_trailing_window" ->
      """WITH t AS (
           SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS trail
           FROM events)
         SELECT user_id, max(trail) AS max_trail_cents,
           count(*) AS n_events
         FROM t GROUP BY user_id ORDER BY user_id""",
    "q120_pivot" ->
      """SELECT (user_id % 10) AS bucket,
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
         FROM events GROUP BY bucket ORDER BY bucket""",
    "q121_session_window" ->
      """WITH g AS (
           SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sx AS (
           SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
           FROM g)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
         FROM sx GROUP BY user_id, session_id
         ORDER BY user_id, session_start""",
    "q118_sql_exists" ->
      """SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CASE WHEN o_totalprice >
                 (SELECT max(o_totalprice) FROM orders) / 2
               THEN 1 ELSE 0 END) AS BIGINT) AS n_above_mid
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity > 45)
           AND NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey
                             AND l.l_returnflag = 'R')
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q117_pagerank" ->
      """WITH pairs AS (
           SELECT DISTINCT o_custkey*2 AS a, l_partkey*2+1 AS b
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT a AS src, b AS dst FROM pairs
                   UNION ALL SELECT b AS src, a AS dst FROM pairs),
         deg AS (SELECT src AS node, count(*) AS deg
                 FROM edges GROUP BY src),
         r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS rank FROM deg),
         r1 AS (SELECT d.node AS node, d.deg AS deg,
                  150000 + CAST(sum((r.rank*85)//(100*r.deg)) AS BIGINT)
                    AS rank
                FROM edges e JOIN r0 r ON e.src = r.node
                  JOIN deg d ON e.dst = d.node
                GROUP BY d.node, d.deg),
         r2 AS (SELECT d.node AS node, d.deg AS deg,
                  150000 + CAST(sum((r.rank*85)//(100*r.deg)) AS BIGINT)
                    AS rank
                FROM edges e JOIN r1 r ON e.src = r.node
                  JOIN deg d ON e.dst = d.node
                GROUP BY d.node, d.deg),
         r3 AS (SELECT d.node AS node, d.deg AS deg,
                  150000 + CAST(sum((r.rank*85)//(100*r.deg)) AS BIGINT)
                    AS rank
                FROM edges e JOIN r2 r ON e.src = r.node
                  JOIN deg d ON e.dst = d.node
                GROUP BY d.node, d.deg)
         SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END
             AS kind,
           node // 2 AS key, rank
         FROM r3 ORDER BY rank DESC, node LIMIT 20""",
    "q116_value_outliers" ->
      """WITH c AS (
           SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
         st AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS ss
           FROM c GROUP BY event_type)
         SELECT c.event_type AS event_type, count(*) AS n_outliers,
           min(c.event_id) AS first_id, max(c.event_id) AS last_id
         FROM c JOIN st USING (event_type)
         WHERE CAST(c.c * st.n - st.s AS HUGEINT)
               * CAST(c.c * st.n - st.s AS HUGEINT)
           > 9 * (CAST(st.n AS HUGEINT) * st.ss
                  - CAST(st.s AS HUGEINT) * st.s)
         GROUP BY c.event_type ORDER BY event_type""",
    "q133_ohlc_bars" ->
      """WITH e AS (SELECT event_type,
             epoch_us(ts) AS m,
             CAST(round(value * 100) AS BIGINT) AS c,
             CAST(epoch_us(ts) AS HUGEINT) * 1000000 + event_id AS key
           FROM events)
         SELECT event_type, m // 600000000 AS bucket,
           arg_min(c, key) AS open, max(c) AS high, min(c) AS low,
           arg_max(c, key) AS close, count(*) AS n
         FROM e GROUP BY 1, 2 ORDER BY event_type, bucket""",
    "q128_triangle_count" ->
      """WITH items AS (
           SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e AS (
           SELECT DISTINCT a.p AS u, b.p AS v
           FROM items a JOIN items b ON a.o = b.o AND a.p < b.p)
         SELECT
           (SELECT count(DISTINCT n) FROM
             (SELECT u AS n FROM e UNION ALL SELECT v FROM e)) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*) FROM e e1
             JOIN e e2 ON e2.u = e1.v
             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles"""
  )
}
