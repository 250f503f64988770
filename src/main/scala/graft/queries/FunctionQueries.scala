package graft.queries

import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2b: string / date / math functions,
  * JSON access, array HOFs, sampling/stats). Every expression here is a
  * codegen'd built-in — the reference reaches the same surface only by
  * delegating to a backend namespace (reference namespaces.py:16).
  */
object FunctionQueries {

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    (
      "q28_string_funcs",
      (s, dir) => {
        table(s, dir, "customer")
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("name_upper"),
            length(col("c_name")).as("name_len"),
            substring(col("c_name"), 1, 8).as("name_prefix"),
            lpad(col("c_custkey").cast("string"), 6, "0").as("key_padded"),
            concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("seg_nation"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
            regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
            element_at(split(col("c_name"), "#"), 1).as("name_word"),
            levenshtein(col("c_mktsegment"), lit("BUILDING")).as("seg_dist"),
            trim(lower(col("c_mktsegment"))).as("seg_lower")
          )
      },
      Some("""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               length(c_name) AS name_len,
               substring(c_name, 1, 8) AS name_prefix,
               lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS key_padded,
               concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
               regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
               regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
               string_split(c_name, '#')[1] AS name_word,
               levenshtein(c_mktsegment, 'BUILDING') AS seg_dist,
               trim(lower(c_mktsegment)) AS seg_lower
        FROM customer
      """)
    ),
    (
      "q29_date_funcs",
      (s, dir) => {
        table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("o_year"),
            month(col("o_orderdate")).as("o_month"),
            dayofmonth(col("o_orderdate")).as("o_day"),
            quarter(col("o_orderdate")).as("o_quarter"),
            date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
            datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since_epoch"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
            last_day(col("o_orderdate").cast("date")).as("month_end")
          )
      },
      Some("""
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               day(o_orderdate) AS o_day,
               quarter(o_orderdate) AS o_quarter,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               last_day(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders
      """)
    ),
    (
      "q30_math_funcs",
      // Double sums are order-dependent (partial aggregation runs in a
      // different order than DuckDB's), so every summed term is fixed to a
      // DECIMAL first: decimal sums are exact and order-independent on both
      // engines. Final outputs cast back to DOUBLE (exact at these scales).
      (s, dir) => {
        val priceDec = col("l_extendedprice").cast("decimal(18,4)")
        val discDec = col("l_discount").cast("decimal(18,4)")
        val qtyDec = col("l_quantity").cast("decimal(18,4)")
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(sum(priceDec * discDec), 2).cast("double").as("disc_total"),
            sum(floor(col("l_quantity"))).as("qty_floor_sum"),
            sum(ceil(col("l_discount") * 100)).as("disc_pct_ceil_sum"),
            round(sum(abs(priceDec - 1000)), 2).cast("double").as("abs_dev_sum"),
            round(sum(qtyDec * qtyDec), 2).cast("double").as("qty_sq_sum"),
            sum(log(col("l_extendedprice") + 1).cast("decimal(28,6)")).cast("double").as("log_price_sum"),
            sum(sqrt(col("l_quantity")).cast("decimal(28,6)")).cast("double").as("sqrt_qty_sum"),
            sum(col("l_orderkey") % 7).as("mod_sum")
          )
      },
      Some("""
        SELECT l_returnflag,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS disc_total,
               CAST(sum(floor(l_quantity)) AS BIGINT) AS qty_floor_sum,
               CAST(sum(ceil(l_discount * 100)) AS BIGINT) AS disc_pct_ceil_sum,
               CAST(round(sum(abs(CAST(l_extendedprice AS DECIMAL(18,4)) - 1000)), 2) AS DOUBLE) AS abs_dev_sum,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_sq_sum,
               CAST(sum(CAST(ln(l_extendedprice + 1) AS DECIMAL(28,6))) AS DOUBLE) AS log_price_sum,
               CAST(sum(CAST(sqrt(l_quantity) AS DECIMAL(28,6))) AS DOUBLE) AS sqrt_qty_sum,
               CAST(sum(l_orderkey % 7) AS BIGINT) AS mod_sum
        FROM lineitem
        GROUP BY l_returnflag
      """)
    ),
    (
      "q31_json_funcs",
      (s, dir) => {
        table(s, dir, "events")
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k")
          )
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            avg("k").as("avg_k"),
            max("k").as("max_k"),
            min("k").as("min_k")
          )
      },
      Some("""
        SELECT event_type, count(*) AS n,
               avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
        FROM events
        GROUP BY event_type
      """)
    ),
    (
      "q32_conditional_pivot",
      (s, dir) => {
        table(s, dir, "events")
          .groupBy("user_id")
          .agg(
            count(when(col("event_type") === "click", 1)).as("n_clicks"),
            count(when(col("event_type") === "view", 1)).as("n_views"),
            count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
            round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 2).as("purchase_value")
          )
      },
      Some("""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
               count(*) FILTER (WHERE event_type = 'view') AS n_views,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value
        FROM events
        GROUP BY user_id
      """)
    ),
    (
      "q33_stats",
      (s, dir) => {
        table(s, dir, "events")
          .select(
            col("event_type"),
            col("value"),
            get_json_object(col("props"), "$.k").cast("double").as("k")
          )
          .groupBy("event_type")
          .agg(
            round(corr("value", "k"), 6).as("corr_vk"),
            round(stddev_samp("value"), 6).as("sd_value"),
            round(var_samp("value"), 6).as("var_value"),
            round(covar_samp("value", "k"), 6).as("covar_vk"),
            round(avg("value"), 6).as("avg_value")
          )
      },
      Some("""
        SELECT event_type,
               round(corr(value, k), 6) AS corr_vk,
               round(stddev_samp(value), 6) AS sd_value,
               round(var_samp(value), 6) AS var_value,
               round(covar_samp(value, k), 6) AS covar_vk,
               round(avg(value), 6) AS avg_value
        FROM (SELECT event_type, value,
                     CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
              FROM events)
        GROUP BY event_type
      """)
    ),
    (
      "q34_percentiles",
      (s, dir) => {
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
            round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
            round(min("l_extendedprice"), 2).as("min_price"),
            round(max("l_extendedprice"), 2).as("max_price")
          )
      },
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
      """)
    ),
    (
      "q35_collect_agg",
      (s, dir) => {
        table(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(
            sort_array(collect_set(col("o_orderstatus"))).as("statuses"),
            count_distinct(col("o_orderstatus")).as("n_statuses"),
            first(col("o_orderkey")).as("some_orderkey")
          )
          .select(
            col("o_custkey"),
            concat_ws(",", col("statuses")).as("statuses"),
            col("n_statuses")
          )
      },
      Some("""
        SELECT o_custkey,
               array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
               count(DISTINCT o_orderstatus) AS n_statuses
        FROM orders
        GROUP BY o_custkey
      """)
    ),
    (
      "q36_approx_distinct",
      (s, dir) => {
        // HLL implementations differ across engines — driver records a
        // rows-only check (no oracle entry on purpose).
        table(s, dir, "lineitem")
          .agg(
            approx_count_distinct("l_orderkey").as("approx_orders"),
            count_distinct(col("l_orderkey")).as("exact_orders")
          )
      },
      None
    ),
    (
      // q36's value-exact twin: the same distinct-cardinality question
      // answered by the exact Expand-based distinct aggregate instead of
      // the engine-specific HLL sketch, so DuckDB hash-checks it.
      "q83_distinct_exact",
      (s, dir) => {
        table(s, dir, "lineitem")
          .agg(
            count_distinct(col("l_orderkey")).as("exact_orders"),
            count_distinct(col("l_suppkey")).as("exact_supps"),
            count_distinct(col("l_returnflag"), col("l_linestatus")).as("exact_flag_status"))
      },
      Some("""
        SELECT count(DISTINCT l_orderkey) AS exact_orders,
               count(DISTINCT l_suppkey) AS exact_supps,
               count(DISTINCT (l_returnflag, l_linestatus)) AS exact_flag_status
        FROM lineitem
      """)
    ),
    (
      "q64_describe_stats",
      // Typed describe() rebuilt on exact integer arithmetic so it carries
      // a value-exact oracle: the source doubles are fixed-point (quantity
      // integral, price/discount in cents), so mean = exact scaled-integer
      // floor-division (q45 micro-division trick) and stddev's
      // n*ssq - s^2 core stays integral (DECIMAL(38,0) — cents^2 sums
      // overflow BIGINT at sf>=0.1) until one deterministic cast to
      // double. No order-dependent double summation anywhere.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        def one(c: String, scale: Long) = {
          val mul = 1000000L / scale
          li.selectExpr(s"CAST(round($c * $scale) AS BIGINT) AS xi", s"$c AS x")
            .selectExpr(
              s"'$c' AS col_name",
              "count(x) AS n",
              s"CAST((sum(xi) * $mul) div count(x) AS DOUBLE) / 1000000 AS mean",
              s"""round(sqrt(
                    CAST(count(x) * sum(CAST(xi AS DECIMAL(38,0)) * xi)
                         - CAST(sum(xi) AS DECIMAL(38,0)) * sum(xi) AS DOUBLE)
                    / CAST(count(x) * (count(x) - 1) AS DOUBLE)) / $scale, 6) AS stddev""",
              "min(x) AS min_v",
              "max(x) AS max_v")
        }
        one("l_quantity", 1L)
          .unionAll(one("l_extendedprice", 100L))
          .unionAll(one("l_discount", 100L))
      },
      Some("""
        WITH src AS (
          SELECT CAST(round(l_quantity * 1) AS BIGINT) AS q,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                 CAST(round(l_discount * 100) AS BIGINT) AS d,
                 l_quantity, l_extendedprice, l_discount
          FROM lineitem
        )
        SELECT 'l_quantity' AS col_name, CAST(count(l_quantity) AS BIGINT) AS n,
               CAST(CAST(sum(q) AS BIGINT) * 1000000 // count(l_quantity) AS DOUBLE) / 1000000 AS mean,
               round(sqrt(CAST(count(l_quantity) * sum(q*q) - sum(q)*sum(q) AS DOUBLE)
                 / CAST(count(l_quantity) * (count(l_quantity) - 1) AS DOUBLE)) / 1, 6) AS stddev,
               min(l_quantity) AS min_v, max(l_quantity) AS max_v
        FROM src
        UNION ALL
        SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS BIGINT),
               CAST(CAST(sum(p) AS BIGINT) * 10000 // count(l_extendedprice) AS DOUBLE) / 1000000,
               round(sqrt(CAST(count(l_extendedprice) * sum(p*p) - sum(p)*sum(p) AS DOUBLE)
                 / CAST(count(l_extendedprice) * (count(l_extendedprice) - 1) AS DOUBLE)) / 100, 6),
               min(l_extendedprice), max(l_extendedprice)
        FROM src
        UNION ALL
        SELECT 'l_discount', CAST(count(l_discount) AS BIGINT),
               CAST(CAST(sum(d) AS BIGINT) * 10000 // count(l_discount) AS DOUBLE) / 1000000,
               round(sqrt(CAST(count(l_discount) * sum(d*d) - sum(d)*sum(d) AS DOUBLE)
                 / CAST(count(l_discount) * (count(l_discount) - 1) AS DOUBLE)) / 100, 6),
               min(l_discount), max(l_discount)
        FROM src
      """)
    ),
    (
      "q65_freq_items",
      // approximate frequent-items sketch (Karp et al.). At support 0.1 the
      // sketch holds 10 slots — more than either column's distinct count —
      // so no evictions occur and the result is exactly the distinct value
      // set, which a DuckDB oracle can reproduce. Arrays are sorted and
      // joined to strings: the driver's comparator can't hash array cells.
      (s, dir) => {
        table(s, dir, "lineitem")
          .stat.freqItems(Array("l_returnflag", "l_linestatus"), 0.1)
          .select(
            array_join(array_sort(col("l_returnflag_freqItems")), ",").as("returnflag_freq"),
            array_join(array_sort(col("l_linestatus_freqItems")), ",").as("linestatus_freq")
          )
      },
      Some("""
        SELECT array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS returnflag_freq,
               array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS linestatus_freq
        FROM lineitem
      """)
    ),
    (
      "q37_sample",
      (s, dir) => {
        // Engine-specific RNG — rows-only check (no oracle on purpose).
        table(s, dir, "lineitem").sample(withReplacement = false, 0.1, seed = 42L)
          .agg(count(lit(1)).as("n_sampled"))
      },
      None
    ),
    (
      // q37's portable twin: the same ~10% sample semantics, selected by
      // content-hash THRESHOLD (ops.Mixing.hashSample — md5 of the row
      // key, no RNG), so DuckDB reproduces the EXACT sampled set and the
      // per-stratum aggregate is hash-checked cross-engine — the same
      // construction that twinned q42/q43 (q78/q79). Threshold, not
      // rank: the predicate is map-only (no window, no per-stratum
      // single-task sort), so the plan is the one you'd run at 100 TB.
      "q82_sample_portable",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .withColumn("rid", concat_ws("_", col("l_orderkey"), col("l_linenumber")))
        graft.ops.Mixing.hashSample(li, "rid", 0.1)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_sampled"),
            sum(col("l_quantity")).cast("double").as("sum_qty"))
      },
      Some("""
        SELECT l_returnflag,
               count(*) AS n_sampled,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        FROM (
          SELECT l_returnflag, l_quantity,
                 CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS rid
          FROM lineitem
        )
        WHERE CAST(md5_number_upper(rid) % 2147483647 AS BIGINT) < 214748364
        GROUP BY l_returnflag
      """)
    ),
    (
      "q66_bitwise",
      (s, dir) => {
        table(s, dir, "orders")
          .select(
            col("o_orderkey"),
            (col("o_orderkey").bitwiseAND(lit(255L))).as("key_and"),
            (col("o_orderkey").bitwiseOR(lit(4096L))).as("key_or"),
            (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("key_xor"),
            shiftleft(col("o_custkey"), 3).as("cust_shl"),
            shiftright(col("o_orderkey"), 2).as("key_shr"),
            bit_count(col("o_orderkey")).as("key_bits")
          )
      },
      Some("""
        SELECT o_orderkey,
               o_orderkey & 255 AS key_and,
               o_orderkey | 4096 AS key_or,
               xor(o_orderkey, o_custkey) AS key_xor,
               o_custkey << 3 AS cust_shl,
               o_orderkey >> 2 AS key_shr,
               bit_count(o_orderkey) AS key_bits
        FROM orders
      """)
    ),
    (
      "q67_agg_by",
      (s, dir) => {
        table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_order"),
            min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_order"),
            count_if(col("o_totalprice") > 100000.0).as("n_big"),
            bool_and(col("o_totalprice") > 0.0).as("all_positive"),
            bool_or(col("o_orderstatus") === "F").as("any_finished")
          )
      },
      Some("""
        SELECT o_orderpriority,
               arg_max(o_orderkey, o_totalprice) AS priciest_order,
               arg_min(o_orderkey, o_totalprice) AS cheapest_order,
               CAST(count_if(o_totalprice > 100000.0) AS BIGINT) AS n_big,
               bool_and(o_totalprice > 0.0) AS all_positive,
               bool_or(o_orderstatus = 'F') AS any_finished
        FROM orders
        GROUP BY o_orderpriority
      """)
    ),
    (
      "q68_unpivot_stack",
      (s, dir) => {
        // stack() generator: wide → long over three per-part measures
        table(s, dir, "part")
          .selectExpr(
            "p_partkey",
            """stack(3,
                 'size', CAST(p_size AS DOUBLE),
                 'retail', p_retailprice,
                 'name_len', CAST(length(p_name) AS DOUBLE)
               ) AS (measure, value)""")
      },
      Some("""
        SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retail' AS measure, p_retailprice AS value FROM part
        UNION ALL
        SELECT p_partkey, 'name_len' AS measure, CAST(length(p_name) AS DOUBLE) AS value FROM part
      """)
    )
  )
}
