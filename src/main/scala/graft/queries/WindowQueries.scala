package graft.queries

import graft.ops.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY §2b: Windows, Sort/limit/top-k,
  * As-of/interval) plus the sessionization batch operator.
  */
object WindowQueries {

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    (
      "q21_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER w AS rn,
                 rank() OVER w AS rnk,
                 dense_rank() OVER w AS drnk
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        )
        WHERE rn <= 3
      """)
    ),
    (
      "q22_window_running",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        table(s, dir, "orders")
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running_spend"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"),
            first("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_price")
          )
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
               lag(o_totalprice, 1) OVER w AS prev_price,
               lead(o_totalprice, 1) OVER w AS next_price,
               first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      """)
    ),
    (
      "q23_window_frames",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        table(s, dir, "events")
          .select(
            col("user_id"),
            col("event_id"),
            avg("value").over(w.rowsBetween(-2, 0)).as("mavg3"),
            sum("value").over(w.rangeBetween(-5, 0)).as("rsum5"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("prank")
          )
      },
      Some("""
        SELECT user_id, event_id,
               avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg3,
               sum(value) OVER (w RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS rsum5,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS prank
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      """)
    ),
    (
      "q24_topk_per_group",
      (s, dir) => {
        Relational.topKPerGroup(
          table(s, dir, "lineitem"),
          Seq("l_suppkey"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
          2
        ).select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
        FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                 row_number() OVER (PARTITION BY l_suppkey
                                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          FROM lineitem
        )
        WHERE rn <= 2
      """)
    ),
    (
      "q25_asof_join",
      (s, dir) => {
        val e = table(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_event_id"), col("user_id"), col("ts").as("click_ts"))
        Relational
          .asofJoin(purchases, clicks, "ts", "click_ts", Seq(("user_id", "user_id")), tieBreak = Seq("click_event_id"))
          .select(col("event_id"), col("user_id"), col("click_event_id"))
      },
      Some("""
        SELECT p.event_id, p.user_id, c.event_id AS click_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
      """)
    ),
    (
      "q26_sessionize",
      (s, dir) => {
        Relational
          .sessionize(table(s, dir, "events"), "user_id", "ts", "30 minutes")
          .groupBy("user_id")
          .agg(
            (max("session_id") + 1).as("n_sessions"),
            count(lit(1)).as("n_events")
          )
      },
      Some("""
        WITH flagged AS (
          -- gap compared in integral MICROseconds: Spark sees ts truncated
          -- to micros (nanos parquet), so the oracle must truncate too or a
          -- 1800.0000004s gap flips the boundary on one side only
          SELECT user_id, ts,
                 CASE WHEN epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000)
                        OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ), sessions AS (
          SELECT user_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        )
        -- CAST to BIGINT: the windowed sum makes session_id HUGEINT in
        -- DuckDB, which pandas widens to float64 while Spark emits int64 —
        -- the driver's dtype-sensitive hash then mismatches on equal values
        SELECT user_id, CAST(max(session_id) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM sessions
        GROUP BY user_id
      """)
    ),
    (
      "q27_tumbling_hourly",
      (s, dir) => {
        table(s, dir, "events")
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type")
          )
          .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      },
      Some("""
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n, sum(value) AS sum_value
        FROM events
        GROUP BY 1, 2
      """)
    )
  )
}
