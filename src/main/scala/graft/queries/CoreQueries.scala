package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core operator coverage beyond ParityQueries: the Spark-surface
  * categories the reference never exercises (SURVEY.md §2.6 — windows,
  * sorts/limits, set operations, scalar string/date functions) plus the
  * latest-partition and DQ idioms re-expressed as standalone queries.
  * Determinism rules are the same as ParityQueries (decimal sums, total
  * ORDER BY, identical aliases both sides).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** S3/A4: "latest load" = scalar max + equality filter (reference
    * read() idiom, etl/layers/bronze/orders.py:148-161) — here as
    * latest-day events. The scalar max round-trips through the driver
    * exactly like the reference; the filter then prunes at the scan.
    */
  val q04LatestEvents = Q(
    "q04_latest_events",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val latest = ev.agg(max(to_date($"ts"))).first().getDate(0)
      ev.where(to_date($"ts") === lit(latest))
        .select($"event_id", $"user_id", $"event_type", $"value")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id, event_type, value
           |FROM events
           |WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
           |ORDER BY event_id""".stripMargin))

  /** Exact median + quartiles (vs the reference's percentile_approx, A2):
    * Spark `percentile` and DuckDB `quantile_cont` both interpolate
    * lo + f·(hi−lo) on the sorted values — bit-comparable on shared
    * doubles. Quartiles are emitted as scalar double columns (p25/p75),
    * not an array: the driver's pandas compare cannot sort array cells.
    */
  val q05EventTypeStats = Q(
    "q05_event_type_stats",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type", $"value",
          $"value".cast("decimal(18,6)").as("dv"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum($"dv").cast("double").as("sum_value"),
          (sum($"dv").cast("double") / count(lit(1))).as("mean_value"),
          expr("percentile(value, 0.5)").as("median_value"),
          expr("percentile(value, 0.25)").as("p25"),
          expr("percentile(value, 0.75)").as("p75"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
           |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_value,
           |       QUANTILE_CONT(value, 0.5) AS median_value,
           |       QUANTILE_CONT(value, 0.25) AS p25,
           |       QUANTILE_CONT(value, 0.75) AS p75
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Dedup-keep-latest via ranking window (the §7.4 exact-dedup shape):
    * one row per user — their most recent event, ties broken by event_id.
    * The shuffle is one hash partitioning by user_id; no global sort.
    */
  val q06LatestEventPerUser = Q(
    "q06_latest_event_per_user",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type")
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, event_id, event_type
           |FROM events
           |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
           |ORDER BY user_id""".stripMargin))

  /** Top-k with deterministic tie-break: Spark plans a TakeOrderedAndProject
    * (per-partition top-k + merge), never a global sort.
    */
  val q07TopOrders = Q(
    "q07_top_orders",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey",
          $"o_totalprice".cast("decimal(18,2)").cast("double")
            .as("total_price"))
        .orderBy($"total_price".desc, $"o_orderkey")
        .limit(100)
    },
    Some("""SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
           |FROM orders ORDER BY total_price DESC, o_orderkey LIMIT 100""".stripMargin))

  /** Left-semi join (EXISTS): customers who placed at least one urgent
    * order. Semi joins ship only the key column of the probe side.
    */
  val q08SemiJoin = Q(
    "q08_customers_with_urgent_orders",
    (s, dir) => {
      import s.implicits._
      val urgent = t(s, dir, "orders")
        .where($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      t(s, dir, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
           |FROM customer
           |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
           |ORDER BY c_custkey""".stripMargin))

  /** Left-anti join (NOT EXISTS): customers who never placed a
    * high-value order (every customer has *some* order in this data, so
    * the plain variant would be vacuous).
    */
  val q09AntiJoin = Q(
    "q09_customers_without_big_orders",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .where($"o_totalprice" > 300000).select($"o_custkey")
      t(s, dir, "customer")
        .join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name
           |FROM customer
           |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
           |ORDER BY c_custkey""".stripMargin))

  /** Set operations (union/intersect/except — absent from the reference,
    * SURVEY.md §2.6): compare the customer-key space with the
    * event-user-key space.
    */
  val q10SetOps = Q(
    "q10_key_set_ops",
    (s, dir) => {
      import s.implicits._
      val ck = t(s, dir, "customer").select($"c_custkey".as("k"))
      val ek = t(s, dir, "events").select($"user_id".as("k")).distinct()
      val both = ck.intersect(ek).agg(count(lit(1)).as("n"))
        .select(lit("both").as("tag"), $"n")
      val onlyC = ck.except(ek).agg(count(lit(1)).as("n"))
        .select(lit("customer_only").as("tag"), $"n")
      val all = ck.union(ek).distinct().agg(count(lit(1)).as("n"))
        .select(lit("union").as("tag"), $"n")
      both.unionByName(onlyC).unionByName(all).orderBy($"tag")
    },
    Some("""WITH ck AS (SELECT c_custkey AS k FROM customer),
           |     ek AS (SELECT DISTINCT user_id AS k FROM events)
           |SELECT 'both' AS tag, COUNT(*) AS n FROM (SELECT * FROM ck INTERSECT SELECT * FROM ek)
           |UNION ALL
           |SELECT 'customer_only' AS tag, COUNT(*) AS n FROM (SELECT * FROM ck EXCEPT SELECT * FROM ek)
           |UNION ALL
           |SELECT 'union' AS tag, COUNT(*) AS n FROM (SELECT * FROM ck UNION SELECT * FROM ek)
           |ORDER BY tag""".stripMargin))

  /** ROLLUP grouping sets (absent from the reference): per-flag×status
    * subtotals and grand total in one pass of partial aggregates.
    */
  val q11Rollup = Q(
    "q11_pricing_rollup",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus",
          $"l_quantity".cast("decimal(18,2)").as("qty"))
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum($"qty").cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first,
          $"l_linestatus".asc_nulls_first)
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |       COUNT(*) AS n
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))

  /** Date-part functions (absent from the reference): orders per
    * year × month.
    */
  val q12DateParts = Q(
    "q12_orders_by_month",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          $"o_totalprice".cast("decimal(18,2)").as("tp"))
        .groupBy($"y", $"m")
        .agg(count(lit(1)).as("n_orders"),
          sum($"tp").cast("double").as("revenue"))
        .orderBy($"y", $"m")
    },
    Some("""SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
           |       CAST(MONTH(o_orderdate) AS INT) AS m,
           |       COUNT(*) AS n_orders,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** String scalar functions (absent from the reference): upper/substr/
    * length/replace — all codegen'd, no UDFs.
    */
  val q13StringFuncs = Q(
    "q13_part_strings",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey",
          upper($"p_name").as("uname"),
          substring($"p_type", 1, 5).as("type5"),
          length($"p_name").as("name_len"),
          regexp_replace($"p_brand", "Brand#", "B-").as("brand_code"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, UPPER(p_name) AS uname,
           |       SUBSTR(p_type, 1, 5) AS type5,
           |       CAST(LENGTH(p_name) AS INT) AS name_len,
           |       REPLACE(p_brand, 'Brand#', 'B-') AS brand_code
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** CASE / COALESCE / NULLIF conditional expressions. */
  val q14Conditionals = Q(
    "q14_order_status_buckets",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey",
          when($"o_orderstatus" === "F", "final")
            .when($"o_orderstatus" === "O", "open")
            .otherwise("other").as("status_bucket"),
          coalesce(nullif($"o_orderpriority", lit("5-LOW")),
            lit("default")).as("priority_or_default"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |       CASE WHEN o_orderstatus = 'F' THEN 'final'
           |            WHEN o_orderstatus = 'O' THEN 'open'
           |            ELSE 'other' END AS status_bucket,
           |       COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'default') AS priority_or_default
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Windowed aggregate (analytic, not ranking): each order next to its
    * customer's total spend — one hash-partition shuffle, no join.
    */
  val q15WindowAgg = Q(
    "q15_order_vs_customer_total",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey",
          $"o_totalprice".cast("decimal(18,2)").as("tp"))
        .withColumn("cust_total",
          sum($"tp").over(w).cast("double"))
        .withColumn("cust_orders", count(lit(1)).over(w))
        .drop("tp")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total,
           |       COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Exact distinct-count aggregation (expand-based COUNT DISTINCT). */
  val q16DistinctCounts = Q(
    "q16_distinct_counts",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |       COUNT(DISTINCT l_partkey) AS n_parts,
           |       COUNT(DISTINCT l_suppkey) AS n_supps,
           |       COUNT(DISTINCT l_orderkey) AS n_orders
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  /** JSON extraction from the events props payload (semi-structured
    * column → typed value → aggregate).
    */
  val q17JsonExtract = Q(
    "q17_json_props",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
           |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Pivot (wide conditional aggregation): daily event counts, one column
    * per event type — the oracle expresses the same with FILTER aggregates
    * and identical column names.
    */
  val q18Pivot = Q(
    "q18_event_pivot",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(to_date($"ts").as("day"), $"event_type")
        .groupBy($"day")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"day")
    },
    Some("""SELECT CAST(ts AS DATE) AS day,
           |       COUNT(*) FILTER (event_type = 'click') AS click,
           |       COUNT(*) FILTER (event_type = 'error') AS error,
           |       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           |       COUNT(*) FILTER (event_type = 'signup') AS signup,
           |       COUNT(*) FILTER (event_type = 'view') AS view
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** CUBE grouping sets over flag × order-year. */
  val q19Cube = Q(
    "q19_flag_year_cube",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_returnflag", year($"l_shipdate").as("y"),
          $"l_quantity".cast("decimal(18,2)").as("qty"))
      li.cube($"l_returnflag", $"y")
        .agg(sum($"qty").cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"y".asc_nulls_first)
    },
    Some("""SELECT l_returnflag, CAST(YEAR(l_shipdate) AS INT) AS y,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |       COUNT(*) AS n
           |FROM lineitem GROUP BY CUBE (1, 2)
           |ORDER BY l_returnflag NULLS FIRST, y NULLS FIRST""".stripMargin))

  /** Date arithmetic: per-order fulfillment lag in days (ship − order)
    * summarized per order priority.
    */
  val q20DateArith = Q(
    "q20_fulfillment_lag",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select($"o_orderpriority",
          datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
            .as("lag_days"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"lag_days").as("total_lag_days"),
          max($"lag_days").as("max_lag_days"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
           |       CAST(SUM(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS total_lag_days,
           |       CAST(MAX(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INT) AS max_lag_days
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  private val q21Text =
    """SELECT c.c_custkey, c.c_name,
      |       (SELECT COUNT(*) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |       (SELECT CAST(CAST(MAX(o.o_totalprice) AS DECIMAL(18,2)) AS DOUBLE)
      |        FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c ORDER BY c.c_custkey""".stripMargin

  /** Full SQL surface (S7 beyond views): the same text runs on Spark and
    * DuckDB — correlated scalar subqueries over registered table views.
    */
  val q21SqlCorrelated = Q(
    "q21_sql_correlated_subquery",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(q21Text)
    },
    Some(q21Text))

  /** Array construction + manipulation: per-customer sorted order lists,
    * slicing, membership, length (collect_list → array functions; oracle
    * via DuckDB list functions). Array-typed columns are serialized with
    * concat_ws/array_to_string in the compared output — the driver's
    * pandas compare cannot sort raw array cells.
    */
  val q22ArrayOps = Q(
    "q22_order_arrays",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(sort_array(collect_list($"o_orderkey")).as("order_keys"))
        .select($"o_custkey",
          size($"order_keys").as("n"),
          concat_ws(",", slice($"order_keys", 1, 3)).as("first3"),
          element_at($"order_keys", 1).as("first_key"),
          array_contains($"order_keys", $"o_custkey" * 100)
            .as("contains_custkey_x100"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey,
           |       CAST(len(ks) AS INT) AS n,
           |       array_to_string(ks[1:3], ',') AS first3,
           |       ks[1] AS first_key,
           |       list_contains(ks, o_custkey * 100) AS contains_custkey_x100
           |FROM (SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS ks
           |      FROM orders GROUP BY 1)
           |ORDER BY o_custkey""".stripMargin))

  /** The analytic window-function suite (lag/lead/rank/percent_rank/
    * ntile/cume_dist) in one pass — ordering is total (event_id unique)
    * so every function is deterministic on both engines.
    */
  val q23WindowSuite = Q(
    "q23_window_suite",
    (s, dir) => {
      import s.implicits._
      val byId = Window.partitionBy($"event_type").orderBy($"event_id")
      val byValue = Window.partitionBy($"event_type").orderBy($"value")
      t(s, dir, "events")
        .select($"event_id", $"event_type", $"value")
        .withColumn("lag_v", lag($"value", 1).over(byId))
        .withColumn("lead_v", lead($"value", 1).over(byId))
        .withColumn("rnk", rank().over(byValue).cast("bigint"))
        .withColumn("prnk", percent_rank().over(byValue))
        .withColumn("nt", ntile(4).over(byId).cast("bigint"))
        .withColumn("cd", cume_dist().over(byValue))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, event_type, value,
           |       LAG(value, 1) OVER w_id AS lag_v,
           |       LEAD(value, 1) OVER w_id AS lead_v,
           |       RANK() OVER w_val AS rnk,
           |       PERCENT_RANK() OVER w_val AS prnk,
           |       NTILE(4) OVER w_id AS nt,
           |       CUME_DIST() OVER w_val AS cd
           |FROM events
           |WINDOW w_id AS (PARTITION BY event_type ORDER BY event_id),
           |       w_val AS (PARTITION BY event_type ORDER BY value)
           |ORDER BY event_id""".stripMargin))

  /** NULL semantics: NULLIF-derived nullable grouping key (both engines
    * group NULLs together), COUNT(*) vs COUNT(col), and null-safe
    * ordering.
    */
  val q24NullSemantics = Q(
    "q24_null_semantics",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(nullif($"o_orderstatus", lit("O")).as("k"),
          $"o_orderstatus")
        .groupBy($"k")
        .agg(count(lit(1)).as("n_rows"),
          count($"k").as("n_nonnull"),
          count(lit(1)).minus(count($"k")).as("n_null"))
        .orderBy($"k".asc_nulls_first)
    },
    Some("""SELECT NULLIF(o_orderstatus, 'O') AS k,
           |       COUNT(*) AS n_rows,
           |       COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonnull,
           |       COUNT(*) - COUNT(NULLIF(o_orderstatus, 'O')) AS n_null
           |FROM orders GROUP BY 1 ORDER BY k NULLS FIRST""".stripMargin))

  /** S1 (JDBC scan) as a harness query, not just a spec: supplier is
    * round-tripped through an embedded Derby database (the same
    * spark.read.jdbc path the reference uses for Postgres,
    * etl/utils/database.py:36-38) with a PARTITIONED read
    * (partitionColumn/bounds/numPartitions) — the at-scale shape where a
    * single-connection extract would serialize through one executor.
    * The oracle reads the same rows straight from parquet.
    */
  /** The partitioned Derby-backed JDBC supplier frame q25 reads:
    * round-trips the table into an embedded Derby db keyed by `dir`,
    * then opens the 4-way partitioned spark.read.jdbc. Shared with
    * PlanSpec, which asserts predicate pushdown INTO the database on
    * exactly this frame (S1's scale posture: the filter must run in
    * the source, not in Spark after a full extract).
    */
  private[graft] def jdbcSupplierFrame(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dbDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), "graft_derby",
      dir.replaceAll("[^A-Za-z0-9]", "_"))
    java.nio.file.Files.createDirectories(dbDir)
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    val sup = t(s, dir, "supplier")
      .select($"s_suppkey", $"s_name", $"s_acctbal")
    sup.write.mode("overwrite").jdbc(url, "supplier", props)
    val maxKey = sup.agg(max($"s_suppkey")).first().getLong(0)
    val src = graft.sources.JdbcSource(url, user = "", password = "",
      driver = driver,
      partitionOptions = Map(
        "partitionColumn" -> "S_SUPPKEY",
        "lowerBound" -> "0",
        "upperBound" -> (maxKey + 1).toString,
        "numPartitions" -> "4"))
    src.load(s, "supplier")
  }

  val q25JdbcScan = Q(
    "q25_jdbc_scan",
    (s, dir) => {
      import s.implicits._
      jdbcSupplierFrame(s, dir)
        .select(col("S_SUPPKEY").as("s_suppkey"),
          col("S_NAME").as("s_name"),
          col("S_ACCTBAL").as("s_acctbal"))
        .orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, s_acctbal
           |FROM supplier ORDER BY s_suppkey""".stripMargin))

  /** Explicit GROUPING SETS through the SQL surface (distinct from
    * ROLLUP/CUBE: an arbitrary, non-hierarchical set list) — per-flag
    * totals, per-status totals, and the grand total in one pass.
    */
  val q26GroupingSets = Q(
    "q26_grouping_sets",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              |       COUNT(*) AS n
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |       COUNT(*) AS n
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))

  val all: Seq[Q] = Seq(q04LatestEvents, q05EventTypeStats,
    q06LatestEventPerUser, q07TopOrders, q08SemiJoin, q09AntiJoin,
    q10SetOps, q11Rollup, q12DateParts, q13StringFuncs, q14Conditionals,
    q15WindowAgg, q16DistinctCounts, q17JsonExtract, q18Pivot, q19Cube,
    q20DateArith, q21SqlCorrelated, q22ArrayOps, q23WindowSuite,
    q24NullSemantics, q25JdbcScan, q26GroupingSets)
}
