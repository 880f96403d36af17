package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, RangeJoin, Similarity, Upsert}
import graft.functions.{Parsers, TextAnalysis, Vectors}

/** The registered query inventory: every implemented operator from
  * SURVEY.md §2 (and the LLM-pipeline extensions) exercised as a
  * deterministic query over the driver's testdata tables, each paired
  * with ANSI SQL that DuckDB runs as the correctness oracle.
  *
  * Determinism rules applied throughout (the driver hash-compares
  * values after sorting columns by name):
  *  - every query ends in an ORDER BY over a unique key;
  *  - double-typed SUMs go through exact DECIMAL(18,2) accumulation
  *    and only the final (exact) value is cast back to double, so
  *    Spark's partition-order float addition can never drift from
  *    DuckDB's sequential addition;
  *  - cosine similarities are rounded to 4 decimals on both sides.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet has shipped with either TIMESTAMP(NANOS) — which
      // Spark's Parquet reader rejects, so we read the raw int64 nanos and
      // truncate to micros (integer div; a double division would lose
      // precision at 1e18, and DuckDB's nanos→micros truncates the same
      // way) — or plain TIMESTAMP(MICROS), which Spark 4 infers as NTZ.
      // Normalize both to TimestampType. The NTZ→Timestamp cast is
      // value-preserving only under session TZ = UTC, so that
      // precondition is asserted here rather than assumed: a future
      // entry point with a non-UTC session would otherwise silently
      // shift every event timestamp.
      require(s.conf.get("spark.sql.session.timeZone") == "UTC",
        s"events.parquet NTZ normalization requires spark.sql.session.timeZone=UTC " +
          s"(got '${s.conf.get("spark.sql.session.timeZone")}')")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = s.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => df
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case other =>
          // Any other type means the regenerated file drifted from its
          // contract — fail loudly instead of casting to nulls.
          throw new IllegalStateException(
            s"events.parquet ts column has unexpected type $other " +
              "(expected TIMESTAMP, TIMESTAMP_NTZ, or legacy nanos int64)")
      }
    } else s.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal accumulation for double money/qty columns. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  type Q = (SparkSession, String) => DataFrame

  /** name -> (spark query, optional DuckDB oracle SQL). */
  val all: Seq[(String, Q, Option[String])] = Seq(

    // ── Star-schema query surface (SURVEY §3.3 Q1–Q9 analogs) ──────────

    ("q01_pricing_summary", (s: SparkSession, d: String) => {
      val li = t(s, d, "lineitem").filter(col("l_shipdate") <= lit("2000-12-01"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= '2000-12-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    ("q02_filter_project", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(500)
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      FROM lineitem
      WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' AND l_quantity > 45
      ORDER BY l_orderkey, l_linenumber LIMIT 500""")),

    ("q03_join_agg_segment", (s: SparkSession, d: String) => {
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    ("q04_count_by_supplier", (s: SparkSession, d: String) => {
      t(s, d, "lineitem").groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n")).orderBy(col("l_suppkey"))
    }, Some("SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey")),

    ("q05_count_by_status", (s: SparkSession, d: String) => {
      t(s, d, "orders").groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n")).orderBy(col("o_orderstatus"))
    }, Some("SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    ("q06_point_lookup", (s: SparkSession, d: String) => {
      t(s, d, "orders").filter(col("o_orderkey") === 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    }, Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey = 100")),

    ("q07_first_n", (s: SparkSession, d: String) => {
      t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey")).limit(3)
    }, Some("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 3")),

    ("q08_stale_selection", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1996-01-01") && col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderdate FROM orders
      WHERE o_orderdate < '1996-01-01' AND o_orderpriority = '1-URGENT'
      ORDER BY o_orderkey""")),

    // J5 — quantity-tier range resolution via broadcast range join.
    ("q09_tier_pricing", (s: SparkSession, d: String) => {
      val tiers = s.createDataFrame(Seq(
        (1.0, Some(9.0), "small"), (10.0, Some(24.0), "mid"), (25.0, None, "bulk")))
        .toDF("min_qty", "max_qty", "tier")
      RangeJoin.resolveTier(t(s, d, "lineitem"), tiers,
          col("l_quantity"), col("min_qty"), col("max_qty"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("tier"))
    }, Some("""
      SELECT t.tier, count(*) AS n,
        CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem l
      LEFT JOIN (VALUES (1.0, 9.0, 'small'), (10.0, 24.0, 'mid'), (25.0, NULL, 'bulk'))
        t(min_qty, max_qty, tier)
        ON l.l_quantity >= t.min_qty AND (t.max_qty IS NULL OR l.l_quantity <= t.max_qty)
      GROUP BY t.tier ORDER BY t.tier""")),

    // J1-style broadcast dimension join.
    ("q10_dim_join_brand", (s: SparkSession, d: String) => {
      t(s, d, "lineitem").join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("p_brand"))
    }, Some("""
      SELECT p_brand, count(*) AS n,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""")),

    ("q11_star_multijoin", (s: SparkSession, d: String) => {
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"))
    }, Some("""
      SELECT r_name, count(*) AS n_customers,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    // W3 — window dedup / top-1 per key.
    ("q12_top_order_per_customer", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn = 1 ORDER BY o_custkey""")),

    // J8/U1 — unionByName across sources.
    ("q13_union_sources", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"), col("o_orderstatus"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_orderstatus"), col("o_orderkey"))
      a.unionByName(b).groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }, Some("""
      SELECT o_orderstatus, count(*) AS n FROM (
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        UNION ALL SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // J7/K3 — anti join.
    ("q14_customers_without_orders", (s: SparkSession, d: String) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    ("q15_customers_with_urgent", (s: SparkSession, d: String) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment")).orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")),

    // K1 — keyed merge upsert: last writer wins, incoming over existing.
    ("q16_merge_upsert", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val existing = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("ts"), col("value"))
      val incoming = ev.filter(col("event_id") % 3 === 0)
        .select(col("event_id"), col("ts"), (col("value") * 2).as("value"))
      Upsert.merge(existing, incoming, "event_id", "ts")
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, ts, value FROM (
        SELECT event_id, ts, value,
          row_number() OVER (PARTITION BY event_id ORDER BY ts DESC, src DESC) AS rn
        FROM (
          SELECT event_id, ts, value, 0 AS src FROM events WHERE event_id % 2 = 0
          UNION ALL
          SELECT event_id, ts, value * 2 AS value, 1 AS src FROM events WHERE event_id % 3 = 0))
      WHERE rn = 1 ORDER BY event_id""")),

    // K6 — uniqueness check.
    ("q17_duplicate_keys", (s: SparkSession, d: String) => {
      Upsert.duplicateKeys(t(s, d, "lineitem"), "l_orderkey").orderBy(col("l_orderkey"))
    }, Some("""
      SELECT l_orderkey, count(*) AS n FROM lineitem
      GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey""")),

    // K3 — keyed delete via anti join, then accounting.
    ("q18_delete_by_keys", (s: SparkSession, d: String) => {
      val badCustomers = t(s, d, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("o_custkey"))
      Upsert.deleteByKeys(t(s, d, "orders"), badCustomers, "o_custkey")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }, Some("""
      SELECT o_orderstatus, count(*) AS n FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // K4 — predicate delete (retention).
    ("q19_retention_delete", (s: SparkSession, d: String) => {
      Upsert.deleteWhere(t(s, d, "orders"),
          col("o_orderstatus") === "F" && col("o_orderdate") < lit("1997-01-01"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }, Some("""
      SELECT o_orderstatus, count(*) AS n FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_orderdate < '1997-01-01')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // A5 — order-sensitive first element per group.
    ("q20_first_per_group", (s: SparkSession, d: String) => {
      t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(min(struct(col("l_linenumber"), col("l_partkey")))
          .getField("l_partkey").as("first_partkey"))
        .orderBy(col("l_orderkey"))
    }, Some("""
      SELECT l_orderkey, l_partkey AS first_partkey FROM lineitem
      QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) = 1
      ORDER BY l_orderkey""")),

    // W4 — in-group ordering into a sorted array.
    ("q21_sorted_linenumbers", (s: SparkSession, d: String) => {
      t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(concat_ws(",",
          transform(sort_array(collect_list(col("l_linenumber"))), x => x.cast("string")))
          .as("linenumbers"))
        .orderBy(col("l_orderkey"))
    }, Some("""
      SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // F16 — JSON field extraction.
    ("q22_json_extract", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("k") > 50)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, count(*) AS n FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
      GROUP BY event_type ORDER BY event_type""")),

    // Time-bucketed aggregation (streaming-shaped, batch-executed).
    ("q23_events_hourly", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }, Some("""
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // J5 as-of variant — greatest threshold <= value.
    ("q24_asof_band", (s: SparkSession, d: String) => {
      val tiers = s.createDataFrame(Seq(
        (0.0, "b0"), (100.0, "b1"), (200.0, "b2"), (300.0, "b3"), (400.0, "b4")))
        .toDF("thr", "band")
      RangeJoin.resolveAsOf(t(s, d, "events"), Seq("event_id"), tiers,
          col("value"), col("thr"))
        .select(col("event_id"), col("band")).orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, band FROM (
        SELECT e.event_id, t.band,
          row_number() OVER (PARTITION BY e.event_id ORDER BY t.thr DESC) AS rn
        FROM events e
        LEFT JOIN (VALUES (0.0,'b0'),(100.0,'b1'),(200.0,'b2'),(300.0,'b3'),(400.0,'b4')) t(thr, band)
          ON e.value >= t.thr)
      WHERE rn = 1 ORDER BY event_id""")),

    // ── Scalar parser functions (SURVEY §2.7) over testdata columns ────

    ("q25_parse_float_comma", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          Parsers.parseFloatComma(
            concat(col("doc_id").cast("string"), lit(","), (col("n_chars") % 10).cast("string")))
            .as("parsed"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        CAST(replace(doc_id || ',' || (n_chars % 10), ',', '.') AS DOUBLE) AS parsed
      FROM documents ORDER BY doc_id""")),

    ("q26_parse_int_thousands", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          Parsers.parseIntSeparators(
            concat(col("doc_id").cast("string"), lit("."),
              lpad((col("n_chars") % 1000).cast("string"), 3, "0")))
            .as("parsed"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        CAST(replace(doc_id || '.' || lpad(CAST(n_chars % 1000 AS VARCHAR), 3, '0'), '.', '') AS INTEGER) AS parsed
      FROM documents ORDER BY doc_id""")),

    ("q27_parse_currency", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .select(col("event_id"),
          Parsers.parseCurrency(
            when(col("event_type") === "error", lit("N/A"))
              .otherwise(concat(lit("£"), col("value").cast("string"))))
            .as("parsed"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS parsed
      FROM events ORDER BY event_id""")),

    ("q28_parse_iso_date", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .select(col("o_orderkey"),
          date_format(Parsers.parseIsoDate(
            when(col("o_orderkey") % 10 === 0, lit("not-a-date"))
              .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))), "yyyy-MM-dd")
            .as("parsed"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 10 = 0 THEN NULL
             ELSE strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') END AS parsed
      FROM orders ORDER BY o_orderkey""")),

    ("q29_yes_no_flag", (s: SparkSession, d: String) => {
      t(s, d, "part")
        .select(col("p_partkey"),
          Parsers.yesNoFlag(when(col("p_size") % 2 === 0, lit("Yes")).otherwise(lit("no")))
            .as("flag"))
        .orderBy(col("p_partkey"))
    }, Some("SELECT p_partkey, p_size % 2 = 0 AS flag FROM part ORDER BY p_partkey")),

    ("q30_snake_to_title", (s: SparkSession, d: String) => {
      t(s, d, "events").select(col("event_type")).distinct()
        .select(col("event_type"),
          Parsers.snakeToTitle(concat(col("event_type"), lit("_rate"))).as("title"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
        upper(substr(event_type, 1, 1)) || substr(event_type, 2) || ' Rate' AS title
      FROM (SELECT DISTINCT event_type FROM events) ORDER BY event_type""")),

    ("q31_namespaced_key", (s: SparkSession, d: String) => {
      t(s, d, "supplier")
        .select(col("s_suppkey"), Parsers.namespacedKey("sup_", col("s_suppkey")).as("key"))
        .orderBy(col("s_suppkey"))
    }, Some("SELECT s_suppkey, 'sup_' || s_suppkey AS key FROM supplier ORDER BY s_suppkey")),

    ("q32_code_lookup", (s: SparkSession, d: String) => {
      val mapping = Map("A" -> "returned", "N" -> "none", "R" -> "refused")
      t(s, d, "lineitem")
        .select(Parsers.codeLookup(mapping)(col("l_returnflag")).as("label"))
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    }, Some("""
      SELECT CASE l_returnflag WHEN 'A' THEN 'returned' WHEN 'N' THEN 'none'
        WHEN 'R' THEN 'refused' END AS label, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY label""")),

    ("q33_derive_status", (s: SparkSession, d: String) => {
      val df = t(s, d, "documents")
      val disc = when(col("doc_id") % 3 === 0, lit("2099-12-31"))
        .when(col("doc_id") % 3 === 1, lit("2020-01-01"))
        .otherwise(lit(null).cast("string"))
      val plc = when(col("doc_id") % 5 === 0, lit("PRODUCT DISCONTINUED")).otherwise(lit("OK"))
      df.select(col("doc_id"), Parsers.deriveStatus(disc, plc).as("status"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 1 THEN 'discontinued'
             WHEN doc_id % 5 = 0 THEN 'discontinued'
             ELSE 'active' END AS status
      FROM documents ORDER BY doc_id""")),

    ("q34_struct_or_null", (s: SparkSession, d: String) => {
      val df = t(s, d, "part")
      val l = when(col("p_size") > 25, col("p_size").cast("double"))
      val dims = Parsers.structOrNull(Seq(
        "length" -> l, "width" -> lit(null).cast("double"), "height" -> lit(null).cast("double")))
      df.select(col("p_partkey"), dims.isNotNull.as("has_dims"),
          dims.getField("length").as("length"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey, p_size > 25 AS has_dims,
        CASE WHEN p_size > 25 THEN CAST(p_size AS DOUBLE) END AS length
      FROM part ORDER BY p_partkey""")),

    ("q35_parse_dims", (s: SparkSession, d: String) => {
      val df = t(s, d, "part")
      val str = when(col("p_partkey") % 2 === 0,
          concat(col("p_size").cast("string"), lit("x"), (col("p_size") * 2).cast("string"),
            lit("x"), (col("p_size") * 3).cast("string"), lit("mm")))
        .otherwise(
          concat(col("p_size").cast("string"), lit(" x "), (col("p_size") + 1).cast("string"),
            lit(" x "), (col("p_size") + 2).cast("string"), lit(" cm")))
      val p = Parsers.parseDims(str)
      df.select(col("p_partkey"),
          p.getField("length").as("length"), p.getField("width").as("width"),
          p.getField("height").as("height"), p.getField("unit").as("unit"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey,
        CAST(p_size AS DOUBLE) AS length,
        CAST(CASE WHEN p_partkey % 2 = 0 THEN p_size * 2 ELSE p_size + 1 END AS DOUBLE) AS width,
        CAST(CASE WHEN p_partkey % 2 = 0 THEN p_size * 3 ELSE p_size + 2 END AS DOUBLE) AS height,
        CASE WHEN p_partkey % 2 = 0 THEN 'mm' ELSE 'cm' END AS unit
      FROM part ORDER BY p_partkey""")),

    ("q36_parse_weight", (s: SparkSession, d: String) => {
      val p = Parsers.parseWeight(concat(col("p_size").cast("string"), lit(".5 kg")))
      t(s, d, "part")
        .select(col("p_partkey"), p.getField("value").as("value"), p.getField("unit").as("unit"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey, p_size + 0.5 AS value, 'kg' AS unit FROM part ORDER BY p_partkey""")),

    ("q37_split_keywords", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          concat_ws("|", Parsers.splitKeywords(
            concat(col("source"), lit(","), col("lang"), lit(" , extra")))).as("keywords"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, source || '|' || lang || '|extra' AS keywords
      FROM documents ORDER BY doc_id""")),

    ("q38_merge_singleton_maps", (s: SparkSession, d: String) => {
      val merged = Parsers.mergeSingletonMaps(array(
        map(lit("lang"), col("lang")), map(lit("src"), col("source"))))
      t(s, d, "documents")
        .select(col("doc_id"), element_at(merged, "lang").as("lang_val"),
          element_at(merged, "src").as("src_val"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang AS lang_val, source AS src_val FROM documents ORDER BY doc_id""")),

    // ── Text analysis over the documents table ─────────────────────────

    ("q39_token_count", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents ORDER BY doc_id""")),

    ("q40_subtoken_count", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .select(col("event_id"), TextAnalysis.subTokenCount(col("props")).as("n_subtokens"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
        len(regexp_extract_all(props, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens
      FROM events ORDER BY event_id""")),

    ("q41_fingerprint_groups", (s: SparkSession, d: String) => {
      Dedup.fingerprintGroups(t(s, d, "documents"), col("text"), col("doc_id"))
        .orderBy(col("fingerprint"))
    }, Some("""
      SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint,
        count(*) AS n_dups, min(doc_id) AS keep_id
      FROM documents GROUP BY 1 ORDER BY fingerprint""")),

    ("q42_exact_keep_first", (s: SparkSession, d: String) => {
      Dedup.exactKeepFirst(t(s, d, "documents"), col("text"), col("doc_id"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id FROM documents
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      ORDER BY doc_id""")),

    ("q43_detect_language", (s: SparkSession, d: String) => {
      // Stage the token array first (the shinglesOf performance
      // contract) so the argmax tree references an attribute, not ~8
      // inlined re-tokenizations.
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokens(TextAnalysis.normalized(col("text"))).as("__ws"))
        .select(col("doc_id"), TextAnalysis.detectLanguageFrom(col("__ws")).as("detected"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH sc AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      scores AS (
        SELECT doc_id,
          len(list_filter(ws, w -> w IN ('der','die','und','das','ist','nicht','mit','ein','für'))) AS de,
          len(list_filter(ws, w -> w IN ('the','and','of','to','in','is','that','for','with'))) AS en,
          len(list_filter(ws, w -> w IN ('el','la','de','que','los','por','una','con','para'))) AS es,
          len(list_filter(ws, w -> w IN ('le','la','les','des','est','que','pour','dans','une'))) AS fr
        FROM sc)
      SELECT doc_id,
        CASE WHEN de >= en AND de >= es AND de >= fr AND de > 0 THEN 'de'
             WHEN en >= es AND en >= fr AND en > 0 THEN 'en'
             WHEN es >= fr AND es > 0 THEN 'es'
             WHEN fr > 0 THEN 'fr'
             ELSE 'und' END AS detected
      FROM scores ORDER BY doc_id""")),

    ("q44_quality_features", (s: SparkSession, d: String) => {
      val q = TextAnalysis.qualityFeatures(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"),
          q.getField("n_chars").as("n_chars"), q.getField("n_tokens").as("n_tokens"),
          q.getField("mean_token_len").as("mean_token_len"),
          q.getField("punct_ratio").as("punct_ratio"),
          q.getField("stopword_ratio").as("stopword_ratio"),
          q.getField("upper_ratio").as("upper_ratio"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH b AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ('the','and','of','to','in','is','that','for','with'))) AS BIGINT) AS n_stop,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
          CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper
        FROM documents)
      SELECT doc_id, n_chars, n_tokens,
        CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_token_len,
        CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
        CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
        CASE WHEN n_chars > 0 THEN CAST(n_upper AS DOUBLE) / n_chars ELSE 0.0 END AS upper_ratio
      FROM b ORDER BY doc_id""")),

    // Multimodal plumbing: opaque binary column + content hash (the
    // decode step is stubbed; the Spark-side schema/partitioning is real).
    ("q45_binary_fingerprint", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("content_sha"))
        .orderBy(col("doc_id"))
    }, Some("SELECT doc_id, sha256(text) AS content_sha FROM documents ORDER BY doc_id")),

    // ── Similarity / ANN over the embeddings table ─────────────────────

    ("q46_cosine_topk", (s: SparkSession, d: String) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"),
          col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      s AS (
        SELECT query_id, neighbor_id,
          list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
        FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      r AS (
        SELECT query_id, neighbor_id, round(cos, 4) AS cosine,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM s)
      SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
      ORDER BY query_id, rank""")),

    ("q47_near_dup_pairs_exact", (s: SparkSession, d: String) => {
      Similarity.nearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
          threshold = 0.35, bucketed = false)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
      ORDER BY id_a, id_b""")),

    // LSH sign-bucket assignment (the scale path's partitioning step).
    // ── PIM ingestion pipeline. The oracle can't read JSONC, so the
    //    check columns are pinned as VALUES literals — the same outputs
    //    the golden specs assert, derived from the reference sample
    //    captures (regenerate: tools/gen_values_oracle.py). ──────────
    ("q49_midocean_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/MidOcean Sample Data.jsonc"
      graft.suppliers.MidOcean.unified(s, sample)
        .select(col("product_id"), col("supplier_product_code"), col("name"),
          col("is_printable"), size(col("variants")).as("n_variants"),
          size(col("print_positions")).as("n_print_positions"),
          size(col("print_options")).as("n_print_options"), col("status"),
          // Language-map lookups: localized product name (unified.jsonc
          // {lang} maps) and the first print option's per-language
          // technique names (printdata descriptions via F19).
          element_at(col("localized.name"), "en").as("name_en"),
          element_at(try_element_at(col("print_options"), lit(1))
            .getField("technique_names"), "de").as("first_technique_de"),
          element_at(col("product_extra_data"), "master_id").as("master_id"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('midocean_AR1249', 'AR1249', 'TARGET', true, 1, 4, 65, 'active', 'TARGET', 'Prägung', '40000011'),
        ('midocean_AR1253', 'AR1253', 'BASICS', true, 1, 3, 65, 'active', 'BASICS', 'Prägung', '40000012'),
        ('midocean_AR1470', 'AR1470', 'HIGH PARK', true, 1, 3, 65, 'active', 'HIGH PARK', 'Prägung', '40000048'),
        ('midocean_AR1589', 'AR1589', 'COLUMBUS', true, 1, 4, 65, 'active', 'COLUMBUS', 'Prägung', '40000080'),
        ('midocean_AR1804', 'AR1804', 'ARCONOT', true, 10, 5, 65, 'active', 'ARCONOT', 'Prägung', '40000190')
      ) AS t(product_id, supplier_product_code, name, is_printable, n_variants, n_print_positions, n_print_options, status, name_en, first_technique_de, master_id)
      ORDER BY product_id""")),

    ("q50_laltex_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/Laltex Sample Data.jsonc"
      graft.suppliers.Laltex.unified(s, sample)
        .select(col("product_id"), col("name"), size(col("variants")).as("n_variants"),
          size(col("base_prices")).as("n_price_tiers"),
          size(col("keywords")).as("n_keywords"), col("is_printable"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('laltex_AA0131', 'Eye Mask', 8, 10, 9, true),
        ('laltex_AA0135', 'Venus Tyre Gauge Keyring', 1, 10, 9, true),
        ('laltex_AA0411', 'Cabot Ice Scraper', 6, 10, 9, true),
        ('laltex_AA0412', 'Hudson Ice Scraper', 10, 10, 9, true)
      ) AS t(product_id, name, n_variants, n_price_tiers, n_keywords, is_printable)
      ORDER BY product_id""")),

    ("q51_pipeline_full_sync", (s: SparkSession, d: String) => {
      import graft.pipeline.{Pipeline, SupplierConfig}
      val sink = java.nio.file.Files.createTempDirectory("graft-q51").toString + "/products"
      val results = Pipeline.runFullSync(s, Seq(
        SupplierConfig("midocean", "/root/reference/sample data/MidOcean Sample Data.jsonc"),
        SupplierConfig("laltex", "/root/reference/sample data/Laltex Sample Data.jsonc")), sink)
      require(results.forall(_.status == "success"),
        s"pipeline statuses: ${results.map(r =>
          s"${r.supplier}=${r.status}${r.errorSamples.mkString("[", "; ", "]")}")}")
      Pipeline.statusReport(s, sink)
    }, Some("""
      SELECT * FROM (VALUES
        ('laltex', 'active', 4, 25),
        ('midocean', 'active', 5, 14)
      ) AS t(supplier_id, status, n_products, n_variants)
      ORDER BY supplier_id""")),

    // MinHash/LSH with a DuckDB oracle: near-dups are synthesized by
    // unioning a mutated copy of each doc (append 3 words), so the
    // banding join must find every (id, id+100000) pair.
    ("q54_minhash_pairs", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val mutated = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
      Dedup.minHashPairs(base.unionByName(mutated), col("text"), col("doc_id"),
          numHashes = 12, bands = 4, shingleWidth = 3, threshold = 0.3,
          fastHash = false)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some {
      val seeds = (0 until 12).map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        .mkString("[", ", ", "]")
      s"""
      WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text || ' zz yy xx' AS text
        FROM documents WHERE doc_id < 200),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w),
      sig AS (SELECT doc_id, $seeds AS sig FROM shingled),
      banded AS (
        SELECT doc_id, sig, t.b AS band,
          md5(array_to_string(sig[t.b*3+1:t.b*3+3], ' ')) AS bucket
        FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
      pairs AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
          len(list_filter(generate_series(1, 12), i -> l.sig[i] = r.sig[i])) / 12.0 AS est
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
      SELECT id_a, id_b, round(est, 4) AS est_jaccard FROM pairs
      WHERE est >= 0.3 ORDER BY id_a, id_b"""
    }),

    // SimHash banded Hamming pairs. xxhash64 isn't expressible in the
    // oracle dialect, so the (deterministic, sf0.01) pair set is pinned
    // as VALUES literals (regenerate: tools/gen_values_oracle.py).
    ("q55_simhash_pairs", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val mutated = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
      Dedup.simHashPairs(base.unionByName(mutated), col("text"), col("doc_id"),
          bits = 64, bands = 4, maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }, Some("""
      SELECT * FROM (VALUES
        (1, 100001, 1),
        (5, 100005, 3),
        (8, 100008, 3),
        (9, 100009, 3),
        (10, 100010, 2),
        (18, 100018, 3),
        (23, 100023, 3),
        (40, 100040, 3),
        (41, 100041, 3),
        (49, 100049, 3),
        (50, 100050, 2),
        (51, 100051, 3),
        (54, 100054, 3),
        (58, 100058, 2),
        (60, 100060, 2),
        (61, 185, 0),
        (61, 100061, 2),
        (66, 100066, 3),
        (72, 100072, 2),
        (73, 100073, 1),
        (77, 100077, 2),
        (80, 100080, 3),
        (81, 100081, 2),
        (84, 100084, 3),
        (87, 100087, 3),
        (91, 100091, 2),
        (93, 100093, 3),
        (95, 100095, 3),
        (98, 100098, 3),
        (102, 100102, 1),
        (103, 100103, 2),
        (113, 100113, 3),
        (117, 100117, 3),
        (118, 100118, 2),
        (124, 100124, 1),
        (126, 100126, 2),
        (128, 100128, 3),
        (132, 100132, 2),
        (141, 100141, 3),
        (143, 100143, 2),
        (151, 100151, 3),
        (152, 178, 3),
        (155, 100155, 3),
        (162, 100162, 3),
        (171, 100171, 3),
        (173, 100173, 1),
        (176, 100176, 3),
        (182, 100182, 2),
        (185, 100061, 2),
        (189, 100189, 3)
      ) AS t(id_a, id_b, hamming)
      ORDER BY id_a""")),

    // Exact shingle-set Jaccard scored only for given candidate pairs
    // (the 100 TB path: candidates come from MinHash, not all-pairs).
    ("q56_jaccard_candidates", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val candidates = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
        .join(docs.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
      Dedup.ngramJaccardFor(docs, col("text"), col("doc_id"), candidates)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some("""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      shingled AS (SELECT doc_id, list_distinct(
          CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
               ELSE list_transform(generate_series(1, len(ws) - 2),
                      i -> array_to_string(ws[i:i+2], ' ')) END) AS sh
        FROM w),
      cand AS (
        SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b FROM documents a
        WHERE EXISTS (SELECT 1 FROM documents b WHERE b.doc_id = a.doc_id + 1))
      SELECT c.id_a, c.id_b,
        round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
      FROM cand c
      JOIN shingled sa ON sa.doc_id = c.id_a
      JOIN shingled sb ON sb.doc_id = c.id_b
      ORDER BY id_a, id_b""")),

    ("q53_ralawise_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/Ralawise Sample Data.jsonc"
      graft.suppliers.Ralawise.unified(s, sample)
        .select(col("product_id"), col("name"), col("brand"),
          size(col("variants")).as("n_variants"),
          size(col("categories")).as("n_categories"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('ralawise_TS009', 'Hooded 2-layer softshell jacket', '2786', 1, 4),
        ('ralawise_TS012', 'Softshell jacket', '2786', 1, 10),
        ('ralawise_TS013', 'Parka jacket', '2786', 1, 10)
      ) AS t(product_id, name, brand, n_variants, n_categories)
      ORDER BY product_id""")),

    ("q57_keramikos_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/Keramikos Sample Data.jsonc"
      graft.suppliers.Keramikos.unified(s, sample)
        .select(col("product_id"), col("name"), col("status"), col("is_printable"),
          size(col("print_options")).as("n_print_options"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('keramikos_ATLWHI', 'Atlantic White', 'active', true, 3),
        ('keramikos_BELBLA', 'Bell Black', 'active', true, 2),
        ('keramikos_BELFAST', 'Belfast Earthenware Mug', 'active', true, 2),
        ('keramikos_BELMBL', 'Bell Midnight Blue', 'active', true, 2)
      ) AS t(product_id, name, status, is_printable, n_print_options)
      ORDER BY product_id""")),

    ("q58_preseli_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/Preseli Sample Data.jsonc"
      graft.suppliers.Preseli.unified(s, sample)
        .select(col("product_id"), col("name"), size(col("base_prices")).as("n_price_tiers"),
          size(col("images")).as("n_images"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('preseli_PSL10', '10mm Plant Silk Lanyard', 8, 4)
      ) AS t(product_id, name, n_price_tiers, n_images)
      ORDER BY product_id""")),

    ("q59_xd_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/XD Sample Data.jsonc"
      graft.suppliers.Xd.unified(s, sample)
        .select(col("product_id"), col("name"), col("brand"),
          size(col("variants")).as("n_variants"),
          size(element_at(col("variants"), 1).getField("prices")).as("n_price_tiers"),
          element_at(col("variants"), 1).getField("stock").getField("available")
            .as("stock_available"),
          // unified.jsonc packaging/sustainability/lifecycle extension.
          col("packaging.outer_carton.qty").as("carton_qty"),
          col("sustainability.eco").as("eco"),
          col("sustainability.recycled_content_pct").as("recycled_pct"),
          col("lifecycle.product_lifecycle").as("product_lifecycle"),
          // X1 — localized `{lang}` maps (unified.jsonc:25-33).
          element_at(col("localized.name"), "en").as("name_en"),
          element_at(col("localized.brand"), "en").as("brand_en"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('xd_V10200', 'VINGA Cott RCS RPET water bottle', 'Vinga', 1, 6, 17525, 48, true, 98.0, 'Outlet',
         'VINGA Cott RCS RPET water bottle', 'Vinga')
      ) AS t(product_id, name, brand, n_variants, n_price_tiers, stock_available, carton_qty, eco, recycled_pct, product_lifecycle, name_en, brand_en)
      ORDER BY product_id""")),

    ("q60_pfconcept_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/PFConcept Sample Data.jsonc"
      graft.suppliers.PfConcept.unified(s, sample)
        .select(col("product_id"), col("name"), col("brand"),
          col("weight.value").as("weight_value"), col("weight.unit").as("weight_unit"),
          size(col("print_options")).as("n_print_options"),
          // unified.jsonc:21 relatedProducts (sorted-distinct union).
          array_join(col("related_products"), ",").as("related"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('pfconcept_R1070', 'Clasica unisex crewneck sweater', 'Roly', 12.0, 'kg', 1,
         '37512,37513,38210,38231,38232,K1070,R1071')
      ) AS t(product_id, name, brand, weight_value, weight_unit, n_print_options, related)
      ORDER BY product_id""")),

    ("q61_sands_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/s&s.jsonc"
      graft.suppliers.SandS.unified(s, sample)
        .select(col("product_id"), col("name"), col("brand"),
          size(col("variants")).as("n_variants"),
          element_at(col("variants"), 1).getField("stock").getField("available")
            .as("stock_available"),
          // unified.jsonc:249-257 per-warehouse stock.locations.
          element_at(element_at(col("variants"), 1).getField("stock")
            .getField("locations"), 1).getField("id").as("location_id"),
          element_at(element_at(col("variants"), 1).getField("stock")
            .getField("locations"), 1).getField("qty").as("location_qty"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('ss_39', '2000', 'Gildan', 1, 7500, 'KS', 500)
      ) AS t(product_id, name, brand, n_variants, stock_available, location_id, location_qty)
      ORDER BY product_id""")),

    ("q62_sanmar_unified", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/Sanmar Sample Data.jsonc"
      graft.suppliers.Sanmar.unified(s, sample)
        .select(col("product_id"), col("name"), col("brand"),
          size(col("variants")).as("n_variants"),
          size(col("keywords")).as("n_keywords"),
          size(col("categories")).as("n_categories"),
          // unified.jsonc:21-22 relation split (Companion Sell vs
          // Substitute).
          array_join(col("related_products"), ",").as("related"),
          size(col("alternative_products")).as("n_alternatives"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('sanmar_108085', 'OGIO - Crunch Duffel. 108085', 'OGIO', 1, 34, 2, '108085', 0)
      ) AS t(product_id, name, brand, n_variants, n_keywords, n_categories, related, n_alternatives)
      ORDER BY product_id""")),

    // Multimodal plumbing: documents' text bytes stand in for media
    // content; decode is the documented stub (java-hashCode dims, not
    // oracle-dialect-expressible), so the deterministic sf0.01 output
    // is pinned as VALUES literals (tools/gen_values_oracle.py).
    ("q52_media_decode", (s: SparkSession, d: String) => {
      val media = t(s, d, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
      graft.operators.Multimodal.decodeMeta(media).toDF()
        .orderBy(col("media_id"))
    }, Some("""
      SELECT * FROM (VALUES
        (0, 499, 577, 157),
        (1, 300, 539, 406),
        (2, 739, 733, 246),
        (3, 334, 460, 147),
        (4, 302, 815, 250),
        (5, 1180, 337, 314),
        (6, 866, 646, 78),
        (7, 262, 1008, 402),
        (8, 496, 624, 470),
        (9, 727, 562, 391),
        (10, 1043, 387, 214),
        (11, 1071, 718, 304),
        (12, 1095, 1141, 348),
        (13, 578, 944, 346),
        (14, 909, 461, 495),
        (15, 415, 820, 228),
        (16, 408, 717, 90),
        (17, 981, 705, 426),
        (18, 1057, 825, 423),
        (19, 629, 729, 57),
        (20, 900, 876, 394),
        (21, 750, 1127, 217),
        (22, 395, 962, 454),
        (23, 1229, 1038, 166),
        (24, 326, 435, 535),
        (25, 1195, 805, 505),
        (26, 810, 282, 63),
        (27, 714, 1070, 346),
        (28, 525, 1186, 334),
        (29, 546, 531, 196),
        (30, 710, 755, 167),
        (31, 261, 354, 250),
        (32, 1119, 1043, 513),
        (33, 897, 1162, 247),
        (34, 852, 1102, 165),
        (35, 1178, 1250, 452),
        (36, 602, 958, 135),
        (37, 912, 334, 378),
        (38, 499, 426, 203),
        (39, 975, 868, 124),
        (40, 515, 1261, 421),
        (41, 669, 966, 337),
        (42, 1061, 445, 303),
        (43, 469, 808, 152),
        (44, 1206, 515, 128),
        (45, 696, 407, 432),
        (46, 1234, 358, 492),
        (47, 880, 871, 224),
        (48, 1249, 721, 164),
        (49, 629, 946, 256),
        (50, 471, 932, 256),
        (51, 332, 816, 326),
        (52, 1245, 1082, 63),
        (53, 925, 1228, 190),
        (54, 410, 518, 357),
        (55, 742, 664, 196),
        (56, 1223, 325, 549),
        (57, 422, 942, 447),
        (58, 1197, 805, 389),
        (59, 1140, 1149, 118),
        (60, 866, 954, 493),
        (61, 1187, 520, 309),
        (62, 784, 458, 392),
        (63, 1075, 621, 529),
        (64, 569, 459, 135),
        (65, 428, 708, 99),
        (66, 898, 828, 352),
        (67, 935, 1047, 333),
        (68, 563, 903, 186),
        (69, 262, 448, 308),
        (70, 880, 1200, 509),
        (71, 1277, 534, 336),
        (72, 856, 567, 230),
        (73, 1003, 730, 503),
        (74, 755, 615, 48),
        (75, 1169, 709, 312),
        (76, 704, 988, 382),
        (77, 813, 755, 319),
        (78, 795, 319, 233),
        (79, 865, 832, 63),
        (80, 598, 817, 172),
        (81, 1026, 1244, 357),
        (82, 1127, 885, 260),
        (83, 520, 265, 88),
        (84, 376, 1183, 403),
        (85, 1174, 1193, 155),
        (86, 1099, 665, 138),
        (87, 768, 783, 128),
        (88, 614, 356, 289),
        (89, 437, 259, 141),
        (90, 1086, 566, 112),
        (91, 892, 563, 431),
        (92, 406, 1127, 146),
        (93, 816, 337, 130),
        (94, 476, 334, 143),
        (95, 1077, 745, 296),
        (96, 817, 714, 454),
        (97, 659, 452, 320),
        (98, 276, 619, 526),
        (99, 1139, 1035, 196),
        (100, 422, 1251, 461),
        (101, 830, 1256, 232),
        (102, 1075, 1071, 515),
        (103, 917, 706, 527),
        (104, 831, 529, 246),
        (105, 646, 952, 328),
        (106, 689, 972, 70),
        (107, 567, 783, 212),
        (108, 1247, 827, 86),
        (109, 663, 774, 395),
        (110, 1185, 807, 54),
        (111, 1009, 336, 529),
        (112, 870, 394, 322),
        (113, 409, 302, 428),
        (114, 421, 838, 207),
        (115, 972, 464, 132),
        (116, 1200, 459, 62),
        (117, 983, 820, 246),
        (118, 635, 428, 396),
        (119, 994, 689, 87),
        (120, 584, 1066, 211),
        (121, 853, 1074, 168),
        (122, 933, 433, 102),
        (123, 491, 492, 158),
        (124, 967, 1133, 311),
        (125, 734, 1263, 185),
        (126, 1029, 654, 509),
        (127, 1065, 1060, 434),
        (128, 1248, 431, 455),
        (129, 1125, 521, 439),
        (130, 603, 1133, 150),
        (131, 445, 410, 293),
        (132, 620, 681, 330),
        (133, 877, 1132, 500),
        (134, 289, 685, 132),
        (135, 1058, 1274, 538),
        (136, 929, 952, 334),
        (137, 708, 546, 233),
        (138, 457, 1268, 364),
        (139, 916, 1211, 294),
        (140, 509, 1201, 157),
        (141, 730, 1045, 432),
        (142, 437, 880, 512),
        (143, 658, 914, 411),
        (144, 668, 376, 89),
        (145, 499, 291, 401),
        (146, 1165, 862, 129),
        (147, 1227, 586, 442),
        (148, 441, 1214, 197),
        (149, 567, 898, 157),
        (150, 1092, 840, 274),
        (151, 464, 873, 519),
        (152, 679, 1150, 218),
        (153, 321, 663, 433),
        (154, 938, 568, 443),
        (155, 795, 427, 367),
        (156, 525, 615, 122),
        (157, 846, 669, 91),
        (158, 722, 1131, 106),
        (159, 980, 1059, 379),
        (160, 1067, 980, 246),
        (161, 550, 547, 473),
        (162, 261, 338, 458),
        (163, 327, 676, 257),
        (164, 641, 706, 108),
        (165, 1031, 476, 108),
        (166, 470, 994, 327),
        (167, 788, 1157, 475),
        (168, 374, 739, 228),
        (169, 1107, 696, 398),
        (170, 811, 975, 124),
        (171, 1056, 1177, 328),
        (172, 342, 800, 103),
        (173, 940, 573, 540),
        (174, 781, 1045, 315),
        (175, 800, 677, 158),
        (176, 908, 917, 491),
        (177, 820, 455, 263),
        (178, 312, 702, 214),
        (179, 1038, 936, 484),
        (180, 1152, 366, 185),
        (181, 1011, 308, 109),
        (182, 337, 749, 343),
        (183, 562, 497, 99),
        (184, 596, 261, 441),
        (185, 898, 1105, 305),
        (186, 1201, 956, 413),
        (187, 1018, 261, 497),
        (188, 331, 781, 246),
        (189, 1099, 874, 207),
        (190, 604, 972, 428),
        (191, 317, 733, 118),
        (192, 1039, 938, 132),
        (193, 962, 1010, 168),
        (194, 1254, 547, 156),
        (195, 307, 1088, 318),
        (196, 787, 1056, 339),
        (197, 271, 324, 522),
        (198, 778, 377, 254),
        (199, 583, 1053, 154),
        (200, 869, 721, 303),
        (201, 1153, 739, 315),
        (202, 1160, 977, 481),
        (203, 1256, 381, 128),
        (204, 687, 569, 117),
        (205, 1096, 664, 376),
        (206, 430, 1248, 130),
        (207, 481, 1083, 385),
        (208, 462, 334, 115),
        (209, 518, 1049, 223),
        (210, 1099, 1153, 515),
        (211, 1083, 789, 279),
        (212, 826, 782, 254),
        (213, 518, 401, 467),
        (214, 1088, 435, 69),
        (215, 462, 529, 527),
        (216, 793, 792, 529),
        (217, 1158, 608, 350),
        (218, 899, 841, 455),
        (219, 686, 1222, 175),
        (220, 1121, 1009, 553),
        (221, 300, 607, 221),
        (222, 1068, 736, 261),
        (223, 848, 603, 459),
        (224, 569, 619, 442),
        (225, 644, 1275, 419),
        (226, 1224, 1133, 109),
        (227, 287, 1032, 468),
        (228, 764, 642, 464),
        (229, 834, 1222, 409),
        (230, 526, 1121, 311),
        (231, 1127, 406, 155),
        (232, 278, 395, 316),
        (233, 918, 468, 458),
        (234, 1049, 1274, 344),
        (235, 969, 1184, 224),
        (236, 856, 859, 62),
        (237, 1063, 962, 416),
        (238, 981, 393, 257),
        (239, 1080, 363, 164),
        (240, 1265, 615, 380),
        (241, 693, 465, 511),
        (242, 1120, 675, 388),
        (243, 365, 1208, 178),
        (244, 764, 677, 371),
        (245, 689, 1052, 466),
        (246, 1149, 1264, 175),
        (247, 1203, 824, 430),
        (248, 741, 1247, 446),
        (249, 282, 911, 431),
        (250, 1273, 1248, 247),
        (251, 603, 920, 523),
        (252, 928, 954, 252),
        (253, 1181, 706, 197),
        (254, 633, 963, 103),
        (255, 1121, 775, 157),
        (256, 354, 618, 62),
        (257, 584, 294, 114),
        (258, 703, 524, 396),
        (259, 431, 1206, 259),
        (260, 1125, 1001, 134),
        (261, 1243, 378, 472),
        (262, 980, 523, 256),
        (263, 995, 544, 447),
        (264, 704, 289, 544),
        (265, 903, 1239, 268),
        (266, 583, 528, 225),
        (267, 390, 618, 424),
        (268, 264, 416, 216),
        (269, 1183, 749, 467),
        (270, 960, 432, 499),
        (271, 1253, 1116, 295),
        (272, 629, 753, 486),
        (273, 335, 944, 157),
        (274, 1229, 574, 537),
        (275, 1102, 852, 49),
        (276, 990, 1111, 538),
        (277, 365, 682, 163),
        (278, 377, 718, 394),
        (279, 993, 920, 281),
        (280, 1218, 989, 470),
        (281, 469, 308, 171),
        (282, 465, 1064, 178),
        (283, 636, 740, 471),
        (284, 1076, 752, 278),
        (285, 989, 1170, 512),
        (286, 361, 669, 258),
        (287, 828, 449, 101),
        (288, 930, 900, 176),
        (289, 1075, 775, 224),
        (290, 1227, 548, 530),
        (291, 295, 704, 417),
        (292, 630, 293, 458),
        (293, 372, 1197, 385),
        (294, 570, 1110, 470),
        (295, 926, 1075, 186),
        (296, 1121, 1271, 359),
        (297, 891, 799, 322),
        (298, 681, 1141, 189),
        (299, 287, 899, 502),
        (300, 769, 324, 216),
        (301, 258, 359, 508),
        (302, 936, 545, 484),
        (303, 322, 401, 454),
        (304, 685, 278, 219),
        (305, 1111, 498, 63),
        (306, 663, 302, 421),
        (307, 320, 748, 302),
        (308, 568, 914, 97),
        (309, 370, 918, 238),
        (310, 833, 957, 148),
        (311, 379, 755, 495),
        (312, 941, 397, 369),
        (313, 498, 472, 87),
        (314, 1149, 580, 190),
        (315, 1224, 565, 460),
        (316, 686, 1237, 407),
        (317, 897, 627, 408),
        (318, 1217, 1152, 456),
        (319, 1094, 752, 513),
        (320, 1058, 315, 405),
        (321, 461, 299, 292),
        (322, 1205, 360, 255),
        (323, 1205, 1231, 331),
        (324, 837, 1042, 228),
        (325, 974, 1244, 328),
        (326, 314, 1181, 198),
        (327, 330, 363, 181),
        (328, 1004, 1051, 495),
        (329, 968, 1096, 353),
        (330, 502, 350, 316),
        (331, 341, 743, 300),
        (332, 1257, 940, 207),
        (333, 1160, 905, 177),
        (334, 752, 370, 484),
        (335, 1256, 554, 325),
        (336, 631, 1049, 376),
        (337, 796, 389, 242),
        (338, 1245, 843, 91),
        (339, 1081, 902, 187),
        (340, 513, 409, 247),
        (341, 981, 1048, 427),
        (342, 965, 641, 116),
        (343, 477, 1051, 155),
        (344, 1214, 1027, 417),
        (345, 300, 655, 323),
        (346, 1195, 1252, 409),
        (347, 1112, 327, 282),
        (348, 470, 774, 131),
        (349, 914, 887, 457),
        (350, 468, 385, 467),
        (351, 1224, 541, 368),
        (352, 343, 647, 536),
        (353, 800, 1135, 315),
        (354, 974, 446, 426),
        (355, 1047, 881, 353),
        (356, 723, 434, 359),
        (357, 571, 881, 253),
        (358, 375, 1035, 59),
        (359, 356, 435, 328),
        (360, 1271, 626, 443),
        (361, 537, 567, 363),
        (362, 1047, 892, 81),
        (363, 683, 288, 357),
        (364, 735, 1276, 270),
        (365, 938, 895, 67),
        (366, 683, 1165, 311),
        (367, 496, 925, 213),
        (368, 1106, 439, 73),
        (369, 826, 463, 273),
        (370, 624, 703, 246),
        (371, 287, 736, 350),
        (372, 353, 479, 142),
        (373, 914, 1217, 388),
        (374, 515, 1239, 182),
        (375, 1196, 409, 343),
        (376, 1045, 382, 367),
        (377, 377, 1272, 234),
        (378, 1147, 491, 337),
        (379, 338, 964, 403),
        (380, 784, 1044, 443),
        (381, 493, 650, 353),
        (382, 466, 574, 132),
        (383, 412, 1021, 254),
        (384, 1266, 284, 92),
        (385, 672, 374, 399),
        (386, 1270, 1042, 471),
        (387, 790, 594, 208),
        (388, 1265, 638, 345),
        (389, 1250, 630, 152),
        (390, 415, 267, 137),
        (391, 639, 777, 238),
        (392, 1258, 319, 135),
        (393, 388, 944, 465),
        (394, 551, 932, 404),
        (395, 1094, 1279, 479),
        (396, 459, 509, 248),
        (397, 723, 559, 294),
        (398, 1085, 550, 105),
        (399, 690, 1149, 309),
        (400, 945, 853, 134),
        (401, 486, 1267, 438),
        (402, 531, 425, 160),
        (403, 869, 1076, 473),
        (404, 291, 405, 221),
        (405, 663, 582, 314),
        (406, 1134, 1170, 460),
        (407, 490, 977, 108),
        (408, 899, 999, 87),
        (409, 553, 1270, 273),
        (410, 442, 864, 413),
        (411, 774, 752, 411),
        (412, 300, 380, 365),
        (413, 1191, 504, 428),
        (414, 1079, 462, 408),
        (415, 1195, 549, 313),
        (416, 1179, 926, 287),
        (417, 849, 614, 520),
        (418, 421, 1067, 439),
        (419, 318, 1164, 114),
        (420, 987, 398, 461),
        (421, 1216, 264, 460),
        (422, 592, 373, 365),
        (423, 999, 629, 363),
        (424, 738, 857, 409),
        (425, 981, 794, 131),
        (426, 1214, 1258, 452),
        (427, 605, 1224, 420),
        (428, 954, 660, 279),
        (429, 851, 923, 537),
        (430, 424, 1011, 399),
        (431, 1024, 1081, 307),
        (432, 801, 752, 359),
        (433, 500, 462, 176),
        (434, 731, 1020, 423),
        (435, 478, 583, 167),
        (436, 542, 960, 277),
        (437, 891, 359, 440),
        (438, 1143, 816, 172),
        (439, 1270, 961, 184),
        (440, 454, 277, 243),
        (441, 868, 823, 542),
        (442, 895, 731, 455),
        (443, 1116, 718, 280),
        (444, 1149, 1042, 419),
        (445, 615, 473, 307),
        (446, 619, 683, 132),
        (447, 305, 684, 505),
        (448, 984, 1080, 286),
        (449, 635, 938, 177),
        (450, 501, 716, 142),
        (451, 982, 282, 112),
        (452, 1167, 1187, 358),
        (453, 760, 790, 519),
        (454, 921, 301, 153),
        (455, 393, 762, 59),
        (456, 1262, 884, 114),
        (457, 933, 787, 202),
        (458, 1219, 285, 323),
        (459, 407, 487, 376),
        (460, 281, 306, 261),
        (461, 972, 669, 372),
        (462, 1246, 708, 327),
        (463, 452, 823, 491),
        (464, 323, 499, 204),
        (465, 553, 381, 320),
        (466, 781, 669, 471),
        (467, 1046, 708, 360),
        (468, 1091, 959, 207),
        (469, 729, 706, 57),
        (470, 1087, 680, 232),
        (471, 1242, 277, 335),
        (472, 726, 414, 208),
        (473, 555, 356, 293),
        (474, 1002, 807, 356),
        (475, 585, 956, 77),
        (476, 1010, 611, 84),
        (477, 926, 454, 151),
        (478, 359, 1275, 290),
        (479, 857, 1258, 389),
        (480, 306, 683, 359),
        (481, 1200, 1006, 85),
        (482, 898, 764, 165),
        (483, 312, 1257, 245),
        (484, 1105, 890, 221),
        (485, 847, 492, 129),
        (486, 1213, 1251, 171),
        (487, 324, 522, 321),
        (488, 852, 583, 205),
        (489, 746, 829, 317),
        (490, 455, 439, 271),
        (491, 667, 570, 368),
        (492, 1080, 565, 77),
        (493, 1072, 1252, 465),
        (494, 477, 961, 206),
        (495, 784, 828, 384),
        (496, 395, 276, 457),
        (497, 1178, 769, 123),
        (498, 831, 756, 485),
        (499, 969, 732, 166)
      ) AS t(media_id, width, height, n_bytes)
      ORDER BY media_id""")),

    ("q48_lsh_buckets", (s: SparkSession, d: String) => {
      val e = t(s, d, "embeddings")
      Similarity.lshBuckets(e, "vec_id", "embedding", e.filter(col("vec_id") < 8), 8)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }, Some("""
      WITH a AS (SELECT vec_id AS aid, embedding::DOUBLE[] AS av FROM embeddings WHERE vec_id < 8),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT e.vec_id,
        string_agg(CASE WHEN list_dot_product(e.v, a.av) >= 0 THEN '1' ELSE '0' END, '' ORDER BY a.aid) AS bucket
      FROM e CROSS JOIN a GROUP BY e.vec_id ORDER BY e.vec_id""")),

    // IVF-style ANN: corpus partitioned into 16 inverted lists by
    // nearest-centroid; queries probe their 2 nearest cells.
    ("q63_ivf_topk", (s: SparkSession, d: String) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 8).select(col("vec_id")), k = 5,
        numCells = 16, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some("""
      WITH cent AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        FROM embeddings ORDER BY vec_id LIMIT 16),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ranked AS (
        SELECT e.vec_id, cent.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY
            list_dot_product(e.v, cent.cv) /
              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))
            DESC, cent.cid ASC) AS rk
        FROM e CROSS JOIN cent),
      assigned AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1),
      probes AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk <= 2 AND vec_id < 8),
      scored AS (
        SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
          list_dot_product(q.v, c.v) /
            (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
        FROM probes p
        JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.vec_id
        JOIN e q ON q.vec_id = p.vec_id
        JOIN e c ON c.vec_id = a.vec_id),
      r AS (
        SELECT query_id, neighbor_id, round(cos, 4) AS cosine,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
      ORDER BY query_id, rank""")),

    // §2.10 incremental mode: "rows modified since --since" selection
    // that feeds the upsert sink (ref: etl/base.py:267-273).
    ("q64_incremental_since", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1998-06-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus,
        strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date
      FROM orders WHERE o_orderdate >= DATE '1998-06-01'
      ORDER BY o_orderkey""")),

    // K5 backup/CTAS + A3 collection stats: snapshot a table, then
    // report stats of the backup. Physical layout (file count/bytes)
    // varies with parallelism, so the check columns are row_count plus
    // layout EXISTENCE booleans — row_count is oracle'd against the
    // source table itself (backup must be lossless).
    ("q65_backup_stats", (s: SparkSession, d: String) => {
      import s.implicits._
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_backup_q65").getAbsolutePath
      graft.operators.Upsert.backup(t(s, d, "nation"), dir)
      val st = graft.operators.Stats.tableStats(s, dir)
      Seq((st.rowCount, st.fileCount >= 1, st.totalBytes > 0))
        .toDF("row_count", "has_files", "has_bytes")
    }, Some("""
      SELECT (SELECT count(*) FROM nation) AS row_count,
        true AS has_files, true AS has_bytes""")),

    // Skew-salted join: semantically identical to the plain equi-join
    // (which is exactly what the oracle checks), physically spread over
    // `salts` reducers per key.
    ("q66_salted_join", (s: SparkSession, d: String) => {
      graft.operators.Skew.saltedJoin(
        t(s, d, "lineitem").select(col("l_partkey"), col("l_quantity")),
        t(s, d, "part").select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey", salts = 8)
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }, Some("""
      SELECT p_brand, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        COUNT(*) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand ORDER BY p_brand""")),

    // Gopher-style quality gate over documents: pass/fail + reasons.
    ("q67_quality_filter", (s: SparkSession, d: String) => {
      val q = TextAnalysis.qualityFilter(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), q.getField("passes").as("passes"),
          concat_ws(",", q.getField("reject_reasons")).as("reasons"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH f AS (
        SELECT doc_id,
          length(text) AS n_chars,
          len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
          len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
          len(list_filter(
            regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
            x -> x IN ('the','and','of','to','in','is','that','for','with'))) AS n_stop
        FROM documents),
      m AS (
        SELECT doc_id, n_tokens,
          CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE)/n_tokens ELSE 0 END AS mtl,
          CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0 END AS pr,
          CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0 END AS sr
        FROM f),
      r AS (
        SELECT doc_id, list_filter([
          CASE WHEN n_tokens < 50 THEN 'too_few_tokens' END,
          CASE WHEN n_tokens > 100000 THEN 'too_many_tokens' END,
          CASE WHEN mtl < 3.0 THEN 'mean_token_too_short' END,
          CASE WHEN mtl > 10.0 THEN 'mean_token_too_long' END,
          CASE WHEN pr > 0.2 THEN 'punct_heavy' END,
          CASE WHEN sr < 0.01 THEN 'no_stopwords' END], x -> x IS NOT NULL) AS reasons
        FROM m)
      SELECT doc_id, len(reasons) = 0 AS passes,
        COALESCE(array_to_string(reasons, ','), '') AS reasons
      FROM r ORDER BY doc_id"""))
  ,

    // End-to-end near-dup dedup: MinHash candidates → keep-first drop.
    // Survivors = docs that never collide with a lower id.
    ("q68_dedup_corpus", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val mutated = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
      val corpus = base.unionByName(mutated)
      val pairs = Dedup.minHashPairs(corpus, col("text"), col("doc_id"),
        numHashes = 12, bands = 4, shingleWidth = 3, threshold = 0.3,
          fastHash = false)
      Dedup.dedupCorpus(corpus, pairs, col("doc_id"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, Some {
      val seeds = (0 until 12).map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        .mkString("[", ", ", "]")
      s"""
      WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text || ' zz yy xx' AS text
        FROM documents WHERE doc_id < 200),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w),
      sig AS (SELECT doc_id, $seeds AS sig FROM shingled),
      banded AS (
        SELECT doc_id, sig, t.b AS band,
          md5(array_to_string(sig[t.b*3+1:t.b*3+3], ' ')) AS bucket
        FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
      pairs AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
          len(list_filter(generate_series(1, 12), i -> l.sig[i] = r.sig[i])) / 12.0 AS est
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
      drops AS (SELECT DISTINCT id_b FROM pairs WHERE est >= 0.3)
      SELECT doc_id FROM base WHERE doc_id NOT IN (SELECT id_b FROM drops)
      ORDER BY doc_id"""
    }),

    // Engine capability beyond reference parity (SURVEY §2.5 note):
    // hierarchical ROLLUP aggregation — subtotals + grand total free
    // from Catalyst.
    ("q69_rollup", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    }, Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))
  ,

    // Engine capability: running aggregation window (per-customer
    // cumulative spend in order-date order).
    ("q70_running_total", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey"""))
  ,

    // The reference's read-side query surface over the REAL unified
    // table (mongodb_loader.py:259-286 / README.md:290-304): nested
    // supplier.id predicate (P2), boolean is_printable (P3), array-of-
    // structs category match (P4), group-count (A1). Three suppliers
    // cover all three predicate shapes (all nine sync through the CLI
    // and RemainingSuppliersSpec); rows-only — the pipeline itself is
    // not SQL-expressible in DuckDB.
    ("q71_unified_readside", (s: SparkSession, d: String) => {
      import graft.pipeline.{Pipeline, SupplierConfig}
      val sink = java.nio.file.Files.createTempDirectory("graft-q71").toString + "/products"
      val refDir = "/root/reference/sample data"
      val cfgs = Seq(
        "midocean" -> s"$refDir/MidOcean Sample Data.jsonc",  // P3 printable
        "laltex" -> s"$refDir/Laltex Sample Data.jsonc",      // P2 supplier.id
        "xd" -> s"$refDir/XD Sample Data.jsonc"               // P4 Drinkware category
      ).map { case (id, p) => SupplierConfig(id, p) }
      val results = Pipeline.runFullSync(s, cfgs, sink)
      require(results.forall(_.status == "success"),
        s"sync statuses: ${results.map(r =>
          s"${r.supplier}=${r.status}${r.errorSamples.mkString("[", "; ", "]")}")}")
      val unified = s.read.parquet(sink)
      unified
        .filter(col("is_printable") ||                                   // P3
          exists(col("categories"), c => c.getField("name") === "Drinkware") || // P4
          col("supplier.id") === "laltex")                               // P2
        .groupBy(col("supplier.id").as("supplier"))                      // A1
        .agg(count(lit(1)).as("n_matching"),
          sum(size(col("variants"))).as("n_variants"))
        .orderBy(col("supplier"))
    }, Some("""
      SELECT * FROM (VALUES
        ('laltex', 4, 25),
        ('midocean', 5, 14),
        ('xd', 1, 1)
      ) AS t(supplier, n_matching, n_variants)
      ORDER BY supplier""")),

    // Text-index analog (ref: unified_product_schema.py:241 declares a
    // Mongo text index on name): substring search over the name
    // column. At 100 TB this is a scan-side predicate (no index);
    // contains() stays in whole-stage codegen and benefits from
    // parquet row-group pruning on any leading predicates.
    ("q72_name_search", (s: SparkSession, d: String) => {
      t(s, d, "part")
        .filter(contains(lower(col("p_name")), lit("green")))
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey, p_name, p_brand FROM part
      WHERE contains(lower(p_name), 'green') ORDER BY p_partkey""")),

    // §2.10 stateful logic, batch-checkable: the stream's
    // latest-per-key fold (StockStream.latestPerSku) equals one
    // max_by hash-aggregate over the full update history.
    ("q73_stock_latest_batch", (s: SparkSession, d: String) => {
      val updates = t(s, d, "events").select(
        concat(lit("sku_"), col("user_id")).as("sku"),
        col("value").as("qty"),
        col("ts").as("modified_at"))
      graft.streaming.StockStream.latestPerSkuBatch(updates)
        .orderBy(col("sku"))
    }, Some("""
      WITH u AS (SELECT 'sku_' || user_id AS sku, value AS qty, ts FROM events),
      r AS (SELECT sku, qty, ts,
              row_number() OVER (PARTITION BY sku ORDER BY ts DESC, qty DESC) AS rn
            FROM u)
      SELECT sku, qty, ts AS modified_at FROM r WHERE rn = 1 ORDER BY sku""")),

    // Transitive near-dup clustering: MinHash candidate pairs →
    // connected components (min-label propagation + pointer jumping,
    // O(log n) rounds — see Dedup.connectedComponents). The oracle
    // rebuilds the same md5 MinHash pairs as q54 and closes them with a
    // recursive transitive-reachability CTE.
    ("q74_dup_clusters", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val mutated = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
      val pairs = Dedup.minHashPairs(base.unionByName(mutated), col("text"),
        col("doc_id"), numHashes = 12, bands = 4, shingleWidth = 3,
        threshold = 0.3, fastHash = false)
      Dedup.connectedComponents(pairs).orderBy(col("id"))
    }, Some {
      val seeds = (0 until 12).map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        .mkString("[", ", ", "]")
      s"""
      WITH RECURSIVE base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text || ' zz yy xx' AS text
        FROM documents WHERE doc_id < 200),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w),
      sig AS (SELECT doc_id, $seeds AS sig FROM shingled),
      banded AS (
        SELECT doc_id, sig, t.b AS band,
          md5(array_to_string(sig[t.b*3+1:t.b*3+3], ' ')) AS bucket
        FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
      pairs AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
          len(list_filter(generate_series(1, 12), i -> l.sig[i] = r.sig[i])) / 12.0 AS est
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
      sym AS (
        SELECT id_a AS a, id_b AS b FROM pairs WHERE est >= 0.3
        UNION
        SELECT id_b AS a, id_a AS b FROM pairs WHERE est >= 0.3),
      reach(id, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT reach.id, s.b FROM reach JOIN sym s ON reach.r = s.a)
      SELECT id, min(r) AS component FROM reach GROUP BY id ORDER BY id"""
    }),

    // Atomic snapshot sink (SnapshotStore): K1 merge as a manifest
    // commit — crash-safe alternative to dynamic partition overwrite.
    // Two commits then a read-back; merge semantics match q16's oracle
    // window (version desc, incoming wins ties).
    ("q75_snapshot_merge", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft-q75").toString + "/customers"
      val c = t(s, d, "customer")
      val base = c.filter(col("c_custkey") <= 1000)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          lit(1).as("sync_version"))
      val updates = c.filter(col("c_custkey") <= 1500 && col("c_custkey") % 3 === 0)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal") * 2).as("c_acctbal"), lit(2).as("sync_version"))
      graft.sinks.SnapshotStore.commit(s, base, root, "c_mktsegment")
      graft.sinks.SnapshotStore.mergeCommit(s, updates, root,
        "c_custkey", "sync_version", "c_mktsegment")
      graft.sinks.SnapshotStore.read(s, root)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal"), 2).as("acctbal"), col("sync_version"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_mktsegment, round(acctbal, 2) AS acctbal, sync_version FROM (
        SELECT c_custkey, c_mktsegment, acctbal, sync_version,
          row_number() OVER (PARTITION BY c_custkey
            ORDER BY sync_version DESC, src DESC) AS rn
        FROM (
          SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal, 1 AS sync_version, 0 AS src
          FROM customer WHERE c_custkey <= 1000
          UNION ALL
          SELECT c_custkey, c_mktsegment, c_acctbal * 2 AS acctbal, 2 AS sync_version, 1 AS src
          FROM customer WHERE c_custkey <= 1500 AND c_custkey % 3 = 0
            AND c_mktsegment IN ('BUILDING', 'MACHINERY')))
      WHERE rn = 1 ORDER BY c_custkey""")),

    // Quality-policy cluster dedup: keep the LONGEST member of each
    // near-dup component (the mutated +' zz yy xx' variants win over
    // their originals — the opposite of q74's min-id policy).
    ("q76_dedup_best_per_cluster", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val mutated = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
      val corpus = base.unionByName(mutated)
      val pairs = Dedup.minHashPairs(corpus, col("text"), col("doc_id"),
        numHashes = 12, bands = 4, shingleWidth = 3, threshold = 0.3,
          fastHash = false)
      Dedup.dedupCorpusClustersBy(corpus, pairs, col("doc_id"),
          length(col("text")))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }, Some {
      val seeds = (0 until 12).map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        .mkString("[", ", ", "]")
      s"""
      WITH RECURSIVE base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text || ' zz yy xx' AS text
        FROM documents WHERE doc_id < 200),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w),
      sig AS (SELECT doc_id, $seeds AS sig FROM shingled),
      banded AS (
        SELECT doc_id, sig, t.b AS band,
          md5(array_to_string(sig[t.b*3+1:t.b*3+3], ' ')) AS bucket
        FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
      pairs AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
          len(list_filter(generate_series(1, 12), i -> l.sig[i] = r.sig[i])) / 12.0 AS est
        FROM banded l JOIN banded r
          ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
      sym AS (
        SELECT id_a AS a, id_b AS b FROM pairs WHERE est >= 0.3
        UNION
        SELECT id_b AS a, id_a AS b FROM pairs WHERE est >= 0.3),
      reach(id, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT reach.id, s.b FROM reach JOIN sym s ON reach.r = s.a),
      comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
      SELECT doc_id FROM (
        SELECT b.doc_id,
          row_number() OVER (
            PARTITION BY coalesce(c.component, b.doc_id)
            ORDER BY length(b.text) DESC, b.doc_id) AS rn
        FROM base b LEFT JOIN comp c ON b.doc_id = c.id)
      WHERE rn = 1 ORDER BY doc_id"""
    }),

    // Stratified token-budget sampling: deterministic md5-ordered
    // prefix per language while the running token total fits the
    // budget (Sampling.sampleToTokenBudget).
    ("q77_token_budget_sample", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.Sampling.sampleToTokenBudget(docs, col("n_tokens"),
          col("doc_id"), col("lang"), budgetPerStratum = 2000L)
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang, n_tokens FROM (
        SELECT doc_id, lang, n_tokens,
          sum(n_tokens) OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        FROM (SELECT doc_id, lang,
                len(string_split(text, ' ')) AS n_tokens FROM documents))
      WHERE running <= 2000 ORDER BY doc_id""")),

    // PII scrub (TextAnalysis.redactPii): ordered regex rewrite chain
    // (email → IPv4 → phone) with typed placeholders + audit counts.
    // PII is injected per-doc since the corpus carries none; both
    // engines then apply identical RE2-subset patterns.
    ("q78_redact_pii", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1 (555) 010-"), col("doc_id"),
          lit(" via 192.168.0.1")).as("text"))
      docs.select(col("doc_id"),
          graft.functions.TextAnalysis.redactPii(col("text")).as("redacted"),
          graft.functions.TextAnalysis.piiCounts(col("text")).as("c"))
        .select(col("doc_id"), col("redacted"),
          col("c.emails").as("emails"), col("c.ips").as("ips"),
          col("c.phones").as("phones"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH injected AS (
        SELECT doc_id,
          concat(text, ' contact user', CAST(doc_id AS VARCHAR),
            '@example.com or +1 (555) 010-',
            CAST(doc_id AS VARCHAR), ' via 192.168.0.1') AS text
        FROM documents),
      steps AS (
        SELECT doc_id, text,
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
        FROM injected),
      steps2 AS (
        SELECT *, regexp_replace(after_email,
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS after_ip
        FROM steps)
      SELECT doc_id,
        regexp_replace(after_ip,
          '\+?[0-9][0-9()\-\s.]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
        len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
        len(regexp_extract_all(after_email,
          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS ips,
        len(regexp_extract_all(after_ip,
          '\+?[0-9][0-9()\-\s.]{7,}[0-9]')) AS phones
      FROM steps2 ORDER BY doc_id""")),

    // Repetition signal: duplicate-shingle ratio over staged token
    // arrays (Gopher-style repetitive-text detector).
    ("q79_repetition_ratio", (s: SparkSession, d: String) => {
      import graft.functions.TextAnalysis
      val ws = t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      val sh = ws.select(col("doc_id"), TextAnalysis.shinglesOf(col("ws")).as("sh"))
      sh.select(col("doc_id"),
          round(TextAnalysis.duplicateShingleRatio(col("sh")), 4).as("dup_ratio"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH w AS (SELECT doc_id,
        list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        FROM documents),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w)
      SELECT doc_id,
        round(CASE WHEN len(sh) > 0
          THEN 1.0 - len(list_distinct(sh)) / CAST(len(sh) AS DOUBLE)
          ELSE 0.0 END, 4) AS dup_ratio
      FROM shingled ORDER BY doc_id""")),

    // Corpus-level TF-IDF rarity (TfIdf.docRarity): per-term addends
    // quantized to DECIMAL(18,6) so the fold is associative and the
    // oracle replays it exactly.
    ("q80_doc_rarity", (s: SparkSession, d: String) => {
      graft.operators.TfIdf.docRarity(t(s, d, "documents"),
          col("text"), col("doc_id"))
        .select(col("id").as("doc_id"), round(col("rarity"), 4).as("rarity"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH norm AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n]', '', 'g'),
          '\s+', ' ', 'g')) AS t
        FROM documents),
      toks AS (SELECT doc_id,
        unnest(list_filter(string_split(t, ' '), x -> x <> '')) AS term
        FROM norm),
      tc AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, sum(cnt) AS len FROM tc GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      dfreq AS (SELECT term,
        CAST(round(ln((n.n + 1.0) / (count(*) + 1.0)) + 1.0, 6)
          AS DECIMAL(18,6)) AS idf6
        FROM tc CROSS JOIN n GROUP BY term, n.n),
      s AS (SELECT doc_id, sum(cnt * idf6) AS s
        FROM tc JOIN dfreq USING (term) GROUP BY doc_id)
      SELECT doc_id, round(CAST(s AS DOUBLE) / CAST(len AS DOUBLE), 4) AS rarity
      FROM s JOIN dl USING (doc_id) ORDER BY doc_id""")),

    // The unified.jsonc per-variant DOCUMENT view (Nest.variantView):
    // one row per variant with product context, over a real
    // 3-supplier sync. Deterministic output pinned as VALUES
    // (regenerate: tools/gen_values_oracle.py).
    ("q81_variant_view", (s: SparkSession, d: String) => {
      import graft.pipeline.{Pipeline, SupplierConfig}
      val sink = java.nio.file.Files.createTempDirectory("graft-q81").toString + "/products"
      val refDir = "/root/reference/sample data"
      val cfgs = Seq(
        "midocean" -> s"$refDir/MidOcean Sample Data.jsonc",
        "laltex" -> s"$refDir/Laltex Sample Data.jsonc",
        "xd" -> s"$refDir/XD Sample Data.jsonc"
      ).map { case (id, p) => SupplierConfig(id, p) }
      val results = Pipeline.runFullSync(s, cfgs, sink)
      require(results.forall(_.status == "success"),
        s"sync statuses: ${results.map(r => s"${r.supplier}=${r.status}")}")
      graft.operators.Nest.variantView(s.read.parquet(sink))
        .select(col("parent_product_id"), col("supplier"), col("sku"),
          col("size"), col("color"), col("stock_available"), col("n_prices"))
        .orderBy(col("parent_product_id"), col("sku"))
    }, Some("""
      SELECT * FROM (VALUES
        ('laltex_AA0131', 'laltex', 'AA0131BK', '190x80x2mm', 'Black', 19437.0, 10),
        ('laltex_AA0131', 'laltex', 'AA0131CY', '190x80x2mm', 'Cyan', 10928.0, 10),
        ('laltex_AA0131', 'laltex', 'AA0131GN', '190x80x2mm', 'Green', 2670.0, 10),
        ('laltex_AA0131', 'laltex', 'AA0131NBL', '190x80x2mm', 'Navy Blue', 5241.0, 10),
        ('laltex_AA0131', 'laltex', 'AA0131PK', '190x80x2mm', 'Pink', 1187.0, 10),
        ('laltex_AA0131', 'laltex', 'AA0131PL', '190x80x2mm', 'Purple', 4897.0, 10),
        ('laltex_AA0131', 'laltex', 'AA0131RD', '190x80x2mm', 'Red', 4865.0, 10),
        ('laltex_AA0131', 'laltex', 'AA0131WH', '190x80x2mm', 'White', 6648.0, 10),
        ('laltex_AA0135', 'laltex', 'AA0135WH', '75x33x6mm', 'White', NULL, 10),
        ('laltex_AA0411', 'laltex', 'AA0411BK', '112x121x3mm', 'Black', NULL, 10),
        ('laltex_AA0411', 'laltex', 'AA0411BL', '112x121x3mm', 'Blue', NULL, 10),
        ('laltex_AA0411', 'laltex', 'AA0411GN', '112x121x3mm', 'Green', NULL, 10),
        ('laltex_AA0411', 'laltex', 'AA0411PL', '112x121x3mm', 'Purple', NULL, 10),
        ('laltex_AA0411', 'laltex', 'AA0411RD', '112x121x3mm', 'Red', NULL, 10),
        ('laltex_AA0411', 'laltex', 'AA0411WH', '112x121x3mm', 'White', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412AM', '96x215x25mm', 'Amber', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412BL', '96x215x25mm', 'Blue', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412GN', '96x215x25mm', 'Green', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412LBL', '96x215x25mm', 'Light Blue', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412PK', '96x215x25mm', 'Pink', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412PL', '96x215x25mm', 'Purple', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412RD', '96x215x25mm', 'Red', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412TR', '96x215x25mm', 'Transparent', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412WH', '96x215x25mm', 'White', NULL, 10),
        ('laltex_AA0412', 'laltex', 'AA0412YL', '96x215x25mm', 'Yellow', NULL, 10),
        ('midocean_AR1249', 'midocean', 'AR1249-16', NULL, 'Matt Silver', NULL, 1),
        ('midocean_AR1253', 'midocean', 'AR1253-16', NULL, 'Matt Silver', NULL, 1),
        ('midocean_AR1470', 'midocean', 'AR1470-01', NULL, 'Brown', NULL, 1),
        ('midocean_AR1589', 'midocean', 'AR1589-03', NULL, 'Black', NULL, 1),
        ('midocean_AR1804', 'midocean', 'AR1804-03', NULL, 'Black', NULL, 1),
        ('midocean_AR1804', 'midocean', 'AR1804-04', NULL, 'Blue', NULL, 1),
        ('midocean_AR1804', 'midocean', 'AR1804-05', NULL, 'Red', NULL, 1),
        ('midocean_AR1804', 'midocean', 'AR1804-06', NULL, 'White', NULL, 0),
        ('midocean_AR1804', 'midocean', 'AR1804-10', NULL, 'Orange', NULL, 0),
        ('midocean_AR1804', 'midocean', 'AR1804-12', NULL, 'Turquoise', NULL, 0),
        ('midocean_AR1804', 'midocean', 'AR1804-15', NULL, 'Stone Grey', NULL, 0),
        ('midocean_AR1804', 'midocean', 'AR1804-37', NULL, 'Royal Blue', NULL, 0),
        ('midocean_AR1804', 'midocean', 'AR1804-48', NULL, 'Lime', NULL, 0),
        ('midocean_AR1804', 'midocean', 'AR1804-85', NULL, 'French Navy', NULL, 0),
        ('xd_V10200', 'xd', '102001', NULL, 'grey', 17525.0, 6)
      ) AS t(parent_product_id, supplier, sku, size, color, stock_available, n_prices)
      ORDER BY parent_product_id, sku""")),

    // Derived decoration summaries (Nest.withPrintSummary — the
    // reference materializes numberOfPrintPositions /
    // allAvailableMethods / allAvailablePositions on the document,
    // unified.jsonc:266-270). Deterministic over the MidOcean sample;
    // VALUES oracle (tools/gen_values_oracle.py).
    ("q82_print_summary", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/MidOcean Sample Data.jsonc"
      graft.operators.Nest.withPrintSummary(
          graft.suppliers.MidOcean.unified(s, sample))
        .select(col("product_id"), col("number_of_print_positions"),
          col("all_available_methods"), col("all_available_positions"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('midocean_AR1249', 4, 'debossing, digital_print, embroidery, laser_engraving, pad_print, screen_print, sublimation, transfer', 'LASER COMPASS, PD BOX, TOP BOX, TOP COMPASS'),
        ('midocean_AR1253', 3, 'debossing, digital_print, embroidery, laser_engraving, pad_print, screen_print, sublimation, transfer', 'BELOW BUTTONS, LEFT OF SOLAR CEL, RIGHT OF SOLAR CEL'),
        ('midocean_AR1470', 3, 'debossing, digital_print, embroidery, laser_engraving, pad_print, screen_print, sublimation, transfer', 'FRONT POCKET, FRONT TRANSFER, TOP'),
        ('midocean_AR1589', 4, 'debossing, digital_print, embroidery, laser_engraving, pad_print, screen_print, sublimation, transfer', 'BACK LEATHER PART, BACK SILVER PART, FRONT LEATHER PART, FRONT SILVER PART'),
        ('midocean_AR1804', 5, 'debossing, digital_print, embroidery, laser_engraving, pad_print, screen_print, sublimation, transfer', 'BACK, BACK PD, FRONT, FRONT PAD, FRONT PD')
      ) AS t(product_id, number_of_print_positions, all_available_methods, all_available_positions)
      ORDER BY product_id""")),

    // Z-order (Morton) interleave — the multi-dimensional file-pruning
    // layout key (Layout.zValue2); pure shift/and/or arithmetic the
    // oracle replays bit-for-bit.
    ("q83_zorder_key", (s: SparkSession, d: String) => {
      val z = graft.operators.Layout.zValue2(col("p_size"),
        pmod(col("p_partkey"), lit(256)), bits = 16)
      t(s, d, "part").select(col("p_partkey"), z.as("z"))
        .orderBy(col("p_partkey"))
    }, Some {
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((p_size >> $i) & 1) << ${2 * i})",
        s"((((p_partkey % 256) >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""
      SELECT p_partkey, ($terms) AS z FROM part ORDER BY p_partkey"""
    }),

    // Per-column data-quality profile (Stats.columnProfile, exact
    // mode): the "which feed column went sparse this sync" report.
    ("q84_column_profile", (s: SparkSession, d: String) => {
      graft.operators.Stats.columnProfile(t(s, d, "customer"),
          Seq("c_mktsegment", "c_nationkey"))
        .orderBy(col("col_name"))
    }, Some("""
      SELECT 'c_mktsegment' AS col_name, count(*) AS n_rows,
        CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        count(DISTINCT c_mktsegment) AS n_distinct,
        CAST(min(c_mktsegment) AS VARCHAR) AS min,
        CAST(max(c_mktsegment) AS VARCHAR) AS max
      FROM customer
      UNION ALL
      SELECT 'c_nationkey', count(*),
        CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        count(DISTINCT c_nationkey),
        CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
      FROM customer
      ORDER BY col_name""")),

    // J6 — two-dimensional band resolution (RangeJoin.resolveBands2D):
    // the print-price-grid pattern (area band × quantity band, ref
    // flat-structure/midocean.json:118-353 and the Keramikos
    // qty×colours grid, flat-structure/keramikos.json:9-40), exercised
    // as a size-band × price-band lookup the oracle replays as a
    // relational range join. The bands tile the full (size, price)
    // space so every part resolves to exactly one band.
    ("q85_band2d_pricing", (s: SparkSession, d: String) => {
      val bands = s.createDataFrame(Seq(
        (1, Some(10), 0.0, Some(999.99), "S-low"),
        (1, Some(10), 1000.0, None, "S-high"),
        (11, Some(25), 0.0, Some(999.99), "M-low"),
        (11, Some(25), 1000.0, None, "M-high"),
        (26, None, 0.0, None, "L-any")))
        .toDF("min_size", "max_size", "min_price", "max_price", "band")
      RangeJoin.resolveBands2D(t(s, d, "part"), bands,
          col("p_size"), col("min_size"), col("max_size"),
          col("p_retailprice"), col("min_price"), col("max_price"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("band"))
    }, Some("""
      SELECT b.band, count(*) AS n,
        CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM part p
      LEFT JOIN (VALUES
        (1, 10, 0.0, 999.99, 'S-low'), (1, 10, 1000.0, NULL, 'S-high'),
        (11, 25, 0.0, 999.99, 'M-low'), (11, 25, 1000.0, NULL, 'M-high'),
        (26, NULL, 0.0, NULL, 'L-any'))
        b(min_size, max_size, min_price, max_price, band)
        ON p.p_size >= b.min_size AND (b.max_size IS NULL OR p.p_size <= b.max_size)
       AND p.p_retailprice >= b.min_price
       AND (b.max_price IS NULL OR p.p_retailprice <= b.max_price)
      GROUP BY b.band ORDER BY b.band""")),

    // X5 — sparse-capture schema contract: a real capture with an
    // optional section blanked must flow through the pipeline as typed
    // nulls/empties, not crash the sync (ANSI element_at throws on
    // empty arrays; the pipelines must stay on try_element_at and the
    // declared-schema merge). Mirrors SparseCaptureSpec as a gated row.
    ("q86_sparse_capture", (s: SparkSession, d: String) => {
      val sparse = sparseFixture(
        "/root/reference/sample data/Sanmar Sample Data.jsonc", "description")
      graft.suppliers.Sanmar.unified(s, sparse)
        .select(col("product_id"),
          col("short_description").isNull.as("short_desc_null"),
          col("long_description"),
          size(col("variants")).as("n_variants"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('sanmar_108085', true, '', 1)
      ) AS t(product_id, short_desc_null, long_description, n_variants)
      ORDER BY product_id""")),

    // X10 — named open attributes (unified.jsonc:86-122
    // productExtraData): each supplier parks feed fields outside the
    // core schema in the open map; exploded to (product, attr, value)
    // rows across two suppliers with disjoint attribute vocabularies.
    ("q87_extra_attributes", (s: SparkSession, d: String) => {
      val pres = graft.suppliers.Preseli.unified(s,
        "/root/reference/sample data/Preseli Sample Data.jsonc")
      val xd = graft.suppliers.Xd.unified(s,
        "/root/reference/sample data/XD Sample Data.jsonc")
      pres.unionByName(xd, allowMissingColumns = true)
        .select(col("product_id"),
          explode(col("product_extra_data")).as(Seq("attr", "value")))
        .orderBy(col("product_id"), col("attr"))
    }, Some("""
      SELECT * FROM (VALUES
        ('preseli_PSL10', 'dataSheet', 'https://www.preseli.biz/datasheet.php?product_id=2'),
        ('preseli_PSL10', 'endUserWebsite', 'https://www.promobestsellers.co.uk/product/10mm-plant-silk-lanyard'),
        ('xd_V10200', 'giftWrappingPossible', 'true'),
        ('xd_V10200', 'restrictedCountries', 'NOR,SWE,ALA'),
        ('xd_V10200', 'variableDataPrinting', 'true')
      ) AS t(product_id, attr, value)
      ORDER BY product_id, attr""")),

    // X1 — full multilingual localized maps (unified.jsonc:25-33): the
    // reference fetches each feed once per language and the unified
    // document accumulates one `{lang: text}` key per fetch
    // (midocean_extractor.py:34,144). The same capture stands in for
    // each language's fetch here (the sandbox holds one capture per
    // supplier); what's under test is the merge mechanics — every
    // language key lands in the map, entries sort deterministically,
    // and base columns come from the preferred-language run.
    ("q88_localized_merge", (s: SparkSession, d: String) => {
      val sample = "/root/reference/sample data/MidOcean Sample Data.jsonc"
      val runs = Seq("en", "de", "fr").map(lang =>
        lang -> graft.suppliers.MidOcean.unified(s, sample, lang))
      graft.operators.Localize.mergeLanguageRuns(runs)
        .select(col("product_id"),
          array_join(map_keys(col("localized.name")), ",").as("name_langs"),
          element_at(col("localized.name"), "de").as("name_de"),
          size(col("localized.long_description")).as("n_desc_langs"),
          col("localized.title").isNull.as("title_null"),
          col("name"),
          size(col("variants")).as("n_variants"))
        .orderBy(col("product_id"))
    }, Some("""
      SELECT * FROM (VALUES
        ('midocean_AR1249', 'de,en,fr', 'TARGET', 3, true, 'TARGET', 1),
        ('midocean_AR1253', 'de,en,fr', 'BASICS', 3, true, 'BASICS', 1),
        ('midocean_AR1470', 'de,en,fr', 'HIGH PARK', 3, true, 'HIGH PARK', 1),
        ('midocean_AR1589', 'de,en,fr', 'COLUMBUS', 3, true, 'COLUMBUS', 1),
        ('midocean_AR1804', 'de,en,fr', 'ARCONOT', 3, true, 'ARCONOT', 10)
      ) AS t(product_id, name_langs, name_de, n_desc_langs, title_null, name, n_variants)
      ORDER BY product_id""")),

    // N-key Z-order (Layout.zValue generalized past 2 dims): 3 keys
    // interleaved round-robin — bit i of key j at position 3i+j. The
    // oracle replays the interleave as shift/mask SQL.
    ("q89_zorder3_key", (s: SparkSession, d: String) => {
      // floor on BOTH sides: Spark's double→long cast truncates while
      // DuckDB's rounds — floor is the portable integerization.
      val z = graft.operators.Layout.zValue(Seq(col("p_size"),
        pmod(col("p_partkey"), lit(256)),
        pmod(floor(col("p_retailprice")).cast("long"), lit(1024))), bits = 12)
      t(s, d, "part").select(col("p_partkey"), z.as("z"))
        .orderBy(col("p_partkey"))
    }, Some {
      val terms = (0 until 12).flatMap(i => Seq(
        s"(((p_size >> $i) & 1) << ${3 * i})",
        s"((((p_partkey % 256) >> $i) & 1) << ${3 * i + 1})",
        s"((((CAST(floor(p_retailprice) AS BIGINT) % 1024) >> $i) & 1) << ${3 * i + 2})")).mkString(" | ")
      s"""
      SELECT p_partkey, ($terms) AS z FROM part ORDER BY p_partkey"""
    }),

    // Indexed text search (TextIndex): build the (token, file)
    // inverted index over the documents table, search a word through
    // it, and return exactly what the full-scan predicate returns —
    // the index-side parity with the reference's Mongo text index
    // (unified_product_schema.py:241; q72 is the scan-side parity).
    ("q90_indexed_search", (s: SparkSession, d: String) => {
      val idx = java.nio.file.Files.createTempDirectory("graft_q90_idx")
        .resolve("index").toString
      val table = s"$d/documents.parquet"
      graft.operators.TextIndex.buildWordIndex(s, table, "text", idx)
      graft.operators.TextIndex.searchWord(s, table, idx, "text", "dup")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang, source FROM documents
      WHERE list_contains(string_split(trim(regexp_replace(regexp_replace(
        lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '), 'dup')
      ORDER BY doc_id""")),

    // File-skipping stats (FileStats + GraftFileIndex): commit orders
    // as a range-laid-out snapshot, then read it back THROUGH the
    // planning-time pruning index — the query's own WHERE drives which
    // files are opened (Delta/Iceberg-style data skipping over the
    // custom manifest store). Results must equal the plain filtered
    // scan the oracle runs; the pruning itself is measured in
    // DataSkippingSpec and SCALE.md.
    ("q91_snapshot_skipping", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q91_store")
        .resolve("t").toString
      val orders = t(s, d, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
      graft.sinks.SnapshotStore.commit(s, orders, root, "o_orderpriority")
      graft.sinks.SnapshotStore.table(s, root)
        .filter(col("o_orderkey") < 1000 && col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }, Some("""
      SELECT o_orderstatus, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderkey < 1000 AND o_orderpriority = '1-URGENT'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Gap-based sessionization (Sessionize.sessions): per-user
    // sessions with a 30-minute inactivity bound, replayed by the
    // oracle as gaps-and-islands. Both sides work in integer epoch
    // MICROseconds — the events table is nanosecond-precision parquet
    // and Spark's reader truncates to micros, so the oracle truncates
    // identically (epoch_ns // 1000) instead of comparing raw
    // timestamps. Spark MERGES touching windows (SessionizeSpec), so
    // the island break is strictly greater-than the gap.
    ("q92_sessionize", (s: SparkSession, d: String) => {
      graft.streaming.Sessionize.sessions(t(s, d, "events"), gap = "30 minutes")
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us"))
    }, Some("""
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
      m AS (SELECT user_id, us,
        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
             OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
        THEN 1 ELSE 0 END AS brk FROM e),
      g AS (SELECT user_id, us,
        sum(brk) OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      SELECT user_id, min(us) AS start_us, max(us) AS end_us,
        CAST(count(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""")),

    // Big×big temporal as-of join (RangeJoin.asofJoin): every 10th
    // event acts as a per-user "state change" dim; each event picks up
    // the latest state at or before its own timestamp. The engine runs
    // union + one window pass (one shuffle, no inequality-join
    // blowup); the oracle replays it as a correlated latest-dim
    // lookup. Ties (same user, same microsecond) resolve to the
    // greatest payload on both sides. The carried level is a raw
    // column value — no arithmetic — so the hash compare is exact.
    ("q93_asof_join", (s: SparkSession, d: String) => {
      val e = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val dims = e.filter(pmod(col("event_id"), lit(10)) === 0)
        .select(col("user_id"), col("ts"), col("value").as("level"))
      graft.operators.RangeJoin.asofJoin(
          e.drop("value"), dims, "user_id", "ts", "ts", Seq("level"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("level"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, value
                 FROM events),
      d AS (SELECT user_id, us, value AS level FROM e WHERE event_id % 10 = 0)
      SELECT e.event_id, e.user_id, e.us,
        (SELECT dd.level FROM d dd
          WHERE dd.user_id = e.user_id AND dd.us <= e.us
          ORDER BY dd.us DESC, dd.level DESC LIMIT 1) AS level
      FROM e ORDER BY event_id""")),

    // Bloom-filter point lookup (SnapshotStore.addBloomFilters):
    // customers committed in HASH order, so every file's c_name
    // min/max spans the domain and range stats prune nothing — the
    // per-file bloom skips by content instead (false positives only
    // ever keep a file, so the answer is exactly the plain lookup the
    // oracle runs). DataSkippingSpec pins the pruning counts; this row
    // gates the result through the full table() read path.
    ("q94_bloom_lookup", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q94_store")
        .resolve("t").toString
      val customers = t(s, d, "customer")
        .withColumn("part", pmod(col("c_custkey"), lit(4)).cast("string"))
        .repartition(8)
      graft.sinks.SnapshotStore.commit(s, customers, root, "part")
      graft.sinks.SnapshotStore.addBloomFilters(s, root, Seq("c_name"))
      graft.sinks.SnapshotStore.table(s, root)
        .filter(col("c_name") === "Customer#000000042")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_name = 'Customer#000000042'
      ORDER BY c_custkey""")),

    // Sequence packing (Sampling.packSequences): per-language token
    // streams in deterministic md5 order, cut into 2048-token training
    // sequences; a document's pack is its START offset's sequence
    // (with-splitting pretraining packing). Window-replayable: the
    // oracle reproduces the running sum exactly.
    ("q95_pack_sequences", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.Sampling.packSequences(docs, col("n_tokens"),
          col("doc_id"), col("lang"), seqLen = 2048L)
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang, n_tokens,
        CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
        CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_offset
      FROM (SELECT doc_id, lang, n_tokens,
              sum(n_tokens) OVER (PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM (SELECT doc_id, lang,
                    len(string_split(text, ' ')) AS n_tokens FROM documents))
      ORDER BY doc_id""")),

    // Weighted source mix (Sampling.weightedMix): the "60% en / 20% de
    // / 20% fr" recipe knob — per-stratum quotas from the weight map,
    // filled in deterministic md5 order; unlisted strata drop out.
    ("q96_weighted_mix", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
      graft.operators.Sampling.weightedMix(docs, col("doc_id"), col("lang"),
          Map("en" -> 0.6, "de" -> 0.2, "fr" -> 0.2), total = 200L)
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents WHERE lang IN ('en', 'de', 'fr'))
      WHERE (lang = 'en' AND rn <= 120)
         OR (lang = 'de' AND rn <= 40)
         OR (lang = 'fr' AND rn <= 40)
      ORDER BY doc_id""")),

    // Embedding near-dup CLUSTERS end-to-end: exact cosine pairs
    // (q47's operator in oracle mode) fed into connected components
    // (q74's operator) — the full "semantic dedup" composition over
    // the embeddings table. The oracle replays pairs as an all-pairs
    // cosine join and the clustering as a recursive reachability CTE.
    // At scale the same composition runs with bucketed = true (LSH
    // candidate generation) — identical downstream clustering.
    ("q97_embedding_clusters", (s: SparkSession, d: String) => {
      val pairs = Similarity.nearDupPairs(t(s, d, "embeddings"),
        "vec_id", "embedding", threshold = 0.35, bucketed = false)
      Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .orderBy(col("id"))
    }, Some("""
      WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35),
      sym AS (SELECT id_a AS a, id_b AS b FROM p
              UNION SELECT id_b AS a, id_a AS b FROM p),
      reach(id, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT reach.id, s.b FROM reach JOIN sym s ON reach.r = s.a)
      SELECT id, min(r) AS component FROM reach GROUP BY id ORDER BY id""")),

    // Stream-stream interval join, batch-executed
    // (EventStream.recentActivity): each event paired with the same
    // user's events in the trailing 10 minutes, rolled up per event.
    // The identical expression runs as a watermarked stream×stream
    // join (EventStreamSpec pins the equivalence); the oracle replays
    // the interval join in integer microseconds.
    ("q98_recent_activity", (s: SparkSession, d: String) => {
      val e = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.streaming.EventStream.recentActivity(e, e, within = "10 minutes")
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(lit(1)).as("n_prior"), max(col("prior_value")).as("max_prior_value"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, value
                 FROM events)
      SELECT l.event_id, l.user_id, CAST(count(*) AS BIGINT) AS n_prior,
        max(r.value) AS max_prior_value
      FROM e l JOIN e r ON l.user_id = r.user_id
        AND r.us >= l.us - 600000000 AND r.us <= l.us
        AND r.event_id != l.event_id
      GROUP BY l.event_id, l.user_id ORDER BY l.event_id""")),

    // Winnowing rolling-window fingerprint (TextAnalysis
    // .winnowFingerprintOf, the MOSS selection scheme): min md5 per
    // sliding window over the shingle-hash sequence, dedup + sort.
    // Shingle and token staging mirror q74's oracle shapes exactly, so
    // the selection replays bit-for-bit in SQL.
    ("q99_winnow_fingerprint", (s: SparkSession, d: String) => {
      import graft.functions.TextAnalysis
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokens(TextAnalysis.normalized(col("text"))).as("ws"))
        .select(col("doc_id"), TextAnalysis.shinglesOf(col("ws"), 3).as("sh"))
        .select(col("doc_id"), TextAnalysis.winnowFingerprintOf(col("sh"), 4).as("fp"))
        .select(col("doc_id"), size(col("fp")).as("n_fp"),
          element_at(col("fp"), 1).as("fp_first"),
          element_at(col("fp"), -1).as("fp_last"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH nm AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
      sh AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh FROM nm),
      hs AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM sh),
      sel AS (SELECT doc_id,
        CASE WHEN len(hs) < 4 THEN [list_min(hs)]
             ELSE list_transform(generate_series(1, len(hs) - 3),
                    i -> list_min(hs[i:i+3])) END AS sel FROM hs),
      fp AS (SELECT doc_id, list_sort(list_distinct(sel)) AS fp FROM sel)
      SELECT doc_id, CAST(len(fp) AS INTEGER) AS n_fp,
        fp[1] AS fp_first, fp[-1] AS fp_last
      FROM fp ORDER BY doc_id""")),

    // Capstone corpus-assembly composition: quality gate (q67's
    // thresholds) → exact keep-first dedup (q42) → per-language token
    // budget sample (q77) → sequence packing (q95), chained as ONE
    // declarative plan — the operators compose because each is a
    // filter/window over the previous stage's frame, and the oracle
    // chains the same four replays.
    ("q100_corpus_assembly", (s: SparkSession, d: String) => {
      import graft.operators.{Dedup, Sampling}
      val gated = t(s, d, "documents")
        .filter(TextAnalysis.qualityFilter(col("text")).getField("passes"))
      val deduped = Dedup.exactKeepFirst(gated, col("text"), col("doc_id"))
      val withTok = deduped.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val sampled = Sampling.sampleToTokenBudget(withTok, col("n_tokens"),
        col("doc_id"), col("lang"), budgetPerStratum = 3000L)
      Sampling.packSequences(sampled, col("n_tokens"), col("doc_id"),
          col("lang"), seqLen = 1024L)
        .orderBy(col("doc_id"))
    }, Some("""
      WITH f AS (
        SELECT doc_id,
          length(text) AS n_chars,
          len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_toks,
          len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
          len(list_filter(
            regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
            x -> x IN ('the','and','of','to','in','is','that','for','with'))) AS n_stop
        FROM documents),
      pass AS (
        SELECT doc_id FROM f
        WHERE n_toks >= 50 AND n_toks <= 100000
          AND (CASE WHEN n_toks > 0 THEN CAST(n_chars AS DOUBLE)/n_toks ELSE 0 END) >= 3.0
          AND (CASE WHEN n_toks > 0 THEN CAST(n_chars AS DOUBLE)/n_toks ELSE 0 END) <= 10.0
          AND (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0 END) <= 0.2
          AND (CASE WHEN n_toks > 0 THEN CAST(n_stop AS DOUBLE)/n_toks ELSE 0 END) >= 0.01),
      ded AS (
        SELECT doc_id, lang, text FROM (
          SELECT d.doc_id, d.lang, d.text,
            row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) AS rn
          FROM documents d JOIN pass USING (doc_id))
        WHERE rn = 1),
      tok AS (SELECT doc_id, lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM ded),
      samp AS (
        SELECT doc_id, lang, n_tokens FROM (
          SELECT doc_id, lang, n_tokens,
            sum(n_tokens) OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
          FROM tok)
        WHERE running <= 3000),
      packed AS (
        SELECT doc_id, lang, n_tokens,
          sum(n_tokens) OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM samp)
      SELECT doc_id, lang, n_tokens,
        CAST((cum - n_tokens) // 1024 AS BIGINT) AS pack_id,
        CAST((cum - n_tokens) % 1024 AS BIGINT) AS pack_offset
      FROM packed ORDER BY doc_id""")),

    // SQL/catalog surface for the snapshot store (SnapshotSource):
    // the ENTIRE read — view registration, filter, aggregate — is
    // plain SQL over the `graft-snapshot` format, so a pure-SQL user
    // gets manifest-driven file skipping with no Scala API in sight.
    // The relation behind the view is exactly SnapshotStore.table's
    // (DataSkippingSpec pins the shared pruning counts).
    ("q101_sql_snapshot", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q101_store")
        .resolve("t").toString
      val li = t(s, d, "lineitem")
        .repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"))
      graft.sinks.SnapshotStore.commit(s, li, root, "l_returnflag")
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_q101 " +
        s"USING `graft-snapshot` OPTIONS (path '$root')")
      s.sql("""
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM graft_q101
        WHERE l_orderkey < 1000
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    }, Some("""
      SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem WHERE l_orderkey < 1000
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Z-order layout maintenance through the full read path
    // (SnapshotStore.compactZOrder): four arrival-ordered incremental
    // commits build a table whose files all span the key domain, the
    // compaction rewrites it Z-ordered on (custkey, orderkey), and the
    // oracle checks the rewrite changed LAYOUT only — the filtered
    // content equals the plain scan. DataSkippingSpec pins the
    // pruning-count improvement on the same shape.
    ("q102_compact_zorder", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q102_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").withColumn("part", lit("x"))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(pmod(col("o_orderkey"), lit(4)) === 0).repartition(4),
        root, "part")
      (1 to 3).foreach { i =>
        graft.sinks.SnapshotStore.mergeCommit(s,
          orders.filter(pmod(col("o_orderkey"), lit(4)) === i).repartition(4),
          root, "o_orderkey", "o_orderkey", "part")
      }
      graft.sinks.SnapshotStore.compactZOrder(s, root, "part",
        Seq("o_custkey", "o_orderkey"), filesPerPartition = 8)
      graft.sinks.SnapshotStore.table(s, root)
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_custkey < 100 ORDER BY o_orderkey""")),

    // Streaming → atomic snapshot sink, oracled by REPLAY
    // (StockStream.snapshotWriter): a real micro-batch sequence —
    // including a re-delivered batch, the crash/retry case — lands as
    // keyed merge commits, and the final snapshot must equal the
    // oracle's one-shot latest-per-key fold of the same update
    // history. (sku, ts) is made unique up front so the fold has no
    // tie ambiguity on either side.
    ("q103_stream_snapshot_sink", (s: SparkSession, d: String) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_q103").toString
      val root = s"$dir/store"
      val updates = t(s, d, "events").filter(col("user_id") < 50)
        .groupBy(concat(lit("sku_"), col("user_id")).as("sku"), col("ts"))
        .agg(max(col("value")).as("qty"))
        .select(col("sku"), col("qty"), col("ts"))
        .as[(String, Double, java.sql.Timestamp)]
        .collect()
      val batches = updates.groupBy(u => math.floorMod(u._3.getTime, 3L))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Double, java.sql.Timestamp)]
      val q = graft.streaming.StockStream.snapshotWriter(
        input.toDF().toDF("sku", "qty", "modified_at"), root, s"$dir/ckpt").start()
      try {
        (0L to 2L).foreach { b =>
          input.addData(batches.getOrElse(b, Array.empty).toSeq)
          q.processAllAvailable()
        }
        // Re-deliver batch 1: the later-version-wins merge absorbs the
        // duplicate commit (effectively-once delivery).
        input.addData(batches.getOrElse(1L, Array.empty).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      graft.sinks.SnapshotStore.read(s, root)
        .select(col("sku"), col("qty"), unix_micros(col("modified_at")).as("us"))
        .orderBy(col("sku"))
    }, Some("""
      WITH u AS (SELECT 'sku_' || user_id AS sku, ts, max(value) AS qty
                 FROM events WHERE user_id < 50 GROUP BY 1, 2),
      r AS (SELECT sku, qty, epoch_ns(ts) // 1000 AS us,
              row_number() OVER (PARTITION BY sku ORDER BY ts DESC) AS rn
            FROM u)
      SELECT sku, qty, us FROM r WHERE rn = 1 ORDER BY sku""")),

    // Automatic as-of variant selection (RangeJoin.asofJoinAuto):
    // q93's join through the auto path — events keys are uniform at
    // this scale, so the sampler must pick the plain single-window
    // variant and reproduce q93's answer exactly (AsofJoinSpec pins
    // that a hot key flips the choice to bucketed).
    ("q104_asof_auto", (s: SparkSession, d: String) => {
      val e = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val dims = e.filter(pmod(col("event_id"), lit(10)) === 0)
        .select(col("user_id"), col("ts"), col("value").as("level"))
      graft.operators.RangeJoin.asofJoinAuto(
          e.drop("value"), dims, "user_id", "ts", "ts", Seq("level"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("level"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, value
                 FROM events),
      d AS (SELECT user_id, us, value AS level FROM e WHERE event_id % 10 = 0)
      SELECT e.event_id, e.user_id, e.us,
        (SELECT dd.level FROM d dd
          WHERE dd.user_id = e.user_id AND dd.us <= e.us
          ORDER BY dd.us DESC, dd.level DESC LIMIT 1) AS level
      FROM e ORDER BY event_id""")),

    // Benchmark decontamination (Dedup.benchmarkOverlap): every 50th
    // document plays the evaluation set; each corpus document reports
    // how many of its distinct 3-shingles appear in that set, the
    // contaminated fraction, and which benchmark rows matched (the
    // corpus near-dup structure makes partial overlaps, not just the
    // 100% self-hits). The oracle replays the same normalized-shingle
    // overlap; bench ids travel as a sorted comma-joined string so the
    // hash compare stays scalar.
    ("q105_decontaminate", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      graft.operators.Dedup.benchmarkOverlap(docs, col("text"), col("doc_id"),
          bench, col("text"), col("doc_id"), shingleWidth = 3)
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_overlap"),
          round(col("overlap_frac"), 4).as("overlap_frac"),
          concat_ws(",", col("bench_ids")).as("bench_ids"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH nw AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
      sh AS (SELECT doc_id, list_distinct(
           CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_transform(generate_series(1, len(ws) - 2),
                       i -> array_to_string(ws[i:i+2], ' ')) END) AS sh FROM nw),
      ex AS (SELECT doc_id, unnest(sh) AS w FROM sh),
      bex AS (SELECT DISTINCT doc_id AS bid, unnest(sh) AS w FROM sh
              WHERE doc_id % 50 = 0),
      hits AS (SELECT e.doc_id, e.w, b.bid FROM ex e LEFT JOIN bex b USING (w)),
      agg AS (SELECT doc_id,
          count(DISTINCT w) AS n_shingles,
          count(DISTINCT CASE WHEN bid IS NOT NULL THEN w END) AS n_overlap,
          list_sort(list_distinct(list_filter(list(bid), x -> x IS NOT NULL))) AS bids
        FROM hits GROUP BY doc_id)
      SELECT doc_id, n_shingles, n_overlap,
        round(CAST(n_overlap AS DOUBLE) / greatest(n_shingles, 1), 4) AS overlap_frac,
        COALESCE(array_to_string(bids, ','), '') AS bench_ids
      FROM agg ORDER BY doc_id""")),

    // Corpus-wide line dedup (Dedup.lineDedup — the C4/RefinedWeb
    // boilerplate scrub): the synthetic docs carry no newlines, so the
    // fixture composes every 5 consecutive documents into one
    // multi-line document — the corpus's exact-duplicate texts become
    // the repeated "boilerplate" lines, dropped everywhere once they
    // occur more than twice, with surviving lines kept in order and
    // fully-boilerplate composites coming back empty (never missing).
    ("q106_line_dedup", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val comp = docs.groupBy((col("doc_id") / 5).cast("long").as("cid"))
        .agg(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))).as("text"))
      graft.operators.Dedup.lineDedup(comp, col("text"), col("cid"),
          maxOccurrences = 2)
        .select(col("id").as("cid"), col("text"),
          length(col("text")).as("n_chars"))
        .orderBy(col("cid"))
    }, Some("""
      WITH comp AS (SELECT doc_id // 5 AS cid,
             string_agg(text, chr(10) ORDER BY doc_id) AS text
           FROM documents GROUP BY 1),
      lt AS (SELECT cid, string_split(text, chr(10)) AS ls FROM comp),
      ex AS (SELECT cid, unnest(generate_series(1, len(ls))) AS pos,
               unnest(ls) AS line FROM lt),
      freq AS (SELECT md5(line) AS h FROM ex GROUP BY 1
               HAVING count(DISTINCT cid) > 2),
      kept AS (SELECT e.cid, e.pos, e.line FROM ex e
               ANTI JOIN freq f ON md5(e.line) = f.h),
      re AS (SELECT cid, string_agg(line, chr(10) ORDER BY pos) AS text
             FROM kept GROUP BY cid)
      SELECT c.cid, COALESCE(r.text, '') AS text,
        length(COALESCE(r.text, '')) AS n_chars
      FROM comp c LEFT JOIN re r USING (cid) ORDER BY cid""")),

    // Capstone corpus assembly v2 — the round-6 operators composed as
    // one pipeline: boilerplate line scrub (q106's fixture) → length
    // gate → benchmark decontamination filter (drop > 50% overlap
    // against the q105 eval set) → per-stratum token-budget sample.
    // Like q100, every stage is a filter/aggregate over the previous
    // frame, and the oracle chains the same replays.
    ("q107_corpus_assembly_v2", (s: SparkSession, d: String) => {
      import graft.operators.{Dedup, Sampling}
      val docs = t(s, d, "documents")
      val comp = docs.groupBy((col("doc_id") / 5).cast("long").as("cid"))
        .agg(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))).as("text"))
      val scrubbed = Dedup.lineDedup(comp, col("text"), col("cid"),
          maxOccurrences = 2)
        .filter(length(col("text")) > 0)
      val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val clean = scrubbed.join(
        Dedup.benchmarkOverlap(scrubbed, col("text"), col("id"),
            bench, col("text"), col("doc_id"), shingleWidth = 3)
          .filter(col("overlap_frac") <= 0.5)
          .select(col("id")),
        Seq("id"))
      val withTok = clean.select(col("id"),
        (col("id") % 4).as("stratum"),
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.sampleToTokenBudget(withTok, col("n_tokens"), col("id"),
          col("stratum"), budgetPerStratum = 2000L)
        .select(col("id").as("cid"), col("stratum"), col("n_tokens"))
        .orderBy(col("cid"))
    }, Some("""
      WITH comp AS (SELECT doc_id // 5 AS cid,
             string_agg(text, chr(10) ORDER BY doc_id) AS text
           FROM documents GROUP BY 1),
      lt AS (SELECT cid, string_split(text, chr(10)) AS ls FROM comp),
      lx AS (SELECT cid, unnest(generate_series(1, len(ls))) AS pos,
               unnest(ls) AS line FROM lt),
      lfreq AS (SELECT md5(line) AS h FROM lx GROUP BY 1
                HAVING count(DISTINCT cid) > 2),
      lkept AS (SELECT l.cid, l.pos, l.line FROM lx l
                ANTI JOIN lfreq f ON md5(l.line) = f.h),
      scrub AS (SELECT cid, string_agg(line, chr(10) ORDER BY pos) AS text
                FROM lkept GROUP BY cid),
      nz AS (SELECT cid, text FROM scrub WHERE length(text) > 0),
      nw AS (SELECT cid, string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS ws
             FROM nz),
      sh AS (SELECT cid, list_distinct(
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_transform(generate_series(1, len(ws) - 2),
                         i -> array_to_string(ws[i:i+2], ' ')) END) AS sh FROM nw),
      ex AS (SELECT cid, unnest(sh) AS w FROM sh),
      bnw AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS ws
             FROM documents WHERE doc_id % 50 = 0),
      bsh AS (SELECT DISTINCT unnest(
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_transform(generate_series(1, len(ws) - 2),
                         i -> array_to_string(ws[i:i+2], ' ')) END) AS w FROM bnw),
      ov AS (SELECT e.cid,
               count(*) AS n_sh,
               count(*) FILTER (WHERE b.w IS NOT NULL) AS n_hit
             FROM ex e LEFT JOIN bsh b USING (w) GROUP BY e.cid),
      clean AS (SELECT n.cid, n.text FROM nz n JOIN ov o USING (cid)
                WHERE CAST(o.n_hit AS DOUBLE) / greatest(o.n_sh, 1) <= 0.5),
      tok AS (SELECT cid, cid % 4 AS stratum,
               CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM clean),
      samp AS (SELECT cid, stratum, n_tokens,
               sum(n_tokens) OVER (PARTITION BY stratum
                 ORDER BY md5(CAST(cid AS VARCHAR)), cid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
             FROM tok)
      SELECT cid, stratum, n_tokens FROM samp
      WHERE running <= 2000 ORDER BY cid""")),

    // Token-share weighted mix (Sampling.weightedTokenMix): the "70%
    // of the TOKENS from en, 30% from de" recipe — per-language token
    // budgets derived from weights, filled in deterministic md5 order,
    // unlisted languages dropped. Same window replay as q77 with a
    // per-stratum budget map.
    ("q108_weighted_token_mix", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.Sampling.weightedTokenMix(docs, col("n_tokens"),
          col("doc_id"), col("lang"),
          Map("en" -> 0.7, "de" -> 0.3), totalTokens = 8000L)
        .orderBy(col("doc_id"))
    }, Some("""
      WITH tok AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents WHERE lang IN ('en', 'de')),
      samp AS (SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
           FROM tok)
      SELECT doc_id, lang, n_tokens FROM samp
      WHERE running <= CASE lang WHEN 'en' THEN 5600 ELSE 2400 END
      ORDER BY doc_id""")),

    // Document-count stratified sample (Sampling.sampleNPerStratum):
    // the row-count sibling of q77 — previously spec-only; the oracle
    // replays the same md5-ordered row_number cap per language.
    ("q109_n_per_stratum", (s: SparkSession, d: String) => {
      graft.operators.Sampling.sampleNPerStratum(
          t(s, d, "documents").select(col("doc_id"), col("lang"), col("source")),
          col("doc_id"), col("lang"), perStratum = 30)
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
          row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
      WHERE rn <= 30 ORDER BY doc_id""")),

    // Snapshot-driven text-index maintenance end-to-end (TextIndex
    // .appendForSnapshotVersion / searchWordInSnapshot): index v1,
    // replace ONE partition in v2 (a word-preserving text edit), index
    // the v2 diff, then search through the index — candidates from
    // BOTH carried v1 files and v2's new files, intersected with the
    // live manifest. The result must equal the scan truth, which is
    // exactly q90's oracle (the edit only prefixes text, so 'dup'
    // membership is unchanged).
    ("q110_snapshot_text_index", (s: SparkSession, d: String) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q110").toString
      val root = s"$dir/t"; val idx = s"$dir/idx"
      val docs = t(s, d, "documents")
        .withColumn("part", pmod(col("doc_id"), lit(4)).cast("string"))
        .withColumn("v", lit(1))
      val v1 = graft.sinks.SnapshotStore.commit(s, docs, root, "part")
      graft.operators.TextIndex.appendForSnapshotVersion(s, root, v1, "text", idx)
      val upd = docs
        .filter(pmod(col("doc_id"), lit(4)) === 1 && col("doc_id") < 50)
        .withColumn("text", concat(lit("freshword "), col("text")))
        .withColumn("v", lit(2))
      val v2 = graft.sinks.SnapshotStore.mergeCommit(s, upd, root,
        "doc_id", "v", "part")
      graft.operators.TextIndex.appendForSnapshotVersion(s, root, v2, "text", idx)
      graft.operators.TextIndex.searchWordInSnapshot(s, root, idx, "text", "dup")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang, source FROM documents
      WHERE list_contains(string_split(trim(regexp_replace(regexp_replace(
        lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '), 'dup')
      ORDER BY doc_id""")),

    // Context-window chunking (Sampling.chunkDocuments): 12-token
    // windows sliding by 10 (overlap 2) — the retrieval/embedding
    // preprocessing cut for long documents. The oracle replays the
    // arithmetic: chunk count from ceil((n − overlap)/step), token
    // slices rejoined with single spaces, short docs whole, no
    // degenerate tail chunk.
    ("q111_chunk_documents", (s: SparkSession, d: String) => {
      graft.operators.Sampling.chunkDocuments(
          t(s, d, "documents").filter(col("doc_id") < 100),
          col("text"), col("doc_id"), maxTokens = 12, overlap = 2)
        .select(col("id").as("doc_id"), col("chunk_id"),
          col("chunk_text"), col("n_chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }, Some("""
      WITH w AS (SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
           FROM documents WHERE doc_id < 100),
      n AS (SELECT doc_id, ws,
             greatest(1, CAST(ceil(CAST(len(ws) - 2 AS DOUBLE) / 10) AS BIGINT)) AS nc
           FROM w),
      ex AS (SELECT doc_id, ws,
             unnest(generate_series(0, nc - 1)) AS chunk_id FROM n),
      sl AS (SELECT doc_id, chunk_id,
             ws[chunk_id * 10 + 1 : chunk_id * 10 + 12] AS chunk FROM ex)
      SELECT doc_id, chunk_id,
        COALESCE(array_to_string(chunk, ' '), '') AS chunk_text,
        CAST(len(chunk) AS BIGINT) AS n_chunk_tokens
      FROM sl ORDER BY doc_id, chunk_id""")),

    // Pack assembly (Sampling.assemblePacks over q95's packing): one
    // row per (language, pack) with the pack's documents concatenated
    // in offset order — what actually ships to the trainer. The
    // oracle chains q95's window replay with an ordered string_agg.
    ("q112_assemble_packs", (s: SparkSession, d: String) => {
      import graft.operators.Sampling
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
        col("text"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val packed = Sampling.packSequences(docs, col("n_tokens"),
        col("doc_id"), col("lang"), seqLen = 512L)
      Sampling.assemblePacks(packed, col("text"), col("lang"), sep = "\n")
        .select(col("stratum"), col("pack_id"),
          length(col("seq_text")).as("n_chars"), col("n_docs"))
        .orderBy(col("stratum"), col("pack_id"))
    }, Some("""
      WITH tok AS (SELECT doc_id, lang, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
      packed AS (SELECT doc_id, lang, text, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM tok),
      asg AS (SELECT lang AS stratum,
             CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
             (cum - n_tokens) % 512 AS pack_offset, text
           FROM packed)
      SELECT stratum, pack_id,
        length(string_agg(text, chr(10) ORDER BY pack_offset)) AS n_chars,
        count(*) AS n_docs
      FROM asg GROUP BY stratum, pack_id
      ORDER BY stratum, pack_id""")),

    // Streaming latest-per-sku (StockStream.latestPerSku) under a real
    // MemoryStream run with a LATE batch — the L16 watermark-expiry
    // semantics under oracle, not just spec. Timeline (1-hour delay,
    // synthetic hours so the watermark math is exact on both sides):
    // batch 0 sends each user's first ≤5 updates at base+rn h; batch 1
    // advances event time to base+108h for users 0-14 only; batch 2 is
    // late traffic — users 15-22 get an update at base+50h (beyond the
    // base+107h watermark → DROPPED; their batch-0 state must survive,
    // and qty 7777 would visibly win if the drop failed) while users
    // 23-29 get one at base+107h30m (inside the allowed lateness →
    // KEPT, wins with qty 9999). The memory sink accumulates every
    // Update-mode state emission; the newest per sku is the final
    // state, which the oracle replays from the surviving timeline.
    ("q113_stream_latest_sku", (s: SparkSession, d: String) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import java.sql.Timestamp
      val baseMs = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
      def at(h: Double) = new Timestamp(baseMs + (h * 3600 * 1000).toLong)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val upd = t(s, d, "events").filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
        .select(col("user_id"), col("rn"),
          floor(col("value") * 100).cast("int").as("qty"))
        .as[(Long, Int, Int)].collect()
      val b0 = upd.filter(_._2 <= 5)
        .map { case (u, rn, q) => (s"sku_$u", q, at(rn.toDouble)) }.toSeq
      val b1 = upd.filter(r => r._2 >= 6 && r._1 < 15)
        .map { case (u, rn, q) => (s"sku_$u", q, at(100.0 + rn)) }.toSeq
      val lateDropped = upd.map(_._1).distinct.filter(u => u >= 15 && u <= 22)
        .map(u => (s"sku_$u", 7777, at(50.0))).toSeq
      val lateKept = upd.map(_._1).distinct.filter(u => u >= 23 && u <= 29)
        .map(u => (s"sku_$u", 9999, at(107.5))).toSeq
      // The DROP assertion rests on batch 1 advancing the watermark to
      // ~base+107h — which requires users 0-14 to have >= 6 events.
      // Fail the fixture loudly if the dataset ever stops providing
      // that, instead of silently keeping the 7777 rows.
      require(b1.nonEmpty,
        "q113 fixture precondition: users 0-14 need >= 6 events to advance the watermark")
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Int, Timestamp)]
      val qn = "q113_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.StockStream.latestPerSku(
          input.toDF().toDF("sku", "qty", "modified_at"), watermarkDelay = "1 hour")
        .writeStream.format("memory").queryName(qn).outputMode("update").start()
      try {
        input.addData(b0); q.processAllAvailable()
        input.addData(b1); q.processAllAvailable()
        input.addData(lateDropped ++ lateKept); q.processAllAvailable()
      } finally q.stop()
      // The emission log folds to final state via the operator's own
      // batch analog (X6) — the same later-modified_at-wins semantics,
      // defined once.
      graft.streaming.StockStream.latestPerSkuBatch(s.table(qn))
        .select(col("sku"), col("qty"),
          unix_micros(col("modified_at")).as("us"))
        .orderBy(col("sku"))
    }, Some("""
      WITH e AS (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           FROM events WHERE user_id < 30),
      u AS (SELECT user_id, rn, CAST(floor(value * 100) AS INT) AS qty
            FROM e WHERE rn <= 8),
      tl AS (
        SELECT user_id, qty,
          epoch_us(TIMESTAMP '2026-01-01 00:00:00' + to_hours(rn)) AS us
        FROM u WHERE rn <= 5
        UNION ALL
        SELECT user_id, qty,
          epoch_us(TIMESTAMP '2026-01-01 00:00:00' + to_hours(100 + rn))
        FROM u WHERE rn BETWEEN 6 AND 8 AND user_id < 15
        UNION ALL
        SELECT DISTINCT user_id, 9999,
          epoch_us(TIMESTAMP '2026-01-01 00:00:00'
            + INTERVAL '107 hours' + INTERVAL '30 minutes')
        FROM u WHERE user_id BETWEEN 23 AND 29)
      SELECT 'sku_' || user_id AS sku, qty, us FROM tl
      QUALIFY row_number() OVER (PARTITION BY user_id
        ORDER BY us DESC, qty DESC) = 1
      ORDER BY sku""")),

    // Streaming exact dedup (EventStream.dedupStream) under oracle —
    // the L22 dropDuplicatesWithinWatermark semantics in BOTH
    // directions: duplicates inside the horizon vanish, and state
    // EVICTION lets the same fingerprint pass again afterwards. The
    // stream carries pre-normalized text so duplicate rows are fully
    // identical (whichever survives, the output is byte-equal).
    // Timeline (1-hour delay): batch 0 = all docs at base (dups
    // collapse to one row per fingerprint); batch 1 re-sends everything
    // at base+30m (all dropped — watermark still behind, state alive);
    // batch 2 = one sentinel at base+5h (watermark → base+4h, past
    // every batch-0 expiry at base+1h → state evicted); batch 3
    // re-sends at base+6h and everything passes AGAIN.
    ("q114_stream_dedup_docs", (s: SparkSession, d: String) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import java.sql.Timestamp
      val baseMs = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
      def at(h: Double) = new Timestamp(baseMs + (h * 3600 * 1000).toLong)
      val texts = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(TextAnalysis.normalized(col("text")).as("t"))
        .as[String].collect().toSeq
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Timestamp, String)]
      val qn = "q114_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.EventStream.dedupStream(
          input.toDF().toDF("ts", "text"), delay = "1 hour")
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try {
        input.addData(texts.map(t => (at(0.0), t))); q.processAllAvailable()
        input.addData(texts.map(t => (at(0.5), t))); q.processAllAvailable()
        input.addData(Seq((at(5.0), "watermark advance sentinel")))
        q.processAllAvailable()
        input.addData(texts.map(t => (at(6.0), t))); q.processAllAvailable()
      } finally q.stop()
      s.table(qn).select(col("text"), unix_micros(col("ts")).as("us"))
        .orderBy(col("text"), col("us"))
    }, Some("""
      WITH n AS (SELECT DISTINCT trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')) AS text
           FROM documents WHERE doc_id < 100),
      tl AS (
        SELECT text, epoch_us(TIMESTAMP '2026-01-01 00:00:00') AS us FROM n
        UNION ALL
        SELECT text,
          epoch_us(TIMESTAMP '2026-01-01 00:00:00' + INTERVAL '6 hours') FROM n
        UNION ALL
        SELECT 'watermark advance sentinel',
          epoch_us(TIMESTAMP '2026-01-01 00:00:00' + INTERVAL '5 hours'))
      SELECT text, us FROM tl ORDER BY text, us""")),

    // The real java.net.http transport under oracle (S4/E4): a
    // loopback com.sun.net.httpserver fixture serves the documents
    // table as four Bearer-authed JSON pages; the graft-paged DSv2
    // source fetches each page in its own executor-side InputPartition
    // and the bodies parse declaratively (from_json + explode). The
    // scan is forced while the server is up, then returned localized
    // (the server is a fixture, not part of the measured plan). The
    // oracle replays the same pagination as a row_number bucketing.
    ("q115_paged_http", (s: SparkSession, d: String) => {
      import s.implicits._
      val token = "q115-token"
      val docs = t(s, d, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("lang"), col("text"))
        .orderBy(col("doc_id"))
        .toJSON.collect().toSeq
      val pages = docs.grouped(10).zipWithIndex
        .map { case (g, i) => (i + 1) -> s"[${g.mkString(",")}]" }.toMap
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/pages/", (ex: com.sun.net.httpserver.HttpExchange) => {
        val ok = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .contains(s"Bearer $token")
        val (code, body) =
          if (!ok) (401, """{"error":"unauthorized"}""")
          else pages.get(ex.getRequestURI.getPath.stripPrefix("/pages/").toInt)
            .map((200, _)).getOrElse((404, """{"error":"no such page"}"""))
        val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        val os = ex.getResponseBody; os.write(bytes); ex.close()
      })
      // Non-daemon pool: must be shut down explicitly or it pins the
      // JVM open after main exits (HttpServer.stop does NOT stop a
      // user-provided executor).
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      server.setExecutor(pool)
      server.start()
      val fetched = try {
        val port = server.getAddress.getPort
        s.read.format("graft-paged")
          .option("urlTemplate", s"http://127.0.0.1:$port/pages/{page}")
          .option("pages", pages.size.toString)
          .option("transport", "http")
          .option("bearerToken", token)
          .load()
          .select(col("page"), explode(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              "array<struct<doc_id:long,lang:string,text:string>>"))).as("r"))
          .select(col("page"), col("r.doc_id").as("doc_id"),
            col("r.lang").as("lang"), length(col("r.text")).as("n_chars"))
          .collect().toSeq
      } finally { server.stop(0); pool.shutdown() }
      fetched.map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getInt(3)))
        .toDF("page", "doc_id", "lang", "n_chars")
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT CAST((row_number() OVER (ORDER BY doc_id) - 1) // 10 + 1 AS INT)
          AS page,
        doc_id, lang, length(text) AS n_chars
      FROM documents WHERE doc_id < 40 ORDER BY doc_id""")),

    // REAL image decode (Multimodal.ImageCodec over javax.imageio,
    // L14): each document row becomes a deterministic single-color
    // image — dimensions from doc_id arithmetic, format cycling
    // jpeg/png/gif, every 10th-with-7 row corrupted to raw text bytes
    // — encoded executor-side with the real ImageIO writers, then
    // decoded back by the header-only reader. The oracle replays the
    // dimension arithmetic; corrupt rows must come back null-decoded,
    // not as task failures. The encode→decode round-trip is what makes
    // the decode REAL: the reader parses actual PNG/JFIF/GIF headers.
    ("q116_image_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val content =
            if (id % 10 == 7) Option(text).getOrElse("").getBytes("UTF-8")
            else {
              val w = (8 + id % 32).toInt
              val h = (8 + (id * 7) % 32).toInt
              val fmt = (id % 3).toInt match {
                case 0 => "jpg"; case 1 => "png"; case _ => "gif"
              }
              Multimodal.ImageCodec.encode(w, h,
                ((id * 2654435761L) & 0xFFFFFFL).toInt, fmt)
            }
          (id, content)
        }).toDF("media_id", "content")
      Multimodal.decodeImageMeta(media)
        .select(col("media_id"), col("format"), col("width"), col("height"))
        .orderBy(col("media_id"))
    }, Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             WHEN doc_id % 3 = 0 THEN 'jpeg'
             WHEN doc_id % 3 = 1 THEN 'png'
             ELSE 'gif' END AS format,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(8 + doc_id % 32 AS INT) END AS width,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(8 + (doc_id * 7) % 32 AS INT) END AS height
      FROM documents WHERE doc_id < 60 ORDER BY media_id""")),

    // mongoimport-compatible export (MongoExport.mongoJson — the K8
    // recursive datetime serialization done declaratively): nested
    // struct + array document per order, timestamps ISO-8601 at depth,
    // _id leading. The oracle REBUILDS each JSON line by string
    // concatenation — byte-for-byte, including the nested placed_at —
    // so any drift in field order, quoting, decimal scale, or the
    // recursive temporal formatting hash-mismatches.
    ("q117_mongo_export", (s: SparkSession, d: String) => {
      val doc = t(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(
          concat(lit("orders_"), col("o_orderkey")).as("pid"),
          col("o_custkey").as("customer"),
          col("o_totalprice").cast("decimal(18,2)").as("total"),
          struct(col("o_orderstatus").as("status"),
            col("o_orderdate").cast("timestamp").as("placed_at")).as("meta"),
          array(col("o_orderpriority"), col("o_orderstatus")).as("tags"))
      graft.sinks.MongoExport.mongoJson(doc, "pid").toDF("json")
        .withColumn("_id", get_json_object(col("json"), "$._id"))
        .select(col("_id"), col("json"))
        .orderBy(col("_id"))
    }, Some("""
      SELECT 'orders_' || o_orderkey AS _id,
        '{"_id":"orders_' || o_orderkey ||
          '","customer":' || o_custkey ||
          ',"total":' || CAST(o_totalprice AS DECIMAL(18,2)) ||
          ',"meta":{"status":"' || o_orderstatus ||
          '","placed_at":"' ||
          strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ') ||
          '"},"tags":["' || o_orderpriority || '","' || o_orderstatus ||
          '"]}' AS json
      FROM orders WHERE o_orderkey < 500 ORDER BY _id""")),

    // Standard time-travel SQL through the V2 snapshot catalog
    // (GraftCatalog + ResolveGraftSnapshot): commit customers, merge a
    // +1000 balance update onto every 3rd key as version 2, then read
    // BOTH versions with plain `VERSION AS OF` — no format options, no
    // Scala API. The oracle recomputes each version's aggregate from
    // the base table and the update rule; GraftCatalogSpec pins that
    // these reads still plan through the skipping file index.
    ("q118_sql_time_travel", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q118_store")
        .resolve("t").toString
      val c = t(s, d, "customer").select(col("c_custkey"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"),
        col("c_mktsegment").as("part"), lit(1L).as("ver"))
      graft.sinks.SnapshotStore.commit(s, c, root, "part")
      graft.sinks.SnapshotStore.mergeCommit(s,
        c.filter(pmod(col("c_custkey"), lit(3)) === 0)
          .withColumn("bal", col("bal") + lit(1000).cast("decimal(18,2)"))
          .withColumn("ver", lit(2L)),
        root, "c_custkey", "ver", "part")
      s.conf.set("spark.sql.catalog.graft_tt",
        classOf[graft.sinks.GraftCatalog].getName)
      s.sql(s"""
        SELECT 1 AS snap, count(*) AS n, CAST(sum(bal) AS DOUBLE) AS total
        FROM graft_tt.`$root` VERSION AS OF 1
        UNION ALL
        SELECT 2 AS snap, count(*) AS n, CAST(sum(bal) AS DOUBLE) AS total
        FROM graft_tt.`$root` VERSION AS OF 2
        ORDER BY snap""")
    }, Some("""
      WITH c AS (SELECT c_custkey,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer)
      SELECT 1 AS snap, count(*) AS n, CAST(sum(bal) AS DOUBLE) AS total
      FROM c
      UNION ALL
      SELECT 2 AS snap, count(*) AS n,
        CAST(sum(bal + CASE WHEN c_custkey % 3 = 0
          THEN CAST(1000 AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2))
          END) AS DOUBLE) AS total
      FROM c
      ORDER BY snap""")),

    // Calibrated token budgets (TextAnalysis.calibratedTokenCount →
    // Sampling.sampleToTokenBudget): the rate is MEASURED in-query via
    // tokenCalibrationRate on a held-out sample (every 7th doc, with
    // whitespace-words × 1.3 playing the "real tokenizer" counts),
    // then drives a per-language budget sample. The oracle recomputes
    // the same rate as an exact ratio of sums and replays the proxy
    // regex + ceil + md5 cumsum — so the full measure→scale→budget
    // path is pinned end-to-end, not just the multiplication.
    ("q119_calibrated_budget_sample", (s: SparkSession, d: String) => {
      import graft.functions.TextAnalysis
      val docs = t(s, d, "documents")
      val sample = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      val rate = TextAnalysis.tokenCalibrationRate(sample, col("text"),
        ceil(size(split(col("text"), " ")) * lit(1.3)))
      val withTok = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.calibratedTokenCount(col("text"), rate).as("est_tokens"))
      graft.operators.Sampling.sampleToTokenBudget(withTok, col("est_tokens"),
          col("doc_id"), col("lang"), budgetPerStratum = 3000L)
        .orderBy(col("doc_id"))
    }, Some("""
      WITH proxy AS (SELECT doc_id, lang,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS n_proxy,
             CAST(ceil(len(string_split(text, ' ')) * CAST(1.3 AS DOUBLE))
               AS BIGINT) AS n_actual
           FROM documents),
      rate AS (SELECT CAST(sum(n_actual) AS DOUBLE) / sum(n_proxy) AS r
               FROM proxy WHERE doc_id % 7 = 0),
      est AS (SELECT doc_id, lang,
             CAST(ceil(n_proxy * (SELECT r FROM rate)) AS BIGINT) AS est_tokens
           FROM proxy)
      SELECT doc_id, lang, est_tokens FROM (
        SELECT doc_id, lang, est_tokens,
          sum(est_tokens) OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        FROM est)
      WHERE running <= 3000 ORDER BY doc_id""")),

    // Threshold-crossing alerts (StockStream.lowStockAlerts,
    // flatMapGroupsWithState) under oracle: deterministic per-user
    // stock walks derived from events feed in two batches — the second
    // REPLAYS a stale prefix (older than held state → must be ignored,
    // no duplicate alerts) plus a genuinely newer tail. Alerts fire
    // only on below/above crossings of the threshold, which the oracle
    // replays as a lag() over the surviving ts-ordered walk.
    ("q120_stream_stock_alerts", (s: SparkSession, d: String) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import java.sql.Timestamp
      val baseMs = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
      def at(k: Int) = new Timestamp(baseMs + k.toLong * 60000L)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val walk = t(s, d, "events").filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 12)
        .select(col("user_id"), col("rn"),
          pmod(floor(col("value") * 10), lit(20)).cast("int").as("qty"))
        .as[(Long, Int, Int)].collect()
        .map { case (u, rn, q) => (s"sku_$u", q, at(rn)) }.toSeq
      val sorted = walk.sortBy(r => (r._1, r._3.getTime))
      val batch1 = sorted.filter(_._3.getTime <= baseMs + 8 * 60000L)
      val batch2 = sorted // full replay: stale prefix ignored, tail applies
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Int, Timestamp)]
      val qn = "q120_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.StockStream.lowStockAlerts(
          input.toDF().toDF("sku", "qty", "modified_at"), threshold = 10)
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try {
        input.addData(batch1); q.processAllAvailable()
        input.addData(batch2); q.processAllAvailable()
      } finally q.stop()
      s.table(qn).select(col("sku"), col("qty"), col("kind"),
          unix_micros(col("modified_at")).as("us"))
        .orderBy(col("sku"), col("us"))
    }, Some("""
      WITH e AS (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           FROM events WHERE user_id < 20),
      walk AS (SELECT 'sku_' || user_id AS sku,
             CAST((CAST(floor(value * 10) AS BIGINT) % 20 + 20) % 20 AS INT)
               AS qty,
             epoch_us(TIMESTAMP '2026-01-01 00:00:00'
               + to_minutes(rn)) AS us
           FROM e WHERE rn <= 12),
      lagged AS (SELECT sku, qty, us,
             lag(qty) OVER (PARTITION BY sku ORDER BY us) AS prev
           FROM walk)
      SELECT sku, qty,
        CASE WHEN qty < 10 THEN 'low_stock' ELSE 'restocked' END AS kind,
        us
      FROM lagged
      WHERE (qty < 10 AND (prev IS NULL OR prev >= 10))
         OR (qty >= 10 AND prev IS NOT NULL AND prev < 10)
      ORDER BY sku, us""")),

    // URL canonicalization + per-domain cap (Urls.canonicalUrl /
    // domainOf → sampleNPerStratum): four deterministic URL shapes per
    // doc — uppercase scheme/host with www and default port, tracking
    // params out of order, a non-default port that must SURVIVE, and a
    // non-URL that must drop — then at most 5 docs per domain in md5
    // order. The oracle hand-DERIVES the expected canonical strings
    // from the construction arithmetic (independent truth, not a
    // replay of the same regexes) and replays only the md5 cap.
    ("q121_url_canonical_cap", (s: SparkSession, d: String) => {
      import graft.functions.Urls
      val m4 = pmod(col("doc_id"), lit(4))
      val site = pmod(col("doc_id"), lit(7))
      val urls = t(s, d, "documents").select(col("doc_id")).withColumn("url",
        when(m4 === 0, concat(lit("HTTP://WWW.Site"), site, lit(".com:80/a/b"),
          col("doc_id"), lit("/?utm_source=x&b=2&a=1#frag")))
        .when(m4 === 1, concat(lit("https://site"), site, lit(".com:443/path"),
          col("doc_id"), lit("?a=1&utm_campaign=y&fbclid=z")))
        .when(m4 === 2, concat(lit("https://Sub.site"), site,
          lit(".com:8443/p?z=9&ref=tw")))
        .otherwise(concat(lit("not a url "), col("doc_id"))))
      val canon = urls.select(col("doc_id"),
          Urls.domainOf(col("url")).as("domain"),
          Urls.canonicalUrl(col("url")).as("canonical"))
        .filter(col("canonical").isNotNull)
      graft.operators.Sampling.sampleNPerStratum(canon, col("doc_id"),
          col("domain"), perStratum = 5)
        .orderBy(col("doc_id"))
    }, Some("""
      WITH u AS (SELECT doc_id,
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'site' || (doc_id % 7) || '.com'
            WHEN 1 THEN 'site' || (doc_id % 7) || '.com'
            WHEN 2 THEN 'sub.site' || (doc_id % 7) || '.com'
          END AS domain,
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'http://site' || (doc_id % 7) || '.com/a/b' ||
              doc_id || '?a=1&b=2'
            WHEN 1 THEN 'https://site' || (doc_id % 7) || '.com/path' ||
              doc_id || '?a=1'
            WHEN 2 THEN 'https://sub.site' || (doc_id % 7) || '.com:8443/p?z=9'
          END AS canonical
        FROM documents WHERE doc_id % 4 < 3)
      SELECT doc_id, domain, canonical FROM (
        SELECT doc_id, domain, canonical,
          row_number() OVER (PARTITION BY domain
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM u)
      WHERE rn <= 5 ORDER BY doc_id""")),

    // Domain blocklist scrub + per-domain accounting
    // (Urls.scrubDomains / domainStats): same deterministic URL
    // construction as q121; blocking site3.com must ALSO remove
    // sub.site3.com (suffix-chain semantics) while sub.site5.com
    // blocks only itself; survivors aggregate to per-domain doc
    // counts, total text length, and corpus share. The oracle derives
    // the domains and the block decision from the construction
    // arithmetic — the suffix logic is replayed as explicit CASE
    // conditions, not the chain-explode join.
    ("q122_domain_scrub_stats", (s: SparkSession, d: String) => {
      import graft.functions.Urls
      val m4 = pmod(col("doc_id"), lit(4))
      val site = pmod(col("doc_id"), lit(7))
      val urls = t(s, d, "documents")
        .select(col("doc_id"), length(col("text")).as("w")).withColumn("url",
          when(m4 === 0, concat(lit("HTTP://WWW.Site"), site, lit(".com:80/a/b"),
            col("doc_id"), lit("/?utm_source=x&b=2&a=1#frag")))
          .when(m4 === 1, concat(lit("https://site"), site, lit(".com:443/path"),
            col("doc_id"), lit("?a=1&utm_campaign=y&fbclid=z")))
          .when(m4 === 2, concat(lit("https://Sub.site"), site,
            lit(".com:8443/p?z=9&ref=tw")))
          .otherwise(concat(lit("not a url "), col("doc_id"))))
        .filter(Urls.canonicalUrl(col("url")).isNotNull)
      val blocklist = {
        import s.implicits._
        Seq("site3.com", "sub.site5.com").toDF("domain")
      }
      val kept = Urls.scrubDomains(urls, col("doc_id"), col("url"), blocklist)
      Urls.domainStats(kept, col("url"), col("w"))
        .select(col("domain"), col("docs"), col("weight"),
          round(col("weight_share"), 6).as("weight_share"))
        .orderBy(col("domain"))
    }, Some("""
      WITH u AS (SELECT doc_id, length(text) AS w,
          CASE WHEN doc_id % 4 = 2
            THEN 'sub.site' || (doc_id % 7) || '.com'
            ELSE 'site' || (doc_id % 7) || '.com' END AS domain
        FROM documents WHERE doc_id % 4 < 3),
      kept AS (SELECT * FROM u
        WHERE domain NOT IN ('site3.com', 'sub.site3.com', 'sub.site5.com')),
      agg AS (SELECT domain, count(*) AS docs,
          CAST(sum(w) AS BIGINT) AS weight
        FROM kept GROUP BY domain)
      SELECT domain, docs, weight,
        round(CAST(weight AS DOUBLE) / sum(weight) OVER (), 6) AS weight_share
      FROM agg ORDER BY domain""")),

    // Deterministic train/val/test assignment (Sampling.hashSplit):
    // the split label is a pure function of (seed, doc_id) — the hex
    // prefix of md5('graft|'||id) against precomputed fixed-width hex
    // thresholds — so ANY engine with md5 replays the exact
    // assignment, and membership never shifts as the corpus grows.
    // The oracle recomputes the label from the same contract.
    ("q123_hash_split", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      graft.operators.Sampling.hashSplit(docs, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        CASE WHEN substr(md5('graft|' || doc_id), 1, 8) < 'cccccccd'
               THEN 'train'
             WHEN substr(md5('graft|' || doc_id), 1, 8) < 'e6666666'
               THEN 'val'
             ELSE 'test' END AS split
      FROM documents ORDER BY doc_id""")),

    // Real audio metadata decode (Multimodal.AudioCodec, the q116
    // pattern for sound): executor-side WAV encode → header-only
    // decode round-trip. Rate/channels/frames come from doc_id
    // arithmetic; every doc_id%10==7 row carries text bytes that must
    // null-decode (corrupt media is data, not a failure). The oracle
    // recomputes channels, rate, frame count, and the floored
    // duration from the same arithmetic — the codec's output must
    // land exactly on the derivation.
    ("q124_audio_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val content =
            if (id % 10 == 7) Option(text).getOrElse("").getBytes("UTF-8")
            else {
              val rate = (id % 3).toInt match {
                case 0 => 8000; case 1 => 16000; case _ => 44100
              }
              Multimodal.AudioCodec.encode(rate,
                (1 + id % 2).toInt, (200 + (id * 13) % 500).toInt)
            }
          (id, content)
        }).toDF("media_id", "content")
      Multimodal.decodeAudioMeta(media)
        .select(col("media_id"), col("encoding"), col("channels"),
          col("sample_rate"), col("n_frames"), col("duration_ms"))
        .orderBy(col("media_id"))
    }, Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 10 = 7 THEN NULL ELSE 'pcm_signed' END AS encoding,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(1 + doc_id % 2 AS INT) END AS channels,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             WHEN doc_id % 3 = 0 THEN CAST(8000 AS INT)
             WHEN doc_id % 3 = 1 THEN CAST(16000 AS INT)
             ELSE CAST(44100 AS INT) END AS sample_rate,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(200 + (doc_id * 13) % 500 AS BIGINT) END AS n_frames,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             WHEN doc_id % 3 = 0
               THEN CAST((200 + (doc_id * 13) % 500) * 1000 // 8000 AS BIGINT)
             WHEN doc_id % 3 = 1
               THEN CAST((200 + (doc_id * 13) % 500) * 1000 // 16000 AS BIGINT)
             ELSE CAST((200 + (doc_id * 13) % 500) * 1000 // 44100 AS BIGINT)
             END AS duration_ms
      FROM documents WHERE doc_id < 60 ORDER BY media_id""")),

    // Keyed delete as an atomic snapshot commit
    // (SnapshotStore.deleteCommit, K3 at snapshot granularity): the
    // key list carries NO partition column, so the store must probe —
    // a column-pruned (key, partition) semi-join — to find which
    // partitions to rewrite, carry the rest by reference, and the
    // post-delete read must equal the oracle's anti-filter.
    ("q125_snapshot_delete", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q125_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_custkey"),
        col("o_totalprice"))
      graft.sinks.SnapshotStore.commit(s, orders, root, "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .select(col("o_orderkey")),
        root, "o_orderkey", "o_orderstatus")
      graft.sinks.SnapshotStore.table(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey""")),

    // Row-level change feed between snapshot versions
    // (SnapshotStore.changes): v1 commits a base, v2 merge-updates
    // every %5==0 key and inserts the %5==4 keys v1 withheld, v3
    // delete-commits the %5==1 keys. The feed v1→v3 must classify
    // exactly those three classes — updates/inserts with to-version
    // values, deletes with from-version values, untouched keys ABSENT
    // — and the oracle derives all of it from the key arithmetic.
    ("q126_change_feed", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q126_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(m5 =!= 4).withColumn("rev", lit(1)),
        root, "o_orderstatus")
      val incoming = orders.filter(m5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(m5 === 4))
        .withColumn("rev", lit(2))
      graft.sinks.SnapshotStore.mergeCommit(s, incoming, root,
        "o_orderkey", "rev", "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(m5 === 1).select(col("o_orderkey")),
        root, "o_orderkey", "o_orderstatus")
      graft.sinks.SnapshotStore.changes(s, root, 1L, 3L, "o_orderkey")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"), col("_change_type"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 5 = 1 THEN 1 ELSE 2 END AS rev,
        CASE WHEN o_orderkey % 5 = 0 THEN 'update'
             WHEN o_orderkey % 5 = 4 THEN 'insert'
             ELSE 'delete' END AS _change_type
      FROM orders WHERE o_orderkey % 5 IN (0, 1, 4)
      ORDER BY o_orderkey""")),

    // Incremental corpus dedup (Dedup.dedupIncremental): the accepted
    // corpus's MinHash signature index is PERSISTED (snapshot store,
    // partitioned by band) and a new ingest batch — fresh docs, near
    // -dups of indexed docs, and near-dups of other batch docs — is
    // deduplicated against it without re-shingling the corpus. The
    // oracle replays the md5 signatures, the banded probe vs the
    // corpus, and the within-batch keep-first, all in SQL.
    ("q127_incremental_dedup", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q127_store")
        .resolve("t").toString
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val idx = graft.operators.Dedup.minHashIndex(corpus,
        col("text"), col("doc_id"),
        numHashes = 12, bands = 4, shingleWidth = 3, fastHash = false)
      graft.sinks.SnapshotStore.commit(s, idx, root, "band")
      val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" zz yy xx")).as("text")))
        .unionByName(docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(col("text"), lit(" aa bb")).as("text")))
      graft.operators.Dedup.dedupIncremental(batch,
          col("text"), col("doc_id"),
          graft.sinks.SnapshotStore.read(s, root),
          numHashes = 12, bands = 4, shingleWidth = 3,
          threshold = 0.3, fastHash = false)
        .select(col("doc_id"), length(col("text")).as("n_chars"))
        .orderBy(col("doc_id"))
    }, Some {
      val seeds = (0 until 12).map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        .mkString("[", ", ", "]")
      s"""
      WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 100),
      batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 100 AND doc_id < 200
        UNION ALL
        SELECT doc_id + 200000 AS doc_id, text || ' zz yy xx' AS text
        FROM documents WHERE doc_id < 50
        UNION ALL
        SELECT doc_id + 300000 AS doc_id, text || ' aa bb' AS text
        FROM documents WHERE doc_id >= 100 AND doc_id < 120),
      alld AS (SELECT * FROM corpus UNION ALL SELECT * FROM batch),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM alld),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w),
      sig AS (SELECT doc_id, $seeds AS sig FROM shingled),
      banded AS (
        SELECT doc_id, sig, t.b AS band,
          md5(array_to_string(sig[t.b*3+1:t.b*3+3], ' ')) AS bucket
        FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
      vs_corpus AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE l.doc_id >= 100 AND r.doc_id < 100
          AND len(list_filter(generate_series(1, 12),
                i -> l.sig[i] = r.sig[i])) / 12.0 >= 0.3),
      within AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE l.doc_id >= 100 AND r.doc_id >= 100 AND l.doc_id > r.doc_id
          AND len(list_filter(generate_series(1, 12),
                i -> l.sig[i] = r.sig[i])) / 12.0 >= 0.3)
      SELECT doc_id, length(text) AS n_chars FROM batch
      WHERE doc_id NOT IN (SELECT doc_id FROM vs_corpus)
        AND doc_id NOT IN (SELECT doc_id FROM within)
      ORDER BY doc_id"""
    }),

    // Streaming gap sessionization (EventStream.sessionizeStream)
    // under a real MemoryStream run — native session_window semantics
    // pinned by oracle: events ≤15 min apart merge (6-min steps), a
    // 36-min step breaks, sessions close at last-event+gap and emit
    // exactly once (append mode) when the watermark passes. A sentinel
    // advances the watermark to flush every session; a late replay
    // into an already-emitted session (qty 7777 at minute 6) must be
    // DROPPED — neither a duplicate session nor a changed total. The
    // oracle replays the same timeline as batch gaps-and-islands.
    ("q128_stream_sessionize", (s: SparkSession, d: String) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import java.sql.Timestamp
      val baseMs = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
      def atMin(m: Double) = new Timestamp(baseMs + (m * 60000).toLong)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val ev = t(s, d, "events").filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("user_id"), col("rn"),
          floor(col("value") * 100).cast("int").as("v"))
        .as[(Long, Int, Int)].collect()
      val b0 = ev.map { case (u, rn, v) =>
        (u, v, atMin((rn * 6 + 30 * (rn / 3)).toDouble)) }.toSeq
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Int, Timestamp)]
      val qn = "q128_mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.EventStream.sessionizeStream(
          input.toDF().toDF("user_id", "value", "ts"),
          key = "user_id", gap = "15 minutes", delay = "1 hour")
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try {
        input.addData(b0); q.processAllAvailable()
        input.addData(Seq((9999L, 0, atMin(6000.0)))); q.processAllAvailable()
        input.addData(Seq((0L, 7777, atMin(6.0)))); q.processAllAvailable()
      } finally q.stop()
      s.table(qn).filter(col("user_id") < 20)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("start_us"))
    }, Some("""
      WITH e AS (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           FROM events WHERE user_id < 20),
      u AS (SELECT user_id, rn, CAST(floor(value * 100) AS INT) AS v,
             rn * 6 + 30 * (rn // 3) AS off
            FROM e WHERE rn <= 10),
      g AS (SELECT *, CASE WHEN off - lag(off) OVER
              (PARTITION BY user_id ORDER BY off) > 15
             THEN 1 ELSE 0 END AS brk FROM u),
      sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY off
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g),
      agg AS (SELECT user_id, sid, min(off) AS a, max(off) AS b,
             count(*) AS n_events, CAST(sum(v) AS BIGINT) AS total_value
           FROM sess GROUP BY user_id, sid)
      SELECT user_id,
        epoch_us(TIMESTAMP '2026-01-01 00:00:00' + to_minutes(a)) AS start_us,
        epoch_us(TIMESTAMP '2026-01-01 00:00:00' + to_minutes(b + 15)) AS end_us,
        n_events, total_value
      FROM agg ORDER BY user_id, start_us""")),

    // Model-based quality filtering (TextAnalysis.qualityLogit): the
    // classifier-filter shape of modern corpus curation as one
    // codegen'd map-side projection. The linear model is plain IEEE
    // arithmetic in a FIXED evaluation order, so the oracle replays
    // the logit bit-for-bit — features, weights, decision rule.
    ("q129_quality_logit", (s: SparkSession, d: String) => {
      val logit = TextAnalysis.qualityLogit(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), logit.as("logit"), (logit > 0).as("kept"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH b AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ('the','and','of','to','in','is','that','for','with'))) AS BIGINT) AS n_stop,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
          CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper
        FROM documents),
      f AS (SELECT doc_id, n_tokens,
        CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_token_len,
        CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
        CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
        CASE WHEN n_chars > 0 THEN CAST(n_upper AS DOUBLE) / n_chars ELSE 0.0 END AS upper_ratio
        FROM b)
      SELECT doc_id,
        -1.2 + 4.0 * stopword_ratio + -3.0 * punct_ratio + -2.0 * upper_ratio
          + 0.1 * mean_token_len
          + 1.5 * (CAST(least(n_tokens, 256) AS DOUBLE) / 256.0) AS logit,
        (-1.2 + 4.0 * stopword_ratio + -3.0 * punct_ratio + -2.0 * upper_ratio
          + 0.1 * mean_token_len
          + 1.5 * (CAST(least(n_tokens, 256) AS DOUBLE) / 256.0)) > 0 AS kept
      FROM f ORDER BY doc_id""")),

    // Real multi-frame decode + frame-sample planning (Multimodal.
    // decodeFrameMeta over ImageCodec.decodeFrames): executor-side
    // animated-GIF encode → REAL frame-count decode, then every-3rd-
    // frame sampling as a sequence-explode — the video half of the
    // media family. Frames/dims come from doc_id arithmetic; every
    // doc_id%10==3 row carries text bytes that must null-decode and
    // produce NO sample rows. The oracle recomputes frame counts and
    // the sampled indices from the same arithmetic.
    ("q130_video_frames", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val content =
            if (id % 10 == 3) Option(text).getOrElse("").getBytes("UTF-8")
            else Multimodal.ImageCodec.encodeAnimated(
              (16 + (id % 5) * 8).toInt, (16 + (id % 3) * 8).toInt,
              (1 + id % 7).toInt)
          (id, content)
        }).toDF("media_id", "content")
      Multimodal.decodeFrameMeta(media)
        .filter(col("n_frames").isNotNull)
        .select(col("media_id"), col("width"), col("height"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(3))).as("frame_idx"))
        .orderBy(col("media_id"), col("frame_idx"))
    }, Some("""
      WITH m AS (
        SELECT doc_id AS media_id,
          CAST(16 + (doc_id % 5) * 8 AS INT) AS width,
          CAST(16 + (doc_id % 3) * 8 AS INT) AS height,
          CAST(1 + doc_id % 7 AS INT) AS n_frames
        FROM documents WHERE doc_id < 60 AND doc_id % 10 <> 3)
      SELECT media_id, width, height, n_frames,
        CAST(u.f AS INT) AS frame_idx
      FROM m, unnest(generate_series(0, n_frames - 1, 3)) AS u(f)
      ORDER BY media_id, frame_idx""")),

    // Round-7 ingest capstone — the operators composed as a real
    // corpus-ingest pipeline: model-based quality gate (logit > 0,
    // cheapest first) → incremental near-dup dedup against the
    // PERSISTED corpus signature index → deterministic hash split.
    // The oracle chains all three replays: bit-exact logit, md5
    // MinHash banded probes (corpus + within-batch keep-first over
    // the FILTERED batch), and the md5 split thresholds.
    ("q131_ingest_capstone", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q131_store")
        .resolve("t").toString
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      graft.sinks.SnapshotStore.commit(s,
        graft.operators.Dedup.minHashIndex(corpus, col("text"), col("doc_id"),
          numHashes = 12, bands = 4, shingleWidth = 3, fastHash = false),
        root, "band")
      val batch = docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"), col("text"))
        .withColumn("logit", TextAnalysis.qualityLogit(col("text")))
        .filter(col("logit") > 0)
      val deduped = graft.operators.Dedup.dedupIncremental(batch,
        col("text"), col("doc_id"),
        graft.sinks.SnapshotStore.read(s, root),
        numHashes = 12, bands = 4, shingleWidth = 3,
        threshold = 0.3, fastHash = false)
      graft.operators.Sampling.hashSplit(deduped, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("logit"), col("split"))
        .orderBy(col("doc_id"))
    }, Some {
      val seeds = (0 until 12).map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        .mkString("[", ", ", "]")
      s"""
      WITH b AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w IN ('the','and','of','to','in','is','that','for','with'))) AS BIGINT) AS n_stop,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
          CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper
        FROM documents WHERE doc_id >= 100),
      lg AS (SELECT doc_id,
        -1.2 + 4.0 * (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END)
          + -3.0 * (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END)
          + -2.0 * (CASE WHEN n_chars > 0 THEN CAST(n_upper AS DOUBLE) / n_chars ELSE 0.0 END)
          + 0.1 * (CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens ELSE 0.0 END)
          + 1.5 * (CAST(least(n_tokens, 256) AS DOUBLE) / 256.0) AS logit
        FROM b),
      keepb AS (
        SELECT d.doc_id, d.text, lg.logit FROM documents d
        JOIN lg ON d.doc_id = lg.doc_id WHERE lg.logit > 0),
      alld AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 100
        UNION ALL SELECT doc_id, text FROM keepb),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM alld),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w),
      sig AS (SELECT doc_id, $seeds AS sig FROM shingled),
      banded AS (
        SELECT doc_id, sig, t.b AS band,
          md5(array_to_string(sig[t.b*3+1:t.b*3+3], ' ')) AS bucket
        FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
      vs_corpus AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE l.doc_id >= 100 AND r.doc_id < 100
          AND len(list_filter(generate_series(1, 12),
                i -> l.sig[i] = r.sig[i])) / 12.0 >= 0.3),
      within AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE l.doc_id >= 100 AND r.doc_id >= 100 AND l.doc_id > r.doc_id
          AND len(list_filter(generate_series(1, 12),
                i -> l.sig[i] = r.sig[i])) / 12.0 >= 0.3)
      SELECT doc_id, logit,
        CASE WHEN substr(md5('graft|' || doc_id), 1, 8) < 'cccccccd'
               THEN 'train'
             WHEN substr(md5('graft|' || doc_id), 1, 8) < 'e6666666'
               THEN 'val'
             ELSE 'test' END AS split
      FROM keepb
      WHERE doc_id NOT IN (SELECT doc_id FROM vs_corpus)
        AND doc_id NOT IN (SELECT doc_id FROM within)
      ORDER BY doc_id"""
    }),

    // Luhn-gated credit-card redaction (TextAnalysis.redactCreditCards
    // over the native LuhnValid expression): each doc carries a
    // 16-digit derived number — spaced into groups for every %3==0 id
    // — and ONLY checksum-valid runs may redact to <CC>; invalid runs
    // (order-id lookalikes) must pass through untouched. The Spark
    // side runs the full regex→Luhn-filter→fold pipeline; the oracle
    // independently recomputes the checksum digit-by-digit from the
    // construction arithmetic and replays the replacement decision.
    ("q132_card_redaction", (s: SparkSession, d: String) => {
      val num = (lit(4000000000000000L) + col("doc_id") * lit(987654321L))
        .cast("string")
      val card = when(pmod(col("doc_id"), lit(3)) === 0,
        concat_ws(" ", substring(num, 1, 4), substring(num, 5, 4),
          substring(num, 9, 4), substring(num, 13, 4))).otherwise(num)
      t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("ref#"), col("doc_id").cast("string"),
            lit(" card "), card, lit(" end")).as("text2"))
        .select(col("doc_id"),
          TextAnalysis.redactCreditCards(col("text2")).as("redacted"))
        .withColumn("valid",
          graft.expressions.LuhnValid.column(
            (lit(4000000000000000L) + col("doc_id") * lit(987654321L))
              .cast("string")))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH n AS (
        SELECT doc_id,
          CAST(4000000000000000 + doc_id * 987654321 AS VARCHAR) AS num
        FROM documents),
      c AS (
        SELECT doc_id, num,
          CASE WHEN doc_id % 3 = 0
            THEN substr(num,1,4) || ' ' || substr(num,5,4) || ' ' ||
                 substr(num,9,4) || ' ' || substr(num,13,4)
            ELSE num END AS card
        FROM n),
      t2 AS (
        SELECT doc_id, num, card,
          'ref#' || doc_id || ' card ' || card || ' end' AS text2
        FROM c),
      lv AS (
        SELECT *, (list_sum(list_transform(generate_series(1, 16),
            i -> CASE WHEN (16 - i) % 2 = 1
                   THEN CASE WHEN 2 * CAST(substr(num, i, 1) AS INT) > 9
                          THEN 2 * CAST(substr(num, i, 1) AS INT) - 9
                          ELSE 2 * CAST(substr(num, i, 1) AS INT) END
                   ELSE CAST(substr(num, i, 1) AS INT) END)) % 10 = 0) AS valid
        FROM t2)
      SELECT doc_id,
        CASE WHEN valid THEN replace(text2, card, '<CC>') ELSE text2 END AS redacted,
        valid
      FROM lv ORDER BY doc_id""")),

    // Streaming corpus ingest with incremental dedup (CorpusIngest.
    // dedupingWriter): a real two-batch MemoryStream run where each
    // micro-batch dedups against the PERSISTED signature index —
    // batch 1 must be filtered by batch 0's SURVIVORS (not batch 0
    // wholesale) plus the preseeded corpus, and survivors land in the
    // accepted snapshot atomically. The oracle replays the batches
    // SEQUENTIALLY: surv0 vs corpus, then surv1 vs corpus ∪ surv0.
    ("q133_stream_ingest", (s: SparkSession, d: String) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_q133").toString
      val (idxRoot, accRoot) = (s"$dir/idx", s"$dir/acc")
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("id"), col("text"))
      graft.sinks.SnapshotStore.commit(s,
        corpus.withColumn("part", pmod(col("id"), lit(16))), accRoot, "part")
      graft.sinks.SnapshotStore.commit(s,
        graft.operators.Dedup.minHashIndex(corpus, col("text"), col("id"),
            numHashes = 12, bands = 4, shingleWidth = 3, fastHash = false)
          .withColumn("sig_key", concat_ws("#",
            col("id").cast("string"), col("band").cast("string"))),
        idxRoot, "band")
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
        df.as[(Long, String)].collect().toSeq
      val b0 = rows(docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)) ++
        rows(docs.filter(col("doc_id") < 20)
          .select(col("doc_id") + 200000, concat(col("text"), lit(" zz yy xx"))))
      val b1 = rows(docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)) ++
        rows(docs.filter(col("doc_id") >= 50 && col("doc_id") < 70)
          .select(col("doc_id") + 300000, concat(col("text"), lit(" aa bb")))) ++
        rows(docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
          .select(col("doc_id") + 400000, concat(col("text"), lit(" zz yy xx"))))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = graft.streaming.CorpusIngest.dedupingWriter(
        input.toDF().toDF("id", "text"), idxRoot, accRoot, s"$dir/ckpt",
        numHashes = 12, bands = 4, shingleWidth = 3,
        threshold = 0.3, fastHash = false).start()
      try {
        input.addData(b0); q.processAllAvailable()
        input.addData(b1); q.processAllAvailable()
      } finally q.stop()
      graft.sinks.SnapshotStore.read(s, accRoot)
        .select(col("id").as("doc_id"), length(col("text")).as("n_chars"))
        .orderBy(col("doc_id"))
    }, Some {
      val seeds = (0 until 12).map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s)))")
        .mkString("[", ", ", "]")
      val est = "len(list_filter(generate_series(1, 12), i -> l.sig[i] = r.sig[i])) / 12.0 >= 0.3"
      val inB0 = "BETWEEN 50 AND 99 OR %s BETWEEN 200000 AND 200019"
      val inB1 = "BETWEEN 100 AND 149 OR %s BETWEEN 300050 AND 300069 OR %s BETWEEN 400020 AND 400039"
      s"""
      WITH alld AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 200000, text || ' zz yy xx' FROM documents WHERE doc_id < 20
        UNION ALL
        SELECT doc_id + 300000, text || ' aa bb'
        FROM documents WHERE doc_id >= 50 AND doc_id < 70
        UNION ALL
        SELECT doc_id + 400000, text || ' zz yy xx'
        FROM documents WHERE doc_id >= 20 AND doc_id < 40),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM alld),
      shingled AS (SELECT doc_id,
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i:i+2], ' ')) END AS sh
        FROM w),
      sig AS (SELECT doc_id, $seeds AS sig FROM shingled),
      banded AS (
        SELECT doc_id, sig, t.b AS band,
          md5(array_to_string(sig[t.b*3+1:t.b*3+3], ' ')) AS bucket
        FROM sig CROSS JOIN generate_series(0, 3) AS t(b)),
      vs0 AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE (l.doc_id ${inB0.format("l.doc_id")})
          AND r.doc_id < 50 AND $est),
      w0 AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE (l.doc_id ${inB0.format("l.doc_id")})
          AND (r.doc_id ${inB0.format("r.doc_id")})
          AND l.doc_id > r.doc_id AND $est),
      surv0 AS (
        SELECT doc_id FROM alld
        WHERE (doc_id ${inB0.format("doc_id")})
          AND doc_id NOT IN (SELECT doc_id FROM vs0)
          AND doc_id NOT IN (SELECT doc_id FROM w0)),
      vs1 AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE (l.doc_id ${inB1.format("l.doc_id", "l.doc_id")})
          AND (r.doc_id < 50 OR r.doc_id IN (SELECT doc_id FROM surv0))
          AND $est),
      w1 AS (
        SELECT DISTINCT l.doc_id FROM banded l
        JOIN banded r ON l.band = r.band AND l.bucket = r.bucket
        WHERE (l.doc_id ${inB1.format("l.doc_id", "l.doc_id")})
          AND (r.doc_id ${inB1.format("r.doc_id", "r.doc_id")})
          AND l.doc_id > r.doc_id AND $est),
      surv1 AS (
        SELECT doc_id FROM alld
        WHERE (doc_id ${inB1.format("doc_id", "doc_id")})
          AND doc_id NOT IN (SELECT doc_id FROM vs1)
          AND doc_id NOT IN (SELECT doc_id FROM w1)),
      finalids AS (
        SELECT doc_id FROM alld WHERE doc_id < 50
        UNION ALL SELECT doc_id FROM surv0
        UNION ALL SELECT doc_id FROM surv1)
      SELECT a.doc_id, length(a.text) AS n_chars
      FROM alld a JOIN finalids f ON a.doc_id = f.doc_id
      ORDER BY a.doc_id"""
    }),

    // S7 under oracle — the connection/validation probe
    // (FeedReader.validate, the CLI `validate` action's engine): a
    // readable non-empty feed probes OK, a missing path and an
    // empty file probe false (the reference's validate_connection,
    // etl/base.py:275-292, re-expressed as a source probe). VALUES
    // oracle pins all three outcomes.
    ("q134_validate_probe", (s: SparkSession, d: String) => {
      import s.implicits._
      val sample = "/root/reference/sample data/MidOcean Sample Data.jsonc"
      val empty = java.nio.file.Files
        .createTempFile("graft_empty_feed", ".jsonc").toString
      Seq(
        ("empty", graft.sources.FeedReader.validate(s, empty)),
        ("midocean", graft.sources.FeedReader.validate(s, sample)),
        ("missing", graft.sources.FeedReader.validate(s,
          "/tmp/graft_no_such_feed_q134.jsonc")))
        .toDF("supplier", "feed_ok").orderBy(col("supplier"))
    }, Some("""
      SELECT * FROM (VALUES ('empty', false), ('midocean', true),
        ('missing', false)) AS t(supplier, feed_ok)
      ORDER BY supplier""")),

    // Pure-SQL CDC (the table_changes analog): the q126 change feed
    // consumed ENTIRELY through SQL — a `graft-snapshot` view with
    // changesFrom/changesTo/key options — so a SQL-only user reads
    // row-level diffs with no Scala API in sight. Same oracle as the
    // API form: the classifications derive from the key arithmetic.
    ("q135_sql_change_feed", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q135_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(m5 =!= 4).withColumn("rev", lit(1)),
        root, "o_orderstatus")
      val incoming = orders.filter(m5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(m5 === 4))
        .withColumn("rev", lit(2))
      graft.sinks.SnapshotStore.mergeCommit(s, incoming, root,
        "o_orderkey", "rev", "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(m5 === 1).select(col("o_orderkey")),
        root, "o_orderkey", "o_orderstatus")
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_q135 " +
        s"USING `graft-snapshot` OPTIONS (path '$root', " +
        s"changesFrom '1', changesTo '3', key 'o_orderkey')")
      s.sql("""
        SELECT o_orderkey, o_orderstatus, o_totalprice, rev, _change_type
        FROM graft_q135 ORDER BY o_orderkey""")
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 5 = 1 THEN 1 ELSE 2 END AS rev,
        CASE WHEN o_orderkey % 5 = 0 THEN 'update'
             WHEN o_orderkey % 5 = 4 THEN 'insert'
             ELSE 'delete' END AS _change_type
      FROM orders WHERE o_orderkey % 5 IN (0, 1, 4)
      ORDER BY o_orderkey"""))
    ,

    // E48: RESTORE — roll the table back to v1 by reference (a pure
    // metadata commit), then read the CURRENT version. The restored
    // content must be exactly v1's: the merge's updates and inserts
    // vanish, yet remain time-travelable (spec-pinned). Oracle derives
    // v1 from the same key arithmetic that built it.
    ("q136_snapshot_restore", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q136_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(m5 =!= 4).withColumn("rev", lit(1)),
        root, "o_orderstatus")
      val incoming = orders.filter(m5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(m5 === 4))
        .withColumn("rev", lit(2))
      graft.sinks.SnapshotStore.mergeCommit(s, incoming, root,
        "o_orderkey", "rev", "o_orderstatus")
      val v = graft.sinks.SnapshotStore.restore(s, root, 1L)
      require(v == 3L, s"restore committed v$v, expected 3")
      graft.sinks.SnapshotStore.table(s, root)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS rev
      FROM orders WHERE o_orderkey % 5 <> 4
      ORDER BY o_orderkey""")),

    // E48: DESCRIBE HISTORY — the per-version audit view over a
    // commit → merge → delete → restore sequence. Operations come from
    // the manifest's #op tag; partition and row counts replay from the
    // same key arithmetic (total_rows via the stats sidecar — no data
    // read).
    ("q137_snapshot_history", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q137_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(m5 =!= 4).withColumn("rev", lit(1)),
        root, "o_orderstatus")
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m5 === 4).withColumn("rev", lit(2)), root,
        "o_orderkey", "rev", "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(m5 === 1).select(col("o_orderkey")), root,
        "o_orderkey", "o_orderstatus")
      graft.sinks.SnapshotStore.restore(s, root, 1L)
      graft.sinks.SnapshotStore.history(s, root)
        .select(col("version"), col("operation"),
          col("n_partitions"), col("total_rows"))
        .orderBy(col("version"))
    }, Some("""
      SELECT CAST(1 AS BIGINT) AS version, 'commit' AS operation,
        (SELECT count(DISTINCT o_orderstatus) FROM orders
          WHERE o_orderkey % 5 <> 4) AS n_partitions,
        (SELECT count(*) FROM orders WHERE o_orderkey % 5 <> 4) AS total_rows
      UNION ALL SELECT 2, 'merge',
        (SELECT count(DISTINCT o_orderstatus) FROM orders),
        (SELECT count(*) FROM orders)
      UNION ALL SELECT 3, 'delete',
        (SELECT count(DISTINCT o_orderstatus) FROM orders
          WHERE o_orderkey % 5 <> 1),
        (SELECT count(*) FROM orders WHERE o_orderkey % 5 <> 1)
      UNION ALL SELECT 4, 'restore',
        (SELECT count(DISTINCT o_orderstatus) FROM orders
          WHERE o_orderkey % 5 <> 4),
        (SELECT count(*) FROM orders WHERE o_orderkey % 5 <> 4)
      ORDER BY version"""))
    ,

    // E49: declarative expectations — the one-pass batch gate report
    // (Delta Live Tables EXPECT shape). Violation = predicate
    // definitively FALSE (SQL CHECK: null passes), replayed as the
    // same conditional sums.
    ("q138_expectations_report", (s: SparkSession, d: String) => {
      import graft.operators.Expectations, Expectations.Expectation
      Expectations.report(t(s, d, "lineitem"), Seq(
          Expectation("discount_low", col("l_discount") <= 0.05),
          Expectation("qty_small", col("l_quantity") <= 25),
          Expectation("tax_cap", col("l_tax") <= 0.06),
          Expectation("status_set", col("l_linestatus").isNotNull)))
        .orderBy(col("rule"))
    }, Some("""
      WITH agg AS (SELECT count(*) AS total,
        CAST(sum(CASE WHEN NOT coalesce(l_discount <= 0.05, true)
            THEN 1 ELSE 0 END) AS BIGINT) AS v_discount,
        CAST(sum(CASE WHEN NOT coalesce(l_quantity <= 25, true)
            THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        CAST(sum(CASE WHEN NOT coalesce(l_tax <= 0.06, true)
            THEN 1 ELSE 0 END) AS BIGINT) AS v_tax,
        CAST(sum(CASE WHEN NOT coalesce(l_linestatus IS NOT NULL, true)
            THEN 1 ELSE 0 END) AS BIGINT) AS v_status
        FROM lineitem)
      SELECT rule, violations, total, violations = 0 AS pass FROM (
        SELECT 'discount_low' AS rule, v_discount AS violations, total FROM agg
        UNION ALL SELECT 'qty_small', v_qty, total FROM agg
        UNION ALL SELECT 'tax_cap', v_tax, total FROM agg
        UNION ALL SELECT 'status_set', v_status, total FROM agg)
      ORDER BY rule""")),

    // E49: per-row violation tagging for the quarantine channel — the
    // dead-letter path at row granularity. The tag array replays as a
    // sorted list_filter over CASE tags.
    ("q139_expectations_tags", (s: SparkSession, d: String) => {
      import graft.operators.Expectations, Expectations.Expectation
      Expectations.withViolations(
          t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"), col("o_orderstatus")),
          Seq(
            Expectation("price_cap", col("o_totalprice") < 250000.0),
            Expectation("not_pending", col("o_orderstatus") =!= "P"),
            Expectation("not_medium",
              col("o_orderpriority") =!= "3-MEDIUM")))
        .select(col("o_orderkey"),
          array_join(col("_violations"), ",").as("violated"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, coalesce(array_to_string(list_sort(list_filter([
          CASE WHEN NOT coalesce(o_totalprice < 250000.0, true)
            THEN 'price_cap' END,
          CASE WHEN NOT coalesce(o_orderstatus <> 'P', true)
            THEN 'not_pending' END,
          CASE WHEN NOT coalesce(o_orderpriority <> '3-MEDIUM', true)
            THEN 'not_medium' END],
        x -> x IS NOT NULL)), ','), '') AS violated
      FROM orders ORDER BY o_orderkey"""))
    ,

    // E50: Okapi BM25 ranked retrieval (TfIdf.bm25) for a 3-term
    // query over the documents corpus. IDF quantized once per term,
    // per-(doc,term) addends are fixed-parenthesization IEEE doubles
    // quantized to DECIMAL(18,6), the per-doc fold is an exact decimal
    // sum — the oracle replays every step (binary-exact k1=1.5,
    // b=0.75 keep the SQL literals drift-free).
    ("q140_bm25_retrieval", (s: SparkSession, d: String) => {
      graft.operators.TfIdf.bm25(t(s, d, "documents"),
          col("text"), col("doc_id"), Seq("spark", "vector", "merge"))
        .select(col("id").as("doc_id"), col("bm25"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH w AS (SELECT doc_id,
        list_filter(string_split(trim(regexp_replace(regexp_replace(
          lower(text), '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')), ' '),
          x -> x <> '') AS ws
        FROM documents),
      d AS (SELECT doc_id, len(ws) AS dl FROM w),
      stats AS (SELECT count(*) AS n, sum(dl) AS s FROM d),
      toks AS (SELECT doc_id, unnest(ws) AS term FROM w),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
             WHERE term IN ('spark', 'vector', 'merge') GROUP BY 1, 2),
      dfreq AS (SELECT term,
        CAST(round(ln(1.0 + (n - count(*) + CAST(0.5 AS DOUBLE)) / (count(*) + 0.5)), 6)
          AS DECIMAL(18,6)) AS idf6
        FROM tf CROSS JOIN stats GROUP BY term, n),
      a AS (SELECT tf.doc_id,
        CAST(round(CAST(idf6 AS DOUBLE) *
          ((tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl /
            (CAST(s AS DOUBLE) / n)))), 6) AS DECIMAL(18,6)) AS addend
        FROM tf JOIN d USING (doc_id) JOIN dfreq USING (term)
        CROSS JOIN stats)
      SELECT doc_id, CAST(sum(addend) AS DOUBLE) AS bm25
      FROM a GROUP BY doc_id ORDER BY doc_id"""))
    ,

    // E51: Gopher line-duplication signals. Fixture: every doc_id%3==0
    // doc repeats its whole text as a second line (dup 0.5), %3==1
    // docs append a unique line (dup 0), %3==2 stay single-line. The
    // oracle replays the trimmed-nonempty-line list arithmetic.
    ("q141_repetition_signals", (s: SparkSession, d: String) => {
      val m3 = pmod(col("doc_id"), lit(3))
      val fixture = t(s, d, "documents").select(col("doc_id"),
        when(m3 === 0, concat(col("text"), lit("\n"), col("text")))
          .when(m3 === 1, concat(col("text"), lit("\nwholly unique closing line")))
          .otherwise(col("text")).as("text"))
      fixture.select(col("doc_id"),
          graft.operators.Repetition.signals(col("text")).as("s"))
        .select(col("doc_id"), col("s.dup_line_frac").as("dup_line_frac"),
          col("s.dup_line_char_frac").as("dup_line_char_frac"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH fx AS (SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || text
             WHEN doc_id % 3 = 1 THEN text || chr(10) || 'wholly unique closing line'
             ELSE text END AS text
        FROM documents),
      l AS (SELECT doc_id,
        list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
          x -> x <> '') AS lines
        FROM fx),
      m AS (SELECT doc_id, lines, list_distinct(lines) AS dlines FROM l),
      c AS (SELECT doc_id,
        CAST(len(lines) AS DOUBLE) AS nl, CAST(len(dlines) AS DOUBLE) AS dn,
        CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
          AS DOUBLE) AS tot,
        CAST(coalesce(list_sum(list_transform(dlines, x -> length(x))), 0)
          AS DOUBLE) AS dist
        FROM m)
      SELECT doc_id,
        CASE WHEN nl > 0 THEN round(1.0 - dn / nl, 4) ELSE 0.0 END
          AS dup_line_frac,
        CASE WHEN tot > 0 THEN round((tot - dist) / tot, 4) ELSE 0.0 END
          AS dup_line_char_frac
      FROM c ORDER BY doc_id""")),

    // E51: per-doc top-bigram character share (keyword-stuffing
    // signal). Winner ties break to the lexicographically greatest
    // shingle — pinned in both engines via the same two-key ordering.
    ("q142_top_bigram_share", (s: SparkSession, d: String) => {
      graft.operators.Repetition.topNgramCharShare(
          t(s, d, "documents"), col("text"), col("doc_id"), n = 2)
        .select(col("id").as("doc_id"), col("top_ngram"),
          col("occurrences"), col("char_share"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH norm AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 \t\n]', '', 'g'),
          '\s+', ' ', 'g')) AS t
        FROM documents),
      w AS (SELECT doc_id, length(t) AS chars,
        list_filter(string_split(t, ' '), x -> x <> '') AS ws
        FROM norm),
      sh AS (SELECT doc_id, chars,
        unnest(CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
          ELSE list_transform(generate_series(1, len(ws) - 1),
            i -> array_to_string(ws[i:i+1], ' ')) END) AS sh
        FROM w),
      cnt AS (SELECT doc_id, chars, sh, count(*) AS cnt
        FROM sh GROUP BY 1, 2, 3)
      SELECT doc_id, sh AS top_ngram, cnt AS occurrences,
        CASE WHEN chars > 0
          THEN round(cnt * length(sh) / CAST(chars AS DOUBLE), 4)
          ELSE 0.0 END AS char_share
      FROM cnt
      QUALIFY row_number() OVER (PARTITION BY doc_id
        ORDER BY cnt DESC, sh DESC) = 1
      ORDER BY doc_id"""))
    ,

    // E52: int8-quantized ANN scan (Similarity.quantizedTopK) — five
    // query vectors against the full embeddings corpus. The oracle
    // recomputes the symmetric max-abs quantization (scale =
    // max|v|/127, codes = round-half-away(v/scale)), the exact
    // integer code dot, and the (qdot × qscale) × cscale ranking with
    // the same tie-break. qdot is exact integer arithmetic; only the
    // rank (not the rescaled float) is emitted.
    ("q143_int8_ann", (s: SparkSession, d: String) => {
      val emb = s.read.parquet(s"$d/embeddings.parquet")
      val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 7)
      graft.operators.Similarity.quantizedTopK(
          queries, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("qdot"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some("""
      WITH cc AS (SELECT vec_id,
        CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
          / 127.0 AS scale,
        embedding FROM embeddings),
      codes AS (SELECT vec_id, scale,
        CASE WHEN scale = 0
          THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
          ELSE list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)) END AS c
        FROM cc),
      q AS (SELECT vec_id AS query_id, scale AS qs, c AS qc
        FROM codes WHERE vec_id % 100 = 7),
      p AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        CAST(list_sum(list_transform(generate_series(1, len(n.c)),
          i -> n.c[i] * q.qc[i])) AS BIGINT) AS qdot,
        q.qs, n.scale AS ns
        FROM codes n CROSS JOIN q WHERE n.vec_id <> q.query_id)
      SELECT query_id, neighbor_id, qdot,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY (CAST(qdot AS DOUBLE) * qs) * ns DESC, neighbor_id)
          AS INT) AS rank
      FROM p
      QUALIFY rank <= 5
      ORDER BY query_id, rank"""))
    ,

    // E53: shallow clone — a zero-copy table fork. Source committed
    // from key arithmetic, cloned, then the CLONE takes a merge
    // (%7==0 rows repriced) while the SOURCE takes a delete (%7==1
    // rows dropped). Reading both sides tagged into one result pins
    // the isolation: the clone shows the merge but not the delete,
    // the source shows the delete but not the merge. Oracle derives
    // both sides from the same arithmetic.
    ("q144_shallow_clone", (s: SparkSession, d: String) => {
      val src = java.nio.file.Files.createTempDirectory("graft_q144_src")
        .resolve("t").toString
      val dst = java.nio.file.Files.createTempDirectory("graft_q144_dst")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m7 = pmod(col("o_orderkey"), lit(7))
      graft.sinks.SnapshotStore.commit(s,
        orders.withColumn("rev", lit(1)), src, "o_orderstatus")
      graft.sinks.SnapshotStore.cloneTo(s, src, dst)
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 500.0)
          .withColumn("rev", lit(2)),
        dst, "o_orderkey", "rev", "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(m7 === 1).select(col("o_orderkey")),
        src, "o_orderkey", "o_orderstatus")
      val srcRead = graft.sinks.SnapshotStore.table(s, src)
        .withColumn("side", lit("source"))
      val dstRead = graft.sinks.SnapshotStore.table(s, dst)
        .withColumn("side", lit("clone"))
      srcRead.unionByName(dstRead)
        .select(col("side"), col("o_orderkey"), col("o_totalprice"), col("rev"))
        .orderBy(col("side"), col("o_orderkey"))
    }, Some("""
      SELECT 'source' AS side, o_orderkey, o_totalprice, 1 AS rev
      FROM orders WHERE o_orderkey % 7 <> 1
      UNION ALL
      SELECT 'clone', o_orderkey,
        CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 500.0
             ELSE o_totalprice END,
        CASE WHEN o_orderkey % 7 = 0 THEN 2 ELSE 1 END
      FROM orders
      ORDER BY side, o_orderkey"""))
    ,

    // E54: one-row corpus profile — counts, normalized vocabulary,
    // and EXACT type-1 token-count percentiles from the length
    // histogram (no sketch). The oracle forces DOUBLE in ceil(p×n) to
    // mirror Spark's driver-side double arithmetic exactly.
    ("q145_corpus_profile", (s: SparkSession, d: String) => {
      graft.operators.Stats.corpusProfile(t(s, d, "documents"), col("text"))
        .withColumn("k", lit(1)).orderBy(col("k")).drop("k")
    }, Some("""
      WITH lens AS (SELECT CAST(len(list_filter(string_split_regex(text, '\s+'),
          x -> x <> '')) AS BIGINT) AS l FROM documents),
      hist AS (SELECT l, count(*) AS c FROM lens GROUP BY 1),
      t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(l * c) AS BIGINT) AS tot FROM hist),
      cum AS (SELECT l, sum(c) OVER (ORDER BY l) AS cc FROM hist),
      norm AS (SELECT trim(regexp_replace(regexp_replace(lower(text),
          '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')) AS st FROM documents),
      voc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM
        (SELECT unnest(list_filter(string_split(st, ' '), x -> x <> ''))
          AS term FROM norm))
      SELECT t.n AS n_docs, t.tot AS total_tokens, voc.v AS vocab_size,
        CAST((SELECT min(l) FROM cum
          WHERE cc >= ceil(CAST(0.5 AS DOUBLE) * t.n)) AS BIGINT) AS p50_tokens,
        CAST((SELECT min(l) FROM cum
          WHERE cc >= ceil(CAST(0.9 AS DOUBLE) * t.n)) AS BIGINT) AS p90_tokens,
        CAST((SELECT min(l) FROM cum
          WHERE cc >= ceil(CAST(0.99 AS DOUBLE) * t.n)) AS BIGINT) AS p99_tokens
      FROM t, voc""")),

    // E55: Zipf-head term frequencies — top-15 normalized corpus
    // terms, ties lexicographic.
    ("q146_term_frequencies", (s: SparkSession, d: String) => {
      graft.operators.Stats.termFrequencies(
        t(s, d, "documents"), col("text"), k = 15)
    }, Some("""
      WITH norm AS (SELECT trim(regexp_replace(regexp_replace(lower(text),
          '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')) AS st FROM documents),
      toks AS (SELECT unnest(list_filter(string_split(st, ' '), x -> x <> ''))
        AS term FROM norm)
      SELECT term, count(*) AS occurrences FROM toks
      GROUP BY term ORDER BY occurrences DESC, term LIMIT 15""")),

    // E56: STREAMING change-feed consumption (format("graft-changes"),
    // the Delta-CDF-streaming / Mongo-change-stream analog). Four
    // commits — base, merge (update+insert), keyed delete, and a
    // layout-only compact — are replayed through readStream from
    // version 0; the memory sink must hold every CDC row tagged with
    // its emitting version, and the compact version must emit ZERO
    // rows (content diff, not file diff). The oracle rebuilds the
    // feed per version from key arithmetic.
    ("q147_stream_change_feed", (s: SparkSession, d: String) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q147").toString
      val root = s"$dir/t"
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(m5 =!= 4).withColumn("rev", lit(1)),
        root, "o_orderstatus")
      val incoming = orders.filter(m5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(m5 === 4))
        .withColumn("rev", lit(2))
      graft.sinks.SnapshotStore.mergeCommit(s, incoming, root,
        "o_orderkey", "rev", "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(m5 === 1).select(col("o_orderkey")),
        root, "o_orderkey", "o_orderstatus")
      graft.sinks.SnapshotStore.compact(s, root, "o_orderstatus")
      val q = s.readStream.format("graft-changes")
        .option("key", "o_orderkey")
        .option("startingVersion", "0")
        .load(root)
        .writeStream.format("memory").queryName("graft_q147_feed")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_q147_feed")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"), col("_change_type"),
          col("_commit_version"))
        .orderBy(col("o_orderkey"), col("_commit_version"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS rev,
        'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
      FROM orders WHERE o_orderkey % 5 <> 4
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0, 2,
        'update', CAST(2 AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, 2,
        'insert', CAST(2 AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 4
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice, 1,
        'delete', CAST(3 AS BIGINT)
      FROM orders WHERE o_orderkey % 5 = 1
      ORDER BY o_orderkey, _commit_version""")),

    // E48 SQL surface: the SAME commit → merge → delete → restore
    // sequence as q137, but the restore AND the audit view are driven
    // purely in SQL (`RESTORE TABLE … TO VERSION AS OF`, `DESCRIBE
    // HISTORY` — the GraftSqlParser statements Delta users type),
    // through a path-addressed GraftCatalog. Oracle identical to
    // q137's: the SQL surface must be indistinguishable from the API.
    ("q148_sql_restore_history", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q148_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(m5 =!= 4).withColumn("rev", lit(1)),
        root, "o_orderstatus")
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m5 === 4).withColumn("rev", lit(2)), root,
        "o_orderkey", "rev", "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(m5 === 1).select(col("o_orderkey")), root,
        "o_orderkey", "o_orderstatus")
      s.conf.set("spark.sql.catalog.graft_q148",
        classOf[graft.sinks.GraftCatalog].getName)
      val restored = s.sql(
        s"RESTORE TABLE graft_q148.`$root` TO VERSION AS OF 1")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      require(restored == Seq((1L, 4L)),
        s"SQL restore returned $restored, expected (1,4)")
      s.sql(s"DESCRIBE HISTORY graft_q148.`$root`")
        .select(col("version"), col("operation"),
          col("n_partitions"), col("total_rows"))
        .orderBy(col("version"))
    }, Some("""
      SELECT CAST(1 AS BIGINT) AS version, 'commit' AS operation,
        (SELECT count(DISTINCT o_orderstatus) FROM orders
          WHERE o_orderkey % 5 <> 4) AS n_partitions,
        (SELECT count(*) FROM orders WHERE o_orderkey % 5 <> 4) AS total_rows
      UNION ALL SELECT 2, 'merge',
        (SELECT count(DISTINCT o_orderstatus) FROM orders),
        (SELECT count(*) FROM orders)
      UNION ALL SELECT 3, 'delete',
        (SELECT count(DISTINCT o_orderstatus) FROM orders
          WHERE o_orderkey % 5 <> 1),
        (SELECT count(*) FROM orders WHERE o_orderkey % 5 <> 1)
      UNION ALL SELECT 4, 'restore',
        (SELECT count(DISTINCT o_orderstatus) FROM orders
          WHERE o_orderkey % 5 <> 4),
        (SELECT count(*) FROM orders WHERE o_orderkey % 5 <> 4)
      ORDER BY version"""))
    ,

    // REAL pixel featurizer (ImageCodec.pixelFeatures — rasterized
    // color-histogram embedding, the retirement of the hash-stub
    // forward pass): each row becomes a flat-color image whose color
    // CLASS is doc_id % 5, in a container cycling png/bmp (both
    // lossless, so the histogram is exact and format-invariant) at
    // per-id sizes (the histogram normalizes size away); every
    // id%10==7 row is corrupt text bytes → null embedding. Clustering
    // through the LSH-bucketed near-dup join must pair EXACTLY the
    // same-color rows — the oracle derives every pair from the class
    // arithmetic alone.
    ("q149_pixel_features", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.{Multimodal, Similarity}
      val palette = Array(0x000000, 0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00)
      val media = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val content =
            if (id % 10 == 7) Option(text).getOrElse("").getBytes("UTF-8")
            else Multimodal.ImageCodec.encode(
              (8 + id % 16).toInt, (8 + (id * 3) % 16).toInt,
              palette((id % 5).toInt),
              if (id % 2 == 0) "png" else "bmp")
          (id, content)
        }).toDF("media_id", "content")
      val feats = Multimodal.extractFeatures(media, bins = 4).toDF()
      val vecs = feats.filter(col("embedding").isNotNull)
        .select(col("media_id").as("id"), col("embedding").as("vec"))
      Similarity.nearDupPairs(vecs, "id", "vec", threshold = 0.999)
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some("""
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, 1.0 AS cosine
      FROM documents l JOIN documents r
        ON l.doc_id < r.doc_id AND l.doc_id % 5 = r.doc_id % 5
      WHERE l.doc_id < 60 AND r.doc_id < 60
        AND l.doc_id % 10 <> 7 AND r.doc_id % 10 <> 7
      ORDER BY id_a, id_b""")),

    // MP3 frame-header decode (Mp3Codec — the q124 pattern for the
    // container audio corpora actually hold): CBR fixtures at
    // id-arithmetic rates/channels/frame counts, every 3rd row behind
    // an ID3v2 tag that must be skipped by syncsafe size, id%10==7
    // rows corrupt. The oracle recomputes version, channel count,
    // rate, frame count, and floored duration from the arithmetic.
    ("q150_mp3_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val content =
            if (id % 10 == 7) Option(text).getOrElse("").getBytes("UTF-8")
            else {
              val rate = (id % 3).toInt match {
                case 0 => 44100; case 1 => 48000; case _ => 32000
              }
              Multimodal.Mp3Codec.encode(rate, (1 + id % 2).toInt,
                (20 + (id * 11) % 40).toInt,
                id3Payload = if (id % 3 == 0) (100 + id * 7 % 200).toInt else 0)
            }
          (id, content)
        }).toDF("media_id", "content")
      Multimodal.decodeMp3Meta(media)
        .select(col("media_id"), col("version"), col("channels"),
          col("sample_rate"), col("bitrate_kbps"), col("n_frames"),
          col("duration_ms"))
        .orderBy(col("media_id"))
    }, Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 10 = 7 THEN NULL ELSE 'mpeg1' END AS version,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(1 + doc_id % 2 AS INT) END AS channels,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             WHEN doc_id % 3 = 0 THEN CAST(44100 AS INT)
             WHEN doc_id % 3 = 1 THEN CAST(48000 AS INT)
             ELSE CAST(32000 AS INT) END AS sample_rate,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(128 AS INT) END AS bitrate_kbps,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(20 + (doc_id * 11) % 40 AS BIGINT) END AS n_frames,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             WHEN doc_id % 3 = 0
               THEN CAST((20 + (doc_id * 11) % 40) * 1152 * 1000 // 44100 AS BIGINT)
             WHEN doc_id % 3 = 1
               THEN CAST((20 + (doc_id * 11) % 40) * 1152 * 1000 // 48000 AS BIGINT)
             ELSE CAST((20 + (doc_id * 11) % 40) * 1152 * 1000 // 32000 AS BIGINT)
             END AS duration_ms
      FROM documents WHERE doc_id < 60 ORDER BY media_id""")),

    // MP4 box-walk decode (Mp4Codec — ISO BMFF structure, the video
    // metadata pass): fixtures with id-arithmetic timescale/duration
    // and 16.16 track dims, every id%4==1 row audio-only-shaped (zero
    // dims → null width/height), id%10==7 corrupt. Oracle recomputes
    // the floored millisecond duration and dims from the arithmetic.
    ("q151_mp4_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val content =
            if (id % 10 == 7) Option(text).getOrElse("").getBytes("UTF-8")
            else {
              val ts = (600 + (id % 4) * 300).toInt
              val dur = 1000L + (id * 97) % 5000
              if (id % 4 == 1) Multimodal.Mp4Codec.encode(ts, dur, 0, 0)
              else Multimodal.Mp4Codec.encode(ts, dur,
                (320 + (id % 8) * 16).toInt, (180 + (id % 6) * 30).toInt)
            }
          (id, content)
        }).toDF("media_id", "content")
      Multimodal.decodeMp4Meta(media)
        .select(col("media_id"), col("brand"), col("timescale"),
          col("duration_ms"), col("width"), col("height"))
        .orderBy(col("media_id"))
    }, Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 10 = 7 THEN NULL ELSE 'isom' END AS brand,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(600 + (doc_id % 4) * 300 AS BIGINT) END AS timescale,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST((1000 + (doc_id * 97) % 5000) * 1000
               // (600 + (doc_id % 4) * 300) AS BIGINT) END AS duration_ms,
        CASE WHEN doc_id % 10 = 7 OR doc_id % 4 = 1 THEN NULL
             ELSE CAST(320 + (doc_id % 8) * 16 AS INT) END AS width,
        CASE WHEN doc_id % 10 = 7 OR doc_id % 4 = 1 THEN NULL
             ELSE CAST(180 + (doc_id % 6) * 30 AS INT) END AS height
      FROM documents WHERE doc_id < 60 ORDER BY media_id""")),

    // E50 through the index (TextIndex.bm25ViaIndex — ranked search's
    // skipping-index analog): the q140 query scored while reading ONLY
    // candidate files; N/avgdl/df come from the index build's stats,
    // so the scores are IDENTICAL to full-scan BM25 — the oracle is
    // q140's verbatim. The pruned-scan property itself is spec-pinned
    // (TextIndexSpec counts input files).
    ("q152_bm25_via_index", (s: SparkSession, d: String) => {
      val idx = java.nio.file.Files.createTempDirectory("graft_q152_idx")
        .resolve("bm25idx").toString
      graft.operators.TextIndex.buildBm25Index(
        s, s"$d/documents.parquet", "text", idx)
      graft.operators.TextIndex.bm25ViaIndex(
          s, s"$d/documents.parquet", idx, "text", "doc_id",
          Seq("spark", "vector", "merge"))
        .select(col("id").as("doc_id"), col("bm25"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH w AS (SELECT doc_id,
        list_filter(string_split(trim(regexp_replace(regexp_replace(
          lower(text), '[^a-z0-9 \t\n]', '', 'g'), '\s+', ' ', 'g')), ' '),
          x -> x <> '') AS ws
        FROM documents),
      d AS (SELECT doc_id, len(ws) AS dl FROM w),
      stats AS (SELECT count(*) AS n, sum(dl) AS s FROM d),
      toks AS (SELECT doc_id, unnest(ws) AS term FROM w),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
             WHERE term IN ('spark', 'vector', 'merge') GROUP BY 1, 2),
      dfreq AS (SELECT term,
        CAST(round(ln(1.0 + (n - count(*) + CAST(0.5 AS DOUBLE)) / (count(*) + 0.5)), 6)
          AS DECIMAL(18,6)) AS idf6
        FROM tf CROSS JOIN stats GROUP BY term, n),
      a AS (SELECT tf.doc_id,
        CAST(round(CAST(idf6 AS DOUBLE) *
          ((tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl /
            (CAST(s AS DOUBLE) / n)))), 6) AS DECIMAL(18,6)) AS addend
        FROM tf JOIN d USING (doc_id) JOIN dfreq USING (term)
        CROSS JOIN stats)
      SELECT doc_id, CAST(sum(addend) AS DOUBLE) AS bm25
      FROM a GROUP BY doc_id ORDER BY doc_id""")),

    // E52 ∘ L9: quantized IVF (Similarity.ivfTopKQuantized — the faiss
    // IVFx,SQ8 shape). The oracle composes q63's cell/probe replay
    // with q143's int8 arithmetic: centroids are the first 16 vectors,
    // each vector joins its nearest cell, queries probe their 2
    // nearest cells, and scoring is the EXACT integer code dot
    // rescaled by both max-abs scales, neighbor-id tie-break.
    ("q153_ivf_quantized", (s: SparkSession, d: String) => {
      val e = s.read.parquet(s"$d/embeddings.parquet")
      graft.operators.Similarity.ivfTopKQuantized(e, "vec_id", "embedding",
          e.filter(col("vec_id") < 8).select(col("vec_id")), k = 5,
          numCells = 16, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("qdot"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some("""
      WITH cent AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        FROM embeddings ORDER BY vec_id LIMIT 16),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ranked AS (
        SELECT e.vec_id, cent.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY
            list_dot_product(e.v, cent.cv) /
              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))
            DESC, cent.cid ASC) AS rk
        FROM e CROSS JOIN cent),
      assigned AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1),
      probes AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk <= 2 AND vec_id < 8),
      cc AS (SELECT vec_id,
        CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
          / 127.0 AS scale,
        embedding FROM embeddings),
      codes AS (SELECT vec_id, scale,
        CASE WHEN scale = 0
          THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
          ELSE list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)) END AS c
        FROM cc),
      p AS (SELECT pr.vec_id AS query_id, a.vec_id AS neighbor_id,
        CAST(list_sum(list_transform(generate_series(1, len(n.c)),
          i -> n.c[i] * q.c[i])) AS BIGINT) AS qdot,
        q.scale AS qs, n.scale AS ns
        FROM probes pr
        JOIN assigned a ON a.cell = pr.cell AND a.vec_id <> pr.vec_id
        JOIN codes q ON q.vec_id = pr.vec_id
        JOIN codes n ON n.vec_id = a.vec_id)
      SELECT query_id, neighbor_id, qdot,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY (CAST(qdot AS DOUBLE) * qs) * ns DESC, neighbor_id)
          AS INT) AS rank
      FROM p
      QUALIFY rank <= 5
      ORDER BY query_id, rank""")),

    // WebP header decode (ImageCodec.webpDims — the pure-Scala RIFF
    // fallback behind decodeDims; the JDK has no WebP reader and real
    // web corpora are full of it). VP8L fixtures with 14-bit dims from
    // doc_id arithmetic, id%10==7 rows corrupt text bytes → nulls.
    ("q154_webp_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val content =
            if (id % 10 == 7) Option(text).getOrElse("").getBytes("UTF-8")
            else Multimodal.ImageCodec.encodeWebP(
              (16 + id % 1000).toInt, (16 + (id * 13) % 1000).toInt)
          (id, content)
        }).toDF("media_id", "content")
      Multimodal.decodeImageMeta(media)
        .select(col("media_id"), col("format"), col("width"), col("height"))
        .orderBy(col("media_id"))
    }, Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 10 = 7 THEN NULL ELSE 'webp' END AS format,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(16 + doc_id % 1000 AS INT) END AS width,
        CASE WHEN doc_id % 10 = 7 THEN NULL
             ELSE CAST(16 + (doc_id * 13) % 1000 AS INT) END AS height
      FROM documents WHERE doc_id < 60 ORDER BY media_id""")),

    // E57: OPTIMIZE driven purely in SQL — the partition column
    // resolves from the manifest's #partcol metadata header (recorded
    // by every commit path), so the statement needs only the table
    // name. The fixture writes orders spread over 4 tasks (multi-file
    // partitions), OPTIMIZE compacts to one file per partition, and
    // the read-back must be byte-identical to the source rows — the
    // oracle is a plain projection.
    ("q155_sql_optimize", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q155_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      graft.sinks.SnapshotStore.commit(s, orders.repartition(4),
        root, "o_orderstatus")
      val before = graft.sinks.SnapshotStore.manifest(s, root, 1)
        .groupBy(_.partition).map(_._2.size).max
      require(before > 1, s"fixture needs multi-file partitions, got max $before")
      s.conf.set("spark.sql.catalog.graft_q155",
        classOf[graft.sinks.GraftCatalog].getName)
      val r = s.sql(s"OPTIMIZE graft_q155.`$root`")
        .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
      require(r == Seq((root, 2L)), s"SQL optimize returned $r")
      val after = graft.sinks.SnapshotStore.manifest(s, root, 2)
        .groupBy(_.partition).map(_._2.size).max
      require(after == 1, s"expected 1 file per partition, got $after")
      graft.sinks.SnapshotStore.table(s, root)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders ORDER BY o_orderkey""")),

    // DataFrame WRITER surface (df.write.format("graft-snapshot") —
    // the Delta writer analog): base version written with the default
    // ErrorIfExists mode, then an Append that must behave as the K1
    // keyed merge (updates %5==0 rows, inserts the held-out %5==4
    // rows), read back through the plain reader. Oracle replays the
    // key arithmetic — identical semantics to the Scala mergeCommit
    // (q126's construction), now reached without any graft API call
    // on the write side.
    ("q156_dataframe_writer", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q156_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      orders.filter(m5 =!= 4).withColumn("rev", lit(1))
        .write.format("graft-snapshot")
        .option("partitionCol", "o_orderstatus").save(root)
      orders.filter(m5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(m5 === 4))
        .withColumn("rev", lit(2))
        .write.format("graft-snapshot")
        .option("partitionCol", "o_orderstatus")
        .option("key", "o_orderkey").option("versionCol", "rev")
        .mode("append").save(root)
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 5 IN (0, 4) THEN 2 ELSE 1 END AS rev
      FROM orders ORDER BY o_orderkey""")),

    // MERGE INTO SQL surface (GraftSqlParser → mergeCommitOrdered):
    // the reference's PRIMARY operator — the K1 bulk ReplaceOne upsert
    // (mongodb_loader.py:93-197) — in its standard SQL spelling. Base
    // version holds %5!=4 orders at rev 1; the MERGE source carries
    // %5 IN (0,4) rows at rev 2, so matched %5==0 rows are REPLACED
    // wholesale (price bumped, rev 2) and unmatched %5==4 rows insert.
    // Oracle replays the key arithmetic — same construction as q156,
    // now with zero graft API calls on the merge side.
    ("q157_sql_merge_into", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q157_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      orders.filter(m5 =!= 4).withColumn("rev", lit(1))
        .write.format("graft-snapshot")
        .option("partitionCol", "o_orderstatus").save(root)
      orders.filter(m5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .unionByName(orders.filter(m5 === 4))
        .withColumn("rev", lit(2))
        .createOrReplaceTempView("q157_updates")
      s.conf.set("spark.sql.catalog.graft_q157",
        classOf[graft.sinks.GraftCatalog].getName)
      val res = s.sql(
        s"MERGE INTO graft_q157.`$root` AS t USING q157_updates AS s " +
          "ON t.o_orderkey = s.o_orderkey " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(res == Seq((root, 2L)), s"SQL MERGE returned $res, expected v2")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 5 IN (0, 4) THEN 2 ELSE 1 END AS rev
      FROM orders ORDER BY o_orderkey""")),

    // TIMESTAMP AS OF time travel: commit wall-clock is recorded as
    // the #ts manifest header (monotonic-clamped), and a timestamp
    // resolves to the latest version committed at or before it. The
    // base version is read back AS OF its own commit timestamp through
    // the catalog's SQL `TIMESTAMP AS OF` hook, the tip AS OF a
    // far-future timestamp through the DataFrame option — both tagged
    // and unioned so the oracle derives each epoch's content from the
    // key arithmetic alone (wall-clock values never reach the output).
    ("q158_timestamp_as_of", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q158_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.filter(m5 =!= 4).withColumn("rev", lit(1)),
        root, "o_orderstatus")
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m5 === 4).withColumn("rev", lit(2)), root,
        "o_orderkey", "rev", "o_orderstatus")
      val ts1 = graft.sinks.SnapshotStore.commitTimestamp(s, root, 1L).get
      val ts2 = graft.sinks.SnapshotStore.commitTimestamp(s, root, 2L).get
      require(ts2 > ts1, s"commit timestamps must be monotonic: $ts1, $ts2")
      s.conf.set("spark.sql.catalog.graft_q158",
        classOf[graft.sinks.GraftCatalog].getName)
      val atV1 = s.sql(s"SELECT o_orderkey, rev FROM graft_q158.`$root` " +
        s"TIMESTAMP AS OF timestamp_millis($ts1)")
      val atTip = s.read.format("graft-snapshot")
        .option("timestampAsOf", (ts2 + 3600L * 1000).toString).load(root)
        .select(col("o_orderkey"), col("rev"))
      atV1.withColumn("as_of", lit(1))
        .unionByName(atTip.withColumn("as_of", lit(2)))
        .orderBy(col("as_of"), col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, 1 AS rev, 1 AS as_of FROM orders
      WHERE o_orderkey % 5 <> 4
      UNION ALL
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 5 = 4 THEN 2 ELSE 1 END, 2
      FROM orders
      ORDER BY as_of, o_orderkey""")),

    // Streaming WRITER surface (df.writeStream.format("graft-snapshot")
    // — the Delta streaming-sink analog): q103's exact micro-batch
    // sequence — including the re-delivered batch — through the format
    // registration instead of a hand-built foreachBatch, plus the
    // sink's marker-file batch log making the re-delivery a TRUE no-op
    // (version count pinned in-query). Oracle identical to q103's:
    // the format surface must be indistinguishable from the manual
    // writer.
    ("q159_stream_sink_format", (s: SparkSession, d: String) => {
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_q159").toString
      val root = s"$dir/store"
      val updates = t(s, d, "events").filter(col("user_id") < 50)
        .groupBy(concat(lit("sku_"), col("user_id")).as("sku"), col("ts"))
        .agg(max(col("value")).as("qty"))
        .select(col("sku"), col("qty"), col("ts"))
        .as[(String, Double, java.sql.Timestamp)]
        .collect()
      val batches = updates.groupBy(u => math.floorMod(u._3.getTime, 3L))
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Double, java.sql.Timestamp)]
      def start() = input.toDF().toDF("sku", "qty", "modified_at")
        .withColumn("part", lit("stock"))
        .writeStream.format("graft-snapshot")
        .outputMode("append")
        .option("key", "sku").option("versionCol", "modified_at")
        .option("partitionCol", "part")
        .option("checkpointLocation", s"$dir/ckpt")
        .start(root)
      val q = start()
      try {
        (0L to 2L).foreach { b =>
          input.addData(batches.getOrElse(b, Array.empty).toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      val committed = graft.sinks.SnapshotStore.versions(s, root)
      // Restart on the same checkpoint: the engine re-delivers the
      // last batch; the marker log must keep the version list frozen.
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      require(graft.sinks.SnapshotStore.versions(s, root) == committed,
        "re-delivered batch committed a new version through the sink")
      graft.sinks.SnapshotStore.read(s, root)
        .select(col("sku"), col("qty"), unix_micros(col("modified_at")).as("us"))
        .orderBy(col("sku"))
    }, Some("""
      WITH u AS (SELECT 'sku_' || user_id AS sku, ts, max(value) AS qty
                 FROM events WHERE user_id < 50 GROUP BY 1, 2),
      r AS (SELECT sku, qty, epoch_ns(ts) // 1000 AS us,
              row_number() OVER (PARTITION BY sku ORDER BY ts DESC) AS rn
            FROM u)
      SELECT sku, qty, us FROM r WHERE rn = 1 ORDER BY sku""")),

    // Incrementally MAINTAINED quantized-IVF index
    // (Similarity.appendIvfForSnapshotVersion / ivfProbeSnapshot — the
    // q110 text-index maintenance pattern applied to E60): embeddings
    // land in TWO snapshot commits (centroids trained once at first
    // ingest, the faiss discipline), each commit assigns+quantizes
    // ONLY its manifest-diff files; the probe intersects index rows
    // with the live manifest and must rank exactly like q153's
    // from-scratch pipeline (pinned in-query). The oracle recomputes
    // assignment/quantization/integer dots from list primitives, with
    // centroids = the FIRST-commit corpus's first 16 ids.
    ("q160_ivf_incremental", (s: SparkSession, d: String) => {
      import graft.operators.Similarity
      import graft.sinks.SnapshotStore
      val dir = java.nio.file.Files.createTempDirectory("graft_q160").toString
      val root = s"$dir/t"
      val idxPath = s"$dir/ivf_index"
      val e = s.read.parquet(s"$d/embeddings.parquet")
        .withColumn("pt", pmod(col("vec_id"), lit(4)).cast("string"))
      SnapshotStore.commit(s,
        e.filter(pmod(col("vec_id"), lit(3)) =!= 0), root, "pt")
      val cents = Similarity.ivfCentroids(
        SnapshotStore.read(s, root), "vec_id", "embedding", numCells = 16)
      Similarity.appendIvfForSnapshotVersion(
        s, root, 1L, "vec_id", "embedding", cents, idxPath)
      SnapshotStore.mergeCommit(s,
        e.filter(pmod(col("vec_id"), lit(3)) === 0), root,
        "vec_id", "vec_id", "pt")
      Similarity.appendIvfForSnapshotVersion(
        s, root, 2L, "vec_id", "embedding", cents, idxPath)
      val queries = SnapshotStore.read(s, root).filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding"))
      val viaIndex = Similarity.ivfProbeSnapshot(
        s, root, idxPath, cents, queries, "vec_id", "embedding",
        k = 5, nprobe = 2)
      val rebuilt = Similarity.ivfTopKQuantizedCodes(
        Similarity.ivfQuantizedIndex(
          SnapshotStore.read(s, root), "vec_id", "embedding", cents),
        cents, queries, "vec_id", "embedding", k = 5, nprobe = 2)
      val a = viaIndex.select("query_id", "neighbor_id", "qdot", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val b = rebuilt.select("query_id", "neighbor_id", "qdot", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      require(a == b, s"incremental probe diverged from rebuild: ${a.diff(b)} / ${b.diff(a)}")
      viaIndex.select(col("query_id"), col("neighbor_id"), col("qdot"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some("""
      WITH cent AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id % 3 <> 0 ORDER BY vec_id LIMIT 16),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ranked AS (
        SELECT e.vec_id, cent.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY
            list_dot_product(e.v, cent.cv) /
              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))
            DESC, cent.cid ASC) AS rk
        FROM e CROSS JOIN cent),
      assigned AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1),
      probes AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk <= 2 AND vec_id < 8),
      cc AS (SELECT vec_id,
        CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
          / 127.0 AS scale,
        embedding FROM embeddings),
      codes AS (SELECT vec_id, scale,
        CASE WHEN scale = 0
          THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
          ELSE list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)) END AS c
        FROM cc),
      p AS (SELECT pr.vec_id AS query_id, a.vec_id AS neighbor_id,
        CAST(list_sum(list_transform(generate_series(1, len(n.c)),
          i -> n.c[i] * q.c[i])) AS BIGINT) AS qdot,
        q.scale AS qs, n.scale AS ns
        FROM probes pr
        JOIN assigned a ON a.cell = pr.cell AND a.vec_id <> pr.vec_id
        JOIN codes q ON q.vec_id = pr.vec_id
        JOIN codes n ON n.vec_id = a.vec_id)
      SELECT query_id, neighbor_id, qdot,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY (CAST(qdot AS DOUBLE) * qs) * ns DESC, neighbor_id)
          AS INT) AS rank
      FROM p
      QUALIFY rank <= 5
      ORDER BY query_id, rank""")),

    // End-to-end MEDIA CORPUS capstone — the round-8 codec/featurizer
    // pieces composed the way a real multimodal ingest runs, in ONE
    // declarative plan: mixed png/bmp/webp/mp3/mp4/corrupt corpus →
    // header-only metadata per claimed modality → exact content dedup
    // (png fixtures repeat bytes across id%20 groups) → pixel-feature
    // near-dup clusters spanning CONTAINERS (png and bmp of one color
    // are distinct bytes but identical rasters) → width/duration
    // quality gate → atomic snapshot commit, read back. The oracle
    // derives every stage — formats, dims, durations, dedup winners,
    // cluster representatives, gate outcomes — from id arithmetic
    // alone; no hash or wall-clock reaches the output.
    ("q161_media_capstone", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.{Multimodal, Similarity}
      import graft.sinks.SnapshotStore
      val palette = Array(0x000000, 0xFF0000, 0x00FF00, 0x0000FF)
      val media = t(s, d, "documents").filter(col("doc_id") < 90)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val content: Array[Byte] =
            if (id % 9 == 7) s"corrupt_$id".getBytes("UTF-8")
            else (id % 5) match {
              case 0 => Multimodal.ImageCodec.encode(
                (8 + id % 20).toInt, 12, palette(((id % 20) / 5).toInt), "png")
              case 1 => Multimodal.ImageCodec.encode(
                (8 + id).toInt, 10, palette((id % 4).toInt), "bmp")
              case 2 => Multimodal.ImageCodec.encodeWebP(
                (16 + id).toInt, (16 + (id * 13) % 200).toInt)
              case 3 =>
                val rate = (id % 3) match {
                  case 0 => 44100; case 1 => 48000; case _ => 32000
                }
                Multimodal.Mp3Codec.encode(rate, (1 + id % 2).toInt,
                  (20 + (id * 11) % 40).toInt,
                  id3Payload = if (id % 3 == 0) 64 else 0)
              case _ =>
                val ts = (600 + (id % 4) * 300).toInt
                val dur = 1000L + (id * 97) % 5000
                if (id % 4 == 1) Multimodal.Mp4Codec.encode(ts, dur, 0, 0)
                else Multimodal.Mp4Codec.encode(ts, dur,
                  (320 + (id % 8) * 16).toInt, (180 + (id % 6) * 30).toInt)
            }
          val mtype = (id % 5) match {
            case 0 | 1 | 2 => "image"; case 3 => "audio"; case _ => "video"
          }
          (id, mtype, content)
        }).toDF("media_id", "media_type", "content")
      // Stage 1: header-only metadata, one decoder per claimed
      // modality (corrupt rows claim a type and fail decode → null fmt).
      val img = Multimodal.decodeImageMeta(
          media.filter(col("media_type") === "image")).toDF()
        .select(col("media_id"), col("format").as("fmt"),
          col("width"), col("height"),
          lit(null).cast("bigint").as("duration_ms"))
      val aud = Multimodal.decodeMp3Meta(
          media.filter(col("media_type") === "audio")).toDF()
        .select(col("media_id"),
          when(col("version").isNotNull, lit("mp3")).as("fmt"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          col("duration_ms"))
      val vid = Multimodal.decodeMp4Meta(
          media.filter(col("media_type") === "video")).toDF()
        .select(col("media_id"),
          when(col("brand").isNotNull, lit("mp4")).as("fmt"),
          col("width"), col("height"), col("duration_ms"))
      val meta = img.unionByName(aud).unionByName(vid)
      // Stage 2: exact content dedup over decodable rows.
      val withSha = media.join(meta, Seq("media_id"))
        .filter(col("fmt").isNotNull)
        .withColumn("sha", Multimodal.contentHash(col("content")))
      val keep = withSha.groupBy(col("sha")).agg(min(col("media_id")).as("keep_id"))
      val survivors = withSha.join(keep, Seq("sha"))
        .filter(col("media_id") === col("keep_id"))
      // Stage 3: near-dup clusters over rasterizable survivors —
      // cliques, so each row's representative is its smallest paired
      // neighbor (or itself for the clique minimum).
      val feats = Multimodal.extractFeatures(
          survivors.select(col("media_id"), col("content"))).toDF()
        .filter(col("embedding").isNotNull)
      val pairs = Similarity.nearDupPairs(
        feats, "media_id", "embedding", threshold = 0.999)
      val reps = feats.select(col("media_id").as("rep_of"))
        .join(pairs.groupBy(col("id_b")).agg(min(col("id_a")).as("min_a")),
          col("rep_of") === col("id_b"), "left")
        .select(col("rep_of"), coalesce(col("min_a"), col("rep_of")).as("near_rep"))
      // Stage 4: quality gate (min width for images, positive duration
      // for time media), then Stage 5: one atomic snapshot commit.
      val gated = survivors
        .join(reps, survivors("media_id") === reps("rep_of"), "left")
        .filter((col("width").isNull || col("width") >= 10) &&
          (col("duration_ms").isNull || col("duration_ms") > 0))
        .select(col("media_id"), col("media_type"), col("fmt"),
          col("width"), col("height"), col("duration_ms"), col("near_rep"))
      val root = java.nio.file.Files.createTempDirectory("graft_q161_store")
        .resolve("t").toString
      SnapshotStore.commit(s, gated, root, "media_type")
      SnapshotStore.read(s, root)
        .select(col("media_id"), col("fmt"), col("width"), col("height"),
          col("duration_ms"), col("near_rep"))
        .orderBy(col("media_id"))
    }, Some("""
      WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 90),
      surv AS (
        SELECT id FROM ids
        WHERE id % 9 <> 7 AND (id % 5 <> 0 OR id < 20)),
      feat AS (
        SELECT id,
          CASE WHEN id % 5 = 0 THEN (id % 20) // 5 ELSE id % 4 END AS cls
        FROM surv WHERE id % 5 IN (0, 1)),
      final AS (
        SELECT s.id,
          CASE s.id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
            WHEN 2 THEN 'webp' WHEN 3 THEN 'mp3' ELSE 'mp4' END AS fmt,
          CASE WHEN s.id % 5 = 0 THEN 8 + s.id % 20
               WHEN s.id % 5 = 1 THEN 8 + s.id
               WHEN s.id % 5 = 2 THEN 16 + s.id
               WHEN s.id % 5 = 4 AND s.id % 4 <> 1 THEN 320 + (s.id % 8) * 16
               ELSE NULL END AS width,
          CASE WHEN s.id % 5 = 0 THEN 12
               WHEN s.id % 5 = 1 THEN 10
               WHEN s.id % 5 = 2 THEN 16 + (s.id * 13) % 200
               WHEN s.id % 5 = 4 AND s.id % 4 <> 1 THEN 180 + (s.id % 6) * 30
               ELSE NULL END AS height,
          CASE WHEN s.id % 5 = 3 THEN
                 (20 + (s.id * 11) % 40) * 1152 * 1000 //
                   (CASE s.id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                     ELSE 32000 END)
               WHEN s.id % 5 = 4 THEN
                 (1000 + (s.id * 97) % 5000) * 1000 // (600 + (s.id % 4) * 300)
               ELSE NULL END AS duration_ms,
          (SELECT min(f2.id) FROM feat f2
            WHERE f2.cls = (SELECT f1.cls FROM feat f1 WHERE f1.id = s.id)
          ) AS near_rep
        FROM surv s)
      SELECT id AS media_id, fmt, CAST(width AS INT) AS width,
        CAST(height AS INT) AS height, CAST(duration_ms AS BIGINT) AS duration_ms,
        CAST(near_rep AS BIGINT) AS near_rep
      FROM final
      WHERE (width IS NULL OR width >= 10)
      ORDER BY media_id""")),

    // DELETE FROM SQL (GraftSqlParser → SnapshotStore.deleteWhere):
    // Delta's predicate DELETE — the SQL spelling of K4's retention
    // delete (mongodb_loader.py:218-231 delete_many). Rows where the
    // predicate is TRUE vanish; the rewrite is bounded to partitions
    // holding a match (probed through the file-skipping index). The
    // oracle keeps the complement of the predicate.
    ("q162_sql_delete", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q162_store")
        .resolve("t").toString
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.format("graft-snapshot")
        .option("partitionCol", "o_orderstatus").save(root)
      s.conf.set("spark.sql.catalog.graft_q162",
        classOf[graft.sinks.GraftCatalog].getName)
      val res = s.sql(s"DELETE FROM graft_q162.`$root` " +
        "WHERE o_orderkey % 7 = 3 AND o_totalprice < 150000.0")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(res == Seq((root, 2L)), s"SQL DELETE returned $res, expected v2")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE NOT (o_orderkey % 7 = 3 AND o_totalprice < 150000.0)
      ORDER BY o_orderkey""")),

    // UPDATE SQL (GraftSqlParser → SnapshotStore.updateWhere): Delta's
    // predicate UPDATE. Both assignments evaluate against the OLD row
    // (the price bump must not feed the tier derivation), values cast
    // back to the columns' existing types, and only partitions holding
    // a match rewrite. Oracle replays the CASE arithmetic.
    ("q163_sql_update", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q163_store")
        .resolve("t").toString
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("tier", lit(0))
        .write.format("graft-snapshot")
        .option("partitionCol", "o_orderstatus").save(root)
      s.conf.set("spark.sql.catalog.graft_q163",
        classOf[graft.sinks.GraftCatalog].getName)
      val res = s.sql(s"UPDATE graft_q163.`$root` " +
        "SET o_totalprice = o_totalprice + 5000.0, " +
        "tier = CASE WHEN o_totalprice >= 200000.0 THEN 2 ELSE 1 END " +
        "WHERE o_orderkey % 7 = 3")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(res == Seq((root, 2L)), s"SQL UPDATE returned $res, expected v2")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("tier"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 7 = 3 THEN o_totalprice + 5000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 7 <> 3 THEN 0
             WHEN o_totalprice >= 200000.0 THEN 2 ELSE 1 END AS tier
      FROM orders ORDER BY o_orderkey""")),

    // COPY INTO SQL (GraftSqlParser → SnapshotStore.copyInto) —
    // idempotent bulk file ingest, the retryable-scheduler contract:
    // each source file loads exactly once (the #copied manifest
    // ledger, atomic with its commit), a re-run with nothing new is a
    // no-op, and a late-arriving file loads alone. Three waves land
    // here with a VERIFIED no-op re-run between them; the oracle is
    // the plain union of all waves — any double-load doubles rows and
    // breaks the hash.
    ("q164_copy_into", (s: SparkSession, d: String) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q164").toString
      val root = s"$dir/t"
      val src = s"$dir/incoming"
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m3 = pmod(col("o_orderkey"), lit(3))
      orders.filter(m3 === 0).write.parquet(s"$src/wave1")
      orders.filter(m3 === 1).write.parquet(s"$src/wave2")
      val (v1, n1) = graft.sinks.SnapshotStore.copyInto(s, root, src,
        partitionCol = Some("o_orderstatus"))
      require(v1 == 1L && n1 > 0, s"first COPY: v$v1, $n1 files")
      s.conf.set("spark.sql.catalog.graft_q164",
        classOf[graft.sinks.GraftCatalog].getName)
      val rerun = s.sql(s"COPY INTO graft_q164.`$root` FROM '$src' " +
        "FILEFORMAT = PARQUET").collect().head
      require(rerun.getLong(1) == 1L && rerun.getLong(2) == 0L,
        s"re-run must be a no-op, got v${rerun.getLong(1)}/${rerun.getLong(2)} files")
      orders.filter(m3 === 2).write.parquet(s"$src/wave3")
      val third = s.sql(s"COPY INTO graft_q164.`$root` FROM '$src' " +
        "FILEFORMAT = PARQUET").collect().head
      require(third.getLong(1) == 2L && third.getLong(2) > 0L,
        s"late wave must load alone, got v${third.getLong(1)}")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      ORDER BY o_orderkey""")),

    // Schema evolution on merge (Delta's mergeSchema, the reference's
    // Pydantic-defaulting analog — unified_product_schema.py:145-207):
    // a merge batch carrying a NEW column widens the table; carried
    // old-schema files read the column as typed nulls (footer-merged
    // scan), rewritten partitions hold real values for merged rows and
    // nulls for carried-over rows. The oracle derives both from key
    // arithmetic.
    ("q165_schema_evolution", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q165_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.withColumn("rev", lit(1)), root, "o_orderstatus")
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m5 === 0).withColumn("rev", lit(2))
          .withColumn("o_flag", pmod(col("o_orderkey"), lit(3)).cast("int")),
        root, "o_orderkey", "rev", "o_orderstatus")
      val cur = graft.sinks.SnapshotStore.read(s, root)
      require(cur.columns.contains("o_flag"),
        "merge must have widened the schema with o_flag")
      cur.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"), col("o_flag"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice,
        CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS rev,
        CASE WHEN o_orderkey % 5 = 0
          THEN CAST(o_orderkey % 3 AS INT) END AS o_flag
      FROM orders ORDER BY o_orderkey""")),

    // SemDeDup (Abbas et al. 2023): embedding-space semantic dedup —
    // IVF-cell clustering bounds the quadratic pairwise comparison,
    // then greedy keep-first suppresses rows with a lower-id same-cell
    // neighbor above the cosine threshold. The oracle recomputes the
    // centroid assignment (q153's replay), every within-cell pair
    // cosine, and the min-id suppressor.
    ("q166_sem_dedup", (s: SparkSession, d: String) => {
      Similarity.semDedup(t(s, d, "embeddings"), "vec_id", "embedding",
          numCells = 16, threshold = 0.35)
        .orderBy(col("id"))
    }, Some("""
      WITH cent AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        FROM embeddings ORDER BY vec_id LIMIT 16),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ranked AS (
        SELECT e.vec_id, cent.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY
            list_dot_product(e.v, cent.cv) /
              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))
            DESC, cent.cid ASC) AS rk
        FROM e CROSS JOIN cent),
      assigned AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1),
      sup AS (
        SELECT a.vec_id AS id, min(b.vec_id) AS dup_of
        FROM assigned a
        JOIN assigned b ON a.cell = b.cell AND b.vec_id < a.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_dot_product(ea.v, eb.v) /
          (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) >= 0.35
        GROUP BY a.vec_id)
      SELECT a.vec_id AS id, a.cell, s.dup_of, s.dup_of IS NULL AS kept
      FROM assigned a LEFT JOIN sup s ON s.id = a.vec_id
      ORDER BY id""")),

    // Cross-document duplicated-span profile (Lee et al. 2022's
    // ExactSubstr signal as a per-document statistic): 5-token sliding
    // windows, a position is duplicated when its span occurs in ≥2
    // DISTINCT documents (the C4 cross-doc convention). Oracle stages
    // tokens/shingles exactly like q99 and replays the counts.
    ("q167_dup_spans", (s: SparkSession, d: String) => {
      Dedup.dupSpanStats(t(s, d, "documents"), col("text"), col("doc_id"),
          width = 5)
        .orderBy(col("id"))
    }, Some("""
      WITH nm AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
      sh AS (SELECT doc_id,
        CASE WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 4),
                    i -> array_to_string(ws[i:i+4], ' ')) END AS sh FROM nm),
      sp AS (SELECT doc_id, unnest(sh) AS span FROM sh),
      freq AS (SELECT span, count(DISTINCT doc_id) AS n FROM sp GROUP BY span),
      per AS (SELECT s.doc_id, count(*) AS n_spans,
          sum(CASE WHEN f.n >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM sp s JOIN freq f ON f.span = s.span
        GROUP BY s.doc_id)
      SELECT doc_id AS id, CAST(n_spans AS BIGINT) AS n_spans,
        CAST(n_dup AS BIGINT) AS n_dup_spans,
        CAST(n_dup AS DOUBLE) / n_spans AS dup_span_ratio
      FROM per ORDER BY id""")),

    // CHECK-constraint lifecycle (Delta's ALTER TABLE … ADD CONSTRAINT):
    // add (metadata-only commit) → valid merge lands → VIOLATING merge
    // fails loudly and publishes NOTHING (version pinned in-query) →
    // drop → the same batch now lands. The oracle derives the final
    // table from the arithmetic of the two merges that succeeded —
    // enforcement is proven by the %7-batch only appearing with its
    // post-drop values.
    ("q168_sql_constraints", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q168_store")
        .resolve("t").toString
      val orders = t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      val m7 = pmod(col("o_orderkey"), lit(7))
      graft.sinks.SnapshotStore.commit(s,
        orders.withColumn("rev", lit(1)), root, "o_orderstatus")
      s.conf.set("spark.sql.catalog.graft_q168",
        classOf[graft.sinks.GraftCatalog].getName)
      val added = s.sql(s"ALTER TABLE graft_q168.`$root` ADD CONSTRAINT " +
        "price_pos CHECK (o_totalprice > 0)").collect()
      require(added.head.getLong(1) == 2L, "ADD CONSTRAINT must publish v2")
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("rev", lit(2)),
        root, "o_orderkey", "rev", "o_orderstatus")
      val doomed = orders.filter(m7 === 3)
        .withColumn("o_totalprice", lit(-5.0)).withColumn("rev", lit(3))
      val failed = try {
        graft.sinks.SnapshotStore.mergeCommit(s, doomed, root,
          "o_orderkey", "rev", "o_orderstatus"); false
      } catch { case e: IllegalStateException =>
        e.getMessage.contains("price_pos") }
      require(failed, "violating merge must fail naming the constraint")
      require(graft.sinks.SnapshotStore.currentVersion(s, root).contains(3L),
        "failed merge must publish nothing")
      s.sql(s"ALTER TABLE graft_q168.`$root` DROP CONSTRAINT price_pos")
      graft.sinks.SnapshotStore.mergeCommit(s, doomed, root,
        "o_orderkey", "rev", "o_orderstatus")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 7 = 3 THEN -5.0
             WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 7 = 3 THEN 3
             WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS rev
      FROM orders ORDER BY o_orderkey""")),

    // Partition-scoped OPTIMIZE (Delta's `OPTIMIZE t WHERE p`): only
    // partitions matching the predicate compact; the rest carry their
    // files byte-identically (pinned in-query on the manifest). The
    // oracle is content equality — a layout operation must never
    // change a row.
    ("q169_sql_optimize_where", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q169_store")
        .resolve("t").toString
      graft.sinks.SnapshotStore.commit(s,
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .repartition(3),
        root, "o_orderstatus")
      val before = graft.sinks.SnapshotStore.manifest(s, root, 1L)
      require(before.count(_.partition == "F") > 1 &&
        before.count(_.partition == "O") > 1,
        "fixture needs multi-file partitions")
      s.conf.set("spark.sql.catalog.graft_q169",
        classOf[graft.sinks.GraftCatalog].getName)
      s.sql(s"OPTIMIZE graft_q169.`$root` WHERE o_orderstatus = 'F'")
      val after = graft.sinks.SnapshotStore.manifest(s, root, 2L)
      require(after.count(_.partition == "F") == 1,
        "matched partition must compact to one file")
      require(after.filter(_.partition == "O").toSet ==
        before.filter(_.partition == "O").toSet,
        "unmatched partitions must carry byte-identically")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      ORDER BY o_orderkey""")),

    // DESCRIBE DETAIL (Delta's one-row table summary) — the
    // deterministic fields (format, partition column, version,
    // partition count, constraints in force) oracled; file counts and
    // byte sizes are environment-shaped and pinned by spec instead.
    ("q170_describe_detail", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q170_store")
        .resolve("t").toString
      graft.sinks.SnapshotStore.commit(s,
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
        root, "o_orderstatus")
      graft.sinks.SnapshotStore.addConstraint(s, root,
        "price_pos", "o_totalprice > 0")
      s.conf.set("spark.sql.catalog.graft_q170",
        classOf[graft.sinks.GraftCatalog].getName)
      s.sql(s"DESCRIBE DETAIL graft_q170.`$root`")
        .select(col("format"), col("partition_column"), col("version"),
          col("num_partitions"),
          concat_ws("|", col("constraints")).as("constraints_list"))
    }, Some("""
      SELECT 'graft-snapshot' AS format,
        'o_orderstatus' AS partition_column,
        CAST(2 AS BIGINT) AS version,
        CAST(count(DISTINCT o_orderstatus) AS INT) AS num_partitions,
        'price_pos CHECK (o_totalprice > 0)' AS constraints_list
      FROM orders""")),

    // Deletion vectors (Delta's merge-on-read DELETE): with
    // graft.enableDeletionVectors set, SQL DELETE commits a position
    // list instead of rewriting files — REQUIRE-pinned in-query: after
    // TWO overlapping deletes the data file paths are IDENTICAL to v1
    // (zero rewrite) and both ops tag delete-dv. The hashed result
    // reads through the DV-applying catalog path; REORG … APPLY
    // (PURGE) then materializes, drops every DV, and must preserve the
    // row count. The oracle keeps the complement of the union of both
    // predicates.
    ("q171_deletion_vectors", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q171_store")
        .resolve("t").toString
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.format("graft-snapshot")
        .option("partitionCol", "o_orderstatus").save(root)
      s.conf.set("spark.sql.catalog.graft_q171",
        classOf[graft.sinks.GraftCatalog].getName)
      s.sql(s"ALTER TABLE graft_q171.`$root` SET TBLPROPERTIES " +
        "('graft.enableDeletionVectors' = 'true')")
      s.sql(s"DELETE FROM graft_q171.`$root` WHERE o_orderkey % 7 = 3")
      s.sql(s"DELETE FROM graft_q171.`$root` WHERE o_orderkey % 5 = 1")
      val st = graft.sinks.SnapshotStore
      val p1 = st.manifest(s, root, 1L).map(_.path).toSet
      val m4 = st.manifest(s, root, 4L)
      require(m4.map(_.path).toSet == p1,
        "DV deletes must not touch any data file")
      require(m4.exists(_.dv.nonEmpty), "v4 must carry deletion vectors")
      require(Seq(3L, 4L).forall(v =>
        st.manifestOperation(s, root, v).contains("delete-dv")),
        "both deletes must be merge-on-read commits")
      val live = s.sql("SELECT o_orderkey, o_orderstatus, o_totalprice " +
        s"FROM graft_q171.`$root`").orderBy(col("o_orderkey"))
      val n = live.count()
      s.sql(s"REORG TABLE graft_q171.`$root` APPLY (PURGE)")
      require(st.manifest(s, root, 5L).forall(_.dv.isEmpty),
        "REORG PURGE must drop every deletion vector")
      require(st.read(s, root).count() == n,
        "REORG PURGE must preserve live content")
      live
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE NOT (o_orderkey % 7 = 3) AND NOT (o_orderkey % 5 = 1)
      ORDER BY o_orderkey""")),

    // Table properties (Delta's TBLPROPERTIES): free-form metadata in
    // the manifest log, carried forward by every commit. SET / repeat
    // SET (overwrite one key, keep the rest) / UNSET, then SHOW
    // TBLPROPERTIES is the hashed result; a merge commit between the
    // ALTERs proves carry-forward, and the clone REQUIRE pins
    // property inheritance.
    ("q172_tblproperties", (s: SparkSession, d: String) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q172_store")
      val root = dir.resolve("t").toString
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val st = graft.sinks.SnapshotStore
      st.commit(s, orders, root, "o_orderstatus")
      s.conf.set("spark.sql.catalog.graft_q172",
        classOf[graft.sinks.GraftCatalog].getName)
      s.sql(s"ALTER TABLE graft_q172.`$root` SET TBLPROPERTIES " +
        "('owner' = 'data-eng', 'pipeline' = 'pim', 'retention.days' = '30')")
      // A data commit between the ALTERs: properties must ride along.
      st.mergeCommit(s, orders.limit(10), root,
        "o_orderkey", "o_totalprice", "o_orderstatus")
      s.sql(s"ALTER TABLE graft_q172.`$root` SET TBLPROPERTIES " +
        "('owner' = 'ml-platform')")
      s.sql(s"ALTER TABLE graft_q172.`$root` UNSET TBLPROPERTIES " +
        "('retention.days')")
      val clone = dir.resolve("c").toString
      st.cloneTo(s, root, clone)
      require(st.tablePropertiesMap(s, clone) ==
        Map("owner" -> "ml-platform", "pipeline" -> "pim"),
        "clone must inherit the final property set")
      s.sql(s"SHOW TBLPROPERTIES graft_q172.`$root`").orderBy(col("key"))
    }, Some("""
      SELECT * FROM (VALUES ('owner', 'ml-platform'), ('pipeline', 'pim'))
        AS t(key, value) ORDER BY key""")),

    // Streaming READ of a snapshot table (Delta streaming-source
    // analog, `readStream.format("graft-snapshot")`): three arrival
    // waves land as commit + appends with a COMPACTION between them;
    // the stream delivers every appended row exactly once while the
    // layout-only commit emits NOTHING — require-pinned via
    // maxVersionsPerTrigger=1 (each version is its own micro-batch, so
    // the batch-level row counts are observable: 3 data batches for 4
    // versions). The oracle is the plain union of the waves — a
    // re-emitted baseline or a compaction echo breaks the hash.
    ("q173_stream_snapshot_source", (s: SparkSession, d: String) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q173").toString
      val root = s"$dir/t"
      val st = graft.sinks.SnapshotStore
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m3 = pmod(col("o_orderkey"), lit(3))
      st.commit(s, orders.filter(m3 === 0), root, "o_orderstatus")      // v1
      st.appendCommit(s, orders.filter(m3 === 1), root, "o_orderstatus") // v2
      st.compact(s, root, "o_orderstatus")                               // v3: layout only
      st.appendCommit(s, orders.filter(m3 === 2), root, "o_orderstatus") // v4
      val q = s.readStream.format("graft-snapshot")
        .option("startingVersion", "0")
        .option("maxVersionsPerTrigger", "1")
        .load(root)
        .writeStream.format("memory").queryName("q173_sink")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches == 3,
        s"expected 3 data micro-batches (v1, v2, v4 — compaction silent), " +
          s"got $dataBatches")
      s.table("q173_sink")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      ORDER BY o_orderkey""")),

    // ExactSubstr REMOVAL (Lee et al. 2022 — the surgery half of
    // q167's signal): every token covered by a 5-token span occurring
    // in ≥2 DISTINCT documents is deleted; the cleaned text is the
    // surviving normalized tokens in order (empty when everything was
    // covered — short duplicated documents empty whole). The oracle
    // restages tokens/spans exactly like q167, derives the duplicated
    // START set, expands coverage windows, and rebuilds the text with
    // an ordered string_agg — any off-by-one in window coverage or
    // ordering breaks the hash.
    ("q174_remove_dup_spans", (s: SparkSession, d: String) => {
      Dedup.removeDupSpans(t(s, d, "documents"), col("text"), col("doc_id"),
          width = 5)
        .orderBy(col("id"))
    }, Some("""
      WITH nm AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
      sh AS (SELECT doc_id, len(ws) AS lw,
          CASE WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
               ELSE list_transform(generate_series(1, len(ws) - 4),
                      i -> array_to_string(ws[i:i+4], ' ')) END AS sh FROM nm),
      sp AS (SELECT doc_id, lw, u.s AS s, sh[u.s] AS span
             FROM sh, unnest(generate_series(1, len(sh))) AS u(s)),
      dupset AS (SELECT span FROM (SELECT span, count(DISTINCT doc_id) AS n
             FROM sp GROUP BY span) WHERE n >= 2),
      dup AS (SELECT sp.doc_id, sp.s, sp.lw FROM sp JOIN dupset d ON d.span = sp.span),
      covd AS (SELECT DISTINCT doc_id, u.p AS p
             FROM dup, unnest(generate_series(s, least(s + 4, lw))) AS u(p)),
      toks AS (SELECT doc_id, u.p AS p, ws[u.p] AS tok
             FROM nm, unnest(generate_series(1, len(ws))) AS u(p)),
      kept AS (SELECT t.doc_id, t.p, t.tok FROM toks t
             LEFT JOIN covd c ON c.doc_id = t.doc_id AND c.p = t.p
             WHERE c.p IS NULL),
      reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
             count(*) AS n_kept FROM kept GROUP BY doc_id)
      SELECT n.doc_id AS id, coalesce(r.clean_text, '') AS clean_text,
        CAST(len(n.ws) AS BIGINT) AS n_tokens,
        CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
      FROM nm n LEFT JOIN reb r ON r.doc_id = n.doc_id
      ORDER BY id""")),

    // Merge-on-read UPDATE (Delta's DV-backed UPDATE): q163's exact
    // assignment arithmetic replayed with graft.enableDeletionVectors
    // set — REQUIRE-pinned in-query: every original data file is
    // CARRIED (now deletion-vectored), the updated copies are new
    // files, and the op tags update-dv. Update cost ∝ matched rows.
    // The oracle is q163's, so the two UPDATE modes are pinned
    // result-identical.
    ("q175_sql_dv_update", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q175_store")
        .resolve("t").toString
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("tier", lit(0))
        .write.format("graft-snapshot")
        .option("partitionCol", "o_orderstatus").save(root)
      s.conf.set("spark.sql.catalog.graft_q175",
        classOf[graft.sinks.GraftCatalog].getName)
      s.sql(s"ALTER TABLE graft_q175.`$root` SET TBLPROPERTIES " +
        "('graft.enableDeletionVectors' = 'true')")
      s.sql(s"UPDATE graft_q175.`$root` " +
        "SET o_totalprice = o_totalprice + 5000.0, " +
        "tier = CASE WHEN o_totalprice >= 200000.0 THEN 2 ELSE 1 END " +
        "WHERE o_orderkey % 7 = 3")
      val st = graft.sinks.SnapshotStore
      val p1 = st.manifest(s, root, 1L).map(_.path).toSet
      val m3 = st.manifest(s, root, 3L)
      require(p1.subsetOf(m3.map(_.path).toSet),
        "DV update must carry every original data file")
      require(m3.map(_.path).toSet.size > p1.size,
        "DV update must append new files holding the updated copies")
      require(m3.exists(_.dv.nonEmpty), "DV update must attach vectors")
      require(st.manifestOperation(s, root, 3L).contains("update-dv"),
        "the commit must tag update-dv")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("tier"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 7 = 3 THEN o_totalprice + 5000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 7 <> 3 THEN 0
             WHEN o_totalprice >= 200000.0 THEN 2 ELSE 1 END AS tier
      FROM orders ORDER BY o_orderkey""")),

    // INSERT INTO SQL (the unkeyed append in its standard spelling,
    // routed to appendCommit): a VALUES insert and a SELECT insert
    // (with a positional string→int cast) land as new files while v1's
    // files carry by reference — REQUIRE-pinned. The oracle is the
    // union of the seed, the SELECT wave, and the VALUES literals.
    ("q176_sql_insert_into", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q176_store")
        .resolve("t").toString
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m3 = pmod(col("o_orderkey"), lit(3))
      graft.sinks.SnapshotStore.commit(s, orders.filter(m3 === 0),
        root, "o_orderstatus")
      s.conf.set("spark.sql.catalog.graft_q176",
        classOf[graft.sinks.GraftCatalog].getName)
      orders.filter(m3 =!= 0).createOrReplaceTempView("q176_rest")
      s.sql(s"INSERT INTO graft_q176.`$root` " +
        "SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS STRING) " +
        "FROM q176_rest")
      val out = s.sql(s"INSERT INTO graft_q176.`$root` " +
        "VALUES (9000001, 'Z', 1.5), (9000002, 'Z', 2.5)").collect()
      require(out.head.getLong(1) == 3L, "second INSERT must publish v3")
      val p1 = graft.sinks.SnapshotStore.manifest(s, root, 1L).map(_.path).toSet
      require(p1.subsetOf(graft.sinks.SnapshotStore.manifest(s, root, 3L)
        .map(_.path).toSet), "INSERT must carry prior files by reference")
      s.read.format("graft-snapshot").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      UNION ALL
      SELECT * FROM (VALUES (9000001, 'Z', 1.5), (9000002, 'Z', 2.5))
        AS t(o_orderkey, o_orderstatus, o_totalprice)
      ORDER BY o_orderkey""")),

    // Column mapping — Delta's name mode (ALTER TABLE … RENAME COLUMN
    // as pure metadata): the rename publishes a version whose file
    // paths are IDENTICAL to its parent (require-pinned — zero
    // rewrite; parquet keeps the original physical name forever), a
    // merge then lands under the NEW logical name, and the new files'
    // PHYSICAL schema still carries the original name (require-pinned
    // by a raw read). The hashed result reads through the catalog so
    // the mapping projection sits under real SQL.
    ("q177_rename_column", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q177_store")
        .resolve("t").toString
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      graft.sinks.SnapshotStore.commit(s,
        orders.withColumn("rev", lit(1)), root, "o_orderstatus")
      s.conf.set("spark.sql.catalog.graft_q177",
        classOf[graft.sinks.GraftCatalog].getName)
      val renamed = s.sql(s"ALTER TABLE graft_q177.`$root` " +
        "RENAME COLUMN o_totalprice TO price").collect()
      require(renamed.head.getLong(1) == 2L, "RENAME must publish v2")
      val p1 = graft.sinks.SnapshotStore.manifest(s, root, 1L).map(_.path).toSet
      require(graft.sinks.SnapshotStore.manifest(s, root, 2L)
        .map(_.path).toSet == p1, "RENAME must rewrite zero files")
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 1000.0).as("price"), lit(2).as("rev")),
        root, "o_orderkey", "rev", "o_orderstatus")
      val newFiles = graft.sinks.SnapshotStore.manifest(s, root, 3L)
        .map(_.path).filterNot(p1)
      require(newFiles.nonEmpty, "merge must write new files")
      val physCols = s.read.parquet(
        new org.apache.hadoop.fs.Path(root, newFiles.head).toString).columns.toSet
      require(physCols.contains("o_totalprice") && !physCols.contains("price"),
        "new files must carry the PHYSICAL column name")
      s.sql(s"SELECT o_orderkey, o_orderstatus, price, rev " +
        s"FROM graft_q177.`$root` ORDER BY o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS price,
        CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS rev
      FROM orders ORDER BY o_orderkey""")),

    // DROP COLUMN (metadata tombstone — files untouched, time travel
    // resurrects) + ADD COLUMN (metadata widening — carried files read
    // the new column as typed nulls), composed: drop c_acctbal, add a
    // note column, append a wave that POPULATES it. Require-pins: both
    // ALTERs rewrite zero files; version 1 still shows c_acctbal.
    ("q178_drop_add_column", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q178_store")
        .resolve("t").toString
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_name"),
          col("c_acctbal"))
      graft.sinks.SnapshotStore.commit(s, cust, root, "c_mktsegment")
      s.conf.set("spark.sql.catalog.graft_q178",
        classOf[graft.sinks.GraftCatalog].getName)
      s.sql(s"ALTER TABLE graft_q178.`$root` DROP COLUMN c_acctbal")
      s.sql(s"ALTER TABLE graft_q178.`$root` ADD COLUMN note STRING")
      val p1 = graft.sinks.SnapshotStore.manifest(s, root, 1L).map(_.path).toSet
      require(graft.sinks.SnapshotStore.manifest(s, root, 3L)
        .map(_.path).toSet == p1, "both ALTERs must rewrite zero files")
      require(graft.sinks.SnapshotStore.readVersion(s, root, 1L)
        .columns.contains("c_acctbal"), "time travel must resurrect the column")
      graft.sinks.SnapshotStore.appendCommit(s,
        cust.filter(pmod(col("c_custkey"), lit(4)) === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_mktsegment"), col("c_name"), lit("new").as("note")),
        root, "c_mktsegment")
      s.sql(s"SELECT c_custkey, c_mktsegment, c_name, note " +
        s"FROM graft_q178.`$root` ORDER BY c_custkey")
    }, Some("""
      SELECT c_custkey, c_mktsegment, c_name, CAST(NULL AS VARCHAR) AS note
      FROM customer
      UNION ALL
      SELECT c_custkey + 1000000, c_mktsegment, c_name, 'new' AS note
      FROM customer WHERE c_custkey % 4 = 0
      ORDER BY c_custkey""")),

    // CDC-driven replication (Replicate.mirror — Delta's CDF→MERGE
    // mirror pattern): initial full copy records the synced source
    // version ATOMICALLY with the rows, then a catch-up call replays
    // the change feed (keyed merge for inserts/updates, keyed delete
    // for deletes). Require-pins: catch-up applied version 3, the
    // replica's recorded sourceVersion tracks, and a THIRD call is a
    // replica-version no-op. The hashed result is the replica —
    // derived purely from the source arithmetic, so any
    // mis-application (double insert, missed delete, stale update)
    // breaks the hash.
    ("q179_cdc_mirror", (s: SparkSession, d: String) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q179_store")
      val src = s"$dir/src"; val dst = s"$dir/dst"
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val m5 = pmod(col("o_orderkey"), lit(5))
      val m7 = pmod(col("o_orderkey"), lit(7))
      graft.sinks.SnapshotStore.commit(s,
        orders.withColumn("rev", lit(1)), src, "o_orderstatus")
      graft.operators.Replicate.mirror(s, src, dst, "o_orderkey")
      // Source evolves: update the m5 slice, delete the m7=3 slice.
      graft.sinks.SnapshotStore.mergeCommit(s,
        orders.filter(m5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("rev", lit(2)),
        src, "o_orderkey", "rev", "o_orderstatus")
      graft.sinks.SnapshotStore.deleteCommit(s,
        orders.filter(m7 === 3).select(col("o_orderkey")),
        src, "o_orderkey", "o_orderstatus")
      val synced = graft.operators.Replicate.mirror(s, src, dst, "o_orderkey")
      require(synced == 3L, s"catch-up must reach source v3, got $synced")
      require(graft.sinks.SnapshotStore.tablePropertiesMap(s, dst)
        .get(graft.operators.Replicate.SourceVersionProp).contains("3"),
        "replica must record the synced source version")
      val dstV = graft.sinks.SnapshotStore.currentVersion(s, dst)
      require(graft.operators.Replicate.mirror(s, src, dst, "o_orderkey") == 3L
        && graft.sinks.SnapshotStore.currentVersion(s, dst) == dstV,
        "caught-up mirror must be a replica-version no-op")
      graft.sinks.SnapshotStore.read(s, dst)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("rev"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS rev
      FROM orders WHERE o_orderkey % 7 <> 3
      ORDER BY o_orderkey""")),

    // CTAS (`CREATE TABLE … PARTITIONED BY (c) AS SELECT …`): the
    // query commits as version 1 through the create-only primitive.
    // The result reads back through the catalog.
    ("q180_ctas", (s: SparkSession, d: String) => {
      val root = java.nio.file.Files.createTempDirectory("graft_q180_store")
        .resolve("t").toString
      s.conf.set("spark.sql.catalog.graft_q180",
        classOf[graft.sinks.GraftCatalog].getName)
      t(s, d, "orders").createOrReplaceTempView("q180_orders")
      val out = s.sql(s"CREATE TABLE graft_q180.`$root` " +
        "PARTITIONED BY (o_orderstatus) AS " +
        "SELECT o_orderkey, o_orderstatus, o_totalprice " +
        "FROM q180_orders WHERE o_orderkey % 3 = 0").collect()
      require(out.head.getLong(1) == 1L, "CTAS must publish v1")
      s.sql(s"SELECT o_orderkey, o_orderstatus, o_totalprice " +
        s"FROM graft_q180.`$root` ORDER BY o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 3 = 0 ORDER BY o_orderkey""")),

    // Index retrieval through the snapshot read boundary: a text-index
    // search against a table that took a merge-on-read DELETE must not
    // resurrect DV-deleted rows (the index's candidate files are
    // unchanged — only their deletion vectors know). REQUIRE-pins the
    // delete was DV-form (op tag, zero rewritten files); the oracle
    // recomputes the surviving matches from the predicate arithmetic.
    ("q181_dv_index_search", (s: SparkSession, d: String) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_q181_store")
      val root = s"$dir/t"; val idx = s"$dir/index"
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      graft.sinks.SnapshotStore.commit(s, docs, root, "lang")
      graft.operators.TextIndex.appendForSnapshotVersion(s, root, 1L, "text", idx)
      val v = graft.sinks.SnapshotStore.deleteWhereDv(s, root, "doc_id % 3 = 1")
      require(v == 2L, "DV delete must publish v2")
      require(graft.sinks.SnapshotStore.manifestOperation(s, root, 2L)
        .contains("delete-dv"), "delete must be merge-on-read")
      require(graft.sinks.SnapshotStore.manifest(s, root, 2L).map(_.path).toSet ==
        graft.sinks.SnapshotStore.manifest(s, root, 1L).map(_.path).toSet,
        "DV delete must rewrite zero files")
      graft.operators.TextIndex
        .searchWordInSnapshot(s, root, idx, "text", "dup")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, lang FROM documents
      WHERE doc_id % 3 <> 1 AND list_contains(string_split(trim(
        regexp_replace(regexp_replace(
          lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '), 'dup')
      ORDER BY doc_id"""))
  )

  /** Copy a JSONC capture with the first array under `key` blanked —
    * the X5 sparse-capture fixture (string-aware bracket scan; sample
    * data carries `]` inside strings and `//` comments). */
  private def sparseFixture(samplePath: String, key: String): String = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(samplePath))
    val m = ("\"" + java.util.regex.Pattern.quote(key) + "\"\\s*:\\s*\\[").r
      .findFirstMatchIn(text)
      .getOrElse(throw new IllegalArgumentException(s"no array under '$key'"))
    val open = m.end - 1
    var i = open; var depth = 0; var inStr = false; var esc = false; var close = -1
    while (close < 0 && i < text.length) {
      val c = text.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else if (c == '/' && i + 1 < text.length && text.charAt(i + 1) == '/') {
        // JSONC line comment: brackets inside it must not count.
        val nl = text.indexOf('\n', i)
        i = if (nl < 0) text.length - 1 else nl
      } else c match {
        case '"' => inStr = true
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    require(close > open, s"unbalanced array under '$key'")
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse_q")
    val out = dir.resolve("capture.jsonc")
    java.nio.file.Files.writeString(out,
      text.substring(0, open + 1) + text.substring(close))
    out.toString
  }

  def queries: Map[String, Q] = all.map { case (n, q, _) => n -> q }.toMap
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql.stripMargin.trim }.toMap
}
