package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.Syntax._

/** §2.1 relational/query core — the SortCL sort-transform-report surface
  * re-expressed as declarative DataFrame plans (reference:
  * /root/reference/src/main/java/SclScript.java:1 models typed fields +
  * per-field expressions + sorted/aggregated routing; here Catalyst owns
  * the physical plan).
  *
  * Oracle-parity rules (see SURVEY.md §5): exact decimal intermediates
  * cast to double only at the end; total-order ORDER BY mirrored in the
  * DuckDB SQL; identical aliases on both sides.
  *
  * Scale notes are on each query: dims are broadcast explicitly, fact
  * joins shuffle on their natural key, aggregations rely on partial
  * (map-side) aggregation.
  */
object Relational extends graft.QueryModule {

  /** Exact-money intermediate: parquet doubles carry 2dp values. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private val oneDec: Column = lit(1).cast(DecimalType(18, 2))
  /** Exact decimal sum surfaced as double (bitwise-stable both engines). */
  private def sumd(c: Column): Column = sum(dec(c)).cast("double")
  /** Exact average: exact decimal sum / exact count, divided as doubles. */
  private def avgd(c: Column): Column =
    sum(dec(c)).cast("double") / count(lit(1)).cast("double")

  private val SUMQ = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"
  private def sumSql(c: String) = SUMQ.format(c)
  private def avgSql(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1 shape: single scan, hash agg on 2 low-card keys. Partial
    * aggregation makes this shuffle O(groups), not O(rows) — holds at
    * 100 TB unchanged. */
  def q01(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        avgd(col("l_quantity")).as("avg_qty"),
        avgd(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .reportSort("l_returnflag", "l_linestatus")

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sumSql("l_quantity")} AS sum_qty,
       |  ${sumSql("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       |  ${avgSql("l_quantity")} AS avg_qty,
       |  ${avgSql("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Selective filter + projection; PlanSpec asserts PushedFilters +
    * pruned ReadSchema reach the parquet scan. */
  def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_size") < 15 && col("p_type") === "ECONOMY")
      .select("p_partkey", "p_name", "p_brand", "p_retailprice")
      .orderBy("p_partkey")

  val q02Sql: String =
    """SELECT p_partkey, p_name, p_brand, p_retailprice
      |FROM part WHERE p_size < 15 AND p_type = 'ECONOMY'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q03
  /** Q3 shape: customer⨝orders⨝lineitem. customer is the small side →
    * broadcast; orders⨝lineitem shuffles on orderkey (at 100 TB: bucket
    * both on orderkey to eliminate the shuffle). */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      // top-K over a corpus-proportional frame: orderBy+limit plans
      // TakeOrderedAndProject (O(k) per partition, no full sort and no
      // single-task coalesce) — reportSort here would serialize the
      // whole aggregation into one task (r12 ADVICE).
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** EXISTS semi-join: left_semi never duplicates/bloats the left side —
    * the safe formulation at scale (no distinct needed post-join). */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).filter(col("l_quantity") > 45)
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .reportSort("o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Q5 shape: 6-way star join. All dims broadcast (region/nation/
    * supplier/customer are ≤GBs even at 100 TB); only orders⨝lineitem
    * shuffles. */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .reportSort(desc("revenue"), col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Q6 shape: tight range scan → single partial-aggregated global sum.
    * All three predicates push to parquet (min/max row-group skipping). */
  def q06(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  val q06Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Window rank partitioned by nation: state is per-partition, scales
    * with executors; deterministic tie-break on custkey. */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .reportSort("c_nationkey", "rnk", "c_custkey")
  }

  val q07Sql: String =
    """SELECT c_nationkey, c_custkey, c_acctbal, CAST(rnk AS INTEGER) AS rnk
      |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
      |        RANK() OVER (PARTITION BY c_nationkey
      |                     ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |      FROM customer) t
      |WHERE rnk <= 3 ORDER BY c_nationkey, rnk, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q08
  /** lag/lead running analytics per user over event time. */
  def q08(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"),
        (col("value") - lag("value", 1).over(w)).as("delta"))
      .orderBy("user_id", "event_id")
  }

  val q08Sql: String =
    """SELECT user_id, event_id, value,
      |  value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Global top-k: Spark's TakeOrderedAndProject never materializes a
    * full sort — O(k) per partition + O(k·p) on the driver. */
  def q09(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  val q09Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- q10
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select("c_nationkey", "c_mktsegment").distinct()
      .reportSort("c_nationkey", "c_mktsegment")

  val q10Sql: String =
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Set ops: nations with customers AND suppliers, plus nations with no
    * customers at all. */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nk"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey").as("nk"))
    c.intersect(s).union(n.except(c)).distinct().reportSort("nk")
  }

  val q11Sql: String =
    """SELECT nk FROM (
      |  (SELECT c_nationkey AS nk FROM customer
      |   INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION
      |  (SELECT n_nationkey FROM nation
      |   EXCEPT SELECT c_nationkey FROM customer)) t
      |ORDER BY nk""".stripMargin

  // ---------------------------------------------------------------- q12
  /** ROLLUP over region→nation hierarchy (dims broadcast). Expressed
    * through the SQL surface: the Dataset rollup API trips Spark's
    * ambiguous-self-join detection on Expand-generated attributes; the
    * SQL path builds the identical Catalyst plan without the Dataset
    * plan-id metadata that confuses the check. */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    Tables.region(spark, dir).createOrReplaceTempView("graft_region")
    spark.sql(
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM graft_customer
        |JOIN graft_nation ON c_nationkey = n_nationkey
        |JOIN graft_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)
      // zero-exchange report tail (rows unique per rollup combo; asc
      // default = NULLS FIRST, matching the oracle's ORDER BY)
      .reportSort("r_name", "n_name")
  }

  val q12Sql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
       |  ${sumSql("c_acctbal")} AS total_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Q13 shape: left outer join + two-level aggregation. */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Pivot: conditional aggregation per event type (fixed pivot values —
    * never a driver-side distinct scan at 100 TB). */
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "purchase", "view"))
      .agg(sum(dec(col("value"))).cast("double"))
      .orderBy("user_id")

  val q14Sql: String =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Scalar subquery: global threshold computed once, broadcast into the
    * filter (no per-row recompute). */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val thr = c.agg(avgd(col("c_acctbal")).as("thr"))
    c.join(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  val q15Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal FROM customer
       |WHERE c_acctbal > (SELECT ${avgSql("c_acctbal")} FROM customer)
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** NOT EXISTS anti-join: left_anti keeps the probe side streaming. */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_no_orders"))
      .orderBy("c_nationkey")

  val q16Sql: String =
    """SELECT c_nationkey, COUNT(*) AS n_no_orders FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Q17 shape: per-part correlated threshold via a grouped build side
    * joined back (decorrelated by construction — the scalable plan). */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_brand") === "Brand#1")
      .select("p_partkey")
    val avgq = l.groupBy(col("l_partkey").as("t_partkey"))
      .agg(avgd(col("l_quantity")).as("avg_qty"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(avgq, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((sumd(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""WITH t AS (SELECT l_partkey AS t_partkey, ${avgSql("l_quantity")} AS avg_qty
       |           FROM lineitem GROUP BY l_partkey)
       |SELECT ${sumSql("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |JOIN t ON t_partkey = l_partkey
       |WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * avg_qty""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Q18 shape: HAVING on exact decimal sum, then join back to headers. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).as("sum_qty_dec"))
      .filter(col("sum_qty_dec") > 250)
      .select(col("l_orderkey"), col("sum_qty_dec").cast("double").as("sum_qty"))
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
      // corpus-proportional top-K: TakeOrderedAndProject, not reportSort
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(20)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM big JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Scalar-expression salad: case/string/date math — all codegen'd
    * builtins, no UDFs. */
  def q19(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 200000, "large")
          .when(col("o_totalprice") >= 50000, "mid")
          .otherwise("small").as("bucket"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat(upper(col("o_orderstatus")), lit("-"),
          expr("substr(o_orderpriority, 3)")).as("status_tag"),
        length(col("o_orderpriority")).as("prio_len"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_before_2002"))
      .orderBy("o_orderkey")

  val q19Sql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice >= 200000 THEN 'large'
      |       WHEN o_totalprice >= 50000 THEN 'mid'
      |       ELSE 'small' END AS bucket,
      |  CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
      |  CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
      |  SUBSTR(o_orderpriority, 1, 1) AS prio_code,
      |  UPPER(o_orderstatus) || '-' || SUBSTR(o_orderpriority, 3) AS status_tag,
      |  CAST(LENGTH(o_orderpriority) AS INTEGER) AS prio_len,
      |  CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_before_2002
      |FROM orders WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q20
  /** GROUPING SETS via the SQL surface (Spark SQL parser → same Catalyst
    * Expand as rollup/cube). */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("graft_nation")
    Tables.region(spark, dir).createOrReplaceTempView("graft_region")
    spark.sql(
      """SELECT r_name, n_name, COUNT(*) AS cnt
        |FROM graft_nation JOIN graft_region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())""".stripMargin)
      .reportSort("r_name", "n_name") // see q12
  }

  val q20Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS cnt
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (n_name), ())
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q21
  /** String-predicate scan: LIKE / prefix / contains — pushdown-friendly
    * StartsWith reaches the parquet scan; contains stays codegen'd. */
  def q21(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%bolt%") || col("p_name").startsWith("red"))
      .select(col("p_partkey"), col("p_name"),
        col("p_name").contains("red").as("is_red"),
        substring_index(col("p_name"), " ", 1).as("first_word"))
      .orderBy("p_partkey")

  val q21Sql: String =
    """SELECT p_partkey, p_name,
      |  contains(p_name, 'red') AS is_red,
      |  split_part(p_name, ' ', 1) AS first_word
      |FROM part
      |WHERE p_name LIKE '%bolt%' OR p_name LIKE 'red%'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q22
  /** IN-subquery (decorrelates to a semi-join on a filtered build). */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .join(broadcast(building), col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val q22Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_totalprice > 400000
      |  AND o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q23
  /** CUBE over two low-card dims (SQL surface; see q12 for why). */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM graft_orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)
      .reportSort("o_orderstatus", "o_orderpriority") // see q12
  }

  val q23Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Running (cumulative) aggregation over an ordered window frame —
    * exact decimal accumulation so the running values are
    * engine-identical at every row. */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    // adding the SUMMED column to the ordering makes the running sum
    // well-defined — rows tying on (linenumber, quantity) are
    // interchangeable without changing any prefix sum. (Caught by the
    // sf1 exactness gate: engines scan ties in different orders.)
    val w = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_quantity"))).over(w).cast("double").as("running_qty"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q24Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_qty,
      |  COUNT(*) OVER w AS running_n
      |FROM lineitem WHERE l_orderkey < 1000
      |WINDOW w AS (PARTITION BY l_orderkey
      |             ORDER BY l_linenumber, l_quantity
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --------------------------------------------------- q25_salted_join
  /** Skew-salted fact–dim join, driver-verified: identical results to
    * the plain join (salting is pure partitioning — the oracle runs
    * the unsalted SQL). The planned-ahead mitigation for known hot
    * keys at 100 TB; AQE covers the runtime-detected case. */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
        col("l_quantity"))
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand")
    Skew.saltedJoin(li, part, Seq("p_partkey"), col("l_orderkey"), 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
      .reportSort("p_brand")
  }

  val q25Sql: String =
    """SELECT p_brand, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ------------------------------------------------ q26_bucketed_join
  /** Bucketed co-located join, driver-verified: both fact tables are
    * written bucketed on the join key, so the join needs NO shuffle of
    * either side (ScaleSpec asserts the plan property; here the oracle
    * proves result-identity with the plain join). This is the 100 TB
    * co-location play: pay one bucketed write, then every keyed join
    * against the layout is exchange-free. The bucketed tables live in
    * a dedicated database with an explicit temp location, so the
    * session warehouse stays untouched. */
  def q26(spark: SparkSession, dir: String): DataFrame = {
    // The bucketed layout is a ONE-TIME cost amortized over every
    // subsequent keyed join (the whole point of bucketing at 100 TB) —
    // so the tables are written once per source dir and reused across
    // queries in the same session; the tag fingerprints the source
    // files, so different SFs never collide and regenerated data
    // invalidates the cached layout. Session-scoped, never cross-run
    // (see Tables.sessionLayoutRoot).
    val tag = Tables.layoutTag(dir)
    val liT = s"graft_buckets.li_b_$tag"
    val ordT = s"graft_buckets.ord_b_$tag"
    val dbLoc = s"${Tables.sessionLayoutRoot}/graft_buckets_$tag"
    if (!spark.catalog.databaseExists("graft_buckets"))
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$dbLoc'")
    // Within the session a completed bucketed write (the _SUCCESS
    // marker) is re-attached by DDL with the same bucket spec instead
    // of being rewritten — only the first consumer pays the write.
    def ensure(table: String, cols: String, bucketCol: String,
        write: => Unit): Unit =
      if (!spark.catalog.tableExists(table)) {
        val name = table.split('.').last
        if (new java.io.File(s"$dbLoc/$name/_SUCCESS").exists())
          spark.sql(
            s"""CREATE TABLE $table ($cols) USING parquet
               |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
               |INTO 8 BUCKETS LOCATION '$dbLoc/$name'""".stripMargin)
        else write
      }
    // explicit per-table path: the written location then always agrees
    // with the `_SUCCESS` probe above, even if the database LOCATION
    // was fixed by an earlier session with a different tag
    ensure(liT, "l_orderkey BIGINT, l_quantity DOUBLE", "l_orderkey",
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$dbLoc/li_b_$tag")
        .saveAsTable(liT))
    ensure(ordT, "o_orderkey BIGINT, o_orderstatus STRING", "o_orderkey",
      Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").option("path", s"$dbLoc/ord_b_$tag")
        .saveAsTable(ordT))
    spark.table(liT)
      .join(spark.table(ordT),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
      .reportSort("o_orderstatus")
  }

  val q26Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ------------------------------------------------ q27_percentiles
  /** Exact per-group order statistics (median + p90) — NOT
    * percentile_approx (a sketch) and NOT percentile_cont (whose
    * interpolation formula isn't pinned across engines). This is the
    * reference's report-style summary stat, exact and reproducible.
    *
    * Selection via VALUE HISTOGRAM, not per-row ranking: pass 1 is a
    * map-side-combining groupBy(group, value) count; pass 2 ranks the
    * k-th element inside the cumulative histogram — a window over
    * distinct (group, value) pairs only. A window partitioned by
    * l_returnflag over the raw rows would sort 100 TB/3 in one task;
    * the histogram shrinks that to |group|×|distinct values| rows
    * (l_quantity has a bounded integer domain — for a high-cardinality
    * value column you'd insert a value-bucketing pre-pass and resolve
    * the k-th element within its bucket, same two-pass idea).
    * The k-th SELECTED VALUE is tie-invariant: a histogram row covers
    * the rank range [lo, hi] of its duplicates. */
  def q27(spark: SparkSession, dir: String): DataFrame = {
    import OrderStats._
    val cum = cumulativeHistogram(
      Tables.lineitem(spark, dir).select("l_returnflag", "l_quantity"),
      Seq("l_returnflag"), "l_quantity")
    cum.groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
        // one histogram row holds both middle ranks (odd n, or even n
        // with equal middle values) → avg of that row = the value;
        // two rows → avg = their midpoint — same arithmetic as the
        // per-row rn ∈ {mid1, mid2} formulation
        avg(when(holdsRank(midRank1) || holdsRank(midRank2),
          col("l_quantity"))).as("median_qty"),
        max(when(holdsRank(rank90), col("l_quantity"))).as("p90_qty"))
      .reportSort("l_returnflag")
  }

  // --------------------------------------------------- q30_date_spine
  /** Lateral expansion onto a GENERATED sequence (the explode/unnest
    * surface): each order contributes a row to the month it was placed
    * in and the two following months — a date-spine densification,
    * the standard way to turn point-in-time facts into a
    * per-period activity ledger. `sequence` + `explode` is Spark's
    * lateral generator (DuckDB: unnest) — the expansion factor is a
    * constant 3, so the operator stays a linear map pass; the single
    * shuffle is the month agg. Decimal sums stay exact until the final
    * double cast. */
  def q30(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), dec(col("o_totalprice")).as("p"),
        trunc(to_date(col("o_orderdate")), "month").as("m0"))
      .select(col("p"), explode(sequence(lit(0), lit(2))).as("k"),
        col("m0"))
      .groupBy(add_months(col("m0"), col("k")).as("month"))
      .agg(count(lit(1)).as("n_open"),
        sum(col("p")).cast("double").as("open_value"))
      .reportSort("month")

  val q30Sql: String =
    """WITH m AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p,
      |    date_trunc('month', CAST(o_orderdate AS DATE)) AS m0
      |  FROM orders),
      |e AS (
      |  SELECT p, CAST(m0 + to_months(CAST(k AS INTEGER)) AS DATE)
      |    AS month
      |  FROM m CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) ks)
      |SELECT month, COUNT(*) AS n_open,
      |  CAST(SUM(p) AS DOUBLE) AS open_value
      |FROM e GROUP BY month ORDER BY month""".stripMargin

  // --------------------------------------------------- q31_kmv_distinct
  /** KMV (k-minimum-values) distinct-count sketch, per group — the
    * mergeable cardinality sketch behind theta sketches: hash every
    * value with the portable md5 hash, keep the k smallest distinct
    * hashes per group, estimate |D| ≈ (k−1)·2³²/h_k. Because the hash
    * is deterministic, the sketch itself is reproducible ANYWHERE —
    * the oracle rebuilds the identical sketch in DuckDB and the
    * estimate, the exact count, and the error all match to the bit
    * (an approximate operator with a FULL exact-compare oracle).
    *
    * Scale shape: the one shuffle is the (group, hash) distinct; the
    * per-group k-smallest runs as a WindowGroupLimit (rank ≤ k is
    * partially applied per map partition BEFORE the shuffle, so at
    * 100 TB each task forwards at most k hashes per group — the same
    * bounded-state property that makes the sketch mergeable across a
    * 1000-executor scan). Estimator math is all integer (exact).
    */
  def q31(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 128
    val d = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        graft.mask.MaskFunctions.portableHash(col("l_partkey")).as("h"))
      .distinct()
    val w = Window.partitionBy("l_returnflag").orderBy("h")
    val sk = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("l_returnflag")
      .agg(max(when(col("rn") === k, col("h"))).as("hk"),
        count(lit(1)).as("n_kept"))
    val exact = d.groupBy("l_returnflag")
      .agg(count(lit(1)).as("exact_distinct"))
    sk.join(exact, "l_returnflag")
      .select(col("l_returnflag"),
        when(col("n_kept") < k, col("exact_distinct"))
          .otherwise(expr(s"(${k - 1} * 4294967296) div hk"))
          .as("est_distinct"),
        col("exact_distinct"))
      .withColumn("err_pm",
        expr("abs(est_distinct - exact_distinct) * 1000 div exact_distinct"))
      .reportSort("l_returnflag")
  }

  val q31Sql: String =
    """WITH d AS (
      |  SELECT DISTINCT l_returnflag,
      |    ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, h,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      |  FROM d),
      |sk AS (
      |  SELECT l_returnflag, MAX(CASE WHEN rn = 128 THEN h END) AS hk,
      |    COUNT(*) AS n_kept
      |  FROM r WHERE rn <= 128 GROUP BY l_returnflag),
      |ex AS (
      |  SELECT l_returnflag, COUNT(*) AS exact_distinct FROM d
      |  GROUP BY l_returnflag)
      |SELECT sk.l_returnflag,
      |  CASE WHEN sk.n_kept < 128 THEN ex.exact_distinct
      |       ELSE (127 * 4294967296) // sk.hk END AS est_distinct,
      |  ex.exact_distinct,
      |  abs((CASE WHEN sk.n_kept < 128 THEN ex.exact_distinct
      |        ELSE (127 * 4294967296) // sk.hk END) - ex.exact_distinct)
      |    * 1000 // ex.exact_distinct AS err_pm
      |FROM sk JOIN ex ON sk.l_returnflag = ex.l_returnflag
      |ORDER BY sk.l_returnflag""".stripMargin

  // --------------------------------------------------- q32_window_suite
  /** The remaining ANSI window functions in one report: per-customer
    * order quartiles (ntile), position statistics (percent_rank,
    * cume_dist), and the customer's third-cheapest order key
    * (nth_value over the full frame). Partitioned by o_custkey — HIGH
    * cardinality, so the window parallelizes at any scale (the q27
    * lesson); customers with <4 orders are excluded so ntile(4) and
    * the (n−1) denominators are never degenerate (and DuckDB/Spark
    * single-row percent_rank edge semantics never enter). The ordering
    * key (o_totalprice, o_orderkey) is unique per partition, making
    * every function's output deterministic; the doubles are floored at
    * micro precision — identical IEEE division both engines — and
    * summed exactly as integers. */
  def q32(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy("o_custkey")
    val w = byCust.orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("n_orders", count(lit(1)).over(byCust))
      .filter(col("n_orders") >= 4)
      .select(
        ntile(4).over(w).cast("long").as("quartile"),
        floor(percent_rank().over(w) * 1000000).cast("long").as("pr_micro"),
        floor(cume_dist().over(w) * 1000000).cast("long").as("cd_micro"),
        nth_value(col("o_orderkey"), 3).over(full).as("third_key"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"),
        sum(col("pr_micro")).as("sum_pr_micro"),
        sum(col("cd_micro")).as("sum_cd_micro"),
        sum(col("third_key")).as("third_key_sum"))
      .reportSort("quartile")
  }

  val q32Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
      |  FROM orders),
      |w AS (
      |  SELECT
      |    NTILE(4) OVER win AS quartile,
      |    CAST(FLOOR(PERCENT_RANK() OVER win * 1000000) AS BIGINT)
      |      AS pr_micro,
      |    CAST(FLOOR(CUME_DIST() OVER win * 1000000) AS BIGINT)
      |      AS cd_micro,
      |    NTH_VALUE(o_orderkey, 3) OVER (
      |      PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |      AS third_key
      |  FROM o WHERE n_orders >= 4
      |  WINDOW win AS (PARTITION BY o_custkey
      |                 ORDER BY o_totalprice, o_orderkey))
      |SELECT quartile, COUNT(*) AS n,
      |  CAST(SUM(pr_micro) AS BIGINT) AS sum_pr_micro,
      |  CAST(SUM(cd_micro) AS BIGINT) AS sum_cd_micro,
      |  CAST(SUM(third_key) AS BIGINT) AS third_key_sum
      |FROM w GROUP BY quartile ORDER BY quartile""".stripMargin

  // ------------------------------------------------ q33_recursive_cte
  /** Recursive CTE (Spark 4's WITH RECURSIVE / UnionLoop): transitive
    * closure over a derived hierarchy — customer k's parent is k div 2
    * (a binary org-tree), and the recursion computes every node's
    * depth from the root. The per-level step is a JOIN against the
    * previous frontier, so Spark executes it as iterated joins with
    * the same distributed plan rules as any other join (the DuckDB
    * oracle runs the IDENTICAL recursive SQL). Depth histogram output
    * keeps it exact-integer. */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_customer")
    spark.sql(
      """WITH RECURSIVE tree(k, depth) AS (
        |  SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1
        |  FROM graft_customer c JOIN tree t ON c.c_custkey DIV 2 = t.k
        |  WHERE c.c_custkey > 1)
        |SELECT depth, COUNT(*) AS n, SUM(k) AS sum_k
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val q33Sql: String =
    """WITH RECURSIVE tree(k, depth) AS (
      |  SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
      |  UNION ALL
      |  SELECT c.c_custkey, t.depth + 1
      |  FROM customer c JOIN tree t ON c.c_custkey // 2 = t.k
      |  WHERE c.c_custkey > 1)
      |SELECT depth, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  // ------------------------------------------------ q34_heavy_hitters
  /** EXACT heavy hitters (frequency > n/100) by two-pass Misra–Gries —
    * the scale alternative to a full groupBy when the value domain is
    * huge but only heavy values matter: pass 1 runs a k-counter
    * Misra–Gries summary PER PARTITION (mapPartitions, O(k) memory —
    * its guarantee: every value with global frequency > n/k survives
    * in at least one partition's summary), pass 2 exactly counts ONLY
    * the ≤ partitions·(k−1) surviving candidates (broadcast hash
    * filter — the full-domain shuffle never happens) and keeps those
    * strictly above the threshold. The sketch can only ADD candidates,
    * never lose a heavy value, so the final output is EXACT — the
    * oracle is the plain GROUP BY ... HAVING, in pure integers. */
  def q34(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 100
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("v")).as[Long]
    val candidates = vals.mapPartitions { it =>
      val counters = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { v =>
        if (counters.contains(v)) counters(v) += 1L
        else if (counters.size < k - 1) counters(v) = 1L
        else {
          // decrement all; drop zeros (the classic MG step) — iterate
          // a key snapshot, never the live map being mutated
          counters.keys.toArray.foreach { key =>
            val c = counters(key)
            if (c == 1L) counters.remove(key) else counters(key) = c - 1L
          }
        }
      }
      counters.keysIterator
    }.distinct()
    val n = Tables.lineitem(spark, dir).count()
    Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("v"))
      .join(broadcast(candidates.toDF("v")), "v")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .reportSort("v")
  }

  val q34Sql: String =
    """SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS cnt
      |FROM lineitem GROUP BY 1
      |HAVING COUNT(*) * 100 > (SELECT COUNT(*) FROM lineitem)
      |ORDER BY v""".stripMargin

  // ------------------------------------------------ q35_forward_fill
  /** Gap-filling time series with the IGNORE NULLS window surface:
    * error events carry no measurement (value → NULL), and each user's
    * series forward-fills from the last observed value —
    * `last_value(... IGNORE NULLS)` over (user, time) — the standard
    * sensor/metric repair. Partitions are per-user (high cardinality);
    * the report is integer-exact: missing counts, unfillable (leading)
    * nulls, the id-checksum of filled rows, and the DISTINCT count of
    * fill values (bit-copied doubles compare exactly — no float
    * arithmetic crosses the oracle). */
  def q35(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "error", lit(null))
          .otherwise(col("value")).as("v"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("vf", last(col("v"), ignoreNulls = true).over(w))
      .groupBy("user_id")
      .agg(sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when(col("vf").isNull, 1L).otherwise(0L)).as("n_unfilled"),
        sum(when(col("v").isNull && col("vf").isNotNull, col("event_id"))
          .otherwise(0L)).as("fill_id_sum"),
        countDistinct(when(col("v").isNull, col("vf"))).as("n_fill_values"))
      .orderBy("user_id")
  }

  val q35Sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |  FROM events),
      |f AS (
      |  SELECT *, LAST_VALUE(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vf
      |  FROM ev)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing,
      |  CAST(SUM(CASE WHEN vf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unfilled,
      |  CAST(SUM(CASE WHEN v IS NULL AND vf IS NOT NULL THEN event_id
      |      ELSE 0 END) AS BIGINT) AS fill_id_sum,
      |  COUNT(DISTINCT CASE WHEN v IS NULL THEN vf END) AS n_fill_values
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------- q29_percentile_bucketed
  /** Exact median over a HIGH-cardinality value domain
    * (o_totalprice — effectively unique doubles, where q27's value
    * histogram would approach the row count): two-pass bucketed
    * selection ([[OrderStats.bucketedMedian]]) — range-bucket
    * histogram locates the middle ranks' buckets, then ONLY those
    * buckets' rows are ranked. The oracle proves exactness against
    * the plain sort-based definition. */
  def q29(spark: SparkSession, dir: String): DataFrame =
    OrderStats.bucketedMedian(
      Tables.orders(spark, dir).select("o_orderpriority", "o_totalprice"),
      Seq("o_orderpriority"), "o_totalprice")
      .reportSort("o_orderpriority")

  val q29Sql: String =
    """WITH r AS (
      |  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(o_totalprice AS DOUBLE)) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders)
      |SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
      |  AVG(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |      THEN v END) AS median_o_totalprice
      |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------ q28_range_frame
  /** Value-RANGE window frame: each order's rolling 30-day customer
    * spend — `RANGE BETWEEN 29 PRECEDING AND CURRENT ROW` over epoch
    * days, which unlike the q24 ROWS frame includes ALL peers in the
    * value range regardless of row count (both engines define RANGE
    * tie handling identically). Partitioned by o_custkey — high
    * cardinality, so per-partition sorts stay tiny at any scale. */
  def q28(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("d")
      .rangeBetween(-29, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_date(to_date(col("o_orderdate"))).as("d"),
        dec(col("o_totalprice")).as("p"))
      .withColumn("spend_30d", sum(col("p")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "spend_30d")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q28Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders)
      |SELECT o_custkey, o_orderkey,
      |  CAST(SUM(p) OVER (PARTITION BY o_custkey ORDER BY d
      |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS spend_30d
      |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin

  val q27Sql: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_quantity,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_quantity) AS BIGINT) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      |  FROM lineitem)
      |SELECT l_returnflag, MAX(cnt) AS n,
      |  AVG(CASE WHEN rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
      |      THEN l_quantity END) AS median_qty,
      |  MAX(CASE WHEN rn = CEIL(CAST(cnt AS DOUBLE) * 0.9)
      |      THEN l_quantity END) AS p90_qty
      |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------ q36_mad
  /** Median absolute deviation — the robust dispersion statistic a
    * profiler reports beside mean/stddev (immune to the exact outliers
    * `cls_outliers` fences off). Exact integers end to end: values
    * widen to cents through DECIMAL, both medians are the TYPE-1 lower
    * median (smallest value whose cumulative count reaches ⌈n/2⌉) by
    * [[OrderStats.cumulativeHistogramSharded]] selection (the
    * two-level cum decomposition — cents are near-unique, so the
    * histogram is corpus-sized and a group-only window would
    * single-task it), deviations are integer |x − med|.
    *
    * MAD is a composed statistic — the deviation selection needs the
    * value selection's median first — so both selections run as
    * [[OrderStats.radixLowerMedian]] radix passes (r9): cents are
    * near-unique, so the r8 full-value histogram approached the CORPUS
    * size and its (group, cents) exchange + two-level cumulative
    * windows dominated the wall time (12.9 s on the r8 driver bench).
    * The radix shape replaces that with four column-pruned scans whose
    * exchanges carry at most domain/2^12 bucket rows (pass 1) or 2^12
    * in-bucket values (pass 2) per group — bounded by the price DOMAIN
    * split, never the corpus, which is also the only shape whose
    * shuffles stay flat at 100 TB. */
  def q36(spark: SparkSession, dir: String): DataFrame = {
    import OrderStats._
    import org.apache.spark.sql.types.DecimalType
    val vals = Tables.lineitem(spark, dir).select(col("l_returnflag"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    // Materialize the 2-column projection ONCE (localCheckpoint — a
    // straight map, no exchange): both selection passes previously
    // re-read lineitem (each radix pass consumes its input twice —
    // bucket histogram + join-back — and the deviation frame
    // re-derived from the raw rows, ~5 scans total). A value-level
    // pre-agg was measured and rejected: cents are near-unique, so
    // the extra exchange cost more than the scans it saved.
    val cvals = vals.cut
    // med is consumed twice (deviation derivation + final join); it is
    // a |groups|-row frame, so materializing it costs nothing and
    // guarantees the selection passes run once (subtree reuse across
    // the two consumers is not reliable through the rank explode)
    val med = radixLowerMedian(cvals, Seq("l_returnflag"), "cents")
      .withColumnRenamed("median", "median_cents")
      .cut
    val dev = cvals
      .join(broadcast(med.select(col("l_returnflag"), col("median_cents"))),
        "l_returnflag")
      .select(col("l_returnflag"),
        abs(col("cents") - col("median_cents")).as("dev"))
    radixLowerMedian(dev, Seq("l_returnflag"), "dev")
      .select(col("l_returnflag"), col("median").as("mad_cents"))
      .join(med, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("median_cents"),
        col("mad_cents"))
      .reportSort("l_returnflag")
  }

  val q36Sql: String =
    """WITH v AS (
      |  SELECT l_returnflag AS g,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |h AS (SELECT g, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
      |ch AS (SELECT g, cents, c,
      |         CAST(SUM(c) OVER (PARTITION BY g ORDER BY cents)
      |           AS BIGINT) AS hi
      |       FROM h),
      |n AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY g),
      |med AS (
      |  SELECT ch.g, MAX(n.n) AS n,
      |    MIN(CASE WHEN hi - c + 1 <= (n.n + 1) // 2
      |          AND (n.n + 1) // 2 <= hi THEN cents END) AS median_cents
      |  FROM ch JOIN n ON ch.g = n.g GROUP BY ch.g),
      |h2 AS (SELECT h.g, ABS(h.cents - m.median_cents) AS dev,
      |         CAST(SUM(h.c) AS BIGINT) AS c
      |       FROM h JOIN med m ON h.g = m.g GROUP BY 1, 2),
      |ch2 AS (SELECT g, dev, c,
      |          CAST(SUM(c) OVER (PARTITION BY g ORDER BY dev)
      |            AS BIGINT) AS hi
      |        FROM h2),
      |mad AS (
      |  SELECT ch2.g,
      |    MIN(CASE WHEN hi - c + 1 <= (n.n + 1) // 2
      |          AND (n.n + 1) // 2 <= hi THEN dev END) AS mad_cents
      |  FROM ch2 JOIN n ON ch2.g = n.g GROUP BY ch2.g)
      |SELECT med.g AS l_returnflag, CAST(med.n AS BIGINT) AS n,
      |  CAST(median_cents AS BIGINT) AS median_cents,
      |  CAST(mad_cents AS BIGINT) AS mad_cents
      |FROM med JOIN mad ON med.g = mad.g
      |ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------ q38_band_join
  /** Banded (range) self-join — "pairs whose values differ by at most
    * δ" — rewritten as the EQUI-join Spark can shuffle-partition: a
    * raw `|a.v − b.v| <= δ` predicate has no equality key, so Catalyst
    * can only nested-loop it (quadratic, the classic range-join trap);
    * instead each row replicates to its value bucket's neighbors
    * (bucket width ≥ δ, so a qualifying pair is always within one
    * bucket step), the join runs on (group, bucket) — hash-
    * partitionable, skew-bounded by the bucket population — and the
    * exact band test filters the candidates. Constant 3× replication
    * buys an equi-join; each qualifying pair matches EXACTLY once
    * (the right row's bucket fixes which of the three left replicas
    * hits). Per brand: qualifying pairs of parts priced within 50
    * cents and their total gap. */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val p = Tables.part(spark, dir).select(col("p_partkey"),
      col("p_brand"),
      (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val left = p.withColumn("nb", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("p_brand"), (expr("cents div 100") + col("nb")).as("bkt"),
        col("p_partkey").as("k1"), col("cents").as("c1"))
    val right = p.select(col("p_brand"), expr("cents div 100").as("bkt"),
      col("p_partkey").as("k2"), col("cents").as("c2"))
    left.join(right, Seq("p_brand", "bkt"))
      .filter(col("k1") < col("k2") && abs(col("c1") - col("c2")) <= 50L)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("c1") - col("c2"))).as("gap_cents_sum"))
      .reportSort("p_brand")
  }

  val q38Sql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_brand,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM part)
      |SELECT a.p_brand, COUNT(*) AS n_pairs,
      |  CAST(SUM(ABS(a.cents - b.cents)) AS BIGINT) AS gap_cents_sum
      |FROM p a JOIN p b ON a.p_brand = b.p_brand
      |  AND a.p_partkey < b.p_partkey
      |  AND ABS(a.cents - b.cents) <= 50
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ q39_weighted_median
  /** Weighted median — the order statistic where each row counts with
    * its integer weight (quantity-weighted price: "the price at which
    * half the UNITS shipped cost less"): the same domain-bounded radix
    * selection as [[q36]]'s MAD ([[OrderStats.radixLowerMedianWeighted]]
    * — weights merge map-side into the bucket histogram, so the
    * exchanges stay domain-capped no matter how heavy the weights),
    * selecting the smallest cents whose cumulative quantity reaches
    * half the total. */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    import OrderStats._
    import org.apache.spark.sql.types.DecimalType
    val vals = Tables.lineitem(spark, dir).select(col("l_returnflag"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"),
      floor(col("l_quantity")).cast("long").as("qty"))
    radixLowerMedianWeighted(vals, Seq("l_returnflag"), "cents", col("qty"))
      .select(col("l_returnflag"), col("n").as("total_qty"),
        col("median").as("wmedian_cents"))
      .reportSort("l_returnflag")
  }

  val q39Sql: String =
    """WITH v AS (
      |  SELECT l_returnflag AS g,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem),
      |h AS (SELECT g, cents, SUM(qty) AS c FROM v GROUP BY 1, 2),
      |ch AS (SELECT g, cents, c,
      |         CAST(SUM(c) OVER (PARTITION BY g ORDER BY cents)
      |           AS BIGINT) AS hi
      |       FROM h),
      |n AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY g)
      |SELECT ch.g AS l_returnflag, MAX(n.n) AS total_qty,
      |  MIN(CASE WHEN hi - c + 1 <= (n.n + 1) // 2
      |        AND (n.n + 1) // 2 <= hi THEN cents END) AS wmedian_cents
      |FROM ch JOIN n ON ch.g = n.g GROUP BY ch.g
      |ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------- q40_skyline
  /** SKYLINE (Pareto frontier) — the multi-criteria shortlist query
    * ("no part is both cheaper AND bigger"): part p survives iff no q
    * has price ≤ p's and size ≥ p's with one strict. The naive form is
    * a quadratic NOT-EXISTS self-join; the 2-D decomposition makes it
    * a PREFIX-MAX: p is on the frontier iff its size exceeds the max
    * size over all STRICTLY cheaper parts and equals the max size at
    * its own price. The prefix-max runs over the per-price aggregate
    * (domain-bounded, never the corpus) with the two-level shard
    * decomposition — local running max inside contiguous cents shards,
    * exclusive shard-offset prefix over the per-shard maxes — so no
    * window spans the price domain in one task either. */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_size"),
      (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val perPrice = p.groupBy("cents").agg(max(col("p_size")).as("mx"))
      .withColumn("_sh", expr("cents div 1048576"))
    val pre = Window.partitionBy(pmod(col("_m"), lit(1))).orderBy("_sh")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perPrice.groupBy("_sh").agg(max(col("mx")).as("_m"))
      .withColumn("_off", max(col("_m")).over(pre))
      .select("_sh", "_off")
    val local = Window.partitionBy("_sh").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cm = perPrice
      .withColumn("_lm", max(col("mx")).over(local))
      .join(broadcast(offsets), Seq("_sh"))
      .select(col("cents"), col("mx"),
        greatest(coalesce(col("_lm"), lit(Int.MinValue.toLong)),
          coalesce(col("_off"), lit(Int.MinValue.toLong))).as("prevmx"))
    p.join(cm, "cents")
      .filter(col("p_size") === col("mx") && col("p_size") > col("prevmx"))
      .select(col("p_partkey"), col("cents"), col("p_size"))
      .reportSort("p_partkey")
  }

  val q40Sql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_size,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM part),
      |pp AS (SELECT cents, MAX(p_size) AS mx FROM p GROUP BY cents),
      |cm AS (
      |  SELECT cents, mx,
      |    COALESCE(MAX(mx) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      -2147483648) AS prevmx
      |  FROM pp)
      |SELECT p.p_partkey, p.cents, p.p_size
      |FROM p JOIN cm ON p.cents = cm.cents
      |WHERE p.p_size = cm.mx AND p.p_size > cm.prevmx
      |ORDER BY p.p_partkey""".stripMargin

  // ----------------------------------------------------------- q41_mode
  /** Exact MODE per group — the most frequent value, the third member
    * of the profiler's central-tendency trio beside mean and [[q36]]'s
    * median: one map-side-combining (group, value) count collapses the
    * corpus to the value domain, a tiny per-group max picks the top
    * frequency, and the smallest value holding it breaks ties
    * deterministically (both engines agree without an arbitrary
    * ordering). The count re-join broadcasts the |groups|-row max —
    * nothing after the first agg scales with the corpus. */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("qty"))
      .groupBy("l_returnflag", "qty").agg(count(lit(1)).as("c"))
    val m = h.groupBy("l_returnflag").agg(max(col("c")).as("_mc"))
    h.join(broadcast(m), "l_returnflag")
      .filter(col("c") === col("_mc"))
      .groupBy("l_returnflag")
      .agg(min(col("qty")).as("mode_qty"), max(col("_mc")).as("mode_count"))
      .reportSort("l_returnflag")
  }

  val q41Sql: String =
    """WITH h AS (
      |  SELECT l_returnflag, CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
      |    COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |m AS (SELECT l_returnflag, MAX(c) AS mc FROM h GROUP BY 1)
      |SELECT h.l_returnflag, MIN(h.qty) AS mode_qty,
      |  CAST(MAX(m.mc) AS BIGINT) AS mode_count
      |FROM h JOIN m ON h.l_returnflag = m.l_returnflag AND h.c = m.mc
      |GROUP BY h.l_returnflag ORDER BY h.l_returnflag""".stripMargin

  // ------------------------------------------------ q42_quantile_panel
  /** The full quantile PANEL per group — p25/p50/p75/p90/p99 in the
    * SAME two domain-capped passes: this is the payoff of
    * [[OrderStats.radixRankSelect]]'s named-rank generality (one
    * shared 1024-bucket histogram locates all five ranks, one pruned
    * in-bucket pass over the union of rank-holding buckets resolves
    * them). The classic formulation — five `percentile` windows or
    * five selection queries — costs five corpus rankings; this costs
    * two scans regardless of how many quantiles the report asks for,
    * which is what a 100 TB profiling sweep needs. Ranks are type-1
    * (smallest value whose cumulative count reaches ⌈q·n⌉), exact in
    * integer cents. */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val v = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
    OrderStats.radixRankSelect(v, Seq("l_returnflag"), "cents", Seq(
        "p25" -> expr("(n + 3) div 4"),
        "p50" -> expr("(n + 1) div 2"),
        "p75" -> expr("(3 * n + 3) div 4"),
        "p90" -> expr("(9 * n + 9) div 10"),
        "p99" -> expr("(99 * n + 99) div 100")))
      .select(col("l_returnflag"), col("n"),
        col("sel").as("quantile"), col("sel_value").as("cents"))
      .reportSort("l_returnflag", "quantile")
  }

  val q42Sql: String =
    """WITH v AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |h AS (
      |  SELECT l_returnflag, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, cents,
      |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY cents) AS hi
      |  FROM h),
      |n AS (SELECT l_returnflag, COUNT(*) AS n FROM v GROUP BY 1),
      |r AS (
      |  SELECT l_returnflag, n,
      |    unnest(['p25','p50','p75','p90','p99']) AS quantile,
      |    unnest([(n+3)//4, (n+1)//2, (3*n+3)//4,
      |            (9*n+9)//10, (99*n+99)//100]) AS k
      |  FROM n)
      |SELECT r.l_returnflag, r.n, r.quantile,
      |  MIN(c.cents) AS cents
      |FROM r JOIN cum c
      |  ON c.l_returnflag = r.l_returnflag AND c.hi >= r.k
      |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin

  // --------------------------------------------- q43_join_cardinality
  /** Join-cardinality estimation WITHOUT executing the join — the
    * capacity-planning / optimizer-statistics operator: |A ⋈ B| on a
    * key is EXACTLY Σ_k cA(k)·cB(k), so two per-key count histograms
    * and a |keys|-sized histogram join answer "how big would this
    * join be" while the joined rows themselves never materialize —
    * at 100 TB that is the difference between a statistics pass and
    * the join you were trying to avoid running blind. Also reports
    * the skew signal sizing decisions hang on: the hottest key's
    * share of the estimated output in per-mille (a high value says
    * salt that key before running the real join). */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("ca"))
    val b = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cb"))
    val prod = a.join(b, "k")
      .select(col("k"), (col("ca") * col("cb")).as("p"))
    val na = a.agg(count(lit(1)).as("n_keys_left"))
    val nb = b.agg(count(lit(1)).as("n_keys_right"))
    prod.agg(count(lit(1)).as("n_common_keys"),
        sum(col("p")).as("est_rows"), max(col("p")).as("max_key_rows"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_keys_left"), col("n_keys_right"),
        col("n_common_keys"), col("est_rows"), col("max_key_rows"),
        expr("max_key_rows * 1000 div est_rows").as("top_key_pm"))
  }

  val q43Sql: String =
    """WITH a AS (
      |  SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1),
      |b AS (
      |  SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem
      |  GROUP BY 1),
      |p AS (SELECT a.k, a.ca * b.cb AS p FROM a JOIN b ON a.k = b.k),
      |s AS (
      |  SELECT COUNT(*) AS n_common_keys,
      |    CAST(SUM(p) AS BIGINT) AS est_rows,
      |    CAST(MAX(p) AS BIGINT) AS max_key_rows
      |  FROM p)
      |SELECT (SELECT COUNT(*) FROM a) AS n_keys_left,
      |  (SELECT COUNT(*) FROM b) AS n_keys_right,
      |  n_common_keys, est_rows, max_key_rows,
      |  CAST(max_key_rows * 1000 // est_rows AS BIGINT) AS top_key_pm
      |FROM s""".stripMargin

  // ---------------------------------------------------- q44_eager_agg
  /** EAGER AGGREGATION (the groupjoin rewrite) — the fact side
    * collapses to the join-key domain BEFORE the join instead of
    * after it: per-segment order totals computed by pre-aggregating
    * orders on `o_custkey` (150k rows → ≤|customers| partials, a
    * map-side-combining hash-agg), then joining the |customers|-sized
    * partial frame to customer and re-aggregating the partials by
    * segment. The naive plan shuffles every order row through the
    * join; this plan's join input is bounded by the DIMENSION key
    * domain — at 100 TB that is the difference between shuffling the
    * fact table and shuffling a per-key summary. Catalyst does not
    * perform this rewrite itself (no eager-aggregation rule), so the
    * operator states it declaratively. */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val perCust = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("no"), sum(col("cents")).as("cc"))
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(col("no")).as("n_orders"),
        sum(col("cc")).as("total_cents"),
        count(lit(1)).as("n_active_custs"))
      .withColumn("avg_order_cents", expr("total_cents div n_orders"))
      .reportSort("c_mktsegment")
  }

  val q44Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, COUNT(*) AS no,
      |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS cc
      |  FROM orders GROUP BY 1)
      |SELECT c_mktsegment, CAST(SUM(no) AS BIGINT) AS n_orders,
      |  CAST(SUM(cc) AS BIGINT) AS total_cents,
      |  COUNT(*) AS n_active_custs,
      |  CAST(SUM(cc) // SUM(no) AS BIGINT) AS avg_order_cents
      |FROM customer JOIN o ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------- q45_countmin
  /** COUNT-MIN SKETCH — the fixed-memory frequency summary (Cormode &
    * Muthukrishnan 2005) that answers "how often does key k appear"
    * from d·w counters instead of a |keys|-sized histogram: every row
    * increments one cell per hash row (d=4 portable-md5 hashes onto
    * w=512 columns — stated as ONE scan through a 4-way Expand with
    * map-side combine, so each task forwards ≤2048 cells no matter
    * how many rows it read: the sketch is mergeable by cell-wise sum,
    * exactly what a 1000-executor ingest needs), and a point query
    * reads min over the d cells (pure overestimate). The audit probes
    * the 10 true-heaviest part keys against the sketch and reports
    * the overestimation in per-mille — deterministic hashes make the
    * whole sketch bit-reproducible, so the oracle rebuilds it and the
    * estimates compare EXACTLY. */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 512
    def cells(key: Column): Column = explode(array((0 until d).map { r =>
      struct(lit(r.toString).as("hr"),
        pmod(graft.mask.MaskFunctions.portableHash(
          concat(lit(s"$r:"), key.cast("string"))), lit(w.toLong)).as("cell"))
    }: _*))
    // width-pin the sketch digest: the 4-way Expand + 2.4M portable-md5
    // hashes otherwise run in the scan's single task at bench SF (the
    // corpus is one parquet split); the keyed repartition follows the
    // cluster width, is shared by both consumers (ReusedExchange), and
    // at scale the source's natural splits make it a no-op cost
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"))
      .repartition(spark.sparkContext.defaultParallelism, col("l_partkey"))
    val sketch = li.select(cells(col("l_partkey")).as("e"))
      .groupBy(col("e.hr").as("hr"), col("e.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
    val probes = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("l_partkey")).limit(10)
    probes.select(col("l_partkey"), col("true_count"),
        cells(col("l_partkey")).as("e"))
      .select(col("l_partkey"), col("true_count"),
        col("e.hr").as("hr"), col("e.cell").as("cell"))
      .join(broadcast(sketch), Seq("hr", "cell"))
      .groupBy("l_partkey", "true_count")
      .agg(min(col("c")).as("est_count"))
      .withColumn("over_pm",
        expr("(est_count - true_count) * 1000 div true_count"))
      .reportSort(col("true_count").desc, col("l_partkey"))
  }

  val q45Sql: String =
    """WITH ds AS (SELECT unnest(['0','1','2','3']) AS hr),
      |e AS (
      |  SELECT ds.hr,
      |    ('0x'||substr(md5(ds.hr || ':' ||
      |      CAST(l_partkey AS VARCHAR)),1,8))::BIGINT % 512 AS cell
      |  FROM lineitem, ds),
      |sk AS (SELECT hr, cell, COUNT(*) AS c FROM e GROUP BY 1, 2),
      |t AS (
      |  SELECT l_partkey, COUNT(*) AS true_count FROM lineitem
      |  GROUP BY 1 ORDER BY true_count DESC, l_partkey LIMIT 10),
      |p AS (
      |  SELECT t.l_partkey, t.true_count, ds.hr,
      |    ('0x'||substr(md5(ds.hr || ':' ||
      |      CAST(t.l_partkey AS VARCHAR)),1,8))::BIGINT % 512 AS cell
      |  FROM t, ds)
      |SELECT p.l_partkey, CAST(p.true_count AS BIGINT) AS true_count,
      |  CAST(MIN(sk.c) AS BIGINT) AS est_count,
      |  (CAST(MIN(sk.c) AS BIGINT) - p.true_count) * 1000
      |    // p.true_count AS over_pm
      |FROM p JOIN sk ON p.hr = sk.hr AND p.cell = sk.cell
      |GROUP BY p.l_partkey, p.true_count
      |ORDER BY p.true_count DESC, p.l_partkey""".stripMargin

  // ------------------------------------------ q46_cumulative_distinct
  /** RUNNING COUNT-DISTINCT — "distinct customers seen through day d",
    * the growth-curve query that is quadratic if stated naively (a
    * per-day `COUNT(DISTINCT)` over an expanding window re-scans every
    * prior day): the FIRST-OCCURRENCE rewrite makes it linear — each
    * customer contributes exactly at min(day), so one (custkey →
    * min day) hash-agg + a per-day count + a prefix sum over the
    * |days|-bounded daily frame answer every day at once. The prefix
    * runs as the repo's two-level shard decomposition (local running
    * sum inside 128-day shards + exclusive shard-offset prefix), so
    * no window task sees more than a shard even if the calendar spans
    * decades. */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))" +
          " div 86400000000").as("day"))
    val firstDay = days.groupBy("o_custkey")
      .agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val orderCounts = days.groupBy("day").agg(count(lit(1)).as("n_orders"))
    val daily = orderCounts.join(firstDay, Seq("day"), "left")
      .select(col("day"), col("n_orders"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("_sh", expr("day div 128"))
    val pre = Window.partitionBy(pmod(col("_m"), lit(1))).orderBy("_sh")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = daily.groupBy("_sh").agg(sum(col("n_new")).as("_m"))
      .withColumn("_off", sum(col("_m")).over(pre))
      .select(col("_sh"), coalesce(col("_off"), lit(0L)).as("_off"))
    val local = Window.partitionBy("_sh").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("_lc", sum(col("n_new")).over(local))
      .join(broadcast(offsets), Seq("_sh"))
      .select(col("day"), col("n_orders"), col("n_new"),
        (col("_lc") + col("_off")).as("cum_distinct"))
      .orderBy("day")
  }

  val q46Sql: String =
    """WITH d AS (
      |  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
      |  FROM orders),
      |fo AS (
      |  SELECT MIN(day) AS day FROM d GROUP BY o_custkey),
      |nn AS (SELECT day, COUNT(*) AS n_new FROM fo GROUP BY day),
      |oc AS (SELECT day, COUNT(*) AS n_orders FROM d GROUP BY day)
      |SELECT oc.day, oc.n_orders,
      |  CAST(COALESCE(nn.n_new, 0) AS BIGINT) AS n_new,
      |  CAST(SUM(COALESCE(nn.n_new, 0)) OVER (ORDER BY oc.day)
      |    AS BIGINT) AS cum_distinct
      |FROM oc LEFT JOIN nn ON oc.day = nn.day
      |ORDER BY oc.day""".stripMargin

  // ---------------------------------------------------- q47_gains_table
  /** GAINS / LORENZ TABLE — "what share of revenue lives in each
    * value decile", the concentration report behind every whale-curve
    * and model-lift analysis: decile BOUNDARIES come from ONE
    * [[OrderStats.radixRankSelect]] pass (all nine type-1 order
    * statistics in the same two domain-capped scans — the naive
    * `ntile(10)` is a single-partition corpus sort, the classic
    * scale-killer), collapse to a single 9-element array broadcast to
    * every row, and each order buckets itself with a codegen
    * `aggregate` fold — no shuffle between boundary and bucket. The
    * per-decile rollup is a 10-group hash-agg; cumulative shares run
    * on the 10-row frame. Ties sit in the lowest decile whose
    * boundary admits them (both engines replay the same strict-less
    * count). */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // non-foldable all-rows group: a literal would constant-fold and
    // strip the window partition (the unpartitioned-window trap the
    // plan pins forbid); cents mod 1 is 0 everywhere but stays an
    // expression over the column
    val vals = Tables.orders(spark, dir).select(
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .withColumn("_g", pmod(col("cents"), lit(1L)))
    val ranks = (1 to 9).map(i =>
      s"p$i" -> expr(s"($i * n + 9) div 10"))
    val bnds = OrderStats.radixRankSelect(vals, Seq("_g"), "cents", ranks)
      .agg(sort_array(collect_list(col("sel_value"))).as("bnds"))
    val byDecile = vals.crossJoin(broadcast(bnds))
      .select(col("cents"),
        (expr("aggregate(bnds, 0, (acc, b) -> acc + " +
          "if(cents > b, 1, 0))") + 1).as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("revenue_cents"))
    val tot = byDecile.agg(sum(col("revenue_cents")).as("_tot"))
    val cum = Window.partitionBy(pmod(col("decile"), lit(1)))
      .orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, 0)
    byDecile.crossJoin(broadcast(tot))
      .withColumn("_cum", sum(col("revenue_cents")).over(cum))
      .select(col("decile").cast("long").as("decile"), col("n_orders"),
        col("revenue_cents"),
        expr("revenue_cents * 1000 div _tot").as("rev_share_pm"),
        expr("_cum * 1000 div _tot").as("cum_share_pm"))
      .reportSort("decile")
  }

  val q47Sql: String =
    """WITH v AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT) AS cents
      |  FROM orders),
      |h AS (SELECT cents, COUNT(*) AS c FROM v GROUP BY 1),
      |cum AS (SELECT cents, SUM(c) OVER (ORDER BY cents) AS hi FROM h),
      |n AS (SELECT COUNT(*) AS n FROM v),
      |r AS (
      |  SELECT unnest([1,2,3,4,5,6,7,8,9]) AS i, n FROM n),
      |b AS (
      |  SELECT r.i, MIN(c.cents) AS bnd
      |  FROM r JOIN cum c ON c.hi >= (r.i * r.n + 9) // 10
      |  GROUP BY r.i),
      |a AS (
      |  SELECT cents,
      |    1 + (SELECT COUNT(*) FROM b WHERE b.bnd < v.cents) AS decile
      |  FROM v),
      |g AS (
      |  SELECT decile, COUNT(*) AS n_orders,
      |    CAST(SUM(cents) AS BIGINT) AS revenue_cents
      |  FROM a GROUP BY 1),
      |t AS (SELECT SUM(revenue_cents) AS tot FROM g)
      |SELECT CAST(decile AS BIGINT) AS decile, n_orders, revenue_cents,
      |  CAST(revenue_cents * 1000 // tot AS BIGINT) AS rev_share_pm,
      |  CAST(CAST(SUM(revenue_cents) OVER (ORDER BY decile) AS BIGINT)
      |    * 1000 // tot AS BIGINT) AS cum_share_pm
      |FROM g CROSS JOIN t ORDER BY decile""".stripMargin

  // --------------------------------------------------- q48_semi_additive
  /** SEMI-ADDITIVE aggregation — the balance/inventory pattern where
    * summing over time is WRONG (a month's "total balance" is the sum
    * of each account's LAST balance, not of every snapshot): per
    * (customer, month) the closing order value via ONE struct-max —
    * `max(struct(day, orderkey, cents))` picks the latest row with a
    * deterministic orderkey tie-break, map-side combinable, no window
    * and no self-join — then the monthly roll-up sums closings across
    * customers. The classic formulations (ROW_NUMBER per key-month,
    * or a MAX-date self-join) cost a corpus window or a second scan;
    * the argmax-by-struct is a single hash-agg, the shape that
    * survives 100 TB. */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      expr("unix_micros(cast(o_orderdate as timestamp))" +
        " div 86400000000").as("day"),
      col("o_orderkey"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
      .withColumn("month", expr("day div 30"))
    val closing = o.groupBy("o_custkey", "month")
      .agg(max(struct(col("day"), col("o_orderkey"), col("cents")))
        .as("_last"))
      .select(col("month"), col("_last.cents").as("closing_cents"))
    closing.groupBy("month")
      .agg(count(lit(1)).as("n_accounts"),
        sum(col("closing_cents")).as("closing_total_cents"),
        max(col("closing_cents")).as("max_closing_cents"))
      .reportSort("month")
  }

  val q48Sql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    epoch_us(o_orderdate) // 86400000000 AS day,
      |    o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |m AS (SELECT o_custkey, day // 30 AS month, day, o_orderkey,
      |        cents FROM o),
      |r AS (
      |  SELECT o_custkey, month, cents,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey, month
      |      ORDER BY day DESC, o_orderkey DESC) AS rn
      |  FROM m),
      |c AS (SELECT month, cents AS closing_cents FROM r WHERE rn = 1)
      |SELECT month, COUNT(*) AS n_accounts,
      |  CAST(SUM(closing_cents) AS BIGINT) AS closing_total_cents,
      |  CAST(MAX(closing_cents) AS BIGINT) AS max_closing_cents
      |FROM c GROUP BY month ORDER BY month""".stripMargin

  // ------------------------------------------------ q49_bloom_prune_join
  /** BLOOM-PRUNED JOIN — the runtime-filter technique (Spark's own
    * bloom runtime filters, Impala/Trino broadcast runtime filters)
    * stated explicitly and proved RESULT-IDENTICAL to the plain join:
    * the selective dim side (parts with size ≥ 48, ~6%) collapses to
    * an m=8192-bit / k=3 portable bloom filter — built distributed
    * (one bit_or hash-agg), then collected as 256 BIGINT words (the
    * collect is bounded by m/32, NEVER by the key count) and shipped
    * as an array literal, so the fact-side probe is three codegen
    * array lookups per row, map-only, pruning inside the scan stage
    * BEFORE any exchange. False positives only widen the candidate
    * set; the exact join behind the probe removes them — so the
    * oracle is simply the plain join, and the spec pins both the
    * identity and that the filter genuinely prunes. At 100 TB this
    * is the difference between shuffling the whole fact table and
    * shuffling the ~6% that can possibly match. */
  def q49(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val m = 8192L
    val dim = Tables.part(spark, dir).filter(col("p_size") >= 48)
      .select(col("p_partkey"), col("p_brand"))
    def pos(key: Column, i: Int): Column = pmod(
      conv(substring(md5(key.cast("string")), 1 + 8 * i, 8), 16, 10)
        .cast("long"), lit(m))
    val words = dim
      .select(explode(array(pos(col("p_partkey"), 0),
        pos(col("p_partkey"), 1), pos(col("p_partkey"), 2))).as("p"))
      .select(expr("CAST(p div 32 AS INT)").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
      .collect().foldLeft(Array.fill(256)(0L)) { (a, r) =>
        a(r.getAs[Int]("word")) = r.getAs[Long]("bits"); a
      }
    val bits = typedLit(words.toSeq)
    def probe(i: Int): Column = expr(
      s"shiftright(element_at(_bits, cast(_p$i div 32 as int) + 1), " +
        s"cast(_p$i % 32 as int)) % 2 = 1")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .withColumn("_bits", bits)
      .withColumn("_p0", pos(col("l_partkey"), 0))
      .withColumn("_p1", pos(col("l_partkey"), 1))
      .withColumn("_p2", pos(col("l_partkey"), 2))
      .filter(probe(0) && probe(1) && probe(2))
      .join(broadcast(dim), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("revenue_cents"))
      .reportSort("p_brand")
  }

  val q49Sql: String =
    """SELECT p_brand, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size >= 48
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // -------------------------------------------------- q50_exists_chain
  /** DOUBLE EXISTS / NOT-EXISTS CHAIN — the TPC-H Q21 "suppliers who
    * kept orders waiting" shape (reference routing predicates compose
    * the same way: per-key "some sibling matches AND no sibling
    * violates", Main.java:446-498 chooses targets per column-set the
    * same membership way): a line item blocks an order when it shipped
    * >90 days after the order date, the order has ≥2 distinct
    * suppliers, and NO OTHER supplier on that order was late. The
    * textbook plan is a triple self-join (l1 × EXISTS l2 × NOT EXISTS
    * l3) — three corpus scans and two correlated subqueries. Here both
    * correlated predicates DECORRELATE into ONE per-order hash-agg:
    * `n_supp` (distinct suppliers), `n_late` (distinct late
    * suppliers), and `min(late supplier)` — when `n_late = 1` that min
    * IS the unique blocker, so the filter `n_supp ≥ 2 AND n_late = 1`
    * reconstructs the whole chain from the aggregate alone. ONE
    * lineitem scan, one orders join, one agg; the supplier-name join
    * runs on the tiny waiting-order frame. The spec pins equivalence
    * against the literal self-join formulation. At 100 TB the agg
    * form shuffles each row once on its order key; the EXISTS form
    * shuffles the corpus three times. */
  def q50(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"))
    val flagged = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        to_date(col("l_shipdate")).as("sdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"),
        (datediff(col("sdate"), col("odate")) > 90).as("late"))
    val perOrder = flagged.groupBy("okey").agg(
      countDistinct(col("skey")).as("n_supp"),
      countDistinct(when(col("late"), col("skey"))).as("n_late"),
      min(when(col("late"), col("skey"))).as("blocker"))
    // group AND order by the supplier KEY: names are not unique (the
    // sf1 replication gate caught the oracle grouping by name while
    // this side grouped by key — identical only while names were
    // unique), and the key makes the top-10 order total
    perOrder.filter(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy("blocker").agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name")),
        col("blocker") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      // corpus-proportional top-K: TakeOrderedAndProject, not reportSort
      .orderBy(col("numwait").desc, col("s_suppkey")).limit(10)
  }

  val q50Sql: String =
    """WITH l AS (
      |  SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
      |    date_diff('day', CAST(o.o_orderdate AS DATE),
      |      CAST(l.l_shipdate AS DATE)) > 90 AS late
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |w AS (
      |  SELECT DISTINCT l1.okey, l1.skey
      |  FROM l l1
      |  WHERE l1.late
      |    AND EXISTS (SELECT 1 FROM l l2
      |      WHERE l2.okey = l1.okey AND l2.skey <> l1.skey)
      |    AND NOT EXISTS (SELECT 1 FROM l l3
      |      WHERE l3.okey = l1.okey AND l3.skey <> l1.skey AND l3.late))
      |SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
      |FROM w JOIN supplier s ON s.s_suppkey = w.skey
      |GROUP BY 1, 2 ORDER BY numwait DESC, s.s_suppkey
      |LIMIT 10""".stripMargin

  // --------------------------------------------------- q51_kmv_setops
  /** KMV SET OPERATIONS — the mergeable-sketch algebra behind
    * planet-scale audience overlap ("how many customers have BOTH an
    * open and a filled order") without ever joining the raw sets:
    * each side keeps only its k=256 smallest portable hashes, the
    * UNION sketch is the k smallest of the merged sketches
    * (TakeOrderedAndProject — never a global sort), and the
    * intersection estimate is the Jaccard-scaled union:
    * est∩ = |topk(A∪B) ∩ A ∩ B| · est∪ / k. The membership test is
    * sound on the TRUNCATED sketches alone: h ≤ hk(A∪B) ≤ hk(A), so
    * any union-sketch hash from A is inside A's own sketch — the
    * property that makes KMV sketches mergeable state (a streaming
    * shard can ship 256 longs, not its key set). Exact counts ride
    * along, so the output self-reports its per-mille error; when a
    * sketch is exhaustive (n < k) the estimate collapses to exact.
    * All integer arithmetic — estimator math included. */
  def q51(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 256
    val m = Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderstatus").as("s"), col("o_custkey").as("key"))
      .distinct()
      .cut // sketch + exact passes share one scan
    val h = m.select(col("s"),
      graft.mask.MaskFunctions.portableHash(col("key")).as("h")).distinct()
    val w = Window.partitionBy("s").orderBy("h")
    val sk = h.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("s", "h")
    val merged = h.select("h").distinct().orderBy("h").limit(k)
    val st = merged.join(sk, Seq("h"))
      .groupBy("h")
      .agg(max(when(col("s") === "O", 1).otherwise(0)).as("a"),
        max(when(col("s") === "F", 1).otherwise(0)).as("b"))
      .agg(count(lit(1)).as("nk"), max(col("h")).as("hk"),
        sum(expr("a * b")).as("n_both"))
    val ex = m.groupBy("key").agg(countDistinct(col("s")).as("ns"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).as("exact_inter"))
    st.crossJoin(broadcast(ex))
      .withColumn("est_union", when(col("nk") < k, col("nk"))
        .otherwise(expr(s"(${k - 1} * 4294967296) div hk")))
      .withColumn("est_inter", when(col("nk") < k, col("n_both"))
        .otherwise(expr(s"n_both * est_union div $k")))
      .select(lit(k).cast("long").as("k"),
        col("est_union"), col("exact_union"),
        col("est_inter"), col("exact_inter"),
        expr("abs(est_union - exact_union) * 1000 div exact_union")
          .as("union_err_pm"),
        when(col("exact_inter") > 0,
          expr("abs(est_inter - exact_inter) * 1000 div exact_inter"))
          .as("inter_err_pm"))
  }

  val q51Sql: String =
    """WITH m AS (
      |  SELECT DISTINCT o_orderstatus AS s, o_custkey AS key
      |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
      |h AS (
      |  SELECT DISTINCT s,
      |    ('0x'||substr(md5(CAST(key AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM m),
      |r AS (SELECT s, h,
      |    ROW_NUMBER() OVER (PARTITION BY s ORDER BY h) AS rn FROM h),
      |sk AS (SELECT s, h FROM r WHERE rn <= 256),
      |mg AS (SELECT DISTINCT h FROM h ORDER BY h LIMIT 256),
      |fl AS (
      |  SELECT mg.h,
      |    MAX(CASE WHEN sk.s = 'O' THEN 1 ELSE 0 END) AS a,
      |    MAX(CASE WHEN sk.s = 'F' THEN 1 ELSE 0 END) AS b
      |  FROM mg JOIN sk ON mg.h = sk.h GROUP BY 1),
      |st AS (SELECT COUNT(*) AS nk, MAX(h) AS hk,
      |    SUM(a * b) AS n_both FROM fl),
      |ex AS (
      |  SELECT COUNT(*) AS exact_union,
      |    SUM(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS exact_inter
      |  FROM (SELECT key, COUNT(DISTINCT s) AS ns FROM m GROUP BY 1)),
      |est AS (
      |  SELECT nk, n_both, exact_union, exact_inter,
      |    CASE WHEN nk < 256 THEN nk
      |         ELSE (255 * 4294967296) // hk END AS est_union
      |  FROM st CROSS JOIN ex),
      |e2 AS (
      |  SELECT *, CASE WHEN nk < 256 THEN n_both
      |       ELSE n_both * est_union // 256 END AS est_inter
      |  FROM est)
      |SELECT CAST(256 AS BIGINT) AS k,
      |  CAST(est_union AS BIGINT) AS est_union,
      |  exact_union,
      |  CAST(est_inter AS BIGINT) AS est_inter,
      |  CAST(exact_inter AS BIGINT) AS exact_inter,
      |  CAST(ABS(est_union - exact_union) * 1000 // exact_union
      |    AS BIGINT) AS union_err_pm,
      |  CASE WHEN exact_inter > 0
      |    THEN CAST(ABS(est_inter - exact_inter) * 1000 // exact_inter
      |      AS BIGINT) END AS inter_err_pm
      |FROM e2""".stripMargin

  // ---------------------------------------------- q52_percentile_cont
  /** PERCENTILE_CONT — ANSI SQL's INTERPOLATED quantile (every prior
    * quantile operator here is type-1/discrete; the CONT definition —
    * value at fractional rank 1 + p·(n−1), linearly interpolated
    * between its bracketing order statistics — is what BI tools and
    * the SQL standard mean by "median"). Exact with NO division:
    * the fractional part of p·(n−1)/100 has denominator 100, so
    * value·1000 = lo·1000 + (hi−lo)·10·((p·(n−1)) mod 100) is pure
    * integer arithmetic. Both bracketing ranks for both percentiles
    * across all groups come from ONE [[OrderStats.radixRankSelect]]
    * (the same two domain-capped passes — never a per-group sort),
    * the 4-selection frame pivots to one row per group, and the
    * interpolation is row-local. */
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    def kLo(p: Int) = expr(s"1 + ($p * (n - 1)) div 100")
    def kHi(p: Int) = expr(
      s"1 + ($p * (n - 1)) div 100 + " +
        s"(CASE WHEN ($p * (n - 1)) % 100 > 0 THEN 1 ELSE 0 END)")
    val sel = OrderStats.radixRankSelect(vals, Seq("prio"), "cents", Seq(
      "p50_lo" -> kLo(50), "p50_hi" -> kHi(50),
      "p90_lo" -> kLo(90), "p90_hi" -> kHi(90)))
    def pick(nm: String) =
      max(when(col("sel") === nm, col("sel_value")))
    val wide = sel.groupBy("prio")
      .agg(max(col("n")).as("n"),
        pick("p50_lo").as("lo50"), pick("p50_hi").as("hi50"),
        pick("p90_lo").as("lo90"), pick("p90_hi").as("hi90"))
    wide.select(col("prio"), explode(array(
        struct(lit(50L).as("p"), col("n"), col("lo50").as("lo_cents"),
          col("hi50").as("hi_cents"),
          (col("lo50") * 1000 + (col("hi50") - col("lo50")) * 10 *
            expr("(50 * (n - 1)) % 100")).as("value_milli")),
        struct(lit(90L).as("p"), col("n"), col("lo90").as("lo_cents"),
          col("hi90").as("hi_cents"),
          (col("lo90") * 1000 + (col("hi90") - col("lo90")) * 10 *
            expr("(90 * (n - 1)) % 100")).as("value_milli")))).as("m"))
      .select(col("prio"), col("m.p").as("p"), col("m.n").as("n"),
        col("m.lo_cents").as("lo_cents"), col("m.hi_cents").as("hi_cents"),
        col("m.value_milli").as("value_milli"))
      .reportSort("prio", "p")
  }

  val q52Sql: String =
    """WITH v AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |h AS (SELECT prio, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT prio, cents,
      |    SUM(c) OVER (PARTITION BY prio ORDER BY cents) AS hi
      |  FROM h),
      |nn AS (SELECT prio, COUNT(*) AS n FROM v GROUP BY 1),
      |r AS (
      |  SELECT prio, n, unnest([50, 90]) AS p FROM nn),
      |k AS (
      |  SELECT prio, n, p,
      |    1 + (p * (n - 1)) // 100 AS k_lo,
      |    1 + (p * (n - 1)) // 100 +
      |      (CASE WHEN (p * (n - 1)) % 100 > 0 THEN 1 ELSE 0 END)
      |      AS k_hi,
      |    (p * (n - 1)) % 100 AS num
      |  FROM r),
      |pick AS (
      |  SELECT k.prio, k.p, k.n, k.num,
      |    (SELECT MIN(c.cents) FROM cum c
      |     WHERE c.prio = k.prio AND c.hi >= k.k_lo) AS lo_cents,
      |    (SELECT MIN(c.cents) FROM cum c
      |     WHERE c.prio = k.prio AND c.hi >= k.k_hi) AS hi_cents
      |  FROM k)
      |SELECT prio, CAST(p AS BIGINT) AS p, n,
      |  lo_cents, hi_cents,
      |  CAST(lo_cents * 1000 + (hi_cents - lo_cents) * 10 * num
      |    AS BIGINT) AS value_milli
      |FROM pick ORDER BY prio, p""".stripMargin

  // ----------------------------------------------- q53_null_semantics
  /** NOT IN vs NOT EXISTS three-valued-logic AUDIT — the classic
    * silent-data-loss trap in replication/delete routing: `key NOT IN
    * (subquery)` returns ZERO rows the moment the subquery yields one
    * NULL, while the anti-join (NOT EXISTS) form keeps behaving. A
    * probe set of order custkeys is deterministically poisoned
    * (o_orderkey % 97 = 0 → NULL key, replayable in any engine) and
    * the same "customers with no orders" question is asked four ways:
    * NOT EXISTS on the poisoned set, NOT IN on the poisoned set (the
    * trap: 0 rows), and both on the null-repaired set (equal again).
    * One row per region so the audit localizes the loss. Spark plans
    * the NOT IN as a null-aware anti join (broadcast-only physical
    * strategy — the reason big-data dialects tell you to write NOT
    * EXISTS); the probe aggregate is dimension-sized, so the broadcast
    * is safe here and flagged as the thing that would NOT survive an
    * unbounded subquery at 100 TB. */
  def q53(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_regionkey").as("rk"))
    // "customers with no RECENT order" — the cutoff is DERIVED from
    // the data (550 days below max(o_orderdate)), so the anti set
    // stays non-empty at every SF and under a regenerated date range
    // (a fixed literal would silently empty the probe if the
    // generator's horizon moved)
    val maxd = Tables.orders(spark, dir)
      .agg(max(to_date(col("o_orderdate"))).as("maxd"))
    val probe = Tables.orders(spark, dir)
      .crossJoin(broadcast(maxd))
      .filter(to_date(col("o_orderdate")) >= date_sub(col("maxd"), 550))
      .select(when(col("o_orderkey") % 97 === 0, lit(null))
        .otherwise(col("o_custkey")).as("k"))
    val repaired = probe.filter(col("k").isNotNull)
    def cnt(base: DataFrame, nm: String) =
      base.groupBy("rk").agg(count(lit(1)).as(nm))
    val notExistsPoisoned = cnt(cust.join(probe.distinct(),
      col("c_custkey") === col("k"), "left_anti"), "cnt_not_exists")
    val notExistsRepaired = cnt(cust.join(repaired.distinct(),
      col("c_custkey") === col("k"), "left_anti"), "cnt_repaired")
    // NOT IN via the real null-aware predicate (planned as
    // BroadcastNestedLoop/NullAware anti): keep it a true IN-subquery.
    // Views are uniquely suffixed and dropped right after analysis —
    // the resolved plan no longer needs them, and session-global
    // names would shadow/be shadowed across keys in a shared session.
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val custView = s"q53_cust_$tag"
    val probeView = s"q53_probe_$tag"
    cust.createOrReplaceTempView(custView)
    probe.createOrReplaceTempView(probeView)
    val notInPoisoned = spark.sql(
      s"""SELECT rk, COUNT(*) AS cnt_not_in FROM $custView
         |WHERE c_custkey NOT IN (SELECT k FROM $probeView)
         |GROUP BY rk""".stripMargin)
    spark.catalog.dropTempView(custView)
    spark.catalog.dropTempView(probeView)
    val base = cust.groupBy("rk").agg(count(lit(1)).as("n_customers"))
    val stats = probe.agg(count(lit(1)).as("n_probe"),
      sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_probe_null"))
    base
      .join(notExistsPoisoned, Seq("rk"), "left")
      .join(notInPoisoned, Seq("rk"), "left")
      .join(notExistsRepaired, Seq("rk"), "left")
      .crossJoin(broadcast(stats))
      .select(col("rk").as("regionkey"), col("n_customers"),
        coalesce(col("cnt_not_exists"), lit(0L)).as("cnt_not_exists"),
        coalesce(col("cnt_not_in"), lit(0L)).as("cnt_not_in"),
        coalesce(col("cnt_repaired"), lit(0L)).as("cnt_repaired"),
        col("n_probe_null"),
        (coalesce(col("cnt_not_in"), lit(0L)) =!=
          coalesce(col("cnt_not_exists"), lit(0L))).cast("long")
          .as("poisoned"))
      .reportSort("regionkey")
  }

  val q53Sql: String =
    """WITH cust AS (
      |  SELECT c_custkey, n_regionkey AS rk
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |probe AS (
      |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
      |         ELSE o_custkey END AS k
      |  FROM orders
      |  WHERE CAST(o_orderdate AS DATE) >=
      |    (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
      |      - INTERVAL 550 DAY),
      |ne AS (
      |  SELECT rk, COUNT(*) AS cnt_not_exists FROM cust c
      |  WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
      |  GROUP BY rk),
      |ni AS (
      |  SELECT rk, COUNT(*) AS cnt_not_in FROM cust
      |  WHERE c_custkey NOT IN (SELECT k FROM probe)
      |  GROUP BY rk),
      |nr AS (
      |  SELECT rk, COUNT(*) AS cnt_repaired FROM cust
      |  WHERE c_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL)
      |  GROUP BY rk),
      |base AS (SELECT rk, COUNT(*) AS n_customers FROM cust GROUP BY rk),
      |st AS (
      |  SELECT COUNT(*) AS n_probe,
      |    CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_probe_null
      |  FROM probe)
      |SELECT base.rk AS regionkey, base.n_customers,
      |  COALESCE(ne.cnt_not_exists, 0) AS cnt_not_exists,
      |  COALESCE(ni.cnt_not_in, 0) AS cnt_not_in,
      |  COALESCE(nr.cnt_repaired, 0) AS cnt_repaired,
      |  st.n_probe_null,
      |  CAST(COALESCE(ni.cnt_not_in, 0) <> COALESCE(ne.cnt_not_exists, 0)
      |    AS BIGINT) AS poisoned
      |FROM base
      |LEFT JOIN ne USING (rk) LEFT JOIN ni USING (rk)
      |LEFT JOIN nr USING (rk) CROSS JOIN st
      |ORDER BY regionkey""".stripMargin

  // ---------------------------------------------------- q54_listagg
  /** DELIMITED GROUP REPORT (listagg) — the string-aggregation step of
    * a formatted report sink: per nation, the top-10 suppliers by
    * account balance collapse to ONE pipe-delimited line. Two
    * determinism rules make this oracle-safe where naive listagg is
    * not: membership is fixed by a total order (balance DESC, then
    * name — never a bare LIMIT inside a group), and the emitted list
    * is re-sorted alphabetically so the line is a SET rendering, not
    * an order-of-arrival artifact. Scale: the rank filter bounds every
    * group to 10 rows BEFORE any list materializes (WindowGroupLimit
    * pushes the top-k into the shuffle), so per-group state is O(k)
    * however large a nation's supplier roster grows. */
  def q54(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("n_nationkey")
      .orderBy(desc("s_acctbal"), col("s_name"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_listed"),
        array_join(array_sort(collect_list(col("s_name"))), "|")
          .as("names_csv"))
      .reportSort("n_name")
  }

  val q54Sql: String =
    """WITH ranked AS (
      |  SELECT n_name, s_name,
      |    ROW_NUMBER() OVER (PARTITION BY n_nationkey
      |      ORDER BY s_acctbal DESC, s_name) AS rk
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      |SELECT n_name, COUNT(*) AS n_listed,
      |  string_agg(s_name, '|' ORDER BY s_name) AS names_csv
      |FROM ranked WHERE rk <= 10
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------- q55_equidepth_hist
  /** EQUI-DEPTH HISTOGRAM — the optimizer statistic behind every
    * cost-based planner (ANALYZE TABLE's column stats): 8 buckets per
    * group whose boundaries are the exact i·n/8-th order statistics
    * of the price column, plus the EXACT row count landing in each
    * bucket (ties break low: a value equal to a boundary belongs to
    * the bucket that boundary closes — so counts are deterministic
    * however heavy the ties). Boundaries come from ONE radix-select
    * pass ([[OrderStats.radixRankSelect]] — two pruned scans, no
    * global sort, the q36/q52 machinery); bucket counts are a second
    * scan against the broadcast 8-value boundary row per group.
    * Depths are NOT exactly n/8 when ties straddle a boundary — that
    * skew is precisely what a planner reads off this table. */
  def q55(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("grp"),
      (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val ranks = (1 to 8).map(i =>
      s"b$i" -> expr(s"greatest(1L, ($i * n) div 8)"))
    val sel = OrderStats.radixRankSelect(vals, Seq("grp"), "cents", ranks)
    def pick(nm: String) =
      max(when(col("sel") === nm, col("sel_value")))
    val boundAggs = max(col("n")).as("n") +:
      (1 to 8).map(i => pick(s"b$i").as(s"b$i"))
    val bounds = sel.groupBy("grp")
      .agg(boundAggs.head, boundAggs.tail: _*)
    val selCols = Seq(col("grp"), col("cents"),
      (2 to 8).map(i => when(col(s"b${i - 1}") < col("cents"), 1L)
        .otherwise(0L)).reduce(_ + _).as("bucket")) ++
      (1 to 8).map(i => col(s"b$i"))
    val bucketed = vals.join(broadcast(bounds), "grp")
      .select(selCols: _*)
      .withColumn("hi_cents",
        (1 to 8).map(i => when(col("bucket") === (i - 1), col(s"b$i")))
          .reduceRight(_ otherwise _))
    bucketed.groupBy("grp", "bucket")
      .agg(count(lit(1)).as("n_rows"), max(col("hi_cents")).as("hi_cents"))
      .reportSort("grp", "bucket")
  }

  val q55Sql: String =
    """WITH v AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |h AS (SELECT grp, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, cents,
      |    SUM(c) OVER (PARTITION BY grp ORDER BY cents) AS hi
      |  FROM h),
      |nn AS (SELECT grp, COUNT(*) AS n FROM v GROUP BY 1),
      |r AS (
      |  SELECT grp, n, i, GREATEST(1, (i * n) // 8) AS k
      |  FROM nn CROSS JOIN (SELECT unnest(range(1, 9)) AS i) t),
      |bounds AS (
      |  SELECT r.grp, r.i,
      |    (SELECT MIN(c.cents) FROM cum c
      |     WHERE c.grp = r.grp AND c.hi >= r.k) AS b
      |  FROM r),
      |bw AS (
      |  SELECT grp,
      |    MAX(CASE WHEN i = 1 THEN b END) AS b1,
      |    MAX(CASE WHEN i = 2 THEN b END) AS b2,
      |    MAX(CASE WHEN i = 3 THEN b END) AS b3,
      |    MAX(CASE WHEN i = 4 THEN b END) AS b4,
      |    MAX(CASE WHEN i = 5 THEN b END) AS b5,
      |    MAX(CASE WHEN i = 6 THEN b END) AS b6,
      |    MAX(CASE WHEN i = 7 THEN b END) AS b7,
      |    MAX(CASE WHEN i = 8 THEN b END) AS b8
      |  FROM bounds GROUP BY grp),
      |bk AS (
      |  SELECT v.grp, v.cents,
      |    (CASE WHEN b1 < cents THEN 1 ELSE 0 END
      |     + CASE WHEN b2 < cents THEN 1 ELSE 0 END
      |     + CASE WHEN b3 < cents THEN 1 ELSE 0 END
      |     + CASE WHEN b4 < cents THEN 1 ELSE 0 END
      |     + CASE WHEN b5 < cents THEN 1 ELSE 0 END
      |     + CASE WHEN b6 < cents THEN 1 ELSE 0 END
      |     + CASE WHEN b7 < cents THEN 1 ELSE 0 END) AS bucket,
      |    b1, b2, b3, b4, b5, b6, b7, b8
      |  FROM v JOIN bw USING (grp))
      |SELECT grp, CAST(bucket AS BIGINT) AS bucket,
      |  COUNT(*) AS n_rows,
      |  CAST(MAX(CASE bucket WHEN 0 THEN b1 WHEN 1 THEN b2
      |    WHEN 2 THEN b3 WHEN 3 THEN b4 WHEN 4 THEN b5 WHEN 5 THEN b6
      |    WHEN 6 THEN b7 ELSE b8 END) AS BIGINT) AS hi_cents
      |FROM bk GROUP BY grp, bucket ORDER BY grp, bucket""".stripMargin

  // ------------------------------------------------------------ registry
  // ------------------------------------------------------ q37_unpivot
  /** Wide→long reshape as a first-class relational operator (the
    * reformat step every report/export pipeline has): three measure
    * columns melt through the Dataset `unpivot` API (Catalyst's
    * Unpivot node → a codegen Expand, ONE scan emitting 3 rows per
    * input — never 3 scans), then a per-measure profile collapses the
    * melt map-side. Measures are integerized (units/cents/milli) so
    * the long-format value column is one exact BIGINT type — the
    * type-unification trap of melting heterogeneous floats never
    * arises. */
  def q37(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("long").as("quantity"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_cents"),
        floor(col("l_discount") * 1000).cast("long").as("discount_milli"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("price_cents"), col("discount_milli")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .reportSort("measure")

  val q37Sql: String =
    """WITH m AS (
      |  SELECT 'quantity' AS measure,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS value FROM lineitem
      |  UNION ALL SELECT 'price_cents',
      |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'discount_milli',
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT) FROM lineitem)
      |SELECT measure, COUNT(*) AS n, CAST(SUM(value) AS BIGINT) AS total,
      |  CAST(MIN(value) AS BIGINT) AS vmin,
      |  CAST(MAX(value) AS BIGINT) AS vmax
      |FROM m GROUP BY measure ORDER BY measure""".stripMargin

  // ------------------------------------------------ q56_top_n_per_group
  /** TOP-N PER GROUP — the report-page staple (top 3 suppliers by
    * revenue per nation) done in the only shape that survives scale:
    * AGGREGATE FIRST (one map-side-combining hash-agg collapses the
    * fact table to |nation × supplier| rows), THEN rank inside the
    * dimension-sized frame — the window sort runs over supplier
    * counts, never corpus rows (a window straight over lineitem would
    * sort a nation's entire order history in one task). Deterministic
    * tie-break on suppkey keeps the cut oracle-exact. */
  def q56(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nationkey"),
        col("l_suppkey").as("suppkey"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("long"))
        .as("rev_cents"))
    rev.withColumn("rk", row_number().over(
        Window.partitionBy("nationkey")
          .orderBy(desc("rev_cents"), col("suppkey"))))
      .filter(col("rk") <= 3)
      .select(col("nationkey"), col("rk").cast("long").as("rk"),
        col("suppkey"), col("rev_cents"))
      .orderBy("nationkey", "rk")
  }

  val q56Sql: String =
    """WITH rev AS (
      |  SELECT s_nationkey AS nationkey, l_suppkey AS suppkey,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT nationkey, suppkey, rev_cents,
      |    ROW_NUMBER() OVER (PARTITION BY nationkey
      |      ORDER BY rev_cents DESC, suppkey) AS rk
      |  FROM rev)
      |SELECT nationkey, CAST(rk AS BIGINT) AS rk, suppkey, rev_cents
      |FROM r WHERE rk <= 3 ORDER BY nationkey, rk""".stripMargin

  // ------------------------------------------------ q57_share_of_total
  /** RATIO-TO-REPORT — each nation's share of its region's order
    * revenue in exact per-mille: the corpus collapses to |nations|
    * rows in one hash-agg (orders join the customer→nation dimension
    * path as broadcasts), and the share window runs over that
    * dimension frame — the denominator never re-scans the facts.
    * Integer share (rev·1000 div region total) keeps the division
    * engine-exact. */
  def q57(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey").as("nationkey"),
        col("n_regionkey").as("regionkey"))
    val rev = Tables.orders(spark, dir)
      .join(nat, col("o_custkey") === col("c_custkey"))
      .groupBy("regionkey", "nationkey")
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long"))
        .as("rev_cents"))
    rev.withColumn("share_pm",
        expr("rev_cents * 1000 div sum(rev_cents) over " +
          "(partition by regionkey)"))
      .reportSort("regionkey", "nationkey")
  }

  val q57Sql: String =
    """WITH rev AS (
      |  SELECT n_regionkey AS regionkey, n_nationkey AS nationkey,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT regionkey, nationkey, rev_cents,
      |  CAST(rev_cents * 1000 // SUM(rev_cents) OVER
      |    (PARTITION BY regionkey) AS BIGINT) AS share_pm
      |FROM rev ORDER BY regionkey, nationkey""".stripMargin

  // ------------------------------------------------- q58_order_streaks
  /** GAPS-AND-ISLANDS on the order calendar — per customer, maximal
    * runs of CONSECUTIVE order months (the classic streak/retention
    * question every warehouse asks): distinct (customer, month)
    * first (one hash-agg — the islands never see raw orders), then
    * the lag-based island id inside per-customer windows bounded by a
    * customer's own months, then a segment-level rollup: longest
    * streak and how many customers sustain ≥ 3 consecutive months.
    * Month index = 12·year + month keeps "consecutive" integer-exact
    * across year boundaries. */
  def q58(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cm = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("m"))
      .distinct()
    val byC = Window.partitionBy("ck").orderBy("m")
    val streaks = cm
      .withColumn("_new",
        when(col("m") - lag(col("m"), 1).over(byC) === 1, 0).otherwise(1))
      .withColumn("_isl", sum(col("_new")).over(
        byC.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("seg", "ck", "_isl")
      .agg(count(lit(1)).as("len"))
    streaks.groupBy("seg")
      .agg(max(col("len")).as("max_streak"),
        countDistinct(when(col("len") >= 3, col("ck"))).as("loyal_3mo"),
        count(lit(1)).as("n_streaks"))
      .reportSort("seg")
  }

  val q58Sql: String =
    """WITH cm AS (
      |  SELECT DISTINCT c_custkey AS ck, c_mktsegment AS seg,
      |    YEAR(CAST(o_orderdate AS DATE)) * 12 +
      |      MONTH(CAST(o_orderdate AS DATE)) AS m
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |lg AS (
      |  SELECT seg, ck, m,
      |    CASE WHEN m - LAG(m) OVER (PARTITION BY ck ORDER BY m) = 1
      |         THEN 0 ELSE 1 END AS nw
      |  FROM cm),
      |i AS (
      |  SELECT seg, ck, m,
      |    SUM(nw) OVER (PARTITION BY ck ORDER BY m) AS isl
      |  FROM lg),
      |s AS (
      |  SELECT seg, ck, isl, COUNT(*) AS len
      |  FROM i GROUP BY seg, ck, isl)
      |SELECT seg, CAST(MAX(len) AS BIGINT) AS max_streak,
      |  CAST(COUNT(DISTINCT CASE WHEN len >= 3 THEN ck END) AS BIGINT)
      |    AS loyal_3mo,
      |  COUNT(*) AS n_streaks
      |FROM s GROUP BY seg ORDER BY seg""".stripMargin

  // -------------------------------------------------- q59_grouping_id
  /** GROUPING SETS with the GROUPING_ID bitmask — the multi-grain
    * report cube's row-labeling contract: one pass emits the
    * (returnflag × linestatus), per-returnflag, and grand-total
    * grains, and grouping_id() tells every consumer which grain a row
    * belongs to (coalesced 'ALL' labels are ambiguous the moment a
    * real value collides). SQL surface — Dataset rollup trips the
    * ambiguous-self-join check; one corpus scan feeds all grains via
    * partial aggregation. */
  def q59(spark: SparkSession, dir: String): DataFrame = {
    val v = s"q59_li_${java.util.UUID.randomUUID().toString.take(8)}"
    Tables.lineitem(spark, dir).createOrReplaceTempView(v)
    val out = spark.sql(
      s"""SELECT grouping_id(l_returnflag, l_linestatus) AS gid,
         |  coalesce(l_returnflag, '(all)') AS returnflag,
         |  coalesce(l_linestatus, '(all)') AS linestatus,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS qty
         |FROM $v
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |  (l_returnflag), ())""".stripMargin)
      .reportSort("gid", "returnflag", "linestatus") // see q12
    spark.catalog.dropTempView(v)
    out
  }

  val q59Sql: String =
    """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), ())
      |ORDER BY gid, returnflag, linestatus""".stripMargin

  // ------------------------------------------------- q60_mom_change
  /** MONTH-OVER-MONTH growth per segment — the KPI-report staple done
    * the exact-integer way: one hash-agg collapses orders to the
    * |segment × month| frame, the lag window runs on THAT frame (never
    * the facts), and growth is rev·1000 div prev — per-mille integer,
    * no float ratio to reconcile. First month per segment (no prior)
    * is excluded rather than null-coalesced to a fake 0%. */
  def q60(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("m"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long"))
        .as("rev_cents"))
    m.withColumn("_prev",
        lag(col("rev_cents"), 1).over(
          Window.partitionBy("seg").orderBy("m")))
      .filter(col("_prev").isNotNull)
      .select(col("seg"), col("m").cast("long").as("month_idx"),
        col("rev_cents"),
        // +1e7·prev shift before the div: truncating (Spark) and
        // flooring (DuckDB) integer division agree on negative growth
        expr("((rev_cents - _prev) * 1000 + _prev * 10000000L) " +
          "div _prev - 10000000L").as("mom_pm"))
      .orderBy("seg", "month_idx")
  }

  val q60Sql: String =
    """WITH m AS (
      |  SELECT c_mktsegment AS seg,
      |    YEAR(CAST(o_orderdate AS DATE)) * 12 +
      |      MONTH(CAST(o_orderdate AS DATE)) AS m,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |lg AS (
      |  SELECT seg, m, rev_cents,
      |    LAG(rev_cents) OVER (PARTITION BY seg ORDER BY m) AS prev
      |  FROM m)
      |SELECT seg, CAST(m AS BIGINT) AS month_idx, rev_cents,
      |  CAST(((rev_cents - prev) * 1000 + prev * 10000000) // prev
      |    - 10000000 AS BIGINT) AS mom_pm
      |FROM lg WHERE prev IS NOT NULL
      |ORDER BY seg, month_idx""".stripMargin

  // ---------------------------------------------- q61_max_drawdown
  /** MAX DRAWDOWN over the cumulative revenue series per segment —
    * the risk-analytics classic (largest peak-to-trough drop) applied
    * to the revenue run-rate: one hash-agg collapses orders to the
    * |segment × month| frame; the cumulative series, its running
    * peak, and the drawdown are three window passes over THAT frame.
    * Exact integer cents end to end; the report row per segment
    * carries the worst drawdown, when it bottomed, and the peak it
    * fell from. */
  def q61(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("m"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long") -
        (dec(col("o_totalprice")) * 100).cast("long") * 2 *
        (col("o_orderkey") % 2)).as("flow_cents"))
    val byS = Window.partitionBy("seg").orderBy("m")
      .rowsBetween(Window.unboundedPreceding, 0)
    val dd = m
      .withColumn("cum", sum(col("flow_cents")).over(byS))
      .withColumn("peak", max(col("cum")).over(byS))
      .withColumn("draw", col("peak") - col("cum"))
    dd.groupBy("seg")
      .agg(max(col("draw")).as("max_drawdown_cents"),
        max(struct(col("draw"), col("m").cast("long").as("m"),
          col("peak"))).as("_at"))
      .select(col("seg"), col("max_drawdown_cents"),
        col("_at.m").as("trough_month_idx"),
        col("_at.peak").as("peak_cents"))
      .reportSort("seg")
  }

  val q61Sql: String =
    """WITH m AS (
      |  SELECT c_mktsegment AS seg,
      |    YEAR(CAST(o_orderdate AS DATE)) * 12 +
      |      MONTH(CAST(o_orderdate AS DATE)) AS m,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |        AS BIGINT) * (1 - 2 * (o_orderkey % 2)))
      |      AS BIGINT) AS flow_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT seg, m, flow_cents,
      |    SUM(flow_cents) OVER (PARTITION BY seg ORDER BY m) AS cum
      |  FROM m),
      |p AS (
      |  SELECT seg, m, cum,
      |    MAX(cum) OVER (PARTITION BY seg ORDER BY m) AS peak
      |  FROM c),
      |r AS (
      |  SELECT seg, peak - cum AS draw, m, peak,
      |    ROW_NUMBER() OVER (PARTITION BY seg
      |      ORDER BY peak - cum DESC, m DESC, peak DESC) AS rn
      |  FROM p)
      |SELECT seg, CAST(draw AS BIGINT) AS max_drawdown_cents,
      |  CAST(m AS BIGINT) AS trough_month_idx,
      |  CAST(peak AS BIGINT) AS peak_cents
      |FROM r WHERE rn = 1 ORDER BY seg""".stripMargin

  // ---------------------------------------------- q65_cohort_revenue
  /** COHORT REVENUE TRIANGLE — the subscription-analytics classic
    * (each signup-month cohort's revenue laid out by months-since-
    * first-order): one hash-agg collapses orders to each customer's
    * first month; a key-join tags every order with its cohort; the
    * triangle is a second |cohorts × offsets| hash-agg with an exact
    * distinct-active count per cell (Catalyst Expand — one extra
    * corpus pass, bounded output). No window ever touches the fact
    * table, and the triangle frame is time-range², not corpus-sized.
    * Exact integer cents. */
  def q65(spark: SparkSession, dir: String): DataFrame = {
    val om = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("m"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
    val cohort = om.groupBy("o_custkey").agg(min(col("m")).as("cm"))
    om.join(cohort, "o_custkey")
      .groupBy(col("cm").cast("long").as("cohort_month"),
        (col("m") - col("cm")).cast("long").as("month_offset"))
      .agg(countDistinct(col("o_custkey")).as("n_active"),
        count(lit(1)).as("n_orders"),
        sum(col("cents")).as("rev_cents"))
      .orderBy("cohort_month", "month_offset")
  }

  val q65Sql: String =
    """WITH om AS (
      |  SELECT o_custkey, o_orderkey,
      |    YEAR(CAST(o_orderdate AS DATE)) * 12 +
      |      MONTH(CAST(o_orderdate AS DATE)) AS m,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |c AS (SELECT o_custkey, MIN(m) AS cm FROM om GROUP BY 1)
      |SELECT CAST(cm AS BIGINT) AS cohort_month,
      |  CAST(m - cm AS BIGINT) AS month_offset,
      |  COUNT(DISTINCT om.o_custkey) AS n_active,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(cents) AS BIGINT) AS rev_cents
      |FROM om JOIN c ON om.o_custkey = c.o_custkey
      |GROUP BY 1, 2 ORDER BY cohort_month, month_offset""".stripMargin

  // ---------------------------------------------- q62_abc_pareto
  /** ABC/PARETO inventory classification (the 80/15/5 revenue rule):
    * parts ranked by revenue, class A = parts whose cumulative share
    * stays within 800‰, B within 950‰, C the tail. One map-side-
    * combining hash-agg collapses the fact table to the |part| frame
    * FIRST. Parts are NOT bounded — TPC-H grows them with SF (200k
    * per SF), so a single-partition cumulative window over the part
    * frame would be a global dimension sort at 100 TB. The running
    * revenue instead rides [[OrderStats.twoLevelRunningSum]]:
    * contiguous revenue-range shards (width 2^20 cents, negated so
    * shard order matches the revenue-desc rank order), a local
    * running sum per shard, and exclusive prefix offsets over the
    * aggregated per-shard totals — no corpus- or dimension-
    * proportional window partition anywhere. Exact integer cents;
    * shares in per-mille by integer division, total via a broadcast
    * 1-row reaggregation of the part frame (AQE reuses the part-agg
    * exchange — lineitem is scanned once). */
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("long"))
        .as("rev_cents"))
      // |parts| frame, two consumers (total + ranking): pin it so the
      // total never re-scans the fact table
      .cut
    val total = perPart.agg(sum(col("rev_cents")).as("tot"))
    OrderStats.twoLevelRunningSum(perPart, Nil,
        Seq(expr("(0 - rev_cents) div 1048576")),
        Seq(col("rev_cents").desc, col("l_partkey")),
        col("rev_cents"), "cum")
      .crossJoin(broadcast(total))
      .withColumn("abc_class",
        when(expr("cum * 1000 div tot") <= 800, "A")
          .when(expr("cum * 1000 div tot") <= 950, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev_cents")).as("rev_cents"),
        max(expr("rev_cents * 1000 div tot")).as("max_part_share_pm"),
        max(col("tot")).as("_tot"))
      .select(col("abc_class"), col("n_parts"), col("rev_cents"),
        expr("rev_cents * 1000 div _tot").as("class_share_pm"),
        col("max_part_share_pm"))
      .reportSort("abc_class")
  }

  val q62Sql: String =
    """WITH p AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT l_partkey, rev_cents,
      |    SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey) AS cum,
      |    SUM(rev_cents) OVER () AS tot
      |  FROM p),
      |k AS (
      |  SELECT rev_cents, tot,
      |    CASE WHEN cum * 1000 // tot <= 800 THEN 'A'
      |         WHEN cum * 1000 // tot <= 950 THEN 'B'
      |         ELSE 'C' END AS abc_class
      |  FROM c)
      |SELECT abc_class, COUNT(*) AS n_parts,
      |  CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
      |  CAST(SUM(rev_cents) * 1000 // MAX(tot) AS BIGINT)
      |    AS class_share_pm,
      |  CAST(MAX(rev_cents * 1000 // tot) AS BIGINT)
      |    AS max_part_share_pm
      |FROM k GROUP BY abc_class ORDER BY abc_class""".stripMargin

  // ---------------------------------------------- q63_rfm_segments
  /** RFM CUSTOMER SEGMENTATION (recency / frequency / monetary
    * quintiles — the classic CRM cohorting): one hash-agg collapses
    * orders to the |customer| frame (last order day, order count,
    * lifetime cents). Customers are NOT bounded (TPC-H grows them
    * 150k per SF), so the three quintile scores do NOT run as
    * unpartitioned `ntile` windows over the customer frame: each
    * metric's EXACT (value desc, custkey) rank comes from
    * [[OrderStats.twoLevelRunningSum]] — recency and frequency shard
    * on (exact negated value, custkey-range) so even a maximally
    * tied day/count keeps window partitions ≤ 8192 rows; monetary
    * shards on contiguous negated-cents ranges (near-unique values,
    * the mask_shuffle width contract) — and the quintile index is
    * then PURE ARITHMETIC on (rank, n): NTILE(5)'s exact sizing
    * (first n%5 tiles hold ⌈n/5⌉) applied to the total-order rank,
    * with n a broadcast 1-row count. Identical values to the ntile
    * oracle, zero corpus- or dimension-proportional sorts. */
  def q63(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max(datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
          .as("last_day"),
        count(lit(1)).as("n_orders"),
        sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
      // |customer| frame, two consumers (rank chain + n): pin it so
      // the count never re-scans the fact table
      .cut
    val ckBucket = expr("o_custkey div 8192")
    def rankOf(df: DataFrame, metric: String, shards: Seq[Column],
        out: String): DataFrame =
      OrderStats.twoLevelRunningSum(df, Nil, shards,
        Seq(col(metric).desc, col("o_custkey")), lit(1L), out)
    val ranked = rankOf(
      rankOf(
        rankOf(perCust, "last_day",
          Seq(lit(0L) - col("last_day"), ckBucket), "_rr"),
        "n_orders", Seq(lit(0L) - col("n_orders"), ckBucket), "_fr"),
      "cents", Seq(expr("(0 - cents) div 1048576")), "_mr")
    val n = perCust.agg(count(lit(1)).as("n"))
    // NTILE(k) from the exact 1-based rank: q = n div k tiles of
    // size q+1 for the first rem = n % k tiles, size q after. The
    // greatest(q, 1) guard is unreachable arithmetic (rank >
    // rem*(q+1) implies q ≥ 1) kept so ANSI division can never trip.
    def tileOf(rk: String): Column = expr(
      s"CASE WHEN $rk <= (n % 5) * (n div 5 + 1)" +
        s" THEN ($rk - 1) div (n div 5 + 1) + 1" +
        s" ELSE n % 5 + ($rk - (n % 5) * (n div 5 + 1) - 1)" +
        s" div greatest(n div 5, 1) + 1 END")
    ranked.crossJoin(broadcast(n))
      .withColumn("r", tileOf("_rr"))
      .withColumn("f", tileOf("_fr"))
      .withColumn("m", tileOf("_mr"))
      .groupBy((col("r") * 100 + col("f") * 10 + col("m"))
        .cast("long").as("rfm_segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("cents"),
        sum(col("n_orders")).as("n_orders"))
      .orderBy("rfm_segment")
  }

  val q63Sql: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |    MAX(DATEDIFF('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE))) AS last_day,
      |    COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |s AS (
      |  SELECT cents, n_orders,
      |    NTILE(5) OVER (ORDER BY last_day DESC, o_custkey) AS r,
      |    NTILE(5) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
      |    NTILE(5) OVER (ORDER BY cents DESC, o_custkey) AS m
      |  FROM c)
      |SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_segment,
      |  COUNT(*) AS n_customers, CAST(SUM(cents) AS BIGINT) AS cents,
      |  CAST(SUM(n_orders) AS BIGINT) AS n_orders
      |FROM s GROUP BY 1 ORDER BY rfm_segment""".stripMargin

  // ---------------------------------------------- q64_hist2d
  /** 2-D EQUI-WIDTH HISTOGRAM (the heatmap binning behind every
    * quantity×discount pricing matrix): fixed value grids on both
    * axes — quantity in 5-unit bins, discount in 20-milli bins — so
    * cells stay comparable across runs (the same fixed-grid contract
    * as `cls_psi_drift`). ONE corpus scan → |cells| hash-agg (≤ ~66
    * cells); the per-mille share column reaggregates the CELL frame
    * against its own broadcast total, so the second exchange is
    * cell-sized, never corpus-sized. */
  def q64(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .groupBy(
        floor((col("l_quantity") - 1) / 5).cast("long").as("qty_bin"),
        floor(col("l_discount") * 1000 / 20).cast("long").as("disc_bin"))
      .agg(count(lit(1)).as("n_rows"),
        sum((dec(col("l_extendedprice")) * 100).cast("long"))
          .as("rev_cents"))
      // ≤66-cell frame, two consumers: pin it (clsMutualInfo play)
      .cut
    val total = cells.agg(sum(col("n_rows")).as("tot"))
    cells
      .crossJoin(broadcast(total))
      .select(col("qty_bin"), col("disc_bin"), col("n_rows"),
        col("rev_cents"),
        expr("n_rows * 1000 div tot").as("row_share_pm"))
      .reportSort("qty_bin", "disc_bin")
  }

  val q64Sql: String =
    """WITH c AS (
      |  SELECT CAST(FLOOR((l_quantity - 1) / 5) AS BIGINT) AS qty_bin,
      |    CAST(FLOOR(l_discount * 1000 / 20) AS BIGINT) AS disc_bin,
      |    COUNT(*) AS n_rows,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT qty_bin, disc_bin, n_rows, rev_cents,
      |  CAST(n_rows * 1000 // SUM(n_rows) OVER () AS BIGINT)
      |    AS row_share_pm
      |FROM c ORDER BY qty_bin, disc_bin""".stripMargin

  // ------------------------------------------- q66_interval_coverage
  /** INTERVAL-UNION COVERAGE (the sweep-line classic: total covered
    * time per user when each event opens a 5-minute activity window
    * and windows overlap): the running-max-end window detects island
    * starts, islands aggregate to contiguous spans, spans aggregate
    * to the per-user panel. The ONLY window is partitioned by
    * `user_id` — per-user event history is the bounded axis at
    * 100 TB (users grow, per-user rows don't), so no corpus-wide
    * sort exists anywhere in the plan. Exact integer microseconds
    * end to end; half-open [s, s+300s) intervals, an island breaks
    * only when a gap is strictly positive. */
  def q66(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("s"))
      .withColumn("e", col("s") + lit(300000000L))
    val byU = Window.partitionBy("user_id").orderBy("s", "event_id")
    val prevMax = max(col("e"))
      .over(byU.rowsBetween(Window.unboundedPreceding, -1))
    val isl = ev
      .withColumn("new_isl",
        when(prevMax.isNull.or(col("s") > prevMax), 1L).otherwise(0L))
      .withColumn("isl_id", sum(col("new_isl"))
        .over(byU.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "isl_id")
      .agg(min(col("s")).as("st"), max(col("e")).as("en"),
        count(lit(1)).as("n_ev"))
    isl.groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("en") - col("st")).as("covered_us"),
        max(col("en") - col("st")).as("max_island_us"),
        sum(col("n_ev")).as("n_events"))
      .orderBy("user_id")
  }

  val q66Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 300000000 AS e
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, s, e,
      |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |  FROM ev),
      |f AS (
      |  SELECT user_id, event_id, s, e,
      |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
      |  FROM m),
      |i AS (
      |  SELECT user_id, s, e,
      |    SUM(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      |  FROM f),
      |g AS (
      |  SELECT user_id, isl, MIN(s) AS st, MAX(e) AS en,
      |    COUNT(*) AS n_ev
      |  FROM i GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_islands,
      |  CAST(SUM(en - st) AS BIGINT) AS covered_us,
      |  CAST(MAX(en - st) AS BIGINT) AS max_island_us,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------- q67_bitmap_distinct
  /** BITMAP-WORD DISTINCT COUNT — COUNT(DISTINCT key) rebuilt as an
    * ASSOCIATIVE aggregate (the roaring-bitmap trick in 64-bit
    * words): keys bucket into `key div 64` words, `bit_or` folds the
    * one-hot masks, `bit_count` pops the result. Because bit_or is
    * associative+commutative, partial aggregation combines map-side
    * — the shuffle carries |groups × live words| words, never raw
    * keys, and re-aggregating coarser grains later needs only more
    * OR-folds (distinct counts themselves never add). The contract a
    * 100 TB rollup cube wants: one corpus pass, mergeable state. */
  def q67(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        expr("l_partkey div 64").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(l_partkey % 64 as int)))")
        .as("bits"))
    words.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_words"),
        sum(bit_count(col("bits")).cast("long")).as("n_distinct_parts"))
      .reportSort("l_returnflag", "l_linestatus")
  }

  val q67Sql: String =
    """WITH w AS (
      |  SELECT l_returnflag, l_linestatus, l_partkey // 64 AS w,
      |    BIT_OR(CASE WHEN l_partkey % 64 = 63
      |      THEN CAST(-9223372036854775808 AS BIGINT)
      |      ELSE CAST(1 AS BIGINT) << CAST(l_partkey % 64 AS INT)
      |      END) AS bits
      |  FROM lineitem GROUP BY 1, 2, 3)
      |SELECT l_returnflag, l_linestatus, COUNT(*) AS n_words,
      |  CAST(SUM(BIT_COUNT(bits)) AS BIGINT) AS n_distinct_parts
      |FROM w GROUP BY 1, 2
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------- q68_decay_weighted
  /** TIME-DECAYED REVENUE (the freshness-weighted KPI): weekly
    * half-life decay done in EXACT integer arithmetic — weight =
    * 1024 >> weeks_ago (zero past 10 weeks), so the decayed sum is a
    * plain integer aggregate with no float drift to reconcile across
    * engines. The anchor (corpus max order day) is a 1-row broadcast
    * reaggregation; facts fold in one map-side-combining hash-agg.
    * Rebuilding "recency-weighted revenue share" this way keeps the
    * metric additive: shards compute partial decayed sums against
    * the shared anchor and merge by +. */
  def q68(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
    val anchor = ord.agg(max(col("day")).as("anchor_day"))
    ord.crossJoin(broadcast(anchor))
      .withColumn("weeks",
        least(expr("(anchor_day - day) div 7"), lit(11L)))
      .withColumn("wt",
        expr("shiftright(1024L, cast(weeks as int))"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents")).as("rev_cents"),
        sum(col("cents") * col("wt")).as("decayed_1024"),
        sum(col("wt")).as("wt_sum"))
      .select(col("seg"), col("n_orders"), col("rev_cents"),
        col("decayed_1024"),
        expr("decayed_1024 * 1000 div (rev_cents * 1024)")
          .as("freshness_pm"),
        col("wt_sum"))
      .reportSort("seg")
  }

  val q68Sql: String =
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |    DATEDIFF('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS day,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |a AS (SELECT MAX(day) AS anchor_day FROM o),
      |w AS (
      |  SELECT seg, cents,
      |    CAST(1024 AS BIGINT) >>
      |      CAST(LEAST((anchor_day - day) // 7, 11) AS INT) AS wt
      |  FROM o CROSS JOIN a)
      |SELECT seg, COUNT(*) AS n_orders,
      |  CAST(SUM(cents) AS BIGINT) AS rev_cents,
      |  CAST(SUM(cents * wt) AS BIGINT) AS decayed_1024,
      |  CAST(SUM(cents * wt) * 1000 // (SUM(cents) * 1024) AS BIGINT)
      |    AS freshness_pm,
      |  CAST(SUM(wt) AS BIGINT) AS wt_sum
      |FROM w GROUP BY seg ORDER BY seg""".stripMargin

  // ---------------------------------------------- q69_bitmap_rollup
  /** BITMAP ROLLUP — the property COUNT(DISTINCT) lacks and
    * [[q67]]'s words have: distinct counts don't add across grains,
    * but bitmap words OR-MERGE, so the fine-grain word state answers
    * EVERY coarser grain without touching the corpus again. One
    * corpus pass builds (returnflag × linestatus × word) words; the
    * rollup re-ORs them to per-returnflag and grand-total grains and
    * pops each — three grains, one scan, and the word frames are the
    * only shuffles. The 100 TB cube contract: materialize mergeable
    * state once, serve all grains from it. */
  def q69(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        expr("l_partkey div 64").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(l_partkey % 64 as int)))")
        .as("bits"))
      .cut // fine-grain word state, 3 grain consumers
    val fine = words.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(expr("bit_count(bits)")).cast("long").as("n_distinct"))
      .select(lit(0L).as("gid"), col("l_returnflag"),
        col("l_linestatus"), col("n_distinct"))
    val mid = words.groupBy(col("l_returnflag"), col("w"))
      .agg(expr("bit_or(bits)").as("bits"))
      .groupBy("l_returnflag")
      .agg(sum(expr("bit_count(bits)")).cast("long").as("n_distinct"))
      .select(lit(1L).as("gid"), col("l_returnflag"),
        lit("(all)").as("l_linestatus"), col("n_distinct"))
    val top = words.groupBy(col("w"))
      .agg(expr("bit_or(bits)").as("bits"))
      .agg(sum(expr("bit_count(bits)")).cast("long").as("n_distinct"))
      .select(lit(3L).as("gid"), lit("(all)").as("l_returnflag"),
        lit("(all)").as("l_linestatus"), col("n_distinct"))
    fine.unionByName(mid).unionByName(top)
      .reportSort("gid", "l_returnflag", "l_linestatus")
  }

  val q69Sql: String =
    """WITH f AS (
      |  SELECT CAST(0 AS BIGINT) AS gid, l_returnflag, l_linestatus,
      |    COUNT(DISTINCT l_partkey) AS n_distinct
      |  FROM lineitem GROUP BY 2, 3),
      |m AS (
      |  SELECT CAST(1 AS BIGINT) AS gid, l_returnflag,
      |    '(all)' AS l_linestatus, COUNT(DISTINCT l_partkey)
      |      AS n_distinct
      |  FROM lineitem GROUP BY 2),
      |t AS (
      |  SELECT CAST(3 AS BIGINT) AS gid, '(all)' AS l_returnflag,
      |    '(all)' AS l_linestatus, COUNT(DISTINCT l_partkey)
      |      AS n_distinct
      |  FROM lineitem)
      |SELECT * FROM f UNION ALL SELECT * FROM m UNION ALL
      |SELECT * FROM t
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------- q70_basket_lift
  /** MARKET-BASKET LIFT at brand grain (the co-occurrence affinity
    * mining behind every "bought together" panel): an order's DISTINCT
    * brand set pair-explodes WITHIN the order — the per-order fanout
    * is C(brands-in-order, 2) ≤ C(25, 2), bounded by the brand domain
    * regardless of corpus size, so the pair join is an equi-join on
    * l_orderkey with order-bounded multiplicity, never an all-pairs
    * pass. Lift = observed co-rate over independence:
    * n_pair·N / (n_b1·n_b2), emitted in exact per-mille via
    * DECIMAL(38) intermediates (n_pair·N·1000 exceeds 2^63 once
    * orders pass ~3e9 rows; the decimal product keeps 38-digit
    * headroom and the final `div` floors on positives in both
    * engines, CAST to BIGINT — the r12 oracle-typing rule). Output ≤
    * C(25,2) rows: pin the |orders×brands| frame once (3 consumers:
    * pairs, marginals, total), everything downstream is
    * dimension-sized. */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    val ob = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .distinct()
      .cut
    val total = ob.agg(countDistinct(col("o")).as("n_orders"))
    val marg = ob.groupBy("b").agg(count(lit(1)).as("c"))
    val pairs = ob.select(col("o"), col("b").as("brand1"))
      .join(ob.select(col("o"), col("b").as("brand2")), "o")
      .filter(col("brand1") < col("brand2"))
      .groupBy("brand1", "brand2")
      .agg(count(lit(1)).as("n_pair"))
    pairs
      .join(broadcast(marg.select(col("b").as("brand1"),
        col("c").as("n_b1"))), "brand1")
      .join(broadcast(marg.select(col("b").as("brand2"),
        col("c").as("n_b2"))), "brand2")
      .crossJoin(broadcast(total))
      .select(col("brand1"), col("brand2"), col("n_pair"),
        col("n_b1"), col("n_b2"),
        expr("CAST((CAST(n_pair AS DECIMAL(38,0)) * n_orders * 1000)" +
          " div (CAST(n_b1 AS DECIMAL(38,0)) * n_b2) AS BIGINT)")
          .as("lift_pm"))
      .reportSort("brand1", "brand2")
  }

  val q70Sql: String =
    """WITH ob AS (
      |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM ob),
      |nb AS (SELECT b, COUNT(*) AS c FROM ob GROUP BY b),
      |p AS (
      |  SELECT a.b AS brand1, bb.b AS brand2, COUNT(*) AS n_pair
      |  FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
      |  GROUP BY 1, 2)
      |SELECT brand1, brand2, n_pair,
      |  n1.c AS n_b1, n2.c AS n_b2,
      |  CAST((CAST(n_pair AS HUGEINT) * n.n_orders * 1000)
      |    // (CAST(n1.c AS HUGEINT) * n2.c) AS BIGINT) AS lift_pm
      |FROM p
      |JOIN nb n1 ON n1.b = brand1
      |JOIN nb n2 ON n2.b = brand2
      |CROSS JOIN n
      |ORDER BY brand1, brand2""".stripMargin

  // ------------------------------------------------- q71_skyline
  /** SKYLINE / PARETO-FRONTIER query (Börzsönyi 2001's operator, the
    * "cheapest AND smallest" multi-criteria shortlist): per brand,
    * the set of (price, size) points no other same-brand part
    * dominates (≤ on both axes, < on at least one). The corpus never
    * meets itself: one hash-agg collapses parts to the
    * (brand, price_cents, size) CELL frame (domain-bounded — TPC-H
    * prices span ~10k distinct cents × 50 sizes), a second collapses
    * to per-price min size (`min_by` carries the cell count), and
    * dominance resolves with ONE strict-prefix running min in price
    * order via [[OrderStats.twoLevelStrictPrefixMin]] — a frontier
    * point survives iff no strictly-cheaper price achieved its size
    * or better. No dominance pair join, no unpartitioned window (the
    * price-range shards keep every window partition range-bounded
    * even if the price domain widened with the catalog). Exact
    * integer cents (the q62 idiom). R12bOpsSpec pins frontier
    * minimality + the naive NOT-EXISTS equivalence. */
  def q71(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.part(spark, dir)
      .select(col("p_brand").as("brand"),
        (dec(col("p_retailprice")) * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("sz"))
      .groupBy("brand", "price_cents", "sz")
      .agg(count(lit(1)).as("n"))
    val frontier = cells
      .groupBy("brand", "price_cents")
      .agg(min(col("sz")).as("min_size"),
        expr("min_by(n, sz)").as("n_parts"))
    OrderStats.twoLevelStrictPrefixMin(frontier, Seq("brand"),
        Seq(expr("price_cents div 1024")), Seq(col("price_cents")),
        col("min_size"), "_mlt")
      .filter(col("_mlt").isNull || col("_mlt") > col("min_size"))
      .select("brand", "price_cents", "min_size", "n_parts")
      .orderBy("brand", "price_cents")
  }

  val q71Sql: String =
    """WITH cell AS (
      |  SELECT p_brand AS brand,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_cents,
      |    CAST(p_size AS BIGINT) AS sz, COUNT(*) AS n
      |  FROM part GROUP BY 1, 2, 3),
      |f AS (
      |  SELECT brand, price_cents, MIN(sz) AS min_size,
      |    MIN_BY(n, sz) AS n_parts
      |  FROM cell GROUP BY 1, 2),
      |w AS (
      |  SELECT brand, price_cents, min_size, n_parts,
      |    MIN(min_size) OVER (PARTITION BY brand ORDER BY price_cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mlt
      |  FROM f)
      |SELECT brand, price_cents, min_size,
      |  CAST(n_parts AS BIGINT) AS n_parts
      |FROM w WHERE mlt IS NULL OR mlt > min_size
      |ORDER BY brand, price_cents""".stripMargin

  // ------------------------------------------- q72_apportionment
  /** LARGEST-REMAINDER (Hamilton) APPORTIONMENT — allocate a FIXED
    * integer budget (1000 seats) across nations proportional to
    * order revenue, exactly: floor every quota, then hand the
    * leftover seats to the largest fractional remainders. This is
    * the integer-exact allocator a sampling/budget planner needs
    * when proportional shares must sum EXACTLY to the budget (a
    * per-cell `round()` under- or over-shoots; largest remainder
    * never does — Σseats = 1000 by construction, and every seat
    * count is within 1 of its real-valued quota). Shape: one fact
    * shuffle (orders ⋈ customer on custkey, group by nation) down
    * to the CONSTANT 25-row nation frame; the remainder rank runs
    * on that frame (unlike q62's parts or q63's customers, nations
    * do NOT scale with SF — the single-partition window is
    * constant-size forever). Quota products lift to DECIMAL(38):
    * rev_cents·10⁶ overflows int64 past ~SF 4e4. R12dOpsSpec pins
    * Σ=1000, the ±1-of-quota bound, and a naive replay. */
  def q72(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg((sum(dec(col("o_totalprice"))) * 100).cast("long")
        .as("rev_cents"))
    val tot = rev.agg(sum(col("rev_cents")).as("_t"))
    val q = rev.crossJoin(broadcast(tot))
      .select(col("nationkey"), col("rev_cents"),
        expr("CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000 div _t" +
          " AS BIGINT)").as("base_seats"),
        expr("CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000 % _t" +
          " AS BIGINT)").as("_rem"),
        expr("CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000000 div _t" +
          " AS BIGINT)").as("quota_milli"))
    val short = q.agg((lit(1000L) - sum(col("base_seats"))).as("_k"))
    q.crossJoin(broadcast(short))
      // constant 25-row frame: nations never scale with SF, so this
      // single-partition rank is NOT the q62/q63 dimension-sort trap
      .withColumn("_rk", row_number().over(
        Window.orderBy(desc("_rem"), col("nationkey"))))
      .select(col("nationkey"), col("rev_cents"), col("quota_milli"),
        (col("base_seats") +
          when(col("_rk") <= col("_k"), 1L).otherwise(0L)).as("seats"))
      .withColumn("err_milli", col("seats") * 1000 - col("quota_milli"))
      .reportSort("nationkey")
  }

  val q72Sql: String =
    """WITH rev AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |      AS BIGINT) AS rev_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |t AS (SELECT SUM(rev_cents) AS t FROM rev),
      |q AS (
      |  SELECT nationkey, rev_cents,
      |    CAST(CAST(rev_cents AS HUGEINT) * 1000 // t AS BIGINT)
      |      AS base_seats,
      |    CAST(CAST(rev_cents AS HUGEINT) * 1000 % t AS BIGINT)
      |      AS rem,
      |    CAST(CAST(rev_cents AS HUGEINT) * 1000000 // t AS BIGINT)
      |      AS quota_milli
      |  FROM rev CROSS JOIN t),
      |k AS (SELECT 1000 - SUM(base_seats) AS k FROM q),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, nationkey)
      |    AS rk
      |  FROM q)
      |SELECT nationkey, rev_cents, quota_milli,
      |  base_seats + CASE WHEN rk <= k.k THEN 1 ELSE 0 END AS seats,
      |  (base_seats + CASE WHEN rk <= k.k THEN 1 ELSE 0 END) * 1000
      |    - quota_milli AS err_milli
      |FROM r CROSS JOIN k ORDER BY nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_apportionment" -> (q72 _),
    "q71_skyline" -> (q71 _),
    "q70_basket_lift" -> (q70 _),
    "q69_bitmap_rollup" -> (q69 _),
    "q66_interval_coverage" -> (q66 _),
    "q67_bitmap_distinct" -> (q67 _),
    "q68_decay_weighted" -> (q68 _),
    "q62_abc_pareto" -> (q62 _),
    "q65_cohort_revenue" -> (q65 _),
    "q63_rfm_segments" -> (q63 _),
    "q64_hist2d" -> (q64 _),
    "q61_max_drawdown" -> (q61 _),
    "q60_mom_change" -> (q60 _),
    "q56_top_n_per_group" -> (q56 _),
    "q57_share_of_total" -> (q57 _),
    "q58_order_streaks" -> (q58 _),
    "q59_grouping_id" -> (q59 _),
    "q36_mad" -> (q36 _),
    "q37_unpivot" -> (q37 _),
    "q38_band_join" -> (q38 _),
    "q39_weighted_median" -> (q39 _),
    "q40_skyline" -> (q40 _),
    "q41_mode" -> (q41 _),
    "q42_quantile_panel" -> (q42 _),
    "q43_join_cardinality" -> (q43 _),
    "q44_eager_agg" -> (q44 _),
    "q45_countmin" -> (q45 _),
    "q46_cumulative_distinct" -> (q46 _),
    "q47_gains_table" -> (q47 _),
    "q48_semi_additive" -> (q48 _),
    "q49_bloom_prune_join" -> (q49 _),
    "q50_exists_chain" -> (q50 _),
    "q51_kmv_setops" -> (q51 _),
    "q53_null_semantics" -> (q53 _),
    "q54_listagg" -> (q54 _),
    "q55_equidepth_hist" -> (q55 _),
    "q52_percentile_cont" -> (q52 _),
    "q31_kmv_distinct" -> (q31 _),
    "q32_window_suite" -> (q32 _),
    "q33_recursive_cte" -> (q33 _),
    "q34_heavy_hitters" -> (q34 _),
    "q35_forward_fill" -> (q35 _),
    "q30_date_spine" -> (q30 _),
    "q29_percentile_bucketed" -> (q29 _),
    "q28_range_frame" -> (q28 _),
    "q01_agg" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_join_agg" -> (q03 _),
    "q04_semijoin" -> (q04 _),
    "q05_multijoin" -> (q05 _),
    "q06_selective" -> (q06 _),
    "q07_window_rank" -> (q07 _),
    "q08_window_lag" -> (q08 _),
    "q09_sort_limit" -> (q09 _),
    "q10_distinct" -> (q10 _),
    "q11_setops" -> (q11 _),
    "q12_rollup" -> (q12 _),
    "q13_outerjoin" -> (q13 _),
    "q14_pivot" -> (q14 _),
    "q15_scalar_subq" -> (q15 _),
    "q16_antijoin" -> (q16 _),
    "q17_correlated" -> (q17 _),
    "q18_having" -> (q18 _),
    "q19_expr" -> (q19 _),
    "q20_grouping_sets" -> (q20 _),
    "q21_string_scan" -> (q21 _),
    "q22_in_subquery" -> (q22 _),
    "q23_cube" -> (q23 _),
    "q24_running_sum" -> (q24 _),
    "q25_salted_join" -> (q25 _),
    "q26_bucketed_join" -> (q26 _),
    "q27_percentiles" -> (q27 _))

  val oracles: Map[String, String] = Map(
    "q72_apportionment" -> q72Sql,
    "q71_skyline" -> q71Sql,
    "q70_basket_lift" -> q70Sql,
    "q69_bitmap_rollup" -> q69Sql,
    "q66_interval_coverage" -> q66Sql,
    "q67_bitmap_distinct" -> q67Sql,
    "q68_decay_weighted" -> q68Sql,
    "q36_mad" -> q36Sql,
    "q37_unpivot" -> q37Sql,
    "q38_band_join" -> q38Sql,
    "q39_weighted_median" -> q39Sql,
    "q40_skyline" -> q40Sql,
    "q41_mode" -> q41Sql,
    "q42_quantile_panel" -> q42Sql,
    "q43_join_cardinality" -> q43Sql,
    "q44_eager_agg" -> q44Sql,
    "q45_countmin" -> q45Sql,
    "q46_cumulative_distinct" -> q46Sql,
    "q47_gains_table" -> q47Sql,
    "q48_semi_additive" -> q48Sql,
    "q49_bloom_prune_join" -> q49Sql,
    "q50_exists_chain" -> q50Sql,
    "q51_kmv_setops" -> q51Sql,
    "q53_null_semantics" -> q53Sql,
    "q54_listagg" -> q54Sql,
    "q55_equidepth_hist" -> q55Sql,
    "q60_mom_change" -> q60Sql,
    "q61_max_drawdown" -> q61Sql,
    "q62_abc_pareto" -> q62Sql,
    "q63_rfm_segments" -> q63Sql,
    "q64_hist2d" -> q64Sql,
    "q65_cohort_revenue" -> q65Sql,
    "q56_top_n_per_group" -> q56Sql,
    "q57_share_of_total" -> q57Sql,
    "q58_order_streaks" -> q58Sql,
    "q59_grouping_id" -> q59Sql,
    "q52_percentile_cont" -> q52Sql,
    "q31_kmv_distinct" -> q31Sql,
    "q32_window_suite" -> q32Sql,
    "q33_recursive_cte" -> q33Sql,
    "q34_heavy_hitters" -> q34Sql,
    "q35_forward_fill" -> q35Sql,
    "q30_date_spine" -> q30Sql,
    "q29_percentile_bucketed" -> q29Sql,
    "q28_range_frame" -> q28Sql,
    "q01_agg" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_semijoin" -> q04Sql,
    "q05_multijoin" -> q05Sql,
    "q06_selective" -> q06Sql,
    "q07_window_rank" -> q07Sql,
    "q08_window_lag" -> q08Sql,
    "q09_sort_limit" -> q09Sql,
    "q10_distinct" -> q10Sql,
    "q11_setops" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_outerjoin" -> q13Sql,
    "q14_pivot" -> q14Sql,
    "q15_scalar_subq" -> q15Sql,
    "q16_antijoin" -> q16Sql,
    "q17_correlated" -> q17Sql,
    "q18_having" -> q18Sql,
    "q19_expr" -> q19Sql,
    "q20_grouping_sets" -> q20Sql,
    "q21_string_scan" -> q21Sql,
    "q22_in_subquery" -> q22Sql,
    "q23_cube" -> q23Sql,
    "q24_running_sum" -> q24Sql,
    "q25_salted_join" -> q25Sql,
    "q26_bucketed_join" -> q26Sql,
    "q27_percentiles" -> q27Sql)
}
