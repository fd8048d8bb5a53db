package graft.classify

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.Syntax._

/** §2.3 classification operators as driver-verified queries. */
object ClassifyQueries extends QueryModule {

  private val lib = Libraries.default
  private val classifier = new Classifier(lib)

  /** First-match value classification over the library's pattern
    * classes (library order = precedence, like the reference's
    * first-match-wins loop). */
  private def classifyValue(c: Column): Column =
    lib.classes.filter(_.pattern.isDefined).foldRight(lit("UNCLASSIFIED")) {
      (dc, acc) => when(Matchers.contentMatches(c, dc.pattern.get), dc.name).otherwise(acc)
    }

  private def classifyValueSql(e: String): String = {
    val whens = lib.classes.filter(_.pattern.isDefined).map { dc =>
      s"WHEN regexp_matches($e, '^(?:${dc.pattern.get})$$') THEN '${dc.name}'"
    }
    s"CASE ${whens.mkString(" ")} ELSE 'UNCLASSIFIED' END"
  }

  // ------------------------------------------------- cls_name_match
  /** Metadata-only classification of two schemas — zero data scan, the
    * cheap first pass the reference applies per change event. */
  def clsNameMatch(spark: SparkSession, dir: String): DataFrame = {
    val rows = Seq("customer", "orders").flatMap { t =>
      classifier.classifySchema(Tables(spark, dir, t)).map {
        case (colName, dc) => (t, colName, dc.name)
      }
    }
    import spark.implicits._
    rows.toDF("table_name", "column_name", "data_class")
      .reportSort("table_name", "column_name")
  }

  val clsNameMatchSql: String =
    """SELECT * FROM (VALUES
      |  ('customer','c_acctbal','FINANCIAL'),
      |  ('customer','c_custkey','ID'),
      |  ('customer','c_mktsegment','SEGMENT'),
      |  ('customer','c_name','NAME'),
      |  ('customer','c_nationkey','ID'),
      |  ('orders','o_custkey','ID'),
      |  ('orders','o_orderdate','DATE'),
      |  ('orders','o_orderkey','ID'),
      |  ('orders','o_orderpriority','STATUS'),
      |  ('orders','o_orderstatus','STATUS'),
      |  ('orders','o_totalprice','FINANCIAL')
      |) AS t(table_name, column_name, data_class)
      |ORDER BY table_name, column_name""".stripMargin

  // ---------------------------------------------- cls_pattern_match
  /** Cell-level content classification of synthesized PII values. */
  def clsPatternMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_custkey") < 200)
    val email = concat(lower(regexp_replace(col("c_name"), "#", ".")),
      lit("@example.com"))
    val nine = lpad((col("c_custkey") * 2654435761L % 1000000000L).cast("string"), 9, "0")
    val ssn = concat(nine.substr(1, 3), lit("-"), nine.substr(4, 2), lit("-"),
      nine.substr(6, 4))
    val zip = lpad((col("c_custkey") % 100000).cast("string"), 5, "0")
    def one(kind: String, v: Column): DataFrame =
      c.select(col("c_custkey"), lit(kind).as("kind"), v.as("value"),
        classifyValue(v).as("data_class"))
    one("name", col("c_name"))
      .unionAll(one("email", email))
      .unionAll(one("ssn", ssn))
      .unionAll(one("zip", zip))
      .reportSort("c_custkey", "kind")
  }

  val clsPatternMatchSql: String = {
    val nine = "lpad(CAST(c_custkey * 2654435761 % 1000000000 AS VARCHAR), 9, '0')"
    s"""WITH c AS (SELECT * FROM customer WHERE c_custkey < 200),
       |vals AS (
       |  SELECT c_custkey, 'name' AS kind, c_name AS value FROM c
       |  UNION ALL
       |  SELECT c_custkey, 'email', lower(replace(c_name,'#','.')) || '@example.com' FROM c
       |  UNION ALL
       |  SELECT c_custkey, 'ssn',
       |    substr($nine,1,3) || '-' || substr($nine,4,2) || '-' || substr($nine,6,4) FROM c
       |  UNION ALL
       |  SELECT c_custkey, 'zip', lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') FROM c)
       |SELECT c_custkey, kind, value, ${classifyValueSql("value")} AS data_class
       |FROM vals ORDER BY c_custkey, kind""".stripMargin
  }

  // -------------------------------------------------- cls_set_match
  /** Set-file membership classification (SetMatcher), aggregated. */
  def clsSetMatch(spark: SparkSession, dir: String): DataFrame =
    classifier.setMatchCounts(Tables.customer(spark, dir), "c_mktsegment",
      Seq("BUILDING", "MACHINERY", "AUTOMOBILE"))
      .reportSort("c_mktsegment")

  val clsSetMatchSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_in_set
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------ cls_schema_scan
  /** Whole-table content scan: match rate of every (column, class) pair
    * in ONE aggregate pass (single scan at any scale). */
  def clsSchemaScan(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.customer(spark, dir).select(
      col("c_name"), col("c_mktsegment"),
      concat(lower(regexp_replace(col("c_name"), "#", ".")),
        lit("@example.com")).as("email"))
    classifier.contentMatchRates(src, Seq("c_name", "c_mktsegment", "email"))
      .reportSort("column_name", "data_class")
  }

  val clsSchemaScanSql: String = {
    val cols = Seq("c_name", "c_mktsegment", "email")
    val classes = lib.classes.filter(_.pattern.isDefined)
    val selects = for { c <- cols; dc <- classes } yield
      s"""SELECT '$c' AS column_name, '${dc.name}' AS data_class,
         |  CAST(SUM(CASE WHEN regexp_matches($c, '^(?:${dc.pattern.get})$$')
         |           THEN 1 ELSE 0 END) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS match_rate
         |FROM src""".stripMargin
    s"""WITH src AS (
       |  SELECT c_name, c_mktsegment,
       |    lower(replace(c_name,'#','.')) || '@example.com' AS email
       |  FROM customer)
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY column_name, data_class""".stripMargin
  }

  // ------------------------------------------------- cls_luhn_check
  /** Luhn validity of a digit-string column: Σ terms mod 10 == 0,
    * where the i-th digit from the RIGHT (0-based) contributes d when
    * i is even, else 2d (minus 9 when 2d > 9). Pure integer math —
    * portable bit-for-bit to the oracle engine. Public: the
    * Luhn-preserving mask re-validates its output with this. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val terms = transform(sequence(lit(1), n), i => {
      val d = digits.substr(i, lit(1)).cast("int")
      val fromRight = n - i
      when(fromRight % 2 === 0, d)
        .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
    })
    aggregate(terms, lit(0), (acc, v) => acc + v) % 10 === 0
  }

  /** Luhn checksum validation — the canonical content check behind
    * card-number data classes (a regex matches the SHAPE, Luhn
    * validates the VALUE; real PII discovery needs both). The digit
    * string under test derives deterministically from c_custkey, so
    * both engines see identical inputs. */
  def clsLuhnCheck(spark: SparkSession, dir: String): DataFrame = {
    val digits = (col("c_custkey") * 7919 + 123456).cast("string")
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), luhnValid(digits).as("ok"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ok"), 1).otherwise(0)).as("n_valid"))
      .reportSort("c_mktsegment")
  }

  val clsLuhnCheckSql: String = {
    val d = "CAST(substr(ds, i, 1) AS INTEGER)"
    s"""WITH dd AS (
       |  SELECT c_mktsegment,
       |    CAST(c_custkey * 7919 + 123456 AS VARCHAR) AS ds
       |  FROM customer),
       |t AS (
       |  SELECT c_mktsegment,
       |    (list_sum(list_transform(range(1, len(ds) + 1), i ->
       |       CASE WHEN (len(ds) - i) % 2 = 0 THEN $d
       |            ELSE CASE WHEN $d * 2 > 9 THEN $d * 2 - 9
       |                      ELSE $d * 2 END END)) % 10 = 0) AS ok
       |  FROM dd)
       |SELECT c_mktsegment, COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
       |FROM t GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  }

  // ------------------------------------------------- cls_text_pii
  /** Free-TEXT PII discovery over the training corpus — the reference
    * classifies structured cells; a data pipeline must also scan
    * unstructured document text, where PII is embedded mid-string
    * (find-within, not full-cell match). Synthetic PII is injected
    * deterministically (every 5th doc an email, every 7th an SSN) so
    * both engines scan identical text; the regexes use the
    * Java∩RE2-portable subset. One codegen scan + one agg shuffle. */
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ssnPat = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  def clsTextPii(spark: SparkSession, dir: String): DataFrame = {
    val nine = lpad((col("doc_id") * 2654435761L % 1000000000L).cast("string"),
      9, "0")
    val injected = concat(col("text"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" ref "), nine.substr(1, 3), lit("-"), nine.substr(4, 2),
          lit("-"), nine.substr(6, 4))).otherwise(lit("")))
    Tables.documents(spark, dir)
      .select(col("lang"), injected.as("v"))
      .select(col("lang"),
        size(regexp_extract_all(col("v"), lit(emailPat), lit(0))).as("ne"),
        size(regexp_extract_all(col("v"), lit(ssnPat), lit(0))).as("ns"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(col("ne")).as("email_hits"),
        sum(when(col("ns") > 0, 1L).otherwise(0L)).as("docs_with_ssn"),
        sum(col("ns")).as("ssn_hits"))
      .reportSort("lang")
  }

  val clsTextPiiSql: String = {
    val nine = "lpad(CAST(doc_id * 2654435761 % 1000000000 AS VARCHAR), 9, '0')"
    s"""WITH v AS (
       |  SELECT lang, text ||
       |    CASE WHEN doc_id % 5 = 0
       |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0
       |         THEN ' ref ' || substr($nine,1,3) || '-' || substr($nine,4,2)
       |              || '-' || substr($nine,6,4) ELSE '' END AS t
       |  FROM documents),
       |c AS (
       |  SELECT lang,
       |    len(regexp_extract_all(t, '$emailPat')) AS ne,
       |    len(regexp_extract_all(t, '$ssnPat')) AS ns
       |  FROM v)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       |  CAST(SUM(ne) AS BIGINT) AS email_hits,
       |  CAST(SUM(CASE WHEN ns > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ssn,
       |  CAST(SUM(ns) AS BIGINT) AS ssn_hits
       |FROM c GROUP BY lang ORDER BY lang""".stripMargin
  }

  // --------------------------------------------- cls_distinct_ratio
  /** Per-column distinct-value ratio (per-mille, exact integers) — the
    * key-likeness signal schema scanners use to tell identifiers from
    * categoricals before any regex runs (distinct_pm ≈ 1000 → key;
    * small → enum). ONE pass computes every column's distinct count
    * (Spark expands the multi-distinct agg); the per-column unpivot is
    * a zero-shuffle explode of the single result row. */
  def clsDistinctRatio(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    val agg = Tables.customer(spark, dir).agg(
      count(lit(1)).as("n"),
      cols.map(c => countDistinct(col(c)).as(s"d_$c")): _*)
    agg.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"d_$c").as("n_distinct"),
          expr(s"d_$c * 1000 div n").as("distinct_pm"))): _*)).as("s"))
      .select("s.*")
      .reportSort("col_name")
  }

  val clsDistinctRatioSql: String =
    """WITH s AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(DISTINCT c_custkey) AS d1, COUNT(DISTINCT c_name) AS d2,
      |    COUNT(DISTINCT c_mktsegment) AS d3,
      |    COUNT(DISTINCT c_nationkey) AS d4
      |  FROM customer)
      |SELECT * FROM (
      |  SELECT 'c_custkey' AS col_name, CAST(d1 AS BIGINT) AS n_distinct,
      |    CAST(d1 * 1000 // n AS BIGINT) AS distinct_pm FROM s
      |  UNION ALL SELECT 'c_name', CAST(d2 AS BIGINT),
      |    CAST(d2 * 1000 // n AS BIGINT) FROM s
      |  UNION ALL SELECT 'c_mktsegment', CAST(d3 AS BIGINT),
      |    CAST(d3 * 1000 // n AS BIGINT) FROM s
      |  UNION ALL SELECT 'c_nationkey', CAST(d4 AS BIGINT),
      |    CAST(d4 * 1000 // n AS BIGINT) FROM s)
      |ORDER BY col_name""".stripMargin

  // -------------------------------------------------- cls_benford
  /** First-digit (Benford) distribution of a financial column — the
    * numeric-authenticity signal audit scanners run over amount
    * columns (organic amounts follow log-uniform leading digits;
    * fabricated ones don't). Exactness: the amount is widened to
    * integer CENTS through DECIMAL (no float), and the leading digit
    * is the first character of the integer's decimal rendering —
    * identical in both engines, no log10 boundary risk. One map-side
    * combining agg over 9 groups + a 1-row broadcast total. */
  def clsBenford(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val d = Tables.orders(spark, dir)
      .select(substring(cents.cast("string"), 1, 1).as("digit"))
    d.groupBy("digit").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("total"))))
      .select(col("digit"), col("n"),
        expr("n * 1000 div total").as("pm"))
      .reportSort("digit")
  }

  val clsBenfordSql: String =
    """WITH d AS (
      |  SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |    * 100 AS BIGINT) AS VARCHAR), 1, 1) AS digit
      |  FROM orders),
      |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      |t AS (SELECT COUNT(*) AS total FROM d)
      |SELECT digit, n, CAST(n * 1000 // total AS BIGINT) AS pm
      |FROM c CROSS JOIN t ORDER BY digit""".stripMargin

  // -------------------------------------------------- cls_orphans
  /** Referential-integrity audit: count foreign-key orphans per
    * declared relationship (facts pointing at no parent row) — the
    * schema-level data-quality scan run before any CDC target is
    * trusted. Each relationship is one LEFT ANTI join on the key
    * (broadcast when the parent is a dim, shuffle otherwise — the
    * planner's choice, nothing forces a broadcast). */
  def clsOrphans(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val liOrph = li
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit("lineitem.l_orderkey->orders").as("relation"),
        col("n_orphans"))
    val ordOrph = ord.select(col("o_custkey"))
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit("orders.o_custkey->customer").as("relation"),
        col("n_orphans"))
    liOrph.unionAll(ordOrph).reportSort("relation")
  }

  val clsOrphansSql: String =
    """SELECT * FROM (
      |  SELECT 'lineitem.l_orderkey->orders' AS relation,
      |    (SELECT COUNT(*) FROM lineitem
      |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |    AS n_orphans
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer',
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)))
      |ORDER BY relation""".stripMargin

  // ----------------------------------------------------- cls_gini
  /** Per-column value-concentration (Gini impurity, exact integer
    * per-mille) — the entropy-style classification signal with NO
    * transcendental math: gini_pm = 1000 − ⌊1000·Σcᵢ²/(Σcᵢ)²⌋.
    * Near-0 = constant column, near-1000·(1−1/n) = key-like. Pairs
    * with [[clsDistinctRatio]] (which measures cardinality; this
    * measures skew — a column with 1000 values where one covers 99%
    * scores key-like there but concentrated here). One unpivot map
    * pass, one (column, value) count shuffle with map-side combine,
    * then a |columns|-row agg; counts squared in DECIMAL(38,0) so the
    * math cannot overflow at 100 TB row counts. */
  def clsGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Tables.customer(spark, dir)
      .select(expr(
        """stack(3,
          |  'c_custkey', cast(c_custkey as string),
          |  'c_mktsegment', cast(c_mktsegment as string),
          |  'c_nationkey', cast(c_nationkey as string))"""
          .stripMargin).as(Seq("col_name", "v")))
      .groupBy("col_name", "v").agg(count(lit(1)).as("c"))
      .select(col("col_name"),
        col("c").cast(DecimalType(38, 0)).as("c"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_values"),
        expr("1000 - (1000 * sum(c * c)) div (sum(c) * sum(c))")
          .as("gini_pm"))
      .reportSort("col_name")
  }

  val clsGiniSql: String =
    """WITH u AS (
      |  SELECT 'c_custkey' AS col_name, CAST(c_custkey AS VARCHAR) AS v
      |  FROM customer
      |  UNION ALL
      |  SELECT 'c_mktsegment', CAST(c_mktsegment AS VARCHAR) FROM customer
      |  UNION ALL
      |  SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer),
      |c AS (SELECT col_name, v, COUNT(*) AS c FROM u GROUP BY 1, 2)
      |SELECT col_name, COUNT(*) AS n_values,
      |  CAST(1000 - (1000 * SUM(c * c)) // (SUM(c) * SUM(c)) AS BIGINT)
      |    AS gini_pm
      |FROM c GROUP BY col_name ORDER BY col_name""".stripMargin

  // ------------------------------------------------- cls_quasi_id
  /** Quasi-identifier pair detection — the signal behind k-anonymity
    * masking decisions ([[graft.mask.MaskQueries]] mask_generalize):
    * for each column pair, how close is the pair's distinct-combination
    * count to each side's own cardinality? `nd_ab == nd_a` means a
    * functionally determines b (a is the stronger identifier); a
    * combination count approaching the row count means the PAIR
    * re-identifies rows even when each column alone looks safe. All
    * exact integers — one multi-distinct aggregation pass (Catalyst
    * plans the distinct sets via Expand, a single shuffle), unpivoted
    * to a 3-row report. */
  def clsQuasiId(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .agg(
        countDistinct(col("c_mktsegment")).as("nd_seg"),
        countDistinct(col("c_nationkey")).as("nd_nat"),
        countDistinct(col("c_custkey")).as("nd_key"),
        countDistinct(col("c_mktsegment"), col("c_nationkey")).as("nd_seg_nat"),
        countDistinct(col("c_mktsegment"), col("c_custkey")).as("nd_seg_key"),
        countDistinct(col("c_nationkey"), col("c_custkey")).as("nd_nat_key"),
        count(lit(1)).as("n_rows"))
      .select(expr(
        """stack(3,
          |  'c_mktsegment|c_nationkey', nd_seg, nd_nat, nd_seg_nat, n_rows,
          |  'c_mktsegment|c_custkey', nd_seg, nd_key, nd_seg_key, n_rows,
          |  'c_nationkey|c_custkey', nd_nat, nd_key, nd_nat_key, n_rows)"""
          .stripMargin)
        .as(Seq("pair", "nd_a", "nd_b", "nd_ab", "n_rows")))
      .select(col("pair"), col("nd_a"), col("nd_b"), col("nd_ab"),
        (col("nd_ab") === col("nd_a")).as("fd_a_determines_b"),
        (col("nd_ab") === col("nd_b")).as("fd_b_determines_a"),
        expr("nd_ab * 1000 div n_rows").as("reident_pm"))
      .reportSort("pair")

  val clsQuasiIdSql: String =
    """WITH s AS (
      |  SELECT COUNT(DISTINCT c_mktsegment) AS nd_seg,
      |    COUNT(DISTINCT c_nationkey) AS nd_nat,
      |    COUNT(DISTINCT c_custkey) AS nd_key,
      |    COUNT(DISTINCT (c_mktsegment, c_nationkey)) AS nd_seg_nat,
      |    COUNT(DISTINCT (c_mktsegment, c_custkey)) AS nd_seg_key,
      |    COUNT(DISTINCT (c_nationkey, c_custkey)) AS nd_nat_key,
      |    COUNT(*) AS n_rows
      |  FROM customer),
      |u AS (
      |  SELECT 'c_mktsegment|c_nationkey' AS pair, nd_seg AS nd_a,
      |    nd_nat AS nd_b, nd_seg_nat AS nd_ab, n_rows FROM s
      |  UNION ALL
      |  SELECT 'c_mktsegment|c_custkey', nd_seg, nd_key, nd_seg_key, n_rows
      |  FROM s
      |  UNION ALL
      |  SELECT 'c_nationkey|c_custkey', nd_nat, nd_key, nd_nat_key, n_rows
      |  FROM s)
      |SELECT pair, nd_a, nd_b, nd_ab,
      |  nd_ab = nd_a AS fd_a_determines_b,
      |  nd_ab = nd_b AS fd_b_determines_a,
      |  nd_ab * 1000 // n_rows AS reident_pm
      |FROM u ORDER BY pair""".stripMargin

  // -------------------------------------------- cls_functional_dep
  /** Exact functional-dependency profiling — the schema-discovery
    * question "does column A determine column B?" with the VIOLATION
    * COUNT a profiler reports (how many A-groups break the rule), not
    * just the boolean [[clsQuasiId]]'s distinct-count identity gives.
    * All candidate pairs are checked in ONE scan: each row melts into
    * (pair, det_value, dep_value) entries, one hash-agg counts
    * distinct dependents per determinant group, one more folds each
    * pair to (groups, violations). Cost at 100 TB: rows × pairs melt
    * (linear, map-side) + two combiner-friendly aggs — never one scan
    * per candidate pair. */
  def clsFunctionalDep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Seq(
      "o_orderkey" -> "o_custkey",
      "o_custkey" -> "o_orderstatus",
      "o_orderstatus" -> "o_orderpriority",
      "o_orderpriority" -> "o_orderstatus")
    val melted = Tables.orders(spark, dir).select(explode(array(
      pairs.map { case (a, b) => struct(
        lit(a).as("det"), lit(b).as("dep"),
        col(a).cast("string").as("dv"), col(b).cast("string").as("pv"))
      }: _*)).as("x")).select("x.*")
    melted.groupBy("det", "dep", "dv")
      .agg(countDistinct(col("pv")).as("_d"))
      .groupBy("det", "dep")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("_d") > 1, 1L).otherwise(0L)).as("n_violating"))
      .select(col("det").as("determinant"), col("dep").as("dependent"),
        col("n_groups"), col("n_violating"),
        (col("n_violating") === 0L).as("holds"))
      .reportSort("determinant", "dependent")
  }

  val clsFunctionalDepSql: String =
    """WITH m AS (
      |  SELECT 'o_orderkey' AS det, 'o_custkey' AS dep,
      |    CAST(o_orderkey AS VARCHAR) AS dv,
      |    CAST(o_custkey AS VARCHAR) AS pv FROM orders
      |  UNION ALL SELECT 'o_custkey', 'o_orderstatus',
      |    CAST(o_custkey AS VARCHAR), o_orderstatus FROM orders
      |  UNION ALL SELECT 'o_orderstatus', 'o_orderpriority',
      |    o_orderstatus, o_orderpriority FROM orders
      |  UNION ALL SELECT 'o_orderpriority', 'o_orderstatus',
      |    o_orderpriority, o_orderstatus FROM orders),
      |g AS (SELECT det, dep, dv, COUNT(DISTINCT pv) AS d
      |      FROM m GROUP BY 1, 2, 3)
      |SELECT det AS determinant, dep AS dependent,
      |  COUNT(*) AS n_groups,
      |  CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating,
      |  SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0 AS holds
      |FROM g GROUP BY 1, 2 ORDER BY determinant, dependent""".stripMargin

  // ------------------------------------------------- cls_outliers
  /** Numeric outlier profiling by exact Tukey fences (Q1/Q3 ± 1.5·IQR)
    * — the amount-column sanity scan a profiler runs beside
    * [[clsBenford]]. Exactness: values widen to integer CENTS through
    * DECIMAL (no float truncation skew between engines), quartiles are
    * type-1 (smallest value whose cumulative count reaches ⌈p·n⌉) in
    * pure integer arithmetic, fences in integer cents. Scale shape:
    * the corpus collapses to a (column, cents) HISTOGRAM first (one
    * map-side-combining agg), windows only ever see the histogram —
    * the value-grid domain, not the row count; for an unbounded value
    * domain the two-pass bucketed selection of `q29` is the drop-in
    * fallback. */
  def clsOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.ops.OrderStats
    // melt every profiled column of a table in ONE scan: each row
    // explodes to its (col_name, cents) entries, so lineitem's two
    // amount columns cost one FileScan, not two
    def centsOf(df: DataFrame, names: String*): DataFrame =
      df.select(explode(array(names.map(n =>
          struct(lit(n).as("col_name"),
            (col(n).cast(DecimalType(18, 2)) * lit(100)).cast("long")
              .as("cents"))): _*)).as("v"))
        .select(col("v.col_name").as("col_name"), col("v.cents").as("cents"))
    // Materialize the melted projection ONCE (localCheckpoint — a
    // straight map, no exchange): it was previously a `def`
    // re-evaluated by the radix selection (twice — its bucket
    // histogram and its join-back) AND by the fence-count pass, i.e.
    // three full orders+lineitem scans per execution. (A value-level
    // histogram-once variant was measured and REJECTED: amount
    // columns are near-unique, so the pre-agg was a corpus-sized
    // exchange that cost more than the scans it saved.)
    val vals = centsOf(Tables.orders(spark, dir), "o_totalprice")
      .unionAll(centsOf(Tables.lineitem(spark, dir),
        "l_extendedprice", "l_quantity"))
      .cut
    // Both quartiles by ONE shared radix selection
    // (OrderStats.radixRankSelect, the r9 shape that fixed q36): the
    // r8 full-value histogram approached the corpus for near-unique
    // amounts and its exchange + sharded cum windows made this the
    // bench's second-slowest key; radix exchanges are capped by the
    // value-domain split instead. A third pruned pass counts the
    // fence-escaping rows against the broadcast fences.
    val fences = OrderStats.radixRankSelect(vals, Seq("col_name"), "cents",
        Seq("q1" -> expr("(n + 3) div 4"),
          "q3" -> expr("(3 * n + 3) div 4")))
      .groupBy("col_name")
      .agg(max(col("n")).as("n_values"),
        max(when(col("sel") === "q1", col("sel_value"))).as("q1_cents"),
        max(when(col("sel") === "q3", col("sel_value"))).as("q3_cents"))
      .withColumn("lo_fence",
        expr("q1_cents - (3 * (q3_cents - q1_cents)) div 2"))
      .withColumn("hi_fence",
        expr("q3_cents + (3 * (q3_cents - q1_cents)) div 2"))
    vals.join(broadcast(fences), "col_name")
      .groupBy("col_name")
      .agg(max(col("n_values")).as("n_values"),
        max(col("q1_cents")).as("q1_cents"),
        max(col("q3_cents")).as("q3_cents"),
        max(col("lo_fence")).as("lo_fence"),
        max(col("hi_fence")).as("hi_fence"),
        sum(when(col("cents") < col("lo_fence"), 1L).otherwise(0L))
          .as("n_low"),
        sum(when(col("cents") > col("hi_fence"), 1L).otherwise(0L))
          .as("n_high"))
      .reportSort("col_name")
  }

  val clsOutliersSql: String =
    """WITH v AS (
      |  SELECT 'o_totalprice' AS col_name,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents FROM orders
      |  UNION ALL SELECT 'l_extendedprice',
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    FROM lineitem
      |  UNION ALL SELECT 'l_quantity',
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    FROM lineitem),
      |h AS (SELECT col_name, cents, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
      |c AS (SELECT col_name, cents, cnt,
      |        SUM(cnt) OVER (PARTITION BY col_name ORDER BY cents) AS cum
      |      FROM h),
      |t AS (SELECT col_name, CAST(SUM(cnt) AS BIGINT) AS n
      |      FROM h GROUP BY 1),
      |q AS (SELECT c.col_name, MAX(n) AS n_values,
      |        MIN(CASE WHEN cum >= (n + 3) // 4 THEN cents END) AS q1_cents,
      |        MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN cents END)
      |          AS q3_cents
      |      FROM c JOIN t ON c.col_name = t.col_name GROUP BY 1),
      |f AS (SELECT col_name, n_values, q1_cents, q3_cents,
      |        q1_cents - (3 * (q3_cents - q1_cents)) // 2 AS lo_fence,
      |        q3_cents + (3 * (q3_cents - q1_cents)) // 2 AS hi_fence
      |      FROM q)
      |SELECT h.col_name, CAST(MAX(n_values) AS BIGINT) AS n_values,
      |  CAST(MAX(q1_cents) AS BIGINT) AS q1_cents,
      |  CAST(MAX(q3_cents) AS BIGINT) AS q3_cents,
      |  CAST(MAX(lo_fence) AS BIGINT) AS lo_fence,
      |  CAST(MAX(hi_fence) AS BIGINT) AS hi_fence,
      |  CAST(SUM(CASE WHEN cents < lo_fence THEN cnt ELSE 0 END) AS BIGINT)
      |    AS n_low,
      |  CAST(SUM(CASE WHEN cents > hi_fence THEN cnt ELSE 0 END) AS BIGINT)
      |    AS n_high
      |FROM h JOIN f ON h.col_name = f.col_name
      |GROUP BY 1 ORDER BY h.col_name""".stripMargin

  // --------------------------------------------- cls_inclusion_deps
  /** Inclusion-dependency discovery (the Binder/Spider profiler scan
    * that finds FOREIGN KEYS nobody declared): candidate key/reference
    * columns melt into one (column, value) stream, each column's
    * DISTINCT value set is built in a single hash-agg, and one
    * value-keyed self-join counts shared values per column pair —
    * a ⊆ b falls out as n_shared = n_a. Cost at 100 TB: distinct
    * compaction rides (column, value) hash partitioning, the pair join
    * touches only compacted value sets, and the per-pair report is
    * |pairs| rows — never a table×table comparison. */
  def clsInclusionDeps(spark: SparkSession, dir: String): DataFrame = {
    def melt(df: DataFrame, c: String, tag: String): DataFrame =
      df.select(lit(tag).as("col_name"), col(c).cast("string").as("v"))
        .distinct()
    val vals =
      melt(Tables.customer(spark, dir), "c_custkey", "customer.c_custkey")
        .unionAll(melt(Tables.customer(spark, dir), "c_nationkey",
          "customer.c_nationkey"))
        .unionAll(melt(Tables.orders(spark, dir), "o_custkey",
          "orders.o_custkey"))
        .unionAll(melt(Tables.supplier(spark, dir), "s_nationkey",
          "supplier.s_nationkey"))
        .unionAll(melt(Tables.nation(spark, dir), "n_nationkey",
          "nation.n_nationkey"))
    val sizes = vals.groupBy("col_name").agg(count(lit(1)).as("n"))
    vals.select(col("col_name").as("col_a"), col("v"))
      .join(vals.select(col("col_name").as("col_b"), col("v")), "v")
      .filter(col("col_a") < col("col_b"))
      .groupBy("col_a", "col_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("col_name").as("col_a"), col("n").as("n_a")),
        "col_a")
      .join(sizes.select(col("col_name").as("col_b"), col("n").as("n_b")),
        "col_b")
      .select(col("col_a"), col("col_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        (col("n_shared") === col("n_a")).as("a_in_b"),
        (col("n_shared") === col("n_b")).as("b_in_a"))
      .reportSort("col_a", "col_b")
  }

  val clsInclusionDepsSql: String =
    """WITH vals AS (
      |  SELECT DISTINCT 'customer.c_custkey' AS col_name,
      |    CAST(c_custkey AS VARCHAR) AS v FROM customer
      |  UNION SELECT DISTINCT 'customer.c_nationkey',
      |    CAST(c_nationkey AS VARCHAR) FROM customer
      |  UNION SELECT DISTINCT 'orders.o_custkey',
      |    CAST(o_custkey AS VARCHAR) FROM orders
      |  UNION SELECT DISTINCT 'supplier.s_nationkey',
      |    CAST(s_nationkey AS VARCHAR) FROM supplier
      |  UNION SELECT DISTINCT 'nation.n_nationkey',
      |    CAST(n_nationkey AS VARCHAR) FROM nation),
      |sizes AS (SELECT col_name, COUNT(*) AS n FROM vals GROUP BY 1),
      |pairs AS (
      |  SELECT a.col_name AS col_a, b.col_name AS col_b,
      |    COUNT(*) AS n_shared
      |  FROM vals a JOIN vals b ON a.v = b.v AND a.col_name < b.col_name
      |  GROUP BY 1, 2)
      |SELECT col_a, col_b, sa.n AS n_a, sb.n AS n_b, n_shared,
      |  n_shared = sa.n AS a_in_b, n_shared = sb.n AS b_in_a
      |FROM pairs
      |JOIN sizes sa ON sa.col_name = col_a
      |JOIN sizes sb ON sb.col_name = col_b
      |ORDER BY col_a, col_b""".stripMargin

  // ------------------------------------------------------- cls_corr
  /** Column-correlation profiling by EXACT integer moments — the
    * profiler step that finds redundant / derived numeric columns
    * (price ≈ quantity × unit cost) before masking or sampling breaks
    * the relationship. Pearson's r itself is a float ratio; what
    * crosses the engine boundary here are its sufficient statistics
    * (n, Σx, Σy, Σx², Σy², Σxy) as exact BIGINTs, so the check is
    * bit-stable and r is one driver-side division away. Columns are
    * integerized per-unit (quantity → units, prices → whole currency
    * units, rates → milli-units) to keep Σx² inside int64 at the
    * target scale. Shape: ONE lineitem scan melts each row into its
    * 3 pair entries (explode over a literal array, map-side), then a
    * single combiner-friendly hash-agg per pair — no windows, no
    * joins. */
  def clsCorr(spark: SparkSession, dir: String): DataFrame = {
    // floor() before the BIGINT cast: Spark's double→long cast
    // truncates toward zero while DuckDB's rounds — floor agrees
    def units(c: String): Column = floor(col(c)).cast("long")
    def milli(c: String): Column = floor(col(c) * 1000).cast("long")
    val pairs = Seq(
      ("l_quantity~l_extendedprice", units("l_quantity"),
        units("l_extendedprice")),
      ("l_quantity~l_discount_milli", units("l_quantity"),
        milli("l_discount")),
      ("l_extendedprice~l_tax_milli", units("l_extendedprice"),
        milli("l_tax")))
    Tables.lineitem(spark, dir)
      .select(explode(array(pairs.map { case (name, x, y) =>
        struct(lit(name).as("pair"), x.as("x"), y.as("y"))
      }: _*)).as("p"))
      .select(col("p.pair").as("pair"), col("p.x").as("x"),
        col("p.y").as("y"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .reportSort("pair")
  }

  val clsCorrSql: String =
    """WITH m AS (
      |  SELECT 'l_quantity~l_extendedprice' AS pair,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS x,
      |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS y FROM lineitem
      |  UNION ALL SELECT 'l_quantity~l_discount_milli',
      |    CAST(FLOOR(l_quantity) AS BIGINT),
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice~l_tax_milli',
      |    CAST(FLOOR(l_extendedprice) AS BIGINT),
      |    CAST(FLOOR(l_tax * 1000) AS BIGINT) FROM lineitem)
      |SELECT pair, COUNT(*) AS n,
      |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |  CAST(SUM(x * x) AS BIGINT) AS sxx,
      |  CAST(SUM(y * y) AS BIGINT) AS syy,
      |  CAST(SUM(x * y) AS BIGINT) AS sxy
      |FROM m GROUP BY pair ORDER BY pair""".stripMargin

  // ------------------------------------------------- cls_spearman
  /** SPEARMAN rank correlation — the monotone-dependence profiler
    * that catches relationships Pearson misses (any monotone but
    * non-linear link) and survives the outliers that wreck raw
    * moments. Like [[clsCorr]], what crosses the engine boundary are
    * EXACT integer sufficient statistics — here over DOUBLED average
    * ranks (×2 keeps tie-averaged ranks integral: for value v,
    * 2·rank = 2·|{<v}| + |{=v}| + 1), plus the classic Σd² term. The
    * rank transform is fully distributed: ONE corpus scan
    * (checkpointed 3-column projection), a per-variable value
    * histogram through [[graft.ops.OrderStats.cumulativeHistogramSharded]]
    * (two-level cum — no unpartitioned window anywhere), and a
    * value-keyed shuffle join of the corpus back to each compact rank
    * map — the standard scale-out rank transform, vs. the textbook
    * `RANK() OVER (ORDER BY v)` whose single global sort dies first.
    *
    * int64 safety (r10 — found by the sf1 scaling spot-bench, where
    * raw doubled ranks overflowed: Σ(2R)² ≤ 4n³ dies at n ≈ 1.3e6):
    * ranks are PERCENTILE-QUANTIZED to integer per-mille (u =
    * 2R·500 div 2n ∈ [1, 1000]) before the moment sums, so
    * Σu² ≤ 10⁶·n stays inside int64 to n ≈ 9e12 rows — any
    * realistic corpus — while the statistic keeps 1e-3 rank
    * resolution (a profiler's ρ needs two decimal places). The
    * quantization is integer division replayed exactly by the
    * oracle. */
  def clsSpearman(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val proj = Tables.lineitem(spark, dir).select(
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_extendedprice") * 100).cast("long").as("p"),
        floor(col("l_discount") * 1000).cast("long").as("d"))
      .cut
    def ranks(v: String): DataFrame = {
      // non-foldable all-rows group: keeps every window partitioned
      val vals = proj.select(col(v).as("v"))
        .withColumn("_g", pmod(col("v"), lit(1L)))
      OrderStats.cumulativeHistogramSharded(vals, Seq("_g"), "v")
        .select(col("v").as(v),
          (lit(2L) * col("hi") - col("c") + 1L).as(s"r_$v"))
    }
    val nt = proj.agg(count(lit(1)).as("_nt"))
    val ranked = proj
      .join(ranks("q"), Seq("q"))
      .join(ranks("p"), Seq("p"))
      .join(ranks("d"), Seq("d"))
      .crossJoin(broadcast(nt))
      .select(expr("r_q * 500 div _nt").as("u_q"),
        expr("r_p * 500 div _nt").as("u_p"),
        expr("r_d * 500 div _nt").as("u_d"))
    ranked.select(explode(array(
        struct(lit("quantity~price_cents").as("pair"),
          col("u_q").as("x"), col("u_p").as("y")),
        struct(lit("quantity~discount_milli").as("pair"),
          col("u_q").as("x"), col("u_d").as("y")))).as("m"))
      .select(col("m.pair").as("pair"), col("m.x").as("x"),
        col("m.y").as("y"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"),
        sum((col("x") - col("y")) * (col("x") - col("y"))).as("sd2"))
      .reportSort("pair")
  }

  val clsSpearmanSql: String =
    """WITH v AS (
      |  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
      |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS p,
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT) AS d
      |  FROM lineitem),
      |r AS (
      |  SELECT
      |    2 * RANK() OVER (ORDER BY q)
      |      + COUNT(*) OVER (PARTITION BY q) - 1 AS rq,
      |    2 * RANK() OVER (ORDER BY p)
      |      + COUNT(*) OVER (PARTITION BY p) - 1 AS rp,
      |    2 * RANK() OVER (ORDER BY d)
      |      + COUNT(*) OVER (PARTITION BY d) - 1 AS rd,
      |    COUNT(*) OVER () AS nt
      |  FROM v),
      |u AS (
      |  SELECT rq * 500 // nt AS uq, rp * 500 // nt AS up,
      |    rd * 500 // nt AS ud
      |  FROM r),
      |m AS (
      |  SELECT 'quantity~price_cents' AS pair, uq AS x, up AS y FROM u
      |  UNION ALL
      |  SELECT 'quantity~discount_milli', uq, ud FROM u)
      |SELECT pair, COUNT(*) AS n,
      |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |  CAST(SUM(x * x) AS BIGINT) AS sxx,
      |  CAST(SUM(y * y) AS BIGINT) AS syy,
      |  CAST(SUM(x * y) AS BIGINT) AS sxy,
      |  CAST(SUM((x - y) * (x - y)) AS BIGINT) AS sd2
      |FROM m GROUP BY pair ORDER BY pair""".stripMargin

  // --------------------------------------------- cls_golden_record
  /** GOLDEN-RECORD SURVIVORSHIP — the step AFTER entity matching
    * ([[clsEntityMatch]] finds the duplicates; something must then
    * decide which field values survive the merge): a deterministic
    * second source is synthesized for every custkey ≡ 3 (mod 10)
    * (upper-cased name, +1.00 balance, segment lost — the classic
    * dirty-CRM shape), and per entity each column survives by its own
    * rule, all expressed as ONE struct-max hash-agg (map-side
    * combinable, no windows, no self-joins — the q48 argmax-by-struct
    * shape): name by (longest, then lexicographically last), balance
    * by source preference (web beats crm), segment by
    * highest-preference NON-NULL (a −1 rank sentinel keeps all-null
    * entities null). The per-nation report carries an md5-prefix
    * checksum of the golden names, so the gate proves byte-identical
    * survivorship — not just matching counts. */
  def clsGoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = Tables.customer(spark, dir).select(
      col("c_custkey").as("key"), col("c_nationkey").as("nation"),
      col("c_name").as("name"),
      (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"),
      col("c_mktsegment").as("segment"), lit(1).as("src_rank"))
    val dup = base.filter(pmod(col("key"), lit(10)) === 3).select(
      col("key"), col("nation"), upper(col("name")).as("name"),
      (col("cents") + 100L).as("cents"),
      lit(null).cast("string").as("segment"), lit(2).as("src_rank"))
    val golden = base.unionByName(dup)
      .groupBy("key", "nation")
      .agg(count(lit(1)).as("n_records"),
        max(struct(length(col("name")).as("l"), col("name").as("v")))
          .getField("v").as("g_name"),
        max(struct(col("src_rank").as("r"), col("cents").as("v")))
          .getField("v").as("g_cents"),
        max(struct(when(col("segment").isNotNull, col("src_rank"))
            .otherwise(-1).as("r"), col("segment").as("v")))
          .getField("v").as("g_segment"))
    golden.groupBy("nation")
      .agg(count(lit(1)).as("n_entities"),
        sum(when(col("n_records") > 1, 1L).otherwise(0L)).as("n_merged"),
        sum(col("g_cents")).as("golden_cents"),
        sum(when(col("g_segment").isNotNull, 1L).otherwise(0L))
          .as("n_with_segment"),
        sum(expr(
          "CAST(conv(substring(md5(g_name), 1, 8), 16, 10) AS BIGINT)"))
          .as("name_fp_sum"))
      .reportSort("nation")
  }

  val clsGoldenRecordSql: String =
    """WITH base AS (
      |  SELECT c_custkey AS key, c_nationkey AS nation,
      |    c_name AS name,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    c_mktsegment AS segment, 1 AS src_rank
      |  FROM customer),
      |dup AS (
      |  SELECT key, nation, UPPER(name) AS name, cents + 100 AS cents,
      |    CAST(NULL AS VARCHAR) AS segment, 2 AS src_rank
      |  FROM base WHERE key % 10 = 3),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM dup),
      |g AS (
      |  SELECT key, nation, COUNT(*) AS n_records,
      |    (MAX({'l': LENGTH(name), 'v': name})).v AS g_name,
      |    (MAX({'r': src_rank, 'v': cents})).v AS g_cents,
      |    (MAX({'r': CASE WHEN segment IS NOT NULL THEN src_rank
      |                    ELSE -1 END, 'v': segment})).v AS g_segment
      |  FROM u GROUP BY 1, 2)
      |SELECT nation, COUNT(*) AS n_entities,
      |  CAST(SUM(CASE WHEN n_records > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_merged,
      |  CAST(SUM(g_cents) AS BIGINT) AS golden_cents,
      |  CAST(SUM(CASE WHEN g_segment IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_with_segment,
      |  CAST(SUM(('0x'||substr(md5(g_name),1,8))::BIGINT) AS BIGINT)
      |    AS name_fp_sum
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------- cls_autocorr
  /** Seasonality / serial-dependence profiling of an event timeline —
    * the profiler check that tells a sampler or forecaster whether
    * "daily volume" is i.i.d. or periodic (weekly cycles in order
    * flow): lag-k autocorrelation of the daily order-count series for
    * k ∈ {1, 7, 30}. Like [[clsCorr]], what crosses the engine
    * boundary are Pearson's EXACT sufficient statistics per lag
    * (n, Σx, Σy, Σx², Σy², Σxy as BIGINTs over the (xₜ, xₜ₊ₖ)
    * pairs) — r is one driver-side division away, bit-stable.
    * Shape: ONE corpus-sized scan collapses to the |days| daily
    * series (map-side-combining hash-agg); the lag melt and
    * self-join then run on ~10³ rows — AQE broadcasts them — so the
    * operator costs one scan regardless of corpus size. */
  def clsAutocorr(spark: SparkSession, dir: String): DataFrame = {
    // the daily series feeds BOTH join sides; checkpoint the ~|days|
    // rows so the corpus is scanned ONCE (exchange reuse across the
    // rename boundary is not guaranteed by the planner)
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01")).as("d"))
      .agg(count(lit(1)).as("x"))
      .cut
    val melted = daily.select(
      explode(typedLit(Seq(1, 7, 30))).as("lag"), col("d"), col("x"))
    val shifted = daily.select(col("d").as("d2"), col("x").as("y"))
    melted.join(shifted,
        melted("d") + melted("lag") === shifted("d2"))
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .reportSort("lag")
  }

  val clsAutocorrSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
      |    COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |l AS (SELECT unnest([1, 7, 30]) AS lag),
      |j AS (
      |  SELECT l.lag, a.x AS x, b.x AS y
      |  FROM l CROSS JOIN daily a JOIN daily b ON b.d = a.d + l.lag)
      |SELECT CAST(lag AS BIGINT) AS lag, COUNT(*) AS n,
      |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |  CAST(SUM(x * x) AS BIGINT) AS sxx,
      |  CAST(SUM(y * y) AS BIGINT) AS syy,
      |  CAST(SUM(x * y) AS BIGINT) AS sxy
      |FROM j GROUP BY lag ORDER BY lag""".stripMargin

  // ----------------------------------------------- cls_entity_match
  /** Blocked fuzzy ENTITY RESOLUTION — the master-data matching step
    * (find the clean registry record a dirty feed row refers to,
    * typos and all): a dirty registry is synthesized by giving every
    * 10th customer a duplicate whose name carries a deterministic
    * adjacent-digit transposition (the classic data-entry error;
    * Levenshtein ≤ 2), keyed 10M above its source. Matching blocks on
    * the STABLE attributes (nation, 500-unit balance band — typo-free
    * by construction), and only within-block candidates pay the
    * Levenshtein gate — the [[graft.dedup.Dedup]] edit-distance
    * contract: never all-pairs, block fan-out bounded by block size.
    * Output is every (dirty, candidate) pair the matcher accepts,
    * INCLUDING block-collision false positives — the precision
    * signal an ER deployment tunes its blocking key by. */
  def clsEntityMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val swapName =
      """concat('Customer#',
        |  substring(substring(c_name, 10, 9), 1, c_custkey % 8),
        |  substring(substring(c_name, 10, 9), c_custkey % 8 + 2, 1),
        |  substring(substring(c_name, 10, 9), c_custkey % 8 + 1, 1),
        |  substring(substring(c_name, 10, 9), c_custkey % 8 + 3, 9))"""
        .stripMargin
    val dirty = c.filter(pmod(col("c_custkey"), lit(10)) === 0)
      .select((col("c_custkey") + 10000000L).as("d_key"),
        expr(swapName).as("d_name"),
        col("c_nationkey").as("nk"),
        floor(col("c_acctbal") / 500).cast("long").as("band"))
    val clean = c.select(col("c_custkey").as("cand_key"),
      col("c_name"), col("c_nationkey").as("nk"),
      floor(col("c_acctbal") / 500).cast("long").as("band"))
    dirty.join(clean, Seq("nk", "band"))
      .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      .filter(col("dist") <= 2)
      .select(col("d_key"), col("cand_key"), col("dist"))
      .orderBy("d_key", "cand_key")
  }

  val clsEntityMatchSql: String =
    """WITH dirty AS (
      |  SELECT c_custkey + 10000000 AS d_key,
      |    'Customer#' ||
      |      substring(substring(c_name, 10, 9), 1, c_custkey % 8) ||
      |      substring(substring(c_name, 10, 9), c_custkey % 8 + 2, 1) ||
      |      substring(substring(c_name, 10, 9), c_custkey % 8 + 1, 1) ||
      |      substring(substring(c_name, 10, 9), c_custkey % 8 + 3, 9)
      |      AS d_name,
      |    c_nationkey AS nk,
      |    CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS band
      |  FROM customer WHERE c_custkey % 10 = 0),
      |clean AS (
      |  SELECT c_custkey AS cand_key, c_name, c_nationkey AS nk,
      |    CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS band
      |  FROM customer)
      |SELECT d.d_key, c.cand_key,
      |  CAST(levenshtein(d.d_name, c.c_name) AS INTEGER) AS dist
      |FROM dirty d JOIN clean c ON c.nk = d.nk AND c.band = d.band
      |WHERE levenshtein(d.d_name, c.c_name) <= 2
      |ORDER BY d_key, cand_key""".stripMargin

  // -------------------------------------------------- cls_skewness
  /** Shape profiling past variance — skewness and kurtosis from EXACT
    * integer raw moments (n, Σx, Σx², Σx³, Σx⁴ per column): the
    * profiler signal that separates "symmetric around the mean"
    * (maskable by blur) from heavy-tailed / one-sided columns (where
    * mean-preserving noise leaks outliers). Like [[clsCorr]], only
    * the sufficient statistics cross engines; the float ratios are a
    * driver division away. Integerization bounds the 4th-moment
    * growth: quantity (≤ 50) keeps Σx⁴ inside int64 to ~1.4·10¹²
    * rows; the milli columns (≤ 100) only to ~9·10¹⁰ — past that,
    * widen BOTH engines' sums to DECIMAL(38,0) (Spark wraps silently
    * under non-ANSI int64 while DuckDB's HUGEINT→BIGINT cast errors,
    * so crossing the bound breaks parity loudly on one side only).
    * One melt scan → one combiner-friendly 3-group hash-agg. */
  def clsSkewness(spark: SparkSession, dir: String): DataFrame = {
    def units(c: String): Column = floor(col(c)).cast("long")
    def milli(c: String): Column = floor(col(c) * 1000).cast("long")
    val cols = Seq(
      ("l_quantity", units("l_quantity")),
      ("l_discount_milli", milli("l_discount")),
      ("l_tax_milli", milli("l_tax")))
    Tables.lineitem(spark, dir)
      .select(explode(array(cols.map { case (name, x) =>
        struct(lit(name).as("col"), x.as("x"))
      }: _*)).as("m"))
      .select(col("m.col").as("col"), col("m.x").as("x"))
      .groupBy("col")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .reportSort("col")
  }

  val clsSkewnessSql: String =
    """WITH m AS (
      |  SELECT 'l_quantity' AS col,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS x FROM lineitem
      |  UNION ALL SELECT 'l_discount_milli',
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'l_tax_milli',
      |    CAST(FLOOR(l_tax * 1000) AS BIGINT) FROM lineitem)
      |SELECT col, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s1,
      |  CAST(SUM(x*x) AS BIGINT) AS s2,
      |  CAST(SUM(x*x*x) AS BIGINT) AS s3,
      |  CAST(SUM(x*x*x*x) AS BIGINT) AS s4
      |FROM m GROUP BY col ORDER BY col""".stripMargin

  // -------------------------------------------------- cls_psi_drift
  /** Distribution-drift audit between two time periods — the
    * population-stability check a production classifier runs on every
    * refresh (did the amount distribution move since the reference
    * window?). The timeline is split at its own midpoint (min/max
    * epoch-day arithmetic — no configured date), `o_totalprice` is
    * bucketed on a fixed value grid (50k-unit buckets, capped at 9 —
    * a FIXED grid, unlike quantile buckets, keeps ref and current
    * comparable), and each bucket reports exact counts plus per-mille
    * shares; PSI itself is one driver-side log away from these exact
    * inputs. Shape: one orders scan + broadcast 1-row bounds + one
    * 10-row agg. */
  def clsPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val od = Tables.orders(spark, dir)
      .withColumn("_d",
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01")))
    val bounds = od.agg(min(col("_d")).as("dmin"), max(col("_d")).as("dmax"))
    val g = od.crossJoin(broadcast(bounds))
      .withColumn("_cur", col("_d") * 2 > col("dmin") + col("dmax"))
      .withColumn("bucket",
        least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L)))
      .groupBy("bucket")
      .agg(sum(when(col("_cur"), 0L).otherwise(1L)).as("n_ref"),
        sum(when(col("_cur"), 1L).otherwise(0L)).as("n_cur"))
    // totals fold the 10-row bucket frame, not the corpus — the
    // bucket agg's exchange is shared (AQE reuse), so orders is
    // scanned once for buckets + once for the 1-row bounds probe
    g.crossJoin(broadcast(g.agg(sum(col("n_ref")).as("t_ref"),
        sum(col("n_cur")).as("t_cur"))))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        expr("n_ref * 1000 div t_ref").as("ref_pm"),
        expr("n_cur * 1000 div t_cur").as("cur_pm"),
        expr("n_cur * 1000 div t_cur - n_ref * 1000 div t_ref")
          .as("diff_pm"))
      .reportSort("bucket")
  }

  val clsPsiDriftSql: String =
    """WITH d AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |      AS BIGINT) AS dd,
      |    o_totalprice FROM orders),
      |b AS (SELECT MIN(dd) + MAX(dd) AS mid2 FROM d),
      |t AS (
      |  SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9)
      |      AS bucket,
      |    dd * 2 > b.mid2 AS cur
      |  FROM d CROSS JOIN b),
      |g AS (
      |  SELECT bucket,
      |    CAST(SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT) AS n_ref,
      |    CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM t GROUP BY bucket),
      |tot AS (
      |  SELECT CAST(SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT)
      |      AS t_ref,
      |    CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS t_cur
      |  FROM t)
      |SELECT bucket, n_ref, n_cur,
      |  CAST(n_ref * 1000 // t_ref AS BIGINT) AS ref_pm,
      |  CAST(n_cur * 1000 // t_cur AS BIGINT) AS cur_pm,
      |  CAST(n_cur * 1000 // t_cur - n_ref * 1000 // t_ref AS BIGINT)
      |    AS diff_pm
      |FROM g CROSS JOIN tot ORDER BY bucket""".stripMargin

  // ------------------------------------------------ cls_datatype_infer
  /** Data-type inference over STRING columns — the profiler step that
    * recovers schema from text dumps (every CSV/mainframe ingest needs
    * it before typed processing): per column, how many values parse as
    * integer / numeric / ISO date, and the inferred verdict by strict
    * precedence (int ⊃ numeric, so int wins only when EVERY value is
    * integral; any miss falls through to string). Anchored regexes are
    * engine-identical; the mixed column proves the fall-through. One
    * orders scan melts all profiled columns (explode), one hash-agg.
    * Doubles are never cast to string (float formatting diverges
    * across engines) — profiled strings are built from ints, dates,
    * and existing text only. */
  def clsDatatypeInfer(spark: SparkSession, dir: String): DataFrame = {
    val cols: Seq[(String, Column)] = Seq(
      ("order_key_str", col("o_orderkey").cast("string")),
      ("order_date_str", col("o_orderdate").cast("date").cast("string")),
      ("priority_str", col("o_orderpriority")),
      ("mixed_str", when(col("o_orderkey") % 3 === 0,
        col("o_orderkey").cast("string")).otherwise(col("o_orderpriority"))))
    val isInt = col("v").rlike("^[+-]?[0-9]+$")
    val isNum = col("v").rlike("^[+-]?[0-9]+(\\.[0-9]+)?$")
    val isDate = col("v").rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
    Tables.orders(spark, dir)
      .select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("col_name"), c.as("v"))
      }: _*)).as("m"))
      .select(col("m.col_name").as("col_name"), col("m.v").as("v"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n"),
        sum(when(isInt, 1L).otherwise(0L)).as("n_int"),
        sum(when(isNum, 1L).otherwise(0L)).as("n_num"),
        sum(when(isDate, 1L).otherwise(0L)).as("n_date"))
      .withColumn("verdict",
        when(col("n_int") === col("n"), "integer")
          .when(col("n_num") === col("n"), "numeric")
          .when(col("n_date") === col("n"), "date")
          .otherwise("string"))
      .reportSort("col_name")
  }

  val clsDatatypeInferSql: String =
    """WITH m AS (
      |  SELECT 'order_key_str' AS col_name,
      |    CAST(o_orderkey AS VARCHAR) AS v FROM orders
      |  UNION ALL SELECT 'order_date_str',
      |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM orders
      |  UNION ALL SELECT 'priority_str', o_orderpriority FROM orders
      |  UNION ALL SELECT 'mixed_str',
      |    CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderkey AS VARCHAR)
      |         ELSE o_orderpriority END FROM orders),
      |g AS (
      |  SELECT col_name, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN regexp_matches(v, '^[+-]?[0-9]+$')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
      |    CAST(SUM(CASE WHEN regexp_matches(v,
      |      '^[+-]?[0-9]+(\.[0-9]+)?$') THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_num,
      |    CAST(SUM(CASE WHEN regexp_matches(v,
      |      '^[0-9]{4}-[0-9]{2}-[0-9]{2}$') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_date
      |  FROM m GROUP BY col_name)
      |SELECT col_name, n, n_int, n_num, n_date,
      |  CASE WHEN n_int = n THEN 'integer'
      |       WHEN n_num = n THEN 'numeric'
      |       WHEN n_date = n THEN 'date'
      |       ELSE 'string' END AS verdict
      |FROM g ORDER BY col_name""".stripMargin

  // ------------------------------------------------ cls_contingency
  /** Exact contingency-table audit between two categorical columns
    * (`l_returnflag` × `l_linestatus`) — the independence screen a
    * profiler runs before trusting one column as a proxy for another.
    * Per cell: observed count, row/col marginals, grand total, and the
    * integer LEVERAGE `n·obs − rowTotal·colTotal` (the division-free
    * chi-square numerator input; positive → the cell is
    * over-represented vs independence). All arithmetic stays in exact
    * BIGINT, so no float ratio crosses the oracle boundary. Shape: one
    * lineitem scan → |cells| hash-agg; marginals re-aggregate the
    * cell frame (AQE exchange reuse), and every join is a broadcast
    * of a ≤|cells|-row frame. */
  def clsContingency(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("obs"))
    val rowTot = cells.groupBy("l_returnflag")
      .agg(sum(col("obs")).as("row_total"))
    val colTot = cells.groupBy("l_linestatus")
      .agg(sum(col("obs")).as("col_total"))
    val grand = cells.agg(sum(col("obs")).as("n"))
    cells.join(broadcast(rowTot), "l_returnflag")
      .join(broadcast(colTot), "l_linestatus")
      .crossJoin(broadcast(grand))
      .select(col("l_returnflag"), col("l_linestatus"), col("obs"),
        col("row_total"), col("col_total"), col("n"),
        (col("n") * col("obs") - col("row_total") * col("col_total"))
          .as("leverage"))
      .reportSort("l_returnflag", "l_linestatus")
  }

  val clsContingencySql: String =
    """WITH cells AS (
      |  SELECT l_returnflag, l_linestatus, COUNT(*) AS obs
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, SUM(obs) AS row_total
      |      FROM cells GROUP BY 1),
      |c AS (SELECT l_linestatus, SUM(obs) AS col_total
      |      FROM cells GROUP BY 1),
      |t AS (SELECT SUM(obs) AS n FROM cells)
      |SELECT cells.l_returnflag, cells.l_linestatus,
      |  CAST(obs AS BIGINT) AS obs,
      |  CAST(row_total AS BIGINT) AS row_total,
      |  CAST(col_total AS BIGINT) AS col_total,
      |  CAST(n AS BIGINT) AS n,
      |  CAST(n * obs - row_total * col_total AS BIGINT) AS leverage
      |FROM cells JOIN r USING (l_returnflag)
      |  JOIN c USING (l_linestatus) CROSS JOIN t
      |ORDER BY cells.l_returnflag, cells.l_linestatus""".stripMargin

  // ------------------------------------------------ cls_ks_drift
  /** Exact two-sample Kolmogorov–Smirnov drift statistic between the
    * reference and current halves of the order timeline (same
    * midpoint split as [[clsPsiDrift]] — no configured date), over
    * `o_totalprice` in cents. The KS sup-gap is cross-multiplied to
    * stay in exact integers: `ks_num = max_v |F_ref(v)·n_cur −
    * F_cur(v)·n_ref|`, `ks_den = n_ref·n_cur` (D = ks_num/ks_den one
    * driver-side division away), with `at_cents` the smallest value
    * attaining the sup (deterministic tie-break). BIGINT holds up to
    * ~3e9 rows per side; beyond that the cross-product needs
    * DECIMAL(38) — documented seam, same plan.
    *
    * Shape: one orders scan → (value, c_ref, c_cur) pooled-grid
    * hash-agg; the cumulative F's use the repo's two-level
    * prefix-sum decomposition (local window per contiguous value
    * shard + exclusive prefix over the ≤|shards| aggregated totals —
    * the deliberate single-partition idiom), so no window ever sees
    * more than a shard; the final sup is one map-side-combining
    * struct-max. */
  def clsKsDrift(spark: SparkSession, dir: String): DataFrame =
    ksDrift(Tables.orders(spark, dir))

  /** The KS core with the shard width exposed — ScaleSpec pins that
    * the result is shard-width-INVARIANT (the decomposition is pure
    * plumbing, not semantics). */
  def ksDrift(orders: DataFrame, shardWidth: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val od = orders
      .withColumn("_d",
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01")))
    val bounds = od.agg(min(col("_d")).as("dmin"), max(col("_d")).as("dmax"))
    val sides = od.crossJoin(broadcast(bounds))
      .select(floor(col("o_totalprice") * 100).cast("long").as("v"),
        (col("_d") * 2 > col("dmin") + col("dmax")).as("_cur"))
    val hist = sides.groupBy("v")
      .agg(sum(when(col("_cur"), 0L).otherwise(1L)).as("c_ref"),
        sum(when(col("_cur"), 1L).otherwise(0L)).as("c_cur"))
      .withColumn("_sh", expr(s"v div $shardWidth"))
    val pre = Window.partitionBy(pmod(col("_tr"), lit(1))).orderBy("_sh")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.groupBy("_sh")
      .agg(sum(col("c_ref")).as("_tr"), sum(col("c_cur")).as("_tc"))
      .withColumn("_or", coalesce(sum(col("_tr")).over(pre), lit(0L)))
      .withColumn("_oc", coalesce(sum(col("_tc")).over(pre), lit(0L)))
      .select("_sh", "_or", "_oc")
    val local = Window.partitionBy("_sh").orderBy("v")
    val cums = hist
      .withColumn("_lr", sum(col("c_ref")).over(local))
      .withColumn("_lc", sum(col("c_cur")).over(local))
      .join(broadcast(offsets), Seq("_sh"))
      .select(col("v"), (col("_or") + col("_lr")).as("cum_ref"),
        (col("_oc") + col("_lc")).as("cum_cur"))
    val tot = sides.agg(
      sum(when(col("_cur"), 0L).otherwise(1L)).as("n_ref"),
      sum(when(col("_cur"), 1L).otherwise(0L)).as("n_cur"))
    cums.crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(col("cum_ref") * col("n_cur") - col("cum_cur") * col("n_ref")))
      .groupBy("n_ref", "n_cur")
      .agg(max(struct(col("gap"), (-col("v")).as("_nv"))).as("_m"))
      .select(col("n_ref"), col("n_cur"),
        col("_m.gap").as("ks_num"),
        (col("n_ref") * col("n_cur")).as("ks_den"),
        (-col("_m._nv")).as("at_cents"))
  }

  val clsKsDriftSql: String =
    """WITH d AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |      AS BIGINT) AS dd,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v FROM orders),
      |b AS (SELECT MIN(dd) + MAX(dd) AS mid2 FROM d),
      |s AS (SELECT v, dd * 2 > b.mid2 AS cur FROM d CROSS JOIN b),
      |h AS (
      |  SELECT v, SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS c_ref,
      |    SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS c_cur
      |  FROM s GROUP BY v),
      |c AS (
      |  SELECT v, SUM(c_ref) OVER (ORDER BY v) AS cum_ref,
      |    SUM(c_cur) OVER (ORDER BY v) AS cum_cur FROM h),
      |t AS (
      |  SELECT SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS n_ref,
      |    SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS n_cur FROM s),
      |g AS (
      |  SELECT v, ABS(cum_ref * t.n_cur - cum_cur * t.n_ref) AS gap
      |  FROM c CROSS JOIN t),
      |mx AS (SELECT MAX(gap) AS ks_num FROM g)
      |SELECT CAST(t.n_ref AS BIGINT) AS n_ref,
      |  CAST(t.n_cur AS BIGINT) AS n_cur,
      |  CAST(mx.ks_num AS BIGINT) AS ks_num,
      |  CAST(t.n_ref * t.n_cur AS BIGINT) AS ks_den,
      |  CAST((SELECT MIN(v) FROM g WHERE g.gap = mx.ks_num)
      |    AS BIGINT) AS at_cents
      |FROM t CROSS JOIN mx""".stripMargin

  // ------------------------------------------- cls_histogram_profile
  /** Equi-width distribution histogram per numeric column — the
    * shape sketch a profiler renders beside [[clsOutliers]]' fences:
    * 16 equal-width bins over each column's exact [min, max] cents
    * range, all columns melted in ONE scan per table so lineitem's
    * two amount columns cost one FileScan. Classic two-pass shape
    * (pass 1: per-column min/max — a tiny agg broadcast back; pass 2:
    * integer bin assignment + count, map-side combining into ≤ 16
    * rows per column), both exchanges bounded by |columns| × 16
    * regardless of corpus size. Pure integer bin arithmetic
    * (`(v−mn)·16 div (mx−mn+1)`) both engines replay exactly. */
  def clsHistogramProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def centsOf(df: DataFrame, names: String*): DataFrame =
      df.select(explode(array(names.map(n =>
          struct(lit(n).as("col_name"),
            (col(n).cast(DecimalType(18, 2)) * lit(100)).cast("long")
              .as("cents"))): _*)).as("v"))
        .select(col("v.col_name").as("col_name"), col("v.cents").as("cents"))
    def vals = centsOf(Tables.orders(spark, dir), "o_totalprice")
      .unionAll(centsOf(Tables.lineitem(spark, dir),
        "l_extendedprice", "l_quantity"))
    val stats = vals.groupBy("col_name")
      .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    vals.join(broadcast(stats), "col_name")
      .withColumn("bin",
        least(expr("(cents - mn) * 16 div (mx - mn + 1)"), lit(15L)))
      .groupBy("col_name", "bin")
      .agg(count(lit(1)).as("n"), min(col("cents")).as("bin_min_cents"),
        max(col("cents")).as("bin_max_cents"))
      .reportSort("col_name", "bin")
  }

  val clsHistogramProfileSql: String =
    """WITH vals AS (
      |  SELECT 'o_totalprice' AS col_name,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents FROM orders
      |  UNION ALL
      |  SELECT 'l_extendedprice',
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity',
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
      |    FROM lineitem),
      |s AS (
      |  SELECT col_name, MIN(cents) AS mn, MAX(cents) AS mx
      |  FROM vals GROUP BY col_name)
      |SELECT v.col_name,
      |  LEAST((v.cents - s.mn) * 16 // (s.mx - s.mn + 1), 15) AS bin,
      |  COUNT(*) AS n,
      |  CAST(MIN(v.cents) AS BIGINT) AS bin_min_cents,
      |  CAST(MAX(v.cents) AS BIGINT) AS bin_max_cents
      |FROM vals v JOIN s ON v.col_name = s.col_name
      |GROUP BY 1, 2 ORDER BY v.col_name, bin""".stripMargin

  // -------------------------------------------- cls_dow_seasonality
  /** Day-of-week seasonality profile — the periodicity complement to
    * [[clsAutocorr]]'s lag correlation: order volume and value by
    * weekday, each day's traffic share and its per-mille deviation
    * from the uniform 1/7 (the integer chi-square-style residual a
    * drift monitor thresholds). One scan, a 7-row aggregate, total
    * broadcast back — flat at any corpus size. */
  def clsDowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byDow = Tables.orders(spark, dir)
      .select((dayofweek(to_date(col("o_orderdate"))) - 1).as("dow"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents_sum"))
    val tot = byDow.agg(sum(col("n_orders")).as("_t"))
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_orders"), col("cents_sum"),
        expr("n_orders * 1000 div _t").as("share_pm"),
        expr("abs(n_orders * 7 - _t) * 1000 div _t").as("dev_pm"))
      .reportSort("dow")
  }

  val clsDowSeasonalitySql: String =
    """WITH d AS (
      |  SELECT dayofweek(CAST(o_orderdate AS DATE)) AS dow,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders),
      |g AS (
      |  SELECT dow, COUNT(*) AS n_orders,
      |    CAST(SUM(cents) AS BIGINT) AS cents_sum
      |  FROM d GROUP BY dow),
      |t AS (SELECT SUM(n_orders) AS tt FROM g)
      |SELECT CAST(g.dow AS INTEGER) AS dow, g.n_orders, g.cents_sum,
      |  CAST(g.n_orders * 1000 // t.tt AS BIGINT) AS share_pm,
      |  CAST(ABS(g.n_orders * 7 - t.tt) * 1000 // t.tt AS BIGINT)
      |    AS dev_pm
      |FROM g CROSS JOIN t ORDER BY dow""".stripMargin

  // ------------------------------------------------- cls_null_profile
  /** Missingness profile — the FIRST panel every data profiler renders
    * (null rate per column, rows fully populated): the TPC-H dump is
    * complete by construction, so the driver key profiles a
    * deterministically SPARSIFIED wire view (each column dropped on a
    * portable modulus of the key — the [[clsEntityMatch]] /
    * dedup_template precedent: synthesize the operator's real input
    * shape when the corpus lacks it). One melt scan → one hash-agg
    * for the per-column panel; the rows-with-any-null figure is a
    * ROW-LOCAL or over the masks (they are pure key functions), so it
    * is a second column-pruned scan folding straight into a 1-row
    * aggregate — never a per-row keyed shuffle. Scale: output is
    * |columns|+1 rows however large the table. */
  def clsNullProfile(spark: SparkSession, dir: String): DataFrame = {
    val perCol = Tables.orders(spark, dir).select(
        explode(array(
          struct(lit("o_custkey").as("col_name"),
            (col("o_orderkey") % 7 === 0).as("miss")),
          struct(lit("o_totalprice").as("col_name"),
            (col("o_orderkey") % 13 === 0).as("miss")),
          struct(lit("o_orderpriority").as("col_name"),
            (col("o_orderkey") % 5 === 0).as("miss")))).as("e"))
      .groupBy(col("e.col_name").as("col_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("e.miss").cast("long")).as("n_null"))
    val anyNull = Tables.orders(spark, dir)
      .select(((col("o_orderkey") % 7 === 0) ||
        (col("o_orderkey") % 13 === 0) ||
        (col("o_orderkey") % 5 === 0)).cast("long").as("_any"))
      .agg(count(lit(1)).as("n"), sum(col("_any")).as("n_null"))
      .select(lit("_rows_any_null").as("col_name"), col("n"),
        col("n_null"))
    perCol.unionByName(anyNull)
      .withColumn("null_pm", expr("n_null * 1000 div n"))
      .reportSort("col_name")
  }

  val clsNullProfileSql: String =
    """WITH e AS (
      |  SELECT o_orderkey,
      |    unnest(['o_custkey','o_totalprice','o_orderpriority'])
      |      AS col_name,
      |    unnest([CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END,
      |            CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END,
      |            CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END])
      |      AS miss
      |  FROM orders),
      |pc AS (
      |  SELECT col_name, COUNT(*) AS n,
      |    CAST(SUM(miss) AS BIGINT) AS n_null
      |  FROM e GROUP BY 1),
      |ar AS (
      |  SELECT '_rows_any_null' AS col_name, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN o_orderkey % 7 = 0 OR o_orderkey % 13 = 0
      |                    OR o_orderkey % 5 = 0
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_null
      |  FROM orders),
      |u AS (SELECT * FROM pc UNION ALL SELECT * FROM ar)
      |SELECT col_name, n, n_null,
      |  CAST(n_null * 1000 // n AS BIGINT) AS null_pm
      |FROM u ORDER BY col_name""".stripMargin

  // ------------------------------------------------- cls_cramers_v
  /** CRAMÉR'S V — the normalized association strength between two
    * categorical columns ([0,1], comparable ACROSS column pairs,
    * which raw chi-square is not): the profiler's answer to "which
    * columns are redundant proxies for each other". Built on the same
    * |cells|-bounded contingency frame as [[clsContingency]] — one
    * orders scan → (status × priority) hash-agg, marginals broadcast
    * back — with ALL ratio arithmetic kept in scaled integers so the
    * oracle compares exactly: per-cell χ² contribution as
    * `(obs·S div rowTot)·obs div colTot` (S = 10¹², two floor
    * divisions both engines replay bit-for-bit), χ² in micro-units
    * via the algebraic identity χ² = n·(Σ obs²/(r·c) − 1), and
    * V² = χ²/(n·min(r−1,c−1)) in ppm — no float, no sqrt, no libm
    * portability risk. BIGINT headroom: n·Σcontrib ≤ n·S·min(r,c),
    * fine to ~10⁶ rows per... to n ≈ 9·10⁵·10⁶; beyond that the
    * documented DECIMAL(38) seam (same plan) applies. */
  def clsCramersV(spark: SparkSession, dir: String): DataFrame = {
    val s = 1000000000000L // 1e12 contribution scale
    val cells = Tables.orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("obs"))
    val rowTot = cells.groupBy("o_orderstatus")
      .agg(sum(col("obs")).as("rt"), count(lit(1)).as("_rc"))
    val colTot = cells.groupBy("o_orderpriority")
      .agg(sum(col("obs")).as("ct"))
    val dims = rowTot.agg(count(lit(1)).as("r_levels"))
      .crossJoin(colTot.agg(count(lit(1)).as("c_levels")))
    cells.join(broadcast(rowTot.drop("_rc")), "o_orderstatus")
      .join(broadcast(colTot), "o_orderpriority")
      .select(expr(s"((obs * ${s}L div rt) * obs) div ct").as("contrib"),
        col("obs"))
      .agg(sum(col("contrib")).as("sc"), sum(col("obs")).as("n"))
      .crossJoin(broadcast(dims))
      .select(col("n"), col("r_levels"), col("c_levels"),
        expr(s"n * (sc - ${s}L) div 1000000").as("chi2_micro"))
      .withColumn("dof", expr("least(r_levels - 1, c_levels - 1)"))
      .withColumn("v2_ppm", expr("chi2_micro div (n * dof)"))
  }

  val clsCramersVSql: String =
    """WITH cells AS (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS obs
      |  FROM orders GROUP BY 1, 2),
      |r AS (SELECT o_orderstatus, SUM(obs) AS rt FROM cells GROUP BY 1),
      |c AS (SELECT o_orderpriority, SUM(obs) AS ct FROM cells
      |      GROUP BY 1),
      |d AS (SELECT (SELECT COUNT(*) FROM r) AS r_levels,
      |             (SELECT COUNT(*) FROM c) AS c_levels),
      |s AS (
      |  SELECT
      |    CAST(SUM((((obs * 1000000000000) // rt) * obs) // ct)
      |      AS BIGINT) AS sc,
      |    CAST(SUM(obs) AS BIGINT) AS n
      |  FROM cells JOIN r USING (o_orderstatus)
      |    JOIN c USING (o_orderpriority))
      |SELECT n, r_levels, c_levels,
      |  CAST(n * (sc - 1000000000000) // 1000000 AS BIGINT)
      |    AS chi2_micro,
      |  CAST(LEAST(r_levels - 1, c_levels - 1) AS BIGINT) AS dof,
      |  CAST(CAST(n * (sc - 1000000000000) // 1000000 AS BIGINT)
      |    // (n * LEAST(r_levels - 1, c_levels - 1)) AS BIGINT)
      |    AS v2_ppm
      |FROM s CROSS JOIN d""".stripMargin

  // ---------------------------------------------- cls_key_discovery
  /** CANDIDATE-KEY discovery — the profiler step that tells a CDC
    * pipeline WHICH columns can key a table (the reference discovers
    * keys before replication; its streaming form is the test-only
    * key-discovery component): for a candidate set of single columns
    * and composite pairs, the distinct-tuple count vs the row count,
    * a uniqueness ratio in per-mille, and the is-key verdict. All six
    * candidates ride ONE aggregate (Catalyst expands the multiple
    * DISTINCTs into a single Expand scan — six separate
    * `SELECT COUNT(DISTINCT …)` passes would scan six times). A
    * column pair whose ratio is ~1000 but not exactly is the classic
    * "almost key" that breaks an upsert sink — the gap, not just the
    * verdict, is the audit. */
  def clsKeyDiscovery(spark: SparkSession, dir: String): DataFrame = {
    // width-pin the Expand: the 6-way multi-DISTINCT scan otherwise
    // runs in the single-split scan task at bench SF (the q45 /
    // decimal-profile precedent)
    val wide = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
        "o_orderpriority")
      .repartition(spark.sparkContext.defaultParallelism,
        col("o_orderkey"))
      .agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("c1"),
      countDistinct(col("o_custkey")).as("c2"),
      countDistinct(col("o_orderdate")).as("c3"),
      countDistinct(col("o_custkey"), col("o_orderdate")).as("c4"),
      countDistinct(col("o_custkey"), col("o_totalprice")).as("c5"),
      countDistinct(col("o_orderdate"), col("o_orderpriority")).as("c6"))
    val named = Seq(
      "o_orderkey" -> "c1", "o_custkey" -> "c2", "o_orderdate" -> "c3",
      "o_custkey,o_orderdate" -> "c4", "o_custkey,o_totalprice" -> "c5",
      "o_orderdate,o_orderpriority" -> "c6")
    wide.select(col("n_rows"), explode(array(named.map { case (nm, c) =>
        struct(lit(nm).as("candidate"), col(c).as("n_distinct"))
      }: _*)).as("e"))
      .select(col("e.candidate").as("candidate"),
        col("e.n_distinct").as("n_distinct"), col("n_rows"))
      .withColumn("uniqueness_pm", expr("n_distinct * 1000 div n_rows"))
      .withColumn("is_key",
        when(col("n_distinct") === col("n_rows"), 1L).otherwise(0L))
      .reportSort("candidate")
  }

  val clsKeyDiscoverySql: String =
    """WITH n AS (SELECT COUNT(*) AS n_rows FROM orders),
      |c AS (
      |  SELECT 'o_orderkey' AS candidate,
      |    (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_distinct
      |  UNION ALL SELECT 'o_custkey',
      |    (SELECT COUNT(DISTINCT o_custkey) FROM orders)
      |  UNION ALL SELECT 'o_orderdate',
      |    (SELECT COUNT(DISTINCT o_orderdate) FROM orders)
      |  UNION ALL SELECT 'o_custkey,o_orderdate',
      |    (SELECT COUNT(*) FROM
      |      (SELECT DISTINCT o_custkey, o_orderdate FROM orders))
      |  UNION ALL SELECT 'o_custkey,o_totalprice',
      |    (SELECT COUNT(*) FROM
      |      (SELECT DISTINCT o_custkey, o_totalprice FROM orders))
      |  UNION ALL SELECT 'o_orderdate,o_orderpriority',
      |    (SELECT COUNT(*) FROM
      |      (SELECT DISTINCT o_orderdate, o_orderpriority FROM orders)))
      |SELECT candidate, CAST(n_distinct AS BIGINT) AS n_distinct,
      |  n_rows,
      |  CAST(n_distinct * 1000 // n_rows AS BIGINT) AS uniqueness_pm,
      |  CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_key
      |FROM c CROSS JOIN n ORDER BY candidate""".stripMargin

  // --------------------------------------------------- cls_approx_fd
  /** APPROXIMATE functional dependency strength — the profiling
    * complement to [[clsFunctionalDep]]'s boolean: real data almost
    * never satisfies an FD exactly, so what a discovery pass ranks is
    * the g₃ error (TANE's measure): the minimum fraction of rows that
    * must be removed for A→B to hold = 1 − Σ_groups mode(B|A) / n.
    * Per candidate pair: one (pair, dv, pv) hash-agg, one per-group
    * max (the mode), one fold — all combiner-friendly, one melted
    * scan for every pair (never a scan per candidate). Reported as
    * keep-strength per-mille: 1000 = exact FD. */
  def clsApproxFd(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Seq(
      "o_custkey" -> "o_orderstatus",
      "o_orderstatus" -> "o_orderpriority",
      "o_orderkey" -> "o_orderstatus",
      "o_orderpriority" -> "o_orderstatus")
    val melted = Tables.orders(spark, dir).select(explode(array(
      pairs.map { case (a, b) => struct(
        lit(a).as("det"), lit(b).as("dep"),
        col(a).cast("string").as("dv"), col(b).cast("string").as("pv"))
      }: _*)).as("x")).select("x.*")
    melted.groupBy("det", "dep", "dv", "pv")
      .agg(count(lit(1)).as("_c"))
      .groupBy("det", "dep", "dv")
      .agg(max(col("_c")).as("_mode"), sum(col("_c")).as("_n"))
      .groupBy("det", "dep")
      .agg(count(lit(1)).as("n_groups"),
        sum(col("_mode")).as("n_keep"),
        sum(col("_n")).as("n_rows"))
      .select(col("det").as("determinant"), col("dep").as("dependent"),
        col("n_groups"),
        expr("n_keep * 1000 div n_rows").as("strength_pm"),
        (col("n_keep") === col("n_rows")).as("exact"))
      .reportSort("determinant", "dependent")
  }

  val clsApproxFdSql: String =
    """WITH m AS (
      |  SELECT 'o_custkey' AS det, 'o_orderstatus' AS dep,
      |    CAST(o_custkey AS VARCHAR) AS dv, o_orderstatus AS pv
      |  FROM orders
      |  UNION ALL SELECT 'o_orderstatus', 'o_orderpriority',
      |    o_orderstatus, o_orderpriority FROM orders
      |  UNION ALL SELECT 'o_orderkey', 'o_orderstatus',
      |    CAST(o_orderkey AS VARCHAR), o_orderstatus FROM orders
      |  UNION ALL SELECT 'o_orderpriority', 'o_orderstatus',
      |    o_orderpriority, o_orderstatus FROM orders),
      |c AS (SELECT det, dep, dv, pv, COUNT(*) AS c
      |      FROM m GROUP BY 1, 2, 3, 4),
      |g AS (SELECT det, dep, dv, MAX(c) AS mode_c, SUM(c) AS n
      |      FROM c GROUP BY 1, 2, 3)
      |SELECT det AS determinant, dep AS dependent,
      |  COUNT(*) AS n_groups,
      |  CAST(SUM(mode_c) * 1000 // SUM(n) AS BIGINT) AS strength_pm,
      |  SUM(mode_c) = SUM(n) AS exact
      |FROM g GROUP BY 1, 2 ORDER BY determinant, dependent""".stripMargin

  // --------------------------------------------- cls_decimal_profile
  /** Numeric PRECISION/SCALE profiling — the storage-typing question
    * behind every "this double is really money" migration: per
    * numeric column, the minimal DECIMAL scale s such that every
    * value·10^s is integral (probed through exact DECIMAL(18,6)
    * widening, never float modulo), the precision the widest value
    * then needs, and the range — the suggested DECIMAL(p,s) a
    * profiler emits. One melted scan, one hash-agg; the per-value
    * scale probe is pure decimal arithmetic, bit-identical in any
    * engine. */
  def clsDecimalProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // widen ONCE through exact decimal to integer micros; the scale
    // probe is then pure long modulo in codegen (the decimal-%-chain
    // form cost 7 s at sf0.1 — all of it interpreted decimal ops)
    // width-pin the melt: 4× the corpus of decimal widenings otherwise
    // runs in the scan's single task at bench SF (the winnowing-digest
    // precedent — per-partition compute ≫ task overhead; natural
    // splits provide the width at scale)
    val melted = Tables.lineitem(spark, dir)
      .select((col("l_orderkey") +: cols.map(col)): _*)
      .repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
      .select(explode(array(
      cols.map { c => struct(lit(c).as("col"),
        (col(c).cast(DecimalType(18, 6)) * 1000000).cast("long")
          .as("vm")) }: _*)).as("x"))
      .select("x.*")
    val scaled = melted
      .withColumn("s",
        when(col("vm") % 1000000L === 0L, 0)
          .when(col("vm") % 100000L === 0L, 1)
          .when(col("vm") % 10000L === 0L, 2)
          .when(col("vm") % 1000L === 0L, 3)
          .otherwise(6))
    scaled.groupBy("col")
      .agg(count(lit(1)).as("n"),
        max(col("s")).as("scale"),
        max(abs(col("vm"))).as("_maxabs_micro"))
      .select(col("col"), col("n"), col("scale").cast("long").as("scale"),
        // integer divisor via CASE (a float pow could truncate wrong)
        (length(expr(
          "cast(_maxabs_micro div (case cast(scale as int) " +
            "when 0 then 1000000L when 1 then 100000L " +
            "when 2 then 10000L when 3 then 1000L else 1L end) " +
            "as string)")).cast("long") + col("scale")).as("precision"))
      .reportSort("col")
  }

  val clsDecimalProfileSql: String =
    """WITH m AS (
      |  SELECT 'l_quantity' AS col, CAST(l_quantity AS DECIMAL(18,6)) AS v
      |  FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice',
      |    CAST(l_extendedprice AS DECIMAL(18,6)) FROM lineitem
      |  UNION ALL SELECT 'l_discount',
      |    CAST(l_discount AS DECIMAL(18,6)) FROM lineitem
      |  UNION ALL SELECT 'l_tax',
      |    CAST(l_tax AS DECIMAL(18,6)) FROM lineitem),
      |s AS (
      |  SELECT col, v,
      |    CASE WHEN v % 1 = 0 THEN 0
      |         WHEN (v * 10) % 1 = 0 THEN 1
      |         WHEN (v * 100) % 1 = 0 THEN 2
      |         WHEN (v * 1000) % 1 = 0 THEN 3
      |         ELSE 6 END AS sc
      |  FROM m)
      |SELECT col, COUNT(*) AS n,
      |  CAST(MAX(sc) AS BIGINT) AS scale,
      |  CAST(length(CAST(CAST(MAX(ABS(v) * 1000000) AS BIGINT) //
      |      (CASE MAX(sc) WHEN 0 THEN 1000000 WHEN 1 THEN 100000
      |        WHEN 2 THEN 10000 WHEN 3 THEN 1000 ELSE 1 END)
      |      AS VARCHAR))
      |    + MAX(sc) AS BIGINT) AS precision
      |FROM s GROUP BY col ORDER BY col""".stripMargin

  // -------------------------------------------------- cls_mutual_info
  /** WHOLE-BIT MUTUAL INFORMATION between two categorical columns —
    * the information-theoretic dependence profiler beside
    * [[clsCramersV]]'s χ²-based one (MI sees any dependence, χ²
    * weights by deviation): pointwise MI per cell in WHOLE BITS via
    * the surprisal identity ⌊log₂⌋(c_xy·N / (c_x·c_y)) ≈
    * len(bin(c_xy·N)) − len(bin(c_x·c_y)) — pure integer string
    * arithmetic, no libm, the [[graft.text.TextAnalysis]] trick on a
    * contingency table. One (x, y) hash-agg + two marginal rollups of
    * the |cells| frame; everything after the first agg is
    * dimension-sized. int64 bound: c·N and c_x·c_y stay in-bounds to
    * ~3e9 rows (past that the products widen to DECIMAL unchanged). */
  def clsMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val joint = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("x"),
        col("o_orderpriority").as("y"))
      .agg(count(lit(1)).as("c"))
      .cut
    val mx = joint.groupBy("x").agg(sum(col("c")).as("cx"))
    val my = joint.groupBy("y").agg(sum(col("c")).as("cy"))
    val n = joint.agg(sum(col("c")).as("n"))
    joint.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(n))
      .select(col("x"), col("y"), col("c"),
        (length(expr("bin(c * n)")) - length(expr("bin(cx * cy)")))
          .cast("long").as("pmi_bits"))
      .withColumn("mi_contrib", col("c") * col("pmi_bits"))
      .reportSort("x", "y")
  }

  val clsMutualInfoSql: String =
    """WITH j AS (
      |  SELECT o_orderstatus AS x, o_orderpriority AS y, COUNT(*) AS c
      |  FROM orders GROUP BY 1, 2),
      |mx AS (SELECT x, SUM(c) AS cx FROM j GROUP BY x),
      |my AS (SELECT y, SUM(c) AS cy FROM j GROUP BY y),
      |n AS (SELECT SUM(c) AS n FROM j)
      |SELECT j.x, j.y, j.c,
      |  CAST(length(bin(j.c * n.n)) - length(bin(mx.cx * my.cy))
      |    AS BIGINT) AS pmi_bits,
      |  CAST(j.c * (length(bin(j.c * n.n)) - length(bin(mx.cx * my.cy)))
      |    AS BIGINT) AS mi_contrib
      |FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n
      |ORDER BY x, y""".stripMargin

  // -------------------------------------------------- cls_chi2_gof
  /** χ² GOODNESS-OF-FIT of the LAST digit of the price against
    * uniform — [[clsBenford]]'s standard companion (Benford profiles
    * the FIRST digit, whose skew is natural; last digits of genuine
    * transaction amounts should be uniform, and a χ² spike there is
    * the classic fabrication signal auditors actually test): per
    * digit the exact integer deviation (10·n_d − N)², summed into
    * χ²·1000 = Σ(10·n_d − N)²·1000 / (10·N) — DECIMAL(38)
    * intermediates (the square exceeds 2^63 past ~1e9 rows; decimal
    * keeps 38-digit headroom and positive `div` floors identically
    * in both engines). One corpus hash-agg → 10-row digit frame +
    * a 1-row statistic (df = 9: uniform rejected at 1% when
    * chi2_milli > 21666). */
  def clsChi2Gof(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val digits = Tables.orders(spark, dir)
      .select(pmod((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long"), lit(10L)).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .cut // 10-row frame, 2 consumers
    val tot = digits.agg(sum(col("n")).as("t"))
    digits.crossJoin(broadcast(tot))
      .agg(max(col("t")).as("n_rows"),
        sum(expr("CAST((10 * n - t) AS DECIMAL(38,0))" +
          " * CAST((10 * n - t) AS DECIMAL(38,0))")).as("_ss"),
        max(expr("abs(10 * n - t) * 100 div t")).as("max_dev_pct"))
      .select(col("n_rows"),
        expr("CAST(_ss * 1000 div (CAST(10 AS DECIMAL(38,0)) * n_rows)" +
          " AS BIGINT)").as("chi2_milli"),
        col("max_dev_pct"))
  }

  val clsChi2GofSql: String =
    """WITH d AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT) % 10 AS digit
      |  FROM orders),
      |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      |t AS (SELECT SUM(n) AS t FROM g)
      |SELECT CAST(MAX(t.t) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(10 * n - t.t AS HUGEINT)
      |    * CAST(10 * n - t.t AS HUGEINT)) * 1000
      |    // (10 * CAST(MAX(t.t) AS HUGEINT)) AS BIGINT) AS chi2_milli,
      |  CAST(MAX(ABS(10 * n - t.t) * 100 // t.t) AS BIGINT)
      |    AS max_dev_pct
      |FROM g CROSS JOIN t""".stripMargin

  // -------------------------------------------------- cls_theil_u
  /** THEIL'S U (uncertainty coefficient) between event type and
    * hour-of-day — the ASYMMETRIC dependence profiler the symmetric
    * pair ([[clsMutualInfo]], [[clsCramersV]]) can't express: U(X|Y)
    * = I(X;Y)/H(X) answers "how much of X does knowing Y remove",
    * and U(X|Y) ≠ U(Y|X) is exactly what schema-role discovery needs
    * (a category that predicts the hour is not predicted BY it).
    * All terms ride the whole-bit bin-length identity on one
    * |X×Y|-cell contingency frame: H(X) = Σ cx·(len(bin N) −
    * len(bin cx)), MI = Σ c·(len(bin c·N) − len(bin cx·cy)) — pure
    * integer string arithmetic. Floor noise can push the whole-bit
    * MI a few bits NEGATIVE on near-independent columns, so the
    * ratio clamps at zero on BOTH sides (true MI is ≥ 0) — never a
    * signed division (the repo's pinned hash hazard). One corpus
    * hash-agg; everything after is cell-frame-sized. */
  def clsTheilU(spark: SparkSession, dir: String): DataFrame = {
    val joint = Tables.events(spark, dir)
      .groupBy(col("event_type").as("x"), hour(col("ts")).as("y"))
      .agg(count(lit(1)).as("c"))
      .cut // |types×24| frame, 4 consumers
    val mx = joint.groupBy("x").agg(sum(col("c")).as("cx"))
    val my = joint.groupBy("y").agg(sum(col("c")).as("cy"))
    val n = joint.agg(sum(col("c")).as("n"))
    val mi = joint.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(n))
      .agg(sum(col("c") *
        (length(expr("bin(c * n)")) - length(expr("bin(cx * cy)")))
          .cast("long")).as("mi_bits"))
    val hx = mx.crossJoin(broadcast(n))
      .agg(sum(col("cx") *
        (length(expr("bin(n)")) - length(expr("bin(cx)"))).cast("long"))
        .as("hx_bits"))
    val hy = my.crossJoin(broadcast(n))
      .agg(sum(col("cy") *
        (length(expr("bin(n)")) - length(expr("bin(cy)"))).cast("long"))
        .as("hy_bits"))
    mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("mi_bits"), col("hx_bits"), col("hy_bits"),
        expr("greatest(mi_bits, 0) * 1000 div greatest(hx_bits, 1)")
          .as("u_x_given_y_milli"),
        expr("greatest(mi_bits, 0) * 1000 div greatest(hy_bits, 1)")
          .as("u_y_given_x_milli"))
  }

  val clsTheilUSql: String =
    """WITH j AS (
      |  SELECT event_type AS x, CAST(hour(ts) AS INTEGER) AS y,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |mx AS (SELECT x, SUM(c) AS cx FROM j GROUP BY x),
      |my AS (SELECT y, SUM(c) AS cy FROM j GROUP BY y),
      |n AS (SELECT SUM(c) AS n FROM j),
      |mi AS (
      |  SELECT CAST(SUM(c * (length(bin(c * n.n)) -
      |    length(bin(mx.cx * my.cy)))) AS BIGINT) AS mi_bits
      |  FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n),
      |hx AS (
      |  SELECT CAST(SUM(cx * (length(bin(n.n)) - length(bin(cx))))
      |    AS BIGINT) AS hx_bits FROM mx CROSS JOIN n),
      |hy AS (
      |  SELECT CAST(SUM(cy * (length(bin(n.n)) - length(bin(cy))))
      |    AS BIGINT) AS hy_bits FROM my CROSS JOIN n)
      |SELECT mi_bits, hx_bits, hy_bits,
      |  CAST(GREATEST(mi_bits, 0) * 1000 // GREATEST(hx_bits, 1)
      |    AS BIGINT) AS u_x_given_y_milli,
      |  CAST(GREATEST(mi_bits, 0) * 1000 // GREATEST(hy_bits, 1)
      |    AS BIGINT) AS u_y_given_x_milli
      |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin

  // -------------------------------------------------- cls_jsd_drift
  /** WHOLE-BIT JENSEN–SHANNON drift panel between the two halves of
    * the shipment timeline — the bounded, symmetric companion to
    * [[clsPsiDrift]] (PSI blows up on empty reference buckets; JSD's
    * mixture denominator never does): quantity is bucketed on the
    * FIXED 5-unit grid, the timeline splits at its own midpoint, and
    * each bucket reports the pointwise ⌊log₂⌋ ratios against the
    * mixture via the [[clsMutualInfo]] bin-length identity —
    * p/m = 2aC/(aC+bR) and q/m = 2bR/(aC+bR) are ratios of PURE
    * INTEGER products, so both engines compute identical whole-bit
    * values with no libm. One corpus scan → |buckets| hash-agg; the
    * totals reaggregate the bucket frame (AQE reuses its exchange).
    * int64 bound: a·C ≤ n² caps at n ≈ 3·10⁹ rows; past that the
    * products widen to DECIMAL(38,0) on both engines unchanged. */
  def clsJsdDrift(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("_d",
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01")))
    val bounds = li.agg(min(col("_d")).as("dmin"), max(col("_d")).as("dmax"))
    val cells = li.crossJoin(broadcast(bounds))
      .withColumn("_cur", col("_d") * 2 > col("dmin") + col("dmax"))
      .groupBy(floor((col("l_quantity") - 1) / 5).cast("long")
        .as("bucket"))
      .agg(sum(when(col("_cur"), 0L).otherwise(1L)).as("a"),
        sum(when(col("_cur"), 1L).otherwise(0L)).as("b"))
      // ≤10-row frame with two consumers (report + totals): pin it so
      // the totals reaggregation never re-scans the corpus — the
      // clsMutualInfo play
      .cut
    val totals = cells.agg(sum(col("a")).as("r"), sum(col("b")).as("c"))
    cells.crossJoin(broadcast(totals))
      .select(col("bucket"), col("a").as("n_ref"), col("b").as("n_cur"),
        when(col("a") > 0,
          length(expr("bin(2 * a * c)")) -
            length(expr("bin(a * c + b * r)")))
          .otherwise(0L).cast("long").as("ref_bits"),
        when(col("b") > 0,
          length(expr("bin(2 * b * r)")) -
            length(expr("bin(a * c + b * r)")))
          .otherwise(0L).cast("long").as("cur_bits"))
      .withColumn("jsd_contrib",
        col("n_ref") * col("ref_bits") + col("n_cur") * col("cur_bits"))
      .reportSort("bucket")
  }

  val clsJsdDriftSql: String =
    """WITH li AS (
      |  SELECT CAST(FLOOR((l_quantity - 1) / 5) AS BIGINT) AS bucket,
      |    DATEDIFF('day', DATE '1970-01-01',
      |      CAST(l_shipdate AS DATE)) AS d
      |  FROM lineitem),
      |bn AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM li),
      |cells AS (
      |  SELECT bucket,
      |    SUM(CASE WHEN d * 2 > dmin + dmax THEN 0 ELSE 1 END) AS a,
      |    SUM(CASE WHEN d * 2 > dmin + dmax THEN 1 ELSE 0 END) AS b
      |  FROM li, bn GROUP BY bucket),
      |t AS (SELECT SUM(a) AS r, SUM(b) AS c FROM cells)
      |SELECT bucket, CAST(a AS BIGINT) AS n_ref, CAST(b AS BIGINT) AS n_cur,
      |  CAST(CASE WHEN a > 0 THEN length(bin(2 * a * c)) -
      |    length(bin(a * c + b * r)) ELSE 0 END AS BIGINT) AS ref_bits,
      |  CAST(CASE WHEN b > 0 THEN length(bin(2 * b * r)) -
      |    length(bin(a * c + b * r)) ELSE 0 END AS BIGINT) AS cur_bits,
      |  CAST(a * (CASE WHEN a > 0 THEN length(bin(2 * a * c)) -
      |      length(bin(a * c + b * r)) ELSE 0 END) +
      |    b * (CASE WHEN b > 0 THEN length(bin(2 * b * r)) -
      |      length(bin(a * c + b * r)) ELSE 0 END) AS BIGINT)
      |    AS jsd_contrib
      |FROM cells, t ORDER BY bucket""".stripMargin

  // --------------------------------------------- cls_hhi_concentration
  /** HERFINDAHL–HIRSCHMAN concentration per categorical column — the
    * imbalance profiler beside [[clsGini]] (HHI is the market-
    * concentration form: Σ share², 1/HHI = effective number of
    * categories — the signal that decides whether a column is a
    * usable partition/stratification key or one hot value dominates):
    * per column exact n, k distinct, Σc² as integers, HHI in
    * per-mille by integer division, and the effective-category count
    * in milli-units (1000·n²/Σc²). One hash-agg per (col, value) —
    * map-side combining bounds the shuffle by the value domain —
    * then a |values|-frame rollup. int64 bound: Σc²·1000 ≤ 1000·n²
    * caps at n ≈ 3·10⁶ rows per column (sf1-proven); past that the
    * scaled products widen to DECIMAL(38,0) on both engines. */
  def clsHhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val melted =
      ord.select(lit("o_orderstatus").as("col"),
          col("o_orderstatus").as("v"))
        .unionAll(ord.select(lit("o_orderpriority").as("col"),
          col("o_orderpriority").as("v")))
        .unionAll(cust.select(lit("c_mktsegment").as("col"),
          col("c_mktsegment").as("v")))
    melted.groupBy("col", "v").agg(count(lit(1)).as("c"))
      .groupBy("col")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("col"), col("n"), col("k"), col("sum_c2"),
        expr("sum_c2 * 1000 div (n * n)").as("hhi_pm"),
        expr("n * n * 1000 div sum_c2").as("eff_categories_milli"))
      .reportSort("col")
  }

  val clsHhiConcentrationSql: String =
    """WITH m AS (
      |  SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
      |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
      |  UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer),
      |g AS (SELECT col, v, COUNT(*) AS c FROM m GROUP BY col, v)
      |SELECT col, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS k,
      |  CAST(SUM(c * c) AS BIGINT) AS sum_c2,
      |  CAST(SUM(c * c) * 1000 // (SUM(c) * SUM(c)) AS BIGINT) AS hhi_pm,
      |  CAST(SUM(c) * SUM(c) * 1000 // SUM(c * c) AS BIGINT)
      |    AS eff_categories_milli
      |FROM g GROUP BY col ORDER BY col""".stripMargin

  // ------------------------------------------------ cls_gamma_assoc
  /** GOODMAN–KRUSKAL GAMMA — ordinal association for profiled column
    * pairs, computed the grid way: each pair's values land on their
    * natural bounded grid (quantity units, discount/tax milli), ONE
    * corpus pass builds the |cells| contingency frame, and the
    * concordant/discordant pair counts come from a cell×cell
    * dominance join that is GRID-bounded (≤5k×5k per pair), never
    * corpus-bounded — the same contingency-first contract as
    * [[clsContingency]]/`cls_mutual_info`, which is what makes an
    * O(n²)-pairs statistic a one-scan operator at 100 TB. Pair
    * counts are exact BIGINTs (n ≤ 3e9 before the n² headroom needs
    * the decimal lift); gamma lands in per-mille by integer
    * division. */
  def clsGammaAssoc(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .select(explode(array(
        struct(lit("qty_vs_disc").as("pair"),
          floor(col("l_quantity")).cast("long").as("x"),
          floor(col("l_discount") * 1000).cast("long").as("y")),
        struct(lit("qty_vs_tax").as("pair"),
          floor(col("l_quantity")).cast("long").as("x"),
          floor(col("l_tax") * 1000).cast("long").as("y")),
        struct(lit("disc_vs_tax").as("pair"),
          floor(col("l_discount") * 1000).cast("long").as("x"),
          floor(col("l_tax") * 1000).cast("long").as("y")))).as("m"))
      .groupBy(col("m.pair").as("pair"), col("m.x").as("x"),
        col("m.y").as("y"))
      .agg(count(lit(1)).as("n"))
      .cut // |grid| frame, 2 consumers (a & b sides)
    val a = cells.select(col("pair"), col("x").as("ax"),
      col("y").as("ay"), col("n").as("an"))
    val b = cells.select(col("pair"), col("x").as("bx"),
      col("y").as("by"), col("n").as("bn"))
    a.join(broadcast(b), Seq("pair"))
      .filter(col("bx") > col("ax"))
      .groupBy("pair")
      .agg(
        sum(when(col("by") > col("ay"), col("an") * col("bn"))
          .otherwise(0L)).as("c_pairs"),
        sum(when(col("by") < col("ay"), col("an") * col("bn"))
          .otherwise(0L)).as("d_pairs"))
      .select(col("pair"), col("c_pairs"), col("d_pairs"),
        expr("(c_pairs - d_pairs) * 1000 div (c_pairs + d_pairs)")
          .as("gamma_pm"))
      .reportSort("pair")
  }

  val clsGammaAssocSql: String =
    """WITH m AS (
      |  SELECT 'qty_vs_disc' AS pair,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS x,
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT) AS y FROM lineitem
      |  UNION ALL SELECT 'qty_vs_tax',
      |    CAST(FLOOR(l_quantity) AS BIGINT),
      |    CAST(FLOOR(l_tax * 1000) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'disc_vs_tax',
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT),
      |    CAST(FLOOR(l_tax * 1000) AS BIGINT) FROM lineitem),
      |cells AS (
      |  SELECT pair, x, y, COUNT(*) AS n FROM m GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT a.pair,
      |    SUM(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS c_pairs,
      |    SUM(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS d_pairs
      |  FROM cells a JOIN cells b
      |    ON a.pair = b.pair AND b.x > a.x
      |  GROUP BY 1)
      |SELECT pair, CAST(c_pairs AS BIGINT) AS c_pairs,
      |  CAST(d_pairs AS BIGINT) AS d_pairs,
      |  CAST((c_pairs - d_pairs) * 1000 // (c_pairs + d_pairs)
      |    AS BIGINT) AS gamma_pm
      |FROM j ORDER BY pair""".stripMargin

  // ------------------------------------------------ cls_kendall_tau
  /** KENDALL'S TAU-B — the tie-corrected rank correlation beside
    * [[clsGammaAssoc]] (gamma IGNORES ties; tau-b discounts them,
    * which is what a profiler wants on coarse grids where most pairs
    * tie): same contingency-first contract — ONE corpus pass to the
    * bounded (pair, x, y) cell frame, concordant/discordant from the
    * grid-bounded dominance join, and the tie terms n1 = Σ tx(tx−1)/2,
    * n2 = Σ ty(ty−1)/2 from two marginal aggs of the SAME cell frame.
    * tau-b = (C−D)/√((n0−n1)(n0−n2)) needs a square root the integer
    * discipline must survive: we publish tau_b_pm =
    * sign(C−D)·⌊√((C−D)²·10⁶ div (n0−n1)(n0−n2))⌋ — the inner ratio
    * is ≤ 10⁶ with DECIMAL(38) headroom (n0 ~ 1.8e13 at sf1, its
    * square ~3e26·10⁶ < 10³⁸), and IEEE sqrt of an integer ≤ 10⁶ is
    * correctly rounded in both engines (the nearest-square gap
    * ≥ 4.9e-4 dwarfs double error), so the floor is engine-exact. */
  def clsKendallTau(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .select(explode(array(
        struct(lit("qty_vs_disc").as("pair"),
          floor(col("l_quantity")).cast("long").as("x"),
          floor(col("l_discount") * 1000).cast("long").as("y")),
        struct(lit("qty_vs_tax").as("pair"),
          floor(col("l_quantity")).cast("long").as("x"),
          floor(col("l_tax") * 1000).cast("long").as("y")),
        struct(lit("disc_vs_tax").as("pair"),
          floor(col("l_discount") * 1000).cast("long").as("x"),
          floor(col("l_tax") * 1000).cast("long").as("y")))).as("m"))
      .groupBy(col("m.pair").as("pair"), col("m.x").as("x"),
        col("m.y").as("y"))
      .agg(count(lit(1)).as("n"))
      .cut // |grid| frame, 4 consumers (a, b, tx, ty)
    val a = cells.select(col("pair"), col("x").as("ax"),
      col("y").as("ay"), col("n").as("an"))
    val b = cells.select(col("pair"), col("x").as("bx"),
      col("y").as("by"), col("n").as("bn"))
    val cd = a.join(broadcast(b), Seq("pair"))
      .filter(col("bx") > col("ax"))
      .groupBy("pair")
      .agg(
        sum(when(col("by") > col("ay"), col("an") * col("bn"))
          .otherwise(0L)).as("c_pairs"),
        sum(when(col("by") < col("ay"), col("an") * col("bn"))
          .otherwise(0L)).as("d_pairs"))
    val tx = cells.groupBy("pair", "x").agg(sum(col("n")).as("nx"))
      .groupBy("pair").agg(sum(expr("nx * (nx - 1) div 2")).as("tie_x"),
        sum(col("nx")).as("nn"))
    val ty = cells.groupBy("pair", "y").agg(sum(col("n")).as("ny"))
      .groupBy("pair").agg(sum(expr("ny * (ny - 1) div 2")).as("tie_y"))
    cd.join(broadcast(tx), "pair").join(broadcast(ty), "pair")
      .withColumn("n0", expr("nn * (nn - 1) div 2"))
      .select(col("pair"), col("c_pairs"), col("d_pairs"),
        col("tie_x"), col("tie_y"),
        (expr("""CASE WHEN c_pairs > d_pairs THEN 1
                      WHEN c_pairs < d_pairs THEN -1 ELSE 0 END""") *
          floor(sqrt(expr(
            """(CAST(c_pairs - d_pairs AS DECIMAL(38,0))
              |  * (c_pairs - d_pairs) * 1000000)
              |div (CAST(n0 - tie_x AS DECIMAL(38,0)) * (n0 - tie_y))
              |""".stripMargin).cast("double"))).cast("long"))
          .as("tau_b_pm"))
      .reportSort("pair")
  }

  val clsKendallTauSql: String =
    """WITH m AS (
      |  SELECT 'qty_vs_disc' AS pair,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS x,
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT) AS y FROM lineitem
      |  UNION ALL SELECT 'qty_vs_tax',
      |    CAST(FLOOR(l_quantity) AS BIGINT),
      |    CAST(FLOOR(l_tax * 1000) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'disc_vs_tax',
      |    CAST(FLOOR(l_discount * 1000) AS BIGINT),
      |    CAST(FLOOR(l_tax * 1000) AS BIGINT) FROM lineitem),
      |cells AS (
      |  SELECT pair, x, y, COUNT(*) AS n FROM m GROUP BY 1, 2, 3),
      |cd AS (
      |  SELECT a.pair,
      |    SUM(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS c_pairs,
      |    SUM(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS d_pairs
      |  FROM cells a JOIN cells b
      |    ON a.pair = b.pair AND b.x > a.x
      |  GROUP BY 1),
      |tx AS (
      |  SELECT pair, SUM(nx * (nx - 1) // 2) AS tie_x, SUM(nx) AS nn
      |  FROM (SELECT pair, x, SUM(n) AS nx FROM cells GROUP BY 1, 2)
      |  GROUP BY 1),
      |ty AS (
      |  SELECT pair, SUM(ny * (ny - 1) // 2) AS tie_y
      |  FROM (SELECT pair, y, SUM(n) AS ny FROM cells GROUP BY 1, 2)
      |  GROUP BY 1),
      |j AS (
      |  SELECT cd.pair, c_pairs, d_pairs, tie_x, tie_y,
      |    nn * (nn - 1) // 2 AS n0
      |  FROM cd JOIN tx ON cd.pair = tx.pair
      |  JOIN ty ON cd.pair = ty.pair)
      |SELECT pair, CAST(c_pairs AS BIGINT) AS c_pairs,
      |  CAST(d_pairs AS BIGINT) AS d_pairs,
      |  CAST(tie_x AS BIGINT) AS tie_x, CAST(tie_y AS BIGINT) AS tie_y,
      |  CAST((CASE WHEN c_pairs > d_pairs THEN 1
      |             WHEN c_pairs < d_pairs THEN -1 ELSE 0 END)
      |    * FLOOR(SQRT(CAST(
      |        (CAST(c_pairs - d_pairs AS HUGEINT)
      |          * (c_pairs - d_pairs) * 1000000)
      |        // (CAST(n0 - tie_x AS HUGEINT) * (n0 - tie_y))
      |      AS DOUBLE))) AS BIGINT) AS tau_b_pm
      |FROM j ORDER BY pair""".stripMargin

  // ----------------------------------------------------- cls_anova
  /** ONE-WAY ANOVA decomposition (does the quantity distribution
    * differ across return flags?) in exact integer arithmetic: one
    * map-side-combining pass folds (n, Σx, Σx²) per group; between/
    * within sums of squares use ONE documented floor division per
    * group (s1² div n — truncation bias < k units, identical
    * truncation in both engines on positive sums), and F/η² land in
    * milli/per-mille by integer division. The group state is
    * mergeable (+), so shards combine without a second pass. Σx² of
    * unit-grid quantities keeps int64 headroom to ~3e9 rows; past
    * that the s1² term lifts to decimal — the `cls_spearman`
    * quantize-don't-float contract. */
  def clsAnova(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("grp"),
        floor(col("l_quantity")).cast("long").as("x"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .cut // |groups| frame, 2 consumers
    val pooled = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s1")).as("t1"), sum(col("s2")).as("t2"),
      sum(expr("s1 * s1 div n")).as("bsum"))
      .select(col("k"), col("nn"),
        // clamp: per-group truncation can push an all-but-zero SSB a
        // few units negative, where div (truncate) and // (floor)
        // would disagree
        greatest(col("bsum") - expr("t1 * t1 div nn"), lit(0L))
          .as("ssb"),
        (col("t2") - col("bsum")).as("ssw"))
    g.crossJoin(broadcast(pooled))
      .select(col("grp"), col("n"), col("s1"), col("s2"),
        expr("s1 * 1000 div n").as("mean_milli"),
        col("ssb"), col("ssw"),
        expr("ssb * (nn - k) * 1000 div (ssw * (k - 1))")
          .as("f_milli"),
        expr("ssb * 1000 div (ssb + ssw)").as("eta2_pm"))
      .reportSort("grp")
  }

  val clsAnovaSql: String =
    """WITH g AS (
      |  SELECT l_returnflag AS grp, COUNT(*) AS n,
      |    SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS s1,
      |    SUM(CAST(FLOOR(l_quantity) AS BIGINT) *
      |        CAST(FLOOR(l_quantity) AS BIGINT)) AS s2
      |  FROM lineitem GROUP BY 1),
      |p AS (
      |  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s1) AS t1,
      |    SUM(s2) AS t2, SUM(s1 * s1 // n) AS bsum
      |  FROM g),
      |d AS (
      |  SELECT k, nn, GREATEST(bsum - (t1 * t1 // nn), 0) AS ssb,
      |    t2 - bsum AS ssw
      |  FROM p)
      |SELECT grp, CAST(n AS BIGINT) AS n, CAST(s1 AS BIGINT) AS s1,
      |  CAST(s2 AS BIGINT) AS s2,
      |  CAST(s1 * 1000 // n AS BIGINT) AS mean_milli,
      |  CAST(ssb AS BIGINT) AS ssb, CAST(ssw AS BIGINT) AS ssw,
      |  CAST(ssb * (nn - k) * 1000 // (ssw * (k - 1)) AS BIGINT)
      |    AS f_milli,
      |  CAST(ssb * 1000 // (ssb + ssw) AS BIGINT) AS eta2_pm
      |FROM g CROSS JOIN d ORDER BY grp""".stripMargin

  // ------------------------------------------------ cls_null_pattern
  /** NULL-PATTERN CENSUS — the MISSINGNESS CO-OCCURRENCE map
    * ([[clsNullProfile]] reports per-column rates; this reports which
    * columns go missing TOGETHER, the structure an imputation or
    * required-field policy actually needs): customers enrich with
    * three genuinely-nullable LEFT-JOIN aggregates (any order, any
    * URGENT order, any 2001 order), each row folds its null flags
    * into a bitmask, and the census counts patterns with a readable
    * flag label. Nesting law pinned in spec: a customer missing "any
    * order" must miss the other two. Three key-partitioned
    * hash-aggs + broadcast joins onto the dimension frame; the
    * census is ≤ 2³ rows. */
  def clsNullPattern(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val any = o.groupBy(col("o_custkey").as("ak"))
      .agg(max(col("o_orderdate")).as("last_od"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("uk"))
      .agg(count(lit(1)).as("urgent_cnt"))
    val recent = o
      .filter(year(to_date(col("o_orderdate"))) >= 2001)
      .groupBy(col("o_custkey").as("rk"))
      .agg(count(lit(1)).as("recent_cnt"))
    val enriched = Tables.customer(spark, dir)
      .select(col("c_custkey"))
      .join(broadcast(any), col("c_custkey") === col("ak"), "left")
      .join(broadcast(urgent), col("c_custkey") === col("uk"), "left")
      .join(broadcast(recent), col("c_custkey") === col("rk"), "left")
    val cens = enriched
      .select((when(col("last_od").isNull, 1L).otherwise(0L) +
        when(col("urgent_cnt").isNull, 2L).otherwise(0L) +
        when(col("recent_cnt").isNull, 4L).otherwise(0L)).as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n_customers"))
      .cut // ≤8-row census, total + share consumers
    val tot = cens.agg(sum(col("n_customers")).as("t"))
    cens.crossJoin(broadcast(tot))
      .select(col("pattern"),
        concat(
          when(expr("pattern % 2 = 1"), "O").otherwise("-"),
          when(expr("pattern div 2 % 2 = 1"), "U").otherwise("-"),
          when(expr("pattern div 4 % 2 = 1"), "R").otherwise("-"))
          .as("missing_flags"),
        col("n_customers"),
        expr("n_customers * 1000 div t").as("share_pm"))
      .orderBy("pattern")
  }

  val clsNullPatternSql: String =
    """WITH a AS (
      |  SELECT o_custkey AS ak, MAX(o_orderdate) AS last_od
      |  FROM orders GROUP BY 1),
      |u AS (
      |  SELECT o_custkey AS uk, COUNT(*) AS urgent_cnt
      |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
      |r AS (
      |  SELECT o_custkey AS rk, COUNT(*) AS recent_cnt
      |  FROM orders WHERE YEAR(CAST(o_orderdate AS DATE)) >= 2001
      |  GROUP BY 1),
      |e AS (
      |  SELECT CASE WHEN last_od IS NULL THEN 1 ELSE 0 END +
      |    CASE WHEN urgent_cnt IS NULL THEN 2 ELSE 0 END +
      |    CASE WHEN recent_cnt IS NULL THEN 4 ELSE 0 END AS pattern
      |  FROM customer
      |  LEFT JOIN a ON c_custkey = ak
      |  LEFT JOIN u ON c_custkey = uk
      |  LEFT JOIN r ON c_custkey = rk),
      |c AS (SELECT pattern, COUNT(*) AS n_customers FROM e GROUP BY 1)
      |SELECT CAST(pattern AS BIGINT) AS pattern,
      |  (CASE WHEN pattern % 2 = 1 THEN 'O' ELSE '-' END) ||
      |  (CASE WHEN pattern // 2 % 2 = 1 THEN 'U' ELSE '-' END) ||
      |  (CASE WHEN pattern // 4 % 2 = 1 THEN 'R' ELSE '-' END)
      |    AS missing_flags,
      |  n_customers,
      |  CAST(n_customers * 1000 // SUM(n_customers) OVER () AS BIGINT)
      |    AS share_pm
      |FROM c ORDER BY pattern""".stripMargin

  // ------------------------------------------------ cls_simpsons
  /** SIMPSON'S-PARADOX DETECTOR — does the pooled association between
    * account balance and order activity REVERSE inside strata? The
    * classic aggregation trap every profiling report should flag
    * before anyone acts on a pooled correlation: a confounder
    * (nation here) can make the pooled trend the OPPOSITE of every
    * within-group trend. Exact integer detection: per stratum and
    * pooled, the covariance sign is sign(n·Σxy − Σx·Σy) on cent-grid
    * moments (DECIMAL(38) — the product overflows int64 past ~2e7
    * customers), and the regression slope ships ×10⁹ with an
    * explicit sign-decomposed division (negate-then-floor-divide —
    * identical in both engines, sidestepping the floor-vs-truncate
    * signed-div hazard). The double-count trick (every customer also
    * feeds a nationkey = −1 pooled stratum) keeps it ONE hash-agg.
    * Output: 26 rows — each nation's trend vs the pooled trend with
    * a `flips` verdict. */
  def clsSimpsons(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("y"))
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("long")
        .as("nk"), (col("c_acctbal").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("x"))
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
      .select(explode(array(col("nk"), lit(-1L))).as("nationkey"),
        col("x"), col("y"))
    val m = base.groupBy("nationkey")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", expr(
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("denx", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .select(col("nationkey"), col("n"),
        expr("CAST(SIGN(num) AS BIGINT)").as("trend_sign"),
        expr("CAST(CASE WHEN denx = 0 THEN NULL" +
          " WHEN num >= 0 THEN num * 1000000000 div denx" +
          " ELSE -((-num) * 1000000000 div denx) END AS BIGINT)")
          .as("slope_ppb"))
      .cut // 2 consumers: pooled probe + per-row output
    val pooled = m.filter(col("nationkey") === -1L)
      .select(col("trend_sign").as("pooled_sign"))
    m.crossJoin(broadcast(pooled))
      .withColumn("flips",
        col("nationkey") =!= -1L &&
          col("trend_sign") =!= col("pooled_sign"))
      .reportSort("nationkey")
  }

  val clsSimpsonsSql: String =
    """WITH oc AS (
      |  SELECT o_custkey, COUNT(*) AS y FROM orders GROUP BY 1),
      |b AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
      |    COALESCE(oc.y, 0) AS y
      |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
      |e AS (
      |  SELECT nk AS nationkey, x, y FROM b
      |  UNION ALL SELECT -1, x, y FROM b),
      |m AS (
      |  SELECT nationkey, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |  FROM e GROUP BY 1),
      |d AS (
      |  SELECT nationkey, n,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS denx
      |  FROM m),
      |s AS (
      |  SELECT nationkey, CAST(n AS BIGINT) AS n,
      |    CAST(SIGN(num) AS BIGINT) AS trend_sign,
      |    CAST(CASE WHEN denx = 0 THEN NULL
      |      WHEN num >= 0 THEN num * 1000000000 // denx
      |      ELSE -((-num) * 1000000000 // denx) END AS BIGINT)
      |      AS slope_ppb
      |  FROM d),
      |p AS (SELECT trend_sign AS pooled_sign FROM s
      |      WHERE nationkey = -1)
      |SELECT s.nationkey, s.n, s.trend_sign, s.slope_ppb,
      |  p.pooled_sign,
      |  s.nationkey <> -1 AND s.trend_sign <> p.pooled_sign AS flips
      |FROM s CROSS JOIN p ORDER BY s.nationkey""".stripMargin

  // -------------------------------------- cls_cochran_armitage
  /** COCHRAN–ARMITAGE TREND TEST — does the proportion of FULFILLED
    * orders rise or fall MONOTONICALLY with order priority? The
    * ordered-categories twin of [[clsContingency]]'s chi-square:
    * chi-square asks "any association at all" and spends power on
    * non-monotone patterns; CA scores the levels (s = priority digit
    * 1..5) and tests the linear trend specifically — the right gauge
    * when the hypothesis IS ordered (drift across severity tiers,
    * quality deciles, cohort ages). One fact hash-agg to the 5-row
    * (score, n, x) frame, then closed-form moments on broadcast
    * totals: T′ = N·Σxs − R·Σns (sign = trend direction) and
    * z² = T′²·N / (R(N−R)(N·Σs²n − (Σns)²)), reported ×1000
    * floor-divided. T′² lifts to DECIMAL(38) — exact to ~1e8 orders,
    * past which the [[clsKruskalWallis]] per-mille quantization trick
    * applies. Output: per-level profile + the pooled statistic. */
  def clsCochranArmitage(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long")
          .as("score"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("f"))
      .groupBy("score")
      .agg(count(lit(1)).as("n"), sum(col("f")).as("x"))
      .cut // 2 consumers: totals + per-level output
    val tot = g.agg(
      sum(col("n")).as("nn"), sum(col("x")).as("rr"),
      sum(col("n") * col("score")).as("sn"),
      sum(col("x") * col("score")).as("sx"),
      sum(col("n") * col("score") * col("score")).as("sn2"))
    g.crossJoin(broadcast(tot))
      .select(col("score"), col("n"), col("x"),
        expr("x * 1000 div n").as("p_pm"),
        expr("CAST(SIGN(nn * sx - rr * sn) AS BIGINT)").as("trend_sign"),
        expr("CAST(CAST(nn * sx - rr * sn AS DECIMAL(38,0))" +
          " * (nn * sx - rr * sn) * nn * 1000" +
          " div (CAST(rr AS DECIMAL(38,0)) * (nn - rr)" +
          " * (nn * sn2 - CAST(sn AS DECIMAL(38,0)) * sn))" +
          " AS BIGINT)").as("z2_milli"))
      .reportSort("score")
  }

  val clsCochranArmitageSql: String =
    """WITH g AS (
      |  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS score,
      |    COUNT(*) AS n,
      |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS x
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT SUM(n) AS nn, SUM(x) AS rr, SUM(n * score) AS sn,
      |    SUM(x * score) AS sx, SUM(n * score * score) AS sn2
      |  FROM g)
      |SELECT score, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
      |  CAST(x * 1000 // n AS BIGINT) AS p_pm,
      |  CAST(SIGN(nn * sx - rr * sn) AS BIGINT) AS trend_sign,
      |  CAST(CAST(nn * sx - rr * sn AS HUGEINT)
      |    * (nn * sx - rr * sn) * nn * 1000
      |    // (CAST(rr AS HUGEINT) * (nn - rr)
      |    * (nn * sn2 - CAST(sn AS HUGEINT) * sn)) AS BIGINT)
      |    AS z2_milli
      |FROM g CROSS JOIN t ORDER BY score""".stripMargin

  // -------------------------------------------- cls_mann_whitney
  /** MANN–WHITNEY U, all group PAIRS — the post-hoc companion to
    * [[clsKruskalWallis]]: KW says "SOME event type differs"; this
    * says WHICH pairs, with the rank-biserial effect size (the
    * probability-of-superiority rescaled to [−1, 1]) that survives
    * heavy tails where a mean difference drowns. EXACT tie-averaged
    * mid-ranks per pair, computed entirely on the (group, value)
    * HISTOGRAM: one corpus hash-agg, then the per-(group, x) counts
    * fan out to the |types−1| pairs containing their group (a
    * broadcast nested-loop on the 10-row pair dim — counts travel,
    * never rows), pooled DOUBLED mid-ranks 2R = 2·hi − c + 1 come
    * from one [[graft.ops.OrderStats
    * .weightedCumulativeHistogramSharded]] keyed by pair (two-level
    * cum — no unpartitioned window), each side's rank sum is the
    * count-weighted Σc·2R, and
    * 2U₁ = Σ2R₁ − n₁(n₁+1) stays integral under ties. Rank sums and
    * the n₁n₂ products lift to DECIMAL(38) (Σ2R ~ 2N·n₁ overflows
    * int64 past ~2e9 pooled rows). rb_pm = 1000 − 2000·U₁/(n₁n₂)
    * floor-divided on the non-negative numerator (no signed-div
    * skew). Output: one row per unordered type pair. */
  def clsMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val v = Tables.events(spark, dir)
      .select(col("event_type").as("grp"),
        floor(col("value") * 100).cast("long").as("x"))
    // ONE corpus-scale hash-agg: the (group, value) histogram. Every
    // downstream frame is (|types| × |distinct x|)-bounded, so the
    // pair fan-out ships COUNTS, never rows (§2.3 aggregate before
    // you shuffle): the previous form fanned each RAW row to its
    // |types|−1 pairs, checkpointed that (|types|−1)×corpus frame,
    // and joined the ranks back onto it.
    val hg = v.groupBy("grp", "x").agg(count(lit(1)).as("cnt"))
      .cut // 2 consumers: type dim + pair fan-out
    val types = hg.select(col("grp")).distinct()
    val pairs = types.select(col("grp").as("g_lo"))
      .join(types.select(col("grp").as("g_hi")),
        col("g_lo") < col("g_hi"))
    // pooled per-(pair, x) histogram carrying each side's count: the
    // doubled mid-rank weights c_lo/c_hi directly, so the rank
    // join-back that re-shuffled the fanned corpus disappears
    val ph = hg.join(broadcast(pairs),
        col("grp") === col("g_lo") || col("grp") === col("g_hi"))
      .groupBy("g_lo", "g_hi", "x")
      .agg(sum(col("cnt")).as("c"),
        sum(when(col("grp") === col("g_lo"), col("cnt")).otherwise(0L))
          .as("c_lo"),
        sum(when(col("grp") === col("g_hi"), col("cnt")).otherwise(0L))
          .as("c_hi"))
      .cut // consumers: sharded cum-hist (3 subplans) + rank join
    val ranks = OrderStats.weightedCumulativeHistogramSharded(
        ph.select(col("g_lo"), col("g_hi"), col("x").as("v"), col("c")),
        Seq("g_lo", "g_hi"), "v")
      .select(col("g_lo"), col("g_hi"), col("v").as("x"),
        (lit(2L) * col("hi") - col("c") + 1L).as("r2"))
    ph.join(ranks, Seq("g_lo", "g_hi", "x"))
      .groupBy("g_lo", "g_hi")
      .agg(
        sum(col("c_lo")).as("n1"),
        sum(col("c_hi")).as("n2"),
        sum(expr("CAST(c_lo AS DECIMAL(38,0)) * r2")).as("_r2lo"),
        sum(expr("CAST(c_hi AS DECIMAL(38,0)) * r2")).as("_r2hi"))
      .select(col("g_lo"), col("g_hi"), col("n1"), col("n2"),
        expr("CAST(_r2lo - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)" +
          " AS BIGINT)").as("u2_lo"),
        expr("CAST(1000 - (_r2lo - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1))" +
          " * 1000 div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)")
          .as("rb_pm"),
        expr("CAST(_r2lo div n1 AS BIGINT)").as("mr2_lo"),
        expr("CAST(_r2hi div n2 AS BIGINT)").as("mr2_hi"))
      .reportSort("g_lo", "g_hi")
  }

  val clsMannWhitneySql: String =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS x
      |  FROM events),
      |t AS (SELECT DISTINCT grp FROM v),
      |p AS (
      |  SELECT a.grp AS g_lo, b.grp AS g_hi
      |  FROM t a JOIN t b ON a.grp < b.grp),
      |ex AS (
      |  SELECT p.g_lo, p.g_hi, v.grp, v.x
      |  FROM v JOIN p ON v.grp = p.g_lo OR v.grp = p.g_hi),
      |h AS (
      |  SELECT g_lo, g_hi, x, COUNT(*) AS c FROM ex GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT g_lo, g_hi, x,
      |    2 * SUM(c) OVER (PARTITION BY g_lo, g_hi ORDER BY x)
      |      - c + 1 AS r2
      |  FROM h),
      |g AS (
      |  SELECT e.g_lo, e.g_hi,
      |    SUM(CASE WHEN e.grp = e.g_lo THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN e.grp = e.g_hi THEN 1 ELSE 0 END) AS n2,
      |    SUM(CASE WHEN e.grp = e.g_lo THEN CAST(r.r2 AS HUGEINT)
      |      ELSE 0 END) AS r2lo,
      |    SUM(CASE WHEN e.grp = e.g_hi THEN CAST(r.r2 AS HUGEINT)
      |      ELSE 0 END) AS r2hi
      |  FROM ex e JOIN r ON r.g_lo = e.g_lo AND r.g_hi = e.g_hi
      |    AND r.x = e.x
      |  GROUP BY 1, 2)
      |SELECT g_lo, g_hi, CAST(n1 AS BIGINT) AS n1,
      |  CAST(n2 AS BIGINT) AS n2,
      |  CAST(r2lo - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u2_lo,
      |  CAST(1000 - (r2lo - CAST(n1 AS HUGEINT) * (n1 + 1)) * 1000
      |    // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS rb_pm,
      |  CAST(r2lo // n1 AS BIGINT) AS mr2_lo,
      |  CAST(r2hi // n2 AS BIGINT) AS mr2_hi
      |FROM g ORDER BY g_lo, g_hi""".stripMargin

  // ----------------------------------------------- cls_runs_test
  /** WALD–WOLFOWITZ RUNS TEST on the day-over-day direction of each
    * event type's daily volume — the randomness gauge a monitoring
    * pipeline wants before trusting a trend detector: too FEW runs
    * means the series is trending/autocorrelated (successive moves
    * agree), too MANY means oscillation (e.g. a batch job alternating
    * load). Pipeline: one corpus hash-agg to the (type, day) frame
    * (calendar-bounded — |days| is fixed by the horizon, NOT by SF,
    * so the per-type lag windows here are constant-size, unlike the
    * q62/q63 dimension-sort trap), signs of strictly-up/strictly-down
    * moves (ties dropped, the textbook treatment), runs counted as
    * sign-change points + 1. Closed-form moments stay rational:
    * E[R] = 1 + 2n₁n₂/N and z² = (RN − N − 2n₁n₂)²(N−1) /
    * (2n₁n₂(2n₁n₂ − N)) — reported ×1000 floor-divided, exact in
    * int64 for any calendar (N ≤ 3.7e4 even at a century). NULL z²
    * when a direction is absent (V = 0). */
  def clsRunsTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(spark, dir)
      .select(col("event_type").as("grp"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
      .groupBy("grp", "day").agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy("grp").orderBy("day")
    val sgn = d
      .withColumn("_p", lag(col("n"), 1).over(byDay))
      .filter(col("_p").isNotNull && col("n") =!= col("_p"))
      .withColumn("sgn",
        when(col("n") > col("_p"), 1L).otherwise(-1L))
    val runs = sgn
      .withColumn("_ps", lag(col("sgn"), 1).over(byDay))
      .groupBy("grp")
      .agg(
        sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("_ps").isNull || col("sgn") =!= col("_ps"), 1L)
          .otherwise(0L)).as("runs"))
    runs
      .withColumn("nn", col("n1") + col("n2"))
      .select(col("grp"), col("n1"), col("n2"), col("runs"),
        expr("1000 + 2000 * n1 * n2 div nn").as("e_runs_milli"),
        expr("CASE WHEN n1 = 0 OR n2 = 0 OR 2 * n1 * n2 = nn THEN NULL" +
          " ELSE (runs * nn - nn - 2 * n1 * n2)" +
          " * (runs * nn - nn - 2 * n1 * n2) * (nn - 1) * 1000" +
          " div (2 * n1 * n2 * (2 * n1 * n2 - nn)) END").as("z2_milli"))
      .reportSort("grp")
  }

  val clsRunsTestSql: String =
    """WITH d AS (
      |  SELECT event_type AS grp, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT grp, day, n,
      |    LAG(n) OVER (PARTITION BY grp ORDER BY day) AS p
      |  FROM d),
      |sg AS (
      |  SELECT grp, day,
      |    CASE WHEN n > p THEN 1 ELSE -1 END AS sgn
      |  FROM s WHERE p IS NOT NULL AND n <> p),
      |r AS (
      |  SELECT grp, sgn,
      |    LAG(sgn) OVER (PARTITION BY grp ORDER BY day) AS ps
      |  FROM sg),
      |g AS (
      |  SELECT grp,
      |    SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS n2,
      |    SUM(CASE WHEN ps IS NULL OR sgn <> ps THEN 1 ELSE 0 END)
      |      AS runs
      |  FROM r GROUP BY 1)
      |SELECT grp, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(runs AS BIGINT) AS runs,
      |  CAST(1000 + 2000 * n1 * n2 // (n1 + n2) AS BIGINT)
      |    AS e_runs_milli,
      |  CAST(CASE WHEN n1 = 0 OR n2 = 0 OR 2 * n1 * n2 = n1 + n2
      |    THEN NULL
      |    ELSE (runs * (n1 + n2) - (n1 + n2) - 2 * n1 * n2)
      |      * (runs * (n1 + n2) - (n1 + n2) - 2 * n1 * n2)
      |      * (n1 + n2 - 1) * 1000
      |      // (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) END AS BIGINT)
      |    AS z2_milli
      |FROM g ORDER BY grp""".stripMargin

  // ------------------------------------------- cls_kruskal_wallis
  /** KRUSKAL–WALLIS rank test (does the event-value DISTRIBUTION
    * differ across event types?) — the rank twin of [[clsAnova]]:
    * where ANOVA compares means and dies on heavy tails, KW compares
    * the whole distribution through mid-ranks, so one fat outlier
    * moves the statistic by one rank, not by its magnitude. Computed
    * via the ANOVA-on-ranks identity H = (N−1)·SSB/SST, which is
    * EXACT for tie-averaged mid-ranks (tie correction included) —
    * so the whole operator is [[clsAnova]]'s mergeable (n, Σu, Σu²)
    * fold applied to a rank transform. The transform is the
    * [[clsSpearman]] scale shape: value histogram through
    * [[graft.ops.OrderStats.cumulativeHistogramSharded]] (two-level
    * cum — no unpartitioned window), doubled mid-ranks
    * 2R = 2·hi − c + 1 stay integral under ties, and ranks
    * PERCENTILE-QUANTIZE to per-mille u = 2R·500 div 2N before the
    * moment sums (Σu² ≤ 10⁶·N — int64 to ~9e12 rows). H's
    * (N−1)·SSB product lifts to DECIMAL(38) — at 1e9 rows the int64
    * form overflows. Output: per-group rank profile + the pooled
    * statistic, |event types| rows. */
  def clsKruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val v = Tables.events(spark, dir)
      .select(col("event_type").as("grp"),
        floor(col("value") * 100).cast("long").as("x"))
      .cut // 2 consumers: pooled histogram + join-back
    val nt = v.agg(count(lit(1)).as("_nt"))
    val vals = v.select(col("x").as("v"))
      // non-foldable all-rows group keeps every window partitioned
      .withColumn("_g", pmod(col("v"), lit(1L)))
    val ranks = OrderStats.cumulativeHistogramSharded(vals, Seq("_g"), "v")
      .select(col("v").as("x"),
        (lit(2L) * col("hi") - col("c") + 1L).as("r2"))
    val g = v.join(ranks, Seq("x"))
      .crossJoin(broadcast(nt))
      .select(col("grp"), expr("r2 * 500 div _nt").as("u"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("u")).as("s1"),
        sum(col("u") * col("u")).as("s2"))
      .cut // |groups| frame, 2 consumers
    val pooled = g.agg(
      sum(col("n")).as("nn"), sum(col("s1")).as("t1"),
      sum(col("s2")).as("t2"), sum(expr("s1 * s1 div n")).as("bsum"))
      .select(col("nn"),
        // per-group floor truncation can push a near-zero SSB a few
        // units negative, where div/`//` disagree — clamp (cls_anova)
        greatest(col("bsum") - expr("t1 * t1 div nn"), lit(0L))
          .as("ssb"),
        (col("t2") - col("bsum")).as("ssw"))
    g.crossJoin(broadcast(pooled))
      .select(col("grp"), col("n"),
        expr("s1 div n").as("mean_rank_pm"),
        col("ssb"), col("ssw"),
        expr("CAST(CAST(nn - 1 AS DECIMAL(38,0)) * ssb * 1000" +
          " div (CAST(ssb AS DECIMAL(38,0)) + ssw) AS BIGINT)")
          .as("h_milli"),
        expr("ssb * 1000 div (ssb + ssw)").as("eta2_pm"))
      .reportSort("grp")
  }

  val clsKruskalWallisSql: String =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS x
      |  FROM events),
      |nt AS (SELECT COUNT(*) AS nt FROM v),
      |h AS (SELECT x, COUNT(*) AS c FROM v GROUP BY x),
      |r AS (
      |  SELECT x, 2 * SUM(c) OVER (ORDER BY x) - c + 1 AS r2 FROM h),
      |u AS (
      |  SELECT grp, r2 * 500 // nt.nt AS u
      |  FROM v JOIN r USING (x) CROSS JOIN nt),
      |g AS (
      |  SELECT grp, COUNT(*) AS n, SUM(u) AS s1, SUM(u*u) AS s2
      |  FROM u GROUP BY grp),
      |p AS (
      |  SELECT SUM(n) AS nn, SUM(s1) AS t1, SUM(s2) AS t2,
      |    SUM(s1 * s1 // n) AS bsum
      |  FROM g),
      |d AS (
      |  SELECT nn, GREATEST(bsum - t1 * t1 // nn, 0) AS ssb,
      |    t2 - bsum AS ssw
      |  FROM p)
      |SELECT grp, CAST(n AS BIGINT) AS n,
      |  CAST(s1 // n AS BIGINT) AS mean_rank_pm,
      |  CAST(ssb AS BIGINT) AS ssb, CAST(ssw AS BIGINT) AS ssw,
      |  CAST(CAST(nn - 1 AS HUGEINT) * ssb * 1000
      |    // (CAST(ssb AS HUGEINT) + ssw) AS BIGINT) AS h_milli,
      |  CAST(ssb * 1000 // (ssb + ssw) AS BIGINT) AS eta2_pm
      |FROM g CROSS JOIN d ORDER BY grp""".stripMargin

  // -------------------------------------------------- cls_levene
  /** LEVENE/BROWN–FORSYTHE variance-homogeneity test — the
    * PRE-CONDITION check for [[clsAnova]] (pooled-F assumes equal
    * group variances; when spreads differ the F verdict is
    * unreliable): ANOVA applied to ABSOLUTE DEVIATIONS from each
    * group's MEDIAN (the Brown–Forsythe robust form — a group median
    * per [[graft.ops.OrderStats.radixLowerMedian]]'s domain-capped
    * two-pass selection, no global sort), so a significant F here
    * means the SPREADS differ. Deviations are exact integers (cents
    * minus median cents); the moment fold is [[clsAnova]]'s mergeable
    * (n, Σd, Σd²) state. Σd² of cent-grid deviations caps at
    * ~dev²·n ≈ 2.4e9·n — int64 to ~3.8e9 rows, then the same
    * DECIMAL lift as its siblings. One corpus scan for the medians
    * (histogram passes), one for the deviation fold. */
  def clsLevene(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.OrderStats
    val v = Tables.events(spark, dir)
      .select(col("event_type").as("grp"),
        floor(col("value") * 100).cast("long").as("x"))
      .cut // 2 consumers: median pass + deviation fold
    val med = OrderStats.radixLowerMedian(v, Seq("grp"), "x")
      .select(col("grp"), col("median").as("m"))
    val g = v.join(broadcast(med), Seq("grp"))
      .select(col("grp"), abs(col("x") - col("m")).as("d"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("d")).as("s1"),
        sum(col("d") * col("d")).as("s2"))
      .cut // |groups| frame, 2 consumers
    val pooled = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s1")).as("t1"), sum(col("s2")).as("t2"),
      sum(expr("s1 * s1 div n")).as("bsum"))
      .select(col("k"), col("nn"),
        greatest(col("bsum") - expr("t1 * t1 div nn"), lit(0L))
          .as("ssb"),
        (col("t2") - col("bsum")).as("ssw"))
    g.join(broadcast(med), Seq("grp"))
      .crossJoin(broadcast(pooled))
      .select(col("grp"), col("n"), col("m").as("median_cents"),
        expr("s1 div n").as("mean_abs_dev_cents"),
        expr("CAST(CAST(ssb AS DECIMAL(38,0)) * (nn - k) * 1000" +
          " div (CAST(ssw AS DECIMAL(38,0)) * (k - 1)) AS BIGINT)")
          .as("f_milli"),
        expr("ssb * 1000 div (ssb + ssw)").as("eta2_pm"))
      .reportSort("grp")
  }

  val clsLeveneSql: String =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS x
      |  FROM events),
      |h AS (SELECT grp, x, COUNT(*) AS c FROM v GROUP BY grp, x),
      |ch AS (
      |  SELECT grp, x, c,
      |    CAST(SUM(c) OVER (PARTITION BY grp ORDER BY x) AS BIGINT)
      |      AS hi
      |  FROM h),
      |n AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY grp),
      |med AS (
      |  SELECT ch.grp,
      |    MIN(CASE WHEN hi - c + 1 <= (n.n + 1) // 2
      |          AND (n.n + 1) // 2 <= hi THEN x END) AS m
      |  FROM ch JOIN n ON ch.grp = n.grp GROUP BY ch.grp),
      |g AS (
      |  SELECT v.grp, COUNT(*) AS n, SUM(ABS(x - m)) AS s1,
      |    SUM(ABS(x - m) * ABS(x - m)) AS s2
      |  FROM v JOIN med ON v.grp = med.grp GROUP BY v.grp),
      |p AS (
      |  SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s1) AS t1,
      |    SUM(s2) AS t2, SUM(s1 * s1 // n) AS bsum
      |  FROM g),
      |d AS (
      |  SELECT k, nn, GREATEST(bsum - t1 * t1 // nn, 0) AS ssb,
      |    t2 - bsum AS ssw
      |  FROM p)
      |SELECT g.grp, CAST(g.n AS BIGINT) AS n,
      |  CAST(med.m AS BIGINT) AS median_cents,
      |  CAST(s1 // g.n AS BIGINT) AS mean_abs_dev_cents,
      |  CAST(CAST(ssb AS HUGEINT) * (nn - k) * 1000
      |    // (CAST(ssw AS HUGEINT) * (k - 1)) AS BIGINT) AS f_milli,
      |  CAST(ssb * 1000 // (ssb + ssw) AS BIGINT) AS eta2_pm
      |FROM g JOIN med ON g.grp = med.grp CROSS JOIN d
      |ORDER BY g.grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cls_simpsons" -> (clsSimpsons _),
    "cls_cochran_armitage" -> (clsCochranArmitage _),
    "cls_mann_whitney" -> (clsMannWhitney _),
    "cls_runs_test" -> (clsRunsTest _),
    "cls_kruskal_wallis" -> (clsKruskalWallis _),
    "cls_levene" -> (clsLevene _),
    "cls_null_pattern" -> (clsNullPattern _),
    "cls_gamma_assoc" -> (clsGammaAssoc _),
    "cls_kendall_tau" -> (clsKendallTau _),
    "cls_anova" -> (clsAnova _),
    "cls_jsd_drift" -> (clsJsdDrift _),
    "cls_hhi_concentration" -> (clsHhiConcentration _),
    "cls_mutual_info" -> (clsMutualInfo _),
    "cls_theil_u" -> (clsTheilU _),
    "cls_chi2_gof" -> (clsChi2Gof _),
    "cls_approx_fd" -> (clsApproxFd _),
    "cls_decimal_profile" -> (clsDecimalProfile _),
    "cls_key_discovery" -> (clsKeyDiscovery _),
    "cls_cramers_v" -> (clsCramersV _),
    "cls_null_profile" -> (clsNullProfile _),
    "cls_histogram_profile" -> (clsHistogramProfile _),
    "cls_dow_seasonality" -> (clsDowSeasonality _),
    "cls_contingency" -> (clsContingency _),
    "cls_ks_drift" -> (clsKsDrift _),
    "cls_datatype_infer" -> (clsDatatypeInfer _),
    "cls_corr" -> (clsCorr _),
    "cls_spearman" -> (clsSpearman _),
    "cls_golden_record" -> (clsGoldenRecord _),
    "cls_autocorr" -> (clsAutocorr _),
    "cls_skewness" -> (clsSkewness _),
    "cls_entity_match" -> (clsEntityMatch _),
    "cls_psi_drift" -> (clsPsiDrift _),
    "cls_inclusion_deps" -> (clsInclusionDeps _),
    "cls_outliers" -> (clsOutliers _),
    "cls_functional_dep" -> (clsFunctionalDep _),
    "cls_quasi_id" -> (clsQuasiId _),
    "cls_gini" -> (clsGini _),
    "cls_orphans" -> (clsOrphans _),
    "cls_benford" -> (clsBenford _),
    "cls_distinct_ratio" -> (clsDistinctRatio _),
    "cls_text_pii" -> (clsTextPii _),
    "cls_luhn_check" -> (clsLuhnCheck _),
    "cls_name_match" -> (clsNameMatch _),
    "cls_pattern_match" -> (clsPatternMatch _),
    "cls_set_match" -> (clsSetMatch _),
    "cls_schema_scan" -> (clsSchemaScan _))

  val oracles: Map[String, String] = Map(
    "cls_kruskal_wallis" -> clsKruskalWallisSql,
    "cls_levene" -> clsLeveneSql,
    "cls_null_pattern" -> clsNullPatternSql,
    "cls_gamma_assoc" -> clsGammaAssocSql,
    "cls_simpsons" -> clsSimpsonsSql,
    "cls_cochran_armitage" -> clsCochranArmitageSql,
    "cls_mann_whitney" -> clsMannWhitneySql,
    "cls_runs_test" -> clsRunsTestSql,
    "cls_kendall_tau" -> clsKendallTauSql,
    "cls_anova" -> clsAnovaSql,
    "cls_approx_fd" -> clsApproxFdSql,
    "cls_mutual_info" -> clsMutualInfoSql,
    "cls_theil_u" -> clsTheilUSql,
    "cls_chi2_gof" -> clsChi2GofSql,
    "cls_jsd_drift" -> clsJsdDriftSql,
    "cls_hhi_concentration" -> clsHhiConcentrationSql,
    "cls_decimal_profile" -> clsDecimalProfileSql,
    "cls_null_profile" -> clsNullProfileSql,
    "cls_histogram_profile" -> clsHistogramProfileSql,
    "cls_dow_seasonality" -> clsDowSeasonalitySql,
    "cls_key_discovery" -> clsKeyDiscoverySql,
    "cls_cramers_v" -> clsCramersVSql,
    "cls_contingency" -> clsContingencySql,
    "cls_ks_drift" -> clsKsDriftSql,
    "cls_datatype_infer" -> clsDatatypeInferSql,
    "cls_corr" -> clsCorrSql,
    "cls_spearman" -> clsSpearmanSql,
    "cls_golden_record" -> clsGoldenRecordSql,
    "cls_autocorr" -> clsAutocorrSql,
    "cls_skewness" -> clsSkewnessSql,
    "cls_entity_match" -> clsEntityMatchSql,
    "cls_psi_drift" -> clsPsiDriftSql,
    "cls_inclusion_deps" -> clsInclusionDepsSql,
    "cls_outliers" -> clsOutliersSql,
    "cls_functional_dep" -> clsFunctionalDepSql,
    "cls_quasi_id" -> clsQuasiIdSql,
    "cls_gini" -> clsGiniSql,
    "cls_orphans" -> clsOrphansSql,
    "cls_benford" -> clsBenfordSql,
    "cls_distinct_ratio" -> clsDistinctRatioSql,
    "cls_text_pii" -> clsTextPiiSql,
    "cls_luhn_check" -> clsLuhnCheckSql,
    "cls_name_match" -> clsNameMatchSql,
    "cls_pattern_match" -> clsPatternMatchSql,
    "cls_set_match" -> clsSetMatchSql,
    "cls_schema_scan" -> clsSchemaScanSql)
}
