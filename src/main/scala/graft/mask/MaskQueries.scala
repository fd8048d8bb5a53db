package graft.mask

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.classify.Libraries
import graft.Syntax._

/** §2.4 masking operators as driver-verified queries. Every mask is a
  * deterministic codegen'd expression (see [[MaskFunctions]]); the
  * DuckDB oracle recomputes the identical math, proving the masks are
  * engine-independent (replica-consistent, like the reference's
  * rule-per-data-class model).
  */
object MaskQueries extends QueryModule {

  /** Portable md5-derived hash, SQL side (mirrors
    * MaskFunctions.portableHash). */
  private def hashSql(e: String): String =
    s"(('0x'||substr(md5($e),1,8))::BIGINT)"

  def maskHex(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        MaskFunctions.encodeHex(col("c_name")).as("enc"),
        MaskFunctions.decodeHex(MaskFunctions.encodeHex(col("c_name"))).as("dec"))
      .orderBy("c_custkey")

  val maskHexSql: String =
    """SELECT c_custkey, hex(c_name) AS enc,
      |  decode(unhex(hex(c_name))) AS dec
      |FROM customer ORDER BY c_custkey""".stripMargin

  def maskCase(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        MaskFunctions.toUpper(col("p_name")).as("up"),
        MaskFunctions.toLower(col("p_brand")).as("lo"),
        MaskFunctions.proper(col("p_name")).as("pr"))
      .orderBy("p_partkey")

  val maskCaseSql: String =
    """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
      |  upper(substr(p_name,1,1)) || lower(substr(p_name,2)) AS pr
      |FROM part ORDER BY p_partkey""".stripMargin

  def maskHash(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        MaskFunctions.hashMd5(col("c_name")).as("m"),
        MaskFunctions.hashSha256(col("c_name"), "pepper").as("s"))
      .orderBy("c_custkey")

  val maskHashSql: String =
    """SELECT c_custkey, md5(c_name) AS m,
      |  sha256(c_name || 'pepper') AS s
      |FROM customer ORDER BY c_custkey""".stripMargin

  def maskRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        MaskFunctions.redact(col("c_name")).as("full_mask"),
        MaskFunctions.redactKeepLast(col("c_name"), 4).as("keep4"))
      .orderBy("c_custkey")

  val maskRedactSql: String =
    """SELECT c_custkey,
      |  repeat('*', length(c_name)) AS full_mask,
      |  repeat('*', greatest(length(c_name)-4, 0)) ||
      |    substr(c_name, length(c_name)-3, 4) AS keep4
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Set entries come from the nation dim ordered by key — the stand-in
    * for a pseudonym set file; at scale this is a collected-once
    * broadcast, identical semantics. */
  private def nationNames(spark: SparkSession, dir: String): Seq[String] =
    Tables.nation(spark, dir).orderBy("n_nationkey")
      .select("n_name").collect().map(_.getString(0)).toSeq

  def maskPseudonym(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        MaskFunctions.pseudonymFromSet(col("c_name"),
          nationNames(spark, dir)).as("pseudonym"))
      .orderBy("c_custkey")

  val maskPseudonymSql: String =
    s"""SELECT c_custkey, n_name AS pseudonym
       |FROM customer JOIN nation
       |  ON n_nationkey = CAST(${hashSql("c_name")} % 25 AS INTEGER)
       |ORDER BY c_custkey""".stripMargin

  def maskBlur(spark: SparkSession, dir: String): DataFrame = {
    val key = concat(col("l_orderkey").cast("string"), lit("#"),
      col("l_linenumber").cast("string"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      // width-pin the blur: 600k portable-md5 hashes otherwise run in
      // the scan's single task at bench SF (natural splits provide the
      // width at scale)
      .repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        MaskFunctions.blurNumber(col("l_quantity"), key, 5).as("blurred"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val maskBlurSql: String =
    s"""SELECT l_orderkey, l_linenumber, l_quantity,
       |  l_quantity + ((${hashSql("CAST(l_orderkey AS VARCHAR)||'#'||CAST(l_linenumber AS VARCHAR)")} % 11) - 5) AS blurred
       |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  def maskDateShift(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        MaskFunctions.dateShift(col("o_orderdate"),
          col("o_orderkey").cast("string"), 30).as("shifted"))
      .orderBy("o_orderkey")

  val maskDateShiftSql: String =
    s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
       |  CAST(o_orderdate AS DATE) +
       |    CAST((${hashSql("CAST(o_orderkey AS VARCHAR)")} % 61) - 30 AS INTEGER) AS shifted
       |FROM orders ORDER BY o_orderkey""".stripMargin

  def maskFpe(spark: SparkSession, dir: String): DataFrame = {
    val digits = lpad((col("c_custkey") * 7919 % 10000000).cast("string"), 7, "0")
    val phone = concat(digits.substr(1, 3), lit("-"), digits.substr(4, 4))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), phone.as("phone"),
        MaskFunctions.fpeDigits(phone).as("masked"))
      .orderBy("c_custkey")
  }

  val maskFpeSql: String =
    """WITH src AS (
      |  SELECT c_custkey,
      |    substr(lpad(CAST(c_custkey*7919 % 10000000 AS VARCHAR),7,'0'),1,3) || '-' ||
      |    substr(lpad(CAST(c_custkey*7919 % 10000000 AS VARCHAR),7,'0'),4,4) AS phone
      |  FROM customer)
      |SELECT c_custkey, phone,
      |  translate(phone, '0123456789', '3456789012') AS masked
      |FROM src ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------- mask_fpe_alpha
  /** KEYED format-preserving letter substitution: the permutation of
    * a–z is derived from the md5 of a salt by Fisher–Yates (md5's 128
    * bits cover log₂(26!) ≈ 88 — a full-entropy draw), computed once
    * on the driver, applied as a codegen `translate` over both cases.
    * Different salt ⇒ different permutation ⇒ re-keyable masking, while
    * length, case pattern, and non-letters survive exactly — the
    * FieldShield-style alpha FPE beside [[MaskFunctions.fpeDigits]]'
    * fixed digit map. The oracle rebuilds nothing: the derived
    * permutation is embedded verbatim in its `translate`. */
  private[graft] def alphaPerm(salt: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var seed = BigInt(1, md.digest(salt.getBytes("UTF-8")))
    val arr = ('a' to 'z').toArray
    for (i <- arr.length - 1 to 1 by -1) {
      val j = (seed % (i + 1)).toInt
      seed /= (i + 1)
      val t = arr(i); arr(i) = arr(j); arr(j) = t
    }
    new String(arr)
  }

  private val alphaFrom = "abcdefghijklmnopqrstuvwxyz"
  private val alphaTo = alphaPerm("graft")

  def maskFpeAlpha(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"),
        translate(col("c_name"), alphaFrom + alphaFrom.toUpperCase,
          alphaTo + alphaTo.toUpperCase).as("masked"))
      .orderBy("c_custkey")

  val maskFpeAlphaSql: String =
    s"""SELECT c_custkey, c_name,
       |  translate(c_name, '$alphaFrom${alphaFrom.toUpperCase}',
       |    '$alphaTo${alphaTo.toUpperCase}') AS masked
       |FROM customer ORDER BY c_custkey""".stripMargin

  def maskEmail(spark: SparkSession, dir: String): DataFrame = {
    val email = concat(lower(regexp_replace(col("c_name"), "#", ".")),
      lit("@example.com"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), email.as("email"),
        MaskFunctions.maskEmail(email).as("masked"))
      .orderBy("c_custkey")
  }

  val maskEmailSql: String =
    """WITH src AS (
      |  SELECT c_custkey,
      |    lower(replace(c_name, '#', '.')) || '@example.com' AS email
      |  FROM customer)
      |SELECT c_custkey, email,
      |  substr(email,1,1) || '***' || regexp_extract(email, '(@.*)$', 1) AS masked
      |FROM src ORDER BY c_custkey""".stripMargin

  def maskTokenize(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        MaskFunctions.tokenize(col("c_name"), "pepper").as("token"),
        MaskFunctions.maskCenter(col("c_name"), 2).as("center"))
      .orderBy("c_custkey")

  val maskTokenizeSql: String =
    """SELECT c_custkey,
      |  'TOK_' || upper(substr(sha256(c_name || 'pepper'), 1, 16)) AS token,
      |  CASE WHEN length(c_name) <= 4 THEN c_name
      |       ELSE substr(c_name, 1, 2) ||
      |            repeat('*', length(c_name) - 4) ||
      |            substr(c_name, length(c_name) - 1, 2) END AS center
      |FROM customer ORDER BY c_custkey""".stripMargin

  // --------------------------------------------- mask_token_collision
  /** TOKEN-WIDTH COLLISION audit — the question every tokenization
    * deployment answers before committing to a format-constrained
    * token width (a 4-hex token fits the legacy column but two
    * customers sharing one token silently merge on every downstream
    * join): for each candidate width the audit reports distinct
    * inputs, distinct tokens, inputs living in collided groups, and
    * the collision rate per-mille — the empirical birthday curve for
    * THIS corpus, not the asymptotic formula. One |inputs|×|widths|
    * melt (bounded by the dimension), one (width, token) hash-agg,
    * |widths|-row report. */
  def maskTokenCollision(spark: SparkSession, dir: String): DataFrame = {
    val widths = Seq(2, 3, 4, 6)
    val names = Tables.customer(spark, dir)
      .select(col("c_name")).distinct()
    val melted = names.select(
      explode(typedLit(widths)).as("w"), col("c_name"))
      .select(col("w"),
        expr("substr(sha2(concat(c_name, 'pepper'), 256), 1, w)")
          .as("token"))
    melted.groupBy("w", "token").agg(count(lit(1)).as("c"))
      .groupBy("w")
      .agg(sum(col("c")).as("n_inputs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("c") > 1, col("c")).otherwise(0L))
          .as("n_collided"))
      .select(col("w").cast("long").as("token_width"),
        col("n_inputs"), col("n_tokens"), col("n_collided"),
        expr("n_collided * 1000 div n_inputs").as("collision_pm"))
      .reportSort("token_width")
  }

  val maskTokenCollisionSql: String =
    """WITH names AS (SELECT DISTINCT c_name FROM customer),
      |m AS (
      |  SELECT w, substr(sha256(c_name || 'pepper'), 1, CAST(w AS INT))
      |    AS token
      |  FROM names, (SELECT UNNEST([2, 3, 4, 6]) AS w)),
      |g AS (SELECT w, token, COUNT(*) AS c FROM m GROUP BY 1, 2)
      |SELECT CAST(w AS BIGINT) AS token_width,
      |  CAST(SUM(c) AS BIGINT) AS n_inputs,
      |  COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
      |    AS n_collided,
      |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000 // SUM(c)
      |    AS BIGINT) AS collision_pm
      |FROM g GROUP BY w ORDER BY token_width""".stripMargin

  /** End-to-end reference flow: classify customer by column name with
    * the default library, apply each class's default rule. */
  def maskClassified(spark: SparkSession, dir: String): DataFrame = {
    val resolver: String => Seq[String] = {
      case "nation-names" => nationNames(spark, dir)
      case _ => Seq.empty
    }
    RuleEngine.maskTable(Tables.customer(spark, dir), Libraries.default, resolver)
      .orderBy("c_custkey")
  }

  val maskClassifiedSql: String =
    s"""SELECT c_custkey, n_name AS c_name, c_nationkey,
       |  c_acctbal + ((${hashSql("CAST(c_acctbal AS VARCHAR)")} % 11) - 5) AS c_acctbal,
       |  upper(c_mktsegment) AS c_mktsegment
       |FROM customer JOIN nation
       |  ON n_nationkey = CAST(${hashSql("c_name")} % 25 AS INTEGER)
       |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------- mask_luhn_fpe
  /** Luhn-PRESERVING format-preserving mask for card-style numbers:
    * every digit but the last is substituted with a deterministic
    * md5-keyed rotation, then the CHECK DIGIT is recomputed, so the
    * masked value still passes Luhn validation — masked data keeps
    * flowing through downstream validators (the FieldShield-style
    * semantic-preserving mask). Fully portable integer math; the
    * oracle rebuilds identical strings, and the query re-validates its
    * own output with the classification-side Luhn check. */
  def maskLuhnFpe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    // the rotation key is ONE md5 per row (hex digit i keys position
    // i): a per-digit hash would re-run the digest expression per
    // lambda element — and projection collapsing duplicates any
    // expression referenced from several consumers, so keep every
    // building block single-source (ds and the digest come in as
    // materialized columns)
    def maskedDigit(ds: Column, dg: Column)(i: Column): Column = {
      val d = ds.substr(i, lit(1)).cast("int")
      val k = conv(dg.substr(i, lit(1)), 16, 10).cast("int") % 10
      (d + k) % 10
    }
    def build(ds: Column, dg: Column): Column = {
      val n = length(ds)
      val prefix = transform(sequence(lit(1), n - 1),
        i => maskedDigit(ds, dg)(i))
      // Luhn sum of the prefix in its FINAL positions (check digit
      // sits at from-right position 0; digit i at n - i, doubled when
      // odd)
      val s = aggregate(sequence(lit(1), n - 1), lit(0), (acc, i) => {
        val dd = maskedDigit(ds, dg)(i)
        val p = n - i
        acc + when(p % 2 === 1,
          when(dd * 2 > 9, dd * 2 - 9).otherwise(dd * 2)).otherwise(dd)
      })
      val check = (lit(10) - s % 10) % 10
      concat(array_join(transform(prefix, d => d.cast("string")), ""),
        check.cast("string"))
    }
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        (col("c_custkey") * 7919 + 123456).cast("string").as("_ds"))
      .withColumn("_dg", md5(col("_ds")))
      .select(col("c_custkey"),
        build(col("_ds"), col("_dg")).as("ccn_masked"))
      .orderBy("c_custkey")
  }

  val maskLuhnFpeSql: String = {
    val md =
      "(CAST(substr(ds, i, 1) AS BIGINT) + " +
        "('0x'||substr(dg, i, 1))::BIGINT % 10) % 10"
    s"""WITH d AS (
       |  SELECT c_custkey,
       |    CAST(c_custkey * 7919 + 123456 AS VARCHAR) AS ds
       |  FROM customer),
       |d2 AS (SELECT c_custkey, ds, md5(ds) AS dg FROM d),
       |m AS (
       |  SELECT c_custkey, ds, len(ds) AS n,
       |    list_transform(range(1, len(ds)), i -> $md) AS pd
       |  FROM d2),
       |s AS (
       |  SELECT c_custkey, n, pd,
       |    list_sum(list_transform(range(1, n), i ->
       |      CASE WHEN (n - i) % 2 = 1 THEN
       |        CASE WHEN pd[i]*2 > 9 THEN pd[i]*2 - 9 ELSE pd[i]*2 END
       |      ELSE pd[i] END)) AS ssum
       |  FROM m)
       |SELECT c_custkey,
       |  array_to_string(list_transform(pd, x -> CAST(x AS VARCHAR)), '')
       |    || CAST((10 - ssum % 10) % 10 AS VARCHAR) AS ccn_masked
       |FROM s ORDER BY c_custkey""".stripMargin
  }

  // ------------------------------------------------------ mask_ip
  /** Subnet-preserving IPv4 masking: the network half (first two
    * octets) survives so masked data still aggregates by subnet and
    * joins against network dims; the host half is substituted with a
    * deterministic hash of the WHOLE address, so distinct hosts stay
    * distinct-ish and equal addresses mask equally (referential
    * stability, like the reference's SET-based pseudonyms). Synthetic
    * IPs derive from c_custkey so both engines mask identical input. */
  def maskIp(spark: SparkSession, dir: String): DataFrame = {
    val o2 = (col("c_custkey") * 7) % 256
    val o3 = (col("c_custkey") * 131) % 256
    val o4 = (col("c_custkey") * 17) % 256
    val ip = concat_ws(".", lit(10), o2.cast("string"), o3.cast("string"),
      o4.cast("string"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), ip.as("_ip"))
      .select(col("c_custkey"),
        concat_ws(".",
          substring_index(col("_ip"), ".", 2),
          (MaskFunctions.portableHash(col("_ip")) % 256).cast("string"),
          (floor(MaskFunctions.portableHash(col("_ip")) / 256) % 256)
            .cast("string"))
          .as("ip_masked"))
      .orderBy("c_custkey")
  }

  val maskIpSql: String = {
    val h = hashSql("ip")
    s"""WITH d AS (
       |  SELECT c_custkey,
       |    '10.' || CAST(c_custkey * 7 % 256 AS VARCHAR) || '.' ||
       |    CAST(c_custkey * 131 % 256 AS VARCHAR) || '.' ||
       |    CAST(c_custkey * 17 % 256 AS VARCHAR) AS ip
       |  FROM customer)
       |SELECT c_custkey,
       |  array_to_string((string_split(ip, '.'))[1:2], '.') || '.' ||
       |  CAST($h % 256 AS VARCHAR) || '.' ||
       |  CAST(($h // 256) % 256 AS VARCHAR) AS ip_masked
       |FROM d ORDER BY c_custkey""".stripMargin
  }

  // ------------------------------------------------------ mask_consistent
  /** Referential-integrity-preserving tokenization — the property that
    * makes a masked lake still QUERYABLE: the same key value gets the
    * same token in EVERY table it appears in, so joins on the masked
    * key return exactly the rows the unmasked join would (the
    * reference's deterministic per-value rules give the same guarantee
    * across targets). Here `c_custkey`/`o_custkey` are tokenized with
    * one shared deterministic function and the masked tables are
    * joined ON THE TOKENS; per-nation order counts prove the join
    * survives masking. MaskAndClassifySpec additionally pins
    * masked-join ≡ unmasked-join row-for-row. Scale: the token is a
    * codegen scalar (no lookup table to distribute) and the join is
    * the same shuffle/broadcast decision the unmasked plan had. */
  def custToken(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("tok-"),
      lpad(MaskFunctions.portableHash(c).cast("string"), 10, "0"))

  def maskConsistent(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(custToken(col("c_custkey")).as("cust_token"),
        col("c_nationkey"))
    val ords = Tables.orders(spark, dir)
      .select(custToken(col("o_custkey")).as("o_token"))
    cust.join(ords, col("cust_token") === col("o_token"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("cust_token")).as("n_customers"),
        min(col("cust_token")).as("first_token"))
      .reportSort("c_nationkey")
  }

  val maskConsistentSql: String = {
    def tok(e: String) =
      s"'tok-' || lpad(CAST(${hashSql(s"CAST($e AS VARCHAR)")} AS VARCHAR), 10, '0')"
    s"""WITH cust AS (
       |  SELECT ${tok("c_custkey")} AS cust_token, c_nationkey FROM customer),
       |ords AS (SELECT ${tok("o_custkey")} AS o_token FROM orders)
       |SELECT c_nationkey, COUNT(*) AS n_orders,
       |  COUNT(DISTINCT cust_token) AS n_customers,
       |  MIN(cust_token) AS first_token
       |FROM cust JOIN ords ON cust_token = o_token
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  }

  // ------------------------------------------------ mask_generalize
  /** Generalization (k-anonymity-style coarsening): numeric values to
    * fixed-width band labels, identifiers to prefixes — the masking
    * mode that keeps data ANALYZABLE while dropping precision (vs the
    * value-destroying masks above). Band edges come from a double
    * floor of value/width: exact at the only boundaries that matter
    * (multiples of the width are dyadic-exact in both engines). */
  def maskGeneralize(spark: SparkSession, dir: String): DataFrame = {
    val band = floor(col("c_acctbal").cast("double") / 500.0).cast("long") * 500
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        concat(lit("["), band, lit(","), band + 500, lit(")"))
          .as("acctbal_band"),
        substring(col("c_name"), 1, 4).as("name_prefix"))
      .orderBy("c_custkey")
  }

  val maskGeneralizeSql: String =
    """SELECT c_custkey,
      |  '[' || CAST(CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 500.0) AS BIGINT) * 500 AS VARCHAR)
      |  || ',' || CAST(CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 500.0) AS BIGINT) * 500 + 500 AS VARCHAR)
      |  || ')' AS acctbal_band,
      |  substr(c_name, 1, 4) AS name_prefix
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------ mask_kanonymity
  /** k-anonymity audit over the GENERALIZED quasi-identifier view —
    * the check that decides whether [[maskGeneralize]]'s coarsening
    * was coarse ENOUGH: group rows by (segment, nation, acctbal band
    * — the same width-500 banding mask_generalize emits) and report,
    * per segment, the smallest group (k_min: the dataset's actual k),
    * the group count, and how many rows sit in groups below k=5 (the
    * re-identifiable population a release gate would block on).
    * Two-level integer aggregation, one shuffle on the quasi-id. */
  def maskKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val band = floor(col("c_acctbal").cast("double") / 500.0).cast("long")
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"), band.as("band"))
      .groupBy("c_mktsegment", "c_nationkey", "band")
      .agg(count(lit(1)).as("k"))
      .groupBy("c_mktsegment")
      .agg(min(col("k")).as("k_min"),
        count(lit(1)).as("n_groups"),
        sum(col("k")).as("n_rows"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).as("n_rows_at_risk"))
      .reportSort("c_mktsegment")
  }

  val maskKAnonymitySql: String =
    """WITH g AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 500.0) AS BIGINT) AS band,
      |    COUNT(*) AS k
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT c_mktsegment, MIN(k) AS k_min, COUNT(*) AS n_groups,
      |  CAST(SUM(k) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |    AS n_rows_at_risk
      |FROM g GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------- mask_k_map
  /** K-MAP risk estimate (El Emam's population-based re-identification
    * model — the audit [[maskKAnonymity]] cannot give you): k-anonymity
    * measures group sizes INSIDE the release, but an attacker matches
    * quasi-identifiers against the POPULATION — a record unique in a
    * 10% release is usually NOT unique in the population, so
    * sample-side k systematically overstates risk. Here the release is
    * a deterministic keyed-hash 10% sample of customers (replayable in
    * both engines), the population is the full table, and each released
    * row carries BOTH its in-sample k and its population k on the
    * shared (segment, nation, balance-band) quasi-ID grid. Per
    * segment: released rows, sample-unique rows, population-unique
    * rows (the TRUE identity disclosures), rows with population k < 5,
    * and the false-alarm count (sample-unique but population-safe) —
    * the gap between naive and population-aware risk. Shape: two
    * hash-aggs to the domain-bounded QI grid + one row-level join
    * against the broadcast grid frames; no windows, no pair joins. */
  def maskKMap(spark: SparkSession, dir: String): DataFrame = {
    val band = floor(col("c_acctbal").cast("double") / 500.0).cast("long")
    val qi = Seq("c_mktsegment", "c_nationkey", "band")
    val all = Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"), band.as("band"),
        col("c_custkey"))
    val pop = all.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("pop_k"))
    val samp = all
      .filter(pmod(MaskFunctions.portableHash(col("c_custkey")),
        lit(10)) === 0)
    val sampK = samp.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("samp_k"))
    samp.join(broadcast(sampK), qi).join(broadcast(pop), qi)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_released"),
        sum(when(col("samp_k") === 1, 1L).otherwise(0L))
          .as("n_sample_unique"),
        sum(when(col("pop_k") === 1, 1L).otherwise(0L))
          .as("n_pop_unique"),
        sum(when(col("pop_k") < 5, 1L).otherwise(0L))
          .as("n_pop_risk"),
        sum(when(col("samp_k") === 1 && col("pop_k") >= 5, 1L)
          .otherwise(0L)).as("n_false_alarm"))
      .reportSort("c_mktsegment")
  }

  val maskKMapSql: String =
    """WITH allc AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 500.0) AS BIGINT)
      |      AS band,
      |    c_custkey
      |  FROM customer),
      |pop AS (
      |  SELECT c_mktsegment, c_nationkey, band, COUNT(*) AS pop_k
      |  FROM allc GROUP BY 1, 2, 3),
      |samp AS (
      |  SELECT * FROM allc
      |  WHERE ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),1,8))::BIGINT
      |    % 10 = 0),
      |sk AS (
      |  SELECT c_mktsegment, c_nationkey, band, COUNT(*) AS samp_k
      |  FROM samp GROUP BY 1, 2, 3)
      |SELECT s.c_mktsegment, COUNT(*) AS n_released,
      |  CAST(SUM(CASE WHEN samp_k = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sample_unique,
      |  CAST(SUM(CASE WHEN pop_k = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_pop_unique,
      |  CAST(SUM(CASE WHEN pop_k < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_pop_risk,
      |  CAST(SUM(CASE WHEN samp_k = 1 AND pop_k >= 5 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_false_alarm
      |FROM samp s
      |JOIN sk ON s.c_mktsegment = sk.c_mktsegment
      |  AND s.c_nationkey = sk.c_nationkey AND s.band = sk.band
      |JOIN pop ON s.c_mktsegment = pop.c_mktsegment
      |  AND s.c_nationkey = pop.c_nationkey AND s.band = pop.band
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------ mask_ldiversity
  /** l-diversity audit — k-anonymity's necessary companion: a
    * quasi-ID group can be large (k high) yet still leak when every
    * member shares the SAME sensitive value (homogeneity attack —
    * knowing someone is in the group reveals their attribute). Per
    * quasi-ID group ((segment, nation, balance band), the
    * [[maskKAnonymity]] grouping) the distinct-sensitive count l is
    * computed by the two-level hash-agg (cells keyed on
    * (quasi, sensitive) first — never a COUNT DISTINCT over raw
    * rows), then per segment: worst l, group count, fully-homogeneous
    * group count (l = 1 — total disclosure), and the rows exposed in
    * them. The sensitive class derives deterministically from the
    * portable hash (a stand-in for e.g. diagnosis codes) so both
    * engines see identical data. */
  def maskLDiversity(spark: SparkSession, dir: String): DataFrame = {
    val band = floor(col("c_acctbal").cast("double") / 500.0).cast("long")
    val sens = pmod(MaskFunctions.portableHash(col("c_custkey")), lit(5))
    val cells = Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"), band.as("band"),
        sens.as("s"))
      .groupBy("c_mktsegment", "c_nationkey", "band", "s")
      .agg(count(lit(1)).as("c"))
    cells.groupBy("c_mktsegment", "c_nationkey", "band")
      .agg(count(lit(1)).as("l"), sum(col("c")).as("k"))
      .groupBy("c_mktsegment")
      .agg(min(col("l")).as("l_min"), count(lit(1)).as("n_groups"),
        sum(when(col("l") === 1, 1L).otherwise(0L)).as("n_groups_l1"),
        sum(when(col("l") === 1, col("k")).otherwise(0L))
          .as("n_rows_exposed"))
      .reportSort("c_mktsegment")
  }

  val maskLDiversitySql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 500.0) AS BIGINT)
      |      AS band,
      |    ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),1,8))::BIGINT
      |      % 5 AS s,
      |    COUNT(*) AS c
      |  FROM customer GROUP BY 1, 2, 3, 4),
      |g AS (
      |  SELECT c_mktsegment, c_nationkey, band, COUNT(*) AS l,
      |    SUM(c) AS k
      |  FROM cells GROUP BY 1, 2, 3)
      |SELECT c_mktsegment, CAST(MIN(l) AS BIGINT) AS l_min,
      |  COUNT(*) AS n_groups,
      |  CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_groups_l1,
      |  CAST(SUM(CASE WHEN l = 1 THEN k ELSE 0 END) AS BIGINT)
      |    AS n_rows_exposed
      |FROM g GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // -------------------------------------------------- mask_encrypt
  /** Real AES encryption as a masking rule — the reversible
    * (key-holding) protection class beside hashing (one-way) and FPE
    * (format-keeping): every name round-trips through Spark's builtin
    * `aes_encrypt`/`aes_decrypt` (AES-128-ECB + PKCS, deterministic —
    * equal plaintexts mask equally, the property a joinable encrypted
    * key column needs; use GCM + per-row IVs when determinism is NOT
    * wanted).
    *
    * The AES-128 key is DERIVED PER COLUMN:
    * key = unhex(md5(master ‖ '|' ‖ column-name)). Deterministic ECB
    * leaks equality patterns, so the leak must stop at the column
    * boundary: two tables encrypting the SAME logical column still
    * join (same derived key → equal plaintext → equal ciphertext),
    * but equal values in DIFFERENT columns/tables no longer produce
    * equal ciphertext — the audit column proves it on the real cipher
    * (the same c_name under the c_address-derived key). The
    * derivation is a constant-folded expression (md5 of a literal),
    * zero per-row cost.
    *
    * The oracle cannot run AES, so the driver key emits what it CAN
    * pin bit-for-bit: the decrypted round-trip (proving
    * encrypt∘decrypt = id over the real cipher), the exact PKCS
    * ciphertext length, and the cross-column inequality witness;
    * R8cOpsSpec additionally pins the FIPS-197 AES-128 known-answer
    * vector through the same builtin. Row-local codegen; no UDF. */
  def columnKeySql(column: String, master: String = "graft-master"): String =
    s"unhex(md5(cast('$master|$column' as binary)))"

  def maskEncrypt(spark: SparkSession, dir: String): DataFrame = {
    val kName = columnKeySql("customer.c_name")
    val kAddr = columnKeySql("customer.c_address")
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        expr(s"aes_encrypt(cast(c_name as binary), $kName, 'ECB', 'PKCS')")
          .as("_ct"),
        expr(s"aes_encrypt(cast(c_name as binary), $kAddr, 'ECB', 'PKCS')")
          .as("_ct_other"))
      .select(col("c_custkey"),
        expr(s"cast(aes_decrypt(_ct, $kName, 'ECB', 'PKCS') as string)")
          .as("dec"),
        length(col("_ct")).cast("long").as("cipher_len"),
        (col("_ct") =!= col("_ct_other")).as("cross_key_differs"))
      .orderBy("c_custkey")
  }

  val maskEncryptSql: String =
    """SELECT c_custkey, c_name AS dec,
      |  CAST((length(c_name) // 16 + 1) * 16 AS BIGINT) AS cipher_len,
      |  TRUE AS cross_key_differs
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------- mask_vgh_generalize
  /** VALUE-GENERALIZATION HIERARCHY — the Mondrian/Datafly move k-
    * anonymization actually performs on location-like columns: walk
    * each value UP its hierarchy (nation → region → ALL) just far
    * enough that the group reaches k = 50 members, so precision is
    * lost only where re-identification risk demands it (a blanket
    * region-level mask would destroy the 60%+ of rows whose nation is
    * already safe). Two dimension-sized count frames broadcast back
    * against the corpus — the corpus itself never shuffles; level
    * choice is a row-local CASE. The residual ALL bucket is reported
    * as-is (that is the suppression the audit exists to expose). */
  def maskVghGeneralize(spark: SparkSession, dir: String): DataFrame = {
    val k = 50L
    val c = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val nc = c.groupBy("n_name").agg(count(lit(1)).as("_cn"))
    val rc = c.groupBy("r_name").agg(count(lit(1)).as("_cr"))
    c.join(broadcast(nc), "n_name")
      .join(broadcast(rc), "r_name")
      .select(
        when(col("_cn") >= k, lit(0L)).when(col("_cr") >= k, lit(1L))
          .otherwise(lit(2L)).as("level"),
        when(col("_cn") >= k, col("n_name"))
          .when(col("_cr") >= k, col("r_name"))
          .otherwise(lit("ALL")).as("label"))
      .groupBy("level", "label")
      .agg(count(lit(1)).as("n"))
      .reportSort("level", "label")
  }

  val maskVghGeneralizeSql: String =
    """WITH c AS (
      |  SELECT c_custkey, n_name, r_name
      |  FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |nc AS (SELECT n_name, COUNT(*) AS cn FROM c GROUP BY n_name),
      |rc AS (SELECT r_name, COUNT(*) AS cr FROM c GROUP BY r_name)
      |SELECT
      |  CAST(CASE WHEN cn >= 50 THEN 0 WHEN cr >= 50 THEN 1
      |       ELSE 2 END AS BIGINT) AS level,
      |  CASE WHEN cn >= 50 THEN c.n_name WHEN cr >= 50 THEN c.r_name
      |       ELSE 'ALL' END AS label,
      |  COUNT(*) AS n
      |FROM c JOIN nc ON nc.n_name = c.n_name
      |JOIN rc ON rc.r_name = c.r_name
      |GROUP BY 1, 2 ORDER BY level, label""".stripMargin

  // --------------------------------------------- mask_t_closeness
  /** T-CLOSENESS audit (Li et al. 2007) — the third rung of the
    * release-gate ladder after k-anonymity (group size) and
    * l-diversity (sensitive-value count): a group can be large AND
    * diverse yet still leak if its sensitive-value DISTRIBUTION
    * differs from the table's (e.g. one segment skews poor). Per
    * quasi-id class (segment × nation) the variational distance
    * between the class's balance-bucket distribution and the global
    * one, exact per-mille: tvd = 500·Σ_b |n_gb·N − n_b·n_g| / (n_g·N)
    * — all integer products (n_gb·N ≤ N², in-bounds to n ≈ 3·10⁹).
    * Shape: one (class, bucket) hash-agg, global bucket frame
    * broadcast back, |classes|-row report. Fixed 2000-unit value
    * grid, same contract as [[graft.classify.ClassifyQueries]] drift
    * panels. */
  def maskTCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val c = Tables.customer(spark, dir).select(
      col("c_mktsegment").as("seg"), col("c_nationkey").as("nation"),
      floor(((col("c_acctbal").cast(DecimalType(18, 2)) * 100)
        .cast("long") + 100000L) / 200000L).cast("long").as("bucket"))
    val gb = c.groupBy("seg", "nation", "bucket")
      .agg(count(lit(1)).as("n_gb"))
      // |classes × buckets| frame with four consumers (global buckets,
      // totals, class sizes, report): pin it — one corpus scan total
      .cut
    val glob = gb.groupBy("bucket").agg(sum(col("n_gb")).as("n_b"))
    val tot = gb.agg(sum(col("n_gb")).as("nn"))
    val ng = gb.groupBy("seg", "nation").agg(sum(col("n_gb")).as("n_g"))
    gb.join(broadcast(glob), "bucket")
      .join(broadcast(ng), Seq("seg", "nation"))
      .crossJoin(broadcast(tot))
      .groupBy("seg", "nation")
      .agg(max(col("n_g")).as("n_g"),
        sum(abs(col("n_gb") * col("nn") - col("n_b") * col("n_g")))
          .as("_num"),
        max(col("nn")).as("_nn"))
      .select(col("seg"), col("nation"), col("n_g"),
        expr("_num * 500 div (n_g * _nn)").as("tvd_pm"))
      .withColumn("t_close_ok", col("tvd_pm") <= 200)
      .reportSort("seg", "nation")
  }

  val maskTClosenessSql: String =
    """WITH c AS (
      |  SELECT c_mktsegment AS seg, c_nationkey AS nation,
      |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      + 100000) // 200000 AS bucket
      |  FROM customer),
      |gb AS (SELECT seg, nation, bucket, COUNT(*) AS n_gb
      |       FROM c GROUP BY 1, 2, 3),
      |gl AS (SELECT bucket, SUM(n_gb) AS n_b FROM gb GROUP BY bucket),
      |ng AS (SELECT seg, nation, SUM(n_gb) AS n_g
      |       FROM gb GROUP BY 1, 2),
      |t AS (SELECT SUM(n_gb) AS nn FROM gb)
      |SELECT gb.seg, gb.nation, CAST(MAX(ng.n_g) AS BIGINT) AS n_g,
      |  CAST(SUM(ABS(gb.n_gb * t.nn - gl.n_b * ng.n_g)) * 500 //
      |    (MAX(ng.n_g) * MAX(t.nn)) AS BIGINT) AS tvd_pm,
      |  SUM(ABS(gb.n_gb * t.nn - gl.n_b * ng.n_g)) * 500 //
      |    (MAX(ng.n_g) * MAX(t.nn)) <= 200 AS t_close_ok
      |FROM gb JOIN gl USING (bucket)
      |JOIN ng ON gb.seg = ng.seg AND gb.nation = ng.nation
      |CROSS JOIN t
      |GROUP BY gb.seg, gb.nation ORDER BY gb.seg, gb.nation""".stripMargin

  // ---------------------------------------------- mask_info_loss
  /** GENERALIZATION INFORMATION-LOSS audit — the utility side of the
    * privacy ledger (every release gate above answers "safe enough?";
    * this one answers "what did the mask cost?"): over the
    * [[maskVghGeneralize]] output, per hierarchy level the row count,
    * class count, the DISCERNIBILITY metric Σ|class|² (Bayardo &
    * Agrawal's cost — rows in coarse classes are pairwise
    * indistinguishable, so cost grows quadratically with class size),
    * and the generalization-precision loss in per-mille of the
    * hierarchy height (level/2 for the 3-level nation→region→ALL
    * tree). Input is the |classes|-sized generalized frame — the
    * audit itself never rescans the corpus. */
  def maskInfoLoss(spark: SparkSession, dir: String): DataFrame =
    maskVghGeneralize(spark, dir)
      .groupBy("level")
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        sum(col("n") * col("n")).as("discernibility"),
        max(expr("level * 1000 div 2")).as("loss_pm"))
      .orderBy("level")

  val maskInfoLossSql: String =
    """WITH c AS (
      |  SELECT c_custkey, n_name, r_name
      |  FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |nc AS (SELECT n_name, COUNT(*) AS cn FROM c GROUP BY n_name),
      |rc AS (SELECT r_name, COUNT(*) AS cr FROM c GROUP BY r_name),
      |g AS (
      |  SELECT
      |    CAST(CASE WHEN cn >= 50 THEN 0 WHEN cr >= 50 THEN 1
      |         ELSE 2 END AS BIGINT) AS level,
      |    CASE WHEN cn >= 50 THEN c.n_name WHEN cr >= 50 THEN c.r_name
      |         ELSE 'ALL' END AS label,
      |    COUNT(*) AS n
      |  FROM c JOIN nc ON nc.n_name = c.n_name
      |  JOIN rc ON rc.r_name = c.r_name
      |  GROUP BY 1, 2)
      |SELECT level, CAST(SUM(n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_classes,
      |  CAST(SUM(n * n) AS BIGINT) AS discernibility,
      |  CAST(MAX(level * 1000 // 2) AS BIGINT) AS loss_pm
      |FROM g GROUP BY level ORDER BY level""".stripMargin

  // --------------------------------------------- mask_rare_suppress
  /** Rare-category suppression — the categorical companion to value
    * banding: any category with fewer than k = 3 members is replaced
    * by 'OTHER' (a 1-member part type is itself a quasi-identifier;
    * banding can't help a nominal column). Shape: ONE |categories|
    * hash-agg (map-side combining) broadcast back against the corpus
    * — the corpus never shuffles, the category frame is dimension-
    * sized at any scale. */
  def maskRareSuppress(spark: SparkSession, dir: String): DataFrame = {
    val cat = concat_ws("/", col("p_type"), col("p_size"))
    val counts = Tables.part(spark, dir)
      .groupBy(cat.as("category")).agg(count(lit(1)).as("_n"))
    Tables.part(spark, dir)
      .select(col("p_partkey"), cat.as("category"))
      .join(broadcast(counts), Seq("category"))
      .select(col("p_partkey"), col("category"),
        when(col("_n") < 3L, lit("OTHER")).otherwise(col("category"))
          .as("category_masked"))
      .orderBy("p_partkey")
  }

  val maskRareSuppressSql: String =
    """WITH p AS (
      |  SELECT p_partkey,
      |    p_type || '/' || CAST(p_size AS VARCHAR) AS category
      |  FROM part),
      |c AS (SELECT category, COUNT(*) AS n FROM p GROUP BY category)
      |SELECT p_partkey, category,
      |  CASE WHEN c.n < 3 THEN 'OTHER' ELSE category END
      |    AS category_masked
      |FROM p JOIN c USING (category) ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------- mask_rand_response
  /** Randomized response (Warner 1965) — the local-DP mechanism for a
    * categorical column: each row keeps its true category with
    * probability 1−f and is replaced by a uniform draw from the
    * domain with probability f (f = 0.1, domain = the 25 nations) —
    * plausible deniability per ROW, unlike suppression/generalization
    * which only protect groups. Both coins derive from the portable
    * keyed hash (":rr" flip gate, ":pick" replacement), so the
    * "randomness" replays bit-identically on any engine. The audit
    * reports, per nation, the true count, the observed (noised)
    * count, and the UNBIASED estimator a consumer reconstructs
    * aggregates with — E[obs] = n·(1−f) + N·f/25, inverted exactly in
    * integer arithmetic as (1000·obs − 4·N) / 900 (numerator emitted
    * raw; the quotient clamps at 0 so both engines' integer division
    * agrees). Shape: ONE customer scan melted to (tag, nation) pairs,
    * one combiner-friendly hash-agg, 1-row total broadcast. */
  def maskRandResponse(spark: SparkSession, dir: String): DataFrame = {
    val key = col("c_custkey").cast("string")
    val flip = pmod(MaskFunctions.portableHash(concat(key, lit(":rr"))),
      lit(1000L)) < 100L
    val pick = pmod(MaskFunctions.portableHash(concat(key, lit(":pick"))),
      lit(25L))
    val base = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nt"),
        when(flip, pick).otherwise(col("c_nationkey").cast("long"))
          .as("no"))
    val tot = base.agg(count(lit(1)).as("_n"))
    base.select(explode(array(
        struct(lit("t").as("tag"), col("nt").as("nat")),
        struct(lit("o").as("tag"), col("no").as("nat")))).as("m"))
      .select(col("m.tag").as("tag"), col("m.nat").as("nat"))
      .groupBy("nat")
      .agg(sum(when(col("tag") === "t", 1L).otherwise(0L)).as("n_true"),
        sum(when(col("tag") === "o", 1L).otherwise(0L)).as("n_obs"))
      .crossJoin(broadcast(tot))
      .select(col("nat").as("nationkey"), col("n_true"), col("n_obs"),
        (col("n_obs") * 1000L - col("_n") * 4L).as("est_num"),
        expr("greatest(n_obs * 1000 - _n * 4, 0L) div 900").as("est_true"))
      .reportSort("nationkey")
  }

  val maskRandResponseSql: String =
    """WITH b AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nt,
      |    CASE WHEN ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)||':rr'),
      |                1,8))::BIGINT % 1000 < 100
      |      THEN ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)||':pick'),
      |                1,8))::BIGINT % 25
      |      ELSE CAST(c_nationkey AS BIGINT) END AS no
      |  FROM customer),
      |n AS (SELECT COUNT(*) AS tot FROM b),
      |m AS (SELECT 't' AS tag, nt AS nat FROM b
      |      UNION ALL SELECT 'o', no FROM b)
      |SELECT nat AS nationkey,
      |  CAST(SUM(CASE WHEN tag = 't' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_true,
      |  CAST(SUM(CASE WHEN tag = 'o' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_obs,
      |  CAST(SUM(CASE WHEN tag = 'o' THEN 1 ELSE 0 END) * 1000 - tot * 4
      |    AS BIGINT) AS est_num,
      |  CAST(GREATEST(SUM(CASE WHEN tag = 'o' THEN 1 ELSE 0 END) * 1000
      |    - tot * 4, 0) // 900 AS BIGINT) AS est_true
      |FROM m CROSS JOIN n GROUP BY nat, tot ORDER BY nationkey""".stripMargin

  // ------------------------------------------------ mask_substitute
  /** Monoalphabetic substitution cipher — format-preserving by
    * construction: character class (letter/digit/other), case, and
    * length all survive; non-alphanumerics pass through untouched.
    * One codegen `translate` per column (no UDF, no hashing). The
    * alphabets are compile-time constants shared with the oracle SQL
    * (see [[MaskFunctions.substitutionDst]]), so both engines apply
    * the bit-identical mapping. */
  def maskSubstitute(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        MaskFunctions.substitute(col("c_name")).as("name_sub"),
        MaskFunctions.substitute(col("c_mktsegment")).as("segment_sub"))
      .orderBy("c_custkey")

  val maskSubstituteSql: String = {
    val src = MaskFunctions.substitutionSrc
    val dst = MaskFunctions.substitutionDst
    s"""SELECT c_custkey,
       |  translate(c_name, '$src', '$dst') AS name_sub,
       |  translate(c_mktsegment, '$src', '$dst') AS segment_sub
       |FROM customer ORDER BY c_custkey""".stripMargin
  }

  // ------------------------------------------------- mask_text_scrub
  /** Free-TEXT PII scrubbing — the rewrite step after
    * [[graft.classify.ClassifyQueries.clsTextPii]]'s discovery: emails
    * and SSN-shaped refs are replaced IN the text with typed
    * placeholders (`[EMAIL]`/`[SSN]`), the form a training corpus
    * ships in. Same deterministic PII synthesis as `cls_text_pii`, so
    * hit rates are realistic and both engines rebuild identical
    * inputs. The per-lang report carries replacement counts plus a
    * checksum over every scrubbed doc (sum of portable 32-bit text
    * hashes), so the oracle proves the REWRITTEN BYTES match, not just
    * the counts. Pure map pass + one combiner-friendly agg; at 100 TB
    * the checksum is per-shard-summable. */
  private val scrubEmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val scrubSsnPat = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** The scrub rewrite itself (shared with the spec that pins it). */
  def scrubPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(c, scrubEmailPat, "[EMAIL]"),
      scrubSsnPat, "[SSN]")

  def maskTextScrub(spark: SparkSession, dir: String): DataFrame = {
    val nine = lpad((col("doc_id") * 2654435761L % 1000000000L).cast("string"),
      9, "0")
    val injected = concat(col("text"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" ref "), nine.substr(1, 3), lit("-"), nine.substr(4, 2),
          lit("-"), nine.substr(6, 4))).otherwise(lit("")))
    val scrubbed = scrubPii(injected)
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(regexp_extract_all(injected, lit(scrubEmailPat), lit(0))).as("ne"),
        size(regexp_extract_all(injected, lit(scrubSsnPat), lit(0))).as("ns"),
        MaskFunctions.portableHash(scrubbed).as("h"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") + col("ns") > 0, 1L).otherwise(0L))
          .as("docs_scrubbed"),
        sum(col("ne")).cast("long").as("email_repl"),
        sum(col("ns")).cast("long").as("ssn_repl"),
        sum(col("h")).cast("long").as("scrub_checksum"))
      .reportSort("lang")
  }

  val maskTextScrubSql: String = {
    val nine = "lpad(CAST(doc_id * 2654435761 % 1000000000 AS VARCHAR), 9, '0')"
    s"""WITH v AS (
       |  SELECT lang, text ||
       |    CASE WHEN doc_id % 5 = 0
       |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0
       |         THEN ' ref ' || substr($nine,1,3) || '-' || substr($nine,4,2)
       |              || '-' || substr($nine,6,4) ELSE '' END AS t
       |  FROM documents),
       |s AS (
       |  SELECT lang,
       |    len(regexp_extract_all(t, '$scrubEmailPat')) AS ne,
       |    len(regexp_extract_all(t, '$scrubSsnPat')) AS ns,
       |    ${hashSql(s"regexp_replace(regexp_replace(t, " +
           s"'$scrubEmailPat', '[EMAIL]', 'g'), '$scrubSsnPat', '[SSN]', 'g')")}
       |      AS h
       |  FROM v)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN ne + ns > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS docs_scrubbed,
       |  CAST(SUM(ne) AS BIGINT) AS email_repl,
       |  CAST(SUM(ns) AS BIGINT) AS ssn_repl,
       |  CAST(SUM(h) AS BIGINT) AS scrub_checksum
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ------------------------------------------------ mask_cell_suppress
  /** Small-cell suppression — the disclosure-control rule every
    * statistical agency applies to published aggregates (and the
    * tabular companion to [[maskKAnonymity]]'s row-level rule): a
    * (nation, segment) cell whose population is below the threshold
    * k = 8 has its count AND total nulled — publishing even the count
    * of a tiny cell re-identifies its members; the suppressed flag
    * stays so consumers can distinguish "suppressed" from "zero".
    * One hash-agg; the threshold test is post-aggregation, so nothing
    * row-level crosses the shuffle beyond the partial aggregates. */
  // -------------------------------------------- mask_retention_sweep
  /** Retention-policy sweep — the GDPR/records-management deletion
    * PLANNER that runs before any masking rule: per category, how
    * many records have outlived their retention class (urgent orders
    * keep 200 days, high 400, the rest 800) and must be deleted,
    * pseudonymized, or archived. The reference's governance surface
    * stops at masking the values; a deployment also needs the sweep
    * that says WHICH rows the policy touches. Deterministic anchor:
    * ages are measured from the corpus's own max date (never the
    * wall clock — oracle-replayable and reproducible), so the report
    * is a pure function of the data. Two pruned scans (1-row anchor
    * probe broadcast back — the cls_psi_drift pattern) → |categories|
    * rows. */
  def maskRetentionSweep(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), to_date(col("o_orderdate")).as("d"))
    val anchor = o.agg(max(col("d")).as("_mx"))
    o.crossJoin(broadcast(anchor))
      .withColumn("_ret",
        when(col("o_orderpriority") === "1-URGENT", 200)
          .when(col("o_orderpriority") === "2-HIGH", 400)
          .otherwise(800))
      .withColumn("_exp",
        (datediff(col("_mx"), col("d")) > col("_ret")).cast("long"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("_exp")).as("n_expired"),
        min(col("d")).as("oldest"), max(col("d")).as("newest"))
      .withColumn("expired_pm", expr("n_expired * 1000 div n"))
      .reportSort("o_orderpriority")
  }

  val maskRetentionSweepSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d
      |  FROM orders),
      |a AS (SELECT MAX(d) AS mx FROM o),
      |e AS (
      |  SELECT p, d, a.mx,
      |    CASE WHEN p = '1-URGENT' THEN 200
      |         WHEN p = '2-HIGH' THEN 400 ELSE 800 END AS ret
      |  FROM o CROSS JOIN a),
      |g AS (
      |  SELECT p, COUNT(*) AS n,
      |    SUM(CASE WHEN date_diff('day', d, mx) > ret
      |        THEN 1 ELSE 0 END) AS x,
      |    MIN(d) AS oldest, MAX(d) AS newest
      |  FROM e GROUP BY 1)
      |SELECT p AS o_orderpriority, n, CAST(x AS BIGINT) AS n_expired,
      |  oldest, newest, CAST(x * 1000 // n AS BIGINT) AS expired_pm
      |FROM g ORDER BY 1""".stripMargin

  def maskCellSuppress(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Tables.customer(spark, dir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("_n"),
        sum((col("c_acctbal").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("_s"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        when(col("_n") < 8, lit(null)).otherwise(col("_n")).as("n"),
        when(col("_n") < 8, lit(null)).otherwise(col("_s"))
          .as("balance_cents"),
        (col("_n") < 8).as("suppressed"))
      .reportSort("c_nationkey", "c_mktsegment")
  }

  val maskCellSuppressSql: String =
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
      |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS s
      |  FROM customer GROUP BY 1, 2)
      |SELECT c_nationkey, c_mktsegment,
      |  CASE WHEN n < 8 THEN NULL ELSE n END AS n,
      |  CASE WHEN n < 8 THEN NULL ELSE s END AS balance_cents,
      |  n < 8 AS suppressed
      |FROM g ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ------------------------------------------------------ mask_shuffle
  /** Value SHUFFLING — the masking technique that replaces each row's
    * sensitive value with ANOTHER row's value from the same group
    * (marginal distribution per nation preserved exactly, row linkage
    * destroyed): rows are ranked in a deterministic pseudo-random
    * order (portable hash of the key), values are ranked in value
    * order, and rank r's row receives rank r's value. Deterministic —
    * both engines derive the identical permutation, unlike RNG-based
    * shuffling no oracle could replay.
    *
    * Scale shape: NO per-nation global window — both rankings use
    * [[graft.ops.OrderStats.twoLevelRunningSum]]'s shard-rank +
    * exclusive-prefix-offset decomposition (row ranks sharded by
    * hash high bits, value ranks by contiguous cents ranges shifted
    * non-negative), so window partitions are (nation, shard)-bounded
    * and the offsets windows run over aggregated shard counts only.
    * The rank↔rank equi-join is an ordinary shuffle join on
    * (nation, rank). */
  def maskShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .withColumn("h", MaskFunctions.portableHash(col("c_custkey")))
    val rowsR = graft.ops.OrderStats.twoLevelRunningSum(c,
        Seq("c_nationkey"), Seq(expr("h div 67108864")),
        Seq(col("h"), col("c_custkey")), lit(1L), "r")
      .select(col("c_nationkey"), col("r"), col("c_custkey"))
    val valsR = graft.ops.OrderStats.twoLevelRunningSum(c,
        Seq("c_nationkey"), Seq(expr("(cents + 100000) div 1048576")),
        Seq(col("cents"), col("c_custkey")), lit(1L), "r")
      .select(col("c_nationkey"), col("r"), col("cents"))
    rowsR.join(valsR, Seq("c_nationkey", "r"))
      .select(col("c_custkey"), col("c_nationkey"),
        col("cents").as("shuffled_cents"))
      .orderBy("c_custkey")
  }

  val maskShuffleSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),1,8))::BIGINT AS h
      |  FROM customer),
      |rr AS (
      |  SELECT c_custkey, c_nationkey,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY h, c_custkey) AS r
      |  FROM c),
      |vr AS (
      |  SELECT c_nationkey, cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY cents, c_custkey) AS r
      |  FROM c)
      |SELECT rr.c_custkey, rr.c_nationkey, vr.cents AS shuffled_cents
      |FROM rr JOIN vr ON rr.c_nationkey = vr.c_nationkey AND rr.r = vr.r
      |ORDER BY rr.c_custkey""".stripMargin

  // ------------------------------------------------- mask_winsorize
  /** WINSORIZATION (top/bottom coding) — the disclosure-control move
    * for numeric outliers (a lone extreme balance re-identifies its
    * holder even after the name is masked): per nation, cap account
    * balances at the exact p05/p95 order statistics and report how
    * many values each tail clipped plus the sum shift the capping
    * cost. The quantiles come from
    * [[graft.ops.OrderStats.radixRankSelect]] — both tails of all 25
    * groups in the same two domain-capped passes, never a per-group
    * sort — and the |groups|-row cap frame broadcasts back over the
    * corpus for a map-only clip. Works on negative cents unchanged
    * (arithmetic shiftright keeps bucket order monotone). */
  def maskWinsorize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vals = Tables.customer(spark, dir).select(col("c_nationkey"),
      (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val qs = graft.ops.OrderStats.radixRankSelect(vals,
      Seq("c_nationkey"), "cents", Seq(
        "p05" -> expr("(n + 19) div 20"),
        "p95" -> expr("(19 * n + 19) div 20")))
    val caps = qs.groupBy("c_nationkey")
      .agg(max(when(col("sel") === "p05", col("sel_value"))).as("lo"),
        max(when(col("sel") === "p95", col("sel_value"))).as("hi"))
    vals.join(broadcast(caps), "c_nationkey")
      .select(col("c_nationkey"), col("cents"),
        greatest(least(col("cents"), col("hi")), col("lo")).as("capped"),
        col("lo"), col("hi"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_high"),
        sum(col("cents")).as("sum_before"),
        sum(col("capped")).as("sum_after"))
      .reportSort("c_nationkey")
  }

  val maskWinsorizeSql: String =
    """WITH v AS (
      |  SELECT c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM customer),
      |h AS (SELECT c_nationkey, cents, COUNT(*) AS c FROM v
      |      GROUP BY 1, 2),
      |cum AS (
      |  SELECT c_nationkey, cents,
      |    SUM(c) OVER (PARTITION BY c_nationkey ORDER BY cents) AS hi
      |  FROM h),
      |n AS (SELECT c_nationkey, COUNT(*) AS n FROM v GROUP BY 1),
      |r AS (
      |  SELECT c_nationkey, unnest(['p05','p95']) AS q,
      |    unnest([(n+19)//20, (19*n+19)//20]) AS k
      |  FROM n),
      |sel AS (
      |  SELECT r.c_nationkey, r.q, MIN(c.cents) AS v
      |  FROM r JOIN cum c
      |    ON c.c_nationkey = r.c_nationkey AND c.hi >= r.k
      |  GROUP BY 1, 2),
      |caps AS (
      |  SELECT c_nationkey,
      |    MAX(CASE WHEN q = 'p05' THEN v END) AS lo,
      |    MAX(CASE WHEN q = 'p95' THEN v END) AS hi
      |  FROM sel GROUP BY 1)
      |SELECT v.c_nationkey, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_low,
      |  CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_high,
      |  CAST(SUM(cents) AS BIGINT) AS sum_before,
      |  CAST(SUM(GREATEST(LEAST(cents, hi), lo)) AS BIGINT)
      |    AS sum_after
      |FROM v JOIN caps USING (c_nationkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- mask_microagg
  /** MICROAGGREGATION — the numeric-column SDC workhorse (the k-member
    * cluster-and-replace that gives k-anonymity to a CONTINUOUS
    * attribute, where generalization bins would destroy utility): per
    * nation, account balances sort into consecutive k=5-member
    * microclusters (deterministic (cents, custkey) order; the
    * remainder folds into the last full cluster, so every cluster
    * holds k..2k−1 members — the size invariant the spec pins) and
    * each cluster publishes its floor-mean as the masked value. The
    * codebook this emits (cluster → size, mean, span) IS the
    * microaggregated release. Exactness: means are computed on
    * +offset-shifted cents so the integer division runs on
    * non-negative operands, where Spark's truncating `div` and
    * DuckDB's flooring `//` agree, then the identity
    * floor((s+kn)/n)−k = floor(s/n) shifts back — no float mean ever
    * exists. One per-nation window (same cost class as the
    * mask_kanonymity sort; a per-group total order is inherent to
    * microaggregation — at larger groups the rank rides the
    * two-level shard machinery mask_shuffle already uses) + one
    * hash-agg. */
  def maskMicroagg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val k = 5
    val off = 100000L // c_acctbal ≥ −999.99 ⇒ cents+off ≥ 1
    val c = Tables.customer(spark, dir).select(
      col("c_nationkey").as("nation"), col("c_custkey"),
      (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val order = Window.partitionBy("nation")
      .orderBy(col("cents"), col("c_custkey"))
    val whole = Window.partitionBy("nation")
    c.withColumn("rn", row_number().over(order))
      .withColumn("ng", count(lit(1)).over(whole))
      .withColumn("cluster", // greatest(…,0): a <k-member group degenerates to one undersized cluster
        greatest(least(expr(s"(rn - 1) div $k"),
          expr(s"ng div $k - 1")), lit(0)))
      .groupBy("nation", "cluster")
      .agg(count(lit(1)).as("size"),
        sum(col("cents") + lit(off)).as("_soff"),
        min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
      .select(col("nation"), col("cluster"), col("size"),
        (expr("_soff div size") - off).as("mean_cents"),
        col("lo_cents"), col("hi_cents"))
      .orderBy("nation", "cluster")
  }

  val maskMicroaggSql: String =
    """WITH c AS (
      |  SELECT c_nationkey AS nation, c_custkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM customer),
      |r AS (
      |  SELECT nation, cents,
      |    ROW_NUMBER() OVER (PARTITION BY nation
      |      ORDER BY cents, c_custkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY nation) AS ng
      |  FROM c),
      |cl AS (
      |  SELECT nation, cents,
      |    GREATEST(LEAST((rn - 1) // 5, ng // 5 - 1), 0) AS cluster
      |  FROM r)
      |SELECT nation, CAST(cluster AS BIGINT) AS cluster,
      |  COUNT(*) AS size,
      |  CAST(SUM(cents + 100000) // COUNT(*) - 100000 AS BIGINT)
      |    AS mean_cents,
      |  CAST(MIN(cents) AS BIGINT) AS lo_cents,
      |  CAST(MAX(cents) AS BIGINT) AS hi_cents
      |FROM cl GROUP BY 1, 2 ORDER BY nation, cluster""".stripMargin

  // --------------------------------------------------- mask_noise
  /** ADDITIVE NOISE MASKING — the third classical numeric-SDC family
    * next to top-coding ([[maskWinsorize]]) and microaggregation
    * ([[maskMicroagg]]): every balance shifts by a bounded
    * pseudo-random amount so no published value is exact, while
    * group aggregates survive because the noise is near-zero-mean.
    * The noise is keyed, salted, and PORTABLE — (md5-hash(salt‖key)
    * mod 2001) − 1000 cents, the [[MaskFunctions.portableHash]]
    * construction — so replicas mask identically (the reference's
    * replica-consistent rule model) and any engine audits the same
    * release. The audit publishes per-nation bias (Σnoise — bounded,
    * near zero) and the max perturbation (exactly ≤ 10.00), the two
    * numbers a disclosure-control review asks for. Map-only + one
    * hash-agg. NOT differential privacy: deterministic keyed noise
    * protects against casual disclosure, not an adversary with the
    * salt — [[maskRandResponse]] is the estimator-grade mechanism. */
  def maskNoise(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val noise = pmod(MaskFunctions.portableHash(
      concat(lit("noise:"), col("c_custkey").cast("string"))),
      lit(2001L)) - 1000L
    Tables.customer(spark, dir).select(col("c_nationkey"),
        (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"), noise.as("noise"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("sum_before"),
        sum(col("cents") + col("noise")).as("sum_after"),
        sum(col("noise")).as("bias_cents"),
        max(abs(col("noise"))).as("max_abs_noise"))
      .reportSort("c_nationkey")
  }

  val maskNoiseSql: String =
    """WITH v AS (
      |  SELECT c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    ('0x'||substr(md5('noise:'||CAST(c_custkey AS VARCHAR)),1,8))
      |      ::BIGINT % 2001 - 1000 AS noise
      |  FROM customer)
      |SELECT c_nationkey, COUNT(*) AS n,
      |  CAST(SUM(cents) AS BIGINT) AS sum_before,
      |  CAST(SUM(cents + noise) AS BIGINT) AS sum_after,
      |  CAST(SUM(noise) AS BIGINT) AS bias_cents,
      |  CAST(MAX(ABS(noise)) AS BIGINT) AS max_abs_noise
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- mask_rank_swap
  /** RANK SWAPPING (Moore 1996 — the SDC method between noise and
    * full shuffle): within each nation, balances are ranked and each
    * value trades places with its rank-NEIGHBOR (odd r ↔ r+1; an
    * unpaired last rank keeps its value), so the marginal
    * distribution is preserved EXACTLY while record linkage breaks,
    * and — unlike [[maskShuffle]]'s full permutation — rank-local
    * statistics (quantiles, correlations against other columns)
    * barely move. Deterministic, no RNG to replay.
    *
    * Scale shape: customers are NOT a bounded axis (150k per SF), so
    * a per-nation `row_number` window would hold |customers|/25 rows
    * per task at any scale. The rank is [[maskShuffle]]'s exact
    * value-rank instead — the SAME
    * [[graft.ops.OrderStats.twoLevelRunningSum]] call with the SAME
    * contiguous shifted-cents shard width (spec-pinned invariant) —
    * and the per-nation size `n` is a broadcast |nations|-row join,
    * not a count window. The swap is one equi-join on
    * (nation, partner rank). */
  def maskRankSwap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
    val sizes = c.groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    val ranked = graft.ops.OrderStats.twoLevelRunningSum(c,
        Seq("c_nationkey"), Seq(expr("(cents + 100000) div 1048576")),
        Seq(col("cents"), col("c_custkey")), lit(1L), "r")
      .join(broadcast(sizes), "c_nationkey")
      .withColumn("partner",
        when(pmod(col("r"), lit(2)) === 1,
          least(col("r") + 1, col("n"))).otherwise(col("r") - 1))
    val vals = ranked.select(col("c_nationkey").as("p_nation"),
      col("r").as("pr"), col("cents").as("p_cents"))
    ranked.join(vals,
        col("c_nationkey") === col("p_nation") &&
          col("partner") === col("pr"))
      .select(col("c_custkey"), col("c_nationkey"),
        col("p_cents").as("swapped_cents"),
        abs(col("p_cents") - col("cents")).as("displacement"))
      .orderBy("c_custkey")
  }

  val maskRankSwapSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM customer),
      |r AS (
      |  SELECT c_custkey, c_nationkey, cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY cents, c_custkey) AS r,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM c),
      |p AS (
      |  SELECT *, CASE WHEN r % 2 = 1 THEN LEAST(r + 1, n)
      |    ELSE r - 1 END AS partner
      |  FROM r)
      |SELECT a.c_custkey, a.c_nationkey,
      |  b.cents AS swapped_cents,
      |  ABS(b.cents - a.cents) AS displacement
      |FROM p a JOIN p b
      |  ON a.c_nationkey = b.c_nationkey AND a.partner = b.r
      |ORDER BY a.c_custkey""".stripMargin

  // ---------------------------------------------- mask_dp_geometric
  /** DIFFERENTIALLY-PRIVATE COUNTS via the two-sided GEOMETRIC
    * (discrete Laplace) mechanism, α = 1/2 (ε = ln 2), in EXACT
    * integer arithmetic: the mechanism's CDF has denominator 3·2¹⁰,
    * so inverse-CDF sampling is a threshold walk over integer
    * boundaries — no `ln`/float whose last bit could differ between
    * engines. Noise is pseudo-random from the portable hash of the
    * released cell (deterministic → oracle-replayable; a production
    * release swaps in a secret salt), truncated at ±10 with the tail
    * folded into the extremes (adds a negligible δ). Per-cell noise
    * means the release stays mergeable the DP way: never re-release
    * finer grains than the noise was drawn at. Both the CASE walk
    * and its SQL mirror are GENERATED from one threshold table, so
    * the engines cannot drift. */
  private val dpTable: Seq[(Long, Long)] = {
    // (cumulative threshold out of 3072, noise k) for k = -10..10;
    // mass(0) = 1024, mass(±m) = 2^(10-m), extremes +1 tail fold
    val masses = (-10 to 10).map { k =>
      val m = if (k == 0) 1024L else 1L << (10 - math.abs(k))
      val tail = if (math.abs(k) == 10) 1L else 0L
      (k.toLong, m + tail)
    }
    masses.scanLeft((0L, 0L)) { case ((cum, _), (k, m)) =>
      (cum + m, k)
    }.tail
  }

  def maskDpGeometric(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n_true"))
    val u = pmod(MaskFunctions.portableHash(
      concat(col("seg"), lit("|dp1"))), lit(3072L))
    val noise = dpTable.foldRight(
        lit(10L): org.apache.spark.sql.Column) {
      case ((thr, k), acc) => when(u < thr, k).otherwise(acc)
    }
    cells.withColumn("noise", noise)
      .select(col("seg"), col("n_true"), col("noise"),
        (col("n_true") + col("noise")).as("n_released"))
      .reportSort("seg")
  }

  val maskDpGeometricSql: String = {
    val uSql = "('0x'||substr(md5(seg || '|dp1'),1,8))::BIGINT % 3072"
    val whens = dpTable.map { case (thr, k) =>
      s"WHEN $uSql < $thr THEN $k"
    }.mkString(" ")
    s"""WITH c AS (
       |  SELECT c_mktsegment AS seg, COUNT(*) AS n_true
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1),
       |n AS (
       |  SELECT seg, n_true,
       |    CAST(CASE $whens ELSE 10 END AS BIGINT) AS noise
       |  FROM c)
       |SELECT seg, n_true, noise, n_true + noise AS n_released
       |FROM n ORDER BY seg""".stripMargin
  }

  // ------------------------------------------------------ mask_pram
  /** PRAM — Post-RAndomization Method (Gouweleeuw et al. 1998), the
    * CATEGORICAL member of the numeric-SDC family
    * ([[maskNoise]]/[[maskWinsorize]]/[[maskMicroagg]] cover the
    * numeric axes): each record's market segment transitions by a
    * known probability matrix P = 0.8·I + 0.05·(J − I) — keep with
    * p=0.8, else uniform over the other four — which is DOUBLY
    * STOCHASTIC, so expected marginals are invariant (the property
    * that lets analysts unbias estimates with P⁻¹). Randomness is
    * the keyed portable hash (mod 1000 threshold walk) — replicas
    * mask identically and the oracle replays the exact permutation.
    * The category list is DERIVED (sorted distinct, a 1-row
    * broadcast array), never hardcoded; "k-th other segment" is pure
    * index arithmetic that skips the own slot. Map-only + one
    * |segments²| hash-agg; the published transition matrix (from,
    * to, n) IS the release audit. */
  // ---------------------------------------- mask_controlled_round
  /** CONTROLLED ROUNDING to base B=10 of the (nation × segment)
    * frequency table — the SDC release technique beside cell
    * suppression ([[maskCellSuppress]]): every published count is a
    * multiple of B (so no cell leaks a small true count), yet the
    * GRAND TOTAL is preserved exactly — naive per-cell rounding
    * drifts the total by O(cells), which lets an attacker difference
    * releases. Method: floor every cell to base, round the grand
    * total once, hand the missing B-increments to the cells with the
    * LARGEST remainders (the q72 largest-remainder engine on the
    * 125-cell contingency frame — bounded: |nations|×|segments| is a
    * dim product, never SF-shaped). Because k ≤ #cells-with-remainder
    * always (Σrem ≤ 9·c), a bumped cell has rem ≥ 1, so every
    * published count stays STRICTLY within B of the truth —
    * R12eOpsSpec pins Σ = rounded-total, the |diff| < B bound, and
    * mod-B cleanliness of every output. */
  def maskControlledRound(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
      .withColumn("fl", expr("n div 10 * 10"))
      .withColumn("rem", expr("n % 10"))
    val tot = cells.agg(
      expr("(SUM(n) + 5) div 10 * 10").as("_t"),
      sum(col("fl")).as("_f"))
    cells.crossJoin(broadcast(tot))
      // constant 125-row frame (dims only) — not the q62/q63 trap
      .withColumn("_rk", row_number().over(
        Window.orderBy(desc("rem"), col("nationkey"), col("segment"))))
      .select(col("nationkey"), col("segment"), col("n"),
        (col("fl") + when(col("_rk") <= expr("(_t - _f) div 10"),
          10L).otherwise(0L)).as("n_pub"))
      .withColumn("diff", col("n_pub") - col("n"))
      .reportSort("nationkey", "segment")
  }

  val maskControlledRoundSql: String =
    """WITH c AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |    c_mktsegment AS segment, COUNT(*) AS n
      |  FROM customer GROUP BY 1, 2),
      |f AS (
      |  SELECT nationkey, segment, n, n // 10 * 10 AS fl, n % 10 AS rem
      |  FROM c),
      |t AS (
      |  SELECT (SUM(n) + 5) // 10 * 10 AS t, SUM(fl) AS sf FROM f),
      |r AS (
      |  SELECT f.*, t.t, t.sf,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, nationkey, segment)
      |      AS rk
      |  FROM f CROSS JOIN t)
      |SELECT nationkey, segment, CAST(n AS BIGINT) AS n,
      |  CAST(fl + CASE WHEN rk <= (t - sf) // 10 THEN 10 ELSE 0 END
      |    AS BIGINT) AS n_pub,
      |  CAST(fl + CASE WHEN rk <= (t - sf) // 10 THEN 10 ELSE 0 END
      |    - n AS BIGINT) AS diff
      |FROM r ORDER BY nationkey, segment""".stripMargin

  def maskPram(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val segs = c.agg(sort_array(collect_set(col("c_mktsegment")))
      .as("segs"))
    c.crossJoin(broadcast(segs))
      .withColumn("u", pmod(MaskFunctions.portableHash(
        concat(lit("pram:"), col("c_custkey").cast("string"))),
        lit(1000L)))
      .withColumn("own", expr("array_position(segs, c_mktsegment)"))
      .withColumn("cand", expr("(u - 800) div 50 + 1"))
      .withColumn("to_idx", expr(
        "CASE WHEN u < 800 THEN own" +
          " WHEN cand >= own THEN cand + 1 ELSE cand END"))
      .withColumn("seg_to",
        expr("element_at(segs, CAST(to_idx AS INT))"))
      .groupBy(col("c_mktsegment").as("seg_from"), col("seg_to"))
      .agg(count(lit(1)).as("n"))
      .reportSort("seg_from", "seg_to")
  }

  val maskPramSql: String =
    """WITH segs AS (
      |  SELECT list_sort(list(DISTINCT c_mktsegment)) AS segs
      |  FROM customer),
      |r AS (
      |  SELECT c_mktsegment,
      |    ('0x'||substr(md5('pram:'||CAST(c_custkey AS VARCHAR)),1,8))
      |      ::BIGINT % 1000 AS u,
      |    list_position(segs.segs, c_mktsegment) AS own,
      |    segs.segs AS segs
      |  FROM customer CROSS JOIN segs),
      |t AS (
      |  SELECT c_mktsegment AS seg_from,
      |    segs[CAST(CASE WHEN u < 800 THEN own
      |      WHEN (u - 800) // 50 + 1 >= own THEN (u - 800) // 50 + 2
      |      ELSE (u - 800) // 50 + 1 END AS INTEGER)] AS seg_to
      |  FROM r)
      |SELECT seg_from, seg_to, COUNT(*) AS n
      |FROM t GROUP BY 1, 2 ORDER BY seg_from, seg_to""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mask_controlled_round" -> (maskControlledRound _),
    "mask_pram" -> (maskPram _),
    "mask_dp_geometric" -> (maskDpGeometric _),
    "mask_rank_swap" -> (maskRankSwap _),
    "mask_vgh_generalize" -> (maskVghGeneralize _),
    "mask_t_closeness" -> (maskTCloseness _),
    "mask_token_collision" -> (maskTokenCollision _),
    "mask_info_loss" -> (maskInfoLoss _),
    "mask_winsorize" -> (maskWinsorize _),
    "mask_noise" -> (maskNoise _),
    "mask_microagg" -> (maskMicroagg _),
    "mask_shuffle" -> (maskShuffle _),
    "mask_cell_suppress" -> (maskCellSuppress _),
    "mask_retention_sweep" -> (maskRetentionSweep _),
    "mask_rand_response" -> (maskRandResponse _),
    "mask_rare_suppress" -> (maskRareSuppress _),
    "mask_encrypt" -> (maskEncrypt _),
    "mask_text_scrub" -> (maskTextScrub _),
    "mask_substitute" -> (maskSubstitute _),
    "mask_generalize" -> (maskGeneralize _),
    "mask_kanonymity" -> (maskKAnonymity _),
    "mask_k_map" -> (maskKMap _),
    "mask_ldiversity" -> (maskLDiversity _),
    "mask_consistent" -> (maskConsistent _),
    "mask_ip" -> (maskIp _),
    "mask_luhn_fpe" -> (maskLuhnFpe _),
    "mask_hex" -> (maskHex _),
    "mask_case" -> (maskCase _),
    "mask_hash" -> (maskHash _),
    "mask_redact" -> (maskRedact _),
    "mask_pseudonym" -> (maskPseudonym _),
    "mask_blur" -> (maskBlur _),
    "mask_dateshift" -> (maskDateShift _),
    "mask_fpe_digits" -> (maskFpe _),
    "mask_fpe_alpha" -> (maskFpeAlpha _),
    "mask_email" -> (maskEmail _),
    "mask_tokenize" -> (maskTokenize _),
    "mask_classified" -> (maskClassified _))

  val oracles: Map[String, String] = Map(
    "mask_controlled_round" -> maskControlledRoundSql,
    "mask_pram" -> maskPramSql,
    "mask_dp_geometric" -> maskDpGeometricSql,
    "mask_rank_swap" -> maskRankSwapSql,
    "mask_vgh_generalize" -> maskVghGeneralizeSql,
    "mask_t_closeness" -> maskTClosenessSql,
    "mask_token_collision" -> maskTokenCollisionSql,
    "mask_info_loss" -> maskInfoLossSql,
    "mask_winsorize" -> maskWinsorizeSql,
    "mask_microagg" -> maskMicroaggSql,
    "mask_noise" -> maskNoiseSql,
    "mask_shuffle" -> maskShuffleSql,
    "mask_cell_suppress" -> maskCellSuppressSql,
    "mask_retention_sweep" -> maskRetentionSweepSql,
    "mask_rand_response" -> maskRandResponseSql,
    "mask_rare_suppress" -> maskRareSuppressSql,
    "mask_encrypt" -> maskEncryptSql,
    "mask_text_scrub" -> maskTextScrubSql,
    "mask_substitute" -> maskSubstituteSql,
    "mask_generalize" -> maskGeneralizeSql,
    "mask_kanonymity" -> maskKAnonymitySql,
    "mask_k_map" -> maskKMapSql,
    "mask_ldiversity" -> maskLDiversitySql,
    "mask_consistent" -> maskConsistentSql,
    "mask_ip" -> maskIpSql,
    "mask_luhn_fpe" -> maskLuhnFpeSql,
    "mask_hex" -> maskHexSql,
    "mask_case" -> maskCaseSql,
    "mask_hash" -> maskHashSql,
    "mask_redact" -> maskRedactSql,
    "mask_pseudonym" -> maskPseudonymSql,
    "mask_blur" -> maskBlurSql,
    "mask_dateshift" -> maskDateShiftSql,
    "mask_fpe_digits" -> maskFpeSql,
    "mask_fpe_alpha" -> maskFpeAlphaSql,
    "mask_email" -> maskEmailSql,
    "mask_tokenize" -> maskTokenizeSql,
    "mask_classified" -> maskClassifiedSql)
}
