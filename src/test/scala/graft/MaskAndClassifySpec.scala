package graft

import org.apache.spark.sql.functions._
import graft.mask.{MaskFunctions, MaskQueries, RuleEngine}
import graft.classify._

class MaskAndClassifySpec extends SparkSpec {
  import spark.implicits._

  test("hex encode/decode round-trips") {
    val df = Seq("Alice", "Bob#42", "ünïcode").toDF("v")
    val out = df.select(
      MaskFunctions.decodeHex(MaskFunctions.encodeHex(col("v"))).as("r"))
      .as[String].collect()
    assert(out.toSeq == Seq("Alice", "Bob#42", "ünïcode"))
  }

  test("pseudonym is deterministic and in-set") {
    val set = Seq("x", "y", "z")
    val df = Seq("a", "b", "a", "c").toDF("v")
    val out = df.select(MaskFunctions.pseudonymFromSet(col("v"), set).as("p"))
      .as[String].collect()
    assert(out.forall(set.contains))
    assert(out(0) == out(2)) // same input → same pseudonym
  }

  test("blur stays within magnitude and is deterministic") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = df.select(col("v"),
      MaskFunctions.blurNumber(col("v"), col("v"), 5).as("b"))
      .as[(Double, Double)].collect()
    assert(out.forall { case (v, b) => math.abs(b - v) <= 5 })
    val again = df.select(MaskFunctions.blurNumber(col("v"), col("v"), 5))
      .as[Double].collect()
    assert(out.map(_._2).toSeq == again.toSeq)
  }

  test("fpe preserves non-digit structure") {
    val out = Seq("123-45-6789").toDF("v")
      .select(MaskFunctions.fpeDigits(col("v"))).as[String].head()
    assert(out.matches("""\d{3}-\d{2}-\d{4}"""))
    assert(out != "123-45-6789")
  }

  test("rule engine compiles reference-style templates") {
    val df = Seq("abc").toDF("v")
    val up = RuleEngine.compile("toupper(${FIELDNAME})")(col("v"))
    assert(df.select(up).as[String].head() == "ABC")
    val hexRoundTrip = RuleEngine.compile("decode_hex(${FIELDNAME})")(
      RuleEngine.compile("encode_hex(${FIELDNAME})")(col("v")))
    assert(df.select(hexRoundTrip).as[String].head() == "abc")
  }

  test("rule engine fails closed: unknown templates and empty sets throw") {
    intercept[RuleEngine.UnsafeRuleException] {
      RuleEngine.compile("not_a_function(${FIELDNAME})")
    }
    intercept[RuleEngine.UnsafeRuleException] {
      RuleEngine.compile("free-form garbage")
    }
    intercept[RuleEngine.UnsafeRuleException] {
      RuleEngine.transform(Rule("P", Rule.SetRule, "missing.set"), _ => Seq.empty)
    }
    // explicit pass-through stays available
    val df = Seq("abc").toDF("v")
    assert(df.select(RuleEngine.compile("${FIELDNAME}")(col("v")))
      .as[String].head() == "abc")
  }

  test("classifier tolerates empty tables and libraries without pattern classes") {
    val noPatterns = DataClassLibrary(
      Seq(DataClass("ID", nameMatcher = Some("(?i).*id$"))), Map.empty)
    val df = Seq((1L, "x")).toDF("k", "v")
    assert(new Classifier(noPatterns).contentMatchRates(df, Seq("v")).count() == 0)
    assert(new Classifier(noPatterns).classifyTable(df, Seq("v")).isEmpty)
    val empty = df.limit(0) // 0/0 match rate must not NPE
    assert(new Classifier(Libraries.default).classifyTable(empty, Seq("v")).isEmpty)
  }

  test("classifier matches reference semantics: name OR content, first match wins") {
    val c = new Classifier(Libraries.default)
    assert(c.classifyName("c_name").map(_.name).contains("NAME"))
    assert(c.classifyName("o_orderkey").map(_.name).contains("ID"))
    assert(c.classifyName("something_else").isEmpty)
  }

  test("maskTable leaves unclassified columns untouched") {
    val df = Seq((1L, "Customer#1", "misc")).toDF("c_custkey", "c_name", "note")
    val masked = RuleEngine.maskTable(df, Libraries.default,
      { case "nation-names" => Seq("P1", "P2"); case _ => Seq.empty })
    val row = masked.head()
    assert(row.getLong(0) == 1L)              // ID rule = keep
    assert(Seq("P1", "P2").contains(row.getString(1))) // NAME → pseudonym
    assert(row.getString(2) == "misc")        // unclassified passthrough
  }

  test("content classification masks sensitively-valued columns with innocent names") {
    // "contact" matches no nameMatcher but holds emails → EMAIL → hash
    val df = Seq((1L, "a.user@mail.com", "x"), (2L, "b.user@mail.com", "y"))
      .toDF("c_custkey", "contact", "note")
    val masked = RuleEngine.maskTableByContent(df, Libraries.default)
    val rows = masked.select("contact", "note").as[(String, String)].collect()
    assert(rows.forall { case (c, _) => c.matches("[0-9a-f]{64}") },
      s"contact should be sha256-masked: ${rows.toSeq}")
    assert(rows.map(_._2).sorted.toSeq == Seq("x", "y")) // note untouched
  }

  test("xml compat parses reference-format rule + dataclass libraries") {
    val rulesXml =
      """<?xml version="1.0" encoding="ASCII"?>
        |<rules:RuleLibrary xmlns:rules="http://rules/1.0">
        |  <rules name="UpRule">
        |    <properties fieldRulePropertyType="EXPRESSION" value="toupper(${FIELDNAME})"/>
        |  </rules>
        |  <rules name="SetRule">
        |    <properties fieldRulePropertyType="SET" value="&quot;/sets/names.set&quot; SELECT=ANY"/>
        |  </rules>
        |</rules:RuleLibrary>""".stripMargin
    val dcXml =
      """<?xml version="1.0" encoding="ASCII"?>
        |<dataclass:DataClassLibrary xmlns:dataclass="http://dataclass/1.0">
        |  <dataClasses name="NAME" nameMatcher=".*NAME">
        |    <defaultRule href="lib.rules#UpRule"/>
        |    <matchers details="[A-Za-z]+"/>
        |  </dataClasses>
        |  <dataClasses name="CODE" nameMatcher="">
        |    <defaultRule href="lib.rules#SetRule"/>
        |    <matchers type="FILE" details="/sets/codes.set"/>
        |  </dataClasses>
        |</dataclass:DataClassLibrary>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft-xml")
    val rp = dir.resolve("lib.rules"); val dp = dir.resolve("lib.dataclass")
    java.nio.file.Files.writeString(rp, rulesXml)
    java.nio.file.Files.writeString(dp, dcXml)
    val rules = XmlCompat.parseRules(rp.toString)
    assert(rules("UpRule").kind == Rule.Expression)
    assert(rules("UpRule").value == "toupper(${FIELDNAME})")
    assert(rules("SetRule").kind == Rule.SetRule)
    assert(rules("SetRule").value == "/sets/names.set")
    val classes = XmlCompat.parseDataClasses(dp.toString,
      p => if (p.endsWith("codes.set")) Some(Seq("A1", "B2")) else None)
    assert(classes.map(_.name) == Seq("NAME", "CODE"))
    assert(classes.head.pattern.contains("[A-Za-z]+"))
    assert(classes.head.defaultRule.contains("UpRule"))
    assert(classes(1).set.contains(Seq("A1", "B2")))
  }

  test("Luhn-preserving mask output re-passes the Luhn classifier") {
    import graft.mask.MaskQueries
    import graft.classify.ClassifyQueries
    val out = MaskQueries.maskLuhnFpe(spark, sfDir)
    val checked = out.select(
      ClassifyQueries.luhnValid(org.apache.spark.sql.functions.col("ccn_masked")))
      .collect().map(_.getBoolean(0))
    assert(checked.nonEmpty && checked.forall(identity),
      "every masked card number must stay Luhn-valid")
  }

  test("consistent tokenization preserves referential integrity") {
    // the masked-key join must return exactly the rows the unmasked
    // join returns — token collisions or nondeterminism would break it
    val cust = Tables.customer(spark, sfDir)
    val ords = Tables.orders(spark, sfDir)
    val unmasked = cust.join(ords, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"))
    val masked = cust
      .select(MaskQueries.custToken(col("c_custkey")).as("ct"), col("c_custkey"))
      .join(ords.select(MaskQueries.custToken(col("o_custkey")).as("ot"),
        col("o_orderkey")), col("ct") === col("ot"))
      .select(col("c_custkey"), col("o_orderkey"))
    assert(masked.exceptAll(unmasked).isEmpty && unmasked.exceptAll(masked).isEmpty)
  }

  test("xml compat rejects DOCTYPE declarations (XXE hardening)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xxe")
    val evil = dir.resolve("evil.rules")
    java.nio.file.Files.writeString(evil,
      """<?xml version="1.0"?>
        |<!DOCTYPE r [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
        |<r><rules name="&xxe;"/></r>""".stripMargin)
    intercept[org.xml.sax.SAXParseException] {
      XmlCompat.parseRules(evil.toString)
    }
  }

  test("substitution alphabets are class-preserving permutations") {
    import graft.mask.MaskFunctions.{substitutionDst, substitutionSrc}
    // a permutation of exactly the source alphabet (reversible mask)
    assert(substitutionDst.sorted == substitutionSrc.sorted)
    // character classes survive positionally: lower→lower,
    // digit→digit, upper→upper
    assert(substitutionDst.take(26).forall(_.isLower))
    assert(substitutionDst.slice(26, 36).forall(_.isDigit))
    assert(substitutionDst.drop(36).forall(_.isUpper))
    // uppercase mirrors the lowercase permutation, so case-insensitive
    // matching still works on masked values
    assert(substitutionDst.drop(36) == substitutionDst.take(26).toUpperCase)
  }
}
