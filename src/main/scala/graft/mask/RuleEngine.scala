package graft.mask

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import graft.classify.{Classifier, DataClassLibrary, Rule}

/** Compiles rule-library expressions into Column transforms and applies
  * a whole library to a table: classify → resolve default rule → mask.
  *
  * The reference does this per change event by splicing the rule
  * expression into a generated script (reference:
  * /root/reference/src/main/java/Main.java:446-521, SclScript.java);
  * here the rule compiles once into the Catalyst plan and executes
  * codegen'd across the cluster.
  */
object RuleEngine {

  /** Thrown when a rule would silently emit unmasked data: an
    * expression template outside the grammar, an unknown function name,
    * or a SET rule whose set resolves empty. A masking engine must not
    * fail open — pass-through is an explicit `${FIELDNAME}` template,
    * never a fallback. */
  final class UnsafeRuleException(msg: String) extends IllegalArgumentException(msg)

  /** Expression-template grammar: `fn(${FIELDNAME})` — the shape the
    * reference's EXPRESSION rules use. Identity requires the explicit
    * `${FIELDNAME}` template; anything unrecognized throws
    * [[UnsafeRuleException]] rather than passing PII through unmasked. */
  def compile(template: String, setResolver: String => Seq[String] = _ => Seq.empty)
      : Column => Column = {
    val Fn = """(\w+)\(\$\{FIELDNAME\}\)""".r
    template.trim match {
      case "${FIELDNAME}" => identity
      case Fn(name) => name.toLowerCase match {
        case "encode_hex" => MaskFunctions.encodeHex
        case "decode_hex" => MaskFunctions.decodeHex
        case "toupper" => MaskFunctions.toUpper
        case "tolower" => MaskFunctions.toLower
        case "proper" => MaskFunctions.proper
        case "md5" => MaskFunctions.hashMd5
        case "sha256" => MaskFunctions.hashSha256(_)
        case "redact" => MaskFunctions.redact(_)
        case "fpe_digits" => MaskFunctions.fpeDigits
        case "blur" => c => MaskFunctions.blurNumber(c, c, 5)
        case "date_shift" => c => MaskFunctions.dateShift(c, c, 30)
        case other => throw new UnsafeRuleException(
          s"unknown masking function '$other' in rule template '$template'")
      }
      case other => throw new UnsafeRuleException(
        s"rule template '$other' does not match the fn($${FIELDNAME}) grammar")
    }
  }

  /** Transform for a resolved rule: expression rules compile; set rules
    * pseudonymize from the resolved entry list. An empty set is a
    * configuration error (missing/typo'd set file), not a pass-through. */
  def transform(rule: Rule, setResolver: String => Seq[String]): Column => Column =
    rule.kind match {
      case Rule.Expression => compile(rule.value, setResolver)
      case Rule.SetRule =>
        val entries = setResolver(rule.value)
        if (entries.isEmpty) throw new UnsafeRuleException(
          s"SET rule '${rule.name}' resolved no entries from '${rule.value}'")
        else c => MaskFunctions.pseudonymFromSet(c, entries)
    }

  /** Classify a table by column name and apply each matched class's
    * default rule — the reference's end-to-end flow, one declarative
    * select (single pass, no extra shuffle). */
  def maskTable(
      df: DataFrame,
      lib: DataClassLibrary,
      setResolver: String => Seq[String] = _ => Seq.empty): DataFrame =
    applyClasses(df, new Classifier(lib).classifySchema(df).toMap, lib, setResolver)

  /** Like [[maskTable]] but classification also inspects CONTENT (one
    * match-rate scan for unnamed-but-sensitive columns) — the
    * reference's value-OR-name matching. Costs one extra pass over the
    * string columns before the masking select. */
  def maskTableByContent(
      df: DataFrame,
      lib: DataClassLibrary,
      setResolver: String => Seq[String] = _ => Seq.empty,
      threshold: Double = 0.6): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    val verdict = new Classifier(lib).classifyTable(df, stringCols, threshold) ++
      new Classifier(lib).classifySchema(df).toMap
    applyClasses(df, verdict, lib, setResolver)
  }

  private def applyClasses(
      df: DataFrame,
      classes: Map[String, graft.classify.DataClass],
      lib: DataClassLibrary,
      setResolver: String => Seq[String]): DataFrame = {
    val cols = df.schema.fieldNames.toSeq.map { name =>
      classes.get(name).flatMap(lib.ruleFor) match {
        case Some(rule) => transform(rule, setResolver)(col(name)).as(name)
        case None => col(name)
      }
    }
    df.select(cols: _*)
  }
}
