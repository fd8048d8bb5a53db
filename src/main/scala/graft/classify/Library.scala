package graft.classify

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A masking/transform rule, as carried by a rules library.
  *
  * Mirrors the reference's rule model (reference:
  * /root/reference/src/main/java/Rule.java:1, RulesLibrary.java:44-52):
  * an `Expression` rule holds a field-expression template with a
  * `${FIELDNAME}` placeholder; a `Set` rule points at a lookup set used
  * for pseudonymization.
  */
final case class Rule(name: String, kind: Rule.Kind, value: String)

object Rule {
  sealed trait Kind
  case object Expression extends Kind
  case object SetRule extends Kind
}

/** A data class: how to recognize a kind of sensitive data.
  *
  * The reference matches a column by name regex, content regex, or
  * set-file membership, with a default rule attached (reference:
  * /root/reference/src/main/java/DataClassLibrary.java:28-77,
  * NameMatcher.java, PatternMatcher.java, SetMatcher.java). Full-regex
  * match semantics (`Matcher.matches()`), not find-anywhere.
  */
final case class DataClass(
    name: String,
    nameMatcher: Option[String] = None,
    pattern: Option[String] = None,
    set: Option[Seq[String]] = None,
    defaultRule: Option[String] = None)

final case class DataClassLibrary(classes: Seq[DataClass], rules: Map[String, Rule]) {
  def ruleFor(dc: DataClass): Option[Rule] = dc.defaultRule.flatMap(rules.get)
}

object Matchers {
  /** Reference `NameMatcher.isMatch` = `Pattern.matcher(col).matches()`:
    * full-string match on the column NAME, driver-side. */
  def nameMatches(regex: String, columnName: String): Boolean =
    columnName.matches(regex)

  /** Reference `PatternMatcher.isMatch` on cell CONTENT, as a codegen'd
    * Column predicate. Anchored to keep `matches()` (full-string)
    * semantics — `rlike` alone is find-anywhere. */
  def contentMatches(c: Column, regex: String): Column =
    c.rlike("^(?:" + regex + ")$")

  /** Reference `SetMatcher.isMatch`: dictionary membership. Small sets
    * inline as a literal array (codegen'd); large set files should join
    * a broadcast Dataset instead — see Classifier.setMatchCounts. */
  def inSet(c: Column, entries: Seq[String]): Column =
    c.isInCollection(entries)
}

/** Built-in library used by the verified queries: recognizers for the
  * synthetic PII the test tables can carry, each with a default rule —
  * the same shape a user would load from XML via [[XmlCompat]]. */
object Libraries {
  val default: DataClassLibrary = DataClassLibrary(
    classes = Seq(
      DataClass("ID", nameMatcher = Some("(?i).*(key|id)$"),
        defaultRule = Some("KeepRule")),
      DataClass("NAME", nameMatcher = Some("(?i).*name$"),
        pattern = Some("""[A-Za-z]+#\d+"""), defaultRule = Some("PseudonymRule")),
      DataClass("EMAIL", pattern = Some("""[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,4}"""),
        defaultRule = Some("HashRule")),
      DataClass("PIN_US", pattern = Some("""\d{3}-\d{2}-\d{4}"""),
        defaultRule = Some("RedactRule")),
      DataClass("POSTAL_CODE_US", pattern = Some("""\d{5}(-\d{4})?"""),
        defaultRule = Some("FpeRule")),
      DataClass("FINANCIAL", nameMatcher = Some("(?i).*(acctbal|totalprice|price)$"),
        defaultRule = Some("BlurRule")),
      DataClass("SEGMENT", nameMatcher = Some("(?i).*segment$"),
        pattern = Some("""[A-Z]+"""), defaultRule = Some("UpperRule")),
      DataClass("DATE", nameMatcher = Some("(?i).*date$"),
        defaultRule = Some("DateShiftRule")),
      DataClass("STATUS", nameMatcher = Some("(?i).*(status|priority)$"),
        defaultRule = Some("KeepRule"))),
    rules = Map(
      "KeepRule" -> Rule("KeepRule", Rule.Expression, "${FIELDNAME}"),
      "PseudonymRule" -> Rule("PseudonymRule", Rule.SetRule, "nation-names"),
      "HashRule" -> Rule("HashRule", Rule.Expression, "sha256(${FIELDNAME})"),
      "RedactRule" -> Rule("RedactRule", Rule.Expression, "redact(${FIELDNAME})"),
      "FpeRule" -> Rule("FpeRule", Rule.Expression, "fpe_digits(${FIELDNAME})"),
      "BlurRule" -> Rule("BlurRule", Rule.Expression, "blur(${FIELDNAME})"),
      "UpperRule" -> Rule("UpperRule", Rule.Expression, "toupper(${FIELDNAME})"),
      "DateShiftRule" -> Rule("DateShiftRule", Rule.Expression, "date_shift(${FIELDNAME})"),
      "EncodeHexRule" -> Rule("EncodeHexRule", Rule.Expression, "encode_hex(${FIELDNAME})"),
      "DecodeHexRule" -> Rule("DecodeHexRule", Rule.Expression, "decode_hex(${FIELDNAME})")))
}
