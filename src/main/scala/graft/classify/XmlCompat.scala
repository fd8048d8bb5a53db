package graft.classify

import java.io.File
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable

/** Parsers for the reference's XML library formats, so an existing
  * `.rules` / `.dataclass` pair drops straight into this engine.
  *
  * Format (public, observable in the reference's shipped libraries —
  * reference: /root/reference/iriLibrary.rules:1,
  * /root/reference/iriLibrary.dataclass:1):
  *
  *  - RuleLibrary: `<rules name=...>` with `<properties
  *    fieldRulePropertyType="EXPRESSION|SET" value=.../>`
  *  - DataClassLibrary: `<dataClasses name=... nameMatcher=...>` with
  *    `<defaultRule href="...#RuleName"/>` and `<matchers type="FILE"?
  *    details=.../>` (FILE → set membership, else content regex)
  *
  * Implementation is a fresh DOM walk (JDK built-in), not a port of the
  * reference's parser.
  */
object XmlCompat {

  private def elements(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def parseDoc(path: String): Element = {
    // Library files are modeled on external, untrusted content: refuse
    // DOCTYPEs and external entities (XXE / billion-laughs hardening).
    val factory = DocumentBuilderFactory.newInstance()
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature("http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    factory.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    factory.setXIncludeAware(false)
    factory.setExpandEntityReferences(false)
    val doc = factory.newDocumentBuilder().parse(new File(path))
    doc.getDocumentElement.normalize()
    doc.getDocumentElement
  }

  /** Parse a rules library XML → name→Rule map. */
  def parseRules(path: String): Map[String, Rule] = {
    val out = mutable.LinkedHashMap[String, Rule]()
    for (rule <- elements(parseDoc(path), "rules")) {
      val name = rule.getAttribute("name")
      for (prop <- elements(rule, "properties")) {
        prop.getAttribute("fieldRulePropertyType") match {
          case "EXPRESSION" =>
            out(name) = Rule(name, Rule.Expression, prop.getAttribute("value"))
          case "SET" =>
            // the reference strips quote entities + SELECT flags from the
            // set path (reference: RulesLibrary.java:47)
            val v = prop.getAttribute("value")
              .replace("&quot;", "").replace("\"", "")
              .replace(" SELECT=ANY", "")
            out(name) = Rule(name, Rule.SetRule, v)
          case _ => ()
        }
      }
    }
    out.toMap
  }

  /** Parse a data-class library XML. Set-file matchers load entries via
    * `loadSet` (injectable: tests use in-memory sets; production would
    * read the file once on the driver and broadcast). */
  def parseDataClasses(
      path: String,
      loadSet: String => Option[Seq[String]] = _ => None): Seq[DataClass] =
    for (dc <- elements(parseDoc(path), "dataClasses")) yield {
      val name = dc.getAttribute("name")
      val nameMatcher = Option(dc.getAttribute("nameMatcher")).filter(_.nonEmpty)
      val defaultRule = elements(dc, "defaultRule").headOption
        .map(_.getAttribute("href").split("#").last)
      var pattern: Option[String] = None
      var set: Option[Seq[String]] = None
      for (m <- elements(dc, "matchers")) {
        val details = m.getAttribute("details")
        if (m.getAttribute("type") == "FILE") set = loadSet(details)
        else if (details.nonEmpty) pattern = Some(details)
      }
      DataClass(name, nameMatcher, pattern, set, defaultRule)
    }
}
