package graft.mask

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The masking/transform function surface: every rule expression the
  * reference's rule libraries use, plus the standard static-masking kit
  * (redact/hash/pseudonym/blur/shift/FPE) it pairs with.
  *
  * All pure `Column → Column` over builtin functions — whole-stage
  * codegen'd, zero UDFs, so a masked write at 100 TB runs at scan
  * speed. Deterministic by construction (hash-derived noise, no RNG) so
  * masking is idempotent and replica-consistent — the property the
  * reference gets from consistent rule application per data class
  * (reference: /root/reference/src/main/java/Main.java:4-6).
  *
  * Seen in the reference's shipped rule library (reference:
  * /root/reference/iriLibrary.rules:230-253): encode_hex, decode_hex,
  * toupper, set-based pseudonyms.
  */
object MaskFunctions {

  // ------------------------------------------------------------ encoding
  /** `encode_hex(${FIELDNAME})`: uppercase hex of the UTF-8 bytes. */
  def encodeHex(c: Column): Column = hex(c.cast("string"))

  /** `decode_hex(${FIELDNAME})`: inverse of [[encodeHex]]. */
  def decodeHex(c: Column): Column = decode(unhex(c), "UTF-8")

  // ---------------------------------------------------------------- case
  def toUpper(c: Column): Column = upper(c)
  def toLower(c: Column): Column = lower(c)

  /** Sentence-case (portable initcap-of-first-char). */
  def proper(c: Column): Column =
    concat(upper(c.substr(lit(1), lit(1))), lower(c.substr(lit(2), length(c))))

  // ------------------------------------------------------------- hashing
  def hashMd5(c: Column): Column = md5(c.cast("string"))
  def hashSha256(c: Column, salt: String = ""): Column =
    sha2(concat(c.cast("string"), lit(salt)), 256)

  /** Portable deterministic 32-bit non-negative hash (md5-prefix as
    * int). Used wherever masking needs a stable per-value number; NOT
    * Spark's `hash()`, which other engines can't reproduce. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast(LongType)

  // ----------------------------------------------------------- redaction
  /** Full redaction preserving length. */
  def redact(c: Column, maskChar: String = "*"): Column =
    repeat(lit(maskChar), length(c).cast("int"))

  /** Partial redaction keeping the last `keep` chars (CCN-style). */
  def redactKeepLast(c: Column, keep: Int, maskChar: String = "*"): Column =
    concat(
      repeat(lit(maskChar), greatest(length(c) - keep, lit(0)).cast("int")),
      c.substr(length(c) - (keep - 1), lit(keep)))

  // ------------------------------------------------------- pseudonymation
  /** Deterministic set-based pseudonym: hash-mod index into the entry
    * list — same value always maps to the same pseudonym, the semantics
    * of the reference's SET rules. Entries inline as an array literal
    * (codegen'd); for big set files join a broadcast Dataset keyed by
    * [[pseudonymIndex]] instead. */
  def pseudonymFromSet(c: Column, entries: Seq[String]): Column =
    element_at(
      array(entries.map(lit): _*),
      (pseudonymIndex(c, entries.size) + 1).cast("int"))

  /** 0-based deterministic index into a set of `size` entries. */
  def pseudonymIndex(c: Column, size: Int): Column =
    pmod(portableHash(c), lit(size.toLong))

  // ---------------------------------------------------------------- blur
  /** Numeric blur: add deterministic noise in [-magnitude, +magnitude],
    * keyed by `key` (so the same row always blurs identically). */
  def blurNumber(c: Column, key: Column, magnitude: Int): Column =
    c + (pmod(portableHash(key), lit(2L * magnitude + 1)) - magnitude)

  /** Date shift by a deterministic number of days in [-maxDays, +maxDays]. */
  def dateShift(c: Column, key: Column, maxDays: Int): Column =
    date_add(c.cast("date"),
      (pmod(portableHash(key), lit(2L * maxDays + 1)) - maxDays).cast("int"))

  // -------------------------------------------------------- tokenization
  /** Vaultless tokenization: replace the value with a fixed-width token
    * derived from its salted digest — referentially consistent,
    * irreversible without the salt dictionary. */
  def tokenize(c: Column, salt: String = "", prefix: String = "TOK_"): Column =
    concat(lit(prefix), upper(substring(hashSha256(c, salt), 1, 16)))

  /** Nullify (suppression masking). */
  def nullOut(c: Column): Column = lit(null).cast("string")

  /** Keep first and last characters, mask the middle. */
  def maskCenter(c: Column, keep: Int = 1, maskChar: String = "*"): Column =
    when(length(c) <= 2 * keep, c).otherwise(concat(
      c.substr(lit(1), lit(keep)),
      repeat(lit(maskChar), (length(c) - 2 * keep).cast("int")),
      c.substr(length(c) - (keep - 1), lit(keep))))

  // --------------------------------------------------- format-preserving
  /** Format-preserving digit substitution: every digit maps through a
    * fixed permutation, all other chars (dashes, spaces) untouched. */
  def fpeDigits(c: Column): Column =
    translate(c, "0123456789", "3456789012")

  /** Structure-preserving email mask: keep first char of the local part
    * and the full domain. */
  def maskEmail(c: Column): Column =
    concat(c.substr(lit(1), lit(1)), lit("***"),
      regexp_extract(c, "(@.*)$", 1))

  // ----------------------------------- temporal repair (CDC ingest path)
  // The reference converts Debezium's numeric temporals to ISO values
  // (reference: /root/reference/src/main/java/DateTimeConversionUtil.java:22-37).

  /** Days since 1970-01-01 → DateType. */
  def epochDayToDate(c: Column): Column =
    date_add(lit("1970-01-01").cast("date"), c.cast("int"))

  /** Microseconds of day → "HH:MM:SS.ffffff" (portable string build —
    * Spark has no time-of-day type). */
  def microsOfDayToTime(c: Column): Column = {
    val us = c.cast(LongType)
    concat(
      lpad((us / 3600000000L).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad((us % 3600000000L / 60000000L).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad((us % 60000000L / 1000000L).cast("long").cast("string"), 2, "0"), lit("."),
      lpad((us % 1000000L).cast("string"), 6, "0"))
  }

  /** Milliseconds since epoch → wall-clock timestamp. NTZ so parquet
    * output is a naive timestamp (matches engines without an
    * instant-typed timestamp; session tz is UTC). */
  def epochMillisToTimestamp(c: Column): Column =
    timestamp_millis(c.cast(LongType))
      .cast(org.apache.spark.sql.types.TimestampNTZType)

  /** Key-derived monoalphabetic substitution alphabets: lowercase
    * permutes within lowercase, digits within digits, and uppercase
    * mirrors the lowercase permutation — so character CLASS, case, and
    * string length survive the mask, and case-insensitive matching
    * still works on masked values. The permutation is a Fisher–Yates
    * shuffle driven by a fixed-seed LCG: a pure compile-time constant,
    * so the oracle SQL (built from the SAME constants) can never
    * drift from the runtime. A keyed variant would derive the seed
    * from a secret; determinism is what makes the mask replica-
    * consistent, as with the reference's rule model. */
  val substitutionSrc: String =
    "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  val substitutionDst: String = {
    def shuffled(chars: String, seed0: Long): String = {
      var seed = seed0
      def next(): Long = {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        seed >>> 17
      }
      val a = chars.toCharArray
      for (i <- a.length - 1 to 1 by -1) {
        val j = math.floorMod(next(), i + 1L).toInt
        val t = a(i); a(i) = a(j); a(j) = t
      }
      new String(a)
    }
    val lower = shuffled("abcdefghijklmnopqrstuvwxyz", 0x6772616674L)
    val digits = shuffled("0123456789", 0x6d61736bL)
    lower + digits + lower.toUpperCase
  }

  /** Format-preserving substitution cipher over [a-zA-Z0-9]; every
    * other character (separators, '#', punctuation) passes through.
    * `translate` is a plain codegen string function — no UDF. */
  def substitute(c: Column): Column =
    translate(c, substitutionSrc, substitutionDst)
}
