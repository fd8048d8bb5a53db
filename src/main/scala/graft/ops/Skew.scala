package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for pathological join keys at scale.
  *
  * AQE's skew-join split handles most cases at runtime; this helper is
  * for the planned-ahead case — a known hot key set where the build
  * side can be replicated: the skewed (large) side gets a random-free
  * deterministic salt derived from a row fingerprint, the small side is
  * exploded across all salt values, and the join key becomes
  * (key, salt). Work per reducer drops by ~`salts` for the hot keys.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of a fingerprint column —
    * never a RNG, so retries/replays partition identically. */
  def salt(fingerprint: Column, salts: Int): Column =
    pmod(xxhash64(fingerprint), lit(salts.toLong)).cast("int")

  /** Salted equi-join: `big` is salted by `fingerprint`; `small` is
    * replicated `salts` times. Semantics identical to
    * `big.join(small, keys)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      fingerprint: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(fingerprint, salts))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
