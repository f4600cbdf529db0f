package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * `hash64` takes the top 15 hex digits (60 bits) of md5 — the same value is
  * computable in any engine with an md5 function, which makes every operator
  * built on it (MinHash, SimHash, band buckets, fingerprints) verifiable
  * against an external SQL oracle and stable across Spark versions (unlike
  * `hash()`/`xxhash64`, whose seeds are engine-internal).
  *
  * All of this is Column-tree (codegen'd md5 + conv) — no UDF.
  */
object HashFunctions {

  /** 60-bit non-negative hash of a string column. Computed by the native
    * [[Md5Hash64]] expression — same value as
    * `conv(substring(md5(c), 1, 15), 16, 10)`, one codegen'd step. */
  def hash64(c: Column): Column = Md5Hash64(c)

  /** Seeded variant: independent hash families for MinHash rows. */
  def hash64(c: Column, seed: Int): Column =
    hash64(concat_ws(":", lit(seed.toString), c))

  /** JVM-side twin of [[hash64]] for driver/executor Scala code (LSH
    * hyperplanes, stub decoders): identical md5-top-60-bit derivation, so
    * Column-tree, JVM, and external-SQL computations all agree. */
  def hash64Jvm(s: String): Long = {
    val hex = md5HexJvm(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def md5HexJvm(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Content fingerprint: md5 hex of whitespace-normalized, lower-cased text
    * (reference stores no fingerprint; this is the dedup-key normalization
    * a training-data pipeline needs — stable under case/whitespace noise).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))
}
