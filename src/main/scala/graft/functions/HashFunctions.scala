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
    * hyperplanes, stub decoders, the batched embedder seam): identical
    * md5-top-60-bit derivation, so Column-tree, JVM, and external-SQL
    * computations all agree.
    *
    * Hot-path form: the first 15 hex digits are the first 8 digest bytes
    * read big-endian shifted right one nibble — no hex string is built
    * and no Long.parseLong runs (the string round-trip made the embed
    * seam 3× slower than the codegen'd Column twin at sf0.1). The digest
    * instance is thread-cached: MessageDigest.getInstance is a provider
    * lookup per call.
    */
  def hash64Jvm(s: String): Long = {
    val d = localMd5.get()
    d.reset()
    val b = d.digest(s.getBytes("UTF-8"))
    (((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
      ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
      ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)) >>> 4
  }

  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  def md5HexJvm(bytes: Array[Byte]): String = {
    val d = localMd5.get()
    d.reset()
    bytesToHex(d.digest(bytes))
  }

  /** Lowercase hex of a byte array — matches DuckDB `lower(hex(blob))`,
    * so byte-level features (perceptual shingle sketches) are verifiable
    * against an external SQL oracle. */
  def bytesToHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Content fingerprint: md5 hex of whitespace-normalized, lower-cased text
    * (reference stores no fingerprint; this is the dedup-key normalization
    * a training-data pipeline needs — stable under case/whitespace noise).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))
}
