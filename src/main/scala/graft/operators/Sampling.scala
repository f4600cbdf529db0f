package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: results change with
  * partitioning, task retries, and reruns — useless for reproducible
  * train/val/test splits or auditable corpus mixing. Everything here keys
  * off a content hash of a stable id instead: the same row lands in the
  * same split/sample on every engine, every run, every partitioning, and
  * the operators are pure per-row Column trees (shuffle-free, pushdown-
  * friendly — a split filter prunes at the scan).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform pseudo-random bucket in [0, 1e6) from (id, salt) — the salt
    * decorrelates independent samples over the same ids. */
  def hashBucket(id: Column, salt: String): Column =
    pmod(HashFunctions.hash64(concat(id.cast("string"), lit("#" + salt))),
      lit(Buckets))

  /** Keep ~`fraction` of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.where(hashBucket(col(idCol), salt) < (fraction * Buckets).toLong)
  }

  /** Assign each row a named split by cumulative weight — e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Order matters (it
    * fixes the bucket ranges); weights must sum to 1.
    */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val bucket = hashBucket(col(idCol), salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(w => (w * Buckets).toLong)
    val expr = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(bucket < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Corpus mixing: keep each row with its source's rate — the
    * domain-weighting step of corpus assembly (e.g. wiki ×1.0, web ×0.3).
    * One scan, no union-of-filtered-copies; sources absent from `rates`
    * use `defaultRate`.
    */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0))
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((src, r), rest) => when(col(sourceCol) === src, lit(r)).otherwise(rest)
    }
    df.where(hashBucket(col(idCol), salt) < (rate * Buckets).cast("long"))
  }
}
