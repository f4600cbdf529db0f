package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  private val records = Seq(
    // block "x": two near-identical names + one unrelated
    (1L, "Acme Corporation", "x"),
    (2L, "Acme Corporatoin", "x"), // transposition typo
    (3L, "Zenith Holdings", "x"),
    // block "y": a chain a-b, b-c (transitive entity), plus a singleton
    (4L, "Jane Smith", "y"),
    (5L, "Jane Smyth", "y"),
    (6L, "Jane Smythe", "y"),
    (7L, "Robert Jones", "y"),
    // same names as block x but in a different block: must NOT pair
    (8L, "Acme Corporation", "z")
  ).toDF("id", "name", "blk")

  test("pairs form only inside blocks and above the rounded threshold") {
    val pairs = EntityResolution
      .scoredPairs(records, "id", "name", Seq("blk"), minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) })
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(8L) }) // cross-block
    assert(pairs.contains((4L, 5L)) && pairs.contains((5L, 6L)))
  }

  test("entities: transitive closure labels with the min id; singletons self-label") {
    val ents = EntityResolution
      .entities(records, "id", "name", Seq("blk"), minSim = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ents(1L) == 1L && ents(2L) == 1L)
    assert(ents(3L) == 3L)
    assert(ents(4L) == 4L && ents(5L) == 4L && ents(6L) == 4L)
    assert(ents(7L) == 7L)
    assert(ents(8L) == 8L)
    assert(ents.size == 8)
  }

  test("conflictAudit: multi-member entities censused; chained merge conflicts flagged") {
    import org.apache.spark.sql.functions._
    // strong attribute = name length: the Acme pair agrees (16 == 16);
    // the Jane chain 10/10/11 is a chained-merge conflict
    val rows = EntityResolution.conflictAudit(records, "id", "name",
      Seq("blk"), minSim = 0.9, strongCol = length(col("name")))
      .orderBy(col("component"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.toSeq == Seq(
      (1L, 2L, 1L, false), // Acme pair: same length, no conflict
      (4L, 3L, 2L, true))) // Jane chain: two lengths -> over-merge signal
  }

  test("blockMax drops oversized blocks before the self-join") {
    val hot = (1L to 20L).map(i => (i, s"Name$i", "hot")) ++
      Seq((21L, "Alpha Beta", "cold"), (22L, "Alpha Betta", "cold"))
    val df = hot.toDF("id", "name", "blk")
    val pairs = EntityResolution
      .scoredPairs(df, "id", "name", Seq("blk"), minSim = 0.5, blockMax = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a >= 21L && b >= 21L })
  }

  test("prefixLenFor: shortest prefix bringing expected occupancy under target") {
    // sf0.1 customers over 125 nation×segment blocks: occupancy 0.94 → 0
    assert(EntityResolution.prefixLenFor(15000L, 125L) == 0)
    // 10×: occupancy 9.4 → one digit (10 sub-blocks)
    assert(EntityResolution.prefixLenFor(150000L, 125L) == 1)
    // 100×: occupancy 94 → two digits
    assert(EntityResolution.prefixLenFor(1500000L, 125L) == 2)
    // alphabetic names discriminate ~26× per character
    assert(EntityResolution.prefixLenFor(1500000L, 125L, alphabet = 26) == 2)
    assert(EntityResolution.prefixLenFor(416000L, 125L, alphabet = 26) == 1)
    assert(EntityResolution.prefixLenFor(0L, 125L) == 0)
  }

  test("prefixLenFor: exact at every power-of-alphabet boundary (integer rule)") {
    // the class of input the FP ceil(ln/ln) form could flip by one ulp:
    // n exactly at denom·a^k must give k, n+1 must give k+1
    val denom = 125L * 8L // naturalBlocks × default-ish target 8
    var pw = 1L
    for (k <- 0 to 15) {
      assert(EntityResolution.prefixLenFor(denom * pw, 125L,
        targetBlockSize = 8) == k, s"boundary k=$k")
      assert(EntityResolution.prefixLenFor(denom * pw + 1, 125L,
        targetBlockSize = 8) == k + 1, s"boundary+1 k=$k")
      pw *= 10
    }
    // overflow-safe saturation: astronomically large n stays finite
    assert(EntityResolution.prefixLenFor(Long.MaxValue, 1L,
      targetBlockSize = 1) == 19)
  }

  test("phoneticKey: respellings co-key, distinct names separate, degenerate input -> 000") {
    val got = Seq("Smith", "Smyth", "Robert", "Rupert", "Ashcraft",
      "Zenith Holdings", "", "42")
      .toDF("name")
      .select(graft.functions.TextFunctions.phoneticKey(col("name")))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == "S530" && got(1) == "S530") // classic Soundex pair
    assert(got(2) == "R163" && got(3) == "R163")
    // classic Soundex gives A261 (H/W are non-separators there); the
    // simplified key's documented deviation keeps the H-separated 2s
    assert(got(4) == "A226")
    assert(got(5) != got(0)) // unrelated name keys apart
    assert(got(6) == "000" && got(7) == "000") // empty / letterless
  }

  test("multiPassPairs: union of passes, distinct, either-end recall") {
    // pass1 blocks on blkA (finds 1-2 only); pass2 on blkB (finds 4-5
    // only); 5-6 co-block in BOTH passes and must appear exactly once
    val df = Seq(
      (1L, "Acme Corporation", "p", "q1"),
      (2L, "Acme Corporatoin", "p", "q2"),
      (4L, "Jane Smith", "r1", "s"),
      (5L, "Jane Smyth", "r2", "s"),
      (6L, "Jane Smythe", "r2", "s")
    ).toDF("id", "name", "blkA", "blkB")
    val rows = EntityResolution.multiPassPairs(df, "id", "name",
      Seq(Seq("blkA"), Seq("blkB")), minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length) // distinct collapsed
    val pairs = rows.toSet
    assert(pairs.contains((1L, 2L))) // only pass 1 finds it
    assert(pairs.contains((4L, 5L))) // only pass 2 finds it
    assert(pairs.contains((5L, 6L))) // both passes; exactly once
    // the union is EXACTLY what the individual passes find — no more
    val single = Seq(Seq("blkA"), Seq("blkB")).flatMap(cols =>
      EntityResolution.scoredPairs(df, "id", "name", cols, minSim = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1)))).toSet
    assert(pairs == single)
  }
}
