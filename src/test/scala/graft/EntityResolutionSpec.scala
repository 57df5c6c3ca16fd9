package graft

import graft.dedup.EntityResolution
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  test("candidates: multi-key blocking unions keys, dedupes pairs, skips nulls") {
    val df = Seq(
      (1L, Some("abc"), Some("xx")),
      (2L, Some("abc"), Some("xx")), // meets 1 via BOTH keys -> one pair
      (3L, Some("zzz"), Some("xx")), // meets 1,2 via key2 only
      (4L, None, Some("yy")),        // null key1 never blocks
      (5L, Some("qqq"), None)
    ).toDF("id", "k1", "k2")
    val cand = EntityResolution.candidates(df, "id", Seq(col("k1"), col("k2")))
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("resolve: typo clusters with a transitive chain close into one entity") {
    // A(10)~B(11) and B(11)~C(12) match pairwise but A~C is 2 edits —
    // the entity must still close transitively to min id 10
    val df = Seq(
      (10L, "aaaa", 5),
      (11L, "aaab", 5), // 1 edit from A
      (12L, "aabb", 5), // 1 edit from B, 2 edits from A
      (20L, "jones", 5),
      (21L, "jonez", 5),
      (30L, "brown", 7)
    ).toDF("id", "name", "grp")
    val resolved = EntityResolution.resolve(df, "id",
      Seq(col("grp")),
      (l, r) => levenshtein(l.getField("name"), r.getField("name")) <= 1 &&
        l.getField("grp") === r.getField("grp"))
    val ent = resolved.select("id", "entity").as[(Long, Long)].collect().toMap
    assert(ent(10L) == 10L && ent(11L) == 10L && ent(12L) == 10L)
    assert(ent(20L) == 20L && ent(21L) == 20L)
    assert(ent(30L) == 30L, "unlinked record is its own singleton entity")
  }

  test("survivorship: golden record per entity via plain groupBy") {
    val df = Seq(
      (1L, "acme corp", 100.0),
      (2L, "acme corp.", 250.0),
      (9L, "other", 5.0)
    ).toDF("id", "name", "rev")
    val resolved = EntityResolution.resolve(df, "id",
      Seq(substring(col("name"), 1, 4)),
      (l, r) => levenshtein(l.getField("name"), r.getField("name")) <= 2)
    val golden = resolved.groupBy("entity")
      .agg(count(lit(1)).as("n"), min_by(col("name"), col("id")).as("name"),
        max(col("rev")).as("rev"))
      .orderBy("entity")
      .as[(Long, Long, String, Double)].collect()
    assert(golden.toSeq == Seq((1L, 2L, "acme corp", 250.0), (9L, 1L, "other", 5.0)))
  }

  test("blocking is an equi-join: no all-pairs blowup across blocks") {
    // 100 records in 50 distinct blocks of 2: exactly 50 candidate pairs
    val df = (0 until 100).map(i => (i.toLong, s"blk${i / 2}")).toDF("id", "k")
    val cand = EntityResolution.candidates(df, "id", Seq(col("k")))
    assert(cand.count() == 50L)
  }

  test("hot-block cap: a degenerate key value is dropped, reported, and " +
       "leaves the non-degenerate records' resolution unchanged") {
    // 10^4 records share one placeholder blocking value (the
    // blank-but-not-null failure mode) — uncapped that block alone is
    // ~5*10^7 candidate pairs before any match predicate runs.
    val degenerate = (0 until 10000).map(i => (i.toLong, "PLACEHOLDER"))
    val normal = Seq((20000L, "blkA"), (20001L, "blkA"), (20002L, "blkB"),
      (20003L, "blkB"), (20004L, "blkC"))
    val df = (degenerate ++ normal).toDF("id", "k")
    val rep = EntityResolution.candidatesWithReport(df, "id", Seq(col("k")),
      maxBlockSize = 100)
    val cand = rep.candidates.as[(Long, Long)].collect().toSet
    assert(cand == Set((20000L, 20001L), (20002L, 20003L)),
      "only the bounded blocks' pairs survive")
    val dropped = rep.droppedBlocks
      .as[(Int, String, Long)].collect().toSeq
    assert(dropped == Seq((0, "PLACEHOLDER", 10000L)),
      "the dropped block's key and mass are reported")
  }

  test("empty-string block keys never block (substring-past-end failure mode)") {
    val df = Seq((1L, ""), (2L, ""), (3L, "x"), (4L, "x")).toDF("id", "k")
    val cand = EntityResolution.candidates(df, "id", Seq(col("k")))
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((3L, 4L)))
  }

  test("goldenRecords: newest / longest / most-frequent survivorship with " +
       "deterministic greater-value tie-breaks") {
    import EntityResolution.Survivorship._
    val resolved = Seq(
      // entity 1: ts ties on 5 (newest tie -> greater value "b2");
      //           lengths tie at 4 (longest tie -> greater "name");
      //           frequency ties 2-2 (modal tie -> greater "y")
      (1L, "abcd", "b1", 5L, "x"),
      (1L, "name", "b2", 5L, "x"),
      (1L, "ab", "a0", 3L, "y"),
      (1L, "abc", "a1", 4L, "y"),
      // entity 2: singleton
      (2L, "solo", "s1", 9L, "z")
    ).toDF("entity", "nm", "code", "ts", "seg")
    val golden = EntityResolution.goldenRecords(resolved, "entity",
      Seq("code" -> Newest("ts"), "nm" -> Longest, "seg" -> MostFrequent))
      .orderBy("entity")
      .as[(Long, Long, String, String, String)].collect().toSeq
    assert(golden == Seq((1L, 4L, "b2", "name", "y"), (2L, 1L, "s1", "solo", "z")))
  }
}
