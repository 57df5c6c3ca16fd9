package graft

import org.apache.spark.sql.functions._
import graft.core._

/** Randomized differential test of the manifest-pruned, exchange-free
  * snapshot read surface against the declarative [[OrderedTable]] model —
  * the style of the reference's `QueriesRandomSpec`: many random probes,
  * every result compared to an oracle on the same data. Seeded, so a
  * failure is a repro.
  *
  * Probes deliberately include keys that sit exactly ON file min/max
  * boundaries, absent keys between files, and terms outside the key range
  * — the places where the manifest pruning comparisons could be off by
  * one file.
  */
class RandomizedReadSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  private def randomIndex(store: SnapshotStore, id: String): (KVIndex, OrderedTable) = {
    // sparse keys: gaps guarantee "between files" and "absent key" probes
    val keys = (1 to 400).filter(_ => rnd.nextDouble() < 0.6)
    val df = keys.map(i => (f"k$i%04d", s"v$i")).toDF("k", "v")
    var ix = KVIndex.bootstrap(store, id, df, Seq("k"),
      maxRowsPerFile = 16 + rnd.nextInt(48)).fold(e => fail(e.message), identity)
    // a COW upsert over a random slice: leaves a rewritten + untouched mix
    val lo = 1 + rnd.nextInt(300)
    val batch = (lo to lo + 40).filter(keys.contains)
      .map(i => (f"k$i%04d", s"V$i")).toDF("k", "v")
    if (batch.count() > 0)
      ix = new KVIndex(store, ix.execute(Seq(Command.Insert(batch, upsert = true))).orThrow)
    (ix, ix.table)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.select("k", "v").collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("random probes: stitched snapshot reads == OrderedTable model (seeded)") {
    val store = new FsSnapshotStore(tmpDir("graft-rand"), spark)
    for (round <- 1 to 3) {
      val (ix, table) = randomIndex(store, s"r$round")
      val bounds = ix.manifest.files.flatMap(f => Seq(f.min, f.max))
      def probe(): Seq[Any] =
        if (rnd.nextBoolean() && bounds.nonEmpty) bounds(rnd.nextInt(bounds.size))
        else Seq[Any](f"k${rnd.nextInt(450)}%04d" + (if (rnd.nextBoolean()) "" else "x"))

      for (_ <- 1 to 12) {
        val (a, b) = (probe(), probe())
        val (from, to) = if (KeyOrd.compare(a, b) <= 0) (a, b) else (b, a)
        val (incF, incT, rev) = (rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean())
        assert(rows(ix.range(from, to, incF, incT, rev)) ==
               rows(table.range(from, to, incF, incT, rev)),
          s"range($from,$to,$incF,$incT,$rev) round $round")
        val t = probe()
        val inc = rnd.nextBoolean()
        assert(rows(ix.gt(t, inc, rev)) == rows(table.gt(t, inc, rev)), s"gt($t,$inc,$rev)")
        assert(rows(ix.lt(t, inc, rev)) == rows(table.lt(t, inc, rev)), s"lt($t,$inc,$rev)")
        assert(rows(ix.nextKey(t)) == rows(table.nextKey(t)), s"nextKey($t)")
        assert(rows(ix.previousKey(t)) == rows(table.previousKey(t)), s"previousKey($t)")
        assert(rows(ix.get(t)) == rows(table.get(t)), s"get($t)")
      }
      assert(rows(ix.inOrdered()) == rows(table.inOrder()), s"inOrdered round $round")
      assert(rows(ix.headOrdered(17)) == rows(table.head(17)), s"head round $round")
      assert(rows(ix.headOrdered(17, reverse = true)) == rows(table.tail(17)), s"tail round $round")
    }
  }
}
