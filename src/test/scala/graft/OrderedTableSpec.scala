package graft

import scala.collection.immutable.TreeMap
import org.apache.spark.sql.functions._
import graft.core.{KeySpec, OrderedTable}

/** Port of the reference's randomized differential range-query test
  * (`QueriesRandomSpec.scala:289-508`): every read operator checked against
  * slices of an in-memory sorted model, with random inclusivity × reverse,
  * over string keys whose first 3 chars act as the prefix and the rest as
  * the term (reference `QueriesRandomSpec.scala:32-33,78,276-287`) —
  * modeled as two key columns (SURVEY §1.4: prefix comparator = leading
  * column equality).
  */
class OrderedTableSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def randKey(): String =
    (1 to 10).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // dense → collisions

  // model: full key -> value over (prefix, term) split
  private val model: TreeMap[String, String] = {
    val m = (1 to 800).map { i => randKey() -> s"v$i" }
    TreeMap(m: _*) // later wins like upsert; fine for reads
  }
  private lazy val table = {
    val df = model.toSeq.map { case (k, v) => (k.take(3), k.drop(3), v) }
      .toDF("prefix", "term", "value")
    OrderedTable(df, KeySpec("prefix", "term"))
  }

  private def got(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(concat($"prefix", $"term")).as[String].collect().toSeq

  private def keys: Seq[String] = model.keys.toSeq // sorted

  test("inOrder / reverse match sorted model") {
    assert(got(table.inOrder()) == keys)
    assert(got(table.reverseScan()) == keys.reverse)
  }

  test("get / nextKey / previousKey") {
    val k = keys(100)
    assert(got(table.get(Seq(k.take(3), k.drop(3)))) == Seq(k))
    assert(got(table.nextKey(Seq(k.take(3), k.drop(3)))) == Seq(keys(101)))
    assert(got(table.previousKey(Seq(k.take(3), k.drop(3)))) == Seq(keys(99)))
    // absent probe key still seeks correctly (probe split on the 3/7
    // prefix/term boundary so composite order == concatenated order)
    val probe = "abm" + "m" * 7
    val expNext = keys.find(_ > probe).toSeq
    assert(got(table.nextKey(Seq(probe.take(3), probe.drop(3)))) == expNext)
  }

  test("head / tail / topK") {
    assert(got(table.head(17)) == keys.take(17))
    assert(got(table.tail(17)) == keys.reverse.take(17))
    assert(got(table.topK(5, reverse = true)) == keys.reverse.take(5))
  }

  test("gt / lt with random inclusivity and reverse — 40 rounds") {
    (1 to 40).foreach { _ =>
      val k = keys(rnd.nextInt(keys.size))
      val (p, t) = (k.take(3), k.drop(3))
      val inc = rnd.nextBoolean(); val rev = rnd.nextBoolean()
      val expGt = keys.filter(x => if (inc) x >= k else x > k)
      val expLt = keys.filter(x => if (inc) x <= k else x < k)
      assert(got(table.gt(Seq(p, t), inc, rev)) == (if (rev) expGt.reverse else expGt))
      assert(got(table.lt(Seq(p, t), inc, rev)) == (if (rev) expLt.reverse else expLt))
    }
  }

  test("range with per-bound inclusivity — 40 rounds") {
    (1 to 40).foreach { _ =>
      val i = rnd.nextInt(keys.size - 1)
      val j = i + rnd.nextInt(keys.size - i)
      val (from, to) = (keys(i), keys(j))
      val (incF, incT, rev) = (rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean())
      val exp = keys.filter { x =>
        (if (incF) x >= from else x > from) && (if (incT) x <= to else x < to)
      }
      val res = got(table.range(Seq(from.take(3), from.drop(3)),
        Seq(to.take(3), to.drop(3)), incF, incT, rev))
      assert(res == (if (rev) exp.reverse else exp))
    }
  }

  test("range asserts to >= from like the reference") {
    intercept[IllegalArgumentException] {
      table.range(Seq("zzz", "x"), Seq("aaa", "x"), incFrom = true, incTo = true)
    }
  }

  test("prefix and prefix-constrained gt/lt — all prefixes") {
    model.keys.map(_.take(3)).toSeq.distinct.take(10).foreach { p =>
      val expP = keys.filter(_.startsWith(p))
      assert(got(table.prefix(Seq(p))) == expP)
      assert(got(table.prefix(Seq(p), reverse = true)) == expP.reverse)
      if (expP.nonEmpty) {
        val term = expP(rnd.nextInt(expP.size))
        val inc = rnd.nextBoolean()
        val expGt = expP.filter(x => if (inc) x >= term else x > term)
        val expLt = expP.filter(x => if (inc) x <= term else x < term)
        assert(got(table.prefixGt(Seq(p), Seq(term.take(3), term.drop(3)), inc)) == expGt)
        assert(got(table.prefixLt(Seq(p), Seq(term.take(3), term.drop(3)), inc)) == expLt)
      }
    }
  }

  test("getAll multi-get with mustFindAll error path (reference GetMultipleKeysSpec)") {
    val present = Seq(keys(3), keys(30), keys(300))
    val keysDf = present.map(k => (k.take(3), k.drop(3))).toDF("prefix", "term")
    val r = table.getAll(keysDf, mustFindAll = true)
    assert(r.success && r.missing == 0)
    assert(got(r.found.orderBy($"prefix", $"term")).sorted == present.sorted)

    val withPhantom = (present :+ ("zz" + "q" * 8)).map(k => (k.take(3), k.drop(3)))
      .toDF("prefix", "term")
    val r2 = table.getAll(withPhantom, mustFindAll = true)
    assert(!r2.success && r2.missing == 1)
    assert(r2.error.exists(_.code == "KEY_NOT_FOUND"))
  }

  test("scanWhere arbitrary predicate pushdown scan") {
    val exp = model.collect { case (k, v) if v.endsWith("7") => k }.toSeq
    assert(got(table.scanWhere($"value".endsWith("7"))) == exp)
  }

  test("minKey / maxKey / countAll") {
    assert(got(table.minKey()) == Seq(keys.head))
    assert(got(table.maxKey()) == Seq(keys.last))
    assert(table.countAll() == model.size)
  }

  test("keyset pagination: resumed pages concatenate to the full scan") {
    val pageSize = 50
    var page = got(table.head(pageSize))
    val all = Seq.newBuilder[String]
    var guard = 0
    while (page.nonEmpty && guard < 100) {
      all ++= page
      val last = page.last
      page = got(table.asc(Seq(last.take(3), last.drop(3)), inclusive = false)
        .limit(pageSize))
      guard += 1
    }
    assert(all.result() == keys)
  }

  test("toLocalIterator streams the ordered scan like the reference's async iterator") {
    val it = table.inOrder()
      .select(concat($"prefix", $"term")).toLocalIterator()
    val streamed = Seq.newBuilder[String]
    while (it.hasNext) streamed += it.next().getString(0)
    assert(streamed.result() == keys)
  }

  test("pull iterator streams rows in key order with early stop and seek") {
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(8)
    val tab = OrderedTable(df, KeySpec(Seq("k")))
    // early stop: take(5) must not require materializing the whole scan
    val first5 = tab.pullIterator().take(5).map(_.getLong(0)).toSeq
    assert(first5 == Seq(1L, 2L, 3L, 4L, 5L))
    // seek resumes AFTER the given key (exclusive), like iterator resume
    val afterSeek = tab.pullIterator(seek = Some(Seq(495L))).map(_.getLong(0)).toSeq
    assert(afterSeek == Seq(496L, 497L, 498L, 499L, 500L))
    // reverse + predicate pushdown compose
    val rev = tab.pullIterator(pred = col("k") <= 10, reverse = true)
      .take(3).map(_.getLong(0)).toSeq
    assert(rev == Seq(10L, 9L, 8L))
  }

  test("empty table: every operator returns empty, none throws") {
    val empty = OrderedTable(table.df.limit(0), table.key)
    assert(empty.inOrder().count() == 0)
    assert(empty.get(Seq("abc", "defghij")).count() == 0)
    assert(empty.nextKey(Seq("abc", "defghij")).count() == 0)
    assert(empty.previousKey(Seq("abc", "defghij")).count() == 0)
    assert(empty.head(5).count() == 0 && empty.tail(5).count() == 0)
    assert(empty.range(Seq("aaa", "a"), Seq("zzz", "z"), incFrom = true, incTo = true).count() == 0)
    assert(empty.prefix(Seq("abc")).count() == 0)
    assert(empty.minKey().count() == 0 && empty.maxKey().count() == 0)
    assert(empty.countAll() == 0)
    val r = empty.getAll(Seq(("abc", "defghij")).toDF("prefix", "term"), mustFindAll = true)
    assert(!r.success && r.missing == 1)
  }
}
