package graft

import org.apache.spark.sql.functions._
import graft.core.KeyOrd

/** SURVEY §7 hard-part 3: the engine relies on Spark's sort order agreeing
  * with (a) the reference's unsigned-lexicographic byte comparator
  * (`package.scala:39-42`, Guava UnsignedBytes) and (b) the driver-side
  * [[KeyOrd]] used for manifest file pruning. If either diverged, COW
  * pruning could skip a file that holds a batch key — silent data loss.
  * These tests pin both equivalences.
  */
class OrderingConsistencySpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(99)

  test("Spark BinaryType ordering == unsigned lexicographic (reference comparator)") {
    // include high-bit bytes — the case where SIGNED comparison would flip
    val arrays = Seq.fill(300)(Array.fill(rnd.nextInt(8) + 1)(rnd.nextInt(256).toByte)) ++
      Seq(Array[Byte](0x7f), Array[Byte](0x80.toByte), Array[Byte](0xff.toByte),
        Array[Byte](), Array[Byte](0x00), Array[Byte](0x00, 0x01))
    val sparkSorted = arrays.zipWithIndex.toDF("b", "i")
      .orderBy($"b").select($"i").as[Int].collect().toSeq
    def unsignedCmp(x: Array[Byte], y: Array[Byte]): Int = {
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    val refSorted = arrays.zipWithIndex
      .sortWith((a, b) => unsignedCmp(a._1, b._1) < 0).map(_._2)
    // compare by key content (ties between identical arrays are fine either way)
    val sparkKeys = sparkSorted.map(arrays(_).toSeq)
    val refKeys = refSorted.map(arrays(_).toSeq)
    assert(sparkKeys == refKeys)
  }

  test("KeyOrd (manifest pruning) agrees with Spark sort order per type") {
    def check[T](values: Seq[T], toDf: Seq[(T, Int)] => org.apache.spark.sql.DataFrame): Unit = {
      val indexed = values.zipWithIndex
      val sparkOrder = toDf(indexed).orderBy(col("v")).select(col("i")).as[Int].collect().toSeq
      val keyOrdOrder = indexed.sortWith((a, b) =>
        KeyOrd.compare(Seq(a._1), Seq(b._1)) < 0).map(_._2)
      assert(sparkOrder.map(i => values(i)) == keyOrdOrder.map(i => values(i)),
        s"divergence for ${values.take(3)}...")
    }
    check[Long](Seq.fill(200)(rnd.nextLong()), _.toDF("v", "i"))
    check[Int](Seq.fill(200)(rnd.nextInt()), _.toDF("v", "i"))
    check[Double](Seq.fill(200)(rnd.nextDouble() * 1e6 - 5e5), _.toDF("v", "i"))
    check[String](Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(10) + 1).mkString), _.toDF("v", "i"))
    check[Boolean](Seq.fill(20)(rnd.nextBoolean()), _.toDF("v", "i"))
    check[java.sql.Timestamp](
      Seq.fill(100)(new java.sql.Timestamp(math.abs(rnd.nextLong()) % 4102444800000L)),
      _.toDF("v", "i"))
  }

  test("KeyOrd normalizes java.time literals against manifest java.sql types") {
    // rows collected under spark.sql.datetime.java8API.enabled=true hand
    // back Instant/LocalDate; the toString catch-all would order ISO-8601
    // ('T' separator) vs JDBC-escape (' ') text WRONG — e.g. an Instant
    // above any same-day Timestamp — silently over-pruning probe files
    val ts = java.sql.Timestamp.valueOf("2024-03-15 10:30:00")
    val instEq = ts.toInstant
    val instLt = ts.toInstant.minusSeconds(3600)
    val instGt = ts.toInstant.plusSeconds(3600)
    assert(KeyOrd.compare(Seq(instEq), Seq(ts)) == 0)
    assert(KeyOrd.compare(Seq(instLt), Seq(ts)) < 0)
    assert(KeyOrd.compare(Seq(instGt), Seq(ts)) > 0)
    assert(KeyOrd.compare(Seq(ts), Seq(instGt)) < 0)
    val d = java.sql.Date.valueOf("2024-03-15")
    assert(KeyOrd.compare(Seq(java.time.LocalDate.of(2024, 3, 15)), Seq(d)) == 0)
    assert(KeyOrd.compare(Seq(java.time.LocalDate.of(2024, 3, 14)), Seq(d)) < 0)
    assert(KeyOrd.compare(Seq(java.time.LocalDate.of(2024, 3, 16)), Seq(d)) > 0)
    // normKey canonicalizes to the manifest codec's literal types — a
    // java.time value must never reach anyToJson's toString fallback
    val nk = KeyOrd.normKey(Seq(instEq, java.time.LocalDate.of(2024, 3, 15)))
    assert(nk == Seq(ts, d), s"normKey must yield java.sql literals: $nk")
  }

  test("KeyOrd composite comparison is lexicographic like Spark struct ordering") {
    val pairs = Seq.fill(200)((rnd.nextInt(10).toLong, rnd.alphanumeric.take(3).mkString))
    val indexed = pairs.zipWithIndex.map { case ((a, b), i) => (a, b, i) }
    val sparkOrder = indexed.toDF("a", "b", "i")
      .orderBy(col("a"), col("b")).select(col("i")).as[Int].collect().toSeq
    val keyOrdOrder = indexed.sortWith((x, y) =>
      KeyOrd.compare(Seq(x._1, x._2), Seq(y._1, y._2)) < 0).map(_._3)
    assert(sparkOrder.map(i => pairs(i)) == keyOrdOrder.map(i => pairs(i)))
  }

  test("null key components: scan predicates agree with the KeyOrd model") {
    import graft.core.{KeySpec, OrderedTable}
    // composite (Long?, String?) keys with ~1/4 nulls per component; nulls
    // sort FIRST in Spark asc order and in KeyOrd — the scan predicates
    // (gtKey/ltKey) must select exactly the rows the comparator model says
    def g(i: Int): java.lang.Long = if (rnd.nextInt(4) == 0) null else java.lang.Long.valueOf(rnd.nextInt(6).toLong)
    def s(i: Int): String = if (rnd.nextInt(4) == 0) null else rnd.alphanumeric.take(2).mkString
    val rows = Seq.tabulate(120)(i => (g(i), s(i), i))
    val df = rows.toDF("a", "b", "i")
    val tab = OrderedTable(df, KeySpec(Seq("a", "b")))
    val terms: Seq[Seq[Any]] = Seq(
      Seq(null, null), Seq(null, "a"), Seq(2L, null), Seq(3L, "m"), Seq(0L, "z"))
    for (term <- terms; inclusive <- Seq(true, false)) {
      def model(cmpSign: Int): Set[Int] = rows.collect {
        case (a, b, i) if {
          val c = KeyOrd.compare(Seq(a, b), term)
          (c * cmpSign > 0) || (inclusive && c == 0)
        } => i
      }.toSet
      val gtGot = tab.gt(term, inclusive).select($"i").as[Int].collect().toSet
      assert(gtGot == model(1), s"gt term=$term inclusive=$inclusive")
      val ltGot = tab.lt(term, inclusive).select($"i").as[Int].collect().toSet
      assert(ltGot == model(-1), s"lt term=$term inclusive=$inclusive")
    }
  }

  test("store catalog lists created indexes") {
    import graft.core.{FsSnapshotStore, KVIndex}
    val store = new FsSnapshotStore(tmpDir("graft-cat"), spark)
    assert(store.listIndexes().isEmpty)
    KVIndex.bootstrap(store, "idx-b", Seq(("k", "v")).toDF("k", "v"), Seq("k"))
    KVIndex.bootstrap(store, "idx-a", Seq(("k", "v")).toDF("k", "v"), Seq("k"))
    assert(store.listIndexes() == Seq("idx-a", "idx-b"))
    assert(store.exists("idx-a") && !store.exists("idx-c"))
  }
}
