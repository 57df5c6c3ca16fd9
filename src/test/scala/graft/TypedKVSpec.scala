package graft

import graft.core.{KV, TypedKV}

/** Typed wrapper: compile-time-checked key/value types over the same
  * plans as OrderedTable.
  */
class TypedKVSpec extends SparkSuite {
  import spark.implicits._

  private lazy val kv = TypedKV.fromPairs(
    (1 to 100).map(i => (f"k$i%03d", i)).toDS(), version = "v1")

  test("typed get / range / neighbors / scans") {
    assert(kv.get("k042").collect().toSeq == Seq(KV("k042", 42, "v1")))
    assert(kv.nextKey("k042").head().key == "k043")
    assert(kv.previousKey("k042").head().key == "k041")
    assert(kv.head(3).collect().map(_.key).toSeq == Seq("k001", "k002", "k003"))
    assert(kv.tail(2).collect().map(_.value).toSeq == Seq(100, 99))
    assert(kv.range("k010", "k012").collect().map(_.value).toSeq == Seq(10, 11, 12))
    assert(kv.gt("k098", inclusive = false).collect().map(_.key).toSeq ==
      Seq("k099", "k100"))
    assert(kv.count() == 100)
    // typed transforms compose downstream
    val doubled = kv.inOrder().map(r => r.value * 2).head()
    assert(doubled == 2)
  }
}
