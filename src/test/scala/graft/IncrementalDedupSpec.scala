package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Incremental ingest dedup: bloom-split + exact anti join must equal the
  * plain anti join on every batch shape — the bloom only decides which
  * rows get to SKIP the join, never the outcome.
  */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = (1 to 300).map(i => (i.toLong, s"text-$i"))
    .toDF("id", "text")

  test("survivors == plain anti join with planted dups") {
    // 100 genuinely new + 50 clones of corpus texts under new ids
    val incoming = (301 to 400).map(i => (i.toLong, s"text-$i"))
      .toDF("id", "text")
      .unionByName((1 to 50).map(i => (i + 10000L, s"text-$i")).toDF("id", "text"))
    val viaBloom = Dedup.incrementalSurvivors(incoming, corpus, "text",
      expectedItems = 1024, numBits = 1 << 14)
      .select("id").as[Long].collect().toSet
    val plain = incoming.join(corpus.select("text"), Seq("text"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(viaBloom == plain)
    assert(viaBloom == (301L to 400L).toSet) // clones gone, new rows intact
  }

  test("empty corpus: the whole batch is new") {
    val incoming = (1 to 10).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    val surv = Dedup.incrementalSurvivors(
      incoming, corpus.filter(lit(false)), "text",
      expectedItems = 16, numBits = 1 << 10)
    assert(surv.count() == 10L)
  }

  test("all-duplicate batch: nothing survives") {
    val incoming = corpus.limit(40)
      .select(($"id" + 5000).as("id"), $"text")
    val surv = Dedup.incrementalSurvivors(incoming, corpus, "text",
      expectedItems = 1024, numBits = 1 << 14)
    assert(surv.count() == 0L)
  }
}
