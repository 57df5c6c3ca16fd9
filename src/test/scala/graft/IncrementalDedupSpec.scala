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

  // long distinct texts (12 tokens) so a one-token append stays a >=0.9
  // Jaccard near-dup: 3-shingle sets differ by one element
  private def longText(i: Int): String =
    (0 until 12).map(j => s"w${(i * 31 + j * 7) % 997}x$j").mkString(" ")
  private val longCorpus = (1 to 120).map(i => (i.toLong, longText(i)))
    .toDF("id", "text")

  test("incremental near-dup: clones and near-clones dropped, unrelated kept, == batch LSH cross-pairs") {
    val corpusBands = Dedup.bandRows(longCorpus, "id", "text")
    // 40 genuinely new + 30 near-clones (one appended token) + 10 exact clones
    val fresh = (201 to 240).map(i => (i.toLong, longText(i + 1000)))
    val near = (1 to 30).map(i => (i + 20000L, longText(i) + " zz"))
    val exact = (31 to 40).map(i => (i + 30000L, longText(i)))
    val incoming = (fresh ++ near ++ exact).toDF("id", "text")
    val surv = Dedup.incrementalNearDupSurvivors(incoming, corpusBands, "id", "text")
      .select("id").as[Long].collect().toSet
    // exact clones: signature identical, match rate 1.0 — always dropped
    assert(exact.map(_._1).toSet.intersect(surv).isEmpty, "exact clones must drop")
    // near-clones: est_jaccard ~0.9 over 64 hashes, banded collision ~1 —
    // allow 2 misses out of 30 for signature-estimation noise
    val nearKept = near.map(_._1).toSet.intersect(surv)
    assert(nearKept.size <= 2, s"near-clones kept: $nearKept")
    // fresh docs survive (distinct token sets cannot reach 0.5)
    assert(fresh.map(_._1).toSet.subsetOf(surv), "fresh docs must survive")
    // parity with the batch operator's CROSS pairs: a doc is dropped iff
    // minhashLsh over corpus+incoming finds a pair linking it to a corpus id
    val union = longCorpus.unionByName(incoming.toDF("id", "text"))
    val pairs = Dedup.minhashLsh(union, "id", "text")
      .select("idA", "idB").as[(Long, Long)].collect()
    val corpusIds = (1L to 120L).toSet
    val crossDropped = pairs.collect {
      case (a, b) if corpusIds.contains(a) && !corpusIds.contains(b) => b
      case (a, b) if corpusIds.contains(b) && !corpusIds.contains(a) => a
    }.toSet
    val dropped = (fresh ++ near ++ exact).map(_._1).toSet -- surv
    assert(dropped == crossDropped,
      s"incremental vs batch cross-pair mismatch: ${dropped.diff(crossDropped)} / ${crossDropped.diff(dropped)}")
  }

  test("near-dup probe through the KV band index equals the full-scan path") {
    import graft.core._
    val store = new FsSnapshotStore(tmpDir("graft-neardup-kv"), spark)
    val bandDf = Dedup.bandRows(longCorpus, "id", "text")
    val ix = KVIndex.bootstrap(store, "bands", bandDf, Seq("band", "bucket", "id"))
      .fold(e => sys.error(e.message), identity)
    val incoming = ((1 to 10).map(i => (i + 500L, longText(i) + " zz")) ++
      (601 to 620).map(i => (i.toLong, longText(i + 2000)))).toDF("id", "text")
    val probes = Dedup.bandRows(incoming, "id", "text").select("band", "bucket")
      .distinct().collect().map(r => Seq[Any](r.get(0), r.get(1))).toSeq
    val slice = ix.getAllPrefix(probes)
    // the pruned slice is exactly the matching buckets of the full set
    val full = bandDf.join(
      probes.map(p => (p(0).asInstanceOf[Int], p(1).asInstanceOf[Long]))
        .toDF("band", "bucket"), Seq("band", "bucket"), "left_semi")
    assert(slice.select("band", "bucket", "id").collect().toSet ==
      full.select("band", "bucket", "id").collect().toSet)
    // and survivors computed from the pruned slice match the full-scan ones
    val viaKv = Dedup.incrementalNearDupSurvivors(incoming, slice, "id", "text")
      .select("id").as[Long].collect().toSet
    val viaFull = Dedup.incrementalNearDupSurvivors(incoming, ix.df, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(viaKv == viaFull)
    assert((601L to 620L).toSet.subsetOf(viaKv))
  }
}
