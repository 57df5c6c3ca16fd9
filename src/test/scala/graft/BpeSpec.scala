package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** BPE train + encode. The references here are INDEPENDENT
  * implementations: the trainer is a single-threaded pair-count loop over
  * a word-frequency list, and the encoder applies merges sequentially in
  * rank order — provably equivalent to the operator's
  * lowest-rank-pair-first loop (a learned pair can only be created by
  * EARLIER merges, never later ones), but algorithmically different, so
  * agreement is evidence rather than tautology.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def codePoints(w: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  private def mergeLR(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(corpus: Seq[String], numMerges: Int, minCount: Long): Seq[(String, String)] = {
    val wordCnt = corpus.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    var words: Seq[(IndexedSeq[String], Long)] =
      wordCnt.map { case (w, c) => (codePoints(w), c) }
    val out = Seq.newBuilder[(String, String)]
    var n = 0
    var stop = false
    while (n < numMerges && !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pc.isEmpty) stop = true
      else {
        val ((a, b), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minCount) stop = true
        else {
          out += ((a, b)); n += 1
          words = words.map { case (syms, c) => (mergeLR(syms, a, b), c) }
        }
      }
    }
    out.result()
  }

  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = codePoints(word)
    for ((a, b) <- merges) syms = mergeLR(syms, a, b)
    syms
  }

  test("train learns the classic corpus's merges, deterministically") {
    val corpus =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(df, numMerges = 8)
    // ("e","s") covers newest(6)+widest(3)=9, tied with ("s","t") — lex
    // order breaks the tie the same way on both implementations
    assert(merges.head == ("e", "s"))
    assert(merges == refTrain(corpus, 8, 2L), merges.toString)
    assert(Bpe.train(df, numMerges = 8) == merges) // deterministic re-run
  }

  test("train: randomized differential vs the single-threaded reference") {
    val rng = new scala.util.Random(13)
    for (round <- 1 to 3) {
      val alphabet = "abcd"
      val corpus = (0 until 40).map { _ =>
        (0 until (1 + rng.nextInt(3))).map { _ =>
          (0 until (1 + rng.nextInt(6))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val got = Bpe.train(df, numMerges = 12)
      val want = refTrain(corpus, 12, 2L)
      assert(got == want, s"round $round: got $got want $want")
      // the batched selector must be invisible: maxBatch=1 is the exact
      // one-merge-per-job loop, and the default batch must equal it
      assert(Bpe.train(df, numMerges = 12, maxBatch = 1) == want,
        s"round $round: sequential train diverged")
    }
  }

  test("train + encode survive non-BMP text: code-point symbols, no lone surrogates") {
    // astral-plane characters (surrogate pairs in UTF-16): symbols must be
    // whole code points on BOTH the train and encode sides
    val rocket = new String(Character.toChars(0x1F680))  // 🚀
    val ox = new String(Character.toChars(0x1F409))      // 🐉 (caseless, like all emoji)
    val corpus = Seq.fill(6)(s"$rocket${ox}go") ++ Seq.fill(3)(s"$rocket$ox") ++
      Seq.fill(2)(s"go$rocket")
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(df, numMerges = 6)
    assert(merges == refTrain(corpus, 6, 2L), merges.toString)
    // the most frequent pair is the two astral chars adjacent (9 times)
    assert(merges.head == ((rocket, ox)))
    val got = Bpe.encode(df, merges).orderBy("doc_id")
      .as[(Long, Seq[String], Int)].collect()
    for ((id, subwords, _) <- got) {
      val words = corpus(id.toInt).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      assert(subwords == words.flatMap(w => refEncode(w, merges)), s"doc $id")
      // reconstruction means no symbol was split mid-surrogate
      assert(subwords.mkString == words.mkString)
      assert(subwords.forall(s => !s.exists(c => Character.isSurrogate(c) && s.length == 1)))
    }
  }

  test("encode matches rank-order reference; subwords reconstruct the words") {
    val corpus =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val trainDf = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(trainDf, numMerges = 8)
    val docs = Seq(
      (1L, "low lower lowest"),
      (2L, "newest widest news"),
      (3L, "unseen tokens stay charwise"),
      (4L, "")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, merges).orderBy("doc_id")
      .as[(Long, Seq[String], Int)].collect()
    for ((id, subwords, n) <- got) {
      assert(n == subwords.length)
      val words = Seq("low lower lowest", "newest widest news",
        "unseen tokens stay charwise", "")(id.toInt - 1)
        .toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val want = words.flatMap(w => refEncode(w, merges))
      assert(subwords == want, s"doc $id: $subwords vs $want")
      assert(subwords.mkString == words.mkString, "subwords must reconstruct the text")
    }
    // trained merges genuinely compress: fewer subwords than characters
    val lowest = got.find(_._1 == 1L).get._2
    assert(lowest.length < "lowlowerlowest".length)
    assert(got.find(_._1 == 4L).get._3 == 0) // empty doc -> zero subwords
  }

  test("subword counts drive sequence packing end to end") {
    // the scaladoc's claim, executed: encode -> n_subwords -> packSequences
    val corpus = (0 until 200).map(i =>
      (i.toLong, Seq.fill(1 + i % 5)(Seq("low", "lower", "newest", "widest")(i % 4)).mkString(" ")))
    val df = corpus.toDF("doc_id", "text")
    val merges = Bpe.train(df, numMerges = 10)
    val counted = Bpe.encode(df, merges)
    val packed = graft.pipeline.Packing.packSequences(
      counted, "doc_id", "n_subwords", budget = 40L, nBuckets = 4)
    // a pack closes once its running SUBWORD total crosses the budget, so
    // no pack exceeds budget + the largest single document
    val maxDoc = counted.agg(max("n_subwords")).as[Int].head().toLong
    val sums = packed.groupBy("bucket", "pack_id")
      .agg(sum("n_subwords").as("s")).select("s").as[Long].collect()
    assert(sums.nonEmpty && sums.forall(_ < 40L + maxDoc),
      s"overfull pack in ${sums.toSeq}")
    // and subword counts differ from whitespace counts, so the packing is
    // genuinely tokenizer-aware
    val ws = df.join(counted, "doc_id")
      .filter(size(split(col("text"), "\\s+")) =!= col("n_subwords")).count()
    assert(ws > 0)
  }
}
