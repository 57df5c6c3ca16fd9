package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{functions => gf}

/** Byte-pair-encoding subword tokenizer — train + encode, the real
  * version of the "token counting" pipeline step (a whitespace/regex
  * token count mis-sizes a training batch whenever the model's tokenizer
  * splits differently; the budget-packing operators deserve counts from
  * an actual subword vocabulary).
  *
  * Train runs DISTRIBUTED over the distinct-word frequency table: one
  * corpus pass builds `(word, count)`, then each merge round is a
  * pair-count aggregate (map-side partials, shuffle on the pair) plus an
  * argmax — only the single winning pair ever reaches the driver. The
  * per-round symbol rewrite is a higher-order-function fold built with
  * the Column API (no SQL-string splicing of corpus-derived symbols).
  * Rounds materialize via `localCheckpoint`, truncating lineage to a
  * leaf each time — the plan stays one rewrite deep instead of
  * `numMerges` deep, and plan rendering stays O(1) per round.
  *
  * At 100 TB: train on a SAMPLE (pass `df.sample(...)` or a `limit`ed
  * frame — vocabulary learning converges long before the corpus is
  * exhausted; this is standard practice), then [[encode]] everywhere:
  * encoding is a single codegen-friendly expression with the merge-rank
  * table riding the (tiny — `numMerges` entries) plan, no shuffle at all.
  */
object Bpe {

  /** Learn up to `numMerges` merges: start from per-word character
    * symbols, repeatedly count adjacent symbol pairs corpus-wide
    * (frequency-weighted) and merge the most frequent pair. Stops early
    * when no pair reaches `minCount`. Ties break lexicographically so
    * training is deterministic across partitionings and engines.
    *
    * Merge rounds are BATCHED: each round collects the top pairs of the
    * corpus-wide count and greedily keeps the longest prefix of that
    * ordering that is provably safe to apply in one rewrite — pairs must
    * be pairwise symbol-disjoint (including fused strings), and a
    * full-table guard rejects any pair whose rank could be overtaken by a
    * pair the earlier merges in the batch create or destroy (a created
    * pair `(x, ab)` can never out-count the pre-merge `(x, a)` it derives
    * from, so bounding by the max count of pairs touching a selected
    * symbol is sound). The result is IDENTICAL to the one-merge-per-round
    * loop — `BpeSpec` pins that against an independent sequential
    * reference — with ~`maxBatch`× fewer Spark jobs.
    */
  def train(df: DataFrame, textCol: String = "text", numMerges: Int = 100,
            minCount: Long = 2L, maxBatch: Int = 8): Seq[(String, String)] = {
    require(numMerges >= 0 && minCount >= 1 && maxBatch >= 1)
    // each round materializes via localCheckpoint, which TRUNCATES the
    // logical lineage to a leaf: a plain persist keeps nesting every prior
    // round's cached plan inside the next plan tree, and the explain
    // string Spark renders per collect grows superlinearly with merge
    // count (OOMs the driver near ~60 merges). The checkpointed blocks are
    // word-table sized (distinct words, not the corpus) and the context
    // cleaner reclaims them once unreferenced.
    var cur = df
      .select(explode(gf.ws_tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(filter(split(col("w"), ""), x => x =!= lit("")).as("sym"), col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
        val pairCounts = cur.filter(size(col("sym")) >= 2)
          .select(posexplode(slice(col("sym"), lit(1), size(col("sym")) - 1))
            .as(Seq("i", "a")), col("sym"), col("cnt"))
          .select(col("a"), element_at(col("sym"), col("i") + 2).as("b"), col("cnt"))
          .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val budget = math.min(maxBatch, numMerges - learned)
          val m = math.min(64, math.max(8, 4 * budget))
          val top = pairCounts
            .orderBy(desc("n"), asc("a"), asc("b")).limit(m).collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          if (!top.headOption.exists(_._3 >= minCount)) exhausted = true
          else {
            val batch = selectBatch(pairCounts, top, budget, minCount)
            merges ++= batch
            learned += batch.length
            cur = cur
              .withColumn("sym", mergePairsColumn(col("sym"), batch))
              .localCheckpoint(true)
          }
      } finally pairCounts.unpersist()
    }
    merges.result()
  }

  /** Greedy safe-prefix selection for one batched round. `top` is the true
    * top-M of the (desc n, asc a, asc b) total order, so everything not in
    * it ranks below everything in it. Selection stops (never skips) at the
    * first pair sharing a symbol with an earlier selection, keeping the
    * prefix property the equivalence proof needs; a second tiny aggregate
    * over the full pair table then truncates the prefix wherever an
    * earlier selection's neighborhood (pairs touching its symbols — the
    * upper bound for anything its merge can create) could reach the
    * candidate's count, or wherever a fused string collides with a
    * pre-existing symbol.
    */
  private def selectBatch(pairCounts: DataFrame, top: Array[(String, String, Long)],
                          budget: Int, minCount: Long): Seq[(String, String)] = {
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val used = scala.collection.mutable.Set.empty[String]
    var stop = false
    for ((a, b, n) <- top if !stop) {
      if (sel.length >= budget || n < minCount ||
          used.contains(a) || used.contains(b) || used.contains(a + b)) stop = true
      else { sel += ((a, b, n)); used ++= Seq(a, b, a + b) }
    }
    var keep = 1
    if (sel.length > 1) {
      // for each selected index j: max count among non-selected pairs that
      // touch {a_j, b_j} ("s"), and existence of any pair touching the
      // fused string a_j+b_j ("f" — a fused/symbol collision breaks the
      // count bound entirely, so any hit truncates)
      val notSel = sel.foldLeft(lit(true)) { case (acc, (a, b, _)) =>
        acc && !(col("a") === lit(a) && col("b") === lit(b))
      }
      def firstIdx(conds: Seq[Column]): Column =
        conds.zipWithIndex.foldRight(lit(null).cast("int")) {
          case ((c, j), els) => when(c, lit(j)).otherwise(els)
        }
      val symIdx = firstIdx(sel.toSeq.map { case (a, b, _) =>
        col("a").isin(a, b) || col("b").isin(a, b) })
      val fusedIdx = firstIdx(sel.toSeq.map { case (a, b, _) =>
        col("a") === lit(a + b) || col("b") === lit(a + b) })
      val guards = pairCounts.filter(notSel)
        .select(explode(array(
          struct(lit("s").as("kind"), symIdx.as("j"), col("n")),
          struct(lit("f").as("kind"), fusedIdx.as("j"), col("n")))).as("e"))
        .select(col("e.kind"), col("e.j"), col("e.n"))
        .filter(col("j").isNotNull)
        .groupBy(col("kind"), col("j")).agg(max(col("n")).as("m"))
        .collect()
      val symMax = guards.collect { case r if r.getString(0) == "s" =>
        r.getInt(1) -> r.getLong(2) }.toMap
      val fusedHit = guards.collect { case r if r.getString(0) == "f" =>
        r.getInt(1) }.toSet
      var guardMax = Long.MinValue
      var broken = false
      var i = 1
      while (i < sel.length && !broken) {
        guardMax = math.max(guardMax, symMax.getOrElse(i - 1, Long.MinValue))
        broken = fusedHit.contains(i - 1) || sel(i)._3 <= guardMax
        if (!broken) { keep = i + 1; i += 1 }
      }
    }
    sel.take(keep).toSeq.map { case (a, b, _) => (a, b) }
  }

  /** One batched merge round as a left-to-right fold: append each symbol,
    * but when the accumulator ends in some selected `a` and the next
    * symbol is its `b`, replace that tail with the fused symbol. The
    * selected pairs are symbol-disjoint, so at most one can match any
    * position and the single scan equals applying them one pass at a
    * time. A reference-carrying kernel ([[MergePairs]], the r20 FusePair
    * stance): the former Column-API `aggregate` fold was interpreted
    * (HOFs are CodegenFallback) and rebuilt the accumulator array per
    * element — O(|word|²) allocation per word, times the pair-chain of
    * `when` branches; the kernel is one linear pass with a map lookup.
    */
  private def mergePairsColumn(sym: Column, pairs: Seq[(String, String)]): Column =
    Shim.col(MergePairs(Shim.expr(sym), pairs))

  /** Encode `textCol` with a trained merge list: per document, whitespace
    * words are each segmented by the standard BPE loop (repeatedly fuse
    * the adjacent pair with the LOWEST merge rank until none applies).
    * Output: `idCol`, `subwords array<string>`, `n_subwords` — the count
    * the packing/budget operators should consume.
    */
  def encode(df: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol),
      Shim.col(BpeEncode(Shim.expr(gf.ws_tokens(col(textCol))), merges)).as("subwords"))
      .withColumn("n_subwords", size(col("subwords")))
}

/** Subword segmentation of a tokenized document (`child` =
  * `array<string>` of whitespace words) under a trained merge-rank
  * table. The rank map is `numMerges` entries riding the plan — small by
  * construction, unlike a data-derived sketch. Interpreted eval inside a
  * codegen'd stage (same stance as `kernels.ShingleHashes`: one call per
  * document in a projection, not a per-pair inner loop).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Split by CODE POINT, not UTF-16 char: training's `split(w, "")` keeps
    * surrogate pairs whole, so encode must too — a char-based split would
    * produce lone-surrogate symbols that never match trained merges and
    * corrupt to replacement bytes in UTF8String.
    */
  private def codePointSyms(word: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  private def encodeWord(word: String): Seq[String] = {
    var syms = codePointSyms(word)
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = IndexedSeq.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val out = Seq.newBuilder[UTF8String]
    var i = 0
    while (i < arr.numElements()) {
      val w = arr.getUTF8String(i)
      if (w != null && w.numBytes() > 0)
        encodeWord(w.toString).foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        ((org.apache.spark.sql.catalyst.expressions.UnaryExpression) $ref).nullSafeEval($a);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

/** One batched BPE merge round over a symbol array (`child` =
  * `array<string>`): the left-to-right fold [[Bpe.train]] describes —
  * append each symbol, except that when the output so far ends in a
  * selected pair's `a` and the next symbol is its `b`, that tail
  * becomes `a + b`. The pairs are symbol-disjoint by construction, so
  * at most one can match any position and the map lookup is exact.
  * Identical semantics to the Column-API `aggregate` fold it replaced
  * (BpeSpec's sequential-reference differential still pins train
  * end-to-end); one linear pass instead of a per-element accumulator
  * rebuild. Interpreted eval inside a codegen'd stage, the
  * [[BpeEncode]] stance.
  */
case class MergePairs(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val fusedOf: Map[(UTF8String, UTF8String), UTF8String] =
    pairs.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b)) ->
        UTF8String.fromString(a + b)
    }.toMap

  override def nullSafeEval(syms: Any): Any = {
    val arr = syms.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var len = 0
    var i = 0
    while (i < n) {
      val x = arr.getUTF8String(i)
      val fused =
        if (len == 0 || x == null) null
        else fusedOf.getOrElse(
          (out(len - 1).asInstanceOf[UTF8String], x), null)
      if (fused != null) out(len - 1) = fused
      else { out(len) = x; len += 1 }
      i += 1
    }
    new GenericArrayData(
      if (len == n) out else java.util.Arrays.copyOf(out, len))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mergePairsExpr", this)
    nullSafeCodeGen(ctx, ev, s => {
      s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        ((org.apache.spark.sql.catalyst.expressions.UnaryExpression) $ref).nullSafeEval($s);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): MergePairs =
    copy(child = c)
}
