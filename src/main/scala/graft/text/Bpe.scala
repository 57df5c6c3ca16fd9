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
  * Rounds persist/unpersist pointer-style like `Dedup.clusters`, so the
  * plan stays one rewrite deep instead of `numMerges` deep.
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
    */
  def train(df: DataFrame, textCol: String = "text", numMerges: Int = 100,
            minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0 && minCount >= 1)
    val words = df
      .select(explode(gf.ws_tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(filter(split(col("w"), ""), x => x =!= lit("")).as("sym"), col("cnt"))
    var cur = words.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cur.count()
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    try {
      while (learned < numMerges && !exhausted) {
        val top = cur.filter(size(col("sym")) >= 2)
          .select(posexplode(slice(col("sym"), lit(1), size(col("sym")) - 1))
            .as(Seq("i", "a")), col("sym"), col("cnt"))
          .select(col("a"), element_at(col("sym"), col("i") + 2).as("b"), col("cnt"))
          .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("n"))
          .orderBy(desc("n"), asc("a"), asc("b")).limit(1).collect()
        val best = top.headOption.filter(_.getLong(2) >= minCount)
        if (best.isEmpty) exhausted = true
        else {
          val (a, b) = (best.get.getString(0), best.get.getString(1))
          merges += ((a, b))
          learned += 1
          // rewrite every word's symbols, merging (a, b) left-to-right
          val next = cur
            .withColumn("sym", mergePairColumn(col("sym"), a, b))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          cur.unpersist()
          cur = next
        }
      }
    } finally cur.unpersist()
    merges.result()
  }

  /** One merge round as a left-to-right fold: append each symbol, but when
    * the accumulator ends in `a` and the next symbol is `b`, replace that
    * tail with the fused symbol. Built from Column functions — corpus
    * symbols never get spliced into SQL text.
    */
  private def mergePairColumn(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) => {
      val tail = element_at(acc, -1)
      when(size(acc) > 0 && tail === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x)))
    })

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

  private def encodeWord(word: String): Seq[String] = {
    var syms = word.map(_.toString).toIndexedSeq
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
