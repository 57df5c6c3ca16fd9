package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join reduction — the runtime-filter pattern for the
  * dominant 100-TB join shape (huge fact × small filtered dim): build a
  * bloom filter over the dim side's join keys with one distributed
  * aggregate, ship the finished ~MB sketch into a membership predicate on
  * the fact scan, and drop fact rows that CANNOT match before the join's
  * shuffle. The bloom test admits false positives (removed by the exact
  * join that follows) but never false negatives, so the final result is
  * exactly the plain join's — only the shuffled volume changes.
  *
  * At scale this is the difference between shuffling the whole fact table
  * and shuffling the ~selectivity fraction that can match: with a 1%
  * selective dim filter, ~99% of fact bytes never leave their scan
  * partition. Spark's own InjectRuntimeFilter applies the same rewrite
  * only under AQE-visible shuffle stages; this operator makes it explicit
  * and unconditional.
  *
  * The sketch itself is built distributed (partial filters OR-merge in the
  * aggregate) and only the finished fixed-size bitset reaches the driver —
  * the same movement Spark's runtime filter performs when it evaluates the
  * filter-creation subquery. Small sketches are embedded as a literal in
  * the fact-side predicate; above [[BloomJoin.InlineSketchBytes]] the
  * bytes ride a torrent broadcast and the predicate holds only the handle
  * ([[BloomMightContainBc]]) — plans, optimizer passes and task binaries
  * stay small no matter the sketch size.
  *
  * Keys are pre-hashed with xxhash64 on BOTH sides, matching how Spark's
  * runtime filtering feeds BloomFilterAggregate — the filter stores 64-bit
  * hashes, never raw keys.
  */
object BloomJoin {

  /** Hard ceiling on sketch size: 2^28 bits = 32 MB serialized. Above
    * [[InlineSketchBytes]] the bytes ship via broadcast (once per
    * executor), so the cap is no longer about task closures — it bounds
    * the driver-side aggregate result and per-executor resident memory; a
    * dim whose honest sketch needs more than 32 MB is big enough that the
    * right tool is a shuffled join, not a bigger filter.
    */
  val MaxSketchBits: Long = 1L << 28

  /** Thrown when a requested filter would exceed [[MaxSketchBits]] — typed
    * so callers can catch the sizing contract specifically.
    */
  final class SketchTooLargeException(requested: Long)
    extends IllegalArgumentException(
      s"bloom sketch of $requested bits exceeds MaxSketchBits=$MaxSketchBits " +
        "(32 MB serialized) — use a shuffled join for dims this large")

  /** Filter sizing from the expected item count: ~10 bits/item (~1% false
    * positives), floored at 64 bits, capped at [[MaxSketchBits]] — at the
    * cap the fp rate degrades gracefully instead of the literal exploding.
    */
  def derivedNumBits(expectedItems: Long): Long =
    math.min(MaxSketchBits, math.max(64L, expectedItems * 10L))

  private def checkBits(numBits: Long): Long = {
    require(numBits > 0, s"numBits must be positive, got $numBits")
    if (numBits > MaxSketchBits) throw new SketchTooLargeException(numBits)
    numBits
  }

  /** Serialized bloom filter of `key` over `dim`, built by a distributed
    * aggregate; null when `dim` is empty. `expectedItems`/`numBits` size
    * the filter: bits/item ≈ 10 gives ~1% false positives. `numBits` is
    * capped by [[MaxSketchBits]] ([[SketchTooLargeException]] above it).
    */
  def keyFilterBytes(dim: DataFrame, key: Column, expectedItems: Long,
                     numBits: Long): Array[Byte] =
    dim.agg(Shim.col(new BloomFilterAggregate(Shim.expr(xxhash64(key)),
        Literal(expectedItems), Literal(checkBits(numBits))).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** [[keyFilterBytes]] with the bit count derived from `expectedItems`. */
  def keyFilterBytes(dim: DataFrame, key: Column, expectedItems: Long): Array[Byte] =
    keyFilterBytes(dim, key, expectedItems, derivedNumBits(expectedItems))

  /** OR-merge two serialized filters built with the SAME
    * (expectedItems, numBits) sizing — bloom union is bitwise-or, so the
    * merged filter contains exactly the union of both key sets (still no
    * false negatives). This is what makes a cached corpus sketch
    * INCREMENTALLY maintainable: build a small filter over just a new
    * batch's keys and fold it in, never rescanning the corpus. Null
    * arguments (empty side) pass the other filter through.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    if (a == null) return b
    if (b == null) return a
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb) // throws IncompatibleMergeException on sizing mismatch
    val out = new java.io.ByteArrayOutputStream(a.length)
    fa.writeTo(out)
    out.toByteArray
  }

  /** Sketches at or below this serialized size are embedded as plan
    * literals (zero moving parts, same shape Spark's own runtime filter
    * produces); above it they ride a torrent BROADCAST instead. A multi-MB
    * literal is costly twice over: Catalyst re-hashes it on every
    * optimizer-rule pass of every plan that references it (driver CPU per
    * ACTION, painfully visible in a streaming loop that plans dozens of
    * small jobs per batch), and it ships inside every serialized task
    * binary. A broadcast moves the bytes once per executor and leaves the
    * plan holding a handle.
    */
  val InlineSketchBytes: Int = 1 << 20

  /** Membership probe of `key` against a finished filter — literal-embedded
    * below [[InlineSketchBytes]], broadcast-backed above. The broadcast
    * made here is anonymous: it is reclaimed by the ContextCleaner after
    * the column (and its plans) become garbage — fine for one-shot batch
    * queries; a LOOP probing fresh big sketches (streaming ingest) should
    * own the lifecycle via [[broadcastSketch]] + the `Broadcast` overload
    * and destroy each superseded sketch deterministically.
    */
  def mightContain(bf: Array[Byte], key: Column): Column =
    if (bf == null || bf.length <= InlineSketchBytes)
      Shim.col(BloomFilterMightContain(Literal(bf, BinaryType),
        Shim.expr(xxhash64(key))))
    else mightContain(broadcastSketch(SparkSession.active, bf), key)

  /** Pre-broadcast a sketch for repeated / caller-managed probing. The
    * caller owns the handle: destroy it when a newer sketch supersedes it.
    */
  def broadcastSketch(spark: SparkSession, bf: Array[Byte]): Broadcast[Array[Byte]] =
    spark.sparkContext.broadcast(bf)

  /** Membership probe through a caller-owned broadcast sketch. */
  def mightContain(bc: Broadcast[Array[Byte]], key: Column): Column =
    Shim.col(BloomMightContainBc(bc, Shim.expr(xxhash64(key))))

  /** `fact` reduced to the rows whose `factKey` might appear in `dim`'s
    * `dimKey` set — the prefilter alone, for callers composing their own
    * join. The predicate evaluates inside the fact scan's codegen stage;
    * fact rows never shuffle for it.
    */
  def prefilter(fact: DataFrame, dim: DataFrame, factKey: String,
                dimKey: String, expectedItems: Long, numBits: Long): DataFrame = {
    val bf = keyFilterBytes(dim, col(dimKey), expectedItems, numBits)
    if (bf == null) fact.filter(lit(false)) // empty dim: nothing can match
    else fact.filter(mightContain(bf, col(factKey)))
  }

  /** Exact left-semi join with the bloom prefilter on the fact side:
    * row-identical to `fact.join(dim, factKey === dimKey, "left_semi")`,
    * shuffling only the prefilter's survivors. The dim side is aliased
    * before the join so `factKey == dimKey` (same column name on both
    * sides — a perfectly plausible call shape) does not hit an ambiguous
    * column reference.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = 1L << 20,
               numBits: Long = 1L << 24): DataFrame = {
    val dk = "__graft_bloom_dk"
    prefilter(fact, dim, factKey, dimKey, expectedItems, numBits)
      .join(dim.select(col(dimKey).as(dk)).distinct(),
        col(factKey) === col(dk), "left_semi")
  }
}

/** Broadcast-backed bloom membership probe (`child` = the pre-hashed
  * 64-bit key, same convention as `BloomFilterMightContain`): the
  * serialized sketch lives in a torrent broadcast fetched once per
  * executor; the expression tree — and thus every optimizer pass and task
  * closure — carries only the handle. The deserialized filter is built
  * lazily once per JVM that evaluates it. Chosen automatically by
  * [[BloomJoin.mightContain]] above [[BloomJoin.InlineSketchBytes]];
  * semantics are identical to the literal form (no false negatives, null
  * key → null).
  */
case class BloomMightContainBc(bc: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression with Predicate {

  // every TASK deserializes its own copy of this expression, so a plain
  // lazy val would re-parse the sketch bytes per task (32 concurrent tasks
  // × a 32 MB filter = a GB of transient garbage per stage); the per-JVM
  // cache keyed by broadcast id shares one parsed filter per executor
  @transient private lazy val filter = BloomMightContainBc.filterFor(bc)

  /** public: called from generated code via the reference object */
  def probe(hash: Long): Boolean = filter.mightContainLong(hash)

  override def nullSafeEval(hash: Any): Any = probe(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainBc =
    copy(child = c)
}

object BloomMightContainBc {
  // bounded LRU: an ingest stream broadcasts a fresh merged sketch every
  // batch, so an unbounded cache would pin every superseded filter in
  // executor memory for the stream's life. 4 live filters × the 32 MB cap
  // bounds the cache at 128 MB worst case, one entry in the common case.
  // Keyed by (appId, broadcastId): broadcast ids restart with the
  // SparkContext, and a same-JVM successor context (test matrices,
  // repeated local sessions) must not hit the predecessor's filter.
  private val cache = new java.util.LinkedHashMap[(String, Long), org.apache.spark.util.sketch.BloomFilter](
      8, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(String, Long), org.apache.spark.util.sketch.BloomFilter]): Boolean =
      size() > 4
  }

  private[operators] def filterFor(bc: Broadcast[Array[Byte]])
      : org.apache.spark.util.sketch.BloomFilter = cache.synchronized {
    val key = (org.apache.spark.SparkEnv.get.conf.getAppId, bc.id)
    val got = cache.get(key)
    if (got != null) got
    else {
      val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bc.value))
      cache.put(key, f)
      f
    }
  }
}
