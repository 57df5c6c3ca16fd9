package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
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
  * filter-creation subquery. `might_contain` requires its filter side to
  * be a constant or scalar subquery, so the sketch is embedded as a
  * literal in the fact-side predicate (≈ a broadcast of `numBits/8`
  * bytes riding the plan).
  *
  * Keys are pre-hashed with xxhash64 on BOTH sides, matching how Spark's
  * runtime filtering feeds BloomFilterAggregate — the filter stores 64-bit
  * hashes, never raw keys.
  */
object BloomJoin {

  /** Serialized bloom filter of `key` over `dim`, built by a distributed
    * aggregate; null when `dim` is empty. `expectedItems`/`numBits` size
    * the filter: bits/item ≈ 10 gives ~1% false positives.
    */
  def keyFilterBytes(dim: DataFrame, key: Column, expectedItems: Long,
                     numBits: Long): Array[Byte] =
    dim.agg(Shim.col(new BloomFilterAggregate(Shim.expr(xxhash64(key)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Membership probe of `key` against a finished filter. */
  def mightContain(bf: Array[Byte], key: Column): Column =
    Shim.col(BloomFilterMightContain(Literal(bf, BinaryType),
      Shim.expr(xxhash64(key))))

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
    * shuffling only the prefilter's survivors.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = 1L << 20,
               numBits: Long = 1L << 24): DataFrame =
    prefilter(fact, dim, factKey, dimKey, expectedItems, numBits)
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
}
