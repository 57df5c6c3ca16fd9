package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for cluster-scale joins (build brief:
  * "skewed keys → salting or AQE skew-join"). AQE's skew-join handles
  * sort-merge skew automatically at runtime; [[saltedJoin]] is the static
  * alternative for the shapes AQE can't split (e.g. a hot build side that
  * must be shuffled, or deterministic plan requirements).
  */
object Skew {

  /** Inner equi-join with key salting: the (large, skewed) left side gets a
    * random salt in [0, buckets); the right side is replicated `buckets`
    * times with each salt value, so a hot key's rows spread over `buckets`
    * reducers instead of one. Correctness is unchanged for inner equi-joins
    * (each left row meets exactly one replica of each matching right row).
    *
    * Use when right is too big to broadcast but much smaller than left —
    * the classic dimension-with-hot-key shape. Replication factor =
    * |right| × buckets; pick buckets ≈ hottest-key-rows / target-partition-rows.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    // salt from row CONTENT, not monotonically_increasing_id(): the latter
    // changes on task re-execution after a fetch failure, silently losing or
    // duplicating join rows on recovery. Content-hash is retry-deterministic;
    // the inherent trade is that bit-identical duplicate rows share a bucket
    // (retry-safe salting cannot separate indistinguishable rows). Map-typed
    // columns are not hashable in Spark — hash over the hashable ones.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = left.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val saltCol =
      if (hashCols.isEmpty) lit(0) // nothing hashable: degrade to no salting
      else pmod(xxhash64(hashCols.toIndexedSeq: _*), lit(buckets)).cast("int")
    val salted = left.withColumn("__salt", saltCol)
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Diagnostic: rows per key, descending — the thing to look at before
    * choosing broadcast vs salt vs AQE.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .orderBy(desc("rows")).limit(topN)
}
