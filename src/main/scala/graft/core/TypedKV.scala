package graft.core

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Typed public-API wrapper (SURVEY §1.4: `DataFrame` for the engine core,
  * typed `Dataset[KV]` wrappers at the public API) — compile-time checked
  * tuples for single-column keys, delegating to [[OrderedTable]] for the
  * plan shapes. `KV[K, V]` mirrors the reference's
  * `Tuple[K, V] = (K, V, version)` (`package.scala:20`).
  */
final case class KV[K, V](key: K, value: V, version: String)

final class TypedKV[K, V](val ds: Dataset[KV[K, V]])(implicit kvEnc: Encoder[KV[K, V]]) {
  private val table = OrderedTable(ds.toDF(), KeySpec("key"))
  private def typed(df: org.apache.spark.sql.DataFrame): Dataset[KV[K, V]] =
    df.as[KV[K, V]]

  def get(k: K): Dataset[KV[K, V]] = typed(table.get(Seq(k)))
  def nextKey(k: K): Dataset[KV[K, V]] = typed(table.nextKey(Seq(k)))
  def previousKey(k: K): Dataset[KV[K, V]] = typed(table.previousKey(Seq(k)))
  def inOrder(): Dataset[KV[K, V]] = typed(table.inOrder())
  def reverse(): Dataset[KV[K, V]] = typed(table.reverseScan())
  def head(n: Int): Dataset[KV[K, V]] = typed(table.head(n))
  def tail(n: Int): Dataset[KV[K, V]] = typed(table.tail(n))
  def gt(k: K, inclusive: Boolean): Dataset[KV[K, V]] =
    typed(table.gt(Seq(k), inclusive))
  def lt(k: K, inclusive: Boolean): Dataset[KV[K, V]] =
    typed(table.lt(Seq(k), inclusive))
  def range(from: K, to: K, incFrom: Boolean = true, incTo: Boolean = true,
            reverse: Boolean = false): Dataset[KV[K, V]] =
    typed(table.range(Seq(from), Seq(to), incFrom, incTo, reverse))
  def count(): Long = table.countAll()
}

object TypedKV {
  def apply[K, V](ds: Dataset[KV[K, V]])(implicit e: Encoder[KV[K, V]]): TypedKV[K, V] =
    new TypedKV(ds)

  /** Wrap (key, value) pairs, stamping a version like bootstrap does. */
  def fromPairs[K, V](ds: Dataset[(K, V)], version: String)
                     (implicit e: Encoder[KV[K, V]]): TypedKV[K, V] = {
    import ds.sparkSession.implicits._
    new TypedKV(ds.toDF("key", "value")
      .withColumn("version", lit(version)).as[KV[K, V]])
  }
}
