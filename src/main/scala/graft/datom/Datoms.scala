package graft.datom

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{KeySpec, OrderedTable}

/** Datom (EAVT) modeling — the reference's richest composite-key use case
  * (`DatomsSpec.scala`, `DatomHelpers.scala:38-135`, `test.proto:14-22`):
  * facts as (entity, attribute, value, tx-time) tuples stored under three
  * orderings, EAVT / AVET / VAET, which in the reference are one opaque
  * `Ordering[EAVT]` per index kind. The reference's own helpers prove each
  * ordering is just a column permutation (`DatomHelpers.scala:123-133`), so
  * here an "index" is an [[OrderedTable]] over the same DataFrame with a
  * different `KeySpec` — no data duplication, and Catalyst pushes the
  * leading-column equalities of any lookup into the scan.
  *
  * Typed values use the reference's tagged representation
  * (`test.proto:16-21` valueTpe TEXT/NUMBER/REF) as three nullable typed
  * columns + a tag, instead of tagged bytes.
  */
object Datoms {

  val schema: Seq[String] = Seq("e", "a", "valueTpe", "vText", "vNum", "vRef", "t")

  val TEXT = 1; val NUMBER = 2; val REF = 3

  /** Build a datom table from (e, a, typed value, t) facts. */
  def fromFacts(spark: SparkSession,
                facts: Seq[(String, String, Any, Long)]): DataFrame = {
    import spark.implicits._
    facts.map { case (e, a, v, t) =>
      v match {
        case s: String if a.endsWith("_ref") => (e, a, REF, null: String, null.asInstanceOf[java.lang.Double], s, t)
        case s: String => (e, a, TEXT, s, null.asInstanceOf[java.lang.Double], null: String, t)
        case d: Double => (e, a, NUMBER, null: String, java.lang.Double.valueOf(d), null: String, t)
        case i: Int => (e, a, NUMBER, null: String, java.lang.Double.valueOf(i.toDouble), null: String, t)
        case other => (e, a, TEXT, String.valueOf(other), null.asInstanceOf[java.lang.Double], null: String, t)
      }
    }.toDF(schema: _*)
  }

  /** The three orderings as sort-key permutations (reference
    * `DatomHelpers.scala:123-133`): value sort uses the tagged typed
    * columns in tag order, matching the reference's per-type comparison.
    */
  def eavt(df: DataFrame): OrderedTable =
    OrderedTable(df, KeySpec("e", "a", "valueTpe", "vText", "vNum", "vRef", "t"))

  def avet(df: DataFrame): OrderedTable =
    OrderedTable(df, KeySpec("a", "valueTpe", "vText", "vNum", "vRef", "e", "t"))

  def vaet(df: DataFrame): OrderedTable =
    OrderedTable(df, KeySpec("valueTpe", "vText", "vNum", "vRef", "a", "e", "t"))

  /** AVET point probe: entities where attribute `a` has text value `v`
    * (reference `DatomsSpec.scala:85-91` finds an actor by name).
    */
  def entitiesByAttrText(df: DataFrame, attr: String, v: String): DataFrame =
    avet(df).prefix(Seq(attr, TEXT, v)).select(col("e"))

  /** VAET reverse-reference probe: entities whose `attr` REF-value points
    * at `target` (reference `DatomsSpec.scala:98-105` movies of an actor).
    */
  def entitiesByRef(df: DataFrame, attr: String, target: String): DataFrame =
    vaet(df).prefix(Seq(REF, null, null, target, attr)).select(col("e"))

  /** EAVT attribute read for one entity (reference `DatomsSpec.scala:107-115`). */
  def attrOfEntity(df: DataFrame, e: String, attr: String): DataFrame =
    eavt(df).prefix(Seq(e, attr))

  /** The reference's manual index-nested-loop join
    * (`DatomsSpec.scala:85-127`: name --AVET--> entity --VAET--> referrer
    * --EAVT--> attribute) as ONE declarative plan: three joins Catalyst
    * can broadcast; semantically identical, executed set-at-a-time instead
    * of per-key RPCs.
    */
  def navigate(df: DataFrame, startAttr: String, startValue: String,
               refAttr: String, outAttr: String): DataFrame = {
    val start = entitiesByAttrText(df, startAttr, startValue)
      .select(col("e").as("target"))
    val referrers = df.filter(col("a") === refAttr && col("valueTpe") === REF)
      .join(broadcast(start), col("vRef") === col("target"))
      .select(col("e").as("referrer"))
    df.join(broadcast(referrers), col("e") === col("referrer"))
      .filter(col("a") === outAttr)
      .select(col("e"), col("vText"))
  }
}
