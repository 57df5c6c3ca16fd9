package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the structured-record sibling of
  * document near-dup dedup: records describing the SAME real-world
  * entity (a customer entered twice with a typo) are found, linked,
  * transitively clustered, and collapsed to one golden record.
  *
  * The scale shape is the classic three-stage pipeline, each stage
  * bounded:
  *
  *  1. BLOCKING ([[candidates]]): records meet only inside a block — an
  *     equi-join on cheap derived keys, never an all-pairs product.
  *     MULTIPLE keys per record (`blockKeys`) give robustness: with two
  *     half-name keys, any single-field typo still leaves one key
  *     intact, so the true pair still meets (the standard multi-pass
  *     blocking argument). A pair sharing several keys is emitted once.
  *  2. MATCHING ([[resolve]]'s `isMatch`): an arbitrary per-pair
  *     predicate over both full records (edit distance on names,
  *     tolerance on numerics, equality on categoricals) — evaluated
  *     only on blocked candidates.
  *  3. CLUSTERING + SURVIVORSHIP ([[entities]]): links close
  *     transitively via [[Dedup.clusters]] (union-find below 10⁶ pairs,
  *     pointer-doubling label propagation above); every record gets an
  *     `entity` label (singletons keep their own id) and the caller
  *     picks golden values with an ordinary `groupBy("entity").agg`.
  */
object EntityResolution {

  /** Candidate pairs `(idA, idB)` (idA < idB) from multi-key blocking:
    * records sharing ANY of the `blockKeys` values meet. The self-join
    * shuffles on the key value, so block sizes — not table size — bound
    * the pair blowup; a null key never blocks.
    */
  def candidates(df: DataFrame, idCol: String, blockKeys: Seq[Column]): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    val keyed = df.select(col(idCol).as("__id"),
        posexplode(array(blockKeys.map(_.cast("string")): _*)).as(Seq("__ki", "__kv")))
      .filter(col("__kv").isNotNull)
    val a = keyed.select(col("__ki"), col("__kv"), col("__id").as("idA"))
    val b = keyed.select(col("__ki"), col("__kv"), col("__id").as("idB"))
    a.join(b, Seq("__ki", "__kv"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
  }

  /** Attach an `entity` label to every record of `df`: the transitive
    * closure label of `links` where linked, the record's own id where
    * not (singleton entities).
    */
  def entities(df: DataFrame, idCol: String, links: DataFrame): DataFrame = {
    val labels = Dedup.clusters(links, "idA", "idB")
      .select(col("id").as("__lid"), col("label").as("__label"))
    df.join(labels, col(idCol) === col("__lid"), "left")
      .withColumn("entity", coalesce(col("__label"), col(idCol).cast("long")))
      .drop("__lid", "__label")
  }

  /** Block → match → cluster in one call. `isMatch` sees the two full
    * records as structs (access fields with `l.getField(...)`); it runs
    * only on blocked candidate pairs. Returns `df` plus the `entity`
    * column.
    */
  def resolve(df: DataFrame, idCol: String, blockKeys: Seq[Column],
              isMatch: (Column, Column) => Column): DataFrame = {
    val cand = candidates(df, idCol, blockKeys)
    val packed = df.select(col(idCol).as("__pid"), struct(col("*")).as("__rec"))
    val links = cand
      .join(packed.select(col("__pid").as("idA"), col("__rec").as("__ra")), Seq("idA"))
      .join(packed.select(col("__pid").as("idB"), col("__rec").as("__rb")), Seq("idB"))
      .filter(isMatch(col("__ra"), col("__rb")))
      .select("idA", "idB")
    entities(df, idCol, links)
  }
}
