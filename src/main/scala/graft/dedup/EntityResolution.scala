package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  *     Blocks larger than `maxBlockSize` are DROPPED before the
  *     self-join: one degenerate key value (a blank-but-not-null name,
  *     a placeholder date) shared by 10⁶ records would otherwise emit
  *     ~5·10¹¹ pairs from a single block before the match predicate
  *     sees anything. Dropped mass is reported via
  *     [[candidatesWithReport]].
  *  2. MATCHING ([[resolve]]'s `isMatch`): an arbitrary per-pair
  *     predicate over both full records (edit distance on names,
  *     tolerance on numerics, equality on categoricals) — evaluated
  *     only on blocked candidates.
  *  3. CLUSTERING + SURVIVORSHIP ([[entities]], [[goldenRecords]]):
  *     links close transitively via [[Dedup.clusters]] (union-find
  *     below 10⁶ pairs, pointer-doubling label propagation above);
  *     every record gets an `entity` label (singletons keep their own
  *     id) and per-column survivorship rules pick the golden values.
  */
object EntityResolution {

  /** Default ceiling on members per block. 10⁴ members still allow
    * ~5·10⁷ candidate pairs from one block — past that the block key is
    * carrying no discriminating signal and evaluating the match
    * predicate on its pairs is wasted work at best, a driver-killing
    * blowup at worst.
    */
  val DefaultMaxBlockSize: Int = 10000

  /** [[candidatesWithReport]] result: the bounded candidate pairs plus
    * the blocks the cap removed — `(key_index, key_value, block_size)`,
    * one row per dropped block, so callers can alert on dropped mass
    * instead of silently losing recall.
    */
  final case class BlockingReport(candidates: DataFrame, droppedBlocks: DataFrame)

  /** Candidate pairs `(idA, idB)` (idA < idB) from multi-key blocking:
    * records sharing ANY of the `blockKeys` values meet. The self-join
    * shuffles on the key value, so block sizes — not table size — bound
    * the pair blowup; a null or EMPTY-STRING key never blocks (a key
    * expression like a substring past a short string yields `''` for
    * many records, which would lump them into one giant pseudo-block),
    * and blocks above `maxBlockSize` are dropped wholesale.
    */
  def candidates(df: DataFrame, idCol: String, blockKeys: Seq[Column],
                 maxBlockSize: Int = DefaultMaxBlockSize): DataFrame =
    candidatesWithReport(df, idCol, blockKeys, maxBlockSize).candidates

  /** [[candidates]] plus the dropped-block report. The block-size count
    * is a window over `(key_index, key_value)` — the same hash
    * partitioning the self-join needs, so the cap costs no extra
    * shuffle on the surviving rows.
    */
  def candidatesWithReport(df: DataFrame, idCol: String, blockKeys: Seq[Column],
                           maxBlockSize: Int = DefaultMaxBlockSize): BlockingReport = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    require(maxBlockSize >= 2, "maxBlockSize below 2 blocks nothing")
    val keyed = df.select(col(idCol).as("__id"),
        posexplode(array(blockKeys.map(_.cast("string")): _*)).as(Seq("__ki", "__kv")))
      .filter(col("__kv").isNotNull && length(col("__kv")) > 0)
    val sized = keyed.withColumn("__bs",
      count(lit(1)).over(Window.partitionBy("__ki", "__kv")))
    val kept = sized.filter(col("__bs") <= maxBlockSize).drop("__bs")
    val a = kept.select(col("__ki"), col("__kv"), col("__id").as("idA"))
    val b = kept.select(col("__ki"), col("__kv"), col("__id").as("idB"))
    val pairs = a.join(b, Seq("__ki", "__kv"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
    val dropped = keyed.groupBy(col("__ki").as("key_index"), col("__kv").as("key_value"))
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlockSize)
    BlockingReport(pairs, dropped)
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
              isMatch: (Column, Column) => Column,
              maxBlockSize: Int = DefaultMaxBlockSize): DataFrame = {
    // the full record struct rides the blocking rows, so the block
    // self-join emits (record, record) pairs directly and `isMatch`
    // filters INSIDE the join — the former id-only blocking needed two
    // extra shuffle joins (and a third scan of `df`) to re-attach the
    // records before matching. A pair sharing several keys is matched
    // once per shared key and deduped after; `isMatch` is a deterministic
    // function of the two records, so the link set is identical.
    // Block-size capping is unchanged from [[candidatesWithReport]]: the
    // window count shares the (ki, kv) hash partitioning the self-join
    // needs, so blocking costs ONE exchange.
    val keyed = df.select(col(idCol).as("__id"), struct(col("*")).as("__rec"),
        posexplode(array(blockKeys.map(_.cast("string")): _*)).as(Seq("__ki", "__kv")))
      .filter(col("__kv").isNotNull && length(col("__kv")) > 0)
    val sized = keyed.withColumn("__bs",
      count(lit(1)).over(Window.partitionBy("__ki", "__kv")))
    val kept = sized.filter(col("__bs") <= maxBlockSize).drop("__bs")
    val a = kept.select(col("__ki"), col("__kv"),
      col("__id").as("idA"), col("__rec").as("__ra"))
    val b = kept.select(col("__ki"), col("__kv"),
      col("__id").as("idB"), col("__rec").as("__rb"))
    val links = a.join(b, Seq("__ki", "__kv"))
      .filter(col("idA") < col("idB"))
      .filter(isMatch(col("__ra"), col("__rb")))
      .select("idA", "idB").distinct()
    entities(df, idCol, links)
  }

  /** Per-column survivorship rule for [[goldenRecords]]. Every rule is
    * deterministic: any tie breaks toward the GREATER column value
    * (struct-max), so repeated runs and engine replicas agree.
    */
  sealed trait Survivorship
  object Survivorship {
    /** Value from the most recent row by `tsCol` (any orderable
      * column — a timestamp, a version, a monotone id).
      */
    final case class Newest(tsCol: String) extends Survivorship
    /** Longest string value (most-complete-value heuristic). */
    case object Longest extends Survivorship
    /** Modal value across the entity's members. */
    case object MostFrequent extends Survivorship
  }

  /** Collapse a resolved table (one holding `entityCol`, e.g.
    * [[resolve]]'s output) to ONE golden record per entity:
    * `(entity, n_members, <one column per rule>)`.
    *
    * `Newest` and `Longest` fold into the single `groupBy(entity)`
    * aggregate (map-side partial `max_by`). `MostFrequent` needs the
    * per-value counts first, so each such column costs one extra
    * aggregate + one entity-keyed join — both sized by the OUTPUT
    * (entities × distinct values), never the input corpus, so the
    * shape holds at 100 TB.
    */
  def goldenRecords(resolved: DataFrame, entityCol: String,
                    rules: Seq[(String, Survivorship)]): DataFrame = {
    require(rules.nonEmpty, "at least one survivorship rule")
    import Survivorship._
    val ent = col(entityCol)
    val simple = rules.collect {
      case (c, Newest(ts)) => max_by(col(c), struct(col(ts), col(c))).as(c)
      case (c, Longest)    => max_by(col(c), struct(length(col(c)), col(c))).as(c)
    }
    val base = resolved.groupBy(ent)
      .agg(count(lit(1)).as("n_members"), simple: _*)
    val modal = rules.collect { case (c, MostFrequent) =>
      resolved.groupBy(ent, col(c))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy(ent)
        .agg(max_by(col(c), struct(col("__cnt"), col(c))).as(c))
    }
    val joined = modal.foldLeft(base)((acc, m) => acc.join(m, Seq(entityCol)))
    // restore the caller's rule order in the output schema
    joined.select(ent +: col("n_members") +: rules.map(r => col(r._1)): _*)
  }
}
