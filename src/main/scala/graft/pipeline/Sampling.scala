package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling operators for a training-data pipeline.
  *
  * Both use a multiplicative (Knuth) hash of the row id instead of `rand()`:
  * the sample is reproducible across runs, engines, partitionings and
  * cluster sizes — the property a 100 TB pipeline needs so a re-run (or an
  * audit in another engine) selects the identical subset. The reference
  * pins determinism the same way wherever it matters (seeded ids,
  * `IdGenerator.scala:3-10`); `rand()`-based sampling would make every
  * retry of a failed task select different rows.
  *
  * Scale notes: [[bernoulli]] is a pure filter — no shuffle, fully pushed
  * into the scan. [[stratified]] shuffles once on the stratum key; a
  * hot stratum concentrates on one reducer while ranking, so for strata
  * with billions of rows pre-filter with [[bernoulli]] to a bounded
  * candidate pool first (two-phase sampling), keeping the window input
  * per group small.
  */
object Sampling {

  /** Knuth's multiplicative hash constant (2^32 / phi). */
  val Knuth = 2654435761L

  /** Deterministic pseudo-random position of an id in [0, m).
    *
    * Computes `(id * Knuth) mod 2^32 mod m` with half-word (16-bit limb)
    * arithmetic so no intermediate exceeds 2^48: a raw `id * Knuth` long
    * multiply throws ArithmeticException under Spark's ANSI mode (and
    * overflows the DuckDB oracle's BIGINT) once id exceeds ~3.46e9 —
    * exactly the id range a 100 TB corpus reaches. The mod-2^32 product
    * depends only on `id mod 2^32`, so this is the same hash for all ids,
    * not just small ones.
    */
  def hashMod(id: Column, m: Long): Column = {
    require(m > 0 && m <= (1L << 32))
    val id32 = pmod(id.cast("long"), lit(1L << 32))
    val a = shiftright(id32, 16)              // high 16 bits, < 2^16
    val b = id32.bitwiseAND(lit(0xffffL))     // low 16 bits, < 2^16
    // (a*2^16 + b) * K mod 2^32  =  ((a*K mod 2^16) << 16  +  b*K) mod 2^32
    val h32 = pmod(
      shiftleft(pmod(a * lit(Knuth), lit(1L << 16)), 16) + pmod(b * lit(Knuth), lit(1L << 32)),
      lit(1L << 32))
    if (m == (1L << 32)) h32 else pmod(h32, lit(m))
  }

  /** Deterministic Bernoulli sample: keeps ~`pct`% of rows, always the
    * same ones. A pure filter — no shuffle, codegen'd, pushable.
    */
  def bernoulli(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(hashMod(col(idCol), 100L) < pct)
  }

  /** Stratified sample: `n` rows per `stratumCol` group, picked in
    * deterministic pseudo-random order (hash of the id, id tiebreak).
    * Adds the within-stratum pick rank as `rn` (1-based).
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashMod(col(idCol), 1L << 32), col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }

  /** Temperature (α = 0.5) resampling across groups — the standard
    * multi-source training-mix rebalance: each group `g` keeps rows at rate
    * `sqrt(minCount / count_g)`, so the smallest group is kept whole and
    * larger groups are downsampled toward the square root of their excess.
    * α is fixed at 0.5 because `sqrt` is correctly rounded under IEEE-754
    * (a general `pow` is not), which keeps the boundary decision — and
    * therefore the selected set — bit-identical across engines.
    *
    * Plan shape: one tiny per-group aggregate, its global min joined back
    * via broadcast, then the same overflow-safe Knuth-hash keep decision as
    * [[bernoulli]] in basis points. No shuffle of the data rows themselves,
    * no driver-side collect — the rates ride the broadcast.
    */
  def sqrtTemperature(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__minN"))))
      .select(col(groupCol),
        floor(lit(10000.0) * sqrt(col("__minN") / col("__n"))).as("__rate_bp"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hashMod(col(idCol), 10000L) < col("__rate_bp"))
      .drop("__rate_bp")
  }

  /** Training-mix domain weights — the per-domain sampling distribution a
    * temperature-mixed corpus is assembled from (the multilingual-LM
    * "alpha-smoothed" mixture with alpha = 0.5): weight_i proportional to
    * sqrt(size_i), renormalized to sum to 1. The sqrt keeps the math
    * engine-portable (IEEE-correctly-rounded, unlike a general `pow`).
    * Sized by a `sizeCol` sum (e.g. characters or tokens), not raw doc
    * counts, so byte-heavy domains don't hide behind few documents.
    *
    * Plan shape: one partial-aggregated groupBy to domain grain (the only
    * shuffle — output rows = #domains, at most thousands at any corpus
    * size), then the normalizer over that tiny aggregate as an unbounded
    * window. The corpus itself is touched exactly once.
    */
  def domainMixture(df: DataFrame, groupCol: String, sizeCol: String): DataFrame = {
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(sizeCol)).as("size_sum"))
    val all = Window.partitionBy()
    sizes.withColumn("weight",
        round(sqrt(col("size_sum")) / sum(sqrt(col("size_sum"))).over(all), 6))
      .select(col(groupCol), col("n_docs"), col("size_sum"), col("weight"))
  }

  /** Per-domain quota capping — the RefinedWeb/Pile-style "at most N
    * documents per source/domain" rule that stops a handful of gigantic
    * domains from dominating a web corpus. Keeps the `n` highest-priority
    * rows of each domain (priority descending, id ascending tie-break, so
    * the kept set is deterministic on any engine and cluster layout).
    *
    * Plan shape: the rank-filter pattern Spark plans as WindowGroupLimit —
    * each partition pre-truncates to its local top-n PER DOMAIN before the
    * single shuffle on the domain key, so a domain with a billion rows
    * ships only n·partitions candidates, never its full row set.
    */
  def domainCap(df: DataFrame, domainCol: String, n: Int,
                priorityCol: String, idCol: String): DataFrame = {
    require(n >= 1)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(priorityCol).desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic global training shuffle: order by the Knuth hash of the
    * id (id tiebreak) — the 100 TB way to "shuffle the corpus" is a range
    * repartition on this hash followed by local sorts, which Spark plans
    * from the declared orderBy; any engine reproduces the identical
    * permutation.
    */
  def shuffled(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("pos", hashMod(col(idCol), 1L << 32))
      .orderBy(col("pos"), col(idCol))

  /** Deterministic train/val/test assignment: each row's hash position in
    * [0,100) is matched against the cumulative split percentages, so a row
    * lands in the same split on every run, engine, and cluster size — the
    * property that keeps eval sets leak-free when the corpus is rebuilt.
    * A pure projection (adds a `split` column) — no shuffle.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) && splits.map(_._2).sum == 100)
    val pos = hashMod(col(idCol), 100L)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val chain = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (None, ((name, _), hi))    => Some(when(pos < hi, lit(name)))
      case (Some(c), ((name, _), hi)) => Some(c.when(pos < hi, lit(name)))
    }
    df.withColumn("split",
      chain.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1))))
  }

  /** Exact-SIZE deterministic uniform sample: the `k` rows with the
    * smallest Knuth-hash ranks (id tie-break) — the reproducible
    * "give me exactly 10k docs" draw fraction-based Bernoulli can't
    * provide. Rank-by-hash makes it order- and partitioning-invariant,
    * and any engine reproduces the same set from the same ids.
    *
    * Scale shape: plans as `TakeOrderedAndProject` — each partition
    * keeps a k-item heap and k rows total reach one reducer; no global
    * sort, no second pass.
    */
  def exactK(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1)
    df.orderBy(hashMod(col(idCol), 1L << 32), col(idCol)).limit(k)
  }

  /** Exact-TOTAL stratified sample with largest-remainder (Hamilton)
    * apportionment: exactly `k` rows total, allocated to each stratum
    * proportionally to its size — `⌊k·nᵢ/N⌋` each, the leftover seats
    * going to the largest remainders (stratum-name tie-break). Within a
    * stratum, rows are picked by Knuth-hash rank like [[exactK]] — the
    * "exactly 100k docs, mixed like the corpus" draw. All integer
    * arithmetic, engine-reproducible end to end.
    *
    * When `k ≥ N` every row survives (allocations cap at stratum
    * sizes); over-allocation to a stratum is impossible below that.
    *
    * Scale shape: strata stats are one map-side-combined aggregate; the
    * apportionment windows run over the STRATA table (stratum-count
    * rows, the one deliberate single-partition step); the pick is one
    * per-stratum rank window joined to the broadcast allocation — the
    * corpus shuffles once, by stratum.
    */
  def proportionalK(df: DataFrame, stratumCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    // every apportionment step windows over the STRATA table — a
    // stratum-count row set, so the unpartitioned windows are bounded
    val strata = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val seatRank = Window.partitionBy(lit(1))
      .orderBy(col("__r").desc, col(stratumCol))
    val alloc = strata
      // NB: __N would case-insensitively REPLACE __n under withColumn
      .withColumn("__tot", sum(col("__n")).over(all))
      .withColumn("__q", expr(s"(${k}L * __n) div __tot"))
      .withColumn("__r", expr(s"(${k}L * __n) % __tot"))
      .withColumn("__tq", sum(col("__q")).over(all))
      .withColumn("__rk", row_number().over(seatRank))
      .withColumn("__alloc", col("__q") +
        when(col("__rk") <= lit(k.toLong) - col("__tq"), 1L).otherwise(0L))
      .select(col(stratumCol), col("__alloc"))
    val pick = Window.partitionBy(col(stratumCol))
      .orderBy(hashMod(col(idCol), 1L << 32), col(idCol))
    // rank-bound the pick BEFORE the alloc join: `__alloc ≤ k` always, so
    // `__rn ≤ k` is a semantics-free pre-truncation — and because it is a
    // LITERAL bound sitting directly above the window, Spark rewrites it
    // to WindowGroupLimit: each partition keeps only its local top-k per
    // stratum before the rank shuffle (the same plan [[domainCap]] gets).
    // Without it a billion-row stratum ships a billion rows to be ranked.
    df.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") <= lit(k))
      .join(broadcast(alloc), Seq(stratumCol))
      .filter(col("__rn") <= col("__alloc"))
      .drop("__rn", "__alloc")
  }

  /** Leakage-safe split: near-duplicates must never straddle train and
    * test — the standard way eval scores silently inflate. Rows are
    * assigned by the hash of their dedup CLUSTER label, not their own
    * id: every member of a linked cluster (the pair output of a
    * MinHash/SimHash/embedding near-dup pass) lands in the same split;
    * unlinked rows split by their own id exactly like [[assignSplits]].
    *
    * Scale shape: cluster labeling is [[graft.dedup.Dedup.clusters]]
    * over the candidate-PAIR set (tiny relative to the corpus), the
    * label attach is one id-keyed equi-join, and the split decision
    * stays the pure [[hashMod]] projection — nothing corpus-scale
    * shuffles beyond that one join. Output: `df` + `entity` (the
    * cluster label, for audit) + `split`.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, links: DataFrame,
                       splits: Seq[(String, Int)]): DataFrame = {
    val labeled = graft.dedup.EntityResolution.entities(df, idCol, links)
    assignSplits(labeled, "entity", splits)
  }

  /** Deterministic WEIGHTED Bernoulli sample: each row is kept with
    * probability `weight / max(weight)` — the quality-weighted downsample
    * ("keep good documents more often") of a training-data mix. The keep
    * decision compares the Knuth-hash position against a per-row threshold
    * of `floor(2^16 * w / maxW)`: one multiply and one divide, both
    * IEEE-correctly-rounded, so the selected set is bit-identical across
    * engines, partitionings and retries — `rand() < w` would not be.
    *
    * Plan shape: one tiny max-aggregate broadcast back, then a pure
    * filter — no shuffle of the data rows.
    */
  def weighted(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val mx = df.agg(max(col(weightCol)).as("__maxW"))
    df.crossJoin(broadcast(mx))
      .filter(hashMod(col(idCol), 1L << 16) <
        floor(lit((1L << 16).toDouble) * col(weightCol) / col("__maxW")))
      .drop("__maxW")
  }

  /** Source-interleaved training order — the fair multi-source mix: rows
    * are ranked within their group in deterministic pseudo-random order
    * (`rn`), and the global training order is (rn, group), i.e. a
    * round-robin across groups. Every prefix of the output is group-
    * balanced (up to group exhaustion), which is what keeps a training run
    * from seeing one source in a burst.
    *
    * Plan shape: one shuffle on the group key for the rank window, then a
    * range repartition + local sort for the declared global order — no
    * single-reducer stage. A hot group concentrates its RANKING on one
    * reducer; pre-cap such groups with [[bernoulli]] first.
    */
  def interleaved(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashMod(col(idCol), 1L << 32), col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .orderBy(col("rn"), col(groupCol))
  }

  /** DSIR-style data selection: score every document by how much its
    * word-bigram distribution resembles a TARGET slice of the corpus —
    * Data Selection via Importance Resampling (Xie et al. 2023), in a
    * LINEARIZED integer-exact form. The paper scores docs with hashed
    * n-gram importance weights `p_target(g) / p_raw(g)` combined in log
    * space; log needs `ln`, which engines round differently, so this
    * variant combines the Laplace-smoothed probability RATIOS by
    * arithmetic mean in 1e4 fixed-point with integer +, *, `div` only —
    * an independent SQL engine reproduces every score bit for bit
    * (the lmTypicality/bm25TopK portability pattern):
    * {{{
    *   ratio_e4(g) = (10000 * (ct+1) * (Nr+B)) div ((cr+1) * (Nt+B))
    *   score_e4(d) = sum_g tf_d(g) * ratio_e4(g)  div  sum_g tf_d(g)
    * }}}
    * ct/cr = target/corpus occurrences of gram g, Nt/Nr their totals,
    * B = distinct corpus grams (the smoothing vocabulary). Integer
    * headroom: 1e4 * Nt * (Nr+B) must stay under 2^63 — fine to ~1e7
    * corpus tokens per run; beyond that drop to 1e3 units or the paper's
    * hashed feature space (which also BOUNDS the ratio table: B buckets,
    * broadcastable).
    *
    * Scale path: ONE corpus pass builds the (doc, gram, tf) table, which
    * is persisted and reused for both sides of the inherent self-join
    * (gram counts; probe) — the counts aggregate map-side over already
    * tf-reduced rows, and the probe is a plain shuffle join on the gram
    * key (deliberately NOT broadcast: the exact-gram ratio table is
    * corpus-sized). Per-doc reduction is one more keyed aggregate. No
    * driver materialization beyond three scalars.
    *
    * Returns the top `k` docs: (rank, idCol, score_e4, n_bigrams), ties
    * broken by ascending doc id.
    */
  def importanceTopK(df: DataFrame, targetPred: Column, k: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.{functions => gf}
    val tfd = df
      .select(col(idCol).as("id"),
        when(targetPred, 1L).otherwise(0L).as("tgt"),
        gf.ws_tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("id"), col("tgt"), explode(gf.shingles(col("__tk"), 2)).as("gram"))
      .groupBy("id", "gram")
      .agg(max(col("tgt")).as("tgt"), count(lit(1)).cast("long").as("tf"))
      .persist()
    val cnt = tfd.groupBy("gram")
      .agg(sum(col("tf")).cast("long").as("cr"),
        sum(col("tgt") * col("tf")).cast("long").as("ct"))
    // the corpus totals ride the plan as a broadcast 1-row aggregate
    // instead of a head() probe — the probe was its own action that
    // materialized the persisted tf table; now the final collect is the
    // only action and materializes it once. Same exact-integer ratio.
    val tot = cnt.agg(sum(col("cr")).cast("long").as("__nr"),
      sum(col("ct")).cast("long").as("__nt"),
      count(lit(1)).cast("long").as("__b"))
    val ratio = cnt.crossJoin(broadcast(tot)).select(col("gram"),
      expr("(10000 * (ct + 1) * (__nr + __b)) div ((cr + 1) * (__nt + __b))")
        .as("ratio_e4"))
    try {
      // rank <= k over a global order executes as WindowGroupLimit:
      // partial top-k per partition BEFORE the single-partition window
      // sees anything (the q_topk_group plan property)
      val top = tfd.join(ratio, Seq("gram"))
        .groupBy("id")
        .agg(expr("CAST(sum(tf * ratio_e4) AS BIGINT) div CAST(sum(tf) AS BIGINT)")
          .as("score_e4"),
          sum(col("tf")).cast("long").as("n_bigrams"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score_e4").desc, col("id"))).cast("long"))
        .filter(col("rank") <= k)
        .select(col("rank"), col("id").as(idCol), col("score_e4"), col("n_bigrams"))
      // materialize the k-row result so the persisted tf table can be
      // released HERE, deterministically, instead of riding the caller's
      // lineage for the session (k is small by contract)
      val rows = top.orderBy("rank").collect().toSeq
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.parallelize(rows, 1), top.schema)
    } finally tfd.unpersist()
  }

  /** Curriculum staging by lexical difficulty — the curriculum-learning
    * data-ordering step (easy-first training batches): a document's
    * difficulty is its MEAN TOKEN RARITY in exact integer milli-units
    * (`rarity(term) = (1000 * nDocs) div df(term)`, averaged with integer
    * division), and documents are binned into `stages` buckets at the
    * exact difficulty quartile/percentile boundaries
    * (`percentile_disc(i/stages)`), ties resolved by value comparison so
    * the assignment is engine-exact.
    *
    * Plan shape: tokenize + explode once; per-term document frequencies
    * are a (term, df) aggregate joined back onto the DISTINCT (doc, term)
    * pairs — the same tf-reduced shuffle shape as BM25/DSIR, nothing
    * corpus² — then one per-doc average. Stage boundaries are `stages-1`
    * exact percentiles of the per-DOC difficulty (one value per document
    * reaches that aggregate, not per token); at extreme corpus sizes swap
    * in `approx_percentile` — the binning comparison stays identical.
    * No global sort / single-partition window anywhere.
    */
  def curriculumStages(df: DataFrame, stages: Int = 4,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(stages >= 2 && stages <= 100)
    import graft.functions.{functions => gf}
    val toks = df.select(col(idCol), explode(gf.ws_tokens(col(textCol))).as("term"))
    val docTerm = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = df.select(col(idCol)).distinct().count()
      val dfreq = docTerm.groupBy(col("term")).agg(count(lit(1)).as("dft"))
      // materialize the per-doc difficulty table (one small row per doc)
      // BEFORE the quantile probe: the caller's action and the probe both
      // need it, and without truncation the caller would re-run the whole
      // tokenize + df-join pipeline — with docTerm unpersisted by then,
      // TWICE (docTerm appears on both sides of the rarity join)
      val difficulty = docTerm
        .join(dfreq, Seq("term"))
        .select(col(idCol),
          col("tf"), expr(s"(1000 * ${nDocs}L) div dft").as("rar_milli"))
        .groupBy(col(idCol))
        .agg(expr("sum(tf * rar_milli) div sum(tf)").as("difficulty_milli"))
        .localCheckpoint(true)
      val boundAggs = (1 until stages).map(i =>
        expr(s"percentile_disc(${i.toDouble / stages}) " +
          "WITHIN GROUP (ORDER BY difficulty_milli)").as(s"b$i"))
      val boundRow = difficulty.agg(boundAggs.head, boundAggs.tail: _*).head()
      // percentile_disc returns DOUBLE in Spark even over BIGINT input; the
      // picked value IS a data value (an exact integer), so toLong is exact
      val bounds = (0 until stages - 1).map(i => boundRow.getDouble(i).toLong)
      val stageCol = bounds.foldLeft(lit(1)) { (acc, b) =>
        acc + when(col("difficulty_milli") > b, 1).otherwise(0)
      }
      difficulty.withColumn("stage", stageCol.cast("long"))
    } finally docTerm.unpersist()
  }
}
