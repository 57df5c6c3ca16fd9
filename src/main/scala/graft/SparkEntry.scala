package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Command, FsSnapshotStore, KVIndex, KeySpec, MaterializedAgg, OrderedTable, SnapshotStore}
import graft.dedup.Dedup
import graft.functions.{functions => gf}
import graft.similarity.Similarity
import graft.streaming.EventStreams
import graft.text.TextAnalysis

/** Driver contract — every operator of SURVEY.md §2 exposed as a
  * `(SparkSession, sfDir) => DataFrame`, each with a DuckDB-oracle twin in
  * [[SparkEntry.oracleSql]]: ANSI-SQL-expressible semantics hash-verify
  * directly; sketch/LSH semantics emit SQL-computable columns (exact
  * truth-set counts) that hash-verify plus a recall/error contract boolean
  * for the hash-seeded part.
  *
  * Conventions for oracle parity:
  *  - every result is deterministically ordered and every computed column
  *    aliased identically on both sides;
  *  - aggregated doubles are rounded (sum order differs between engines);
  *  - timestamps leave as epoch millis (`unix_millis` / `epoch_ms`) to dodge
  *    ns-vs-us precision differences between the parquet readers.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir) else s.read.parquet(s"$dir/$name.parquet")

  /** Fixed retrieval queries for txt_bm25 (shared by the Spark query and
    * its DuckDB oracle so both score the same term sets).
    */
  private val Bm25Queries: Seq[String] =
    Seq("spark window join", "fast hash merge scan", "customer data stream value")

  /** DuckDB replica of [[graft.operators.PageRank.pagerank]] for the
    * `graph_pagerank` oracle: the fixed iteration count unrolls to a
    * plain CTE chain (r0..rN), every step the same integer arithmetic
    * (`//` = `div` on positives), so the oracle replays the recurrence
    * exactly rather than approximating it.
    */
  private def pagerankOracleSql(iters: Int): String = {
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
    // and r_{i-1} is referenced twice per step — inlining would re-derive
    // the whole chain per reference (exponential in iters; observed as a
    // 90-CPU-minute hang at sf0.1 before this annotation)
    val head =
      "WITH eb AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
      "e AS MATERIALIZED (SELECT src, dst FROM eb UNION ALL SELECT dst AS src, src AS dst FROM eb), " +
      "dg AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1), " +
      "nd AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)), " +
      "nn AS MATERIALIZED (SELECT n.node, coalesce(dg.deg, 0) AS deg FROM nd n LEFT JOIN dg USING (node)), " +
      "c0 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, CAST(1000000000 // count(*) AS BIGINT) AS base, " +
      "CAST((150 * (1000000000 // count(*))) // 1000 AS BIGINT) AS tele FROM nn), " +
      "r0 AS MATERIALIZED (SELECT node, deg, (SELECT base FROM c0) AS r FROM nn)"
    val steps = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s", c$i AS MATERIALIZED (SELECT e.dst AS node, CAST(sum(r.r // r.deg) AS BIGINT) AS contrib " +
      s"FROM $p r JOIN e ON r.node = e.src WHERE r.deg > 0 GROUP BY 1), " +
      s"r$i AS MATERIALIZED (SELECT nn.node, nn.deg, CAST((SELECT tele FROM c0) + " +
      s"(850 * (coalesce(c.contrib, 0) + " +
      s"(SELECT coalesce(sum(rr.r), 0) FROM $p rr WHERE rr.deg = 0) // (SELECT n FROM c0))) // 1000 " +
      s"AS BIGINT) AS r FROM nn LEFT JOIN c$i c USING (node))"
    }.mkString
    head + steps +
      s" SELECT node, r AS rank_nano FROM r$iters ORDER BY rank_nano DESC, node LIMIT 20"
  }

  /** Recursive delete for per-query temp stores (no orphan dirs across the
    * full sweep). Best-effort — a failed delete must not fail the query. */
  private def deleteRec(root: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Exception => () }

  /** Recall-contract bound for the LSH recall checks: >= `num/den` of the
    * truth set at statistically meaningful sizes, but never all-or-nothing —
    * at small truth sets (2..4 pairs, e.g. one borderline data-dependent
    * pair at a given SF) a single LSH miss must not fail the whole run, so
    * one miss is tolerated there. A truth set of exactly one pair gets NO
    * slack (hits >= 0 would pass a total recall failure silently);
    * nTrue == 0 is vacuously ok.
    */
  private def recallOk(hits: Long, nTrue: Long, num: Long, den: Long): Boolean =
    if (nTrue <= 1) hits >= nTrue
    else if (nTrue < 5) hits >= nTrue - 1
    else hits * den >= nTrue * num

  /** SQL-computable truth set for the near-dup recall contracts: exact
    * all-pairs shingle Jaccard over the bounded `doc_id < 500` range
    * (25 pairs at sf0.01 — O(500²) work at EVERY scale factor), docs with
    * >= 3 whitespace tokens (the oracle's string shingler emits nothing for
    * shorter docs where the hash shingler emits one partial shingle).
    */
  private def ddTruthPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sh = docs.filter(col("doc_id") < 500)
      .filter(size(gf.ws_tokens(col("text"))) >= 3)
      .select(col("doc_id").as("id"), gf.shingle_hashes(col("text"), 3).as("sh"))
    sh.select(col("id").as("idA"), col("sh").as("shA"))
      .join(sh.select(col("id").as("idB"), col("sh").as("shB")),
        col("idA") < col("idB"))
      .filter(gf.jaccard_sorted(col("shA"), col("shB")) >= minJaccard)
      .select("idA", "idB")
  }

  /** Shared resolution for `er_resolve` / `er_golden`: customers plus
    * planted dirty variants (one name char swapped, +0.01 balance,
    * id+1e6) blocked by TWO half-name keys (either survives a
    * single-field typo), matched by edit-distance + balance tolerance +
    * segment equality, transitively clustered. The DuckDB replica
    * reproduces the whole pipeline — blocking (incl. the hot-block cap
    * and empty-key filter), matching, and FULL transitive closure via a
    * recursive reachability CTE, so accidental chains among base
    * customers at larger scale factors label identically on both
    * engines.
    */
  private def erResolved(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
    val dirty = cust.filter(col("c_custkey") % 7 === 3)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(substring(col("c_name"), 1, 9), lit("x"),
          substring(col("c_name"), 11, 100)).as("c_name"),
        col("c_nationkey"),
        (col("c_acctbal") + 0.01).as("c_acctbal"),
        col("c_mktsegment"))
    val all = cust.select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment").unionByName(dirty)
    graft.dedup.EntityResolution.resolve(all, "c_custkey",
      Seq(concat(col("c_nationkey"), lit("|"), substring(col("c_name"), 1, 13)),
        concat(col("c_nationkey"), lit("|"), substring(col("c_name"), 14, 5))),
      (l, r) =>
        levenshtein(l.getField("c_name"), r.getField("c_name")) <= 1 &&
          abs(l.getField("c_acctbal") - r.getField("c_acctbal")) <= 0.02 &&
          l.getField("c_mktsegment") === r.getField("c_mktsegment"))
  }

  /** Shared oracle-SQL prefix for `er_resolve` / `er_golden`: the CTE
    * chain through transitive-closure labels. Starts with
    * `WITH RECURSIVE` — callers append their own final CTEs + SELECT.
    */
  private val ErLabelCtes: String =
    "WITH RECURSIVE base AS (SELECT c_custkey, c_name, c_nationkey, " +
    "c_acctbal, c_mktsegment FROM customer), " +
    "dirty AS (SELECT c_custkey + 1000000 AS c_custkey, " +
    "concat(substring(c_name, 1, 9), 'x', substring(c_name, 11)) AS c_name, " +
    "c_nationkey, c_acctbal + 0.01 AS c_acctbal, c_mktsegment " +
    "FROM base WHERE c_custkey % 7 = 3), " +
    "allr AS (SELECT * FROM base UNION ALL SELECT * FROM dirty), " +
    "keys AS (SELECT c_custkey AS id, 1 AS ki, " +
    "concat(c_nationkey, '|', substring(c_name, 1, 13)) AS kv FROM allr " +
    "UNION ALL SELECT c_custkey AS id, 2 AS ki, " +
    "concat(c_nationkey, '|', substring(c_name, 14, 5)) AS kv FROM allr), " +
    // hot-block cap + empty-key filter, replicated from
    // EntityResolution.candidates (window count per (ki, kv), drop > 10000)
    "keptk AS (SELECT id, ki, kv FROM (SELECT id, ki, kv, " +
    "count(*) OVER (PARTITION BY ki, kv) AS bs FROM keys " +
    "WHERE kv IS NOT NULL AND length(kv) > 0) WHERE bs <= 10000), " +
    "cand AS (SELECT DISTINCT a.id AS idA, b.id AS idB FROM keptk a " +
    "JOIN keptk b ON a.ki = b.ki AND a.kv = b.kv AND a.id < b.id), " +
    "links AS (SELECT idA, idB FROM cand " +
    "JOIN allr ra ON ra.c_custkey = cand.idA " +
    "JOIN allr rb ON rb.c_custkey = cand.idB " +
    "WHERE levenshtein(ra.c_name, rb.c_name) <= 1 " +
    "AND abs(ra.c_acctbal - rb.c_acctbal) <= 0.02 " +
    "AND ra.c_mktsegment = rb.c_mktsegment), " +
    // full transitive closure: undirected edges, recursive reachability,
    // label = min reachable id (matches Dedup.clusters' min-id labels)
    "links2 AS (SELECT idA AS a, idB AS b FROM links " +
    "UNION SELECT idB AS a, idA AS b FROM links), " +
    "reach AS (SELECT a AS src, a AS dst FROM links2 " +
    "UNION SELECT r.src, l.b AS dst FROM reach r JOIN links2 l ON l.a = r.dst), " +
    "lab AS (SELECT src AS id, min(dst) AS entity FROM reach GROUP BY src)"

  /** Normalize the events table's `ts` to a plain TIMESTAMP regardless of
    * how the generator wrote it: parquet TIMESTAMP(NANOS) arrives as a
    * nanos Long under the nanosAsLong legacy conf (`div` keeps the long
    * math exact — a double cast would lose ~256 ns at 2024 epochs);
    * un-adjusted TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ and casts to
    * the identical instant under the pinned UTC session zone (DuckDB reads
    * the same file as a naive TIMESTAMP and `epoch_ms` treats it as UTC —
    * the engines stay value-identical).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Real PNG payloads derived from the documents table: per doc_id render a
    * solid-color `(1 + id%13) × (1 + id%7)` image with channel values
    * `(id*37)%256 / (id*59)%256 / (id*83)%256` and encode via the JDK PNG
    * writer. The decode side (`Multimodal.imageStats`) then exercises the
    * REAL `javax.imageio` codec, and every decoded property is exactly
    * computable from doc_id in the SQL oracle. Encode runs per-partition on
    * executors; payload bytes never shuffle.
    */
  private def mediaPngTable(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[graft.multimodal.Multimodal.MediaRow] = {
    import s.implicits._
    val png = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = 1 + (id % 13).toInt
        val h = 1 + (id % 7).toInt
        (id, graft.multimodal.Multimodal.solidPng(w, h,
          ((id * 37) % 256).toInt, ((id * 59) % 256).toInt,
          ((id * 83) % 256).toInt))
      }.toDF("doc_id", "payload")
    graft.multimodal.Multimodal.asMediaTable(s, png, "doc_id", "payload", "image")
  }

  /** orders as an ordered KV table, composite key (o_custkey, o_orderkey) —
    * the datom-style "column permutation is the ordering" model (SURVEY
    * §1.4, reference `DatomHelpers.scala:123-133`).
    */
  private def ordersKv(s: SparkSession, dir: String): OrderedTable =
    OrderedTable(t(s, dir, "orders"), KeySpec("o_custkey", "o_orderkey"))

  /** orders keyed by the single primary key o_orderkey. */
  private def ordersPk(s: SparkSession, dir: String): OrderedTable =
    OrderedTable(t(s, dir, "orders"), KeySpec("o_orderkey"))

  private val orderCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  private def proj(df: DataFrame): DataFrame =
    df.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"), round(col("o_totalprice"), 2).as("price"))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join")(spark, "/root/testdata/sf0.001")

  /** A real snapshot-store lifecycle built once per JVM per sfDir so the
    * kv_* driver queries verify the STORE path (bootstrap → snapshot t=1000
    * → CAS upsert batch → snapshot t=2000) against the DuckDB oracle, not
    * just the stateless read surface. Kept in /tmp; rebuilt per run.
    */
  private val idxCache = scala.collection.concurrent.TrieMap[String, (SnapshotStore, KVIndex)]()
  /** one temp FS store + built index per (kind, sfDir) per JVM */
  private def cachedIndex(kind: String, s: SparkSession, d: String)(
      build: SnapshotStore => KVIndex): (SnapshotStore, KVIndex) =
    idxCache.getOrElseUpdate(s"$kind|$d", {
      val root = java.nio.file.Files.createTempDirectory(s"graft-$kind").toString
      val store = new FsSnapshotStore(root, s)
      (store, build(store))
    })

  private def liStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-entry", s, d) { store =>
      val ord = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val v1 = KVIndex.bootstrap(store, "ord", ord,
        Seq("o_orderkey")).fold(e => sys.error(e.message), identity)
      store.recordSnapshot("ord", v1.manifest.version, ts = 1000L)
      // deterministic upsert batch: zero out totalprice for orderkey < 50
      val batch = ord.filter(col("o_orderkey") < 50)
        .withColumn("o_totalprice", lit(0.0))
      val res = v1.execute(Seq(Command.Insert(batch, upsert = true)), "tx-kv-demo")
      val v2 = res.orThrow
      store.recordSnapshot("ord", v2.version, ts = 2000L)
      new KVIndex(store, v2)
    }

  /** SCD2 fixture: three committed versions of a cents dimension —
    * bootstrap, then (zero-out keys < 50 + 5 fresh inserts), then
    * (999-overwrite of [20,30) + removal of [100,200)) — exercising
    * added / changed / removed / no-op-upsert-cancels in one history.
    */
  private def scd2Store(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-scd2", s, d) { store =>
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = KVIndex.bootstrap(store, "dim", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      store.recordSnapshot("dim", v1.manifest.version, ts = 1000L)
      val m2 = v1.execute(Seq(
        Command.Insert(ord.filter(col("o_orderkey") < 50)
          .withColumn("cents", lit(0L)), upsert = true),
        Command.Insert(s.range(0, 5).select(
          (col("id") + 3000000L).as("o_orderkey"),
          (lit(999990L) + col("id")).as("o_custkey"),
          (lit(77L) + col("id")).as("cents")))), "tx-scd2-v2").orThrow
      store.recordSnapshot("dim", m2.version, ts = 2000L)
      val m3 = new KVIndex(store, m2).execute(Seq(
        Command.Insert(ord.filter(col("o_orderkey") >= 20 && col("o_orderkey") < 30)
          .withColumn("cents", lit(999L)), upsert = true),
        Command.Remove(ord.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
          .select("o_orderkey"))), "tx-scd2-v3").orThrow
      store.recordSnapshot("dim", m3.version, ts = 3000L)
      new KVIndex(store, m3)
    }

  /** Incremental-SCD2 fixture: the SAME mutation script as [[scd2Store]]
    * but with the history table materialized after v1 and rolled forward
    * by a refresh per commit — the view's final content must equal the
    * full rebuild (kv_scd2's oracle, shared verbatim). Cached like every
    * other store fixture: the maintenance chain runs once per session.
    */
  private def scd2IncrView(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-scd2i", s, d) { store =>
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = KVIndex.bootstrap(store, "dim", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      store.recordSnapshot("dim", v1.manifest.version, ts = 1000L)
      graft.core.Scd2.materialize(store, "dimh", "dim")
        .fold(e => sys.error(e.message), identity)
      val m2 = v1.execute(Seq(
        Command.Insert(ord.filter(col("o_orderkey") < 50)
          .withColumn("cents", lit(0L)), upsert = true),
        Command.Insert(s.range(0, 5).select(
          (col("id") + 3000000L).as("o_orderkey"),
          (lit(999990L) + col("id")).as("o_custkey"),
          (lit(77L) + col("id")).as("cents")))), "tx-scd2i-v2").orThrow
      store.recordSnapshot("dim", m2.version, ts = 2000L)
      graft.core.Scd2.refresh(store, "dimh").fold(e => sys.error(e.message), identity)
      val m3 = new KVIndex(store, m2).execute(Seq(
        Command.Insert(ord.filter(col("o_orderkey") >= 20 && col("o_orderkey") < 30)
          .withColumn("cents", lit(999L)), upsert = true),
        Command.Remove(ord.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
          .select("o_orderkey"))), "tx-scd2i-v3").orThrow
      store.recordSnapshot("dim", m3.version, ts = 3000L)
      graft.core.Scd2.refresh(store, "dimh").fold(e => sys.error(e.message), identity)
    }

  /** Incrementally-maintained aggregate view fixture: bootstrap a cents
    * source, materialize the per-customer sum/count view, apply one mixed
    * COW batch (upsert-to-zero, range removal, fresh inserts incl. brand
    * new groups), refresh the view from the DIFF — the driver output is
    * the refreshed view's content, which the oracle recomputes from
    * scratch in SQL (incremental == recompute is the whole contract).
    */
  private def maggView(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-magg", s, d) { store =>
      val src0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = KVIndex.bootstrap(store, "aggsrc", src0, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      MaterializedAgg.create(store, "aggview", v1, Seq("o_custkey"), "cents")
        .fold(e => sys.error(e.message), identity)
      val res = v1.execute(Seq(
        Command.Insert(src0.filter(col("o_orderkey") < 50)
          .withColumn("cents", lit(0L)), upsert = true),
        Command.Remove(src0.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
          .select("o_orderkey")),
        Command.Insert(s.range(0, 10).select(
          (col("id") + 2000000L).as("o_orderkey"),
          (lit(999990L) + col("id") % 2).as("o_custkey"),
          (lit(12345L) + col("id")).as("cents")))))
      val v2 = new KVIndex(store, res.orThrow)
      MaterializedAgg.refresh(store, "aggview", v2)
        .fold(e => sys.error(e.message), identity)
    }._2

  /** SQL-driven materialized-view fixture (kv_sql_mat_view): the
    * kv_agg_view lifecycle driven ENTIRELY through the r18 MV SQL surface
    * (`sources/GraftMatView.scala`) — CREATE MATERIALIZED VIEW compiles
    * onto MaterializedAgg.create, the source mutates through the command
    * API, REFRESH MATERIALIZED VIEW applies the COW diff (± pass for
    * sums/count, touched-groups recompute for min/max).
    */
  private def sqlMvView(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-sqlmv", s, d) { store =>
      val src0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = KVIndex.bootstrap(store, "mvsrc", src0, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      s.conf.set("spark.sql.catalog.graft_mv", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_mv.root", store.root)
      s.sql("""CREATE MATERIALIZED VIEW graft_mv.mvagg AS
        SELECT o_custkey, sum(cents) AS sum_cents, count(*) AS agg_cnt,
               min(cents) AS min_cents, max(cents) AS max_cents
        FROM graft_mv.mvsrc GROUP BY o_custkey""")
      val res = v1.execute(Seq(
        Command.Insert(src0.filter(col("o_orderkey") < 50)
          .withColumn("cents", lit(0L)), upsert = true),
        Command.Remove(src0.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
          .select("o_orderkey")),
        Command.Insert(s.range(0, 10).select(
          (col("id") + 2000000L).as("o_orderkey"),
          (lit(999990L) + col("id") % 2).as("o_custkey"),
          (lit(12345L) + col("id")).as("cents")))))
      res.orThrow
      s.sql("REFRESH MATERIALIZED VIEW graft_mv.mvagg")
      KVIndex.open(store, "mvagg").fold(e => sys.error(e.message), identity)
    }._2

  /** MV TIME-TRAVEL fixture (kv_mv_asof, r20): materialized-view
    * lifecycle commits are DUAL-STAMPED (create bootstrap + every refresh
    * record a wall-clock history line), so catalog `TIMESTAMP AS OF`
    * re-opens the view's pre-refresh state like any history-recording
    * table. The fixture creates the view, reads its create stamp from
    * SHOW HISTORY, waits for the wall clock to tick past it (two commits
    * in one millisecond would floor to the later), mutates the source and
    * refreshes — the query reads both states via `timestamp_millis(stamp)`
    * instants (timezone-free). Returns (catalog, w1, w2).
    */
  private val mvAsOfStamps = scala.collection.concurrent.TrieMap[String, (String, Long, Long)]()
  private def mvAsOfView(s: SparkSession, d: String): (String, Long, Long) =
    mvAsOfStamps.getOrElseUpdate(d, {
      val store = new FsSnapshotStore(
        java.nio.file.Files.createTempDirectory("graft-kv-mvasof").toString, s)
      val src0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = KVIndex.bootstrap(store, "masrc", src0, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      val cat = regCatalog(s, "mvasof", d, store.root)
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.mvasof AS
        SELECT o_custkey, sum(cents) AS agg_sum, count(*) AS agg_cnt
        FROM $cat.masrc GROUP BY o_custkey""")
      val h1 = s.sql(s"SHOW HISTORY $cat.mvasof").collect()
      require(h1.length == 1 && !h1.head.isNullAt(2),
        s"kv_mv_asof: create must record one dual-stamped history line, got ${h1.mkString}")
      val w1 = h1.head.getLong(2)
      while (System.currentTimeMillis() <= w1) Thread.sleep(1)
      v1.execute(Seq(Command.Insert(
        src0.filter(col("o_orderkey") < 50).withColumn("cents", lit(0L)),
        upsert = true)), "tx-mvasof-v2").orThrow
      s.sql(s"REFRESH MATERIALIZED VIEW $cat.mvasof")
      val h2 = s.sql(s"SHOW HISTORY $cat.mvasof").collect()
      require(h2.length == 2 && h2.last.getLong(2) > w1,
        s"kv_mv_asof: refresh must append a later-stamped line, got ${h2.mkString(",")}")
      (cat, w1, h2.last.getLong(2))
    })

  /** FILTERED materialized-view fixture (kv_sql_mat_view_where, r19): the
    * sqlMvView lifecycle with a WHERE over the source — the predicate is
    * recorded in the view spec and applied to create AND to each refresh
    * diff side, so rows entering/leaving the filtered set through the
    * mutation batch maintain exactly. Inserted rows straddle the
    * predicate boundary on purpose.
    */
  private def sqlMvWhereView(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-sqlmvw", s, d) { store =>
      val src0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = KVIndex.bootstrap(store, "mvwsrc", src0, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      val cat = regCatalog(s, "sqlmvw", d, store.root)
      s.sql(s"""CREATE MATERIALIZED VIEW $cat.mvwagg AS
        SELECT o_custkey, sum(cents) AS sum_cents, count(*) AS agg_cnt,
               min(cents) AS min_cents, max(cents) AS max_cents
        FROM $cat.mvwsrc WHERE cents >= 100000 GROUP BY o_custkey""")
      val res = v1.execute(Seq(
        Command.Insert(src0.filter(col("o_orderkey") < 50)
          .withColumn("cents", lit(0L)), upsert = true),
        Command.Remove(src0.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
          .select("o_orderkey")),
        Command.Insert(s.range(0, 10).select(
          (col("id") + 2000000L).as("o_orderkey"),
          (lit(999990L) + col("id") % 2).as("o_custkey"),
          (lit(90000L) + col("id") * 30000L).as("cents")))))
      res.orThrow
      s.sql(s"REFRESH MATERIALIZED VIEW $cat.mvwagg")
      KVIndex.open(store, "mvwagg").fold(e => sys.error(e.message), identity)
    }._2

  /** Materialized JOIN view fixture (`core/MaterializedJoin.scala`):
    * orders ⋈ per-order line aggregates as an incrementally-maintained
    * view. Create at v1 of BOTH sources (the create is the exchange-free
    * co-range zip join), then mutate both (zero prices under 50 on the
    * orders side, +100 qty on multiples of 5 on the lines side) and
    * refresh — the refresh reads only the two COW diffs plus the
    * changed-key envelope's files, and the oracle recomputes the join
    * from scratch over the mutated tables (incremental == recompute).
    */
  private def joinViewStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-joinview", s, d) { store =>
      val ord = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val a1 = KVIndex.bootstrap(store, "jva", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      val li = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))
      val b1 = KVIndex.bootstrap(store, "jvb", li, Seq("l_orderkey"))
        .fold(e => sys.error(e.message), identity)
      graft.core.MaterializedJoin.create(store, "jview", a1, b1)
        .fold(e => sys.error(e.message), identity)
      val a2 = new KVIndex(store, a1.execute(Seq(Command.Insert(
        ord.filter(col("o_orderkey") < 50).withColumn("o_totalprice", lit(0.0)),
        upsert = true)), "tx-jv-a2").orThrow)
      val b2 = new KVIndex(store, b1.execute(Seq(Command.Insert(
        b1.df.filter(col("l_orderkey") % 5 === 0)
          .select(col("l_orderkey"), (col("qty") + 100).as("qty"), col("n_lines")),
        upsert = true)), "tx-jv-b2").orThrow)
      graft.core.MaterializedJoin.refresh(store, "jview", a2, b2)
        .fold(e => sys.error(e.message), identity)
    }._2

  /** Multi-column + min/max view fixture: same mutation protocol as
    * [[maggView]] but the view maintains TWO sums in one ± pass and
    * min/max of cents via the touched-group recompute (the mutations
    * deliberately zero a group's minimum and remove bands holding
    * maxima — the cases incremental min/max cannot serve).
    */
  private def maggMmView(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-magg-mm", s, d) { store =>
      val src0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        (col("o_orderkey") % 97).as("points"))
      val v1 = KVIndex.bootstrap(store, "aggsrcmm", src0, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      MaterializedAgg.create(store, "aggviewmm", v1, Seq("o_custkey"),
        MaterializedAgg.ViewSpec(Seq("cents", "points"), Seq("cents")))
        .fold(e => sys.error(e.message), identity)
      val res = v1.execute(Seq(
        Command.Insert(src0.filter(col("o_orderkey") < 50)
          .withColumn("cents", lit(0L)), upsert = true),
        Command.Remove(src0.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
          .select("o_orderkey")),
        Command.Insert(s.range(0, 10).select(
          (col("id") + 2000000L).as("o_orderkey"),
          (lit(999990L) + col("id") % 2).as("o_custkey"),
          (lit(12345L) + col("id")).as("cents"),
          ((col("id") + 2000000L) % 97).as("points")))))
      val v2 = new KVIndex(store, res.orThrow)
      MaterializedAgg.refresh(store, "aggviewmm", v2)
        .fold(e => sys.error(e.message), identity)
    }._2

  /** Binary-keyed index — the reference's CANONICAL key type is
    * unsigned-lexicographic `Bytes` (reference `package.scala:39-42`; every
    * `MainSpec`/`QueriesRandomSpec` workload runs byte keys). Key layout
    * `status '/' zero-padded orderkey` makes the byte order equal the
    * (status, orderkey) order, so a byte-range scan is SQL-expressible.
    */
  private def bytesStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-bytes", s, d) { store =>
      val df = t(s, d, "orders").select(
        encode(concat(col("o_orderstatus"), lit("/"),
          lpad(col("o_orderkey").cast("string"), 12, "0")), "UTF-8").as("bk"),
        col("o_totalprice"))
      KVIndex.bootstrap(store, "bord", df, Seq("bk"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** orders keyed (o_custkey, o_orderkey) in the store — backs the REAL
    * library split for u2_split (median via manifest cumulative counts,
    * one file read — not a global window).
    */
  private def ckStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-ck", s, d) { store =>
      val df = t(s, d, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
      KVIndex.bootstrap(store, "ordck", df, Seq("o_custkey", "o_orderkey"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** A deliberately fragmented index — bootstrap of the low orderkey range
    * plus three out-of-range append batches (each commit writes exactly one
    * new file at these data sizes: four files total) — then `compact()`,
    * which rewrites the small files into one right-sized file. Backs the
    * driver-verified W6 structural-maintenance row (kv_compact): checksum
    * invariance + the 4 -> 1 file-count drop, with the pre-compact manifest
    * version read back through the store (versions are immutable history).
    */
  private def compactStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-compact", s, d) { store =>
      val ord = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      def slice(lo: Long, hi: Long) =
        ord.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      var ix = KVIndex.bootstrap(store, "cord", slice(0L, 100L), Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      for ((lo, hi) <- Seq((100L, 300L), (300L, 1000L), (1000L, Long.MaxValue)))
        ix = new KVIndex(store, ix.execute(Seq(Command.Insert(slice(lo, hi)))).orThrow)
      new KVIndex(store, ix.compact().orThrow)
    }

  /** vacuum() results per (kind|sfDir) — captured at build time because the
    * removed-counts cannot be re-derived after the files are gone.
    */
  private val vacResults = scala.collection.concurrent.TrieMap[String, (Int, Int)]()

  /** st_view_agg's driver-side input batches per sfDir (see the fixture). */
  private val viewAggBatches = scala.collection.concurrent.TrieMap[String,
    (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)], Seq[(Long, Long, Long)])]()

  /** st_sink_cdc's driver-side input batches per sfDir — same reuse
    * contract as [[viewAggBatches]]: the bench reps re-time the streaming
    * sink + CDC replay under test, not the parquet re-collect of the
    * identical deterministic inputs.
    */
  private val sinkCdcBatches = scala.collection.concurrent.TrieMap[String,
    (Seq[(Long, Double)], Seq[(Long, Double)], Seq[(Long, Double)])]()

  /** st_incr_ingest's driver-side input batches per sfDir (same contract). */
  private val incrIngestBatches = scala.collection.concurrent.TrieMap[String,
    (Seq[(Long, String)], Seq[(Long, String)])]()

  /** Same fragmented-then-compacted lifecycle as [[compactStore]], then
    * `vacuum(retain=1)`: manifests v0..v4 dropped (5) and the four
    * pre-compact data files swept (the compacted file is the only one the
    * kept manifest references). Backs the driver-verified GC row
    * (kv_vacuum): deterministic removal counts + checksum invariance of the
    * surviving snapshot.
    */
  private def vacuumStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-vacuum", s, d) { store =>
      val ord = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      def slice(lo: Long, hi: Long) =
        ord.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      var ix = KVIndex.bootstrap(store, "vord", slice(0L, 100L), Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      for ((lo, hi) <- Seq((100L, 300L), (300L, 1000L), (1000L, Long.MaxValue)))
        ix = new KVIndex(store, ix.execute(Seq(Command.Insert(slice(lo, hi)))).orThrow)
      ix = new KVIndex(store, ix.compact().orThrow)
      vacResults(s"kv-vacuum|$d") = store.vacuum("vord", retainVersions = 1, graceMs = 0L)
      KVIndex.open(store, "vord").fold(e => sys.error(e.message), identity)
    }

  /** SQL maintenance fixture (kv_sql_vacuum): the [[vacuumStore]]
    * fragmented-then-compacted lifecycle driven through the r19
    * maintenance STATEMENT HEADS — `COMPACT cat.t` merges the four
    * under-filled files into one (result row pinned), then `VACUUM cat.t
    * RETAIN 1 VERSIONS` (grace 0 via conf — the deterministic
    * maintenance-window sweep) drops manifests v0..v4 and sweeps the four
    * unreferenced pre-compact files. Counts are captured at build time
    * (not re-derivable once the files are gone), checksum invariance is
    * the driver row.
    */
  private def sqlVacStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-sqlvac", s, d) { store =>
      val ord = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      def slice(lo: Long, hi: Long) =
        ord.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      var ix = KVIndex.bootstrap(store, "svord", slice(0L, 100L), Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      for ((lo, hi) <- Seq((100L, 300L), (300L, 1000L), (1000L, Long.MaxValue)))
        ix = new KVIndex(store, ix.execute(Seq(Command.Insert(slice(lo, hi)))).orThrow)
      val cat = regCatalog(s, "sqlvac", d, store.root)
      val c = s.sql(s"COMPACT $cat.svord").collect()
      require(c.length == 1 && c.head.getBoolean(0) &&
        c.head.getLong(2) == 4 && c.head.getLong(3) == 1,
        s"kv_sql_vacuum: COMPACT must merge 4 files into 1, got ${c.mkString}")
      s.conf.set("spark.graft.sql.vacuum.graceMs", "0")
      try {
        // DRY RUN first (r20): reports the would-be counts without
        // touching the store — pinned equal to what the destructive
        // sweep then actually removes
        val dry = s.sql(s"VACUUM $cat.svord RETAIN 1 VERSIONS DRY RUN").collect()
        require(dry.length == 1, s"kv_sql_vacuum: one dry-run row, got ${dry.length}")
        val v = s.sql(s"VACUUM $cat.svord RETAIN 1 VERSIONS").collect()
        require(v.length == 1, s"kv_sql_vacuum: one result row, got ${v.length}")
        require(v.head.getLong(0) == dry.head.getLong(0) &&
          v.head.getLong(1) == dry.head.getLong(1),
          s"kv_sql_vacuum: DRY RUN (${dry.head}) must report the " +
            s"destructive run's counts (${v.head})")
        vacResults(s"kv-sqlvac|$d") = (v.head.getLong(0).toInt, v.head.getLong(1).toInt)
      } finally s.conf.unset("spark.graft.sql.vacuum.graceMs")
      KVIndex.open(store, "svord").fold(e => sys.error(e.message), identity)
    }

  /** SQL wall-clock time-travel fixture (kv_timestamp_asof): three
    * committed versions dual-stamped at KNOWN wall-clock instants (60 s /
    * 120 s / 180 s after the epoch — recordSnapshot's `wallMs`), so
    * `TIMESTAMP AS OF` can floor between them deterministically. Version
    * states: v1 = full cents table, v2 = zeroed cents under orderkey 50,
    * v3 = v2 minus orderkeys [100, 200).
    */
  private def tsAsOfStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-tsasof", s, d) { store =>
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = KVIndex.bootstrap(store, "tsord", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      store.recordSnapshot("tsord", v1.manifest.version, ts = 1000L, wallMs = 60L * 1000)
      val m2 = v1.execute(Seq(Command.Insert(
        ord.filter(col("o_orderkey") < 50).withColumn("cents", lit(0L)),
        upsert = true)), "tx-tsasof-v2").orThrow
      store.recordSnapshot("tsord", m2.version, ts = 2000L, wallMs = 120L * 1000)
      val m3 = new KVIndex(store, m2).execute(Seq(Command.Remove(
        ord.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
          .select("o_orderkey"))), "tx-tsasof-v3").orThrow
      store.recordSnapshot("tsord", m3.version, ts = 3000L, wallMs = 180L * 1000)
      new KVIndex(store, m3)
    }

  /** removeRange() removed-row count per (kind|sfDir), captured at build
    * time (not re-derivable once the files are gone).
    */
  private val rdResults = scala.collection.concurrent.TrieMap[String, Long]()

  /** Fragmented 4-file index (same bootstrap + three out-of-range appends
    * as [[compactStore]]: one file per commit at these data sizes), then
    * `removeRange([150, 1200])`: the interior file [300,1000) is dropped
    * from the manifest with ZERO IO, only the two boundary files are read
    * and rewritten, [0,100) is untouched — 3 files after. Backs the
    * driver-verified bulk-delete row (kv_range_delete).
    */
  private def rangeDelStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-rangedel", s, d) { store =>
      val ord = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      def slice(lo: Long, hi: Long) =
        ord.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      var ix = KVIndex.bootstrap(store, "rord", slice(0L, 100L), Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      for ((lo, hi) <- Seq((100L, 300L), (300L, 1000L), (1000L, Long.MaxValue)))
        ix = new KVIndex(store, ix.execute(Seq(Command.Insert(slice(lo, hi)))).orThrow)
      val res = ix.removeRange(Seq(150L), Seq(1200L))
      rdResults(s"kv-rangedel|$d") = res.commandRowCounts.headOption.getOrElse(0L)
      new KVIndex(store, res.orThrow)
    }

  /** Register a [[graft.sources.GraftCatalog]] over `root` under a name
    * unique per (kind, sfDir) — catalog instances are cached by name in
    * the session, so the name must pin one store root for the JVM's life
    * (warm-up at sf0.001 and the timed run at sf0.1 share a session).
    */
  private def regCatalog(s: SparkSession, kind: String, d: String, root: String): String = {
    val name = s"g$kind${math.abs(d.hashCode)}"
    s.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  /** SQL-surface delete fixture: orders keyed o_orderkey, then THREE
    * `DELETE FROM` statements through the catalog — a bounded
    * mixed-inclusivity range, an equality, and an open-above strict bound.
    * Each maps to the file-grain `removeRange` (metadata-only delete:
    * interior files drop with zero IO); the query row reports the
    * SURVIVING state via catalog SQL, so repeated invocations are
    * idempotent (deletes run once in the cached build).
    */
  private def sqlDelStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-sqldel", s, d) { store =>
      val ord = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      KVIndex.bootstrap(store, "dord", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      val cat = regCatalog(s, "sqldel", d, store.root)
      s.sql(s"DELETE FROM $cat.dord WHERE o_orderkey >= 200 AND o_orderkey < 900")
      s.sql(s"DELETE FROM $cat.dord WHERE o_orderkey = 32")
      s.sql(s"DELETE FROM $cat.dord WHERE o_orderkey > 1200")
      KVIndex.open(store, "dord").fold(e => sys.error(e.message), identity)
    }

  /** SQL-surface UPDATE fixture ([[graft.sources.GraftDmlStrategy]]):
    * three `UPDATE` statements through the catalog — a value rewrite on a
    * low range, a disjoint value rewrite on a mid range, and a KEY-MOVING
    * update (compiled to Remove+Insert in one atomic batch). Each commits
    * exactly one COW version touching only covering files; the oracle
    * replays the assignments as CASE expressions over the raw table.
    */
  private def sqlUpdStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-sqlupd", s, d) { store =>
      val ord = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      KVIndex.bootstrap(store, "uord", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      val cat = regCatalog(s, "sqlupd", d, store.root)
      s.sql(s"UPDATE $cat.uord SET o_custkey = o_custkey * 2 WHERE o_orderkey < 50")
      s.sql(s"UPDATE $cat.uord SET o_custkey = o_custkey + 1000000 " +
        "WHERE o_orderkey >= 100 AND o_orderkey < 500")
      s.sql(s"UPDATE $cat.uord SET o_orderkey = o_orderkey + 10000000 " +
        "WHERE o_orderkey >= 1000 AND o_orderkey < 1100")
      KVIndex.open(store, "uord").fold(e => sys.error(e.message), identity)
    }

  /** SQL-surface MERGE fixture: one `MERGE INTO` with all four clause
    * kinds — conditional matched DELETE, matched UPDATE, not-matched
    * INSERT, and a conditional NOT MATCHED BY SOURCE DELETE — compiled to
    * one atomic Remove+Update+Insert batch = ONE snapshot version. The
    * source is a shifted projection of the same table, so it mixes
    * matching and novel keys at every scale factor.
    */
  private def sqlMrgStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-sqlmrg", s, d) { store =>
      val ord = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      KVIndex.bootstrap(store, "mord", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      val cat = regCatalog(s, "sqlmrg", d, store.root)
      val v = s"mrg_src_${math.abs(d.hashCode)}"
      t(s, d, "orders").filter(col("o_orderkey") % 4 === 1)
        .select((col("o_orderkey") + 2).as("k"), (col("o_custkey") + 7).as("c"),
          col("o_totalprice").as("p"))
        .createOrReplaceTempView(v)
      s.sql(
        s"""MERGE INTO $cat.mord t USING $v s ON t.o_orderkey = s.k
           |WHEN MATCHED AND s.c % 5 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET o_custkey = s.c, o_orderstatus = 'M', o_totalprice = s.p
           |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice) VALUES (s.k, s.c, 'N', s.p)
           |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey < 10 THEN DELETE
           |""".stripMargin)
      KVIndex.open(store, "mord").fold(e => sys.error(e.message), identity)
    }

  /** [[sqlMrgStore]]'s probe-path twin (kv_probe_merge): the same
    * four-clause MERGE executed with broadcast disabled, so the
    * target×source full outer takes the PROBE-routed zip join
    * ([[graft.sources.GraftDml.probeMergeJoin]] — the arbitrary batch is
    * routed onto the snapshot's legs; the snapshot never shuffles). The
    * taken path is asserted, pinning the rewrite in the gate.
    */
  private def probeMrgStore(s: SparkSession, d: String): (SnapshotStore, KVIndex) =
    cachedIndex("kv-probemrg", s, d) { store =>
      val ord = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      KVIndex.bootstrap(store, "pmord", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
      val cat = regCatalog(s, "probemrg", d, store.root)
      val v = s"pmrg_src_${math.abs(d.hashCode)}"
      t(s, d, "orders").filter(col("o_orderkey") % 4 === 1)
        .select((col("o_orderkey") + 2).as("k"), (col("o_custkey") + 7).as("c"),
          col("o_totalprice").as("p"))
        .createOrReplaceTempView(v)
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        s.sql(
          s"""MERGE INTO $cat.pmord t USING $v s ON t.o_orderkey = s.k
             |WHEN MATCHED AND s.c % 5 = 0 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET o_custkey = s.c, o_orderstatus = 'M', o_totalprice = s.p
             |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice) VALUES (s.k, s.c, 'N', s.p)
             |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey < 10 THEN DELETE
             |""".stripMargin)
        require(graft.sources.GraftDml.lastMergeJoinPath == "probe",
          s"kv_probe_merge: expected the probe merge join, took " +
            s"'${graft.sources.GraftDml.lastMergeJoinPath}'")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      KVIndex.open(store, "pmord").fold(e => sys.error(e.message), identity)
    }

  /** lineitem at LINE grain keyed (l_orderkey, l_linenumber) — the
    * composite-keyed fact of the PREFIX co-range join demo
    * (kv_corange_prefix): the SQL join binds only the leading key
    * component, and legs are cut at prefix-group boundaries.
    */
  private def liLinesStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-lilines", s, d) { store =>
      // the synthetic lineitem is NOT unique on (orderkey, linenumber):
      // aggregate to that grain so the composite key honors the engine's
      // key-unique contract (bootstrap validates it)
      val li = t(s, d, "lineitem").groupBy("l_orderkey", "l_linenumber")
        .agg(sum(col("l_quantity")).as("qty"))
      KVIndex.bootstrap(store, "lilines", li, Seq("l_orderkey", "l_linenumber"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** Per-order as-of PROBES keyed (l_orderkey, probe_ln) where probe_ln =
    * max(l_linenumber) - 1 — the left side of the as-of co-range join
    * demos (kv_corange_asof*): single-line orders probe below every line
    * (unmatched), multi-line orders match their second-highest line.
    */
  private def liProbeStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-liprobe", s, d) { store =>
      val probe = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg((max(col("l_linenumber")) - lit(1)).cast("int").as("probe_ln"),
          count(lit(1)).as("n_lines"))
      KVIndex.bootstrap(store, "liprobe", probe, Seq("l_orderkey", "probe_ln"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** lineitem at LINE grain with DELIBERATELY FINE files (2048 rows) so
    * the eager-bounds demo (kv_sql_probe_prune) has a multi-file manifest
    * to prune even at small scale factors.
    */
  private def liLinesFineStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-lilines-fine", s, d) { store =>
      val li = t(s, d, "lineitem").groupBy("l_orderkey", "l_linenumber")
        .agg(sum(col("l_quantity")).as("qty"))
      val ix = KVIndex.bootstrap(store, "lilines", li,
        Seq("l_orderkey", "l_linenumber"), maxRowsPerFile = 2048)
        .fold(e => sys.error(e.message), identity)
      // registered ONCE per (jvm, sf): analyzing the multi-hundred-leg
      // stitch costs real driver time, and re-registering per query call
      // was kv_sql_view_prefix's whole bench cost
      ix.createOrReplaceView("graft_vpfx")
      ix
    }._2

  /** Orders at (o_custkey, order DATE) grain — the DATE-keyed right side
    * of the DATE-tolerance as-of idiom demo (kv_sql_asof_date).
    */
  private def ordDateStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-orddate", s, d) { store =>
      val rd = t(s, d, "orders")
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("rd"))
        .agg(count(lit(1)).as("n_ord"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      KVIndex.bootstrap(store, "orddate", rd, Seq("o_custkey", "rd"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** Per-customer DATE probes (last order date minus 7 days) keyed
    * (o_custkey, pd) — the left side of kv_sql_asof_date.
    */
  private def ordDateProbeStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-orddateprobe", s, d) { store =>
      val pr = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(date_sub(max(to_date(col("o_orderdate"))), 7).as("pd"))
      KVIndex.bootstrap(store, "ordprobe", pr, Seq("o_custkey", "pd"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** Event readings keyed (user_id, ts) — the TIMESTAMP-keyed right side
    * of the as-of join demo (kv_corange_asof_ts).
    */
  private def evReadStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-evread", s, d) { store =>
      val rd = events(s, d).groupBy(col("user_id"), col("ts"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      KVIndex.bootstrap(store, "evread", rd, Seq("user_id", "ts"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** Per-user probe instants (last event minus 30 min) keyed
    * (user_id, pts) — the left side of kv_corange_asof_ts.
    */
  private def evProbeStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-evprobe", s, d) { store =>
      val pr = events(s, d).groupBy(col("user_id"))
        .agg((max(col("ts")) - expr("INTERVAL 30 MINUTES")).as("pts"))
      KVIndex.bootstrap(store, "evprobe", pr, Seq("user_id", "pts"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** lineitem aggregated to order grain, keyed l_orderkey — the second
    * fact index of the co-located join demo (kv_colocated_join).
    */
  private def liAggStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-liagg", s, d) { store =>
      val li = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))
      KVIndex.bootstrap(store, "liagg", li, Seq("l_orderkey"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** orders restricted to keys NOT divisible by 3 — overlaps
    * [[liAggOddStore]] partially in BOTH directions (odd non-multiples of
    * 3 match; even non-multiples are left-only; odd multiples of 3 are
    * right-only), so kv_corange_full exercises every full-outer row class.
    */
  private def ordMod3Store(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-ord-mod3", s, d) { store =>
      val ord = t(s, d, "orders").filter(col("o_orderkey") % 3 =!= 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      KVIndex.bootstrap(store, "ordmod3", ord, Seq("o_orderkey"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** liagg restricted to ODD order keys — a key SUBSET of the orders
    * index, so the left-preserving co-range joins (kv_corange_left/anti)
    * have real unmatched keys to preserve.
    */
  private def liAggOddStore(s: SparkSession, d: String): KVIndex =
    cachedIndex("kv-liagg-odd", s, d) { store =>
      val li = t(s, d, "lineitem").filter(col("l_orderkey") % 2 === 1)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))
      KVIndex.bootstrap(store, "liaggodd", li, Seq("l_orderkey"))
        .fold(e => sys.error(e.message), identity)
    }._2

  /** Bucketed-export cache: catalog table names per (kind, sfDir), built
    * once per JVM — repeat bench iterations time the co-located JOIN, not
    * a re-export, no orphan temp dirs accumulate, and the UUID-suffixed
    * names make the queries reentrant (fixed names overwritten per
    * invocation were neither).
    */
  private val bucketCache = scala.collection.concurrent.TrieMap[String, (String, String)]()
  private def cachedBucketPair(kind: String, d: String)(
      build: (String, String, String) => Unit): (String, String) =
    bucketCache.getOrElseUpdate(s"$kind|$d", {
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val names = (s"graft_${kind}_a_$tag", s"graft_${kind}_b_$tag")
      val p = java.nio.file.Files.createTempDirectory(s"graft-$kind").toString
      build(names._1, names._2, p)
      names
    })

  /** Benchmark warm-up: absorb every one-time cost so per-query bench
    * numbers measure the QUERY, not whichever query happened to run first —
    * (a) the kv-store lifecycles for `d` (bootstrap + upsert + split +
    * compact are shared fixtures, not per-query work), and (b) one pass of
    * every query at the smallest SF, which compiles the same codegen'd
    * kernels (the fused HOF expressions alone cost ~7 s on first use) and
    * exercises every plan shape against sf0.001-sized inputs.
    */
  def warmup(s: SparkSession, d: String,
             warmSf: String = "/root/testdata/sf0.001"): Unit = {
    try { liStore(s, d); bytesStore(s, d); ckStore(s, d)
          compactStore(s, d); vacuumStore(s, d); rangeDelStore(s, d)
          liAggStore(s, d) }
    catch { case _: Throwable => () }
    queries.foreach { case (_, fn) =>
      try fn(s, warmSf).count() catch { case _: Throwable => () }
    }
  }

  // =====================================================================
  // The operator inventory. Key: SURVEY §2 ids.
  // =====================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- snapshot-store lifecycle, oracle-verified end to end ----
    "kv_point" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      // manifest-pruned point read: opens only the file(s) covering the key
      ix.get(Seq(142L)).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
    }),
    // SQL-visible snapshot: the store-built index registered as a temp
    // view, queried with PURE spark.sql text (range predicate + projection
    // — pushed into the snapshot's per-file scans). A reference user's
    // "query my index" call becomes a SQL statement.
    "kv_sql_view" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      ix.createOrReplaceView("graft_ord_snapshot")
      s.sql("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
               FROM graft_ord_snapshot
               WHERE o_orderkey BETWEEN 100 AND 200
               ORDER BY o_orderkey""")
    }),
    // the SAME snapshot as a first-class DataSource V2 table:
    // spark.read.format("graft") with the manifest file prune running as
    // DSv2 filter pushdown (graft.sources.GraftDataSource) — what a
    // catalog user gets without touching the library API
    "kv_dsv2" -> ((s, d) => {
      val (store, _) = liStore(s, d)
      s.read.format("graft").option("root", store.root).load("ord")
        .filter(col("o_orderkey").between(100L, 200L))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    }),
    // SQL DELETE at file grain through the catalog (SupportsDelete →
    // removeRange), surviving state read back via catalog SQL; the
    // count/min/max SELECT collapses to ONE manifest-stat row (aggregate
    // pushdown — zero files scanned), the checksum SELECT takes the scan
    "kv_sql_delete" -> ((s, d) => {
      val (store, _) = sqlDelStore(s, d)
      val cat = regCatalog(s, "sqldel", d, store.root)
      s.sql(s"SELECT count(*) AS n, min(o_orderkey) AS mn, " +
          s"max(o_orderkey) AS mx FROM $cat.dord")
        .crossJoin(s.sql("SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) " +
          s"AS BIGINT)) AS DOUBLE) / 100.0 AS checksum FROM $cat.dord"))
    }),
    // SQL UPDATE through the catalog (GraftDmlStrategy → atomic command
    // batches): disjoint value rewrites + a key-moving update, surviving
    // state summarized; the oracle replays the assignments as CASEs
    "kv_sql_update" -> ((s, d) => {
      val (store, _) = sqlUpdStore(s, d)
      val cat = regCatalog(s, "sqlupd", d, store.root)
      s.sql(s"SELECT count(*) AS n, min(o_orderkey) AS mn, max(o_orderkey) AS mx, " +
        s"sum(o_custkey) AS cust_sum, " +
        s"sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents FROM $cat.uord")
    }),
    // SQL MERGE INTO through the catalog — all four clause kinds in ONE
    // atomic batch (= one snapshot version); per-status summary of the
    // merged state, the oracle rebuilds it from tgt/src set algebra
    "kv_sql_merge" -> ((s, d) => {
      val (store, _) = sqlMrgStore(s, d)
      val cat = regCatalog(s, "sqlmrg", d, store.root)
      s.sql(s"SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS cust_sum, " +
        s"sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents " +
        s"FROM $cat.mord GROUP BY o_orderstatus ORDER BY o_orderstatus")
    }),
    // the SAME four-clause MERGE but with the snapshot too big to
    // broadcast: the target×source full outer takes the PROBE-routed zip
    // join — the batch moves, the table never does (the 100 TB ingest
    // shape; GraftDml.probeMergeJoin). Path telemetry is asserted, so
    // this row pins the probe merge in the correctness gate.
    "kv_probe_merge" -> ((s, d) => {
      val (store, _) = probeMrgStore(s, d)
      val cat = regCatalog(s, "probemrg", d, store.root)
      s.sql(s"SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS cust_sum, " +
        s"sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents " +
        s"FROM $cat.pmord GROUP BY o_orderstatus ORDER BY o_orderstatus")
    }),
    // A1/A2 served to SQL: count(*)/min/max over an untouched catalog
    // table answer from manifest stats alone (complete agg pushdown)
    "kv_sql_stats" -> ((s, d) => {
      val (store, _) = liStore(s, d)
      val cat = regCatalog(s, "kvstats", d, store.root)
      s.sql(s"SELECT count(*) AS n, min(o_orderkey) AS mn, " +
        s"max(o_orderkey) AS mx FROM $cat.ord")
    }),
    // count(*) under a leading-key range WHERE answers at MANIFEST cost
    // (GraftCountRange): interior files from stats, only the ≤2 boundary
    // files scanned — the SQL twin of kv_count_range. The plan shape is
    // asserted (the boundary telemetry must show ≤2 planned files), so
    // this row pins the rewrite in the correctness gate.
    "kv_sql_count_range" -> ((s, d) => {
      val (store, _) = liStore(s, d)
      val cat = regCatalog(s, "kvcntr", d, store.root)
      graft.sources.GraftScan.lastPlannedFiles = -1
      val q = s.sql(s"SELECT count(*) AS n, min(o_orderkey) AS mn, " +
        s"max(o_orderkey) AS mx FROM $cat.ord " +
        "WHERE o_orderkey >= 100 AND o_orderkey < 5000")
      q.queryExecution.executedPlan
      val planned = graft.sources.GraftScan.lastPlannedFiles
      require(planned >= 0 && planned <= 2,
        s"kv_sql_count_range: expected a manifest-served count with at most " +
          s"2 boundary files, planned $planned")
      q
    }),
    "kv_range" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      ix.range(Seq(100L), Seq(200L), incFrom = true, incTo = false)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    }),
    "kv_cow_upsert" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      ix.df.agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("price_sum"))
    }),
    // incrementally-maintained aggregate view: refresh applies the COW
    // diff (unshared files only), the oracle recomputes from scratch —
    // hash equality IS the incremental-== -recompute contract
    "kv_agg_view" -> ((s, d) =>
      maggView(s, d).df
        .select(col("o_custkey"), col("agg_sum"), col("agg_cnt"))
        .orderBy("o_custkey")),
    // incrementally-maintained JOIN view: created by the zip join,
    // refreshed from BOTH sources' COW diffs (changed keys only, sliced
    // by the changed-key envelope) — the oracle recomputes the join from
    // scratch over the mutated tables
    "kv_join_view" -> ((s, d) =>
      joinViewStore(s, d).df
        .filter(col("o_orderkey") <= 400)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"),
          col("qty").cast("long").as("qty"), col("n_lines"))
        .orderBy("o_orderkey")),
    // IVM from SQL TEXT (r18, GraftMatView + GraftSqlParser): CREATE
    // MATERIALIZED VIEW compiles onto MaterializedAgg, the source mutates
    // through the command API, and REFRESH MATERIALIZED VIEW applies the
    // COW diff — the oracle is the from-scratch recompute of the mutated
    // table (the kv_agg_view contract, reachable from SQL text)
    "kv_sql_mat_view" -> ((s, d) => {
      val ix = sqlMvView(s, d)
      s.conf.set("spark.sql.catalog.graft_mv", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_mv.root", ix.store.root)
      s.sql("""SELECT o_custkey, sum_cents, agg_cnt, min_cents, max_cents
               FROM graft_mv.mvagg ORDER BY o_custkey""")
    }),
    // FILTERED materialized view (r19): `CREATE MATERIALIZED VIEW ... FROM
    // cat.src WHERE cents >= 100000 GROUP BY g` — the WHERE rides the view
    // spec and filters create AND every refresh diff side, so mutations
    // moving rows across the predicate boundary maintain exactly; the
    // oracle is the filtered from-scratch recompute of the mutated table
    "kv_sql_mat_view_where" -> ((s, d) => {
      val ix = sqlMvWhereView(s, d)
      val cat = regCatalog(s, "sqlmvw", d, ix.store.root)
      s.sql(s"""SELECT o_custkey, sum_cents, agg_cnt, min_cents, max_cents
               FROM $cat.mvwagg ORDER BY o_custkey""")
    }),
    // multi-column + min/max view: two sums ride one ± pass, min/max of
    // cents recomputes from the source for TOUCHED groups only; the
    // oracle is again the from-scratch recompute of the mutated table
    "kv_agg_view_mm" -> ((s, d) =>
      maggMmView(s, d).df
        .select(col("o_custkey"), col("sum_cents"), col("sum_points"),
          col("agg_cnt"), col("min_cents"), col("max_cents"))
        .orderBy("o_custkey")),

    "kv_split" -> ((s, d) => {
      import s.implicits._
      // REAL library split: median located via manifest cumulative row
      // counts (one file read), files reassigned wholesale — then the
      // resulting manifests' stats are checked against the SQL oracle
      val (_, ix) = liStore(s, d)
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val (lm, rm) = ix.split(s"spl_l_$tag", s"spl_r_$tag")
        .fold(e => sys.error(e.message), identity)
      Seq((lm.numElements, rm.numElements,
        lm.files.head.min.head.asInstanceOf[Long],
        lm.files.last.max.head.asInstanceOf[Long]))
        .toDF("n_left", "n_right", "left_min", "left_max")
    }),
    // binary (Array[Byte]) keys END TO END: bootstrap → manifest stats with
    // byte-range min/max → pruned range scan, all on unsigned-lex BinaryType
    "kv_bytes_range" -> ((s, d) => {
      val ix = bytesStore(s, d)
      // all keys with status 'O': ["O/", "O0") — '0' is '/'+1 in ASCII
      ix.range(Seq("O/".getBytes("UTF-8")), Seq("O0".getBytes("UTF-8")),
          incFrom = true, incTo = false)
        .select(hex(col("bk")).as("key_hex"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("key_hex")
    }),
    // getAll(mustFindAll=true) KEY_NOT_FOUND path — reference
    // `GetMultipleKeysSpec.scala:203-222`: one absent key fails the batch
    // and reports the miss count, found rows still enumerable
    "kv_getall_missing" -> ((s, d) => {
      import s.implicits._
      val (_, ix) = liStore(s, d)
      val r = ix.getAll(Seq(Seq(1L), Seq(2L), Seq(999999999L)), mustFindAll = true)
      Seq((r.error.map(_.code).getOrElse(""), r.missing,
        if (r.success) 1L else 0L, r.found.count()))
        .toDF("code", "missing", "ok", "n_found")
    }),
    "kv_temporal" -> ((s, d) => {
      val (store, _) = liStore(s, d)
      val v1 = KVIndex.openAt(store, "ord", 1500L).fold(e => sys.error(e.message), identity)
      v1.df.agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("price_sum"))
    }),
    // SQL TIME TRAVEL on the WALL CLOCK (r19): `TIMESTAMP AS OF` floors
    // onto the dual-stamped history (the T3 findAt semantics, incl. the
    // earliest-entry clamp) — three instants straddling three commits
    // read three different versions, and the oracle replays each state
    // from the base table. VERSION AS OF has been SQL-reachable since
    // r14; this closes the wall-clock half.
    "kv_timestamp_asof" -> ((s, d) => {
      val (store, _) = tsAsOfStore(s, d)
      val cat = regCatalog(s, "tsasof", d, store.root)
      def at(tag: String, instant: String) =
        s.sql(s"SELECT '$tag' AS tag, count(*) AS n, sum(cents) AS cents_sum " +
          s"FROM $cat.tsord TIMESTAMP AS OF '$instant'")
      at("v1", "1970-01-01 00:00:30") // before the first stamp: clamps to v1
        .unionAll(at("v2", "1970-01-01 00:02:30")) // between stamps: floors to v2
        .unionAll(at("v3", "1970-01-01 00:03:30")) // after the last: v3
    }),
    // MATERIALIZED-VIEW TIME TRAVEL (r20): MV lifecycle commits are
    // dual-stamped, so catalog `TIMESTAMP AS OF` re-opens the view's
    // pre-refresh aggregate — the oracle replays both states from the
    // base table. Instants come from SHOW HISTORY via timestamp_millis
    // (timezone-free), with the fixture enforcing distinct stamps.
    "kv_mv_asof" -> ((s, d) => {
      val (cat, w1, w2) = mvAsOfView(s, d)
      def at(tag: String, ms: Long) =
        s.sql(s"SELECT '$tag' AS tag, count(*) AS n, " +
          s"CAST(sum(agg_sum) AS BIGINT) AS total " +
          s"FROM $cat.mvasof FOR TIMESTAMP AS OF timestamp_millis($ms)")
      at("pre", w1).unionAll(at("post", w2))
    }),
    // VIEW-path TIME TRAVEL (r20, plans/ViewTimeTravel + GraftSqlParser):
    // the same three wall-clock instants through a REGISTERED SNAPSHOT
    // VIEW — Spark's analyzer refuses time travel on temp views, so the
    // clause is spliced at parse time into a fresh ordered stitch over
    // the floored snapshot (findIndexAtWall, a manifest-log lookup that
    // reads no data files). Same oracle replay as the catalog row.
    "kv_view_asof" -> ((s, d) => {
      val (store, ix) = tsAsOfStore(s, d)
      ix.createOrReplaceView("graft_vasof")
      def at(tag: String, instant: String) =
        s.sql(s"SELECT '$tag' AS tag, count(*) AS n, sum(cents) AS cents_sum " +
          s"FROM graft_vasof FOR TIMESTAMP AS OF '$instant'")
      at("v1", "1970-01-01 00:00:30")
        .unionAll(at("v2", "1970-01-01 00:02:30"))
        .unionAll(at("v3", "1970-01-01 00:03:30"))
    }),
    // W6 structural maintenance as a driver row: fragmented 4-file index
    // compacted to 1 file, contents invariant (checksum columns), the
    // pre-compact file count read back from the immutable version history
    "kv_compact" -> ((s, d) => {
      import s.implicits._
      val (store, ix) = compactStore(s, d)
      val before = store.loadVersion("cord", ix.manifest.version - 1).files.size
      val r = ix.df.agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("price_sum")).head()
      Seq((r.getLong(0), r.getDouble(1), before.toLong, ix.numFiles.toLong))
        .toDF("n", "price_sum", "files_before", "files_after")
    }),
    // S1 over the SNAPSHOT layout: manifest-ordered per-file stitch, no
    // sort exchange anywhere in the plan (the flat-file analogue of the
    // reference's free in-order tree walk) — vs s1_inorder, which is the
    // declarative sorted scan over a bare table
    "kv_inordered" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      ix.inOrdered().select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
    }),
    // S3 over the snapshot layout: reads only the manifest-prefix of files
    // covering the first 100 rows — O(n) input regardless of index size
    "kv_head_ordered" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      ix.headOrdered(100).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
    }),
    // P4/P5 through the SNAPSHOT store: successor/predecessor read exactly
    // ONE file, located via manifest stats
    "kv_next_key" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      ix.nextKey(Seq(41L)).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
    }),
    "kv_prev_key" -> ((s, d) => {
      val (_, ix) = liStore(s, d)
      ix.previousKey(Seq(42L)).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
    }),
    // S7/S5 through the SNAPSHOT store: manifest prunes to the prefix's /
    // bound's covering files, predicate pushed into those scans, no sort
    // exchange (composite key (o_custkey, o_orderkey))
    "kv_prefix" -> ((s, d) =>
      ckStore(s, d).prefix(Seq(7L)).select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))),
    "kv_lt" -> ((s, d) =>
      ckStore(s, d).lt(Seq(3L, 50L), inclusive = true)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))),
    // GC: mark-and-sweep vacuum after compaction — deterministic removal
    // counts (5 old manifests incl. the empty v0, 4 unreferenced files)
    // and the surviving snapshot's data untouched
    "kv_vacuum" -> ((s, d) => {
      import s.implicits._
      val (_, ix) = vacuumStore(s, d)
      val (mRemoved, fDeleted) = vacResults(s"kv-vacuum|$d")
      val r = ix.df.agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("price_sum")).head()
      Seq((r.getLong(0), r.getDouble(1), mRemoved.toLong, fDeleted.toLong))
        .toDF("n", "price_sum", "m_removed", "f_deleted")
    }),
    // MAINTENANCE FROM SQL TEXT (r19, GraftMaintenance + GraftSqlParser):
    // the same compact-then-GC lifecycle as kv_vacuum driven through
    // `COMPACT cat.t` (4 files → 1, result row pinned in the fixture) and
    // `VACUUM cat.t RETAIN 1 VERSIONS` — deterministic removal counts
    // come back as the statements' OWN result rows, checksum invariance
    // of the surviving snapshot is this driver row
    "kv_sql_vacuum" -> ((s, d) => {
      import s.implicits._
      val (_, ix) = sqlVacStore(s, d)
      val (mRemoved, fDeleted) = vacResults(s"kv-sqlvac|$d")
      val r = ix.df.agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("price_sum")).head()
      Seq((r.getLong(0), r.getDouble(1), mRemoved.toLong, fDeleted.toLong))
        .toDF("n", "price_sum", "m_removed", "f_deleted")
    }),
    // U3 copy: zero-copy clone — same element count, same data files SHARED
    // byte for byte (no data moved), fresh id/lineage
    "kv_clone" -> ((s, d) => {
      import s.implicits._
      val (_, ix) = liStore(s, d)
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val cm = ix.copyTo(s"clone_$tag").fold(e => sys.error(e.message), identity)
      val shared = cm.files.map(_.path) == ix.manifest.files.map(_.path)
      Seq((cm.numElements, if (shared) 1L else 0L, ix.count))
        .toDF("n_clone", "files_shared", "n_orig")
    }),

    // ---- §2.1 point lookups ----
    "p1_get" -> ((s, d) => proj(ordersPk(s, d).get(Seq(42L)))),
    "p2_getall" -> ((s, d) => {
      import s.implicits._
      val keys = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L).toDF("o_orderkey")
      proj(ordersPk(s, d).getAll(keys).found).orderBy("o_orderkey")
    }),
    "p4_next_key" -> ((s, d) => proj(ordersPk(s, d).nextKey(Seq(41L)))),
    "p5_prev_key" -> ((s, d) => proj(ordersPk(s, d).previousKey(Seq(42L)))),

    // ---- §2.2 scans / ranges ----
    "s1_inorder" -> ((s, d) =>
      ordersKv(s, d).inOrder().select("o_custkey", "o_orderkey")),
    "s2_reverse" -> ((s, d) =>
      ordersKv(s, d).reverseScan().select("o_custkey", "o_orderkey")),
    "s3_head" -> ((s, d) => proj(ordersKv(s, d).head(100))),
    "s3_tail" -> ((s, d) => proj(ordersKv(s, d).tail(100))),
    "s4_asc_seek" -> ((s, d) =>
      proj(ordersKv(s, d).asc(Seq(50L, 0L), inclusive = true).limit(200))),
    "s4_desc_seek" -> ((s, d) =>
      proj(ordersKv(s, d).desc(Seq(50L, 0L), inclusive = false).limit(200))),
    "s5_gt" -> ((s, d) =>
      proj(ordersKv(s, d).gt(Seq(145L, 0L), inclusive = false))),
    "s5_lt" -> ((s, d) =>
      proj(ordersKv(s, d).lt(Seq(3L, 50L), inclusive = true))),
    "s6_range" -> ((s, d) =>
      proj(ordersKv(s, d).range(Seq(10L, 0L), Seq(12L, Long.MaxValue),
        incFrom = false, incTo = true))),
    "s6_range_rev" -> ((s, d) =>
      proj(ordersKv(s, d).range(Seq(10L, 0L), Seq(12L, Long.MaxValue),
        incFrom = true, incTo = false, reverse = true))),
    "s7_prefix" -> ((s, d) => proj(ordersKv(s, d).prefix(Seq(7L)))),
    "s7_prefix_rev" -> ((s, d) =>
      proj(ordersKv(s, d).prefix(Seq(7L), reverse = true))),
    "s8_prefix_gt" -> ((s, d) =>
      proj(ordersKv(s, d).prefixGt(Seq(7L), Seq(7L, 700L), inclusive = false))),
    "s8_prefix_lt" -> ((s, d) =>
      proj(ordersKv(s, d).prefixLt(Seq(7L), Seq(7L, 700L), inclusive = true))),
    // keyset pagination — the reference's iterator-resume pattern
    // (asc(term, inclusive=false) from the last key of the previous page,
    // QueryableIndex.scala:167-251): page 3 of 20 over (custkey, orderkey)
    "s12_keyset_page" -> ((s, d) => {
      val tbl = ordersKv(s, d)
      val boundary = tbl.head(40).orderBy(col("o_custkey").desc, col("o_orderkey").desc)
        .select("o_custkey", "o_orderkey").limit(1).head()
      proj(tbl.asc(Seq(boundary.getLong(0), boundary.getLong(1)), inclusive = false)
        .limit(20))
    }),
    // streaming pull surface (reference RichAsyncIndexIterator): resume
    // after a seek key, filter pushed into the scan, consumer-driven early
    // stop. Runs on the manifest-backed index: seek skips whole files via
    // manifest stats, and adjacent files batch into ramped pull jobs — the
    // take(25) below computes only the first small batch, never a global
    // sort of the table
    "s13_iterator_pull" -> ((s, d) => {
      val tbl = ckStore(s, d)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        tbl.df.schema("o_custkey"), tbl.df.schema("o_orderkey"),
        tbl.df.schema("o_totalprice")))
      val pulled = tbl.pullIterator(
          pred = col("o_orderstatus") === "F", seek = Some(Seq(10L, 0L)))
        .take(25)
        .map(r => org.apache.spark.sql.Row(
          r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
          r.getAs[Double]("o_totalprice")))
        .toSeq
      s.createDataFrame(s.sparkContext.parallelize(pulled, 1), schema)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "s9_topk" -> ((s, d) =>
      OrderedTable(t(s, d, "orders"),
        KeySpec("o_totalprice", "o_orderkey")).topK(50, reverse = true)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")),
    "s10_filter_scan" -> ((s, d) =>
      proj(ordersKv(s, d).scanWhere(
        col("o_orderstatus") === "O" && col("o_totalprice") > 50000))),

    // ---- §2.3 aggregation surface ----
    "a1_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("cnt"))),
    "a2_min_max" -> ((s, d) =>
      t(s, d, "orders").agg(min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))),
    "a4_subtree_counts" -> ((s, d) =>
      t(s, d, "orders").groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy("o_custkey")),

    // ---- §2.6 write-path semantics as pure transforms (full store path
    //      with CAS + error taxonomy is exercised in the test suite) ----
    "w1_insert_upsert" -> ((s, d) => {
      val cur = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val batch = s.range(0, 100).select(col("id").as("o_orderkey"),
        lit(1.0).as("o_totalprice"))
      val res = cur.join(batch, Seq("o_orderkey"), "left_anti").unionByName(batch)
      res.agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("checksum"))
    }),
    "w2_update_cas" -> ((s, d) => {
      // CAS analogue on data: bump price only where the stored "version"
      // (o_orderstatus) matches the expected 'O'
      val cur = t(s, d, "orders")
      val updated = cur.withColumn("o_totalprice",
        when(col("o_orderkey").between(100, 199) && col("o_orderstatus") === "O",
          col("o_totalprice") * 2).otherwise(col("o_totalprice")))
      updated.agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("checksum"))
    }),
    "w3_remove" -> ((s, d) => {
      val cur = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val keys = s.range(0, 100).select(col("id").as("o_orderkey"))
      cur.join(keys, Seq("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("checksum"))
    }),

    // ---- §2.5 whole-index ops ----
    "u1_merge" -> ((s, d) => {
      val left = ordersKv(s, d).lt(Seq(75L, 0L), inclusive = false)
      val right = ordersKv(s, d).gt(Seq(75L, 0L), inclusive = true)
      left.unionByName(right)
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("checksum"))
    }),
    "u2_split" -> ((s, d) => {
      import s.implicits._
      // the REAL library split on a (custkey, orderkey)-keyed index: the
      // median is located via manifest cumulative row counts and ONE file
      // read (KVIndex.split) — no global single-reducer window. The left
      // half's stats come straight off its manifest: numElements, first
      // file's min key, last file's max key (files are range-sorted).
      val ix = ckStore(s, d)
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val (lm, _) = ix.split(s"u2l_$tag", s"u2r_$tag")
        .fold(e => sys.error(e.message), identity)
      Seq((lm.numElements,
        lm.files.head.min.head.asInstanceOf[Long],
        lm.files.last.max.head.asInstanceOf[Long]))
        .toDF("n", "min_ck", "max_ck")
    }),

    // ---- §2.8 temporal ----
    "t3_floor_lookup" -> ((s, d) =>
      t(s, d, "events")
        .filter(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("user_id"))
        .agg(unix_millis(max(col("ts"))).as("last_ts"),
          count(lit(1)).as("n_before"))
        .orderBy("user_id")),
    "t5_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("sg_ts"))
      graft.operators.AsOfJoin.join(errors, signups, "user_id", "err_ts", "sg_ts", Nil)
        .select(col("err_id"), col("user_id"), unix_millis(col("asof_ts")).as("asof_ts"))
        .orderBy("err_id")
    }),

    // ---- engine extensions: aggregation / join / window (§2.3-2.4,
    //      absent in reference, Catalyst built-ins) ----
    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q3_join" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q5_multi_join" -> ((s, d) => {
      // revenue per nation: 5-way join, dimensions broadcast
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name")
    }),
    "q_semi_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("c_custkey"))
      val withBig = c.join(o, Seq("c_custkey"), "left_semi")
      val withoutBig = c.join(o, Seq("c_custkey"), "left_anti")
      withBig.agg(count(lit(1)).as("n_with")).crossJoin(
        withoutBig.agg(count(lit(1)).as("n_without")))
    }),
    "q_having" -> ((s, d) =>
      t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey")),
    "q_window2" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, d, "orders").filter(col("o_custkey") < 5)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
          lead(col("o_orderkey"), 1).over(w).as("next_ok"),
          rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("price_rank"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "q_json" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"), round(avg(col("k")), 6).as("avg_k"))
        .orderBy("event_type")),
    "q_percentile" -> ((s, d) =>
      t(s, d, "orders").agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))),
    "q_month_agg" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(unix_millis(date_trunc("month", col("o_orderdate"))).as("month_ms"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("month_ms")),
    "q_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),
    "q_setops" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_custkey"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val both = big.intersect(recent)
      val onlyBig = big.distinct().exceptAll(recent.distinct())
      both.agg(count(lit(1)).as("n_both")).crossJoin(
        onlyBig.agg(count(lit(1)).as("n_only_big")))
    }),
    "q_distinct" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))),
    "q_window" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, d, "orders").filter(col("o_custkey") < 10)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- streaming twins (§2.9; identical transform runs on readStream,
    //      proven in the test suite) ----
    "st_window_counts" -> ((s, d) =>
      EventStreams.windowedCounts(t(s, d, "events"))
        .select(unix_millis(col("window_start")).as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")),
    "st_stream_live" -> ((s, d) =>
      EventStreams.windowedCountsLive(s, s"$d/events.parquet")
        .select(unix_millis(col("window_start")).as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")),
    "st_ingest_store" -> ((s, d) => {
      // stream the events table through the versioned store (one COW
      // snapshot per micro-batch), then aggregate the final snapshot —
      // verifies streaming ingest end to end against the oracle
      val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
      val store = new FsSnapshotStore(root, s)
      val stream = EventStreams.readEventStream(s, s"$d/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val q = EventStreams.streamIntoIndex(stream, store, "ev", Seq("event_id"))
      try { q.processAllAvailable() } finally { q.stop() }
      KVIndex.open(store, "ev").fold(e => sys.error(e.message), identity)
        .df.agg(count(lit(1)).as("n"), EventStreams.exactCentSum(col("value")).as("sum_value"))
    }),
    // streaming ingest with per-batch incremental dedup: two micro-batches
    // through a MemoryStream (batch 2 carries clones of every 5th batch-1
    // doc under new ids) → the snapshot must hold exactly one row per
    // distinct text ever streamed, first writer winning. The driver-side
    // collect feeds the MEMORY SOURCE only — the dedup itself runs the
    // distributed bloom-split path per batch.
    "st_incr_ingest" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val (lower, upper) = incrIngestBatches.getOrElseUpdate(d, {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        (docs.filter(col("doc_id") < 250).as[(Long, String)].collect().toSeq,
          docs.filter(col("doc_id") >= 250).as[(Long, String)].collect().toSeq)
      })
      val clones = lower.filter(_._1 % 5 == 0)
        .map { case (id, tx) => (id + 10000L, tx) }
      val root = java.nio.file.Files.createTempDirectory("graft-incr-ingest")
      val store = new FsSnapshotStore(root.toString, s)
      val input = MemoryStream[(Long, String)](s)
      val q = EventStreams.streamDedupIngest(
        input.toDF().toDF("doc_id", "text"), store, "docs", Seq("doc_id"))
      try {
        input.addData(lower.toSeq)
        q.processAllAvailable()
        input.addData((upper ++ clones).toSeq)
        q.processAllAvailable()
        // eager: the temp store is deleted below, so materialize first
        val r = KVIndex.open(store, "docs").fold(e => sys.error(e.message), identity)
          .df.agg(count(lit(1)).as("n_rows"),
            count_distinct(col("text")).as("n_texts"),
            max(col("doc_id")).as("max_id")).head()
        Seq((r.getLong(0), r.getLong(1), r.getLong(2)))
          .toDF("n_rows", "n_texts", "max_id")
      } finally { q.stop(); deleteRec(root) }
    }),
    // streaming sink -> CDC source roundtrip: three micro-batches commit
    // through writeStream.format("graft") (bootstrap, insert, upsert),
    // one library removeRange, and readStream.format("graft") replays the
    // whole version history as (added / changed / removed) change rows —
    // each CDC batch costs O(changed data) because diff skips COW-shared
    // files; the query reports per-label counts + cent-exact sums
    "st_sink_cdc" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val (b1, b2, b3) = sinkCdcBatches.getOrElseUpdate(d, {
        val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        (ord.filter(col("o_orderkey") <= 500).as[(Long, Double)].collect().toSeq,
          ord.filter(col("o_orderkey") > 500 && col("o_orderkey") <= 1000)
            .as[(Long, Double)].collect().toSeq,
          ord.filter(col("o_orderkey") < 100)
            .select(col("o_orderkey"), (col("o_totalprice") + 1).as("p"))
            .as[(Long, Double)].collect().toSeq)
      })
      val root = java.nio.file.Files.createTempDirectory("graft-sinkcdc")
      val cp = java.nio.file.Files.createTempDirectory("graft-sinkcdc-cp")
      val store = new FsSnapshotStore(root.toString, s)
      val input = MemoryStream[(Long, Double)](s)
      val sink = input.toDF().toDF("o_orderkey", "o_totalprice").writeStream
        .format("graft").option("root", root.toString).option("keys", "o_orderkey")
        .option("checkpointLocation", cp.toString)
        .start("sord")
      val qname = "cdc" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      var cdcQ: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        input.addData(b1); sink.processAllAvailable() // v1: bootstrap
        cdcQ = s.readStream.format("graft").option("root", root.toString).load("sord")
          .writeStream.format("memory").queryName(qname).outputMode("append").start()
        cdcQ.processAllAvailable() // initial batch: b1 as `added`
        input.addData(b2); sink.processAllAvailable(); cdcQ.processAllAvailable()
        input.addData(b3); sink.processAllAvailable(); cdcQ.processAllAvailable()
        val ix = KVIndex.open(store, "sord").fold(e => sys.error(e.message), identity)
        val rr = ix.removeRange(Seq(200L), Seq(300L))
        require(rr.success, s"removeRange failed: ${rr.error}")
        cdcQ.processAllAvailable()
        val rows = s.table(qname).groupBy("_change")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).cast("long").as("cents"))
          .orderBy("_change")
          .as[(String, Long, Long)].collect().toSeq // eager: temp store dies below
        rows.toDF("_change", "n", "cents")
      } finally {
        sink.stop(); if (cdcQ != null) cdcQ.stop()
        s.catalog.dropTempView(qname)
        deleteRec(root); deleteRec(cp)
      }
    }),
    // streaming-maintained materialized view: each micro-batch commits one
    // COW version through the graft sink, and MaterializedAgg.refresh
    // rolls the aggregate view forward from the version diff alone (the
    // table is never rescanned after bootstrap). The oracle recomputes
    // the final aggregate from scratch — hash equality proves the chain
    // of incremental refreshes converges to the true state
    "st_view_agg" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      // input batches collected ONCE per (JVM, sfDir): the bench runs the
      // fixture 3×, and re-collecting the same orders projection per rep
      // times the parquet read, not the streaming-ingest + IVM pipeline
      // under test (the same reuse contract as cachedIndex's stores).
      // The r20 probe (graft.ProbeViewAgg) put this at ~0.4-4 s/rep.
      val (b1, b2, b3) = viewAggBatches.getOrElseUpdate(d, {
        val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        (ord.filter(col("o_orderkey") <= 500)
          .as[(Long, Long, Long)].collect().toSeq,
          ord.filter(col("o_orderkey") > 500 && col("o_orderkey") <= 1000)
            .as[(Long, Long, Long)].collect().toSeq,
          ord.filter(col("o_orderkey") < 100)
            .select(col("o_orderkey"), col("o_custkey"), (col("cents") + 1).as("cents"))
            .as[(Long, Long, Long)].collect().toSeq)
      })
      val root = java.nio.file.Files.createTempDirectory("graft-viewagg")
      val cp = java.nio.file.Files.createTempDirectory("graft-viewagg-cp")
      val store = new FsSnapshotStore(root.toString, s)
      val input = MemoryStream[(Long, Long, Long)](s)
      val sink = input.toDF().toDF("o_orderkey", "o_custkey", "cents").writeStream
        .format("graft").option("root", root.toString).option("keys", "o_orderkey")
        .option("checkpointLocation", cp.toString)
        .start("svord")
      try {
        def src() = KVIndex.open(store, "svord").fold(e => sys.error(e.message), identity)
        input.addData(b1); sink.processAllAvailable()
        graft.core.MaterializedAgg.create(store, "svview", src(),
          Seq("o_custkey"), "cents").fold(e => sys.error(e.message), identity)
        input.addData(b2); sink.processAllAvailable()
        graft.core.MaterializedAgg.refresh(store, "svview", src())
          .fold(e => sys.error(e.message), identity)
        input.addData(b3); sink.processAllAvailable()
        val view = graft.core.MaterializedAgg.refresh(store, "svview", src())
          .fold(e => sys.error(e.message), identity)
        // eager: the temp store is deleted in finally
        val rows = view.df.select(col("o_custkey"), col("agg_sum"), col("agg_cnt"))
          .orderBy("o_custkey").as[(Long, Long, Long)].collect().toSeq
        rows.toDF("o_custkey", "agg_sum", "agg_cnt")
      } finally { sink.stop(); deleteRec(root); deleteRec(cp) }
    }),
    "st_dedup" -> ((s, d) => {
      // batch twin of EventStreams.dedupStream: re-ingest the stream twice,
      // dedup on event_id (duplicate rows are identical, so any survivor
      // is the right one)
      val e = t(s, d, "events")
      e.unionByName(e).dropDuplicates("event_id")
        .agg(count(lit(1)).as("n"), EventStreams.exactCentSum(col("value")).as("sum_value"))
    }),
    "st_interval_join" -> ((s, d) =>
      EventStreams.clickAfterSignup(t(s, d, "events"))
        .select(col("user_id"), col("event_id"),
          unix_millis(col("signup_ts")).as("signup_ms"),
          unix_millis(col("click_ts")).as("click_ms"))
        .orderBy("event_id", "signup_ms")),
    // IVF-PQ, the composed at-scale ANN shape: cells prune WHICH rows
    // are scanned (nProbe=8 of 16), residual PQ codes shrink WHAT is
    // scanned (16-byte codes). Contracts (measured across
    // sf0.001/0.01/0.1): raw ADC top-20 recovers >= 3 of the exact
    // L2 top-10 (measured 5-6); the 40-deep shortlist + exact-cosine
    // rerank top-10 recovers >= 5 of the exact cosine top-10
    // (measured 7-8).
    "sim_ivfpq" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 7)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val (codes, cents, model) = Similarity.ivfPqBuild(emb, nCells = 16, m = 16, k = 16)
      codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val exactL2 = Similarity.bruteForceTopKL2(emb, q, 10).select("vec_id")
        val adcHits = Similarity.ivfPqTopK(codes, cents, model, q, 20, nProbe = 8)
          .select("vec_id").intersect(exactL2).count()
        val short = Similarity.ivfPqTopK(codes, cents, model, q, 40, nProbe = 8)
          .select("vec_id")
        // pin the reranked top-10 (≤ 10 rows): it is consumed twice (the
        // recall intersect and the row count) and its plan re-runs the
        // whole shortlist broadcast + rerank per action otherwise
        val rrTop = Similarity.bruteForceTopK(
          emb.join(broadcast(short), Seq("vec_id")), q, 10).select("vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val exactCos = Similarity.bruteForceTopK(emb, q, 10).select("vec_id")
          val rrHits = rrTop.intersect(exactCos).count()
          Seq((rrTop.count(), adcHits >= 3L, rrHits >= 5L))
            .toDF("n", "adc_recall_ok", "rerank_recall_ok")
        } finally { rrTop.unpersist(); () }
      } finally codes.unpersist()
    }),

    // binary sign-bit ANN: 1 bit/dim packed 32 bits/word => signatures
    // and Hamming distances are exact small integers, so the ENTIRE
    // top-10 (ids + distances) hash-verifies against the SQL replica —
    // no recall hedge needed for determinism
    "sim_binary" -> ((s, d) => {
      val sigs = Similarity.quantizeBinary(t(s, d, "embeddings"))
      val qSig = sigs.filter(col("vec_id") === 7)
        .select(col("sig")).head().getSeq[Long](0).toArray
      Similarity.hammingTopK(sigs, qSig, 10)
    }),

    // curriculum staging: mean-token-rarity difficulty in exact integer
    // milli-units, quartile-binned at exact percentile_disc boundaries
    "pipe_curriculum" -> ((s, d) =>
      graft.pipeline.Sampling.curriculumStages(t(s, d, "documents"), stages = 4)
        .orderBy("doc_id")),

    // link-analysis quality weighting (the crawl-pipeline prior): integer
    // fixed-point PageRank, 5 rounds, over the customer<->supplier
    // co-purchase graph (custkey*2 / suppkey*2+1 node ids, both edge
    // directions). Integer recurrence => the unrolled-CTE DuckDB oracle
    // replays it EXACTLY, top-20 hash-verified.
    // triangle counting by degree orientation (Suri-Vassilvitskii): the
    // wedge join is capped at O(sqrt(m)) out-degree per node, so no
    // last-reducer hotspot; per-node corner counts, top-20
    "graph_triangles" -> ((s, d) => {
      val e = t(s, d, "orders")
        .select((col("o_orderkey") % 300).as("src"), (col("o_custkey") % 300).as("dst"))
      graft.operators.Graphs.triangleCorners(e)
        .orderBy(col("n_triangles").desc, col("node"))
        .limit(20)
    }),
    // k-anonymity suppression (Sweeney): quasi-identifier groups under
    // k=10 collapse into one '*' bucket before the aggregate is released
    "q_kanon" -> ((s, d) =>
      graft.pipeline.Privacy.kAnonymize(t(s, d, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 10, "c_acctbal")
        .orderBy("c_nationkey", "c_mktsegment")),
    // frequent clickstream paths: top-20 length-3 event-type sequences
    // over per-user (time, id)-ordered event streams
    "st_paths" -> ((s, d) =>
      graft.operators.Funnel.topPaths(events(s, d), n = 3, k = 20)),
    // strictly-ordered conversion funnel with a 24h window over the event
    // stream (earliest-entry semantics): per step, users reached +
    // conversion vs step 1 in exact micro-units
    "st_funnel" -> ((s, d) =>
      graft.operators.Funnel.conversions(events(s, d),
          Seq("view", "click", "purchase"), windowMs = 86400000L)
        .orderBy("step_no")),
    // funnel stall analysis: per adjacent step pair, exact median and
    // max conversion latency under the same earliest-entry 24h window
    "st_funnel_latency" -> ((s, d) =>
      graft.operators.Funnel.stepLatencies(events(s, d),
          Seq("view", "click", "purchase"), windowMs = 86400000L)
        .orderBy("step_no")),
    // cohort retention triangle: users bucketed by first-event week,
    // per-cohort share still active k weeks on, exact micro-units
    "st_retention" -> ((s, d) =>
      graft.operators.Funnel.retention(events(s, d))
        .orderBy("cohort_week", "week_offset")),
    // first-order Markov transition matrix over per-user event chains:
    // (from, to) counts + exact micro-unit row-conditional probabilities
    "st_transitions" -> ((s, d) =>
      graft.operators.Funnel.transitions(events(s, d))
        .orderBy("from_type", "to_type")),
    "graph_pagerank" -> ((s, d) => {
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      // no .distinct() here: PageRank.pagerank dedupes its edge input
      // anyway, so a fixture-side distinct was one redundant exchange +
      // aggregation over the join output
      val eb = ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val e = eb.union(eb.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.PageRank.pagerank(e, iters = 5)
        .orderBy(col("rank_nano").desc, col("node"))
        .limit(20)
    }),

    "skew_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey").as("k"), col("l_extendedprice"))
      val ord = t(s, d, "orders").select(col("o_orderkey").as("k"), col("o_totalprice"))
      graft.core.Skew.saltedJoin(li, ord, "k", 8)
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("li_sum"),
          round(sum(col("o_totalprice")), 2).as("ord_sum"))
    }),
    // bloom-prefiltered exact semi join (operators/BloomJoin.scala): fact
    // rows that cannot match the filtered dim are dropped BEFORE the join
    // shuffle. Bloom admits no false negatives and the exact join removes
    // the false positives, so the plain semi-join SQL is a full hash
    // oracle — the filter changes shuffled volume, never the result.
    "q_bloom_join" -> ((s, d) => {
      val dim = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      graft.operators.BloomJoin.semiJoin(t(s, d, "orders"), dim,
          "o_custkey", "c_custkey", expectedItems = 1L << 16, numBits = 1L << 20)
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("price_sum"))
    }),
    "st_sessions" -> ((s, d) =>
      EventStreams.sessionizeBatch(t(s, d, "events"))
        .select(col("user_id"), col("session_no"),
          unix_millis(col("session_start")).as("start_ms"),
          unix_millis(col("session_end")).as("end_ms"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_no")),

    // native session_window operator — same sessions as st_sessions up
    // to the boundary convention (a gap of EXACTLY 30 min splits here)
    "st_session_native" -> ((s, d) =>
      EventStreams.sessionWindows(t(s, d, "events"))
        .select(col("user_id"), unix_millis(col("session_start")).as("start_ms"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "start_ms")),

    // ---- training-data pipeline: dedup ----
    "dd_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents")).orderBy("doc_id")),
    "dd_exact_survivors" -> ((s, d) =>
      Dedup.exactSurvivors(t(s, d, "documents"))
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")),
    // MinHash-LSH recall contract: the truth set (exact all-pairs shingle
    // Jaccard >= 0.5 on the bounded doc_id < 500 range — SQL-computable,
    // so n_true is hash-verified) must be recovered by the full-corpus LSH
    // path at >= 80% recall. Deterministic hashes + a banded-collision
    // probability of 1-(1-s^4)^16 ~ 1 at the s >= 0.9 pairs the generator
    // plants make the bound hold with wide margin (measured 25/25 at
    // sf0.01, 1/1 at sf0.1).
    "dd_minhash" -> ((s, d) => {
      import s.implicits._
      val full = t(s, d, "documents")
      val truth = ddTruthPairs(full, minJaccard = 0.5).cache()
      try {
        val cand = Dedup.minhashLsh(full, threshold = 0.2).select("idA", "idB")
        val nTrue = truth.count()
        val hits = truth.join(cand, Seq("idA", "idB"), "left_semi").count()
        Seq((nTrue, recallOk(hits, nTrue, 4, 5))).toDF("n_true", "recall_ok")
      } finally truth.unpersist()
    }),
    // SimHash recall contract against the same SQL-computable truth set:
    // >= 0.9-Jaccard pairs have near-identical unigram distributions, so
    // their 64-bit sketches sit within a few bits and the 4x16-bit chunk
    // bucketing recovers them (guaranteed for Hamming <= 3; measured 23/25
    // at sf0.01 — bound at >= 50%).
    "dd_simhash" -> ((s, d) => {
      import s.implicits._
      val full = t(s, d, "documents")
      val truth = ddTruthPairs(full, minJaccard = 0.5).cache()
      try {
        val cand = Dedup.simhash(full, maxHamming = 8).select("idA", "idB")
        val nTrue = truth.count()
        val hits = truth.join(cand, Seq("idA", "idB"), "left_semi").count()
        Seq((nTrue, recallOk(hits, nTrue, 1, 2))).toDF("n_true", "recall_ok")
      } finally truth.unpersist()
    }),
    // LSH-accelerated exact-verify n-gram Jaccard: recall contract vs the
    // SQL truth set at the operator's own threshold, plus an EXACT
    // precision check — every emitted pair inside the bounded range must
    // be in the truth set (the verify stage computes true Jaccard, so any
    // false positive is a kernel bug, not LSH luck).
    "dd_ngram_jaccard" -> ((s, d) => {
      import s.implicits._
      val full = t(s, d, "documents")
        .filter(size(gf.ws_tokens(col("text"))) >= 3)
      val truth = ddTruthPairs(full, minJaccard = 0.3).cache()
      try {
        val found = Dedup.ngramJaccard(full, threshold = 0.3)
          .filter(col("idA") < 500 && col("idB") < 500).select("idA", "idB")
        val nTrue = truth.count()
        val nFound = found.count()
        val hits = truth.join(found, Seq("idA", "idB"), "left_semi").count()
        Seq((nTrue, recallOk(hits, nTrue, 4, 5), nFound == hits))
          .toDF("n_true", "recall_ok", "precision_ok")
      } finally truth.unpersist()
    }),
    // sign-LSH near-dup recall on PLANTED duplicates: clone vec_id < 50
    // with one coordinate nudged (cosine ~ 0.9998), then require the
    // bucketed path to recover >= 45 of the 50 planted pairs. A clone's
    // signature differs from its source by at most the planes its nudge
    // flips, and multi-probe covers every single-bit flip — measured
    // 50/50 at both SFs.
    // SemDeDup contract: 50 planted near-clones (nudged copies of
    // vec_id < 50) must be PRUNED by cluster-then-pairwise semantic dedup
    // (>= 90%, keep-first means the clone with the higher id drops), while
    // the originals survive; n_planted is the exact hash-verified column
    "dd_semdedup" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings").select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + when(i === lit(0), lit(0.01f)).otherwise(lit(0.0f))).cast("float"))
            .as("embedding"))
      val nPlanted = planted.count()
      val survivors = Dedup.semDedup(emb.unionByName(planted),
        nCells = 16, threshold = 0.95)
      val plantedLeft = survivors.filter(col("vec_id") >= 100000L).count()
      val originalsLeft = survivors.filter(col("vec_id") < 50).count()
      Seq((nPlanted,
        (nPlanted - plantedLeft) * 10L >= nPlanted * 9L,
        originalsLeft * 10L >= nPlanted * 9L))
        .toDF("n_planted", "clones_pruned", "originals_kept")
    }),
    "dd_embed_cosine" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings").select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + when(i === lit(0), lit(0.01f)).otherwise(lit(0.0f))).cast("float"))
            .as("embedding"))
      val nPlanted = planted.count()
      val found = Dedup.embeddingCosine(emb.unionByName(planted), threshold = 0.95)
      val hits = found
        .filter(col("idA") < 50 && col("idB") === col("idA") + 100000L).count()
      Seq((nPlanted, hits * 10L >= nPlanted * 9L)).toDF("n_planted", "all_found")
    }),
    // exact all-pairs n-gram Jaccard on a bounded id range: pins the FNV
    // shingle + sorted-merge kernel to textbook string-shingle Jaccard
    // (ratio of integer set sizes — bit-identical across engines), with a
    // full DuckDB oracle; the LSH-accelerated path above stays rows-only
    "dd_jaccard_pairs" -> ((s, d) => {
      // mirror the oracle's len(tk) >= 3 filter: for 1-2-token docs the
      // shingler emits one partial shingle where the oracle emits none
      val sub = t(s, d, "documents").filter(col("doc_id") < 80)
        .filter(size(gf.ws_tokens(col("text"))) >= 3)
        .select(col("doc_id").as("id"), gf.shingle_hashes(col("text"), 3).as("sh"))
      val a = sub.select(col("id").as("idA"), col("sh").as("shA"))
      val b = sub.select(col("id").as("idB"), col("sh").as("shB"))
      a.join(b, col("idA") < col("idB"))
        .select(col("idA"), col("idB"),
          round(gf.jaccard_sorted(col("shA"), col("shB")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.015)
        .orderBy("idA", "idB")
    }),
    // exact all-pairs cosine on a bounded id range — the oracle-verified
    // twin of the sign-LSH near-dup path (dd_embed_cosine)
    "dd_cosine_pairs" -> ((s, d) => {
      val sub = t(s, d, "embeddings").filter(col("vec_id") < 150)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val a = sub.select(col("id").as("idA"), col("v").as("vA"))
      val b = sub.select(col("id").as("idB"), col("v").as("vB"))
      a.join(b, col("idA") < col("idB"))
        .select(col("idA"), col("idB"),
          round(gf.cosine_sim(col("vA"), col("vB")), 4).as("cosine"))
        .filter(col("cosine") >= 0.35)
        .orderBy("idA", "idB")
    }),
    // connected components through the DISTRIBUTED min-label-propagation
    // path (driverLimit=0 disables the driver union-find shortcut). Edges
    // are consecutive-id chains inside fixed-size id blocks, so components
    // have diameter 7 at EVERY scale factor and the cluster label is
    // SQL-expressible: min(doc_id) of the block
    "dd_cluster_chain" -> ((s, d) => {
      val w = Window.partitionBy(expr("doc_id div 8")).orderBy("doc_id")
      val edges = t(s, d, "documents").select(col("doc_id"))
        .withColumn("prev", lag(col("doc_id"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("idA"), col("doc_id").as("idB"))
      Dedup.clusters(edges, driverLimit = 0L)
        .select(col("id").cast("long").as("id"), col("label").cast("long").as("label"))
        .orderBy("id")
    }),

    // ---- training-data pipeline: similarity search ----
    "sim_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      Similarity.bruteForceTopK(emb, q, 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy("vec_id")
    }),
    "sim_topk_batch" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      // the bounded-aggregate path: k rows per query cross the shuffle,
      // not the whole scored corpus (graft.operators.TopKAgg)
      Similarity.bruteForceTopKBatchAgg(emb, queries, 5)
        .select(col("q_id"), col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy("q_id", "vec_id")
    }),
    // IVF ANN, oracle-verified via its RECALL CONTRACT: the approximate
    // top-k must hit >= 5 of the exact brute-force top-10 (both sides are
    // deterministic: seeded centroids, tie-broken rankings; measured 6/10
    // at sf0.001, 8/10 at sf0.01 with nProbe=6 of 16 cells), and return
    // exactly k rows. The contract row is what DuckDB checks — the exact
    // member set is probe-dependent and not SQL-expressible.
    "sim_ivf" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 7)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val (indexed, centroids) = Similarity.ivfBuild(emb, 16)
      val ivf = Similarity.ivfTopK(indexed, centroids, q, 10, nProbe = 6)
        .select("vec_id")
      val brute = Similarity.bruteForceTopK(emb, q, 10).select("vec_id")
      val hits = ivf.intersect(brute).count()
      val n = ivf.count()
      Seq((n, hits >= 5L)).toDF("n", "recall_ok")
    }),

    // batch IVF probe: 3 queries at once — probed cells unioned, index
    // scanned ONCE, per-query top-k via the bounded aggregate. Same recall
    // contract as sim_ivf, held PER QUERY: k rows out and >= 5 of the
    // exact brute-force top-10 recovered (measured 7-10/10 at sf0.001,
    // 8-10/10 at sf0.01 with nProbe=6 of 16 cells).
    "sim_ivf_batch" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id").isin(3L, 7L, 11L))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val (indexed, centroids) = Similarity.ivfBuild(emb, 16)
      val ivf = Similarity.ivfTopKBatch(indexed, centroids, queries, 10, nProbe = 6)
        .select(col("q_id"), col("vec_id"))
      val brute = Similarity.bruteForceTopKBatchAgg(emb, queries, 10)
        .select(col("q_id"), col("vec_id"))
      val hits = ivf.intersect(brute)
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      ivf.groupBy("q_id").agg(count(lit(1)).as("n"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), col("n"),
          (coalesce(col("n_hits"), lit(0L)) >= 5L).as("recall_ok"))
        .orderBy("q_id")
    }),

    // product quantization: codebooks trained on the corpus (m=16
    // subspaces × k=16 cells over dim 64 → 16-byte codes, a 16× footprint
    // cut), used as ANN is used in practice: the ADC top-20 SHORTLIST
    // must recover >= 4 of the exact squared-L2 top-10 (measured 5-8
    // across sf0.001/0.01/0.1), and the 8× shortlist + exact-cosine
    // rerank top-10 must recover >= 6 of the exact cosine top-10
    // (measured 8-10). Builds its own truth sets in-query, like sim_ivf.
    "sim_pq" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 7)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val model = Similarity.pqTrain(emb, m = 16, k = 16)
      val codes = Similarity.pqEncode(emb, model)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val adc = Similarity.pqTopK(codes, model, q, 20).select("vec_id")
        val exactL2 = Similarity.bruteForceTopKL2(emb, q, 10).select("vec_id")
        val adcHits = adc.intersect(exactL2).count()
        val rr = Similarity.pqTopKRerank(codes, emb, model, q, 10, rerank = 8)
          .select("vec_id")
        val exactCos = Similarity.bruteForceTopK(emb, q, 10).select("vec_id")
        val rrHits = rr.intersect(exactCos).count()
        Seq((rr.count(), adcHits >= 4L, rrHits >= 6L))
          .toDF("n", "adc_recall_ok", "rerank_recall_ok")
      } finally codes.unpersist()
    }),

    // distributed k-NN JOIN: the ENTIRE embeddings table is the query
    // side (self-kNN = the hard-negative-mining shape). Queries are never
    // collected or broadcast — per-row cell ranking is one codegen'd
    // expression, candidates come from the cell equi-join (~nProbe/nCells
    // of the corpus per query, never all-pairs), per-query top-k via the
    // bounded aggregate. Contract: every query returns exactly k rows,
    // finds ITSELF (its own cell is always probed), and mean recall vs
    // the exact top-10 >= 0.6 (measured 0.707 sf0.001 / 0.717 sf0.01 /
    // 0.698 sf0.1 with nProbe=6 of 16 cells).
    "sim_knn_join" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings")
      val (indexed, centroids) = Similarity.ivfBuild(emb, 16)
      val queries = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val approx = Similarity.knnJoin(indexed, centroids, queries, 10, nProbe = 6)
        .select(col("q_id"), col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // ONE aggregate answers n_queries, the all-k-rows flag and the
        // self-hit row count (the former distinct().count + isEmpty probe
        // + filtered count were three separate passes over approx)
        val stats = approx.groupBy("q_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("q_id") === col("vec_id"), 1L).otherwise(0L)).as("self"))
          .agg(count(lit(1)).as("nq"), min(col("n")).as("mn"),
            max(col("n")).as("mx"), sum(col("self")).as("selfhits"))
          .head()
        val nQueries = stats.getLong(0)
        val allK = nQueries == 0L || (stats.getLong(1) == 10L && stats.getLong(2) == 10L)
        val selfOk = (if (stats.isNullAt(3)) 0L else stats.getLong(3)) == nQueries
        // exact truth via the BOUNDED batch aggregate (k rows per query per
        // map task), not the window oracle — the truth set costs as much
        // as a scan, not a full-scored-table shuffle
        val exact = Similarity.bruteForceTopKBatchAgg(emb, queries, 10)
          .select(col("q_id"), col("vec_id"))
        val hits = approx.intersect(exact).count()
        val meanRecall = hits.toDouble / (nQueries * 10L)
        Seq((nQueries, allK, selfOk, meanRecall >= 0.6))
          .toDF("n_queries", "all_k_rows", "self_recall_ok", "recall_ok")
      } finally { approx.unpersist(); () }
    }),

    // one-pass column profiler: every column's null/distinct/min/max/
    // length stats from a SINGLE scan + one aggregate (multi-distinct
    // via Spark's Expand rewrite; `exact = false` swaps in HLL++ and
    // drops the Expand — pinned in ProfilerSpec). Rendering is pinned
    // (4-dp DECIMAL(18,4) for fractionals, ISO seconds for temporals)
    // so the whole profile hash-matches the DuckDB replica.
    "prof_columns" -> ((s, d) =>
      graft.pipeline.Profiler.profile(t(s, d, "lineitem"))),
    // one-pass Pearson correlation matrix over quantized lineitem
    // measures (6 pairs from ONE aggregate; exact integer moments,
    // portable double only in the final quotient)
    "prof_corr" -> ((s, d) =>
      graft.pipeline.Profiler.corrMatrix(
          t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
            .select(col("l_quantity").cast("long").as("qty"),
              floor(col("l_extendedprice")).cast("long").as("price_usd"),
              floor(col("l_discount") * 10000 + 0.5).cast("long").as("disc_bp"),
              floor(col("l_tax") * 10000 + 0.5).cast("long").as("tax_bp")),
          Seq("qty", "price_usd", "disc_bp", "tax_bp"))
        .orderBy("col_a", "col_b")),
    // equi-width price histogram in exact integer cents: 20 bins over
    // lineitem extendedprice, data-dependent bounds from a broadcast
    // 1-row min/max aggregate
    "prof_hist" -> ((s, d) =>
      graft.pipeline.Profiler.histogram(
          t(s, d, "lineitem").select(
            floor(col("l_extendedprice") * 100).cast("long").as("cents")),
          "cents", bins = 20)
        .orderBy("bin")),
    // exact-size deterministic uniform sample: 25 docs by Knuth-hash
    // rank — plans as TakeOrderedAndProject, reproducible in any engine
    "samp_exact_k" -> ((s, d) =>
      graft.pipeline.Sampling.exactK(t(s, d, "documents"), "doc_id", k = 25)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),
    // exact-total stratified sample: 60 docs apportioned across sources
    // by largest remainder, Knuth-hash picks within each stratum
    "samp_proportional" -> ((s, d) =>
      graft.pipeline.Sampling.proportionalK(t(s, d, "documents"),
          "source", "doc_id", k = 60)
        .select("doc_id", "source")
        .orderBy("doc_id")),
    // data-contract gate: deterministically dirtied orders checked
    // against 5 declared rules — row rules fold into ONE aggregate over
    // one scan, unique/ref each pay their own key-shaped job
    "prof_expect" -> ((s, d) => {
      import graft.pipeline.Expect
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus"))
      val bad = s.range(0, 3).select((col("id") + 5000000L).as("o_orderkey"),
          lit(null).cast("long").as("o_custkey"), lit(10.0).as("o_totalprice"),
          lit("O").as("o_orderstatus"))
        .unionByName(ord.filter(col("o_orderkey").isin(1L, 2L)))
        .unionByName(s.range(0, 2).select((col("id") + 6000000L).as("o_orderkey"),
          lit(1L).as("o_custkey"), lit(-5.0).as("o_totalprice"),
          lit("F").as("o_orderstatus")))
        .unionByName(s.range(0, 3).select((col("id") + 7000000L).as("o_orderkey"),
          (col("id") + 888888800L).as("o_custkey"), lit(1.0).as("o_totalprice"),
          lit("X").as("o_orderstatus")))
      Expect.check(ord.unionByName(bad), Seq(
          Expect.NotNull("o_custkey"),
          Expect.Check("price_positive", "o_totalprice > 0"),
          Expect.Check("status_domain", "o_orderstatus in ('O', 'F', 'P')"),
          Expect.Unique(Seq("o_orderkey")),
          Expect.Ref("o_custkey", t(s, d, "customer"), "c_custkey")))
        .orderBy("rule")
    }),

    // ---- SQL surface: custom Catalyst kernel registered and called
    //      from spark.sql, hash-verified against the DuckDB oracle ----
    "q_sql_kernel" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      t(s, d, "embeddings").createOrReplaceTempView("emb_v")
      s.sql("""SELECT a.vec_id,
                      round(cosine_sim(a.embedding,
                        (SELECT embedding FROM emb_v WHERE vec_id = 0)), 4) AS cs
               FROM emb_v a WHERE a.vec_id < 20 ORDER BY a.vec_id""")
    }),

    // ---- training-data pipeline: text analysis ----
    // train/benchmark overlap: docs sharing any word trigram with the
    // "benchmark" slice (doc_id < 20); benchmark gram set broadcast
    "dd_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.contamination(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20))
        .orderBy("doc_id")
    }),
    // exact discrete quantiles per group (ANSI percentile_disc = smallest
    // value with cume_dist >= p) — order statistics, no interpolation, so
    // the oracle matches bit-for-bit
    "agg_quantiles" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("li_q")
      s.sql("""SELECT l_returnflag,
                 round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p50,
                 round(percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p95
               FROM li_q GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),
    "txt_tokens" -> ((s, d) =>
      TextAnalysis.tokenStats(t(s, d, "documents"))
        .select("doc_id", "n_ws_tokens", "n_bpe_tokens").orderBy("doc_id")),
    "txt_quality" -> ((s, d) =>
      TextAnalysis.qualityScore(t(s, d, "documents"))
        .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
          "avg_word_len").orderBy("doc_id")),
    "txt_langid" -> ((s, d) =>
      TextAnalysis.languageId(t(s, d, "documents"))
        .select("doc_id", "pred_lang").orderBy("doc_id")),
    // corpus-self-trained smoothed bigram LM typicality (fixed-point
    // per-bigram micro-probabilities → exact integer sums → one final
    // division; fully engine-portable, full hash oracle)
    "txt_lm_score" -> ((s, d) =>
      TextAnalysis.lmTypicality(t(s, d, "documents"))
        .orderBy("doc_id")),
    // ranked-retrieval evaluation (trec_eval core metrics, distributed):
    // runs = per-customer orders ranked by totalprice, qrels = the
    // orderkey%3 slice; MRR / recall@10 / nDCG@10 in exact integer
    // micro-units (the nDCG discounts are literal constants shared with
    // the oracle verbatim)
    "eval_retrieval" -> ((s, d) => {
      val runs = t(s, d, "orders").filter(col("o_custkey") < 500)
        .select(col("o_custkey").as("query_id"), col("o_orderkey").as("doc_id"),
          col("o_totalprice").as("score"))
      val qrels = runs.filter(col("doc_id") % 3 === 0)
        .select("query_id", "doc_id")
      graft.text.RetrievalEval.evaluate(runs, qrels, k = 10)
        .orderBy("query_id")
    }),
    // nearest-centroid (Rocchio) classifier: train per-lang centroids on
    // even doc_ids, classify odd ones; exact-integer dot + portable-sqrt
    // norms make predictions AND scores hash-reproducible in SQL
    "txt_classify" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.nearestCentroid(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("pred_label"), col("cos_micro"),
          (col("pred_label") === col("lang")).as("correct"))
        .orderBy("doc_id")
    }),
    // Stupid-Backoff trigram LM (Brants 2007) scored HELD-OUT: train on
    // even doc_ids, score odd ones, so trigram→bigram→unigram backoff
    // genuinely fires; per-position nano-unit quantization makes the
    // whole model/score pipeline hash-reproducible in SQL
    "txt_backoff_lm" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.stupidBackoffScore(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_id")
    }),
    // CCNet-style per-language LM-quality bucketing: held-out docs are
    // scored by the train-split Stupid-Backoff LM (exact nano-units),
    // then each language splits at its own exact score terciles into
    // head/middle/tail. Cutoffs are a bounded per-language aggregate
    // broadcast back — no per-language global sort. The full pipeline
    // (LM replica + quantile_disc terciles + bucket cases) hash-matches
    // the DuckDB replica per document.
    "pipe_ppl_buckets" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.pplBuckets(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
        .orderBy("doc_id")
    }),
    // fingerprint property contract (kernel values themselves are pinned
    // by KernelsSpec): every distinct text maps to exactly one
    // (exact_hash, fingerprint, simhash) triple — the functions are pure —
    // and xxhash64 is collision-free on this corpus, so distinct hashes ==
    // distinct texts. Both counts are SQL-computable and hash-verified.
    "txt_fingerprint" -> ((s, d) => {
      import s.implicits._
      val fp = TextAnalysis.fingerprints(t(s, d, "documents"))
      val inconsistent = fp.groupBy("text")
        .agg(countDistinct("fingerprint").as("nf"),
          countDistinct("exact_hash").as("ne"),
          countDistinct("simhash").as("ns"))
        .filter(col("nf") > 1 || col("ne") > 1 || col("ns") > 1).count()
      val r = fp.agg(count(lit(1)), countDistinct(col("text")),
        countDistinct(col("exact_hash"))).head()
      Seq((r.getLong(0), r.getLong(1), inconsistent == 0L, r.getLong(2) == r.getLong(1)))
        .toDF("n_docs", "n_text", "fp_consistent", "hash_injective")
    }),

    // incremental ingest dedup (Dedup.incrementalSurvivors): incoming
    // batch (the upper-id half plus planted clones of every 5th corpus
    // doc) deduped against the existing corpus via bloom-split — rows
    // failing might_contain skip the join as provably new, the remainder
    // hits the exact anti join. Result == plain anti join, so plain SQL
    // is a full hash oracle.
    "pipe_incr_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") < 250)
      val incoming = docs.filter(col("doc_id") >= 250)
        .unionByName(corpus.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 10000L).as("doc_id"), col("text")))
      Dedup.incrementalSurvivors(incoming, corpus, "text",
          expectedItems = 1L << 14, numBits = 1L << 18)
        .agg(count(lit(1)).as("n_new"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // ---- full corpus-cleaning composition. The deterministic prefix
    // counts (input → quality floor → exact dedup) are hash-verified
    // against the SQL oracle; the LSH-dependent suffix (near-dup, lang)
    // is pinned by a monotonicity contract — each stage can only shrink
    // the corpus and must leave survivors. ----
    "pipe_clean_corpus" -> ((s, d) => {
      import s.implicits._
      val (_, stats) = graft.pipeline.CleanCorpus(
        t(s, d, "documents"), minQuality = 0.1, nearDupThreshold = 0.8)
      val monoOk = stats.afterNearDup <= stats.afterExact &&
        stats.afterLang <= stats.afterNearDup && stats.afterLang >= 1L
      Seq((stats.input, stats.afterQuality, stats.afterExact, monoOk))
        .toDF("input", "after_quality", "after_exact", "mono_ok")
    }),
    // the DETERMINISTIC prefix of CleanCorpus (quality floor → exact
    // dedup) as its own hash-verified query: every stage count up to the
    // LSH-dependent near-dedup is pure SQL, so the oracle pins the
    // pipeline's first two stages exactly (the full composition above
    // stays rows-only because near-dup buckets are hash-defined)
    "pipe_clean_prefix" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val q = TextAnalysis.qualityScore(docs).filter(col("quality") >= 0.1)
      val exact = Dedup.exactSurvivors(q, "doc_id", "text")
      Seq((docs.count(), q.count(), exact.count()))
        .toDF("input", "after_quality", "after_exact")
    }),

    // ---- multimodal: REAL JDK image codec (javax.imageio + Graphics2D).
    // Payloads are real PNGs rendered per-document (dims + solid color
    // derived from doc_id), so the decoded width/height/channel means are
    // exactly oracle-computable in SQL.
    "mm_features" -> ((s, d) => {
      val media = mediaPngTable(s, d)
      graft.multimodal.Multimodal.imageStats(media).toDF()
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("media_id")
    }),
    // real decode → Graphics2D bilinear half-size → re-encode → re-decode:
    // the asserted dims/means come from decoding the RESIZED payload
    "mm_resize" -> ((s, d) => {
      val media = mediaPngTable(s, d)
      val resized = graft.multimodal.Multimodal.resize(media, factor = 2)
      graft.multimodal.Multimodal.imageStats(resized).toDF()
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("media_id")
    }),
    // REAL JDK audio codec (javax.sound.sampled): per-doc deterministic
    // 16-bit PCM (sample i = (((id*31 + i*7) % 201) - 100) * 300 at 8 kHz,
    // 800/1200/1600 samples by id%3) is WAV-encoded, then DECODED back
    // through AudioSystem and reduced to per-window peak + exact integer
    // sum-of-squares — every output cell is pure integer math on doc_id,
    // so the SQL oracle regenerates the identical features
    "mm_audio" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
        .filter(_ < 40L)
      val wav = ids.map { id =>
        val n = 800 + (id % 3).toInt * 400
        val samples = Array.tabulate(n)(i =>
          ((((id * 31 + i * 7) % 201) - 100) * 300).toShort)
        (id, graft.multimodal.Multimodal.pcmWavBytes(8000, samples))
      }.toDF("doc_id", "payload")
      val media = graft.multimodal.Multimodal.asMediaTable(
        s, wav, "doc_id", "payload", "audio")
      graft.multimodal.Multimodal.audioWindows(media, windowSamples = 160).toDF()
        .select(col("media_id"), col("sample_rate").cast("long").as("sample_rate"),
          col("duration_ms"), col("window_no").cast("long").as("window_no"),
          col("w_n").cast("long").as("w_n"),
          col("w_peak").cast("long").as("w_peak"), col("w_sumsq"))
        .orderBy("media_id", "window_no")
    }),
    // REAL RIFF/AVI demux + per-frame decode: per-doc Motion-PNG videos
    // (3..6 solid-color frames, dims + colors integer-derived from doc_id)
    // are containerized with aviBytes, demuxed back through demuxAvi, and
    // every 2nd frame decoded with the real image codec — frame count,
    // dims and channel means are pure integer math on doc_id, so the SQL
    // oracle regenerates them exactly (the solidPng/pcmWavBytes move,
    // third verse)
    // image near-duplicate detection by DCT perceptual hash (pHash) +
    // banded-Hamming self-join (the image twin of dd_simhash): planted
    // near-dup groups (same gid pattern, per-member pixel noise) must be
    // recovered EXACTLY — structural recall (8-band pigeonhole covers
    // Hamming <= 7) and zero cross-group false positives
    "mm_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val sel = t(s, d, "documents").select(col("doc_id").cast("long").as("media_id"))
        .filter(col("media_id") < 400)
      val rows = sel.as[Long]
        .map(id => (id, graft.multimodal.Multimodal.patternPng(id / 4, id % 4)))
        .toDF("media_id", "payload")
      val media = graft.multimodal.Multimodal.asMediaTable(
        s, rows, "media_id", "payload", "image")
      val pairs = graft.multimodal.Multimodal.phashNearDup(
        graft.multimodal.Multimodal.imagePhash(media), maxHamming = 7)
        .select("idA", "idB").cache()
      try {
        val withG = sel.withColumn("gid", floor(col("media_id") / 4))
        val a = withG.toDF("idA", "gid")
        val b = withG.toDF("idB", "gid")
        val truth = a.join(b, "gid").filter(col("idA") < col("idB"))
          .select("idA", "idB")
        val nImages = sel.count()
        // ONE job answers n_true and recall hits (left join onto the
        // unique found pairs, count + count-matched) — the former
        // count + semi-join count pair re-ran the truth join twice
        val tr = truth.join(pairs.withColumn("__hit", lit(1)), Seq("idA", "idB"), "left")
          .agg(count(lit(1)).as("nTrue"), count(col("__hit")).as("hits")).head()
        val (nTrue, hits) = (tr.getLong(0), tr.getLong(1))
        val nFound = pairs.count()
        Seq((nImages, nTrue, hits == nTrue, nFound == hits))
          .toDF("n_images", "n_true", "recall_ok", "precision_ok")
      } finally pairs.unpersist()
    }),
    // audio near-duplicate detection by constellation fingerprinting
    // (Wang 2003): planted groups are TIME-SHIFTED tonal near-copies, so
    // the offset-delta vote must both find every pair and align the shift;
    // cross-group chance collisions stay far under the vote threshold
    // (probed margins: same-group >= 107 votes, cross <= 22, threshold 50)
    "mm_audio_dedup" -> ((s, d) => {
      import s.implicits._
      val sel = t(s, d, "documents").select(col("doc_id").cast("long").as("media_id"))
        .filter(col("media_id") < 240)
      val rows = sel.as[Long]
        .map(id => (id, graft.multimodal.Multimodal.toneWav(id / 3, id % 3)))
        .toDF("media_id", "payload")
      val media = graft.multimodal.Multimodal.asMediaTable(
        s, rows, "media_id", "payload", "audio")
      val pairs = graft.multimodal.Multimodal.audioNearDup(
        graft.multimodal.Multimodal.audioFingerprints(media), minVotes = 50)
        .select("idA", "idB").cache()
      try {
        val withG = sel.withColumn("gid", floor(col("media_id") / 3))
        val a = withG.toDF("idA", "gid")
        val b = withG.toDF("idB", "gid")
        val truth = a.join(b, "gid").filter(col("idA") < col("idB"))
          .select("idA", "idB")
        val nMedia = sel.count()
        // one job for n_true + recall hits (see mm_phash_dedup; found
        // pairs are unique by the vote groupBy, so the left join cannot
        // multiply truth rows)
        val tr = truth.join(pairs.withColumn("__hit", lit(1)), Seq("idA", "idB"), "left")
          .agg(count(lit(1)).as("nTrue"), count(col("__hit")).as("hits")).head()
        val (nTrue, hits) = (tr.getLong(0), tr.getLong(1))
        val nFound = pairs.count()
        Seq((nMedia, nTrue, hits == nTrue, nFound == hits))
          .toDF("n_media", "n_true", "recall_ok", "precision_ok")
      } finally pairs.unpersist()
    }),
    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id").cast("long")).as[Long]
        .filter(_ < 60L)
      val avi = ids.map { id =>
        val nf = 3 + (id % 4).toInt
        val w = 8 + (id % 5).toInt; val h = 6 + (id % 3).toInt
        val frames = (0 until nf).map { i =>
          graft.multimodal.Multimodal.solidPng(w, h,
            ((id * 7 + i * 13) % 256).toInt,
            ((id * 11 + i * 5) % 256).toInt,
            ((id * 3 + i * 17) % 256).toInt)
        }
        (id, graft.multimodal.Multimodal.aviBytes(frames, w, h, codec = "MPNG"))
      }.toDF("doc_id", "payload")
      val media = graft.multimodal.Multimodal.asMediaTable(
        s, avi, "doc_id", "payload", "video")
      graft.multimodal.Multimodal.frameSample(media, everyNth = 2)
        .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
          col("decoded"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("media_id", "frame_no")
    }),

    // ---- deterministic sampling (reproducible subsets at any scale) ----
    "samp_bernoulli" -> ((s, d) =>
      graft.pipeline.Sampling.bernoulli(t(s, d, "documents"), "doc_id", 10)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))),
    "samp_stratified" -> ((s, d) =>
      graft.pipeline.Sampling.stratified(t(s, d, "documents"), "lang", "doc_id", 3)
        .select(col("lang"), col("doc_id"), col("rn"))
        .orderBy("lang", "rn")),
    // temperature (α=0.5) resampling across languages: smallest language
    // kept whole, larger ones downsampled toward sqrt — rates ride a
    // broadcast, the keep decision is the engine-portable Knuth hash
    "samp_temperature" -> ((s, d) =>
      graft.pipeline.Sampling.sqrtTemperature(t(s, d, "documents"), "lang", "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy("lang")),
    // deterministic global training shuffle: order by Knuth hash of the id
    // (top-k here; the full-corpus form is a range repartition on `pos`)
    "pipe_shuffle" -> ((s, d) =>
      graft.pipeline.Sampling.shuffled(
        t(s, d, "documents").select("doc_id"), "doc_id").limit(100)),
    // sequence packing: token-budget packs per hash bucket — one shuffle on
    // the bucket key, running-sum window within buckets, no global sort
    "pipe_pack_sequences" -> ((s, d) => {
      val toks = TextAnalysis.tokenStats(t(s, d, "documents"))
        .select(col("doc_id"), col("n_ws_tokens").cast("long").as("n_tok"))
      graft.pipeline.Packing.packSequences(toks, "doc_id", "n_tok", 256L, 16)
        .groupBy("bucket", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("bucket", "pack_id")
    }),
    // sliding-window chunking: budget-32 chunks, 8-token overlap — pure
    // projection+explode, the other half of batch assembly
    "pipe_chunk" -> ((s, d) =>
      graft.pipeline.Packing.chunkDocs(t(s, d, "documents"))
        .orderBy("doc_id", "chunk_no")),
    // within-document repeated-3-gram fraction (C4/Gopher-style
    // repetitive-text quality signal); docs under 3 tokens excluded on
    // both sides (their shingle is degenerate)
    "txt_repetition" -> ((s, d) =>
      TextAnalysis.repetition(
          t(s, d, "documents").filter(size(gf.ws_tokens(col("text"))) >= 3))
        .select("doc_id", "n_grams", "n_distinct_grams", "dup_gram_ratio")
        .orderBy("doc_id")),
    // corpus vocabulary top-k: vocabulary (not token stream) crosses the
    // shuffle, top-k is TakeOrderedAndProject — never a global sort
    "txt_top_tokens" -> ((s, d) =>
      TextAnalysis.topTokens(t(s, d, "documents"), 20)),
    // BM25 ranked retrieval, integer-exact rational-idf variant: per-query
    // top-10 docs, score in milli-units, ties broken by doc id; the token
    // stream is broadcast-semi-joined against the query terms before the
    // (doc, term) count shuffles
    "txt_bm25" -> ((s, d) =>
      TextAnalysis.bm25TopK(t(s, d, "documents"), Bm25Queries, 10)),
    // unigram-LM (SentencePiece-style) subword tokenizer: EM-trained piece
    // vocabulary, Viterbi encode. Segmentation itself has no SQL oracle
    // (UnigramSpec's independent-reference differentials are that gate);
    // the hash-verified column is the LOSSLESS invariant — summed piece
    // code-point length == summed word length, which any engine can
    // compute independently. A dropped/duplicated character anywhere in
    // train->encode breaks the hash.
    "txt_unigram" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.text.Unigram.train(docs, vocabSize = 400, maxPieceLen = 6)
      graft.text.Unigram.encode(docs, model)
        .select(col("doc_id"), col("piece_chars"))
        .orderBy("doc_id")
    }),
    // WordPiece tokenizer (the trio's third member): likelihood-scored
    // distributed train, greedy longest-match expression encode. The
    // oracle hash-verifies the lossless invariant — pieces cover exactly
    // the corpus word chars (## markers excluded) and a vocabulary
    // containing its own training alphabet can never emit [UNK].
    // Segmentation itself is gated by WordPieceSpec's differentials
    // against an independent reference trainer + encoder.
    "txt_wordpiece" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val vocab = graft.text.WordPiece.train(docs, numMerges = 40)
      graft.text.WordPiece.encode(docs, vocab)
        .select(col("doc_id"), col("n_unk"), col("piece_chars"))
        .orderBy("doc_id")
    }),
    // per-doc TF-IDF keywords: rational Robertson idf (integer div only),
    // WindowGroupLimit top-3 per doc — the oracle replays the arithmetic
    "txt_keywords" -> ((s, d) =>
      TextAnalysis.keywords(t(s, d, "documents").filter(col("doc_id") < 200), k = 3)
        .orderBy("doc_id", "rank")),
    // PMI-monotone collocation mining in exact integer milli-units
    // (the score is the PMI argument — no ln, engine-portable)
    "txt_collocations" -> ((s, d) =>
      TextAnalysis.collocations(t(s, d, "documents"), k = 25, minCount = 5)),
    // hybrid retrieval, query-by-example on doc 7: the BM25 lexical
    // shortlist (doc 7's distinct terms as the query) and the dense
    // cosine shortlist (doc 7's embedding — vec_id aligns with doc_id in
    // the testdata) are fused by reciprocal-rank fusion in exact integer
    // nano-units; both shortlists, the fusion arithmetic, and the final
    // ranks hash-verify against the DuckDB replica end to end.
    "txt_hybrid" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val qText = docs.filter(col("doc_id") === 7)
        .select(col("text")).head().getString(0)
      val lex = TextAnalysis.bm25TopK(docs, Seq(qText), 20)
        .select("q_id", "rank", "doc_id")
      val qVec = t(s, d, "embeddings").filter(col("vec_id") === 7)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val dense = Similarity.rankedTopK(t(s, d, "embeddings"), qVec, 20)
        .withColumnRenamed("vec_id", "doc_id")
      TextAnalysis.rrfFuse(Seq(lex, dense), k = 10)
        .select(col("rank"), col("doc_id"), col("rrf_nano"))
    }),
    // corpus bigram top-k — same plan over 2-gram shingles
    "txt_bigrams" -> ((s, d) =>
      TextAnalysis.topNgrams(t(s, d, "documents"), 2, 20)),
    // heavy-hitter sketch contract: the one-pass frequent-items sketch
    // (O(1/support) counters per partition, vocabulary never ranked) must
    // contain EVERY token above 5% relative frequency — its no-false-
    // negative guarantee — with the sketch run at the looser 3% support so
    // the 5% truth threshold sits well inside it. n_heavy is the exact
    // SQL-computable truth count (hash-verified).
    "txt_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val toks = docs.select(explode(gf.ws_tokens(col("text"))).as("token"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = toks.count()
      val truth = toks.groupBy("token").agg(count(lit(1)).as("n"))
        .filter(col("n") > lit(0.05) * lit(total))
      val found = TextAnalysis.heavyHitterTokens(docs, support = 0.03)
      val nTrue = truth.count()
      val missed =
        if (found.isEmpty) nTrue
        else truth.filter(!col("token").isin(found: _*)).count()
      toks.unpersist()
      Seq((nTrue, missed == 0L)).toDF("n_heavy", "all_found")
    }),
    // deterministic train/val/test assignment: pure projection, the same
    // row lands in the same split on every run/engine/cluster size
    "pipe_split" -> ((s, d) =>
      graft.pipeline.Sampling.assignSplits(
          t(s, d, "documents"), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy("split")),
    // leakage-safe split: near-dup CLUSTERS (here exact-prefix groups, so
    // the oracle can rebuild them with a window min) split as a unit —
    // members of one cluster can never straddle train/test; the oracle
    // replays label + Knuth-hash assignment row for row
    "pipe_leakage_split" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pref = docs.select(col("doc_id"), substring(col("text"), 1, 40).as("p"))
      val links = pref.select(col("p"), col("doc_id").as("idA"))
        .join(pref.select(col("p"), col("doc_id").as("idB")), Seq("p"))
        .filter(col("idA") < col("idB")).select("idA", "idB")
      graft.pipeline.Sampling.leakageSafeSplit(docs, "doc_id", links,
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("doc_id"), col("entity"), col("split"))
        .orderBy("doc_id")
    }),
    // fair multi-source interleave: global training order (rn, source) is
    // round-robin across sources; first 60 positions shown
    "pipe_interleave" -> ((s, d) =>
      graft.pipeline.Sampling.interleaved(
          t(s, d, "documents").select("doc_id", "source"), "source", "doc_id")
        .select("rn", "source", "doc_id").limit(60)),
    // int8 embedding quantization: per-vector max-abs codes, engine-exact
    // floor(x+0.5) rounding; checksummed per vector
    "sim_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(t(s, d, "embeddings"))
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          size(filter(col("q"), x => x =!= 0L)).cast("long").as("nnz"))
        .orderBy("vec_id")),
    // MMR diversity re-rank (Carbonell & Goldstein): greedy
    // λ·rel − (1−λ)·max-sim over two 40-candidate shortlists, k=6 —
    // every similarity and objective an exact integer, the oracle
    // unrolls the greedy into k explicit SQL stages (PageRank's trick)
    "sim_mmr" -> ((s, d) => {
      val toMilli = "transform(embedding, x -> " +
        "cast(floor(cast(x as double) * 1000 + 0.5) as long))"
      val emb = t(s, d, "embeddings")
      val cand = emb.filter(col("vec_id") < 40)
        .select(col("vec_id"), col("embedding"), expr(toMilli).as("vm"))
      val qs = emb.filter(col("vec_id").isin(7L, 21L))
        .select(col("vec_id").as("q_id"), expr(toMilli).as("qm"))
      val rel = cand.crossJoin(broadcast(qs)).withColumn("rel_nano", expr(
        "cast(floor(1e9 * cast(aggregate(zip_with(vm, qm, (x, y) -> x * y), 0L, (a, x) -> a + x) as double) / " +
          "(sqrt(cast(aggregate(vm, 0L, (a, x) -> a + x * x) as double)) * " +
          "sqrt(cast(aggregate(qm, 0L, (a, x) -> a + x * x) as double))) + 0.5) as long)"))
      Similarity.mmrRerank(
          rel.select(col("q_id"), col("vec_id"), col("rel_nano"), col("embedding")),
          k = 6, lambdaMilli = 600)
        .orderBy("q_id", "rank")
    }),
    // JL sign projection 64→8: deterministic fmix32 ±1 matrix, exact
    // milli-integer coordinates — the shrink-then-index step of the
    // 100-TB ANN path, hash-matched coordinate by coordinate
    "sim_sign_project" -> ((s, d) =>
      Similarity.signProject(t(s, d, "embeddings").filter(col("vec_id") < 100),
          outDim = 8, inDim = 64)
        .select(col("vec_id"), posexplode(col("proj_milli")).as(Seq("j", "coord_milli")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("coord_milli"))
        .orderBy("vec_id", "j")),
    // CUBE over (lang, source): all four grouping sets in one pass
    // (partial-aggregated expand — one shuffle, no re-scan per set)
    "q_cube" -> ((s, d) =>
      t(s, d, "documents").cube("lang", "source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .select(coalesce(col("lang"), lit("(all)")).as("lang"),
          coalesce(col("source"), lit("(all)")).as("source"),
          col("n"), col("chars"))
        .orderBy("lang", "source")),
    // pivot lang → one count column per language (pinned value list: the
    // single-pass, no-second-scan form of pivot)
    "q_pivot" -> ((s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      t(s, d, "documents").groupBy("source").pivot("lang", langs).count()
        .select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
        .orderBy("source")
    }),
    // vocabulary coverage: per-document OOV counts against the broadcast
    // corpus top-15 vocabulary
    "txt_oov" -> ((s, d) =>
      TextAnalysis.oovRate(t(s, d, "documents"), vocabSize = 15)
        .select("doc_id", "n_tokens", "n_oov", "oov_rate")
        .orderBy("doc_id")),
    // PII redaction over synthesized addresses/numbers (the corpus itself
    // is clean): engine-portable regex subset, counts + redacted tail
    // verified character-exact
    "txt_redact" -> ((s, d) => {
      val withPii = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-01"), col("doc_id"), lit(" now")).as("text"))
      TextAnalysis.redactPii(withPii)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          expr("substring(redacted, length(redacted) - 39, 40)").as("tail"))
        .orderBy("doc_id")
    }),
    // HLL distinct-token estimate next to the exact count (rows-only: the
    // sketch is Spark's HLL++; TrainingOpsSpec pins the error bound)
    // HLL++ error contract: `exact` is SQL-computable (hash-verified); the
    // sketch must land within max(15%, ±2) of it — at rsd 0.02 the sparse
    // encoding is exact for small cardinalities, so the bound is generous.
    "agg_approx_distinct" -> ((s, d) => {
      import s.implicits._
      val r = t(s, d, "documents")
        .select(explode(gf.ws_tokens(col("text"))).as("token"))
        .agg(count_distinct(col("token")).as("exact"),
          approx_count_distinct(col("token"), 0.02).as("approx")).head()
      val exact = r.getLong(0); val approx = r.getLong(1)
      Seq((exact, math.abs(approx - exact) <= math.max(2L, (exact * 0.15).toLong)))
        .toDF("exact", "err_ok")
    }),
    // KLL/GK-style quantile sketch next to the exact percentile: exact
    // p50/p90 are hash-verified (continuous interpolation = quantile_cont,
    // as q_percentile pins); the sketch must land within 5% of each — at
    // accuracy 10000 over test-scale rows it is an exact order statistic,
    // so the bound is generous.
    "agg_approx_quantiles" -> ((s, d) => {
      import s.implicits._
      val r = t(s, d, "orders").agg(
        expr("percentile(o_totalprice, 0.5)"),
        expr("percentile(o_totalprice, 0.9)"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)")).head()
      val (e50, e90) = (r.getDouble(0), r.getDouble(1))
      val (a50, a90) = (r.getDouble(2), r.getDouble(3))
      def ok(e: Double, a: Double) = math.abs(a - e) <= math.abs(e) * 0.05
      Seq((BigDecimal(e50).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(e90).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        ok(e50, a50) && ok(e90, a90)))
        .toDF("p50", "p90", "approx_ok")
    }),
    // LIVE streaming windowed counts + top-2 event types per window — the
    // streaming-agg + post-ranking composition
    "st_topk" -> ((s, d) =>
      EventStreams.topEventTypesLive(s, s"$d/events.parquet", k = 2)
        .select(unix_millis(col("window_start")).as("window_start"),
          col("event_type"), col("n_events"), col("rank"))
        .orderBy("window_start", "rank")),
    // snapshot diff between the store's two recorded versions (t=1000
    // pre-upsert, t=2000 post-upsert): COW file sharing means only files
    // REWRITTEN between the versions are compared — cost ∝ changed data,
    // and version stamps are excluded so payload-unchanged rows cancel
    "kv_diff" -> ((s, d) => {
      val (store, _) = liStore(s, d)
      val v1 = KVIndex.openAt(store, "ord", 1000L).fold(e => sys.error(e.message), identity)
      val v2 = KVIndex.openAt(store, "ord", 2000L).fold(e => sys.error(e.message), identity)
      v1.diff(v2)
        .select(col("o_orderkey"), col("change"),
          round(col("old_o_totalprice"), 2).as("old_price"),
          round(col("new_o_totalprice"), 2).as("new_price"))
        .orderBy("o_orderkey")
    }),
    // SCD2 materialization of the dimension's whole version history:
    // per (key, incarnation) validity intervals from consecutive COW
    // diffs + ONE key-partitioned window; version numbers mapped to
    // history ordinals so the oracle can replay the mutation script
    "kv_scd2" -> ((s, d) => {
      val (store, _) = scd2Store(s, d)
      val vs = store.historyLog("dim").map(_._2).distinct.sorted
      def ordinal(c: Column): Column = vs.zipWithIndex.foldLeft(
        lit(null).cast("long")) { case (acc, (v, i)) =>
        when(c === v, lit((i + 1).toLong)).otherwise(acc)
      }
      graft.core.Scd2.scd2(store, "dim")
        .select(col("o_orderkey"), col("o_custkey"), col("cents"),
          ordinal(col("valid_from")).as("valid_from"),
          ordinal(col("valid_to")).as("valid_to"))
        .orderBy("o_orderkey", "valid_from")
    }),
    // the INCREMENTAL twin of kv_scd2: the history table is
    // materialized as its own index after v1 and rolled forward by two
    // refreshes (each reading only the new diffs + churned open rows);
    // the oracle is the SAME full-rebuild interval replay — incremental
    // == rebuild is the contract, like kv_agg_view
    "kv_scd2_incr" -> ((s, d) => {
      val (store, view) = scd2IncrView(s, d)
      val vs = store.historyLog("dim").map(_._2).distinct.sorted
      def ordinal(c: Column): Column = vs.zipWithIndex.foldLeft(
        lit(null).cast("long")) { case (acc, (v, i)) =>
        when(c === v, lit((i + 1).toLong)).otherwise(acc)
      }
      view.df
        .select(col("o_orderkey"), col("o_custkey"), col("cents"),
          ordinal(col("valid_from")).as("valid_from"),
          ordinal(col("valid_to")).as("valid_to"))
        .orderBy("o_orderkey", "valid_from")
    }),
    // point-in-time enrichment over the SCD2 table: probe keys × every
    // history version, each probe left-joined to the incarnation current
    // at that version (nulls before existence / in removal gaps /
    // at unknown keys); the oracle replays per-version state as CASEs
    "kv_scd2_asof" -> ((s, d) => {
      import s.implicits._
      val (store, _) = scd2Store(s, d)
      val vs = store.historyLog("dim").map(_._2).distinct.sorted
      val probes = Seq(1L, 25L, 150L, 3000001L, 9999999L)
        .flatMap(k => vs.zipWithIndex.map { case (v, i) => (k, v, (i + 1).toLong) })
        .toDF("o_orderkey", "__v", "at_version")
      graft.core.Scd2.asOf(graft.core.Scd2.scd2(store, "dim"), probes,
          Seq("o_orderkey"), "__v")
        .select(col("o_orderkey"), col("at_version"), col("cents"))
        .orderBy("o_orderkey", "at_version")
    }),
    // the SAME point-in-time probes against the MATERIALIZED SCD2 view:
    // Scd2.asOfIndex routes the probes onto the view's (key, valid_from)
    // legs (exchange-free floor lookup + interval residual) — shares
    // kv_scd2_asof's oracle verbatim
    "kv_scd2_asof_ix" -> ((s, d) => {
      import s.implicits._
      val (store, view) = scd2IncrView(s, d)
      val vs = store.historyLog("dim").map(_._2).distinct.sorted
      val probes = Seq(1L, 25L, 150L, 3000001L, 9999999L)
        .flatMap(k => vs.zipWithIndex.map { case (v, i) => (k, v, (i + 1).toLong) })
        .toDF("o_orderkey", "__v", "at_version")
      graft.core.Scd2.asOfIndex(view, probes, Seq("o_orderkey"), "__v")
        .select(col("o_orderkey"), col("at_version"), col("cents"))
        .orderBy("o_orderkey", "at_version")
    }),
    // CCNet-style cross-document segment dedup: strip 10-token segments
    // shared by >= 2 documents, reassemble the survivors in order
    "dd_seg_dedup" -> ((s, d) =>
      Dedup.dedupSegments(t(s, d, "documents"), segTokens = 10, minDf = 2)
        .select("doc_id", "n_segs", "n_removed", "cleaned")
        .orderBy("doc_id")),
    // exact duplicated-substring spans (Lee et al. suffix-array dedup,
    // relational form): maximal runs every 8-token window of which appears
    // in >= 2 documents, reported as 0-based [start, end) token spans
    "dd_substring_spans" -> ((s, d) =>
      Dedup.substringSpans(t(s, d, "documents"), gramTokens = 8, minDf = 2)
        .orderBy("doc_id", "span_start")),
    // the apply step: every document rebuilt with its duplicated-span
    // tokens dropped (docs survive, cross-doc quotes don't)
    "dd_span_clean" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.removeSpans(docs,
          Dedup.substringSpans(docs, gramTokens = 8, minDf = 2))
        .orderBy("doc_id")
    }),
    // quality-weighted downsample: orders kept with probability
    // totalprice / max(totalprice), deterministically
    "samp_weighted" -> ((s, d) =>
      graft.pipeline.Sampling.weighted(t(s, d, "orders"), "o_orderkey", "o_totalprice")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).cast("double") / 100.0)
            .as("checksum"))
        .orderBy("o_orderstatus")),
    // per-label embedding centroid cohesion (count / avg / min cosine to
    // the label's own float-cast centroid)
    "sim_centroid" -> ((s, d) =>
      Similarity.labelCohesion(t(s, d, "embeddings"))
        .select("label", "n_vecs", "avg_cos", "min_cos")
        .orderBy("label")),
    // LIVE stream-static broadcast enrichment (events × customer dim) +
    // windowed revenue per market segment
    "st_enrich" -> ((s, d) =>
      EventStreams.enrichedSegmentRevenueLive(s, s"$d/events.parquet", t(s, d, "customer"))
        .select(unix_millis(col("window_start")).as("window_start"),
          col("segment"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "segment")),
    // batch band join: all event pairs within 120 s, via the bucketed
    // equi-join (never a cartesian/broadcast-nested-loop plan)
    "q_band_join" -> ((s, d) => {
      val pairs = graft.operators.RangeJoin.bandJoin(
        t(s, d, "events").select(col("event_id"), col("ts"), col("event_type")),
        "event_id", "ts", bandMs = 120000L)
      pairs.select(col("a_event_type").as("type_a"), col("b_event_type").as("type_b"),
          (col("b_ms") - col("a_ms")).as("gap"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_pairs"), sum(abs(col("gap"))).as("sum_gap_ms"))
        .orderBy("type_a", "type_b")
    }),
    // token-length histogram (buckets of 8 tokens) — the corpus length
    // profile a batch-assembly stage sizes its packing budget from
    "txt_len_hist" -> ((s, d) =>
      t(s, d, "documents")
        .select((floor(size(gf.ws_tokens(col("text"))) / 8) * 8).as("bucket_lo"))
        .groupBy("bucket_lo").agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket_lo")),
    // z-order (Morton) interleave — the multi-dimensional clustering
    // value; the layout property itself (tight per-file min/max on BOTH
    // dims) is pinned in ZOrderSpec
    "layout_zorder" -> ((s, d) =>
      t(s, d, "events").filter(col("event_id") < 200)
        .select(col("event_id"),
          graft.operators.ZOrder.zValue(col("user_id"), col("event_id") % 65536).as("z"))
        .orderBy("event_id")),
    // JSON source/sink round-trip (escaping-safe): write the documents
    // table as JSON lines, read it back with the explicit schema, checksum
    "io_json_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "source", "lang", "text")
      val p = java.nio.file.Files.createTempDirectory("graft-json").toString
      docs.write.mode("overwrite").json(p)
      s.read.schema(docs.schema).json(p)
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(length(col("text"))).as("text_len"))
    }),
    // CSV source/sink round-trip (quoting-safe), typed read-back
    "io_csv_roundtrip" -> ((s, d) => {
      val ord = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      val p = java.nio.file.Files.createTempDirectory("graft-csv").toString
      ord.write.mode("overwrite").option("header", "true").csv(p)
      s.read.schema(ord.schema).option("header", "true").csv(p)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).cast("double") / 100.0)
            .as("checksum"))
        .orderBy("o_orderstatus")
    }),
    // exact range count at manifest cost: interior files counted from
    // stats with zero IO, only the two boundary files scanned
    "kv_count_range" -> ((s, d) => {
      import s.implicits._
      val (_, ix) = liStore(s, d)
      Seq(ix.countRange(Seq(100L), Seq(5000L))).toDF("n")
    }),
    // bulk range delete at file grain (LSM DeleteRange analogue): interior
    // files drop from the manifest with zero IO, only the two boundary
    // files rewrite — survivor count + checksum + removal accounting
    "kv_range_delete" -> ((s, d) => {
      import s.implicits._
      val (_, ix) = rangeDelStore(s, d)
      val removed = rdResults(s"kv-rangedel|$d")
      val r = ix.df.agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).cast("double") / 100.0)
          .as("checksum")).head()
      Seq((r.getLong(0), r.getDouble(1), removed, ix.numFiles.toLong))
        .toDF("n", "checksum", "n_removed", "n_files")
    }),
    // GROUPING SETS — the explicit-set sibling of cube/rollup, one
    // expand + single shuffle for all three grains
    "q_grouping_sets" -> ((s, d) =>
      t(s, d, "lineitem").groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),
    // arg-max per group (max_by): the row-valued aggregate; tie-broken on
    // a unique (cents, orderkey) composite so the winner is deterministic
    "agg_arg_max" -> ((s, d) => {
      val ordKey = floor(col("o_totalprice") * 100 + 0.5).cast("long") *
        lit(100000000L) + col("o_orderkey")
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(max_by(col("o_orderkey"), ordKey).as("top_orderkey"),
          round(max_by(col("o_totalprice"), ordKey), 2).as("top_price"))
        .orderBy("o_orderstatus")
    }),
    // DSIR-style data selection (linearized, integer-exact): top-30 docs
    // by mean smoothed bigram-probability ratio against the lang='en'
    // target slice — one corpus pass, tf-reduced gram table reused for
    // both count and probe sides, exact-gram ratio join NOT broadcast
    "pipe_dsir" -> ((s, d) =>
      graft.pipeline.Sampling.importanceTopK(
        t(s, d, "documents"), col("lang") === "en", 30)),
    // alpha-smoothed (alpha = 0.5) domain mixture weights over character
    // volume — the sampling distribution a temperature-mixed corpus uses
    // per-domain quota cap (RefinedWeb/Pile rule): keep the top-20
    // highest-priority docs per source; WindowGroupLimit plan — each
    // partition pre-truncates before the one shuffle on the domain key
    "pipe_domain_cap" -> ((s, d) =>
      graft.pipeline.Sampling.domainCap(t(s, d, "documents"),
          "source", 20, "n_chars", "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"),
          sum("n_chars").as("chars_sum"))
        .orderBy("source")),
    // rolling z-score anomaly scores: each observed hour vs its trailing
    // 24 observed hours, exact-integer window sums, micro-quantized z
    "ts_anomaly" -> ((s, d) =>
      graft.operators.TimeSeries.anomalies(
          events(s, d).filter(col("user_id") < 40),
          "user_id", "ts", "value", bucketMs = 3600000L, lookback = 24)
        .orderBy("user_id", "bin")),
    // time-bucket resample + LOCF gap fill over the event stream: hourly
    // per-user cents totals, empty hours carried forward and flagged
    "ts_gapfill" -> ((s, d) =>
      graft.operators.TimeSeries.gapFill(
          events(s, d).filter(col("user_id") < 40),
          "user_id", "ts", "value", bucketMs = 3600000L)
        .orderBy("user_id", "bin")),
    "pipe_domain_mix" -> ((s, d) =>
      graft.pipeline.Sampling.domainMixture(t(s, d, "documents"), "source", "n_chars")
        .orderBy("source")),
    // cross-document bigram novelty: fraction of each doc's distinct
    // bigrams that occur in no other document (df = 1)
    "txt_novelty" -> ((s, d) =>
      TextAnalysis.bigramNovelty(t(s, d, "documents"))
        .select("doc_id", "n_bigrams", "n_novel", "novelty")
        .orderBy("doc_id")),
    // global token-budget cut via the two-pass prefix scan (per-bucket
    // sums + broadcast offsets) — never a single-reducer running total
    "pipe_token_budget" -> ((s, d) =>
      graft.pipeline.Packing.headByBudget(
          t(s, d, "documents"), "doc_id", "n_chars", budget = 50000L)
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))),
    // co-located bucketed join: both sides bucketed on the join key into
    // the session catalog, merge-join planned with NO exchange on either
    // side (the layout-level join the kv snapshots enable; pinned in
    // BucketedJoinSpec)
    "layout_bucket_join" -> ((s, d) => {
      val (ordTbl, custTbl) = cachedBucketPair("bkt", d) { (ot, ct, p) =>
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode("overwrite").option("path", s"$p/o")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ot)
        t(s, d, "customer").select("c_custkey", "c_mktsegment")
          .write.mode("overwrite").option("path", s"$p/c")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(ct)
      }
      s.table(ordTbl).hint("merge")
        .join(s.table(custTbl),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).cast("double") / 100.0)
            .as("revenue"))
        .orderBy("c_mktsegment")
    }),
    // RANGE-frame window (value-based frame, not row-based): per customer,
    // cent volume of orders within the trailing 5 order keys
    "q_window_range" -> ((s, d) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rangeBetween(-5L, Window.currentRow)
      t(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(cents).over(w).as("near_cents"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    // window navigation functions in one pass: lead/lag with defaults,
    // ntile, first_value — one sort per partition serves all four
    "q_window_nav" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      t(s, d, "orders").filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1, -1L).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
          ntile(4).over(w).cast("long").as("quartile"),
          first_value(cents).over(w).as("first_cents"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    // correlated scalar subqueries (per-row aggregate lookups): the
    // planner must decorrelate to an aggregate + join, never a per-row
    // re-scan; exact integer-cent math keeps the comparison portable
    "q_corr_scalar" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("ord_v")
      s.sql("""
        SELECT count(*) AS n,
               CAST(sum(cents) AS DOUBLE) / 100.0 AS big_total
        FROM (
          SELECT o.o_orderkey,
                 CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM ord_v o
          WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) *
                (SELECT count(*) FROM ord_v i WHERE i.o_custkey = o.o_custkey) >
                2 * (SELECT sum(CAST(floor(i.o_totalprice * 100 + 0.5) AS BIGINT))
                     FROM ord_v i WHERE i.o_custkey = o.o_custkey)
        )""")
    }),
    // scalar string-function surface over the portable subset (case,
    // trim, pad, substring, replace, regexp extract) — pure projection
    "q_string_funcs" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 50)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          length(trim(col("c_name"))).cast("long").as("trimmed_len"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          substring(col("c_name"), 1, 8).as("prefix8"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey")),
    // order-pinned list aggregation: collect + explicit sort renders the
    // same string on any engine/partitioning
    "agg_list_sorted" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_custkey") <= 20)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("o_orderkey").cast("string"))), ",")
            .as("order_keys"))
        .orderBy("o_custkey")),
    // left outer join with null-group accounting: customers without
    // orders survive with o_cnt null; the aggregate counts both
    "q_outer_join" -> ((s, d) => {
      val perCust = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("o_cnt"))
      t(s, d, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          count(col("o_cnt")).as("with_orders"),
          coalesce(sum(col("o_cnt")), lit(0L)).as("total_orders"))
        .orderBy("c_mktsegment")
    }),
    // ORC source/sink round-trip (second columnar format), typed read-back
    "io_orc_roundtrip" -> ((s, d) => {
      val ord = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      val p = java.nio.file.Files.createTempDirectory("graft-orc").toString
      ord.write.mode("overwrite").orc(p)
      s.read.schema(ord.schema).orc(p)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).cast("double") / 100.0)
            .as("checksum"))
        .orderBy("o_orderstatus")
    }),
    // two SNAPSHOT indexes exported once into co-bucketed tables, then
    // merge-joined with zero exchanges: the store's range layout serves
    // scans and point reads, the bucketed export serves join-heavy work
    "kv_colocated_join" -> ((s, d) => {
      val (ordTbl, liTbl) = cachedBucketPair("kvbkt", d) { (ot, lt, p) =>
        val (_, ord) = liStore(s, d) // price zeroed for orderkey < 50
        ord.toBucketedTable(ot, 8, s"$p/ord")
        liAggStore(s, d).toBucketedTable(lt, 8, s"$p/li")
      }
      s.table(ordTbl).hint("merge")
        .join(s.table(liTbl), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("qty")).cast("long").as("qty_sum"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).cast("double") / 100.0)
            .as("price_sum"))
    }),
    // the SAME join class with NO export at all: two snapshot indexes
    // key-equi-joined straight from their range layouts — shared leg
    // boundaries cut from both manifests, one partition per leg, a
    // partition-zipped hash join, zero exchanges on either side
    // (KVIndex.coRangeJoin / ZipPartitionsJoinExec; the SQL twin
    // GraftCoRangeJoin rewrites catalog `a JOIN b ON keys` the same way)
    "kv_corange_join" -> ((s, d) => {
      val (_, ord) = liStore(s, d) // price zeroed for orderkey < 50
      ord.coRangeJoin(liAggStore(s, d))
        .filter(col("o_orderkey") <= 200)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"),
          col("qty").cast("long").as("qty"), col("n_lines"))
        .orderBy("o_orderkey")
    }),
    // the SQL twin under a selective WHERE: GraftCoRangeJoin rewrites the
    // catalog key join into the zip join AND keeps the scans' pushed
    // leading-key file prune — the legs are cut from the files covering
    // [100, 300] only, so the exchange-free plan also reads the pruned
    // subset instead of both full snapshots
    "kv_corange_where" -> ((s, d) => {
      val (ordStore, _) = liStore(s, d) // price zeroed for orderkey < 50
      val liIx = liAggStore(s, d)
      s.conf.set("spark.sql.catalog.graft_crw_a", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_crw_a.root", ordStore.root)
      s.conf.set("spark.sql.catalog.graft_crw_b", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_crw_b.root", liIx.store.root)
      s.sql("""
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price,
               CAST(l.qty AS BIGINT) AS qty, l.n_lines
        FROM graft_crw_a.ord o JOIN graft_crw_b.liagg l
          ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey >= 100 AND o.o_orderkey <= 300
        ORDER BY o.o_orderkey""")
    }),
    // join → aggregate on the join key, END-TO-END exchange-free: the zip
    // join reports Spark's own RangePartitioning (legs are cut on
    // full-key boundaries, so equal keys share a leg), which satisfies
    // the aggregation's ClusteredDistribution — GROUP BY the key plans
    // no shuffle above the zero-shuffle join (ZipPartitionsJoinExec
    // .outputPartitioning; CoRangeJoinSpec pins the plan shape)
    "kv_corange_agg" -> ((s, d) => {
      val (_, ord) = liStore(s, d) // price zeroed for orderkey < 50
      ord.coRangeJoin(liAggStore(s, d))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("qty")).cast("long").as("qty_sum"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("price_cents"),
          count(lit(1)).as("n"))
        .filter(col("o_orderkey") <= 500)
        .orderBy("o_orderkey")
    }),
    // the LEFT-preserving snapshot-diff family, still zero-exchange: keys
    // only the left covers ride a separate pass-through/null-extension
    // union branch (KVIndex.coRangeJoin joinType; the SQL twin rewrites
    // LEFT JOIN and [NOT] EXISTS the same way)
    "kv_corange_left" -> ((s, d) => {
      val (_, ord) = liStore(s, d) // price zeroed for orderkey < 50
      ord.coRangeJoin(liAggOddStore(s, d), joinType = "left_outer")
        .filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
          col("qty").cast("long").as("qty"), col("n_lines"))
        .orderBy("o_orderkey")
    }),
    "kv_corange_anti" -> ((s, d) => {
      val (_, ord) = liStore(s, d)
      ord.coRangeJoin(liAggOddStore(s, d), joinType = "left_anti")
        .filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    }),
    "kv_corange_semi" -> ((s, d) => {
      val (_, ord) = liStore(s, d)
      ord.coRangeJoin(liAggOddStore(s, d), joinType = "left_semi")
        .filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    }),
    // RIGHT OUTER mirrors left: the preserved side is the right one, the
    // key column COALESCEs (right-only rows keep their key), the ordering
    // claim moves to the right keys
    "kv_corange_right" -> ((s, d) => {
      liAggOddStore(s, d).coRangeJoin(ordMod3Store(s, d),
          joinType = "right_outer")
        .filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("qty").cast("long").as("qty"),
          col("n_lines"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("l_orderkey")
    }),
    // leading-key-PREFIX join through SQL: the fact is keyed
    // (l_orderkey, l_linenumber), the dimension (o_orderkey) — the join
    // binds only the leading component, so legs are cut at PREFIX-group
    // boundaries (a boundary can never split an order's lines) and the
    // plan is still exchange-free with the WHERE bound pruning files
    "kv_corange_prefix" -> ((s, d) => {
      val liIx = liLinesStore(s, d)
      val ordIx = ordMod3Store(s, d)
      s.conf.set("spark.sql.catalog.graft_crp_a", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_crp_a.root", liIx.store.root)
      s.conf.set("spark.sql.catalog.graft_crp_b", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_crp_b.root", ordIx.store.root)
      s.sql("""
        SELECT l.l_orderkey, l.l_linenumber, CAST(l.qty AS BIGINT) AS qty,
               o.o_custkey
        FROM graft_crp_a.lilines l JOIN graft_crp_b.ordmod3 o
          ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey <= 500
        ORDER BY l.l_orderkey, l.l_linenumber""")
    }),
    // AS-OF co-range join: latest line at-or-before each order's probe,
    // exchange-free (prefix-cut legs + per-leg ordered merge). left_outer:
    // single-line orders probe below every line and null-extend.
    "kv_corange_asof" -> ((s, d) => {
      liProbeStore(s, d).asOfJoin(liLinesStore(s, d), equiLen = 1,
          joinType = "left_outer")
        .filter(col("l_orderkey") <= 400)
        .select(col("l_orderkey"), col("probe_ln"), col("n_lines"),
          col("asof_ts").as("asof_ln"), col("qty").cast("long").as("qty"))
        .orderBy("l_orderkey")
    }),
    // strict + tolerance variant, inner: match the latest line STRICTLY
    // below the probe and within 2 line numbers; orders whose best match
    // falls outside the band drop entirely
    "kv_corange_asof_tol" -> ((s, d) => {
      liProbeStore(s, d).asOfJoin(liLinesStore(s, d), equiLen = 1,
          joinType = "inner", strict = true, tolerance = 2L)
        .filter(col("l_orderkey") <= 400)
        .select(col("l_orderkey"), col("probe_ln"), col("n_lines"),
          col("asof_ts").as("asof_ln"), col("qty").cast("long").as("qty"))
        .orderBy("l_orderkey")
    }),
    // the API twin of kv_corange_prefix: coRangeJoin(equiLen = 1) joins
    // the composite-keyed lines to the single-keyed orders on the leading
    // component, exchange-free, whole groups emitted
    "kv_corange_prefix_api" -> ((s, d) => {
      liLinesStore(s, d).coRangeJoin(ordMod3Store(s, d),
          joinType = "inner", equiLen = 1)
        .filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("qty").cast("long").as("qty"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // TIMESTAMP-keyed as-of with an interval tolerance: per-user probe
    // instants floor to the latest event reading within 10 minutes —
    // exchange-free over two (user_id, ts)-keyed snapshots; timestamps
    // leave as epoch millis (the repo's DuckDB parity convention)
    "kv_corange_asof_ts" -> ((s, d) => {
      evProbeStore(s, d).asOfJoin(evReadStore(s, d), equiLen = 1,
          joinType = "left_outer", tolerance = 600000000L) // 10 min in micros
        .select(col("user_id"), unix_millis(col("pts")).as("probe_ms"),
          unix_millis(col("asof_ts")).as("asof_ms"), col("cnt"), col("cents"))
        .orderBy("user_id")
    }),
    // STREAMING as-of enrichment: the LIVE event stream's micro-batches
    // route onto the snapshot's legs (per-batch file prune + probe-side
    // shuffle only) and append enriched rows to a parquet sink — same
    // semantics and oracle as kv_asof_probe, exercised through a real
    // streaming query
    "st_asof_enrich" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft-asof-enrich").toString
      val probes = EventStreams.readEventStream(s, s"$d/events.parquet")
        .filter(col("event_id") % 7 === 0)
        .select(col("event_id"), col("user_id"), col("ts"))
      EventStreams.asOfEnrichStream(probes, evReadStore(s, d), Seq("user_id"),
        "ts", out, joinType = "left_outer", strict = true,
        tolerance = 1800000000L)
      s.read.parquet(out)
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("probe_ms"),
          unix_millis(col("asof_ts")).as("asof_ms"), col("cnt"), col("cents"))
        .orderBy("event_id")
    }),
    // STREAMING EQUI enrichment: the live event stream's micro-batches
    // join the snapshot on its FULL key (exact point lookups) via the
    // probe join — per-batch file prune, probe-side-only shuffle, empty
    // batches never touch the snapshot
    "st_probe_enrich" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft-probe-enrich").toString
      val probes = EventStreams.readEventStream(s, s"$d/events.parquet")
        .filter(col("event_id") % 23 === 0)
        .select(col("event_id"), col("user_id"), col("ts"))
      EventStreams.probeEnrichStream(probes, evReadStore(s, d),
        Seq("user_id", "ts"), out, joinType = "left_outer")
      s.read.parquet(out)
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("cnt"), col("cents"))
        .orderBy("event_id")
    }),
    // EQUI PROBE join: an arbitrary fact frame (every 5th order) joins the
    // composite-keyed snapshot on its leading key — probes route onto the
    // snapshot's legs (probe-side-only shuffle), each probe emits its
    // whole (orderkey, linenumber) group
    "kv_probe_join" -> ((s, d) => {
      val probes = t(s, d, "orders").filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("k"), col("o_custkey"))
      liLinesStore(s, d).probeJoin(probes, Seq("k"), joinType = "left_outer")
        .select(col("k"), col("o_custkey"), col("l_linenumber"),
          col("qty").cast("long").as("qty"))
        .orderBy("k", "l_linenumber")
    }),
    // The AS-OF SQL IDIOM: the classic ts-bounded equi-join + row_number()
    // pick expressed in PLAIN SQL TEXT over two graft snapshots plans the
    // exchange-free AsOfZipJoin — no shuffle, NO WINDOW (GraftAsOfIdiom).
    // Same semantics as kv_corange_asof; the plan shape is asserted, so
    // this row pins the rewrite in the correctness gate.
    "kv_sql_asof" -> ((s, d) => {
      val liIx = liLinesStore(s, d)
      val prIx = liProbeStore(s, d)
      s.conf.set("spark.sql.catalog.graft_sqa_p", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqa_p.root", prIx.store.root)
      s.conf.set("spark.sql.catalog.graft_sqa_r", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqa_r.root", liIx.store.root)
      val q = s.sql("""
        SELECT l_orderkey, probe_ln, n_lines, asof_ln, qty FROM (
          SELECT p.l_orderkey, p.probe_ln, p.n_lines,
                 r.l_linenumber AS asof_ln, CAST(r.qty AS BIGINT) AS qty,
                 row_number() OVER (PARTITION BY p.l_orderkey, p.probe_ln
                                    ORDER BY r.l_linenumber DESC) AS rn
          FROM graft_sqa_p.liprobe p LEFT JOIN graft_sqa_r.lilines r
            ON p.l_orderkey = r.l_orderkey AND r.l_linenumber <= p.probe_ln
        ) WHERE rn = 1 AND l_orderkey <= 400
        ORDER BY l_orderkey""")
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("AsOfZipJoin") && !plan.contains("Window"),
        s"kv_sql_asof: expected the as-of merge with no window, got:\n$plan")
      q
    }),
    // The as-of idiom WITH A TOLERANCE BAND in plain SQL — the exact text
    // of the engine's own fallback (`x.ts >= p.pts - INTERVAL 10 MINUTE`)
    // maps to the merge's native-unit tolerance and plans the exchange-
    // free AsOfZipJoin over the two TIMESTAMP-keyed snapshots; same
    // semantics as kv_corange_asof_ts, reached from SQL text
    "kv_sql_asof_tol" -> ((s, d) => {
      val pIx = evProbeStore(s, d)
      val rIx = evReadStore(s, d)
      s.conf.set("spark.sql.catalog.graft_sqt_p", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqt_p.root", pIx.store.root)
      s.conf.set("spark.sql.catalog.graft_sqt_r", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqt_r.root", rIx.store.root)
      val q = s.sql("""
        SELECT user_id, probe_ms, asof_ms, cnt, cents FROM (
          SELECT p.user_id, unix_millis(p.pts) AS probe_ms,
                 unix_millis(r.ts) AS asof_ms, r.cnt, r.cents,
                 row_number() OVER (PARTITION BY p.user_id, p.pts
                                    ORDER BY r.ts DESC) AS rn
          FROM graft_sqt_p.evprobe p LEFT JOIN graft_sqt_r.evread r
            ON p.user_id = r.user_id AND r.ts <= p.pts
               AND r.ts >= p.pts - INTERVAL 10 MINUTE
        ) WHERE rn = 1
        ORDER BY user_id""")
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("AsOfZipJoin") && !plan.contains("Window"),
        s"kv_sql_asof_tol: expected the tolerance as-of merge, got:\n$plan")
      q
    }),
    // The as-of idiom with a GROUP BY probe side ("latest reading per
    // user at their last event"): the Aggregate's exposed grouping set
    // proves per-row uniqueness, so GraftAsOfIdiom routes the probes onto
    // the snapshot's legs — no window, no snapshot movement; the only
    // exchanges are the GROUP BY's own.
    "kv_sql_asof_probe" -> ((s, d) => {
      val rdIx = evReadStore(s, d)
      s.conf.set("spark.sql.catalog.graft_sqap", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqap.root", rdIx.store.root)
      events(s, d).select(col("user_id"), col("ts"))
        .createOrReplaceTempView("graft_sqap_events")
      val q = s.sql("""
        SELECT user_id, unix_millis(pts) AS pts_ms, unix_millis(asof_ts) AS asof_ms,
               cnt, cents FROM (
          SELECT p.user_id, p.pts, r.ts AS asof_ts, r.cnt, r.cents,
                 row_number() OVER (PARTITION BY p.user_id ORDER BY r.ts DESC) AS rn
          FROM (SELECT user_id, max(ts) AS pts FROM graft_sqap_events GROUP BY user_id) p
          LEFT JOIN graft_sqap.evread r
            ON p.user_id = r.user_id AND r.ts <= p.pts
        ) WHERE rn = 1
        ORDER BY user_id""")
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("AsOfZipJoin") && !plan.contains("Window"),
        s"kv_sql_asof_probe: expected the probe-routed as-of merge, got:\n$plan")
      q
    }),
    // AS-OF idiom with a SELECT DISTINCT probe side (r18): DISTINCT
    // lowers to Aggregate(all cols), so partitioning by the FULL distinct
    // tuple is provably unique — the idiom routes the probes onto the
    // snapshot's legs (snapshot never moves, no Window). Plan pinned.
    "kv_sql_asof_distinct" -> ((s, d) => {
      val rdIx = evReadStore(s, d)
      s.conf.set("spark.sql.catalog.graft_sqad", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqad.root", rdIx.store.root)
      events(s, d).select(col("user_id"), col("ts"))
        .createOrReplaceTempView("graft_sqad_events")
      val q = s.sql("""
        SELECT user_id, unix_millis(pts) AS pts_ms, unix_millis(asof_ts) AS asof_ms,
               cnt, cents FROM (
          SELECT p.user_id, p.pts, r.ts AS asof_ts, r.cnt, r.cents,
                 row_number() OVER (PARTITION BY p.user_id, p.pts
                                    ORDER BY r.ts DESC) AS rn
          FROM (SELECT DISTINCT user_id, ts - INTERVAL 30 MINUTES AS pts
                FROM graft_sqad_events) p
          LEFT JOIN graft_sqad.evread r
            ON p.user_id = r.user_id AND r.ts <= p.pts
        ) WHERE rn = 1
        ORDER BY user_id, pts_ms""")
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("AsOfZipJoin") && !plan.contains("Window"),
        s"kv_sql_asof_distinct: expected the DISTINCT-probe as-of merge, got:\n$plan")
      q
    }),
    // SQL PROBE join: the same facts-vs-snapshot shape as kv_probe_join
    // expressed in PLAIN SQL TEXT — `facts LEFT JOIN cat.snap ON key` with
    // exactly one graft side plans the probe-routed zip join (snapshot =
    // exchange-free leg union, facts routed by one RDD partitioner
    // shuffle; zero SQL exchanges). The broadcast guard is lifted for the
    // small test snapshot and the plan shape is asserted, so this row
    // pins the rewrite in the correctness gate; the result materializes
    // under the modified conf (the st_asof_enrich temp-sink convention).
    "kv_sql_probe_join" -> ((s, d) => {
      val liIx = liLinesStore(s, d)
      s.conf.set("spark.sql.catalog.graft_spj", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_spj.root", liIx.store.root)
      t(s, d, "orders").filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("k"), col("o_custkey"))
        .createOrReplaceTempView("graft_spj_facts")
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val q = s.sql("""
          SELECT f.k, f.o_custkey, li.l_linenumber, CAST(li.qty AS BIGINT) AS qty
          FROM graft_spj_facts f LEFT JOIN graft_spj.lilines li
            ON f.k = li.l_orderkey""")
        val plan = q.queryExecution.executedPlan.toString
        require(plan.contains("ZipPartitionsJoin"),
          s"kv_sql_probe_join: expected the probe-routed zip join, got:\n$plan")
        val out = java.nio.file.Files.createTempDirectory("graft-sqlprobe").toString
        q.write.mode("overwrite").parquet(out)
        s.read.parquet(out).orderBy("k", "l_linenumber")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }),
    // SQL probe join under the conf-gated EAGER BOUNDS path
    // (spark.graft.probe.sqlEagerBounds): one optimizer-time min/max/count
    // job over the (selective) fact side prunes the snapshot's files to
    // the probes' key range before legs are cut — the SQL path gains the
    // API path's file prune. The prune is pinned (fewer input files than
    // the conf-off run over a multi-file manifest) plus the plan shape.
    "kv_sql_probe_prune" -> ((s, d) => {
      val liIx = liLinesFineStore(s, d)
      s.conf.set("spark.sql.catalog.graft_spp", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_spp.root", liIx.store.root)
      t(s, d, "orders")
        .filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") <= 200)
        .select(col("o_orderkey").as("k"), col("o_custkey"))
        .createOrReplaceTempView("graft_spp_facts")
      val prevB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val sqlText = """
          SELECT f.k, f.o_custkey, li.l_linenumber, CAST(li.qty AS BIGINT) AS qty
          FROM graft_spp_facts f LEFT JOIN graft_spp.lilines li
            ON f.k = li.l_orderkey"""
        val all = s.sql(sqlText).inputFiles.length
        s.conf.set("spark.graft.probe.sqlEagerBounds", "true")
        try {
          val q = s.sql(sqlText)
          val plan = q.queryExecution.executedPlan.toString
          require(plan.contains("ZipPartitionsJoin"),
            s"kv_sql_probe_prune: expected the probe-routed zip join, got:\n$plan")
          val pruned = q.inputFiles.length
          require(all <= 1 || pruned < all,
            s"kv_sql_probe_prune: eager bounds must prune ($pruned of $all files)")
          val out = java.nio.file.Files.createTempDirectory("graft-sqlprune").toString
          q.write.mode("overwrite").parquet(out)
          s.read.parquet(out).orderBy("k", "l_linenumber")
        } finally s.conf.unset("spark.graft.probe.sqlEagerBounds")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }),
    // EXCHANGE-FREE prefix GROUP BY (r17, GraftPrefixCluster): grouping on
    // the snapshot's leading key re-plans the scan as prefix-grain legs
    // claiming RangePartitioning(prefix) — the aggregate runs complete per
    // leg and the ORDER BY above needs no exchange either. Zero shuffles
    // end to end, pinned in the plan.
    "kv_sql_prefix_agg" -> ((s, d) => {
      val liIx = liLinesFineStore(s, d)
      s.conf.set("spark.sql.catalog.graft_spa", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_spa.root", liIx.store.root)
      val q = s.sql("""
        SELECT l_orderkey, count(*) AS n, CAST(sum(qty) AS BIGINT) AS q
        FROM graft_spa.lilines GROUP BY l_orderkey ORDER BY l_orderkey""")
      val plan = q.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"kv_sql_prefix_agg: expected a zero-exchange prefix aggregate, got:\n$plan")
      q
    }),
    // EXCHANGE-FREE prefix WINDOW (r17, GraftPrefixCluster): PARTITION BY
    // the leading key over the snapshot routes through the prefix legs —
    // stock window plans shuffle the FULL row stream (no partial
    // aggregation exists for windows), here zero exchanges and only a
    // local per-leg sort. Plan pinned.
    "kv_sql_window_prefix" -> ((s, d) => {
      val liIx = liLinesFineStore(s, d)
      s.conf.set("spark.sql.catalog.graft_spw", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_spw.root", liIx.store.root)
      val q = s.sql("""
        SELECT l_orderkey, l_linenumber, rn, CAST(run_qty AS BIGINT) AS run_qty FROM (
          SELECT l_orderkey, l_linenumber,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber) AS rn,
                 sum(qty) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                ROWS UNBOUNDED PRECEDING) AS run_qty
          FROM graft_spw.lilines
        ) WHERE l_orderkey <= 500
        ORDER BY l_orderkey, l_linenumber""")
      // collect the exec nodes, not plan-string substrings: in Spark 4.1
      // ShuffleExchangeExec renders as "Exchange hashpartitioning(...)",
      // so a substring pin on "ShuffleExchange" can never fire
      val shuffles = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      require(shuffles.isEmpty,
        "kv_sql_window_prefix: expected a zero-exchange prefix window, got:\n" +
          q.queryExecution.executedPlan.toString)
      q
    }),
    // VIEW-path prefix GROUP BY (r18): the registered-view stitch carries
    // its SnapshotSource, so GraftPrefixCluster re-cuts the VIEW's legs at
    // prefix grain — the same zero-exchange aggregate catalog scans get
    // (the r17 symmetry gap, closed). Plan pinned exchange-free.
    "kv_sql_view_prefix" -> ((s, d) => {
      liLinesFineStore(s, d) // registers graft_vpfx once per (jvm, sf)
      val q = s.sql("""
        SELECT l_orderkey, count(*) AS n, CAST(sum(qty) AS BIGINT) AS q
        FROM graft_vpfx GROUP BY l_orderkey ORDER BY l_orderkey""")
      val shuffles = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      require(shuffles.isEmpty,
        "kv_sql_view_prefix: expected a zero-exchange view-path prefix " +
          "aggregate, got:\n" + q.queryExecution.executedPlan.toString)
      q
    }),
    // MANIFEST TOP-K from SQL (r18, GraftOrderedScan's limit rung):
    // `ORDER BY <key prefix> LIMIT n` re-plans the scan as the file
    // prefix covering the first n rows — ⌈n/rowsPerFile⌉ files read
    // (pinned to ONE here per direction) instead of a
    // TakeOrderedAndProject over every covering file. ASC head + DESC
    // tail in one result, tagged.
    "kv_sql_topk" -> ((s, d) => {
      val liIx = liLinesFineStore(s, d)
      s.conf.set("spark.sql.catalog.graft_tk", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_tk.root", liIx.store.root)
      val asc = s.sql("""
        SELECT 'head' AS tag, l_orderkey, l_linenumber, CAST(qty AS BIGINT) AS qty
        FROM graft_tk.lilines ORDER BY l_orderkey, l_linenumber LIMIT 50""")
      require(asc.inputFiles.length == 1,
        s"kv_sql_topk: ASC LIMIT 50 over 2048-row files must read ONE file, " +
          s"got ${asc.inputFiles.length}")
      val desc = s.sql("""
        SELECT 'tail' AS tag, l_orderkey, l_linenumber, CAST(qty AS BIGINT) AS qty
        FROM graft_tk.lilines ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 50""")
      require(desc.inputFiles.length == 1,
        s"kv_sql_topk: DESC LIMIT 50 must read the single tail file, " +
          s"got ${desc.inputFiles.length}")
      asc.unionAll(desc)
    }),
    // FILTERED SQL top-k (r19, GrowPrefixTopK): `WHERE <non-key residual>
    // ORDER BY <key prefix> LIMIT n` — the optimizer cannot bound a
    // filtered prefix statically, so execution pulls the key-ordered
    // covering legs in DOUBLING batches until n survivors exist. A
    // ~1-in-7 predicate fills LIMIT 50 inside the FIRST leg at any
    // snapshot size (telemetry pinned both directions); zero survivors
    // would read every leg exactly once — never more.
    "kv_sql_topk_where" -> ((s, d) => {
      val liIx = liLinesFineStore(s, d)
      s.conf.set("spark.sql.catalog.graft_tkw", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_tkw.root", liIx.store.root)
      def page(tag: String, dir: String) = {
        val q = s.sql(s"""
          SELECT '$tag' AS tag, l_orderkey, l_linenumber, CAST(qty AS BIGINT) AS qty
          FROM graft_tkw.lilines WHERE CAST(floor(qty) AS BIGINT) % 7 = 0
          ORDER BY l_orderkey $dir, l_linenumber $dir LIMIT 50""")
        q.collect()
        // per-query SQL metrics on the exec node (no process-global state
        // a concurrent query could clobber between run and assertion)
        val tel = graft.plans.GrowPrefixTopKExec.telemetryOf(q)
        require(tel.size == 1,
          s"kv_sql_topk_where $tag: expected the grow-prefix exec, got ${tel.size} nodes")
        val (scanned, total, _) = tel.head
        require(scanned >= 1 && scanned <= 2,
          s"kv_sql_topk_where $tag: ~1-in-7 survivors over 2048-row legs " +
            s"must fill LIMIT 50 in the first leg(s), scanned $scanned of $total")
        q
      }
      page("head", "ASC").unionAll(page("tail", "DESC"))
    }),
    // KEYSET PAGINATION from SQL (r18, the top-k rung + leading-key range
    // predicates): `WHERE k > last ORDER BY k LIMIT page` reads at most
    // the boundary file plus the guarantee prefix — ~one file per page at
    // any snapshot size (the API's s12_keyset_page, now from SQL text).
    // Three consecutive pages, file bound pinned per page.
    "kv_sql_keyset_page" -> ((s, d) => {
      val liIx = liLinesFineStore(s, d)
      s.conf.set("spark.sql.catalog.graft_kp", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_kp.root", liIx.store.root)
      var last = 0L
      val pages = (1 to 3).map { i =>
        val q = s.sql(s"""
          SELECT l_orderkey, l_linenumber, CAST(qty AS BIGINT) AS qty
          FROM graft_kp.lilines WHERE l_orderkey > $last
          ORDER BY l_orderkey, l_linenumber LIMIT 40""")
        require(q.inputFiles.length <= 2,
          s"kv_sql_keyset_page: page $i after $last must read <= 2 files " +
            s"(boundary + guarantee), got ${q.inputFiles.length}")
        val rows = q.collect()
        require(rows.nonEmpty,
          s"kv_sql_keyset_page: page $i after l_orderkey=$last came back " +
            "empty — the fixture holds fewer than 3 pages at this scale")
        last = rows.map(_.getLong(0)).max
        (i, rows)
      }
      import s.implicits._
      pages.flatMap { case (i, rows) => rows.map(r =>
        (i, r.getLong(0), r.getInt(1), r.getLong(2))) }
        .toDF("page", "l_orderkey", "l_linenumber", "qty")
    }),
    // COMPOSITE-PREFIX count-range (r17, GraftCountRange): `WHERE k1 = a
    // AND k2 BETWEEN x AND y` — the temporal-KV stats shape — answers
    // count/min/max from manifest prefix-tuple coverage, scanning at most
    // the two boundary files the interval cuts through (pinned here).
    "kv_sql_count_prefix" -> ((s, d) => {
      val liIx = liLinesFineStore(s, d)
      s.conf.set("spark.sql.catalog.graft_scp", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_scp.root", liIx.store.root)
      graft.sources.GraftScan.lastPlannedFiles = -1
      val q = s.sql("""
        SELECT count(*) AS n, min(l_linenumber) AS mn, max(l_linenumber) AS mx,
               min(l_orderkey) AS okmn
        FROM graft_scp.lilines
        WHERE l_orderkey = 34 AND l_linenumber >= 2 AND l_linenumber <= 5""")
      q.queryExecution.executedPlan
      val planned = graft.sources.GraftScan.lastPlannedFiles
      require(planned >= 0 && planned <= 2,
        s"kv_sql_count_prefix: expected a manifest-served prefix count with " +
          s"at most 2 boundary files, planned $planned")
      q
    }),
    // The as-of SQL idiom over DATE-keyed snapshots WITH a day-grain
    // tolerance band: `r.rd >= date_sub(p.pd, 30)` is pure day arithmetic
    // (DateType carries no zone), mapping to the merge's native-unit
    // (raw day) tolerance — latest order per customer within 30 days
    // at-or-before the probe date, exchange-free, no window.
    "kv_sql_asof_date" -> ((s, d) => {
      val pIx = ordDateProbeStore(s, d)
      val rIx = ordDateStore(s, d)
      s.conf.set("spark.sql.catalog.graft_sqd_p", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqd_p.root", pIx.store.root)
      s.conf.set("spark.sql.catalog.graft_sqd_r", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_sqd_r.root", rIx.store.root)
      val q = s.sql("""
        SELECT o_custkey, CAST(datediff(pd, DATE '1970-01-01') AS BIGINT) AS pd_day,
               CAST(datediff(asof_d, DATE '1970-01-01') AS BIGINT) AS asof_day,
               n_ord, cents FROM (
          SELECT p.o_custkey, p.pd, r.rd AS asof_d, r.n_ord, r.cents,
                 row_number() OVER (PARTITION BY p.o_custkey, p.pd
                                    ORDER BY r.rd DESC) AS rn
          FROM graft_sqd_p.ordprobe p LEFT JOIN graft_sqd_r.orddate r
            ON p.o_custkey = r.o_custkey AND r.rd <= p.pd
               AND r.rd >= date_sub(p.pd, 30)
        ) WHERE rn = 1
        ORDER BY o_custkey""")
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("AsOfZipJoin") && !plan.contains("Window"),
        s"kv_sql_asof_date: expected the DATE-tolerance as-of merge, got:\n$plan")
      q
    }),
    // AS-OF PROBE join: an arbitrary DataFrame of probe rows (every 7th
    // event) enriched against the snapshot — probes route onto the
    // snapshot's leg boundaries (the ONLY shuffle is the probe side; the
    // snapshot never moves), strictly-before with a 30-minute tolerance
    "kv_asof_probe" -> ((s, d) => {
      val probes = events(s, d).filter(col("event_id") % 7 === 0)
        .select(col("event_id"), col("user_id"), col("ts"))
      evReadStore(s, d).asOfProbe(probes, Seq("user_id"), "ts",
          joinType = "left_outer", strict = true, tolerance = 1800000000L)
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("probe_ms"),
          unix_millis(col("asof_ts")).as("asof_ms"), col("cnt"), col("cents"))
        .orderBy("event_id")
    }),
    // FULL OUTER = the two-snapshot diff in one exchange-free pass: the
    // key column COALESCEs the sides (USING-join shape), left-only /
    // matched / right-only row classes all present by fixture design
    "kv_corange_full" -> ((s, d) => {
      ordMod3Store(s, d).coRangeJoin(liAggOddStore(s, d),
          joinType = "full_outer")
        .filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"),
          col("qty").cast("long").as("qty"), col("n_lines"))
        .orderBy("o_orderkey")
    }),
    // top-k per group via rank filter — Spark pushes the rank bound into
    // the window sort (WindowGroupLimit): each partition keeps k rows
    // instead of sorting its whole group
    "q_topk_group" -> ((s, d) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(cents.desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .withColumn("rn", col("rn").cast("long"))
        .orderBy("o_orderstatus", "rn")
    }),
    // calendar decomposition + ISO weekday + week bucketing + day arithmetic
    // (conventions differ per engine: Spark weekday()+1 = ISO dow)
    "q_datetime" -> ((s, d) =>
      t(s, d, "events").filter(col("event_id") < 100)
        .select(col("event_id"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("mo"),
          dayofmonth(col("ts")).cast("long").as("dom"),
          (weekday(col("ts")) + 1).cast("long").as("isodow"),
          unix_millis(date_trunc("week", col("ts"))).as("week_start_ms"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("event_id")),
    // cosine RANGE search (radius contract, not count): scan once, only
    // survivors leave the scan — top-k's sibling
    "sim_range_query" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      Similarity.rangeSearch(emb, q, threshold = 0.3).orderBy("vec_id")
    }),
    // exact all-pairs edit distance on a bounded id range — the
    // gold-standard verifier behind fuzzy near-dup candidates (classic
    // Levenshtein is engine-portable integer math)
    // entity resolution on structured records: customers plus planted
    // dirty variants (one name char swapped, +0.01 balance, id+1e6) are
    // blocked by TWO half-name keys (either survives a single-field
    // typo), matched by edit-distance + balance tolerance + segment
    // equality, transitively clustered, and collapsed to one golden
    // record per entity (min-id name, max balance). The DuckDB replica
    // reproduces the whole pipeline — blocking, matching, depth-1
    // labels (planted clusters are pairs, so closure == direct min;
    // deeper chains are covered by EntityResolutionSpec) — and the
    // output hash-matches end to end.
    "er_resolve" -> ((s, d) =>
      erResolved(s, d).groupBy("entity")
        .agg(count(lit(1)).as("n_members"),
          min_by(col("c_name"), col("c_custkey")).as("name"),
          max(col("c_acctbal")).as("best_bal"))
        .orderBy("entity")),
    // golden-record survivorship over the same resolution: per-column
    // rules (newest-by-version balance, longest name, modal segment),
    // each deterministic with greater-value tie-breaks — the oracle
    // replays rule-for-rule with windowed argmaxes
    "er_golden" -> ((s, d) => {
      import graft.dedup.EntityResolution
      import EntityResolution.Survivorship._
      EntityResolution.goldenRecords(erResolved(s, d), "entity",
        Seq("c_acctbal" -> Newest("c_custkey"), "c_name" -> Longest,
          "c_mktsegment" -> MostFrequent))
        .orderBy("entity")
    }),
    "dd_edit_pairs" -> ((s, d) => {
      val sub = t(s, d, "documents").filter(col("doc_id") < 30)
        .select(col("doc_id").as("idA"), substring(col("text"), 1, 40).as("sA"))
      val b = sub.select(col("idA").as("idB"), col("sA").as("sB"))
      // threshold variant: cost per pair is O(threshold * n), not O(n^2),
      // and pairs past the bound return -1 without finishing the matrix
      sub.join(b, col("idA") < col("idB"))
        .select(col("idA"), col("idB"),
          levenshtein(col("sA"), col("sB"), 25).cast("long").as("edit_dist"))
        .filter(col("edit_dist").between(0, 25))
        .orderBy("idA", "idB")
    }),
    // second-moment statistics per group: correlation, sample stddev /
    // variance — one pass, map-side partial co-moments
    "agg_stats" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
          round(stddev_samp(col("l_discount")), 4).as("disc_sd"),
          round(var_samp(col("l_tax")), 4).as("tax_var"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),
    // several DISTINCT aggregates in one pass (planner expands to one
    // shuffle, not one scan per distinct column)
    "q_multi_distinct" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("d_parts"),
          count_distinct(col("l_suppkey")).as("d_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),
    // dynamic partition pruning: the fact side is partitioned on disk by
    // event_type and the pruning predicate arrives at RUNTIME from the
    // filtered dimension — the fact scan reads only the partitions the
    // dim's surviving keys name (plan pinned in PartitionPruningSpec)
    "io_dpp_join" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events").select("event_id", "event_type", "value")
      val p = java.nio.file.Files.createTempDirectory("graft-dpp").toString
      ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$p/fact")
      // the filtering side must be a relation scan for DPP to consider it
      Seq(("click", 1.0), ("purchase", 5.0), ("signup", 2.0))
        .toDF("etype", "score")
        .write.mode("overwrite").parquet(s"$p/dim")
      s.read.parquet(s"$p/fact")
        .join(s.read.parquet(s"$p/dim").filter(col("score") >= 2.0),
          col("event_type") === col("etype"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("value") * 100 + 0.5).cast("long")).cast("double") / 100.0)
            .as("sum_value"))
        .orderBy("event_type")
    }),
    // hive-partitioned write + partition-pruned read-back: the filter
    // prunes whole partition directories before any file IO
    "io_partition_prune" -> ((s, d) => {
      val ev = t(s, d, "events").select("event_id", "event_type", "value")
      val p = java.nio.file.Files.createTempDirectory("graft-part").toString
      ev.write.mode("overwrite").partitionBy("event_type").parquet(p)
      s.read.parquet(p)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(floor(col("value") * 100 + 0.5).cast("long")).cast("double") / 100.0)
            .as("sum_value"))
        .orderBy("event_type")
    })
  )

  // =====================================================================
  // DuckDB oracles. Key set ⊆ queries; missing keys → rows-only check
  // (Spark-specific hash functions are not reproducible in SQL).
  // =====================================================================
  def oracleSql: Map[String, String] = {
    val projSql = "o_orderkey, o_custkey, o_orderstatus, o_orderpriority, round(o_totalprice, 2) AS price"
    // (id * 2654435761) mod 2^32 via 16-bit limbs — overflow-free twin of
    // graft.pipeline.Sampling.hashMod (raw product overflows BIGINT for
    // ids > ~3.46e9 on both engines)
    def knuthHash(e: String): String = {
      val id32 = s"(($e) % 4294967296)"
      s"(((((($id32 // 65536) * 2654435761) % 65536) * 65536) + ((($id32 % 65536) * 2654435761) % 4294967296)) % 4294967296)"
    }
    // order-independent exact sum of the 2-decimal `value` column (twin of
    // EventStreams.exactCentSum): integer-cent sum, one final division
    val centSum = "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"
    val scd2IntervalsOracle: String = "WITH base AS (SELECT o_orderkey AS k, o_custkey, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
      "i1 AS (SELECT k, o_custkey, cents, CAST(1 AS BIGINT) AS valid_from, " +
      "CAST(CASE WHEN k < 50 AND cents != 0 THEN 2 " +
      "WHEN k >= 20 AND k < 30 AND cents = 0 THEN 3 " +
      "WHEN k >= 100 AND k < 200 THEN 3 END AS BIGINT) AS valid_to FROM base), " +
      "i2 AS (SELECT k, o_custkey, CAST(0 AS BIGINT) AS cents, CAST(2 AS BIGINT) AS valid_from, " +
      "CAST(CASE WHEN k >= 20 AND k < 30 THEN 3 END AS BIGINT) AS valid_to " +
      "FROM base WHERE k < 50 AND cents != 0), " +
      "i2b AS (SELECT 3000000 + i AS k, 999990 + i AS o_custkey, CAST(77 + i AS BIGINT) AS cents, " +
      "CAST(2 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to FROM range(5) t(i)), " +
      "i3 AS (SELECT k, o_custkey, CAST(999 AS BIGINT) AS cents, CAST(3 AS BIGINT) AS valid_from, " +
      "CAST(NULL AS BIGINT) AS valid_to FROM base WHERE k >= 20 AND k < 30) " +
      "SELECT k AS o_orderkey, o_custkey, cents, valid_from, valid_to FROM " +
      "(SELECT * FROM i1 UNION ALL SELECT * FROM i2 UNION ALL " +
      "SELECT * FROM i2b UNION ALL SELECT * FROM i3) ORDER BY o_orderkey, valid_from"
    // greedy MMR unrolled into k explicit stages (the PageRank
    // fixed-iteration trick): pick{s} = per-query argmax of
    // λ·rel − (1−λ)·max-sim-to-picked, Pall{s} accumulates; arithmetic
    // mirrors MmrSelect op for op (milli vectors, BIGINT dot/norm sums
    // cast to DOUBLE in the single sim expression, floor(+0.5))
    def mmrOracleSql(k: Int, lam: Int): String = {
      val sim = (a: String, b: String) =>
        s"CAST(floor(1e9 * CAST(list_sum(list_transform(range(1, 65), i -> $a.vm[i] * $b.vm[i])) AS DOUBLE) / " +
          s"(sqrt(CAST(list_sum(list_transform($a.vm, x -> x * x)) AS DOUBLE)) * " +
          s"sqrt(CAST(list_sum(list_transform($b.vm, x -> x * x)) AS DOUBLE))) + 0.5) AS BIGINT)"
      val milli = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
      val sb = new StringBuilder
      sb ++= s"WITH e AS (SELECT vec_id, $milli AS vm FROM embeddings WHERE vec_id < 40), "
      sb ++= s"q AS (SELECT vec_id AS q_id, $milli AS vm FROM embeddings WHERE vec_id IN (7, 21)), "
      sb ++= s"cand AS (SELECT q.q_id, e.vec_id AS id, e.vm, ${sim("e", "q")} AS rel_nano FROM e CROSS JOIN q), "
      sb ++= s"sims AS (SELECT a.q_id, a.id AS ida, b.id AS idb, ${sim("a", "b")} AS sim_nano " +
        "FROM cand a JOIN cand b ON a.q_id = b.q_id), "
      sb ++= s"pall0 AS (SELECT q_id, CAST(1 AS BIGINT) AS rank, id, $lam * rel_nano AS mmr_pico FROM " +
        s"(SELECT q_id, id, rel_nano, row_number() OVER (PARTITION BY q_id ORDER BY $lam * rel_nano DESC, id) AS rn FROM cand) WHERE rn = 1), "
      for (s <- 1 until k) {
        sb ++= s"c$s AS (SELECT c.q_id, c.id, c.rel_nano, max(sm.sim_nano) AS ms FROM cand c " +
          s"JOIN pall${s - 1} p ON p.q_id = c.q_id " +
          s"JOIN sims sm ON sm.q_id = c.q_id AND sm.ida = c.id AND sm.idb = p.id " +
          s"WHERE NOT EXISTS (SELECT 1 FROM pall${s - 1} x WHERE x.q_id = c.q_id AND x.id = c.id) " +
          "GROUP BY c.q_id, c.id, c.rel_nano), "
        sb ++= s"pick$s AS (SELECT q_id, CAST(${s + 1} AS BIGINT) AS rank, id, score AS mmr_pico FROM " +
          s"(SELECT q_id, id, $lam * rel_nano - ${1000 - lam} * ms AS score, " +
          s"row_number() OVER (PARTITION BY q_id ORDER BY $lam * rel_nano - ${1000 - lam} * ms DESC, id) AS rn " +
          s"FROM c$s) WHERE rn = 1), "
        sb ++= s"pall$s AS (SELECT * FROM pall${s - 1} UNION ALL SELECT * FROM pick$s), "
      }
      // strip the trailing comma-space, close with the final projection
      val body = sb.toString.stripSuffix(", ")
      body + s" SELECT q_id, rank, id AS vec_id, mmr_pico FROM pall${k - 1} ORDER BY q_id, rank"
    }
    // exact all-pairs shingle-Jaccard truth set on doc_id < 500 (string
    // shingles — the SQL twin of graft's FNV hash shingles, identical
    // counts absent 64-bit collisions); shared by the near-dup recall
    // contracts
    def ddTruthSql(minJ: Double): String =
      "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk " +
        "FROM documents WHERE doc_id < 500), " +
        "sh AS (SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] FOR i IN range(1, len(tk)-1)]) AS ss " +
        "FROM toks WHERE len(tk) >= 3), " +
        "p AS (SELECT a.doc_id AS idA, b.doc_id AS idB FROM sh a, sh b WHERE a.doc_id < b.doc_id " +
        s"AND CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS DOUBLE) >= $minJ)"
    // Stupid-Backoff LM per-trigram nano scores of the odd (held-out)
    // docs under the even-doc train split — CTEs through `sc`; shared by
    // txt_backoff_lm and pipe_ppl_buckets
    val sbScoreCte =
      "WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "f AS (SELECT doc_id, tk FROM tk WHERE len(tk) >= 3), " +
        "tr AS (SELECT tk FROM f WHERE doc_id % 2 = 0), " +
        "uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(tk) AS w FROM tr) GROUP BY w), " +
        "big AS (SELECT g2, count(*) AS c2 FROM (SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g2 FROM tr) GROUP BY g2), " +
        "tri AS (SELECT g3, count(*) AS c3 FROM (SELECT unnest(list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g3 FROM tr) GROUP BY g3), " +
        "nv AS (SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM uni) + (SELECT count(*) FROM uni) AS denom), " +
        "pos AS (SELECT doc_id, tk[i] AS w2, tk[i+1] AS w1, tk[i+2] AS w " +
        "FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i FROM f WHERE doc_id % 2 = 1)), " +
        "sc AS (SELECT p.doc_id, CAST(floor(1000000000.0 * (" +
        "CASE WHEN t.c3 IS NOT NULL THEN CAST(t.c3 AS DOUBLE) / CAST(bc.c2 AS DOUBLE) " +
        "WHEN b.c2 IS NOT NULL THEN 0.4 * (CAST(b.c2 AS DOUBLE) / CAST(uc.c1 AS DOUBLE)) " +
        "ELSE 0.16 * (CAST(COALESCE(u.c1, 0) + 1 AS DOUBLE) / CAST((SELECT denom FROM nv) AS DOUBLE)) END)) AS BIGINT) AS nano " +
        "FROM pos p " +
        "LEFT JOIN tri t ON t.g3 = p.w2 || ' ' || p.w1 || ' ' || p.w " +
        "LEFT JOIN big b ON b.g2 = p.w1 || ' ' || p.w " +
        "LEFT JOIN big bc ON bc.g2 = p.w2 || ' ' || p.w1 " +
        "LEFT JOIN uni u ON u.w = p.w " +
        "LEFT JOIN uni uc ON uc.w = p.w1)"
    Map(
      "kv_point" -> "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice FROM orders WHERE o_orderkey = 142",
      "kv_range" -> ("SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice FROM orders " +
        "WHERE o_orderkey >= 100 AND o_orderkey < 200 ORDER BY o_orderkey"),
      // the registered-view twin reads the SAME snapshot via pure SQL; the
      // upserted zero-price rows sit below the queried range
      "kv_sql_view" -> ("SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price FROM orders " +
        "WHERE o_orderkey BETWEEN 100 AND 200 ORDER BY o_orderkey"),
      "kv_dsv2" -> ("SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price FROM orders " +
        "WHERE o_orderkey BETWEEN 100 AND 200 ORDER BY o_orderkey"),
      // survivors of the three SQL DELETEs (range / equality / strict gt)
      "kv_sql_delete" -> ("SELECT count(*) AS n, min(o_orderkey) AS mn, max(o_orderkey) AS mx, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS checksum " +
        "FROM orders WHERE NOT (o_orderkey >= 200 AND o_orderkey < 900) " +
        "AND o_orderkey <> 32 AND o_orderkey <= 1200"),
      "kv_sql_stats" -> "SELECT count(*) AS n, min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM orders",
      "kv_sql_count_range" -> ("SELECT count(*) AS n, min(o_orderkey) AS mn, max(o_orderkey) AS mx " +
        "FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 5000"),
      // the three UPDATE statements replayed as CASE expressions (their
      // ranges are disjoint, so application order is immaterial)
      "kv_sql_update" -> ("WITH fin AS (SELECT " +
        "CASE WHEN o_orderkey >= 1000 AND o_orderkey < 1100 THEN o_orderkey + 10000000 ELSE o_orderkey END AS k, " +
        "CASE WHEN o_orderkey < 50 THEN o_custkey * 2 " +
        "WHEN o_orderkey >= 100 AND o_orderkey < 500 THEN o_custkey + 1000000 ELSE o_custkey END AS c, " +
        "o_totalprice AS p FROM orders) " +
        "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx, CAST(sum(c) AS BIGINT) AS cust_sum, " +
        "CAST(sum(CAST(floor(p * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents FROM fin"),
      // MERGE replayed as set algebra: survivors-not-matched + updated
      // matches (minus conditional deletes) + source-only inserts
      "kv_sql_merge" -> ("WITH src AS (SELECT o_orderkey + 2 AS k, o_custkey + 7 AS c, o_totalprice AS p " +
        "FROM orders WHERE o_orderkey % 4 = 1), " +
        "tgt AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderstatus AS st, o_totalprice AS p FROM orders), " +
        "matched AS (SELECT t.k, s.c AS sc, s.p AS sp FROM tgt t JOIN src s ON t.k = s.k), " +
        "fin AS (" +
        "SELECT t.k, t.c, t.st, t.p FROM tgt t WHERE t.k NOT IN (SELECT k FROM src) AND t.k >= 10 " +
        "UNION ALL SELECT k, sc, 'M', sp FROM matched WHERE sc % 5 <> 0 " +
        "UNION ALL SELECT s.k, s.c, 'N', s.p FROM src s WHERE s.k NOT IN (SELECT k FROM tgt)) " +
        "SELECT st AS o_orderstatus, count(*) AS n, CAST(sum(c) AS BIGINT) AS cust_sum, " +
        "CAST(sum(CAST(floor(p * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM fin GROUP BY 1 ORDER BY 1"),
      "kv_probe_merge" -> ("WITH src AS (SELECT o_orderkey + 2 AS k, o_custkey + 7 AS c, o_totalprice AS p " +
        "FROM orders WHERE o_orderkey % 4 = 1), " +
        "tgt AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderstatus AS st, o_totalprice AS p FROM orders), " +
        "matched AS (SELECT t.k, s.c AS sc, s.p AS sp FROM tgt t JOIN src s ON t.k = s.k), " +
        "fin AS (" +
        "SELECT t.k, t.c, t.st, t.p FROM tgt t WHERE t.k NOT IN (SELECT k FROM src) AND t.k >= 10 " +
        "UNION ALL SELECT k, sc, 'M', sp FROM matched WHERE sc % 5 <> 0 " +
        "UNION ALL SELECT s.k, s.c, 'N', s.p FROM src s WHERE s.k NOT IN (SELECT k FROM tgt)) " +
        "SELECT st AS o_orderstatus, count(*) AS n, CAST(sum(c) AS BIGINT) AS cust_sum, " +
        "CAST(sum(CAST(floor(p * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM fin GROUP BY 1 ORDER BY 1"),
      "kv_cow_upsert" -> ("SELECT count(*) AS n, round(sum(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END), 2) AS price_sum " +
        "FROM orders"),
      "kv_join_view" -> ("WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty, " +
        "count(*) AS n_lines FROM lineitem GROUP BY 1) " +
        "SELECT o.o_orderkey, o.o_custkey, " +
        "round(CASE WHEN o.o_orderkey < 50 THEN 0.0 ELSE o.o_totalprice END, 2) AS price, " +
        "CAST(CASE WHEN l.l_orderkey % 5 = 0 THEN l.qty + 100 ELSE l.qty END AS BIGINT) AS qty, " +
        "l.n_lines " +
        "FROM orders o JOIN li l ON o.o_orderkey = l.l_orderkey " +
        "WHERE o.o_orderkey <= 400 ORDER BY o.o_orderkey"),
      "kv_agg_view" -> ("WITH base AS (SELECT o_orderkey, o_custkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "mutated AS (SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderkey < 50 THEN 0 ELSE cents END AS cents " +
        "FROM base WHERE NOT (o_orderkey >= 100 AND o_orderkey < 200) " +
        "UNION ALL SELECT 2000000 + i, 999990 + i % 2, 12345 + i FROM range(10) t(i)) " +
        "SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS agg_sum, " +
        "CAST(count(*) AS BIGINT) AS agg_cnt FROM mutated GROUP BY 1 ORDER BY 1"),
      "kv_sql_mat_view" -> ("WITH base AS (SELECT o_orderkey, o_custkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "mutated AS (SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderkey < 50 THEN 0 ELSE cents END AS cents " +
        "FROM base WHERE NOT (o_orderkey >= 100 AND o_orderkey < 200) " +
        "UNION ALL SELECT 2000000 + i, 999990 + i % 2, 12345 + i FROM range(10) t(i)) " +
        "SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS sum_cents, " +
        "CAST(count(*) AS BIGINT) AS agg_cnt, " +
        "CAST(min(cents) AS BIGINT) AS min_cents, " +
        "CAST(max(cents) AS BIGINT) AS max_cents " +
        "FROM mutated GROUP BY 1 ORDER BY 1"),
      "kv_sql_mat_view_where" -> ("WITH base AS (SELECT o_orderkey, o_custkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "mutated AS (SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderkey < 50 THEN 0 ELSE cents END AS cents " +
        "FROM base WHERE NOT (o_orderkey >= 100 AND o_orderkey < 200) " +
        "UNION ALL SELECT 2000000 + i, 999990 + i % 2, 90000 + i * 30000 FROM range(10) t(i)) " +
        "SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS sum_cents, " +
        "CAST(count(*) AS BIGINT) AS agg_cnt, " +
        "CAST(min(cents) AS BIGINT) AS min_cents, " +
        "CAST(max(cents) AS BIGINT) AS max_cents " +
        "FROM mutated WHERE cents >= 100000 GROUP BY 1 ORDER BY 1"),
      "kv_agg_view_mm" -> ("WITH base AS (SELECT o_orderkey, o_custkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, " +
        "CAST(o_orderkey % 97 AS BIGINT) AS points FROM orders), " +
        "mutated AS (SELECT o_orderkey, o_custkey, " +
        "CASE WHEN o_orderkey < 50 THEN 0 ELSE cents END AS cents, points " +
        "FROM base WHERE NOT (o_orderkey >= 100 AND o_orderkey < 200) " +
        "UNION ALL SELECT 2000000 + i, 999990 + i % 2, 12345 + i, " +
        "CAST((2000000 + i) % 97 AS BIGINT) FROM range(10) t(i)) " +
        "SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS sum_cents, " +
        "CAST(sum(points) AS BIGINT) AS sum_points, " +
        "CAST(count(*) AS BIGINT) AS agg_cnt, " +
        "CAST(min(cents) AS BIGINT) AS min_cents, " +
        "CAST(max(cents) AS BIGINT) AS max_cents " +
        "FROM mutated GROUP BY 1 ORDER BY 1"),
      "kv_split" -> ("WITH ranked AS (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn, " +
        "count(*) OVER () AS total FROM orders) " +
        "SELECT (SELECT count(*) FROM ranked WHERE rn <= total // 2) AS n_left, " +
        "(SELECT count(*) FROM ranked WHERE rn > total // 2) AS n_right, " +
        "(SELECT min(o_orderkey) FROM ranked WHERE rn <= total // 2) AS left_min, " +
        "(SELECT max(o_orderkey) FROM ranked WHERE rn <= total // 2) AS left_max"),
      "kv_temporal" -> "SELECT count(*) AS n, round(sum(o_totalprice), 2) AS price_sum FROM orders",
      // each tag replays the fixture state the wall-clock floor lands on:
      // v1 = full cents table, v2 = zeroed under 50, v3 = v2 minus [100,200)
      "kv_timestamp_asof" -> ("WITH base AS (SELECT o_orderkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "v2 AS (SELECT o_orderkey, CASE WHEN o_orderkey < 50 THEN 0 ELSE cents END AS cents FROM base), " +
        "v3 AS (SELECT * FROM v2 WHERE NOT (o_orderkey >= 100 AND o_orderkey < 200)) " +
        "SELECT 'v1' AS tag, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents_sum FROM base " +
        "UNION ALL SELECT 'v2' AS tag, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents_sum FROM v2 " +
        "UNION ALL SELECT 'v3' AS tag, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents_sum FROM v3"),
      // MV time travel: pre = the full aggregate, post = the aggregate
      // after the fixture zeroed cents under orderkey 50 (group count is
      // unchanged — zeroing removes no rows)
      "kv_mv_asof" -> ("WITH base AS (SELECT o_custkey, o_orderkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "pre AS (SELECT o_custkey, sum(cents) AS s FROM base GROUP BY 1), " +
        "post AS (SELECT o_custkey, sum(CASE WHEN o_orderkey < 50 THEN 0 ELSE cents END) AS s " +
        "FROM base GROUP BY 1) " +
        "SELECT 'pre' AS tag, count(*) AS n, CAST(sum(s) AS BIGINT) AS total FROM pre " +
        "UNION ALL SELECT 'post' AS tag, count(*) AS n, CAST(sum(s) AS BIGINT) AS total FROM post"),
      // same three states through the registered-view time-travel splice
      "kv_view_asof" -> ("WITH base AS (SELECT o_orderkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "v2 AS (SELECT o_orderkey, CASE WHEN o_orderkey < 50 THEN 0 ELSE cents END AS cents FROM base), " +
        "v3 AS (SELECT * FROM v2 WHERE NOT (o_orderkey >= 100 AND o_orderkey < 200)) " +
        "SELECT 'v1' AS tag, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents_sum FROM base " +
        "UNION ALL SELECT 'v2' AS tag, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents_sum FROM v2 " +
        "UNION ALL SELECT 'v3' AS tag, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents_sum FROM v3"),
      // compaction must not change the data (count + price checksum over the
      // full orders table); file counts are deterministic at these data
      // sizes: bootstrap + 3 out-of-range appends = 4 files, compacted to 1
      "kv_compact" -> ("SELECT count(*) AS n, round(sum(o_totalprice), 2) AS price_sum, " +
        "CAST(4 AS BIGINT) AS files_before, CAST(1 AS BIGINT) AS files_after FROM orders"),
      "kv_next_key" -> ("SELECT o_orderkey, o_custkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS price " +
        "FROM orders WHERE o_orderkey > 41 ORDER BY o_orderkey LIMIT 1"),
      "kv_prev_key" -> ("SELECT o_orderkey, o_custkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS price " +
        "FROM orders WHERE o_orderkey < 42 ORDER BY o_orderkey DESC LIMIT 1"),
      "kv_prefix" -> ("SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price " +
        "FROM orders WHERE o_custkey = 7 ORDER BY o_custkey, o_orderkey"),
      "kv_lt" -> ("SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price " +
        "FROM orders WHERE o_custkey < 3 OR (o_custkey = 3 AND o_orderkey <= 50) " +
        "ORDER BY o_custkey, o_orderkey"),
      "kv_vacuum" -> ("SELECT count(*) AS n, round(sum(o_totalprice), 2) AS price_sum, " +
        "CAST(5 AS BIGINT) AS m_removed, CAST(4 AS BIGINT) AS f_deleted FROM orders"),
      // same lifecycle through the SQL statement heads — same deterministic
      // counts (manifests v0..v4 dropped, 4 pre-compact files swept)
      "kv_sql_vacuum" -> ("SELECT count(*) AS n, round(sum(o_totalprice), 2) AS price_sum, " +
        "CAST(5 AS BIGINT) AS m_removed, CAST(4 AS BIGINT) AS f_deleted FROM orders"),
      "kv_clone" -> ("SELECT count(*) AS n_clone, CAST(1 AS BIGINT) AS files_shared, " +
        "count(*) AS n_orig FROM orders"),
      "kv_inordered" -> ("SELECT o_orderkey, o_custkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS o_totalprice " +
        "FROM orders ORDER BY o_orderkey"),
      "kv_head_ordered" -> ("SELECT o_orderkey, o_custkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS o_totalprice " +
        "FROM orders ORDER BY o_orderkey LIMIT 100"),
      "p1_get" -> s"SELECT $projSql FROM orders WHERE o_orderkey = 42",
      "p2_getall" -> s"SELECT $projSql FROM orders WHERE o_orderkey IN (1,2,3,5,8,13,21,34) ORDER BY o_orderkey",
      "p4_next_key" -> s"SELECT $projSql FROM orders WHERE o_orderkey > 41 ORDER BY o_orderkey LIMIT 1",
      "p5_prev_key" -> s"SELECT $projSql FROM orders WHERE o_orderkey < 42 ORDER BY o_orderkey DESC LIMIT 1",
      "s1_inorder" -> "SELECT o_custkey, o_orderkey FROM orders ORDER BY o_custkey, o_orderkey",
      "s2_reverse" -> "SELECT o_custkey, o_orderkey FROM orders ORDER BY o_custkey DESC, o_orderkey DESC",
      "s3_head" -> s"SELECT $projSql FROM orders ORDER BY o_custkey, o_orderkey LIMIT 100",
      "s3_tail" -> s"SELECT $projSql FROM orders ORDER BY o_custkey DESC, o_orderkey DESC LIMIT 100",
      "s4_asc_seek" -> s"SELECT $projSql FROM orders WHERE o_custkey > 50 OR (o_custkey = 50 AND o_orderkey >= 0) ORDER BY o_custkey, o_orderkey LIMIT 200",
      "s4_desc_seek" -> s"SELECT $projSql FROM orders WHERE o_custkey < 50 OR (o_custkey = 50 AND o_orderkey < 0) ORDER BY o_custkey DESC, o_orderkey DESC LIMIT 200",
      "s5_gt" -> s"SELECT $projSql FROM orders WHERE o_custkey > 145 OR (o_custkey = 145 AND o_orderkey > 0) ORDER BY o_custkey, o_orderkey",
      "s5_lt" -> s"SELECT $projSql FROM orders WHERE o_custkey < 3 OR (o_custkey = 3 AND o_orderkey <= 50) ORDER BY o_custkey, o_orderkey",
      "s6_range" -> (s"SELECT $projSql FROM orders WHERE (o_custkey > 10 OR (o_custkey = 10 AND o_orderkey > 0)) " +
        s"AND (o_custkey < 12 OR (o_custkey = 12 AND o_orderkey <= ${Long.MaxValue})) ORDER BY o_custkey, o_orderkey"),
      "s6_range_rev" -> (s"SELECT $projSql FROM orders WHERE (o_custkey > 10 OR (o_custkey = 10 AND o_orderkey >= 0)) " +
        s"AND (o_custkey < 12 OR (o_custkey = 12 AND o_orderkey < ${Long.MaxValue})) ORDER BY o_custkey DESC, o_orderkey DESC"),
      "s7_prefix" -> s"SELECT $projSql FROM orders WHERE o_custkey = 7 ORDER BY o_orderkey",
      "s7_prefix_rev" -> s"SELECT $projSql FROM orders WHERE o_custkey = 7 ORDER BY o_orderkey DESC",
      "s8_prefix_gt" -> s"SELECT $projSql FROM orders WHERE o_custkey = 7 AND o_orderkey > 700 ORDER BY o_orderkey",
      "s8_prefix_lt" -> s"SELECT $projSql FROM orders WHERE o_custkey = 7 AND o_orderkey <= 700 ORDER BY o_orderkey",
      "s12_keyset_page" -> s"SELECT $projSql FROM orders ORDER BY o_custkey, o_orderkey LIMIT 20 OFFSET 40",
      "s13_iterator_pull" -> ("SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price FROM orders " +
        "WHERE o_orderstatus = 'F' AND (o_custkey > 10 OR (o_custkey = 10 AND o_orderkey > 0)) " +
        "ORDER BY o_custkey, o_orderkey LIMIT 25"),
      "s9_topk" -> ("SELECT o_orderkey, round(o_totalprice, 2) AS price FROM " +
        "(SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 50) t ORDER BY o_orderkey"),
      "s10_filter_scan" -> s"SELECT $projSql FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 50000 ORDER BY o_custkey, o_orderkey",
      "a1_count" -> "SELECT count(*) AS cnt FROM lineitem",
      "a2_min_max" -> "SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders",
      "a4_subtree_counts" -> "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey ORDER BY o_custkey",
      "w1_insert_upsert" -> ("WITH batch AS (SELECT i AS o_orderkey, 1.0 AS o_totalprice FROM generate_series(0, 99) s(i)), " +
        "kept AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM batch)) " +
        "SELECT count(*) AS n, round(sum(o_totalprice), 2) AS checksum FROM (SELECT * FROM kept UNION ALL SELECT * FROM batch) t"),
      "w2_update_cas" -> ("SELECT count(*) AS n, round(sum(CASE WHEN o_orderkey BETWEEN 100 AND 199 AND o_orderstatus = 'O' " +
        "THEN o_totalprice * 2 ELSE o_totalprice END), 2) AS checksum FROM orders"),
      "w3_remove" -> "SELECT count(*) AS n, round(sum(o_totalprice), 2) AS checksum FROM orders WHERE o_orderkey >= 100",
      "u1_merge" -> "SELECT count(*) AS n, round(sum(o_totalprice), 2) AS checksum FROM orders",
      "u2_split" -> ("WITH ranked AS (SELECT o_custkey, row_number() OVER (ORDER BY o_custkey, o_orderkey) AS rn, " +
        "count(*) OVER () AS total FROM orders) " +
        "SELECT count(*) AS n, min(o_custkey) AS min_ck, max(o_custkey) AS max_ck FROM ranked WHERE rn <= total // 2"),
      "kv_bytes_range" -> ("SELECT hex(encode(o_orderstatus || '/' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0'))) AS key_hex, " +
        "round(o_totalprice, 2) AS price FROM orders WHERE o_orderstatus = 'O' ORDER BY key_hex"),
      "kv_getall_missing" -> ("SELECT 'KEY_NOT_FOUND' AS code, " +
        "(SELECT count(*) FROM (VALUES (1), (2), (999999999)) p(k) WHERE k NOT IN (SELECT o_orderkey FROM orders)) AS missing, " +
        "CAST(0 AS BIGINT) AS ok, " +
        "(SELECT count(*) FROM (VALUES (1), (2), (999999999)) p(k) WHERE k IN (SELECT o_orderkey FROM orders)) AS n_found"),
      "t3_floor_lookup" -> ("SELECT user_id, epoch_ms(max(ts)) AS last_ts, count(*) AS n_before FROM events " +
        "WHERE ts <= TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id ORDER BY user_id"),
      "t5_asof_join" -> ("SELECT e.event_id AS err_id, e.user_id, epoch_ms(max(s.ts)) AS asof_ts " +
        "FROM (SELECT * FROM events WHERE event_type = 'error') e " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s " +
        "ON e.user_id = s.user_id AND s.ts <= e.ts " +
        "GROUP BY e.event_id, e.user_id ORDER BY err_id"),
      "q1_agg" -> ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_discount), 6) AS avg_disc, count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      "q3_join" -> ("SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' GROUP BY l_orderkey " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
      "q5_multi_join" -> ("SELECT r_name, n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_lines FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
      "q_semi_anti" -> ("SELECT (SELECT count(*) FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 100000)) AS n_with, " +
        "(SELECT count(*) FROM customer WHERE c_custkey NOT IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 100000)) AS n_without"),
      "q_having" -> ("SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total " +
        "FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey"),
      "q_window2" -> ("SELECT o_custkey, o_orderkey, " +
        "lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_ok, " +
        "lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_ok, " +
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank " +
        "FROM orders WHERE o_custkey < 5 ORDER BY o_custkey, o_orderkey"),
      "q_json" -> ("SELECT event_type, count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k, " +
        "round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
      "q_percentile" -> ("SELECT round(quantile_cont(o_totalprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.95), 4) AS p95, " +
        "round(quantile_cont(o_totalprice, 0.99), 4) AS p99 FROM orders"),
      "q_month_agg" -> ("SELECT epoch_ms(date_trunc('month', o_orderdate)) AS month_ms, " +
        "count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders GROUP BY 1 ORDER BY month_ms"),
      "q_rollup" -> ("SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total " +
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
      "q_setops" -> ("WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000), " +
        "recent AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01') " +
        "SELECT (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM big INTERSECT SELECT DISTINCT o_custkey FROM recent) t1) AS n_both, " +
        "(SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM big EXCEPT SELECT DISTINCT o_custkey FROM recent) t2) AS n_only_big"),
      "q_distinct" -> "SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps FROM lineitem",
      "q_window" -> ("SELECT o_custkey, o_orderkey, row_number() OVER w AS rn, " +
        "round(sum(o_totalprice) OVER w, 2) AS running_total FROM orders WHERE o_custkey < 10 " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "ORDER BY o_custkey, o_orderkey"),
      "st_window_counts" -> ("SELECT epoch_ms(date_trunc('hour', ts)) AS window_start, event_type, " +
        s"count(*) AS n_events, $centSum AS sum_value FROM events " +
        "GROUP BY 1, 2 ORDER BY window_start, event_type"),
      "st_stream_live" -> ("SELECT epoch_ms(date_trunc('hour', ts)) AS window_start, event_type, " +
        s"count(*) AS n_events, $centSum AS sum_value FROM events " +
        "GROUP BY 1, 2 ORDER BY window_start, event_type"),
      "st_ingest_store" -> s"SELECT count(*) AS n, $centSum AS sum_value FROM events",
      // deduped streaming ingest: snapshot rows == distinct texts ever
      // streamed (clones add none); first-writer-wins survivors are the
      // min-id row per text (batch order = id order here), so the max
      // surviving id is max over per-text minima — DATA-INDEPENDENT, holds
      // even if a future fixture duplicates the max-id doc's text
      // the CDC stream must replay exactly: all keys <= 1000 as `added`
      // (original prices), keys < 100 as `changed` (NEW price = +1), the
      // removed range [200, 300] as `removed` (old prices)
      "st_sink_cdc" -> ("WITH c AS (" +
        "SELECT 'added' AS _change, count(*) AS n, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM orders WHERE o_orderkey <= 1000 " +
        "UNION ALL SELECT 'changed', count(*), CAST(sum(CAST(floor((o_totalprice + 1) * 100 + 0.5) AS BIGINT)) AS BIGINT) " +
        "FROM orders WHERE o_orderkey < 100 " +
        "UNION ALL SELECT 'removed', count(*), CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) " +
        "FROM orders WHERE o_orderkey BETWEEN 200 AND 300) " +
        "SELECT _change, n, cents FROM c ORDER BY _change"),
      "st_incr_ingest" -> ("SELECT count(DISTINCT text) AS n_rows, count(DISTINCT text) AS n_texts, " +
        "(SELECT max(m) FROM (SELECT min(doc_id) AS m FROM documents GROUP BY text) tt) AS max_id " +
        "FROM documents"),
      "st_dedup" -> ("WITH u AS (SELECT * FROM events UNION ALL SELECT * FROM events) " +
        s"SELECT count(*) AS n, $centSum AS sum_value " +
        "FROM (SELECT DISTINCT event_id, value FROM u) t"),
      "st_interval_join" -> ("SELECT c.user_id, c.event_id, epoch_ms(s.ts) AS signup_ms, epoch_ms(c.ts) AS click_ms " +
        "FROM events c JOIN events s ON c.user_id = s.user_id " +
        "AND c.event_type = 'click' AND s.event_type = 'signup' " +
        "AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL 1 HOUR " +
        "ORDER BY c.event_id, signup_ms"),
      "graph_pagerank" -> pagerankOracleSql(5),
      // exact a<b<c triple join — the oracle pays the naive cost the
      // oriented wedge join avoids
      "graph_triangles" -> ("WITH raw AS (SELECT o_orderkey % 300 AS src, o_custkey % 300 AS dst FROM orders), " +
        "e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw WHERE src <> dst), " +
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 " +
        "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b " +
        "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), " +
        "corners AS (SELECT unnest([x, y, z]) AS node FROM tri) " +
        "SELECT node, count(*) AS n_triangles FROM corners GROUP BY node " +
        "ORDER BY n_triangles DESC, node LIMIT 20"),
      "q_kanon" -> ("WITH a AS (SELECT CAST(c_nationkey AS VARCHAR) AS c_nationkey, " +
        "CAST(c_mktsegment AS VARCHAR) AS c_mktsegment, count(*) AS n_rows, " +
        "CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum " +
        "FROM customer GROUP BY 1, 2) " +
        "SELECT * FROM (" +
        "SELECT c_nationkey, c_mktsegment, n_rows, cents_sum FROM a WHERE n_rows >= 10 " +
        "UNION ALL SELECT '*', '*', CAST(sum(n_rows) AS BIGINT), CAST(sum(cents_sum) AS BIGINT) " +
        "FROM a WHERE n_rows < 10 HAVING sum(n_rows) > 0" +
        ") ORDER BY c_nationkey, c_mktsegment"),
      "st_paths" -> ("WITH seqs AS (SELECT user_id, list(event_type ORDER BY epoch_ms(ts), event_id) AS l " +
        "FROM events GROUP BY user_id), " +
        "grams AS (SELECT unnest(list_transform(range(1, len(l) - 1), " +
        "i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS path FROM seqs WHERE len(l) >= 3) " +
        "SELECT path, count(*) AS n_occurrences FROM grams GROUP BY path " +
        "ORDER BY n_occurrences DESC, path LIMIT 20"),
      "st_funnel" -> ("WITH s1 AS (SELECT user_id, min(epoch_ms(ts)) AS t1 FROM events " +
        "WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2 FROM events e JOIN s1 USING (user_id) " +
        "WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.t1 AND epoch_ms(e.ts) <= s1.t1 + 86400000 " +
        "GROUP BY e.user_id), " +
        "s2o AS (SELECT s2.user_id, s2.t2, s1.t1 FROM s2 JOIN s1 USING (user_id)), " +
        "s3 AS (SELECT e.user_id FROM events e JOIN s2o USING (user_id) " +
        "WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2o.t2 AND epoch_ms(e.ts) <= s2o.t1 + 86400000 " +
        "GROUP BY e.user_id), " +
        "n AS (SELECT (SELECT count(*) FROM s1) AS n1, (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3) " +
        "SELECT * FROM (" +
        "SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step, n1 AS users_reached, " +
        "CASE WHEN n1 = 0 THEN 0 ELSE 1000000 END AS conversion_micro FROM n " +
        "UNION ALL SELECT 2, 'click', n2, CAST((1000000 * n2) // n1 AS BIGINT) FROM n " +
        "UNION ALL SELECT 3, 'purchase', n3, CAST((1000000 * n3) // n1 AS BIGINT) FROM n" +
        ") ORDER BY step_no"),
      "st_view_agg" -> ("WITH base AS (SELECT o_orderkey, o_custkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders WHERE o_orderkey <= 1000), " +
        "fin AS (SELECT o_custkey, CASE WHEN o_orderkey < 100 THEN cents + 1 ELSE cents END AS cents FROM base) " +
        "SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS agg_sum, " +
        "CAST(count(*) AS BIGINT) AS agg_cnt FROM fin GROUP BY 1 ORDER BY 1"),
      "st_funnel_latency" -> ("WITH s1 AS (SELECT user_id, min(epoch_ms(ts)) AS t1 FROM events " +
        "WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2 FROM events e JOIN s1 USING (user_id) " +
        "WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.t1 AND epoch_ms(e.ts) <= s1.t1 + 86400000 " +
        "GROUP BY e.user_id), " +
        "s2o AS (SELECT s2.user_id, s2.t2, s1.t1 FROM s2 JOIN s1 USING (user_id)), " +
        "s3 AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t3 FROM events e JOIN s2o USING (user_id) " +
        "WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2o.t2 AND epoch_ms(e.ts) <= s2o.t1 + 86400000 " +
        "GROUP BY e.user_id), " +
        "p1 AS (SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS from_step, 'click' AS to_step, " +
        "CAST(count(*) AS BIGINT) AS n_users, " +
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY t2 - t1) AS BIGINT) AS p50_ms, " +
        "CAST(max(t2 - t1) AS BIGINT) AS max_ms FROM s2o), " +
        "p2 AS (SELECT CAST(2 AS BIGINT), 'click', 'purchase', CAST(count(*) AS BIGINT), " +
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY t3 - t2) AS BIGINT), " +
        "CAST(max(t3 - t2) AS BIGINT) FROM s3 JOIN s2o USING (user_id)) " +
        "SELECT * FROM p1 UNION ALL SELECT * FROM p2 ORDER BY step_no"),
      "st_retention" -> ("WITH c AS (SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week " +
        "FROM events GROUP BY user_id), " +
        "sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS size FROM c GROUP BY 1), " +
        "a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w FROM events), " +
        "m AS (SELECT c.cohort_week, CAST((a.w - c.cohort_week) // 7 AS BIGINT) AS week_offset, " +
        "CAST(count(*) AS BIGINT) AS active_users FROM a JOIN c USING (user_id) GROUP BY 1, 2) " +
        "SELECT m.cohort_week, m.week_offset, m.active_users, " +
        "CAST((1000000 * m.active_users) // sz.size AS BIGINT) AS retention_micro " +
        "FROM m JOIN sz USING (cohort_week) ORDER BY cohort_week, week_offset"),
      "st_transitions" -> ("WITH o AS (SELECT user_id, event_type, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS from_type " +
        "FROM events), " +
        "p AS (SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n_transitions " +
        "FROM o WHERE from_type IS NOT NULL GROUP BY 1, 2), " +
        "tt AS (SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS total FROM p GROUP BY 1) " +
        "SELECT p.from_type, p.to_type, p.n_transitions, " +
        "CAST((1000000 * p.n_transitions) // tt.total AS BIGINT) AS prob_micro " +
        "FROM p JOIN tt USING (from_type) ORDER BY from_type, to_type"),
      // binary sign-bit signatures + exact Hamming top-10 (dim 64 = two
      // 32-bit words; CASE sums of distinct powers of two stay small
      // positive BIGINTs in any engine)
      "sim_binary" -> ("WITH s AS MATERIALIZED (SELECT vec_id, " +
        "CAST(coalesce(list_sum(list_transform(range(1, 33), j -> " +
        "CASE WHEN embedding[j] > 0 THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END)), 0) AS BIGINT) AS s0, " +
        "CAST(coalesce(list_sum(list_transform(range(33, 65), j -> " +
        "CASE WHEN embedding[j] > 0 THEN (CAST(1 AS BIGINT) << (j - 33)) ELSE 0 END)), 0) AS BIGINT) AS s1 " +
        "FROM embeddings), " +
        "q AS (SELECT s0, s1 FROM s WHERE vec_id = 7) " +
        "SELECT s.vec_id, CAST(bit_count(xor(s.s0, q.s0)) + bit_count(xor(s.s1, q.s1)) AS BIGINT) AS hamming " +
        "FROM s CROSS JOIN q ORDER BY hamming, s.vec_id LIMIT 10"),
      // curriculum difficulty staging, integer-exact
      "pipe_curriculum" -> ("WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "toks AS (SELECT doc_id, unnest(tk) AS term FROM tk), " +
        "dt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2), " +
        "nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents), " +
        "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM dt GROUP BY 1), " +
        "diff AS (SELECT dt.doc_id, CAST(sum(dt.tf * ((1000 * nd.n) // dfq.dft)) // sum(dt.tf) AS BIGINT) AS difficulty_milli " +
        "FROM dt JOIN dfq USING (term) CROSS JOIN nd GROUP BY 1), " +
        "b AS (SELECT quantile_disc(difficulty_milli, 0.25) AS b1, quantile_disc(difficulty_milli, 0.5) AS b2, " +
        "quantile_disc(difficulty_milli, 0.75) AS b3 FROM diff) " +
        "SELECT d.doc_id, d.difficulty_milli, CAST(1 + CAST(d.difficulty_milli > b.b1 AS INT) + " +
        "CAST(d.difficulty_milli > b.b2 AS INT) + CAST(d.difficulty_milli > b.b3 AS INT) AS BIGINT) AS stage " +
        "FROM diff d CROSS JOIN b ORDER BY d.doc_id"),
      "skew_salted_join" -> ("SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS li_sum, " +
        "round(sum(o_totalprice), 2) AS ord_sum FROM lineitem JOIN orders ON l_orderkey = o_orderkey"),
      "st_sessions" -> ("WITH g AS (SELECT user_id, ts, value, " +
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000 THEN 1 ELSE 0 END AS brk " +
        "FROM events), s AS (SELECT user_id, ts, value, " +
        // windowed integer sum() is HUGEINT in DuckDB vs Spark's BIGINT
        "CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM g) " +
        "SELECT user_id, session_no, epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms, " +
        s"count(*) AS n_events, $centSum AS sum_value FROM s " +
        "GROUP BY user_id, session_no ORDER BY user_id, session_no"),
      // >= gap break (session_window convention), islands otherwise
      "st_session_native" -> ("WITH g AS (SELECT user_id, ts, value, " +
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000 THEN 1 ELSE 0 END AS brk " +
        "FROM events), s AS (SELECT user_id, ts, value, " +
        "CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM g) " +
        "SELECT user_id, epoch_ms(min(ts)) AS start_ms, count(*) AS n_events, " +
        s"$centSum AS sum_value FROM s " +
        "GROUP BY user_id, session_no ORDER BY user_id, start_ms"),
      "dd_contamination" -> ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "g AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram " +
        "FROM d, unnest(range(1, greatest(len(tk) - 1, 1))) t(i) WHERE len(tk) >= 3), " +
        "b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20) " +
        "SELECT doc_id, count(*) AS n_shared FROM g WHERE doc_id >= 20 AND gram IN (SELECT gram FROM b) " +
        "GROUP BY doc_id ORDER BY doc_id"),
      "agg_quantiles" -> ("SELECT l_returnflag, round(quantile_disc(l_extendedprice, 0.5), 2) AS p50, " +
        "round(quantile_disc(l_extendedprice, 0.95), 2) AS p95 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      "dd_exact" -> "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text ORDER BY doc_id",
      "dd_exact_survivors" -> ("SELECT doc_id, lang, n_chars FROM documents " +
        "WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text) ORDER BY doc_id"),
      "txt_tokens" -> ("SELECT doc_id, len(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS n_ws_tokens, " +
        "CAST(list_sum(list_transform(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0), " +
        "w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_tokens " +
        "FROM documents ORDER BY doc_id"),
      "q_sql_kernel" -> ("WITH q AS (SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0), " +
        "e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id < 20), " +
        "s AS (SELECT e.vec_id, SUM(CAST(e.v AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS dot, " +
        "SUM(CAST(e.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS na, SUM(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS nb " +
        "FROM e JOIN q USING (i) GROUP BY e.vec_id) " +
        "SELECT vec_id, round(dot/(sqrt(na)*sqrt(nb)), 4) AS cs FROM s ORDER BY vec_id"),
      // double-precision UNNEST cosine (DuckDB's list_cosine_similarity is
      // float-typed; this matches the engine's double kernel bit-for-bit
      // after round(.,4))
      "sim_topk" -> ("WITH q AS (SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0), " +
        "e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i FROM embeddings), " +
        "s AS (SELECT e.vec_id, SUM(CAST(e.v AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS dot, " +
        "SUM(CAST(e.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS na, SUM(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS nb " +
        "FROM e JOIN q USING (i) GROUP BY e.vec_id), " +
        "r AS (SELECT vec_id, dot/(sqrt(na)*sqrt(nb)) AS c FROM s ORDER BY c DESC, vec_id LIMIT 10) " +
        "SELECT vec_id, round(c, 4) AS cosine FROM r ORDER BY vec_id"),
      "sim_topk_batch" -> ("WITH q AS (SELECT vec_id AS q_id, unnest(embedding) AS qv, generate_subscripts(embedding,1) AS i FROM embeddings WHERE vec_id < 3), " +
        "e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding,1) AS i FROM embeddings), " +
        "s AS (SELECT q.q_id, e.vec_id, SUM(CAST(e.v AS DOUBLE)*CAST(q.qv AS DOUBLE)) AS dot, " +
        "SUM(CAST(e.v AS DOUBLE)*CAST(e.v AS DOUBLE)) AS na, SUM(CAST(q.qv AS DOUBLE)*CAST(q.qv AS DOUBLE)) AS nb " +
        "FROM e JOIN q USING (i) GROUP BY 1, 2), " +
        "r AS (SELECT q_id, vec_id, dot/(sqrt(na)*sqrt(nb)) AS c, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY dot/(sqrt(na)*sqrt(nb)) DESC, vec_id) AS rank FROM s) " +
        "SELECT q_id, vec_id, round(c, 4) AS cosine FROM r WHERE rank <= 5 ORDER BY q_id, vec_id"),
      "txt_quality" -> ("WITH t AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM documents) " +
        "SELECT doc_id, len(toks) AS n_tokens, " +
        "round((len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))) / greatest(CAST(len(text) AS DOUBLE), 1.0), 6) AS punct_ratio, " +
        "round(CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS stopword_ratio, " +
        "round(len(text) / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS avg_word_len " +
        "FROM t ORDER BY doc_id"),
      "txt_langid" -> ("WITH t AS (SELECT doc_id, list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS toks FROM documents), " +
        "s AS (SELECT doc_id, " +
        "CAST(len(list_intersect(toks, ['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'])) AS DOUBLE) / greatest(len(toks), 1) AS s_en, " +
        "CAST(len(list_intersect(toks, ['el','la','los','las','un','una','y','o','de','en','es','que','por','con','para','del','se','no'])) AS DOUBLE) / greatest(len(toks), 1) AS s_es, " +
        "CAST(len(list_intersect(toks, ['le','la','les','un','une','et','ou','de','en','est','que','pour','dans','par','avec','du','au','ne'])) AS DOUBLE) / greatest(len(toks), 1) AS s_fr, " +
        "CAST(len(list_intersect(toks, ['der','die','das','ein','eine','und','oder','von','zu','ist','dass','mit','auf','im','den','nicht'])) AS DOUBLE) / greatest(len(toks), 1) AS s_de " +
        "FROM t) " +
        "SELECT doc_id, CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0.02 THEN 'und' " +
        "WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr' " +
        "WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es' " +
        "WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en' " +
        "ELSE 'de' END AS pred_lang FROM s ORDER BY doc_id"),
      "dd_jaccard_pairs" -> ("WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk " +
        "FROM documents WHERE doc_id < 80), " +
        "sh AS (SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] FOR i IN range(1, len(tk)-1)]) AS ss " +
        "FROM toks WHERE len(tk) >= 3), " +
        "p AS (SELECT a.doc_id AS idA, b.doc_id AS idB, " +
        "round(CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS DOUBLE), 4) AS jaccard " +
        "FROM sh a, sh b WHERE a.doc_id < b.doc_id) " +
        "SELECT idA, idB, jaccard FROM p WHERE jaccard >= 0.015 ORDER BY idA, idB"),
      "dd_cosine_pairs" -> ("WITH e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i " +
        "FROM embeddings WHERE vec_id < 150), " +
        "s AS (SELECT a.vec_id AS idA, b.vec_id AS idB, " +
        "SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot, " +
        "SUM(CAST(a.v AS DOUBLE) * CAST(a.v AS DOUBLE)) AS na, " +
        "SUM(CAST(b.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS nb " +
        "FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2), " +
        "p AS (SELECT idA, idB, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cosine FROM s) " +
        "SELECT idA, idB, cosine FROM p WHERE cosine >= 0.35 ORDER BY idA, idB"),
      "dd_cluster_chain" -> ("SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY doc_id // 8) AS label FROM documents " +
        "QUALIFY count(*) OVER (PARTITION BY doc_id // 8) >= 2 ORDER BY id"),
      // near-dup recall contracts: n_true is the exact all-pairs shingle
      // Jaccard count on the bounded doc_id < 500 range (same CTE shape as
      // dd_jaccard_pairs — string shingles, no hashes), hash-verified; the
      // boolean IS the contract, computed Spark-side over the LSH output
      "dd_minhash" -> (ddTruthSql(0.5) + " SELECT count(*) AS n_true, true AS recall_ok FROM p"),
      "dd_simhash" -> (ddTruthSql(0.5) + " SELECT count(*) AS n_true, true AS recall_ok FROM p"),
      "dd_ngram_jaccard" -> (ddTruthSql(0.3) +
        " SELECT count(*) AS n_true, true AS recall_ok, true AS precision_ok FROM p"),
      // planted-duplicate contract: 50 nudged clones must be recovered by
      // the sign-LSH bucketing (>= 45; multi-probe covers any 1-bit flip)
      "dd_semdedup" -> ("SELECT count(*) AS n_planted, true AS clones_pruned, true AS originals_kept " +
        "FROM embeddings WHERE vec_id < 50"),
      "dd_embed_cosine" -> ("SELECT count(*) AS n_planted, true AS all_found " +
        "FROM embeddings WHERE vec_id < 50"),
      // the IVF recall contract: k rows returned, >= 6 of the exact
      // brute-force top-10 recovered (both sides deterministic) — the
      // constant row IS the contract; Spark computes the intersection
      "sim_ivf" -> "SELECT CAST(10 AS BIGINT) AS n, true AS recall_ok",
      // PQ recall contract (truth sets built in-query, like sim_ivf)
      "sim_pq" -> ("SELECT CAST(10 AS BIGINT) AS n, true AS adc_recall_ok, " +
        "true AS rerank_recall_ok"),
      "sim_ivfpq" -> ("SELECT CAST(10 AS BIGINT) AS n, true AS adc_recall_ok, " +
        "true AS rerank_recall_ok"),
      // per-query batch-IVF contract rows (one per probe query)
      "sim_ivf_batch" -> ("SELECT CAST(q_id AS BIGINT) AS q_id, CAST(10 AS BIGINT) AS n, " +
        "true AS recall_ok FROM (SELECT unnest([3, 7, 11]) AS q_id) ORDER BY q_id"),
      // k-NN JOIN contract: every embedding is a query; k rows each, self
      // found, mean exact-top-10 recall >= 0.6 (Spark computes all four)
      "sim_knn_join" -> ("SELECT count(*) AS n_queries, true AS all_k_rows, " +
        "true AS self_recall_ok, true AS recall_ok FROM embeddings"),
      // column profiler: one subquery per lineitem column, rendering
      // pinned to the Profiler's rules (4-dp DECIMAL for fractionals,
      // ISO seconds for temporals, raw strings/integers)
      "prof_corr" -> {
        val cs = Seq("qty", "price_usd", "disc_bp", "tax_bp")
        val prs = for (i <- cs.indices; j <- i + 1 until cs.size) yield (cs(i), cs(j))
        def cell(a: String, b: String): String = {
          val num = s"n * p_${a}_$b - s_$a * s_$b"
          val d1 = s"n * ss_$a - s_$a * s_$a"
          val d2 = s"n * ss_$b - s_$b * s_$b"
          s"SELECT '$a' AS col_a, '$b' AS col_b, n, " +
            s"CASE WHEN ($d1) <= 0 OR ($d2) <= 0 THEN NULL ELSE " +
            s"CAST(floor(1e6 * CAST($num AS DOUBLE) / " +
            s"(sqrt(CAST($d1 AS DOUBLE)) * sqrt(CAST($d2 AS DOUBLE))) + 0.5) AS BIGINT) " +
            "END AS corr_micro FROM g"
        }
        "WITH s AS (SELECT CAST(l_quantity AS BIGINT) AS qty, " +
          "CAST(floor(l_extendedprice) AS BIGINT) AS price_usd, " +
          "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS disc_bp, " +
          "CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS tax_bp " +
          "FROM lineitem WHERE l_orderkey < 2000), " +
          "g AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          cs.map(c => s"CAST(sum($c) AS BIGINT) AS s_$c, CAST(sum($c * $c) AS BIGINT) AS ss_$c")
            .mkString(", ") + ", " +
          prs.map { case (a, b) => s"CAST(sum($a * $b) AS BIGINT) AS p_${a}_$b" }
            .mkString(", ") + " FROM s) " +
          prs.map { case (a, b) => cell(a, b) }.mkString(" UNION ALL ") +
          " ORDER BY col_a, col_b"
      },
      "prof_hist" -> ("WITH x AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem), " +
        "mm AS (SELECT min(c) AS mn, max(c) AS mx FROM x), " +
        "b AS (SELECT CASE WHEN mm.mx = mm.mn THEN 0 ELSE ((x.c - mm.mn) * 20) // (mm.mx - mm.mn + 1) END AS bin, x.c " +
        "FROM x CROSS JOIN mm) " +
        "SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(min(c) AS BIGINT) AS lo, CAST(max(c) AS BIGINT) AS hi " +
        "FROM b GROUP BY bin ORDER BY bin"),
      "samp_exact_k" -> ("SELECT doc_id, source, n_chars FROM documents " +
        s"ORDER BY ${knuthHash("doc_id")}, doc_id LIMIT 25"),
      "samp_proportional" -> ("WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source), " +
        "tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM st), " +
        "q AS (SELECT source, n, (60 * n) // nn AS q, (60 * n) % nn AS r FROM st CROSS JOIN tt), " +
        "a AS (SELECT source, q + (CASE WHEN row_number() OVER (ORDER BY r DESC, source) " +
        "<= 60 - (SELECT sum(q) FROM q) THEN 1 ELSE 0 END) AS alloc FROM q), " +
        s"rk AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY ${knuthHash("doc_id")}, doc_id) AS rn FROM documents) " +
        "SELECT rk.doc_id, rk.source FROM rk JOIN a USING (source) WHERE rk.rn <= a.alloc " +
        "ORDER BY doc_id"),
      "prof_expect" -> ("WITH bad AS (" +
        "SELECT 5000000 + i AS o_orderkey, CAST(NULL AS BIGINT) AS o_custkey, 10.0 AS o_totalprice, 'O' AS o_orderstatus FROM range(3) t(i) " +
        "UNION ALL SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey IN (1, 2) " +
        "UNION ALL SELECT 6000000 + i, 1, -5.0, 'F' FROM range(2) t(i) " +
        "UNION ALL SELECT 7000000 + i, 888888800 + i, 1.0, 'X' FROM range(3) t(i)), " +
        "dirty AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders " +
        "UNION ALL SELECT * FROM bad) " +
        "SELECT rule, n_violations FROM (" +
        "SELECT 'not_null:o_custkey' AS rule, CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations FROM dirty " +
        "UNION ALL SELECT 'price_positive', CAST(count(*) FILTER (WHERE NOT (o_totalprice > 0) OR o_totalprice IS NULL) AS BIGINT) FROM dirty " +
        "UNION ALL SELECT 'status_domain', CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL) AS BIGINT) FROM dirty " +
        "UNION ALL SELECT 'unique:o_orderkey', CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (SELECT count(*) AS c FROM dirty GROUP BY o_orderkey) " +
        "UNION ALL SELECT 'ref:o_custkey', CAST(count(*) AS BIGINT) FROM dirty " +
        "WHERE o_custkey IS NOT NULL AND o_custkey NOT IN (SELECT c_custkey FROM customer)" +
        ") ORDER BY rule"),
      "prof_columns" -> {
        def row(c: String, mn: String, mx: String, al: String) =
          s"SELECT '$c' AS \"column\", count(*) AS n_rows, " +
            s"count(*) - count($c) AS n_nulls, " +
            s"count(DISTINCT $c) AS n_distinct, $mn AS min_repr, " +
            s"$mx AS max_repr, $al AS avg_len FROM lineitem"
        def intR(c: String) = row(c, s"CAST(min($c) AS VARCHAR)",
          s"CAST(max($c) AS VARCHAR)", "CAST(NULL AS DOUBLE)")
        def dblR(c: String) = row(c,
          s"CAST(CAST(round(min($c), 4) AS DECIMAL(18,4)) AS VARCHAR)",
          s"CAST(CAST(round(max($c), 4) AS DECIMAL(18,4)) AS VARCHAR)",
          "CAST(NULL AS DOUBLE)")
        def strR(c: String) = row(c, s"min($c)", s"max($c)",
          s"round(avg(len($c)), 4)")
        def tsR(c: String) = row(c, s"strftime(min($c), '%Y-%m-%d %H:%M:%S')",
          s"strftime(max($c), '%Y-%m-%d %H:%M:%S')", "CAST(NULL AS DOUBLE)")
        Seq(intR("l_orderkey"), intR("l_partkey"), intR("l_suppkey"),
          intR("l_linenumber"), dblR("l_quantity"), dblR("l_extendedprice"),
          dblR("l_discount"), dblR("l_tax"), strR("l_returnflag"),
          strR("l_linestatus"), tsR("l_shipdate"))
          .mkString("", " UNION ALL ", " ORDER BY \"column\"")
      },
      // CleanCorpus's deterministic quality→exact-dedup prefix: the full
      // Gopher/C4-style composite score replicated in SQL, then the
      // min-id-per-text survivor count
      "pipe_clean_prefix" -> ("WITH t AS (SELECT doc_id, text, " +
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM documents), " +
        "s AS (SELECT doc_id, text, len(toks) AS ntk, " +
        "(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))) / greatest(CAST(len(text) AS DOUBLE), 1.0) AS punct, " +
        "(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))) / greatest(CAST(len(text) AS DOUBLE), 1.0) AS digits, " +
        "CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stp, " +
        "len(text) / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS avgw FROM t), " +
        "q AS (SELECT doc_id, text FROM s WHERE round(CASE WHEN ntk < 5 THEN 0.0 ELSE " +
        "greatest(0.0, least(1.0, 0.4 * least(stp * 4, 1.0) + " +
        "0.3 * (CASE WHEN avgw BETWEEN 3 AND 12 THEN 1.0 ELSE 0.0 END) + " +
        "0.3 * (1.0 - least(punct * 5 + digits * 5, 1.0)))) END, 6) >= 0.1), " +
        "e AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text) " +
        "SELECT (SELECT count(*) FROM documents) AS input, " +
        "(SELECT count(*) FROM q) AS after_quality, " +
        "(SELECT count(*) FROM e) AS after_exact"),
      // full composition: same deterministic prefix counts hash-verified,
      // plus the Spark-side monotonicity contract over the LSH suffix
      "pipe_clean_corpus" -> ("WITH t AS (SELECT doc_id, text, " +
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks FROM documents), " +
        "s AS (SELECT doc_id, text, len(toks) AS ntk, " +
        "(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g'))) / greatest(CAST(len(text) AS DOUBLE), 1.0) AS punct, " +
        "(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))) / greatest(CAST(len(text) AS DOUBLE), 1.0) AS digits, " +
        "CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','with','as','at','by'], x))) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stp, " +
        "len(text) / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS avgw FROM t), " +
        "q AS (SELECT doc_id, text FROM s WHERE round(CASE WHEN ntk < 5 THEN 0.0 ELSE " +
        "greatest(0.0, least(1.0, 0.4 * least(stp * 4, 1.0) + " +
        "0.3 * (CASE WHEN avgw BETWEEN 3 AND 12 THEN 1.0 ELSE 0.0 END) + " +
        "0.3 * (1.0 - least(punct * 5 + digits * 5, 1.0)))) END, 6) >= 0.1), " +
        "e AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text) " +
        "SELECT (SELECT count(*) FROM documents) AS input, " +
        "(SELECT count(*) FROM q) AS after_quality, " +
        "(SELECT count(*) FROM e) AS after_exact, true AS mono_ok"),
      // HLL++ error contract: exact distinct hash-verified, bound Spark-side
      "agg_approx_distinct" -> ("SELECT count(DISTINCT tok) AS exact, true AS err_ok FROM " +
        "(SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS tok FROM documents)"),
      // quantile-sketch error contract: exact percentiles hash-verified
      "agg_approx_quantiles" -> ("SELECT round(quantile_cont(o_totalprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.9), 4) AS p90, true AS approx_ok FROM orders"),
      // bloom prefilter never changes the result — plain semi join IS the oracle
      "q_bloom_join" -> ("SELECT count(*) AS n_orders, round(sum(o_totalprice), 2) AS price_sum " +
        "FROM orders WHERE o_custkey IN " +
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"),
      // bigram LM typicality: same fixed-point micro-probability pipeline
      // in SQL — floor after only correctly-rounded IEEE ops (+, /, ×)
      // makes every per-bigram integer identical across engines
      "txt_lm_score" -> ("WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "f AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 2), " +
        "uni AS (SELECT w1, count(*) AS c1 FROM (SELECT unnest(tk) AS w1 FROM f) GROUP BY w1), " +
        "big AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg FROM f), " +
        "cb AS (SELECT bg, count(*) AS c12 FROM big GROUP BY bg), " +
        "m AS (SELECT b.doc_id, CAST(floor(1000000.0 * (c12 + 0.5) / (c1 + 0.5 * (SELECT count(*) FROM uni))) AS BIGINT) AS micro " +
        "FROM big b JOIN cb USING (bg) JOIN uni ON string_split(b.bg, ' ')[1] = uni.w1) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "CAST(floor(sum(micro) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS typicality_micro " +
        "FROM m GROUP BY doc_id ORDER BY doc_id"),
      // trec_eval metrics replayed relationally; the discount VALUES list
      // is generated from the SAME driver-side constants the plan embeds
      "eval_retrieval" -> ("WITH runs AS (SELECT o_custkey AS q, o_orderkey AS d, o_totalprice AS s " +
        "FROM orders WHERE o_custkey < 500), " +
        "ranked AS (SELECT q, d, row_number() OVER (PARTITION BY q ORDER BY s DESC, d ASC) AS r FROM runs), " +
        "topk AS (SELECT q, d, r FROM ranked WHERE r <= 10), " +
        "qrels AS (SELECT q, d FROM runs WHERE d % 3 = 0), " +
        "nrel AS (SELECT q, count(*) AS n_rel FROM qrels GROUP BY q), " +
        s"disc(r, dm) AS (VALUES ${graft.text.RetrievalEval.discountValuesSql(10)}), " +
        "hits AS (SELECT t.q, min(t.r) AS fr, count(*) AS h, CAST(sum(dm) AS BIGINT) AS dcg " +
        "FROM topk t JOIN qrels u ON t.q = u.q AND t.d = u.d JOIN disc ON disc.r = t.r GROUP BY t.q), " +
        "pre AS (SELECT d1.r AS nr, CAST(sum(d2.dm) AS BIGINT) AS idcg FROM disc d1 JOIN disc d2 ON d2.r <= d1.r GROUP BY d1.r) " +
        "SELECT n.q AS query_id, n.n_rel, " +
        "COALESCE(CAST(floor(1000000000.0 / h2.fr) AS BIGINT), 0) AS mrr_micro, " +
        "COALESCE(CAST(floor((1000000000.0 * h2.h) / n.n_rel) AS BIGINT), 0) AS recall_micro, " +
        "COALESCE(CAST(floor((1000000.0 * h2.dcg) / p.idcg) AS BIGINT), 0) AS ndcg_micro " +
        "FROM nrel n JOIN pre p ON p.nr = LEAST(n.n_rel, 10) " +
        "LEFT JOIN hits h2 ON h2.q = n.q ORDER BY query_id"),
      // Rocchio replayed relationally: centroid counts, exact-integer
      // dots, sqrt norms, micro-quantized cosine, argmax-per-doc
      "txt_classify" -> ("WITH tk AS (SELECT doc_id, lang, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS w FROM documents), " +
        "ctr AS (SELECT lang AS lbl, w, count(*) AS c FROM tk WHERE doc_id % 2 = 0 GROUP BY lbl, w), " +
        "cn AS (SELECT lbl, sqrt(CAST(sum(c * c) AS DOUBLE)) AS cnorm FROM ctr GROUP BY lbl), " +
        "dtf AS (SELECT doc_id, w, count(*) AS tf FROM tk WHERE doc_id % 2 = 1 GROUP BY doc_id, w), " +
        "dn AS (SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS dnorm FROM dtf GROUP BY doc_id), " +
        "dots AS (SELECT d.doc_id, c.lbl, CAST(sum(d.tf * c.c) AS BIGINT) AS dot FROM dtf d JOIN ctr c USING (w) GROUP BY d.doc_id, c.lbl), " +
        "sc AS (SELECT doc_id, lbl, CAST(floor((1000000.0 * dot) / (dnorm * cnorm)) AS BIGINT) AS cos_micro, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY CAST(floor((1000000.0 * dot) / (dnorm * cnorm)) AS BIGINT) DESC, lbl ASC) AS rk " +
        "FROM dots JOIN dn USING (doc_id) JOIN cn USING (lbl)) " +
        "SELECT s.doc_id, s.lbl AS pred_label, s.cos_micro, s.lbl = d2.lang AS correct " +
        "FROM sc s JOIN documents d2 ON d2.doc_id = s.doc_id WHERE s.rk = 1 ORDER BY s.doc_id"),
      // the Stupid-Backoff model replayed relationally: three count CTEs
      // over the even-doc train split, a five-way left join per scored
      // position, the same CASE backoff chain in nano-units
      "txt_backoff_lm" -> (sbScoreCte +
        " SELECT doc_id, count(*) AS n_trigrams, " +
        "CAST(floor(sum(nano) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS sb_nano " +
        "FROM sc GROUP BY doc_id ORDER BY doc_id"),
      // CCNet buckets: per-doc LM score -> per-language exact terciles ->
      // head/middle/tail (same CTE prefix as txt_backoff_lm)
      "pipe_ppl_buckets" -> (sbScoreCte +
        ", d AS (SELECT doc_id, CAST(floor(sum(nano) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS sb_nano " +
        "FROM sc GROUP BY doc_id), " +
        "j AS (SELECT d.doc_id, doc.lang, d.sb_nano FROM d " +
        "JOIN documents doc ON doc.doc_id = d.doc_id), " +
        "c AS (SELECT lang, quantile_disc(sb_nano, 0.3333333333333333) AS p33, " +
        "quantile_disc(sb_nano, 0.6666666666666666) AS p67 FROM j GROUP BY lang) " +
        "SELECT j.doc_id, j.lang, j.sb_nano, " +
        "CASE WHEN j.sb_nano <= c.p33 THEN 'tail' " +
        "WHEN j.sb_nano <= c.p67 THEN 'middle' ELSE 'head' END AS bucket " +
        "FROM j JOIN c ON c.lang = j.lang ORDER BY j.doc_id"),
      // frequent-items sketch: exact heavy-hitter count hash-verified, the
      // no-false-negative containment checked Spark-side
      "txt_heavy_hitters" -> ("WITH tok AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS token FROM documents), " +
        "c AS (SELECT token, count(*) AS n FROM tok GROUP BY token) " +
        "SELECT count(*) AS n_heavy, true AS all_found FROM c " +
        "WHERE n > 0.05 * (SELECT count(*) FROM tok)"),
      // fingerprint purity + xxhash64 injectivity on this corpus
      "txt_fingerprint" -> ("SELECT count(*) AS n_docs, count(DISTINCT text) AS n_text, " +
        "true AS fp_consistent, true AS hash_injective FROM documents"),
      // bloom-split incremental dedup == plain anti join
      "pipe_incr_dedup" -> ("WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 250), " +
        "incoming AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250 " +
        "UNION ALL SELECT doc_id + 10000 AS doc_id, text FROM corpus WHERE doc_id % 5 = 0), " +
        "s AS (SELECT * FROM incoming WHERE text NOT IN (SELECT text FROM corpus)) " +
        "SELECT count(*) AS n_new, min(doc_id) AS min_id, max(doc_id) AS max_id FROM s"),
      // real-codec twins: payloads are solid PNGs rendered from doc_id, so
      // decoded dims and per-channel means are pure integer math
      "mm_features" -> ("SELECT doc_id AS media_id, 1 + doc_id % 13 AS width, " +
        "1 + doc_id % 7 AS height, (doc_id * 37) % 256 AS mean_r, " +
        "(doc_id * 59) % 256 AS mean_g, (doc_id * 83) % 256 AS mean_b " +
        "FROM documents ORDER BY media_id"),
      // bilinear half-size of a solid image keeps the exact channel values;
      // dims follow the max(1, v/2) rule Multimodal.resize pins
      "mm_resize" -> ("SELECT doc_id AS media_id, greatest(1, (1 + doc_id % 13) // 2) AS width, " +
        "greatest(1, (1 + doc_id % 7) // 2) AS height, (doc_id * 37) % 256 AS mean_r, " +
        "(doc_id * 59) % 256 AS mean_g, (doc_id * 83) % 256 AS mean_b " +
        "FROM documents ORDER BY media_id"),
      // real-codec audio twin: WAV payloads are generated from doc_id by a
      // pure integer formula, so the decoded per-window features are exact
      // integer math (sum() cast — DuckDB widens to HUGEINT)
      "mm_audio" -> ("WITH d AS (SELECT doc_id, 800 + (doc_id % 3) * 400 AS n FROM documents WHERE doc_id < 40), " +
        "s AS (SELECT d.doc_id AS media_id, d.n, g.i, " +
        "(((d.doc_id * 31 + g.i * 7) % 201) - 100) * 300 AS v " +
        "FROM d CROSS JOIN (SELECT unnest(range(0, 2000)) AS i) g WHERE g.i < d.n) " +
        "SELECT media_id, CAST(8000 AS BIGINT) AS sample_rate, " +
        "CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms, i // 160 AS window_no, " +
        "count(*) AS w_n, CAST(max(abs(v)) AS BIGINT) AS w_peak, " +
        "CAST(sum(v * v) AS BIGINT) AS w_sumsq " +
        "FROM s GROUP BY media_id, n, i // 160 ORDER BY media_id, window_no"),
      // planted-group contract: the truth pair count is pure set algebra
      // over doc_id; the recall/precision booleans are the operator's claim
      "mm_phash_dedup" -> ("WITH sel AS (SELECT doc_id, CAST(floor(doc_id / 4.0) AS BIGINT) AS gid " +
        "FROM documents WHERE doc_id < 400), " +
        "g AS (SELECT gid, count(*) AS c FROM sel GROUP BY gid) " +
        "SELECT (SELECT count(*) FROM sel) AS n_images, " +
        "CAST(COALESCE(sum(c * (c - 1) / 2), 0) AS BIGINT) AS n_true, " +
        "true AS recall_ok, true AS precision_ok FROM g"),
      "mm_audio_dedup" -> ("WITH sel AS (SELECT doc_id, CAST(floor(doc_id / 3.0) AS BIGINT) AS gid " +
        "FROM documents WHERE doc_id < 240), " +
        "g AS (SELECT gid, count(*) AS c FROM sel GROUP BY gid) " +
        "SELECT (SELECT count(*) FROM sel) AS n_media, " +
        "CAST(COALESCE(sum(c * (c - 1) / 2), 0) AS BIGINT) AS n_true, " +
        "true AS recall_ok, true AS precision_ok FROM g"),
      "mm_frame_sample" -> ("WITH m AS (SELECT doc_id AS media_id, 3 + doc_id % 4 AS nf, " +
        "8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents WHERE doc_id < 60), " +
        "f AS (SELECT media_id, w, h, unnest(range(0, nf, 2)) AS frame_no FROM m) " +
        "SELECT media_id, frame_no, true AS decoded, CAST(w AS BIGINT) AS width, " +
        "CAST(h AS BIGINT) AS height, " +
        "CAST((media_id * 7 + frame_no * 13) % 256 AS BIGINT) AS mean_r, " +
        "CAST((media_id * 11 + frame_no * 5) % 256 AS BIGINT) AS mean_g, " +
        "CAST((media_id * 3 + frame_no * 17) % 256 AS BIGINT) AS mean_b " +
        "FROM f ORDER BY media_id, frame_no"),
      // integer sum() is HUGEINT in DuckDB vs Spark's BIGINT — the driver
      // hash is type-sensitive, so pin the oracle to BIGINT explicitly
      "samp_bernoulli" -> ("SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars FROM documents " +
        s"WHERE ${knuthHash("doc_id")} % 100 < 10"),
      "samp_stratified" -> ("SELECT lang, doc_id, rn FROM (SELECT lang, doc_id, " +
        s"row_number() OVER (PARTITION BY lang ORDER BY ${knuthHash("doc_id")}, doc_id) AS rn " +
        "FROM documents) t WHERE rn <= 3 ORDER BY lang, rn"),
      // sqrt is correctly rounded under IEEE-754 (a general pow is not), so
      // the per-language basis-point rate — and hence the kept set — is
      // bit-identical across engines
      "samp_temperature" -> ("WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang), " +
        "r AS (SELECT lang, CAST(floor(10000 * sqrt((SELECT min(n) FROM c) / CAST(n AS DOUBLE))) AS BIGINT) AS rate_bp FROM c) " +
        "SELECT d.lang, count(*) AS n_kept, CAST(sum(d.n_chars) AS BIGINT) AS kept_chars " +
        s"FROM documents d JOIN r USING (lang) WHERE ${knuthHash("d.doc_id")} % 10000 < rate_bp " +
        "GROUP BY d.lang ORDER BY d.lang"),
      "pipe_shuffle" -> (s"SELECT doc_id, ${knuthHash("doc_id")} AS pos FROM documents " +
        "ORDER BY pos, doc_id LIMIT 100"),
      // window sum is HUGEINT in DuckDB — cast before the integer divide so
      // pack_id renders as an integer like Spark's BIGINT
      "pipe_pack_sequences" -> ("WITH tk AS (SELECT doc_id, CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok FROM documents), " +
        s"b AS (SELECT doc_id, n_tok, ${knuthHash("doc_id")} % 16 AS bucket FROM tk), " +
        "s AS (SELECT bucket, doc_id, n_tok, CAST(coalesce(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st FROM b) " +
        "SELECT bucket, st // 256 AS pack_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens " +
        "FROM s GROUP BY bucket, st // 256 ORDER BY bucket, pack_id"),
      // chunk starts advance by step=24; ceil(n/24) chunks; the head token
      // pins chunk alignment, the least() pins the short final chunk
      "pipe_chunk" -> ("WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "c AS (SELECT doc_id, tk, len(tk) AS n FROM tk WHERE len(tk) > 0), " +
        "ch AS (SELECT doc_id, tk, n, unnest(range(0, CAST(ceil(n / 24.0) AS BIGINT))) AS chunk_no FROM c) " +
        "SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no, " +
        "CAST(least(32, n - chunk_no * 24) AS BIGINT) AS n_chunk_tokens, " +
        "tk[CAST(chunk_no * 24 + 1 AS INT)] AS head_token " +
        "FROM ch ORDER BY doc_id, chunk_no"),
      "txt_repetition" -> ("WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "g AS (SELECT doc_id, list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS grams FROM tk WHERE len(tk) >= 3) " +
        "SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams, CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams, " +
        "round((len(grams) - len(list_distinct(grams))) / CAST(len(grams) AS DOUBLE), 4) AS dup_gram_ratio " +
        "FROM g ORDER BY doc_id"),
      "txt_top_tokens" -> ("WITH tok AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS token FROM documents) " +
        "SELECT token, count(*) AS n FROM tok GROUP BY token ORDER BY n DESC, token LIMIT 20"),
      // identical integer milli-unit BM25 algebra (rational idf, integer
      // div only); DuckDB integer division is `//`, sums are HUGEINT →
      // cast back to BIGINT
      // unigram tokenizer's lossless invariant: piece chars == word chars
      "txt_unigram" -> ("SELECT doc_id, coalesce(CAST(list_sum(list_transform(" +
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0), " +
        "w -> len(w))) AS BIGINT), 0) AS piece_chars FROM documents ORDER BY doc_id"),
      // WordPiece lossless invariant: zero [UNK]s (the vocab contains its
      // own training alphabet) and piece chars == corpus word chars
      "txt_wordpiece" -> ("SELECT doc_id, 0 AS n_unk, " +
        "coalesce(CAST(list_sum(list_transform(" +
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0), " +
        "w -> len(w))) AS BIGINT), 0) AS piece_chars FROM documents ORDER BY doc_id"),
      // hybrid RRF: BM25 shortlist (doc 7's terms) + dense cosine
      // shortlist (doc 7's embedding), fused in integer nano-units
      "txt_hybrid" -> ("WITH qt AS (SELECT DISTINCT unnest(list_filter(string_split_regex(lower(" +
        "(SELECT text FROM documents WHERE doc_id = 7)), '\\s+'), x -> len(x) > 0)) AS term), " +
        "tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "toks AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term FROM tk), " +
        "tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM toks " +
        "WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3), " +
        "st AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(len(tk)) AS BIGINT) AS na FROM tk), " +
        "dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM tf GROUP BY 1), " +
        "sc AS (SELECT tf.doc_id, CAST(sum( " +
        "(((1000 * (2 * st.nd - 2 * dfreq.dft + 1)) // (2 * dfreq.dft + 1)) * 2200 * tf.tf) " +
        "// (1000 * tf.tf + 300 + (900 * ((1000 * tf.dl * st.nd) // st.na)) // 1000) " +
        ") AS BIGINT) AS score_milli FROM tf JOIN dfreq USING (term) CROSS JOIN st GROUP BY 1), " +
        "lex AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank FROM sc QUALIFY rank <= 20), " +
        "qv AS (SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 7), " +
        "e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i FROM embeddings), " +
        "cs AS (SELECT e.vec_id, SUM(CAST(e.v AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS dot, " +
        "SUM(CAST(e.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS na2, SUM(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS nb " +
        "FROM e JOIN qv q USING (i) GROUP BY 1), " +
        "dense AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY round(dot/(sqrt(na2)*sqrt(nb)), 4) DESC, vec_id) AS BIGINT) AS rank FROM cs QUALIFY rank <= 20), " +
        "allc AS (SELECT doc_id, 1000000000 // (60 + rank) AS contrib FROM lex " +
        "UNION ALL SELECT doc_id, 1000000000 // (60 + rank) FROM dense), " +
        "fused AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_nano FROM allc GROUP BY 1) " +
        "SELECT CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id) AS BIGINT) AS rank, doc_id, rrf_nano " +
        "FROM fused QUALIFY rank <= 10 ORDER BY rank"),
      "txt_bm25" -> ("WITH q AS (SELECT * FROM (VALUES " +
        Bm25Queries.zipWithIndex.map { case (q, i) =>
          s"(CAST($i AS BIGINT), '$q')" }.mkString(", ") + ") AS t(q_id, q_text)), " +
        "qt AS (SELECT q_id, unnest(list_distinct(list_filter(string_split_regex(lower(q_text), '\\s+'), x -> len(x) > 0))) AS term FROM q), " +
        "tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "toks AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term FROM tk), " +
        "tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM toks " +
        "WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2, 3), " +
        "st AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(len(tk)) AS BIGINT) AS na FROM tk), " +
        "dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM tf GROUP BY 1), " +
        "sc AS (SELECT qt.q_id, tf.doc_id, CAST(sum( " +
        "(((1000 * (2 * st.nd - 2 * dfreq.dft + 1)) // (2 * dfreq.dft + 1)) * 2200 * tf.tf) " +
        "// (1000 * tf.tf + 300 + (900 * ((1000 * tf.dl * st.nd) // st.na)) // 1000) " +
        ") AS BIGINT) AS score_milli " +
        "FROM tf JOIN dfreq USING (term) JOIN qt USING (term) CROSS JOIN st GROUP BY 1, 2) " +
        "SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank, " +
        "doc_id, score_milli FROM sc QUALIFY rank <= 10 ORDER BY q_id, rank"),
      "txt_bigrams" -> ("WITH tk AS (SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "g AS (SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS gram FROM tk WHERE len(tk) >= 2) " +
        "SELECT gram, count(*) AS n FROM g GROUP BY gram ORDER BY n DESC, gram LIMIT 20"),
      // identical integer 1e4-fixed-point DSIR algebra: Laplace-smoothed
      // target/corpus bigram ratio, arithmetic mean per doc, integer div
      "pipe_dsir" -> ("WITH tk AS (SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "g AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt, " +
        "unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS gram FROM tk WHERE len(tk) >= 2), " +
        "tfd AS (SELECT doc_id, gram, max(tgt) AS tgt, CAST(count(*) AS BIGINT) AS tf FROM g GROUP BY 1, 2), " +
        "cnt AS (SELECT gram, CAST(sum(tf) AS BIGINT) AS cr, CAST(sum(tgt * tf) AS BIGINT) AS ct FROM tfd GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS b FROM cnt), " +
        "r AS (SELECT gram, (10000 * (ct + 1) * (nr + b)) // ((cr + 1) * (nt + b)) AS ratio_e4 FROM cnt CROSS JOIN tot), " +
        "sc AS (SELECT tfd.doc_id, CAST(CAST(sum(tf * ratio_e4) AS BIGINT) // CAST(sum(tf) AS BIGINT) AS BIGINT) AS score_e4, " +
        "CAST(sum(tf) AS BIGINT) AS n_bigrams FROM tfd JOIN r USING (gram) GROUP BY 1) " +
        "SELECT CAST(row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS BIGINT) AS rank, " +
        "doc_id, score_e4, n_bigrams FROM sc ORDER BY rank LIMIT 30"),
      "pipe_split" -> (s"WITH h AS (SELECT n_chars, ${knuthHash("doc_id")} % 100 AS pos FROM documents) " +
        "SELECT CASE WHEN pos < 80 THEN 'train' WHEN pos < 90 THEN 'val' ELSE 'test' END AS split, " +
        "count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars FROM h GROUP BY 1 ORDER BY split"),
      "pipe_leakage_split" -> ("WITH l AS (SELECT doc_id, " +
        "min(doc_id) OVER (PARTITION BY substring(text, 1, 40)) AS entity FROM documents), " +
        s"h AS (SELECT doc_id, entity, ${knuthHash("entity")} % 100 AS pos FROM l) " +
        "SELECT doc_id, entity, CASE WHEN pos < 80 THEN 'train' " +
        "WHEN pos < 90 THEN 'val' ELSE 'test' END AS split FROM h ORDER BY doc_id"),
      "txt_keywords" -> ("WITH d AS (SELECT * FROM documents WHERE doc_id < 200), " +
        "tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS term FROM d), " +
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2), " +
        "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM tf GROUP BY 1), " +
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d), " +
        "sc AS (SELECT doc_id, term, CAST(tf * ((1000 * (2 * n - 2 * dft + 1)) // (2 * dft + 1)) AS BIGINT) AS score_milli " +
        "FROM tf JOIN dfq USING (term) CROSS JOIN nd), " +
        "r AS (SELECT doc_id, term, score_milli, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY score_milli DESC, term) AS rank FROM sc) " +
        "SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score_milli " +
        "FROM r WHERE rank <= 3 ORDER BY doc_id, rank"),
      "txt_collocations" -> ("WITH tk AS (SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM (SELECT unnest(tk) AS w FROM tk) GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(cw) AS BIGINT) AS nn FROM uni), " +
        // parallel unnest of two aligned slices zips positionally in DuckDB
        "bi0 AS (SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2 FROM tk WHERE len(tk) >= 2), " +
        "bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab FROM bi0 GROUP BY 1, 2 HAVING count(*) >= 5) " +
        "SELECT bi.w1, bi.w2, bi.n_ab, " +
        "CAST((1000 * bi.n_ab * tot.nn) // (u1.cw * u2.cw) AS BIGINT) AS score_milli " +
        "FROM bi JOIN uni u1 ON u1.w = bi.w1 JOIN uni u2 ON u2.w = bi.w2 CROSS JOIN tot " +
        "ORDER BY score_milli DESC, bi.n_ab DESC, bi.w1, bi.w2 LIMIT 25"),
      "pipe_interleave" -> ("WITH r AS (SELECT doc_id, source, " +
        s"row_number() OVER (PARTITION BY source ORDER BY ${knuthHash("doc_id")}, doc_id) AS rn FROM documents) " +
        "SELECT rn, source, doc_id FROM r ORDER BY rn, source LIMIT 60"),
      // quantization twin: identical DOUBLE arithmetic and floor(x+0.5)
      // rounding; list_sum of a BIGINT list is HUGEINT — cast back
      "sim_quantize" -> ("WITH m AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS vd, " +
        "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS ma FROM embeddings), " +
        "q AS (SELECT vec_id, CASE WHEN ma = 0 THEN list_transform(vd, v -> CAST(0 AS BIGINT)) " +
        "ELSE list_transform(vd, v -> CAST(floor(v / ma * 127.0 + 0.5) AS BIGINT)) END AS q FROM m) " +
        "SELECT vec_id, CAST(list_sum(q) AS BIGINT) AS q_sum, list_min(q) AS q_min, list_max(q) AS q_max, " +
        "CAST(len(list_filter(q, x -> x <> 0)) AS BIGINT) AS nnz FROM q ORDER BY vec_id"),
      "sim_mmr" -> mmrOracleSql(k = 6, lam = 600),
      "sim_sign_project" -> ("WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100), " +
        "js AS (SELECT unnest(range(0, 8)) AS j), " +
        "p AS (SELECT vec_id, j, CAST(list_sum(list_transform(range(0, 64), i -> " +
        "CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) * " +
        s"(CASE WHEN (${graft.similarity.Similarity.fmix32("i * 4096 + j",
          (a, b) => s"xor(($a), ($b))", "//")}) % 2 = 0 THEN 1 ELSE -1 END))) AS BIGINT) AS coord_milli " +
        "FROM v CROSS JOIN js) " +
        "SELECT vec_id, CAST(j AS BIGINT) AS j, coord_milli FROM p ORDER BY vec_id, j"),
      "q_cube" -> ("SELECT coalesce(lang, '(all)') AS lang, coalesce(source, '(all)') AS source, " +
        "count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars FROM documents " +
        "GROUP BY CUBE (lang, source) ORDER BY lang, source"),
      "q_pivot" -> ("SELECT source, " +
        "count(*) FILTER (lang = 'de') AS de, count(*) FILTER (lang = 'en') AS en, " +
        "count(*) FILTER (lang = 'es') AS es, count(*) FILTER (lang = 'fr') AS fr, " +
        "count(*) FILTER (lang = 'zh') AS zh FROM documents GROUP BY source ORDER BY source"),
      "txt_oov" -> ("WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) AS token FROM documents), " +
        "v AS (SELECT token FROM (SELECT token, count(*) AS n FROM tok GROUP BY token ORDER BY n DESC, token LIMIT 15)) " +
        "SELECT doc_id, count(*) AS n_tokens, " +
        "count(*) FILTER (token NOT IN (SELECT token FROM v)) AS n_oov, " +
        "round(count(*) FILTER (token NOT IN (SELECT token FROM v)) / CAST(count(*) AS DOUBLE), 6) AS oov_rate " +
        "FROM tok GROUP BY doc_id ORDER BY doc_id"),
      // same portable regex subset (no backrefs/lookaround); DuckDB
      // regexp_replace needs the 'g' flag to match Spark's replace-all
      "txt_redact" -> ("WITH p AS (SELECT doc_id, text || ' contact user' || doc_id || '@example.com or 555-01' || doc_id || ' now' AS text FROM documents), " +
        "e AS (SELECT doc_id, text, regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+', '<EMAIL>', 'g') AS de_emailed FROM p) " +
        "SELECT doc_id, CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS BIGINT) AS n_emails, " +
        "CAST(len(regexp_extract_all(de_emailed, '[0-9][0-9][0-9]-[0-9][0-9]+')) AS BIGINT) AS n_phones, " +
        "substring(regexp_replace(de_emailed, '[0-9][0-9][0-9]-[0-9][0-9]+', '<PHONE>', 'g'), " +
        "len(regexp_replace(de_emailed, '[0-9][0-9][0-9]-[0-9][0-9]+', '<PHONE>', 'g')) - 39, 40) AS tail " +
        "FROM e ORDER BY doc_id"),
      "st_topk" -> ("WITH c AS (SELECT epoch_ms(date_trunc('hour', ts)) AS window_start, event_type, count(*) AS n_events FROM events GROUP BY 1, 2), " +
        "r AS (SELECT window_start, event_type, n_events, " +
        "row_number() OVER (PARTITION BY window_start ORDER BY n_events DESC, event_type) AS rank FROM c) " +
        "SELECT window_start, event_type, n_events, rank FROM r WHERE rank <= 2 ORDER BY window_start, rank"),
      // the store's t=2000 snapshot differs from t=1000 exactly by the
      // upsert that zeroed o_totalprice for o_orderkey < 50 (none of which
      // is 0 to begin with), so the diff is those keys, all 'changed'
      // replay of scd2Store's mutation script: v2 zeroes keys < 50 (a
      // no-op for rows already at 0 — diff cancels those) + 5 inserts;
      // v3 sets [20,30) to 999 (pre-v3 state there is ALWAYS 0) and
      // removes [100,200). Shared by kv_scd2 (full rebuild) and
      // kv_scd2_incr (materialize + two incremental refreshes) — same
      // truth, two maintenance paths
      "kv_scd2" -> scd2IntervalsOracle,
      "kv_scd2_incr" -> scd2IntervalsOracle,
      "kv_scd2_asof" -> ("WITH base AS (SELECT o_orderkey AS k, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "probes AS (SELECT k, v FROM (VALUES (1), (25), (150), (3000001), (9999999)) p(k) " +
        "CROSS JOIN (SELECT unnest(range(1, 4)) AS v)), " +
        "state AS (SELECT p.k, p.v, CASE WHEN p.k = 3000001 THEN " +
        "(CASE WHEN p.v >= 2 THEN 78 END) ELSE " +
        "(SELECT CASE WHEN p.v = 1 THEN b.cents " +
        "WHEN p.v = 2 THEN (CASE WHEN p.k < 50 THEN 0 ELSE b.cents END) " +
        "ELSE (CASE WHEN p.k >= 100 AND p.k < 200 THEN NULL " +
        "WHEN p.k >= 20 AND p.k < 30 THEN 999 " +
        "WHEN p.k < 50 THEN 0 ELSE b.cents END) END " +
        "FROM base b WHERE b.k = p.k) END AS cents FROM probes p) " +
        "SELECT CAST(k AS BIGINT) AS o_orderkey, CAST(v AS BIGINT) AS at_version, " +
        "CAST(cents AS BIGINT) AS cents FROM state ORDER BY o_orderkey, at_version"),
      "kv_scd2_asof_ix" -> ("WITH base AS (SELECT o_orderkey AS k, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "probes AS (SELECT k, v FROM (VALUES (1), (25), (150), (3000001), (9999999)) p(k) " +
        "CROSS JOIN (SELECT unnest(range(1, 4)) AS v)), " +
        "state AS (SELECT p.k, p.v, CASE WHEN p.k = 3000001 THEN " +
        "(CASE WHEN p.v >= 2 THEN 78 END) ELSE " +
        "(SELECT CASE WHEN p.v = 1 THEN b.cents " +
        "WHEN p.v = 2 THEN (CASE WHEN p.k < 50 THEN 0 ELSE b.cents END) " +
        "ELSE (CASE WHEN p.k >= 100 AND p.k < 200 THEN NULL " +
        "WHEN p.k >= 20 AND p.k < 30 THEN 999 " +
        "WHEN p.k < 50 THEN 0 ELSE b.cents END) END " +
        "FROM base b WHERE b.k = p.k) END AS cents FROM probes p) " +
        "SELECT CAST(k AS BIGINT) AS o_orderkey, CAST(v AS BIGINT) AS at_version, " +
        "CAST(cents AS BIGINT) AS cents FROM state ORDER BY o_orderkey, at_version"),
      "kv_diff" -> ("SELECT o_orderkey, 'changed' AS change, round(o_totalprice, 2) AS old_price, " +
        "0.0 AS new_price FROM orders WHERE o_orderkey < 50 AND o_totalprice <> 0 ORDER BY o_orderkey"),
      // same segmentation as the Spark side: lower, \s+ split, consecutive
      // 10-token slices; segments in >= 2 documents are boilerplate
      "dd_seg_dedup" -> ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "seg AS (SELECT doc_id, i AS pos, array_to_string(tk[i*10+1:i*10+10], ' ') AS seg " +
        "FROM d, unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) t(i) WHERE len(tk) > 0), " +
        "f AS (SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS df FROM seg GROUP BY seg) WHERE df >= 2) " +
        "SELECT doc_id, count(*) AS n_segs, " +
        "count(*) FILTER (seg IN (SELECT seg FROM f)) AS n_removed, " +
        "coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (seg NOT IN (SELECT seg FROM f)), '') AS cleaned " +
        "FROM seg GROUP BY doc_id ORDER BY doc_id"),
      // sliding 8-token windows (one per position); positions whose window
      // is in >= 2 docs survive; equal-width islands merge where the
      // position gap <= 8 (lag NULL at doc start -> ELSE branch -> new span)
      "dd_substring_spans" -> ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "g AS (SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+8], ' ') AS gram " +
        "FROM d, unnest(range(0, len(tk) - 7)) t(i) WHERE len(tk) >= 8), " +
        "f AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram) WHERE df >= 2), " +
        "p AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM f)), " +
        "i AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS brk FROM p), " +
        "j AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM i) " +
        "SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start, CAST(max(pos) + 8 AS INTEGER) AS span_end, " +
        "CAST(max(pos) - min(pos) + 8 AS INTEGER) AS span_tokens " +
        "FROM j GROUP BY doc_id, grp ORDER BY doc_id, span_start"),
      // spans as above, then every token whose position falls inside a
      // span of its doc is dropped and the survivors re-joined in order
      "dd_span_clean" -> ("WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "g AS (SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+8], ' ') AS gram " +
        "FROM d, unnest(range(0, len(tk) - 7)) t(i) WHERE len(tk) >= 8), " +
        "f AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram) WHERE df >= 2), " +
        "p AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM f)), " +
        "br AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS brk FROM p), " +
        "jj AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM br), " +
        "sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e FROM jj GROUP BY doc_id, grp), " +
        "tok AS (SELECT doc_id, i AS pos, tk[i+1] AS tok FROM d, unnest(range(0, len(tk))) u(i)), " +
        "keep AS (SELECT t.doc_id, t.pos, t.tok FROM tok t WHERE NOT EXISTS " +
        "(SELECT 1 FROM sp WHERE sp.doc_id = t.doc_id AND t.pos >= sp.s AND t.pos < sp.e)) " +
        "SELECT d.doc_id, CAST(len(d.tk) AS INTEGER) AS n_tokens, " +
        "CAST(len(d.tk) - count(k.tok) AS INTEGER) AS n_removed, " +
        "coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS cleaned " +
        "FROM d LEFT JOIN keep k ON d.doc_id = k.doc_id " +
        "GROUP BY d.doc_id, len(d.tk) ORDER BY d.doc_id"),
      "samp_weighted" -> ("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS checksum " +
        "FROM orders, (SELECT max(o_totalprice) AS mw FROM orders) m " +
        s"WHERE ${knuthHash("o_orderkey")} % 65536 < floor(65536.0 * o_totalprice / mw) " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
      // centroid = per-dimension avg cast to REAL (float) — same rounding
      // as the Spark side, so the cosines agree to the 4 dp compared
      "sim_centroid" -> ("WITH d AS (SELECT label, vec_id, generate_subscripts(embedding, 1) AS pos, " +
        "CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), " +
        "c AS (SELECT label, pos, CAST(CAST(avg(v) AS REAL) AS DOUBLE) AS c FROM d GROUP BY 1, 2), " +
        "s AS (SELECT d.label, d.vec_id, sum(d.v * c.c) AS dot, sum(d.v * d.v) AS na, sum(c.c * c.c) AS nb " +
        "FROM d JOIN c ON d.label = c.label AND d.pos = c.pos GROUP BY 1, 2), " +
        "x AS (SELECT label, vec_id, CASE WHEN na = 0 OR nb = 0 THEN 0 ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos_c FROM s) " +
        "SELECT label, count(*) AS n_vecs, round(avg(round(cos_c, 4)), 4) AS avg_cos, " +
        "round(min(cos_c), 4) AS min_cos FROM x GROUP BY label ORDER BY label"),
      "st_enrich" -> ("SELECT epoch_ms(date_trunc('hour', ts)) AS window_start, c_mktsegment AS segment, " +
        s"count(*) AS n_events, $centSum AS sum_value FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1, 2 ORDER BY window_start, segment"),
      // the oracle may nested-loop this freely; the Spark side must not
      "q_band_join" -> ("SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pairs, " +
        "CAST(sum(abs(epoch_ms(a.ts) - epoch_ms(b.ts))) AS BIGINT) AS sum_gap_ms " +
        "FROM events a JOIN events b ON a.event_id < b.event_id " +
        "AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 120000 " +
        "GROUP BY 1, 2 ORDER BY type_a, type_b"),
      "txt_len_hist" -> ("SELECT CAST(floor(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)) / 8) * 8 AS BIGINT) AS bucket_lo, " +
        "count(*) AS n_docs FROM documents GROUP BY 1 ORDER BY bucket_lo"),
      // the unrolled bit-interleave — pure integer math, replayed exactly
      "layout_zorder" -> ("SELECT event_id, " +
        s"CAST(${graft.operators.ZOrder.zSql("user_id", "(event_id % 65536)")} AS BIGINT) AS z " +
        "FROM events WHERE event_id < 200 ORDER BY event_id"),
      // round-trips must preserve content exactly — oracle reads the
      // ORIGINAL parquet, so any sink/source corruption breaks the hash
      "io_json_roundtrip" -> ("SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum, " +
        "CAST(sum(len(text)) AS BIGINT) AS text_len FROM documents"),
      "io_csv_roundtrip" -> ("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS checksum " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
      "kv_count_range" -> "SELECT count(*) AS n FROM orders WHERE o_orderkey >= 100 AND o_orderkey <= 5000",
      // survivors = complement of the deleted [150, 1200]; file count is a
      // layout invariant (1 untouched + 2 rewritten boundaries)
      "kv_range_delete" -> ("SELECT count(*) AS n, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS checksum, " +
        "(SELECT count(*) FROM orders WHERE o_orderkey >= 150 AND o_orderkey <= 1200) AS n_removed, " +
        "CAST(3 AS BIGINT) AS n_files " +
        "FROM orders WHERE o_orderkey < 150 OR o_orderkey > 1200"),
      "q_grouping_sets" -> ("SELECT coalesce(l_returnflag, '(all)') AS rf, " +
        "coalesce(l_linestatus, '(all)') AS ls, count(*) AS n, sum(l_quantity) AS sum_qty " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) " +
        "ORDER BY rf, ls"),
      "agg_arg_max" -> ("SELECT o_orderstatus, " +
        "max_by(o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 100000000 + o_orderkey) AS top_orderkey, " +
        "round(max_by(o_totalprice, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 100000000 + o_orderkey), 2) AS top_price " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
      "pipe_domain_cap" -> ("WITH r AS (SELECT source, doc_id, n_chars, " +
        "row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rk FROM documents) " +
        "SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum, " +
        "CAST(sum(n_chars) AS BIGINT) AS chars_sum FROM r WHERE rk <= 20 " +
        "GROUP BY source ORDER BY source"),
      "ts_anomaly" -> ("WITH b AS (SELECT user_id, CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS bin, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events WHERE user_id < 40 GROUP BY user_id, bin), " +
        "wn AS (SELECT user_id, bin, cents, " +
        "CAST(sum(cents) OVER tw AS BIGINT) AS s, " +
        "CAST(sum(cents * cents) OVER tw AS BIGINT) AS sq, " +
        "count(*) OVER tw AS n FROM b " +
        "WINDOW tw AS (PARTITION BY user_id ORDER BY bin ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id, bin, cents, " +
        "CAST(floor(1000000.0 * ((cents - CAST(s AS DOUBLE) / n) / " +
        "sqrt((sq - CAST(s AS DOUBLE) * s / n) / n))) AS BIGINT) AS z_micro " +
        "FROM wn WHERE n = 24 AND (sq - CAST(s AS DOUBLE) * s / n) / n > 0 " +
        "ORDER BY user_id, bin"),
      "ts_gapfill" -> ("WITH b AS (SELECT user_id, CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT) AS bin, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events WHERE user_id < 40 GROUP BY user_id, bin), " +
        "sp AS (SELECT user_id, unnest(range(lo, hi + 1)) AS bin " +
        "FROM (SELECT user_id, min(bin) AS lo, max(bin) AS hi FROM b GROUP BY user_id)), " +
        "j AS (SELECT sp.user_id, sp.bin, b.cents FROM sp LEFT JOIN b USING (user_id, bin)) " +
        "SELECT user_id, bin, " +
        "last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bin) AS filled_cents, " +
        "cents IS NULL AS was_gap FROM j ORDER BY user_id, bin"),
      "pipe_domain_mix" -> ("WITH c AS (SELECT source, count(*) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS size_sum FROM documents GROUP BY source) " +
        "SELECT source, n_docs, size_sum, " +
        "round(sqrt(size_sum) / sum(sqrt(size_sum)) OVER (), 6) AS weight " +
        "FROM c ORDER BY source"),
      "txt_novelty" -> ("WITH tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]))) AS gram FROM tk WHERE len(tk) >= 2), " +
        "df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram) " +
        "SELECT doc_id, count(*) AS n_bigrams, " +
        "count(CASE WHEN df = 1 THEN 1 END) AS n_novel, " +
        "round(count(CASE WHEN df = 1 THEN 1 END) / CAST(count(*) AS DOUBLE), 4) AS novelty " +
        "FROM g JOIN df USING (gram) GROUP BY doc_id ORDER BY doc_id"),
      "io_partition_prune" -> ("SELECT event_type, count(*) AS n, " +
        s"$centSum AS sum_value FROM events " +
        "WHERE event_type IN ('click', 'purchase') GROUP BY event_type ORDER BY event_type"),
      // dim filter score >= 2.0 keeps purchase (5.0) and signup (2.0)
      "io_dpp_join" -> ("SELECT event_type, count(*) AS n, " +
        s"$centSum AS sum_value FROM events " +
        "WHERE event_type IN ('purchase', 'signup') GROUP BY event_type ORDER BY event_type"),
      "pipe_token_budget" -> (s"WITH h AS (SELECT doc_id, n_chars, ${knuthHash("doc_id")} AS pos FROM documents), " +
        "r AS (SELECT n_chars, sum(n_chars) OVER (ORDER BY pos, doc_id) AS run FROM h) " +
        "SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars FROM r WHERE run <= 50000"),
      "layout_bucket_join" -> ("SELECT c_mktsegment, count(*) AS n, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
      "q_window_range" -> ("SELECT o_custkey, o_orderkey, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderkey RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_cents " +
        "FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey"),
      "q_multi_distinct" -> ("SELECT l_returnflag, count(DISTINCT l_partkey) AS d_parts, " +
        "count(DISTINCT l_suppkey) AS d_supps, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      "q_window_nav" -> ("SELECT o_custkey, o_orderkey, " +
        "coalesce(lag(o_orderkey, 1) OVER w, -1) AS prev_key, " +
        "coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key, " +
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
        "first_value(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS first_cents " +
        "FROM orders WHERE o_custkey < 50 " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"),
      "q_string_funcs" -> ("SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg, " +
        "CAST(length(trim(c_name)) AS BIGINT) AS trimmed_len, " +
        "lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded, " +
        "substring(c_name, 1, 8) AS prefix8, " +
        "regexp_extract(c_name, '([0-9]+)', 1) AS digits " +
        "FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey"),
      "agg_list_sorted" -> ("SELECT o_custkey, count(*) AS n, " +
        "string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys " +
        "FROM orders WHERE o_custkey <= 20 GROUP BY o_custkey ORDER BY o_custkey"),
      "q_outer_join" -> ("WITH pc AS (SELECT o_custkey, count(*) AS o_cnt FROM orders GROUP BY 1) " +
        "SELECT c_mktsegment, count(*) AS n_cust, count(o_cnt) AS with_orders, " +
        "CAST(coalesce(sum(o_cnt), 0) AS BIGINT) AS total_orders " +
        "FROM customer LEFT JOIN pc ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
      "io_orc_roundtrip" -> ("SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS checksum " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
      "kv_colocated_join" -> ("WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem GROUP BY 1) " +
        "SELECT count(*) AS n, CAST(sum(qty) AS BIGINT) AS qty_sum, " +
        "CAST(sum(CAST(floor((CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS price_sum " +
        "FROM orders JOIN li ON o_orderkey = l_orderkey"),
      "kv_corange_join" -> ("WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty, " +
        "count(*) AS n_lines FROM lineitem GROUP BY 1) " +
        "SELECT o_orderkey, o_custkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS price, " +
        "CAST(qty AS BIGINT) AS qty, n_lines " +
        "FROM orders JOIN li ON o_orderkey = l_orderkey " +
        "WHERE o_orderkey <= 200 ORDER BY o_orderkey"),
      "kv_corange_where" -> ("WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty, " +
        "count(*) AS n_lines FROM lineitem GROUP BY 1) " +
        "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price, " +
        "CAST(qty AS BIGINT) AS qty, n_lines " +
        "FROM orders JOIN li ON o_orderkey = l_orderkey " +
        "WHERE o_orderkey >= 100 AND o_orderkey <= 300 ORDER BY o_orderkey"),
      "kv_corange_agg" -> ("WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT o_orderkey, CAST(sum(qty) AS BIGINT) AS qty_sum, " +
        "CAST(sum(CAST(floor((CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents, " +
        "count(*) AS n " +
        "FROM orders JOIN li ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderkey HAVING o_orderkey <= 500 ORDER BY o_orderkey"),
      "kv_corange_left" -> ("WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty, " +
        "count(*) AS n_lines FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1) " +
        "SELECT o_orderkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS price, " +
        "CAST(qty AS BIGINT) AS qty, n_lines " +
        "FROM orders LEFT JOIN li ON o_orderkey = l_orderkey " +
        "WHERE o_orderkey <= 300 ORDER BY o_orderkey"),
      "kv_corange_anti" -> ("WITH li AS (SELECT l_orderkey FROM lineitem " +
        "WHERE l_orderkey % 2 = 1 GROUP BY 1) " +
        "SELECT o_orderkey, o_custkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS price " +
        "FROM orders WHERE NOT EXISTS (SELECT 1 FROM li WHERE li.l_orderkey = orders.o_orderkey) " +
        "AND o_orderkey <= 300 ORDER BY o_orderkey"),
      "kv_corange_semi" -> ("WITH li AS (SELECT l_orderkey FROM lineitem " +
        "WHERE l_orderkey % 2 = 1 GROUP BY 1) " +
        "SELECT o_orderkey, o_custkey, " +
        "round(CASE WHEN o_orderkey < 50 THEN 0.0 ELSE o_totalprice END, 2) AS price " +
        "FROM orders WHERE EXISTS (SELECT 1 FROM li WHERE li.l_orderkey = orders.o_orderkey) " +
        "AND o_orderkey <= 300 ORDER BY o_orderkey"),
      "kv_corange_right" -> ("WITH li AS (SELECT l_orderkey, sum(l_quantity) AS qty, " +
        "count(*) AS n_lines FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1), " +
        "o AS (SELECT o_orderkey, o_custkey, o_totalprice " +
        "FROM orders WHERE o_orderkey % 3 <> 0) " +
        "SELECT coalesce(li.l_orderkey, o.o_orderkey) AS l_orderkey, " +
        "CAST(li.qty AS BIGINT) AS qty, li.n_lines, o.o_custkey, " +
        "round(o.o_totalprice, 2) AS price " +
        "FROM li RIGHT JOIN o ON li.l_orderkey = o.o_orderkey " +
        "WHERE coalesce(li.l_orderkey, o.o_orderkey) <= 300 " +
        "ORDER BY coalesce(li.l_orderkey, o.o_orderkey)"),
      "kv_corange_prefix" -> ("WITH li AS (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT l.l_orderkey, l.l_linenumber, CAST(l.qty AS BIGINT) AS qty, " +
        "o.o_custkey " +
        "FROM li l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "WHERE l.l_orderkey <= 500 AND o.o_orderkey % 3 <> 0 " +
        "ORDER BY l.l_orderkey, l.l_linenumber"),
      "kv_corange_asof" -> ("WITH lines AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2), " +
        "probe AS MATERIALIZED (SELECT l_orderkey, CAST(max(l_linenumber) - 1 AS INT) AS probe_ln, " +
        "count(*) AS n_lines FROM lineitem GROUP BY 1), " +
        "j AS (SELECT p.l_orderkey, p.probe_ln, p.n_lines, x.l_linenumber AS asof_ln, " +
        "CAST(x.qty AS BIGINT) AS qty, " +
        "row_number() OVER (PARTITION BY p.l_orderkey ORDER BY x.l_linenumber DESC NULLS LAST) AS rn " +
        "FROM probe p LEFT JOIN lines x ON x.l_orderkey = p.l_orderkey " +
        "AND x.l_linenumber <= p.probe_ln WHERE p.l_orderkey <= 400) " +
        "SELECT l_orderkey, probe_ln, n_lines, asof_ln, qty FROM j WHERE rn = 1 " +
        "ORDER BY l_orderkey"),
      "kv_corange_asof_tol" -> ("WITH lines AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2), " +
        "probe AS MATERIALIZED (SELECT l_orderkey, CAST(max(l_linenumber) - 1 AS INT) AS probe_ln, " +
        "count(*) AS n_lines FROM lineitem GROUP BY 1), " +
        "j AS (SELECT p.l_orderkey, p.probe_ln, p.n_lines, x.l_linenumber AS asof_ln, " +
        "CAST(x.qty AS BIGINT) AS qty, " +
        "row_number() OVER (PARTITION BY p.l_orderkey ORDER BY x.l_linenumber DESC) AS rn " +
        "FROM probe p JOIN lines x ON x.l_orderkey = p.l_orderkey " +
        "AND x.l_linenumber < p.probe_ln AND p.probe_ln - x.l_linenumber <= 2 " +
        "WHERE p.l_orderkey <= 400) " +
        "SELECT l_orderkey, probe_ln, n_lines, asof_ln, qty FROM j WHERE rn = 1 " +
        "ORDER BY l_orderkey"),
      "kv_corange_prefix_api" -> ("WITH li AS (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT l.l_orderkey, l.l_linenumber, CAST(l.qty AS BIGINT) AS qty, " +
        "o.o_custkey, round(o.o_totalprice, 2) AS price " +
        "FROM li l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "WHERE l.l_orderkey <= 500 AND o.o_orderkey % 3 <> 0 " +
        "ORDER BY l.l_orderkey, l.l_linenumber"),
      "kv_corange_asof_ts" -> ("WITH rd AS MATERIALIZED (SELECT user_id, ts, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "pr AS MATERIALIZED (SELECT user_id, max(ts) - INTERVAL 30 MINUTE AS pts " +
        "FROM events GROUP BY 1), " +
        "j AS (SELECT p.user_id, epoch_ms(p.pts) AS probe_ms, epoch_ms(x.ts) AS asof_ms, " +
        "x.cnt, x.cents, " +
        "row_number() OVER (PARTITION BY p.user_id ORDER BY x.ts DESC NULLS LAST) AS rn " +
        "FROM pr p LEFT JOIN rd x ON x.user_id = p.user_id AND x.ts <= p.pts " +
        "AND x.ts >= p.pts - INTERVAL 10 MINUTE) " +
        "SELECT user_id, probe_ms, asof_ms, cnt, cents FROM j WHERE rn = 1 " +
        "ORDER BY user_id"),
      "st_asof_enrich" -> ("WITH rd AS MATERIALIZED (SELECT user_id, ts, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "pr AS MATERIALIZED (SELECT event_id, user_id, ts FROM events WHERE event_id % 7 = 0), " +
        "j AS (SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS probe_ms, " +
        "epoch_ms(x.ts) AS asof_ms, x.cnt, x.cents, " +
        "row_number() OVER (PARTITION BY p.event_id ORDER BY x.ts DESC NULLS LAST) AS rn " +
        "FROM pr p LEFT JOIN rd x ON x.user_id = p.user_id AND x.ts < p.ts " +
        "AND x.ts >= p.ts - INTERVAL 30 MINUTE) " +
        "SELECT event_id, user_id, probe_ms, asof_ms, cnt, cents FROM j WHERE rn = 1 " +
        "ORDER BY event_id"),
      "kv_probe_join" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2), " +
        "p AS (SELECT o_orderkey AS k, o_custkey FROM orders WHERE o_orderkey % 5 = 0) " +
        "SELECT p.k, p.o_custkey, li.l_linenumber, CAST(li.qty AS BIGINT) AS qty " +
        "FROM p LEFT JOIN li ON li.l_orderkey = p.k " +
        "ORDER BY p.k, li.l_linenumber NULLS FIRST"),
      "kv_sql_asof" -> ("WITH lines AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2), " +
        "probe AS MATERIALIZED (SELECT l_orderkey, CAST(max(l_linenumber) - 1 AS INT) AS probe_ln, " +
        "count(*) AS n_lines FROM lineitem GROUP BY 1), " +
        "j AS (SELECT p.l_orderkey, p.probe_ln, p.n_lines, x.l_linenumber AS asof_ln, " +
        "CAST(x.qty AS BIGINT) AS qty, " +
        "row_number() OVER (PARTITION BY p.l_orderkey, p.probe_ln " +
        "ORDER BY x.l_linenumber DESC NULLS LAST) AS rn " +
        "FROM probe p LEFT JOIN lines x ON x.l_orderkey = p.l_orderkey " +
        "AND x.l_linenumber <= p.probe_ln) " +
        "SELECT l_orderkey, probe_ln, n_lines, asof_ln, qty FROM j " +
        "WHERE rn = 1 AND l_orderkey <= 400 ORDER BY l_orderkey"),
      "kv_sql_asof_tol" -> ("WITH rd AS MATERIALIZED (SELECT user_id, ts, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "pr AS MATERIALIZED (SELECT user_id, max(ts) - INTERVAL 30 MINUTE AS pts " +
        "FROM events GROUP BY 1), " +
        "j AS (SELECT p.user_id, epoch_ms(p.pts) AS probe_ms, epoch_ms(x.ts) AS asof_ms, " +
        "x.cnt, x.cents, " +
        "row_number() OVER (PARTITION BY p.user_id ORDER BY x.ts DESC NULLS LAST) AS rn " +
        "FROM pr p LEFT JOIN rd x ON x.user_id = p.user_id AND x.ts <= p.pts " +
        "AND x.ts >= p.pts - INTERVAL 10 MINUTE) " +
        "SELECT user_id, probe_ms, asof_ms, cnt, cents FROM j WHERE rn = 1 " +
        "ORDER BY user_id"),
      "st_probe_enrich" -> ("WITH rd AS MATERIALIZED (SELECT user_id, ts, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "pr AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 23 = 0) " +
        "SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, r.cnt, r.cents " +
        "FROM pr p LEFT JOIN rd r ON r.user_id = p.user_id AND r.ts = p.ts " +
        "ORDER BY p.event_id"),
      "kv_sql_asof_probe" -> ("WITH rd AS MATERIALIZED (SELECT user_id, ts, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "pr AS (SELECT user_id, max(ts) AS pts FROM events GROUP BY 1), " +
        "j AS (SELECT p.user_id, epoch_ms(p.pts) AS pts_ms, epoch_ms(r.ts) AS asof_ms, " +
        "r.cnt, r.cents, " +
        "row_number() OVER (PARTITION BY p.user_id ORDER BY r.ts DESC NULLS LAST) AS rn " +
        "FROM pr p LEFT JOIN rd r ON r.user_id = p.user_id AND r.ts <= p.pts) " +
        "SELECT user_id, pts_ms, asof_ms, cnt, cents FROM j WHERE rn = 1 " +
        "ORDER BY user_id"),
      "kv_sql_asof_distinct" -> ("WITH rd AS MATERIALIZED (SELECT user_id, ts, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "pr AS (SELECT DISTINCT user_id, ts - INTERVAL 30 MINUTE AS pts FROM events), " +
        "j AS (SELECT p.user_id, epoch_ms(p.pts) AS pts_ms, epoch_ms(r.ts) AS asof_ms, " +
        "r.cnt, r.cents, " +
        "row_number() OVER (PARTITION BY p.user_id, p.pts ORDER BY r.ts DESC NULLS LAST) AS rn " +
        "FROM pr p LEFT JOIN rd r ON r.user_id = p.user_id AND r.ts <= p.pts) " +
        "SELECT user_id, pts_ms, asof_ms, cnt, cents FROM j WHERE rn = 1 " +
        "ORDER BY user_id, pts_ms"),
      "kv_sql_probe_join" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2), " +
        "p AS (SELECT o_orderkey AS k, o_custkey FROM orders WHERE o_orderkey % 5 = 0) " +
        "SELECT p.k, p.o_custkey, li.l_linenumber, CAST(li.qty AS BIGINT) AS qty " +
        "FROM p LEFT JOIN li ON li.l_orderkey = p.k " +
        "ORDER BY p.k, li.l_linenumber NULLS FIRST"),
      "kv_sql_probe_prune" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2), " +
        "p AS (SELECT o_orderkey AS k, o_custkey FROM orders " +
        "WHERE o_orderkey % 5 = 0 AND o_orderkey <= 200) " +
        "SELECT p.k, p.o_custkey, li.l_linenumber, CAST(li.qty AS BIGINT) AS qty " +
        "FROM p LEFT JOIN li ON li.l_orderkey = p.k " +
        "ORDER BY p.k, li.l_linenumber NULLS FIRST"),
      "kv_sql_prefix_agg" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT l_orderkey, count(*) AS n, CAST(sum(qty) AS BIGINT) AS q " +
        "FROM li GROUP BY l_orderkey ORDER BY l_orderkey"),
      "kv_sql_window_prefix" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT l_orderkey, l_linenumber, rn, CAST(run_qty AS BIGINT) AS run_qty FROM (" +
        "SELECT l_orderkey, l_linenumber, " +
        "row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn, " +
        "sum(qty) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber " +
        "ROWS UNBOUNDED PRECEDING) AS run_qty FROM li) " +
        "WHERE l_orderkey <= 500 ORDER BY l_orderkey, l_linenumber"),
      "kv_sql_view_prefix" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT l_orderkey, count(*) AS n, CAST(sum(qty) AS BIGINT) AS q " +
        "FROM li GROUP BY l_orderkey ORDER BY l_orderkey"),
      "kv_sql_topk" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "CAST(sum(l_quantity) AS BIGINT) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT * FROM (SELECT 'head' AS tag, l_orderkey, l_linenumber, qty " +
        "FROM li ORDER BY l_orderkey, l_linenumber LIMIT 50) " +
        "UNION ALL " +
        "SELECT * FROM (SELECT 'tail' AS tag, l_orderkey, l_linenumber, qty " +
        "FROM li ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 50)"),
      "kv_sql_topk_where" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "CAST(sum(l_quantity) AS BIGINT) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT * FROM (SELECT 'head' AS tag, l_orderkey, l_linenumber, qty " +
        "FROM li WHERE qty % 7 = 0 ORDER BY l_orderkey, l_linenumber LIMIT 50) " +
        "UNION ALL " +
        "SELECT * FROM (SELECT 'tail' AS tag, l_orderkey, l_linenumber, qty " +
        "FROM li WHERE qty % 7 = 0 ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 50)"),
      "kv_sql_keyset_page" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "CAST(sum(l_quantity) AS BIGINT) AS qty FROM lineitem GROUP BY 1, 2), " +
        "p1 AS (SELECT * FROM li WHERE l_orderkey > 0 " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 40), " +
        "p2 AS (SELECT * FROM li WHERE l_orderkey > (SELECT max(l_orderkey) FROM p1) " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 40), " +
        "p3 AS (SELECT * FROM li WHERE l_orderkey > (SELECT max(l_orderkey) FROM p2) " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 40) " +
        "SELECT 1 AS page, l_orderkey, l_linenumber, qty FROM p1 " +
        "UNION ALL SELECT 2 AS page, l_orderkey, l_linenumber, qty FROM p2 " +
        "UNION ALL SELECT 3 AS page, l_orderkey, l_linenumber, qty FROM p3"),
      "kv_sql_count_prefix" -> ("WITH li AS MATERIALIZED (SELECT l_orderkey, l_linenumber, " +
        "sum(l_quantity) AS qty FROM lineitem GROUP BY 1, 2) " +
        "SELECT count(*) AS n, min(l_linenumber) AS mn, max(l_linenumber) AS mx, " +
        "min(l_orderkey) AS okmn FROM li " +
        "WHERE l_orderkey = 34 AND l_linenumber >= 2 AND l_linenumber <= 5"),
      "kv_sql_asof_date" -> ("WITH rd AS MATERIALIZED (SELECT o_custkey, " +
        "CAST(o_orderdate AS DATE) AS rd, count(*) AS n_ord, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM orders GROUP BY 1, 2), " +
        "pr AS MATERIALIZED (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) - 7 AS pd " +
        "FROM orders GROUP BY 1), " +
        "j AS (SELECT p.o_custkey, p.pd, x.rd AS asof_d, x.n_ord, x.cents, " +
        "row_number() OVER (PARTITION BY p.o_custkey, p.pd " +
        "ORDER BY x.rd DESC NULLS LAST) AS rn " +
        "FROM pr p LEFT JOIN rd x ON x.o_custkey = p.o_custkey " +
        "AND x.rd <= p.pd AND x.rd >= p.pd - 30) " +
        "SELECT o_custkey, datediff('day', DATE '1970-01-01', pd) AS pd_day, " +
        "datediff('day', DATE '1970-01-01', asof_d) AS asof_day, n_ord, cents " +
        "FROM j WHERE rn = 1 ORDER BY o_custkey"),
      "kv_asof_probe" -> ("WITH rd AS MATERIALIZED (SELECT user_id, ts, count(*) AS cnt, " +
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "pr AS MATERIALIZED (SELECT event_id, user_id, ts FROM events WHERE event_id % 7 = 0), " +
        "j AS (SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS probe_ms, " +
        "epoch_ms(x.ts) AS asof_ms, x.cnt, x.cents, " +
        "row_number() OVER (PARTITION BY p.event_id ORDER BY x.ts DESC NULLS LAST) AS rn " +
        "FROM pr p LEFT JOIN rd x ON x.user_id = p.user_id AND x.ts < p.ts " +
        "AND x.ts >= p.ts - INTERVAL 30 MINUTE) " +
        "SELECT event_id, user_id, probe_ms, asof_ms, cnt, cents FROM j WHERE rn = 1 " +
        "ORDER BY event_id"),
      "kv_corange_full" -> ("WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice " +
        "FROM orders WHERE o_orderkey % 3 <> 0), " +
        "li AS (SELECT l_orderkey, sum(l_quantity) AS qty, count(*) AS n_lines " +
        "FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1) " +
        "SELECT coalesce(o.o_orderkey, li.l_orderkey) AS o_orderkey, o.o_custkey, " +
        "round(o.o_totalprice, 2) AS price, " +
        "CAST(li.qty AS BIGINT) AS qty, li.n_lines " +
        "FROM o FULL JOIN li ON o.o_orderkey = li.l_orderkey " +
        "WHERE coalesce(o.o_orderkey, li.l_orderkey) <= 300 " +
        "ORDER BY coalesce(o.o_orderkey, li.l_orderkey)"),
      "q_topk_group" -> ("WITH r AS (SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS price, " +
        "row_number() OVER (PARTITION BY o_orderstatus ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rn " +
        "FROM orders) SELECT o_orderstatus, o_orderkey, price, CAST(rn AS BIGINT) AS rn " +
        "FROM r WHERE rn <= 3 ORDER BY o_orderstatus, rn"),
      "q_datetime" -> ("SELECT event_id, CAST(extract(year FROM ts) AS BIGINT) AS y, " +
        "CAST(extract(month FROM ts) AS BIGINT) AS mo, " +
        "CAST(extract(day FROM ts) AS BIGINT) AS dom, " +
        "CAST(extract(isodow FROM ts) AS BIGINT) AS isodow, " +
        "epoch_ms(date_trunc('week', ts)) AS week_start_ms, " +
        "CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since " +
        "FROM events WHERE event_id < 100 ORDER BY event_id"),
      // same double-precision UNNEST cosine as sim_topk; the range filter
      // compares the ROUNDED cosine on both engines
      "sim_range_query" -> ("WITH q AS (SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0), " +
        "e AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i FROM embeddings), " +
        "s AS (SELECT e.vec_id, SUM(CAST(e.v AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS dot, " +
        "SUM(CAST(e.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS na, SUM(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS nb " +
        "FROM e JOIN q USING (i) GROUP BY e.vec_id) " +
        "SELECT vec_id, round(dot/(sqrt(na)*sqrt(nb)), 4) AS cosine FROM s " +
        "WHERE round(dot/(sqrt(na)*sqrt(nb)), 4) >= 0.3 ORDER BY vec_id"),
      // entity resolution: the full pipeline replicated — planted dirty
      // variants, two-pass blocking (key index AND value, like the Spark
      // join) incl. the hot-block cap, match predicate, and FULL
      // transitive closure (recursive reachability; min-id labels), so
      // accidental chains at larger SFs label identically on both engines
      "er_resolve" -> (ErLabelCtes + " " +
        "SELECT coalesce(lab.entity, r.c_custkey) AS entity, " +
        "count(*) AS n_members, " +
        "min_by(r.c_name, r.c_custkey) AS name, max(r.c_acctbal) AS best_bal " +
        "FROM allr r LEFT JOIN lab ON lab.id = r.c_custkey " +
        "GROUP BY 1 ORDER BY entity"),
      // golden-record survivorship, rule-for-rule: newest = argmax by
      // (version, value), longest = argmax by (length, value),
      // most-frequent = argmax by (count, value) — all greater-value
      // tie-breaks, replicated as windowed row_number picks
      "er_golden" -> (ErLabelCtes + ", " +
        "gold AS (SELECT r.c_custkey, r.c_name, r.c_acctbal, r.c_mktsegment, " +
        "coalesce(lab.entity, r.c_custkey) AS entity " +
        "FROM allr r LEFT JOIN lab ON lab.id = r.c_custkey), " +
        "gn AS (SELECT entity, c_name, row_number() OVER (PARTITION BY entity " +
        "ORDER BY length(c_name) DESC, c_name DESC) AS rn FROM gold), " +
        "gb AS (SELECT entity, c_acctbal, row_number() OVER (PARTITION BY entity " +
        "ORDER BY c_custkey DESC, c_acctbal DESC) AS rn FROM gold), " +
        "gs AS (SELECT entity, c_mktsegment, row_number() OVER (PARTITION BY entity " +
        "ORDER BY cnt DESC, c_mktsegment DESC) AS rn FROM " +
        "(SELECT entity, c_mktsegment, count(*) AS cnt FROM gold GROUP BY 1, 2)), " +
        "cnts AS (SELECT entity, count(*) AS n_members FROM gold GROUP BY 1) " +
        "SELECT cnts.entity AS entity, cnts.n_members, gb.c_acctbal, gn.c_name, gs.c_mktsegment " +
        "FROM cnts " +
        "JOIN gn ON gn.entity = cnts.entity AND gn.rn = 1 " +
        "JOIN gb ON gb.entity = cnts.entity AND gb.rn = 1 " +
        "JOIN gs ON gs.entity = cnts.entity AND gs.rn = 1 " +
        "ORDER BY cnts.entity"),
      "dd_edit_pairs" -> ("SELECT a.doc_id AS idA, b.doc_id AS idB, " +
        "CAST(levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) AS BIGINT) AS edit_dist " +
        "FROM documents a JOIN documents b ON a.doc_id < b.doc_id " +
        "WHERE a.doc_id < 30 AND b.doc_id < 30 " +
        "AND levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) <= 25 " +
        "ORDER BY idA, idB"),
      "agg_stats" -> ("SELECT l_returnflag, " +
        "round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr, " +
        "round(stddev_samp(l_discount), 4) AS disc_sd, " +
        "round(var_samp(l_tax), 4) AS tax_var, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      "q_corr_scalar" -> ("SELECT count(*) AS n, CAST(sum(cents) AS DOUBLE) / 100.0 AS big_total FROM (" +
        "SELECT o.o_orderkey, CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents " +
        "FROM orders o " +
        "WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) * " +
        "(SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey) > " +
        "2 * (SELECT sum(CAST(floor(i.o_totalprice * 100 + 0.5) AS BIGINT)) " +
        "FROM orders i WHERE i.o_custkey = o.o_custkey))")
    )
  }
}
