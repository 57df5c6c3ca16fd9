package graft.sources

import java.util.{Map => JMap}

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter, InsertableRelation, StreamSinkProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{Command, FsSnapshotStore, GraftError, GraftException, KVIndex, KeyOrd, SnapshotManifest, SnapshotStore}

/** DataSource V2 surface for snapshot indexes: `spark.read.format("graft")
  * .option("root", storeRoot).load(indexId)` opens LATEST (or
  * `.option("version", n)` for time travel) as a first-class table — the
  * catalog-facing twin of the library's `KVIndex.open`, the way the
  * reference's embedded `QueryableIndex` would look to a SQL engine
  * (reference `QueryableIndex.scala:18-40`).
  *
  * Scale path: filter pushdown on the LEADING key column prunes the
  * manifest to covering files BEFORE any scan is planned — against a
  * filelist-checkpointed big manifest the prune itself runs Spark-side
  * ([[graft.core.SnapshotStore.resolveFilesWhere]]), so a point predicate
  * over a 3M-file snapshot materializes a handful of entries and scans one
  * file. Column pruning reaches the parquet scan through the same pruned
  * read. Execution delegates to the store's parquet read via the V1Scan
  * bridge (the Delta-lake deployment shape): pruning and pushdown are
  * decided here, while the actual scan keeps Spark's vectorized,
  * codegen'd parquet path — no hand-rolled reader to maintain.
  *
  * Ordered/stitched SQL reads stay on [[graft.core.KVIndex.createOrReplaceView]]
  * (its declared-ordering + prune rules): the V1 bridge does not carry an
  * ordering contract, and claiming one the RDD does not guarantee could
  * elide a sort Catalyst actually needs.
  */
final class GraftDataSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider with StreamSinkProvider with StreamSourceProvider {

  override def shortName(): String = "graft"

  /** `spark.readStream.format("graft")` — a CDC stream over the snapshot
    * history; see [[GraftChangeSource]].
    */
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val opts = new CaseInsensitiveStringMap(parameters.asJava)
    val (store, indexId) = storeAndId(opts)
    (shortName(), new GraftChangeSource(store, indexId).schema)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val opts = new CaseInsensitiveStringMap(parameters.asJava)
    val (store, indexId) = storeAndId(opts)
    new GraftChangeSource(store, indexId)
  }

  private def storeAndId(options: CaseInsensitiveStringMap): (FsSnapshotStore, String) = {
    val root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        "graft: set .option(\"root\", <store root>)"))
    val id = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft: pass the index id to load(...)/save(...)"))
    (new FsSnapshotStore(root, SparkSession.active), id)
  }

  private def resolve(options: CaseInsensitiveStringMap): GraftTable = {
    val (store, id) = storeAndId(options)
    val manifest = Option(options.get("version")) match {
      case Some(v) => store.loadVersionLazy(id, v.toLong)
      case None => store.loadLatestLazy(id).fold(
        e => throw new java.util.NoSuchElementException(e.message), identity)
    }
    new GraftTable(store, manifest)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (store, id) = storeAndId(options)
    if (store.exists(id)) resolve(options)
    else new GraftNewIndexTable(store, id, schema, options) // write-creates it
  }

  // external metadata = the incoming batch's schema on a write that
  // CREATES the index; reads of an existing index always resolve the
  // manifest schema via inferSchema
  override def supportsExternalMetadata(): Boolean = true

  /** `df.write.format("graft")` — the DataFrameWriter.save path.
    * A MISSING index is bootstrapped from the batch (requires
    * `.option("keys", "col1[,col2,...]")` — a DataFrame write that
    * CREATES a snapshot index). An existing index takes `Append` as one
    * `Command.Insert` batch through [[graft.core.KVIndex.executeWithRetry]]
    * (`.option("upsert", "true")` for upsert semantics), refuses
    * `Overwrite` (a versioned COW store replaces content with a NEW
    * version — `removeRange` + insert — never by destroying one), and
    * honors `ErrorIfExists`/`Ignore` literally.
    */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val opts = new CaseInsensitiveStringMap(parameters.asJava)
    val (store, id) = storeAndId(opts)
    if (!store.exists(id)) {
      val keys = Option(opts.get("keys")).map(_.split(",").map(_.trim).toSeq)
        .getOrElse(throw new IllegalArgumentException(
          s"graft: creating index '$id' needs .option(\"keys\", \"col1[,col2,...]\")"))
      KVIndex.bootstrap(store, id, data, keys)
        .fold(e => throw GraftException(e), identity)
    } else mode match {
      case SaveMode.Append =>
        val r = KVIndex.executeWithRetry(store, id,
          Seq(Command.Insert(data, upsert = opts.getBoolean("upsert", false))))
        if (!r.success) throw GraftException(r.error.get)
      case SaveMode.Overwrite => throw new UnsupportedOperationException(
        "graft: overwrite is not supported — commit a new version " +
          "(removeRange + insert) or bootstrap a fresh index instead")
      case SaveMode.ErrorIfExists =>
        throw GraftException(GraftError.IndexAlreadyExists(id))
      case SaveMode.Ignore => ()
    }
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = store.emptyTyped(
        store.loadLatestLazy(id).fold(e => throw GraftException(e), identity)).schema
    }
  }

  /** `df.writeStream.format("graft")` — each micro-batch commits ONE COW
    * snapshot version (upsert semantics), the same per-batch protocol as
    * `EventStreams.streamIntoIndex`, with `recordHistory=true` so time
    * travel sees every batch. A missing index bootstraps from the first
    * non-empty batch (`keys` option). Batch REPLAY after a crash is
    * detected via the committed `lastChangeVersion` (the batch id IS the
    * transaction id) and skipped — exactly-once versions, not just
    * idempotent content. Concurrent non-stream writers are tolerated:
    * a lost commit CAS re-opens LATEST and retries.
    */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft: partitionBy is not supported — snapshots are range-laid by key")
    val opts = new CaseInsensitiveStringMap(parameters.asJava)
    // NOT named `id`: Spark 4's Table interface ships a `default String
    // id()` (null), and inside a Table subclass an inherited member
    // SHADOWS an enclosing-scope local — a captured `id` silently reads
    // null (Sink extends Table)
    val (store, indexId) = storeAndId(opts)
    val keys = Option(opts.get("keys")).map(_.split(",").map(_.trim).toSeq)
    val upsert = opts.getBoolean("upsert", true)
    new Sink {
      override def name(): String = s"graft.$indexId@sink"
      override def addBatch(batchId: Long, data: org.apache.spark.sql.Dataset[Row]): Unit = {
        val tx = s"stream-batch-$batchId"
        // the incoming frame still carries the streaming source — rewrap
        // as a plain batch before running the multi-pass write protocol
        val batch = org.apache.spark.sql.graft.Shim.asBatch(data.toDF())
        if (!batch.isEmpty) {
          if (!store.exists(indexId)) {
            val k = keys.getOrElse(throw new IllegalArgumentException(
              s"graft: creating index '$indexId' needs .option(\"keys\", \"col1[,col2,...]\")"))
            KVIndex.bootstrap(store, indexId, batch, k, txVersion = tx, recordHistory = true)
              .fold(e => throw GraftException(e), identity)
            ()
          } else if (store.loadLatestLazy(indexId)
              .fold(e => throw GraftException(e), identity).lastChangeVersion == tx) {
            () // replayed batch: its version already committed
          } else {
            val r = KVIndex.executeWithRetry(store, indexId,
              Seq(Command.Insert(batch, upsert = upsert)),
              recordHistory = true, txVersion = tx)
            if (!r.success) throw GraftException(r.error.get)
          }
        }
      }
    }
  }
}

final class GraftTable(store: SnapshotStore, manifest: SnapshotManifest)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft.${manifest.id}@v${manifest.version}"

  override def schema(): StructType = store.emptyTyped(manifest).schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(store, manifest, schema())

  /** Append = one `Command.Insert` batch committed through
    * [[graft.core.KVIndex.executeWithRetry]], so concurrent format-level
    * writers serialize behind the commit CAS instead of failing.
    * `.option("upsert", "true")` makes it an upsert; duplicate keys
    * without it surface the library's typed error. Overwrite is
    * deliberately unsupported — a versioned COW store replaces content
    * with a NEW version (`removeRange` + insert, or a fresh bootstrap),
    * never by destroying one.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwrite) throw new UnsupportedOperationException(
                "graft: overwrite is not supported — commit a new version " +
                  "(removeRange + insert) or bootstrap a fresh index instead")
              val upsert = info.options.getBoolean("upsert", false)
              val r = KVIndex.executeWithRetry(store, manifest.id,
                Seq(Command.Insert(data, upsert = upsert)))
              if (!r.success) throw GraftException(r.error.get)
            }
          }
      }
    }
}

/** A not-yet-existing index id: the first written batch BOOTSTRAPS the
  * index (`.option("keys", "col1[,col2,...]")` names the key columns) —
  * `df.write.format("graft")` as index creation.
  */
final class GraftNewIndexTable(store: SnapshotStore, indexId: String,
                               writeSchema: StructType,
                               options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {

  override def name(): String = s"graft.$indexId@new"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val keysOpt = Option(info.options.get("keys"))
                .orElse(Option(options.get("keys")))
              val keys = keysOpt.map(_.split(",").map(_.trim).toSeq)
                .getOrElse(throw new IllegalArgumentException(
                  s"graft: creating index '$indexId' needs .option(\"keys\", \"col1[,col2,...]\")"))
              KVIndex.bootstrap(store, indexId, data, keys)
                .fold(e => throw GraftException(e), identity)
              ()
            }
          }
      }
    }
}

/** Collects leading-key bounds from pushed filters (for the manifest file
  * prune) and the required column set (for the parquet projection). Every
  * filter is also RETURNED as residual — file-level pruning is
  * conservative, so Spark re-evaluates exact predicates above the scan;
  * the same predicates are additionally applied inside the pruned read,
  * where Catalyst pushes them into parquet row-group stats.
  */
final class GraftScanBuilder(store: SnapshotStore, manifest: SnapshotManifest,
                             fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val keyCol = manifest.keyCols.head
  private var usable: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    usable = filters.filter(f => GraftScan.boundsOf(f, keyCol).isDefined)
    filters // all residual: the file prune is conservative by design
  }

  override def pushedFilters(): Array[Filter] = usable

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftScan(store, manifest, keyCol, usable, required)
}

final class GraftScan(store: SnapshotStore, manifest: SnapshotManifest,
                      keyCol: String, filters: Array[Filter],
                      required: StructType)
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = required

  // intersect all bounds; None = unbounded on that side
  private lazy val bounds = filters.flatMap(GraftScan.boundsOf(_, keyCol))
  private lazy val lo = bounds.flatMap(_._1).reduceOption(KeyOrd.max(_, _))
  private lazy val hi = bounds.flatMap(_._2).reduceOption(KeyOrd.min(_, _))

  // compare LEADING components only: on composite keys a full-tuple
  // compare would drop a file whose leading key equals the bound
  // (prefix convention ranks the longer tuple above its prefix)
  private lazy val covering = {
    val c = store.resolveFilesWhere(manifest, f =>
      lo.forall(l => KeyOrd.compare(Seq(f.max.head), l) >= 0) &&
        hi.forall(h => KeyOrd.compare(Seq(f.min.head), h) <= 0))
    GraftScan.lastPlannedFiles = c.size
    c
  }

  /** Post-pushdown stats from MANIFEST metadata, no scan: the unfiltered
    * row count is the O(1) `numElements`, a bounded scan sums the pruned
    * covering files' entry counts — so Catalyst's join-strategy sizing
    * (broadcast-vs-shuffle) sees a snapshot like a well-analyzed table.
    */
  override def estimateStatistics(): Statistics = {
    val rows =
      if (bounds.isEmpty) manifest.numElements
      else covering.map(_.rows).sum
    new Statistics {
      override def sizeInBytes: OptionalLong =
        OptionalLong.of(math.max(1L, rows) * math.max(8, required.defaultSize))
      override def numRows: OptionalLong = OptionalLong.of(rows)
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def needConversion: Boolean = true
      override def buildScan(): RDD[Row] = {
        val base =
          if (covering.isEmpty) store.emptyTyped(manifest)
          else store.readFiles(covering.map(_.path), manifest)
        // re-apply the bound predicates INSIDE the read so parquet
        // row-group stats skip within the kept files too
        val keyed = (lo.map(l => col(keyCol) >= l.head) ++
          hi.map(h => col(keyCol) <= h.head))
          .foldLeft(base)((d, p) => d.filter(p))
        val cols = required.fieldNames
        (if (cols.isEmpty) keyed else keyed.select(cols.map(col).toSeq: _*)).rdd
      }
    }.asInstanceOf[T]
}

object GraftScan {
  /** Covering-file count of the most recent scan planning on this driver —
    * plan-shape telemetry (the V1 bridge hides the inner parquet scan's
    * metrics from the outer plan, so tests pin pruning through this).
    */
  @volatile var lastPlannedFiles: Int = -1

  /** (lo, hi) INCLUSIVE over-approximation of a filter on the leading key
    * column; None = the filter does not constrain that side. Returns None
    * overall when the filter cannot bound the leading key at all.
    */
  private[sources] def boundsOf(f: Filter, keyCol: String)
      : Option[(Option[Seq[Any]], Option[Seq[Any]])] = f match {
    case sources.EqualTo(c, v) if c == keyCol => Some((Some(Seq(v)), Some(Seq(v))))
    case sources.EqualNullSafe(c, v) if c == keyCol && v != null =>
      Some((Some(Seq(v)), Some(Seq(v))))
    case sources.GreaterThan(c, v) if c == keyCol => Some((Some(Seq(v)), None))
    case sources.GreaterThanOrEqual(c, v) if c == keyCol => Some((Some(Seq(v)), None))
    case sources.LessThan(c, v) if c == keyCol => Some((None, Some(Seq(v))))
    case sources.LessThanOrEqual(c, v) if c == keyCol => Some((None, Some(Seq(v))))
    case sources.In(c, vs) if c == keyCol && vs.nonEmpty && !vs.contains(null) =>
      Some((Some(Seq(vs.min(KeyOrd.on[Any](Seq(_))))), Some(Seq(vs.max(KeyOrd.on[Any](Seq(_)))))))
    case sources.And(a, b) =>
      (boundsOf(a, keyCol), boundsOf(b, keyCol)) match {
        case (Some((lo1, hi1)), Some((lo2, hi2))) =>
          Some(((lo1 ++ lo2).reduceOption(KeyOrd.max(_, _)),
            (hi1 ++ hi2).reduceOption(KeyOrd.min(_, _))))
        case (one @ Some(_), None) => one
        case (None, one) => one
      }
    case _ => None
  }
}
