package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-file range statistics — the Spark-native equivalent of the reference's
  * `Pointer(partition, id, nElements, level)` routing entry
  * (reference `package.scala:23-25`, `Meta.scala:14`). `min`/`max` are the
  * composite key bounds of the file; `rows` makes `count()` an O(1) manifest
  * sum exactly like `Pointer.nElements` (reference `Meta.scala:29`).
  */
final case class FileEntry(path: String, rows: Long,
                           min: Seq[Any], max: Seq[Any])

/** Snapshot descriptor — the `IndexContext` equivalent
  * (reference `index.proto:68-78`). Whoever holds a manifest can read that
  * frozen snapshot forever: files are immutable and shared across snapshots
  * (file-granular copy-on-write replaces the reference's block-granular COW
  * path copy, `Index.scala:137-160`).
  */
final case class SnapshotManifest(
    id: String,                 // index id
    version: Long,              // monotone snapshot number within the index
    snapshotId: String,         // uuid of this snapshot
    keyCols: Seq[String],
    valueCols: Seq[String],
    numElements: Long,          // O(1) count, reference Index.scala:899
    maxNItems: Long,            // capacity before split; -1 = unbounded
    lastChangeVersion: String,  // tx id of last writer, reference Context.scala:20
    files: Seq[FileEntry]) {

  def keySpec: KeySpec = KeySpec(keyCols)
  def isEmpty: Boolean = numElements == 0
  /** capacity predicates — reference QueryableIndex.scala:521-538 */
  def isFull: Boolean = maxNItems > 0 && numElements >= maxNItems
  def hasEnough(n: Long): Boolean = maxNItems <= 0 || numElements + n <= maxNItems
}

object SnapshotManifest {
  private def anyToJson(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case s: Short => JInt(BigInt(s.toInt))
    case b: Byte => JInt(BigInt(b.toInt))
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case b: Boolean => JBool(b)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case d: BigDecimal => JDecimal(d)
    case d: java.sql.Date => JObject("$date" -> JString(d.toString))
    case t: java.sql.Timestamp => JObject("$ts" -> JInt(BigInt(t.getTime)))
    case other => JString(other.toString)
  }

  private def jsonToAny(j: JValue): Any = j match {
    case JNull => null
    case JString(s) => s
    case JInt(i) => i.toLong
    case JDouble(d) => d
    case JDecimal(d) => d
    case JBool(b) => b
    case JObject(List(("$date", JString(s)))) => java.sql.Date.valueOf(s)
    case JObject(List(("$ts", JInt(ms)))) => new java.sql.Timestamp(ms.toLong)
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  def toJson(m: SnapshotManifest): String = {
    val files = JArray(m.files.map(f => JObject(
      "path" -> JString(f.path), "rows" -> JInt(BigInt(f.rows)),
      "min" -> JArray(f.min.map(anyToJson).toList),
      "max" -> JArray(f.max.map(anyToJson).toList))).toList)
    JsonMethods.compact(JsonMethods.render(JObject(
      "id" -> JString(m.id), "version" -> JInt(BigInt(m.version)),
      "snapshotId" -> JString(m.snapshotId),
      "keyCols" -> JArray(m.keyCols.map(JString(_)).toList),
      "valueCols" -> JArray(m.valueCols.map(JString(_)).toList),
      "numElements" -> JInt(BigInt(m.numElements)),
      "maxNItems" -> JInt(BigInt(m.maxNItems)),
      "lastChangeVersion" -> JString(m.lastChangeVersion),
      "files" -> files)))
  }

  def fromJson(s: String): SnapshotManifest = {
    val j = JsonMethods.parse(s)
    def str(f: String) = (j \ f).asInstanceOf[JString].s
    def lng(f: String) = (j \ f).asInstanceOf[JInt].num.toLong
    def strs(f: String) = (j \ f).asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
    val files = (j \ "files").asInstanceOf[JArray].arr.map { fj =>
      FileEntry(
        (fj \ "path").asInstanceOf[JString].s,
        (fj \ "rows").asInstanceOf[JInt].num.toLong,
        (fj \ "min").asInstanceOf[JArray].arr.map(jsonToAny),
        (fj \ "max").asInstanceOf[JArray].arr.map(jsonToAny))
    }
    SnapshotManifest(str("id"), lng("version"), str("snapshotId"),
      strs("keyCols"), strs("valueCols"), lng("numElements"),
      lng("maxNItems"), str("lastChangeVersion"), files)
  }
}

/** Driver-side ordering over composite key literals, used only for manifest
  * file pruning (deciding which files a write batch touches). Matches Spark's
  * per-type orderings for the types we store in manifests.
  */
object KeyOrd extends Ordering[Seq[Any]] {
  private def cmp1(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => x.compareTo(y)
    case (x: Array[Byte], y: Array[Byte]) =>
      // unsigned lexicographic — matches Spark BinaryType ordering and the
      // reference's Guava UnsignedBytes comparator (package.scala:39-42)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    case (x: Number, y: Number) =>
      new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString))
    case (x, y) => x.toString.compareTo(y.toString)
  }
  override def compare(a: Seq[Any], b: Seq[Any]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = cmp1(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}

/** Filesystem-backed snapshot catalog — the `Storage` equivalent
  * (reference `Storage.scala:7-33`; `MemoryStorage.scala` /
  * `CassandraStorage.scala` are the reference's two backends, here a single
  * FS/HadoopFS one since parquet already handles the block layer IO4 that the
  * reference hand-rolls with protobuf+LZ4, `GrpcByteSerializer.scala:19-63`).
  *
  * Layout under `root`:
  * {{{
  *   <indexId>/LATEST                    -> "v<version>" (atomic rename commit)
  *   <indexId>/v<version>.manifest.json
  *   <indexId>/history.jsonl             -> temporal log (ts -> version)
  *   <indexId>/data/<snapshotId>/part-N.parquet
  * }}}
  *
  * Commit protocol (reference single-writer `used` flag, `Index.scala:1012`,
  * and snapshot isolation `readme.md:4`): a writer commits by writing the new
  * manifest then atomically renaming a temp LATEST; the rename only succeeds
  * logically if the parent version it read is still current (checked under a
  * JVM-level lock per index; on a real cluster this would be a storage CAS,
  * e.g. HDFS rename-no-overwrite of v<n>.manifest.json itself, which
  * also fails if v<n> exists — we use exactly that: manifest create-new).
  */
final class SnapshotStore(val root: String, val spark: SparkSession) {

  private def idxDir(id: String): Path = Paths.get(root, id)

  def exists(id: String): Boolean = Files.exists(idxDir(id).resolve("LATEST"))

  def listIndexes(): Seq[String] =
    if (!Files.exists(Paths.get(root))) Nil
    else Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.exists(p.resolve("LATEST"))).map(_.getFileName.toString).toSeq.sorted

  /** Create an empty index — reference `Storage.createIndex`
    * (`Storage.scala:20-29`). Fails with IndexAlreadyExists like the
    * reference's INDEX_ALREADY_EXISTS error.
    */
  def createIndex(id: String, keyCols: Seq[String], valueCols: Seq[String],
                  maxNItems: Long = -1L): Either[GraftError, SnapshotManifest] = {
    if (exists(id)) Left(GraftError.IndexAlreadyExists(id))
    else {
      val m = SnapshotManifest(id, 0L, UUID.randomUUID().toString, keyCols,
        valueCols, 0L, maxNItems, "", Nil)
      Files.createDirectories(idxDir(id))
      commit(m, expectedParent = -1L)
      Right(m)
    }
  }

  def loadLatest(id: String): Either[GraftError, SnapshotManifest] =
    if (!exists(id)) Left(GraftError.IndexNotFound(id))
    else {
      val v = Files.readString(idxDir(id).resolve("LATEST")).trim
      Right(loadVersion(id, v.stripPrefix("v").toLong))
    }

  def loadVersion(id: String, version: Long): SnapshotManifest =
    SnapshotManifest.fromJson(
      Files.readString(idxDir(id).resolve(s"v$version.manifest.json")))

  /** Atomic commit: create-new manifest for version parent+1 (fails if a
    * concurrent writer already committed that version — the CAS), then
    * repoint LATEST via atomic rename.
    */
  def commit(m: SnapshotManifest, expectedParent: Long): SnapshotManifest = {
    val dir = idxDir(m.id)
    Files.createDirectories(dir)
    val target = dir.resolve(s"v${m.version}.manifest.json")
    // CREATE_NEW = the compare-and-swap: only one writer can create v(n+1)
    Files.write(target, SnapshotManifest.toJson(m).getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val tmp = dir.resolve(s".LATEST.${UUID.randomUUID()}")
    Files.writeString(tmp, s"v${m.version}")
    Files.move(tmp, dir.resolve("LATEST"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    m
  }

  /** Read one snapshot as a DataFrame. Files are immutable so this is a
    * consistent non-blocking read of that frozen version regardless of
    * concurrent writes — reference `readme.md:4`.
    */
  def read(m: SnapshotManifest): DataFrame = {
    val cols = (m.keyCols ++ m.valueCols :+ "version").map(col)
    if (m.files.isEmpty) {
      // empty relation with the right schema is only knowable from a file;
      // an empty index has none, so synthesize from keyCols as nulls
      spark.emptyDataFrame
    } else spark.read.parquet(m.files.map(_.path): _*).select(cols: _*)
  }

  /** Read a subset of a snapshot's files (the touched set during COW). */
  def readFiles(paths: Seq[String], m: SnapshotManifest): DataFrame = {
    val cols = (m.keyCols ++ m.valueCols :+ "version").map(col)
    spark.read.parquet(paths: _*).select(cols: _*)
  }

  /** Write `df` as the data of a brand-new snapshot, range-partitioned and
    * sorted by key so parquet row-group stats give seek-like reads
    * (SURVEY §7 hard-part 3). Returns the file entries with per-file
    * min/max composite key + row count.
    */
  def writeData(id: String, df: DataFrame, keySpec: KeySpec,
                targetPartitions: Int = 0): (String, Seq[FileEntry]) = {
    val snapshotId = UUID.randomUUID().toString
    val dir = idxDir(id).resolve("data").resolve(snapshotId)
    val keyCols = keySpec.cols.map(col)
    val nParts =
      if (targetPartitions > 0) targetPartitions
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism / 4)
    df.repartitionByRange(nParts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .write.mode("errorifexists").parquet(dir.toString)
    (snapshotId, fileStats(dir.toString, keySpec))
  }

  /** Per-file stats via one small aggregate over the written files (struct
    * min/max = lexicographic composite-key min/max in Spark).
    */
  def fileStats(dir: String, keySpec: KeySpec): Seq[FileEntry] = {
    val df = spark.read.parquet(dir)
    val kstruct = struct(keySpec.cols.map(col): _*)
    val rows = df.groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"), min(kstruct).as("mn"), max(kstruct).as("mx"))
      .collect()
    rows.map { r =>
      val mn = r.getStruct(2); val mx = r.getStruct(3)
      FileEntry(r.getString(0), r.getLong(1),
        mn.toSeq, mx.toSeq)
    }.sortBy(f => f.min)(KeyOrd)
  }

  // ---- temporal log (reference TemporalIndex.scala) ----

  private def historyPath(id: String) = idxDir(id).resolve("history.jsonl")

  /** T2: record (ts -> version) — reference `TemporalIndex.scala:21-27`
    * inserts `(System.nanoTime -> ctx.snapshot())` into the history index.
    */
  def recordSnapshot(id: String, version: Long,
                     ts: Long = System.nanoTime()): Long = {
    Files.writeString(historyPath(id), s"""{"ts":$ts,"version":$version}""" + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    ts
  }

  def historyLog(id: String): Seq[(Long, Long)] =
    if (!Files.exists(historyPath(id))) Nil
    else Files.readAllLines(historyPath(id)).asScala.filter(_.nonEmpty).map { line =>
      val j = JsonMethods.parse(line)
      ((j \ "ts").asInstanceOf[JInt].num.toLong,
       (j \ "version").asInstanceOf[JInt].num.toLong)
    }.toSeq

  /** T3: floor lookup — snapshot current AT time t = greatest ts <= t,
    * clamped to the earliest entry like the reference's binSearch position
    * clamp (`TemporalIndex.scala:31-38`).
    */
  def findAt(id: String, t: Long): Option[Long] = {
    val log = historyLog(id)
    if (log.isEmpty) None
    else log.filter(_._1 <= t).lastOption.map(_._2).orElse(Some(log.head._2))
  }

  /** T4: open the historical snapshot — reference `TemporalIndex.scala:40-53`. */
  def findIndexAt(id: String, t: Long): Option[SnapshotManifest] =
    findAt(id, t).map(v => loadVersion(id, v))

  /** Garbage collection: keep the newest `retainVersions` snapshots, drop
    * older manifests + history entries, then delete every data file no
    * kept manifest references (mark-and-sweep over manifests — the price
    * of COW structural sharing; the reference never reclaims blocks at
    * all, `Storage.scala` has no delete).
    *
    * Safe by construction: files shared with kept snapshots stay (they're
    * referenced); only unreachable files go. Returns (#manifests removed,
    * #files deleted).
    */
  def vacuum(id: String, retainVersions: Int = 2): (Int, Int) = {
    require(retainVersions >= 1)
    val latest = loadLatest(id).fold(e => throw new IllegalStateException(e.message), identity)
    val cutoff = latest.version - retainVersions + 1
    val dir = idxDir(id)
    val manifests = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.manifest\\.json")).toSeq
    val (dropM, keepM) = manifests.partition { p =>
      p.getFileName.toString.stripPrefix("v").stripSuffix(".manifest.json").toLong < cutoff
    }
    // manifests store scan-reported paths ("file:/..." URIs); the sweep
    // walks filesystem paths — compare normalized
    def localPath(p: String): String =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    val referenced: Set[String] = keepM.map(p =>
      SnapshotManifest.fromJson(Files.readString(p)))
      .flatMap(_.files.map(f => localPath(f.path))).toSet
    dropM.foreach(Files.delete)
    // prune history entries pointing at dropped versions
    if (Files.exists(historyPath(id))) {
      val kept = historyLog(id).filter(_._2 >= cutoff)
      val tmp = dir.resolve(s".history.${UUID.randomUUID()}")
      Files.writeString(tmp,
        kept.map { case (ts, v) => s"""{"ts":$ts,"version":$v}""" }.mkString("", "\n", "\n"))
      Files.move(tmp, historyPath(id), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    // sweep unreferenced data files
    var deleted = 0
    val dataDir = dir.resolve("data")
    if (Files.exists(dataDir)) {
      Files.walk(dataDir).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .filterNot(p => referenced.contains(p.toString))
        .foreach { p => Files.delete(p); deleted += 1 }
    }
    (dropM.size, deleted)
  }
}
