package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // write the oracle catalog FIRST: if one query later hangs or kills the
    // JVM, every query that DID dump still gets compared (a wedged query
    // once zeroed an entire round's correctness because this file was
    // written last)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // per-query watchdog: a single stuck query must not starve the rest of
    // the dump. Each query runs on its OWN thread (no shared pool to
    // exhaust); on timeout its Spark jobs are cancelled via the job group
    // AND the thread is interrupted (covers driver-side and between-job
    // hangs). The dump goes to a temp dir renamed into place on success, so
    // a killed mid-write never leaves a partial result dir that the
    // comparer would score as a wrong answer.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong
    // local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 dumps just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val group = s"verify-$name"
      val tmp = s"$outDir/.tmp-$name"
      @volatile var failure: Option[Throwable] = None
      val worker = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
        } catch { case e: Throwable => failure = Some(e) }
        finally spark.sparkContext.clearJobGroup()
      }, s"verify-$name")
      worker.setDaemon(true)
      worker.start()
      worker.join(timeoutSec * 1000)
      if (worker.isAlive) {
        spark.sparkContext.cancelJobGroup(group)
        worker.interrupt()
        worker.join(30000)
        System.err.println(s"[verify] $name TIMEOUT after ${timeoutSec}s — cancelled")
      } else failure match {
        case Some(e) => System.err.println(s"[verify] $name failed: ${e.getMessage}")
        case None =>
          val from = Paths.get(tmp); val to = Paths.get(s"$outDir/$name")
          if (Files.exists(to)) {
            // clear a previous run's dir before the swap
            Files.walk(to).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.delete(p))
          }
          Files.move(from, to)
      }
    }
    spark.stop()
  }
}
