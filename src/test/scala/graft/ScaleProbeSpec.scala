package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.core._

/** 10M-row scale probes (SCALE.md evidence, not part of the default gate):
  * run with `SPARK_GRAFT_SCALE_PROBE=1 sbt "testOnly graft.ScaleProbeSpec"`.
  * Compares the NATIVE read path (manifest file pruning in `tableForRange`)
  * with the SQL-over-view path (filters pushed through `DeclareOrdered`
  * into parquet scans) on the same snapshot: do both plan pruned scans,
  * and what does each actually open?
  */
class ScaleProbeSpec extends SparkSuite {
  import spark.implicits._

  private def enabled = sys.env.get("SPARK_GRAFT_SCALE_PROBE").contains("1")

  private def scanFiles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    (scans.map(_.metrics("numFiles").value).sum,
      scans.map(_.metrics("numOutputRows").value).sum)
  }

  test("10M rows: native point/range reads open only covering files; SQL view pushes filters") {
    assume(enabled, "set SPARK_GRAFT_SCALE_PROBE=1 to run")
    val store = new FsSnapshotStore(tmpDir("graft-probe10m"), spark)
    val n = 10000000L
    val t0 = System.nanoTime()
    val rows = spark.range(1, n + 1).select(col("id").as("k"), (col("id") * 3).as("x"))
    val ix = KVIndex.bootstrap(store, "p10", rows, Seq("k"))
      .fold(e => fail(e.message), identity)
    info(f"bootstrap 10M rows: ${(System.nanoTime() - t0) / 1e9}%.1f s, ${ix.numFiles} files")

    // native point get: manifest prune → 1 covering file
    val tN = System.nanoTime()
    val (nativeFiles, _) = scanFiles(ix.get(Seq(5000000L)))
    val nativeSec = (System.nanoTime() - tN) / 1e9
    info(f"native point get: $nativeFiles files opened, $nativeSec%.2f s")
    assert(nativeFiles == 1, s"native point get opened $nativeFiles files")

    // native range: covering files only
    val tR = System.nanoTime()
    val (nativeRangeFiles, nativeRangeRows) =
      scanFiles(ix.range(Seq(4999000L), Seq(5001000L),
        incFrom = true, incTo = true))
    info(f"native range (2k rows): $nativeRangeFiles files, ${(System.nanoTime() - tR) / 1e9}%.2f s")
    assert(nativeRangeFiles <= 2)
    assert(nativeRangeRows >= 2000L)

    // SQL over the registered view
    ix.createOrReplaceView("p10_view")
    val tV = System.nanoTime()
    val point = spark.sql("SELECT k, x FROM p10_view WHERE k = 5000000")
    val (viewFiles, _) = scanFiles(point)
    val viewSec = (System.nanoTime() - tV) / 1e9
    val plan = point.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(k,5000000)"),
      "SQL point predicate must reach the parquet scan")
    info(f"view point get: $viewFiles files enumerated, $viewSec%.2f s")

    val tVR = System.nanoTime()
    val range = spark.sql(
      "SELECT count(*) AS c FROM p10_view WHERE k BETWEEN 4999000 AND 5001000")
    assert(range.as[Long].head() == 2001L)
    info(f"view range count: ${(System.nanoTime() - tVR) / 1e9}%.2f s")
    info(s"view/native file ratio: $viewFiles / $nativeFiles")
  }
}
