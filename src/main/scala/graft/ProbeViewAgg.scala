package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Stage-timing probe for the `st_view_agg` bench row (r20 verdict #2):
  * decomposes the fixture into driver collects, stream start, per-micro-
  * batch sink commits, MaterializedAgg create/refresh, final read and
  * teardown, so the bench number's fixed (per-batch commit protocol)
  * vs variable (refresh ∝ diff) split is measurable instead of guessed.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProbeViewAgg"`
  * Prints one line per stage per rep plus a min-of-reps summary.
  */
object ProbeViewAgg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-viewagg")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.core.{FsSnapshotStore, KVIndex, MaterializedAgg}

    // `row` mode: time the ACTUAL SparkEntry fixture like the bench does
    // (count() per rep, min-of-reps) — for before/after fixture changes
    if (args.contains("row")) {
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries("st_view_agg")(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] row rep $i: $sec%.2f s")
        sec
      }
      println(f"[probe] st_view_agg row min-of-$reps%d: ${times.min}%.2f s")
      spark.stop()
      return
    }

    val acc = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    def stage[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      acc(name) = acc.getOrElse(name, Nil) :+ sec
      r
    }

    for (rep <- 1 to reps) {
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(F.col("o_orderkey"), F.col("o_custkey"),
          F.floor(F.col("o_totalprice") * 100).cast("long").as("cents"))
      val (b1, b2, b3) = stage("collect_batches") {
        (ord.filter(F.col("o_orderkey") <= 500).as[(Long, Long, Long)].collect().toSeq,
          ord.filter(F.col("o_orderkey") > 500 && F.col("o_orderkey") <= 1000)
            .as[(Long, Long, Long)].collect().toSeq,
          ord.filter(F.col("o_orderkey") < 100)
            .select(F.col("o_orderkey"), F.col("o_custkey"),
              (F.col("cents") + 1).as("cents"))
            .as[(Long, Long, Long)].collect().toSeq)
      }
      def deleteRec(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s2 = java.nio.file.Files.list(p)
          try s2.forEach(deleteRec(_)) finally s2.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      val root = java.nio.file.Files.createTempDirectory("graft-probe-va")
      val cp = java.nio.file.Files.createTempDirectory("graft-probe-va-cp")
      val store = new FsSnapshotStore(root.toString, spark)
      val input = MemoryStream[(Long, Long, Long)](spark)
      val sink = stage("stream_start") {
        input.toDF().toDF("o_orderkey", "o_custkey", "cents").writeStream
          .format("graft").option("root", root.toString).option("keys", "o_orderkey")
          .option("checkpointLocation", cp.toString)
          .start("svord")
      }
      def src() = KVIndex.open(store, "svord").fold(e => sys.error(e.message), identity)
      try {
        stage("sink_batch1") { input.addData(b1); sink.processAllAvailable() }
        stage("magg_create") {
          MaterializedAgg.create(store, "svview", src(), Seq("o_custkey"), "cents")
            .fold(e => sys.error(e.message), identity)
        }
        stage("sink_batch2") { input.addData(b2); sink.processAllAvailable() }
        stage("magg_refresh2") {
          MaterializedAgg.refresh(store, "svview", src())
            .fold(e => sys.error(e.message), identity)
        }
        stage("sink_batch3") { input.addData(b3); sink.processAllAvailable() }
        val view = stage("magg_refresh3") {
          MaterializedAgg.refresh(store, "svview", src())
            .fold(e => sys.error(e.message), identity)
        }
        stage("final_read") {
          view.df.select(F.col("o_custkey"), F.col("agg_sum"), F.col("agg_cnt"))
            .orderBy("o_custkey").collect()
        }
      } finally stage("teardown") {
        sink.stop()
        deleteRec(root); deleteRec(cp)
      }
      // NON-STREAMING twin: the same three commits + create/refreshes
      // through the direct command API — the delta vs the sink_batch*
      // stages is the streaming engine's per-batch fixed cost (offset/
      // commit logs, micro-batch planning), the twin itself is the
      // engine's own commit + refresh cost
      val root2 = java.nio.file.Files.createTempDirectory("graft-probe-vb")
      val store2 = new FsSnapshotStore(root2.toString, spark)
      try {
        def dfOf(rows: Seq[(Long, Long, Long)]) =
          rows.toDF("o_orderkey", "o_custkey", "cents")
        stage("direct_batch1") {
          KVIndex.bootstrap(store2, "svord", dfOf(b1), Seq("o_orderkey"),
            recordHistory = true).fold(e => sys.error(e.message), identity)
        }
        def src2() = KVIndex.open(store2, "svord").fold(e => sys.error(e.message), identity)
        stage("direct_create") {
          MaterializedAgg.create(store2, "svview", src2(), Seq("o_custkey"), "cents")
            .fold(e => sys.error(e.message), identity)
        }
        stage("direct_batch2") {
          KVIndex.executeWithRetry(store2, "svord",
            Seq(graft.core.Command.Insert(dfOf(b2), upsert = true)),
            recordHistory = true).orThrow
        }
        stage("direct_refresh2") {
          MaterializedAgg.refresh(store2, "svview", src2())
            .fold(e => sys.error(e.message), identity)
        }
        stage("direct_batch3") {
          KVIndex.executeWithRetry(store2, "svord",
            Seq(graft.core.Command.Insert(dfOf(b3), upsert = true)),
            recordHistory = true).orThrow
        }
        stage("direct_refresh3") {
          MaterializedAgg.refresh(store2, "svview", src2())
            .fold(e => sys.error(e.message), identity)
        }
      } finally deleteRec(root2)
      val repTotal = acc.values.map(_.last).sum
      println(f"[probe] rep $rep total ${repTotal}%.2f s :: " +
        acc.map { case (k, v) => f"$k=${v.last}%.2f" }.mkString(" "))
    }
    val mins = acc.map { case (k, v) => k -> v.min }
    println(f"[probe] min-of-$reps%d by stage (sums to ${mins.values.sum}%.2f s):")
    mins.foreach { case (k, v) => println(f"[probe]   $k%-16s ${v}%6.2f s") }
    spark.stop()
  }
}
