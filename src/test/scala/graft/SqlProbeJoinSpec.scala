package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.core._
import graft.plans.ZipPartitionsJoinExec

/** SQL probe joins: `facts JOIN cat.snap ON facts.k = snap.k` — exactly
  * ONE side is a graft snapshot scan — plans the probe-routed zip join:
  * the snapshot becomes its exchange-free leg-union plan, the facts side
  * is routed onto the leg boundaries by an RDD-level partitioner shuffle
  * (invisible to the SQL plan, so zero ShuffleExchangeExec), and the
  * streaming merge runs per leg. Content parity against the stock join
  * on the same inputs is the correctness contract; the plan shape and
  * the decline rules (broadcastable snapshot, non-prefix condition,
  * overlapping layout) are the scale contract.
  */
class SqlProbeJoinSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def withZip[T](f: => T): T = {
    // tiny test snapshots sit under the broadcast threshold, where the
    // rewrite correctly declines — disable broadcast to exercise the path
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def zipCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) { case z: ZipPartitionsJoinExec => z }.size

  private def exchangeCount(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }.size

  test("single-graft-side SQL equi-join plans the probe-routed zip join, all types") {
    val dir = tmpDir("graft-sqlprobe")
    val st = new FsSnapshotStore(s"$dir/store", spark)
    val dim = (1 to 3000).map(i => (i.toLong, s"d$i", i * 7L))
      .toDF("k", "dv", "dx").repartition(1)
    KVIndex.bootstrap(st, "dim", dim, Seq("k"), maxRowsPerFile = 256).toOption.get
    spark.conf.set("spark.sql.catalog.spj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spj.root", st.root)
    // facts: unsorted, duplicated keys, keys outside the snapshot, a null
    val facts = (Seq((Option(2500L), "a"), (Option(12L), "b"),
      (Option(2500L), "a2"), (Option(9999L), "miss"), (Option(1L), "edge"),
      (Option.empty[Long], "nul")) ++
      (100L to 400L).map(k => (Option(k), s"f$k")))
      .toDF("k", "fv")
    facts.createOrReplaceTempView("spj_facts")

    withZip {
      for (jt <- Seq("JOIN", "LEFT JOIN", "LEFT SEMI JOIN", "LEFT ANTI JOIN",
                     "RIGHT JOIN", "FULL JOIN")) {
        val sel = jt match {
          case "LEFT SEMI JOIN" | "LEFT ANTI JOIN" => "f.k, f.fv"
          case _ => "f.k, f.fv, d.dv, d.dx"
        }
        val sql = s"SELECT $sel FROM spj_facts f $jt spj.dim d ON f.k = d.k"
        val got = spark.sql(sql)
        assert(zipCount(got) == 1, s"$jt must plan the zip join:\n${got.queryExecution.executedPlan}")
        assert(exchangeCount(got) == 0, s"$jt must plan zero SQL exchanges")
        // stock twin on the same inputs (rewrite declined via broadcast threshold)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        val want = spark.sql(sql)
        assert(zipCount(want) == 0, s"stock twin must not zip ($jt)")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val g = got.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
        val w = want.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
        assert(g == w, s"$jt content mismatch vs stock join")
      }
    }
  }

  test("graft side on the LEFT and WHERE-bound snapshots route too") {
    val dir = tmpDir("graft-sqlprobe-l")
    val st = new FsSnapshotStore(s"$dir/store", spark)
    val dim = (1 to 2000).map(i => (i.toLong, i * 3L)).toDF("k", "dv").repartition(1)
    KVIndex.bootstrap(st, "diml", dim, Seq("k"), maxRowsPerFile = 128).toOption.get
    spark.conf.set("spark.sql.catalog.spjl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjl.root", st.root)
    (50L to 120L).map(k => (k, s"f$k")).toDF("k", "fv")
      .createOrReplaceTempView("spjl_facts")

    withZip {
      // snapshot on the SQL-left
      val q = spark.sql(
        "SELECT d.k, d.dv, f.fv FROM spjl.diml d JOIN spjl_facts f ON d.k = f.k")
      assert(zipCount(q) == 1, s"graft-left join must zip:\n${q.queryExecution.executedPlan}")
      assert(exchangeCount(q) == 0)
      assert(q.orderBy("k").as[(Long, Long, String)].collect().toSeq ==
        (50L to 120L).map(k => (k, k * 3L, s"f$k")))

      // a WHERE on the snapshot replays above the legs AND prunes files
      val qb = spark.sql(
        """SELECT f.k, f.fv, d.dv FROM spjl_facts f JOIN spjl.diml d
           ON f.k = d.k WHERE d.k >= 100""")
      assert(zipCount(qb) == 1, s"bounded snapshot must still zip:\n${qb.queryExecution.executedPlan}")
      assert(qb.orderBy("k").as[(Long, String, Long)].collect().toSeq ==
        (100L to 120L).map(k => (k, s"f$k", k * 3L)))
    }
  }

  test("composite keys: leading-prefix equality routes, tail-only declines") {
    val dir = tmpDir("graft-sqlprobe-c")
    val st = new FsSnapshotStore(s"$dir/store", spark)
    val dim = (1 to 600).map(i => (i % 6, i.toLong, s"d$i"))
      .toDF("g", "k", "dv").repartition(1)
    KVIndex.bootstrap(st, "dimc", dim, Seq("g", "k"), maxRowsPerFile = 64).toOption.get
    spark.conf.set("spark.sql.catalog.spjc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjc.root", st.root)
    Seq((2, "x"), (5, "y"), (2, "x2")).toDF("g", "fv")
      .createOrReplaceTempView("spjc_facts")

    withZip {
      // leading-prefix (g alone) — a many-to-many group join per probe
      val q = spark.sql(
        "SELECT f.g, f.fv, d.k FROM spjc_facts f JOIN spjc.dimc d ON f.g = d.g")
      assert(zipCount(q) == 1, s"prefix probe join must zip:\n${q.queryExecution.executedPlan}")
      val got = q.as[(Int, String, Long)].collect().sortBy(r => (r._1, r._2, r._3)).toSeq
      val want = (for {
        (fg, fv) <- Seq((2, "x"), (5, "y"), (2, "x2"))
        i <- 1 to 600 if i % 6 == fg
      } yield (fg, fv, i.toLong)).sortBy(r => (r._1, r._2, r._3))
      assert(got == want)

      // tail-only equality (k without g) cannot cut legs — stock plan stays
      val qt = spark.sql(
        "SELECT f.g, d.k FROM spjc_facts f JOIN spjc.dimc d ON f.g = d.k")
      assert(zipCount(qt) == 0, "non-leading key equality must decline")
    }
  }

  test("declines: broadcastable snapshot keeps the stock broadcast join") {
    val dir = tmpDir("graft-sqlprobe-d")
    val st = new FsSnapshotStore(s"$dir/store", spark)
    val dim = (1 to 500).map(i => (i.toLong, s"d$i")).toDF("k", "dv").repartition(1)
    KVIndex.bootstrap(st, "dimd", dim, Seq("k"), maxRowsPerFile = 64).toOption.get
    spark.conf.set("spark.sql.catalog.spjd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjd.root", st.root)
    Seq((5L, "a"), (7L, "b")).toDF("k", "fv").createOrReplaceTempView("spjd_facts")

    // default 10MB threshold: the 500-row snapshot broadcasts — stock plan
    val q = spark.sql(
      "SELECT f.k, f.fv, d.dv FROM spjd_facts f JOIN spjd.dimd d ON f.k = d.k")
    assert(zipCount(q) == 0,
      s"broadcastable snapshot must keep the stock join:\n${q.queryExecution.executedPlan}")
    assert(q.orderBy("k").as[(Long, String, String)].collect().toSeq ==
      Seq((5L, "a", "d5"), (7L, "b", "d7")))
  }
}
