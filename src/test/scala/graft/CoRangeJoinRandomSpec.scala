package graft

import org.apache.spark.sql.functions._

import graft.core._

/** Randomized DIFFERENTIAL for the co-range join family: random layouts
  * (file sizes, densities, overlap windows, composite keys, leg targets,
  * plan-leaf caps) × random join types, each compared row-for-row against
  * Spark's stock shuffled join on the same inputs. The fixed-seed rerun
  * convention follows `RandomizedWriteSpec` (reference
  * `Repeatable.scala:6-22`). This is the net for the cases a
  * hand-written spec misses: boundaries landing ON duplicate-ish keys,
  * single-file sides, empty intersection windows, left-only ranges at
  * both ends, capped legs forcing multi-file legs.
  */
class CoRangeJoinRandomSpec extends SparkSuite {
  import spark.implicits._

  private def store(dir: String) = new FsSnapshotStore(s"$dir/store", spark)

  for (seed <- Seq(41, 97))
  test(s"random layouts × join types match the stock join — seed $seed") {
    val rnd = new scala.util.Random(seed)
    val st = store(tmpDir(s"graft-crjrand$seed"))

    for (round <- 1 to 6) {
      val composite = rnd.nextBoolean()
      val keys = if (composite) Seq("g", "k") else Seq("k")
      // random sparse key populations over overlapping-or-not windows
      def keysOf(lo: Int, hi: Int, step: Int): Seq[Int] =
        (lo to hi by step).filter(_ => rnd.nextDouble() < 0.8)
      val aLo = rnd.nextInt(500); val aHi = aLo + 500 + rnd.nextInt(2500)
      val bLo = rnd.nextInt(3000); val bHi = bLo + 200 + rnd.nextInt(2500)
      val aKeys = keysOf(aLo, aHi, 1 + rnd.nextInt(3))
      val bKeys = keysOf(bLo, bHi, 1 + rnd.nextInt(3))

      def frame(ks: Seq[Int], tag: String) = {
        val rows = ks.map(i => (i % (if (composite) 4 else 1), i.toLong, s"$tag$i"))
        if (composite) rows.toDF("g", "k", s"${tag}v").repartition(1)
        else rows.map(r => (r._2, r._3)).toDF("k", s"${tag}v").repartition(1)
      }
      val ixA = KVIndex.bootstrap(st, s"ra_${seed}_$round", frame(aKeys, "a"),
        keys, maxRowsPerFile = 16 << rnd.nextInt(5)).toOption.get
      val ixB = KVIndex.bootstrap(st, s"rb_${seed}_$round", frame(bKeys, "b"),
        keys, maxRowsPerFile = 16 << rnd.nextInt(5)).toOption.get

      val jt = Seq("inner", "left_outer", "left_semi", "left_anti",
        "full_outer", "right_outer")(rnd.nextInt(6))
      val rowsPerLeg = if (rnd.nextBoolean()) -1L else (8L << rnd.nextInt(6))
      val cap = if (rnd.nextBoolean()) None else Some(1 + rnd.nextInt(12))
      cap.foreach(c => spark.conf.set("spark.graft.maxPlanLegs", c.toString))
      try {
        val got = ixA.coRangeJoin(ixB, rowsPerLeg, jt)

        // the stock-join twin on the same snapshot contents
        val l = ixA.df.alias("__l")
        val r = ixB.df.alias("__r")
        val cond = keys.map(c => col(s"__l.$c") === col(s"__r.$c")).reduce(_ && _)
        val rightVals = ixB.df.columns.toSeq
          .filterNot(c => keys.contains(c) || c == "version")
        val rightInOut = jt == "inner" || jt == "left_outer" ||
          jt == "full_outer" || jt == "right_outer"
        // full/right outer COALESCE key/version (the USING-join shape)
        def lc(c: String) =
          if ((jt == "full_outer" || jt == "right_outer") &&
              (keys.contains(c) || c == "version"))
            coalesce(col(s"__l.$c"), col(s"__r.$c")).as(c)
          else col(s"__l.$c")
        val want = l.join(r, cond, jt).select(
          ixA.df.columns.toSeq.map(lc) ++
            (if (rightInOut) rightVals.map(c => col(s"__r.$c")) else Nil): _*)

        val gc = got.columns.toSeq
        assert(gc == want.columns.toSeq,
          s"round $round jt=$jt: column mismatch $gc vs ${want.columns.toSeq}")
        val gotRows = got.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val wantRows = want.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(gotRows.length == wantRows.length,
          s"round $round jt=$jt cap=$cap rpl=$rowsPerLeg: " +
            s"${gotRows.length} rows vs ${wantRows.length}")
        assert(gotRows.toSeq == wantRows.toSeq,
          s"round $round jt=$jt cap=$cap rpl=$rowsPerLeg: content diverged")
      } finally cap.foreach(_ => spark.conf.unset("spark.graft.maxPlanLegs"))
    }
  }

  // The SQL-TEXT differential: the same randomized layouts driven through
  // spark.sql over the catalog (the GraftCoRangeJoin rewrite path — ON /
  // USING / [NOT] EXISTS / WHERE-bound / prefix GROUP BY) against the
  // SAME SQL over plain temp views of the snapshot reads (stock plans).
  // This exercises the rewrite's ELIGIBILITY logic and side-stack replay
  // with the same coverage the API fuzz gives coRangeJoin.
  for (seed <- Seq(53, 131))
  test(s"random layouts through SQL text match the stock plans — seed $seed") {
    val rnd = new scala.util.Random(seed)
    val st = store(tmpDir(s"graft-crjrsql$seed"))
    val cat = s"crjrsql$seed"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", st.root)
    // small spill thresholds drive the LARGE duplicate-key groups (the
    // prefix variant's per-g groups run to hundreds of rows) through the
    // spillable rows-2..n path — the fuzz differentials cover the spill
    // machinery too, not just the in-memory fast path. Kept moderate: a
    // sorter PER tiny group across 32 concurrent tasks OOMs the forked
    // test JVM (each UnsafeExternalSorter acquires a memory page).
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "64")
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "512")
    try for (round <- 1 to 5) {
      val composite = rnd.nextBoolean()
      val keys = if (composite) Seq("g", "k") else Seq("k")
      def keysOf(lo: Int, hi: Int, step: Int): Seq[Int] =
        (lo to hi by step).filter(_ => rnd.nextDouble() < 0.8)
      val aLo = rnd.nextInt(500); val aHi = aLo + 500 + rnd.nextInt(2000)
      val bLo = rnd.nextInt(2500); val bHi = bLo + 200 + rnd.nextInt(2000)
      val aKeys = keysOf(aLo, aHi, 1 + rnd.nextInt(3))
      val bKeys = keysOf(bLo, bHi, 1 + rnd.nextInt(3))
      def frame(ks: Seq[Int], tag: String) = {
        val rows = ks.map(i => (i % (if (composite) 4 else 1), i.toLong, s"$tag$i"))
        if (composite) rows.toDF("g", "k", s"${tag}v").repartition(1)
        else rows.map(r => (r._2, r._3)).toDF("k", s"${tag}v").repartition(1)
      }
      val ixA = KVIndex.bootstrap(st, s"sqa_${seed}_$round", frame(aKeys, "a"),
        keys, maxRowsPerFile = 16 << rnd.nextInt(5)).toOption.get
      val ixB = KVIndex.bootstrap(st, s"sqb_${seed}_$round", frame(bKeys, "b"),
        keys, maxRowsPerFile = 16 << rnd.nextInt(5)).toOption.get
      ixA.df.createOrReplaceTempView(s"v_sqa_${seed}_$round")
      ixB.df.createOrReplaceTempView(s"v_sqb_${seed}_$round")
      val (ga, gb) = (s"$cat.sqa_${seed}_$round", s"$cat.sqb_${seed}_$round")
      val (va, vb) = (s"v_sqa_${seed}_$round", s"v_sqb_${seed}_$round")

      val on = keys.map(c => s"x.$c = y.$c").mkString(" AND ")
      val exOn = keys.map(c => s"y.$c = x.$c").mkString(" AND ")
      val bound = aLo + rnd.nextInt(math.max(aHi - aLo, 1))
      val usingCols = keys.mkString(", ")
      val variants = Seq(
        s"SELECT x.k AS k, x.av AS av, y.bv AS bv FROM %A x JOIN %B y ON $on WHERE x.k <= $bound",
        s"SELECT $usingCols, av, bv FROM %A JOIN %B USING ($usingCols)",
        s"SELECT x.k AS k, x.av AS av, y.bv AS bv FROM %A x LEFT JOIN %B y ON $on",
        s"SELECT x.k AS xk, y.k AS yk, y.bv AS bv FROM %A x RIGHT JOIN %B y ON $on",
        s"SELECT x.k AS xk, y.k AS yk, x.av AS av, y.bv AS bv FROM %A x FULL JOIN %B y ON $on",
        s"SELECT x.k AS k FROM %A x WHERE EXISTS (SELECT 1 FROM %B y WHERE $exOn)",
        s"SELECT x.k AS k FROM %A x WHERE NOT EXISTS (SELECT 1 FROM %B y WHERE $exOn)") ++
        (if (composite) Seq( // leading-key-PREFIX join + prefix aggregate
          s"SELECT x.g AS g, count(*) AS n FROM %A x JOIN %B y ON x.g = y.g GROUP BY x.g")
         else Nil)
      // 3 random variants per round keeps runtime bounded while the two
      // seeds × rounds sweep the whole list over time
      for (v <- rnd.shuffle(variants).take(3)) {
        val gq = spark.sql(v.replace("%A", ga).replace("%B", gb))
        val sq = spark.sql(v.replace("%A", va).replace("%B", vb))
        val got = gq.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val want = sq.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(got.length == want.length && got.toSeq == want.toSeq,
          s"seed $seed round $round diverged for: $v")
        // eligibility: every variant here is a key (or leading-prefix)
        // equality over plain scans — the rewrite must have fired, i.e.
        // NO stock Join survives (the result may be the zip join, a
        // bypass-only union, or the provably-empty LocalRelation). Check
        // the OPTIMIZED plan: AQE wraps the physical plan for queries
        // with exchanges and TreeNode.collectFirst does not descend into
        // AdaptiveSparkPlanExec.
        assert(gq.queryExecution.optimizedPlan.collectFirst {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.isEmpty,
          s"seed $seed round $round kept the stock join: $v\n" +
            gq.queryExecution.optimizedPlan)
      }
    } finally {
      spark.conf.unset("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
      spark.conf.unset("spark.sql.sortMergeJoinExec.buffer.spill.threshold")
    }
  }

  // Randomized DIFFERENTIAL for the zip-join snapshot diff: random
  // upsert/remove batches build a version chain, each adjacent diff is
  // compared against a brute-force full-outer recomputation of the two
  // snapshot frames.
  test("randomized snapshot diff matches the brute-force diff — seed 71") {
    val rnd = new scala.util.Random(71)
    val st = store(tmpDir("graft-crjdiffrand"))
    val base = (1 to 3000).map(i => (i.toLong, (i * 10).toLong)).toDF("k", "v")
      .repartition(1)
    var cur = KVIndex.bootstrap(st, "dfz", base, Seq("k"),
      maxRowsPerFile = 256).toOption.get
    for (round <- 1 to 4) {
      val prev = cur
      val present = prev.df.select("k").as[Long].collect().toSet
      val lo = 1 + rnd.nextInt(2500)
      val hi = math.min(3000, lo + 50 + rnd.nextInt(400))
      val ups = (lo to hi).filter(_ => rnd.nextDouble() < 0.7)
        .map(i => (i.toLong, -(i.toLong * round)))
      val rmLo = 1 + rnd.nextInt(2800)
      val rmKeys = (rmLo to math.min(3000, rmLo + 30)).map(_.toLong)
        .filter(k => present.contains(k) && !ups.exists(_._1 == k))
      val cmds = Seq(Command.Insert(ups.toDF("k", "v"), upsert = true)) ++
        (if (rmKeys.nonEmpty) Seq(Command.Remove(rmKeys.toDF("k"))) else Nil)
      cur = new KVIndex(st,
        prev.execute(cmds, s"tx-dfz$round").orThrow, 256)

      val got = prev.diff(cur).select("k", "old_v", "new_v", "change")
        .as[(Long, Option[Long], Option[Long], String)].collect().sortBy(_._1)
      // brute force over the two full snapshot frames (v is non-null in
      // this fixture, so value-nullness identifies the sides)
      val o = prev.df.select(col("k"), col("v").as("old_v"))
      val n = cur.df.select(col("k"), col("v").as("new_v"))
      val want = o.join(n, Seq("k"), "full_outer")
        .withColumn("change",
          when(col("old_v").isNull, lit("added"))
            .when(col("new_v").isNull, lit("removed"))
            .when(col("old_v") =!= col("new_v"), lit("changed")))
        .filter(col("change").isNotNull)
        .select("k", "old_v", "new_v", "change")
        .as[(Long, Option[Long], Option[Long], String)].collect().sortBy(_._1)
      assert(got.toSeq == want.toSeq,
        s"round $round: diff diverged (${got.length} vs ${want.length} rows)")
      assert(got.nonEmpty, s"round $round produced an empty mutation")
    }
  }
}
