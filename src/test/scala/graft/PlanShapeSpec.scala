package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape invariants the 100-TB story depends on, pinned as tests so a
  * refactor that silently loses them fails CI rather than a cluster bill:
  * filter/projection pushdown to the parquet scan, AQE shuffle-partition
  * coalescing, broadcast selection for small dims, and whole-stage codegen
  * over the hot projection path.
  */
class PlanShapeSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val dir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-planshape").toString
    (1 to 5000).map(i => (i.toLong, s"name$i", i % 97, i * 1.5))
      .toDF("id", "name", "grp", "score")
      .write.mode("overwrite").parquet(p)
    p
  }

  test("filter and projection push down to the parquet scan") {
    val q = spark.read.parquet(dir).filter(col("id") > 4900).select("id", "grp")
    assert(q.count() == 100)
    val scan = collectFirst(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }.get
    // the range predicate reaches the reader (row-group stats skip), and
    // the scan schema carries ONLY the referenced columns — a 2-column
    // projection must never read the 4-column file
    assert(scan.dataFilters.nonEmpty)
    assert(scan.metadata("PushedFilters").contains("GreaterThan(id,4900)"),
      scan.metadata("PushedFilters"))
    assert(scan.requiredSchema.fieldNames.toSet == Set("id", "grp"),
      scan.requiredSchema.treeString)
  }

  test("AQE coalesces the shuffle partitions of a small aggregate") {
    val q = spark.read.parquet(dir).groupBy("grp").agg(sum("score"))
    // execute THIS dataframe (not a derived count) so its adaptive plan
    // finalizes and the runtime shuffle-read decision is observable
    assert(q.collect().length == 97)
    // 8 configured shuffle partitions carry ~97 tiny groups; AQE must
    // plan a coalesced shuffle read rather than schedule every partition
    val reads = collect(q.queryExecution.executedPlan) {
      case r: AQEShuffleReadExec => r
    }
    assert(reads.nonEmpty, "expected an AQE shuffle read")
    assert(reads.exists(_.partitionSpecs.length <
      spark.conf.get("spark.sql.shuffle.partitions").toInt),
      s"expected coalesced partitions, got ${reads.map(_.partitionSpecs.length)}")
  }

  test("a small dimension joins via broadcast hash, not a shuffled join") {
    val dim = (0 until 97).map(i => (i, s"g$i")).toDF("grp", "gname")
    val q = spark.read.parquet(dir).join(dim, Seq("grp"))
    assert(q.count() == 5000)
    val bhj = collectFirst(q.queryExecution.executedPlan) {
      case j: BroadcastHashJoinExec => j
    }
    assert(bhj.isDefined, "expected a broadcast hash join for the tiny dim")
    val shuffles = collect(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"broadcast join must not shuffle: $shuffles")
  }

  test("centroid aggregation plans no Generate: vector-sum agg, not posexplode") {
    val rnd = new scala.util.Random(7)
    val vs = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f), s"l${i % 5}"))
    val df = vs.toDF("vec_id", "embedding", "label")
    val cohesion = graft.similarity.Similarity.labelCohesion(df)
    assert(cohesion.count() == 5)
    val gens = collect(cohesion.queryExecution.executedPlan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.isEmpty,
      s"labelCohesion must not explode vectors (dim×N shuffle): $gens")
    // ivfBuild's refinement pass goes through the same aggregate — the
    // returned index must carry no Generate either
    val (indexed, cents) = graft.similarity.Similarity.ivfBuild(
      vs.map(v => (v._1, v._2)).toDF("vec_id", "embedding"), nCells = 4)
    assert(cents.nonEmpty && cents.forall(_.length == 16))
    val gens2 = collect(indexed.queryExecution.executedPlan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens2.isEmpty, s"ivfBuild must not explode vectors: $gens2")
  }

  test("hot projection path stays inside one whole-stage codegen span") {
    val q = spark.read.parquet(dir)
      .filter(col("score") > 100.0)
      .select(col("id"), (col("score") * 2 + col("grp")).as("x"))
    q.collect()
    val planStr = q.queryExecution.executedPlan.toString
    // scan -> filter -> project fuse into ONE generated function (the
    // `*(1)` markers share a codegen stage id); a break here means an
    // interpreted expression snuck into the hot path
    assert(planStr.contains("*(1) Project") && planStr.contains("*(1) Filter"),
      planStr.take(2000))
  }

  test("substringSpans probes via a semi join over the persisted gram table") {
    val docs = (1 to 50).map(i =>
      (i.toLong, if (i % 2 == 0) "a b c d e f g h i j" else s"u$i v$i w x y z a$i b c d"))
      .toDF("doc_id", "text")
    val q = graft.dedup.Dedup.substringSpans(docs, gramTokens = 4, minDf = 2)
    q.collect()
    val optimized = q.queryExecution.optimizedPlan
    // the duplicated-position probe must stay a SEMI join (only doc/pos
    // survive — gram hashes never widen the output), and the gram table
    // must come back from the persisted relation on BOTH consumers, not
    // re-tokenize the corpus twice
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.Join
    assert(optimized.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty,
      optimized.treeString.take(2000))
    val cached = optimized.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cached.size == 2, s"expected the gram table cached on both sides, saw ${cached.size}")
  }

  test("keywords plans WindowGroupLimit; collocations plans TakeOrderedAndProject") {
    val docs = (1 to 200).map(i => (i.toLong, s"w${i % 17} w${i % 5} common tail"))
      .toDF("doc_id", "text")
    // per-doc top-k must pre-truncate per partition before the doc shuffle
    val kw = graft.text.TextAnalysis.keywords(docs, k = 2)
    kw.collect()
    val kwPlan = kw.queryExecution.executedPlan.toString
    assert(kwPlan.contains("WindowGroupLimit"), kwPlan.take(2000))
    // corpus top-k must be per-partition heads + k rows to one reducer,
    // never a global sort
    val co = graft.text.TextAnalysis.collocations(docs, k = 5, minCount = 2)
    co.collect()
    val coPlan = co.queryExecution.executedPlan.toString
    assert(coPlan.contains("TakeOrderedAndProject"), coPlan.take(2000))
  }

  test("proportionalK's pick plans WindowGroupLimit (rank bound truncates before the rank shuffle)") {
    val df = spark.range(0, 5000).select(col("id").as("doc_id"),
      concat(lit("s"), col("id") % 7).as("source"))
    val picked = graft.pipeline.Sampling.proportionalK(df, "source", "doc_id", 50)
    picked.collect()
    // the literal `__rn <= k` filter above the pick window is the shape
    // Spark rewrites to WindowGroupLimit: each partition keeps only its
    // local top-k per stratum, so a billion-row stratum never ships a
    // billion rows to be ranked
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2500))
  }

  test("transitions prunes payload columns before the window exchange") {
    val ev = (1 to 300).map(i => (i.toLong % 10, i.toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"),
        s"t${i % 4}", s"heavy-payload-$i" * 10))
      .toDF("user_id", "event_id", "ts", "event_type", "payload")
    val q = graft.operators.Funnel.transitions(ev)
    q.collect()
    val exchanges = collect(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    // the user-keyed window exchange must carry only (user, ms, id, type)
    // — the payload column stays behind the projection
    val windowEx = exchanges.filter(_.outputPartitioning.toString.contains("user_id"))
    assert(windowEx.nonEmpty, exchanges.map(_.toString).mkString("\n").take(1000))
    windowEx.foreach { e =>
      val cols = e.output.map(_.name).toSet
      assert(!cols.contains("payload"), s"payload crossed the exchange: $cols")
    }
  }
}
