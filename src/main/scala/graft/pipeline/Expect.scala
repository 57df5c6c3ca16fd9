package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation (the dbt-test / Great-Expectations core,
  * relationally): declared rules are checked in bulk and come back as
  * one `(rule, n_violations)` report — the admission gate a pipeline
  * runs before a corpus version is allowed downstream.
  *
  * Scale shape: every ROW-LEVEL rule (not-null, arbitrary SQL
  * predicate) is one conditional-sum column of a SINGLE aggregate over
  * ONE scan — adding row rules adds zero scans. `Unique` and `Ref`
  * rules each need their own key-shaped job (a count-per-key aggregate
  * / an anti-join against the dimension — broadcast when small), which
  * is their irreducible cost; all results union into one plan, so the
  * report is one action.
  */
object Expect {

  sealed trait Rule { def name: String }

  /** Violation = null in `col`. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null:$col"
  }

  /** Violation = row where the SQL predicate is not TRUE (three-valued:
    * a null predicate counts as a violation, matching SQL CHECK
    * semantics inverted for reporting).
    */
  final case class Check(name: String, predicate: String) extends Rule

  /** Violation count = EXCESS rows over distinct keys (`Σ (cnt−1)` over
    * duplicated groups): 0 iff the columns form a unique key. Null keys
    * group together like any other value.
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique:${cols.mkString(",")}"
  }

  /** Referential integrity: violation = non-null `col` value with no
    * match in `dim.dimCol` (null FKs are `NotNull`'s business).
    *
    * `bloomItems` opts a LARGE dimension (above the broadcast threshold)
    * into a bloom prefilter: a ~10-bits/key sketch of the dim keys is
    * built once ([[graft.operators.BloomJoin.keyFilterBytes]]), and the
    * fact's distinct keys split scan-side — keys FAILING the sketch are
    * definite violations (bloom admits no false negatives) counted with
    * zero join, and only the sketch-passing keys reach the exact
    * anti-join. With or without it the fact side first collapses to
    * per-key counts, so the join input is |distinct keys|, never |rows|.
    */
  final case class Ref(col: String, dim: DataFrame, dimCol: String,
                       bloomItems: Option[Long] = None) extends Rule {
    def name = s"ref:$col"
  }

  /** @return one row per rule: (rule, n_violations), all rules green ⇔
    *         every count is 0.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val rowRules: Seq[(String, Column)] = rules.collect {
      case r: NotNull => r.name -> col(r.col).isNotNull
      case r: Check => r.name -> expr(r.predicate)
    }
    val parts = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      // coalesce: sum() over an EMPTY input is NULL, which would break
      // the "all green ⇔ every count is 0" contract on an empty corpus
      val aggs = rowRules.zipWithIndex.map { case ((_, p), i) =>
        coalesce(sum(when(p, 0L).otherwise(1L)), lit(0L)).as(s"__r$i")
      }
      val stacked = rowRules.zipWithIndex
        .map { case ((n, _), i) => s"'${n.replace("'", "''")}', __r$i" }
        .mkString(", ")
      parts += df.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${rowRules.size}, $stacked) AS (rule, n_violations)")
    }
    rules.foreach {
      case u: Unique =>
        parts += df.groupBy(u.cols.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("n_violations"))
          .select(lit(u.name).as("rule"), col("n_violations"))
      case r: Ref =>
        // collapse the fact side to per-key counts first: the anti-join
        // (and the bloom probe) run over |distinct keys|, never |rows|
        val fkCounts = df.filter(col(r.col).isNotNull)
          .groupBy(col(r.col).as("__fk")).agg(count(lit(1)).as("__c"))
        val dimKeys = r.dim.select(col(r.dimCol).as("__fk")).distinct()
        val unmatched = r.bloomItems match {
          case Some(items) =>
            val bf = graft.operators.BloomJoin.keyFilterBytes(
              r.dim, col(r.dimCol), items)
            if (bf == null) fkCounts // empty dim: every key is a violation
            else {
              val probe = graft.operators.BloomJoin.mightContain(bf, col("__fk"))
              // failing the sketch = definitely absent from dim (no false
              // negatives) — definite violations, zero join; passing keys
              // (≈ the compliant set + false positives) get the exact
              // check. The aggregate feeds BOTH union arms, so it is
              // persisted: without the pin each arm re-runs the full fact
              // scan + per-key shuffle — the opposite of the prefilter's
              // point. Size is |distinct keys| rows (spills past memory);
              // the context cleaner reclaims the block once unreferenced.
              val probed = fkCounts.withColumn("__pass", probe)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              probed.filter(!col("__pass")).drop("__pass").unionByName(
                probed.filter(col("__pass")).drop("__pass")
                  .join(dimKeys, Seq("__fk"), "left_anti"))
            }
          case None =>
            fkCounts.join(dimKeys, Seq("__fk"), "left_anti")
        }
        parts += unmatched
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
      case _ => ()
    }
    parts.result().reduce(_ unionByName _)
  }
}
