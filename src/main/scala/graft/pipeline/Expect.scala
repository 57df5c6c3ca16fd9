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
    */
  final case class Ref(col: String, dim: DataFrame, dimCol: String) extends Rule {
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
      val aggs = rowRules.zipWithIndex.map { case ((_, p), i) =>
        sum(when(p, 0L).otherwise(1L)).as(s"__r$i")
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
        parts += df.select(col(r.col).as("__fk")).filter(col("__fk").isNotNull)
          .join(r.dim.select(col(r.dimCol).as("__fk")).distinct(),
            Seq("__fk"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
      case _ => ()
    }
    parts.result().reduce(_ unionByName _)
  }
}
