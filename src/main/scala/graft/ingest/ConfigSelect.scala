package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{expr, lit, coalesce}

/** S6 in-engine analogue: the reference's config-driven field extraction
  * (generic_spider.py:9-77 + sites.json) as a rule-driven select builder —
  * each configured output field is a SQL expression over the raw columns,
  * with optional per-field default values injected when the expression
  * yields null. Config is data, the plan is still fully Catalyst-optimized
  * (expressions compile like hand-written selects). */
object ConfigSelect {

  final case class FieldRule(name: String, sqlExpr: String,
      default: Option[String] = None)

  def apply(df: DataFrame, rules: Seq[FieldRule]): DataFrame =
    df.select(rules.map { r =>
      val e = expr(r.sqlExpr)
      r.default.fold(e)(d => coalesce(e, lit(d))).as(r.name)
    }: _*)
}
