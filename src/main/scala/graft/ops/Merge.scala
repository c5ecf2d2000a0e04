package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse MERGE (upsert) as a plain relational composition — Spark
  * without a table format has no MERGE INTO statement, but the operator
  * is one FULL OUTER join: matched keys take the changeset's values,
  * unmatched-left rows pass through, unmatched-right rows insert. The
  * `action` column attributes each output row (update/insert/keep) the
  * way a MERGE's matched/not-matched clauses would. Side presence is
  * detected with explicit marker columns, never a value column's
  * null-ness — a legitimately-NULL value must not misclassify the row.
  *
  * Scale shape: ONE key-partitioned shuffle join; the changeset is
  * usually orders of magnitude smaller than the base, so Catalyst/AQE
  * broadcasts it and the base never moves. Both inputs must be
  * key-unique (standard MERGE precondition — a multi-match changeset is
  * ambiguous by definition). */
object Merge {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = base.columns.filterNot(keys.contains)
    require(updates.columns.toSet == base.columns.toSet,
      s"changeset schema ${updates.columns.toSeq} must match base ${base.columns.toSeq}")
    // the operator claims 'action' and the '__b_/__u_' namespace for its
    // markers/renames — an input that already uses them would yield a
    // duplicate/ambiguous column, so refuse loudly up front
    val reserved = base.columns.filter(c =>
      c == "action" || c == "__b_present" || c == "__u_present" || c.startsWith("__b_") || c.startsWith("__u_"))
    require(reserved.isEmpty,
      s"input columns ${reserved.toSeq} collide with upsert's reserved names ('action', '__b_*', '__u_*')")
    val b = valueCols.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
      .withColumn("__b_present", lit(1))
    val u = valueCols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__u_present", lit(1))
    b.join(u, keys, "full_outer")
      .select(keys.map(col) ++
        valueCols.map(c =>
          when(col("__u_present").isNotNull, col(s"__u_$c"))
            .otherwise(col(s"__b_$c")).as(c)) :+
        when(col("__u_present").isNotNull && col("__b_present").isNotNull, lit("update"))
          .when(col("__u_present").isNotNull, lit("insert"))
          .otherwise(lit("keep")).as("action"): _*)
  }
}
