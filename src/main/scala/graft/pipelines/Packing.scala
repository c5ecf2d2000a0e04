package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed-size context windows by
  * greedy cumulative length, the step that turns a cleaned corpus into
  * training sequences. A document lands in the bin its *start offset*
  * falls into: bin = floor(running_length_before_doc / windowSize).
  *
  * Per shard the running sum is an ordinary partitioned window
  * (`shardCol`); the global form routes through [[graft.ops.Ranks
  * .globalCumSum]] — content-bucketed local sums offset-corrected by
  * broadcast per-bucket totals — so neither shape ever funnels data
  * rows through a single task.
  */
object Packing {

  def packSequences(docs: DataFrame, windowSize: Long = 2048,
                    shardCol: Option[Column] = None): DataFrame = {
    val cum = shardCol match {
      case Some(s) =>
        val w = Window.partitionBy(s).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.select(col("doc_id"), col("n_chars"), s)
          .withColumn("cum", sum(col("n_chars")).over(w))
      case None =>
        graft.ops.Ranks.globalCumSum(
          docs.select(col("doc_id"), col("n_chars")),
          Seq(col("doc_id") -> true), col("n_chars"), "cum")
    }
    cum
      // start offset = cum - n_chars; floor division is exact on doubles
      // here (offsets < 2^53)
      .select(col("doc_id"), col("n_chars"),
        floor((col("cum") - col("n_chars")).cast("double") / windowSize).cast("long").as("bin"))
  }
}
