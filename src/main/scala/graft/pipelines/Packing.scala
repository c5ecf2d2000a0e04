package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed-size context windows by
  * greedy cumulative length, the step that turns a cleaned corpus into
  * training sequences. A document lands in the bin its *start offset*
  * falls into: bin = floor(running_length_before_doc / windowSize).
  *
  * The running sum here is one global window ordered by doc_id, which at
  * 100 TB serializes into a single task — a deployment packs per shard
  * instead (partitionBy(shard) over the same expression), which this
  * function exposes via `shardCol`. The global form is what the oracle
  * can mirror deterministically.
  */
object Packing {

  def packSequences(docs: DataFrame, windowSize: Long = 2048,
                    shardCol: Option[Column] = None): DataFrame = {
    val w = shardCol match {
      case Some(s) => Window.partitionBy(s).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      case None => Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val base = shardCol match {
      case Some(s) => docs.select(col("doc_id"), col("n_chars"), s)
      case None => docs.select(col("doc_id"), col("n_chars"))
    }
    base
      .withColumn("cum", sum(col("n_chars")).over(w))
      // start offset = cum - n_chars; floor division is exact on doubles
      // here (offsets < 2^53)
      .select(col("doc_id"), col("n_chars"),
        floor((col("cum") - col("n_chars")).cast("double") / windowSize).cast("long").as("bin"))
  }
}
