package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed bounded Top-K aggregator — the Dataset-API twin of the
  * reference's size-100 min-heap (`Job3.java:56-80`), for callers who want
  * `groupByKey(...).agg(TopKAggregator.topK(k))` instead of a window.
  *
  * The buffer is a bounded min-heap, so partial aggregation ships at most
  * k candidates per partition per group — exactly the reference combiner's
  * shuffle pruning. The window form ([[graft.ops.TopK]]) is preferred in
  * SQL pipelines (Catalyst's WindowGroupLimit gives the same pruning with
  * codegen); this exists for typed pipelines and is cross-checked against
  * the window form in tests.
  *
  * Returns the kept (score, tag) pairs sorted descending by score with
  * ascending tag tie-break — deterministic like everything else here.
  */
object TopKAggregator {

  type Scored = (Double, String)

  case class TopKAgg(k: Int) extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {

    // PriorityQueue dequeues the max; rank the WORST element (lowest
    // score, then tie-break-losing largest tag) as max so eviction pops it
    private def heapOrder: Ordering[Scored] =
      Ordering.by[Scored, (Double, String)] { case (s, t) => (-s, t) }

    override def zero: mutable.PriorityQueue[Scored] = mutable.PriorityQueue.empty(heapOrder)

    private def push(b: mutable.PriorityQueue[Scored], v: Scored): mutable.PriorityQueue[Scored] = {
      b.enqueue(v)
      while (b.size > k) b.dequeue()
      b
    }

    override def reduce(b: mutable.PriorityQueue[Scored], a: Scored): mutable.PriorityQueue[Scored] =
      push(b, a)

    override def merge(b1: mutable.PriorityQueue[Scored], b2: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
      b2.foreach(push(b1, _))
      b1
    }

    override def finish(b: mutable.PriorityQueue[Scored]): Seq[Scored] =
      b.toSeq.sortBy { case (s, t) => (-s, t) }

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.kryo[mutable.PriorityQueue[Scored]]

    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopKAgg = TopKAgg(k)
}
