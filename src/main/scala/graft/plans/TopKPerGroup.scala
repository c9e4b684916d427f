package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.types.IntegerType

/** Logical top-k-per-group: for each group (by `groupExprs`), keep the
  * first `k` rows in `orderExprs` order and attach their 1-based rank.
  *
  * This is the one operator where the engine goes below the DataFrame
  * API (SURVEY §7.3 decision table, "custom operators" preference (c)):
  * the window formulation (`row_number().over(...)` + filter) must
  * fully SORT every partition group — O(n log n) per group and no
  * map-side reduction. This operator keeps a bounded heap of k rows per
  * group — O(n log k) — and runs a partial pass BEFORE the shuffle, so
  * at most `k × groups` rows per input partition cross the wire. At
  * 100 TB with k=10 that is the difference between shuffling the table
  * and shuffling a rounding error.
  *
  * `rankAttr` is a constructor parameter (not derived in `output`) so
  * plan transformations preserve its expression id.
  */
case class TopKPerGroup(k: Int, groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], rankAttr: AttributeReference,
    child: LogicalPlan,
    partialFlushRows: Long = TopKPerGroup.DefaultPartialFlushRows)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is MINTED here, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Partial-pass memory bound: max rows held across all group heaps in
    * one task before a flush (rows are UnsafeRow copies; at ~100 B–1 KB
    * each this caps the pass at roughly 100 MB–1 GB per task — below
    * typical executor task memory, and tunable per call). */
  val DefaultPartialFlushRows: Long = 1L << 20
}

/** Physical top-k-per-group. `partial = true` instances run before the
  * exchange (per input partition, no rank output); the final instance
  * requires clustering on the group keys and emits ranks.
  *
  * Memory safety of the partial pass: it holds one ≤k-row heap per
  * DISTINCT group seen in the partition, which is unbounded when the
  * group key is high-cardinality (the argmax-per-vector pattern). When
  * held rows exceed `partialFlushRows`, the pass
  * FLUSHES every heap downstream and starts over — partial output only
  * needs to be a superset of each group's true top k (the final pass
  * re-reduces after the exchange), so flushing trades reduction ratio
  * for bounded memory, never correctness. The final pass has the
  * shuffle's clustering guarantee and its held rows are the true
  * result size (≤ k × groups-in-partition), so it never flushes. */
case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder], rankAttr: AttributeReference,
    partial: Boolean, child: SparkPlan,
    partialFlushRows: Long = TopKPerGroup.DefaultPartialFlushRows)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val orderE = orderExprs
    val kk = k
    val isPartial = partial
    val finalOutput = output
    val flushRows = math.max(1L, partialFlushRows) // a non-positive bound must not hang the task
    child.execute().mapPartitions ({ it =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      // BaseOrdering compares "row A before row B" as < 0; the heap keeps
      // its LARGEST (= worst kept) element at the head for O(log k) evict
      val ord = GenerateOrdering.generate(orderE, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var held = 0L

      def consume(row: InternalRow): Unit = {
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) { heap += row.copy(); held += 1 }
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }

      if (isPartial) {
        // chunked: fill heaps until the row bound, flush, repeat — the
        // output is a per-chunk top-k superset of the true per-group
        // top-k, reduced exactly by the final pass after the exchange
        new Iterator[InternalRow] {
          private var out: Iterator[InternalRow] = Iterator.empty
          private def refill(): Unit = {
            while (it.hasNext && held < flushRows) consume(it.next())
            out = heaps.values.toIndexedSeq.iterator.flatMap(_.iterator)
            heaps.clear()
            held = 0L
          }
          def hasNext: Boolean = {
            while (!out.hasNext && it.hasNext) refill()
            out.hasNext
          }
          def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); out.next() }
        }
      } else {
        it.foreach(consume)
        val outProj = UnsafeProjection.create(finalOutput, finalOutput)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        heaps.valuesIterator.flatMap { heap =>
          // dequeueAll yields worst-first; reverse → rank 1 is the best
          val sorted: Seq[InternalRow] = heap.dequeueAll.reverse.toSeq
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, i + 1)
            outProj(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans TopKPerGroup as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, rank, child, flush) =>
      val partial = TopKPerGroupExec(k, g, o, rank, partial = true,
        planLater(child), flush)
      TopKPerGroupExec(k, g, o, rank, partial = false, partial, flush) :: Nil
    case _ => Nil
  }
}
