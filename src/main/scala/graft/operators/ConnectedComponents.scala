package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Connected-component labeling over an arbitrary undirected graph —
  * the frame-shaped core of the near-dup clustering family
  * (`graft.queries.LlmOps3` q57/q80 delegate here).
  *
  * Algorithm: min-label propagation + pointer jumping. Every node
  * starts as its own label; each round takes the min label over its
  * neighborhood (one shuffle join), then path-halves by replacing its
  * label with that node's label (a second join). The jump preserves
  * the invariant "my label is the id of a node in my component with
  * id ≤ my previous label", so the fixed point is unchanged
  * (component-min labels) but long chains collapse in O(log diameter)
  * rounds instead of O(diameter). Lineage is truncated per round
  * (`localCheckpoint`) so the plan does not grow with iterations — the
  * standard large-graph CC shape when a graph library isn't warranted.
  *
  * Scale posture: edges are persisted PRE-PARTITIONED on the join key,
  * so when labels can't broadcast each round's join reuses that
  * partitioning and only the (node-sized) label relation shuffles —
  * never the edge list. Below `broadcastNodeCap` nodes the label side
  * is broadcast-hinted (checkpointed frames carry no stats, so without
  * the hint the planner would sort-merge the full edge list EVERY
  * round). A component with diameter beyond `maxIters` rounds raises
  * instead of silently splitting.
  */
object ConnectedComponents {

  /** Labels `(id, label)` with label = min node id in the component.
    * `nodes`: one column `id` (every node, including isolated ones);
    * `edges`: columns `src`, `dst` (undirected — symmetrized here). */
  def labels(nodes: DataFrame, edgesIn: DataFrame,
      broadcastNodeCap: Long = 4000000L, maxIters: Int = 30): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    val edges = edgesIn.select($"src", $"dst")
      .unionAll(edgesIn.select($"dst".as("src"), $"src".as("dst")))
      .repartition($"dst")
      .persist()
    try {
      val nNodes = nodes.count()
      def labelSide(l: DataFrame): DataFrame =
        if (nNodes <= broadcastNodeCap) broadcast(l) else l
      var labels = nodes.select($"id", $"id".as("label")).localCheckpoint()
      var edgesCur = edges
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIters) {
        val neighborMin = edgesCur.join(labelSide(labels),
            edgesCur("dst") === labels("id"))
          .groupBy($"src").agg(F.min($"label").as("nlabel"))
        val propagated = labels.as("l")
          .join(neighborMin.as("n"), $"l.id" === $"n.src", "left")
          .select($"l.id".as("id"), $"l.label".as("prev"),
            least($"l.label", coalesce($"nlabel", $"l.label")).as("label"))
        // pointer jump through the PREVIOUS round's checkpointed labels —
        // rescanning them is free, while jumping through `propagated`
        // would recompute the neighbor join twice per round. The previous
        // label rides along so convergence is a filter+count over this
        // frame — not a fourth join per round.
        val next = propagated.as("x")
          .join(labels.select($"id".as("jid"), $"label".as("jlabel")).as("y"),
            $"x.label" === $"y.jid", "left")
          .select($"x.id".as("id"), $"x.prev".as("prev"),
            least($"x.label", coalesce($"jlabel", $"x.label")).as("label"))
          .localCheckpoint()
        changed = next.filter($"label" =!= $"prev").count()
        labels = next.select($"id", $"label")
        // CONTRACT the edge set through the fresh labels: an edge whose
        // endpoints already share a label carries no further information
        // and is dropped; the rest collapse onto label-representatives.
        // On dense graphs (near-clique components — the near-dup corpus
        // regime) this removes almost everything after round 1, so later
        // rounds scan a vanishing relation instead of the full edge list
        // every time (on the sf0.1 near-dup rep graph the 4.5M symmetric
        // edges collapse to 2582 after round 1). A node contracted out of the edge
        // set keeps converging through the pointer jump above. The
        // checkpointed per-round edge frames are dropped by the context
        // cleaner; only the caller-visible `edges` persist is released
        // explicitly below.
        if (changed > 0) {
          val lbl = labelSide(labels)
          edgesCur = edgesCur.as("e")
            .join(lbl.select($"id".as("sid"), $"label".as("slabel")),
              $"e.src" === $"sid")
            .join(lbl.select($"id".as("did"), $"label".as("dlabel")),
              $"e.dst" === $"did")
            .select($"slabel".as("src"), $"dlabel".as("dst"))
            .filter($"src" =!= $"dst").distinct()
            .repartition($"dst")
            .localCheckpoint()
        }
        iter += 1
      }
      if (changed > 0) {
        // a component with diameter > iteration cap would silently split
        throw new IllegalStateException(
          s"label propagation did not converge after $iter rounds " +
            s"($changed labels still changing)")
      }
      labels
      // labels are localCheckpointed, so releasing the edge persist is
      // safe on BOTH paths — the finally keeps the non-convergence throw
      // from leaking the symmetrized edge relation in a long-lived session
    } finally edges.unpersist()
  }
}
