package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Enforced plan shapes: the physical properties the 100 TB story
  * depends on, asserted so a refactor can't silently regress them
  * (PlanAudit prints the full profile; these are the load-bearing
  * invariants). */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.collect() // let AQE finalize
    // formatted mode prints full scan metadata (PushedFilters/ReadSchema)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q03: both predicates and the projection reach the parquet scan") {
    val p = plan("q03_filter_project")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"))
    assert(p.contains("EqualTo(l_returnflag,R)"))
    assert(!p.contains("l_extendedprice"), "projection not pruned")
  }

  test("q06: the dimension side is broadcast") {
    assert(plan("q06_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q23: global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("q23_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q12: the as-of join is window-based — no join operator at all") {
    val p = plan("q12_join_asof")
    assert(!p.contains("Join"), s"as-of should be linear, got:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("q37: scoring is partition-local over a broadcast of the queries") {
    val p = plan("q37_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q37 + twins + q48: top-k through TopKPerGroupExec, never a Window") {
    for (q <- Seq("q37_ann_topk", "x37_cosine_expr", "x37_cosine_udf",
        "q48_ann_ivf")) {
      val p = plan(q)
      assert(p.contains("TopKPerGroup"),
        s"$q should plan the bounded-heap operator:\n$p")
      assert(!p.contains("Window"),
        s"$q must not shuffle all scored rows into a per-query window:\n$p")
    }
  }

  test("q52: banded simhash candidates come from an equi-join, not all-pairs") {
    // q52 itself returns a checkpointed result (eager lineage cut), so
    // pin the pre-checkpoint shape that selfJoin materializes. Disable
    // auto-broadcast so the join shape at this tiny SF matches the one
    // the cache pre-partitioning was built for (SMJ/SHJ at scale).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fps = graft.SparkEntry.queries("q46_simhash")(spark, dir)
    val (bands, pairs) = graft.operators.HammingJoin.bandedPairs(
      fps, "doc_id", "simhash", maxDist = 2, bits = 32, numBands = 4)
    try {
      pairs.collect() // let AQE finalize
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
      import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
      // AQE wraps each stage as a leaf node, so descend through stages
      // explicitly (but not into InMemoryRelation — the cache's own
      // build plan may shuffle freely, it runs once)
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
        case q: QueryStageExec => p +: nodes(q.plan)
        case _ => p +: p.children.flatMap(nodes)
      }
      val all = nodes(pairs.queryExecution.executedPlan)
      val joins = all.collect { case j: BaseJoinExec => j }
      assert(joins.nonEmpty, s"expected a join:\n${all.head}")
      assert(joins.forall(j => j.isInstanceOf[SortMergeJoinExec]
          || j.isInstanceOf[ShuffledHashJoinExec]),
        s"q52 must not compare all fingerprint pairs:\n${all.head}")
      // both join sides read the cached pre-partitioned band relation:
      // zero shuffles between the cache scan and the join (the only
      // exchange in the whole query is the final distinct's, above it)
      val underJoin = joins.head.children.flatMap(nodes)
      assert(underJoin.count(_.nodeName.contains("InMemoryTableScan")) >= 2,
        s"both join sides should read the band cache:\n${all.head}")
      assert(!underJoin.exists(_.isInstanceOf[ShuffleQueryStageExec]),
        s"join sides must reuse the cache partitioning, not re-exchange:\n${all.head}")
    } finally {
      bands.unpersist(blocking = true)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("q82: filters reach all three scans; top-10 is TakeOrderedAndProject") {
    val p = plan("q82_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), s"no global sort for top-10:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter must reach the customer scan:\n$p")
    assert(p.contains("LessThan(o_orderdate,"),
      s"date filter must reach the orders scan:\n$p")
    assert(p.contains("GreaterThan(l_shipdate,"),
      s"ship-date filter must reach the lineitem scan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q83: six-table join broadcasts the dimension chain, no cartesian") {
    val p = plan("q83_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), s"dims should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every join must be an equi-join:\n$p")
  }

  test("q84: per-source sample ranks through TopKPerGroupExec, never a Window") {
    val p = plan("q84_group_sample")
    assert(p.contains("TopKPerGroup"), s"expected the bounded-heap operator:\n$p")
    assert(!p.contains("Window"), s"must not window-shuffle every doc:\n$p")
  }

  test("q101: the scalar (sumw, n) side broadcasts; the keep decision is " +
      "a filter, not a join on data") {
    val p = plan("q101_weighted_sample")
    // the only join is the 1-row-aggregate broadcast (BNL over a scalar
    // relation is a constant-cost construction, not a data cross join)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Filter"), p)
  }

  test("q104: winnowed pair generation is an equi-join on the fingerprint " +
      "key — no cartesian, no BNL, fingerprints inside codegen") {
    val p = plan("q104_winnow_passages")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("winnow_fingerprints"), p) // the fused Expression
    // formatted mode marks codegen membership per node — the winnow
    // Generate must carry one (the Expression is not CodegenFallback)
    assert(p.linesIterator.exists(l =>
      l.contains("Generate") && l.contains("codegen id")), p)
  }
}
