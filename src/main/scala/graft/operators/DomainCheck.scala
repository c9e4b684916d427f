package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass domain preflight (VERDICT r9 task 6): validate a new data
  * drop against the engine's DECLARED domains before any pipeline job
  * touches it. The r9 adversarial sweeps adjudicated several
  * divergences as out-of-domain input rather than engine bugs —
  * `value` is DECIMAL(18,4)-castable money, `event_id` is a key, the
  * embedding dimension is fixed, timestamps stay inside a bounded grid
  * span, `props` is JSON-or-null — but nothing VALIDATED them: at
  * 100 TB you want the one-pass check that fails fast on ingest, not
  * the 600-tasks-in crash (or, worse, the silently wrong spine join)
  * those violations cause downstream.
  *
  * Shape follows [[Profiler]]: every rule compiles to ONE aggregate
  * expression, all rules run in ONE `agg` pass over the frame, and a
  * `stack()` generator reshapes the single aggregated row to a row per
  * rule — no per-rule jobs, no re-reads. [[UniqueKey]] adds a
  * `countDistinct` (an Expand inside the aggregate — |key-rules|×agg
  * traffic, the exact-keyness price; every other rule is a row-local
  * conditional sum with mergeable partials). */
object DomainCheck {

  sealed trait Rule {
    /** short id in the report (`not_null`, `unique_key`, …) */
    def ruleName: String
    def column: String
    /** the input columns the rule reads (validated present) — default
      * the single `column`; composite rules override */
    private[DomainCheck] def inputCols: Seq[String] = Seq(column)
    /** aggregate expression counting this rule's VIOLATING rows */
    private[DomainCheck] def agg: Column
  }

  private def cnt(pred: Column): Column =
    sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L))

  /** Null is out of domain for `column`. (Most declared domains admit
    * null — null ts belongs to no window, null text is the empty token
    * set — so this rule is opt-in, not implied by the others: every
    * other rule counts only NON-null violating values.) */
  final case class NotNull(column: String) extends Rule {
    val ruleName = "not_null"
    private[DomainCheck] def agg: Column = cnt(col(column).isNull)
  }

  /** `column` is a KEY: violations = rows in excess of one per non-null
    * value (`count − countDistinct`, exact). Duplicated ids broke the
    * relational surface's row_number/as-of idioms in the r9 events
    * sweep — at-least-once delivery must be deduped (q35/E02) BEFORE
    * the relational operators, and this is the check that says so. */
  final case class UniqueKey(column: String) extends Rule {
    val ruleName = "unique_key"
    private[DomainCheck] def agg: Column =
      (count(col(column)) - countDistinct(col(column))).cast("long")
  }

  /** `column` is money: every non-null value must survive a cast to
    * DECIMAL(precision,scale). `try_cast` folds the whole adjudicated
    * family — overflow (±1e18), NaN, ±Infinity — into one null-on-
    * failure probe, mirroring the oracle's own behavior (DuckDB errors
    * casting any of them). */
  final case class DecimalCastable(column: String, precision: Int = 18,
      scale: Int = 4) extends Rule {
    val ruleName = "decimal_castable"
    private[DomainCheck] def agg: Column = cnt(col(column).isNotNull &&
      expr(s"try_cast(`$column` AS DECIMAL($precision,$scale))").isNull)
  }

  /** |value| stays under `maxAbs` and is a real number (no NaN/±Inf) —
    * the declared |v| < 1e14 money band. */
  final case class BoundedAbs(column: String, maxAbs: Double) extends Rule {
    val ruleName = "bounded_abs"
    private[DomainCheck] def agg: Column = cnt(col(column).isNotNull &&
      (isnan(col(column)) || abs(col(column)) >= maxAbs))
  }

  /** `columns` together form a KEY: violations = rows in excess of one
    * per distinct non-null-free tuple — the composite analogue of
    * [[UniqueKey]] for tables keyed by more than one column (lineitem's
    * `(l_orderkey, l_linenumber)`). Rows with a null in any key column
    * are not counted against keyness (count(struct) skips them), so add
    * [[NotNull]] per column when nulls are out of domain too. */
  final case class CompositeKey(columns: Seq[String]) extends Rule {
    require(columns.size >= 2, "CompositeKey needs >= 2 columns " +
      "(use UniqueKey for one)")
    val ruleName = "composite_key"
    val column: String = columns.mkString("+")
    override private[DomainCheck] def inputCols: Seq[String] = columns
    private[DomainCheck] def agg: Column = {
      // null-free tuples only, on BOTH sides: a struct with a null
      // field is itself non-null, so a bare countDistinct would count
      // tuples the count() side skipped and the difference could go
      // negative
      val tuple = when(columns.map(col(_).isNotNull).reduce(_ && _),
        struct(columns.map(col): _*))
      (count(tuple) - countDistinct(tuple)).cast("long")
    }
  }

  /** Non-null timestamps stay in [lo, hi) — the bounded-grid-span
    * domain: one 1970/2100 outlier makes every resample/LOCF spine
    * (q74/q96/q99) generate a ~69M-row minute grid on BOTH engines
    * (the r9 sweep's cost wall). `lo`/`hi` are `yyyy-MM-dd [HH:mm:ss]`
    * strings, interpreted in the session time zone. */
  final case class TimestampBetween(column: String, lo: String,
      hi: String) extends Rule {
    val ruleName = "ts_between"
    private[DomainCheck] def agg: Column = cnt(col(column).isNotNull &&
      (col(column) < to_timestamp(lit(lo)) ||
        col(column) >= to_timestamp(lit(hi))))
  }

  /** Non-null arrays have exactly `dim` elements — the embedding-store
    * contract (the oracles index a fixed dim, as any real store does;
    * a shorter vector is out-of-domain, not a zero-padded neighbor). */
  final case class FixedDim(column: String, dim: Int) extends Rule {
    val ruleName = "fixed_dim"
    private[DomainCheck] def agg: Column =
      cnt(col(column).isNotNull && size(col(column)) =!= dim)
  }

  /** Count vectors the ANN surface will SENTINEL rather than rank —
    * null, null/NaN components, zero-norm (the r9 ill-formed-vector
    * contract). Not hard failures (the engine survives them by
    * design); the count is the data-quality signal that says how much
    * of the drop can never retrieve. */
  final case class WellFormedVector(column: String) extends Rule {
    val ruleName = "well_formed_vec"
    private[DomainCheck] def agg: Column =
      cnt(!graft.queries.LlmOps.wellFormedVec(col(column)))
  }

  /** Non-null strings parse as JSON (`get_json_object($)` probe — the
    * lenient Spark semantic the q31 oracle was pinned to with
    * `json_valid`). Malformed JSON IS data at corpus scale; the count
    * tells you how much. */
  final case class ValidJson(column: String) extends Rule {
    val ruleName = "valid_json"
    // the legal JSON literal `null` probes to NULL like malformed text
    // does (ADVICE r10) — accept it explicitly so json_valid semantics
    // hold and requireClean does not fail an actually-clean drop
    private[DomainCheck] def agg: Column = cnt(col(column).isNotNull &&
      get_json_object(col(column), "$").isNull &&
      trim(col(column)) =!= "null")
  }

  /** Run every rule in one aggregation pass: (rule, col_name,
    * violations), one row per rule, rule order preserved. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to check")
    val missing =
      rules.flatMap(_.inputCols).distinct.filterNot(df.columns.contains)
    require(missing.isEmpty, s"rule columns absent: ${missing.mkString(",")}")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(r.agg, lit(0L)).as(s"__v_$i") // empty frame ⇒ 0, not null
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.ruleName}', '${r.column}', `__v_$i`"
    }.mkString(", ")
    row.select(expr(
      s"stack(${rules.size}, $stackArgs) AS (rule, col_name, violations)"))
  }

  /** [[check]] + fail-fast: throws listing every violated rule and its
    * count. The ingest-gate form — one pass, then either the pipeline
    * proceeds on a clean drop or nothing downstream runs at all. */
  def requireClean(df: DataFrame, rules: Seq[Rule]): Unit = {
    val bad = check(df, rules).filter(col("violations") > 0)
      .collect() // ≤ |rules| rows — driver metadata
    if (bad.nonEmpty)
      throw new IllegalStateException("domain preflight failed: " +
        bad.map(r => s"${r.getString(0)}(${r.getString(1)})=${r.getLong(2)}")
          .mkString(", "))
  }

  /** The declared domain of each test table (NOTES_r9 adjudications),
    * by name. */
  def rulesFor(table: String): Seq[Rule] = table match {
    case "events" => Seq(
      UniqueKey("event_id"),
      DecimalCastable("value"),
      BoundedAbs("value", 1e14),
      TimestampBetween("ts", "1990-01-01", "2040-01-01"),
      ValidJson("props"))
    case "documents" => Seq(UniqueKey("doc_id"))
    case "embeddings" => Seq(
      UniqueKey("vec_id"),
      FixedDim("embedding", 64),
      WellFormedVector("embedding"))
    // relational presets (VERDICT r10 task 7): the money/key domains
    // the TPC-H-shaped surface declares — a 100 TB relational ingest
    // gets the same fail-fast gate the LLM tables have
    case "orders" => Seq(
      UniqueKey("o_orderkey"),
      DecimalCastable("o_totalprice"),
      BoundedAbs("o_totalprice", 1e14),
      TimestampBetween("o_orderdate", "1990-01-01", "2040-01-01"))
    // NOTE: deliberately NO CompositeKey(l_orderkey, l_linenumber) —
    // unlike real TPC-H, the synthetic lineitem is NOT keyed by it
    // (measured: linenumber caps at 7 while orders carry up to 13
    // lines → 1401 duplicate tuples at sf0.001), and no oracle-gated
    // query leans on line keyness. Declare the rule on a REAL TPC-H
    // ingest, where it is part of the schema contract.
    case "lineitem" => Seq(
      DecimalCastable("l_extendedprice"),
      BoundedAbs("l_extendedprice", 1e14),
      TimestampBetween("l_shipdate", "1990-01-01", "2040-01-01"))
    case "customer" => Seq(
      UniqueKey("c_custkey"),
      DecimalCastable("c_acctbal"))
    case other => throw new IllegalArgumentException(
      s"no declared domain for table '$other' (events / documents / " +
        "embeddings / orders / lineitem / customer)")
  }
}
