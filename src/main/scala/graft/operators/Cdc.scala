package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frame-shaped CDC changeset application — the general form of the
  * fixture-bound q89 (`graft.queries.Incremental`). */
object Cdc {

  /** Apply a change stream onto a base snapshot, latest op per key
    * winning. `changes` carries `keyCol`, `opCol` (`'D'` = delete,
    * anything else = upsert), `seqCol` (unique per key — ties would be
    * nondeterministic, same precondition as the streaming twin), and
    * payload columns that must each exist in `base`.
    *
    * Semantics per key:
    *  - latest op `'D'`: the key is dropped;
    *  - otherwise, if the key exists in base: column-wise
    *    `coalesce(new, old)` (null payload = keep — partial updates);
    *  - if the key is new: the payload row is inserted (base-only
    *    columns stay null).
    *
    * Scale shape (q89's measured plan): the changeset collapses to one
    * row per key FIRST (a shuffle of the changes only — in an
    * incremental pipeline |changes| ≪ |base|), then ONE equi-join
    * applies it; AQE broadcasts the collapsed side when small. The
    * base never shuffles.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payload = changes.columns.toSeq
      .filterNot(c => c == keyCol || c == opCol || c == seqCol)
    require(payload.nonEmpty && payload.forall(base.columns.contains),
      s"change payload columns ${payload.mkString(",")} must exist in base")
    val latest = changes.groupBy(col(keyCol))
      .agg(max_by(struct((opCol +: payload).map(col): _*), col(seqCol)).as("__c"))
      .select(col(keyCol).as("__k") +: col(s"__c.$opCol").as("__op") +:
        payload.map(p => col(s"__c.$p").as(s"__n_$p")): _*)
    val joined = base.join(latest, base(keyCol) === latest("__k"), "full_outer")
    val baseOnly = base.columns.toSeq.filterNot(payload.contains)
      .filterNot(_ == keyCol)
    joined.filter(coalesce(col("__op"), lit("")) =!= "D")
      .select(coalesce(base(keyCol), col("__k")).as(keyCol) +:
        (payload.map { p =>
          when(base(keyCol).isNull, col(s"__n_$p"))               // insert
            .when(col("__op").isNotNull, coalesce(col(s"__n_$p"), base(p)))
            .otherwise(base(p)).as(p)                             // untouched
        } ++ baseOnly.map(c => base(c).as(c))): _*)
  }
}
