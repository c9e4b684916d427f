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
    require(!base.columns.exists(c => c == "__b" || c == "__cp" || c == "__k"
        || c == "__op" || c.startsWith("__n_")),
      "base column names __b/__cp/__k/__op/__n_* are reserved")
    val latest = changes.groupBy(col(keyCol))
      .agg(max_by(struct((opCol +: payload).map(col): _*), col(seqCol)).as("__c"))
      // __cp: change-side presence sentinel (the mirror of __b below) —
      // presence must not be inferred from __op, whose NULL still means
      // upsert per the contract ("anything else = upsert")
      .select(col(keyCol).as("__k") +: lit(true).as("__cp") +:
        col(s"__c.$opCol").as("__op") +:
        payload.map(p => col(s"__c.$p").as(s"__n_$p")): _*)
    // Base-side presence is detected via a sentinel, not key nullness: a
    // NULL-keyed base row never matches the join but must survive untouched,
    // not be misread as an insert with a null payload.
    val baseT = base.withColumn("__b", lit(true))
    val joined = baseT.join(latest, baseT(keyCol) === latest("__k"), "full_outer")
    val baseOnly = base.columns.toSeq.filterNot(payload.contains)
      .filterNot(_ == keyCol)
    joined.filter(coalesce(col("__op"), lit("")) =!= "D")
      .select(coalesce(baseT(keyCol), col("__k")).as(keyCol) +:
        (payload.map { p =>
          when(col("__b").isNull, col(s"__n_$p"))                 // insert
            .when(col("__cp").isNotNull, coalesce(col(s"__n_$p"), baseT(p)))
            .otherwise(baseT(p)).as(p)                            // untouched
        } ++ baseOnly.map(c => baseT(c).as(c))): _*)
  }
}
