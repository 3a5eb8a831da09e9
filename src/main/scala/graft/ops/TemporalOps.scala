package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native form of: as-of join and
  * range self-join.
  *
  *  - as-of: two forms with identical semantics — [[asOfJoin]], a
  *    union+window composition (tier (a): one shuffle+sort of left ∪
  *    right, the executable spec), and [[asOfJoinNative]], a custom
  *    physical operator (tier (c): [[graft.plans.AsOfJoinExec]]) that
  *    shuffles/sorts each side in its own schema and streams a forward
  *    merge with one row of state — no union materialization, no window
  *    buffering. This is how kdb/QuestDB-style as-of semantics map onto
  *    a shuffle engine.
  *  - range join: equi-join on (key, coarse time bucket) with the exact
  *    predicate applied after — candidate pairs are bounded per bucket,
  *    never the O(n·m) of a BroadcastNestedLoopJoin on a theta condition.
  */
object TemporalOps {

  /** As-of join through the native [[graft.plans.AsOfJoinExec]] operator.
    * Same contract as [[asOfJoin]] (most recent right row with
    * `right.timeCol <= left.timeCol` per key; left-outer; NULL key/time
    * never matches; greatest payload wins ties) — the composition remains
    * the executable spec, and TemporalOpsSpec pins row-for-row equality.
    */
  def asOfJoinNative(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      rightCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.nonEmpty, "rightCols must be non-empty")
    require(!rightCols.exists(leftCols.contains), "rightCols must not collide with left columns")
    // the exec compares keys with one interpreted ordering and hash-
    // partitions each side independently — mismatched key types would
    // ClassCastException at runtime (and mis-partition before that)
    val lKeyType = left.schema(leftKey).dataType
    val rKeyType = right.schema(rightKey).dataType
    require(lKeyType == rKeyType,
      s"asOfJoinNative key types must match: $leftKey is $lKeyType, $rightKey is $rKeyType — cast first")
    // attributes are resolved by name below: ambiguous names would bind
    // silently to the first occurrence instead of erroring like col()
    require(leftCols.count(_ == leftKey) == 1 && leftCols.count(_ == leftTime) == 1,
      s"left columns must contain exactly one $leftKey and one $leftTime")
    require(!leftCols.contains("__asof_t"), "left must not contain the reserved column __asof_t")
    val spark = left.sparkSession
    graft.plans.GraftPlans.register(spark)
    // align time types (the composition casts both sides to timestamp) and
    // apply SQL equi-join NULL semantics on the right, as in asOfJoin
    val lPrep = left.withColumn("__asof_t", col(leftTime).cast("timestamp"))
    val rPrep = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__asof_k") +: col(rightTime).cast("timestamp").as("__asof_rt") +:
        rightCols.map(col): _*)
    val lPlan = org.apache.spark.sql.GraftSqlBridge.analyzed(lPrep)
    val rPlan = org.apache.spark.sql.GraftSqlBridge.analyzed(rPrep)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(sys.error(s"column $name not found"))
    val node = graft.plans.AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, "__asof_t"),
      attr(rPlan, "__asof_k"), attr(rPlan, "__asof_rt"),
      rightCols.map(attr(rPlan, _)))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
      .select(leftCols.map(col) ++ rightCols.map(col): _*)
  }

  /** As-of join: for each left row, attach the single most recent right
    * row with `right.timeCol <= left.timeCol` on the same key (ties at
    * equal time match, like DuckDB's `ASOF JOIN ... ON l.t >= r.t`).
    * Unmatched left rows keep NULLs (left-outer semantics).
    *
    * Implementation: tag and union both sides, one window pass per key
    * ordered by (time, side) carrying the last non-null right payload
    * forward, keep left rows. Right payload travels as one struct column
    * so the window carries a single value.
    *
    * @param rightCols right columns to attach (must not collide with left)
    */
  def asOfJoin(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      rightCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.exists(leftCols.contains), "rightCols must not collide with left columns")
    val payload = struct(rightCols.map(col): _*)
    // SQL equi-join semantics: a NULL key never matches — drop NULL-keyed
    // right rows (otherwise the NULL window partition would hand their
    // payload to NULL-keyed left rows); NULL-keyed left rows stay and get
    // NULL payload like any unmatched row. A NULL right TIME would sort
    // before every real row (nulls-first) and wrongly match left rows that
    // precede all quotes — drop those too ("no time" cannot be "most
    // recent").
    val taggedRight = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
      Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
        lit(0).as("__side"), payload.as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__side"), lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.map(col): _*)
    // right rows sort before left rows at equal time -> inclusive match;
    // __payload as the final sort key makes the order TOTAL, so duplicate
    // (key, time) right rows resolve deterministically (greatest payload
    // wins) instead of depending on partition order
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last("__payload", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Range self-join on events: pairs (a, b) with the same key where
    * b.time lands in (a.time, a.time + windowSeconds]. Implemented as an
    * equi-join on (key, coarse bucket): side A replicates into each bucket
    * its window can reach (2 buckets when bucketSeconds == windowSeconds),
    * then the exact range predicate filters. Candidates per pair of
    * buckets are bounded, so the shuffle is O(n·2) not O(n²).
    */
  def rangeSelfJoin(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      windowSeconds: Long
  ): DataFrame = {
    val micros = windowSeconds * 1000000L
    val a = df.select(col(keyCol).as("k"), col(idCol).as("id_a"), col(timeCol).as("t_a"))
      .withColumn("bucket", explode(array(
        (unix_micros(col("t_a")) / micros).cast("long"),
        (unix_micros(col("t_a")) / micros).cast("long") + 1)))
    val b = df.select(col(keyCol).as("k"), col(idCol).as("id_b"), col(timeCol).as("t_b"))
      .withColumn("bucket", (unix_micros(col("t_b")) / micros).cast("long"))
    a.join(b, Seq("k", "bucket"))
      .filter(
        unix_micros(col("t_b")) > unix_micros(col("t_a")) &&
          unix_micros(col("t_b")) <= unix_micros(col("t_a")) + micros)
      // no dedup needed: a replicates into two DISTINCT buckets, b lives in
      // exactly one, so each qualifying pair joins exactly once
      .select(col("k").as(keyCol), col("id_a"), col("id_b"), col("t_a"), col("t_b"))
  }
}
