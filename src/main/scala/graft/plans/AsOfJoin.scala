package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, CreateStruct, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator tier (c) of the extension
  * mandate: a custom [[LogicalPlan]] + [[SparkStrategy]] + [[SparkPlan]],
  * registered through `SparkSessionExtensions` (see
  * [[graft.functions.GraftExtensions]]).
  *
  * Semantics (identical to the [[graft.ops.TemporalOps.asOfJoin]]
  * union+window composition, which stays as the executable spec): for
  * each left row, attach the single most recent right row with
  * `right.time <= left.time` on the same key; unmatched left rows keep
  * NULLs; NULL left key or time never matches; duplicate right
  * (key, time) rows resolve deterministically (greatest payload wins).
  *
  * Why a physical operator beats the composition at scale: the
  * composition shuffles left ∪ right as ONE dataset (left rows pay the
  * wider unioned schema), sorts the union, and runs a window pass that
  * materializes a running `last(payload)` per row. This node shuffles
  * each side in its own schema, sorts each side separately (right is
  * typically far smaller), and streams a merge with O(1) state per
  * partition — no union materialization, no window buffering.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute])
    extends BinaryNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")
  // the exec sorts the right side by a struct of the payload columns so
  // duplicate (key, time) rows resolve deterministically — an unorderable
  // payload type (map, or a struct containing one) would otherwise
  // surface as an obscure planner/sort error deep in execution
  payload.foreach { p =>
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(p.dataType),
      s"as-of payload column '${p.name}' has unorderable type ${p.dataType}; " +
        "duplicate-(key,time) resolution requires an orderable payload")
  }

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, payload) =>
      AsOfJoinExec(lk, lt, rk, rt, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Limit pushdown through [[AsOfJoin]]: the join emits exactly one output
  * row per left row, so a LocalLimit above it can also truncate the left
  * side below it — the same reasoning Spark's own LimitPushDown applies to
  * the streamed side of a left-outer join. At scale this is the difference
  * between shuffling the full left table and shuffling `limit` rows per
  * scan partition.
  */
object AsOfJoinLimitPushdown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, Project}
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lim @ LocalLimit(_, aj: AsOfJoin) if !aj.left.isInstanceOf[LocalLimit] =>
      lim.copy(child = aj.copy(left = LocalLimit(lim.limitExpr, aj.left)))
    case lim @ LocalLimit(_, p @ Project(_, aj: AsOfJoin)) if !aj.left.isInstanceOf[LocalLimit] =>
      // projections are row-preserving, so the limit passes through them too
      lim.copy(child = p.copy(child = aj.copy(left = LocalLimit(lim.limitExpr, aj.left))))
  }
}

/** Predicate pushdown through [[AsOfJoin]]: conjuncts that reference only
  * left-side columns commute with the join (one output row per left row,
  * left columns unchanged), so they run before the join's shuffle+sort
  * instead of after — at scale, the standard way a time-range or key
  * filter avoids shuffling the rows it would discard. Conjuncts touching
  * the attached payload stay above (they depend on the match).
  */
object AsOfJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (pushable, kept) =
        splitConjunctivePredicates(cond).partition(p =>
          p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(
          org.apache.spark.sql.catalyst.expressions.And), aj.left))
        kept.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Idempotent runtime registration of the graft planner strategies and
  * optimizer rules (for sessions built without `spark.sql.extensions`) —
  * the plan-layer twin of NativeExpressions.register. */
object GraftPlans {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val newRules = Seq(AsOfJoinLimitPushdown, AsOfJoinFilterPushdown)
      .filterNot(spark.experimental.extraOptimizations.contains)
    if (newRules.nonEmpty)
      spark.experimental.extraOptimizations = spark.experimental.extraOptimizations ++ newRules
  }
}

/** Sort-merge as-of join.
  *
  * Children are hash-clustered on their keys (EnsureRequirements
  * co-partitions the two sides exactly as it does for a sort-merge join)
  * and sorted by (key, time) — the right side additionally by the payload
  * struct so duplicate (key, time) rows resolve to the greatest payload,
  * matching the composition's total-order tie-break. Each partition then
  * streams one forward merge: the right cursor never rewinds, and the
  * only per-partition state is the latest matching payload (one row).
  */
final case class AsOfJoinExec(
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
    extends SparkPlan
    with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(CreateStruct(payload.toIndexedSeq), Ascending)))

  // left rows pass through in their sorted order, in left partitions
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val payloadAttrs = payload
    val lKeyExpr: Expression = leftKey
    val lTimeExpr: Expression = leftTime
    val rKeyExpr: Expression = rightKey
    val rTimeExpr: Expression = rightTime
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lKeyExpr, leftOutput)
      val lTime = BindReferences.bindReference(lTimeExpr, leftOutput)
      val rKey = BindReferences.bindReference(rKeyExpr, rightOutput)
      val rTime = BindReferences.bindReference(rTimeExpr, rightOutput)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOutput)
      // bind against nullable-widened payload attrs: unmatched left rows
      // emit a null payload even when the right column itself is
      // non-nullable, and a nullable=false BoundReference would skip the
      // null check and read garbage from the null slot
      val resultProj = UnsafeProjection.create(
        outAttrs, leftOutput ++ payloadAttrs.map(_.withNullability(true)))
      val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead right row not yet consumed (null = need to pull)
        private var rRow: InternalRow = _
        private var rKeyVal: Any = _
        private var rTimeVal: Any = _
        // latest right match: key it belongs to + its projected payload
        private var matchKey: Any = _
        private var matchPayload: InternalRow = _

        /** Pull the next right row with non-null key and time. */
        private def pullRight(): Boolean = {
          while (rIter.hasNext) {
            val r = rIter.next()
            val k = rKey.eval(r)
            val t = rTime.eval(r)
            if (k != null && t != null) {
              rRow = r
              // key/time values may point into the row buffer the iterator
              // reuses — the payload is copied on match; key is compared
              // before the next pull, so no copy is needed here
              rKeyVal = k
              rTimeVal = t
              return true
            }
          }
          false
        }

        /** Advance the right cursor to the last row with key == lk and
          * time <= lt; discards rows of smaller keys. */
        private def advance(lk: Any, lt: Any): Unit = {
          var continue = true
          while (continue && (rRow != null || pullRight())) {
            val cmp = keyOrdering.compare(rKeyVal, lk)
            if (cmp < 0) {
              rRow = null // smaller key: discard
            } else if (cmp == 0 && timeOrdering.compare(rTimeVal, lt) <= 0) {
              // deep-copy: lk may point into the reused left-row buffer
              // (UTF8String keys), and matchKey outlives this left row
              matchKey = InternalRow.copyValue(lk)
              matchPayload = payloadProj(rRow).copy()
              rRow = null // consumed as (so far) best match
            } else {
              continue = false // future key or future time: keep as lookahead
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey.eval(l)
          val lt = lTime.eval(l)
          if (lk != null && lt != null) advance(lk, lt)
          val matched = lk != null && lt != null &&
            matchKey != null && keyOrdering.compare(matchKey, lk) == 0
          resultProj(joined(l, if (matched) matchPayload else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
