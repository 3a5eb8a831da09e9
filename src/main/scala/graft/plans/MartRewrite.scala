package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Transparent MATERIALIZED-VIEW query rewrite — the optimizer half of
  * incremental view maintenance (Oracle/Calcite's aggregate rewrite;
  * Databricks' MV routing): a count/sum aggregate over the FACT table is
  * silently re-planned to read the maintained mart
  * ([[graft.ops.LakeOps.maintainAggMart]]'s (key, n_rows, total)
  * schema), turning an O(fact) scan into an O(groups) one. The query
  * text doesn't change; the plan does — which is the whole point of
  * maintaining the mart.
  *
  * Soundness contract: count and sum are the self-maintainable
  * aggregates the mart stores EXACTLY (`total` accumulates associative
  * DECIMAL partials, so `CAST(total AS DOUBLE)` is bit-for-bit the
  * from-scratch [[graft.ops.ExactSums.dsum]]); the rewrite fires only on
  * the precise shapes it can prove — a single grouping attribute equal
  * to the registered key, `count(1)` (non-distinct), and the dsum cast
  * tower over the registered value column — anything else (other
  * aggregates, filters, expressions over the key) is left untouched.
  * Freshness is the registration's contract: [[register]] snapshots the
  * mart's CURRENT version (register after each maintenance cycle, the
  * allowed-staleness model every MV rewriter documents); fact-table
  * identity is recognized by scan paths under the registered root, so
  * only reads of THAT manifest table rewrite.
  */
object MartRewrite extends Rule[LogicalPlan] {

  private final case class Reg(
      factRoot: String,
      keyCol: String,
      valueCol: String,
      martPlan: LogicalPlan)

  private val regs = new java.util.concurrent.ConcurrentHashMap[String, Reg]()

  /** Route future count/sum aggregates on `factRoot` (grouped by
    * `keyCol`, summing `valueCol`) to the mart at `martRoot`, as of the
    * mart's CURRENT version. Re-register after each maintenance cycle
    * to advance the snapshot. Also injects the rule (idempotently). */
  def register(spark: SparkSession, factRoot: String, keyCol: String,
      valueCol: String, martRoot: String): Unit = {
    val martPlan = GraftSqlBridge.analyzed(
      graft.sources.ManifestTable.read(spark, martRoot))
    require(Seq(keyCol, "n_rows", "total").forall(c => martPlan.output.exists(_.name == c)),
      s"$martRoot is not a maintained (key, n_rows, total) agg mart for key '$keyCol'")
    regs.put(factRoot, Reg(factRoot, keyCol, valueCol, martPlan))
    if (!spark.experimental.extraOptimizations.contains(MartRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MartRewrite
  }

  /** Drop a registration (tests; decommissioned marts). */
  def deregister(factRoot: String): Unit = { regs.remove(factRoot); () }

  /** The registered fact table whose files this subtree scans, if any:
    * a LogicalRelation (under an attribute-only Project, the shape
    * column pruning leaves) whose every path sits under one root. */
  private def scanOf(plan: LogicalPlan): Option[Reg] = plan match {
    case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
      scanOf(p.child)
    case lr: LogicalRelation => lr.relation match {
      case fsr: HadoopFsRelation =>
        val paths = fsr.location.rootPaths.map(_.toUri.getPath)
        regs.values().asScala.find(r =>
          paths.nonEmpty && paths.forall(_.startsWith(r.factRoot + "/")))
      case _ => None
    }
    case _ => None
  }

  /** The mart-side replacement for one aggregate output, keeping the
    * original name AND exprId so nothing upstream re-resolves. */
  private def replacement(e: NamedExpression, reg: Reg,
      key: Attribute): Option[NamedExpression] = {
    def mart(c: String): Attribute = reg.martPlan.output.find(_.name == c).get
    e match {
      case a: AttributeReference if a.name == reg.keyCol =>
        Some(Alias(mart(reg.keyCol), a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, name) if !ae.isDistinct =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) =>
            Some(Alias(mart("n_rows"), name)(exprId = al.exprId))
          case _ => None
        }
      case al @ Alias(c: Cast, name) if c.dataType == DoubleType =>
        c.child match {
          case ae: AggregateExpression if !ae.isDistinct =>
            ae.aggregateFunction match {
              case Sum(inner: Cast, _) => inner match {
                case Cast(attr: AttributeReference, dt: DecimalType, _, _)
                    if attr.name == reg.valueCol &&
                      dt.precision == 18 && dt.scale == 4 =>
                  Some(Alias(Cast(mart("total"), DoubleType), name)(exprId = al.exprId))
                case _ => None
              }
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (regs.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
        scanOf(child) match {
          case Some(reg) if g.name == reg.keyCol =>
            val outs = aggExprs.map(replacement(_, reg, g))
            if (outs.forall(_.isDefined))
              Project(outs.map(_.get), reg.martPlan)
            else agg
          case _ => agg
        }
    }
  }
}
