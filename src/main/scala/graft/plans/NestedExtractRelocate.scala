package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Optimizer rule: keep a graftserver JOIN pushable when Catalyst's
  * NestedColumnAliasing has rewritten a nested order/filter key into an
  * extraction Project INSIDE a join input — `ORDER BY meta.score LIMIT n`
  * over a join becomes `Project(..., meta._1 AS _extract__1, rel)` below
  * the Join, and Spark's pushDownJoin requires ATTRIBUTE-ONLY projections
  * on both inputs, so the whole `$lookup` pipeline used to be forfeited.
  *
  * The fix absorbs the extraction INTO the relation: the scan grows a
  * derived flat column whose `column_mapping` entry points at the nested
  * document path (`_extract__1 -> meta._1`) — the r14 server-transport
  * mapping resolves pushed filters, group keys, TopN orders, and join
  * keys through it, and the reader decodes the subfield directly (the
  * nested projected-decode path, so ONLY `meta._1` is read, not the whole
  * struct). The Project becomes attribute-only, the join pushes, and the
  * `ORDER BY` reaches the pushed join's `$sort`+`$limit` tail.
  *
  * Stable under the fixed-point batch: after the rewrite there is no
  * ExtractValue left for NestedColumnAliasing to alias, and this rule
  * only matches Projects containing extraction aliases. The derived
  * column reuses the alias's exprId, so every parent reference resolves
  * unchanged. Fires only under a Join whose legs are graftserver
  * relations on one connection (the only place the projection shape
  * costs anything); plain scans keep Spark's own nested-schema pruning.
  */
object NestedExtractRelocate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      try conf.getConfString(graft.GraftConf.JoinPushdownConf, "false").toBoolean
      catch { case _: Exception => false }
    if (!enabled) plan
    else plan.transformUp {
      case j: Join if graftLegs(j) =>
        val newLeft = relocate(j.left)
        val newRight = relocate(j.right)
        if (newLeft.eq(j.left) && newRight.eq(j.right)) j
        else j.copy(left = newLeft, right = newRight)
    }
  }

  private def graftLegs(j: Join): Boolean = {
    def ok(p: LogicalPlan): Boolean = {
      val leaves = p.collectLeaves()
      leaves.nonEmpty && leaves.forall {
        case r: DataSourceV2Relation =>
          r.table.isInstanceOf[graft.server.GraftServerTable]
        case _ => false
      }
    }
    ok(j.left) && ok(j.right)
  }

  private def relocate(leg: LogicalPlan): LogicalPlan = leg match {
    case p @ Project(projectList, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[graft.server.GraftServerTable] &&
          projectList.exists(isExtractAlias(_, rel)) =>
      val extracts = projectList.collect {
        case a @ Alias(chain, _) if isExtract(chain, rel) => a
      }
      val existing = Option(rel.options.get("column_mapping"))
        .map(graft.source.ColumnMapping.parse).getOrElse(Map.empty[String, String])
      val schemaNames = rel.schema.fieldNames.toSet
      // refuse on any name collision with a real column or between aliases
      val names = extracts.map(_.name)
      if (names.exists(schemaNames.contains) || names.distinct.size != names.size)
        return leg
      val derived = extracts.flatMap { a =>
        docPathOf(a.child).map { path =>
          val head = path.split('.').head
          val mapped = existing.get(head)
            .map(h => (h +: path.split('.').toSeq.tail).mkString("."))
            .getOrElse(path)
          (a, mapped)
        }
      }
      if (derived.size != extracts.size) return leg
      val newSchema = StructType(rel.schema.fields ++
        derived.map { case (a, _) => StructField(a.name, a.dataType) })
      val newMapping = existing ++ derived.map { case (a, p2) => a.name -> p2 }
      val mappingJson = {
        import org.json4s.JsonDSL._
        import org.json4s.jackson.JsonMethods
        JsonMethods.compact(JsonMethods.render(
          newMapping.foldLeft(org.json4s.JObject()) { case (o, (k, v)) =>
            o ~ (k -> v) }))
      }
      val newOpts = new CaseInsensitiveStringMap(
        (rel.options.asScala.toMap + ("column_mapping" -> mappingJson)).asJava)
      val newTable = new graft.server.GraftServerTable(newSchema,
        newOpts.asScala.toMap)
      val newAttrs = derived.map { case (a, _) =>
        AttributeReference(a.name, a.dataType, nullable = true)(exprId = a.exprId)
      }
      val newRel = rel.copy(table = newTable,
        output = rel.output ++ newAttrs, options = newOpts)
      val byId = newAttrs.map(at => at.exprId -> at).toMap
      val newList = projectList.map {
        case a: Alias if byId.contains(a.exprId) => byId(a.exprId)
        case other => other
      }
      Project(newList, newRel)
    case _ => leg
  }

  private def isExtractAlias(e: NamedExpression, rel: DataSourceV2Relation): Boolean =
    e match {
      case Alias(chain, _) => isExtract(chain, rel)
      case _ => false
    }

  /** A pure GetStructField chain rooted at one of the relation's own
    * struct columns (no arrays, no maps — those change row counts or
    * need element semantics the flat mapping cannot spell).
    */
  private def isExtract(e: Expression, rel: DataSourceV2Relation): Boolean =
    e match {
      case GetStructField(child, _, _) => isExtract(child, rel) ||
        (child match {
          case a: AttributeReference => rel.outputSet.contains(a)
          case _ => false
        })
      case _ => false
    }

  /** Dotted document path of the chain (field names from the struct
    * schemas, root column first). */
  private def docPathOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case g @ GetStructField(child, ord, _) =>
      docPathOf(child).map(_ + "." + g.childSchema(ord).name)
    case _ => None
  }
}
