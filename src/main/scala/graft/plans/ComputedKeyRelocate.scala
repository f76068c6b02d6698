package graft.plans

import graft.query.ComputedCol

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Optimizer rule (r17): absorb an INT-EXACT bin expression —
  * `pmod(col, n)` / `col % n` over a graftserver relation's Int/Long
  * column — into the relation as a DERIVED column
  * ([[graft.query.ComputedCol]], the `computed_columns` option), so a
  * bin key computed in the query no longer blocks any pushdown that
  * needs attribute-only leg shapes:
  *
  *  - `events.groupBy(pmod($"ts", 600))...` folds as ONE
  *    `$match`+`$set`+`$group` pipeline per namespace instead of
  *    shipping every row to a Spark aggregate;
  *  - `events.withColumn("bkt", pmod(..)).join(dim, $"bkt" === ...)`
  *    keeps the `$lookup` push (Spark's pushDownJoin requires
  *    attribute-only projections on both inputs — one computed alias
  *    used to forfeit the join), composing with the r17 range
  *    conjuncts for derived-bin interval/as-of joins WITHOUT
  *    materializing the bin;
  *  - plain reads compute the value at decode (reader-injected; the
  *    wire never ships it).
  *
  * The surface is deliberately the two functions whose server
  * arithmetic is EXACT for every int64 (`$mod`-based; see
  * [[ComputedCol]] for why `floor(col / n)` is refused), and the
  * capture requires `assume_uniform_storage` — `$set` computes on
  * STORED values, so a foreign non-numeric storage must be excluded
  * before the pushed form can replace Spark's read-value arithmetic
  * (both transports then fail loud on one, the mixed-storage stance).
  * Relations already carrying an `unwind_path` refuse (the unwind
  * readers do not run the injection seam); the scan builder refuses
  * every OTHER pushdown that would address the synthetic field in
  * find-land, where no `$set` exists (filters stay residual, plain
  * TopN/min-max/sample/split keys refuse — GraftServerScanBuilder's
  * computed gates).
  *
  * Stable in the fixed-point batch: after the rewrite the alias is an
  * attribute, and the rule only matches Projects containing renderable
  * bin aliases. The derived column reuses the alias's exprId, so every
  * parent reference resolves unchanged.
  */
object ComputedKeyRelocate extends Rule[LogicalPlan] {

  /** Escape hatch + A/B toggle (DiagChain measures pushed vs unpushed). */
  val ConfKey = "spark.graft.computed_key_pushdown"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      try conf.getConfString(ConfKey, "true").toBoolean
      catch { case _: Exception => true }
    if (!enabled) plan else rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // a surviving computed alias: Project(..., bkt = pmod(col, n), ...)
    // over [Filter]* over the relation (join legs, plain selects)
    case p @ Project(projectList, child) =>
      spineRel(child) match {
        case Some(rel) if eligible(rel) &&
            projectList.exists(e => aliasBin(e, rel).isDefined) =>
          relocateProject(p, projectList, child, rel)
        case _ => p
      }
    // CollapseProject folds single-use aliases into the Aggregate:
    // groupBy(pmod(col, n)) arrives as a grouping EXPRESSION — absorb
    // each distinct bin and substitute its attribute, so the grouped
    // pushdown sees a plain column key and the whole
    // $match+$set+$group folds server-side
    case agg: Aggregate =>
      spineRel(agg.child) match {
        case Some(rel) if eligible(rel) &&
            agg.groupingExpressions.exists(g =>
              binOf(stripAlias(g), rel).isDefined) =>
          relocateAggregate(agg, agg.child, rel)
        case _ => agg
      }
  }

  private def eligible(rel: DataSourceV2Relation): Boolean =
    Option(rel.options.get("assume_uniform_storage")).exists(_.toBoolean) &&
      !rel.options.containsKey("unwind_path") &&
      // multi-collection file scans carry per-entry query/mapping
      // overrides the injection seam does not compose with — refuse
      !rel.options.containsKey("collections")

  /** The graft relation (either transport — the file arm evaluates the
    * SAME stored-value arithmetic at its injection seam) under a chain
    * of Filters / attribute-only Projects that do not prune the bins'
    * future home (the rewrite threads the new attribute through each). */
  private def spineRel(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case rel: DataSourceV2Relation
        if rel.table.isInstanceOf[graft.server.GraftServerTable] ||
          rel.table.isInstanceOf[graft.source.GraftTable] => Some(rel)
    case Filter(_, ch) => spineRel(ch)
    case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      spineRel(ch)
    case _ => None
  }

  /** Rebuild the spine over the rewritten relation, adding `newAttrs`
    * to every pass-through Project so the derived columns flow up. */
  private def rebuildSpine(p: LogicalPlan, newRel: DataSourceV2Relation,
      newAttrs: Seq[AttributeReference]): LogicalPlan = p match {
    case _: DataSourceV2Relation => newRel
    case f @ Filter(_, ch) => f.copy(child = rebuildSpine(ch, newRel, newAttrs))
    case pr @ Project(pl, ch) =>
      Project(pl ++ newAttrs, rebuildSpine(ch, newRel, newAttrs))
    case other => other
  }

  /** Absorb `bins` ((name, exprId, bin)) into the relation; None on a
    * name collision. Returns (rewritten relation, new attributes in
    * bin order). */
  private def absorb(rel: DataSourceV2Relation,
      bins: Seq[(String, ExprId, Bin)]):
      Option[(DataSourceV2Relation, Seq[AttributeReference])] = {
    val existing = Option(rel.options.get("column_mapping"))
      .map(graft.source.ColumnMapping.parse).getOrElse(Map.empty[String, String])
    val prior = ComputedCol.fromOptions(rel.options.asScala.toMap)
    val schemaNames = rel.schema.fieldNames.toSet
    val names = bins.map(_._1)
    // refuse on any collision with a real column, a prior computed
    // column, or between the new names — and never shadow a MAPPED doc
    // field another column reads
    if (names.exists(schemaNames.contains) || names.distinct.size != names.size ||
        names.exists(n => prior.exists(_.out == n)) ||
        names.exists(existing.valuesIterator.toSet.contains))
      return None
    val computed = bins.map { case (name, _, b) =>
      ComputedCol(name, b.fn, existing.getOrElse(b.src.name, b.src.name), b.n,
        if (b.dataType == IntegerType) "int" else "long")
    }
    val dts = bins.map(_._3.dataType)
    val newSchema = StructType(rel.schema.fields ++
      names.zip(dts).map { case (n, t) => StructField(n, t) })
    val newOpts = new CaseInsensitiveStringMap((rel.options.asScala.toMap +
      (ComputedCol.OptionKey -> ComputedCol.render(prior ++ computed))).asJava)
    val newTable: org.apache.spark.sql.connector.catalog.Table =
      if (rel.table.isInstanceOf[graft.server.GraftServerTable])
        new graft.server.GraftServerTable(newSchema, newOpts.asScala.toMap)
      else new graft.source.GraftTable(newSchema, newOpts.asScala.toMap)
    val newAttrs = bins.map { case (name, id, b) =>
      AttributeReference(name, b.dataType, nullable = true)(exprId = id)
    }
    Some((rel.copy(table = newTable,
      output = rel.output ++ newAttrs, options = newOpts), newAttrs))
  }

  private def relocateProject(p: Project, projectList: Seq[NamedExpression],
      child: LogicalPlan, rel: DataSourceV2Relation): LogicalPlan = {
    val aliased = projectList.flatMap(e => aliasBin(e, rel).map(e -> _))
    val bins = aliased.map { case (a, b) =>
      (a.name, a.exprId, b)
    }
    absorb(rel, bins) match {
      case None => p
      case Some((newRel, newAttrs)) =>
        val byId = newAttrs.map(at => at.exprId -> at).toMap
        val newList = projectList.map {
          case a: Alias if byId.contains(a.exprId) => byId(a.exprId)
          case other => other
        }
        Project(newList, rebuildSpine(child, newRel, newAttrs))
    }
  }

  private def relocateAggregate(agg: Aggregate, child: LogicalPlan,
      rel: DataSourceV2Relation): LogicalPlan = {
    // distinct bin expressions among the grouping expressions; each
    // takes its aggregate-list alias's name when one exists (plan
    // readability), else a fresh synthetic name
    val rawBins: Seq[(Expression, Bin)] = agg.groupingExpressions
      .map(stripAlias).flatMap(g => binOf(g, rel).map(g -> _))
    val distinctBins = rawBins.foldLeft(Seq.empty[(Expression, Bin)]) {
      case (acc, (e, b)) =>
        if (acc.exists(_._1.semanticEquals(e))) acc else acc :+ (e, b)
    }
    if (distinctBins.isEmpty) return agg
    val taken = scala.collection.mutable.Set[String](
      rel.schema.fieldNames.toIndexedSeq: _*)
    def freshName(): String = {
      var i = 0
      while (taken.contains(s"__graft_bin$i")) i += 1
      val n = s"__graft_bin$i"; taken += n; n
    }
    val named = distinctBins.map { case (e, b) =>
      val name = agg.aggregateExpressions.collectFirst {
        case a: Alias if a.child.semanticEquals(e) &&
            !taken.contains(a.name) => a.name
      }.getOrElse(freshName())
      taken += name
      (e, b, name)
    }
    absorb(rel, named.map { case (_, b, n) =>
      (n, NamedExpression.newExprId, b) }) match {
      case None => agg
      case Some((newRel, newAttrs)) =>
        val subst: Seq[(Expression, AttributeReference)] =
          named.map(_._1).zip(newAttrs)
        def replace(e: Expression): Expression = e.transformDown {
          case x if subst.exists(_._1.semanticEquals(x)) =>
            subst.find(_._1.semanticEquals(x)).get._2
        }
        agg.copy(
          groupingExpressions = agg.groupingExpressions.map(replace),
          aggregateExpressions = agg.aggregateExpressions
            .map(replace(_).asInstanceOf[NamedExpression]),
          child = rebuildSpine(child, newRel, newAttrs))
    }
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _) => c
    case other => other
  }

  /** A renderable bin: fn + source attribute + positive divisor; the
    * bin's Spark type is the EXPRESSION's (int or long). */
  private final case class Bin(fn: String, src: AttributeReference, n: Long,
      dataType: org.apache.spark.sql.types.DataType)

  private def aliasBin(e: NamedExpression, rel: DataSourceV2Relation): Option[Bin] =
    e match {
      case Alias(child, _) => binOf(child, rel)
      case _ => None
    }

  /** `pmod(col, n)` / `col % n` over the relation's own Int/Long column
    * with a POSITIVE integer literal — optionally through a widening
    * int→long cast (exact). */
  private def binOf(child: Expression, rel: DataSourceV2Relation): Option[Bin] = {
    val (fn, l, r) = child match {
      case pm: Pmod => ("pmod", pm.left, pm.right)
      case rm: Remainder => ("mod", rm.left, rm.right)
      case _ => return None
    }
    val srcAttr = l match {
      case a: AttributeReference => Some(a)
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case a: AttributeReference if a.dataType == IntegerType => Some(a)
          case _ => None
        }
      case _ => None
    }
    val lit: Option[Long] = r match {
      case Literal(n: Int, IntegerType) => Some(n.toLong)
      case Literal(n: Long, LongType) => Some(n)
      case Cast(Literal(n: Int, IntegerType), LongType, _, _) => Some(n.toLong)
      case _ => None
    }
    for {
      a <- srcAttr
      if rel.outputSet.contains(a) &&
        (a.dataType == IntegerType || a.dataType == LongType)
      n <- lit
      // upper bound (ADVICE r17): the pmod WIRE form adds n after the
      // inner $mod — above 2^62 that $add can overflow int64 on a real
      // server where Spark's branchy Pmod never does, so the int-exact
      // contract holds only below the bound (mod's wire form has no
      // add, but one shared conservative gate keeps the surface simple)
      if n > 0 && n <= graft.query.ComputedCol.MaxPmodDivisor
    } yield Bin(fn, a, n, child.dataType)
  }
}
