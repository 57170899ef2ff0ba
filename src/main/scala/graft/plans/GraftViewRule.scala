package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.sources.{GraftCatalog, GraftViewMeta}

/** SQL-view INLINING for [[GraftCatalog]] views (r18): an
  * `UnresolvedRelation` that names a persisted graft view substitutes
  * with the view's parsed body, re-anchored to the view's CREATE-time
  * resolution context. Injected as an analyzer resolution rule
  * (`SparkSessionExtensions.injectResolutionRule` — the same seam
  * Iceberg's V2 views use), it runs in the analyzer's resolution
  * fixpoint AFTER the built-in relation resolution leaves unknown
  * names unresolved, so tables always win the name and NESTED views
  * substitute iteration by iteration.
  *
  * Inlining — not wrapping — is the point: after substitution the plan
  * is ordinary Catalyst, so column pruning and filter pushdown flow
  * through the view into the underlying DSv2 scans' zone-map/bloom
  * skipping with zero view-specific machinery.
  *
  * Context re-anchoring: a 1-part table name inside the body resolves
  * under the view's captured catalog+namespace, a 2-part name under
  * its captured catalog — wherever the view is read from (standard
  * persisted-view semantics). Names bound by a CTE inside the body (or
  * the reading query) shadow catalog objects and never substitute. */
case class GraftViewSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  /** Fast path (r19): this rule runs on EVERY analyzer fixpoint
    * iteration of every session built with the extensions, so the
    * expensive steps gate on cheap in-memory checks, cheapest first:
    * (1) the catalog probe — hashmap lookups against the
    * CatalogManager; (2) the catalog's store-level views-exist flag
    * ([[graft.sources.GraftStoreState.mayHoldViews]] — cached `true`
    * forever once seen; while `false` a durable store re-stats its
    * `_views/` dir so a SECOND PROCESS's first CREATE VIEW is still
    * picked up); (3) the CTE-shadow walk — computed at most once per
    * invocation, and only when a view could actually substitute. A
    * view-free query therefore analyzes with ZERO `lookupView` calls
    * and zero plan-wide CTE walks (GraftExtensionsSpec pins the probe
    * counter at zero). */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    var shadowed: Set[String] = null
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        candidate(u.multipartIdentifier) match {
          case Some((catName, cat, rest))
              if !(u.multipartIdentifier.length == 1 && {
                if (shadowed == null) shadowed = cteNames(plan)
                shadowed(u.multipartIdentifier.head.toLowerCase)
              }) =>
            lookup(cat, catName, rest).getOrElse(u)
          case _ => u
        }
    }
  }

  /** Every CTE-bound name anywhere in the plan (any scope): a relation
    * with such a 1-part name may be the CTE, so it never substitutes —
    * over-approximating scope only ever leaves a name to the built-in
    * CTE resolution, which owns it anyway. */
  private def cteNames(plan: LogicalPlan): Set[String] =
    plan.collect { case w: UnresolvedWith =>
      w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet

  private def graftCatalog(name: String): Option[GraftCatalog] = {
    val cm = spark.sessionState.catalogManager
    try {
      if (!cm.isCatalogRegistered(name)) None
      else cm.catalog(name) match {
        case g: GraftCatalog => Some(g)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The graft catalog that would own this name — None when the name
    * resolves to a non-graft catalog or the owning store cannot hold a
    * view (the fast-path gate: no disk I/O on this path). */
  private def candidate(parts: Seq[String])
      : Option[(String, GraftCatalog, Seq[String])] = {
    val cm = spark.sessionState.catalogManager
    val (catName, rest) =
      if (parts.length >= 2 && graftCatalog(parts.head).isDefined)
        (parts.head, parts.tail)
      else (cm.currentCatalog.name, parts)
    graftCatalog(catName).filter(_.store.mayHoldViews)
      .map((catName, _, rest))
  }

  private def lookup(cat: GraftCatalog, catName: String,
      rest: Seq[String]): Option[LogicalPlan] = {
    val ns =
      if (rest.length >= 2) rest.dropRight(1)
      else spark.sessionState.catalogManager.currentNamespace.toSeq
    cat.store.lookupView(ns, rest.last).map(viewPlan(catName, _))
  }

  private def viewPlan(catName: String, m: GraftViewMeta): LogicalPlan = {
    val parsed = spark.sessionState.sqlParser.parsePlan(m.sql)
    val bodyCtes = cteNames(parsed)
    // re-anchor: unqualified names inside the body mean the tables they
    // meant at CREATE time, wherever the view is read from
    val anchored = parsed.transformUp {
      case u: UnresolvedRelation =>
        val p = u.multipartIdentifier
        if (p.length == 1 && bodyCtes(p.head.toLowerCase)) u
        else if (p.length == 1)
          u.copy(multipartIdentifier =
            (m.currentCatalog +: m.currentNamespace) :+ p.head)
        else if (!spark.sessionState.catalogManager
            .isCatalogRegistered(p.head))
          u.copy(multipartIdentifier = m.currentCatalog +: p)
        else u
    }
    val aliased =
      if (m.columnAliases.nonEmpty)
        Project(m.columnAliases.zip(m.queryColumnNames).map {
          case (a, q) => Alias(UnresolvedAttribute.quoted(q), a)()
        }, anchored)
      else anchored
    // the alias carries the view's fully-qualified name, so `v.col`
    // qualification and EXPLAIN read naturally
    SubqueryAlias((catName +: m.namespace) :+ m.name, aliased)
  }
}
