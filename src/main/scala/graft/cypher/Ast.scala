package graft.cypher

/** openCypher AST — the subset our engine speaks (growing per round).
  *
  * Mirrors the reference's AST classes
  * (`/root/reference/src/query/frontend/ast/ast.hpp`): `CypherQuery` holds a
  * list of clauses + optional unions (`ast.hpp:2005` CypherUnion); patterns
  * are alternating node/edge atoms (`ast.hpp:1809` EdgeAtom); expressions are
  * a conventional operator tree evaluated with ternary NULL logic
  * (`src/query/interpret/eval.hpp:279`).
  */
object Ast {

  // ---------- expressions ----------
  sealed trait Expr
  final case class Lit(value: Any) extends Expr // null, Boolean, Long, Double, String
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class MapLit(items: Seq[(String, Expr)]) extends Expr
  final case class Var(name: String) extends Expr
  final case class Prop(of: Expr, key: String) extends Expr
  final case class Param(name: String) extends Expr

  /** Map projection `n {.k1, key: expr, var, .*}` (reference ast.hpp map
    * projection nodes) — lowers to a struct over the variable's frame. */
  sealed trait MapProjItem
  final case class ProjProp(key: String) extends MapProjItem
  final case class ProjKV(key: String, value: Expr) extends MapProjItem
  final case class ProjVar(name: String) extends MapProjItem
  case object ProjAll extends MapProjItem
  final case class MapProjection(variable: String, items: Seq[MapProjItem]) extends Expr

  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr // + - * / % ^ = <> < <= > >= AND OR XOR IN =~ CONTAINS STARTS ENDS
  final case class Not(e: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class FnCall(name: String, distinct: Boolean, args: Seq[Expr]) extends Expr
  final case class CountStar() extends Expr
  final case class CaseExpr(
      subject: Option[Expr],
      whens: Seq[(Expr, Expr)],
      default: Option[Expr]) extends Expr
  final case class Subscript(of: Expr, index: Expr) extends Expr
  final case class Slice(of: Expr, from: Option[Expr], to: Option[Expr]) extends Expr
  /** [x IN list WHERE pred | proj] */
  final case class ListComprehension(
      varName: String,
      list: Expr,
      where: Option[Expr],
      proj: Option[Expr]) extends Expr
  /** all/any/none/single(x IN list WHERE pred) */
  final case class Quantifier(kind: String, varName: String, list: Expr, pred: Expr) extends Expr
  /** reduce(acc = init, x IN list | expr) */
  final case class Reduce(acc: String, init: Expr, varName: String, list: Expr, step: Expr) extends Expr
  /** exists((n)-[:T]->(m)) or pattern predicate used directly in WHERE. */
  final case class PatternPredicate(
      pattern: PatternPart,
      negated: Boolean,
      /** True for the NAKED `WHERE (a)-->(b)` form — the reference
        * rejects NEW named variables there, while the exists()/EXISTS{}
        * wrappers may introduce them. */
      bare: Boolean = false) extends Expr
  /** Pattern comprehension `[(n)-[]->(m) WHERE pred | proj]` — RollUpApply
    * (operator.hpp:3185): collect the projection over pattern matches into
    * a list per input row. */
  final case class PatternComprehension(
      pattern: PatternPart,
      where: Option[Expr],
      proj: Expr) extends Expr
  /** `EXISTS { <clauses> [UNION <clauses>]… }` — the full-subquery form
    * (ast.hpp exists.hpp): true iff the inner query yields ≥1 row for the
    * current binding. Inner names shared with the outer scope correlate. */
  final case class ExistsSubquery(q: Query) extends Expr

  // ---------- patterns ----------
  sealed trait Direction
  case object OutDir extends Direction
  case object InDir extends Direction
  case object BothDir extends Direction

  /** `Name::Value` enum literal (EnumValueAccess; validated against the
    * graph's enum store at lowering time). */
  final case class EnumLit(enum: String, value: String) extends Expr

  /** `n:Label` label-test expression (LabelsTest, ast.hpp). */
  final case class HasLabel(e: Expr, label: String) extends Expr

  /** Planner-internal wrapper: `inner` references variables DELETEd
    * earlier in the statement — evaluating it on a row where any of them
    * is still bound raises the reference's "Trying to use a deleted
    * object" runtime error; NULL bindings (OPTIONAL MATCH no-op deletes)
    * pass through. */
  final case class DeletedGuard(inner: Expr, vars: Seq[String]) extends Expr

  final case class NodePattern(
      variable: Option[String],
      labels: Seq[String],
      props: Seq[(String, Expr)],
      /** `(n:A|B)` label ALTERNATION (memgraph label expressions): node
        * matches when it carries ANY of these; `labels` stays the
        * conjunction list. */
      orLabels: Seq[String] = Nil,
      /** True when the pattern carried a property-map token — `(n {})`
        * is distinct from `(n)` for the bound-variable-reuse check in
        * CREATE (an empty map on a bound node is still a syntax error in
        * the reference frontend). */
      hasPropsToken: Boolean = false)

  final case class RelPattern(
      variable: Option[String],
      types: Seq[String],
      props: Seq[(String, Expr)],
      direction: Direction,
      varLength: Option[(Option[Int], Option[Int])], // Some((min,max)) for *
      /** True when the bounds came from the bare `*n` form (no `..`):
        * shortest modes read that as an UPPER bound, while an explicit
        * `*n..n` stays exactly-n (the reference honors lower bounds on
        * BFS/shortest expansions). */
      bareBound: Boolean = false,
      /** Expansion mode after `*`: DFS (plain), BFS, WSHORTEST, ALLSHORTEST
        * (reference `EdgeAtom::Type`, ast.hpp:1809-1813). */
      mode: String = "DFS",
      /** `(e, n | expr)` weight lambda for WSHORTEST (ast.hpp EdgeAtom
        * `weight_lambda_`). */
      weight: Option[(String, String, Expr)] = None,
      /** Symbol receiving the accumulated weight (`total_weight_`). */
      totalVar: Option[String] = None,
      /** `(e, n [, p [, w]] | pred)` per-step filter lambda (ast.hpp:1899
        * `filter_lambda_`): an expansion into node n over edge e survives
        * iff pred holds. The optional third var binds the accumulated
        * path, the optional fourth (WSHORTEST only) the accumulated
        * weight including e. */
      filterLambda: Option[StepLambda] = None,
      /** Written `<-[…]->` (both arrowheads). Single-hop: undirected.
        * Var-length: either-direction steps, but the FIRST edge must
        * point into the left endpoint and the LAST edge into the right
        * one (TCK VarLengthAcceptance "mixed directions" semantics). */
      bothArrows: Boolean = false)

  /** Per-expansion lambda `(e, n [, p [, w]] | pred)` — `e` the traversed
    * edge, `n` its target node, `p` the accumulated path INCLUDING e/n,
    * `w` the accumulated weight including e (reference ast.hpp Lambda). */
  final case class StepLambda(
      e: String,
      n: String,
      path: Option[String],
      weightVar: Option[String],
      pred: Expr)

  /** node (rel node)* chain; optionally named (p = (...)). */
  final case class PatternPart(
      pathVar: Option[String],
      start: NodePattern,
      hops: Seq[(RelPattern, NodePattern)],
      shortest: Option[String] = None) // "shortestPath" | "allShortestPaths"

  // ---------- clauses ----------
  sealed trait Clause
  final case class Match(
      optional: Boolean,
      patterns: Seq[PatternPart],
      where: Option[Expr]) extends Clause
  final case class Unwind(list: Expr, as: String) extends Clause
  /** `LOAD CSV FROM file (WITH|NO) HEADER [IGNORE BAD] [DELIMITER d]
    * [QUOTE q] [NULLIF n] AS row` (reference LoadCsv, ast.hpp:3431). */
  final case class LoadCsvCl(
      file: Expr,
      withHeader: Boolean,
      ignoreBad: Boolean,
      delimiter: Option[Expr],
      quote: Option[Expr],
      nullif: Option[Expr],
      rowVar: String) extends Clause
  /** `CREATE ENUM Name VALUES { A, B, … }` (CreateEnumQuery,
    * ast.hpp:4131; storage enum_store.hpp). */
  final case class CreateEnumCl(name: String, values: Seq[String])
      extends Clause
  /** `CREATE/DROP [POINT|TEXT|VECTOR [EDGE]|EDGE|GLOBAL EDGE] INDEX
    * [name] [ON :L(p, …) | ON :(p, …)] [WITH CONFIG map]` — registers /
    * removes an [[graft.core.GraphState.IndexDef]] (scans don't need it:
    * Catalyst pushdown is the access-path analog; SHOW INDEX INFO and
    * the text/vector search procedures read the registry). */
  final case class IndexDdlCl(
      create: Boolean,
      kind: String,
      label: Option[String],
      props: Seq[String],
      name: Option[String],
      config: Option[Expr]) extends Clause
  /** `FREE MEMORY` / `ANALYZE GRAPH [DELETE STATISTICS]` — accepted
    * maintenance no-ops (storage GC / index statistics are
    * Catalyst/parquet concerns here). */
  final case class MaintenanceCl(what: String) extends Clause
  /** `SET/DELETE DESCRIPTION ON <target> ["text"]` — schema-description
    * metadata (reference server-side descriptions; descriptions.feature).
    * The entry mirrors [[graft.core.GraphState.DescEntry]] minus the
    * text (absent on DELETE). */
  /** `SET [GLOBAL] PARAMETER x=value` / `UNSET [GLOBAL] PARAMETER x` —
    * server-side parameter store (server_side_parameters.feature);
    * `$x` resolution falls back to it when the client supplied no
    * binding. */
  final case class ServerParamCl(
      set: Boolean,
      global: Boolean,
      name: String,
      value: Option[Expr]) extends Clause
  final case class DescriptionCl(
      set: Boolean,
      kind: String,
      labels: Seq[String],
      edgeType: Option[String],
      startLabels: Option[Seq[String]],
      endLabels: Option[Seq[String]],
      prop: Option[String],
      db: Option[String],
      text: Option[String]) extends Clause
  final case class ReturnItem(expr: Expr, as: Option[String])
  final case class ProjectionBody(
      distinct: Boolean,
      items: Seq[ReturnItem],
      star: Boolean,
      orderBy: Seq[(Expr, Boolean)], // (expr, ascending)
      skip: Option[Expr],
      limit: Option[Expr])
  final case class With(body: ProjectionBody, where: Option[Expr]) extends Clause
  final case class Return(body: ProjectionBody) extends Clause
  /** CALL name(args) YIELD cols (reference `CallProcedure`,
    * operator.hpp:2891). Args must be constant expressions. */
  final case class CallProc(
      name: String,
      args: Seq[Expr],
      /** (outputColumn, optional alias); empty = YIELD * (bind all). */
      yields: Seq[(String, Option[String])],
      /** `YIELD … WHERE pred` post-filter (procedure_call.feature). */
      where: Option[Expr] = None) extends Clause

  // ---------- mutation clauses (SURVEY.md §2.6) ----------
  /** CREATE patterns (`CreateNode` operator.hpp:411, `CreateExpand` :494). */
  final case class CreateCl(patterns: Seq[PatternPart]) extends Clause
  /** MERGE pattern with ON CREATE / ON MATCH SET (`Merge` operator.hpp:2579). */
  final case class MergeCl(
      pattern: PatternPart,
      onCreate: Seq[SetItem],
      onMatch: Seq[SetItem]) extends Clause
  sealed trait SetItem
  final case class SetProp(variable: String, key: String, value: Expr) extends SetItem
  final case class SetLabelsItem(variable: String, labels: Seq[String]) extends SetItem
  /** `SET n = {map}` (REPLACE) / `SET n += {map}` (UPDATE) — the reference's
    * SetProperties (operator.hpp:1539, Op::REPLACE/UPDATE). A NULL map value
    * removes the key (gql_behave update_clauses.feature semantics). */
  final case class SetAllProps(variable: String, value: Expr, update: Boolean) extends SetItem
  /** `SET n.p.k1.k2 = v` — the reference's SetNestedProperty
    * (operator.hpp:1490): path into a map-valued property, creating
    * intermediate maps on demand. */
  final case class SetNestedProp(
      variable: String,
      path: Seq[String],
      value: Expr,
      /** `SET n.p.k += {…}` — merge the map value into the existing one
        * (update semantics) instead of replacing it. */
      merge: Boolean = false) extends SetItem
  /** SET items (`SetProperty` operator.hpp:1448, `SetLabels` :1590). */
  final case class SetCl(items: Seq[SetItem]) extends Clause
  /** [DETACH] DELETE vars (`Delete` operator.hpp:1396). */
  /** [DETACH] DELETE exprs — bare variables, or entity-valued
    * expressions (`DELETE friends[0]`, `DELETE map.key`, TCK
    * DeleteAcceptance). */
  final case class DeleteCl(detach: Boolean, exprs: Seq[Expr]) extends Clause
  sealed trait RemoveItem
  final case class RemoveProp(variable: String, key: String) extends RemoveItem
  /** `REMOVE n.p.k1.k2` — RemoveNestedProperty (operator.hpp:1671). */
  final case class RemoveNestedProp(variable: String, path: Seq[String]) extends RemoveItem
  final case class RemoveLabelsItem(variable: String, labels: Seq[String]) extends RemoveItem
  /** REMOVE items (`RemoveProperty` operator.hpp:1630, `RemoveLabels` :1715). */
  final case class RemoveCl(items: Seq[RemoveItem]) extends Clause
  /** FOREACH (x IN list | update-clauses) (`Foreach` operator.hpp:3032). */
  final case class ForeachCl(
      variable: String,
      list: Expr,
      updates: Seq[Clause]) extends Clause
  /** CALL { subquery } (`Apply`, operator.hpp:3061): correlated via a
    * leading import `WITH var, …`, else uncorrelated (cartesian). */
  final case class CallSubquery(
      inner: SingleQuery,
      /** `CALL (a, b) { }` variable-scoped imports: None = legacy form
        * (imports via a leading `WITH a, b`); Some(Seq("*")) = all outer
        * variables; Some(Nil) = none. */
      scopeImports: Option[Seq[String]] = None,
      /** UNION branches inside the braces. */
      unions: Seq[(Boolean, SingleQuery)] = Nil) extends Clause

  // ---------- query ----------
  final case class SingleQuery(clauses: Seq[Clause])
  /** (all?, query) unions; hopsLimit = `USING HOPS LIMIT n` prefix
    * (ast.hpp:2086) — caps total edge traversals in fixpoint expansions. */
  final case class Query(
      first: SingleQuery,
      unions: Seq[(Boolean, SingleQuery)],
      hopsLimit: Option[Long] = None,
      /** `USING PERIODIC COMMIT n` prefix: batch results are identical
        * here (snapshot semantics), but per-batch commits make deletes
        * VISIBLE to later writes in the reference — access-after-delete
        * raises under the prefix where the same-transaction form
        * silently no-ops. */
      periodic: Boolean = false)
}
