package graft.sparql

/** Algebra for the SPARQL subset the reference engine exercises
  * (SURVEY.md §2.3 R1–R11: BGP joins, GRAPH scoping, projection with
  * expression aliases, FILTER with comparisons and extension functions,
  * FILTER (NOT) EXISTS, aggregates, ASK, CONSTRUCT). The de-facto feature
  * contract is `/root/reference/tests/oxigraph_adapter_test.rs`.
  *
  * Terms carry *plain* lexical values (no angle brackets / quotes) —
  * matching the engine's canonical quads DataFrame; wire-format
  * serialization is applied only at result boundaries (graft.core.Terms).
  */
sealed trait Term extends Product with Serializable
final case class Var(name: String) extends Term
final case class Iri(value: String) extends Term
final case class Lit(value: String) extends Term

/** A triple pattern with optional GRAPH scope (None = match any graph —
  * the engine's quads table is a quad log; the reference always queries
  * through `GRAPH ?g {}` / `GRAPH <iri> {}` wrappers, so un-scoped
  * patterns matching all graphs reproduces its observable behavior,
  * `janusql_parser.rs:548-558`).
  */
final case class QuadPattern(s: Term, p: Term, o: Term, g: Option[Term])

// ---- property paths ----------------------------------------------------

/** Property-path algebra: direct links, inverse (`^p`), sequence
  * (`p1/p2`), alternative (`p1|p2`), one-or-more (`p+`), zero-or-more
  * (`p*`), zero-or-one (`p?`), and negated property sets
  * (`!iri`, `!(iri1|^iri2|…)` — `fwd` are forward-excluded predicate
  * IRIs, `inv` inverse-excluded ones, SPARQL 1.1 §9.1 PathNegatedSet).
  * Zero-length paths (`*`/`?`) relate every node of the scoped graph —
  * plus a constant endpoint, if any — to itself (§18.4 ZeroLengthPath).
  */
sealed trait Path extends Product with Serializable
final case class PLink(iri: String) extends Path
final case class PInverse(p: Path) extends Path
final case class PSeq(l: Path, r: Path) extends Path
final case class PAlt(l: Path, r: Path) extends Path
final case class PPlus(p: Path) extends Path
final case class PStar(p: Path) extends Path
final case class PZeroOrOne(p: Path) extends Path
final case class PNeg(fwd: Seq[String], inv: Seq[String]) extends Path

/** A subject–path–object pattern (constant GRAPH scope only). */
final case class PathPattern(s: Term, path: Path, o: Term, g: Option[Term])

// ---- FILTER / projection expressions ----------------------------------

sealed trait Expr extends Product with Serializable
final case class EVar(name: String) extends Expr
/** String literal (may still have a numeric lexical form, e.g. "25"). */
final case class EStr(value: String) extends Expr
/** Numeric literal token (unquoted in the query text). */
final case class ENum(value: Double) extends Expr
final case class EIriRef(value: String) extends Expr
final case class ECall(iri: String, args: Seq[Expr]) extends Expr
/** op ∈ {=, !=, <, <=, >, >=} */
final case class ECmp(op: String, l: Expr, r: Expr) extends Expr
final case class EAnd(l: Expr, r: Expr) extends Expr
final case class EOr(l: Expr, r: Expr) extends Expr
final case class ENot(e: Expr) extends Expr
/** op ∈ {+, -, *, /} */
final case class EArith(op: String, l: Expr, r: Expr) extends Expr
final case class EExists(pattern: GroupPattern, negated: Boolean) extends Expr
/** BOUND(?v) — true iff the variable is bound in the solution (the
  * standard companion of OPTIONAL; Oxigraph exposes it, so reference
  * users have it). */
final case class EBound(name: String) extends Expr
/** Aggregate reference inside a HAVING condition (COUNT(?x) > 5). */
final case class EAggRef(agg: Aggregate) extends Expr
/** `?x IN (e1, e2, …)` / `?x NOT IN (…)`. */
final case class EIn(e: Expr, items: Seq[Expr], negated: Boolean) extends Expr
/** Compiler-internal marker: a variable known to be UNBOUND in the
  * evaluation frame (compiles to NULL in every view). Produced only by
  * the compiler's variable-renaming passes, never by the parser. */
case object EUnbound extends Expr

/** Inline data block: `VALUES (?x ?y) { ("a" 1) (UNDEF "z") ... }`.
  * A `None` cell is UNDEF — the variable is unbound in that row and is
  * compatible with any binding (SPARQL §10.2). */
final case class ValuesBlock(vars: Seq[String], rows: Seq[Seq[Option[Term]]]) {
  /** Variables with at least one UNDEF cell — may be null after the
    * VALUES join, so downstream joins need compatibility semantics. */
  def undefVars: Set[String] =
    vars.zipWithIndex.collect {
      case (v, i) if rows.exists(_(i).isEmpty) => v
    }.toSet
}

// ---- group pattern -----------------------------------------------------

/** One element of a group graph pattern, in SOURCE ORDER. SPARQL 1.1
  * §18.2.2.6 translates a group left-to-right: join elements (BGPs,
  * paths, unions, VALUES, subqueries) fold in with Join, OPTIONAL with
  * LeftJoin, MINUS with Minus, BIND with Extend — so a BIND between two
  * patterns scopes over exactly the elements before it, and an OPTIONAL
  * or MINUS after a BIND sees the BIND-introduced variable. FILTERs are
  * the one exception: they scope over the WHOLE group regardless of
  * position, so they stay on [[GroupPattern.filters]]. */
sealed trait GroupElem extends Product with Serializable
/** A run of consecutive triple patterns (a BGP — join order inside is
  * free, so the compiler picks constants-first greedy chaining). */
final case class GBgp(patterns: Seq[QuadPattern]) extends GroupElem
final case class GPath(pattern: PathPattern) extends GroupElem
final case class GOptional(group: GroupPattern) extends GroupElem
final case class GMinus(group: GroupPattern) extends GroupElem
final case class GBind(expr: Expr, alias: String) extends GroupElem
final case class GUnion(alts: Seq[GroupPattern]) extends GroupElem
final case class GValues(block: ValuesBlock) extends GroupElem
final case class GSubquery(query: SelectQuery) extends GroupElem
/** A nested group graph pattern (`{ … }` / `GRAPH x { … }`): evaluated
  * as its own group — crucially its FILTERs scope to ITS group, not the
  * enclosing one — then joined in (§18.2.2.6 translates GroupGraphPattern
  * to Join(G, Translate(inner))). */
final case class GGroup(group: GroupPattern) extends GroupElem

/** Group graph pattern: ordered elements plus FILTER constraints
  * (filters scope over the whole group — §18.2.2.2 collects them group-
  * wide before translation). Nested `GRAPH x {}` blocks are flattened
  * into per-pattern scopes at parse time. The kind-selector views
  * (`patterns`, `optionals`, …) are derived from `elems` — the ordered
  * list is the single source of truth. */
final case class GroupPattern(elems: Seq[GroupElem], filters: Seq[Expr]) {
  def patterns: Seq[QuadPattern] =
    elems.collect { case GBgp(ps) => ps }.flatten
  def optionals: Seq[GroupPattern] = elems.collect { case GOptional(g) => g }
  def binds: Seq[(Expr, String)] =
    elems.collect { case GBind(e, a) => (e, a) }
  def unions: Seq[Seq[GroupPattern]] = elems.collect { case GUnion(a) => a }
  def minuses: Seq[GroupPattern] = elems.collect { case GMinus(g) => g }
  def values: Seq[ValuesBlock] = elems.collect { case GValues(v) => v }
  def subqueries: Seq[SelectQuery] = elems.collect { case GSubquery(q) => q }
  def paths: Seq[PathPattern] = elems.collect { case GPath(p) => p }

  /** All variables bound by group elements (not filter-only vars), in
    * first-binding order. */
  def boundVars: Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    elems.foreach {
      case GBgp(ps) => ps.foreach { qp =>
        Seq(qp.s, qp.p, qp.o).foreach {
          case Var(n) => out += n
          case _      => ()
        }
        qp.g.foreach { case Var(n) => out += n; case _ => () }
      }
      case GPath(pp) => Seq(pp.s, pp.o).foreach {
        case Var(n) => out += n
        case _      => ()
      }
      case GUnion(alts)  => alts.foreach(out ++= _.boundVars)
      case GBind(_, v)   => out += v
      case GOptional(g)  => out ++= g.boundVars
      case GGroup(g)     => out ++= g.boundVars
      case GMinus(_)     => () // MINUS binds nothing in the outer group
      case GValues(vb)   => out ++= vb.vars
      case GSubquery(sq) =>
        sq.projection match {
          case Star => out ++= sq.where.boundVars
          case Items(items) => items.foreach {
            case VarItem(n)     => out += n
            case ExprItem(_, a) => out += a
            case AggItem(_, a)  => out += a
          }
        }
    }
    out.toSeq
  }
}

// ---- projection --------------------------------------------------------

/** func ∈ {COUNT, SUM, AVG, MIN, MAX, GROUP_CONCAT, SAMPLE}; arg None =
  * COUNT(*). `sep` is GROUP_CONCAT's SEPARATOR (default single space per
  * the SPARQL spec). */
final case class Aggregate(func: String, arg: Option[Expr],
    distinct: Boolean, sep: Option[String] = None)

sealed trait SelectItem extends Product with Serializable
final case class VarItem(name: String) extends SelectItem
final case class ExprItem(expr: Expr, alias: String) extends SelectItem
final case class AggItem(agg: Aggregate, alias: String) extends SelectItem

sealed trait Projection extends Product with Serializable
case object Star extends Projection
final case class Items(items: Seq[SelectItem]) extends Projection

// ---- query forms -------------------------------------------------------

/** ORDER BY key; `desc` from DESC(expr), default ascending. */
final case class OrderKey(expr: Expr, desc: Boolean)

sealed trait Query extends Product with Serializable {
  def where: GroupPattern
}
final case class SelectQuery(
    projection: Projection,
    where: GroupPattern,
    groupBy: Seq[String],
    distinct: Boolean = false,
    orderBy: Seq[OrderKey] = Nil,
    limit: Option[Long] = None,
    offset: Option[Long] = None,
    having: Seq[Expr] = Nil) extends Query
final case class AskQuery(where: GroupPattern) extends Query
final case class ConstructQuery(
    template: Seq[QuadPattern],
    where: GroupPattern) extends Query
/** DESCRIBE ?v WHERE {…} / DESCRIBE <iri>: all statements whose subject
  * is a described resource (simple subject-based description). A
  * constant-only DESCRIBE has an empty WHERE. */
final case class DescribeQuery(
    targets: Seq[Term],
    where: GroupPattern) extends Query
