package graft.sparql

import graft.core.Terms
import graft.functions.Extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles the SPARQL-subset algebra (Ast.scala) into DataFrame plans
  * over the canonical quads table
  * `(timestamp LONG, subject, predicate, object, graph STRING)`.
  *
  * Design (SURVEY.md §2.3, §4.2): declare everything with DataFrame ops
  * and let Catalyst do pushdown/pruning/join-order refinement. The one
  * planning decision made here — because Catalyst cannot know it — is the
  * BGP join order: patterns with more constants bind first
  * (constants-first, rarest-pattern-first heuristic), then greedy
  * max-shared-variable chaining so every join is an equi-join rather than
  * a cartesian product.
  *
  * `extraKeys` threads orchestration columns (e.g. `__window_id` from the
  * historical sliding-window executor) through every join/aggregation, so
  * per-window evaluation over N windows is ONE distributed plan, not a
  * driver-side loop over windows — the difference between working at
  * 100 TB and not.
  */
object SparqlCompiler {

  final case class CompileException(msg: String) extends RuntimeException(msg)

  /** Result bindings are plain lexical strings (wire-format wrapping
    * happens at the serialization boundary, `Terms.format`). */
  def compile(quads: DataFrame, query: Query,
      extraKeys: Seq[String] = Nil): DataFrame = query match {
    case q: SelectQuery =>
      val grouped = compileGroup(quads, q.where, extraKeys)
      // solution modifiers (ORDER BY / OFFSET / LIMIT). With ORDER BY +
      // LIMIT Catalyst plans TakeOrderedAndProject — a per-partition
      // top-k + driver merge, no global sort of the full result.
      // SPARQL sorts the full solution BEFORE projection (order keys may
      // reference non-projected variables) — so for plain selects the
      // modifiers apply to the group frame; aggregate/DISTINCT queries
      // sort their (projected) result, where order keys must be
      // projected columns.
      val isAggShape = q.groupBy.nonEmpty || q.having.nonEmpty ||
        (q.projection match {
          case Items(is) => is.exists(_.isInstanceOf[AggItem])
          case Star      => false
        })
      // an order key naming a SELECT-expression alias only exists after
      // projection — those queries sort the projected frame instead
      val exprAliases = q.projection match {
        case Items(is) => is.collect { case ExprItem(_, a) => a }
        case Star      => Nil
      }
      val ordersOnAlias = q.orderBy.exists(_.expr match {
        case EVar(n) => exprAliases.contains(n)
        case _       => false
      })
      if (!isAggShape && !q.distinct && !ordersOnAlias) {
        val limited = applyModifiers(grouped.df, q, extraKeys)
        project(Grouped(limited, grouped.vars), q, extraKeys)
      } else {
        val projected = project(grouped, q, extraKeys)
        val deduped = if (q.distinct) projected.distinct() else projected
        applyModifiers(deduped, q, extraKeys)
      }
    case q: AskQuery =>
      val df = compileGroup(quads, q.where, extraKeys).df
      if (extraKeys.isEmpty)
        df.select(lit(1).as("one")).limit(1)
          .agg((count(lit(1)) > 0).as("ask"))
      else
        df.groupBy(extraKeys.map(col): _*)
          .agg((count(lit(1)) > 0).as("ask"))
    case q: ConstructQuery =>
      val grouped = compileGroup(quads, q.where, extraKeys)
      val parts = q.template.map { tp =>
        grouped.df.select(
          extraKeys.map(col) ++ Seq(
            termCol(tp.s, grouped.vars).as("subject"),
            termCol(tp.p, grouped.vars).as("predicate"),
            termCol(tp.o, grouped.vars).as("object")): _*)
          // §16.2: a template instantiation with any unbound component
          // is omitted from the constructed graph, not emitted with
          // NULL holes
          .where(col("subject").isNotNull && col("predicate").isNotNull &&
            col("object").isNotNull)
      }
      parts.reduceOption(_ unionAll _)
        .getOrElse(throw new CompileException("CONSTRUCT with empty template"))
    case q: DescribeQuery =>
      // subject-based description: statements whose subject is a
      // described resource. Variable targets come from the WHERE
      // solutions (distinct → small → broadcast semi join); constants
      // filter directly.
      val constParts = q.targets.collect {
        case Iri(v) => v
        case Lit(v) => v
      }
      val varTargets = q.targets.collect { case Var(n) => n }
      val byConst =
        if (constParts.isEmpty) None
        else Some(quads.where(col("subject").isInCollection(constParts)))
      val byVar =
        if (varTargets.isEmpty) None
        else {
          val grouped = compileGroup(quads, q.where, extraKeys)
          val missing = varTargets.filterNot(grouped.vars.contains)
          if (missing.nonEmpty)
            throw new CompileException(
              s"DESCRIBE variable(s) ${missing.mkString(", ")} not bound in WHERE")
          val targets = varTargets.map(v =>
            grouped.df.select(col(v).as("subject"))).reduce(_ unionAll _)
            .distinct()
          Some(quads.join(broadcast(targets), Seq("subject"), "leftsemi"))
        }
      (byConst.toSeq ++ byVar.toSeq).reduceOption(_ unionAll _)
        .map(_.select("subject", "predicate", "object"))
        .getOrElse(throw new CompileException("DESCRIBE with no targets"))
  }

  /** Solution modifiers. Without extraKeys this is plain
    * sort/offset/limit (ORDER BY + LIMIT → TakeOrderedAndProject).
    * With extraKeys (windowed evaluation) LIMIT/OFFSET must apply PER
    * WINDOW — the reference evaluates each window independently — so
    * they compile to a `row_number()` over a window-id partition:
    * still one distributed plan, one shuffle on the window id. */
  private def applyModifiers(df: DataFrame, q: SelectQuery,
      extraKeys: Seq[String]): DataFrame = {
    def clamp(v: Long): Int = math.min(v, Int.MaxValue.toLong).toInt
    if (q.orderBy.isEmpty && q.limit.isEmpty && q.offset.isEmpty) df
    else if (extraKeys.isEmpty) {
      val ordered =
        if (q.orderBy.isEmpty) df
        else df.orderBy(q.orderBy.flatMap(orderCols(_, df)): _*)
      val shifted = q.offset.fold(ordered)(o => ordered.offset(clamp(o)))
      q.limit.fold(shifted)(l => shifted.limit(clamp(l)))
    } else if (q.limit.isEmpty && q.offset.isEmpty) {
      // pure ORDER BY: group rows per window, then the requested order
      df.orderBy(extraKeys.map(col) ++
        q.orderBy.flatMap(orderCols(_, df)): _*)
    } else {
      val part = org.apache.spark.sql.expressions.Window
        .partitionBy(extraKeys.map(col): _*)
      val win =
        if (q.orderBy.nonEmpty)
          part.orderBy(q.orderBy.flatMap(orderCols(_, df)): _*)
        else part.orderBy(lit(1)) // unordered LIMIT: any rows qualify
      val off = q.offset.getOrElse(0L)
      val hi = q.limit.map(off + _).getOrElse(Long.MaxValue)
      df.withColumn("__rn", row_number().over(win))
        .where(col("__rn") > off && col("__rn") <= hi)
        .drop("__rn")
    }
  }

  /** ORDER BY key columns. Variables order numerically when their lexical
    * form parses as a number, lexically otherwise (matching the engine's
    * numeric-sniffed term model); the string form tiebreaks so mixed
    * columns still get a total order. */
  private def orderCols(k: OrderKey, df: DataFrame): Seq[Column] = {
    val base: Seq[Column] = k.expr match {
      case EVar(n) =>
        if (!df.columns.contains(n))
          throw new CompileException(
            s"ORDER BY references ?$n which is not in the projection")
        Seq(col(n).try_cast("double"), col(n).cast("string"))
      case e => Seq(numC(e))
    }
    if (k.desc) base.map(_.desc_nulls_last) else base.map(_.asc_nulls_first)
  }

  private def termCol(t: Term, vars: Set[String]): Column = t match {
    case Var(n) =>
      if (vars.contains(n)) col(n)
      else lit(null).cast("string")
    case Iri(v) => lit(v)
    case Lit(v) => lit(v)
  }

  // ---- group graph pattern --------------------------------------------

  /** `nullable` tracks which vars may be unbound (null) — introduced by
    * OPTIONAL, or bound in only some UNION branches. Joins on such vars
    * need SPARQL compatibility semantics (unbound matches anything)
    * instead of a plain equi-join. */
  final case class Grouped(df: DataFrame, vars: Set[String],
      nullable: Set[String] = Set.empty)

  /** SPARQL-compatibility join for shared vars that may be null on
    * either side: unbound (null) is compatible with anything, and the
    * merged binding takes whichever side is bound.
    *
    * Null-bucket split (the condition is not equi-extractable as one
    * join): rows where EVERY shared var is bound — the bulk, since
    * unbound slots are the OPTIONAL/UNION/UNDEF exception — join with
    * plain equality (compatibility degenerates to it), which Catalyst
    * plans as a hash/sort-merge join; only the null-carrying residual
    * slices take the nested-loop compatibility condition, with the
    * residual side broadcast (it is assumed small — the null rows).
    * The three buckets partition the compatible pairs exactly:
    * (l bound × r bound) ∪ (l bound × r null) ∪ (l null × r all).
    * For left_outer the l frame is id-tagged (lazy localCheckpoint
    * pins the nondeterministic ids) so the rows matched by NO bucket
    * can be re-added null-extended. */
  private def compatJoin(l0: DataFrame, r: DataFrame, shared: Seq[String],
      extraKeys: Seq[String], joinType: String): DataFrame = {
    val pref = "__cj_"
    val idCol = "__cj_id"
    val outer = joinType == "left_outer"
    if (!outer && joinType != "inner")
      throw new CompileException(s"compatJoin: unsupported $joinType")
    val l =
      if (outer) l0.withColumn(idCol, monotonically_increasing_id())
        .localCheckpoint(eager = false)
      else l0
    val renamed = (shared ++ extraKeys).distinct
    val rr = renamed.foldLeft(r)((df, v) => df.withColumnRenamed(v, pref + v))
    val keyEq = extraKeys.map(k => col(k) === col(pref + k))
    val eqCond = (shared.map(v => col(v) === col(pref + v)) ++ keyEq)
      .reduce(_ && _)
    val compatCond = (shared.map(v =>
      col(v).isNull || col(pref + v).isNull || col(v) === col(pref + v)) ++
      keyEq).reduce(_ && _)
    val allBoundL = shared.map(col(_).isNotNull).reduce(_ && _)
    val allBoundR = shared.map(v => col(pref + v).isNotNull).reduce(_ && _)
    def merge(j: DataFrame): DataFrame = {
      val m = shared.foldLeft(j)((df, v) =>
        df.withColumn(v, coalesce(col(v), col(pref + v))))
      renamed.foldLeft(m)((df, v) => df.drop(pref + v))
    }
    // the null-residual slices are usually OPTIONAL/UNDEF trickle —
    // tiny — but a UNION branch binding the shared var on one side
    // only makes the whole other branch the residual, so the hint is
    // size-gated: a big residual is left to Catalyst/AQE (which still
    // broadcasts the smaller side of the nested-loop join if it fits)
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes <=
          BigInt(64L << 20)) broadcast(df)
      else df
    val matched = Seq(
      l.where(allBoundL).join(rr.where(allBoundR), eqCond, "inner"),
      l.where(allBoundL).join(maybeBroadcast(rr.where(!allBoundR)),
        compatCond, "inner"),
      maybeBroadcast(l.where(!allBoundL)).join(rr, compatCond, "inner"))
      .map(merge).reduce(_ unionByName _)
    if (!outer) matched
    else {
      val unmatched = l.join(matched.select(idCol), Seq(idCol), "left_anti")
      val rOnly = r.columns.filterNot(renamed.contains)
      val extended = rOnly.foldLeft(unmatched)((df, c) =>
        df.withColumn(c, lit(null).cast("string")))
      matched.unionByName(extended).drop(idCol)
    }
  }

  /** Variables an expression references (free variables). */
  private def exprVars(e: Expr): Set[String] = e match {
    case EVar(n)          => Set(n)
    case EBound(n)        => Set(n)
    case ECmp(_, l, r)    => exprVars(l) ++ exprVars(r)
    case EAnd(l, r)       => exprVars(l) ++ exprVars(r)
    case EOr(l, r)        => exprVars(l) ++ exprVars(r)
    case ENot(x)          => exprVars(x)
    case EArith(_, l, r)  => exprVars(l) ++ exprVars(r)
    case ECall(_, args)   => args.flatMap(exprVars).toSet
    case EIn(x, items, _) => exprVars(x) ++ items.flatMap(exprVars).toSet
    case EAggRef(a)       => a.arg.map(exprVars).getOrElse(Set.empty)
    case EExists(_, _)    => Set.empty // compiled as its own group
    case _                => Set.empty
  }

  /** Variables an expression references INCLUDING those mentioned
    * inside EXISTS groups (pattern vars and filter vars, recursively).
    * [[exprVars]] deliberately treats EXISTS as opaque (it compiles as
    * its own group); crossing-filter detection must not — an EXISTS
    * referencing an outer variable correlates with the outer solution
    * (§18.6 substitution) and is part of the join condition. */
  private def deepExprVars(e: Expr): Set[String] = e match {
    case EExists(g, _)    => mentionedVars(g)
    case ECmp(_, l, r)    => deepExprVars(l) ++ deepExprVars(r)
    case EAnd(l, r)       => deepExprVars(l) ++ deepExprVars(r)
    case EOr(l, r)        => deepExprVars(l) ++ deepExprVars(r)
    case ENot(x)          => deepExprVars(x)
    case EArith(_, l, r)  => deepExprVars(l) ++ deepExprVars(r)
    case ECall(_, args)   => args.flatMap(deepExprVars).toSet
    case EIn(x, items, _) => deepExprVars(x) ++ items.flatMap(deepExprVars)
    case EAggRef(a)       => a.arg.map(deepExprVars).getOrElse(Set.empty)
    case other            => exprVars(other)
  }

  /** Every variable a group mentions: pattern-bound vars plus filter
    * and BIND-expression vars, recursing into nested elements.
    * (Subqueries are deliberately opaque — they do not see outer
    * bindings, so their vars cannot correlate.) */
  private def mentionedVars(g: GroupPattern): Set[String] = {
    val nested = g.elems.flatMap {
      case GOptional(x) => mentionedVars(x)
      case GGroup(x)    => mentionedVars(x)
      case GMinus(x)    => mentionedVars(x)
      case GUnion(alts) => alts.flatMap(mentionedVars)
      case GBind(e, _)  => deepExprVars(e)
      case _            => Seq.empty
    }
    g.boundVars.toSet ++ g.filters.flatMap(deepExprVars) ++ nested
  }

  private def containsExists(e: Expr): Boolean = e match {
    case EExists(_, _)    => true
    case ECmp(_, l, r)    => containsExists(l) || containsExists(r)
    case EAnd(l, r)       => containsExists(l) || containsExists(r)
    case EOr(l, r)        => containsExists(l) || containsExists(r)
    case ENot(x)          => containsExists(x)
    case EArith(_, l, r)  => containsExists(l) || containsExists(r)
    case ECall(_, args)   => args.exists(containsExists)
    case EIn(x, items, _) => containsExists(x) || items.exists(containsExists)
    case _                => false
  }

  /** Merged-domain join of a solution frame against a group frame:
    * shared-var compatibility (equi when provably non-null),
    * orchestration-key equality, coalesced shared columns. The inner
    * form is the first half of the LeftJoin/EXISTS fallback used when
    * a crossing filter itself contains EXISTS. */
  private def joinMerged(l: DataFrame, r: DataFrame, shared: Seq[String],
      extraKeys: Seq[String], anyNullable: Boolean,
      joinType: String): DataFrame =
    if (shared.isEmpty)
      if (extraKeys.nonEmpty) l.join(r, extraKeys, joinType)
      else l.join(r, lit(true), joinType)
    else if (anyNullable) compatJoin(l, r, shared, extraKeys, joinType)
    else l.join(r, (shared ++ extraKeys).distinct, joinType)

  /** Rewrite a crossing filter (a LeftJoin/EXISTS condition evaluated
    * over the MERGED domain) for a join where the inner side's columns
    * are renamed with `pref`: inner-bound vars → prefixed, outer-bound
    * vars → unchanged, vars bound by neither → UNBOUND. A var bound by
    * BOTH sides where either binding may be null reads as the merged
    * value — COALESCE over the two columns (the compat conjunct keeps
    * both-bound pairs equal, so order only matters when one is null);
    * the bare prefixed column would evaluate a null inner slot as
    * UNBOUND even though the outer side is bound. */
  private def renameCrossing(e: Expr, innerVars: Set[String],
      outerVars: Set[String], pref: String,
      nullableVar: String => Boolean): Expr = {
    def r(e: Expr): Expr = e match {
      case EVar(n) =>
        if (innerVars.contains(n) && outerVars.contains(n) &&
            nullableVar(n))
          ECall("COALESCE", Seq(EVar(n), EVar(pref + n)))
        else if (innerVars.contains(n)) EVar(pref + n)
        else if (outerVars.contains(n)) EVar(n)
        else EUnbound
      case EBound(n) =>
        if (innerVars.contains(n) && outerVars.contains(n) &&
            nullableVar(n))
          EOr(EBound(n), EBound(pref + n))
        else if (innerVars.contains(n)) EBound(pref + n)
        else if (outerVars.contains(n)) EBound(n)
        else EStr("false") // BOUND of a never-bound var
      case ECmp(op, l, x)   => ECmp(op, r(l), r(x))
      case EAnd(l, x)       => EAnd(r(l), r(x))
      case EOr(l, x)        => EOr(r(l), r(x))
      case ENot(x)          => ENot(r(x))
      case EArith(op, l, x) => EArith(op, r(l), r(x))
      case ECall(i, args)   => ECall(i, args.map(r))
      case EIn(x, items, n) => EIn(r(x), items.map(r), n)
      case EExists(_, _) => throw new CompileException(
        "EXISTS inside an OPTIONAL/EXISTS join condition is unsupported")
      case other => other
    }
    r(e)
  }

  /** Join condition against a prefix-renamed inner side: shared-var
    * compatibility (plain equality when both sides are provably
    * non-null — keeps the equi key extractable for hash/sort-merge
    * planning), orchestration-key equality, and any crossing filters
    * rewritten against the prefixed columns. Shared by the OPTIONAL
    * LeftJoin-condition and EXISTS substitution paths. */
  private def prefixedCond(sharedVars: Seq[String], extraKeys: Seq[String],
      nullableVar: String => Boolean, pref: String, crossing: Seq[Expr],
      innerVars: Set[String], outerVars: Set[String]): Column =
    (sharedVars.map(v =>
      if (nullableVar(v))
        col(v) === col(pref + v) || col(v).isNull || col(pref + v).isNull
      else col(v) === col(pref + v)) ++
      extraKeys.map(k => col(k) === col(pref + k)) ++
      crossing.map(f => boolC(
        renameCrossing(f, innerVars, outerVars, pref, nullableVar))))
      .reduce(_ && _)

  private def flipCmp(op: String): String = op match {
    case "<"   => ">"
    case "<="  => ">="
    case ">"   => "<"
    case ">="  => "<="
    case other => other
  }

  /** One decorrelated crossing EXISTS: an aggregate frame to left-join
    * (on `keys` ++ extraKeys) onto the side that binds its correlation
    * keys, plus the names of its extreme-value columns (numeric view /
    * non-numeric lexical view of the inner comparison variable).
    * `onOuter` picks the side: the outer solution frame or the
    * optional/inner group frame. */
  private final case class DecorrJoin(aggFrame: DataFrame,
      keys: Seq[String], numCol: String, strCol: String, onOuter: Boolean)

  /** Decorrelate crossing-filter EXISTS into aggregate comparisons.
    *
    * `EXISTS { P . FILTER(?iv <cmp> ?ov) }` — with P a self-contained
    * BGP/path group whose only correlation with the merged join domain
    * is (a) equality on the pattern vars K it shares with the domain
    * and (b) ONE crossing inequality between an inner-only var `?iv`
    * and a domain var `?ov` — holds iff the K-group's extreme value of
    * `?iv` satisfies the comparison:
    * `max(iv) > ov ⟺ ∃ iv > ov` (min for `<`). So the EXISTS becomes a
    * hash left-join against `compile(P).groupBy(K).agg(extreme(iv))`
    * plus a scalar comparison — the same plan a decorrelating SQL
    * optimizer (and the DuckDB oracle) produces — instead of the
    * Filter(F, Join(A,B)) ∪ Diff fallback whose merged join degenerates
    * to a cartesian product evaluated twice (VERDICT r7: 234 s vs 2 s
    * at sf0.1).
    *
    * The extreme is tracked separately for numeric and non-numeric
    * inner values because SPARQL comparison is typed (numeric ranks
    * compare numerically, plain literals lexically, mixed is a type
    * error): `∃ iv cmp ov` ⟺ numeric-extreme cmp ov (when ov is
    * numeric) ∨ string-extreme cmp ov (when it is not) — each branch
    * NULLs out for the other type via the ordinary ECmp semantics.
    * COALESCE(…, false) keeps a no-rows group (NULL aggregates) a
    * definite `false` so a negated EXISTS still evaluates to true.
    *
    * Returns None unless EVERY EExists node in the filters
    * decorrelates — a partial rewrite would still need the fallback. */
  private def decorrelateCrossing(crossing: Seq[Expr],
      outerVars: Set[String], innerSideVars: Set[String],
      nullableVar: String => Boolean, quads: DataFrame,
      extraKeys: Seq[String]): Option[(Seq[Expr], Seq[DecorrJoin])] = {
    val domain = outerVars ++ innerSideVars
    val joins = scala.collection.mutable.ArrayBuffer.empty[DecorrJoin]

    def one(inner: GroupPattern, negated: Boolean): Option[Expr] = {
      // only plain pattern elements: any nested OPTIONAL/UNION/BIND
      // could correlate in ways boundVars does not surface
      if (!inner.elems.forall(e =>
          e.isInstanceOf[GBgp] || e.isInstanceOf[GPath])) return None
      val innerBound = inner.boundVars.toSet
      val (cf, lf) = inner.filters.partition(f =>
        deepExprVars(f).exists(v =>
          !innerBound.contains(v) && domain.contains(v)))
      cf match {
        case Seq(ECmp(op, EVar(x), EVar(y)))
            if Seq("<", "<=", ">", ">=").contains(op) =>
          val picked =
            if (innerBound.contains(x) && !domain.contains(x) &&
                !innerBound.contains(y) && domain.contains(y))
              Some((x, y, op))
            else if (innerBound.contains(y) && !domain.contains(y) &&
                !innerBound.contains(x) && domain.contains(x))
              Some((y, x, flipCmp(op)))
            else None
          picked.flatMap { case (iv, ov, effOp) =>
            val k = innerBound.intersect(domain).toSeq.sorted
            // the agg frame joins onto ONE side, so all correlation
            // keys must live on it (outer preferred)
            val onOuter = k.forall(outerVars.contains)
            val onInner = k.forall(innerSideVars.contains)
            // a nullable correlation key would need compat (unbound
            // matches anything) semantics the equi-join cannot give
            if ((!onOuter && !onInner) || k.exists(nullableVar)) None
            else {
              val g = compileGroup(quads, inner.copy(filters = lf),
                extraKeys)
              val isMax = effOp == ">" || effOp == ">="
              val ivNum = col(iv).try_cast("double")
              val strOnly = when(ivNum.isNull && col(iv).isNotNull,
                col(iv))
              val nCol = s"__dc${joins.size}n"
              val sCol = s"__dc${joins.size}s"
              val aggs = Seq(
                (if (isMax) max(ivNum) else min(ivNum)).as(nCol),
                (if (isMax) max(strOnly) else min(strOnly)).as(sCol))
              val gk = (k ++ extraKeys).distinct
              val aggF =
                if (gk.isEmpty) g.df.agg(aggs.head, aggs.tail: _*)
                else g.df.groupBy(gk.map(col): _*)
                  .agg(aggs.head, aggs.tail: _*)
              joins += DecorrJoin(aggF, gk, nCol, sCol, onOuter)
              val core = EOr(ECmp(effOp, EVar(nCol), EVar(ov)),
                ECmp(effOp, EVar(sCol), EVar(ov)))
              val guarded = ECall("COALESCE", Seq(core, EStr("false")))
              Some(if (negated) ENot(guarded) else guarded)
            }
          }
        case _ => None
      }
    }

    def rewrite(e: Expr): Option[Expr] = e match {
      case EExists(g, neg)  => one(g, neg)
      case ECmp(op, l, r)   =>
        for (a <- rewrite(l); b <- rewrite(r)) yield ECmp(op, a, b)
      case EAnd(l, r)       =>
        for (a <- rewrite(l); b <- rewrite(r)) yield EAnd(a, b)
      case EOr(l, r)        =>
        for (a <- rewrite(l); b <- rewrite(r)) yield EOr(a, b)
      case ENot(x)          => rewrite(x).map(ENot)
      case EArith(op, l, r) =>
        for (a <- rewrite(l); b <- rewrite(r)) yield EArith(op, a, b)
      case ECall(i, args)   =>
        val rs = args.map(rewrite)
        if (rs.exists(_.isEmpty)) None else Some(ECall(i, rs.flatten))
      case EIn(x, items, n) =>
        val rx = rewrite(x); val rs = items.map(rewrite)
        if (rx.isEmpty || rs.exists(_.isEmpty)) None
        else Some(EIn(rx.get, rs.flatten, n))
      case other            => Some(other)
    }

    val rewritten = crossing.map(rewrite)
    if (rewritten.exists(_.isEmpty)) None
    else Some((rewritten.flatten, joins.toSeq))
  }

  /** Widen `df` with NULL columns for expression variables the frame
    * does not bind: SPARQL evaluates them as UNBOUND (usually a type
    * error → NULL, but e.g. !BOUND(?x) or COALESCE(?x, 1) are defined),
    * whereas a raw column reference would be an analysis crash. */
  private def withUnbound(df: DataFrame, bound: Set[String],
      vars: Set[String]): (DataFrame, Seq[String]) = {
    val free = (vars -- bound -- df.columns).toSeq
    (free.foldLeft(df)((d, v) =>
      d.withColumn(v, lit(null).cast("string"))), free)
  }

  /** Variables a group may leave unbound (null), computed statically
    * from the AST — the same tracking [[compileGroup]] does while
    * compiling, used where only the AST is at hand (subquery
    * projections). Conservative: never misses a nullable var. */
  private def staticNullable(g: GroupPattern): Set[String] = {
    var vars = Set.empty[String]
    var nullable = Set.empty[String]
    def add(vs: Set[String], vN: Set[String]): Unit = {
      val shared = vs.intersect(vars)
      nullable = nullable.filter(v => !shared.contains(v) || vN.contains(v)) ++
        vN.filter(v => !vars.contains(v) || nullable.contains(v))
      vars ++= vs
    }
    g.elems.foreach {
      case e @ (_: GBgp | _: GPath) =>
        add(GroupPattern(Seq(e), Nil).boundVars.toSet, Set.empty)
      case GUnion(alts) =>
        val branches = alts.map(a => (a.boundVars.toSet, staticNullable(a)))
        val uVars = branches.flatMap(_._1).toSet
        add(uVars, uVars.filter(v =>
          branches.exists { case (bv, bn) => !bv(v) || bn(v) }))
      case GValues(vb)  => add(vb.vars.toSet, vb.undefVars)
      case GGroup(gg)   => add(gg.boundVars.toSet, staticNullable(gg))
      case GOptional(og) =>
        val ov = og.boundVars.toSet
        nullable ++= (ov -- vars)
        vars ++= ov
      case GMinus(_)    => ()
      case GBind(e, a)  =>
        vars += a
        e match {
          case ENum(_) | EStr(_) | EIriRef(_) => ()
          case _                              => nullable += a
        }
      case GSubquery(sq) =>
        val pv = sq.projection match {
          case Star => sq.where.boundVars.toSet
          case Items(items) => items.map {
            case VarItem(n)     => n
            case ExprItem(_, a) => a
            case AggItem(_, a)  => a
          }.toSet
        }
        add(pv, subqueryNullable(sq))
    }
    nullable
  }

  /** Projected variables of a subquery that may be unbound in its
    * result. */
  private def subqueryNullable(sq: SelectQuery): Set[String] = {
    val n = staticNullable(sq.where)
    val bound = sq.where.boundVars.toSet
    sq.projection match {
      case Star => n
      case Items(items) => items.collect {
        case VarItem(v) if n.contains(v) || !bound.contains(v) => v
        // any expression can error to NULL; aggregates other than
        // COUNT can be NULL (empty-of-type groups, EBV errors)
        case ExprItem(_, a)                      => a
        case AggItem(Aggregate(f, _, _, _), a) if f != "COUNT" => a
      }.toSet
    }
  }

  /** `seed` starts the fold from an existing solution frame instead of
    * the empty BGP — §18.6 EXISTS substitution: the inner group's
    * patterns correlate by joining the outer frame, and its BINDs and
    * FILTERs see the outer bindings directly. */
  def compileGroup(quads: DataFrame, group: GroupPattern,
      extraKeys: Seq[String], seed: Option[Grouped] = None): Grouped = {
    if (group.elems.isEmpty && seed.isEmpty)
      throw new CompileException("Empty group pattern")

    var acc: DataFrame = seed.map(_.df).orNull
    var accVars = seed.map(_.vars).getOrElse(Set.empty[String])
    // vars that may be null in acc (OPTIONAL-introduced / partial
    // UNION / VALUES UNDEF / BIND whose expression can error)
    var nullable = seed.map(_.nullable).getOrElse(Set.empty[String])

    // SPARQL Join of a compiled element into the accumulator: plain
    // equi-join normally; compatibility join (unbound matches anything,
    // merged with coalesce) when a shared variable may be null on
    // either side. `keyed = false` joins WITHOUT the orchestration
    // keys — for VALUES frames, which are window-independent literal
    // data carrying no key columns.
    def joinIn(df: DataFrame, vs: Set[String], vNullable: Set[String],
        keyed: Boolean = true): Unit = {
      if (acc == null) { acc = df; accVars = vs; nullable = vNullable }
      else {
        val keys = if (keyed) extraKeys else Nil
        val shared = vs.intersect(accVars).toSeq
        val anyNullable = shared.exists(v =>
          nullable.contains(v) || vNullable.contains(v))
        acc =
          if (shared.isEmpty) {
            if (keys.nonEmpty) acc.join(df, keys, "inner")
            else acc.crossJoin(df)
          } else if (anyNullable) compatJoin(acc, df, shared, keys, "inner")
          else acc.join(df, (shared ++ keys).distinct, "inner")
        // a joined shared var is null only when BOTH sides were;
        // element-local vars carry their own nullability
        nullable = nullable.filter(v =>
          !shared.contains(v) || vNullable.contains(v)) ++
          vNullable.filter(v => !accVars.contains(v) || nullable.contains(v))
        accVars = accVars ++ vs
      }
    }

    // VALUES blocks seen before any keyed element under windowed
    // evaluation — joined as soon as the accumulator exists
    val pendingValues = scala.collection.mutable.ArrayBuffer
      .empty[(DataFrame, Set[String], Set[String])]
    def flushPendingValues(): Unit = if (acc != null) {
      pendingValues.foreach { case (df, vs, vN) =>
        joinIn(df, vs, vN, keyed = false)
      }
      pendingValues.clear()
    }

    // §18.2.2.6 folds a group starting from the empty BGP (one empty
    // solution) — materialize that unit solution when the first element
    // is BIND/OPTIONAL/MINUS rather than a join element
    def ensureAcc(): Unit = if (acc == null) {
      // the unit solution: one empty row — or, under windowed
      // evaluation, one empty row PER orchestration key (every window
      // that exists in the data has its own unit), so a group that
      // starts with OPTIONAL/MINUS/BIND still evaluates per window
      acc =
        if (extraKeys.nonEmpty)
          quads.select(extraKeys.map(col): _*).distinct()
        else quads.sparkSession.range(1).drop("id")
      // deferred leading VALUES must land BEFORE the order-sensitive
      // element that forced the unit solution — a BIND/OPTIONAL/MINUS
      // referencing a VALUES variable sees its bindings, not UNBOUND
      // (deferral past join elements is safe because Join commutes;
      // past these it is not)
      flushPendingValues()
    }

    // Elements compile LEFT-TO-RIGHT in source order (SPARQL 1.1
    // §18.2.2.6): join elements fold in with Join, OPTIONAL with
    // LeftJoin, MINUS with Minus, BIND with Extend — so a BIND between
    // patterns scopes over exactly the preceding elements, and a later
    // OPTIONAL/MINUS/pattern sees (and joins on) the BIND-introduced
    // variable.
    group.elems.foreach { elem =>
      elem match {
      case GBgp(ps) =>
        // BGP: join order inside the run is free — fold patterns into
        // the accumulator greedily (most shared variables with what's
        // bound so far, then most constants) so every join is an
        // equi-join rather than a cartesian product
        val remaining = scala.collection.mutable.ArrayBuffer(
          ps.map { qp =>
            val (df, vs) = patternDF(quads, qp, extraKeys)
            (df, vs, constantCount(qp))
          }: _*)
        if (acc == null && remaining.nonEmpty) {
          val first = remaining.maxBy(_._3)
          remaining -= first
          acc = first._1
          accVars = first._2
        }
        while (remaining.nonEmpty) {
          val nextPat = remaining.maxBy { case (_, vs, consts) =>
            (vs.intersect(accVars).size, consts)
          }
          remaining -= nextPat
          joinIn(nextPat._1, nextPat._2, Set.empty)
        }

      // Property-path pattern: compiles to an (s, o) edge relation
      // (see pathEdges), then binds its subject/object terms and joins
      // like an ordinary pattern.
      case GPath(pp) =>
        val constEndpoints = Seq(pp.s, pp.o).collect {
          case Iri(v) => v
          case Lit(v) => v
        }
        // variable GRAPH scope: the graph column itself becomes an
        // extra key through every path join/closure round, so each
        // graph gets its own edge relation (and its own zero-length
        // node set) in ONE distributed plan — then binds to the graph
        // variable like any other column
        val graphVar = pp.g.collect { case Var(n) => n }
        val pathKeys =
          if (graphVar.isDefined) extraKeys :+ "graph" else extraKeys
        var df = pathEdges(quads, pp.path,
          if (graphVar.isDefined) None else pp.g, pathKeys, constEndpoints)
        val bindings =
          scala.collection.mutable.LinkedHashMap.empty[String, String]
        def bind(colName: String, term: Term): Unit = term match {
          case Var(n) =>
            bindings.get(n) match {
              case Some(existing) =>
                df = df.where(col(existing) === col(colName))
              case None => bindings += (n -> colName)
            }
          case Iri(v) => df = df.where(col(colName) === v)
          case Lit(v) =>
            // same numeric-aware literal matching as ordinary patterns
            df =
              if (Terms.isNumeric(v))
                df.where(col(colName) === v ||
                  col(colName).try_cast("double") === v.toDouble)
              else df.where(col(colName) === v)
        }
        bind(PathSrcCol, pp.s)
        bind(PathDstCol, pp.o)
        graphVar.foreach(n => bind("graph", Var(n)))
        val bound = df.select(extraKeys.map(col) ++
          bindings.map { case (v, c) => col(c).as(v) }: _*)
        joinIn(bound, bindings.keySet.toSet, Set.empty)

      // Element-free nested group: Filter(F, unit) — the filters see
      // only their OWN group's bindings, which is the unit solution
      // with every variable unbound. A false/error outcome empties the
      // group, and joining an empty group empties every solution of
      // the enclosing one (§18.2.2.2). Evaluated once driver-side
      // (one local row), then applied as keep-all or keep-nothing.
      // Known limit: EXISTS inside such a filter is unsupported (boolC
      // raises CompileException) — the unit solution has no bindings
      // for it to correlate with, and no caller has needed it.
      case GGroup(g) if g.elems.isEmpty =>
        ensureAcc()
        val unit = quads.sparkSession.range(1).drop("id")
        val fvars = g.filters.flatMap(exprVars).toSet
        val (widened, _) = withUnbound(unit, Set.empty, fvars)
        val pass = !widened
          .where(g.filters.map(boolC).reduce(_ && _)).isEmpty
        if (!pass) acc = acc.limit(0)

      // Nested group (`{…}` / GRAPH block with its own FILTERs):
      // evaluated as an independent group — its filters see only its
      // own bindings — then joined in (§18.2.2.6).
      case GGroup(g) =>
        val inner = compileGroup(quads, g, extraKeys)
        joinIn(inner.df, inner.vars, inner.nullable)

      // Subquery: `{ SELECT … }` evaluated independently (its own
      // grouping/modifiers), then joined on the projected variables it
      // shares with the enclosing group. Projected vars that may be
      // unbound inside the subquery (OPTIONAL-only, partial UNION,
      // UNDEF, BIND) keep compatibility-join semantics outside it.
      case GSubquery(sq) =>
        val sdf = compile(quads, sq, extraKeys)
        joinIn(sdf, sdf.columns.toSet -- extraKeys,
          subqueryNullable(sq) -- extraKeys)

      // UNION block: branches evaluated independently, multiset-unioned
      // (UNION ALL — SPARQL union does not deduplicate) with null fill
      // for branch-local variables. A variable missing from some branch
      // (or nullable inside one) may be null in the union result —
      // joins on it take the compatibility path.
      case GUnion(alts) =>
        val gs = alts.map(compileGroup(quads, _, extraKeys))
        val uVars = gs.flatMap(_.vars.toSeq).distinct
        val uNullable = uVars.filter(v =>
          gs.exists(g => !g.vars.contains(v) || g.nullable.contains(v))).toSet
        // align columns: every branch projects the full variable set
        val aligned = gs.map { g =>
          g.df.select(extraKeys.map(col) ++ uVars.map { v =>
            if (g.vars.contains(v)) col(v) else lit(null).cast("string").as(v)
          }: _*)
        }
        joinIn(aligned.reduce(_ unionAll _), uVars.toSet, uNullable)

      // VALUES block: inline data joined on shared variables. The block
      // is driver-literal and tiny, so Catalyst broadcasts the join.
      // UNDEF cells are null and their variables nullable — the join
      // takes the compatibility path (unbound matches anything, §10.2).
      // The literal frame carries NO orchestration keys (it is
      // window-independent), so the join deliberately skips extraKeys;
      // if no join element has landed yet under windowed evaluation,
      // the block is deferred until one does (Join is commutative, so
      // this preserves the semantics — and joining it first would
      // strand an accumulator without key columns).
      case GValues(vb) =>
        val spark = quads.sparkSession
        val schema = org.apache.spark.sql.types.StructType(
          vb.vars.map(v => org.apache.spark.sql.types.StructField(
            v, org.apache.spark.sql.types.StringType)))
        val rows = vb.rows.map { r =>
          org.apache.spark.sql.Row.fromSeq(r.map {
            case Some(Iri(v)) => v
            case Some(Lit(v)) => v
            case Some(Var(n)) =>
              throw new CompileException(s"Variable ?$n in VALUES row")
            case None => null
          })
        }
        val vdf = spark.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava), schema)
        if (acc == null && extraKeys.nonEmpty)
          pendingValues += ((vdf, vb.vars.toSet, vb.undefVars))
        else joinIn(vdf, vb.vars.toSet, vb.undefVars, keyed = false)

      // OPTIONAL group: SPARQL leftjoin — solutions keep going when the
      // optional side has no compatible row; its variables stay unbound
      // (null). Shared never-null vars make the using-columns left join
      // exact; when a shared var may be null (earlier OPTIONAL, partial
      // UNION, BIND, VALUES UNDEF), the compatibility join takes over.
      case GOptional(opt) =>
        ensureAcc()
        // §18.2.2.6 LeftJoin(A, B, F): a FILTER of the optional group
        // that references a variable A binds but B does not is part of
        // the JOIN CONDITION, evaluated over the merged domain — the
        // spec's canonical `OPTIONAL { … FILTER(?inner > ?outer) }`.
        // B-local filters stay inside B's own compile.
        val optBound = opt.boundVars.toSet
        val (crossing, local) = opt.filters.partition(f =>
          deepExprVars(f).exists(v =>
            !optBound.contains(v) && accVars.contains(v)))
        val optG = compileGroup(quads,
          if (crossing.isEmpty) opt else opt.copy(filters = local),
          extraKeys)
        val shared = optG.vars.intersect(accVars).toSeq
        val anyNullable = shared.exists(v =>
          nullable.contains(v) || optG.nullable.contains(v))
        // explicit condition join: B fully prefixed, condition =
        // shared-var compatibility ∧ key equality ∧ the crossing
        // filters (a NULL/false condition row simply fails to
        // match — the left row survives with unbound B vars).
        // `aSide`/`bSide` may carry extra decorrelation-aggregate
        // columns beyond acc/optG.df; `dropAfter` removes them.
        def condLeftJoin(aSide: DataFrame, bSide: DataFrame,
            crossingFs: Seq[Expr], extraInner: Set[String],
            extraOuter: Set[String], dropAfter: Seq[String]): DataFrame = {
          val pref = "__ol_"
          val bCols = bSide.columns
          val bdf = bSide.select(
            bCols.map(c => col(c).as(pref + c)).toSeq: _*)
          val cond = prefixedCond(shared, extraKeys,
            v => nullable.contains(v) || optG.nullable.contains(v),
            pref, crossingFs, optG.vars ++ extraInner,
            accVars ++ extraOuter)
          var m = aSide.join(bdf, cond, "left_outer")
          shared.foreach(v =>
            m = m.withColumn(v, coalesce(col(v), col(pref + v))))
          (optG.vars -- accVars).foreach(v =>
            m = m.withColumn(v, col(pref + v)))
          m.drop(bCols.map(pref + _).toSeq: _*).drop(dropAfter: _*)
        }
        acc =
          if (crossing.exists(containsExists)) {
            // first choice: decorrelate each EXISTS into an aggregate
            // comparison (see decorrelateCrossing) — the condition
            // becomes a plain Column and the join needs no fallback
            decorrelateCrossing(crossing, accVars, optG.vars,
              v => nullable.contains(v) || optG.nullable.contains(v),
              quads, extraKeys) match {
              case Some((newCrossing, dJoins)) =>
                var aSide = acc
                var bSide = optG.df
                dJoins.foreach { d =>
                  val target = if (d.onOuter) aSide else bSide
                  val joined =
                    if (d.keys.isEmpty)
                      target.crossJoin(broadcast(d.aggFrame))
                    else target.join(d.aggFrame, d.keys, "left_outer")
                  if (d.onOuter) aSide = joined else bSide = joined
                }
                val aggA = dJoins.filter(_.onOuter)
                  .flatMap(d => Seq(d.numCol, d.strCol))
                val aggB = dJoins.filterNot(_.onOuter)
                  .flatMap(d => Seq(d.numCol, d.strCol))
                condLeftJoin(aSide, bSide, newCrossing, aggB.toSet,
                  aggA.toSet, aggA)
              case None =>
                // LeftJoin(A, B, F) fallback: tag A with row ids,
                // build the merged inner join, evaluate F on it
                // (EXISTS via the standard semi/anti machinery), then
                // union the surviving matches with the A rows that
                // kept no match, their B-side vars unbound — the
                // spec's Filter(F, Join(A,B)) ∪ Diff(A, B, F)
                // decomposition (§18.5). Lazy localCheckpoints pin
                // the nondeterministic row ids AND the filtered
                // merged join, so the union and anti branches reuse
                // one evaluation instead of recomputing the join.
                val idCol = "__lj_id"
                val a = acc.withColumn(idCol,
                  monotonically_increasing_id()).localCheckpoint(false)
                val x = applyFilters(
                  joinMerged(a, optG.df, shared, extraKeys, anyNullable,
                    "inner"),
                  accVars ++ optG.vars, nullable ++ optG.nullable,
                  crossing, quads, extraKeys).localCheckpoint(false)
                val unmatched = a.join(x.select(idCol), Seq(idCol),
                  "left_anti")
                val withNulls = (optG.vars -- accVars).foldLeft(unmatched)(
                  (d, v) => d.withColumn(v, lit(null).cast("string")))
                x.unionByName(withNulls).drop(idCol)
            }
          } else if (crossing.nonEmpty) {
            condLeftJoin(acc, optG.df, crossing, Set.empty, Set.empty,
              Nil)
          } else if (shared.isEmpty)
            // no shared vars: every optional row extends every solution
            // — but only within the same window/orchestration key, so
            // the extraKeys still join (a bare cross join would mix
            // windows and leave ambiguous key columns)
            if (extraKeys.nonEmpty)
              acc.join(optG.df, extraKeys, "left_outer")
            else acc.join(optG.df, lit(true), "left_outer")
          else if (anyNullable)
            compatJoin(acc, optG.df, shared, extraKeys, "left_outer")
          else acc.join(optG.df, (shared ++ extraKeys).distinct, "left_outer")
        // every optional-side variable may be unbound in the result,
        // and a left join keeps unmatched rows — previously-nullable
        // shared vars stay nullable (no-match rows keep their null)
        nullable = nullable ++ (optG.vars -- accVars)
        accVars = accVars ++ optG.vars

      // MINUS group: remove solutions compatible on shared variables; a
      // MINUS sharing no variables removes nothing (SPARQL semantics).
      case GMinus(m) =>
        ensureAcc()
        val mG = compileGroup(quads, m, extraKeys)
        val sharedVars = mG.vars.intersect(accVars).toSeq
        if (sharedVars.nonEmpty) {
          val anyNullable = sharedVars.exists(v =>
            nullable.contains(v) || mG.nullable.contains(v))
          if (!anyNullable) {
            val shared = (sharedVars ++ extraKeys).distinct
            acc = acc.join(mG.df.select(shared.map(col): _*), shared,
              "leftanti")
          } else {
            // §8.3 Minus with possibly-unbound shared vars: remove when
            // COMPATIBLE (equal wherever both bound) AND the domains
            // overlap (at least one var bound on both sides — under
            // compatibility that var is equal). A plain equi anti join
            // would never match through a null key and keep rows SPARQL
            // removes.
            val keep = (sharedVars ++ extraKeys).distinct
            val mdf = mG.df.select(keep.map(c => col(c).as(s"__m_$c")): _*)
            val compat = sharedVars.map(v =>
              col(v) === col(s"__m_$v") || col(v).isNull ||
                col(s"__m_$v").isNull).reduce(_ && _)
            val domOverlap = sharedVars.map(v =>
              col(v) === col(s"__m_$v")).reduce(_ || _)
            val cond = extraKeys.map(k => col(k) === col(s"__m_$k"))
              .foldLeft(compat && domOverlap)(_ && _)
            acc = acc.join(mdf, cond, "left_anti")
          }
        }

      // BIND(expr AS ?v): extend each solution with a computed column.
      // The rebind check against accVars is exactly the spec's in-scope
      // rule — the target must not be bound by any PRECEDING element.
      case GBind(e, alias) =>
        ensureAcc()
        if (accVars.contains(alias))
          throw new CompileException(s"BIND would rebind ?$alias")
        val (widened, free) = withUnbound(acc, accVars, exprVars(e))
        acc = widened.withColumn(alias, valueC(e)).drop(free: _*)
        accVars += alias
        // any non-literal expression can evaluate to an error (NULL) —
        // a later join on the bound var must use compatibility
        // semantics, so track it as nullable
        e match {
          case ENum(_) | EStr(_) | EIriRef(_) => ()
          case _                              => nullable += alias
        }
      }
      flushPendingValues()
    }
    // a group of only VALUES blocks (no keyed element ever landed)
    flushPendingValues()
    if (acc == null)
      throw new CompileException(
        "VALUES-only group under windowed evaluation is unsupported")

    acc = applyFilters(acc, accVars, nullable, group.filters, quads,
      extraKeys)
    Grouped(acc, accVars, nullable)
  }

  /** FILTER application over a solution frame: EXISTS via semi/anti
    * joins, everything else via where(). Top-level conjunctions are
    * split first — `FILTER(a && b)` filters exactly like
    * `FILTER(a) FILTER(b)` (an error conjunct drops the row either
    * way, §17.2 three-valued &&), and the split is what lets EXISTS
    * appear under `&&`. `FILTER(!EXISTS {…})` (and any stack of NOTs)
    * normalizes to the same semi/anti join — each NOT flips the join
    * polarity. Shared by group compilation and the merged-domain
    * crossing-filter fallback, which is why the frame, its variables,
    * and their nullability are parameters rather than group state. */
  private def applyFilters(df0: DataFrame, vars: Set[String],
      nullableVars: Set[String], filters: Seq[Expr], quads: DataFrame,
      extraKeys: Seq[String]): DataFrame = {
    var acc = df0
    @annotation.tailrec
    def unwrapNot(e: Expr, flip: Boolean): (Expr, Boolean) = e match {
      case ENot(x) => unwrapNot(x, !flip)
      case other   => (other, flip)
    }
    def conjuncts(e: Expr): Seq[Expr] = e match {
      case EAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other      => Seq(other)
    }
    filters.flatMap(conjuncts).foreach { f =>
      unwrapNot(f, flip = false) match {
        case (EExists(inner, negated), flip) =>
          // EXISTS substitutes the current solution into the inner
          // pattern (§18.6): inner FILTERs referencing OUTER variables
          // become join conditions over the merged domain, and an
          // UNBOUND shared var stays a free variable (compat, not
          // null-mismatching equi key).
          val innerBound = inner.boundVars.toSet
          val (crossing, local) = inner.filters.partition(f =>
            deepExprVars(f).exists(v =>
              !innerBound.contains(v) && vars.contains(v)))
          val joinType = if (negated ^ flip) "leftanti" else "leftsemi"
          // outer vars correlated through EXPRESSIONS the group does
          // not itself bind — a BIND or nested filter over an outer
          // var: not expressible as a join-condition Column
          val otherCorrelated =
            (mentionedVars(inner.copy(filters = local)) -- innerBound)
              .exists(vars.contains)
          // a crossing filter containing a NESTED EXISTS first tries
          // decorrelation (same rewrite as the LeftJoin fallback): the
          // nested EXISTS becomes an aggregate comparison and the top
          // EXISTS stays an ordinary condition semi-join — the
          // substitution path's seeded cross join MATERIALIZES the
          // outer×inner frame (sf1 measured r46 at 995 s), whereas the
          // semi-join short-circuits per outer row
          val decorred =
            if (!otherCorrelated && crossing.exists(containsExists))
              decorrelateCrossing(crossing, vars, innerBound,
                v => nullableVars.contains(v) ||
                  staticNullable(inner.copy(filters = local)).contains(v),
                quads, extraKeys)
            else None
          if (decorred.isEmpty &&
              (otherCorrelated || crossing.exists(containsExists))) {
            // §18.6 substitution directly: compile the EXISTS group
            // SEEDED with the id-tagged outer frame — patterns
            // correlate by joining it, BINDs/filters (crossing ones
            // included, nested EXISTS recursively) see the outer
            // bindings — then semi/anti join the surviving ids
            val idCol = "__ex_id"
            val a = acc.withColumn(idCol, monotonically_increasing_id())
              .localCheckpoint(false)
            val sub = compileGroup(quads,
              inner.copy(filters = local ++ crossing), extraKeys,
              Some(Grouped(a, vars, nullableVars)))
            acc = a.join(sub.df.select(idCol), Seq(idCol), joinType)
              .drop(idCol)
          } else {
            val (effCrossing, dJoins) =
              decorred.getOrElse((crossing, Seq.empty[DecorrJoin]))
            val innerG = compileGroup(quads,
              if (inner.filters == local) inner
              else inner.copy(filters = local), extraKeys)
            val sharedVars = innerG.vars.intersect(vars).toSeq
            val shared = (sharedVars ++ extraKeys).distinct
            if (shared.isEmpty && effCrossing.isEmpty)
              throw new CompileException(
                "FILTER EXISTS with no shared variables is unsupported")
            val anyNullable = sharedVars.exists(v =>
              nullableVars.contains(v) || innerG.nullable.contains(v))
            if (effCrossing.isEmpty && !anyNullable && dJoins.isEmpty)
              acc = acc.join(
                innerG.df.select(shared.map(col): _*), shared, joinType)
            else {
              var aSide = acc
              var bSide = innerG.df
              dJoins.foreach { d =>
                val target = if (d.onOuter) aSide else bSide
                val joined =
                  if (d.keys.isEmpty)
                    target.crossJoin(broadcast(d.aggFrame))
                  else target.join(d.aggFrame, d.keys, "left_outer")
                if (d.onOuter) aSide = joined else bSide = joined
              }
              val aggA = dJoins.filter(_.onOuter)
                .flatMap(d => Seq(d.numCol, d.strCol))
              val aggB = dJoins.filterNot(_.onOuter)
                .flatMap(d => Seq(d.numCol, d.strCol))
              val pref = "__e_"
              val sel = bSide.select(
                bSide.columns.map(c => col(c).as(pref + c)).toSeq: _*)
              val cond = prefixedCond(sharedVars, extraKeys,
                v => nullableVars.contains(v) || innerG.nullable.contains(v),
                pref, effCrossing, innerG.vars ++ aggB, vars ++ aggA)
              acc = aSide.join(sel, cond, joinType).drop(aggA: _*)
            }
          }
        case _ =>
          // vars the frame does not bind evaluate as UNBOUND, not as
          // unresolved columns
          val (widened, free) = withUnbound(acc, vars, exprVars(f))
          acc = widened.where(boolC(f)).drop(free: _*)
      }
    }
    acc
  }

  /** Whether an expression is string-shaped (its value view should be
    * the lexical string, not a numeric cast): bare terms, STR(), and
    * IF/COALESCE with any string-shaped branch. Arithmetic, comparisons
    * and extension calls stay numeric. */
  private def stringish(e: Expr): Boolean = e match {
    case EVar(_) | EStr(_) | EIriRef(_) => true
    case ECall("STR" | "CONCAT" | "UCASE" | "LCASE" | "SUBSTR" |
        "STRBEFORE" | "STRAFTER" | "REPLACE" | "MD5" | "SHA1" |
        "SHA256" | "DATATYPE" | "LANG" | "IRI" | "URI" | "STRDT" |
        "STRLANG" | "ENCODE_FOR_URI" | "NOW" | "TZ" | "TIMEZONE" |
        "BNODE" | "UUID" | "STRUUID", _) => true
    case ECall("IF", Seq(_, a, b))      => stringish(a) || stringish(b)
    case ECall("COALESCE", args)        => args.exists(stringish)
    case _                              => false
  }

  /** Value view of an expression (BIND / projection): string-shaped
    * expressions keep their lexical string form, everything else is
    * numeric. */
  private def valueC(e: Expr): Column =
    if (stringish(e)) strC(e) else numC(e)

  private val PathSrcCol = "__ps"
  private val PathDstCol = "__po"

  /** Graph-scoped view of the quads (constant scope only — variable
    * GRAPH over paths would need per-graph closures). */
  private def scopedQuads(quads: DataFrame, g: Option[Term]): DataFrame =
    g match {
      case None         => quads
      case Some(Iri(v)) => quads.where(col("graph") === v)
      case Some(Lit(v)) => quads.where(col("graph") === v)
      case Some(Var(_)) => throw new CompileException(
        "Variable GRAPH scope is not supported with property paths")
    }

  /** Zero-length path relation: every node of the scoped graph — plus
    * the pattern's constant endpoints, which §18.4 ZeroLengthPath
    * includes even when absent from the graph — related to itself.
    * Per extra-key group (each window has its own node set). */
  private def zeroLengthEdges(quads: DataFrame, g: Option[Term],
      extraKeys: Seq[String], constTerms: Seq[String]): DataFrame = {
    val keyCols = extraKeys.map(col)
    val base = scopedQuads(quads, g)
    var nodes = base.select(keyCols :+ col("subject").as("__n"): _*)
      .unionAll(base.select(keyCols :+ col("object").as("__n"): _*))
    constTerms.foreach { v =>
      nodes = nodes.unionAll(
        if (extraKeys.isEmpty)
          quads.sparkSession.range(1).select(lit(v).as("__n"))
        else base.select(keyCols: _*).distinct()
          .withColumn("__n", lit(v)))
    }
    nodes.distinct().select(keyCols ++ Seq(col("__n").as(PathSrcCol),
      col("__n").as(PathDstCol)): _*)
  }

  /** Edge relation of a property path: a DataFrame with columns
    * (extraKeys…, __ps, __po). Links are filtered scans; inverse swaps;
    * sequence is an equi-join on the midpoint; alternative is a
    * multiset union; a negated property set is a scan excluding the
    * listed predicates per direction; one-or-more is a distributed
    * transitive closure by squaring (closure ⋈ closure each round →
    * O(log diameter) iterations, each a shuffle join + distinct,
    * lineage truncated via localCheckpoint). That iterative-BFS shape
    * is how distributed graph engines compute reachability — it scales
    * with executors, not with the driver. `extraKeys` (window ids) join
    * through every step, so per-window closures stay one plan.
    * Zero-length forms (`*`/`?`) union the identity relation over the
    * scoped graph's nodes; `constTerms` carries the pattern's constant
    * endpoints into that node set (harmless supersets at sequence
    * junctions — a spurious identity row only survives the surrounding
    * joins when the term actually occurs in the graph). */
  private def pathEdges(quads: DataFrame, p: Path, g: Option[Term],
      extraKeys: Seq[String], constTerms: Seq[String]): DataFrame = {
    val keyCols = extraKeys.map(col)
    p match {
      case PLink(iri) =>
        scopedQuads(quads, g).where(col("predicate") === iri)
          .select(keyCols ++ Seq(col("subject").as(PathSrcCol),
            col("object").as(PathDstCol)): _*)
      case PNeg(fwd, inv) =>
        val base = scopedQuads(quads, g)
        val fwdDf =
          if (fwd.nonEmpty)
            Some(base.where(!col("predicate").isin(fwd: _*))
              .select(keyCols ++ Seq(col("subject").as(PathSrcCol),
                col("object").as(PathDstCol)): _*))
          else None
        val invDf =
          if (inv.nonEmpty)
            Some(base.where(!col("predicate").isin(inv: _*))
              .select(keyCols ++ Seq(col("object").as(PathSrcCol),
                col("subject").as(PathDstCol)): _*))
          else None
        (fwdDf.toSeq ++ invDf.toSeq).reduce(_ unionAll _)
      case PInverse(x) =>
        pathEdges(quads, x, g, extraKeys, constTerms).select(keyCols ++ Seq(
          col(PathDstCol).as(PathSrcCol),
          col(PathSrcCol).as(PathDstCol)): _*)
      case PSeq(l, r) =>
        val lhs = pathEdges(quads, l, g, extraKeys, constTerms)
          .withColumnRenamed(PathDstCol, "__mid")
        val rhs = pathEdges(quads, r, g, extraKeys, constTerms)
          .withColumnRenamed(PathSrcCol, "__mid")
        lhs.join(rhs, "__mid" +: extraKeys)
          .select(keyCols ++ Seq(col(PathSrcCol), col(PathDstCol)): _*)
      case PAlt(l, r) =>
        pathEdges(quads, l, g, extraKeys, constTerms) unionAll
          pathEdges(quads, r, g, extraKeys, constTerms)
      case PStar(x) =>
        zeroLengthEdges(quads, g, extraKeys, constTerms)
          .unionAll(pathEdges(quads, PPlus(x), g, extraKeys, constTerms))
          .distinct()
      case PZeroOrOne(x) =>
        zeroLengthEdges(quads, g, extraKeys, constTerms)
          .unionAll(pathEdges(quads, x, g, extraKeys, constTerms))
          .distinct()
      case PPlus(x) =>
        // LAZY checkpoints: the convergence count is the first action on
        // each round's closure, so block materialization + lineage
        // truncation ride the same job — one Spark action per squaring
        // round instead of two (round latency dominates on small
        // closures; data cost is unchanged)
        var closure = pathEdges(quads, x, g, extraKeys, constTerms)
          .distinct().localCheckpoint(eager = false)
        var prev = -1L
        var n = closure.count()
        while (n != prev) {
          prev = n
          val step = closure.withColumnRenamed(PathDstCol, "__mid")
            .join(closure.withColumnRenamed(PathSrcCol, "__mid"),
              "__mid" +: extraKeys)
            .select(keyCols ++ Seq(col(PathSrcCol), col(PathDstCol)): _*)
          closure = closure.unionAll(step).distinct()
            .localCheckpoint(eager = false)
          n = closure.count()
        }
        closure
    }
  }

  private def constantCount(qp: QuadPattern): Int =
    Seq(qp.s, qp.p, qp.o).count(!_.isInstanceOf[Var]) +
      qp.g.count(!_.isInstanceOf[Var])

  /** Single-pattern scan: constant terms → pushed-down filters; variable
    * terms → column aliases. */
  private def patternDF(quads: DataFrame, qp: QuadPattern,
      extraKeys: Seq[String]): (DataFrame, Set[String]) = {
    var df = quads
    val bindings = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def bind(colName: String, term: Term): Unit = term match {
      case Var(n) =>
        bindings.get(n) match {
          case Some(existing) => // repeated var in one pattern → equality
            df = df.where(col(existing) === col(colName))
          case None => bindings += (n -> colName)
        }
      case Iri(v) => df = df.where(col(colName) === v)
      case Lit(v) =>
        // numeric-aware literal match: "5.0" matches stored lexical "5.0"
        // or any lexical whose numeric value equals 5.0
        df =
          if (Terms.isNumeric(v))
            df.where(col(colName) === v ||
              col(colName).try_cast("double") === v.toDouble)
          else df.where(col(colName) === v)
    }

    bind("subject", qp.s)
    bind("predicate", qp.p)
    bind("object", qp.o)
    qp.g.foreach(bind("graph", _))

    val cols = extraKeys.map(col) ++
      bindings.map { case (v, c) => col(c).as(v) }
    (df.select(cols.toSeq: _*), bindings.keySet.toSet)
  }

  // ---- expressions -----------------------------------------------------

  /** Numeric view of an expression (NULL when not numeric). */
  def numC(e: Expr): Column = e match {
    case EUnbound => lit(null).cast("double")
    case EVar(n)  => col(n).try_cast("double")
    case ENum(v)  => lit(v)
    case EStr(v)  =>
      if (Terms.isNumeric(v)) lit(v.toDouble) else lit(null).cast("double")
    case EIriRef(_) => lit(null).cast("double")
    case EArith(op, l, r) =>
      val (ln, rn) = (numC(l), numC(r))
      op match {
        case "+" => ln + rn
        case "-" => ln - rn
        case "*" => ln * rn
        case "/" => when(rn =!= 0.0, ln / rn) // div-by-zero → error → NULL
        case other => throw new CompileException(s"Unknown operator $other")
      }
    case ECall("IF", Seq(c, a, b)) =>
      // §17.4.1.2: IF with an error condition is an error — the second
      // `when` (not `otherwise`) keeps a NULL condition NULL
      when(boolC(c), numC(a)).when(!boolC(c), numC(b))
    case ECall("COALESCE", args)  => coalesce(args.map(numC): _*)
    case ECall("ABS", Seq(a))     => abs(numC(a))
    case ECall("STR", Seq(a))     => strC(a).try_cast("double")
    case ECall("STRLEN", Seq(a))  => length(strC(a)).cast("double")
    // fn:round rounds a half toward POSITIVE infinity (round(-2.5) =
    // -2); Spark's round() is HALF_UP (gives -3). floor(x + 0.5) is the
    // exact fn:round definition.
    case ECall("ROUND", Seq(a))   => floor(numC(a) + 0.5).cast("double")
    case ECall("CEIL", Seq(a))    => ceil(numC(a)).cast("double")
    case ECall("FLOOR", Seq(a))   => floor(numC(a)).cast("double")
    case c @ ECall("CONTAINS" | "STRSTARTS" | "STRENDS" | "REGEX" |
        "ISIRI" | "ISURI" | "ISLITERAL" | "ISNUMERIC" | "ISBLANK" |
        "LANGMATCHES", _) =>
      // EBV numeric projection; an EBV error (NULL) stays NULL — the
      // final when-branch is deliberately not an `otherwise`
      when(boolC(c), 1.0).when(!boolC(c), 0.0)
    case c @ ECall("CONCAT" | "UCASE" | "LCASE" | "SUBSTR" | "STRBEFORE" |
        "STRAFTER" | "REPLACE" | "MD5" | "SHA1" | "SHA256" | "DATATYPE" |
        "LANG" | "IRI" | "URI" | "STRDT" | "STRLANG" |
        "ENCODE_FOR_URI" | "NOW" | "TZ" | "TIMEZONE" | "BNODE" |
        "UUID" | "STRUUID", _) =>
      strC(c).try_cast("double")
    // SPARQL §17.4.5 datetime accessors over the engine's lexical term
    // model: the argument parses as an ISO 8601 timestamp or the call
    // is a type error (NULL). The reference's data model has no
    // datetime type (src/core/mod.rs:16-23) but its Oxigraph adapter
    // accepts these builtins — lexical parsing is the faithful bridge.
    case ECall("YEAR", Seq(a))    => year(tsOf(a)).cast("double")
    case ECall("MONTH", Seq(a))   => month(tsOf(a)).cast("double")
    case ECall("DAY", Seq(a))     => dayofmonth(tsOf(a)).cast("double")
    case ECall("HOURS", Seq(a))   => hour(tsOf(a)).cast("double")
    case ECall("MINUTES", Seq(a)) => minute(tsOf(a)).cast("double")
    // SECONDS is xs:decimal INCLUDING the fraction (§17.4.5.6)
    case ECall("SECONDS", Seq(a)) =>
      date_part(lit("SECOND"), tsOf(a)).cast("double")
    case ECall("RAND", Seq()) => rand()
    case ECall(iri, args) =>
      Extensions.call(iri, args.map(numC))
        .getOrElse(lit(null).cast("double"))
    case other =>
      // boolean sub-expression in numeric position: EBV numeric
      // projection; an error (NULL) propagates instead of becoming 0.0
      when(boolC(other), 1.0).when(!boolC(other), 0.0)
  }

  /** IRI test on a term column — the engine's scheme-prefix convention
    * (Terms.isIri as a Column predicate). */
  private def iriShaped(s: Column): Column =
    s.startsWith("http://") || s.startsWith("https://")

  /** Timestamp view of a term for the §17.4.5 datetime accessors: the
    * lexical form cast (ANSI-safely) to a timestamp — ISO 8601 forms
    * parse, anything else is a type error (NULL). The zone tag is
    * stripped BEFORE the cast: the accessors return the dateTime's own
    * fields (HOURS("…T10:30:45+05:30") = 10), whereas casting the
    * zoned form would convert the instant into the session zone. */
  private def tsOf(e: Expr): Column =
    regexp_replace(strC(e), "(Z|[+-]\\d{2}:\\d{2})$", "")
      .try_cast("timestamp")

  /** String view of an expression. */
  def strC(e: Expr): Column = e match {
    case EUnbound   => lit(null).cast("string")
    case EVar(n)    => col(n)
    case EStr(v)    => lit(v)
    case ENum(v)    => lit(Terms.formatNumeric(v))
    case EIriRef(v) => lit(v)
    case ECall("IF", Seq(c, a, b)) =>
      // IF(error, …) is an error (NULL), not the else branch
      when(boolC(c), strC(a)).when(!boolC(c), strC(b))
    case ECall("COALESCE", args) => coalesce(args.map(strC): _*)
    case ECall("STR", Seq(a))    => strC(a)
    case ECall("CONCAT", args)   => concat(args.map(strC): _*)
    case ECall("UCASE", Seq(a))  => upper(strC(a))
    case ECall("LCASE", Seq(a))  => lower(strC(a))
    // SPARQL §17.4.4 hash functions — lowercase hex digests
    case ECall("MD5", Seq(a))    => md5(strC(a))
    case ECall("SHA1", Seq(a))   => sha1(strC(a))
    case ECall("SHA256", Seq(a)) => sha2(strC(a), 256)
    case ECall("SUBSTR", Seq(a, p)) =>
      strC(a).substr(numC(p).cast("int"), lit(Int.MaxValue))
    case ECall("SUBSTR", Seq(a, p, l)) =>
      strC(a).substr(numC(p).cast("int"), numC(l).cast("int"))
    // SPARQL §17.4.3: STRBEFORE/STRAFTER return "" when the needle does
    // not occur; an empty needle yields "" / the whole string. NULL
    // (unbound/error) arguments propagate as NULL — the leading guard
    // keeps the final `.otherwise` from turning an error into ""
    case ECall("STRBEFORE", Seq(a, b)) =>
      val (s, sub) = (strC(a), strC(b))
      when(s.isNull || sub.isNull, lit(null).cast("string"))
        .when(length(sub) === 0, lit(""))
        .when(instr(s, sub) > 0, s.substr(lit(1), instr(s, sub) - 1))
        .otherwise(lit(""))
    case ECall("STRAFTER", Seq(a, b)) =>
      val (s, sub) = (strC(a), strC(b))
      when(s.isNull || sub.isNull, lit(null).cast("string"))
        .when(length(sub) === 0, s)
        .when(instr(s, sub) > 0,
          s.substr(instr(s, sub) + length(sub), lit(Int.MaxValue)))
        .otherwise(lit(""))
    // SPARQL §17.4.2 term introspection over the engine's term model
    // (SURVEY §1.2): IRIs are bare http(s):// strings; the reference's
    // f64-first sniffing types every numeric literal xsd:decimal
    // (historical_executor.rs:323-342); lang tags are dropped at parse
    // (rdf_parser.rs:103-168), so LANG of any literal is "". DATATYPE
    // and LANG of an IRI are type errors → NULL (row filtered in
    // FILTER context, unbound in BIND).
    case ECall("DATATYPE", Seq(a)) =>
      val s = strC(a)
      when(s.isNull || iriShaped(s), lit(null).cast("string"))
        .when(s.try_cast("double").isNotNull, lit(Terms.XsdDecimal))
        .otherwise(lit(Terms.XsdString))
    case ECall("LANG", Seq(a)) =>
      val s = strC(a)
      when(s.isNull || iriShaped(s), lit(null).cast("string"))
        .otherwise(lit(""))
    // IRI/URI constructs an IRI from the lexical form; STRDT/STRLANG
    // attach a datatype/lang tag the engine's model immediately strips
    // (exactly what the reference's parser does on ingest) — all four
    // reduce to the lexical value of their first argument
    case ECall("IRI" | "URI" | "STRDT" | "STRLANG", args) =>
      strC(args.head)
    // XPath fn:encode-for-uri: percent-encode everything outside
    // ALPHA/DIGIT/'-'/'.'/'_'/'~' with uppercase hex. url_encode gives
    // form encoding; fix its three divergences (space→'+', '~' escaped,
    // '*' kept)
    case ECall("ENCODE_FOR_URI", Seq(a)) =>
      regexp_replace(regexp_replace(regexp_replace(
        url_encode(strC(a)), "\\+", "%20"), "%7E", "~"), "\\*", "%2A")
    // NOW(): the query-evaluation instant — Spark's current_timestamp
    // is fixed per query, matching §17.4.5.1's "same value for the
    // whole query". Emitted as an ISO 8601 lexical with offset, the
    // engine's string term model's dateTime shape.
    case ECall("NOW", Seq()) =>
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSxxx")
    // TZ/TIMEZONE read the timezone FROM THE LEXICAL FORM (§17.4.5.8/7):
    // TZ gives the literal tag ("Z", "+05:30", "" when absent);
    // TIMEZONE gives the xs:dayTimeDuration, erroring (NULL) when the
    // tag is absent. Both are type errors on a non-datetime lexical.
    case ECall("TZ", Seq(a)) =>
      val s = strC(a)
      when(tsOf(a).isNull, lit(null).cast("string"))
        .otherwise(regexp_extract(s, "(Z|[+-]\\d{2}:\\d{2})$", 1))
    case ECall("TIMEZONE", Seq(a)) =>
      val s = strC(a)
      val sign = regexp_extract(s, "([+-])(\\d{2}):(\\d{2})$", 1)
      val hh = regexp_extract(s, "([+-])(\\d{2}):(\\d{2})$", 2)
        .try_cast("int")
      val mm = regexp_extract(s, "([+-])(\\d{2}):(\\d{2})$", 3)
        .try_cast("int")
      when(tsOf(a).isNotNull && s.endsWith("Z"), lit("PT0S"))
        .when(tsOf(a).isNotNull && hh.isNotNull,
          concat(
            when(sign === "-", lit("-")).otherwise(lit("")),
            lit("PT"),
            when(hh > 0, concat(hh.cast("string"), lit("H")))
              .otherwise(lit("")),
            when(mm > 0, concat(mm.cast("string"), lit("M")))
              .otherwise(lit("")),
            when(hh === 0 && mm === 0, lit("0S")).otherwise(lit(""))))
    // BNODE: the engine's model has no blank nodes (SURVEY §1.2), so
    // these mint "_:"-prefixed opaque labels — fresh per call (uuid)
    // for the 0-arg form, stable per label (md5) for the 1-arg form.
    case ECall("BNODE", Seq()) => concat(lit("_:"), expr("uuid()"))
    case ECall("BNODE", Seq(a)) => concat(lit("_:b"), md5(strC(a)))
    case ECall("UUID", Seq()) => concat(lit("urn:uuid:"), expr("uuid()"))
    case ECall("STRUUID", Seq()) => expr("uuid()")
    case ECall("REPLACE", args) =>
      // REPLACE(str, pattern, replacement[, flags]) — regex semantics
      val pat = args match {
        case Seq(_, p, _)              => regexPattern(p, "")
        case Seq(_, p, _, EStr(flags)) => regexPattern(p, flags)
        case _ => throw new CompileException(
          "REPLACE flags must be a string literal")
      }
      regexp_replace(strC(args.head), pat, strC(args(2)))
    case other      => numC(other).cast("string")
  }

  /** Regex pattern with SPARQL/XPath flags applied: `smix` fold into a
    * Java inline group; `q` (match literally) quotes a literal pattern.
    * Unsupported flag letters fail at COMPILE time with a clear error —
    * an unknown inline modifier would otherwise surface as a runtime
    * PatternSyntaxException mid-query. */
  private def regexPattern(pat: Expr, flags: String): Column = {
    val bad = flags.filterNot("smixq".contains(_))
    if (bad.nonEmpty)
      throw new CompileException(s"Unsupported regex flags: $bad")
    val base: Column =
      if (flags.contains('q')) pat match {
        case EStr(v) => lit(java.util.regex.Pattern.quote(v))
        case _ => throw new CompileException(
          "Regex flag 'q' requires a literal pattern")
      } else strC(pat)
    val inline = flags.filter(_ != 'q')
    if (inline.nonEmpty) concat(lit(s"(?$inline)"), base) else base
  }

  /** Boolean view (FILTER context). NULL (type error) filters the row,
    * matching SPARQL error semantics. */
  def boolC(e: Expr): Column = e match {
    case EUnbound   => lit(null).cast("boolean")
    case EAnd(l, r) => boolC(l) && boolC(r)
    case EOr(l, r)  => boolC(l) || boolC(r)
    case ENot(x)    => !boolC(x)
    case ECmp(op, l, r) =>
      val (ln, rn) = (numC(l), numC(r))
      // numeric comparison when both sides are numeric; lexical only when
      // NEITHER is (reproducing FILTER(?age > "25") over numeric-sniffed
      // literals, tests/oxigraph_adapter_test.rs:183-201). Numeric vs
      // non-numeric is a SPARQL type error: no branch matches → NULL →
      // row filtered, matching Oxigraph — EXCEPT numeric vs IRI under
      // =/!=, where RDFterm-equal is definitive (a literal and an IRI
      // are distinct terms): false for =, true for !=, not an error.
      val base = when(ln.isNotNull && rn.isNotNull, cmp(op, ln, rn))
        .when(ln.isNull && rn.isNull, cmp(op, strC(l), strC(r)))
      if (op == "=" || op == "!=") {
        val mixedIri =
          (ln.isNull && iriShaped(strC(l)) && rn.isNotNull) ||
            (rn.isNull && iriShaped(strC(r)) && ln.isNotNull)
        base.when(mixedIri, lit(op == "!="))
      } else base
    case ECall("IF", Seq(c, a, b)) =>
      when(boolC(c), boolC(a)).when(!boolC(c), boolC(b))
    case ECall("COALESCE", args) => coalesce(args.map(boolC): _*)
    case EIn(e, items, negated) =>
      // SPARQL IN = chained equality with the same numeric-aware
      // semantics as '='; NOT IN negates the disjunction
      val any = items.map(i => boolC(ECmp("=", e, i)))
        .reduceOption(_ || _).getOrElse(lit(false))
      if (negated) !any else any
    // term type predicates over the engine's numeric-sniffed model
    // (SURVEY §1.2: object starting with http(s):// is an IRI; there
    // are no blank nodes in the event model)
    case ECall("ISIRI" | "ISURI", Seq(a)) =>
      strC(a).startsWith("http://") || strC(a).startsWith("https://")
    case ECall("ISLITERAL", Seq(a)) =>
      !(strC(a).startsWith("http://") || strC(a).startsWith("https://"))
    case ECall("ISNUMERIC", Seq(a)) => numC(a).isNotNull
    case ECall("ISBLANK", Seq(_))   => lit(false)
    // §17.4.1.8 sameTerm: in a model where every term IS its lexical
    // string, term identity is string equality (NULL args propagate)
    case ECall("SAMETERM", Seq(a, b)) => strC(a) === strC(b)
    // RFC 4647 basic filtering: "*" matches any non-empty tag; else
    // case-insensitive exact tag or extended-subtag prefix match. NULL
    // tag/range (type error upstream) propagates → row filtered
    case ECall("LANGMATCHES", Seq(t, r)) =>
      val (tag, range) = (lower(strC(t)), lower(strC(r)))
      when(tag.isNull || range.isNull, lit(null).cast("boolean"))
        .when(range === "*", length(tag) > 0)
        .otherwise(tag === range ||
          tag.startsWith(concat(range, lit("-"))))
    case ECall("CONTAINS", Seq(a, b))  => strC(a).contains(strC(b))
    case ECall("STRSTARTS", Seq(a, b)) => strC(a).startsWith(strC(b))
    case ECall("STRENDS", Seq(a, b))   => strC(a).endsWith(strC(b))
    case ECall("REGEX", args) =>
      // SPARQL REGEX(str, pattern[, flags]); only a literal flags arg
      // works (flags fold into the compiled pattern)
      val pat = args match {
        case Seq(_, p)              => regexPattern(p, "")
        case Seq(_, p, EStr(flags)) => regexPattern(p, flags)
        case _ => throw new CompileException(
          "REGEX flags must be a string literal")
      }
      regexp_like(strC(args.head), pat)
    case ECall(iri, args) =>
      val local = if (iri.startsWith(Extensions.Namespace))
        iri.substring(Extensions.Namespace.length) else iri
      Extensions.all.get(local) match {
        case Some(b) if b.arity == args.length =>
          val c = b.build(args.map(numC))
          if (b.isBoolean) c else c =!= 0.0 // EBV of a numeric result
        case _ => lit(false) // unknown fn / wrong arity → row filtered
      }
    case EExists(_, _) =>
      throw new CompileException(
        "EXISTS is only supported as a top-level FILTER")
    case EBound(n) => col(n).isNotNull
    case EVar(n) =>
      // §17.2.2 effective boolean value over the engine's term model:
      // boolean lexicals take their value; numerics are true iff ≠ 0;
      // other plain literals are true iff non-empty; an IRI (or
      // unbound) has no EBV — a type error (NULL: row filtered in
      // FILTER, NOT resurrected by `!`, NULL in projection)
      val s = col(n)
      val d = s.try_cast("double")
      when(s.isNull, lit(null).cast("boolean"))
        .when(s === "true", lit(true))
        .when(s === "false", lit(false))
        .when(d.isNotNull, d =!= 0.0)
        .when(iriShaped(s), lit(null).cast("boolean"))
        .otherwise(length(s) > 0)
    case EStr(v) =>
      // same EBV, folded at compile time for literals
      if (v == "true") lit(true)
      else if (v == "false") lit(false)
      else if (Terms.isNumeric(v)) lit(v.toDouble != 0.0)
      else lit(v.nonEmpty)
    case ENum(v) => lit(v != 0.0)
    case other =>
      throw new CompileException(s"Cannot evaluate $other as boolean")
  }

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case "="  => l === r
    case "!=" => l =!= r
    case "<"  => l < r
    case "<=" => l <= r
    case ">"  => l > r
    case ">=" => l >= r
    case other => throw new CompileException(s"Unknown comparator $other")
  }

  // ---- projection ------------------------------------------------------

  private def aggCol(a: Aggregate): Column = a match {
    case Aggregate("COUNT", None, _, _) => count(lit(1))
    case Aggregate("COUNT", Some(arg), true, _) => countDistinct(strC(arg))
    case Aggregate("COUNT", Some(arg), false, _) => count(strC(arg))
    case Aggregate("SUM", Some(arg), d, _) =>
      strictNumeric(arg, if (d) sum_distinct(numC(arg)) else sum(numC(arg)))
    case Aggregate("AVG", Some(arg), true, _) =>
      // no native avg_distinct: sum/count over the distinct multiset
      strictNumeric(arg, sum_distinct(numC(arg)) / countDistinct(numC(arg)))
    case Aggregate("AVG", Some(arg), false, _) =>
      strictNumeric(arg, avg(numC(arg)))
    case Aggregate("MIN", Some(arg), _, _) => typedMinMax(arg, isMin = true)
    case Aggregate("MAX", Some(arg), _, _) => typedMinMax(arg, isMin = false)
    case Aggregate("GROUP_CONCAT", Some(arg), d, sep) =>
      // SPARQL leaves concatenation order undefined; sorting makes the
      // result deterministic (and thus oracle-comparable) — a conformant
      // choice
      val vals = if (d) collect_set(strC(arg)) else collect_list(strC(arg))
      array_join(sort_array(vals), sep.getOrElse(" "))
    case Aggregate("SAMPLE", Some(arg), _, _) =>
      // any element is conformant; min is the deterministic choice
      min(strC(arg))
    case other => throw new CompileException(s"Unsupported aggregate $other")
  }

  /** §18.5 set-function error semantics for SUM/AVG: a group whose
    * multiset contains a BOUND non-numeric value (a type error under
    * numeric aggregation) aggregates to an error (NULL) — Oxigraph's
    * behavior — not to the sum of the numeric subset. Unbound values
    * are skipped (the engines diverge there; skipping matches the
    * common COUNT-compatible reading). One extra tiny max aggregate
    * riding the same partial-aggregation pass. */
  private def strictNumeric(arg: Expr, agg: Column): Column = {
    val hasErr =
      max(when(strC(arg).isNotNull && numC(arg).isNull, 1).otherwise(0))
    when(hasErr === 1, lit(null).cast("double")).otherwise(agg)
  }

  /** SPARQL MIN/MAX return the extreme TERM, not a numeric view of it —
    * a string-valued variable aggregates to its lexicographic min/max
    * (what Oxigraph returns), a numeric-valued one to its numeric
    * min/max, and the result is always the winning term's own lexical
    * form. Implemented as min/max over an orderable struct key
    * `(type-rank, numeric-value, lexical)` — numerics (rank 0) order
    * among themselves by value and sort before strings (rank 1, ordered
    * lexicographically), one ordinary partial-aggregate, no extra
    * shuffle. Unbound values are skipped (null key). */
  private def typedMinMax(arg: Expr, isMin: Boolean): Column = {
    val n = numC(arg)
    val s = strC(arg)
    val key = when(s.isNotNull, struct(
      when(n.isNotNull, lit(0)).otherwise(lit(1)).as("t"),
      coalesce(n, lit(0.0)).as("n"),
      s.as("s")))
    (if (isMin) min(key) else max(key)).getField("s")
  }

  /** Aggregate references mentioned inside a HAVING condition. */
  private def collectAggRefs(e: Expr): Seq[Aggregate] = e match {
    case EAggRef(a)      => Seq(a)
    case ECmp(_, l, r)   => collectAggRefs(l) ++ collectAggRefs(r)
    case EAnd(l, r)      => collectAggRefs(l) ++ collectAggRefs(r)
    case EOr(l, r)       => collectAggRefs(l) ++ collectAggRefs(r)
    case ENot(x)         => collectAggRefs(x)
    case EArith(_, l, r) => collectAggRefs(l) ++ collectAggRefs(r)
    case ECall(_, args)  => args.flatMap(collectAggRefs)
    case EIn(x, items, _) => collectAggRefs(x) ++ items.flatMap(collectAggRefs)
    case _               => Nil
  }

  /** Rewrite EAggRef nodes to the temp columns they were aggregated
    * into, so the HAVING condition compiles with the ordinary views. */
  private def substAggRefs(e: Expr, m: Map[Aggregate, String]): Expr =
    e match {
      case EAggRef(a)       => EVar(m(a))
      case ECmp(op, l, r)   => ECmp(op, substAggRefs(l, m), substAggRefs(r, m))
      case EAnd(l, r)       => EAnd(substAggRefs(l, m), substAggRefs(r, m))
      case EOr(l, r)        => EOr(substAggRefs(l, m), substAggRefs(r, m))
      case ENot(x)          => ENot(substAggRefs(x, m))
      case EArith(op, l, r) =>
        EArith(op, substAggRefs(l, m), substAggRefs(r, m))
      case ECall(i, args)   => ECall(i, args.map(substAggRefs(_, m)))
      case EIn(x, items, n) =>
        EIn(substAggRefs(x, m), items.map(substAggRefs(_, m)), n)
      case other            => other
    }

  private def project(grouped: Grouped, q: SelectQuery,
      extraKeys: Seq[String]): DataFrame = {
    val items: Seq[SelectItem] = q.projection match {
      case Star => grouped.vars.toSeq.sorted.map(VarItem)
      case Items(is) => is
    }
    val hasAgg = items.exists(_.isInstanceOf[AggItem])

    if (!hasAgg && q.groupBy.isEmpty && q.having.isEmpty) {
      // expression items may reference unbound vars too — they
      // evaluate as UNBOUND (NULL), not as unresolved columns
      val (base, _) = withUnbound(grouped.df, grouped.vars,
        items.flatMap { case ExprItem(e, _) => exprVars(e)
                        case _ => Set.empty[String] }.toSet)
      val cols = extraKeys.map(col) ++ items.map {
        // a projected variable bound nowhere in WHERE is valid SPARQL —
        // it projects as unbound (NULL), not as an unresolved-column
        // crash
        case VarItem(n) =>
          if (grouped.vars.contains(n)) col(n)
          else lit(null).cast("string").as(n)
        case ExprItem(e, as) => valueC(e).as(as)
        case AggItem(_, _)   => throw new CompileException("unreachable")
      }
      base.select(cols: _*)
    } else {
      val keys = (q.groupBy ++ extraKeys).distinct
      // implicit single group when aggregating with no GROUP BY
      val keyed =
        if (keys.isEmpty) grouped.df.groupBy()
        else grouped.df.groupBy(keys.map(col): _*)
      // HAVING aggregates ride the same .agg() under temp aliases
      val havingAggs = q.having.flatMap(collectAggRefs).distinct
      val hAlias = havingAggs.zipWithIndex
        .map { case (a, i) => a -> s"__h$i" }.toMap
      val aggs = items.collect { case AggItem(a, as) => aggCol(a).as(as) } ++
        havingAggs.map(a => aggCol(a).as(hAlias(a)))
      if (aggs.isEmpty) {
        // GROUP BY with no aggregates anywhere: legal SPARQL — one row
        // per key combination
        if (keys.isEmpty)
          throw new CompileException("GROUP BY without keys or aggregates")
        val base = grouped.df.select(keys.map(col): _*).distinct()
        val cols = extraKeys.map(col) ++ items.map {
          case VarItem(n) =>
            if (keys.contains(n)) col(n)
            else throw new CompileException(
              s"Projected variable ?$n is neither grouped nor aggregated")
          case ExprItem(e, as) => valueC(e).as(as)
          case AggItem(_, _)   => throw new CompileException("unreachable")
        }
        return q.having.foldLeft(base)((df, h) => df.where(boolC(h)))
          .select(cols: _*)
      }
      val out = keyed.agg(aggs.head, aggs.tail: _*)
      val filtered = q.having.foldLeft(out) { (df, h) =>
        df.where(boolC(substAggRefs(h, hAlias)))
      }
      // order + post-agg expression items (final select drops __h* cols)
      val cols = extraKeys.map(col) ++ items.map {
        case VarItem(n) =>
          if (keys.contains(n)) col(n)
          else throw new CompileException(
            s"Projected variable ?$n is neither grouped nor aggregated")
        case AggItem(_, as)  => col(as)
        case ExprItem(e, as) => valueC(e).as(as)
      }
      filtered.select(cols: _*)
    }
  }
}
