package graft.baseline

import graft.core.{RdfEvent, Terms}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Baseline bootstrap (SURVEY.md §2.4 B2–B4) — the reference's one piece
  * of in-repo dataflow logic, `/root/reference/src/api/janus_api.rs:600-841`:
  *
  *   - B2 anchor selection: per solution row, the first of
  *     `sensor, subject, entity, s` holding an IRI; else the
  *     alphabetically-first IRI-valued variable (`janus_api.rs:773-792`);
  *   - B3 accumulation: for every non-anchor variable, key
  *     `(anchor, var)` tracks the last value and a numeric running mean;
  *     AGGREGATE = mean across all window batches when every value was
  *     numeric, else last seen; LAST = only the final sliding window
  *     survives (`janus_api.rs:642-771`);
  *   - B4 materialization: `(anchor, <https://janus.rs/baseline#var>,
  *     value)` static triples, mean formatted Rust-Display style
  *     (`15.0` → `"15"`), deterministic (subject, var) order.
  *
  * Two implementations:
  * [[statements]] — distributed, for bindings DataFrames of any size
  * (the 100 TB path: melt + groupBy, no driver materialization);
  * [[statementsLocal]] — exact row-order-faithful port for the driver-side
  * api layer and for cross-checking the distributed path.
  * The two agree whenever every accumulated value is numeric (mean path,
  * shared Terms.formatNumeric formatting). They can diverge only on the
  * non-numeric "last value" fallback: a DataFrame has no row order, so
  * the distributed path takes max(value) while the local path takes the
  * final row (itself HashMap-order-dependent in the reference).
  */
object BaselineBootstrap {

  val Namespace = "https://janus.rs/baseline#"
  val AnchorPreference: Seq[String] = Seq("sensor", "subject", "entity", "s")

  sealed trait Mode extends Product with Serializable
  case object Aggregate extends Mode
  case object Last extends Mode

  /** Distributed baseline statements from a bindings DataFrame whose
    * columns are variable names (plain lexical values), optionally with a
    * window-id column for sliding-window LAST mode.
    * Returns (subject, predicate, object) — small by construction (one
    * row per (anchor, var)).
    */
  def statements(bindings: DataFrame, mode: Mode = Aggregate,
      windowIdCol: Option[String] = None,
      lastWindowId: Option[Long] = None): DataFrame = {
    val vars = bindings.columns.filterNot(windowIdCol.contains).toSeq
    require(vars.nonEmpty, "bindings must have at least one variable column")

    // LAST mode: the accumulator clears on every new window batch —
    // INCLUDING empty ones — so only the final window's batch survives
    // (janus_api.rs:659-661). Pass `lastWindowId` (= windowCount - 1)
    // when the caller knows the window schedule: an EMPTY newest window
    // then correctly clears the baseline, and the extra max() job
    // disappears. Without it the newest window is approximated as the
    // max id PRESENT, which cannot represent the empty-newest case.
    val scoped = (mode, windowIdCol) match {
      case (Last, Some(w)) =>
        lastWindowId match {
          case Some(id) => bindings.where(col(w) === id)
          case None =>
            val maxW = bindings.agg(max(col(w))).head()
            if (maxW.isNullAt(0)) bindings
            else bindings.where(col(w) === maxW.get(0))
        }
      case _ => bindings
    }

    // IRI test aligned with Terms.normalizeIri: bare http(s) scheme OR
    // angle-bracket-wrapped form
    def isIriC(c: Column): Column =
      c.isNotNull && (c.startsWith("http://") || c.startsWith("https://") ||
        (c.startsWith("<") && c.endsWith(">") && length(c) > 2))
    def iriValueC(c: Column): Column =
      when(c.startsWith("<") && c.endsWith(">"),
        c.substr(lit(2), length(c) - 2)).otherwise(c)

    // B2: per-row anchor variable = first IRI-valued candidate
    val candidates =
      AnchorPreference.filter(vars.contains) ++
        vars.sorted.filterNot(AnchorPreference.contains)
    val anchorVar = candidates.foldRight(lit(null).cast("string")) {
      (v, rest) => when(isIriC(col(v)), lit(v)).otherwise(rest)
    }
    val anchorVal = candidates.foldRight(lit(null).cast("string")) {
      (v, rest) => when(isIriC(col(v)), iriValueC(col(v))).otherwise(rest)
    }

    // melt: one row per (anchor, var, value), excluding the anchor var
    val melted = scoped
      .withColumn("__anchor_var", anchorVar)
      .withColumn("__anchor", anchorVal)
      .where(col("__anchor").isNotNull)
      .select(col("__anchor"), col("__anchor_var"),
        explode(array(vars.map(v =>
          struct(lit(v).as("var"), col(v).cast("string").as("value"))): _*))
          .as("kv"))
      .select(col("__anchor"), col("__anchor_var"),
        col("kv.var").as("var"), col("kv.value").as("value"))
      .where(col("var") =!= col("__anchor_var") && col("value").isNotNull)

    // B3/B4: numeric mean when ALL values numeric, else last value.
    // ("last" across unordered batches is nondeterministic in the
    // reference too — HashMap order; we take max() for determinism.)
    val num = col("value").try_cast("double")
    val agged = melted
      .groupBy(col("__anchor").as("subject"), col("var"))
      .agg(
        avg(num).as("mean"),
        count(num).as("numeric_count"),
        count(col("value")).as("total_count"),
        max(col("value")).as("last_value"))

    // exact Terms.formatNumeric (Rust-Display style, never scientific
    // notation). A UDF is fine here: it runs on the POST-aggregation
    // result — one row per (anchor, var) — not on the data path.
    val fmtNumeric = udf((v: Double) => Terms.formatNumeric(v))
    val meanStr = fmtNumeric(col("mean"))

    agged.select(
      col("subject"),
      concat(lit(Namespace), col("var")).as("predicate"),
      when(col("numeric_count") === col("total_count") &&
        col("numeric_count") > 0, meanStr)
        .otherwise(col("last_value")).as("object"))
  }

  // ---- exact local port (driver-side api layer + cross-checks) --------

  private final case class Acc(
      var lastValue: String,
      var numericSum: Double,
      var numericCount: Long,
      var allNumeric: Boolean)

  /** Row-order-faithful accumulation (`janus_api.rs:707-746`). */
  def accumulate(acc: scala.collection.mutable.Map[(String, String), Acc],
      bindings: Seq[Map[String, String]]): Unit =
    bindings.foreach { binding =>
      selectAnchor(binding).foreach { case (anchorVar, anchor) =>
        binding.keys.toSeq.sorted.foreach { v =>
          if (v != anchorVar) binding.get(v).foreach { raw =>
            val normalized = Terms.normalize(raw)
            val entry = acc.getOrElseUpdate((anchor, v),
              Acc(normalized, 0.0, 0L, allNumeric = true))
            entry.lastValue = normalized
            if (Terms.isNumeric(normalized)) {
              entry.numericSum += normalized.toDouble
              entry.numericCount += 1
            } else entry.allNumeric = false
          }
        }
      }
    }

  /** B2 anchor rule (`janus_api.rs:773-792`). */
  def selectAnchor(binding: Map[String, String])
      : Option[(String, String)] = {
    AnchorPreference.collectFirst(Function.unlift { v =>
      binding.get(v).flatMap(Terms.normalizeIri).map(iri => (v, iri))
    }).orElse {
      binding.toSeq.sortBy(_._1).collectFirst(Function.unlift {
        case (name, raw) => Terms.normalizeIri(raw).map(iri => (name, iri))
      })
    }
  }

  /** Materialize accumulator → sorted statements
    * (`janus_api.rs:748-771`). */
  def materialize(acc: scala.collection.Map[(String, String), Acc])
      : Seq[(String, String, String)] =
    acc.toSeq.sortBy { case ((s, v), _) => (s, v) }.map {
      case ((subject, v), a) =>
        val obj =
          if (a.allNumeric && a.numericCount > 0)
            Terms.formatNumeric(a.numericSum / a.numericCount)
          else a.lastValue
        (subject, Namespace + v, obj)
    }

  /** Local one-shot: bindings batches (one per window, in window order)
    * → statements, honoring LAST-mode clearing. Accepts any IterableOnce
    * so callers can stream window batches without materializing all of
    * them. */
  def statementsLocal(batches: IterableOnce[Seq[Map[String, String]]],
      mode: Mode): Seq[(String, String, String)] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[(String, String), Acc]
    batches.iterator.foreach { batch =>
      if (mode == Last) acc.clear()
      accumulate(acc, batch)
    }
    materialize(acc)
  }

  /** Statements → static quads for the live engine (ts 0, default
    * graph, `janus_api.rs:682-705`). */
  def asStaticQuads(statements: Seq[(String, String, String)]): Seq[RdfEvent] =
    statements.map { case (s, p, o) => RdfEvent(0L, s, p, o, "") }
}
