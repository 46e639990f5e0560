package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operators OVER the emitted triple table — the
  * consumption side of the KG the pipeline builds. The reference
  * serves its converted triples as files (/root/reference/src/cattle.py:301);
  * an analytics engine must additionally make the triple table
  * queryable and diffable in place.
  *
  * Schema contract (graft.rules.RuleCompiler.triples): columns
  * `s, p, o_kind, o_lex, o_datatype, o_lang, g`.
  */
object TripleOps {

  val quadCols: Seq[String] =
    Seq("s", "p", "o_kind", "o_lex", "o_datatype", "o_lang", "g")

  /** Pivot a triple table into the classic property-table layout: one
    * row per subject, one column per requested predicate, `min(o_lex)`
    * as the deterministic pick for multi-valued predicates.
    *
    * Scale shape: a single aggregation on `s` with map-side partial
    * `min`s — one shuffle of (s, k narrow strings) regardless of how
    * many predicates are pivoted; no join, no per-predicate pass.
    * (Physically a SortAggregate pair: string aggregation buffers are
    * not hash-aggregable in Spark — the partial/final split and the
    * single exchange are the properties that matter, both plan-pinned.)
    * This is the standard wide-table materialization used to make a
    * 10^12-triple KG cheap to scan analytically.
    *
    * @param preds (predicateIri, outputColumnName) pairs
    */
  def propertyTable(triples: DataFrame, preds: Seq[(String, String)]): DataFrame = {
    require(preds.nonEmpty, "propertyTable needs at least one predicate")
    val aggs = preds.map { case (iri, name) =>
      min(when(col("p") === lit(iri), col("o_lex"))).as(name)
    }
    triples.groupBy(col("s")).agg(aggs.head, aggs.tail: _*)
  }

  /** VoID-style dataset statistics per predicate: triple count,
    * distinct subject / object counts, and the literal/IRI split —
    * the standard summary a KG publisher ships next to the dump
    * (and what query planners price joins with).
    *
    * Scale shape: one aggregation keyed on `p`. The two exact
    * distinct counts expand to the usual two-level plan (partial
    * distinct on (p, s) / (p, o_lex), then merge) — still bounded by
    * the predicate-key shuffle; no joins, no windows. Predicate
    * cardinality is tiny (schema-sized) so the final stage is trivial.
    */
  def voidStats(triples: DataFrame): DataFrame =
    triples.groupBy(col("p")).agg(
      count(lit(1)).as("n_triples"),
      countDistinct(col("s")).as("n_subjects"),
      countDistinct(col("o_lex")).as("n_objects"),
      sum(when(col("o_kind") === "literal", 1L).otherwise(0L)).as("n_literals"),
      sum(when(col("o_kind") === "iri", 1L).otherwise(0L)).as("n_iris"))

  /** RDFS-style type inference (rule rdfs9): every instance typed `c`
    * is also typed every ancestor of `c` in the class hierarchy.
    * Returns `inst, cls, dist` — dist 0 for the asserted type, else
    * min subclass-hops to the inferred class. BAG semantics (ADVICE
    * round 5, documented rather than aggregated away): when an
    * asserted class is ALSO a closure ancestor of another asserted
    * class of the same instance (or the TBox is cyclic), the pair
    * appears once per derivation at that derivation's dist — the
    * direct row at 0 plus an inferred row. Collapsing to min(dist)
    * would cost a corpus-sized (inst, cls) shuffle precisely on the
    * zero-instance-shuffle path this operator exists for; consumers
    * needing set semantics aggregate downstream where they already
    * shuffle.
    *
    * Scale shape: the TBox (class hierarchy) is schema-sized while the
    * ABox (instance types) is corpus-sized — so the TBox closure
    * ([[graft.canon.Closure]]) is computed first and BROADCAST into a
    * map-side join against the ABox scan: zero shuffles of instance
    * data, the only right shape at 10^12 instances. The broadcast is
    * a hint, not a bet: a pathological million-class TBox falls back
    * to a regular join rather than OOMing the driver (Spark drops the
    * hint above the broadcast threshold only if stats say so — the
    * contract here is TBox ≪ ABox, documented).
    *
    * @param abox (inst, cls) asserted instance types
    * @param tbox (child, parent) direct subclass edges
    */
  def inferTypes(abox: DataFrame, tbox: DataFrame): DataFrame = {
    val closure = graft.canon.Closure.ancestors(tbox)
    val direct = abox.select(col("inst"), col("cls"), lit(0L).as("dist"))
    val inferred = abox.join(
        org.apache.spark.sql.functions.broadcast(closure),
        abox("cls") === closure("child"))
      .select(col("inst"), col("ancestor").as("cls"), col("dist"))
    direct.unionByName(inferred)
  }

  /** Snapshot diff of two triple tables: quads present only in `oldT`
    * come out with `op = "-"`, quads present only in `newT` with
    * `op = "+"`. Comparison is on the full quad with NULL-safe
    * equality (`o_datatype`/`o_lang` are null for plain/IRI objects),
    * matching SQL `EXCEPT` semantics where NULLs compare equal.
    *
    * Scale shape: two anti joins, each one hash shuffle keyed on the
    * full quad — `<=>` keys stay hash-joinable in Spark (EqualNullSafe
    * is an accepted hash-join key), so no nested-loop fallback. This
    * is the incremental-update primitive: re-run the mapping over a
    * changed source partition, diff against the committed snapshot,
    * apply only the delta downstream.
    */
  def delta(oldT: DataFrame, newT: DataFrame): DataFrame = {
    val a = oldT.select(quadCols.map(col): _*).alias("a")
    val b = newT.select(quadCols.map(col): _*).alias("b")
    def cond(l: String, r: String): Column =
      quadCols.map(c => col(s"$l.$c") <=> col(s"$r.$c")).reduce(_ && _)
    val removed = a.join(b, cond("a", "b"), "left_anti")
      .select(lit("-").as("op") +: quadCols.map(col): _*)
    val added = b.join(a, cond("b", "a"), "left_anti")
      .select(lit("+").as("op") +: quadCols.map(col): _*)
    removed.unionByName(added)
  }
}
