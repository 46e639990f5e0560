package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Bgp, TripleOps}
import graft.ops.Bgp.{I, L, Pattern, V}

/** Specs for the triple-table consumption operators: property-table
  * pivot, snapshot delta, and BGP matching.
  */
class TripleOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (s, p, o_kind, o_lex, o_datatype, o_lang, g) quads. */
  def quads(rows: (String, String, String, String, String, String)*): DataFrame =
    rows.map { case (s, p, k, o, dt, lg) => (s, p, k, o, Option(dt), Option(lg), "g:1") }
      .toDF("s", "p", "o_kind", "o_lex", "o_datatype", "o_lang", "g")

  val base = quads(
    ("e:1", "p:name", "literal", "Ada", null, "en"),
    ("e:1", "p:tag", "literal", "zz", null, null),
    ("e:1", "p:tag", "literal", "aa", null, null),
    ("e:1", "p:knows", "iri", "e:2", null, null),
    ("e:2", "p:name", "literal", "Bob", null, null),
    ("e:2", "p:age", "literal", "41", "xsd:integer", null))

  test("propertyTable: one row per subject, min picks multi-valued, missing pred is null") {
    val pt = TripleOps.propertyTable(base, Seq(
      "p:name" -> "name", "p:tag" -> "tag", "p:age" -> "age"))
    val got = pt.orderBy("s").as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("e:1", "Ada", "aa", null), // tag = min("zz","aa"); no age
      ("e:2", "Bob", null, "41")))
  }

  test("delta: signed diff on the full quad, NULL-safe; identical snapshots diff empty") {
    assert(TripleOps.delta(base, base).isEmpty) // null dt/lang must compare equal
    val changed = quads(
      ("e:1", "p:name", "literal", "Ada2", null, "en"), // changed literal
      ("e:1", "p:tag", "literal", "zz", null, null),
      ("e:1", "p:tag", "literal", "aa", null, null),
      ("e:1", "p:knows", "iri", "e:2", null, null),
      ("e:2", "p:name", "literal", "Bob", null, null),
      ("e:2", "p:age", "literal", "41", "xsd:decimal", null)) // changed datatype only
    val d = TripleOps.delta(base, changed)
      .select("op", "s", "p", "o_lex", "o_datatype")
      .as[(String, String, String, String, Option[String])].collect().toSet
    assert(d == Set(
      ("-", "e:1", "p:name", "Ada", None),
      ("+", "e:1", "p:name", "Ada2", None),
      ("-", "e:2", "p:age", "41", Some("xsd:integer")),
      ("+", "e:2", "p:age", "41", Some("xsd:decimal"))))
  }

  test("delta plan: null-safe quad keys stay hash-joinable — no nested-loop join") {
    val d = TripleOps.delta(base, base)
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("bgp: hop query — object variable chains into subject position") {
    val t = quads(
      ("e:1", "p:knows", "iri", "e:2", null, null),
      ("e:2", "p:name", "literal", "Bob", null, null),
      ("e:2", "p:knows", "iri", "e:1", null, null),
      ("e:1", "p:name", "literal", "Ada", null, null))
    val got = Bgp.query(t, Seq(
      Pattern(V("a"), I("p:knows"), V("b")),
      Pattern(V("b"), I("p:name"), V("bn"))))
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("e:1", "e:2", "Bob"), ("e:2", "e:1", "Ada")))
  }

  test("bgp: literal constant matches only literals; IRI constant only IRIs") {
    val t = quads(
      ("e:1", "p:v", "literal", "x", null, null),
      ("e:2", "p:v", "iri", "x", null, null))
    assert(Bgp.query(t, Seq(Pattern(V("s"), I("p:v"), L("x"))))
      .as[String].collect().toSeq == Seq("e:1"))
    assert(Bgp.query(t, Seq(Pattern(V("s"), I("p:v"), I("x"))))
      .as[String].collect().toSeq == Seq("e:2"))
  }

  test("bgp: variable repeated within a pattern is an equality filter, bound once") {
    val t = quads(
      ("x", "p:v", "literal", "x", null, null),
      ("y", "p:v", "literal", "z", null, null))
    val out = Bgp.query(t, Seq(Pattern(V("s"), I("p:v"), V("s"))))
    assert(out.columns.toSeq == Seq("s"))
    assert(out.as[String].collect().toSeq == Seq("x"))
  }

  test("voidStats: per-predicate triple/subject/object counts and kind split") {
    val got = TripleOps.voidStats(base).orderBy("p")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("p:age", 1L, 1L, 1L, 1L, 0L),
      ("p:knows", 1L, 1L, 1L, 0L, 1L),
      ("p:name", 2L, 2L, 2L, 2L, 0L),
      ("p:tag", 2L, 1L, 2L, 2L, 0L)))
  }

  test("bgp OPTIONAL: unmatched optional binds NULL, matched rows carry bindings") {
    val t = quads(
      ("e:1", "p:name", "literal", "Ada", null, null),
      ("e:2", "p:name", "literal", "Bob", null, null),
      ("e:1", "p:boss", "iri", "e:2", null, null))
    val got = Bgp.query(t,
      Seq(Pattern(V("x"), I("p:name"), V("name"))),
      Seq(Pattern(V("x"), I("p:boss"), V("boss"))))
      .as[(String, String, Option[String])].collect().toSet
    assert(got == Set(
      ("e:1", "Ada", Some("e:2")),
      ("e:2", "Bob", None)))
  }

  test("inferTypes: rdfs9 — asserted at dist 0, ancestors at min subclass-hops") {
    val abox = Seq(("i1", "A"), ("i2", "B"), ("i3", "C")).toDF("inst", "cls")
    // A -> B -> Top, C -> Top (and A -> Top shortcut, dist 1 beats 2)
    val tbox = Seq(("A", "B"), ("B", "Top"), ("C", "Top"), ("A", "Top"))
      .toDF("child", "parent")
    val got = TripleOps.inferTypes(abox, tbox)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("i1", "A", 0L), ("i1", "B", 1L), ("i1", "Top", 1L),
      ("i2", "B", 0L), ("i2", "Top", 1L),
      ("i3", "C", 0L), ("i3", "Top", 1L)))
  }

  test("inferTypes plan: TBox closure broadcasts — instance data is never shuffled") {
    val abox = Seq(("i1", "A")).toDF("inst", "cls")
    val tbox = Seq(("A", "Top")).toDF("child", "parent")
    val q = TripleOps.inferTypes(abox, tbox)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(500))
  }

  test("bgp path (iri+): one-or-more hops, joins with direct patterns, cycles safe") {
    // a -> b -> c, d -> c; labels on all
    val t = quads(
      ("a", "p:up", "iri", "b", null, null),
      ("b", "p:up", "iri", "c", null, null),
      ("d", "p:up", "iri", "c", null, null),
      ("a", "p:name", "literal", "A", null, null),
      ("b", "p:name", "literal", "B", null, null),
      ("d", "p:name", "literal", "D", null, null))
    val got = Bgp.query(t, Seq(
      Pattern(V("x"), Bgp.P("p:up"), I("c")),
      Pattern(V("x"), I("p:name"), V("n"))))
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "A"), ("b", "B"), ("d", "D")))
    // ?x up+ ?x on a cycle binds once (repeated-var filter)
    val cyc = quads(
      ("p", "p:up", "iri", "q", null, null),
      ("q", "p:up", "iri", "p", null, null))
    assert(Bgp.query(cyc, Seq(Pattern(V("x"), Bgp.P("p:up"), V("x"))))
      .as[String].collect().toSet == Set("p", "q"))
    // a path term anywhere but predicate position is refused
    val ex = intercept[IllegalArgumentException] {
      Bgp.query(t, Seq(Pattern(Bgp.P("p:up"), I("p:name"), V("n"))))
    }
    assert(ex.getMessage.contains("predicate"))
  }

  test("bgp path: constant-seeded evaluation == full-closure filter, both directions") {
    // diamond with a tail: a->b->d, a->c->d, d->e
    val t = quads(
      ("a", "p:up", "iri", "b", null, null),
      ("a", "p:up", "iri", "c", null, null),
      ("b", "p:up", "iri", "d", null, null),
      ("c", "p:up", "iri", "d", null, null),
      ("d", "p:up", "iri", "e", null, null))
    // ?x up+ e : backward-seeded — everything reaches e
    assert(Bgp.query(t, Seq(Pattern(V("x"), Bgp.P("p:up"), I("e"))))
      .as[String].collect().toSet == Set("a", "b", "c", "d"))
    // a up+ ?y : forward-seeded — everything reachable from a, ONCE
    // each (the diamond's two routes to d must not duplicate)
    val fwd = Bgp.query(t, Seq(Pattern(I("a"), Bgp.P("p:up"), V("y"))))
      .as[String].collect().toSeq
    assert(fwd.sorted == Seq("b", "c", "d", "e"))
  }

  test("bgp: disconnected patterns are refused, not cross-producted") {
    val ex = intercept[IllegalArgumentException] {
      Bgp.query(base, Seq(
        Pattern(V("a"), I("p:name"), V("an")),
        Pattern(V("b"), I("p:age"), V("bn"))))
    }
    assert(ex.getMessage.contains("disconnected"))
  }
}
