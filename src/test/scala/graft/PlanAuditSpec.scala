package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.run.Queries

/** Physical-plan regression audit: the properties that make these
  * operators survive a 100 TB scale-up must be visible in the plan —
  * column pruning reaching the parquet scan, predicate pushdown,
  * broadcast joins for dims, whole-stage codegen on the relational
  * core. `.explain("formatted")`-driven, following the task brief:
  * "a scan that reads all columns for a 2-column projection is wrong".
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  def simplePlan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("simple"))

  test("kg_triples: scan pruned to exactly the 3 mapped columns") {
    assert(plan(Queries.kgTriples(spark, d)).contains(
      "ReadSchema: struct<n_nationkey:int,n_name:string,n_regionkey:int>"))
  }

  test("kg_mentions: BINARY-dominant columns never reach the scan") {
    val p = plan(Queries.kgMentions(spark, d))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string"))
    assert(!p.contains("lang"), "mention detection must not read lang")
  }

  test("q_join_agg: tiny dim joins via broadcast, key filter pushed") {
    val p = plan(Queries.qJoinAgg(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey)]"))
  }

  test("q_semi_join: selective predicate reaches the parquet scan") {
    val p = plan(Queries.qSemiJoin(spark, d))
    assert(p.contains("GreaterThan(o_totalprice,490000.0)"))
    assert(p.contains("LeftSemi"))
  }

  test("relational core runs inside whole-stage codegen") {
    // AQE's pre-execution plan hides codegen markers; codegen explain
    // mode compiles the stages up front
    def codegen(df: DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("codegen"))
    assert(codegen(Queries.q1Agg(spark, d)).contains("WholeStageCodegen"))
    assert(codegen(Queries.qJoinAgg(spark, d)).contains("WholeStageCodegen"))
  }

  test("text ops: scan pruned to (doc_id, text)") {
    assert(plan(Queries.textTokens(spark, d)).contains(
      "ReadSchema: struct<doc_id:bigint,text:string>"))
    assert(plan(Queries.dedupExact(spark, d)).contains(
      "ReadSchema: struct<doc_id:bigint,text:string>"))
  }
}
