package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Mention

/** Entity-link scoring + same-as edge construction.
  *
  * Candidates come from the mention detector (exact gazetteer surface
  * hits). Scoring is relational and codegen'd: a mention supported by
  * the page's own extracted record field (the surface IS the record's
  * entity field) scores 1.0; a bare textual hit scores lower. Edges at
  * or above the threshold become same-as candidates between the MINTED
  * subject URI and the KB entity URI — the input to canonicalization.
  *
  * The records side carries (url, subject URI, entity field); the join
  * is per-url equi (narrow-ish: mentions and records both derive from
  * the same pages scan — Catalyst plans a shuffle join keyed on url,
  * or a broadcast when the records side is small).
  */
object Linker {

  /** @param mentions detected mentions
    * @param subjects DataFrame (url, subj, anchor) where `anchor` is
    *                 the record field a mention must corroborate for a
    *                 full-confidence link (e.g. the extracted country)
    * @return DataFrame (src, dst, score) same-as candidate edges
    */
  def sameAsEdges(
      spark: SparkSession,
      mentions: Dataset[Mention],
      subjects: DataFrame,
      threshold: Double): DataFrame = {
    val m = mentions.toDF()
    m.join(subjects, "url")
      .withColumn("score",
        when(col("surface") === col("anchor"), lit(1.0)).otherwise(lit(0.6)))
      .filter(col("score") >= threshold)
      .select(col("subj").as("src"), col("entity_id").as("dst"), col("score"))
      .distinct()
  }
}
