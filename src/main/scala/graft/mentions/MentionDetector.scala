package graft.mentions

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Mention, Page}

/** Batched mention detection: broadcast trie + typed `mapPartitions`
  * over the page text (the one place the pipeline deliberately leaves
  * pure Column trees — a trie scan has no relational equivalent that
  * wouldn't be a cross join; SURVEY.md §2.2 UDF row).
  *
  * Stays a NARROW transformation: no shuffle, pipelined with the
  * extraction/mapping stage.
  */
object MentionDetector {

  def detect(
      spark: SparkSession,
      pages: Dataset[Page],
      gazetteer: Seq[(String, String)],
      wordBoundary: Boolean = true,
      nonOverlapping: Boolean = true): Dataset[Mention] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(AhoCorasick.build(gazetteer))
    // project to (url, text) BEFORE the typed boundary: the detector
    // never needs warc_ts/html/lang, so this keeps the BINARY html
    // column prunable at the scan (input_hint: html dominates page
    // size) and halves object deserialization in the hot loop
    pages.select(org.apache.spark.sql.functions.col("url"),
        org.apache.spark.sql.functions.col("text")).as[(String, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.flatMap { case (url, text) =>
          val hits =
            if (nonOverlapping) ac.findNonOverlapping(text, wordBoundary)
            else ac.findAll(text, wordBoundary)
          hits.map { h =>
            val (surf, eid) = ac.patterns(h.patternIdx)
            Mention(url, surf, h.begin, h.end, eid)
          }
        }
      }
  }
}
