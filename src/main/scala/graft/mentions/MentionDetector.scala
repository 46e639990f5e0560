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
    pages.mapPartitions { it =>
      val ac = bc.value
      it.flatMap { p =>
        val hits =
          if (nonOverlapping) ac.findNonOverlapping(p.text, wordBoundary)
          else ac.findAll(p.text, wordBoundary)
        hits.map { h =>
          val (surf, eid) = ac.patterns(h.patternIdx)
          Mention(p.url, surf, h.begin, h.end, eid)
        }
      }
    }
  }
}
