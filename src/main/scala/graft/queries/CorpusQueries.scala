package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.CorpusPipeline
import graft.queries.OracleSnippets._

/** End-to-end corpus-curation query: the composed language → quality →
  * near-dup pipeline, oracled as one SQL chain over the same stages.
  */
object CorpusQueries {

  val defs: Map[String, QueryDef] = Map(

    "corpus_clean" -> QueryDef(
      build = (s, dir) => CorpusPipeline.clean(Tables.documents(s, dir),
        keepLangs = Seq("en"), minQuality = 0.28, minJaccard = 0.5),
      oracle = Some(
        s"""WITH $langIdCtes,
           |$qualityCtes,
           |kept AS (
           |  SELECT d.doc_id, d.text, l.predicted, round(q.quality, 6) AS quality
           |  FROM documents d
           |  JOIN langid l USING (doc_id)
           |  JOIN quality q USING (doc_id)
           |  WHERE l.predicted IN ('en') AND round(q.quality, 6) >= 0.28
           |),
           |${shingleCtes("kept")},
           |${jaccardPairCtes(0.5, graft.operators.Dedup.defaultShingleCap)},
           |drops AS (SELECT DISTINCT b AS doc_id FROM pairs)
           |SELECT doc_id, predicted, quality
           |FROM kept
           |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin),
      headline = true
    )
  )
}
