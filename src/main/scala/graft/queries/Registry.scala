package graft.queries

/** Central query registry. Every operator claimed done in SURVEY.md §2
  * and every training-data-pipeline operator registers here, giving the
  * driver harness its `queries` / `oracleSql` maps.
  */
object Registry {
  def all: Seq[Q] =
    Analytics.all ++ Analytics2.all ++ EventsQueries.all ++ TextQueries.all ++
      EmbeddingQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ StreamingQueries.all ++ WodQueries.all ++
      SourceQueries.all ++ PipelineQueries.all

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
