package graft.operators

/** Aggregates every query family into the single catalog consumed by
  * [[graft.SparkEntry]], Verify and Bench. Add new operator families here.
  */
object Catalog {
  def all: Seq[CatalogQuery] =
    RelationalQueries.all ++
      DedupQueries.all ++
      TextQueries.all ++
      SimilarityQueries.all ++
      MultimodalQueries.all ++
      ConnectorQueries.all ++
      FunctionQueries.all ++
      PipelineQueries.all ++
      SamplingQueries.all ++
      CorpusStatsQueries.all ++
      BehaviorQueries.all ++
      CurationQueries.all ++
      OpsQueries.all

  def byName(name: String): CatalogQuery =
    all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"no catalog query named $name"))
}
