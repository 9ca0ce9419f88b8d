package graft.queries

/** Aggregates every query area's QueryDefs into the single catalog that
  * SparkEntry exposes to the driver. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ CypherQueries.defs ++ ShortestPathQueries.defs ++
      LlmQueries.defs ++ MutationQueries.defs ++ ProcedureQueries.defs ++
      CypherMutationQueries.defs ++ FrontendQueries.defs ++
      StreamingQueries.defs ++ Round3Queries.defs ++ Round9Queries.defs ++
      Round10Queries.defs ++ Round11Queries.defs ++ Round12Queries.defs ++
      Round13Queries.defs ++ Round14Queries.defs ++
      MageSurfaceQueries.defs ++ Round15Queries.defs ++
      Round15NxQueries.defs ++ PokecQueries.defs ++ LdbcQueries.defs ++
      StressQueries.defs

  /** Fails fast on duplicate names (two areas claiming the same operator). */
  require(
    all.map(_.name).distinct.size == all.size,
    s"duplicate query names: ${all.map(_.name).diff(all.map(_.name).distinct)}")
}
