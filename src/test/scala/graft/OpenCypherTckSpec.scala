package graft

/** The openCypher M09 TCK — the reference's SECOND conformance corpus
  * (`tests/gql_behave/tests/openCypher_M09/features/`, run by its
  * `tests/gql_behave/config.yaml` alongside memgraph_V1). Same harness,
  * same honesty rules as [[GqlBehaveSpec]]: a FAIL is a wrong answer and
  * fails the build; skips are un-claimed surface; floors pin the pass
  * counts observed when each file went green.
  */
class OpenCypherTckSpec extends GqlHarness {

  protected lazy val featureDir =
    "/root/reference/tests/gql_behave/tests/openCypher_M09/features"

  protected lazy val targets: Seq[(String, Int)] = Seq(
    "Aggregation.feature" -> 17,
    "AggregationAcceptance.feature" -> 23,
    "Comparability.feature" -> 3,
    "Create.feature" -> 15,
    "CreateAcceptance.feature" -> 26,
    "DeleteAcceptance.feature" -> 14,
    "EqualsAcceptance.feature" -> 9,
    "ExpressionAcceptance.feature" -> 9,
    "JoinAcceptance.feature" -> 3,
    "KeysAcceptance.feature" -> 5,
    "LabelsAcceptance.feature" -> 9,
    "ListComprehension.feature" -> 2,
    "Literals.feature" -> 27,
    "MatchAcceptance.feature" -> 26,
    "MatchAcceptance2.feature" -> 25,
    "MatchingSelfRelationships.feature" -> 7,
    "MergeNodeAcceptance.feature" -> 13,
    "MergeRelationshipAcceptance.feature" -> 6,
    "NullAcceptance.feature" -> 6,
    "OptionalMatch.feature" -> 3,
    "OptionalMatchAcceptance.feature" -> 7,
    "OrderByAcceptance.feature" -> 5,
    "PatternComprehension.feature" -> 6,
    "RemoveAcceptance.feature" -> 6,
    "ReturnAcceptance.feature" -> 19,
    "ReturnAcceptance2.feature" -> 21,
    "SetAcceptance.feature" -> 5,
    "SkipLimitAcceptance.feature" -> 5,
    "StartingPointAcceptance.feature" -> 4,
    "StartsWithAcceptance.feature" -> 14,
    "TernaryLogicAcceptance.feature" -> 20,
    "TriadicSelection.feature" -> 10,
    "TypeConversionFunctions.feature" -> 6,
    "UnionAcceptance.feature" -> 3,
    "UnwindAcceptance.feature" -> 10,
    "VarLengthAcceptance.feature" -> 15,
    "WhereAcceptance.feature" -> 10,
    "WithAcceptance.feature" -> 12)

  protected lazy val excluded: Map[String, String] = Map.empty
}
