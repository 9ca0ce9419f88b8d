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
    "Aggregation.feature" -> 10,
    "AggregationAcceptance.feature" -> 25,
    "Create.feature" -> 5,
    "CreateAcceptance.feature" -> 30,
    "DeleteAcceptance.feature" -> 19,
    "EqualsAcceptance.feature" -> 4,
    "ExpressionAcceptance.feature" -> 19,
    "JoinAcceptance.feature" -> 2,
    "KeysAcceptance.feature" -> 9,
    "LabelsAcceptance.feature" -> 17,
    "Literals.feature" -> 11,
    "MatchAcceptance.feature" -> 30,
    "MatchAcceptance2.feature" -> 98,
    "MatchingSelfRelationships.feature" -> 19,
    "MergeNodeAcceptance.feature" -> 24,
    "MergeRelationshipAcceptance.feature" -> 30,
    "NullAcceptance.feature" -> 8,
    "OptionalMatch.feature" -> 3,
    "OptionalMatchAcceptance.feature" -> 22,
    "OrderByAcceptance.feature" -> 20,
    "PatternComprehension.feature" -> 15,
    "RemoveAcceptance.feature" -> 8,
    "ReturnAcceptance.feature" -> 16,
    "ReturnAcceptance2.feature" -> 37,
    "SetAcceptance.feature" -> 13,
    "StartingPointAcceptance.feature" -> 3,
    "StartsWithAcceptance.feature" -> 24,
    "TernaryLogicAcceptance.feature" -> 27,
    "TriadicSelection.feature" -> 19,
    "TypeConversionFunctions.feature" -> 42,
    "UnionAcceptance.feature" -> 5,
    "UnwindAcceptance.feature" -> 14,
    "VarLengthAcceptance.feature" -> 28,
    "WhereAcceptance.feature" -> 1,
    "WithAcceptance.feature" -> 17)

  protected lazy val excluded: Map[String, String] = Map(
    "Comparing strings and integers using > in an AND'd predicate" ->
      ("properties are promoted per-label COLUMNS here, so a label whose " +
        "instances mix INTEGER and STRING in one property coerces to one " +
        "column type; the reference types each stored value individually"),
    "Comparing strings and integers using > in a OR'd predicate" ->
      "same per-label column typing divergence as the AND'd variant",
    "Any-typed string comparison" ->
      ("mixed-type property column (INTEGER + STRING under one key) " +
        "coerces to a single column type — per-value typing divergence"),
    "Handle aggregates inside non-aggregate expressions" ->
      ("an aggregate nested inside a map/list item makes the OUTER " +
        "expression's other sub-expressions implicit group keys in Neo4j " +
        "semantics; this engine groups only by whole non-aggregate items"),
    "Aggregation with `min()`" ->
      ("collect() order is unspecified in openCypher; the expected table " +
        "pins Neo4j's insertion order, ours differs deterministically"),
    "Aggregation of named paths" ->
      ("path contents now match exactly; only the collect() ORDER of the " +
        "level-1 paths differs — unspecified in openCypher, Neo4j-order " +
        "pinned by the expected table"),
    "`max()` over mixed values" ->
      ("the reference RAISES on min/max over values of different kinds " +
        "(its own aggregations.feature 'Max test 01' expects the error); " +
        "this table pins Neo4j's type-orderability instead — we follow " +
        "the reference"),
    "`min()` over mixed values" ->
      "same reference-raises-vs-Neo4j-orderability divergence as max()",
    "`toBoolean()` on invalid types (example 3)" ->
      ("the TCK calls toBoolean(integer) invalid; the REFERENCE accepts " +
        "it (awesome_memgraph_functions.cpp:653 ValueInt() != 0) — we " +
        "follow the reference"),
    "`toFloat()` failing on invalid arguments (example 1)" ->
      ("the TCK calls toFloat(boolean) invalid; the reference accepts it " +
        "(ToNumericTypes includes Bool, " +
        "awesome_memgraph_functions.cpp:642,672) — we follow the reference"),
    "`toInteger()` failing on invalid arguments (example 1)" ->
      ("the TCK calls toInteger(boolean) invalid; the reference accepts " +
        "it (awesome_memgraph_functions.cpp:690) — we follow the " +
        "reference"))
}
