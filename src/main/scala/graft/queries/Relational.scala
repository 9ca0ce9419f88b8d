package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frames, GraphState}
import graft.operators.Expand
import graft.sources.TpchGraphLoader
import QueryDef._

/** Operator-inventory coverage queries (SURVEY.md §2.1–§2.5) over the
  * TPC-H-ish property graph, each with a DuckDB oracle on the raw tables.
  * Names map 1:1 to reference operators (file:line cited per query).
  */
object Relational {

  private def g(s: SparkSession, dir: String): GraphState =
    TpchGraphLoader(s, dir)

  import Frames.{bind, f, id => vid}

  val defs: Seq[QueryDef] = Seq(
    // ScanAll (operator.hpp:569): full vertex scan, per-label cardinalities.
    QueryDef(
      "scan_all",
      (s, dir) => {
        val gs = g(s, dir)
        gs.nodeLabels
          .map(l => gs.nodes(l).select(lit(l).as("label")))
          .reduce(_ unionByName _)
          .groupBy("label")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("label")
      },
      Some("""SELECT label, cnt FROM (
        SELECT 'Customer' AS label, count(*) AS cnt FROM customer
        UNION ALL SELECT 'Document', count(*) FROM documents
        UNION ALL SELECT 'Embedding', count(*) FROM embeddings
        UNION ALL SELECT 'Event', count(*) FROM events
        UNION ALL SELECT 'Lineitem', count(*) FROM lineitem
        UNION ALL SELECT 'Nation', count(*) FROM nation
        UNION ALL SELECT 'Order', count(*) FROM orders
        UNION ALL SELECT 'Part', count(*) FROM part
        UNION ALL SELECT 'Region', count(*) FROM region
        UNION ALL SELECT 'Supplier', count(*) FROM supplier
      ) ORDER BY label""")),

    // ScanAllByLabelProperties (operator.hpp:888): label + property range.
    QueryDef(
      "scan_by_label_props",
      (s, dir) =>
        g(s, dir)
          .nodes("Customer")
          .filter(col("c_acctbal") > 5000 && col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING'
        ORDER BY c_custkey""")),

    // ScanAllById (operator.hpp:923): point lookup by internal id.
    QueryDef(
      "scan_by_id",
      (s, dir) =>
        g(s, dir)
          .nodes("Customer")
          .filter(col("_id") === TpchGraphLoader.nodeId("Customer", 42L))
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_custkey = 42""")),

    // ScanAllByEdgeType (operator.hpp:667): edge-type cardinalities.
    QueryDef(
      "scan_edges_by_type",
      (s, dir) => {
        val gs = g(s, dir)
        gs.edgeTypes
          .map(t => gs.edges(t).select(lit(t).as("etype")))
          .reduce(_ unionByName _)
          .groupBy("etype")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("etype")
      },
      Some("""SELECT etype, cnt FROM (
        SELECT 'BY_SUPPLIER' AS etype, count(*) AS cnt FROM lineitem
        UNION ALL SELECT 'FROM_NATION',
          (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
        UNION ALL SELECT 'HAS_LINE', count(*) FROM lineitem
        UNION ALL SELECT 'IN_REGION', count(*) FROM nation
        UNION ALL SELECT 'KNOWS', 2 * (SELECT count(*) FROM customer)
        UNION ALL SELECT 'NEAR',
          (SELECT count(*) FROM customer
            WHERE c_custkey % 4 < 3
              AND c_custkey + 1 <= (SELECT max(c_custkey) FROM customer))
          + (SELECT count(*) FROM customer
            WHERE c_custkey % 4 < 2
              AND c_custkey + 2 <= (SELECT max(c_custkey) FROM customer))
        UNION ALL SELECT 'OF_PART', count(*) FROM lineitem
        UNION ALL SELECT 'PLACED', count(*) FROM orders
      ) ORDER BY etype""")),

    // Expand (operator.hpp:1063): one hop + aggregate per neighbor.
    QueryDef(
      "expand_one_hop",
      (s, dir) => {
        val gs = g(s, dir)
        val frame = bind("c")(gs.nodes("Customer"))
        Expand(frame, gs, "c", "e", Seq("FROM_NATION"), Expand.Out, "n", Some("Nation"))
          .groupBy(f("n", "n_name").as("n_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            moneySum(f("c", "c_acctbal")).as("total_bal"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, count(*) AS n_cust, ${sqlSum("c_acctbal")} AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // Expand chain, 2 hops: Customer→Nation→Region.
    QueryDef(
      "expand_two_hop",
      (s, dir) => {
        val gs = g(s, dir)
        val frame = bind("c")(gs.nodes("Customer"))
        val h1 = Expand(frame, gs, "c", "e1", Seq("FROM_NATION"), Expand.Out, "n", Some("Nation"))
        Expand(h1, gs, "n", "e2", Seq("IN_REGION"), Expand.Out, "r", Some("Region"))
          .groupBy(f("r", "r_name").as("r_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            moneySum(f("c", "c_acctbal")).as("total_bal"))
          .orderBy("r_name")
      },
      Some(s"""SELECT r_name, count(*) AS n_cust, ${sqlSum("c_acctbal")} AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // Expand reverse direction (EdgeAtom::Direction::IN).
    QueryDef(
      "expand_reverse",
      (s, dir) => {
        val gs = g(s, dir)
        val frame = bind("n")(gs.nodes("Nation"))
        Expand(frame, gs, "n", "e", Seq("FROM_NATION"), Expand.In, "s", Some("Supplier"))
          .groupBy(f("n", "n_name").as("n_name"))
          .agg(count(lit(1)).as("n_supp"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_supp
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // Expand with existing_node (operator.hpp:1063 `existing_node_`):
    // cycle check — customer who placed an order containing a line supplied
    // from the customer's own nation.
    QueryDef(
      "expand_existing_node",
      (s, dir) => {
        val gs = g(s, dir)
        var fr = bind("c")(gs.nodes("Customer"))
        fr = Expand(fr, gs, "c", "e1", Seq("PLACED"), Expand.Out, "o", Some("Order"))
        fr = Expand(fr, gs, "o", "e2", Seq("HAS_LINE"), Expand.Out, "l", Some("Lineitem"))
        fr = Expand(fr, gs, "l", "e3", Seq("BY_SUPPLIER"), Expand.Out, "sp", Some("Supplier"))
        fr = Expand(fr, gs, "sp", "e4", Seq("FROM_NATION"), Expand.Out, "n", Some("Nation"))
        // existing endpoint: the customer's FROM_NATION must land on the same n
        fr = Expand.toExisting(fr, gs, "c", "e5", Seq("FROM_NATION"), Expand.Out, "n")
        fr.groupBy(f("n", "n_name").as("n_name"))
          .agg(countDistinct(f("c", "c_custkey")).as("n_local_cust"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(DISTINCT c_custkey) AS n_local_cust
        FROM customer
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // Filter (operator.hpp:1289) + Produce (operator.hpp:1347): expression
    // projection with Cypher-style functions.
    QueryDef(
      "filter_produce_exprs",
      (s, dir) =>
        g(s, dir)
          .nodes("Part")
          .filter(col("p_size") >= 40 && !(col("p_brand") === "Brand#33"))
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            substring(col("p_name"), 1, 8).as("prefix"),
            length(col("p_name")).as("name_len"),
            round(col("p_retailprice") * 1.1, 2).as("marked_up"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS uname,
          substr(p_name, 1, 8) AS prefix,
          length(p_name) AS name_len,
          round(p_retailprice * 1.1, 2) AS marked_up
        FROM part WHERE p_size >= 40 AND NOT (p_brand = 'Brand#33')
        ORDER BY p_partkey""")),

    // Aggregate (operator.hpp:1910): all core ops incl. per-element DISTINCT
    // (Aggregation::Op, src/query/frontend/ast/query/aggregation.hpp:27).
    QueryDef(
      "agg_ops",
      (s, dir) =>
        g(s, dir)
          .nodes("Lineitem")
          .groupBy(col("l_returnflag").as("l_returnflag"))
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_suppkey")).as("n_supp"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            moneySum(col("l_extendedprice")).as("sum_price"),
            moneyAvg(col("l_discount")).as("avg_disc"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, count(*) AS n_rows,
          count(DISTINCT l_suppkey) AS n_supp,
          min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
          ${sqlSum("l_extendedprice")} AS sum_price,
          ${sqlAvg("l_discount")} AS avg_disc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // The TPC-H Q1 shape — flagship aggregation (Aggregate + Filter + Sort).
    QueryDef(
      "agg_pricing_summary",
      (s, dir) =>
        g(s, dir)
          .nodes("Lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            moneySum(col("l_quantity")).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_base_price"),
            moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("sum_disc_price"),
            moneyAvg(col("l_quantity")).as("avg_qty"),
            moneyAvg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
          ${sqlSum("l_quantity")} AS sum_qty,
          ${sqlSum("l_extendedprice")} AS sum_base_price,
          ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
          ${sqlAvg("l_quantity")} AS avg_qty,
          ${sqlAvg("l_extendedprice")} AS avg_price,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // COLLECT_LIST (aggregation.hpp:27) — deterministic via sort + join.
    QueryDef(
      "agg_collect",
      (s, dir) => {
        val gs = g(s, dir)
        val frame = bind("n")(gs.nodes("Nation"))
        Expand(frame, gs, "n", "e", Seq("FROM_NATION"), Expand.In, "sp", Some("Supplier"))
          .groupBy(f("n", "n_name").as("n_name"))
          .agg(
            array_join(sort_array(collect_list(f("sp", "s_name"))), ",")
              .as("suppliers"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
          array_to_string(list_sort(list(s_name)), ',') AS suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // OrderBy + Skip + Limit (operator.hpp:2534,2382,2480).
    QueryDef(
      "orderby_skip_limit",
      (s, dir) =>
        g(s, dir)
          .nodes("Order")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select(col("o_orderkey"), col("o_totalprice"))
          .offset(5)
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 5""")),

    // Distinct (operator.hpp:2719).
    QueryDef(
      "distinct_",
      (s, dir) =>
        g(s, dir)
          .nodes("Customer")
          .select(col("c_mktsegment"))
          .distinct()
          .orderBy("c_mktsegment"),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // Union distinct / Union all (operator.hpp:2751 + Distinct on top).
    QueryDef(
      "union_distinct",
      (s, dir) => {
        val gs = g(s, dir)
        gs.nodes("Nation")
          .select(substring(col("n_name"), 1, 1).as("initial"))
          .unionByName(
            gs.nodes("Region").select(substring(col("r_name"), 1, 1).as("initial")))
          .distinct()
          .orderBy("initial")
      },
      Some("""SELECT substr(n_name,1,1) AS initial FROM nation
        UNION SELECT substr(r_name,1,1) FROM region ORDER BY initial""")),

    // Unwind (operator.hpp:2687): explode a list-valued expression.
    QueryDef(
      "unwind_words",
      (s, dir) =>
        g(s, dir)
          .nodes("Part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("word"),
      Some("""SELECT word, count(*) AS cnt FROM (
          SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        GROUP BY word ORDER BY word""")),

    // Optional (operator.hpp:2636): OPTIONAL MATCH → left outer join;
    // customers with zero orders kept with count 0.
    QueryDef(
      "optional_match",
      (s, dir) => {
        val gs = g(s, dir)
        val frame = bind("c")(gs.nodes("Customer"))
        val placed = bind("e")(gs.edges("PLACED"))
        frame
          .join(placed, vid("c") === Frames.src("e"), "left_outer")
          .groupBy(f("c", "c_custkey").as("c_custkey"))
          .agg(count(Frames.dst("e")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // EvaluatePatternFilter / exists() (operator.hpp:2427) → left-semi join.
    QueryDef(
      "pattern_filter_exists",
      (s, dir) => {
        val gs = g(s, dir)
        val frame = bind("c")(gs.nodes("Customer"))
        val bigOrders = bind("o")(
          gs.nodes("Order").filter(col("o_totalprice") > 200000))
        val placed = bind("e")(gs.edges("PLACED"))
        val matched = placed.join(
          bigOrders, Frames.dst("e") === vid("o"), "left_semi")
        frame
          .join(matched, vid("c") === Frames.src("e"), "left_semi")
          .select(f("c", "c_custkey").as("c_custkey"), f("c", "c_name").as("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        ORDER BY c_custkey""")),

    // NOT exists() → left-anti join (MERGE's match-miss branch shape,
    // operator.hpp:2579).
    QueryDef(
      "pattern_filter_not_exists",
      (s, dir) => {
        val gs = g(s, dir)
        val frame = bind("c")(gs.nodes("Customer"))
        val bigOrders = bind("o")(
          gs.nodes("Order").filter(col("o_totalprice") > 250000))
        val placed = bind("e")(gs.edges("PLACED"))
        val matched = placed.join(
          bigOrders, Frames.dst("e") === vid("o"), "left_semi")
        frame
          .join(matched, vid("c") === Frames.src("e"), "left_anti")
          .select(f("c", "c_custkey").as("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        ORDER BY c_custkey""")),

    // HashJoin (operator.hpp:3145): explicit equi-join between branches.
    QueryDef(
      "hash_join",
      (s, dir) => {
        val gs = g(s, dir)
        val o = gs.nodes("Order").filter(col("o_totalprice") > 300000)
        val c = gs.nodes("Customer")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 300000 ORDER BY o_orderkey""")),

    // Cartesian (operator.hpp:2797): cross product of two branches.
    QueryDef(
      "cartesian",
      (s, dir) => {
        val gs = g(s, dir)
        val r = gs.nodes("Region").select(col("r_name"))
        val seg = gs.nodes("Customer").select(col("c_mktsegment")).distinct()
        r.crossJoin(seg).orderBy("r_name", "c_mktsegment")
      },
      Some("""SELECT r_name, c_mktsegment
        FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
        ORDER BY r_name, c_mktsegment""")),

    // Temporal component access (awesome_memgraph_functions.cpp:2150-2154;
    // PropertyLookup on temporals → year()/month()/…).
    QueryDef(
      "fn_temporal",
      (s, dir) =>
        g(s, dir)
          .nodes("Order")
          .groupBy(
            year(col("o_orderdate")).cast("long").as("o_year"),
            month(col("o_orderdate")).cast("long").as("o_month"))
          .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
          .orderBy("o_year", "o_month"),
      Some(s"""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
          EXTRACT(month FROM o_orderdate) AS o_month,
          count(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
        FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""")),

    // Math/string function coverage (awesome_memgraph_functions.cpp:2102-2143).
    QueryDef(
      "fn_scalar",
      (s, dir) =>
        g(s, dir)
          .nodes("Supplier")
          .select(
            col("s_suppkey"),
            abs(col("s_acctbal")).as("abs_bal"),
            ceil(col("s_acctbal")).cast("double").as("ceil_bal"),
            floor(col("s_acctbal")).cast("double").as("floor_bal"),
            round(sqrt(abs(col("s_acctbal"))), 4).as("sqrt_bal"),
            lower(col("s_name")).as("lname"),
            reverse(col("s_name")).as("rname"),
            concat(col("s_name"), lit("#"), col("s_suppkey")).as("tagged"))
          .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, abs(s_acctbal) AS abs_bal,
          CAST(ceil(s_acctbal) AS DOUBLE) AS ceil_bal,
          CAST(floor(s_acctbal) AS DOUBLE) AS floor_bal,
          round(sqrt(abs(s_acctbal)), 4) AS sqrt_bal,
          lower(s_name) AS lname, reverse(s_name) AS rname,
          concat(s_name, '#', CAST(s_suppkey AS VARCHAR)) AS tagged
        FROM supplier ORDER BY s_suppkey""")),

    // Event-stream style aggregation (events table).
    QueryDef(
      "events_by_type",
      (s, dir) =>
        g(s, dir)
          .nodes("Event")
          .groupBy(col("event_type"), date_trunc("month", col("ts")).cast("date").as("month"))
          .agg(
            count(lit(1)).as("n_events"),
            moneySum(col("value")).as("total_value"))
          .orderBy("event_type", "month"),
      Some(s"""SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
          count(*) AS n_events, ${sqlSum("value")} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY event_type, month"""))
  )
}
