package graft.queries

import org.apache.spark.sql.SparkSession

import graft.core.GraphState
import graft.cypher.Cypher

/** Gates for the `nxalg` module port (reference
  * `query_modules/nxalg.py`). Every numeric oracle below was computed
  * with networkx 3.6 on the same fixture shape (see the per-gate
  * comments); node-valued yields map back to stable `k` properties via
  * `MATCH … WHERE id(x) = node`. */
object Round15NxQueries {

  private def empty = GraphState(Map.empty, Map.empty)

  /** DAG: p0→p1→p2→p3 plus the p1→p3 skip, weighted. */
  private def dag(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:Nx1 {k: 0}), (b:Nx1 {k: 1}), (c:Nx1 {k: 2}),
        |       (d:Nx1 {k: 3}),
        |       (a)-[:NE {w: 1.0}]->(b), (b)-[:NE {w: 1.0}]->(c),
        |       (c)-[:NE {w: 1.0}]->(d), (b)-[:NE {w: 5.0}]->(d)""".stripMargin)
      .graph

  /** triangle 0→1→2→0, mutual 2↔3, isolated 4. */
  private def mixed(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:Nx3 {k: 0}), (b:Nx3 {k: 1}), (c:Nx3 {k: 2}),
        |       (d:Nx3 {k: 3}), (e:Nx3 {k: 4}),
        |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(a),
        |       (c)-[:NE]->(d), (d)-[:NE]->(c)""".stripMargin).graph

  private def c5(s: SparkSession) =
    Cypher.execute(
      s, empty,
      """CREATE (a:C5 {k: 0}), (b:C5 {k: 1}), (c:C5 {k: 2}),
        |       (d:C5 {k: 3}), (e:C5 {k: 4}),
        |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(d),
        |       (d)-[:NE]->(e), (e)-[:NE]->(a)""".stripMargin).graph

  val defs: Seq[QueryDef] = Seq(

    // topological order + BFS/DFS orders are unique on this DAG: the
    // sort is [0,1,2,3] with the skip edge absorbed
    QueryDef(
      "call_nxalg_traversal",
      (s, dir) => {
        val gr = dag(s)
        val topo = Cypher.run(
          s, gr,
          """CALL nxalg.topological_sort() YIELD nodes
            |MATCH (a:Nx1 {k: 0}), (d:Nx1 {k: 3})
            |RETURN size(nodes) AS n, nodes[0] = id(a) AS first_ok,
            |       nodes[3] = id(d) AS last_ok""".stripMargin)
        val bfs = Cypher.run(
          s, gr,
          """MATCH (a:Nx1 {k: 0})
            |CALL nxalg.bfs_tree(a) YIELD tree
            |RETURN size(tree) AS bfs_n""".stripMargin)
        val dfs = Cypher.run(
          s, gr,
          """MATCH (a:Nx1 {k: 0})
            |CALL nxalg.dfs_preorder_nodes(a) YIELD nodes
            |RETURN size(nodes) AS dfs_n""".stripMargin)
        topo.crossJoin(bfs).crossJoin(dfs)
      },
      Some("SELECT CAST(4 AS BIGINT) AS n, true AS first_ok, " +
        "true AS last_ok, CAST(4 AS BIGINT) AS bfs_n, " +
        "CAST(4 AS BIGINT) AS dfs_n")),

    // weighted shortest path takes the 3-hop route (3.0 < 1+5); two
    // simple paths; no reverse path; 3 ancestors of the sink; the LCA
    // of (c, d) is c itself
    QueryDef(
      "call_nxalg_paths",
      (s, dir) => {
        val gr = dag(s)
        val sp = Cypher.run(
          s, gr,
          """MATCH (a:Nx1 {k: 0}), (d:Nx1 {k: 3})
            |CALL nxalg.shortest_path_length(a, d, 'w') YIELD length
            |RETURN length""".stripMargin)
        val asp = Cypher.run(
          s, gr,
          """MATCH (a:Nx1 {k: 0}), (d:Nx1 {k: 3})
            |CALL nxalg.all_simple_paths(a, d, null) YIELD paths
            |RETURN size(paths) AS nsimple""".stripMargin)
        val hp = Cypher.run(
          s, gr,
          """MATCH (a:Nx1 {k: 0}), (d:Nx1 {k: 3})
            |CALL nxalg.has_path(d, a) YIELD has_path
            |RETURN has_path AS back""".stripMargin)
        val anc = Cypher.run(
          s, gr,
          """MATCH (d:Nx1 {k: 3})
            |CALL nxalg.ancestors(d) YIELD ancestors
            |RETURN size(ancestors) AS nanc""".stripMargin)
        val lca = Cypher.run(
          s, gr,
          """MATCH (c:Nx1 {k: 2}), (d:Nx1 {k: 3})
            |CALL nxalg.lowest_common_ancestor(c, d) YIELD ancestor
            |MATCH (x:Nx1) WHERE id(x) = ancestor
            |RETURN x.k AS lca""".stripMargin)
        sp.crossJoin(asp).crossJoin(hp).crossJoin(anc).crossJoin(lca)
      },
      Some("SELECT 3.0 AS length, CAST(2 AS BIGINT) AS nsimple, " +
        "false AS back, CAST(3 AS BIGINT) AS nanc, " +
        "CAST(2 AS BIGINT) AS lca")),

    // networkx on the same shape: SCC sizes [1, 4], all-2 core numbers
    // (isolate 0), one bridge-free biconnected pair plus the triangle
    QueryDef(
      "call_nxalg_components",
      (s, dir) => {
        val gr = mixed(s)
        val scc = Cypher.run(
          s, gr,
          """CALL nxalg.strongly_connected_components() YIELD components
            |UNWIND components AS c
            |RETURN size(c) AS sz ORDER BY sz""".stripMargin)
        val core = Cypher.run(
          s, gr,
          """CALL nxalg.core_number() YIELD node, core
            |MATCH (x:Nx3) WHERE id(x) = node
            |RETURN sum(core) AS coresum""".stripMargin)
        val bcc = Cypher.run(
          s, gr,
          """CALL nxalg.biconnected_components() YIELD components
            |RETURN size(components) AS nbcc""".stripMargin)
        val br = Cypher.run(
          s, gr,
          "CALL nxalg.bridges(null) YIELD bridges " +
            "RETURN size(bridges) AS nbridges")
        scc.crossJoin(core).crossJoin(bcc).crossJoin(br)
      },
      // networkx core_number: {0:2,1:2,2:2,3:2,4:0} → sum 8
      Some("""SELECT CAST(sz AS BIGINT) AS sz, CAST(8 AS BIGINT) AS coresum,
             |       CAST(2 AS BIGINT) AS nbcc, CAST(1 AS BIGINT) AS nbridges
             |FROM (VALUES (1), (4)) v(sz) ORDER BY sz""".stripMargin)),

    // C5 verdicts straight from networkx: not chordal, AT-free,
    // distance-regular, strongly regular, planar, not bipartite
    QueryDef(
      "call_nxalg_flags",
      (s, dir) => {
        val gr = c5(s)
        def q(call: String) = Cypher.run(s, gr, call)
        q("CALL nxalg.is_chordal() YIELD is_chordal RETURN is_chordal")
          .crossJoin(q(
            "CALL nxalg.is_at_free() YIELD is_at_free RETURN is_at_free"))
          .crossJoin(q("CALL nxalg.is_distance_regular() " +
            "YIELD is_distance_regular RETURN is_distance_regular"))
          .crossJoin(q("CALL nxalg.is_strongly_regular() " +
            "YIELD is_strongly_regular RETURN is_strongly_regular"))
          .crossJoin(q("CALL nxalg.check_planarity() " +
            "YIELD is_planar RETURN is_planar"))
          .crossJoin(q("CALL nxalg.is_bipartite() " +
            "YIELD is_bipartite RETURN is_bipartite"))
      },
      Some("SELECT false AS is_chordal, true AS is_at_free, " +
        "true AS is_distance_regular, true AS is_strongly_regular, " +
        "true AS is_planar, false AS is_bipartite")),

    // directed 3-cycle is eulerian; the 2-edge path only has an euler
    // path (semieulerian)
    QueryDef(
      "call_nxalg_euler",
      (s, dir) => {
        val tri = Cypher.execute(
          s, empty,
          """CREATE (a:Eu {k: 0}), (b:Eu {k: 1}), (c:Eu {k: 2}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(a)""".stripMargin)
          .graph
        val path = Cypher.execute(
          s, empty,
          """CREATE (a:Ep {k: 0}), (b:Ep {k: 1}), (c:Ep {k: 2}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c)""".stripMargin).graph
        Cypher.run(s, tri,
          "CALL nxalg.is_eulerian() YIELD is_eulerian RETURN is_eulerian")
          .crossJoin(Cypher.run(s, path,
            "CALL nxalg.is_semieulerian() YIELD is_semieulerian " +
              "RETURN is_semieulerian"))
          .crossJoin(Cypher.run(s, path,
            "CALL nxalg.has_eulerian_path() YIELD has_eulerian_path " +
              "RETURN has_eulerian_path"))
      },
      Some("SELECT true AS is_eulerian, true AS is_semieulerian, " +
        "true AS has_eulerian_path")),

    // networkx betweenness on the directed 5-path:
    // [0, 0.25, 1/3, 0.25, 0]
    QueryDef(
      "call_nxalg_betweenness",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Bw {k: 0}), (b:Bw {k: 1}), (c:Bw {k: 2}),
            |       (d:Bw {k: 3}), (e:Bw {k: 4}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(d),
            |       (d)-[:NE]->(e)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """CALL nxalg.betweenness_centrality(null, true, null, false)
            |YIELD node, betweenness
            |MATCH (x:Bw) WHERE id(x) = node
            |RETURN x.k AS k, round(betweenness, 6) AS b
            |ORDER BY k""".stripMargin)
      },
      Some("""SELECT CAST(k AS BIGINT) AS k, b FROM (VALUES
             |  (0, 0.0), (1, 0.25), (2, 0.333333), (3, 0.25), (4, 0.0))
             |  v(k, b) ORDER BY k""".stripMargin)),

    // networkx: directed-triangle clustering = 0.5 per node; pagerank
    // on the 0→{1,2,3} star: hub 0.206186, leaves 0.264605
    QueryDef(
      "call_nxalg_clustering_pr",
      (s, dir) => {
        val tri = Cypher.execute(
          s, empty,
          """CREATE (a:Cl {k: 0}), (b:Cl {k: 1}), (c:Cl {k: 2}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(a)""".stripMargin)
          .graph
        val star = Cypher.execute(
          s, empty,
          """CREATE (h:Pr {k: 0}), (x:Pr {k: 1}), (y:Pr {k: 2}),
            |       (z:Pr {k: 3}),
            |       (h)-[:NE]->(x), (h)-[:NE]->(y), (h)-[:NE]->(z)""".stripMargin)
          .graph
        val cl = Cypher.run(
          s, tri,
          """CALL nxalg.clustering(null, null) YIELD node, clustering
            |RETURN round(sum(clustering), 6) AS clsum""".stripMargin)
        val pr = Cypher.run(
          s, star,
          """CALL nxalg.pagerank() YIELD node, rank
            |MATCH (x:Pr) WHERE id(x) = node
            |RETURN round(min(CASE WHEN x.k = 0 THEN rank END), 6) AS hub,
            |       round(max(CASE WHEN x.k > 0 THEN rank END), 6) AS leaf
            |""".stripMargin)
        cl.crossJoin(pr)
      },
      Some("SELECT 1.5 AS clsum, 0.206186 AS hub, 0.264605 AS leaf")),

    // K4 has exactly one maximal clique; the two-triangles-sharing-an-
    // edge graph percolates into one k=3 community of 4 nodes
    QueryDef(
      "call_nxalg_cliques",
      (s, dir) => {
        val k4 = Cypher.execute(
          s, empty,
          """CREATE (a:K4 {k: 0}), (b:K4 {k: 1}), (c:K4 {k: 2}),
            |       (d:K4 {k: 3}),
            |       (a)-[:NE]->(b), (a)-[:NE]->(c), (a)-[:NE]->(d),
            |       (b)-[:NE]->(c), (b)-[:NE]->(d), (c)-[:NE]->(d)""".stripMargin)
          .graph
        val kc = Cypher.execute(
          s, empty,
          """CREATE (a:Kc {k: 0}), (b:Kc {k: 1}), (c:Kc {k: 2}),
            |       (d:Kc {k: 3}), (e:Kc {k: 4}), (f:Kc {k: 5}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(a),
            |       (b)-[:NE]->(d), (c)-[:NE]->(d), (e)-[:NE]->(f)""".stripMargin)
          .graph
        val cli = Cypher.run(
          s, k4,
          """CALL nxalg.find_cliques() YIELD cliques
            |RETURN size(cliques) AS ncliques,
            |       size(cliques[0]) AS csize""".stripMargin)
        val comm = Cypher.run(
          s, kc,
          """CALL nxalg.k_clique_communities(3, null) YIELD communities
            |RETURN size(communities) AS ncomm,
            |       size(communities[0]) AS commsize""".stripMargin)
        cli.crossJoin(comm)
      },
      Some("SELECT CAST(1 AS BIGINT) AS ncliques, " +
        "CAST(4 AS BIGINT) AS csize, CAST(1 AS BIGINT) AS ncomm, " +
        "CAST(4 AS BIGINT) AS commsize")),

    // networkx triadic_census on the mixed fixture:
    // 003:2, 012:4, 102:1, 111D:1, 111U:1, 030C:1, rest 0
    QueryDef(
      "call_nxalg_census",
      (s, dir) => {
        val gr = mixed(s)
        Cypher.run(
          s, gr,
          """CALL nxalg.triadic_census() YIELD triad, count
            |RETURN triad, count ORDER BY triad""".stripMargin)
      },
      Some("""SELECT t AS triad, CAST(c AS BIGINT) AS count FROM (VALUES
             |  ('003', 2), ('012', 4), ('021C', 0), ('021D', 0),
             |  ('021U', 0), ('030C', 1), ('030T', 0), ('102', 1),
             |  ('111D', 1), ('111U', 1), ('120C', 0), ('120D', 0),
             |  ('120U', 0), ('201', 0), ('210', 0), ('300', 0)) v(t, c)
             |ORDER BY triad""".stripMargin)),

    // directed C4: wiener 24, diameter 3, 4-node center; undirected
    // global efficiency 5/6; the two non-adjacent pairs have jaccard 1
    QueryDef(
      "call_nxalg_distance",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:C4 {k: 0}), (b:C4 {k: 1}), (c:C4 {k: 2}),
            |       (d:C4 {k: 3}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(d),
            |       (d)-[:NE]->(a)""".stripMargin).graph
        val wi = Cypher.run(s, gr,
          "CALL nxalg.wiener_index(null) YIELD wiener_index " +
            "RETURN wiener_index")
        val di = Cypher.run(s, gr,
          "CALL nxalg.diameter() YIELD diameter RETURN diameter")
        val ce = Cypher.run(s, gr,
          "CALL nxalg.center() YIELD center RETURN size(center) AS ncenter")
        val ge = Cypher.run(s, gr,
          "CALL nxalg.global_efficiency() YIELD global_efficiency " +
            "RETURN round(global_efficiency, 6) AS ge")
        val ja = Cypher.run(s, gr,
          """CALL nxalg.jaccard_coefficient(null) YIELD u, v, coef
            |RETURN count(*) AS npairs, sum(coef) AS jsum""".stripMargin)
        wi.crossJoin(di).crossJoin(ce).crossJoin(ge).crossJoin(ja)
      },
      Some("SELECT 24.0 AS wiener_index, CAST(3 AS BIGINT) AS diameter, " +
        "CAST(4 AS BIGINT) AS ncenter, 0.833333 AS ge, " +
        "CAST(2 AS BIGINT) AS npairs, 2.0 AS jsum")),

    // K4 as a full digraph has vertex connectivity 3 (true pairwise
    // minimum); the mutual pair + pendant splits into [2] [1] [1] under
    // k_edge_components(1) like networkx
    QueryDef(
      "call_nxalg_connectivity",
      (s, dir) => {
        val k4d = Cypher.execute(
          s, empty,
          """CREATE (a:Kd {k: 0}), (b:Kd {k: 1}), (c:Kd {k: 2}),
            |       (d:Kd {k: 3})
            |WITH a, b, c, d
            |UNWIND [[a,b],[b,a],[a,c],[c,a],[a,d],[d,a],[b,c],[c,b],
            |        [b,d],[d,b],[c,d],[d,c]] AS p
            |WITH p[0] AS x, p[1] AS y
            |CREATE (x)-[:NE]->(y)""".stripMargin).graph
        val kec = Cypher.execute(
          s, empty,
          """CREATE (a:Ke {k: 0}), (b:Ke {k: 1}), (c:Ke {k: 2}),
            |       (d:Ke {k: 3}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(a), (c)-[:NE]->(d)""".stripMargin)
          .graph
        val nc = Cypher.run(s, k4d,
          "CALL nxalg.node_connectivity(null, null) YIELD connectivity " +
            "RETURN connectivity")
        val st = Cypher.run(s, k4d,
          """MATCH (a:Kd {k: 0}), (d:Kd {k: 3})
            |CALL nxalg.node_connectivity(a, d) YIELD connectivity
            |RETURN connectivity AS stconn""".stripMargin)
        val ke = Cypher.run(s, kec,
          """CALL nxalg.k_edge_components(1) YIELD components
            |UNWIND components AS c RETURN size(c) AS sz ORDER BY sz""".stripMargin)
        nc.crossJoin(st).crossJoin(ke)
      },
      Some("""SELECT CAST(3 AS BIGINT) AS connectivity,
             |       CAST(3 AS BIGINT) AS stconn, CAST(sz AS BIGINT) AS sz
             |FROM (VALUES (1), (1), (2)) v(sz) ORDER BY sz""".stripMargin)),

    // networkx communicability on the 2-edge path: C(0,2) = 0.589092;
    // non_randomness of P6 with k=2 per the paper's top-k eigenvalues
    // (networkx sums numpy's arbitrary-order first two — divergence
    // documented in NxAlgProcs2)
    QueryDef(
      "call_nxalg_spectral",
      (s, dir) => {
        val p3 = Cypher.execute(
          s, empty,
          """CREATE (a:P3 {k: 0}), (b:P3 {k: 1}), (c:P3 {k: 2}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c)""".stripMargin).graph
        val p6 = Cypher.execute(
          s, empty,
          """CREATE (a:P6 {k: 0}), (b:P6 {k: 1}), (c:P6 {k: 2}),
            |       (d:P6 {k: 3}), (e:P6 {k: 4}), (f:P6 {k: 5}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(d),
            |       (d)-[:NE]->(e), (e)-[:NE]->(f)""".stripMargin).graph
        val co = Cypher.run(
          s, p3,
          """CALL nxalg.communicability() YIELD node1, node2,
            |     communicability
            |MATCH (x:P3 {k: 0}), (y:P3 {k: 2})
            |WHERE node1 = id(x) AND node2 = id(y)
            |RETURN round(communicability, 6) AS c02""".stripMargin)
        val nr = Cypher.run(
          s, p6,
          """CALL nxalg.non_randomness(2)
            |YIELD non_randomness, relative_non_randomness
            |RETURN round(non_randomness, 6) AS nr,
            |       round(relative_non_randomness, 6) AS nrel""".stripMargin)
        co.crossJoin(nr)
      },
      Some("SELECT 0.589092 AS c02, 3.048917 AS nr, -0.828798 AS nrel")),

    // mst weight (1.0 + 1.5 + 2.0), voronoi cell sizes, the two
    // 3-edge chains, CHK-idoms of the diamond CFG, flow hierarchy and
    // reciprocity of the mixed fixture — all networkx-checked
    QueryDef(
      "call_nxalg_misc",
      (s, dir) => {
        val wg = Cypher.execute(
          s, empty,
          """CREATE (a:Mw {k: 0}), (b:Mw {k: 1}), (c:Mw {k: 2}),
            |       (d:Mw {k: 3}),
            |       (a)-[:NE {weight: 1.0}]->(b),
            |       (b)-[:NE {weight: 2.0}]->(c),
            |       (c)-[:NE {weight: 3.0}]->(a),
            |       (c)-[:NE {weight: 1.5}]->(d)""".stripMargin).graph
        val vg = Cypher.execute(
          s, empty,
          """CREATE (a:Vo {k: 0}), (b:Vo {k: 1}), (c:Vo {k: 2}),
            |       (d:Vo {k: 3}), (e:Vo {k: 4}),
            |       (a)-[:NE {weight: 1.0}]->(b),
            |       (b)-[:NE {weight: 1.0}]->(c),
            |       (d)-[:NE {weight: 1.0}]->(c),
            |       (c)-[:NE {weight: 5.0}]->(e)""".stripMargin).graph
        val cg = Cypher.execute(
          s, empty,
          """CREATE (a:Ch {k: 0}), (b:Ch {k: 1}), (c:Ch {k: 2}),
            |       (d:Ch {k: 3}), (e:Ch {k: 4}),
            |       (a)-[:NE]->(b), (b)-[:NE]->(c), (c)-[:NE]->(a),
            |       (c)-[:NE]->(d), (d)-[:NE]->(e), (e)-[:NE]->(c)""".stripMargin)
          .graph
        val dg = Cypher.execute(
          s, empty,
          """CREATE (a:Dm {k: 0}), (b:Dm {k: 1}), (c:Dm {k: 2}),
            |       (d:Dm {k: 3}),
            |       (a)-[:NE]->(b), (a)-[:NE]->(c), (b)-[:NE]->(d),
            |       (c)-[:NE]->(d)""".stripMargin).graph
        val mst = Cypher.run(
          s, wg,
          """CALL nxalg.minimum_spanning_tree('weight', 'kruskal', false)
            |YIELD nodes, edges RETURN size(edges) AS mste""".stripMargin)
        val vo = Cypher.run(
          s, vg,
          """MATCH (a:Vo {k: 0}), (d:Vo {k: 3})
            |CALL nxalg.voronoi_cells([a, d], 'weight')
            |YIELD center, cell RETURN size(cell) AS csz ORDER BY csz""".stripMargin)
        val ch = Cypher.run(
          s, cg,
          """CALL nxalg.chain_decomposition(null) YIELD chains
            |RETURN size(chains) AS nchains,
            |       size(chains[0]) AS chlen""".stripMargin)
        val dm = Cypher.run(
          s, dg,
          """MATCH (a:Dm {k: 0})
            |CALL nxalg.immediate_dominators(a) YIELD node, dominator
            |MATCH (x:Dm {k: 3}), (r:Dm {k: 0})
            |WHERE node = id(x)
            |RETURN dominator = id(r) AS sink_dom_is_root""".stripMargin)
        val fr = Cypher.run(
          s, mixed(s),
          """CALL nxalg.flow_hierarchy(null) YIELD flow_hierarchy
            |RETURN flow_hierarchy AS fh""".stripMargin)
        val rc = Cypher.run(
          s, mixed(s),
          """CALL nxalg.reciprocity(null) YIELD node, reciprocity
            |RETURN round(reciprocity, 6) AS recip""".stripMargin)
        mst.crossJoin(vo).crossJoin(ch).crossJoin(dm)
          .crossJoin(fr).crossJoin(rc)
      },
      Some("""SELECT CAST(3 AS BIGINT) AS mste, CAST(csz AS BIGINT) AS csz,
             |  CAST(2 AS BIGINT) AS nchains, CAST(3 AS BIGINT) AS chlen,
             |  true AS sink_dom_is_root, 0.0 AS fh, 0.4 AS recip
             |FROM (VALUES (2), (3)) v(csz) ORDER BY csz""".stripMargin)),

    // schema.node_type_properties: label-set grouping, JDBC type names,
    // per-property observation counts
    QueryDef(
      "call_schema_node_props",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (:Sp1 {a: 1, b: 'x'}), (:Sp1 {a: 2}),
            |       (:Sp2:Sp1 {c: 1.5})""".stripMargin).graph
        Cypher.run(
          s, gr,
          """CALL schema.node_type_properties({})
            |YIELD nodeType, propertyName, propertyTypes, mandatory,
            |      propertyObservations, totalObservations
            |RETURN nodeType, propertyName, propertyTypes[0] AS ptype,
            |       mandatory, propertyObservations AS obs,
            |       totalObservations AS total
            |ORDER BY nodeType, propertyName""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES
             |  (':`Sp1`', 'a', 'Integer', false, CAST(2 AS BIGINT),
             |   CAST(2 AS BIGINT)),
             |  (':`Sp1`', 'b', 'String', false, 1, 2),
             |  (':`Sp1`:`Sp2`', 'c', 'Float', false, 1, 1))
             |  t(nodeType, propertyName, ptype, mandatory, obs, total)
             |ORDER BY nodeType, propertyName""".stripMargin)),

    // schema.assert creates an index + existence constraint (actions
    // Created), the constraint then backs `mandatory`, and
    // rel_type_properties sees the typed relationship
    QueryDef(
      "call_schema_assert",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Sa {p: 1})-[:SR {w: 2}]->(b:Sb)""".stripMargin).graph
        val asserted = Cypher.execute(
          s, gr,
          """CALL schema.assert({Sa: ['p']}, {}, {Sa: ['p']}, true)
            |YIELD label, key, action
            |RETURN label, key, action ORDER BY action, key""".stripMargin)
        val acts = asserted.result
        val mand = Cypher.run(
          s, asserted.graph,
          """CALL schema.node_type_properties({includeLabels: ['Sa']})
            |YIELD propertyName, mandatory RETURN mandatory""".stripMargin)
        val rel = Cypher.run(
          s, asserted.graph,
          """CALL schema.rel_type_properties({})
            |YIELD relType, sourceNodeLabels, targetNodeLabels,
            |      propertyName, propertyTypes, propertyObservations
            |RETURN relType, sourceNodeLabels[0] AS src,
            |       targetNodeLabels[0] AS dst, propertyName,
            |       propertyTypes[0] AS ptype,
            |       propertyObservations AS obs""".stripMargin)
        acts.withColumnRenamed("label", "alabel")
          .crossJoin(mand).crossJoin(rel)
      },
      Some("""SELECT 'Sa' AS alabel, 'p' AS key, 'Created' AS action,
             |  true AS mandatory, ':`SR`' AS relType, 'Sa' AS src,
             |  'Sb' AS dst, 'w' AS propertyName, 'Integer' AS ptype,
             |  CAST(1 AS BIGINT) AS obs
             |FROM (VALUES (1), (2)) v(i)""".stripMargin)),

    // convert.to_tree: two CHILD paths from one root merge into a
    // single tree whose child entries carry the rel-prefixed edge props
    QueryDef(
      "call_convert_to_tree",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (r:Tt {k: 0, name: 'root'}), (c1:Tt {k: 1}),
            |       (c2:Tt {k: 2}),
            |       (r)-[:CHILD {o: 1}]->(c1),
            |       (r)-[:CHILD {o: 2}]->(c2)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """MATCH p = (r:Tt {k: 0})-[:CHILD]->()
            |WITH collect(p) AS ps
            |CALL convert.to_tree(ps, true, {}) YIELD value
            |WITH convert.to_json(value) AS j
            |RETURN j CONTAINS '"name":"root"' AS has_root,
            |       size(split(j, '"child.o"')) - 1 AS nkids,
            |       j CONTAINS '"_type":"Tt"' AS has_type""".stripMargin)
      },
      Some("SELECT true AS has_root, CAST(2 AS BIGINT) AS nkids, " +
        "true AS has_type")),

    // the mgps / wcc compatibility shims: connector components rows,
    // version/validate_predicate functions, and the wcc.get_components
    // alias over the nxalg subgraph-WCC
    QueryDef(
      "call_mgps_shims",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (a:Wc {k: 0}), (b:Wc {k: 1}), (c:Wc {k: 2}),
            |       (a)-[:WE]->(b)""".stripMargin).graph
        val comp = Cypher.run(
          s, gr,
          """CALL mgps.components() YIELD name, edition
            |RETURN count(*) AS ncomp,
            |       min(edition) AS edition""".stripMargin)
        val fns = Cypher.run(
          s, gr,
          """RETURN mgps.version() AS v,
            |       mgps.validate_predicate(false, 'boom %s', [1]) AS ok""".stripMargin)
        val wcc = Cypher.run(
          s, gr,
          """MATCH (n:Wc) OPTIONAL MATCH (x:Wc)-[e:WE]->(y:Wc)
            |WITH collect(DISTINCT n) AS ns, collect(DISTINCT e) AS es
            |CALL wcc.get_components(ns, es) YIELD n_components
            |RETURN n_components""".stripMargin)
        comp.crossJoin(fns).crossJoin(wcc)
      },
      Some("SELECT CAST(2 AS BIGINT) AS ncomp, 'community' AS edition, " +
        "'5.9.0' AS v, true AS ok, CAST(2 AS BIGINT) AS n_components")),

    // nxalg.k_components (round 16 — closes the 78th nxalg procedure):
    // EXACT Moody–White k-components on two K4s sharing the edge 2-3
    // plus a pendant path 5-6-7. Expected levels pinned with networkx
    // 3.6 (nx.k_components on this fixture):
    //   1: {0..7}   2: {0..5}   3: {0,1,2,3}, {2,3,4,5}
    // Node ids are creation-ordered, so id - min(id) recovers k.
    QueryDef(
      "call_nxalg_kcomponents",
      (s, dir) => {
        val gr = Cypher.execute(
          s, empty,
          """CREATE (n0:KC {k: 0}), (n1:KC {k: 1}), (n2:KC {k: 2}),
            |       (n3:KC {k: 3}), (n4:KC {k: 4}), (n5:KC {k: 5}),
            |       (n6:KC {k: 6}), (n7:KC {k: 7}),
            |       (n0)-[:KE]->(n1), (n0)-[:KE]->(n2), (n0)-[:KE]->(n3),
            |       (n1)-[:KE]->(n2), (n1)-[:KE]->(n3), (n2)-[:KE]->(n3),
            |       (n2)-[:KE]->(n4), (n2)-[:KE]->(n5), (n3)-[:KE]->(n4),
            |       (n3)-[:KE]->(n5), (n4)-[:KE]->(n5),
            |       (n5)-[:KE]->(n6), (n6)-[:KE]->(n7)""".stripMargin).graph
        Cypher.run(
          s, gr,
          """MATCH (x:KC) WITH min(id(x)) AS base
            |CALL nxalg.k_components() YIELD k, components
            |RETURN k,
            |  text.join([c IN components |
            |    text.join([n IN collections.sort([m IN c | m - base]) |
            |               toString(n)], ',')], ';') AS comps
            |ORDER BY k""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), '0,1,2,3,4,5,6,7'),
             |  (2, '0,1,2,3,4,5'),
             |  (3, '0,1,2,3;2,3,4,5')) AS t(k, comps)
             |ORDER BY k""".stripMargin)))
}
