package graft.operators

import scala.collection.mutable

/** Left-right planarity test (U. Brandes, "The Left-Right Planarity
  * Test", 2009 — the same published criterion networkx's
  * `check_planarity` implements; reference usage:
  * `query_modules/graph_analyzer.py:192` via nx). Linear-time: one DFS
  * orienting the graph and computing lowpoints/nesting depth, then a
  * second DFS maintaining a stack of conflict pairs of return-edge
  * intervals; a forced same-side conflict proves K5/K3,3.
  *
  * Driver-local by design — planarity is a global embedding property
  * with no known distributed formulation; callers gate on
  * `spark.graft.local.edges` like the other sequential analyses.
  */
object Planarity {

  private final val None_ = -1 // edge "null" sentinel

  /** Is the undirected graph (self-loops and parallel edges ignored)
    * planar? `vertices` are 0-based contiguous ids; `edges` pairs. */
  def isPlanar(n: Int, rawEdges: Seq[(Int, Int)]): Boolean = {
    // simple-graph reduction: loops/multi-edges never change planarity
    val simple = rawEdges.iterator
      .filter { case (u, v) => u != v }
      .map { case (u, v) => if (u < v) (u, v) else (v, u) }
      .toSet.toArray
    val m = simple.length
    if (n < 5 || m < 9) return true // K5 needs 10 edges, K3,3 needs 9
    if (m > 3L * n - 6) return false // Euler bound

    // run the recursive test on a dedicated big-stack thread: DFS depth
    // is O(n) and the local gate admits millions of vertices
    var result = false
    val t = new Thread(
      null,
      () => result = new Lr(n, simple).planar(),
      "lr-planarity",
      512L * 1024 * 1024)
    t.start()
    t.join()
    result
  }

  /** One test instance. Edges are ids into src/dst; both orientations of
    * each undirected edge map to the same id with a direction flag. */
  private final class Lr(n: Int, edges: Array[(Int, Int)]) {
    private val m = edges.length
    // adjacency as (neighbor, edgeId)
    private val adj = Array.fill(n)(mutable.ArrayBuffer.empty[(Int, Int)])
    edges.zipWithIndex.foreach { case ((u, v), i) =>
      adj(u) += ((v, i)); adj(v) += ((u, i))
    }
    // oriented direction: srcOf(e) after DFS1; -2 = not oriented yet
    private val srcOf = Array.fill(m)(-2)
    private val dstOf = Array.fill(m)(-2)
    private val height = Array.fill(n)(-1)
    private val parentEdge = Array.fill(n)(None_)
    private val lowpt = new Array[Int](m)
    private val lowpt2 = new Array[Int](m)
    private val nestingDepth = new Array[Int](m)
    private val ref = Array.fill(m)(None_)
    private val lowptEdge = Array.fill(m)(None_)
    // ordered outgoing adjacency after DFS1 (by nesting depth)
    private val orderedAdj =
      Array.fill(n)(Array.empty[Int]) // outgoing edge ids

    // interval of return edges, [low, high] linked through ref
    private final case class Interval(
        var low: Int = None_, var high: Int = None_) {
      def isEmpty: Boolean = low == None_ && high == None_
      def copyI: Interval = Interval(low, high)
    }
    private final case class Pair(var l: Interval, var r: Interval) {
      def swap(): Unit = { val t = l; l = r; r = t }
    }
    private val stack = mutable.ArrayBuffer.empty[Pair]
    // top-of-stack marker per edge (conflict pairs above belong to it);
    // null = stack was empty when the edge's processing began
    private val stackBottom = new Array[Pair](m)
    private def atBottom(ei: Int): Boolean =
      if (stack.isEmpty) stackBottom(ei) == null
      else stack.last eq stackBottom(ei)

    private def dfs1(root: Int): Unit = {
      height(root) = 0
      def go(v: Int): Unit = {
        val e = parentEdge(v)
        adj(v).foreach { case (w, ei) =>
          if (srcOf(ei) == -2) {
            srcOf(ei) = v; dstOf(ei) = w
            lowpt(ei) = height(v); lowpt2(ei) = height(v)
            if (height(w) == -1) { // tree edge
              parentEdge(w) = ei
              height(w) = height(v) + 1
              go(w)
            } else lowpt(ei) = height(w) // back edge
            // nesting depth: chordal edges nest inside
            nestingDepth(ei) = 2 * lowpt(ei)
            if (lowpt2(ei) < height(v)) nestingDepth(ei) += 1
            if (e != None_) {
              if (lowpt(ei) < lowpt(e)) {
                lowpt2(e) = math.min(lowpt(e), lowpt2(ei))
                lowpt(e) = lowpt(ei)
              } else if (lowpt(ei) > lowpt(e))
                lowpt2(e) = math.min(lowpt2(e), lowpt(ei))
              else lowpt2(e) = math.min(lowpt2(e), lowpt2(ei))
            }
          }
        }
      }
      go(root)
    }

    private def top: Pair = stack.last

    private def conflicting(i: Interval, b: Int): Boolean =
      !i.isEmpty && lowpt(i.high) > lowpt(b)

    private def lowest(p: Pair): Int =
      if (p.l.isEmpty) lowpt(p.r.low)
      else if (p.r.isEmpty) lowpt(p.l.low)
      else math.min(lowpt(p.l.low), lowpt(p.r.low))

    private def addConstraints(ei: Int, e: Int): Boolean = {
      val p = Pair(Interval(), Interval())
      // merge return edges of ei into p.r
      var break = false
      while (!break) {
        val q = stack.remove(stack.length - 1)
        if (!q.l.isEmpty) q.swap()
        if (!q.l.isEmpty) return false // not planar
        if (lowpt(q.r.low) > lowpt(e)) {
          if (p.r.isEmpty) p.r.high = q.r.high
          else ref(p.r.low) = q.r.high
          p.r.low = q.r.low
        } else ref(q.r.low) = lowptEdge(e) // align
        if (atBottom(ei)) break = true
      }
      // merge conflicting return edges of earlier siblings into p.l
      while (stack.nonEmpty &&
        (conflicting(top.l, ei) || conflicting(top.r, ei))) {
        val q = stack.remove(stack.length - 1)
        if (conflicting(q.r, ei)) q.swap()
        if (conflicting(q.r, ei)) return false // not planar
        // interval below lowpt(ei) merges into p.r
        if (p.r.low != None_) ref(p.r.low) = q.r.high
        if (q.r.low != None_) p.r.low = q.r.low
        if (p.l.isEmpty) p.l.high = q.l.high
        else ref(p.l.low) = q.l.high
        p.l.low = q.l.low
      }
      if (!(p.l.isEmpty && p.r.isEmpty)) stack += p
      true
    }

    private def removeBackEdges(e: Int): Unit = {
      val u = srcOf(e)
      // drop whole pairs returning to the parent
      while (stack.nonEmpty && lowest(top) == height(u)) {
        val p = stack.remove(stack.length - 1)
        val _ = p // sides not tracked — testing only, no embedding
      }
      if (stack.nonEmpty) {
        val p = stack.remove(stack.length - 1)
        while (p.l.high != None_ && dstOf(p.l.high) == u)
          p.l.high = ref(p.l.high)
        if (p.l.high == None_ && p.l.low != None_) {
          ref(p.l.low) = p.r.low
          p.l.low = None_
        }
        while (p.r.high != None_ && dstOf(p.r.high) == u)
          p.r.high = ref(p.r.high)
        if (p.r.high == None_ && p.r.low != None_) {
          ref(p.r.low) = p.l.low
          p.r.low = None_
        }
        stack += p
      }
      // e's reference becomes its highest surviving return edge
      if (lowpt(e) < height(u) && stack.nonEmpty) {
        val hl = top.l.high
        val hr = top.r.high
        if (hl != None_ && (hr == None_ || lowpt(hl) > lowpt(hr)))
          ref(e) = hl
        else ref(e) = hr
      }
    }

    private def dfs2(vRoot: Int): Boolean = {
      def go(v: Int): Boolean = {
        val e = parentEdge(v)
        val out = orderedAdj(v)
        var first = true
        var i = 0
        while (i < out.length) {
          val ei = out(i)
          val w = dstOf(ei)
          stackBottom(ei) = if (stack.isEmpty) null else stack.last
          if (ei == parentEdge(w)) { // tree edge
            if (!go(w)) return false
          } else { // back edge
            lowptEdge(ei) = ei
            stack += Pair(Interval(), Interval(ei, ei))
          }
          if (lowpt(ei) < height(v)) { // has a return edge
            if (first) lowptEdge(e) = lowptEdge(ei)
            else if (!addConstraints(ei, e)) return false
          }
          first = false
          i += 1
        }
        if (e != None_) removeBackEdges(e)
        true
      }
      go(vRoot)
    }

    def planar(): Boolean = {
      (0 until n).foreach(v => if (height(v) == -1) dfs1(v))
      (0 until n).foreach { v =>
        orderedAdj(v) = adj(v).iterator
          .map(_._2)
          .filter(ei => srcOf(ei) == v)
          .toArray
          .sortBy(nestingDepth)
      }
      (0 until n).forall(v => parentEdge(v) != None_ || dfs2(v))
    }
  }
}
