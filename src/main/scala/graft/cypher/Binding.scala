package graft.cypher

/** What a bound variable denotes in the frame DataFrame.
  *
  * The reference binds symbols to `TypedValue` slots in a flat frame
  * (`src/query/interpret/frame.hpp:58-71`); our frame is a DataFrame and a
  * binding names the columns that carry the variable (see
  * [[graft.core.Frames]]).
  */
sealed trait Binding
object Binding {
  /** Node variable: columns `v@_id`, `v@_labels`, `v@<prop>`… */
  case object NodeB extends Binding
  /** Single-edge variable: `v@_id`, `v@_src`, `v@_dst`, `v@_type`, props. */
  case object EdgeB extends Binding
  /** Scalar/list/map value: single column `v@_val`. */
  case object ValueB extends Binding
  /** Variable-length relationship: `v@_ids` = ARRAY<LONG> of edge ids. */
  case object EdgeListB extends Binding
  /** Named path from a shortest-path pattern: `v@_len` = hop count
    * (reference `TypedValue::Path`; we carry length, not materialized
    * vertices, through the BFS operators). */
  case object PathB extends Binding
}

/** Ordered scope (Cypher preserves introduction order for RETURN *). */
final case class Scope(vars: Vector[(String, Binding)]) {
  def get(name: String): Option[Binding] = vars.find(_._1 == name).map(_._2)
  def contains(name: String): Boolean = vars.exists(_._1 == name)
  def +(kv: (String, Binding)): Scope =
    if (contains(kv._1)) this else Scope(vars :+ kv)
  def names: Seq[String] = vars.map(_._1)
}
object Scope { val empty: Scope = Scope(Vector.empty) }
