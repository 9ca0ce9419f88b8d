package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema constraints — the reference's `src/storage/v2/constraints/`
  * (existence_constraints.hpp, unique_constraints.hpp,
  * type_constraints.hpp) re-expressed as declarative validation queries
  * over a [[GraphState]]. The reference validates per-transaction against
  * index structures; a batch engine validates set-wide: existence/type
  * compile to a null / cast-failure count (scan only, no shuffle), unique
  * to one groupBy on the key columns. [[Constraints.validate]] yields one
  * (cname, n_violations) row per constraint; [[Constraints.enforce]]
  * throws on any violation — the `CREATE CONSTRAINT` admission check run
  * after a mutation batch.
  */
sealed trait Constraint { def name: String }

/** `ASSERT EXISTS (n.prop)` — NULL or missing property violates. */
final case class ExistsC(label: String, prop: String) extends Constraint {
  def name = s"exists($label.$prop)"
}

/** `ASSERT n.p1, … IS UNIQUE` — counts every row in a duplicate group. */
final case class UniqueC(label: String, props: Seq[String]) extends Constraint {
  def name = s"unique($label.${props.mkString(",")})"
}

/** `ASSERT n.prop IS TYPED <t>` — non-null values that do not cast. */
final case class TypedC(label: String, prop: String, dtype: String)
    extends Constraint {
  def name = s"typed($label.$prop: $dtype)"
}

object Constraints {

  /** One (cname, n_violations) row for a single constraint. */
  def violations(g: GraphState, c: Constraint): DataFrame = {
    val counted = c match {
      case ExistsC(l, p) =>
        val n = g.nodes(l)
        if (!n.columns.contains(p)) n.agg(count(lit(1)).as("__v"))
        else n.filter(col(p).isNull).agg(count(lit(1)).as("__v"))
      case UniqueC(l, ps) =>
        g.nodes(l)
          .groupBy(ps.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n")), lit(0L)).as("__v"))
      case TypedC(l, p, t) =>
        val n = g.nodes(l)
        if (!n.columns.contains(p)) n.limit(0).agg(count(lit(1)).as("__v"))
        else
          n.filter(col(p).isNotNull && col(p).cast(t).isNull)
            .agg(count(lit(1)).as("__v"))
    }
    counted.select(
      lit(c.name).as("cname"),
      col("__v").cast("long").as("n_violations"))
  }

  /** Validate all constraints: one row each, stable order by name. */
  def validate(g: GraphState, cs: Seq[Constraint]): DataFrame =
    cs.map(violations(g, _)).reduce(_ unionByName _)

  /** Throw on the first violated constraint (admission check). The
    * collect is one row per constraint — driver-side by design. */
  def enforce(g: GraphState, cs: Seq[Constraint]): Unit = {
    val bad = validate(g, cs)
      .filter(col("n_violations") > 0)
      .collect()
    if (bad.nonEmpty) {
      val msgs = bad
        .map(r => s"${r.getString(0)}: ${r.getLong(1)} violations")
        .mkString("; ")
      throw new IllegalStateException(s"constraint violation: $msgs")
    }
  }
}
