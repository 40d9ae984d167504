package graft.operators

import org.apache.spark.sql.DataFrame

/** Transform chaining (`transformers/chains/transform_chain.py`): the
  * reference runs an ordered list of transformer steps where later
  * steps reference earlier outputs by name (`@step.field` resolution in
  * `chains/reference_resolver.py`).
  *
  * On Spark a chain is plan COMPOSITION, not materialization: each step
  * maps the named outputs so far to a new DataFrame, and the final
  * result is one Catalyst plan — the optimizer sees through all steps
  * (pushes filters into step 1's scan, prunes columns end-to-end), and
  * nothing is written between steps. Steps that are reused by several
  * later steps can be `.persist()`ed by the caller; the chain itself
  * stays lazy.
  */
object Chain {

  type Step = Map[String, DataFrame] => DataFrame

  /** Run `steps` in order over a context seeded with `"input"`; each
    * step's output is added to the context under its name; the last
    * step's output is returned. Duplicate step names are rejected
    * (the reference's chain validator does the same).
    */
  def run(input: DataFrame, steps: Seq[(String, Step)]): DataFrame = {
    val names = steps.map(_._1)
    require(names.distinct.size == names.size, s"duplicate step names: $names")
    require(!names.contains("input"), "'input' is the reserved seed name")
    steps
      .foldLeft(Map("input" -> input)) { case (ctx, (name, f)) =>
        ctx + (name -> f(ctx))
      }(names.last)
  }
}
