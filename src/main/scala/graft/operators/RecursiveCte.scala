package graft.operators

import org.apache.spark.sql.DataFrame

/** Recursive CTE semantics as an iterative union-until-fixpoint driver.
  *
  * The reference implements `WITH RECURSIVE` with dedicated pipeline
  * operators (`pkg/sql/colexec/mergerecursive/`, `mergecte/`, logical
  * RECURSIVE_CTE/SINK/SINK_SCAN nodes in `pkg/pb/plan/plan.pb.go:706-709`).
  * Spark has no recursive CTE, so we drive the fixpoint from the driver:
  * each iteration computes the next frontier from the previous one and
  * unions it into the accumulator (UNION ALL semantics, like the
  * reference/MySQL default).
  *
  * Scale notes: `localCheckpoint` after every step truncates the lineage —
  * without it the plan doubles per iteration and the 20th iteration
  * compiles a 2^20-node plan. On a real cluster with a checkpoint dir,
  * `checkpoint(true)` (reliable) is the right call for deep recursions.
  * The per-iteration `isEmpty` is one cheap job on an already-materialized
  * frontier.
  */
object RecursiveCte {

  def iterate(
      anchor: DataFrame,
      step: DataFrame => DataFrame,
      maxIterations: Int = 100): DataFrame = {
    var acc = anchor.localCheckpoint()
    var frontier = acc
    var i = 0
    while (i < maxIterations && !frontier.isEmpty) {
      frontier = step(frontier).localCheckpoint()
      if (!frontier.isEmpty) acc = acc.union(frontier)
      i += 1
    }
    acc
  }
}
