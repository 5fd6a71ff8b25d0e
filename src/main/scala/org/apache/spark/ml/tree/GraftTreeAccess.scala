package org.apache.spark.ml.tree

/** Compile-time access shim: `Node.impurityStats` is `private[ml]`, but
  * the per-node class-count statistics it carries are exactly what a
  * per-class Saabas walk needs (the per-node class probability
  * `stats(c) / stats.sum` whose parent→child deltas attribute a
  * classifier's predicted-class probability to split features —
  * `graft.dml.events.Agents.explainRows`). The stats are plain data the
  * model already exposes in aggregate (RandomForestClassificationModel's
  * `predictRaw` sums the same normalized leaf stats); this shim only
  * widens their visibility, adds no behavior, and keeps the dependency
  * surface to one method. */
object GraftTreeAccess {

  /** The impurity statistics of a node: per-class observation counts for
    * classification trees (index = class label), [count, sum, sumSq] for
    * variance-impurity regression trees. */
  def nodeStats(node: Node): Array[Double] = node.impurityStats.stats

  /** The leaf value a single tree routes `v` to — the per-tree term of a
    * GBT margin; identity tests recompute the margin from it. */
  def leafPrediction(node: Node, v: org.apache.spark.ml.linalg.Vector)
      : Double = node.predictImpl(v).prediction
}
