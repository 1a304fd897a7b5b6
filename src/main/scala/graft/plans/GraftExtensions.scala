package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: registers the engine's planner
  * strategies the idiomatic way, so a deployment enables them for every
  * session via config instead of the call-time injection
  * `asofMerge` falls back to:
  *
  * {{{
  * spark.sql.extensions=graft.plans.GraftExtensions
  * // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
