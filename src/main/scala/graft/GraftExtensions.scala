package graft

import graft.functions.{ObjectIdToSeconds, ToObjectId}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: enables the engine's native SQL functions
  * for every session in a cluster via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the idiomatic way
  * a user of the reference library switches their deployment over without
  * per-session registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.ObjectIdRangeRule)
    ext.injectFunction((
      FunctionIdentifier("objectid_to_seconds"),
      new ExpressionInfo(classOf[ObjectIdToSeconds].getName, "objectid_to_seconds"),
      (children: Seq[Expression]) => ObjectIdToSeconds(children.head)))
    ext.injectFunction((
      FunctionIdentifier("to_objectid"),
      new ExpressionInfo(classOf[ToObjectId].getName, "to_objectid"),
      (children: Seq[Expression]) => ToObjectId(children.head)))
  }
}
