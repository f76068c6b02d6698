package graft

/** The grouped-aggregate item descriptor [[graft.source.GroupAgg]] is
  * shared by the server source (rendered into the `$group` pipeline,
  * [[graft.server.QueryDocs.groupStages]]) and the file source (folded
  * into per-split partial rows) — re-exported here so server-side code
  * and its transport bindings keep their original spelling.
  */
package object server {
  type GroupAgg = graft.source.GroupAgg
  val GroupAgg: graft.source.GroupAgg.type = graft.source.GroupAgg
}
