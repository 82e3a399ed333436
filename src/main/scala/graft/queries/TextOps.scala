package graft.queries

/** Training-data-pipeline text operators — filled in next. */
object TextOps {
  def queries: Seq[QueryDef] = Seq()
}
