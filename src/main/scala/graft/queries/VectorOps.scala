package graft.queries

/** Vector / similarity operators (SURVEY §2.5) — filled in next. */
object VectorOps {
  def queries: Seq[QueryDef] = Seq()
}
