package graft.queries

/** The engine's declared query inventory (SURVEY.md §2.12 + LLM extensions).
  * Every entry surfaces through [[graft.SparkEntry]] for the driver's
  * DuckDB-oracle correctness gate and the bench.
  */
object Registry {
  def groups: Seq[QueryGroup] = Seq(
    ScanQueries,
    JoinQueries,
    AggQueries,
    WindowFnQueries,
    SetScalarQueries,
    TimeWindowQueries,
    LlmQueries,
    ExtraQueries)

  lazy val all: Seq[QueryDef] = {
    val qs = groups.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }
}
