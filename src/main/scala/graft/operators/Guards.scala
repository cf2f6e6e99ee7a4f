package graft.operators

/** In-plan broadcast-size guardrails, shared by [[TextAnalysis]]'s
  * langId profile and [[Pipeline]]'s contamination benchmark array: the
  * bound check lives inside the broadcast build's OWN plan, so an
  * over-bound build cannot silently ship — it raises with a remediation
  * hint naming the join-fallback flag. One helper so the idiom (typed
  * `raise_error` inside a CASE whose branches agree on type) cannot
  * drift between call sites.
  */
private[operators] object Guards {

  /** SQL for `valueSql` guarded by `sizeSql <= max`; raising otherwise.
    * `sqlType` must be `valueSql`'s SQL type (the CAST types the error
    * branch so the CASE stays well-typed). */
  def guardedSql(sizeSql: String, max: Long, what: String, valueSql: String,
                 sqlType: String, fallbackHint: String): String =
    s"""CASE WHEN $sizeSql > ${max}L
       |  THEN CAST(raise_error(concat('$what has ', $sizeSql,
       |    ' > max $max for broadcast; $fallbackHint')) AS $sqlType)
       |  ELSE $valueSql END""".stripMargin

  /** `valueSql` (a window expression over an UNPARTITIONED frame)
    * guarded by an in-plan row ceiling on that same frame: the engine's
    * single-partition windows are all over tables bounded BY
    * CONSTRUCTION (an integer-micro-unit histogram, a `% shards` key
    * domain, a per-source aggregate), and this makes the bound
    * executable — `COUNT(1) OVER ()` rides the identical window frame
    * (no extra exchange, no extra pass), so an upstream change that
    * un-bounds the table (e.g. a float score slipping past
    * quantization) raises loudly instead of silently single-partition
    * sorting an unbounded stream. */
  def boundedWindowSql(max: Long, what: String, valueSql: String,
                       sqlType: String): String =
    s"""CASE WHEN COUNT(1) OVER () > ${max}L
       |  THEN CAST(raise_error(concat('$what has ', COUNT(1) OVER (),
       |    ' rows > documented single-partition-window bound $max;',
       |    ' an upstream boundedness invariant broke')) AS $sqlType)
       |  ELSE $valueSql END""".stripMargin
}
