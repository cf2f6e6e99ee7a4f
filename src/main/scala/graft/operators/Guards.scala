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
}
