package graft.operators

import graft.SparkSpec

/** Cross-engine JSON extraction semantics: the oracle side uses
  * TRY_CAST(json_extract_string(...)), which parses quoted numerics —
  * the engine must match even though the fixtures only emit unquoted
  * numbers (a latent divergence otherwise). */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jsonPropsStats parses quoted numerics, null-safe on junk " +
    "(TRY_CAST(json_extract_string) semantics)") {
    val events = Seq(
      ("a", """{"k": 12}"""),
      ("a", """{"k": "34"}"""), // quoted numeric: must parse to 34
      ("a", """{"k": "x"}"""), // non-numeric string: NULL
      ("b", """{"k": 3.5}"""), // non-integral: NULL in both engines
      ("b", "not json"), // malformed: NULL
      ("b", """{"k": 7}""")
    ).toDF("event_type", "props")
    val out = EventOps.jsonPropsStats(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a: parsed {12, 34}; b: parsed {7}
    assert(out == Seq(("a", 2L, 46L), ("b", 1L, 7L)), out.toString)
  }

  test("propsKeyStats defaults k to 0 on props without a numeric key — " +
    "no ANSI cast crash on the regexp_extract empty-string miss") {
    val events = Seq(
      ("a", """{"k": 12}"""),
      ("a", "{}"),        // no k: regexp_extract yields '' → k = 0
      ("a", "not json"),  // malformed: k = 0
      ("b", """{"k": 5}"""))
      .toDF("event_type", "props")
    val out = EventOps.propsKeyStats(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("a") == ((3L, 12L, 12L)), out.toString) // cnt, sum_k, max_k
    assert(out("b") == ((1L, 5L, 5L)))
  }
}
