package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Differential fuzz of SqlGate's POSITIVE surface: every seed-pinned
  * random pure-SELECT (SqlFuzz) must (a) pass the gate — a false REJECT
  * here is a gate bug the deny-side unit tests can't see — and (b)
  * produce exactly the rows of its structurally-built DataFrame twin —
  * a divergence is a real parser/semantics bug. The cross-ENGINE half
  * of the differential (same corpus vs DuckDB) runs via
  * `runMain graft.FuzzVerify <sf> <out>` + `scripts/check.py`; this
  * suite is the in-JVM half that runs on every `sbt test`.
  *
  * A failure reproduces by name: the corpus is a pure function of the
  * pinned seed, so `SqlFuzz.cases(N).find(_.name == "fuzz_qXYZ")` is
  * the failing query forever. */
class SqlGateFuzzSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val N = 150

  /** Driver-compare canonical form: columns sorted by name, rows sorted
    * by all values (stringified — both sides are Spark values, so the
    * rendering is identical). */
  private def canon(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq.map(String.valueOf))
      .sortBy(_.mkString(""))
  }

  test(s"all $N seed-pinned random SELECTs pass the gate and match " +
    "their DataFrame-built twins row-for-row") {
    val corpus = SqlFuzz.cases(N)
    assert(corpus.map(_.name).distinct.size == N)
    var nonEmpty = 0
    corpus.foreach { c =>
      // (a) the gate must accept it — IllegalArgumentException here is a
      // false reject of a pure query
      val gated =
        try SqlGate.submit(spark, sf, c.sql)
        catch {
          case e: IllegalArgumentException =>
            fail(s"${c.name} falsely rejected: ${e.getMessage}\n${c.sql}")
        }
      // (b) identical rows to the parser-free DataFrame path
      val got = canon(gated)
      val want = canon(c.twin(spark, sf))
      assert(got == want,
        s"${c.name} diverged from its DataFrame twin\n${c.sql}\n" +
          s"gate=${got.take(3)}... twin=${want.take(3)}...")
      if (got.nonEmpty) nonEmpty += 1
    }
    // the corpus must be exercising real data, not vacuously comparing
    // empty results — at least half the queries should return rows
    assert(nonEmpty >= N / 2, s"only $nonEmpty/$N queries returned rows")
  }

  test("corpus generation is deterministic and prefix-stable") {
    val a = SqlFuzz.cases(40)
    val b = SqlFuzz.cases(80)
    assert(a.map(_.sql) == b.take(40).map(_.sql))
    assert(SqlFuzz.cases(40).map(_.sql) == a.map(_.sql))
  }
}
