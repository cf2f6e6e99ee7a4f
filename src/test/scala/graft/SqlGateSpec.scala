package graft

/** SqlGate: the safe dynamic-submission analog (SQL text instead of the
  * reference's exec()'d source). */
class SqlGateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("submitted SQL text runs against the registered fixture tables") {
    val out = SqlGate.submit(spark, sf,
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).toSeq == out.map(_.getString(0)).toSeq.sorted)
  }

  test("submitted SQL equals the precompiled DataFrame operator") {
    val sql = SqlGate.submit(spark, sf,
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)
    val df = Tables.customer(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("c_mktsegment").as("segment"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("segment")
    assert(rows(sql) == rows(df))
  }

  test("submitted SQL can call the graft extension functions") {
    val out = SqlGate.submit(spark, sf,
      "SELECT graft_adler32('hello') AS h").collect()
    assert(out.head.getLong(0) > 0)
  }

  test("a joined-and-windowed submission goes through the same planner " +
    "(broadcast under threshold, pushdown intact)") {
    val df = SqlGate.submit(spark, sf,
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n DESC, n_name LIMIT 5""".stripMargin)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("non-query statements are rejected BEFORE execution") {
    val bad = Seq(
      "SET spark.sql.shuffle.partitions=1",
      "ADD JAR '/tmp/evil.jar'",
      "CREATE FUNCTION evil AS 'com.evil.Udf' USING JAR '/tmp/evil.jar'",
      "INSERT OVERWRITE DIRECTORY '/tmp/sqlgate_x' SELECT 1",
      "INSERT INTO lineitem SELECT * FROM lineitem",
      "CREATE TABLE t AS SELECT 1 AS x",
      "DROP TABLE lineitem",
      "CACHE TABLE lineitem")
    bad.foreach { s =>
      val e = intercept[IllegalArgumentException](SqlGate.submit(spark, sf, s))
      assert(e.getMessage.contains("queries only"), s)
    }
    // the SET must not have taken effect (rejection preceded execution)
    assert(spark.conf.get("spark.sql.shuffle.partitions") != "1")
  }

  test("file-source relations are rejected — even nested in a subquery") {
    val bad = Seq(
      "SELECT * FROM text.`/etc/hostname`",
      "SELECT * FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`",
      "SELECT (SELECT first(value) FROM text.`/etc/hostname`) AS leak",
      "SELECT * FROM spark_catalog.default.whatever")
    bad.foreach { s =>
      val e = intercept[IllegalArgumentException](SqlGate.submit(spark, sf, s))
      assert(e.getMessage.contains("not a fixture table"), s)
    }
  }

  test("reflection functions are rejected — even nested in a subquery") {
    val bad = Seq(
      "SELECT java_method('java.lang.System', 'getenv', 'HOME') AS x",
      "SELECT reflect('java.lang.System', 'exit', 1) AS x",
      "SELECT (SELECT java_method('java.lang.System', 'getProperty', 'user.dir')) AS x",
      "SELECT n_name FROM nation WHERE n_name = reflect('java.lang.String', 'valueOf', 1)")
    bad.foreach { s =>
      val e = intercept[IllegalArgumentException](SqlGate.submit(spark, sf, s))
      assert(e.getMessage.contains("denied function"), s)
    }
  }

  test("script transforms are rejected — ScriptTransformation is a plain " +
    "UnaryNode, not a Command, but executes an arbitrary shell pipeline") {
    val e = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
      "SELECT TRANSFORM (n_name) USING 'cat /etc/passwd' AS (line STRING) FROM nation"))
    assert(e.getMessage.contains("queries only"), e.getMessage)
  }

  test("EXECUTE IMMEDIATE is rejected — its embedded SQL text would be " +
    "parsed and run AFTER any check on the outer plan") {
    val bad = Seq(
      "EXECUTE IMMEDIATE 'SET spark.sql.shuffle.partitions=1'",
      "EXECUTE IMMEDIATE 'SELECT * FROM text.`/etc/hostname`'")
    bad.foreach { s =>
      val e = intercept[IllegalArgumentException](SqlGate.submit(spark, sf, s))
      assert(e.getMessage.contains("queries only"), s)
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") != "1")
  }

  test("the allow-list admits the full pure-query surface: window " +
    "functions, VALUES, range(), lateral explode, pivot, having, sample") {
    val ok = Seq(
      // window over a named WINDOW definition
      """SELECT n_name, rank() OVER w AS r FROM nation
        |WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name)""".stripMargin,
      "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(id, s)",
      "SELECT COUNT(*) AS n FROM range(10)",
      "SELECT x FROM nation LATERAL VIEW explode(array(1, 2)) t AS x LIMIT 3",
      """SELECT * FROM (SELECT n_regionkey, n_nationkey FROM nation)
        |PIVOT (COUNT(*) FOR n_regionkey IN (0, 1))""".stripMargin,
      "SELECT n_regionkey FROM nation GROUP BY 1 HAVING COUNT(*) > 1",
      "SELECT COUNT(*) AS n FROM nation TABLESAMPLE (100 PERCENT)",
      "SELECT DISTINCT n_regionkey FROM nation ORDER BY 1 LIMIT 2 OFFSET 1")
    ok.foreach { s => assert(SqlGate.submit(spark, sf, s).collect().nonEmpty, s) }
  }

  test("CTE bodies are traversed: attacks hidden inside WITH are rejected " +
    "(cteRelations are innerChildren — a children-only collect misses them)") {
    // node check: shell pipeline inside the CTE body
    val transform = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
      """WITH t AS (SELECT TRANSFORM (n_name) USING 'cat /etc/passwd'
        |AS (line STRING) FROM nation) SELECT * FROM t""".stripMargin))
    assert(transform.getMessage.contains("queries only"), transform.getMessage)
    // relation check: host file read inside the CTE body
    val file = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
      "WITH t AS (SELECT * FROM text.`/etc/hostname`) SELECT * FROM t"))
    assert(file.getMessage.contains("not a fixture table"), file.getMessage)
    // function check: reflection inside the CTE body
    val refl = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
      """WITH t AS (SELECT java_method('java.lang.System', 'getenv', 'HOME') AS x)
        |SELECT * FROM t""".stripMargin))
    assert(refl.getMessage.contains("denied function"), refl.getMessage)
    // nested CTE: attack two WITH levels down
    val nested = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
      """WITH a AS (WITH b AS (SELECT * FROM text.`/etc/hostname`)
        |SELECT * FROM b) SELECT * FROM a""".stripMargin))
    assert(nested.getMessage.contains("not a fixture table"), nested.getMessage)
    // CTE body inside a subquery expression
    val sub = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
      """SELECT (WITH t AS (SELECT first(value) AS v FROM text.`/etc/hostname`)
        |SELECT v FROM t) AS leak""".stripMargin))
    assert(sub.getMessage.contains("not a fixture table"), sub.getMessage)
  }

  test("CTE names are scope-checked, not collected globally: a name " +
    "defined in a NESTED scope cannot whitelist an out-of-scope catalog " +
    "reference of the same name") {
    // plant a non-fixture temp view the attack would read
    spark.range(3).selectExpr("id AS leaked").createOrReplaceTempView("secrets")
    try {
      val e = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
        """WITH q AS (WITH secrets AS (SELECT 1 AS x) SELECT x FROM secrets)
          |SELECT * FROM secrets""".stripMargin))
      assert(e.getMessage.contains("not a fixture table"), e.getMessage)
      // sibling scoping still works: a later CTE sees an earlier one
      val ok = SqlGate.submit(spark, sf,
        """WITH a AS (SELECT n_nationkey FROM nation),
          |b AS (SELECT COUNT(*) AS n FROM a)
          |SELECT n FROM b""".stripMargin).collect()
      assert(ok.head.getLong(0) == 25L)
      // and a CTE name is NOT visible to a preceding sibling's body
      val e2 = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
        """WITH a AS (SELECT * FROM secrets),
          |secrets AS (SELECT 1 AS x)
          |SELECT * FROM a""".stripMargin))
      assert(e2.getMessage.contains("not a fixture table"), e2.getMessage)
      // nor to its OWN body: in non-recursive SQL the inner reference
      // resolves against the session catalog — the classic shadow leak
      val e3 = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
        "WITH secrets AS (SELECT * FROM secrets) SELECT * FROM secrets"))
      assert(e3.getMessage.contains("not a fixture table"), e3.getMessage)
    } finally spark.catalog.dropTempView("secrets")
  }

  test("table-valued functions are name-checked: unknown TVFs fail closed " +
    "even though the node class is admitted") {
    val e = intercept[IllegalArgumentException](SqlGate.submit(spark, sf,
      "SELECT * FROM some_future_file_reading_tvf('/etc/passwd')"))
    assert(e.getMessage.contains("table-valued function"), e.getMessage)
    // allow-listed TVFs still pass, including inside a CTE
    val ok = SqlGate.submit(spark, sf,
      "WITH t AS (SELECT id FROM range(5)) SELECT COUNT(*) AS n FROM t").collect()
    assert(ok.head.getLong(0) == 5L)
  }

  test("switching fixture dirs re-registers the temp views: submit(A), " +
    "submit(B), submit(A) must read A again — temp views are " +
    "session-global, so a (session, dir) pair memo would go stale") {
    val dirA = "/root/testdata/sf0.001"
    val dirB = "/root/testdata/sf0.01"
    val q = "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem"
    val nA = SqlGate.submit(spark, dirA, q).collect().head.getLong(0)
    val nB = SqlGate.submit(spark, dirB, q).collect().head.getLong(0)
    assert(nA != nB, s"fixture sizes must differ for this spec: $nA")
    // the third submit must NOT be served by the stale first registration
    assert(SqlGate.submit(spark, dirA, q).collect().head.getLong(0) == nA)
    assert(SqlGate.submit(spark, dirB, q).collect().head.getLong(0) == nB)
  }

  test("CTE, set-op and subquery queries still pass the gate") {
    val out = SqlGate.submit(spark, sf,
      """WITH big AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 100)
        |SELECT COUNT(*) AS n FROM (
        |  SELECT o_orderkey FROM big
        |  UNION SELECT l_orderkey FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM big))""".stripMargin)
      .collect()
    assert(out.head.getLong(0) > 0)
  }
}
