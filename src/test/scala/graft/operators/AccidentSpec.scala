package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the reference's accident-analysis semantics row by row
  * (FIXTURES.md A.2; reference tasks/accident_analysis.py:25–129). */
class AccidentSpec extends SparkSpec {
  import spark.implicits._

  test("weatherCategory: order-sensitive cascade incl. the CASE-order traps") {
    val cases = Seq(
      "Fair" -> "Fair", "Fair / Windy" -> "Fair",
      "Mostly Cloudy" -> "Cloudy", "Mostly Cloudy / Windy" -> "Cloudy",
      "Cloudy" -> "Cloudy", "Cloudy / Windy" -> "Cloudy",
      "Clear" -> "PartlyClear",          // 'clear' is NOT Fair
      "Partly Cloudy" -> "PartlyClear", "Overcast" -> "PartlyClear",
      "Light Rain" -> "BadWeather", "Snow" -> "BadWeather",
      null.asInstanceOf[String] -> "BadWeather", "" -> "BadWeather")
    val out = cases.map(_._1).toDF("w")
      .select(Accident.weatherCategory(col("w"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("roadFeature: first-match priority with multiple flags true") {
    val df = Seq(
      // Junction beats Stop (priority order), all-false -> None
      ("False", "True", "True"), ("False", "False", "False"))
      .toDF("Station", "Junction", "Stop")
    val present = df.columns.toSet
    val out = df.select(Accident.roadFeature(n =>
      if (present(n)) col(n) else lit("False"))).as[String].collect()
    assert(out.toSeq == Seq("Junction", "None"))
  }

  test("durationHours: truncation to 19 chars, failure->0, negatives kept") {
    val df = Seq(
      ("2023-01-01 10:00:00", "2023-01-01 13:30:00"),          // 3.5h
      ("2023-01-01 10:00:00.123456", "2023-01-01 11:00:00"),   // [:19] truncation
      ("garbage", "2023-01-01 11:00:00"),                       // -> 0
      ("2023-01-01 12:00:00", ""),                              // -> 0
      ("2023-01-01 12:00:00", "2023-01-01 11:00:00"))           // -1, NOT clamped
      .toDF("s", "e")
    val out = df.select(Accident.durationHours(col("s"), col("e")))
      .as[Double].collect()
    assert(out.toSeq == Seq(3.5, 1.0, 0.0, 0.0, -1.0))
  }

  test("numericOr: float-except-default (empty, garbage, whitespace, nan)") {
    val df = Seq("3", " 3.5 ", "", "abc", "nan").toDF("v")
    val out = df.select(Accident.numericOr(col("v"), 1.0)).as[Double].collect()
    assert(out(0) == 3.0 && out(1) == 3.5 && out(2) == 1.0 && out(3) == 1.0)
    assert(out(4).isNaN) // Python float('nan') parses too — same semantics
  }

  test("dangerScores end-to-end on a literal accident frame") {
    val df = Seq(
      ("True", "False", "Fair", "Day", "3", "1.0",
        "2023-01-01 10:00:00", "2023-01-01 11:00:00"),
      ("True", "False", "Fair", "Day", "2", "0.5",
        "2023-01-01 10:00:00", "2023-01-01 12:00:00"),
      ("False", "True", "Rain", "Night", "bogus", "",
        "garbage", ""))
      .toDF("Station", "Junction", "Weather_Condition", "Sunrise_Sunset",
        "Severity", "Distance(mi)", "Start_Time", "End_Time")
    val out = Accident.dangerScores(df).collect()
    assert(out.length == 2)
    val fair = out.map(r => r.getString(0) -> r).toMap
    // Station/Fair/Day: impacts 3*2*2=12 and 2*1.5*3=9 -> avg 10.5
    assert(fair("Station").getAs[Double]("avg_impact") == 10.5)
    assert(fair("Station").getAs[Long]("count") == 2L)
    // Junction/BadWeather/Night: severity default 1, distance 0, dur 0 -> 1.0
    assert(fair("Junction").getAs[Double]("avg_impact") == 1.0)
    assert(fair("Junction").getString(1) == "BadWeather")
  }

  test("durationHours subtracts NAIVE datetimes: a DST spring-forward " +
    "span is 2.0 hours under any session time zone (the reference's " +
    "strptime subtraction never saw a zone)") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      // 2023-03-12 02:00 PT does not exist (spring forward); naive
      // subtraction gives 2.0h, a zoned diff would give 1.0h
      val out = Seq(("2023-03-12 01:30:00", "2023-03-12 03:30:00"))
        .toDF("s", "e")
        .select(Accident.durationHours(col("s"), col("e")))
        .as[Double].collect()
      assert(out.toSeq == Seq(2.0))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("formula strings render like Python's f-string over round(): " +
    "trailing zeros stripped, one decimal kept") {
    // avg 10.5, log ln(3)=1.10 (exactly two decimals), danger 11.55
    val df = Seq(
      ("True", "Fair", "Day", "3", "1.0", "2023-01-01 10:00:00", "2023-01-01 11:00:00"),
      ("True", "Fair", "Day", "2", "0.5", "2023-01-01 10:00:00", "2023-01-01 12:00:00"))
      .toDF("Station", "Weather_Condition", "Sunrise_Sunset",
        "Severity", "Distance(mi)", "Start_Time", "End_Time")
    val formula = Accident.dangerScores(df).collect().head.getAs[String]("formula")
    // danger = round(10.5 · ln(3), 2) = 11.54 (the UNROUNDED log factor,
    // accident_analysis.py:116–126); Python renders f"{10.5} * {1.1} =
    // {11.54}" — never "10.50" / "1.10"
    assert(formula == "10.5 * 1.1 = 11.54", formula)
  }

  test("golden wordcount on the reference corpus (FIXTURES.md A.1)") {
    val corpus = Seq(
      "hello world hello", "map reduce is powerful",
      "distributed computing is fun", "hello from node one",
      "world wide distributed systems", "reduce the complexity now",
      "hello from node two", "map your tasks wisely",
      "parallel processing is great", "hello distributed world",
      "map reduce map reduce", "computing at scale",
      "hello from the fourth node", "world class distributed engine",
      "reduce and combine results", "map everything everywhere")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextOps.wordcount(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 34, s"expected 34 unique words, got ${out.size}")
    assert(out.values.sum == 61L, s"expected 61 tokens, got ${out.values.sum}")
    assert(out("hello") == 6 && out("map") == 5 && out("reduce") == 5)
    assert(out("distributed") == 4 && out("world") == 4)
    assert(out("from") == 3 && out("is") == 3 && out("node") == 3)
    assert(out("computing") == 2 && out("the") == 2)
  }
}
