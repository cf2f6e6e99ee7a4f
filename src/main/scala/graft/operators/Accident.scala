package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship analytics task, exactly
  * (tasks/accident_analysis.py) — for users switching from the reference
  * who run THIS query, not the lineitem transplant (q01). Operates on any
  * DataFrame with the US-Accidents-style string columns (FIXTURES.md A.2);
  * all semantics, including the order-sensitive CASE cascades and the
  * parse-failure defaults, are pinned by `AccidentSpec`.
  */
object Accident {

  /** First-match-wins road feature (accident_analysis.py:47–55): the
    * exact priority order matters — a row with Junction and Stop both
    * 'True' must report Junction. */
  val roadFeaturePriority: Seq[String] = Seq(
    "Station", "Junction", "Crossing", "Traffic_Signal", "Stop", "Railway", "Roundabout")

  def roadFeature(get: String => Column): Column =
    coalesce(
      roadFeaturePriority.foldLeft(lit(null).cast("string")) { (acc, name) =>
        coalesce(acc, when(get(name) === "True", name))
      },
      lit("None"))

  /** Order-sensitive weather categorization (accident_analysis.py:58–75):
    * 'mostly cloudy' is tested in the Cloudy branch BEFORE the 'clear'/
    * 'partly cloudy' substring branch ever sees it; bare 'clear' falls to
    * PartlyClear (not Fair — Fair is equality-only); null/'' → BadWeather. */
  def weatherCategory(weather: Column): Column = {
    val w = lower(coalesce(weather, lit("")))
    when(w === "fair" || w === "fair / windy", "Fair")
      .when(w.contains("mostly cloudy") || w === "cloudy" || w === "cloudy / windy",
        "Cloudy")
      .when(w.contains("clear") || w.contains("partly cloudy") || w.contains("overcast"),
        "PartlyClear")
      .otherwise("BadWeather")
  }

  /** Duration in hours (accident_analysis.py:78–87): parse first 19 chars
    * as '%Y-%m-%d %H:%M:%S'; ANY failure → 0; negative durations kept.
    * Both ends parse with an EXPLICIT +00:00 offset: the reference
    * subtracts NAIVE datetimes, so the session time zone must not
    * participate — a session-zoned parse would gain/lose an hour across
    * DST transitions (spring-forward '01:30'→'03:30' is 2.0 naive hours
    * but 1.0 zoned), and UTC has no DST, making the instant diff equal
    * the naive diff. try_to_timestamp keeps the ANY-failure→0 contract. */
  private def parseNaiveUtc(c: Column): Column =
    unix_timestamp(try_to_timestamp(
      concat(substring(c, 1, 19), lit(" +00:00")),
      lit("yyyy-MM-dd HH:mm:ss XXX")))

  def durationHours(start: Column, end: Column): Column =
    coalesce(
      (parseNaiveUtc(end) - parseNaiveUtc(start)).cast("double") / 3600.0,
      lit(0.0))

  /** Defensive numeric (accident_analysis.py:30–37): float(x) except→default. */
  def numericOr(c: Column, default: Double): Column =
    coalesce(c.try_cast("double"), lit(default))

  /** A 2-dp-rounded double rendered the way Python's f"{round(x, 2)}"
    * renders it: trailing zeros stripped, at least one decimal kept
    * (11.0 → "11.0", 10.5 → "10.5", 11.55 → "11.55").
    *
    * Rounding boundary: %.2f rounds HALF_UP where Python's repr round
    * is half-to-even on the binary value — but the two can only differ
    * on a double that is EXACTLY half at 2 dp (e.g. 2.125 = 17/8), and
    * this helper's inputs are always `round(col, 2)` outputs, i.e. the
    * doubles nearest to some k/100. No such double is an exact 2-dp
    * half (those need a power-of-two denominator ≥ 8), so %.2f here is
    * a formatting no-op, never a re-round. Callers must keep feeding it
    * pre-rounded columns. */
  private def pyFloat(c: Column): Column =
    regexp_replace(
      regexp_replace(format_string("%.2f", c), "(\\.\\d*?)0+$", "$1"),
      "\\.$", ".0")

  /** impact = severity · (1+distance) · (1+duration_h) (accident_analysis.py:40). */
  def impact(severity: Column, distance: Column, durationH: Column): Column =
    severity * (lit(1.0) + distance) * (lit(1.0) + durationH)

  /** The full reference query (accident_analysis.py:25–129 + the latent
    * master-side sort, master.py:117–118): group by (road, weather, tod),
    * count/avg/min/max impact, log-scaled danger score, formula string. */
  def dangerScores(accidents: DataFrame): DataFrame = {
    // row.get(col, default) semantics: a column absent from the frame
    // behaves as its reference default rather than failing analysis
    def getOr(name: String, default: String): Column =
      if (accidents.columns.contains(name)) coalesce(col(name), lit(default))
      else lit(default)
    val base = accidents.select(
      roadFeature(name => getOr(name, "False")).as("road_feature"),
      weatherCategory(getOr("Weather_Condition", "")).as("weather_cat"),
      getOr("Sunrise_Sunset", "Day").as("time_of_day"),
      impact(
        numericOr(getOr("Severity", ""), 1.0),
        numericOr(getOr("Distance(mi)", ""), 0.0),
        durationHours(getOr("Start_Time", ""), getOr("End_Time", ""))).as("impact"))
    base
      .groupBy(col("road_feature"), col("weather_cat"), col("time_of_day"))
      .agg(
        count(lit(1)).as("count"),
        round(log(count(lit(1)) + lit(1)), 2).as("log_count"),
        round(Relational.exactAvg(col("impact")), 2).as("avg_impact"),
        round(Relational.exactAvg(col("impact")) * log(count(lit(1)) + lit(1)), 2)
          .as("danger_score"),
        round(min(col("impact")), 2).as("min_impact"),
        round(max(col("impact")), 2).as("max_impact"))
      // Python f"{round(x, 2)}" renders the float's shortest repr —
      // "10.5", "11.0" — never the fixed-width "10.50"/"11.00" of %.2f;
      // strip trailing zeros (keeping one decimal) to match the
      // reference's formula strings exactly
      .withColumn("formula",
        concat_ws(" ", pyFloat(col("avg_impact")), lit("*"),
          pyFloat(col("log_count")), lit("="), pyFloat(col("danger_score"))))
      .orderBy(desc("danger_score"), asc("road_feature"), asc("weather_cat"),
        asc("time_of_day"))
  }

  /** Committed deterministic US-Accidents-style fixture (FIXTURES.md A.2,
    * written by scripts/gen_accident_csv.py at seed 20260813) — the input
    * behind the driver-gated q98. Resolved to an absolute path at runtime
    * so the Spark reader and the DuckDB oracle (whose working directory is
    * the driver's, not sbt's) read the identical bytes. */
  def fixtureCsvPath: String =
    new java.io.File("fixtures/accidents/all/accidents.csv").getAbsolutePath

  /** DuckDB twin of [[dangerScores]] over the committed CSV fixture —
    * every reference semantic reproduced in SQL: the first-match road
    * feature priority (CASE order), the order-sensitive weather cascade,
    * the [:19] naive strptime with ANY-failure→0 duration, float-except
    * defaults, decimal-exact averages (q01's pattern), and the Python
    * f"{round(x,2)}" trailing-zero-stripped formula rendering (the same
    * two-regexp transform as [[pyFloat]], RE2 rewrite syntax). all_varchar
    * keeps every column a raw string, matching csv.DictReader's view in
    * the reference (tasks/accident_analysis.py:25–49). */
  def dangerScoresOracle: String = {
    val py = (x: String) =>
      s"regexp_replace(regexp_replace(printf('%.2f', $x), '(\\.\\d*?)0+$$', '\\1'), '\\.$$', '.0')"
    val avg = "ROUND(CAST(SUM(CAST(impact AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*), 2)"
    val logc = "ROUND(LN(COUNT(*) + 1), 2)"
    val danger = "ROUND(CAST(SUM(CAST(impact AS DECIMAL(30,6))) AS DOUBLE)/COUNT(*) * LN(COUNT(*) + 1), 2)"
    s"""WITH raw AS (
      |  SELECT * FROM read_csv('$fixtureCsvPath', header=true, all_varchar=true)),
      |base AS (
      |  SELECT
      |    COALESCE(CASE WHEN Station = 'True' THEN 'Station'
      |                  WHEN Junction = 'True' THEN 'Junction'
      |                  WHEN Crossing = 'True' THEN 'Crossing'
      |                  WHEN Traffic_Signal = 'True' THEN 'Traffic_Signal'
      |                  WHEN Stop = 'True' THEN 'Stop'
      |                  WHEN Railway = 'True' THEN 'Railway'
      |                  WHEN Roundabout = 'True' THEN 'Roundabout' END,
      |             'None') AS road_feature,
      |    CASE WHEN lower(COALESCE(Weather_Condition, '')) IN ('fair', 'fair / windy')
      |           THEN 'Fair'
      |         WHEN lower(COALESCE(Weather_Condition, '')) LIKE '%mostly cloudy%'
      |           OR lower(COALESCE(Weather_Condition, '')) IN ('cloudy', 'cloudy / windy')
      |           THEN 'Cloudy'
      |         WHEN lower(COALESCE(Weather_Condition, '')) LIKE '%clear%'
      |           OR lower(COALESCE(Weather_Condition, '')) LIKE '%partly cloudy%'
      |           OR lower(COALESCE(Weather_Condition, '')) LIKE '%overcast%'
      |           THEN 'PartlyClear'
      |         ELSE 'BadWeather' END AS weather_cat,
      |    COALESCE(Sunrise_Sunset, 'Day') AS time_of_day,
      |    COALESCE(TRY_CAST(Severity AS DOUBLE), 1.0)
      |      * (1.0 + COALESCE(TRY_CAST("Distance(mi)" AS DOUBLE), 0.0))
      |      * (1.0 + COALESCE(
      |          (epoch(try_strptime(substr(End_Time, 1, 19), '%Y-%m-%d %H:%M:%S'))
      |           - epoch(try_strptime(substr(Start_Time, 1, 19), '%Y-%m-%d %H:%M:%S')))
      |          / 3600.0, 0.0)) AS impact
      |  FROM raw)
      |SELECT road_feature, weather_cat, time_of_day,
      |       CAST(COUNT(*) AS BIGINT) AS count,
      |       $logc AS log_count,
      |       $avg AS avg_impact,
      |       $danger AS danger_score,
      |       ROUND(MIN(impact), 2) AS min_impact,
      |       ROUND(MAX(impact), 2) AS max_impact,
      |       concat_ws(' ', ${py(avg)}, '*', ${py(logc)}, '=', ${py(danger)}) AS formula
      |FROM base GROUP BY 1, 2, 3
      |ORDER BY danger_score DESC, road_feature ASC, weather_cat ASC, time_of_day ASC""".stripMargin
  }
}
