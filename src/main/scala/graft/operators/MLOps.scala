package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML-pipeline operators: the plants-classifier workflow re-expressed as
  * deterministic relational computation (SURVEY.md §2.D / build-plan M3),
  * plus deterministic sampling (D12).
  *
  * The reference's per-pair LogisticRegression training
  * (plants_classifier.py:222–231) is not oracle-checkable; the analog
  * here keeps the identical distributed shape — pair generation (D3),
  * embeddings routed to every pair that needs them (D8, relationally a
  * join), per-pair computation (D9) — but the per-pair "model" is an
  * exact class-separation statistic (centroid distance) computed in
  * integer arithmetic end-to-end.
  */
object MLOps {

  /** Deterministic stratified sampling (SURVEY D12): hash-Bernoulli by
    * md5(key) — a fixed, engine-independent ~pct% sample per stratum.
    * Unlike rand()-based sampleBy, the same rows are selected on any
    * cluster, any partitioning, and in the DuckDB oracle. */
  def stratifiedSample(customer: DataFrame, pct: Int = 10): DataFrame =
    customer
      .select(col("c_mktsegment").as("segment"),
        (expr("CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          % 100 < pct).as("picked"),
        col("c_acctbal"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("picked"), 1L).otherwise(0L)).as("sampled"),
        round(Relational.exactSum(when(col("picked"), col("c_acctbal"))
          .otherwise(lit(0.0))), 2).as("sampled_bal"))
      .orderBy(col("segment"))

  val stratifiedSampleOracle: String =
    """SELECT c_mktsegment AS segment,
      |       CAST(COUNT(*) AS BIGINT) AS total,
      |       CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
      |       ROUND(CAST(SUM(CAST(CASE WHEN picked THEN c_acctbal ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE), 2) AS sampled_bal
      |FROM (SELECT c_mktsegment, c_acctbal,
      |             CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10 AS picked
      |      FROM customer)
      |GROUP BY 1 ORDER BY segment""".stripMargin

  /** Per-label-pair class separation (plants analog, D3+D8+D9):
    * label-pair generation × per-label centroids → exact centroid
    * distance. All-integer until one final divide/sqrt:
    * ‖ca − cb‖² = Σ_d (sa_d·n_b − sb_d·n_a)² / (n_a·n_b)², where sa/sb
    * are integer component sums of the quantized embeddings.
    *
    * Scale shape: the per-dimension reduction is a (label, dim)-keyed
    * partial aggregation (explode → sum), the pair stage joins the tiny
    * per-label summary with itself — the O(n²) pair work runs on
    * |labels|², never on |vectors|². */
  def pairSeparation(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = embeddings.select(col("vec_id"), expr("CAST(label AS INT)").as("label"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"))
    // Per-label component sums as a compiled map-side vector aggregation:
    // each partition folds its vectors into one Array[Long] per label
    // (the combiner the reference lacks), then only |labels| × dims longs
    // cross the shuffle. Integer adds → order-independent, exact.
    val sums = q.select(col("label"), col("qv")).as[(Int, Array[Long])]
      .rdd
      .aggregateByKey((null: Array[Long], 0L))(
        seqOp = { case ((acc, n), v) =>
          val a = if (acc == null) new Array[Long](v.length) else acc
          var i = 0
          while (i < v.length) { a(i) += v(i); i += 1 }
          (a, n + 1)
        },
        combOp = { case ((a, na), (b, nb)) =>
          if (a == null) (b, na + nb)
          else if (b == null) (a, na + nb)
          else {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            (a, na + nb)
          }
        })
      .map { case (label, (sv, n)) => (label, sv.toSeq, n) }
      .toDF("label", "sv", "n")
    sums.as("x").join(sums.as("y"), col("x.label") < col("y.label"))
      .select(col("x.label").as("la"), col("y.label").as("lb"),
        col("x.n").as("n_a"), col("y.n").as("n_b"),
        expr(
          """round(sqrt(CAST(aggregate(zip_with(x.sv, y.sv, (a, b) -> a*y.n - b*x.n),
            |                           0L, (acc, v) -> acc + v*v) AS DOUBLE))
            |      / (x.n * y.n), 6)""".stripMargin).as("centroid_dist"))
      .orderBy(col("la"), col("lb"))
  }

  /** quantized() lives in Similarity; the oracle must re-derive it. */
  val pairSeparationOracle: String =
    """WITH q AS (
      |  SELECT vec_id, CAST(label AS INT) AS label,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |bydim AS (
      |  SELECT label, d, CAST(SUM(qv[d]) AS BIGINT) AS s
      |  FROM q, range(1, 65) AS t(d)
      |  GROUP BY 1, 2),
      |sums AS (
      |  SELECT b.label, list(b.s ORDER BY b.d) AS sv, n
      |  FROM bydim b JOIN (SELECT label, count(*) AS n FROM q GROUP BY 1) c ON c.label = b.label
      |  GROUP BY b.label, n),
      |pairs AS (
      |  SELECT x.label AS la, y.label AS lb, x.n AS n_a, y.n AS n_b,
      |         round(sqrt(CAST(list_sum(list_transform(range(1, 65), d ->
      |                  (x.sv[d]*y.n - y.sv[d]*x.n) * (x.sv[d]*y.n - y.sv[d]*x.n))) AS DOUBLE))
      |               / (x.n * y.n), 6) AS centroid_dist
      |  FROM sums x JOIN sums y ON x.label < y.label)
      |SELECT la, lb, n_a, n_b, centroid_dist FROM pairs ORDER BY la, lb""".stripMargin
}
