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
        Relational.exactSumRounded(when(col("picked"), col("c_acctbal"))
          .otherwise(lit(0.0)), 2).as("sampled_bal"))
      .orderBy(col("segment"))

  val stratifiedSampleOracle: String =
    """SELECT c_mktsegment AS segment,
      |       CAST(COUNT(*) AS BIGINT) AS total,
      |       CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
      |       CAST(ROUND(SUM(CAST(CASE WHEN picked THEN c_acctbal ELSE 0.0 END AS DECIMAL(30,6))), 2) AS DOUBLE) AS sampled_bal
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
    * The integer form needs 128-bit arithmetic: a cross term
    * sa_d·n_b ≈ n²·10⁴ squares to ~n⁴·10⁸, which silently wraps a
    * 64-bit long once a label has O(10³) members (the same cliff
    * characterized for [[ensembleClassify]] below). So the lambda runs
    * in DECIMAL(38,0) — Spark's int128, the exact mirror of the
    * oracle's HUGEINT — exact to ~4·10⁷ members/label, and only the
    * final sqrt/divide/round happens in double (the identical IEEE ops
    * on the identical exact integer, in both engines). The pair stage is
    * |labels|²/2 rows, so the interpreted decimal lambda costs nothing.
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
    // Per-label component sums as a compiled map-side vector aggregation
    // (see labelSums): each partition folds its vectors into one
    // Array[Long] per label — the combiner the reference lacks — then
    // only |labels| × dims longs cross the shuffle. Integer adds →
    // order-independent, exact.
    val sums = labelSums(q)
    sums.as("x").join(sums.as("y"), col("x.label") < col("y.label"))
      .select(col("x.label").as("la"), col("y.label").as("lb"),
        col("x.n").as("n_a"), col("y.n").as("n_b"),
        expr(
          """round(sqrt(CAST(aggregate(zip_with(x.sv, y.sv,
            |                    (a, b) -> CAST(a AS DECIMAL(19,0)) * y.n
            |                            - CAST(b AS DECIMAL(19,0)) * x.n),
            |                  CAST(0 AS DECIMAL(38,0)), (acc, v) -> acc + v * v) AS DOUBLE))
            |      / (x.n * y.n), 6)""".stripMargin).as("centroid_dist"))
      .orderBy(col("la"), col("lb"))
  }

  /** Full plants-pipeline analog part 2 (SURVEY D10/D11,
    * scripts/plants_classifier_tester.py:20–58): one-vs-one ensemble
    * scoring. Every label pair acts as a trained "classifier" voting for
    * whichever label's centroid is closer; argmax of votes predicts the
    * label; output is the confusion matrix.
    *
    * The closer-centroid test compares ‖v−sa/na‖² vs ‖v−sb/nb‖² (the
    * ‖v‖² term cancels), i.e. ss_a/na² − 2(v·sa)/na vs the b side. The
    * rationals multiplied through by na²nb² give terms ~ dims·(n·10⁴)²·n²,
    * which overflows a 64-bit long once a label has O(10³) members — so
    * the integer form is NOT safe at scale. Instead: a double fast path
    * with a provable error margin (double error ≤ ~10⁻¹⁴ of the largest
    * input term; decide only when the gap exceeds 10⁻⁹ of it), falling
    * back to EXACT BigInt arithmetic on the knife edge. The oracle
    * mirrors the exact comparison in DuckDB HUGEINT (int128 — exact to
    * ~4·10⁷ members/label; the engine's BigInt path is unbounded). Ties
    * vote the smaller label; argmax ties resolve to the smaller label.
    *
    * Scale shape: the per-label summary (|labels|·dims longs) is
    * broadcast; voting + argmax run compiled in one narrow mapPartitions
    * pass — no |vectors|×|pairs| join materializes. */
  def ensembleClassify(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = embeddings.select(col("vec_id"), expr("CAST(label AS INT)").as("label"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"))
    val summary = labelSums(q).select(col("label"), col("sv"), col("n"))
      .as[(Int, Seq[Long], Long)].collect()
      .map { case (l, sv, n) => (l, sv.toArray, n) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(summary)
    q.select(col("label"), col("qv")).as[(Int, Array[Long])]
      .mapPartitions { it =>
        val sums = bc.value
        val nL = sums.length
        // ss in double (Σ sv_d² itself exceeds 2⁶³ near 10⁵ members/label)
        // plus an exact BigInt copy for the knife-edge fallback
        val ssD = sums.map { case (_, sv, _) => sv.map(x => x.toDouble * x).sum }
        val ssB = sums.map { case (_, sv, _) =>
          sv.foldLeft(BigInt(0))((acc, x) => acc + BigInt(x) * x) }
        it.map { case (trueLabel, v) =>
          val votes = new Array[Int](nL)
          val dotsD = new Array[Double](nL)
          val absDotsD = new Array[Double](nL) // Σ|v_i·sv_i|: cancellation-safe error scale
          var k = 0
          while (k < nL) {
            val sv = sums(k)._2
            var d = 0.0; var ad = 0.0; var i = 0
            while (i < v.length) {
              val p = v(i).toDouble * sv(i); d += p; ad += math.abs(p); i += 1
            }
            dotsD(k) = d; absDotsD(k) = ad; k += 1
          }
          def exactDot(k: Int): BigInt = {
            val sv = sums(k)._2
            var acc = BigInt(0); var i = 0
            while (i < v.length) { acc += BigInt(v(i)) * sv(i); i += 1 }
            acc
          }
          var a = 0
          while (a < nL) {
            val na = sums(a)._3
            var b = a + 1
            while (b < nL) {
              val nb = sums(b)._3
              // g(x) = ss_x/nx² − 2·dot_x/nx; decide on doubles only when
              // the gap exceeds 10⁻⁹ of the largest input term (observed
              // double error ≤ ~10⁻¹³ of it), else exact BigInt
              val ta = ssD(a) / (na.toDouble * na)
              val tb = ssD(b) / (nb.toDouble * nb)
              val ga = ta - 2.0 * dotsD(a) / na
              val gb = tb - 2.0 * dotsD(b) / nb
              val m = 1e-9 * math.max(1.0, math.max(
                math.max(ta, 2.0 * absDotsD(a) / na),
                math.max(tb, 2.0 * absDotsD(b) / nb)))
              val aCloser =
                if (ga < gb - m) true
                else if (gb < ga - m) false
                else // exact rational compare, incl. exact ties:
                  (ssB(a) - 2 * exactDot(a) * na) * nb * nb <=
                    (ssB(b) - 2 * exactDot(b) * nb) * na * na
              if (aCloser) votes(a) += 1 else votes(b) += 1
              b += 1
            }
            a += 1
          }
          var best = 0
          var i = 1
          while (i < votes.length) { if (votes(i) > votes(best)) best = i; i += 1 }
          (trueLabel, sums(best)._1)
        }
      }
      .toDF("label", "predicted")
      .groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("label"), col("predicted"))
  }

  val ensembleClassifyOracle: String =
    """WITH q AS (
      |  SELECT vec_id, CAST(label AS INT) AS label,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |bydim AS (
      |  SELECT label, d, CAST(SUM(qv[d]) AS BIGINT) AS s
      |  FROM q, range(1, 65) AS t(d) GROUP BY 1, 2),
      |sums AS (
      |  -- ss in HUGEINT: Σ s² exceeds BIGINT near 10⁵ members/label
      |  SELECT b.label, list(b.s ORDER BY b.d) AS sv, n,
      |         SUM(CAST(b.s AS HUGEINT) * b.s) AS ss
      |  FROM bydim b JOIN (SELECT label, count(*) AS n FROM q GROUP BY 1) c ON c.label = b.label
      |  GROUP BY b.label, n),
      |votes AS (
      |  -- exact int128 form of the closer-centroid test:
      |  -- (ss_a − 2·(v·sa)·na)·nb² ≤ (ss_b − 2·(v·sb)·nb)·na²
      |  SELECT v.vec_id, v.label AS true_label,
      |         CASE WHEN (x.ss - 2 * CAST(list_sum(list_transform(range(1, len(v.qv)+1), d -> CAST(v.qv[d] AS HUGEINT) * x.sv[d])) AS HUGEINT) * x.n) * y.n * y.n
      |                <= (y.ss - 2 * CAST(list_sum(list_transform(range(1, len(v.qv)+1), d -> CAST(v.qv[d] AS HUGEINT) * y.sv[d])) AS HUGEINT) * y.n) * x.n * x.n
      |              THEN x.label ELSE y.label END AS vote
      |  FROM q v, sums x JOIN sums y ON x.label < y.label),
      |tallied AS (
      |  SELECT vec_id, true_label, vote, count(*) AS nv
      |  FROM votes GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT vec_id, true_label, vote AS predicted,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY nv DESC, vote ASC) AS rn
      |  FROM tallied)
      |SELECT true_label AS label, predicted, CAST(count(*) AS BIGINT) AS cnt
      |FROM best WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY label, predicted""".stripMargin

  /** REAL per-pair model training (SURVEY D9; reference
    * plants_classifier.py:166–180, 222–231): one binary MLlib
    * LogisticRegression per label pair, mirroring q41's pair-generation
    * shape. Deliberately NOT in the oracle-checked query set — trained
    * weights are solver output, not relational algebra; no cross-engine
    * oracle exists (same reason the reference's .joblib files aren't
    * diffable). The *pipeline* is deterministic and spec-gated: pair
    * enumeration, train-set sizes, and separability on disjoint clusters.
    *
    * Orchestration generalizes the reference's: the driver enumerates the
    * |L|²/2 pairs (|L| is small — the driver-side collect is the label
    * DISTINCT, never the vectors) and runs the fits CONCURRENTLY from a
    * bounded thread pool. Each fit() is an independent Spark job over the
    * one cached feature Dataset, so a pool of `parallelism` driver
    * threads keeps that many jobs in flight at once — the scheduler
    * interleaves their stages across executors instead of draining the
    * cluster between sequential fits (the reference's workers trained
    * their pair lists concurrently for the same reason,
    * plants_classifier.py:222–231). Results come back in deterministic
    * (la, lb) order regardless of completion order, and L-BFGS on a fixed
    * train set is deterministic, so the parallel and sequential loops
    * emit identical models (MLTrainSpec pins this). */
  /** The ONE per-pair fit loop behind [[trainPairClassifiers]] and
    * [[persistPairModels]] — a single training configuration (feature
    * projection, y-encoding, solver params), two consumers that differ
    * only in what they emit per fitted pair. Keeping this shared means
    * the persisted weights are always trained under exactly the settings
    * the reported train_accuracy was measured with. */
  private def fitPairModels[A](embeddings: DataFrame, maxIter: Int,
                               parallelism: Int)(
      emit: (Int, Int, Map[Int, Long],
             org.apache.spark.ml.classification.LogisticRegressionModel) => A): Seq[A] = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val spark = embeddings.sparkSession
    import spark.implicits._
    val feats = embeddings
      .select(expr("CAST(label AS INT)").as("label"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
      .cache()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, parallelism))
    try {
      val counts = feats.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .as[(Int, Long)].collect().toMap
      val labels = counts.keys.toArray.sorted
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val fits = for {
        i <- labels.indices
        j <- (i + 1) until labels.length
      } yield Future {
        val (la, lb) = (labels(i), labels(j))
        val train = feats.filter(col("label").isin(la, lb))
          .withColumn("y", when(col("label") === lb, 1.0).otherwise(0.0))
        val model = new LogisticRegression()
          .setMaxIter(maxIter).setRegParam(0.01)
          .setLabelCol("y").setFeaturesCol("features")
          .fit(train)
        emit(la, lb, counts, model)
      }
      // Future.sequence preserves enumeration order — the output is
      // (la, lb)-sorted no matter which fits finish first
      Await.result(Future.sequence(fits), Duration.Inf)
    } finally {
      // shutdownNow, not shutdown: when a fit fails, Await throws while
      // the rest of the pairs are still QUEUED — plain shutdown would let
      // every one of them launch its full training job (against a by-then
      // unpersisted dataset) only to discard the result. On the success
      // path all futures are already complete and this interrupts nothing.
      pool.shutdownNow()
      feats.unpersist()
      ()
    }
  }

  def trainPairClassifiers(embeddings: DataFrame, maxIter: Int = 50,
                           parallelism: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    fitPairModels(embeddings, maxIter, parallelism) { (la, lb, counts, model) =>
      (la, lb, counts(la) + counts(lb), model.summary.accuracy)
    }.toDF("la", "lb", "n_train", "train_accuracy")
      .orderBy(col("la"), col("lb"))
  }

  /** Train one binary LogisticRegression per label pair and PERSIST the
    * fitted weights to a parquet sink — the reference's `.joblib` dump
    * (plants_classifier.py:228) re-expressed as a weights table
    * (la, lb, weights array<double>, intercept): queryable, versionable,
    * and broadcastable at inference time. Returns the weights DataFrame
    * as written. */
  def persistPairModels(embeddings: DataFrame, path: String,
                        maxIter: Int = 50, parallelism: Int = 8): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val weights = fitPairModels(embeddings, maxIter, parallelism) { (la, lb, _, model) =>
      (la, lb, model.coefficients.toArray, model.intercept)
    }.toDF("la", "lb", "weights", "intercept")
    weights.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** EXECUTOR-side per-pair training — the reference's own reduce-side
    * shape (plants_classifier.py:222–231: embeddings multicast to the
    * workers owning each pair, each worker fits its pairs locally) —
    * and the scale path past [[trainPairClassifiers]]'s driver pool: at
    * |L| ≈ 10³ the pool is a half-million-Spark-job scheduler, while
    * here the |L|²/2 fits are ONE job — vectors route to their pairs
    * via the D8 multicast join (a broadcast join against the |L|²/2-row
    * pair table: each vector replicates to the |L|−1 pairs containing
    * its label, exactly the reference's shuffle_func fan-out), and each
    * group fits inside `mapGroups` on its executor.
    *
    * The local fit minimizes MLlib's exact objective — mean log-loss +
    * (λ/2)·Σ(w_j·σ_j)² with the per-pair sample std (unregularized
    * intercept; that is `LogisticRegression.setStandardization(true)`'s
    * penalty expressed in original coordinates) — by damped Newton. The
    * objective is strictly convex (λ > 0), so ANY solver converges to
    * the driver pool's weights: MLTrainSpec pins the two paths equal
    * within optimizer tolerance on every pair.
    *
    * Memory contract: one group = two labels' samples (the reference's
    * reduce input, plants_classifier.py:224–227) must fit on one
    * executor — the per-pair-training regime's assumption, NOT a new
    * one. Output schema matches [[persistPairModels]]. */
  def trainPairClassifiersDistributed(embeddings: DataFrame,
                                      regParam: Double = 0.01,
                                      maxIter: Int = 100): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val feats = embeddings.select(expr("CAST(label AS INT)").as("label"),
      col("embedding").cast("array<double>").as("x"))
    // |L| distinct labels — the only driver-side collect, same as the
    // pool path's label enumeration
    val labels = feats.select(col("label")).distinct()
      .as[Int].collect().sorted
    val pairs = for {
      i <- labels.indices; j <- (i + 1) until labels.length
    } yield (labels(i), labels(j))
    val routed = feats.join(broadcast(pairs.toDF("la", "lb")),
      col("label") === col("la") || col("label") === col("lb"))
    routed.select(col("la"), col("lb"), col("label"), col("x"))
      .as[(Int, Int, Int, Array[Double])]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Int, Array[Double])]) =>
        val (la, lb) = key
        val rows = it.toArray
        val xs = rows.map(_._4)
        val ys = rows.map(r => if (r._3 == lb) 1.0 else 0.0)
        val (w, b) = LocalLogit.fit(xs, ys, regParam, maxIter)
        (la, lb, w, b)
      }
      .toDF("la", "lb", "weights", "intercept")
      .orderBy(col("la"), col("lb"))
  }

  /** Local regularized-logistic solver for [[trainPairClassifiersDistributed]]:
    * damped Newton on f(w,b) = (1/n)Σ log(1+e^(−(2y−1)(w·x+b))) +
    * (λ/2)Σ(w_j σ_j)², σ_j the SAMPLE std (n−1 denominator — MLlib's
    * summarizer convention). Zero-variance dims are excluded and get
    * coefficient 0 (MLlib's constant-column behavior). Newton is exact
    * for this 2-label group size (d+1 ≈ 65 unknowns); the halving line
    * search guarantees monotone descent so convergence to the unique
    * optimum is unconditional. */
  private[graft] object LocalLogit {
    def fit(xs: Array[Array[Double]], ys: Array[Double],
            regParam: Double, maxIter: Int): (Array[Double], Double) = {
      val n = xs.length
      val d = xs(0).length
      // sample variance per dim (n−1); constant dims drop out of the fit
      val mean = new Array[Double](d)
      xs.foreach { x => var j = 0; while (j < d) { mean(j) += x(j); j += 1 } }
      var j = 0
      while (j < d) { mean(j) /= n; j += 1 }
      val varr = new Array[Double](d)
      xs.foreach { x =>
        var j = 0
        while (j < d) { val e = x(j) - mean(j); varr(j) += e * e; j += 1 }
      }
      j = 0
      while (j < d) { varr(j) = if (n > 1) varr(j) / (n - 1) else 0.0; j += 1 }
      val active = (0 until d).filter(varr(_) > 0.0).toArray
      val m = active.length + 1 // active dims + intercept (last slot)
      val theta = new Array[Double](m)
      def margin(x: Array[Double]): Double = {
        var s = theta(m - 1)
        var a = 0
        while (a < active.length) { s += theta(a) * x(active(a)); a += 1 }
        s
      }
      def objective(): Double = {
        var f = 0.0
        var i = 0
        while (i < n) {
          val z = (2.0 * ys(i) - 1.0) * margin(xs(i))
          // log(1+e^(−z)) computed stably from either tail
          f += (if (z > 0) math.log1p(math.exp(-z)) else -z + math.log1p(math.exp(z)))
          i += 1
        }
        f /= n
        var a = 0
        while (a < active.length) {
          f += 0.5 * regParam * varr(active(a)) * theta(a) * theta(a)
          a += 1
        }
        f
      }
      var iter = 0
      var done = false
      while (iter < maxIter && !done) {
        // gradient + Hessian of the objective at theta
        val g = new Array[Double](m)
        val h = Array.ofDim[Double](m, m)
        var i = 0
        while (i < n) {
          val x = xs(i)
          val mu = 1.0 / (1.0 + math.exp(-margin(x)))
          val r = (mu - ys(i)) / n
          val s = mu * (1.0 - mu) / n
          var a = 0
          while (a < m) {
            val xa = if (a == m - 1) 1.0 else x(active(a))
            g(a) += r * xa
            var b = a
            while (b < m) {
              val xb = if (b == m - 1) 1.0 else x(active(b))
              h(a)(b) += s * xa * xb
              b += 1
            }
            a += 1
          }
          i += 1
        }
        var a = 0
        while (a < active.length) {
          g(a) += regParam * varr(active(a)) * theta(a)
          h(a)(a) += regParam * varr(active(a))
          a += 1
        }
        a = 0
        while (a < m) { var b = 0; while (b < a) { h(a)(b) = h(b)(a); b += 1 }; a += 1 }
        if (math.sqrt(g.map(v => v * v).sum) < 1e-12) done = true
        else {
          val step = solve(h, g) // Newton direction: H·step = g
          // halving line search: monotone descent to the unique optimum
          val f0 = objective()
          val saved = theta.clone()
          var t = 1.0
          var improved = false
          while (!improved && t > 1e-12) {
            var k = 0
            while (k < m) { theta(k) = saved(k) - t * step(k); k += 1 }
            if (objective() <= f0) improved = true else t /= 2
          }
          if (!improved) { System.arraycopy(saved, 0, theta, 0, m); done = true }
        }
        iter += 1
      }
      val w = new Array[Double](d)
      var a = 0
      while (a < active.length) { w(active(a)) = theta(a); a += 1 }
      (w, theta(m - 1))
    }

    /** Gaussian elimination with partial pivoting for the (d+1)² Newton
      * system — the Hessian is positive definite (strictly convex f). */
    private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
      val m = b.length
      val aa = a.map(_.clone())
      val bb = b.clone()
      var col = 0
      while (col < m) {
        var p = col
        var r = col + 1
        while (r < m) { if (math.abs(aa(r)(col)) > math.abs(aa(p)(col))) p = r; r += 1 }
        val tmp = aa(col); aa(col) = aa(p); aa(p) = tmp
        val tb = bb(col); bb(col) = bb(p); bb(p) = tb
        val piv = aa(col)(col)
        r = col + 1
        while (r < m) {
          val f = aa(r)(col) / piv
          if (f != 0.0) {
            var c = col
            while (c < m) { aa(r)(c) -= f * aa(col)(c); c += 1 }
            bb(r) -= f * bb(col)
          }
          r += 1
        }
        col += 1
      }
      val x = new Array[Double](m)
      var r = m - 1
      while (r >= 0) {
        var s = bb(r)
        var c = r + 1
        while (c < m) { s -= aa(r)(c) * x(c); c += 1 }
        x(r) = s / aa(r)(r)
        r -= 1
      }
      x
    }
  }

  /** One-vs-one ensemble voting with the TRAINED classifiers reloaded
    * from the weights sink (scripts/plants_classifier_tester.py:20–58):
    * each pair model votes lb when w·x + intercept > 0, else la; argmax
    * of votes (ties to the smaller label) predicts; output is per-class
    * accuracy — the reference tester's report.
    *
    * Scale shape: the weights table is |L|²/2 rows — broadcast; voting
    * runs compiled in one narrow mapPartitions pass over the vectors. */
  def ensembleFromModels(embeddings: DataFrame, weights: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val models = weights.select(col("la"), col("lb"), col("weights"), col("intercept"))
      .as[(Int, Int, Array[Double], Double)].collect().sortBy(m => (m._1, m._2))
    // an empty weights table (e.g. trained on <2 labels) would otherwise
    // surface as an executor-side ArrayIndexOutOfBounds on every row
    require(models.nonEmpty,
      "ensembleFromModels: weights table is empty — training needs ≥2 labels (≥1 pair)")
    val labels = models.flatMap(m => Seq(m._1, m._2)).distinct.sorted
    val labelIdx = labels.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast((models, labels, labelIdx))
    embeddings
      .select(expr("CAST(label AS INT)").as("label"),
        col("embedding").cast("array<double>").as("x"))
      .as[(Int, Array[Double])]
      .mapPartitions { it =>
        val (ms, lbls, idx) = bc.value
        it.map { case (trueLabel, x) =>
          val votes = new Array[Int](lbls.length)
          ms.foreach { case (la, lb, w, b0) =>
            var m = b0; var i = 0
            while (i < w.length) { m += w(i) * x(i); i += 1 }
            if (m > 0.0) votes(idx(lb)) += 1 else votes(idx(la)) += 1
          }
          var best = 0
          var i = 1
          while (i < votes.length) { if (votes(i) > votes(best)) best = i; i += 1 }
          (trueLabel, lbls(best))
        }
      }
      .toDF("label", "predicted")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("predicted") === col("label"), 1L).otherwise(0L)).as("correct"))
      .select(col("label"), col("n"), col("correct"),
        round(col("correct") / col("n").cast("double"), 4).as("accuracy"))
      .orderBy(col("label"))
  }

  /** Mean-probability ensemble scoring — the reference's SECOND scoring
    * mode (scripts/plants_CNN_classifier.py:96–111: average the
    * predicted probability vectors, argmax the mean), re-expressed over
    * the persisted pair-LR weights: each pair model contributes its
    * sigmoid σ(w·x+b) to lb and 1−σ to la, the per-label sums are
    * averaged over the |L|²/2 classifiers, and argmax predicts.
    * Output per true class: per-sample mean-prob accuracy (the
    * reference's first accuracy_score) AND `group_predicted` — argmax of
    * the probability vector averaged over the whole class (its
    * group-level accuracy_score twin). Ties argmax to the smaller label.
    *
    * Probabilities are quantized to 1e-9 before any cross-row
    * aggregation — the group mean must be an integer sum (order-
    * independent) to stay deterministic across partitionings; argmax of
    * the quantized sum equals argmax of the mean since n is constant
    * within a class.
    *
    * Scale shape: identical to [[ensembleFromModels]] — broadcast
    * weights, one narrow compiled pass over the vectors, then a
    * |labels|-row aggregate where only |labels|·|labels| longs cross the
    * shuffle (map-side combined by [[graft.functions.VectorSumAgg]]). */
  def ensembleMeanProb(embeddings: DataFrame, weights: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val models = weights.select(col("la"), col("lb"), col("weights"), col("intercept"))
      .as[(Int, Int, Array[Double], Double)].collect().sortBy(m => (m._1, m._2))
    require(models.nonEmpty,
      "ensembleMeanProb: weights table is empty — training needs ≥2 labels (≥1 pair)")
    val labels = models.flatMap(m => Seq(m._1, m._2)).distinct.sorted
    val labelIdx = labels.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast((models, labels, labelIdx))
    val scored = embeddings
      .select(expr("CAST(label AS INT)").as("label"),
        col("embedding").cast("array<double>").as("x"))
      .as[(Int, Array[Double])]
      .mapPartitions { it =>
        val (ms, lbls, idx) = bc.value
        it.map { case (trueLabel, x) =>
          val acc = new Array[Double](lbls.length)
          ms.foreach { case (la, lb, w, b0) =>
            var m = b0; var i = 0
            while (i < w.length) { m += w(i) * x(i); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-m))
            acc(idx(lb)) += p; acc(idx(la)) += 1.0 - p
          }
          val q = acc.map(v => math.round(v / ms.length * 1e9))
          var best = 0
          var i = 1
          while (i < q.length) { if (q(i) > q(best)) best = i; i += 1 }
          (trueLabel, lbls(best), q)
        }
      }
      .toDF("label", "predicted", "qprobs")
    val vsum = udaf(graft.functions.VectorSumAgg)
    scored.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("predicted") === col("label"), 1L).otherwise(0L)).as("correct"),
        vsum(col("qprobs")).as("psum"))
      .select(col("label"), col("n"), col("correct"),
        round(col("correct") / col("n").cast("double"), 4).as("accuracy"),
        // argmax of the class-mean probability vector; array_position
        // returns the FIRST max → ties resolve to the smaller label
        element_at(array(labels.map(lit(_)): _*),
          expr("CAST(array_position(psum, array_max(psum)) AS INT)"))
          .as("group_predicted"))
      .orderBy(col("label"))
  }

  /** Shared per-label vector aggregation (also used by pairSeparation):
    * the typed [[graft.functions.VectorSumAgg]] Aggregator as a DataFrame
    * UDAF — partial (map-side) combining of the embedding vectors, so only
    * |labels| × dims longs cross the shuffle. */
  private def labelSums(q: DataFrame): DataFrame = {
    val vsum = udaf(graft.functions.VectorSumAgg)
    q.groupBy(col("label"))
      .agg(vsum(col("qv")).as("sv"), count(lit(1)).as("n"))
  }

  /** Deterministic train/val/test split (SURVEY D12's split generation,
    * scripts/plants_dataset.ipynb's 0.8/0.1/0.1 per-class shuffle-split):
    * each vector lands in a split by md5(vec_id) bucket — train < 80,
    * val < 90, test otherwise — so the assignment is a pure function of
    * the row (stable across clusters, partitionings, and in the oracle;
    * the notebook's random.seed(0) made determinism an explicit goal).
    * Output: per (label, split) counts + per-label split fractions in
    * exact basis points — the class-balance audit of the generated
    * split. Row-local + one tiny aggregation; nothing else moves. */
  def trainValTestSplit(embeddings: DataFrame, trainPct: Int = 80,
                        valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need train + val < 100, got $trainPct + $valPct")
    embeddings
      .select(expr("CAST(label AS INT)").as("label"),
        (expr("CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          % 100).as("bucket"))
      .select(col("label"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
      .groupBy(col("label"), col("split"))
      .agg(count(lit(1)).as("n"))
      .withColumn("label_total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("label"))))
      .select(col("label"), col("split"), col("n"),
        expr("CAST(n * 10000L DIV label_total AS BIGINT)").as("frac_bp"))
      .orderBy(col("label"), col("split"))
  }

  val trainValTestSplitOracle: String = trainValTestSplitOracleAt(80, 10)

  /** Oracle builder on the SAME split percentages as the engine function. */
  def trainValTestSplitOracleAt(trainPct: Int, valPct: Int): String =
    s"""WITH assigned AS (
      |  SELECT CAST(label AS INT) AS label,
      |         CASE WHEN CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < $trainPct THEN 'train'
      |              WHEN CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < ${trainPct + valPct} THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM embeddings),
      |counts AS (
      |  SELECT label, split, CAST(COUNT(*) AS BIGINT) AS n FROM assigned GROUP BY 1, 2)
      |SELECT label, split, n,
      |       CAST(n * 10000 // SUM(n) OVER (PARTITION BY label) AS BIGINT) AS frac_bp
      |FROM counts ORDER BY label, split""".stripMargin

  // --------------------------------------------------------------------
  // Cross-split leakage audit — the eval-hygiene check run after any
  // split assignment: a document whose exact-content fingerprint also
  // appears in a DIFFERENT split leaks training signal into eval (the
  // split was made by id, but duplicated content ignores ids). Combines
  // the [[trainValTestSplit]] md5-bucket assignment (here keyed on
  // doc_id) with [[Dedup.exactDedup]]'s normalized fingerprint.
  //
  // Scale shape: only (fp, split) pairs are shuffled — 32-hex-char
  // fingerprints, never text. The fp-group stats and the join back to
  // the assignment are both keyed on fp, so the second exchange reuses
  // the first's partitioning; the final rollup is 3 rows.
  // --------------------------------------------------------------------
  /** Per-split leakage counts: n_docs, n_leaked (fingerprint also in a
    * different split), n_train_leaked (non-train docs whose fingerprint
    * appears in train — the classic eval-contamination direction). */
  def splitLeakage(documents: DataFrame, trainPct: Int = 80,
                   valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need train + val < 100, got $trainPct + $valPct")
    val assigned = documents
      .select(
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"),
        (expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          % 100).as("bucket"))
      .select(col("fp"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
    val fps = assigned.groupBy(col("fp")).agg(
      countDistinct(col("split")).as("n_splits"),
      max(when(col("split") === "train", 1).otherwise(0)).as("has_train"))
    assigned.join(fps, "fp")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_splits") >= 2, 1L).otherwise(0L)).as("n_leaked"),
        sum(when(col("n_splits") >= 2 && col("has_train") === 1
          && col("split") =!= "train", 1L).otherwise(0L)).as("n_train_leaked"))
      .orderBy(col("split"))
  }

  val splitLeakageOracle: String = splitLeakageOracleAt(80, 10)

  /** Oracle builder on the SAME split percentages as the engine function. */
  def splitLeakageOracleAt(trainPct: Int, valPct: Int): String =
    s"""WITH assigned AS (
      |  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
      |         CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < $trainPct THEN 'train'
      |              WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < ${trainPct + valPct} THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM documents),
      |fps AS (
      |  SELECT fp, COUNT(DISTINCT split) AS n_splits,
      |         MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train
      |  FROM assigned GROUP BY 1)
      |SELECT split,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
      |       CAST(SUM(CASE WHEN n_splits >= 2 AND has_train = 1 AND split <> 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train_leaked
      |FROM assigned JOIN fps USING (fp)
      |GROUP BY split ORDER BY split""".stripMargin

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
      |  -- HUGEINT (int128) mirrors the engine's DECIMAL(38,0) lambda:
      |  -- (sa_d·nb − sb_d·na)² ~ n⁴·10⁸ wraps BIGINT near 10³ members/label
      |  SELECT x.label AS la, y.label AS lb, x.n AS n_a, y.n AS n_b,
      |         round(sqrt(CAST(list_sum(list_transform(range(1, 65), d ->
      |                  (CAST(x.sv[d] AS HUGEINT)*y.n - CAST(y.sv[d] AS HUGEINT)*x.n)
      |                * (CAST(x.sv[d] AS HUGEINT)*y.n - CAST(y.sv[d] AS HUGEINT)*x.n))) AS DOUBLE))
      |               / (x.n * y.n), 6) AS centroid_dist
      |  FROM sums x JOIN sums y ON x.label < y.label)
      |SELECT la, lb, n_a, n_b, centroid_dist FROM pairs ORDER BY la, lb""".stripMargin
}
