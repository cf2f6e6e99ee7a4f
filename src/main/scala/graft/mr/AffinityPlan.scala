package graft.mr

import scala.collection.mutable

/** Affinity-aware work division for multicast jobs (SURVEY §2.D row D4;
  * reference `divide_work`, plants_classifier.py:57–96).
  *
  * Problem: |L|·(|L|−1)/2 label-pair tasks must be spread over W workers,
  * and a worker needs every label its pairs touch shipped to it (the
  * multicast fan-out). Greedily packing each worker's quota with pairs
  * that maximize overlap against the labels the group already uses
  * minimizes duplicated shipments — the same objective as the reference,
  * re-derived (first-fit seed + max-overlap fill, early exit at full
  * overlap).
  *
  * Under plain Spark operators this planner is unnecessary — the
  * pair-join/broadcast plans (MLOps.pairSeparation/ensembleClassify)
  * subsume it — but the generic [[MRJob]] multicast path exposes the
  * same `K => Seq[Int]` routing contract the reference runs on, and
  * there the fan-out reduction is real: route labels with
  * [[multicastRoute]] and each label ships only to the workers whose
  * pair groups need it, not to all W.
  */
object AffinityPlan {

  /** All unordered label pairs, lexicographic (i < j) — the task list. */
  def labelPairs(classes: Seq[String]): Vector[(String, String)] = {
    val cs = classes.distinct.sorted.toVector
    for {
      i <- cs.indices.toVector
      j <- (i + 1) until cs.size
    } yield (cs(i), cs(j))
  }

  /** Greedy affinity grouping: worker w gets ⌈pairs/W⌉ tasks chosen to
    * reuse the labels already in its group. Deterministic (pure function
    * of the inputs; ties break on list order, like the reference). */
  def divideWork(classes: Seq[String], numWorkers: Int): Vector[Vector[(String, String)]] = {
    require(numWorkers > 0, "need at least one worker")
    val avail = mutable.ArrayBuffer.from(labelPairs(classes))
    val quota = math.ceil(avail.size.toDouble / numWorkers).toInt
    Vector.fill(numWorkers) {
      if (avail.isEmpty) Vector.empty
      else {
        val group = mutable.ArrayBuffer(avail.remove(0))
        val used = mutable.Set(group.head._1, group.head._2)
        while (group.size < quota && avail.nonEmpty) {
          var bestIdx = 0
          var bestCommon = -1
          var idx = 0
          while (idx < avail.size && bestCommon < 2) {
            val p = avail(idx)
            val common = (if (used(p._1)) 1 else 0) + (if (used(p._2)) 1 else 0)
            if (common > bestCommon) { bestCommon = common; bestIdx = idx }
            idx += 1
          }
          val sel = avail.remove(bestIdx)
          group += sel
          used += sel._1
          used += sel._2
          ()
        }
        group.toVector
      }
    }
  }

  /** The multicast routing a division implies: label → sorted workers
    * whose groups contain a pair touching it. Plug straight into
    * [[MRJob.run]]'s `shuffle` parameter. TOTAL: a label no pair covers
    * (or any key when <2 classes produced no pairs at all) routes to zero
    * workers instead of throwing NoSuchElementException inside a task. */
  def multicastRoute(division: Vector[Vector[(String, String)]]): Map[String, Seq[Int]] =
    division.zipWithIndex
      .flatMap { case (group, w) => group.flatMap(p => Seq(p._1 -> w, p._2 -> w)) }
      .groupBy(_._1)
      .map { case (label, ws) => label -> ws.map(_._2).distinct.sorted.toSeq }
      .withDefaultValue(Seq.empty)

  /** Total label→worker shipments of a division (the cost the greedy
    * minimizes; W·|L| for broadcast-everything, |pairs|·2 worst case). */
  def shipments(division: Vector[Vector[(String, String)]]): Int =
    division.map(g => g.flatMap(p => Seq(p._1, p._2)).distinct.size).sum

  /** Ceiling on the label set [[assignmentTable]] will plan over: the
    * greedy is O(|pairs|²) in its scan (like the reference's), so the
    * planner is for LABEL taxonomies (class sets), never data keys. */
  val MaxPlanLabels: Int = 200

  /** The greedy division as a deterministic table — one row per
    * assigned (worker, pair) — so the affinity planner (SURVEY §2.D
    * row D4) is driver-gateable like any other query. The label-set
    * collect is bounded and guarded; the planning itself is inherently
    * driver-side (its OUTPUT is the routing table [[multicastRoute]]
    * feeds to [[MRJob.run]]), which is exactly why the result — a pure
    * function of the sorted label set and worker count — is exposed as
    * a table a SQL oracle can recompute. */
  def assignmentTable(labels: org.apache.spark.sql.DataFrame,
                      labelCol: String, numWorkers: Int): org.apache.spark.sql.DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ls = labels.select(col(labelCol).cast("string")).distinct()
      .limit(MaxPlanLabels + 1).as[String].collect()
    require(ls.length <= MaxPlanLabels,
      s"affinity planner: >$MaxPlanLabels distinct labels — the greedy " +
        "is quadratic in the pair list; plan over a label taxonomy, " +
        "not a data key")
    val rows = divideWork(ls.toIndexedSeq, numWorkers).zipWithIndex.flatMap {
      case (g, w) => g.map(p => (w, p._1, p._2))
    }
    spark.createDataset(rows).toDF("worker", "label_a", "label_b")
      .orderBy(col("label_a"), col("label_b"))
  }

  /** DuckDB oracle for [[assignmentTable]]: the greedy re-derived as a
    * recursive CTE stepping one pair selection at a time. The unified
    * selection rule — among remaining pairs, max overlap with the
    * current worker's used-label set, ties to the lowest lexicographic
    * pair index; a fresh worker's empty used-set makes its seed the
    * first remaining pair, exactly [[divideWork]]'s `remove(0)` — is
    * provably the imperative loop's behaviour (the loop's `>` update
    * with `bestCommon` starting at −1 picks the FIRST max, and the
    * early exit at 2 cannot change which first-max is found). One
    * recursion step per pair: |L|²/2 steps over ≤[[MaxPlanLabels]]
    * labels — oracle-scale only, like every recursive oracle here. */
  def assignmentOracleSql(table: String, labelCol: String,
                          numWorkers: Int): String =
    s"""WITH RECURSIVE
      |labels AS (SELECT DISTINCT $labelCol AS l FROM $table),
      |pairs AS (
      |  SELECT a.l AS pa, b.l AS pb,
      |         CAST(row_number() OVER (ORDER BY a.l, b.l) AS BIGINT) AS idx
      |  FROM labels a JOIN labels b ON a.l < b.l),
      |params AS (SELECT CAST(count(*) AS BIGINT) AS np,
      |                  CAST(ceil(count(*) / $numWorkers.0) AS BIGINT) AS quota
      |           FROM pairs),
      |steps AS (
      |  SELECT 0 AS step, 0 AS w, CAST(NULL AS BIGINT) AS gsize,
      |         CAST([] AS VARCHAR[]) AS used,
      |         CAST([] AS BIGINT[]) AS done,
      |         CAST(NULL AS VARCHAR) AS sel_a, CAST(NULL AS VARCHAR) AS sel_b
      |  UNION ALL
      |  SELECT s.step + 1,
      |         CASE WHEN s.step = 0 THEN 0
      |              WHEN s.gsize >= p.quota THEN s.w + 1 ELSE s.w END,
      |         CASE WHEN s.step = 0 OR s.gsize >= p.quota THEN 1
      |              ELSE s.gsize + 1 END,
      |         CASE WHEN s.step = 0 OR s.gsize >= p.quota
      |              THEN [c.cpa, c.cpb]
      |              ELSE list_distinct(list_concat(s.used, [c.cpa, c.cpb])) END,
      |         list_append(s.done, c.cidx),
      |         c.cpa, c.cpb
      |  FROM steps s, params p,
      |  LATERAL (
      |    SELECT pr.idx AS cidx, pr.pa AS cpa, pr.pb AS cpb
      |    FROM pairs pr
      |    WHERE NOT list_contains(s.done, pr.idx)
      |    ORDER BY (CASE WHEN list_contains(
      |                CASE WHEN s.step = 0 OR s.gsize >= p.quota
      |                     THEN CAST([] AS VARCHAR[]) ELSE s.used END, pr.pa)
      |              THEN 1 ELSE 0 END +
      |              CASE WHEN list_contains(
      |                CASE WHEN s.step = 0 OR s.gsize >= p.quota
      |                     THEN CAST([] AS VARCHAR[]) ELSE s.used END, pr.pb)
      |              THEN 1 ELSE 0 END) DESC, pr.idx
      |    LIMIT 1) c
      |  WHERE s.step < p.np)
      |SELECT CAST(w AS INT) AS worker, sel_a AS label_a, sel_b AS label_b
      |FROM steps WHERE step > 0
      |ORDER BY label_a, label_b""".stripMargin

  /** Baseline division: pairs dealt round-robin, ignoring affinity. */
  def roundRobin(classes: Seq[String], numWorkers: Int): Vector[Vector[(String, String)]] = {
    val pairs = labelPairs(classes)
    Vector.tabulate(numWorkers)(w => pairs.zipWithIndex.collect {
      case (p, i) if i % numWorkers == w => p
    })
  }
}
