package graft.mr

import graft.SparkSpec

class AffinityPlanSpec extends SparkSpec {

  private val classes = (0 until 12).map(i => f"sp$i%02d")

  test("every pair is assigned exactly once, groups respect the quota") {
    val div = AffinityPlan.divideWork(classes, 4)
    val all = div.flatten
    assert(all.size == 12 * 11 / 2)
    assert(all.distinct.size == all.size)
    assert(all.toSet == AffinityPlan.labelPairs(classes).toSet)
    val quota = math.ceil(all.size / 4.0).toInt
    assert(div.forall(_.size <= quota))
  }

  test("affinity grouping ships fewer labels than round-robin") {
    val aff = AffinityPlan.shipments(AffinityPlan.divideWork(classes, 4))
    val rr = AffinityPlan.shipments(AffinityPlan.roundRobin(classes, 4))
    assert(aff < rr, s"affinity $aff vs round-robin $rr")
    // and never worse than the trivial lower/upper bounds
    assert(aff >= classes.size) // every label ships at least once
    assert(aff <= 4 * classes.size) // never worse than broadcast-all
  }

  test("division and routing are deterministic") {
    assert(AffinityPlan.divideWork(classes, 4) == AffinityPlan.divideWork(classes, 4))
    val route = AffinityPlan.multicastRoute(AffinityPlan.divideWork(classes, 4))
    assert(route.keySet == classes.toSet)
  }

  test("multicastRoute is total: uncovered labels and the <2-class " +
    "(no pairs) case route to zero workers instead of throwing") {
    val route = AffinityPlan.multicastRoute(AffinityPlan.divideWork(classes, 4))
    assert(route("not-a-class") == Seq.empty)
    // a single class yields no pairs: every key routes nowhere
    val degenerate = AffinityPlan.multicastRoute(
      AffinityPlan.divideWork(Seq("only"), 4))
    assert(degenerate("only") == Seq.empty)
    assert(degenerate("anything") == Seq.empty)
  }

  test("multicastRoute through MRJob delivers both labels of every " +
    "assigned pair to that pair's worker") {
    val workers = 4
    val div = AffinityPlan.divideWork(classes, workers)
    val route = AffinityPlan.multicastRoute(div)
    // records: one (label, payload) per label; route by affinity plan
    val input = spark.sparkContext.parallelize(
      classes.map(l => (l, s"emb-$l")), 3)
    val perWorker = MRJob.run[(String, String), String, String, String](
      input, workers,
      map = (it, _) => it,
      shuffle = k => route(k),
      reduce = (k, _) => Iterator(k))
      .mapPartitionsWithIndex((w, it) => Iterator(w -> it.toSet))
      .collect().toMap
    div.zipWithIndex.foreach { case (group, w) =>
      val needed = group.flatMap(p => Seq(p._1, p._2)).toSet
      assert(needed.subsetOf(perWorker(w)),
        s"worker $w missing ${needed -- perWorker(w)}")
      // and nothing extra was shipped (the whole point of the planner)
      assert(perWorker(w) == needed)
    }
  }

  test("assignmentTable is the divideWork division as a sorted table, " +
    "with the bounded-label guard loud") {
    import spark.implicits._
    val df = (classes ++ classes).toDF("cls")   // dup rows: distinct-ed
    val out = AffinityPlan.assignmentTable(df, "cls", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val expected = AffinityPlan.divideWork(classes, 4).zipWithIndex
      .flatMap { case (g, w) => g.map(p => (w, p._1, p._2)) }
      .sortBy(t => (t._2, t._3))
    assert(out.toSeq == expected)
    // every pair exactly once, workers within range
    assert(out.map(t => (t._2, t._3)).distinct.length == 12 * 11 / 2)
    assert(out.forall(t => t._1 >= 0 && t._1 < 4))
    val big = (0 to AffinityPlan.MaxPlanLabels).map(i => s"l$i").toDF("cls")
    val e = intercept[IllegalArgumentException] {
      AffinityPlan.assignmentTable(big, "cls", 4)
    }
    assert(e.getMessage.contains("quadratic"))
  }
}
