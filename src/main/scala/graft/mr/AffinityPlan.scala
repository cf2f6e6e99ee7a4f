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

  /** Baseline division: pairs dealt round-robin, ignoring affinity. */
  def roundRobin(classes: Seq[String], numWorkers: Int): Vector[Vector[(String, String)]] = {
    val pairs = labelPairs(classes)
    Vector.tabulate(numWorkers)(w => pairs.zipWithIndex.collect {
      case (p, i) if i % numWorkers == w => p
    })
  }
}
