package graft.mr

import graft.SparkSpec

/** Engine-parity layer: the generic MapReduce kernel must reproduce the
  * reference task contract (map → multicast shuffle → group → reduce,
  * reference engine/worker.py:79–158) for arbitrary jobs. */
class MRJobSpec extends SparkSpec {

  test("wordcount through the kernel equals a plain reduceByKey") {
    val lines = Seq("hello world hello", "map reduce map", "world")
    val rdd = spark.sparkContext.parallelize(lines, 3)
    val viaKernel = MRJob.run[String, String, Long, (String, Long)](
      rdd, numPartitions = 3,
      map = (it, _) => it.flatMap(_.split(" ")).map(w => (w, 1L)),
      shuffle = MRJob.hashShuffle[String](3),
      reduce = (k, vs) => Iterator((k, vs.sum))
    ).collect().toMap
    val expected = rdd.flatMap(_.split(" ")).map((_, 1L)).reduceByKey(_ + _)
      .collect().toMap
    assert(viaKernel == expected)
  }

  test("identity reduce groups all values per key (reference default)") {
    val pairs = Seq(("a", 1), ("b", 2), ("a", 3), ("a", 4))
    val out = MRJob.run[(String, Int), String, Int, (String, Seq[Int])](
      spark.sparkContext.parallelize(pairs, 2),
      numPartitions = 2,
      map = (it, _) => it,
      shuffle = MRJob.hashShuffle[String](2),
      reduce = MRJob.identityReduce[String, Int]
    ).collect().toMap
    assert(out("a").sorted == Seq(1, 3, 4))
    assert(out("b") == Seq(2))
  }

  test("multicast shuffle replicates a key to every routed reducer " +
    "(reference worker.py:95-99 multicast; empty target list drops the key)") {
    val pairs = Seq((1, "x"), (2, "y"), (3, "z"))
    val out = MRJob.run[(Int, String), Int, String, (Int, Int, String)](
      spark.sparkContext.parallelize(pairs, 2),
      numPartitions = 4,
      map = (it, _) => it,
      shuffle = {
        case 1 => Seq(0, 1, 2, 3) // → all reducers
        case 2 => Seq(2)          // → one
        case _ => Seq.empty       // → dropped
      },
      reduce = (k, vs) => vs.map(v => (k, 0, v))
    ).collect()
    assert(out.count(_._1 == 1) == 4)
    assert(out.count(_._1 == 2) == 1)
    assert(!out.exists(_._1 == 3))
  }

  test("property: kernel sum-reduce equals groupBy-sum for random pair sets") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val pairs = List.fill(200)((s"k${rnd.nextInt(20)}", rnd.nextLong() % 1000))
      val rdd = spark.sparkContext.parallelize(pairs, 4)
      val viaKernel = MRJob.run[(String, Long), String, Long, (String, Long)](
        rdd, numPartitions = 4,
        map = (it, _) => it,
        shuffle = MRJob.hashShuffle[String](4),
        reduce = (k, vs) => Iterator((k, vs.sum))
      ).collect().toMap
      val expected = pairs.groupMapReduce(_._1)(_._2)(_ + _)
      assert(viaKernel == expected)
    }
  }

  test("property: multicast explode-model — each key's values appear once " +
    "per target OCCURRENCE (reference appends per target even when two " +
    "targets collide on one bucket, worker.py:95-99)") {
    val rnd = new scala.util.Random(7)
    val n = 3
    val route: Int => Seq[Int] = k => (0 to k % 4).map(t => k + t)
    for (_ <- 1 to 8) {
      val pairs = List.fill(60)((rnd.nextInt(16), rnd.nextInt(100)))
      val out = MRJob.run[(Int, Int), Int, Int, (Int, Int)](
        spark.sparkContext.parallelize(pairs, 2),
        numPartitions = n,
        map = (it, _) => it,
        shuffle = route,
        reduce = (k, vs) => vs.map(v => (k, v))
      ).collect().groupBy(_._1).view.mapValues(_.length).toMap
      val expected = pairs.groupBy(_._1).map { case (k, kvs) =>
        k -> kvs.size * route(k).size
      }.filter(_._2 > 0)
      assert(out == expected)
    }
  }

  test("map-side combine: identical result to the uncombined run for an " +
    "associative reduce; multicast and null keys still exact") {
    val rnd = new scala.util.Random(11)
    val pairs = List.fill(500)(
      (if (rnd.nextInt(10) == 0) null else s"k${rnd.nextInt(25)}",
        rnd.nextLong() % 100))
    def run(combine: Option[(Long, Long) => Long], maxKeys: Int = 1 << 20) =
      MRJob.run[(String, Long), String, Long, (String, Long)](
        spark.sparkContext.parallelize(pairs, 4),
        numPartitions = 3,
        map = (it, _) => it,
        // multicast: every key goes to TWO reducers — each must see the
        // full per-key partial stream and produce the doubled total
        shuffle = k => Seq(if (k == null) 0 else k.hashCode, 1),
        reduce = (k, vs) => Iterator((k, vs.sum)),
        combine = combine,
        combineMaxKeys = maxKeys
      ).collect().groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val plain = run(None)
    assert(run(Some(_ + _)) == plain)
    // overflow path: a 4-key cap forces emit-and-reset many times per
    // partition — partials multiply, totals must not change
    assert(run(Some(_ + _), maxKeys = 4) == plain)
    assert(plain.contains(null), "null keys must survive the combiner")
  }

  test("map-side combine cuts shuffled records (wordcount shape): " +
    "|partitions|x|vocab| partials instead of every token") {
    val records = new java.util.concurrent.atomic.LongAdder
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) records.add(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val words = (0 until 2000).map(i => s"w${i % 10}")
      val rdd = spark.sparkContext.parallelize(words, 4)
      def count(combine: Option[(Long, Long) => Long]): (Map[String, Long], Long) = {
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        val before = records.sum
        val out = MRJob.run[String, String, Long, (String, Long)](
          rdd, numPartitions = 4,
          map = (it, _) => it.map(w => (w, 1L)),
          shuffle = MRJob.hashShuffle[String](4),
          reduce = (k, vs) => Iterator((k, vs.sum)),
          combine = combine).collect().toMap
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        (out, records.sum - before)
      }
      val (plain, plainRecs) = count(None)
      val (combined, combinedRecs) = count(Some(_ + _))
      assert(combined == plain)
      assert(plain.values.sum == 2000L)
      // 4 partitions x 10-word vocab = 40 partials vs 2000 raw tokens
      assert(plainRecs >= 2000L, s"uncombined shuffle wrote $plainRecs")
      assert(combinedRecs <= 80L,
        s"combined shuffle wrote $combinedRecs records, expected ~40")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
