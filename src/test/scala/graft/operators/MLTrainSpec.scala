package graft.operators

import graft.SparkSpec

/** trainPairClassifiers is the one non-oracle path by design (trained
  * weights are solver output); these specs pin the deterministic parts
  * of the pipeline: pair enumeration, train-set sizes, separability. */
class MLTrainSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters in 4-d: pair models must fully separate
  private def emb = {
    val rnd = new scala.util.Random(5)
    (0 until 60).map { i =>
      val label = i % 3
      val base = Array.fill(4)(rnd.nextFloat() * 0.1f)
      base(label) += 5.0f
      (i.toLong, base.toSeq, label)
    }.toDF("vec_id", "embedding", "label")
  }

  test("one LogisticRegression per label pair with correct train sizes") {
    val out = MLOps.trainPairClassifiers(emb).collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 1), (0, 2), (1, 2)))
    assert(out.forall(_.getAs[Long]("n_train") == 40L))
  }

  test("pair models separate disjoint clusters (train accuracy 1.0)") {
    val out = MLOps.trainPairClassifiers(emb).collect()
    assert(out.forall(_.getAs[Double]("train_accuracy") == 1.0),
      out.map(_.getAs[Double]("train_accuracy")).mkString(","))
  }

  test("pair enumeration and sizes are deterministic across executions") {
    val stable = MLOps.trainPairClassifiers(emb)
      .selectExpr("la", "lb", "n_train")
    assertDeterministic(stable)
  }

  test("train → persist weights parquet → reload → ensemble vote → " +
    "per-class accuracy (the joblib round trip, tester.py:20–58)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_models").toString
    val weights = MLOps.persistPairModels(emb, s"$dir/pair_models")
    // the sink holds one row per pair with dim-matched weight vectors
    assert(weights.count() == 3)
    assert(weights.collect().forall(_.getAs[Seq[Double]]("weights").length == 4))
    // reload from disk (not the in-memory frame) and vote with the
    // TRAINED models: disjoint clusters must classify perfectly
    val reloaded = spark.read.parquet(s"$dir/pair_models")
    val acc = MLOps.ensembleFromModels(emb, reloaded).collect()
    assert(acc.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(acc.forall(r => r.getAs[Long]("n") == 20L &&
      r.getAs[Long]("correct") == 20L &&
      r.getAs[Double]("accuracy") == 1.0),
      acc.mkString(";"))
  }

  test("train → persist → mean-probability vote: per-sample and group " +
    "accuracies agree with the majority-vote path on separable clusters " +
    "(plants_CNN_classifier.py:96–111)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_models_mp").toString
    MLOps.persistPairModels(emb, s"$dir/pair_models")
    val reloaded = spark.read.parquet(s"$dir/pair_models")
    val mp = MLOps.ensembleMeanProb(emb, reloaded).collect()
    assert(mp.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    mp.foreach { r =>
      assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("correct") == 20L &&
        r.getAs[Double]("accuracy") == 1.0, r.toString)
      // the reference's group-level score: argmax of the class-mean
      // probability vector must recover the class itself
      assert(r.getAs[Int]("group_predicted") == r.getInt(0), r.toString)
    }
    // cross-check: same per-class accuracies as the majority-vote path
    val mv = MLOps.ensembleFromModels(emb, reloaded).collect()
      .map(r => (r.getInt(0), r.getAs[Double]("accuracy"))).toSeq
    assert(mp.map(r => (r.getInt(0), r.getAs[Double]("accuracy"))).toSeq == mv)
    assertDeterministic(MLOps.ensembleMeanProb(emb, reloaded)
      .selectExpr("label", "n", "correct", "accuracy", "group_predicted"))
  }

  test("concurrent fits equal the sequential loop bit-for-bit (the pool " +
    "only overlaps independent Spark jobs; L-BFGS on a fixed train set " +
    "is deterministic)") {
    val seqDir = java.nio.file.Files.createTempDirectory("graft_models_s").toString
    val parDir = java.nio.file.Files.createTempDirectory("graft_models_p").toString
    val seqW = MLOps.persistPairModels(emb, s"$seqDir/m", parallelism = 1)
      .orderBy("la", "lb").collect()
    val parW = MLOps.persistPairModels(emb, s"$parDir/m", parallelism = 8)
      .orderBy("la", "lb").collect()
    assert(seqW.length == parW.length && seqW.length == 3)
    seqW.zip(parW).foreach { case (s, p) =>
      assert(s.getInt(0) == p.getInt(0) && s.getInt(1) == p.getInt(1))
      assert(s.getSeq[Double](2).toList == p.getSeq[Double](2).toList,
        s"weights diverge for pair (${s.getInt(0)}, ${s.getInt(1)})")
      assert(s.getDouble(3) == p.getDouble(3))
    }
  }

  test("executor-side distributed training converges to the driver pool's " +
    "weights (same strictly-convex MLlib objective, different solver — " +
    "Newton in mapGroups vs L-BFGS on the driver)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_models_d").toString
    // drive MLlib to tight convergence so the comparison measures the
    // shared optimum, not either solver's leftover gradient
    val pool = MLOps.persistPairModels(emb, s"$dir/m", maxIter = 500)
      .orderBy("la", "lb").collect()
    val dist = MLOps.trainPairClassifiersDistributed(emb)
      .orderBy("la", "lb").collect()
    assert(pool.length == 3 && dist.length == 3)
    pool.zip(dist).foreach { case (p, d) =>
      assert(p.getInt(0) == d.getInt(0) && p.getInt(1) == d.getInt(1))
      val pw = p.getSeq[Double](2) :+ p.getDouble(3)
      val dw = d.getSeq[Double](2) :+ d.getDouble(3)
      val scale = pw.map(math.abs).max max 1.0
      val maxDiff = pw.zip(dw).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff / scale < 1e-4,
        f"pair (${p.getInt(0)}, ${p.getInt(1)}): max relative weight diff " +
          f"${maxDiff / scale}%.2e\npool=${pw.take(5)}\ndist=${dw.take(5)}")
    }
    // the distributed weights must also WORK: perfect separation on the
    // disjoint clusters through the standard voting path
    val acc = MLOps.ensembleFromModels(emb,
      MLOps.trainPairClassifiersDistributed(emb)).collect()
    assert(acc.forall(_.getAs[Double]("accuracy") == 1.0), acc.mkString(";"))
  }

  test("distributed training is deterministic and pair-complete") {
    assertDeterministic(MLOps.trainPairClassifiersDistributed(emb)
      .selectExpr("la", "lb", "intercept"))
    val out = MLOps.trainPairClassifiersDistributed(emb).collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 1), (0, 2), (1, 2)))
    assert(out.forall(_.getAs[Seq[Double]]("weights").length == 4))
  }

  test("trainValTestSplit: assignment is a pure function of vec_id, " +
    "splits partition each class, fractions near 80/10/10") {
    val big = (0 until 900).map { i =>
      (i.toLong, Seq.fill(4)(0.1f), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val out = MLOps.trainValTestSplit(big).collect()
    val byLabel = out.groupBy(_.getInt(0))
    assert(byLabel.keySet == Set(0, 1, 2))
    byLabel.foreach { case (_, rs) =>
      // splits partition the class: counts sum to the class size
      assert(rs.map(_.getAs[Long]("n")).sum == 300L)
      // fractions in basis points sum to ≤ 10000 (floor division)
      val bps = rs.map(_.getAs[Long]("frac_bp")).sum
      assert(bps >= 9997L && bps <= 10000L, s"bps=$bps")
      val train = rs.find(_.getString(1) == "train").get.getAs[Long]("n")
      // md5-Bernoulli at 80%: 300 draws stay well within ±8 pp
      assert(train >= 216L && train <= 264L, s"train=$train")
    }
    // determinism: same rows chosen regardless of input order
    assertDeterministic(MLOps.trainValTestSplit(
      big.orderBy(org.apache.spark.sql.functions.rand())))
  }

  // JVM twin of the operator's split assignment: first 8 md5 hex chars
  // of the doc_id string, as a long, mod 100 -> 80/10/10 buckets
  private def splitOf(docId: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val b = java.lang.Long.parseLong(hex, 16) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("splitLeakage: all-unique texts leak nothing, totals partition") {
    val docs = (0 until 300).map(i => (i.toLong, s"unique text $i"))
      .toDF("doc_id", "text")
    val out = MLOps.splitLeakage(docs).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("test", "train", "val"))
    assert(out.map(_.getAs[Long]("n_docs")).sum == 300L)
    assert(out.forall(_.getAs[Long]("n_leaked") == 0L))
    assert(out.forall(_.getAs[Long]("n_train_leaked") == 0L))
  }

  test("splitLeakage matches a JVM recomputation on planted duplicates") {
    // 60 distinct fingerprints, each duplicated across 5 doc_ids whose
    // md5 buckets straddle splits; normalization folds case/whitespace
    val docs = (0 until 300).map { i =>
      (i.toLong, if (i % 2 == 0) s"Shared  TEXT ${i % 60}" else s"shared text ${i % 60}")
    }.toDF("doc_id", "text")
    val expected = (0 until 300)
      .map(i => (i % 60, splitOf(i.toLong))) // fp-equivalence class, split
      .groupBy(_._1).values.toSeq
      .flatMap { grp =>
        val splits = grp.map(_._2).toSet
        val leaked = splits.size >= 2
        grp.map { case (_, s) =>
          (s, leaked, leaked && splits("train") && s != "train")
        }
      }
      .groupBy(_._1).view.mapValues { rs =>
        (rs.size.toLong, rs.count(_._2).toLong, rs.count(_._3).toLong)
      }.toMap
    val out = MLOps.splitLeakage(docs).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_leaked"),
          r.getAs[Long]("n_train_leaked"))).toMap
    assert(out == expected, s"$out vs $expected")
    assert(out.values.map(_._2).sum > 0L, "fixture must actually leak")
    assertDeterministic(MLOps.splitLeakage(docs))
  }

  test("an empty weights table fails fast on the driver, not per-row in tasks") {
    val single = emb.where($"label" === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_models_e").toString
    // a single-label corpus yields zero pairs → empty weights sink
    val weights = MLOps.persistPairModels(single, s"$dir/pair_models")
    assert(weights.count() == 0)
    val e = intercept[IllegalArgumentException](
      MLOps.ensembleFromModels(emb, weights))
    assert(e.getMessage.contains("weights table is empty"))
  }
}
