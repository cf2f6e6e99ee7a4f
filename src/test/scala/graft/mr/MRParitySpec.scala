package graft.mr

import graft.{SparkSpec, Tables}
import graft.operators.{MLOps, Relational}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Cross-layer parity: the reference's remaining two workloads (accident
  * analytics, plants embedding routing) executed THROUGH the generic
  * MapReduce kernel must produce exactly what the DataFrame-native
  * operators produce. This is the same validation the reference could
  * never do — it had no second implementation to cross-check against. */
class MRParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("accident-shaped impact aggregation: kernel == DataFrame plan (q01)") {
    val lineitem = Tables.lineitem(spark, sf)
    // kernel path: map emits ((category, flag, status), impact), hash
    // shuffle, reduce computes the full metric row incl. rounding
    val n = 4
    val rows = MRJob.run[Row, (String, String, String), Double,
        (String, String, String, Long, Double, Double, Double, Double, Double)](
      lineitem.select("l_returnflag", "l_linestatus", "l_extendedprice",
        "l_discount", "l_tax").rdd,
      numPartitions = n,
      map = (it, _) => it.map { r =>
        val flag = r.getString(0); val status = r.getString(1)
        val category =
          if (flag == "R") "Returned"
          else if (status == "F") "Finished"
          else if (flag == "A") "Acknowledged"
          else "Open"
        val impact = r.getDouble(2) * (1.0 - r.getDouble(3)) * (1.0 + r.getDouble(4))
        ((category, flag, status), impact)
      },
      shuffle = MRJob.hashShuffle[(String, String, String)](n),
      reduce = (k, vs) => {
        val xs = vs.toVector
        val cnt = xs.size.toLong
        def r2(x: Double) = BigDecimal(x)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        // decimal-exact mean, matching Relational.exactAvg
        val avg = (xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum / cnt).toDouble
        val logc = math.log(cnt + 1.0)
        Iterator((k._1, k._2, k._3, cnt, r2(logc), r2(avg), r2(avg * logc),
          r2(xs.min), r2(xs.max)))
      }
    ).collect().sortBy(t => (t._1, t._2, t._3))

    val expected = Relational.impactAgg(lineitem)
      .select("category", "ret_flag", "line_status", "cnt", "log_count",
        "avg_impact", "danger_score", "min_impact", "max_impact")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(rows.toSeq == expected.toSeq)
  }

  test("plants-shaped multicast routing: kernel pair stats == MLOps.pairSeparation (q41)") {
    val emb = Tables.embeddings(spark, sf)
    val labels = emb.select(col("label").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted
    val pairs = for {
      a <- labels; b <- labels if a < b
    } yield (a, b)
    // D8 exactly: each embedding row multicast to every pair-reducer
    // whose pair contains its label (pair index = reducer target)
    val pairIndex = pairs.zipWithIndex.toMap
    val byLabel: Map[Int, Seq[Int]] = labels.map { l =>
      l -> pairs.filter(p => p._1 == l || p._2 == l).map(pairIndex).toSeq
    }.toMap
    val n = pairs.length
    val quantized = emb.select(col("label").cast("int"),
      expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"))
    val out = MRJob.run[Row, Int, (Int, Array[Long]), (Int, Int, Long, Long, Double)](
      quantized.rdd,
      numPartitions = n,
      map = (it, _) => it.flatMap { r =>
        val l = r.getInt(0)
        val qv = r.getSeq[Long](1).toArray
        byLabel(l).iterator.map(t => (t, (l, qv)))
      },
      shuffle = k => Seq(k), // key IS the pair reducer index
      reduce = (k, vs) => {
        val (la, lb) = pairs(k)
        val xs = vs.toVector
        def sumOf(l: Int): (Array[Long], Long) = {
          val mine = xs.filter(_._1 == l)
          val s = new Array[Long](64)
          mine.foreach(v => (0 until 64).foreach(i => s(i) += v._2(i)))
          (s, mine.size.toLong)
        }
        val (sa, na) = sumOf(la)
        val (sb, nb) = sumOf(lb)
        var num = 0L
        (0 until 64).foreach { d =>
          val v = sa(d) * nb - sb(d) * na
          num += v * v
        }
        val dist = BigDecimal(math.sqrt(num.toDouble) / (na * nb))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Iterator((la, lb, na, nb, dist))
      }
    ).collect().sortBy(t => (t._1, t._2))

    val expected = MLOps.pairSeparation(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == expected.toSeq)
  }
}
