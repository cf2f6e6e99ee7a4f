package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is too hot for AQE's
  * automatic skew-split (or on engines/configs without it): classic
  * salting. The big (skewed) side gets a deterministic content-derived
  * salt in [0, salts); the small side is replicated `salts` times; the
  * join key becomes (key, salt), splitting each hot key's row group
  * across `salts` reducers.
  *
  * At 100 TB this is the difference between one straggler task holding a
  * 500 GB key and `salts` parallel tasks holding 500/s GB each. The salt
  * is xxhash64 of the big side's full row (deterministic — identical
  * rows co-locate, which is fine: skew comes from hot KEYS, not from
  * exact duplicate rows).
  */
object Skew {

  /** Driver-checked demo (q45): lineitem ⋈ supplier through the salted
    * path, revenue per supplier nation. The oracle is the PLAIN join SQL —
    * salting must be result-invariant, so this query gates exactly that. */
  def saltedRevenueByNation(lineitem: DataFrame, supplier: DataFrame): DataFrame =
    saltedEquiJoin(
      lineitem.select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev")),
      supplier.select(col("s_suppkey"), col("s_nationkey")),
      "l_suppkey", "s_suppkey", salts = 8)
      .groupBy(col("s_nationkey").cast("int").as("nationkey"))
      .agg(count(lit(1)).as("cnt"),
        Relational.exactSumRounded(col("rev"), 2).as("revenue"))
      .orderBy(col("nationkey"))

  val saltedRevenueByNationOracle: String =
    """SELECT CAST(s_nationkey AS INT) AS nationkey,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1 ORDER BY nationkey""".stripMargin

  /** The big side's salt: content-derived (hash of the WHOLE row), so a
    * hot key's rows spread across all `salts` buckets. Package-visible
    * so the spread property is spec-tested on THIS expression — a
    * key-only hash here would put every hot-key row in one bucket and
    * silently resurrect the straggler this module exists to prevent. */
  private[operators] def saltOf(df: DataFrame, salts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts))

  def saltedEquiJoin(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String,
                     salts: Int): DataFrame = {
    // working-column name chosen to never collide with caller columns: a
    // fixed "__salt" would silently OVERWRITE a real column of that name
    // and then drop() every same-named column from the output
    val saltCol = Iterator.from(0).map(i => s"__graft_salt_$i")
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    val saltedBig = big.withColumn(saltCol, saltOf(big, salts))
    val saltedSmall = small
      .withColumn(saltCol, explode(expr(s"sequence(0, ${salts - 1})")))
      .withColumn(saltCol, col(saltCol).cast("long"))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig(saltCol) === saltedSmall(saltCol))
      .drop(saltCol)
  }
}
