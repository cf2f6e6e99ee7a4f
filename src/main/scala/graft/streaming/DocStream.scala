package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming document-ingest operators — the stream-shaped members of
  * the admission family (q130 incremental minhash, q131 embedding
  * probe): transforms written once so the SAME plan runs as a
  * Structured Streaming query over a document stream AND as a batch
  * query over a static read (the batch form is what the DuckDB oracle
  * gate checks; StreamAdmissionSpec replays the streaming form
  * micro-batch-by-micro-batch and pins stream ≡ batch). */
object DocStream {

  /** Whitespace-normalized md5 fingerprint — [[graft.operators.Dedup
    * .exactDedup]]'s exact normalization, shared so the gate and the
    * batch dedup agree on what "the same document" means. */
  private def fp(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")))

  // --------------------------------------------------------------------
  // Stream-static admission gate — the exact-dup FRONT DOOR of the
  // admission family, and the suite's stream-static join pattern:
  // incoming docs (odd ids; a readStream in production) LEFT ANTI join
  // a STATIC base fingerprint index (even ids) on the normalized md5.
  // The static side is planned per micro-batch and never enters the
  // state store — state is ZERO regardless of stream length, which is
  // what makes this gate runnable forever; only documents the base has
  // never seen pass through. (Admitted duplicates WITHIN the stream are
  // q107's dropDuplicatesWithinWatermark stage, deliberately separate:
  // an admission gate must not dedup the batch against itself before
  // the curation tier sees the duplication signal.)
  //
  // Scale shape: the base index is fingerprints only (16 bytes/doc, no
  // payload); the anti join broadcasts it when small and shuffles on
  // the uniformly-distributed fp key when not. One scan of each side.
  // --------------------------------------------------------------------
  /** Two-sided core: `incoming` may be a streaming DataFrame, `base`
    * must be static — the anti join is then Spark's stream-static
    * shape (stateless; the base index is planned per micro-batch). */
  def streamAdmission(incoming: DataFrame, base: DataFrame): DataFrame = {
    val idx = base.select(fp(col("text")).as("fp")).distinct()
    incoming
      .select(col("doc_id"), fp(col("text")).as("fp"))
      .join(idx, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
  }

  /** One-table convenience form over the q65 modulo-split convention
    * (even ids = base snapshot, odd = incoming) — the driver-gated
    * batch twin. */
  def streamAdmission(documents: DataFrame): DataFrame =
    streamAdmission(
      documents.filter(col("doc_id") % 2 === 1),
      documents.filter(col("doc_id") % 2 === 0))

  // NOT EXISTS, deliberately not NOT IN: a NULL base text makes md5()
  // NULL, and NOT IN against a set containing NULL returns no rows at
  // all (three-valued logic), while the engine's LEFT ANTI join still
  // admits every non-matching doc. NOT EXISTS has exactly the anti-join
  // semantics, so the oracle stays aligned even on corpora with NULL
  // text (the fixtures have none — this closes the latent divergence,
  // not an observed one).
  val streamAdmissionOracle: String =
    """WITH base AS (
      |  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents WHERE doc_id % 2 = 0)
      |SELECT d.doc_id,
      |       md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) AS fp
      |FROM documents d
      |WHERE d.doc_id % 2 = 1
      |  AND NOT EXISTS (
      |    SELECT 1 FROM base b
      |    WHERE b.fp = md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))))""".stripMargin
}
