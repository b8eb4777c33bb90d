package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution — blocking, pairwise verification, transitive
  * clustering, and golden-record election: the record-linkage
  * pipeline every master-data / identity system runs before a
  * training corpus can treat "one entity" as one row.
  *
  * The scale contract is the whole point: matching is NEVER
  * all-pairs. Candidates come only from equi-self-joins on caller-
  * supplied blocking keys (multiple keys union'd, so a single edit
  * that breaks one key still surfaces the pair through another —
  * the classic multi-pass blocking guarantee), the expensive
  * verifier (exact Levenshtein, an integer both engines compute
  * identically) runs only on candidates, and entities are the d8
  * pointer-jumping [[ConnectedComponents]] over verified matches.
  * Per-block pair count is the quadratic risk blocking keys must be
  * chosen to bound — same Σ|block|² discipline as the LSH band
  * joins in [[NearDup]].
  *
  * Input contract: `records` carries a unique long `rec_id` and a
  * string `name`. Blocking keys are arbitrary Columns over those
  * (substrings, phonetic codes, normalized tokens).
  */
object EntityResolution {

  /** Candidate pairs from the union of per-key equi-self-joins:
    * (`ra`, `rb`, `na`, `nb`) with ra < rb, deduped across keys.
    */
  def candidates(records: DataFrame, blockKeys: Seq[Column]): DataFrame = {
    require(blockKeys.nonEmpty, "EntityResolution: need >= 1 blocking key")
    blockKeys.map { k =>
      // materialized once: the keyed view feeds BOTH sides of the
      // self-join, and a blocking key can be an expensive derivation
      // (q84's char-bag key is 12 md5s per record) that would
      // otherwise be evaluated once per side (round 19; blocks are
      // released by the ContextCleaner once the plan is GC'd)
      val keyed = records.select(col("rec_id"), col("name"), k.as("bk"))
        .localCheckpoint(true)
      keyed.select(col("bk"), col("rec_id").as("ra"), col("name").as("na"))
        .join(keyed.select(col("bk"), col("rec_id").as("rb"),
          col("name").as("nb")), Seq("bk"))
        .filter(col("ra") < col("rb"))
        .select("ra", "rb", "na", "nb")
    }.reduce(_ unionByName _).distinct()
  }

  /** Verified match edges: candidates whose exact edit distance is
    * within `maxEdits`.
    */
  def matches(records: DataFrame, blockKeys: Seq[Column],
      maxEdits: Int): DataFrame =
    candidates(records, blockKeys)
      .filter(levenshtein(col("na"), col("nb")) <= maxEdits)
      .select("ra", "rb")

  /** Every record labeled with its entity (transitive closure of
    * matches; unmatched records are their own entity) plus the
    * entity's golden record = lowest rec_id.
    */
  def resolve(records: DataFrame, blockKeys: Seq[Column],
      maxEdits: Int): DataFrame = {
    val comp = ConnectedComponents
      .run(matches(records, blockKeys, maxEdits), "ra", "rb")
      .select(col("id").as("rec_id"), col("component"))
    records.join(comp, Seq("rec_id"), "left")
      .withColumn("entity", coalesce(col("component"), col("rec_id")))
      .drop("component")
  }
}
