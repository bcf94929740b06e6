package graft.ops

import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList}
import org.apache.spark.sql.SparkSession

/** Lifecycle for the engine's memoized /tmp parquet artifacts (graph
  * edges, basket pair core, bucketed/partitioned layouts, dedup
  * indexes, file-source fixtures).
  *
  * The contract every artifact memo follows:
  *
  *   - '''Keyed per (SparkSession, input dir), scoped per JVM.''' The
  *     memo maps live in this JVM only; no cross-JVM artifact reuse
  *     ever existed. Artifacts are built once per key and then only
  *     READ — the cheap-plan side of the lakehouse ingest/query split.
  *   - '''Paths are collision-proof.''' [[tag]] appends the unsigned
  *     hex hash of the FULL dir string to the human-readable sanitized
  *     form: two distinct dirs that sanitize identically (e.g.
  *     `/data/sf0.1` vs `/data/sf0_1`) can never share a path, so a
  *     second build cannot silently overwrite the first's files while
  *     the first's memo keeps reading them. The JVM pid is appended so
  *     two JVMs on one dir cannot clobber each other mid-query.
  *   - '''Immutable inputs assumed.''' An artifact snapshots the dir's
  *     parquet at build time. If the underlying data changes
  *     mid-session (a re-ingest into the same path), memoized queries
  *     keep reading the stale artifact — callers with mutable dirs
  *     must call [[invalidate]] after the change; the next access
  *     rebuilds from the live data. (The driver's test dirs are
  *     immutable, so the gates never need this.)
  *   - '''Cleaned up at JVM exit.''' Every built artifact directory is
  *     registered via [[cleanupOnExit]]; a shutdown hook deletes them
  *     so repeated sessions do not accrete dead pid-tagged trees under
  *     /tmp.
  */
object Artifacts {

  private val pid = ProcessHandle.current().pid().toString

  /** Collision-proof, human-readable directory tag: sanitized dir name
    * (readability in /tmp listings) + unsigned hex of the full string's
    * hash (collision proofing — sanitization is lossy) + JVM pid
    * (cross-JVM isolation).
    */
  def tag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_h" + java.lang.Integer.toHexString(dir.hashCode) +
      "_p" + pid

  /** A session-unique tag, distinct across every SparkSession this JVM
    * ever creates (monotone counter, not a hash — identity hashes can
    * collide). Memos whose VALUE is a named catalog table or a shared
    * mutable path include this in the name so a second session over the
    * same dir builds its OWN artifact instead of `mode(overwrite)`-
    * dropping the one the first session may be reading mid-query.
    * Weak-keyed so a stopped session (and everything it pins) stays
    * collectable in a session-churning JVM — the tag only needs to be
    * stable while the session is alive, which weak identity keys give.
    */
  def sessionTag(s: SparkSession): String = sessionIds.synchronized {
    var id = sessionIds.get(s)
    if (id == null) { id = sessionSeq.incrementAndGet(); sessionIds.put(s, id) }
    "s" + id
  }

  private val sessionIds =
    new java.util.WeakHashMap[SparkSession, java.lang.Long]()
  private val sessionSeq = new java.util.concurrent.atomic.AtomicLong()

  // every artifact memo in the engine registers here (with its release
  // hook) so invalidate() can drop a dir's keys across all families —
  // and free what they hold — in one call
  private final case class Registered(
      map: ConcurrentHashMap[(SparkSession, String), _],
      release: ((SparkSession, String), Any) => Unit)
  private val memos = new CopyOnWriteArrayList[Registered]()

  /** A registered artifact memo: identical to a plain ConcurrentHashMap
    * except [[invalidate]] can see it. Memos whose values hold live
    * resources (persisted/localCheckpoint'd DataFrames, catalog tables)
    * pass a `release` hook: [[invalidate]] calls `release(key, value)`
    * on every entry it evicts — unpersist the frame, DROP the table —
    * so a mid-session invalidation does not leak cached storage blocks
    * for the rest of the session.
    */
  def memo[V](release: ((SparkSession, String), V) => Unit =
        (_: (SparkSession, String), _: V) => ())
      : ConcurrentHashMap[(SparkSession, String), V] = {
    val m = new ConcurrentHashMap[(SparkSession, String), V]()
    memos.add(Registered(m,
      release.asInstanceOf[((SparkSession, String), Any) => Unit]))
    m
  }

  /** Drop every memoized artifact for `dir` (all sessions, all
    * families), calling each memo's release hook on the evicted values
    * (freeing persisted blocks / catalog tables — the r8 ADVICE leak).
    * The artifact FILES are left on disk (a reader mid-query may still
    * hold the path — the shutdown hook reaps them); the next access
    * through any memo rebuilds from the live data at a fresh read. Call
    * after mutating a dir's parquet mid-session.
    */
  def invalidate(dir: String): Unit =
    memos.forEach { r =>
      val it = r.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        // exact dir keys, plus "dir#sub" keys (per-table loader memos
        // key one entry per table under the dir)
        if (e.getKey._2 == dir || e.getKey._2.startsWith(dir + "#")) {
          val k = e.getKey
          val v = e.getValue
          it.remove()
          // release must never turn a cache eviction into a query
          // failure — a dead session's unpersist/DROP is best-effort
          try r.release(k, v) catch { case _: Throwable => () }
        }
      }
    }

  private val cleanupDirs = ConcurrentHashMap.newKeySet[String]()

  /** Register an artifact directory for recursive deletion at JVM exit.
    * Returns the path for call-site chaining.
    */
  def cleanupOnExit(path: String): String = {
    cleanupDirs.add(path)
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  sys.addShutdownHook {
    cleanupDirs.forEach(p => deleteRecursively(new java.io.File(p)))
  }
}
