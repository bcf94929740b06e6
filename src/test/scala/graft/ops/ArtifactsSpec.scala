package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The [[Artifacts]] lifecycle contract (round-8 verdict item 8 /
  * ADVICE r7 medium): collision-proof paths, per-dir invalidation, and
  * the stale-read semantics the scaladoc documents.
  */
class ArtifactsSpec extends SparkSpec {

  test("tag: dirs that sanitize identically get distinct paths") {
    // the r7 ADVICE collision: both sanitize to _data_sf0_1
    assert(Artifacts.tag("/data/sf0.1") !== Artifacts.tag("/data/sf0_1"))
    // and punctuation-only differences
    assert(Artifacts.tag("/a/b") !== Artifacts.tag("/a.b"))
    // same dir is stable within a JVM (memo paths must be deterministic)
    assert(Artifacts.tag("/data/sf0.1") === Artifacts.tag("/data/sf0.1"))
  }

  test("invalidate drops exactly the given dir's keys, across memos") {
    val m1 = Artifacts.memo[String]()
    val m2 = Artifacts.memo[Int]()
    m1.put((spark, "/tmp/a"), "x")
    m1.put((spark, "/tmp/b"), "y")
    m2.put((spark, "/tmp/a"), 1)
    Artifacts.invalidate("/tmp/a")
    assert(!m1.containsKey((spark, "/tmp/a")))
    assert(!m2.containsKey((spark, "/tmp/a")))
    assert(m1.get((spark, "/tmp/b")) === "y")
  }

  test("invalidate calls the release hook on exactly the evicted values") {
    var released = List.empty[String]
    val m = Artifacts.memo[String]((_, v) => released ::= v)
    m.put((spark, "/tmp/rel-a"), "va")
    m.put((spark, "/tmp/rel-b"), "vb")
    Artifacts.invalidate("/tmp/rel-a")
    assert(released === List("va"))
    assert(!m.containsKey((spark, "/tmp/rel-a")))
    assert(m.get((spark, "/tmp/rel-b")) === "vb")
    // a throwing hook must not abort the eviction sweep
    val bad = Artifacts.memo[String]((_, _) => sys.error("boom"))
    bad.put((spark, "/tmp/rel-b"), "vc")
    Artifacts.invalidate("/tmp/rel-b")
    assert(!bad.containsKey((spark, "/tmp/rel-b")))
    assert(!m.containsKey((spark, "/tmp/rel-b")) && released.contains("vb"))
  }

  test("invalidate unpersists a memoized persisted frame (no leak)") {
    val m = Artifacts.memo[org.apache.spark.sql.DataFrame] { (_, df) =>
      df.unpersist(false); ()
    }
    val df = spark.range(100).toDF("id").persist()
    df.count()
    assert(df.storageLevel.useMemory, "fixture frame failed to persist")
    m.put((spark, "/tmp/rel-c"), df)
    Artifacts.invalidate("/tmp/rel-c")
    assert(!df.storageLevel.useMemory,
      "evicted frame still holds storage blocks after invalidate")
  }

  test("sessionTag: stable per session, distinct across sessions") {
    assert(Artifacts.sessionTag(spark) === Artifacts.sessionTag(spark))
    val s2 = spark.newSession()
    assert(Artifacts.sessionTag(spark) !== Artifacts.sessionTag(s2))
  }

  test("mutable-dir semantics: stale until invalidate, fresh after") {
    // a mutable copy of the sf0.001 graph inputs under /tmp
    val dir = java.nio.file.Files
      .createTempDirectory("graft-artifacts-spec").toString
    Artifacts.cleanupOnExit(dir)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_linenumber")
    val ord = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    ord.write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val n0 = Graph.bipartiteEdges(spark, dir).count()
    assert(n0 > 0)

    // mutate the dir: keep only even orderkeys — the edge set shrinks
    ord.filter(col("o_orderkey") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // documented stale-read: the memoized artifact still answers
    assert(Graph.bipartiteEdges(spark, dir).count() === n0)

    // the invalidation hook: next access rebuilds from the live data
    Artifacts.invalidate(dir)
    val n1 = Graph.bipartiteEdges(spark, dir).count()
    assert(n1 > 0 && n1 < n0)
  }

  test("ingest fallback answers from the raw frame AND warns (r10 verdict #1)") {
    // destRoot is a path UNDER a regular file — any write there throws,
    // driving the NonFatal fallback; the result must still be the full
    // raw table and a loud stderr line must name the table and cause.
    val blocker = java.nio.file.Files.createTempFile("graft-block", "")
    val dir = sfPath("0.01") // big enough that re-layout isn't skipped
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    val err = new java.io.ByteArrayOutputStream()
    val saved = System.err
    val out = try {
      System.setErr(new java.io.PrintStream(err, true))
      Tables.ingest0(spark, dir, "lineitem", raw, s"$blocker/sub")
    } finally System.setErr(saved)
    assert(out.count() === raw.count())
    val msg = err.toString
    assert(msg.contains("ingest re-layout of 'lineitem' failed"),
      s"expected a loud fallback warning, got: $msg")
    java.nio.file.Files.deleteIfExists(blocker)
  }
}
