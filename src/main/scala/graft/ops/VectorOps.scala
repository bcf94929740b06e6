package graft.ops

import graft.{Q, Tables}
import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LLM-pipeline vector similarity over `embeddings` (north-star extensions).
  *
  * All dot products go through the custom codegen'd
  * [[graft.functions.DotProduct]] expression (`graft_dot`, registered by
  * [[graft.plans.GraftExtensions]]): the composable
  * `aggregate(zip_with(...))` form evaluates interpreted per element and
  * allocates an intermediate array per pair — the native loop is ~5-10×
  * faster on the signature computations. Both forms sum products
  * left-to-right in index order as exact doubles, so the DuckDB oracle —
  * which sums the same doubles in the same order — stays bit-identical
  * with no rounding tolerance.
  *
  * Scale design: the probe set and the IVF codebook are broadcast (they
  * are tiny by construction); the 100-TB side (the embedding corpus)
  * never shuffles for scoring. Top-k per probe is a rank-filter after a
  * per-partition score, not a global sort of the corpus.
  */
object VectorOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Codegen'd exact double dot product (ascending index order). */
  private def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  private def norm2(c: Column): Column = dot(c, c)

  /** Shared DuckDB fragment: exact double dot product via an ascending
    * correlated sum — same fold order as graft_dot.
    */
  private def duckDot(a: String, b: String): String =
    s"(SELECT sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)) FROM generate_series(1, 64) g(i))"

  val queries: Seq[Q] = Seq(

    // ── exact cosine top-3 neighbors for 10 probe vectors ────────────────
    // Brute-force baseline: corpus × broadcast(probes) — a single scan of
    // the corpus per batch of probes. Top-3 selection goes through the
    // bounded-heap `graft_topk` Aggregator, NOT a window rank: the
    // partial aggregation keeps ≤3 rows per (task × probe), so the
    // shuffle carries k rows per probe instead of the whole scored
    // corpus (SURVEY §7.3(a)). The scale path for large probe counts is
    // q_ann_ivf below.
    Q("q_similarity_topk",
      (s, dir) => {
        GraftExtensions.ensureRegistered(s)
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"))
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
            col("n2").as("p_n2"))
        emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            (dot(col("p_emb"), col("embedding")) / sqrt(col("p_n2") * col("n2"))).as("sim"))
          .groupBy("probe_id")
          .agg(expr("graft_topk(neighbor_id, sim)").as("topk"))
          .select(col("probe_id"), posexplode(col("topk")).as(Seq("pos", "s")))
          .select(col("probe_id"), col("s.id").as("neighbor_id"),
            col("s.score").as("sim"), (col("pos") + 1).cast("long").as("rk"))
          .orderBy("probe_id", "rk")
      },
      Some(s"""WITH e AS (
                SELECT vec_id, embedding,
                  ${duckDot("embedding", "embedding")} AS n2
                FROM embeddings),
              p AS (SELECT vec_id AS probe_id, embedding AS p_emb, n2 AS p_n2
                    FROM e WHERE vec_id < 10),
              j AS (
                SELECT p.probe_id, e.vec_id AS neighbor_id,
                  ${duckDot("p.p_emb", "e.embedding")} / sqrt(p.p_n2 * e.n2) AS sim
                FROM p, e WHERE e.vec_id <> p.probe_id),
              r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
                      ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM j)
              SELECT probe_id, neighbor_id, sim, rk FROM r
              WHERE rk <= 3 ORDER BY probe_id, rk""")),

    // ── LSH-banded embedding near-dup (oracle-exempt: approximate) ───────
    // 64 deterministic hyperplane sign bits (planes = xxhash64-parity ±1
    // literals, no RNG) banded into 8 keys of 8 bits; pairs sharing ANY
    // band are candidates (P(candidate) = 1-(1-p^8)^8 for per-bit
    // agreement p), then verified by exact cosine ≥ 0.35. Bucket-join
    // shaped: cost is Σ|bucket|² per band, never corpus². The threshold
    // is corpus-calibrated (this synthetic corpus tops out at cos ≈ 0.51);
    // a production near-dup pass sets it at 0.9+.
    Q("q_embed_neardup",
      (s, dir) => {
        GraftExtensions.ensureRegistered(s)
        val sig = call_function("graft_hyperplane_sig", col("embedding"), lit(64), lit(42))
        val bandCols = (0 until 8).map(b =>
          struct(lit(b).as("band_id"),
            shiftright(col("sig"), b * 8).bitwiseAND(255).as("band_key")).as(s"b$b"))
        val bands = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"),
            sig.as("sig"))
          .select(col("vec_id"), col("embedding"), col("n2"),
            explode(array(bandCols: _*)).as("bb"))
          .select(col("vec_id"), col("embedding"), col("n2"),
            col("bb.band_id"), col("bb.band_key"))
        bands.as("x")
          .join(bands.as("y"), col("x.band_id") === col("y.band_id")
            && col("x.band_key") === col("y.band_key")
            && col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
            (dot(col("x.embedding"), col("y.embedding"))
              / sqrt(col("x.n2") * col("y.n2"))).as("cos"))
          .distinct()
          .filter(col("cos") >= 0.35)
          .orderBy("a", "b")
      },
      None),

    // ── element-wise centroid aggregation per label ──────────────────────
    // The "training" step an IVF index needs: mean embedding per class.
    // posexplode → (label, pos) partial+final agg — the shuffle carries
    // one partial sum per (task × label × dim), never raw vectors.
    // Decimal-cast sums make the result independent of row order, so the
    // oracle matches bit-for-bit despite float inputs.
    Q("q_vector_agg",
      (s, dir) => t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .groupBy(col("label"), (col("pos0") + 1).cast("long").as("pos"))
        .agg((sum(col("v").cast("double").cast(org.apache.spark.sql.types.DecimalType(18, 9)))
          .cast("double") / count(lit(1))).as("avg_v"))
        .orderBy("label", "pos"),
      Some("""SELECT label, pos,
                CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_v
              FROM (SELECT label, unnest(embedding) AS v,
                           unnest(generate_series(1, len(embedding))) AS pos
                    FROM embeddings)
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ── int8 scalar quantization of the embedding corpus ─────────────────
    // Per-dimension global min/max (one tiny agg, broadcast back), then
    // affine code = round(((v-min)/(max-min))*255)-128. 4× storage cut
    // for ANN candidate scoring; codes are integers so the oracle is
    // exact. Both engines compute the affine map over identical doubles
    // in the same op order, and round() is half-away-from-zero in both.
    Q("q_vector_quantize",
      (s, dir) => {
        val x = t(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        val stats = x.groupBy("pos").agg(min("v").as("vmin"), max("v").as("vmax"))
        x.join(broadcast(stats), "pos")
          .select(col("vec_id"),
            (round(((col("v").cast("double") - col("vmin").cast("double"))
              / (col("vmax").cast("double") - col("vmin").cast("double"))) * 255)
              .cast("long") - 128).as("code"))
          .groupBy("vec_id")
          .agg(sum("code").as("code_sum"), min("code").as("code_min"),
            max("code").as("code_max"), count(lit(1)).as("dims"))
          .orderBy("vec_id")
      },
      Some("""WITH x AS (
                SELECT vec_id, unnest(embedding) AS v,
                       unnest(generate_series(1, len(embedding))) AS pos
                FROM embeddings),
              stats AS (SELECT pos, min(v) AS vmin, max(v) AS vmax FROM x GROUP BY 1),
              codes AS (
                SELECT vec_id,
                  CAST(round(((CAST(v AS DOUBLE) - CAST(vmin AS DOUBLE))
                    / (CAST(vmax AS DOUBLE) - CAST(vmin AS DOUBLE))) * 255) AS BIGINT) - 128 AS code
                FROM x JOIN stats USING (pos))
              SELECT vec_id, SUM(code) AS code_sum, MIN(code) AS code_min,
                MAX(code) AS code_max, COUNT(*) AS dims
              FROM codes GROUP BY 1 ORDER BY 1""")),

    // ── IVF-style approximate nearest neighbor (oracle-exempt) ───────────
    // Codebook = the 16 vectors with vec_id < 16 (a deterministic stand-in
    // for trained k-means centroids — swap point documented). Every corpus
    // vector is assigned to its nearest centroid cell (one broadcast pass);
    // a probe searches only its nprobe=4 nearest cells. Recall vs the
    // exact baseline is asserted in OpsSpec.
    Q("q_ann_ivf",
      (s, dir) => {
        GraftExtensions.ensureRegistered(s)
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"))
        val centroids = emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
            col("n2").as("c_n2"))
        // cell assignment: nearest centroid by cosine
        val byVec = Window.partitionBy("vec_id")
          .orderBy(col("csim").desc, col("cent_id"))
        val assigned = emb.join(broadcast(centroids))
          .select(col("vec_id"), col("embedding"), col("n2"), col("cent_id"),
            (dot(col("c_emb"), col("embedding")) / sqrt(col("c_n2") * col("n2"))).as("csim"))
          .withColumn("crk", row_number().over(byVec))
          .filter(col("crk") === 1)
          .select(col("vec_id"), col("embedding"), col("n2"), col("cent_id"))
        // probes → nprobe=4 nearest cells
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
            col("n2").as("p_n2"))
        val byProbeCell = Window.partitionBy("probe_id")
          .orderBy(col("csim").desc, col("cent_id"))
        val probeCells = probes.join(broadcast(centroids))
          .select(col("probe_id"), col("p_emb"), col("p_n2"), col("cent_id"),
            (dot(col("c_emb"), col("p_emb")) / sqrt(col("c_n2") * col("p_n2"))).as("csim"))
          .withColumn("crk", row_number().over(byProbeCell))
          .filter(col("crk") <= 4)
          .select(col("probe_id"), col("p_emb"), col("p_n2"), col("cent_id"))
        // search only assigned cells of the probe's nprobe list
        val byProbe = Window.partitionBy("probe_id")
          .orderBy(col("sim").desc, col("neighbor_id"))
        assigned.join(broadcast(probeCells), Seq("cent_id"))
          .filter(col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            (dot(col("p_emb"), col("embedding")) / sqrt(col("p_n2") * col("n2"))).as("sim"))
          .withColumn("rk", row_number().over(byProbe).cast("long"))
          .filter(col("rk") <= 3)
          .orderBy("probe_id", "rk")
      },
      None)
  )
}
