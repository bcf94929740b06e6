package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline deduplication over `documents` (SURVEY.md §2.C + north star).
  *
  * The reference's only dedup primitive is the unique-key set
  * (`JobContext.h:24-28`); a content-dedup pipeline at 100 TB needs the
  * full ladder: exact hash → MinHash/LSH banding → SimHash → exact n-gram
  * Jaccard verification. All candidate generation here is bucket-join
  * shaped (explode → shuffle on bucket key → within-bucket pair join):
  * never an all-pairs cross join, so the cost is Σ|bucket|² not N².
  *
  * Determinism: no RNG — MinHash "permutations" are xxhash64 salted with
  * a literal seed; SimHash uses xxhash64 token hashes. Both are fixed
  * functions of the input, so reruns and the driver's re-execution agree.
  */
object Dedup {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Distinct word 3-gram shingles per document: (doc_id, shingle). */
  private def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 3
           THEN array_distinct(transform(sequence(0, size(toks) - 3),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
           ELSE array() END""")).as("shingle"))

  /** Hashed distinct shingles: xxhash64 over the 3 tokens directly — no
    * string materialization (the concat'd form costs ~2s of the MinHash
    * pipeline at sf0.1). 64-bit collisions are negligible for Jaccard
    * estimation; the string form stays in q_dedup_ngram where the DuckDB
    * oracle needs reproducible shingles.
    */
  private def shingleHashes(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 3
           THEN array_distinct(transform(sequence(0, size(toks) - 3),
                  i -> xxhash64(toks[i], toks[i+1], toks[i+2])))
           ELSE array() END""")).as("shingle"))

  private val NumHashes = 32
  private val BandSize = 4 // → 8 bands; P(candidate) = 1-(1-J^4)^8

  /** Document-frequency cap for the exact shared-shingle self-join
    * (q_dedup_ngram): shingles appearing in more than this many documents
    * are dropped from the pipeline (sizes AND join) before the self-join,
    * so no shingle bucket can exceed Cap² pairs. This is the standard
    * stop-shingle filter of n-gram dedup — a corpus-frequent shingle
    * ("in the the") carries no near-dup signal but makes its bucket
    * quadratic; capping it bounds the worst bucket at a constant
    * independent of corpus size. Jaccard is then computed over the
    * capped (rare-shingle) sets in engine and oracle alike.
    */
  val ShingleDfCap = 128

  /** Shingles restricted to those with document frequency ≤ cap — the
    * only shape allowed to reach the shared-shingle self-join.
    *
    * Filtered as an ANTI-join against the HOT list (df > cap), not a
    * join with the rare list: the hot list is bounded by
    * total-occurrences / cap (a few rows at any corpus size, trivially
    * broadcastable), while the rare list is nearly all distinct shingles
    * — corpus-sized. The df aggregation itself is partial-aggregated, so
    * a mega-hot shingle never concentrates rows anywhere.
    */
  def cappedShingles(docs: DataFrame, cap: Int): DataFrame = {
    val sh = shingles(docs)
    val hot = sh.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > cap)
      .select("shingle")
    sh.join(hot, Seq("shingle"), "left_anti").select("doc_id", "shingle")
  }

  val queries: Seq[Q] = Seq(

    // ── exact dedup by content hash ──────────────────────────────────────
    // Keep min doc_id per md5(text); dup_cnt counts collapsed copies.
    // At 100 TB this is one hash-partitioned aggregation on a 128-bit key —
    // no sort, no full-text shuffle (only the hash + id move).
    Q("q_dedup_exact",
      (s, dir) => t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select("doc_id", "dup_cnt")
        .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
              FROM documents GROUP BY md5(text) ORDER BY doc_id""")),

    // ── MinHash + LSH banding near-dup (oracle-exempt: not SQL-shaped) ───
    // shingle → 32 salted-xxhash64 min-signatures (one aggregation — the
    // map-side combine keeps the shuffle at |docs|×32 longs) → 8 banded
    // bucket keys → within-bucket pair join → exact-Jaccard verification
    // of candidates only. The verify join is semi-join-pruned to candidate
    // docs, so shingle re-expansion touches only candidate content.
    Q("q_dedup_near",
      (s, dir) => {
        val sh = shingleHashes(t(s, dir, "documents"))
        val sigCols: Seq[Column] = (0 until NumHashes)
          .map(k => min(xxhash64(lit(k), col("shingle"))).as(s"h$k"))
        val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        val bandCols: Seq[Column] = (0 until NumHashes / BandSize).map { b =>
          val cols = (0 until BandSize).map(i => col(s"h${b * BandSize + i}"))
          struct(lit(b).as("band_id"), xxhash64(cols: _*).as("band_hash")).as(s"b$b")
        }
        val bands = sigs
          .select(col("doc_id"), array(bandCols: _*).as("bands"))
          .select(col("doc_id"), explode(col("bands")).as("b"))
          .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
        val cands = bands.as("x")
          .join(bands.as("y"),
            col("x.band_id") === col("y.band_id")
              && col("x.band_hash") === col("y.band_hash")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_bands"))
        // exact Jaccard on candidates ONLY: expand each candidate pair to
        // a's shingles, then equi-join on (b, shingle) — intersection
        // counting linear in Σ|shingles(candidate)|, never the full
        // shingle self-join (that all-pairs shape is q_dedup_ngram's job)
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val shA = sh.join(cands.select("a", "b"), col("doc_id") === col("a"))
          .select(col("a"), col("b"), col("shingle"))
        val common = shA.join(sh.as("sb"),
            col("sb.doc_id") === col("b") && col("sb.shingle") === shA("shingle"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
        cands
          .join(common, Seq("a", "b"))
          .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "sz_a"), Seq("a"))
          .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "sz_b"), Seq("b"))
          .select(col("a"), col("b"), col("n_bands"),
            (col("n_common") / (col("sz_a") + col("sz_b") - col("n_common"))).as("jaccard"))
          .orderBy("a", "b")
      },
      None),

    // ── exact n-gram Jaccard near-dup (the verification path, oracled) ───
    // Candidate generation by shared shingle (bucket join on the shingle
    // itself), exact Jaccard from intersection/union counts. Emits pairs
    // with J ≥ 0.3. Shingles with document frequency > ShingleDfCap are
    // dropped BEFORE the self-join (see cappedShingles) so the worst
    // bucket is bounded at Cap² pairs regardless of corpus size; the
    // DuckDB oracle applies the identical cap. At 100 TB the join is
    // additionally preceded by the MinHash pass above (q_dedup_near) so
    // only banded candidates reach it.
    Q("q_dedup_ngram",
      (s, dir) => {
        val sh = cappedShingles(t(s, dir, "documents"), ShingleDfCap)
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        sh.as("sa")
          .join(sh.as("sb"), col("sa.shingle") === col("sb.shingle")
            && col("sa.doc_id") < col("sb.doc_id"))
          .select(col("sa.doc_id").as("a"), col("sb.doc_id").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
          .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "sz_a"), Seq("a"))
          .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "sz_b"), Seq("b"))
          .select(col("a"), col("b"), col("n_common").as("inter_sz"),
            (col("sz_a") + col("sz_b") - col("n_common")).as("union_sz"),
            (col("n_common") / (col("sz_a") + col("sz_b") - col("n_common"))).as("jaccard"))
          .filter(col("jaccard") >= 0.3)
          .orderBy("a", "b")
      },
      Some(s"""WITH sh0 AS (
                SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                   for i in generate_series(1, len(toks) - 2)])) AS shingle
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
                WHERE len(toks) >= 3),
              rare AS (SELECT shingle FROM sh0 GROUP BY shingle
                       HAVING count(*) <= $ShingleDfCap),
              sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle)),
              sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
              pairs AS (
                SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS inter_sz
                FROM sh sa JOIN sh sb
                  ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
                GROUP BY 1, 2)
              SELECT p.a, p.b, p.inter_sz,
                (za.n_sh + zb.n_sh - p.inter_sz) AS union_sz,
                p.inter_sz / (za.n_sh + zb.n_sh - p.inter_sz) AS jaccard
              FROM pairs p
                JOIN sizes za ON za.doc_id = p.a
                JOIN sizes zb ON zb.doc_id = p.b
              WHERE p.inter_sz / (za.n_sh + zb.n_sh - p.inter_sz) >= 0.3
              ORDER BY a, b""")),

    // ── SimHash near-dup (oracle-exempt: xxhash64 is Spark-specific) ─────
    // 64-bit SimHash per doc from token xxhash64s (64 signed bit-weight
    // sums in ONE aggregation — partial+final, shuffle carries 64 longs per
    // doc), banded into 4×16-bit keys; same-band pairs verified by exact
    // Hamming distance ≤ 12 via bit_count(xor).
    Q("q_dedup_simhash",
      (s, dir) => {
        val tokHashes = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .select(col("doc_id"), xxhash64(col("tok")).as("th"))
        val bitCols: Seq[Column] = (0 until 64).map { k =>
          sum(when(shiftright(col("th"), k).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"w$k")
        }
        val weights = tokHashes.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
        val simhash = (0 until 64).map { k =>
          when(col(s"w$k") > 0, shiftleft(lit(1L), k)).otherwise(0L)
        }.reduce[Column](_.bitwiseOR(_))
        val sigs = weights.select(col("doc_id"), simhash.as("sim"))
        val bands = sigs.select(col("doc_id"), col("sim"),
            explode(expr(
              """transform(sequence(0, 3),
                 b -> struct(b AS band_id, shiftright(sim, b * 16) & 65535 AS band_key))""")).as("b"))
          .select(col("doc_id"), col("sim"), col("b.band_id"), col("b.band_key"))
        bands.as("x")
          .join(bands.as("y"),
            col("x.band_id") === col("y.band_id")
              && col("x.band_key") === col("y.band_key")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
            bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).cast("long").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 12)
          .orderBy("a", "b")
      },
      None)
  )
}
