package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline multimodal columns (north-star extensions).
  *
  * Media are opaque `binary` payloads with a typed metadata struct riding
  * alongside — the schema a 100-TB multimodal corpus uses (payload bytes
  * in parquet, metadata queryable without touching payloads). The
  * container has no image/audio codecs, so `MultimodalStub.decode` is a
  * deterministic fake feature extractor with the REAL decoder as the
  * documented swap point; everything around it — schema, typed Dataset
  * encoders, per-partition batching, frame sampling — is real Spark
  * plumbing and is what the tests cover.
  */
object Multimodal {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** `documents` recast as a multimodal asset table: payload = utf-8 bytes
    * of `text` standing in for an image/audio blob, plus typed metadata.
    * Columns: doc_id, payload (binary), meta {format, n_bytes, sample_rate}.
    */
  def assets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("bin/v1").as("format"),
        col("n_chars").cast("long").as("n_bytes"),
        (col("doc_id") % 3 * 8000 + 16000).cast("long").as("sample_rate")).as("meta"))

  val queries: Seq[Q] = Seq(

    // ── mixed-type projection: text ⋈ embeddings ⋈ json-ish metadata ─────
    // One row mixing string, numeric, array-derived and computed columns —
    // the "feature row" a training pipeline materializes. The join key is
    // doc_id = vec_id (1:1 by construction). BOTH sides are corpus tables
    // that grow with SF, so neither is hint-broadcast: this is a
    // co-partitioned shuffle join (both sides hash on the same key; with
    // bucketed storage — Sources.bucketed — it is shuffle-free). A forced
    // broadcast of documents would OOM the build side at scale.
    Q("q_multimodal_cols",
      (s, dir) => {
        graft.plans.GraftExtensions.ensureRegistered(s)
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            call_function("graft_dot", col("embedding"), col("embedding")).as("e_n2"),
            element_at(col("embedding"), 1).cast("double").as("e_first"))
          .join(docs, col("vec_id") === col("doc_id"))
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            col("n_tokens"), col("label"), sqrt(col("e_n2")).as("e_norm"),
            col("e_first"))
          .orderBy("doc_id")
      },
      Some("""SELECT d.doc_id, d.lang, d.source, d.n_chars,
                CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                e.label,
                sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
                      FROM generate_series(1, 64) g(i))) AS e_norm,
                CAST(e.embedding[1] AS DOUBLE) AS e_first
              FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
              ORDER BY d.doc_id""")),

    // ── payload decode + feature extraction (rows-only: binary pipeline) ─
    // Narrow per-row pass over binary payloads: metadata stays columnar
    // (never decoded), features come from MultimodalStub.decode. At 100 TB
    // this is the map side of a feature-extraction job — no shuffle at all
    // until the (optional) downstream aggregation.
    Q("q_multimodal_decode",
      (s, dir) => {
        import s.implicits._
        val feats = assets(s, dir)
          .select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            // batch-shaped loop: one decoder instance per partition, the
            // shape a JNI/codec-backed decoder needs (init once, stream rows)
            val dec = new MultimodalStub
            it.map { case (id, bytes) => dec.decode(id, bytes) }
          }
          .toDF()
        // metadata side is documents-derived (grows with SF) → no forced
        // broadcast; both sides key on doc_id so AQE/bucketing co-locate.
        feats
          .join(assets(s, dir).select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
            col("meta.sample_rate").as("sample_rate")), Seq("doc_id"))
          .select(col("doc_id"), col("n_bytes"), col("sample_rate"),
            col("byteMean").as("byte_mean"),
            col("byteEntropyBucket").cast("long").as("entropy_bucket"),
            col("nFrames").cast("long").as("n_frames"))
          .orderBy("doc_id")
      },
      // oracle-able because the stub decoder is exact arithmetic over the
      // (asserted all-ASCII) payload bytes: DuckDB recomputes byte mean
      // (one exact-int division), the modal 32-wide code bucket (smallest
      // bucket on count ties = indexOf-first in the stub), and the frame
      // count from character codes
      Some("""WITH chars AS (
                SELECT doc_id, ascii(substring(text, CAST(i AS INT), 1)) AS code
                FROM (SELECT doc_id, text,
                        unnest(generate_series(1, len(text))) AS i
                      FROM documents)),
              a AS (
                SELECT doc_id, count(*) AS n, CAST(sum(code) AS BIGINT) AS sc
                FROM chars GROUP BY 1),
              b AS (
                SELECT doc_id, code // 32 AS bkt, count(*) AS c
                FROM chars GROUP BY 1, 2),
              best AS (
                SELECT doc_id, bkt FROM (
                  SELECT doc_id, bkt, row_number() OVER (
                    PARTITION BY doc_id ORDER BY c DESC, bkt) AS rn
                  FROM b) WHERE rn = 1)
              SELECT d.doc_id,
                CAST(d.n_chars AS BIGINT) AS n_bytes,
                CAST(d.doc_id % 3 * 8000 + 16000 AS BIGINT) AS sample_rate,
                COALESCE(CAST(a.sc AS DOUBLE) / a.n, 0.0) AS byte_mean,
                CAST(COALESCE(best.bkt, 0) AS BIGINT) AS entropy_bucket,
                CAST((d.n_chars + 31) // 32 AS BIGINT) AS n_frames
              FROM documents d
                LEFT JOIN a USING (doc_id) LEFT JOIN best USING (doc_id)
              ORDER BY d.doc_id""")),

    // ── frame sampling (media chunking pipeline) ─────────────────────────
    // Payload sliced into fixed 32-byte "frames" (stand-in for video
    // frames / audio windows), every 4th frame sampled, per-frame feature
    // = first-byte value. Pure columnar expressions — no UDF in the hot
    // path; the explode is the row-per-frame fan-out a frame-level model
    // feed uses. Oracle-checked: the payload is the utf-8 bytes of an
    // all-ASCII `text` (asserted pure ASCII with len(text) = n_chars at
    // every SF), so DuckDB reproduces the byte arithmetic with character
    // slicing on the text itself.
    Q("q_frame_sample",
      (s, dir) => assets(s, dir)
        .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
        .select(col("doc_id"), col("n_bytes"),
          explode(expr(
            """transform(
                 filter(sequence(0, CAST(ceil(n_bytes / 32.0) AS INT) - 1),
                        f -> f % 4 = 0),
                 f -> struct(CAST(f AS BIGINT) AS frame_id,
                             ascii(CAST(substring(payload, f * 32 + 1, 1) AS STRING)) AS lead_byte))"""))
            .as("fr"))
        .select(col("doc_id"), col("fr.frame_id"),
          col("fr.lead_byte").cast("long").as("lead_byte"))
        .orderBy("doc_id", "frame_id"),
      Some("""SELECT doc_id,
                CAST(f AS BIGINT) AS frame_id,
                CAST(ascii(substring(text, CAST(f * 32 + 1 AS INT), 1)) AS BIGINT) AS lead_byte
              FROM (
                SELECT doc_id, text,
                  unnest(generate_series(0, CAST(ceil(n_chars / 32.0) AS INT) - 1)) AS f
                FROM documents)
              WHERE f % 4 = 0
              ORDER BY doc_id, frame_id"""))
  )
}

/** Deterministic fake media decoder — the swap point for a real codec.
  *
  * A production build replaces `decode` with the JNI/codec call (e.g.
  * image decode → pixel stats, audio decode → spectral features); the
  * signature (one instance per partition, row-streaming, fixed-width
  * numeric feature row out) is exactly what the real thing needs.
  */
final class MultimodalStub extends Serializable {
  def decode(id: Long, bytes: Array[Byte]): MmFeatures = {
    var sum = 0L
    var i = 0
    val hist = new Array[Long](8)
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      hist(b >>> 5) += 1
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    val maxBucket = hist.indexOf(hist.max)
    MmFeatures(id, mean, maxBucket, (bytes.length + 31) / 32)
  }
}

final case class MmFeatures(
    doc_id: Long,
    byteMean: Double,
    byteEntropyBucket: Int,
    nFrames: Int)
