package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline text analysis over `documents` (north-star extensions).
  *
  * Generalizes the reference's only text workload — the per-character
  * counter client (`SampleClient.cpp:32-66`, ported as `q_charcount`) —
  * into the analysis passes a training-data pipeline runs per document:
  * token statistics, language-ID scoring, quality scoring, token counting,
  * and content fingerprinting.
  *
  * Everything here is a narrow per-row projection (no shuffle) except the
  * token-frequency aggregations, which are partial+final hash aggs over a
  * bounded key space — both shapes hold unchanged at 100 TB.
  */
object TextOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Seq[Q] = Seq(

    // ── corpus token statistics: top-20 tokens by frequency ──────────────
    // explode fans out ~#tokens rows but partial aggregation collapses to
    // the (tiny) vocabulary before the shuffle; final top-20 is a
    // TakeOrderedAndProject, never a global sort.
    Q("q_text_stats",
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20),
      Some("""SELECT token, count(*) AS cnt
              FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
              WHERE token <> ''
              GROUP BY token ORDER BY cnt DESC, token LIMIT 20""")),

    // ── per-language corpus stats ────────────────────────────────────────
    Q("q_lang_stats",
      (s, dir) => t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(split(col("text"), " "))).cast("long").as("total_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                COUNT(DISTINCT source) AS n_sources
              FROM documents GROUP BY lang ORDER BY lang""")),

    // ── language-ID: marker-token scoring heuristic ──────────────────────
    // Real pipelines use char-n-gram models; the deterministic, SQL-
    // checkable skeleton is marker-token frequency scoring with a fixed
    // tie-break order. (The synthetic corpus shares one vocabulary across
    // langs, so scores tie — the mechanism, not the accuracy, is under
    // test; swap the marker lists for real stopword tables in production.)
    Q("q_lang_id",
      (s, dir) => {
        val score = (markers: Seq[String]) =>
          markers.map(m => size(filter(split(col("text"), " "),
            x => x === lit(m))).cast("long")).reduce(_ + _)
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            score(Seq("the", "a", "of")).as("s_en"),
            score(Seq("el", "la", "de")).as("s_es"),
            score(Seq("der", "die", "das")).as("s_de"))
          .withColumn("guess",
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
              .when(col("s_es") >= col("s_de"), "es")
              .otherwise("de"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
                CAST(len(list_filter(string_split(text,' '), x -> x = 'the'))
                   + len(list_filter(string_split(text,' '), x -> x = 'a'))
                   + len(list_filter(string_split(text,' '), x -> x = 'of')) AS BIGINT) AS s_en,
                CAST(len(list_filter(string_split(text,' '), x -> x = 'el'))
                   + len(list_filter(string_split(text,' '), x -> x = 'la'))
                   + len(list_filter(string_split(text,' '), x -> x = 'de')) AS BIGINT) AS s_es,
                CAST(len(list_filter(string_split(text,' '), x -> x = 'der'))
                   + len(list_filter(string_split(text,' '), x -> x = 'die'))
                   + len(list_filter(string_split(text,' '), x -> x = 'das')) AS BIGINT) AS s_de,
                CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                     WHEN s_es >= s_de THEN 'es'
                     ELSE 'de' END AS guess
              FROM documents ORDER BY doc_id""")),

    // ── document quality scoring ─────────────────────────────────────────
    // length / mean token length / vocabulary (type-token) ratio /
    // stopword ratio, combined into one score. All inputs are exact
    // integers, each ratio is a single double division, and the score
    // formula is written identically on both sides → bit-stable.
    Q("q_quality_score",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("n_chars"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
          size(filter(col("toks"),
            x => x.isin("the", "a", "of", "and"))).cast("long").as("n_stop"),
          expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").as("tok_chars"))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_uniq"),
          col("n_stop"),
          (col("tok_chars") / col("n_tokens")).as("mean_tok_len"),
          (col("n_uniq") / col("n_tokens")).as("ttr"),
          (col("n_stop") / col("n_tokens")).as("stop_ratio"))
        .withColumn("quality",
          col("ttr") * 0.5 + col("stop_ratio") * 0.3
            + when(col("n_tokens") >= 20 && col("n_tokens") <= 1000, 0.2).otherwise(0.0))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
                CAST(len(list_filter(toks,
                  x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stop,
                list_sum(list_transform(toks, x -> length(x))) / len(toks) AS mean_tok_len,
                len(list_distinct(toks)) / len(toks) AS ttr,
                len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) / len(toks) AS stop_ratio,
                (len(list_distinct(toks)) / len(toks)) * 0.5
                  + (len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) / len(toks)) * 0.3
                  + CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 0.2 ELSE 0.0 END AS quality
              FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents)
              ORDER BY doc_id""")),

    // ── token counting: whitespace, regex-BPE-ish, chars-per-4 estimate ──
    Q("q_token_count",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long").as("re_tokens"),
          ceil(col("n_chars") / 4.0).cast("long").as("est_bpe_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS re_tokens,
                CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_bpe_tokens
              FROM documents ORDER BY doc_id""")),

    // ── explode_outer: lateral expansion preserving empty-array rows ─────
    // Docs keep a row (null token) even when they have no long tokens —
    // the outer-generator semantics a plain explode silently drops.
    // Null group keyed as '∅' so Spark/DuckDB null-ordering differences
    // can't affect the ORDER BY.
    Q("q_explode_outer",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => length(x) > 6).as("long_toks"))
        .select(col("doc_id"), explode_outer(col("long_toks")).as("tok"))
        .groupBy(coalesce(col("tok"), lit("∅")).as("token"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("token"),
      Some("""SELECT COALESCE(tok, '∅') AS token, count(*) AS cnt,
                count(DISTINCT doc_id) AS n_docs
              FROM (SELECT doc_id,
                      unnest(CASE WHEN len(lt) = 0
                             THEN [CAST(NULL AS VARCHAR)] ELSE lt END) AS tok
                    FROM (SELECT doc_id,
                            list_filter(string_split(text, ' '),
                                        x -> length(x) > 6) AS lt
                          FROM documents))
              GROUP BY 1 ORDER BY 1""")),

    // ── content fingerprinting ───────────────────────────────────────────
    // Two fingerprints per doc: order-insensitive md5 of the sorted
    // distinct token set (bag fingerprint) and an order-SENSITIVE rolling
    // polynomial hash mod 1e9+7 (sequence fingerprint) — both engines fold
    // left-to-right over the same token sequence.
    Q("q_fingerprint",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("fp_bag"),
          expr("aggregate(toks, 0L, (acc, x) -> (acc * 31 + ascii(x)) % 1000000007)")
            .as("fp_seq"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_bag,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(toks, x -> CAST(ascii(x) AS BIGINT))),
                  (acc, x) -> (acc * 31 + x) % 1000000007) AS fp_seq
              FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
              ORDER BY doc_id"""))
  )
}
