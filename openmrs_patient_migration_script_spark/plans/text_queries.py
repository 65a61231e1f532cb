"""Declared text-analysis queries (SURVEY.md §2.9 X5/X6 + builder-brief
text extensions) over the `documents` corpus table.

Each Spark plan's ANSI twin runs on DuckDB 1.0 (lambdas via `list_filter`,
rolling shingles via a position self-join). Float columns produced through
`ln`/division are round(…, 6)-ed identically on both sides per the engine
float policy (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    doc_fingerprint,
    language_id,
    ngram_counts,
    quality_metrics,
    repetition_metrics,
    tf_idf,
    token_counts,
)
from openmrs_patient_migration_script_spark.plans.registry import query
from openmrs_patient_migration_script_spark.sources import load_table

_SQL_STOPLIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@query(
    "text_tokens",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: corpus token frequency — explode + single hash agg (map-side
    partial combine; the shuffle carries only the vocabulary)."""
    return token_counts(load_table(spark, sf_dir, "documents"))


@query(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> ''
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
           round(tf.tf * ln((1.0 + n.n_docs) / (1.0 + dfreq.df)), 6) AS tfidf
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: TF-IDF — tf table joined to a broadcast vocabulary-sized
    doc-frequency table. doc_id is the table's unique key, so N is a
    parquet metadata-only count; tf is checkpointed so the corpus is
    scanned exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    return tf_idf(docs, n_docs=docs.count(), materialize_tf=True)


@query(
    "text_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> ''
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
             round(tf.tf * ln((1.0 + n.n_docs) / (1.0 + dfreq.df)), 6)
               AS tfidf,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(round(round(tf.tf * ln((1.0 + n.n_docs)
                             / (1.0 + dfreq.df)), 6) * 1000000) AS BIGINT) DESC,
                        dfreq.df ASC, tf.token ASC
             ) AS kw_rank
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    )
    SELECT doc_id, kw_rank, token, tf, df, tfidf
    FROM scored WHERE kw_rank <= 3
    """,
)
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6b: top-3 keywords per document (operators/text.py::
    keywords_topk) — TF-IDF materialized as each doc's most
    characteristic terms. The rank key is the 6dp tfidf itself,
    integer-scaled to a long (df asc, token asc tie-breaks) — so
    kw_rank provably agrees with the tfidf column; the 6dp rounding
    both engines already share absorbs ln() ulp wobble. `tf_idf`'s broadcast shape plus one doc-keyed window
    shuffle with WindowGroupLimit pruning to k=3 per partition."""
    from openmrs_patient_migration_script_spark.operators.text import keywords_topk

    docs = load_table(spark, sf_dir, "documents")
    return keywords_topk(docs, k=3, n_docs=docs.count())


@query(
    "text_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS tok,
             generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      FROM documents
    )
    SELECT a.tok || ' ' || b.tok AS ngram, count(*) AS cnt
    FROM toks a
    JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5b: bigram frequency. The oracle needs a positional self-join; the
    Spark plan builds n-grams row-locally with index-aware array lambdas
    (operators/text.py::ngram_counts) — no join, one hash agg."""
    return ngram_counts(load_table(spark, sf_dir, "documents"), n=2)


@query(
    "text_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
            FROM t),
    bi AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
           FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
    bia AS (SELECT doc_id, count(DISTINCT bg) AS nd, count(*) AS nb
            FROM bi GROUP BY doc_id)
    SELECT t.doc_id,
           round(len(list_distinct(toks))::DOUBLE / len(toks), 6)
             AS tok_distinct_ratio,
           round(coalesce(nd, 0)::DOUBLE / greatest(coalesce(nb, 0), 1), 6)
             AS bigram_distinct_ratio
    FROM t LEFT JOIN bia USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5c: repetition-based quality ratios (distinct-token /
    distinct-bigram fractions, the Gopher filter family) —
    operators/text.py::repetition_metrics. The oracle needs a positional
    self-join + two aggregations; the Spark plan is row-local array
    arithmetic on the single scan, zero shuffles."""
    return repetition_metrics(load_table(spark, sf_dir, "documents"))


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS n_tokens,
           length(text) AS n_chars,
           round(length(replace(text, ' ', ''))
                 / len(list_filter(string_split(lower(text), ' '), t -> t <> '')), 6)
             AS mean_tok_len,
           round(len(list_filter(string_split(lower(text), ' '),
                                 t -> list_contains({_SQL_STOPLIST}, t)))
                 / len(list_filter(string_split(lower(text), ' '), t -> t <> '')), 6)
             AS stopword_ratio,
           round(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                 / length(text), 6) AS punct_ratio,
           round(least(len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
                       / 100.0, 1.0)
                 * (1.0 - round(len(list_filter(string_split(lower(text), ' '),
                                t -> list_contains({_SQL_STOPLIST}, t)))
                    / len(list_filter(string_split(lower(text), ' '), t -> t <> '')), 6)),
                 6) AS quality_score
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for corpus filtering — token count, mean token
    length, stopword/punctuation ratios, composite score. Narrow
    scan-projection: zero shuffles at any scale."""
    return quality_metrics(load_table(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = ",\n           ".join(
        "len(list_filter(string_split(lower(text), ' '), "
        f"""t -> list_contains([{", ".join(f"'{m}'" for m in LANG_MARKERS[lang])}], t)))"""
        f" AS score_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return f"""
    WITH scored AS (
      SELECT doc_id,
           {score_exprs}
      FROM documents
    )
    SELECT doc_id, {", ".join(f"score_{lang}" for lang in langs)},
           {case} AS predicted_lang
    FROM scored
    """


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via marker-token scoring: per-lang score + argmax with
    alphabetical tie-break. The oracle verifies the scoring/argmax
    mechanics; real corpora would plug frequency-ranked marker lists into
    operators/text.py::LANG_MARKERS."""
    return language_id(load_table(spark, sf_dir, "documents"))


@query(
    "text_fingerprint",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      FROM toks a
      JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    )
    SELECT doc_id, min(md5(shingle)) AS fingerprint,
           count(DISTINCT shingle) AS n_shingles
    FROM sh GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-hash over rolling 3-word shingles
    (winnowing-style representative) + distinct-shingle count. One groupBy
    on doc_id; md5 here for oracle byte-parity, xxhash64 at scale."""
    return doc_fingerprint(load_table(spark, sf_dir, "documents"))


@query(
    "text_hash_embed",
    oracle="""
    SELECT doc_id,
           ('0x' || substr(md5(token), 1, 4))::BIGINT % 64 AS bucket,
           count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY 1, 2
    """,
)
def text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing embedding: documents → sparse 64-dim hashed
    bag-of-words vectors (operators/text.py::hashed_embedding) — the
    text→vector bridge of the pipeline (feeds the similarity/ANN surface).
    One explode + one hash agg; sparse rows shuffle only non-zeros."""
    from openmrs_patient_migration_script_spark.operators.text import hashed_embedding

    return hashed_embedding(load_table(spark, sf_dir, "documents"))


@query(
    "text_token_estimate",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
             AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             AS n_bpe_pieces
    FROM documents
    """,
)
def text_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5c: token counting — whitespace words plus BPE-ish regex pieces
    (operators/text.py::token_estimates), the budget estimator for LLM
    context/cost accounting over a corpus."""
    from openmrs_patient_migration_script_spark.operators.text import token_estimates

    return token_estimates(load_table(spark, sf_dir, "documents"))


@query(
    "text_chunk",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 16, 1), 48))
               AS start,
             generate_subscripts(
               generate_series(1, greatest(len(toks) - 16, 1), 48), 1) - 1
               AS chunk_id
      FROM t
    )
    SELECT doc_id AS key, chunk_id,
           array_to_string(toks[start : least(start + 63, len(toks))], ' ')
             AS chunk_text,
           least(start + 63, len(toks)) - start + 1 AS n_chunk_tokens
    FROM s
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5d: overlapping fixed-token chunking (64-token windows, 16-token
    overlap) — the long-document context-window prep. Row-local
    sequence+slice explosion, zero shuffles
    (operators/text.py::chunk_documents)."""
    from openmrs_patient_migration_script_spark.operators.text import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@query(
    "text_pack",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 16, 1), 48))
               AS start,
             generate_subscripts(
               generate_series(1, greatest(len(toks) - 16, 1), 48), 1) - 1
               AS chunk_id
      FROM t
    ),
    c AS (
      SELECT doc_id AS key, chunk_id,
             least(start + 63, len(toks)) - start + 1 AS n
      FROM s
    ),
    h AS (
      SELECT key, chunk_id, n,
             md5(concat_ws(chr(31), key::VARCHAR, chunk_id::VARCHAR)) AS hv
      FROM c
    ),
    b AS (
      SELECT key, chunk_id, n, hv,
             ('0x' || substr(md5(hv), 1, 8))::BIGINT % 32 AS bucket
      FROM h
    )
    SELECT key, chunk_id, bucket,
           CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS token_offset,
           CAST(floor(coalesce(sum(n) OVER w, 0) / 512) AS BIGINT) AS seq_id
    FROM b
    WINDOW w AS (PARTITION BY bucket ORDER BY hv
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
)
def text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5e: GPT-style sequence packing — chunks laid end-to-end in
    deterministic hash order within 32 independent packing streams, cut
    every 512 tokens (operators/text.py::pack_sequences). One shuffle on
    the bucket; no global window."""
    from openmrs_patient_migration_script_spark.operators.text import (
        chunk_documents,
        pack_sequences,
    )

    chunks = chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )
    return pack_sequences(
        chunks, ["key", "chunk_id"], "n_chunk_tokens", seq_tokens=512, n_buckets=32
    )


@query(
    "text_stats_by_lang",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS n_tokens,
             round(least(len(list_filter(string_split(lower(text), ' '),
                                         t -> t <> '')) / 100.0, 1.0)
                   * (1.0 - round(len(list_filter(string_split(lower(text), ' '),
                                  t -> list_contains({_SQL_STOPLIST}, t)))
                      / len(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')), 6)),
                   6) AS quality_score
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS total_tokens,
           ((2 * 1000000 * sum(n_tokens) + count(*)) // (2 * count(*)))
             / 1000000.0 AS avg_tokens,
           ((2 * sum(cast(round(quality_score * 1000000, 0) AS BIGINT))
             + count(*)) // (2 * count(*))) / 1000000.0 AS avg_quality
    FROM per_doc GROUP BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5d: per-language corpus report — doc counts, token volume, mean
    quality — the summary table every data-mix decision starts from.
    Stacks the row-local quality expressions onto the single scan and
    aggregates once on lang; at 100 TB the shuffle carries five numbers
    per language.

    The mean quality is exact end-to-end: per-doc scores are already 6dp
    (operators/text.py), so ×1e6 → long is lossless; the sum is an exact
    long; and the 6dp HALF_UP rounding of sum/n is done in INTEGER
    arithmetic — ``(2·s + n) div (2·n)`` (scores are non-negative) — so
    both engines produce identical longs before the single /1e6. A float
    avg() of doubles is partial-agg-order dependent, and even
    round(sum/n, 6) of identical doubles can split at a .5-at-6dp
    boundary (Spark rounds the shortest decimal repr HALF_UP, DuckDB
    scales the binary value), which is the intermittent hash mismatch
    observed in round 3. avg_tokens gets the SAME exact-integer
    treatment (the r3/r4 driver fails proved a float avg() of integral
    n_tokens is NOT safe either): ``(2·10⁶·Σtokens + n) div (2·n)`` is
    a lossless long expression on both engines, divided once."""
    from openmrs_patient_migration_script_spark.operators.text import quality_exprs

    d = load_table(spark, sf_dir, "documents")
    q = quality_exprs(F.col("text"))
    per_doc = d.select(
        "lang",
        q["n_tokens"].alias("n_tokens"),
        F.round(q["quality_score"] * 1e6, 0).cast("long").alias("qs_scaled"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("qs_scaled").alias("_qs"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_tokens",
        # the 2e6-scaled numerator multiplies as DECIMAL: a long wraps
        # once a language's token total passes ~4.6e12 (certain at 100 TB;
        # DuckDB's HUGEINT side is already 128-bit) — the skewness-
        # overflow class. div returns the long quotient (≤ max doc len).
        (
            F.expr(
                "cast((cast(2000000 as decimal(38,0)) * total_tokens"
                " + n_docs) div (2 * n_docs) as long)"
            )
            / F.lit(1e6)
        ).alias("avg_tokens"),
        (
            F.expr("(2 * _qs + n_docs) div (2 * n_docs)") / F.lit(1e6)
        ).alias("avg_quality"),
    )


@query(
    "text_gopher_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             coalesce(list_aggregate(list_transform(toks, x -> len(x)), 'sum'),
                      0)::BIGINT AS sum_word_len,
             len(list_filter(toks, x -> regexp_matches(x, '^[a-z]+$')))
               AS n_alpha_words,
             len(list_intersect(list_distinct(toks), {_SQL_STOPLIST}))
               AS n_distinct_stopwords
      FROM t
    )
    SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_distinct_stopwords,
           (n_words >= 20 AND n_words <= 100000) AS ok_word_count,
           (sum_word_len >= 3 * n_words AND sum_word_len <= 10 * n_words)
             AS ok_mean_word_len,
           (100 * n_alpha_words >= 80 * n_words) AS ok_alpha_share,
           (n_distinct_stopwords >= 2) AS ok_stopwords,
           ((n_words >= 20 AND n_words <= 100000)
            AND (sum_word_len >= 3 * n_words AND sum_word_len <= 10 * n_words)
            AND (100 * n_alpha_words >= 80 * n_words)
            AND (n_distinct_stopwords >= 2)) AS passes
    FROM m
    """,
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6c (r4): the Gopher rule battery
    (operators/text.py::gopher_rules) — word-count bounds, mean-length
    band, alphabetic-word share, distinct-stopword floor, composed into
    a per-doc pass/fail with every intermediate measured count exposed
    (the triage columns a data curator actually reads). Row-local array
    arithmetic on one scan; every rule comparison is integer-only, so
    the oracle is exact with no float anywhere."""
    from openmrs_patient_migration_script_spark.operators.text import gopher_rules

    return gopher_rules(load_table(spark, sf_dir, "documents"))


@query(
    "text_classifier_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t AS token FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
      ) WHERE t <> ''
    ),
    w AS (
      SELECT doc_id,
             (('0x' || substr(md5(token), 1, 8))::BIGINT % 2001) - 1000 AS w
      FROM toks
    ),
    d AS (
      SELECT doc_id, count(*) AS n_tokens, sum(w) AS sw FROM w GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           (CASE WHEN sw >= 0
                 THEN (2 * 1000 * sw + n_tokens) // (2 * n_tokens)
                 ELSE -((-2 * 1000 * sw + n_tokens) // (2 * n_tokens)) END)
             / 1000000.0 AS score
    FROM d
    """,
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6b (r4): hashed linear quality-classifier scoring
    (operators/text.py::hashed_linear_score) — the fasttext-filter
    architecture's exact plumbing and plan (token → hashed weight row →
    mean → threshold), with content-addressed integer weights standing
    in for the learned table. Weight lookup is a row-local expression
    (zero joins); the one shuffle is the per-doc agg; the mean is
    sign-split HALF_UP integer arithmetic, so the oracle is exact."""
    from openmrs_patient_migration_script_spark.operators.text import (
        hashed_linear_score,
    )

    return hashed_linear_score(load_table(spark, sf_dir, "documents"))


@query(
    "text_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t AS token FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
      ) WHERE t <> ''
    ),
    vc AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT sum(c)::DOUBLE AS t FROM vc),
    s AS (
      SELECT token, CAST(round(-ln(c / t) * 1000000, 0) AS BIGINT) AS s6
      FROM vc, tot
    ),
    d AS (
      SELECT doc_id, count(*) AS n_tokens, sum(s6) AS ss
      FROM toks JOIN s USING (token) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           ((2 * ss + n_tokens) // (2 * n_tokens)) / 1000000.0
             AS avg_surprisal
    FROM d
    """,
)
def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5f (r4): per-doc mean unigram surprisal
    (operators/text.py::unigram_surprisal) — the LM-perplexity quality
    filter over the corpus's own unigram distribution. Vocab-sized
    shuffle + broadcast surprisal table; the token stream shuffles once
    (per-doc agg). 6dp scaled-long arithmetic end-to-end after one
    per-TYPE rounding, so the oracle is exact."""
    from openmrs_patient_migration_script_spark.operators.text import (
        unigram_surprisal,
    )

    return unigram_surprisal(load_table(spark, sf_dir, "documents"))


@query(
    "text_topk_tokens_per_lang",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tc AS (
      SELECT lang, token, count(*) AS cnt FROM tok WHERE token <> ''
      GROUP BY 1, 2
    )
    SELECT lang, token, cnt FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY cnt DESC, token) AS rn
      FROM tc
    ) WHERE rn <= 5
    """,
)
def text_topk_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5e: vocabulary head per language — top-5 tokens by frequency with
    a deterministic (cnt DESC, token) tie-break. Token counts partial-
    combine map-side; the per-language ranking gets WindowGroupLimit
    pruning (each partition keeps 5 candidates per lang before the
    exchange). The shuffle carries vocabulary rows, never documents."""
    from openmrs_patient_migration_script_spark.operators.text import tokens
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select("lang", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    return (
        tc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
    )


_BM25_TERMS = ["data", "fast", "hash", "stream"]
_BM25_SQL_TERMS = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@query(
    "text_pmi",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
             generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      FROM documents
    ),
    uni AS (SELECT tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY tok),
    bi AS (
      SELECT a.tok AS w1, b.tok AS w2, count(*) AS c_ab
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT (SELECT sum(c) FROM uni)::DOUBLE AS t_tokens,
             (SELECT sum(c_ab) FROM bi)::DOUBLE AS t_bigrams
    )
    SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b,
           round(ln((c_ab / t_bigrams) /
                    ((ua.c / t_tokens) * (ub.c / t_tokens))), 6) AS pmi
    FROM bi JOIN uni ua ON ua.tok = bi.w1
            JOIN uni ub ON ub.tok = bi.w2, tot
    WHERE c_ab >= 5
    """,
)
def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5f: bigram PMI collocation mining (word2phrase-style phrase
    detection before tokenizer training) —
    operators/text.py::pmi_collocations. The oracle needs a positional
    self-join; the Spark plan builds bigram pairs row-locally and
    shuffles only the two count vocabularies, broadcasting unigram
    counts and the scalar totals back onto the bigram table."""
    from openmrs_patient_migration_script_spark.operators.text import (
        pmi_collocations,
    )

    return pmi_collocations(load_table(spark, sf_dir, "documents"), min_count=5)


@query(
    "text_bm25",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, string_split(lower(text), ' ') AS arr FROM documents
    ),
    t AS (
      SELECT doc_id, len(list_filter(arr, x -> x <> '')) AS dl,
             unnest(list_filter(arr, x -> x IN ({_BM25_SQL_TERMS}))) AS tok
      FROM arrs
    ),
    stats AS (
      SELECT count(*) AS n_docs,
             sum(len(list_filter(arr, x -> x <> '')))::DOUBLE / count(*) AS avgdl
      FROM arrs
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
      FROM t GROUP BY doc_id, tok
    ),
    dfq AS (SELECT tok, count(*) AS dfreq FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             round(ln(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
                   * (tf * (1.2 + 1.0))
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS s
      FROM tf JOIN dfq USING (tok), stats
    )
    SELECT doc_id, count(*) AS n_terms, round(sum(s), 6) AS bm25
    FROM scored GROUP BY doc_id
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5g: BM25 lexical relevance of every document to a fixed query-term
    set — operators/text.py::bm25_scores (Lucene idf form, k1=1.2,
    b=0.75). Doc length rides through the term-filtered tf aggregation
    (no doc-keyed big-big join); doc frequencies and the (N, avgdl)
    scalar row broadcast. Per-term scores round to 6dp BEFORE the
    per-doc sum so the final round is reassociation-immune."""
    from openmrs_patient_migration_script_spark.operators.text import bm25_scores

    return bm25_scores(load_table(spark, sf_dir, "documents"), _BM25_TERMS)


@query(
    "text_bigram_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    big AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok AS bg, a.tok AS w1, b.tok AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    c2 AS (
      SELECT bg, any_value(w1) AS w1, any_value(w2) AS w2,
             count(*)::BIGINT AS c2
      FROM big GROUP BY bg
    ),
    c1 AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY w1),
    v AS (SELECT count(DISTINCT w2)::BIGINT AS v FROM c2),
    s AS (
      SELECT bg,
             CAST(round(-ln((c2 + 1.0) / (c1 + v)) * 1000000) AS BIGINT) AS s6
      FROM c2 JOIN c1 USING (w1) CROSS JOIN v
    ),
    per AS (
      SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(s6) AS ss
      FROM big JOIN s USING (bg) GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           ((2 * ss + n_bigrams) // (2 * n_bigrams))::DOUBLE / 1000000.0
             AS avg_surprisal
    FROM per
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5g: bigram-LM quality filter (operators/text.py::bigram_surprisal)
    — word-salad detection the unigram filter misses: individually-common
    tokens that never co-occur score high. Add-one-smoothed conditional
    surprisal per observed bigram TYPE (6dp scaled long), occurrence
    stream shuffles once for the per-doc HALF_UP integer mean; type and
    context tables broadcast."""
    from openmrs_patient_migration_script_spark.operators.text import (
        bigram_surprisal,
    )

    return bigram_surprisal(load_table(spark, sf_dir, "documents"))


@query(
    "text_cosine_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> ''
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id AS key, tf.token,
             CAST(round(round(tf.tf * ln((1.0 + n.n_docs) / (1.0 + dfreq.df)),
                              6) * 1000000) AS BIGINT) AS w
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
      WHERE dfreq.df <= 100
    ),
    wp AS (SELECT * FROM w WHERE w > 0),
    norms AS (SELECT key, sum(w * w) AS norm2 FROM wp GROUP BY key),
    num AS (
      SELECT a.key AS key_a, b.key AS key_b, sum(a.w * b.w) AS num
      FROM wp a JOIN wp b ON a.token = b.token AND a.key < b.key
      GROUP BY 1, 2
    )
    SELECT key_a, key_b, CAST(num AS BIGINT) AS num,
           round(num / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) AS cos_sim
    FROM num
    JOIN norms na ON na.key = num.key_a
    JOIN norms nb ON nb.key = num.key_b
    WHERE 4 * num::HUGEINT * num::HUGEINT
          >= na.norm2::HUGEINT * nb.norm2::HUGEINT
    """,
)
def text_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6c (r6): sparse TF-IDF cosine document pairs at cos >= 0.5
    (operators/text.py::tfidf_cosine_pairs) — the text-side twin of
    `dedup_embedding`: related-document detection from the corpus's own
    term statistics, no embedding model required. Inverted-index join
    (shuffle on token, df<=100 prefix-filter guard), EXACT integer
    numerators/norms (the keywords_topk 1e6 scaling), and the threshold
    decided in wide-integer arithmetic (decimal(38,0) in Spark, HUGEINT
    in the oracle) so no float boundary can flip a pair between
    engines; the reported cos_sim double is derived from the exact ints
    after the decision."""
    from openmrs_patient_migration_script_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        d, "doc_id", "text", threshold_num=1, threshold_den=2, max_df=100
    )


@query(
    "text_tfidf_incremental",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> ''
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
           round(tf.tf * ln((1.0 + n.n_docs) / (1.0 + dfreq.df)), 6) AS tfidf
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
    WHERE tf.doc_id % 5 = 0
    """,
)
def text_tfidf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6d (r6): incremental TF-IDF (operators/text.py::tf_idf_against)
    — today's batch (every 5th doc) scored against the GLOBAL corpus
    statistics using only the indexed corpus's PERSISTED (token, df)
    table + its doc count; the historical text is never re-read. The
    oracle is the full recompute over the whole corpus restricted to
    the batch docs — hash equality proves incremental == full, the
    `etl_rollup_incremental` invariant applied to text statistics.
    Same persisted-state contract as minhash_pairs_against's
    index_signatures fast path."""
    from openmrs_patient_migration_script_spark.operators.text import (
        tf_idf_against,
        tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    index = d.filter(F.col("doc_id") % 5 != 0)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    # the persisted state a production pipeline reads off disk: the
    # index's (token, df) document-frequency table and its doc count
    index_df_counts = (
        index.select(
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    return tf_idf_against(batch, index_df_counts, index.count())


@query(
    "text_dedup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> ''
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id AS key, tf.token,
             CAST(round(round(tf.tf * ln((1.0 + n.n_docs) / (1.0 + dfreq.df)),
                              6) * 1000000) AS BIGINT) AS w
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
      WHERE dfreq.df <= 100
    ),
    wp AS (SELECT * FROM w WHERE w > 0),
    norms AS (SELECT key, sum(w * w) AS norm2 FROM wp GROUP BY key),
    num AS (
      SELECT a.key AS key_a, b.key AS key_b, sum(a.w * b.w) AS num
      FROM wp a JOIN wp b ON a.token = b.token AND a.key < b.key
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT key_a, key_b
      FROM num
      JOIN norms na ON na.key = num.key_a
      JOIN norms nb ON nb.key = num.key_b
      WHERE 4 * num::HUGEINT * num::HUGEINT
            >= na.norm2::HUGEINT * nb.norm2::HUGEINT
    ),
    edges AS (
      SELECT key_a AS a, key_b AS b FROM pairs
      UNION ALL
      SELECT key_b, key_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
    )
    SELECT node, min(label) AS cluster FROM reach GROUP BY node
    """,
)
def text_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6e (r6): related-document GROUPS from the corpus's own term
    statistics — connected components (operators/graph.py) over the
    `text_cosine_pairs` similarity graph: the no-embedding-model twin
    of `dedup_clusters`, closing the same pair→cluster arc the minhash
    family has (candidate pairs are only half the dedup story; the
    survivorship pass needs GROUPS). Oracle = the cosine-pair pipeline
    feeding the same transitive-closure CTE `dedup_clusters` uses."""
    from openmrs_patient_migration_script_spark.operators.graph import (
        connected_components,
    )
    from openmrs_patient_migration_script_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = tfidf_cosine_pairs(
        d, "doc_id", "text", threshold_num=1, threshold_den=2, max_df=100
    )
    return connected_components(pairs.select("key_a", "key_b"))


@query(
    "text_zipf_fit",
    oracle="""
    WITH counts AS (
      SELECT token, count(*)::BIGINT AS cnt
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
      WHERE token <> ''
      GROUP BY token
    ),
    top AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rank
      FROM counts
      QUALIFY rank <= 500
    ),
    sc AS (
      SELECT CAST(round(ln(rank) * 1000000) AS BIGINT) AS lx,
             CAST(round(ln(cnt) * 1000000) AS BIGINT) AS ly
      FROM top
    ),
    s AS (
      SELECT count(*)::BIGINT AS n_tokens,
             sum(lx)::BIGINT AS sx, sum(ly)::BIGINT AS sy,
             sum(lx::HUGEINT * ly)::HUGEINT AS sxy,
             sum(lx::HUGEINT * lx)::HUGEINT AS sxx
      FROM sc
    )
    SELECT n_tokens,
           round((n_tokens::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
                 / (n_tokens::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE,
                 6) AS slope,
           round((sy::HUGEINT * sxx - sx::HUGEINT * sxy)::DOUBLE
                 / (n_tokens::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE
                 / 1000000.0, 6) AS intercept_ln
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5l (r6): Zipf-law fit of the token-frequency head
    (operators/text.py::zipf_fit) — the one-number corpus health check:
    natural text's log-rank/log-freq line has slope ≈ −1, template
    floods flatten it, so the slope is the cheapest corpus-drift tripwire
    to run per ingest batch. Rank/count pairs are exact integers; per-row
    ln values scale to 1e6 integers (the `text_bm25` rounding rule) so
    the OLS sufficient statistics are exact long/HUGEINT sums and the
    closed-form slope/intercept is one fixed double chain rounded 6dp.
    Vocabulary-sized agg → distributed sort-limit head → one-row fit."""
    from openmrs_patient_migration_script_spark.operators.text import zipf_fit

    return zipf_fit(load_table(spark, sf_dir, "documents"), top_r=500)


@query(
    "text_heaps_fit",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                             t -> t <> ''))::BIGINT AS n_tok
      FROM documents
    ),
    bounds AS (
      SELECT min(doc_id) AS lo, max(doc_id) - min(doc_id) + 1 AS w FROM docs
    ),
    bucketed AS (
      SELECT d.doc_id, d.n_tok,
             (8 * (d.doc_id - b.lo + 1) + b.w - 1) // b.w - 1 AS bucket
      FROM docs d, bounds b
    ),
    toks AS (
      SELECT bucket, unnest(string_split(lower(text), ' ')) AS token
      FROM documents d JOIN bucketed USING (doc_id)
    ),
    firsts AS (
      SELECT min(bucket) AS first_bucket FROM toks WHERE token <> ''
      GROUP BY token
    ),
    per_bucket AS (
      SELECT g.bucket,
             coalesce(bd.n_docs, 0)::BIGINT AS n_docs,
             coalesce(bd.n_tok, 0)::BIGINT AS n_tok,
             coalesce(fv.n_new, 0)::BIGINT AS n_new
      FROM (SELECT unnest(generate_series(0, 7)) AS bucket) g
      LEFT JOIN (SELECT bucket, count(*) AS n_docs, sum(n_tok) AS n_tok
                 FROM bucketed GROUP BY bucket) bd USING (bucket)
      LEFT JOIN (SELECT first_bucket AS bucket, count(*) AS n_new
                 FROM firsts GROUP BY 1) fv USING (bucket)
    ),
    cum AS (
      SELECT bucket, b.lo + (b.w * (bucket + 1)) // 8 - 1 AS edge_id,
             sum(n_docs) OVER w::BIGINT AS n_docs_cum,
             sum(n_tok) OVER w::BIGINT AS n_tokens_cum,
             sum(n_new) OVER w::BIGINT AS vocab_cum
      FROM per_bucket, bounds b
      WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, edge_id, n_docs_cum,
           n_tokens_cum, vocab_cum,
           CASE WHEN lag(vocab_cum) OVER (ORDER BY bucket) IS NULL
                  OR lag(vocab_cum) OVER (ORDER BY bucket) = vocab_cum
                  OR lag(vocab_cum) OVER (ORDER BY bucket) = 0
                  OR lag(n_tokens_cum) OVER (ORDER BY bucket) = n_tokens_cum
                  OR lag(n_tokens_cum) OVER (ORDER BY bucket) = 0
                THEN 0.0
                ELSE round(
                  ln(vocab_cum::DOUBLE
                     / lag(vocab_cum) OVER (ORDER BY bucket))
                  / ln(n_tokens_cum::DOUBLE
                       / lag(n_tokens_cum) OVER (ORDER BY bucket)), 6)
           END AS beta_local
    FROM cum
    """,
)
def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5m (r8): vocabulary-growth (Heaps'-law) curve V(N) ≈ K·N^β —
    `text_zipf_fit`'s companion diagnostic (Zipf: frequency vs rank at
    one snapshot; Heaps: how the VOCABULARY grows as the corpus does —
    the number that predicts tokenizer-vocab saturation and flags
    template-heavy corpora, whose β collapses toward 0). Docs are cut
    into 8 equal-id-width prefixes with pure integer arithmetic
    (bucket = (8·(id−lo+1)+W−1) div W − 1, replayed verbatim in the
    oracle); a token's first bucket is min(bucket) over its
    occurrences, so the cumulative distinct count V_b needs no
    per-prefix re-scan; β̂ between consecutive prefixes is the 6dp
    log-log slope, 0.0-pinned at the degenerate boundaries.

    Scale: one tokenize scan → token-keyed min agg (the shuffle carries
    the vocabulary, map-side combined) + one doc agg; everything after
    lives on the 8-row bucket ladder (bounded-domain window, the
    `dq_drift_ks` rule)."""
    from openmrs_patient_migration_script_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    bounds = docs.agg(
        F.min("doc_id").alias("lo"),
        (F.max("doc_id") - F.min("doc_id") + 1).alias("w"),
    )
    bucketed = docs.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        F.col("toks"),
        F.expr("(8 * (doc_id - lo + 1) + w - 1) div w - 1").alias("bucket"),
    )
    per_doc = bucketed.select(
        "bucket", F.size("toks").cast("long").alias("n_tok")
    )
    firsts = (
        bucketed.select("bucket", F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.min("bucket").alias("first_bucket"))
    )
    bd = per_doc.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tok"),
    )
    fv = firsts.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    domain = docs.sparkSession.range(0, 8).select(F.col("id").alias("bucket"))
    per_bucket = (
        domain.join(F.broadcast(bd), "bucket", "left")
        .join(F.broadcast(fv), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_bucket.crossJoin(F.broadcast(bounds)).select(
        "bucket",
        (F.col("lo") + F.expr("(w * (bucket + 1)) div 8") - 1)
        .cast("long")
        .alias("edge_id"),
        F.sum("n_docs").over(w).cast("long").alias("n_docs_cum"),
        F.sum("n_tok").over(w).cast("long").alias("n_tokens_cum"),
        F.sum("n_new").over(w).cast("long").alias("vocab_cum"),
    )
    lw = Window.orderBy("bucket")
    v_prev = F.lag("vocab_cum").over(lw)
    n_prev = F.lag("n_tokens_cum").over(lw)
    return cum.select(
        F.col("bucket").cast("long").alias("bucket"),
        "edge_id",
        "n_docs_cum",
        "n_tokens_cum",
        "vocab_cum",
        F.when(
            v_prev.isNull()
            | (v_prev == F.col("vocab_cum"))
            | (v_prev == 0)
            | (n_prev == F.col("n_tokens_cum"))
            | (n_prev == 0),
            F.lit(0.0),
        )
        .otherwise(
            F.round(
                F.log(F.col("vocab_cum").cast("double") / v_prev)
                / F.log(F.col("n_tokens_cum").cast("double") / n_prev),
                6,
            )
        )
        .alias("beta_local"),
    )


@query(
    "text_vocab_coverage",
    oracle="""
    WITH vocab AS (
      SELECT token, count(*)::BIGINT AS cnt
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
      WHERE token <> ''
      GROUP BY token
    ),
    t AS (SELECT count(*)::BIGINT AS n_vocab, sum(cnt)::BIGINT AS n_occ
          FROM vocab),
    cum AS (
      SELECT cnt,
             sum(1) OVER (ORDER BY cnt RANGE BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS c,
             count(*) OVER () AS n
      FROM vocab
    ),
    cuts AS (
      SELECT k,
             min(CASE WHEN c * 100 >= (100 * (n - k)) THEN cnt END) AS c_star
      FROM cum CROSS JOIN (SELECT unnest([5, 20]) AS k) ks
      WHERE n > k
      GROUP BY k
    )
    SELECT cuts.k::BIGINT AS k, cuts.c_star::BIGINT AS min_count,
           (SELECT count(*) FROM vocab WHERE cnt >= cuts.c_star)::BIGINT
             AS n_tokens_kept,
           (SELECT sum(cnt) FROM vocab WHERE cnt >= cuts.c_star)::BIGINT
             AS occ_covered,
           t.n_vocab, t.n_occ,
           round((SELECT sum(cnt) FROM vocab WHERE cnt >= cuts.c_star)::DOUBLE
                 / t.n_occ, 6) AS coverage
    FROM cuts, t
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5n (r8): vocabulary-coverage ladder — for budget sizes
    k ∈ {5, 20} (cut to the fixture's ~31-token synthetic vocabulary —
    production budgets swap the ladder): what fraction of token
    OCCURRENCES the head of the
    frequency table covers (the OOV-rate / tokenizer-budget readout;
    `text_zipf_fit` says the head's shape, this says how much corpus
    the head BUYS). The cut count c*_k (the k-th largest frequency) is
    found by `exact_global_quantile`'s histogram SELECTION applied to
    the vocabulary counts — the exact rank rule min{{v : 100·cum ≥
    pct·n}} with pct = 100·(n_vocab−k)/n_vocab scaled to avoid a
    vocab-sized single-partition rank window — and the kept set is "all
    tokens with count ≥ c*" (ties keep the set slightly above k; the
    exact tie-inclusive contract, n_tokens_kept reports it). The oracle
    replays the identical rule in window form.

    Scale: one tokenize scan to the vocabulary (map-side combine), ~2
    selection scans of the checkpointed vocab per k, one conditional
    agg. No sort anywhere."""
    from openmrs_patient_migration_script_spark.operators.aggregates import (
        exact_global_quantile,
    )
    from openmrs_patient_migration_script_spark.operators.text import (
        token_counts,
    )

    vocab = token_counts(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)  # feeds selection scans + coverage aggs
    n_vocab = vocab.count()
    out = None
    for k in (5, 20):
        if n_vocab <= k:
            continue
        # min{c : 100·cum(c) >= pct·n} with pct·n = 100·(n_vocab − k):
        # exactly the (n−k)-th smallest = the k-th largest count. The
        # selection operator takes integer pct; scale the rule by n so
        # the ceil stays exact: target rank = n − k  ⇒  pct = 100(n−k)/n
        # computed EXACTLY by passing pct·n through the target directly.
        # k-th largest count = the (n_vocab − k)-th smallest: exact-rank
        # mode (an integer pct would double-ceil and overshoot the rank)
        c_star = exact_global_quantile(
            vocab, "cnt", target_rank=n_vocab - k
        )
        kept = F.col("cnt") >= F.lit(c_star)
        row = vocab.agg(
            F.count(F.when(kept, 1)).cast("long").alias("n_tokens_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("cnt"))), F.lit(0))
            .cast("long")
            .alias("occ_covered"),
            F.count(F.lit(1)).cast("long").alias("n_vocab"),
            F.sum("cnt").cast("long").alias("n_occ"),
        ).select(
            F.lit(k).cast("long").alias("k"),
            F.lit(c_star).cast("long").alias("min_count"),
            "n_tokens_kept",
            "occ_covered",
            "n_vocab",
            "n_occ",
            F.round(
                F.col("occ_covered").cast("double") / F.col("n_occ"), 6
            ).alias("coverage"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        empty_schema = (
            "k long, min_count long, n_tokens_kept long, occ_covered long, "
            "n_vocab long, n_occ long, coverage double"
        )
        return spark.createDataFrame([], empty_schema)
    return out


@query(
    "text_bpe_pair_stats",
    oracle="""
    WITH words AS (
      SELECT t AS word, count(*)::BIGINT AS freq
      FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS t
        FROM documents
      ) GROUP BY t
    ),
    pairs AS (
      SELECT word[i:i] AS sym_a, word[i+1:i+1] AS sym_b, freq
      FROM words
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, length(word) - 1)) AS i
      )
      WHERE length(word) >= 2
    ),
    ranked AS (
      SELECT sym_a, sym_b, sum(freq)::BIGINT AS pair_freq,
             row_number() OVER (ORDER BY sum(freq) DESC, sym_a, sym_b)
               AS merge_rank
      FROM pairs GROUP BY sym_a, sym_b
    )
    SELECT merge_rank, sym_a, sym_b, pair_freq
    FROM ranked WHERE merge_rank <= 10
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5m (r8): BPE merge-candidate statistics — the aggregate at the
    heart of byte-pair-encoding tokenizer training (Sennrich et al.
    2016): corpus-frequency-weighted adjacent symbol-pair counts over
    the word vocabulary, ranked (freq DESC, pair ASC — the
    deterministic tie-break real trainers pin). Rank 1 IS the first
    merge; the full trainer is a driver loop around exactly this
    aggregate with re-tokenization between rounds, so this primitive is
    what a 100 TB tokenizer-training job actually distributes.

    Scale shape: word counting collapses the corpus to its vocabulary
    FIRST (one token-keyed agg, map-side combined), so the pair
    explosion runs over vocabulary-sized rows × word length — corpus
    volume only ever passes through the initial count. Top-10 via
    TakeOrdered, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), t -> t != '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr("sequence(1, length(word) - 1)")
            ).alias("i"),
            "word",
        )
        .select(
            F.expr("substring(word, i, 1)").alias("sym_a"),
            F.expr("substring(word, i + 1, 1)").alias("sym_b"),
            "freq",
        )
    )
    ranked = pairs.groupBy("sym_a", "sym_b").agg(
        F.sum("freq").cast("long").alias("pair_freq")
    )
    w = Window.orderBy(F.desc("pair_freq"), "sym_a", "sym_b")
    return (
        ranked.withColumn("merge_rank", F.row_number().over(w))
        .filter(F.col("merge_rank") <= 10)
        .select(
            F.col("merge_rank").cast("long").alias("merge_rank"),
            "sym_a",
            "sym_b",
            "pair_freq",
        )
    )


_BPE_MERGE_ROUNDS = 3
# the trainer lives in operators/text.py (r10 — public API so pipelines
# compose it); these queries keep their historical private aliases
from openmrs_patient_migration_script_spark.operators.text import (  # noqa: E402
    BPE_US as _BPE_US,
    bpe_merge_rounds,
    bpe_symbols_col as _bpe_syms,
    bpe_token_count_col,
    bpe_word_vocab,
)


def _bpe_merge_rounds(words, n_rounds=_BPE_MERGE_ROUNDS):
    return bpe_merge_rounds(words, n_rounds)


def _bpe_learn_ctes(n_rounds: int = _BPE_MERGE_ROUNDS) -> str:
    """The shared unrolled BPE-trainer CTE chain (the `graph_ppr`
    pattern): words -> wrapped repr -> per round (pair stats p{r}, best
    pair b{r}, merged repr r{r}, corpus count t{r}). All BPE oracles
    build on this so DuckDB independently re-derives the merges Spark
    picked. r0/b{r}/r{r} are DuckDB-MATERIALIZED (r10): each r{r-1} is
    referenced twice (next round's pair stats AND the merge apply) and
    b{r} up to four times, so plain CTE inlining re-expands the prefix
    2^rounds times — unnoticeable at the original 3 rounds, minutes at
    `text_bpe_train`'s 8 (the `_kcore_oracle` planner lesson)."""
    syms = "string_split(trim(repr, chr(31)), chr(31)||chr(31))"
    parts = [
        """
    WITH words AS (
      SELECT t AS word, count(*)::BIGINT AS freq
      FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS t
        FROM documents
      )
      WHERE strpos(t, chr(31)) = 0
      GROUP BY t
    ),
    r0 AS MATERIALIZED (
      SELECT regexp_replace(word, '(?s)(.)', chr(31)||'\\1'||chr(31), 'g')
               AS repr,
             freq
      FROM words
    )"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"""
    p{r} AS (
      SELECT s[i] AS sym_a, s[i+1] AS sym_b, sum(freq)::BIGINT AS pair_freq
      FROM (SELECT {syms} AS s, freq FROM r{r - 1}) t
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, len(s) - 1)) AS i
      ) u
      WHERE len(s) >= 2
      GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (
      SELECT sym_a, sym_b, pair_freq
      FROM p{r} ORDER BY pair_freq DESC, sym_a, sym_b LIMIT 1
    ),
    r{r} AS MATERIALIZED (
      -- scalar-subquery form, NOT a cross join against b{r}: when a
      -- tiny corpus runs dry of merge candidates mid-ladder, b{r} is
      -- EMPTY and a cross join would silently empty every later CTE
      -- (diverging from the engine, which just stops merging); the
      -- coalesce(chr(0)) search string makes the replace a no-op
      SELECT replace(repr,
                     coalesce((SELECT chr(31)||sym_a||chr(31)||chr(31)
                                      ||sym_b||chr(31) FROM b{r}), chr(0)),
                     coalesce((SELECT chr(31)||sym_a||sym_b||chr(31)
                               FROM b{r}), chr(0))) AS repr,
             freq
      FROM r{r - 1}
    ),
    t{r} AS (
      SELECT sum(freq * len({syms}))::BIGINT AS corpus_tokens_after
      FROM r{r}
    )""")
    return ",".join(parts)


def _bpe_merge_oracle(n_rounds: int = _BPE_MERGE_ROUNDS) -> str:
    """Merge-ledger readout over the shared learn CTEs."""
    selects = [
        f"""
    SELECT {r}::BIGINT AS merge_round, sym_a, sym_b, pair_freq,
           (SELECT corpus_tokens_after FROM t{r}) AS corpus_tokens_after
    FROM b{r}"""
        for r in range(1, n_rounds + 1)
    ]
    return _bpe_learn_ctes(n_rounds) + "\n    UNION ALL".join(selects)


def _bpe_encode_oracle(n_rounds: int = _BPE_MERGE_ROUNDS) -> str:
    """Per-document encode readout: re-derive the merges via the shared
    learn CTEs, then apply them doc-wide as nested literal replaces —
    space renders as an ordinary wrapped symbol no merge pattern can
    cross, so the doc-wide apply equals the per-word apply."""
    # (?s) mirrors the engine's DOTALL wrap (operators/text.py): embedded
    # newlines wrap like any other symbol in both regex engines
    enc = (
        "regexp_replace(lower(d.text), '(?s)(.)', "
        "chr(31)||'\\1'||chr(31), 'g')"
    )
    for r in range(1, n_rounds + 1):
        # scalar subqueries, not cross joins, for the same merge-dry
        # robustness reason as the learn CTEs' r{r} step
        enc = (
            f"replace({enc},\n"
            f"         coalesce((SELECT chr(31)||sym_a||chr(31)||chr(31)"
            f"||sym_b||chr(31) FROM b{r}), chr(0)),\n"
            f"         coalesce((SELECT chr(31)||sym_a||sym_b||chr(31) "
            f"FROM b{r}), chr(0)))"
        )
    return (
        _bpe_learn_ctes(n_rounds)
        + f""",
    enc AS (
      SELECT d.doc_id,
             length(lower(d.text))::BIGINT AS n_char_syms,
             {enc} AS e
      FROM documents d
    )
    SELECT doc_id, n_char_syms,
           (CASE WHEN n_char_syms = 0 THEN 0
                 ELSE len(string_split(trim(e, chr(31)),
                                       chr(31)||chr(31))) END)::BIGINT
             AS n_bpe_tokens
    FROM enc"""
    )


@query("text_bpe_merge_apply", oracle=_bpe_merge_oracle())
def text_bpe_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5p (r9): BPE merge APPLICATION — the trainer loop that
    `text_bpe_pair_stats` is one round of (Sennrich et al. 2016): pick
    the corpus-frequency-best adjacent symbol pair (freq DESC, pair ASC
    tie-break), merge every left-to-right non-overlapping occurrence
    across the word vocabulary, re-count, repeat. Returns the merge
    ledger: (merge_round, sym_a, sym_b, pair_freq, corpus_tokens_after)
    for three unrolled rounds — the table a tokenizer-training run
    checkpoints after every merge batch.

    Greedy merge as ONE string `replace`: symbol sequences are encoded
    with every symbol wrapped in U+001F (``\\x1f a \\x1f \\x1f b
    \\x1f``), so the pair pattern ``\\x1f a \\x1f\\x1f b \\x1f`` consumes
    its delimiters entirely — left-to-right non-overlapping replace IS
    the BPE merge rule ("aaa" + merge(a,a) -> [aa, a]; "abab" ->
    [ab, ab]; both engines pinned), and a pattern can never match
    across a symbol boundary (a multi-char symbol's interior has no
    delimiters). No regex, no UDF, no per-symbol explode in the apply
    step.

    Scale: the corpus collapses to its VOCABULARY in the first
    token-keyed agg (map-side combined) and never re-enters — all three
    rounds run over vocab-sized rows. Per round: one pair explode + agg
    (vocab × word-length rows), one TakeOrdered(1) for the best pair
    (a bounded driver scalar, the exact_global_quantile collect class),
    one column-local `replace`, one global count. The merge table is 3
    driver literals; the 100 TB trainer is this loop with a larger
    round count and batched merges.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = bpe_word_vocab(docs)  # 3 rounds re-scan: vocab, not corpus
    out_rows = []
    syms = _bpe_syms()
    for r, a, b, pf, repr_df in _bpe_merge_rounds(words):
        tokens_after = repr_df.agg(
            F.sum(F.col("freq") * F.size(syms).cast("long")).alias("t")
        ).collect()[0]["t"]
        out_rows.append((r, a, b, pf, int(tokens_after)))
    schema = (
        "merge_round long, sym_a string, sym_b string, pair_freq long, "
        "corpus_tokens_after long"
    )
    return spark.createDataFrame(out_rows, schema)


@query("text_bpe_encode", oracle=_bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5q (r9): BPE ENCODE — apply the merges `text_bpe_merge_apply`
    learns to every document, per-doc: (doc_id, n_char_syms,
    n_bpe_tokens). This is the tokenization pass a corpus pipeline runs
    after training — the per-document token-count table that feeds
    packing, curriculum, and cost estimates.

    The apply is DOC-WIDE, not per-word: the whole lowercased text is
    wrapped char-wise (spaces become ordinary wrapped symbols), and
    since every learned merge pattern is delimiter-bounded and
    space-free, no merge can cross a word boundary — doc-wide nested
    `replace` equals the per-word apply with zero explode/regroup.
    After the (vocab-sized) training rounds, the corpus pass is a
    ZERO-SHUFFLE row-local projection: wrap, 3 literal replaces, one
    split-count — the ideal 100 TB shape (scales with executors,
    no exchange). Oracle re-derives the merges through the shared
    unrolled learn CTEs and applies the identical nested replaces."""
    docs = load_table(spark, sf_dir, "documents")
    words = bpe_word_vocab(docs)
    merges = [(a, b) for _, a, b, _, _ in _bpe_merge_rounds(words)]
    return docs.select(
        "doc_id",
        F.length(F.lower(F.col("text"))).cast("long").alias("n_char_syms"),
        bpe_token_count_col("text", merges).alias("n_bpe_tokens"),
    )


_BPE_TRAIN_ROUNDS = 8


def _bpe_train_oracle(n_rounds: int = _BPE_TRAIN_ROUNDS) -> str:
    """Merge-table readout over the shared learn CTEs: one row per
    executed round (an empty b{r} — merge-dry corpus — contributes no
    row, exactly like the engine loop's early stop)."""
    selects = [
        f"""
    SELECT {r}::BIGINT AS merge_rank, sym_a, sym_b, pair_freq
    FROM b{r}"""
        for r in range(1, n_rounds + 1)
    ]
    return _bpe_learn_ctes(n_rounds) + "\n    UNION ALL".join(selects)


@query("text_bpe_train", oracle=_bpe_train_oracle())
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5r (r10): the parameterized BPE TRAINER — the r9 verdict's ask:
    not 3 unrolled rounds but a driver loop to ``_BPE_TRAIN_ROUNDS`` (8)
    emitting the learned merge TABLE (merge_rank, sym_a, sym_b,
    pair_freq) — the artifact a tokenizer-training pipeline actually
    persists and ships to the encode pass (`text_bpe_encode` applies
    exactly this table). Completes the arc: pair_stats (one round's
    statistics) → train (the full ranked merge list) → merge_apply
    (per-round corpus-size ledger) → encode (doc-wide tokenization).

    Scale: identical to `text_bpe_merge_apply` — the corpus collapses
    to its VOCABULARY in the first token-keyed agg and never re-enters;
    each round is one vocab-sized pair explode + agg, one TakeOrdered(1)
    driver scalar (bounded by contract), one column-local literal
    replace, lineage checkpoint-truncated. Rounds are sequential by
    nature (merge r+1 depends on r's rewrite) — the 100 TB trainer runs
    this exact loop with batched low-rank merges. The merge-dry guard
    holds at 8 rounds: the engine stops early, the oracle's b{r} goes
    empty and contributes neither rows nor (via the scalar-subquery
    no-op replaces) any rewrite. Oracle rounds are MATERIALIZED — at 8
    rounds plain CTE inlining is 2^8 prefix re-expansions
    (`_bpe_learn_ctes` docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    words = bpe_word_vocab(docs)  # 8 rounds re-scan vocab, not corpus
    out_rows = [
        (r, a, b, pf)
        for r, a, b, pf, _ in _bpe_merge_rounds(words, _BPE_TRAIN_ROUNDS)
    ]
    schema = "merge_rank long, sym_a string, sym_b string, pair_freq long"
    return spark.createDataFrame(out_rows, schema)


@query(
    "text_langid_audit",
    oracle=f"""
    WITH pred AS (
      SELECT doc_id, predicted_lang FROM ({_langid_oracle()}) p
    )
    SELECT d.lang AS actual_lang, p.predicted_lang,
           count(*)::BIGINT AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2
    """,
)
def text_langid_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6f (r10): language-ID CONFUSION MATRIX — the certification query
    the marker-token heuristic lacked (the repo rule: every heuristic or
    approximate path ships with an exact auditable number — sim_ann_
    recall for ANN, dq_blocking_quality for blocking, this for langid):
    (actual_lang, predicted_lang, n_docs) against the corpus's labeled
    lang column. Off-diagonal mass is misrouted training data — a
    mixture computed from PREDICTED language inherits exactly these
    errors, so the matrix is the first table to diff after touching
    marker lists. Plan: the language_id scorer (row-local expressions,
    zero shuffles) + one doc-keyed join to the labels + a 2-key count
    agg; output is #(lang pairs) rows. Oracle composes the langid
    oracle with the identical rollup."""
    from openmrs_patient_migration_script_spark.operators.text import (
        language_id,
    )

    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "predicted_lang")
    return (
        docs.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(pred, "doc_id")
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# --- Unigram-LM (SentencePiece-style) trainer queries (r11) -----------------

from openmrs_patient_migration_script_spark.operators.text import (  # noqa: E402
    UNI_EM_ROUNDS as _UNI_ROUNDS,
    UNI_MAX_PIECE_LEN as _UNI_MAX_LEN,
    UNI_SEED_SIZE as _UNI_SEED,
    UNI_VOCAB_SIZE as _UNI_VOCAB,
    unigram_em_rounds,
    unigram_token_count_col,
    unigram_train,
)

_UNI_WRAP_SQL = "regexp_replace({src}, '(?s)(.)', chr(31)||'\\1'||chr(31), 'g')"


def _uni_nested_replaces(src: str, table: str, n_prios: int) -> str:
    """Nested literal replaces applying ``table``'s pieces to ``src`` in
    priority order 1..``n_prios`` — each pattern/replacement a scalar
    subquery (computed once, not per row) with the BPE coalesce(chr(0))
    no-op guard for ranks past the table's actual size."""
    enc = src
    for k in range(1, n_prios + 1):
        pat = (
            f"coalesce((SELECT {_UNI_WRAP_SQL.format(src='piece')} "
            f"FROM {table} WHERE prio = {k}), chr(0))"
        )
        rep = (
            f"coalesce((SELECT chr(31)||piece||chr(31) "
            f"FROM {table} WHERE prio = {k}), chr(0))"
        )
        enc = f"replace({enc},\n      {pat},\n      {rep})"
    return enc


def _unigram_learn_ctes(n_rounds: int = _UNI_ROUNDS) -> str:
    """The shared unrolled unigram-EM CTE chain (the `_bpe_learn_ctes`
    pattern): words -> wrapped ur0 -> seed substring candidates us0 ->
    per round (MaxMatch segmentation useg{r}, pruned survivor vocab
    uv{r}). Each round's segmentation re-reads ur0 (EM re-segments RAW
    text) with the PREVIOUS round's survivors in (length DESC, usage
    DESC, piece ASC) priority. All multi-consumer CTEs are
    MATERIALIZED."""
    syms = "string_split(trim(repr, chr(31)), chr(31)||chr(31))"
    parts = [
        f"""
    WITH words AS MATERIALIZED (
      SELECT t AS word, count(*)::BIGINT AS freq
      FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS t
        FROM documents
      )
      WHERE strpos(t, chr(31)) = 0
      GROUP BY t
    ),
    ur0 AS MATERIALIZED (
      SELECT {_UNI_WRAP_SQL.format(src='word')} AS repr, freq
      FROM words
    ),
    usubs AS (
      SELECT substring(word, i, l) AS piece, freq
      FROM (SELECT word, freq FROM words WHERE length(word) >= 2) w
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(2, least({_UNI_MAX_LEN},
                                               length(word)))) AS l
      ) ls
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, length(word) - l + 1)) AS i
      ) ps
    ),
    us0 AS MATERIALIZED (
      SELECT piece, cnt,
             row_number() OVER (ORDER BY length(piece) DESC, cnt DESC,
                                piece) AS prio
      FROM (
        SELECT piece, sum(freq)::BIGINT AS cnt
        FROM usubs GROUP BY piece
        ORDER BY cnt DESC, piece LIMIT {_UNI_SEED}
      )
    )"""
    ]
    for r in range(1, n_rounds + 1):
        table = "us0" if r == 1 else f"uv{r - 1}"
        n_prios = _UNI_SEED if r == 1 else _UNI_VOCAB
        parts.append(f"""
    useg{r} AS MATERIALIZED (
      SELECT {_uni_nested_replaces("repr", table, n_prios)} AS repr, freq
      FROM ur0
    ),
    uv{r} AS MATERIALIZED (
      SELECT piece, usage_cnt,
             row_number() OVER (ORDER BY usage_cnt DESC, piece)
               AS vocab_rank,
             row_number() OVER (ORDER BY length(piece) DESC,
                                usage_cnt DESC, piece) AS prio
      FROM (
        SELECT sym AS piece, sum(freq)::BIGINT AS usage_cnt
        FROM (SELECT unnest({syms}) AS sym, freq FROM useg{r})
        WHERE length(sym) >= 2
        GROUP BY sym
        ORDER BY usage_cnt DESC, piece LIMIT {_UNI_VOCAB}
      )
    )""")
    return ",".join(parts)


def _unigram_train_oracle(n_rounds: int = _UNI_ROUNDS) -> str:
    """Per-round survivor-vocabulary readout over the shared EM CTEs."""
    selects = [
        f"""
    SELECT {r}::BIGINT AS em_round, vocab_rank::BIGINT AS vocab_rank,
           piece, length(piece)::BIGINT AS piece_len, usage_cnt
    FROM uv{r}"""
        for r in range(1, n_rounds + 1)
    ]
    return _unigram_learn_ctes(n_rounds) + "\n    UNION ALL".join(selects)


def _unigram_encode_oracle(n_rounds: int = _UNI_ROUNDS) -> str:
    """Per-document encode readout: re-derive the final vocabulary via
    the shared EM CTEs, then apply it doc-wide (spaces are ordinary
    wrapped symbols no space-free piece pattern can cross, so doc-wide
    equals per-word — the BPE encode argument)."""
    enc = _uni_nested_replaces(
        _UNI_WRAP_SQL.format(src="lower(d.text)"), f"uv{n_rounds}", _UNI_VOCAB
    )
    return (
        _unigram_learn_ctes(n_rounds)
        + f""",
    enc AS (
      SELECT d.doc_id,
             length(lower(d.text))::BIGINT AS n_char_syms,
             {enc} AS e
      FROM documents d
    )
    SELECT doc_id, n_char_syms,
           (CASE WHEN n_char_syms = 0 THEN 0
                 ELSE len(string_split(trim(e, chr(31)),
                                       chr(31)||chr(31))) END)::BIGINT
             AS n_unigram_tokens
    FROM enc"""
    )


@query("text_unigram_train", oracle=_unigram_train_oracle())
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5s (r11): the UNIGRAM-LM (SentencePiece-style) tokenizer trainer
    — the other mainstream tokenizer family next to the BPE arc (Kudo
    2018 trains by seed-big -> EM re-estimate -> prune-to-target; BPE
    grows bottom-up, unigram shrinks top-down). Seeds the candidate set
    with the corpus's most frequent substrings (length 2-4, occurrence-
    counted, corpus-frequency-weighted), then runs fixed EM rounds:
    E-step segments every vocabulary WORD with the current candidates in
    MaxMatch priority (length DESC, count DESC, piece ASC — the
    deterministic integer-decidable surrogate for the float Viterbi; the
    100 TB trainer swaps the objective inside the same loop), M-step
    re-counts freq-weighted piece usage over the segmentation, prune
    keeps the top-``UNI_VOCAB_SIZE`` (usage DESC, piece ASC). Returns
    the per-round survivor ledger (em_round, vocab_rank, piece,
    piece_len, usage_cnt); the final round's slice IS the vocabulary
    `text_unigram_encode` applies.

    Scale: the corpus collapses to its WORD VOCABULARY in the first agg
    (the BPE vocab-collapse shape — corpus volume never re-enters the
    EM loop); per round one segmentation pass = nested literal replaces
    over vocab-sized rows (zero-shuffle projection), one explode + agg
    (vocab x pieces-per-word rows, map-side combined), one bounded
    TakeOrdered collect (20-seed / 12-survivor driver lists by
    contract). Segmentation uses the U+001F wrap: a piece application
    is ONE string replace whose pattern consumes its delimiters — no
    regex in the loop, no UDF, no per-symbol explode. Oracle re-derives
    the identical EM rounds through MATERIALIZED CTEs (useg{r}/uv{r}
    are each read twice — the `_bpe_learn_ctes` 2^rounds lesson)."""
    docs = load_table(spark, sf_dir, "documents")
    rows = [
        (r, k, p, len(p), c)
        for r, k, p, c in unigram_train(docs, _UNI_ROUNDS)
    ]
    schema = (
        "em_round long, vocab_rank long, piece string, piece_len long, "
        "usage_cnt long"
    )
    return spark.createDataFrame(rows, schema)


@query("text_unigram_encode", oracle=_unigram_encode_oracle())
def text_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5t (r11): unigram ENCODE — the parity twin applying
    `text_unigram_train`'s final vocabulary to every document: (doc_id,
    n_char_syms, n_unigram_tokens). The apply is DOC-WIDE (lowercased
    text wrapped char-wise; spaces are ordinary wrapped symbols and no
    piece contains one, so no piece pattern can cross a word boundary —
    doc-wide nested replace == per-word apply). After the vocab-sized
    training rounds the corpus pass is a ZERO-SHUFFLE row-local
    projection: wrap, 12 literal replaces, one split-count — the same
    ideal 100 TB shape as `text_bpe_encode`. Hash equality against the
    oracle proves BOTH the trainer's EM rounds and the encode replay
    exactly in a second engine."""
    docs = load_table(spark, sf_dir, "documents")
    words = bpe_word_vocab(docs)
    final: list[tuple[str, int]] = []
    for _, cand in unigram_em_rounds(words, _UNI_ROUNDS):
        final = cand
    return docs.select(
        "doc_id",
        F.length(F.lower(F.col("text"))).cast("long").alias("n_char_syms"),
        unigram_token_count_col("text", final).alias("n_unigram_tokens"),
    )
