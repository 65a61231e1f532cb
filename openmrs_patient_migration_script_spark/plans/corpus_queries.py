"""Declared composed-pipeline query: end-to-end training-corpus prep
(operators/corpus.py) — quality filter → language ID → exact dedup →
MinHash near-dup cluster removal → deterministic split.

This is the builder brief's training-data surface exercised as ONE plan:
the oracle replays every stage in DuckDB (quality/langid expressions,
content-hash survivor pick, the exact md5 double-hash banding join, a
recursive-CTE transitive closure, and the hash-bucket split) so the full
pipeline is value-checked end to end, not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openmrs_patient_migration_script_spark.operators.corpus import prepare_corpus
from openmrs_patient_migration_script_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
)
from openmrs_patient_migration_script_spark.plans.registry import query
from openmrs_patient_migration_script_spark.sources import load_table

_STOPLIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
_MIN_QUALITY = 0.2
_MIN_TOKENS = 12


def _langid_case() -> tuple[str, str]:
    """(score select-list, argmax CASE) fragments shared with text_langid."""
    langs = sorted(LANG_MARKERS)
    scores = ",\n             ".join(
        "len(list_filter(string_split(lower(text), ' '), "
        f"""t -> list_contains([{", ".join(f"'{m}'" for m in LANG_MARKERS[lang])}], t)))"""
        f" AS score_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = (
        "CASE "
        + " ".join(
            f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in langs[:-1]
        )
        + f" ELSE '{langs[-1]}' END"
    )
    return scores, case


_SCORES, _CASE = _langid_case()

_CORPUS_PREP_ORACLE = f"""
    WITH RECURSIVE scored AS (
      SELECT doc_id, text,
             len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS n_tokens,
             round(least(len(list_filter(string_split(lower(text), ' '),
                                         t -> t <> '')) / 100.0, 1.0)
                   * (1.0 - round(len(list_filter(string_split(lower(text), ' '),
                                  t -> list_contains({_STOPLIST}, t)))
                      / len(list_filter(string_split(lower(text), ' '),
                                        t -> t <> '')), 6)), 6) AS quality_score,
             {_SCORES}
      FROM documents
    ),
    enriched AS (
      SELECT doc_id, text, n_tokens, quality_score, {_CASE} AS predicted_lang
      FROM scored
      WHERE quality_score >= {_MIN_QUALITY} AND n_tokens >= {_MIN_TOKENS}
    ),
    exact AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                    AS rn
        FROM enriched
      ) WHERE rn = 1
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM exact
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      FROM toks a
      JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
      FROM sh
    ),
    sig AS (
      SELECT doc_id, i, min((h1 + i * h2) % 4294967296) AS mh
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) seeds
      GROUP BY doc_id, i
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig_str
      FROM sig GROUP BY doc_id, i // 4
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig_str = b.sig_str
                  AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT key_a AS a, key_b AS b FROM pairs
      UNION ALL SELECT key_b, key_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
    ),
    comp AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node)
    SELECT e.doc_id AS key, e.predicted_lang, e.quality_score,
           CASE WHEN b < 900 THEN 'train'
                WHEN b < 950 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT exact.*,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS b
      FROM exact
    ) e
    LEFT JOIN comp ON comp.node = e.doc_id
    WHERE comp.node IS NULL OR comp.cluster = e.doc_id
"""


@query("corpus_prep", oracle=_CORPUS_PREP_ORACLE)
def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline over `documents`, value-checked
    end to end. Uses the md5 double-hash + raw-struct-bucket LSH form so
    the oracle replays the banding join exactly; production callers keep
    `prepare_corpus`'s cheaper xxhash64 defaults."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    md5_pair = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long"),
    )
    return prepare_corpus(
        docs,
        min_quality=_MIN_QUALITY,
        min_tokens=_MIN_TOKENS,
        double_hash=md5_pair,
        hash_buckets=False,
    )
