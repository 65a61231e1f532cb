"""Privacy operators: pseudonymization, PII redaction, re-identification
audit (builder brief extension; the reference's domain is patient-record
migration — /root/reference/README.md:2 — where de-identified exports are
the standard companion to a migration, and LLM training corpora need the
same scrubbing pass before use).

All row-local JVM expressions (hash / regexp / arithmetic banding) except
the k-anonymity audit, which is one hash aggregation on the
quasi-identifier tuple. Nothing here shuffles wide data, so every op
scales linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Redaction patterns — kept to explicit character classes so the Java
# (Spark) and RE2-ish (DuckDB) engines agree byte-for-byte.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
LONG_NUM_RE = "[0-9]{3,}"


def pseudonym(key_col, salt: str, length: int = 16) -> F.Column:
    """Deterministic salted pseudonym: stable across runs and tables (same
    key → same pseudonym, so joins still work on the de-identified data),
    irreversible without the salt. NOT format-preserving by design."""
    return F.substring(F.md5(F.concat_ws(":", F.lit(salt), key_col.cast("string"))), 1, length)


def redact_digits(text_col, replacement: str = "#") -> F.Column:
    """Mask every digit (identifier-bearing names, MRNs, phone fragments)."""
    return F.regexp_replace(text_col, "[0-9]", replacement)


def band_value(value_col, width: int) -> F.Column:
    """Generalize a numeric to its band floor (k-anonymity generalization
    step): 2229.54 → 2200 for width=100."""
    return (F.floor(value_col / width) * width).cast("long")


def pseudonymize(
    df: DataFrame,
    key_col: str,
    salt: str,
    name_col: str | None = None,
    band_cols: dict[str, int] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """De-identified projection: salted pseudonym key + digit-redacted
    name + banded numerics + pass-through quasi-identifiers."""
    out = [pseudonym(F.col(key_col), salt).alias("pseudo_id")]
    if name_col:
        out.append(redact_digits(F.col(name_col)).alias(f"{name_col}_redacted"))
    for c, width in (band_cols or {}).items():
        out.append(band_value(F.col(c), width).alias(f"{c}_band"))
    out.extend(F.col(c) for c in (keep_cols or []))
    return df.select(*out)


def scrub_text(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrub for a text corpus: emails → <EMAIL>, 3+-digit runs →
    <NUM>; emits per-doc redaction counts so a pipeline can quarantine
    high-PII documents instead of silently keeping scrubbed husks."""
    lowered = F.lower(F.col(text_col))
    n_emails = F.size(F.regexp_extract_all(lowered, F.lit(EMAIL_RE), 0))
    # count digit runs BEFORE email removal would eat their digits: emails
    # are scrubbed first, then remaining digit runs.
    no_email = F.regexp_replace(lowered, EMAIL_RE, "<EMAIL>")
    n_nums = F.size(F.regexp_extract_all(no_email, F.lit(LONG_NUM_RE), 0))
    scrubbed = F.regexp_replace(no_email, LONG_NUM_RE, "<NUM>")
    return df.select(
        F.col(key_col),
        scrubbed.alias("scrubbed_text"),
        n_emails.alias("n_emails"),
        n_nums.alias("n_numbers"),
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Re-identification risk report: quasi-identifier tuples shared by
    fewer than ``k`` rows (the groups a release would have to suppress or
    generalize further). One hash aggregation; map-side partial combine
    keeps the shuffle at the distinct-tuple count."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < k)
    )
