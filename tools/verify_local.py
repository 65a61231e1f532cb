"""Local differential verifier — mimics the driver's correctness gate.

Runs every declared query on Spark and its oracle on DuckDB at the given
scale factor, then compares row count, column names and (order-insensitive)
values. Stricter than the driver on floats: exact equality after the
queries' own rounding, with a max-abs-diff report on mismatch.

Usage:
    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openmrs_patient_migration_script_spark.plans import ORACLES, QUERIES
from openmrs_patient_migration_script_spark.schemas import TABLE_NAMES
from openmrs_patient_migration_script_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _type_class(t) -> str:
    """Collapse an Arrow type to the equivalence class the driver's
    value-hash distinguishes. Round-4 lesson: rows/values can agree while
    the hash fails on representation — int32 (Spark ``size()``) vs int64
    (DuckDB ``len()``), TIMESTAMP (Spark ``date_trunc``) vs DATE (DuckDB's),
    and DuckDB HUGEINT (``sum(BIGINT)``, decimal128 in Arrow / float64 in
    pandas) vs Spark long. Timestamp timezone-ness is NOT distinguished
    (Spark's session-tz timestamps hash-match DuckDB naive ones — proven
    by every green timestamp query), nor is string width."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_type_class(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def dtype_problems(spark_df, duck_tbl) -> list[str]:
    """Strict dtype gate: compare the Arrow type class of every shared
    column between the Spark result and the DuckDB result. This is the
    check ``compare()`` is blind to (it int64-normalizes and numerically
    diffs), and exactly the class behind all three r4 driver hash-fails."""
    from pyspark.sql.pandas.types import to_arrow_schema

    s_schema = to_arrow_schema(spark_df.schema)
    d_schema = duck_tbl.schema
    s_types = {f.name: _type_class(f.type) for f in s_schema}
    d_types = {f.name: _type_class(f.type) for f in d_schema}
    out = []
    # r8 hard rule: a decimal OUTPUT column never hash-matches the driver,
    # even when both engines emit decimal128(38,0) with equal values
    # (CORRECTNESS_r06/_r07: the only hash-fails each round were exactly
    # the decimal-output queries). Decimal is for intermediates; outputs
    # must final-cast via functions/numeric.py::dec_to_long.
    for c, tc in sorted(s_types.items()):
        if "decimal" in tc:
            out.append(
                f"decimal OUTPUT col {c}: the driver hash never matches "
                "decimal — cast via dec_to_long (functions/numeric.py)"
            )
    for c in sorted(set(s_types) & set(d_types)):
        if s_types[c] != d_types[c]:
            out.append(f"dtype col {c}: spark={s_types[c]} duck={d_types[c]}")
    return out


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # date/NaT-safe stringification
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "b":
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if len(s) == len(d):
        for c in s.columns:
            sc, dc = s[c], d[c]
            if sc.dtype.kind == "f" or dc.dtype.kind == "f":
                sa = pd.to_numeric(sc, errors="coerce")
                da = pd.to_numeric(dc, errors="coerce")
                diff = (sa - da).abs().max()
                if not ((sa.isna() == da.isna()).all() and (diff == 0 or pd.isna(diff))):
                    problems.append(f"float col {c}: max abs diff {diff}")
                else:
                    # signed zero: Spark's round() goes through Java
                    # BigDecimal (no -0.0) while DuckDB keeps the sign, so
                    # a tiny negative rounding to zero can emit 0.0 vs
                    # -0.0 — numerically equal (blind spot above) but
                    # byte/string-different at a hash layer.
                    import numpy as np

                    # order-free: compare the COUNT of negative zeros on
                    # each side (row pairing among all-column ties is not
                    # guaranteed by the sort)
                    zs = (sa == 0) & sa.notna()
                    zd = (da == 0) & da.notna()
                    neg_s = int(np.signbit(sa[zs].to_numpy(dtype="float64")).sum())
                    neg_d = int(np.signbit(da[zd].to_numpy(dtype="float64")).sum())
                    if neg_s != neg_d:
                        problems.append(
                            f"float col {c}: signed-zero count differs "
                            f"(spark -0.0×{neg_s} vs duck -0.0×{neg_d})"
                        )
            else:
                if not sc.astype(str).equals(dc.astype(str)):
                    n_bad = int((sc.astype(str) != dc.astype(str)).sum())
                    ex = None
                    bad = sc.astype(str) != dc.astype(str)
                    if n_bad:
                        i = bad.idxmax()
                        ex = f"row{i}: spark={sc[i]!r} duck={dc[i]!r}"
                    problems.append(f"col {c}: {n_bad} mismatched ({ex})")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-local")
    con = duck_con(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir)
            spark_pdf = spark_df.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(spark_pdf)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            duck_tbl = con.execute(ORACLES[name]).arrow()
            duck_pdf = duck_tbl.to_pandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = dtype_problems(spark_df, duck_tbl) + compare(
            name, spark_pdf, duck_pdf
        )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} failed, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
