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
            spark_pdf = fn(spark, sf_dir).toPandas()
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
            duck_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
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
