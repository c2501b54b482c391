"""Local differential harness mimicking the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and the
matching ``oracle_sql()`` in DuckDB, then compares row count, column names,
and an order-insensitive value hash (strict cell equality after dtype
normalization).  Run BEFORE committing query changes:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = pd.to_datetime(s).astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.round(9)
        else:
            try:
                if s.map(lambda v: hasattr(v, "isoformat")).any():
                    out[col] = s.map(lambda v: v.isoformat() if v is not None else None)
            except Exception:
                pass
    return out.sort_values(by=list(out.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False, float_format="%.9g")
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def first_repo_frame(exc: BaseException) -> str:
    """file:line of the first traceback frame inside this repo — the frame
    that matters when a deep Spark/py4j stack swallows the real call site."""
    import traceback

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fr in traceback.extract_tb(exc.__traceback__):
        if fr.filename.startswith(repo):
            return f" @ {os.path.relpath(fr.filename, repo)}:{fr.lineno}"
    return ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as E
    from eodatadown_spark.session import get_spark

    spark = get_spark("check_correctness", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    failures = []
    attempted = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(
                f"FAIL  {name}: SPARK ERROR {type(exc).__name__}: "
                f"{str(exc)[:300]}{first_repo_frame(exc)}"
            )
            continue
        spark_secs = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(sdf)} (rows-only, no oracle) [{spark_secs:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: ORACLE ERROR {type(exc).__name__}: {str(exc)[:300]}")
            continue

        cs, co = canonical(sdf), canonical(odf)
        problems = []
        if len(cs) != len(co):
            problems.append(f"rowcount spark={len(cs)} oracle={len(co)}")
        if list(cs.columns) != list(co.columns):
            problems.append(f"cols spark={list(cs.columns)} oracle={list(co.columns)}")
        if not problems:
            hs, ho = value_hash(cs), value_hash(co)
            if hs != ho:
                diff_cols = [
                    c for c in cs.columns if not cs[c].astype(str).equals(co[c].astype(str))
                ]
                problems.append(f"value-hash mismatch in cols {diff_cols}")
                for c in diff_cols[:2]:
                    mask = cs[c].astype(str) != co[c].astype(str)
                    print(f"      {c}: spark={cs[c][mask].head(3).tolist()} oracle={co[c][mask].head(3).tolist()}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: rows={len(cs)} hash-match [{spark_secs:.1f}s]")

    print(f"\n{attempted - len(failures)}/{attempted} passing"
          + ("" if attempted == len(queries) else f" (of {len(queries)} registered)"))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
