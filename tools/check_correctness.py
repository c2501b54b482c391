"""Local differential harness mimicking the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and the
matching ``oracle_sql()`` in DuckDB, then compares row count, column names,
and an order-insensitive value hash (strict cell equality after dtype
normalization).  Run BEFORE committing query changes:

    python tools/check_correctness.py [sf_dir] [query ...]

``--sampled`` swaps the documents table for a DETERMINISTIC hash-sample
(~12% of docs by a Knuth multiplicative hash of doc_id, plus 50 planted
exact re-uploads under doc_id+10_000_000 so dedup output stays
non-trivial; every other table passes through untouched via symlink).
Both engines read the identical sampled parquet, so the differential
stays exact while the 25M-pair quadratic oracles of the pairwise family
collapse to sf0.01-like volume — this is how the full 145-query sweep
runs at sf0.1 in minutes.
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
            # + 0.0 collapses IEEE signed zero (-0.0 + 0.0 == +0.0): a
            # ~1e-12 value rounds to differently-signed zeros per engine
            out[col] = s.round(9) + 0.0
        else:
            try:
                if s.map(lambda v: hasattr(v, "isoformat")).any():
                    out[col] = s.map(lambda v: v.isoformat() if v is not None else None)
            except Exception:
                pass
    return out.sort_values(by=list(out.columns), ignore_index=True)


def dtype_kinds(df: pd.DataFrame) -> str:
    """Coarse dtype signature: one kind char per (sorted) column — 'i' for
    any integer width, 'f' float, 'b' bool, 'O' everything else (strings,
    dates already stringified by canonical()).  The driver's value hash is
    dtype-sensitive (DuckDB HUGEINT→float64 `99111.0` hashes differently
    from Spark bigint `99111` even though %.9g prints both as `99111`) —
    folding the kind into the local hash makes this harness see exactly
    that class of divergence (the r9 q101/q72 escape)."""
    kinds = []
    for col in df.columns:
        k = df[col].dtype.kind
        kinds.append("i" if k in "iu" else k if k in "fb" else "O")
    return ",".join(kinds)


def value_hash(df: pd.DataFrame) -> str:
    payload = dtype_kinds(df) + "\n" + df.to_csv(index=False, float_format="%.9g")
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


def prepare_sampled_dir(
    sf_dir: str, pct: int = 12, emb_pct: int | None = None
) -> str:
    """Build (once, cached) the deterministic-sample twin of ``sf_dir``:
    documents hash-sampled + planted dups, every other table symlinked.

    ``pct`` is the keep rate in percent (default 12, the sf0.1 calibration).
    The quadratic DuckDB oracles cost O(kept²): at sf1.0's 50k docs the 12%
    sample is 6.3k docs → ~20M oracle pairs (hours); ``--sample-pct=2``
    keeps ~1k (sf0.01-like volume, minutes) while both engines still read
    the identical sf1.0-provenance parquet, so the differential stays
    exact.

    ``emb_pct`` (``--sample-emb-pct=N``) additionally hash-samples the
    EMBEDDINGS table — for the one oracle whose pair volume is bucketed on
    the vector table itself (q35's same-LSH-bucket join: the synthetic
    clusters share hyperplane signs, so a handful of buckets hold
    thousands of vectors at sf1.0 and the DuckDB side goes quadratic).
    The cluster structure survives a uniform vec_id sample (every cluster
    thins by ~emb_pct), so threshold-crossing near-dup pairs remain and
    the differential stays non-trivial.  Default None = full embeddings,
    preserving the at-full-strength evidence of every other embedding
    query."""
    base = os.path.basename(sf_dir.rstrip("/"))
    suffix = "" if pct == 12 else f"_p{pct}"
    if emb_pct is not None:
        suffix += f"_e{emb_pct}"
    out = f"/tmp/spark_graft_sampled_{base}{suffix}"
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    dst = os.path.join(out, "documents.parquet")
    if os.path.exists(dst):
        os.remove(dst)
    # Knuth multiplicative hash — portable integer arithmetic, no reliance
    # on any engine's hash() stability (only the PREP uses it; both engines
    # then read the same parquet).  ~12% keep rate: sf0.1's 5000 docs → ~600.
    duckdb.connect().execute(f"""
        COPY (
            WITH s AS (
                SELECT * FROM read_parquet('{src}')
                WHERE (doc_id * 2654435761) % 4294967296 % 97 < {pct}
            ), planted AS (
                SELECT * REPLACE (doc_id + 10000000 AS doc_id) FROM s
                ORDER BY doc_id LIMIT 50
            )
            SELECT * FROM s
            UNION ALL
            SELECT * FROM planted
        ) TO '{dst}' (FORMAT PARQUET)
    """)
    if emb_pct is not None:
        esrc = os.path.join(sf_dir, "embeddings.parquet")
        edst = os.path.join(out, "embeddings.parquet")
        if os.path.exists(edst):
            os.remove(edst)
        duckdb.connect().execute(f"""
            COPY (
                SELECT * FROM read_parquet('{esrc}')
                WHERE (vec_id * 2654435761) % 4294967296 % 97 < {emb_pct}
            ) TO '{edst}' (FORMAT PARQUET)
        """)
    for t in TABLES:
        if t == "documents":
            continue
        if t == "embeddings" and emb_pct is not None:
            continue
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), link)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out


def main() -> int:
    pct = None  # sentinel: ANY explicit --sample-pct implies sampling
    emb_pct = None
    args = []
    for a in sys.argv[1:]:
        if a == "--sampled":
            continue
        if a.startswith("--sample-pct="):
            pct = int(a.split("=", 1)[1])
            continue
        if a.startswith("--sample-emb-pct="):
            emb_pct = int(a.split("=", 1)[1])
            continue
        args.append(a)
    # an explicit keep-rate implies sampling — a pct that silently did
    # nothing (the old `pct != 12` test treated an explicit =12 as the
    # default) would run the O(n^2) oracles on the full corpus for hours
    sampled = (
        "--sampled" in sys.argv[1:] or pct is not None or emb_pct is not None
    )
    if pct is None:
        pct = 12
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))
    if sampled:
        sf_dir = prepare_sampled_dir(sf_dir, pct, emb_pct)
        print(f"sampled mode: {sf_dir} (pct={pct}, emb_pct={emb_pct})")

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
            # pinned queries leave localCheckpoint blocks behind; across a
            # 184-query session those ratchet block-manager memory up and
            # slow the tail (the bench learned the same lesson —
            # bench.free_pinned); nothing outlives sdf here
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist()
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
                if not diff_cols:  # values print the same → dtype-kind drift
                    diff_cols = [
                        c for c in cs.columns
                        if dtype_kinds(cs[[c]]) != dtype_kinds(co[[c]])
                    ]
                    problems.append(
                        "dtype-kind mismatch in cols "
                        + str([
                            f"{c}: spark={cs[c].dtype} oracle={co[c].dtype}"
                            for c in diff_cols
                        ])
                    )
                else:
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
