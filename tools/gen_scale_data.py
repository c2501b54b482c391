"""Generate a larger scale factor from the driver's sf0.1 testdata.

Usage: python tools/gen_scale_data.py [OUT_DIR] [MULTIPLIER]

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md) but no generator, so the
sf1.0 stress runs scale sf0.1 up 10x ourselves:

- TPC-H-shaped tables replicate with key offsets (copy i shifts every key
  column by i*max_key), so join fan-outs and group cardinalities scale the
  way a real TPC-H sf bump does (10x orders/customers/parts/suppliers, same
  rows-per-key distribution);
- events replicate with disjoint user_id/event_id ranges per copy (10x
  users, same per-user session shape — sessionization work scales linearly);
- documents/embeddings are REGENERATED at 10x size with the sf0.1 corpus's
  shape (length distribution, lang/source mix, ~1.5% planted near/exact
  dups) rather than copied: verbatim copies would turn the whole corpus
  into exact-duplicate clusters and quadratically distort the dedup
  benchmarks.

Deterministic (fixed seeds).  Output is parquet, one file per table, same
schemas as the driver's data.  NOT for correctness oracles — the driver's
sf0.01 + DuckDB remains the correctness gate; this data exists to measure
scaling exponents (SCALING.md).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"


def scale_tpch(con, out_dir: str, mult: int) -> None:
    maxes = {}
    for t, k in [
        ("orders", "o_orderkey"), ("customer", "c_custkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
    ]:
        maxes[t] = con.execute(
            f"SELECT max({k}) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
    max_eid = con.execute(f"SELECT max(event_id) FROM '{SRC}/events.parquet'").fetchone()[0]
    max_uid = con.execute(f"SELECT max(user_id) FROM '{SRC}/events.parquet'").fetchone()[0]

    def copies(template: str) -> str:
        return " UNION ALL ".join(template.format(i=i) for i in range(mult))

    plans = {
        "orders": (
            "SELECT o_orderkey + {{i}}*{mo} AS o_orderkey,"
            " o_custkey + {{i}}*{mc} AS o_custkey,"
            " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
            " FROM '{src}/orders.parquet'"
        ).format(mo=maxes["orders"], mc=maxes["customer"], src=SRC),
        "lineitem": (
            "SELECT l_orderkey + {{i}}*{mo} AS l_orderkey,"
            " l_partkey + {{i}}*{mp} AS l_partkey,"
            " l_suppkey + {{i}}*{ms} AS l_suppkey,"
            " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
            " l_returnflag, l_linestatus, l_shipdate"
            " FROM '{src}/lineitem.parquet'"
        ).format(mo=maxes["orders"], mp=maxes["part"], ms=maxes["supplier"], src=SRC),
        "customer": (
            "SELECT c_custkey + {{i}}*{mc} AS c_custkey,"
            " c_name, c_nationkey, c_acctbal, c_mktsegment"
            " FROM '{src}/customer.parquet'"
        ).format(mc=maxes["customer"], src=SRC),
        "part": (
            "SELECT p_partkey + {{i}}*{mp} AS p_partkey,"
            " p_name, p_brand, p_type, p_size, p_retailprice"
            " FROM '{src}/part.parquet'"
        ).format(mp=maxes["part"], src=SRC),
        "supplier": (
            "SELECT s_suppkey + {{i}}*{ms} AS s_suppkey,"
            " s_name, s_nationkey, s_acctbal"
            " FROM '{src}/supplier.parquet'"
        ).format(ms=maxes["supplier"], src=SRC),
        "events": (
            "SELECT event_id + {{i}}*{me} AS event_id, ts,"
            " user_id + {{i}}*{mu} AS user_id, event_type, value, props"
            " FROM '{src}/events.parquet'"
        ).format(me=max_eid, mu=max_uid, src=SRC),
    }
    for table, template in plans.items():
        con.execute(
            f"COPY ({copies(template)}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def gen_documents(
    con, out_dir: str, mult: int, seed: int = 1234, stopword_rate: float = 0.0
) -> None:
    """``stopword_rate`` > 0 mixes English stopwords into roughly that
    fraction of token draws for roughly half the documents (doc-dependent
    rate) — gives rule-based labels (language_guess) signal at scale for
    the classifier-family evidence runs, WITHOUT touching the default
    output other sf1.0 evidence was recorded against (rate 0.0 is
    byte-identical to the original generator)."""
    rows = con.execute(
        f"SELECT lang, source, n_chars FROM '{SRC}/documents.parquet'"
    ).fetchall()
    n_docs = len(rows) * mult
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(10_000)]
    stopwords = ["the", "a", "of", "and", "to", "in", "is", "it"]
    langs = [r[0] for r in rows]
    sources = [r[1] for r in rows]
    lengths = [max(3, r[2] // 6) for r in rows]  # ~chars → words

    out = []
    for i in range(n_docs):
        n_words = lengths[i % len(lengths)]
        rate = stopword_rate if (stopword_rate and i % 2 == 0) else 0.0
        text = " ".join(
            rng.choice(stopwords) if (rate and rng.random() < rate)
            else rng.choice(vocab)
            for _ in range(n_words)
        )
        out.append((i, text, langs[i % len(langs)], sources[i % len(sources)]))
    # planted duplicates: ~1% near-dups (tail edit), ~0.5% exact
    n_near, n_exact = n_docs // 100, n_docs // 200
    for j in range(n_near):
        src_id = rng.randrange(n_docs - n_near - n_exact)
        words = out[src_id][1].split()
        words[-3:] = [rng.choice(vocab) for _ in range(3)]
        did = n_docs + j
        out.append((did, " ".join(words), out[src_id][2], out[src_id][3]))
    for j in range(n_exact):
        src_id = rng.randrange(n_docs - n_near - n_exact)
        did = n_docs + n_near + j
        out.append((did, out[src_id][1], out[src_id][2], out[src_id][3]))

    import pandas as pd

    pdf = pd.DataFrame(out, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    con.register("docs_pdf", pdf)
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, n_chars FROM docs_pdf) "
        f"TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    con.unregister("docs_pdf")


def gen_embeddings(con, out_dir: str, mult: int, seed: int = 5678) -> None:
    meta = con.execute(
        f"SELECT count(*), max(len(embedding)), max(label) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()
    n, dim, n_labels = meta[0] * mult, meta[1], meta[2] + 1
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, size=n)
    centroids = rng.normal(size=(n_labels, dim))
    vecs = centroids[labels] + rng.normal(scale=0.6, size=(n, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)

    import pandas as pd

    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs),
        "label": labels.astype(np.int32),
    })
    con.register("emb_pdf", pdf)
    con.execute(
        f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label FROM emb_pdf) "
        f"TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.unregister("emb_pdf")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1.0"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sw_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    scale_tpch(con, out_dir, mult)
    gen_documents(con, out_dir, mult, stopword_rate=sw_rate)
    gen_embeddings(con, out_dir, mult)
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
