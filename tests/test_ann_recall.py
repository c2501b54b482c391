"""ANN retrieval-quality gates (round-5 VERDICT item 4): recall@10 vs
exact cosine for every approximate index, floor-gated so quality drift
fails loudly, plus the structural guarantees that hold regardless of data
distribution — full-probe IVF equals exact search, and recall is monotone
in n_probe (probing more cells only ever widens the candidate set).

Floors are calibrated on /root/testdata/sf0.01 (500 near-random synthetic
vectors, dim 64 — a hard, structure-poor case; measured: IVF np4 0.815,
np6 0.955, np8 1.0; IVF-PQ np8/sl120 0.845; LSH 4-plane/8-table 0.66) and
set one comfortable notch below.  bench.py records the same recalls at
the bench scale factor in the ``ann_recall`` artifact field.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def emb_and_exact(spark):
    import eodatadown_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").localCheckpoint()
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).localCheckpoint()
    exact = S.cosine_topk(emb, qs, k=10).localCheckpoint()
    return emb, qs, exact


def test_ivf_recall_floors_and_monotone(spark, emb_and_exact):
    import eodatadown_spark.operators.similarity as S

    emb, qs, exact = emb_and_exact
    recalls = {
        np_: S.topk_recall(
            S.ivf_topk(emb, qs, k=10, n_centroids=8, n_probe=np_), exact
        )
        for np_ in (2, 4, 6, 8)
    }
    # full probe visits every inverted list → MUST equal exact search
    assert recalls[8] == 1.0
    # more probes can only widen the candidate set → monotone
    assert recalls[2] <= recalls[4] <= recalls[6] <= recalls[8]
    # calibrated floors (measured 0.815 / 0.955)
    assert recalls[4] >= 0.75
    assert recalls[6] >= 0.90


def test_ivf_pq_recall_floor(spark, emb_and_exact):
    import eodatadown_spark.operators.similarity as S

    emb, qs, exact = emb_and_exact
    r = S.topk_recall(
        S.ivf_pq_topk(
            emb, qs, k=10, n_centroids=8, n_probe=8, m=8, n_codes=16,
            shortlist=120,
        ),
        exact,
    )
    # full-probe: recall bounded only by the PQ shortlist (measured 0.845)
    assert r >= 0.75


def test_lsh_recall_floor(spark, emb_and_exact):
    import eodatadown_spark.operators.similarity as S

    emb, qs, exact = emb_and_exact
    r = S.topk_recall(
        S.lsh_bucket_topk(
            emb, qs, k=10, n_planes=4, dim=64, n_tables=8
        ),
        exact,
    )
    # 4 planes × 8 tables on structure-poor vectors (measured 0.66)
    assert r >= 0.55


def test_sq8_recall_floor_and_monotone(spark, emb_and_exact):
    """SQ8 gets the same quality treatment as IVF/IVF-PQ/LSH (VERDICT r8
    item 2): recall@10 vs exact cosine is floor-gated, and — structurally —
    a wider shortlist only adds candidates to the exact rerank, so recall
    is monotone in shortlist size; a corpus-sized shortlist makes the
    dequantized scan a pure pre-rank and recall MUST be 1.0 (the rerank is
    exact over all candidates)."""
    import eodatadown_spark.operators.similarity as S

    emb, qs, exact = emb_and_exact
    n = emb.count()
    scalars = S.sq8_train(emb)

    def rec(shortlist):
        return S.topk_recall(
            S.sq8_topk(emb, qs, k=10, shortlist=shortlist, scalars=scalars),
            exact,
        )

    r25, r50, rfull = rec(25), rec(50), rec(n)
    assert rfull == 1.0
    assert r25 <= r50 <= rfull
    # 8-bit dequantized cosine is a tight approximation: a 50-deep
    # shortlist on the structure-poor sf0.01 vectors measures 1.0 /
    # 0.995 at 25 — floors set a notch below
    assert r50 >= 0.90
    assert r25 >= 0.80


def test_sq8_stored_codes_probe_equals_from_scratch(spark, emb_and_exact):
    """The stored-code probe (sq8_build_codes → sq8_topk_against_codes,
    codes scanned + shortlist-only raw fetch) must return EXACTLY the fused
    sq8_topk result: same deterministic encode, same shortlist, same exact
    rerank — the stored-index == from-scratch contract every other index
    family already pins."""
    import eodatadown_spark.operators.similarity as S

    emb, qs, _exact = emb_and_exact
    scalars = S.sq8_train(emb)
    fused = sorted(
        map(tuple, S.sq8_topk(emb, qs, k=10, shortlist=40,
                              scalars=scalars).collect())
    )
    codes = S.sq8_build_codes(emb, scalars)
    stored = sorted(
        map(tuple, S.sq8_topk_against_codes(
            codes, emb, qs, scalars, k=10, shortlist=40
        ).collect())
    )
    assert stored == fused


def test_lsh_multiprobe_recall_lift_and_monotone(spark, emb_and_exact):
    """Multiprobe (lowest-|margin| bit flips, query side only) must lift
    recall substantially over bare bucket match at the same index size,
    and — structurally — probing more buckets only widens the candidate
    set, so recall is monotone in n_probe."""
    import eodatadown_spark.operators.similarity as S

    emb, qs, exact = emb_and_exact

    def rec(n_probe):
        return S.topk_recall(
            S.lsh_bucket_topk(
                emb, qs, k=10, n_planes=4, dim=64, n_tables=8,
                n_probe=n_probe,
            ),
            exact,
        )

    r0, r1, r2 = rec(0), rec(1), rec(2)
    assert r0 <= r1 <= r2
    # measured: 0.66 bare → 0.965 with two probes (calibrated floor below)
    assert r2 >= 0.85
    assert r2 >= r0 + 0.15
