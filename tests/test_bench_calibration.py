"""Bench calibration prior-artifact selection (pure driver-side logic).

Regression for the r13 closing-artifact crash: ``BENCH*_r*.json`` globs
more names than the ``_rNN.json`` round parse accepts, and an artifact
like ``BENCH_local_r13_final.json`` made the sort key call ``.group()``
on ``None`` — killing every subsequent bench run on the tree, including
the grading driver's.
"""

import os

from bench import calibration_candidates


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("{}")


def test_nonconforming_artifact_names_are_skipped(tmp_path):
    d = str(tmp_path)
    for n in [
        "BENCH_r12.json",
        "BENCH_local_r13.json",
        "BENCH_local_r13_final.json",  # stray: matches glob, not _rNN.json
        "artifacts/BENCH_local_r4.json",
    ]:
        _touch(os.path.join(d, n))
    got = [os.path.basename(p) for p in calibration_candidates(d)]
    assert "BENCH_local_r13_final.json" not in got
    assert got == ["BENCH_local_r4.json", "BENCH_r12.json", "BENCH_local_r13.json"]


def test_round_number_sorts_numerically_not_lexically(tmp_path):
    d = str(tmp_path)
    for n in ["BENCH_local_r2.json", "BENCH_local_r12.json"]:
        _touch(os.path.join(d, n))
    got = [os.path.basename(p) for p in calibration_candidates(d)]
    # r2 < r12 numerically; a lexical sort would reverse them
    assert got == ["BENCH_local_r2.json", "BENCH_local_r12.json"]


def test_empty_dir_yields_no_candidates(tmp_path):
    assert calibration_candidates(str(tmp_path)) == []


def test_warm_section_contamination_gate():
    """r14 quarantine predicate: requeue only on LOCKSTEP anchor
    inflation (>1.5x both anchors) with zero AQE flips; a single hot
    anchor, a plan flip, or a missing prior must not requeue."""
    from bench import warm_section_contaminated

    prior = {"q10": 1.0, "q24": 2.0}
    hot = {"q10_revenue_by_nation": 1.6, "q24_minhash_neardup": 3.3}
    one_hot = {"q10_revenue_by_nation": 0.9, "q24_minhash_neardup": 3.3}
    assert warm_section_contaminated(hot, prior, 0) is True
    assert warm_section_contaminated(one_hot, prior, 0) is False  # not lockstep
    assert warm_section_contaminated(hot, prior, 1) is False      # plan flipped
    assert warm_section_contaminated(hot, {"q10": 1.0}, 0) is False  # no q24 prior
    assert warm_section_contaminated(hot, {}, 0) is False            # no prior
