"""ivf_recall_curve / calibrate_nprobe (r9 verdict #1): the measured
per-corpus path to an IVF serving config.

Pins:
* the curve's full-scan end IS brute force — recall 1.0 by
  construction (the sufficient-statistic argument in the docstring);
* recall is monotone non-decreasing in nprobe (a prefix scan over the
  same candidate ranking can only add candidates);
* on a CLUSTERED corpus the 0.8 floor is met at a strictly smaller
  scan fraction than on an isotropic corpus of the same shape — the
  structure IVF exists to exploit, measured not assumed;
* held-out query selection (largest-xxhash64) stays disjoint from the
  quantizer training sample (smallest-xxhash64) — the r9
  contamination lesson, enforced by construction here.
"""
import numpy as np
import pytest


def _mixture(spark, n=1200, dim=16, k_comp=8, seed=7):
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((k_comp, dim))
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    labels = rng.integers(0, k_comp, n)
    X = means[labels] + (0.5 / np.sqrt(dim)) * rng.standard_normal((n, dim))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _isotropic(spark, n=1200, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_curve_full_scan_is_brute_force_and_monotone(spark):
    from chillastic_spark.operators.similarity import ivf_recall_curve

    curve = ivf_recall_curve(
        _mixture(spark), k=5, n_cells=8, n_queries=12
    )
    assert curve[-1]["nprobe"] == 8 and curve[-1]["scan_frac"] == 1.0
    assert curve[-1]["recall_at_k"] == 1.0
    recalls = [p["recall_at_k"] for p in curve]
    assert recalls == sorted(recalls), "recall must be monotone in nprobe"


def test_clustered_calibrates_below_isotropic(spark):
    from chillastic_spark.operators.similarity import calibrate_nprobe

    clustered = calibrate_nprobe(
        _mixture(spark), target_recall=0.8, k=5, n_cells=8, n_queries=12
    )
    iso = calibrate_nprobe(
        _isotropic(spark), target_recall=0.8, k=5, n_cells=8, n_queries=12
    )
    # structure pays: the mixture meets the floor at a fraction of the
    # isotropic scan (at this tiny scale the isotropic law recall ≈
    # scan_frac is noisy — 2x separation is the robust pin; the
    # committed sf1-scale artifact shows 3.1% vs 50%+, SWEEP_ann_r10)
    assert clustered["met_target"] is True
    assert iso["scan_frac"] >= 2 * clustered["scan_frac"]


def test_calibration_handles_dirty_vectors(spark):
    from chillastic_spark.operators.similarity import calibrate_nprobe

    base = _mixture(spark, n=600, dim=8, k_comp=4)
    dirty = base.unionByName(
        spark.createDataFrame(
            [
                (9001, None),
                (9002, [1.0, None, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0]),
                (9003, [1.0, 2.0]),  # off-width
            ],
            "vec_id long, embedding array<double>",
        )
    )
    clean_cal = calibrate_nprobe(
        base, target_recall=0.8, k=5, n_cells=4, n_queries=8
    )
    dirty_cal = calibrate_nprobe(
        dirty, target_recall=0.8, k=5, n_cells=4, n_queries=8
    )
    # dirty rows can neither train, query, nor serve: no crash, no
    # poisoned pick (a displaced held-out query may shift the curve a
    # hair, so pin the pick to ±1 probe, not bit-equality)
    assert dirty_cal["met_target"] is True
    assert abs(dirty_cal["nprobe"] - clean_cal["nprobe"]) <= 1
    assert dirty_cal["recall_at_k"] >= 0.8
