"""Pin bench.py's sandbox-noise normalization math (pure functions,
no Spark): per-round calibration from interleaved probes, the >tol
noise flag, quiet-round medians with the all-noisy fallback, and the
fastest-window normalization. These numbers go into BENCH_r{N}.json
and drive the cross-round performance comparison, so the arithmetic
is pinned exactly."""
import statistics

import bench


def test_round_calibrations_are_bounding_probe_means():
    # 3 rounds → 4 probes; round i = mean(p[i], p[i+1])
    assert bench.round_calibrations([0.6, 0.8, 0.6, 1.0]) == [
        0.7,
        0.7,
        0.8,
    ]
    assert bench.round_calibrations([0.5]) == [0.5]
    assert bench.round_calibrations([]) == []


def test_flag_noisy_threshold_is_strict_and_relative_to_min():
    calibs = [0.60, 0.72, 0.73, 1.2]
    # min probe 0.6, tol 20% → cutoff 0.72 exclusive
    assert bench.flag_noisy(calibs, 0.6, 0.20) == [
        False,
        False,
        True,
        True,
    ]


def test_normalize_scales_by_fastest_window():
    rounds = [{"q": 2.0}, {"q": 4.0}]
    # round 1 ran on a 2x-loaded machine (probe 1.2 vs min 0.6):
    # its sample halves; the quiet round passes through
    out = bench.normalize_rounds(rounds, [0.6, 1.2], 0.6)
    assert out[0]["q"] == 2.0
    assert out[1]["q"] == 2.0
    # zero/garbage calibration never divides
    out = bench.normalize_rounds([{"q": 3.0}], [0.0], 0.6)
    assert out[0]["q"] == 3.0


def test_quiet_medians_use_only_quiet_rounds():
    rounds = [{"q": 1.0, "p": 5.0}, {"q": 9.0, "p": 9.0}, {"q": 2.0, "p": 6.0}]
    med, all_noisy = bench.quiet_medians(rounds, [False, True, False])
    assert not all_noisy
    assert med["q"] == statistics.median([1.0, 2.0])
    assert med["p"] == statistics.median([5.0, 6.0])


def test_quiet_medians_fall_back_to_all_rounds_when_all_noisy():
    rounds = [{"q": 1.0}, {"q": 3.0}, {"q": 2.0}]
    med, all_noisy = bench.quiet_medians(rounds, [True, True, True])
    assert all_noisy
    assert med["q"] == 2.0


def test_end_to_end_noise_recovery():
    """A loud middle round must not move the quiet-median, and the
    normalized figure must agree with the quiet raw figure when the
    noise is purely multiplicative (the calibration model)."""
    quiet_truth = {"q1": 2.0, "q2": 6.0}
    # one loud probe in the middle: rounds 1 and 2 each see ambient
    # speed (0.6+1.2)/2 = 0.9 → multiplicative slowdown 1.5
    probes = [0.6, 0.6, 1.2, 0.6, 0.6]
    rounds = [
        dict(quiet_truth),
        {n: t * 1.5 for n, t in quiet_truth.items()},
        {n: t * 1.5 for n, t in quiet_truth.items()},
        dict(quiet_truth),
    ]
    rc = bench.round_calibrations(probes)
    noisy = bench.flag_noisy(rc, min(probes), 0.20)
    assert noisy == [False, True, True, False]
    med, all_noisy = bench.quiet_medians(rounds, noisy)
    assert not all_noisy and med == quiet_truth
    norm = bench.normalize_rounds(rounds, rc, min(probes))
    for n, t in quiet_truth.items():
        for r in norm:
            assert abs(r[n] - t) < 1e-9
