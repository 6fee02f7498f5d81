"""Pin the numpy COCOeval against externally generated pycocotools goldens.

The fixture file tests/data/cocoeval_fixtures.json is produced by
scripts/gen_cocoeval_fixtures.py in an environment that has pycocotools
(this one doesn't — no package, no network) and carried in as data.  Until
it is generated, these tests SKIP with an explanatory message rather than
silently passing; once present they assert the from-scratch evaluator
(metrics/cocoeval.py) matches the canonical implementation to 1e-9 on the
greedy-matching corners (crowd absorption, ignore areas, zero-visible gts,
duplicate detections, randomized mixtures).

Reference parity target: /root/reference/metrics/pose_metrics.py:182-209
(evaluate_map -> pycocotools COCOeval).
"""

import json
import os

import pytest

from simple_pose_tpu.metrics.cocoeval import STAT_NAMES, CocoKeypointsGT, KeypointEval

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "cocoeval_fixtures.json")


def _load():
    if not os.path.exists(FIXTURE):
        pytest.skip(
            "cocoeval_fixtures.json absent: run scripts/gen_cocoeval_fixtures.py "
            "in a pycocotools environment and commit tests/data/"
            "cocoeval_fixtures.json (environment-blocked here: no pycocotools, "
            "no network)")
    with open(FIXTURE) as rf:
        return json.load(rf)


def test_fixture_schema():
    fx = _load()
    assert fx["stat_names"] == STAT_NAMES
    assert len(fx["scenarios"]) >= 7
    for case in fx["scenarios"].values():
        assert len(case["expected_stats"]) == 10


def test_scenarios_match_first_principles_evaluator():
    """The fixture scenarios agree with the in-repo brute-force protocol
    re-derivation TODAY (no fixture file needed) — so when pycocotools
    goldens arrive, any mismatch localizes to protocol drift, not scenario
    construction."""
    from tests.cocoeval_scenarios import build_scenarios
    from tests.test_cocoeval import _bf_eval

    for name, case in build_scenarios().items():
        ev = KeypointEval(CocoKeypointsGT(case["gt"]), case["results"])
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        bf = _bf_eval(case["gt"], case["results"])
        for sn, got in (("AP", bf["all"]["ap"]), ("AR", bf["all"]["ar"]),
                        ("AP (M)", bf["medium"]["ap"]), ("AP (L)", bf["large"]["ap"]),
                        ("AR (M)", bf["medium"]["ar"]), ("AR (L)", bf["large"]["ar"]),
                        ("Ap .5", bf["all"]["ap_t"][0]), ("AP .75", bf["all"]["ap_t"][5])):
            assert stats[sn] == pytest.approx(got, abs=1e-9), (name, sn)


def test_numpy_cocoeval_matches_pycocotools_goldens():
    fx = _load()
    for name, case in fx["scenarios"].items():
        ev = KeypointEval(CocoKeypointsGT(case["gt"]), case["results"])
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        for sn, expected in zip(STAT_NAMES, case["expected_stats"]):
            assert stats[sn] == pytest.approx(expected, abs=1e-9), (
                f"{name}: {sn} = {stats[sn]} vs pycocotools {expected}")
