"""Generate pycocotools golden fixtures for the numpy COCOeval.

Run this IN ANY ENVIRONMENT THAT HAS pycocotools (it is deliberately a hard
requirement here — the whole point is an external oracle):

    python scripts/gen_cocoeval_fixtures.py

and commit the resulting tests/data/cocoeval_fixtures.json.  The build/test
environment for this repo has no pycocotools and no network, so the fixtures
must be generated elsewhere and carried in; tests/test_cocoeval_fixtures.py
activates automatically once the file exists (and skips, loudly, until
then).

The scenario inputs come from tests/cocoeval_scenarios.py (deterministic,
seeded) and are embedded in the fixture file verbatim, so the consuming test
depends only on the fixture file, never on scenario-builder drift.
"""

import contextlib
import io
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.cocoeval_scenarios import build_scenarios  # noqa: E402

STAT_NAMES = ["AP", "Ap .5", "AP .75", "AP (M)", "AP (L)",
              "AR", "AR .5", "AR .75", "AR (M)", "AR (L)"]


def pycocotools_stats(gt, results):
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    with tempfile.TemporaryDirectory() as td:
        gt_path = os.path.join(td, "gt.json")
        res_path = os.path.join(td, "res.json")
        with open(gt_path, "w") as f:
            json.dump(gt, f)
        with open(res_path, "w") as f:
            json.dump(results, f)
        with contextlib.redirect_stdout(io.StringIO()):
            coco_gt = COCO(gt_path)
            coco_dt = coco_gt.loadRes(res_path)
            ev = COCOeval(coco_gt, coco_dt, "keypoints")
            ev.params.maxDets = [20]
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
    return [float(s) for s in ev.stats]


def main():
    import pycocotools  # noqa: F401  (hard requirement — fail loudly without it)

    out = {"stat_names": STAT_NAMES, "scenarios": {}}
    for name, case in build_scenarios().items():
        stats = pycocotools_stats(case["gt"], case["results"])
        out["scenarios"][name] = {**case, "expected_stats": stats}
        print(f"{name}: AP={stats[0]:.4f} AR={stats[5]:.4f}")
    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "data", "cocoeval_fixtures.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dst)


if __name__ == "__main__":
    main()
