"""Large randomized cross-validation of the numpy COCO keypoint evaluator.

pycocotools is absent in this environment (the external golden fixtures of
scripts/gen_cocoeval_fixtures.py remain the portable pin), so the strongest
available independence check is two in-repo implementations written from the
published protocol with different structures: `metrics/cocoeval.py`
(vectorized, the product evaluator) vs tests/test_cocoeval.py's `_bf_eval`
(plain loops/sets, first principles).  This sweep runs them against each
other on N randomized datasets (crowd / zero-kp / partial-visibility gts,
area-range boundaries, score ties, >maxDets floods) and requires every one
of the 10 stats to agree to 1e-9.

    python scripts/fuzz_cocoeval.py [--cases 500] [--ties 0.3]

Writes COCOEVAL_FUZZ.json {cases, mismatches, max_abs_diff}.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=500)
    ap.add_argument("--ties", type=float, default=0.3,
                    help="fraction of cases whose scores are quantized to force ties")
    ap.add_argument("--out", default="COCOEVAL_FUZZ.json")
    args = ap.parse_args()

    from test_cocoeval import _bf_eval, _random_case, _run

    pairs = [("AP", ("all", "ap")), ("Ap .5", ("all", "ap_t", 0)),
             ("AP .75", ("all", "ap_t", 5)), ("AP (M)", ("medium", "ap")),
             ("AP (L)", ("large", "ap")), ("AR", ("all", "ar")),
             ("AR .5", ("all", "ar_t", 0)), ("AR .75", ("all", "ar_t", 5)),
             ("AR (M)", ("medium", "ar")), ("AR (L)", ("large", "ar"))]

    rng = np.random.default_rng(12345)
    max_diff, mismatches, ran = 0.0, [], 0
    for seed in range(args.cases):
        gt, results = _random_case(seed)
        if not results:
            continue
        if rng.random() < args.ties:
            q = float(rng.choice([3.0, 5.0, 10.0]))
            for r in results:
                r["score"] = round(r["score"] * q) / q
        ran += 1
        stats = _run(gt, results)
        bf = _bf_eval(gt, results)
        for name, path in pairs:
            v = bf[path[0]][path[1]]
            if len(path) == 3:
                v = v[path[2]]
            d = abs(stats[name] - v)
            max_diff = max(max_diff, d)
            if d > 1e-9:
                mismatches.append({"seed": seed, "stat": name,
                                   "eval": stats[name], "bf": float(v)})
        if seed % 100 == 99:
            print(f"{seed + 1}/{args.cases} cases, max_abs_diff={max_diff:.2e}",
                  flush=True)

    result = {"cases": ran, "stats_per_case": len(pairs),
              "mismatches": mismatches, "max_abs_diff": max_diff}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"cases": ran, "mismatch_count": len(mismatches),
                      "max_abs_diff": max_diff}))
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
