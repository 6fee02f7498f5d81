"""Aggregate multi-seed discrim runs into an error bar (VERDICT r4 #4): the
variant deltas asserted from ONE checkpoint (w8a8/decoder/flip bounds of
+-0.005-0.015) mean nothing without the corpus's own noise floor — how much
float AP moves when only the solver seed (init + data order) changes.

    python scripts/aggregate_discrim_seeds.py DISCRIM_AP.json DISCRIM_AP_s12.json ...
    DISCRIM_SEEDS_OUT=DISCRIM_SEEDS.json python scripts/aggregate_discrim_seeds.py ...

Groups inputs by (model, corpus); for each group reports float/train AP
mean +- sd over seeds, per-variant delta mean +- sd, and the seed spread
(max-min).  Writes DISCRIM_SEEDS.json at the repo root.
"""

import json
import math
import os
import sys


def mean_sd(xs):
    m = sum(xs) / len(xs)
    sd = math.sqrt(sum((x - m) ** 2 for x in xs) / (len(xs) - 1)) if len(xs) > 1 else 0.0
    return round(m, 4), round(sd, 4)


def main(paths):
    groups = {}
    for p in paths:
        with open(p) as f:
            run = json.load(f)
        key = f"{run['model']}|{run.get('corpus', 'color')}"
        groups.setdefault(key, []).append((p, run))

    out = {}
    for key, runs in sorted(groups.items()):
        model, corpus = key.split("|")
        floats = [r["float_ap"] for _, r in runs]
        trains = [r["train_ap"] for _, r in runs]
        fm, fs = mean_sd(floats)
        tm, ts = mean_sd(trains)
        variants = {}
        for name in runs[0][1]["variants"]:
            deltas = [r["variants"][name]["delta_vs_float"]
                      for _, r in runs if name in r["variants"]]
            dm, ds = mean_sd(deltas)
            variants[name] = {"delta_mean": dm, "delta_sd": ds,
                              "n": len(deltas),
                              "deltas": [round(d, 4) for d in deltas]}
        out[key] = {
            "model": model, "corpus": corpus,
            "seeds": [r.get("seed") for _, r in runs],
            "sources": [os.path.basename(p) for p, _ in runs],
            "float_ap_mean": fm, "float_ap_sd": fs,
            "float_ap_spread": round(max(floats) - min(floats), 4),
            "float_aps": [round(x, 4) for x in floats],
            "train_ap_mean": tm, "train_ap_sd": ts,
            "variants": variants,
        }
        print(json.dumps({key: {"float": f"{fm}+-{fs}",
                                "spread": out[key]["float_ap_spread"]}}),
              flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, os.environ.get("DISCRIM_SEEDS_OUT", "DISCRIM_SEEDS.json"))
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": dest, "groups": list(out)}))


if __name__ == "__main__":
    main(sys.argv[1:])
