"""Run the complete benchmark matrix and collect one JSON artifact.

    python scripts/bench_all.py            # -> BENCH_ALL.json at the repo root

Sequentially invokes (fresh process each, so programs don't share live
buffers): the driver bench (flagship train), HRNet-W32 train at its optimal
batch, the three eval-path benches, both fused detect->pose families, and
the on-hardware Pallas parity check.  All use the persistent XLA compile
cache, so a re-run after the first is minutes, not hours.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MATRIX = [
    (["python", "bench.py"], {}),
    (["python", "bench.py"], {"BENCH_BATCH": "256", "BENCH_MODEL": "pose_hrnet:w32"}),
    (["python", "bench.py"], {"BENCH_MODEL": "pose_resnet_duc:resnet50"}),
    (["python", "scripts/bench_eval.py"], {}),
    (["python", "scripts/bench_eval.py", "--model-type", "pose_resnet_duc", "--reduction"], {}),
    (["python", "scripts/bench_eval.py", "--model-type", "pose_hrnet", "--model-name", "w32"], {}),
    (["python", "scripts/bench_eval.py", "--model-type", "pose_hrnet", "--model-name", "w32",
      "--batch", "256"], {}),
    (["python", "scripts/bench_eval.py", "--batch", "256"], {}),
    (["python", "scripts/bench_eval.py", "--mesh"], {}),
    (["python", "scripts/bench_eval.py", "--flip-test"], {}),
    (["python", "scripts/bench_fused.py"], {}),
    (["python", "scripts/bench_fused.py", "--detector-family", "yolov4"], {}),
    (["python", "scripts/pallas_parity.py"], {}),
    # HRNet-W48: first-class reference topology (nets/hrnet_w48.yaml)
    (["python", "bench.py"], {"BENCH_BATCH": "128", "BENCH_MODEL": "pose_hrnet:w48"}),
    (["python", "scripts/bench_eval.py", "--model-type", "pose_hrnet",
      "--model-name", "w48"], {}),
]


def _row_key(cmd, env):
    return " ".join(cmd) + "|" + json.dumps(env, sort_keys=True)


def normalize_row(row):
    """Coerce a collected row to the documented {metric, value, unit} schema.

    Historic emitters printed throughput under ``images_per_sec`` with no
    ``value`` key, and pallas_parity.py printed its raw record with no
    ``metric`` at all; every emitter now prints schema-conformant lines, and
    this keeps old artifacts / stray rows consistent (``--normalize``)."""
    row = dict(row)
    if "metric" not in row:
        if "pallas_vs_mxu_max_abs" in row:  # legacy pallas-parity blob
            row = {"metric": "pallas_crop_parity_max_abs_vs_mxu",
                   "value": row["pallas_vs_mxu_max_abs"], "unit": "abs_err",
                   "detail": "PALLAS_PARITY.json",
                   "cmd": row.get("cmd", "python scripts/pallas_parity.py")}
        elif "error" in row:
            row.setdefault("metric", "error")
            row.setdefault("value", None)
            row.setdefault("unit", "")
    if row.get("value") is None and row.get("images_per_sec") is not None:
        row["value"] = row["images_per_sec"]
        row.setdefault("unit", "imgs/s")
    return row


def main():
    if "--normalize" in sys.argv:
        path = os.path.join(ROOT, "BENCH_ALL.json")
        with open(path) as f:
            out = json.load(f)
        out["results"] = [normalize_row(r) for r in out["results"]]
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        nulls = [r["metric"] for r in out["results"] if r.get("value") is None]
        print(json.dumps({"normalized": len(out["results"]), "null_values": nulls}))
        return
    # --filter SUBSTR: run only the matrix entries whose command line
    # contains SUBSTR and MERGE their rows into the existing BENCH_ALL.json
    # (replacing rows from the same entry) -- adding one model's rows
    # shouldn't force re-running (and re-compiling) the whole matrix.
    filt = None
    if "--filter" in sys.argv:
        filt = sys.argv[sys.argv.index("--filter") + 1]
    matrix = [(c, e) for c, e in MATRIX if filt is None or filt in _row_key(c, e)]
    results = []
    t0 = time.time()
    for cmd, env in matrix:
        print("::", " ".join(cmd), env or "", flush=True)
        proc = subprocess.run(cmd, cwd=ROOT, env={**os.environ, **env},
                              capture_output=True, text=True)
        ok = proc.returncode == 0
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        for ln in lines:
            try:
                results.append(normalize_row({**json.loads(ln), "cmd": " ".join(cmd), **env}))
            except json.JSONDecodeError:
                pass
        if not ok:
            results.append({"cmd": " ".join(cmd), **env, "error": proc.stderr[-500:]})
        print(proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "(no output)",
              flush=True)
    path = os.path.join(ROOT, "BENCH_ALL.json")
    if filt is not None and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
        ran = {_row_key(c, e) for c, e in matrix}
        kept = [r for r in out["results"]
                if _row_key(r.get("cmd", "").split(), {
                    k: v for k, v in r.items()
                    if k.startswith("BENCH_")}) not in ran]
        out["results"] = kept + results
        out["wall_s"] = round(out.get("wall_s", 0) + time.time() - t0, 1)
    else:
        out = {"wall_s": round(time.time() - t0, 1), "results": results}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": "BENCH_ALL.json", "entries": len(out["results"]),
                      "wall_s": out["wall_s"]}))


if __name__ == "__main__":
    main()
