"""End-user demo scripts run end-to-end (subprocess, synthetic inputs)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _demo_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return env


def test_demo_video_writes_overlay_video(tmp_path):
    """demo_video: synthetic mp4 -> fused detect->pose -> overlay mp4 with
    the same frame count (the serving-style consumer of evalkit/fused.py)."""
    import cv2 as cv

    src = str(tmp_path / "in.mp4")
    wr = cv.VideoWriter(src, cv.VideoWriter_fourcc(*"mp4v"), 10, (96, 96))
    assert wr.isOpened(), "cv2 VideoWriter unavailable"
    for i in range(3):
        f = np.full((96, 96, 3), 30, np.uint8)
        cv.circle(f, (48, 30 + 5 * i), 10, (0, 0, 200), -1)
        cv.rectangle(f, (38, 40), (58, 80), (0, 150, 0), -1)
        wr.write(f)
    wr.release()

    out = str(tmp_path / "out.mp4")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "demo_video.py"),
         "--video", src, "--model-name", "resnet18", "--scale-name", "s",
         "--det-size", "128", "--batch", "2", "--max-people", "4",
         "--det-conf", "0.0001", "--out", out],
        env=_demo_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    cap = cv.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3, f"expected 3 frames, got {n}"
