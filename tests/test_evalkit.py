"""Eval workflows end-to-end on the synthetic mini-COCO set."""

import json
import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.evalkit.workflows import (
    PoseEvaluator,
    predicts_by_detections,
    predicts_by_gt,
    rescore_and_filter,
)
from tests.util_synth import make_synth_coco

MODEL_CFG = {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17}


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    return make_synth_coco(str(root), num_images=6)


def test_predicts_by_gt_runs(synth, tmp_path):
    img_root, ann_path, _ = synth
    stats = predicts_by_gt(
        img_root, ann_path, MODEL_CFG, weights=None, batch_size=4,
        input_shape=(64, 64), canvas=192, out_path=str(tmp_path / "gt.json"),
    )
    assert "AP" in stats  # random weights -> AP ~ 0, but pipeline completes
    results = json.load(open(tmp_path / "gt.json"))
    assert len(results) == 6
    assert len(results[0]["keypoints"]) == 51


def test_predicts_by_gt_quant_calib(synth, tmp_path):
    """--quant w8a8 --quant-calib: the workflow calibrates static activation
    scales on the leading batches, persists them, and a rerun loading the
    saved scales reproduces the calibrated predictions."""
    from simple_pose_tpu.models.quant import load_scales

    img_root, ann_path, _ = synth
    scales_path = str(tmp_path / "scales.json")
    stats = predicts_by_gt(
        img_root, ann_path, MODEL_CFG, weights=None, batch_size=4,
        input_shape=(64, 64), canvas=192, out_path=str(tmp_path / "q1.json"),
        quant="w8a8", quant_calib=1, quant_scales_out=scales_path,
    )
    assert "AP" in stats
    scales = load_scales(scales_path)
    assert len(scales) > 15 and all(v > 0 for v in scales.values())

    stats2 = predicts_by_gt(
        img_root, ann_path, MODEL_CFG, weights=None, batch_size=4,
        input_shape=(64, 64), canvas=192, out_path=str(tmp_path / "q2.json"),
        quant="w8a8", quant_scales=scales,
    )
    r1 = json.load(open(tmp_path / "q1.json"))
    r2 = json.load(open(tmp_path / "q2.json"))
    k1 = np.array([r["keypoints"] for r in r1])
    k2 = np.array([r["keypoints"] for r in r2])
    np.testing.assert_allclose(k1, k2, atol=1e-5)
    assert stats2["AP"] == stats["AP"]


def test_predicts_by_detections_and_rescoring(synth, tmp_path):
    img_root, ann_path, gt = synth
    # build a fake detection json from the gt boxes (+ one duplicate)
    dets = []
    for ann in gt["annotations"]:
        x, y, w, h = ann["bbox"]
        dets.append({"image_id": ann["image_id"], "category_id": 1,
                     "bbox": [x, y, w, h], "score": 0.95})
    dets.append(dict(dets[0], score=0.5))  # duplicate for NMS to chew on
    det_path = tmp_path / "dets.json"
    det_path.write_text(json.dumps(dets))
    stats = predicts_by_detections(
        img_root, str(det_path), ann_path, MODEL_CFG, weights=None, batch_size=4,
        input_shape=(64, 64), canvas=192,
        out_path=str(tmp_path / "pred.json"),
    )
    assert "AP" in stats
    preds = json.load(open(tmp_path / "pred.json"))
    assert len(preds) == 7
    assert {"kps", "area", "score", "img_id"} <= set(preds[0])


def test_rescore_and_filter_semantics(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.uniform(10, 100, size=(17, 3))
    base[:, 2] = 0.9
    dup = base.copy()
    dup[:, :2] += 0.05
    far = base.copy()
    far[:, :2] += 3000
    preds = [
        {"kps": base.reshape(-1).tolist(), "area": 900.0, "score": 0.9, "img_id": 1},
        {"kps": dup.reshape(-1).tolist(), "area": 900.0, "score": 0.8, "img_id": 1},
        {"kps": far.reshape(-1).tolist(), "area": 900.0, "score": 0.7, "img_id": 1},
    ]
    gt = {"images": [{"id": 1, "width": 640, "height": 480}],
          "annotations": [], "categories": [{"id": 1, "name": "person"}]}
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))
    out_path = tmp_path / "filtered.json"
    rescore_and_filter(preds, str(gt_path), out_path=str(out_path))
    filtered = json.load(open(out_path))
    # duplicate suppressed, distinct kept
    assert len(filtered) == 2
    # rescoring: box_score * mean(conf > 0.2) = 0.9 * 0.9
    assert abs(filtered[0]["score"] - 0.9 * 0.9) < 1e-6


def test_flip_test_evaluator_consistency(synth):
    """Flip-test on a left-right symmetric input must produce (nearly) the
    same peak locations as no-flip; mainly checks the channel permutation
    and 1px shift wiring doesn't crash or scramble joints."""
    img_root, ann_path, _ = synth
    from simple_pose_tpu.data.coco import load_coco_keypoints
    from simple_pose_tpu.data.pipeline import PosePipeline

    recs = load_coco_keypoints(img_root, ann_path)
    pipe = PosePipeline(recs, 4, input_shape=(64, 64), output_shape=(16, 16),
                        canvas=192, augment=False, shuffle=False, drop_last=False)
    batch = next(iter(pipe.epoch(0)))
    ev0 = PoseEvaluator(MODEL_CFG, None, (64, 64), flip_test=False)
    ev1 = PoseEvaluator(MODEL_CFG, None, (64, 64), flip_test=True)
    # share weights so outputs are comparable
    ev1.variables = ev0.variables
    out0 = ev0(batch)
    out1 = ev1(batch)
    assert np.asarray(out1["kps"]).shape == np.asarray(out0["kps"]).shape
    assert np.all(np.isfinite(np.asarray(out1["kps"])))


def test_reproduce_runbook_commands(synth, tmp_path, monkeypatch):
    """The exact CLI command paths from scripts/reproduce.md run end to end
    on the synthetic set (so the AP-parity recipes can't rot)."""
    import sys

    import eval as eval_cli

    img_root, ann_path, gt = synth

    # row 1-5 shape: `python eval.py gt ...` (the quickest parity probe)
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "gt", "--img-root", img_root, "--ann", ann_path,
        "--model-type", "pose_resnet_dconv", "--model-name", "resnet18",
        "--batch-size", "4", "--out", str(tmp_path / "gt_cli.json"),
    ])
    eval_cli.main()
    assert len(json.load(open(tmp_path / "gt_cli.json"))) == 6

    # `python eval.py detections --dets ...` (BASELINE rows 1-5)
    dets = [{"image_id": a["image_id"], "category_id": 1, "bbox": a["bbox"], "score": 0.9}
            for a in gt["annotations"]]
    det_path = tmp_path / "dets_cli.json"
    det_path.write_text(json.dumps(dets))
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "detections", "--img-root", img_root, "--ann", ann_path,
        "--dets", str(det_path), "--model-type", "pose_resnet_dconv",
        "--model-name", "resnet18", "--batch-size", "4",
        "--out", str(tmp_path / "pred_cli.json"),
    ])
    eval_cli.main()

    # `python eval.py rescore --preds ...` (the temp_read_in_and_filter chain)
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "rescore", "--preds", str(tmp_path / "pred_cli.json"),
        "--ann", ann_path,
    ])
    eval_cli.main()

    # `python eval.py gen-dets ...` (row 6, first half) with a tiny detector
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "gen-dets", "--img-root", img_root, "--ann", ann_path,
        "--scale-name", "s", "--canvas", "256", "--batch-size", "2",
        "--debug", "2", "--out", str(tmp_path / "gen_cli.json"),
    ])
    eval_cli.main()
    assert (tmp_path / "gen_cli.json").exists()


def test_amp_evaluator_matches_f32(synth):
    """bf16 compute (amp=True) must reproduce the f32 evaluator's decoded
    peaks to sub-pixel tolerance: params are f32 either way (flax compute
    dtype only), and decode upcasts heatmaps to f32 first."""
    img_root, ann_path, _ = synth
    from simple_pose_tpu.data.coco import load_coco_keypoints
    from simple_pose_tpu.data.pipeline import PosePipeline

    recs = load_coco_keypoints(img_root, ann_path)
    pipe = PosePipeline(recs, 4, input_shape=(64, 64), output_shape=(16, 16),
                        canvas=192, augment=False, shuffle=False, drop_last=False)
    batch = next(iter(pipe.epoch(0)))
    ev32 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=False)
    ev16 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=True)
    ev16.variables = ev32.variables  # identical f32 params
    out32 = ev32(batch)
    out16 = ev16(batch)
    kps32, kps16 = np.asarray(out32["kps"]), np.asarray(out16["kps"])
    # decoded coordinates are in source-canvas pixels (canvas=192): random
    # weights give near-flat heatmaps (worst case for argmax stability), so
    # allow a couple of pixels on stragglers but require overall agreement
    assert np.median(np.abs(kps32 - kps16)) < 1.0
    assert np.mean(np.abs(np.asarray(out32["conf"]) - np.asarray(out16["conf"]))) < 1e-2


def test_dark_original_decoder_selectable(synth):
    """decoder='dark_original' (the reference's DarkPoseOriginal loop
    decoder, pose_metrics.py:110-169) is a selectable evaluator decoder and
    agrees with the batched gauss_taylor path to sub-pixel tolerance."""
    from simple_pose_tpu.data.coco import load_coco_keypoints
    from simple_pose_tpu.data.pipeline import PosePipeline

    img_root, ann_path, _ = synth
    recs = load_coco_keypoints(img_root, ann_path)
    pipe = PosePipeline(recs, 4, input_shape=(64, 64), output_shape=(16, 16),
                        canvas=192, augment=False, shuffle=False, drop_last=False)
    ev_dark = PoseEvaluator(MODEL_CFG, None, (64, 64), decoder="dark_original", amp=None)
    ev_gt = PoseEvaluator(MODEL_CFG, None, (64, 64), decoder="gauss_taylor", amp=None)
    # same init seed -> same random weights
    batch = next(iter(pipe.epoch(0)))
    out_d = ev_dark(batch)
    out_g = ev_gt(batch)
    assert out_d["kps"].shape == out_g["kps"].shape
    np.testing.assert_allclose(out_d["conf"], np.asarray(out_g["conf"]), atol=1e-5)
    # random-weight heatmaps are noise, so the two decoders' Newton steps
    # can disagree on a few joints; the bulk must still coincide (argmax is
    # shared, refinement is sub-pixel)
    diff = np.abs(out_d["kps"] - np.asarray(out_g["kps"]))
    assert np.median(diff) < 0.5
    assert np.isfinite(out_d["kps"]).all()
    np.testing.assert_allclose(
        out_d["scores"],
        out_d["conf"][..., 0].mean(-1) + out_d["conf"][..., 0].max(-1), rtol=1e-6)


def test_load_model_variables_from_solver_checkpoint(tmp_path):
    """The evaluator must load real PoseSolver checkpoints, which carry
    opt_state/step/epoch/val_ap alongside the EMA trees (a partial restore
    template is a hard orbax error), and must eval with the EMA params."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from simple_pose_tpu.evalkit.workflows import load_model_variables

    cfg = {"type": "pose_resnet_dconv", "name": "resnet18",
           "num_joints": 17, "reduction": True}
    _, v = load_model_variables(cfg, None, (64, 64))
    ckpt = {
        "params": v["params"],
        "batch_stats": v["batch_stats"],
        "ema_params": jax.tree.map(lambda a: a + 1.0, v["params"]),
        "ema_batch_stats": v["batch_stats"],
        "opt_state": {"count": jnp.zeros(())},
        "step": jnp.zeros(()),
        "epoch": 3,
        "val_ap": 0.5,
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(tmp_path / "ck"), ckpt, force=True)
    _, loaded = load_model_variables(cfg, str(tmp_path / "ck"), (64, 64))
    a = jax.tree.leaves(v["params"])[0]
    b = jax.tree.leaves(loaded["params"])[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 1.0)


def test_export_cli_roundtrip(tmp_path, monkeypatch):
    """`python eval.py export` writes a loadable serving artifact (the
    docs/SERVING.md entry command), including the --quant variant."""
    import sys

    import numpy as np

    import eval as eval_cli
    from simple_pose_tpu.evalkit.export import serving_fn

    out = tmp_path / "pose.stablehlo"
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "export", "--model-name", "resnet18", "--reduction",
        "--batch-size", "2", "--canvas", "96", "--input-w", "64",
        "--input-h", "64", "--quant", "w8a8", "--no-amp",
        "--out", str(out),
    ])
    eval_cli.main()
    assert out.stat().st_size > 1_000_000
    sidecar = json.load(open(str(out) + ".json"))
    assert sidecar["quant"] == "w8a8" and sidecar["canvas"] == 96

    call = serving_fn(str(out))
    rng = np.random.default_rng(0)
    res = call(rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8),
               np.tile(np.array([[2 / 3, 0, 2], [0, 2 / 3, 2]], np.float32), (2, 1, 1)),
               np.tile(np.array([[6.0, 0, 0], [0, 6.0, 0]], np.float32), (2, 1, 1)))
    assert res["kps"].shape == (2, 17, 2)
    assert np.isfinite(np.asarray(res["kps"])).all()


def test_gen_detections_quant_calib(synth, tmp_path):
    """gen_detections with a w8a8 detector + quant_calib: calibrates static
    detector scales on the leading batch (replayed through the rebuilt
    programs), persists them, and still writes a usable detection json."""
    from simple_pose_tpu.detector.wrapper import YOLOv5Detector
    from simple_pose_tpu.evalkit.workflows import gen_detections
    from simple_pose_tpu.models.quant import load_scales

    img_root, ann_path, _ = synth
    det = YOLOv5Detector(weights_path=None, scale_name="s", scale_size=(128, 128),
                         conf_thresh=0.01, canvas=192, quant="w8a8")
    scales_path = str(tmp_path / "det_scales.json")
    out_path = str(tmp_path / "dets.json")
    results = gen_detections(img_root, ann_path, detector=det, out_path=out_path,
                             batch_size=4, canvas=192,
                             quant_calib=1, quant_scales_out=scales_path)
    assert det.quant_scales is not None
    scales = load_scales(scales_path)
    assert len(scales) > 20 and all(v > 0 for v in scales.values())
    dumped = json.load(open(out_path))
    assert dumped == results
    for r in results:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}


def test_serve_artifact_example(tmp_path, monkeypatch):
    """examples/serve_artifact.py: export via the CLI, then the serving
    example predicts from the artifact + sidecar alone (docs/SERVING.md
    consumer path) and its keypoints match the live evaluator's."""
    import subprocess
    import sys

    import eval as eval_cli

    out = tmp_path / "pose.stablehlo"
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "export", "--model-name", "resnet18", "--reduction",
        "--batch-size", "2", "--canvas", "96", "--input-w", "64",
        "--input-h", "64", "--no-amp", "--out", str(out),
    ])
    eval_cli.main()

    rng = np.random.default_rng(3)
    img_path = str(tmp_path / "person.png")  # lossless: subprocess and in-process must see identical pixels
    img = rng.integers(0, 255, (80, 90, 3), dtype=np.uint8)
    cv.imwrite(img_path, img)
    overlay = str(tmp_path / "overlay.jpg")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "serve_artifact.py"),
         "--artifact", str(out), "--image", img_path,
         "--box", "10,10,60,75", "--out", overlay],
        capture_output=True, text=True, env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr
    served = json.loads(r.stdout)
    assert len(served["people"]) == 1
    kp = np.array(served["people"][0]["keypoints"]).reshape(17, 3)
    assert np.isfinite(kp).all() and os.path.exists(overlay)

    # parity with the artifact called in-process on the same box geometry
    # (same exported program -> only the example's 2-decimal rounding apart;
    # random-weight heatmaps are near-flat, so a live-evaluator comparison
    # would be chaotic under the baked-constant folding drift)
    from examples.serve_artifact import boxes_to_batch, load_contract
    from simple_pose_tpu.evalkit.export import serving_fn

    contract = load_contract(str(out))
    canvas, trans, trans_inv = boxes_to_batch(img[..., ::-1],
                                              [(10, 10, 60, 75)], contract)
    direct = serving_fn(str(out))(canvas, trans, trans_inv)
    np.testing.assert_allclose(kp[:, :2], np.asarray(direct["kps"])[0], atol=0.01)
    np.testing.assert_allclose(kp[:, 2:], np.asarray(direct["conf"])[0], atol=0.01)


def test_serve_artifact_symbolic_batch(tmp_path, monkeypatch):
    """A batch-polymorphic artifact (--batch-size b) round-trips through the
    CLI sidecar ('batch' stays the symbolic name, a str) and the serving
    example sizes the batch from the request instead."""
    import subprocess
    import sys

    import eval as eval_cli

    out = tmp_path / "pose_poly.stablehlo"
    monkeypatch.setattr(sys, "argv", [
        "eval.py", "export", "--model-name", "resnet18", "--reduction",
        "--batch-size", "b", "--canvas", "96", "--input-w", "64",
        "--input-h", "64", "--no-amp", "--out", str(out),
    ])
    eval_cli.main()

    contract = json.load(open(str(out) + ".json"))
    assert contract["batch"] == "b"  # symbolic name survives as a string

    rng = np.random.default_rng(7)
    img_path = str(tmp_path / "person.png")
    cv.imwrite(img_path, rng.integers(0, 255, (80, 90, 3), dtype=np.uint8))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "serve_artifact.py"),
         "--artifact", str(out), "--image", img_path,
         "--box", "10,10,60,75", "--box", "5,5,40,70", "--box", "20,8,85,78"],
        capture_output=True, text=True, env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr
    served = json.loads(r.stdout)
    assert len(served["people"]) == 3
    for person in served["people"]:
        kp = np.array(person["keypoints"]).reshape(17, 3)
        assert np.isfinite(kp).all()


def test_export_cli_rejects_batch_zero(tmp_path, monkeypatch):
    """--batch-size 0 (or negative) must error out, not export a degenerate
    batch-0 program (isdigit() used to accept '0')."""
    import sys

    import eval as eval_cli

    for bad in ("0", "-4"):
        monkeypatch.setattr(sys, "argv", [
            "eval.py", "export", "--model-name", "resnet18",
            "--batch-size", bad, "--canvas", "96", "--input-w", "64",
            "--input-h", "64", "--no-amp",
            "--out", str(tmp_path / "x.stablehlo"),
        ])
        with pytest.raises(SystemExit):
            eval_cli.main()
        assert not os.path.exists(str(tmp_path / "x.stablehlo"))
