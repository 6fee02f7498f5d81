"""Native C++ canvas loader: decode parity with cv2 and pipeline integration."""

import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.data.native import NativeCanvasLoader, native_available
from simple_pose_tpu.data.coco import load_coco_keypoints
from simple_pose_tpu.data.pipeline import PosePipeline
from tests.util_synth import make_synth_coco

pytestmark = pytest.mark.skipif(not native_available(), reason="native loader not built")


def test_decode_parity_with_cv2(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = np.clip(
            cv.resize(rng.uniform(0, 255, (30, 40, 3)).astype(np.float32), (200, 150),
                      interpolation=cv.INTER_CUBIC), 0, 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        cv.imwrite(p, img)
        paths.append(p)
    ldr = NativeCanvasLoader(2)
    out, hs, ws = ldr.load_batch(paths, 256)
    assert out.shape == (4, 256, 256, 3)
    for i, p in enumerate(paths):
        ref = cv.imread(p)[..., ::-1]  # RGB
        assert hs[i] == 150 and ws[i] == 200
        np.testing.assert_array_equal(out[i, :150, :200], ref)
        assert out[i, 150:].max() == 0  # zero padding beyond the image


def test_missing_file_raises(tmp_path):
    ldr = NativeCanvasLoader(2)
    with pytest.raises(FileNotFoundError):
        ldr.load_batch([str(tmp_path / "nope.jpg")], 64)


def test_pipeline_native_matches_python(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_root, ann_path, _ = make_synth_coco(str(root), num_images=6)
    recs = load_coco_keypoints(img_root, ann_path)
    kw = dict(batch_size=3, canvas=192, augment=False, shuffle=False, seed=5)
    nat = list(PosePipeline(recs, use_native=True, **kw).epoch(0))
    py = list(PosePipeline(recs, use_native=False, **kw).epoch(0))
    assert len(nat) == len(py)
    for bn, bp in zip(nat, py):
        np.testing.assert_array_equal(bn["canvas"], bp["canvas"])
        np.testing.assert_array_equal(bn["trans"], bp["trans"])
        np.testing.assert_array_equal(bn["joints"], bp["joints"])
