"""Prefetcher semantics + DetBoxPipeline alignment regressions."""

import time

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.data.pipeline import DetBoxPipeline, PosePipeline, _Prefetcher
from simple_pose_tpu.data.coco import DetBoxRecord, load_coco_keypoints
from simple_pose_tpu.ops import affine as A
from tests.util_synth import make_synth_coco


def test_prefetcher_propagates_worker_exception():
    def make_batch(i):
        if i == 2:
            raise ValueError("boom")
        return i

    it = iter(_Prefetcher(make_batch, 5, num_threads=2, prefetch=2))
    assert next(it) == 0
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetcher_bounded_lookahead():
    produced = []

    def make_batch(i):
        produced.append(i)
        return i

    it = iter(_Prefetcher(make_batch, 20, num_threads=2, prefetch=3))
    first = next(it)
    time.sleep(0.3)  # give workers time to (wrongly) run ahead
    # bounded window: at most prefetch + in-flight-thread batches produced
    assert len(produced) <= 3 + 2 + 1, produced
    assert first == 0
    assert list(it) == list(range(1, 20))
    assert sorted(produced) == list(range(20))


def test_pipeline_missing_image_raises_not_hangs(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_root, ann_path, _ = make_synth_coco(str(root), num_images=4)
    recs = load_coco_keypoints(img_root, ann_path)
    recs[2].img_path = str(root) + "/nope.jpg"
    pipe = PosePipeline(recs, batch_size=2, canvas=192, shuffle=False)
    with pytest.raises(FileNotFoundError):
        list(pipe.epoch(0))


def test_detbox_area_score_alignment_under_sharding(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_root, _, _ = make_synth_coco(str(root), num_images=6)
    # distinct boxes so each record has a unique area
    records = [
        DetBoxRecord(f"{img_root}/{i:012d}.jpg", [10, 10, 10 + 20 + i * 7, 10 + 30 + i * 9], 0.1 * i, i)
        for i in range(1, 7)
    ]

    def expected_area(r):
        x1, y1, x2, y2 = r.box
        _, scale = A.box_to_center_scale(x1, y1, x2 - x1, y2 - y1, 48 / 64)
        return scale[0] * scale[1]

    for pi in range(2):
        pipe = DetBoxPipeline(records, batch_size=2, canvas=192, input_shape=(48, 64),
                              output_shape=(12, 16), process_index=pi, process_count=2)
        for batch in pipe.epoch(0):
            for k in range(2):
                if batch["valid"][k] < 0.5:
                    continue
                rec = records[int(batch["img_id"][k]) - 1]
                np.testing.assert_allclose(batch["area"][k], expected_area(rec), rtol=1e-5)
                np.testing.assert_allclose(batch["score"][k], rec.score, rtol=1e-6)


def test_host_prefetch_order_and_staging():
    """host_prefetch must preserve batch order, stage only device keys, and
    keep exactly `depth` batches in flight."""
    import jax
    import numpy as np

    from simple_pose_tpu.parallel.mesh import host_prefetch

    pulled = []

    def gen():
        for i in range(5):
            pulled.append(i)
            yield {"canvas": np.full((2, 2), i, np.uint8), "img_id": np.array([i])}

    it = host_prefetch(gen(), depth=2)
    first = next(it)
    # depth=2: producing the first output required pulling 2 source batches
    assert pulled == [0, 1]
    assert int(np.asarray(first["canvas"])[0, 0]) == 0
    assert isinstance(first["canvas"], jax.Array)
    assert isinstance(first["img_id"], np.ndarray)  # host key untouched
    rest = list(it)
    assert [int(np.asarray(b["canvas"])[0, 0]) for b in [first] + rest] == list(range(5))
