"""OKS IoU/NMS vs loop oracle (reference oks_iou_ori pattern)."""

import numpy as np

from simple_pose_tpu.ops.oks import COCO_SIGMAS, oks_iou, oks_nms


def _oracle_oks_iou(g, d, a_g, a_d, in_vis_thre=None):
    """Loop oracle mirroring datasets/naive_data.py:176-196 but with the
    vectorized function's pairwise-average-area convention."""
    sigmas = COCO_SIGMAS
    vars_ = (sigmas * 2) ** 2
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    ious = np.zeros((d.shape[0]))
    for n_d in range(d.shape[0]):
        xd, yd, vd = d[n_d, 0::3], d[n_d, 1::3], d[n_d, 2::3]
        dx = xd - xg
        dy = yd - yg
        e = (dx**2 + dy**2) / vars_ / ((a_g + a_d[n_d]) / 2 + np.spacing(1)) / 2
        if in_vis_thre is not None:
            keep = (vg > in_vis_thre) & (vd > in_vis_thre)
            e = e[keep]
        ious[n_d] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] != 0 else 0.0
    return ious


def test_oks_iou_matches_loop_oracle():
    rng = np.random.default_rng(0)
    kps = rng.random((17, 3))
    kps[:, :2] *= 100
    candi = rng.random((10, 17, 3))
    candi[..., :2] *= 100
    area = rng.random() * 50
    candi_area = rng.random(10) * 50
    got = oks_iou(kps, candi, area, candi_area, in_vis_thresh=0.1)
    ref = _oracle_oks_iou(kps.reshape(-1), candi.reshape(10, -1), area, candi_area, in_vis_thre=0.1)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


def test_oks_iou_no_vis_thresh():
    rng = np.random.default_rng(1)
    kps = rng.random((17, 3)) * 50
    candi = rng.random((5, 17, 3)) * 50
    got = oks_iou(kps, candi, 30.0, np.full(5, 20.0))
    ref = _oracle_oks_iou(kps.reshape(-1), candi.reshape(5, -1), 30.0, np.full(5, 20.0))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_oks_identical_pose_is_one():
    rng = np.random.default_rng(2)
    kps = rng.random((17, 3)) * 100
    kps[:, 2] = 1.0
    iou = oks_iou(kps, kps[None], 50.0, np.array([50.0]))
    np.testing.assert_allclose(iou, [1.0], atol=1e-9)


def test_oks_nms_suppresses_duplicates():
    rng = np.random.default_rng(3)
    base = rng.random((17, 3)) * 100
    base[:, 2] = 1.0
    dup = base.copy()
    dup[:, :2] += 0.01  # nearly identical
    far = base.copy()
    far[:, :2] += 500.0
    kps = np.stack([base, dup, far])
    scores = np.array([0.9, 0.8, 0.7])
    areas = np.full(3, 2500.0)
    keep = oks_nms(kps, scores, areas, thresh=0.9)
    assert keep == [0, 2]


def test_oks_nms_keeps_all_when_distinct():
    rng = np.random.default_rng(4)
    kps = rng.random((4, 17, 3))
    kps[..., :2] = kps[..., :2] * 50 + np.arange(4)[:, None, None] * 1000
    scores = np.array([0.5, 0.9, 0.7, 0.6])
    keep = oks_nms(kps, scores, np.full(4, 100.0), thresh=0.9)
    assert sorted(keep) == [0, 1, 2, 3]
    assert keep[0] == 1  # score order
