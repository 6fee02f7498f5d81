"""Synthetic mini-COCO dataset builder shared by pipeline/train/eval tests."""

import json
import os

import numpy as np


def make_synth_coco(root, num_images=8, img_w=160, img_h=128, seed=0, people_per_image=1,
                    paint_markers=False):
    """Writes {root}/imgs/*.jpg and {root}/ann.json; returns (img_root, ann_path, gt dict).

    paint_markers=True draws a distinct solid color patch at each joint so
    the keypoints are visually learnable (the convergence-drive setup);
    False keeps pure noise images (pipeline/plumbing tests).

    people_per_image may be an int (uniform) or a sequence of per-image
    instance counts (len == num_images) to build a SKEWED instance
    distribution (the multihost dedup-equalization test).
    """
    import cv2 as cv

    rng = np.random.default_rng(seed)
    img_root = os.path.join(root, "imgs")
    os.makedirs(img_root, exist_ok=True)
    if np.isscalar(people_per_image):
        people_per_image = [int(people_per_image)] * num_images
    assert len(people_per_image) == num_images, (len(people_per_image), num_images)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        img = rng.integers(0, 255, size=(img_h, img_w, 3), dtype=np.uint8)
        file_name = f"{img_id:012d}.jpg"
        images.append({"id": img_id, "width": img_w, "height": img_h,
                       "coco_url": f"http://x/{file_name}", "file_name": file_name})
        for _ in range(people_per_image[img_id - 1]):
            kp = np.zeros((17, 3), dtype=np.float64)
            cx, cy = rng.uniform(40, img_w - 40), rng.uniform(30, img_h - 30)
            kp[:, 0] = np.clip(rng.normal(cx, 12, 17), 2, img_w - 3)
            kp[:, 1] = np.clip(rng.normal(cy, 16, 17), 2, img_h - 3)
            kp[:, 2] = 2
            if paint_markers:
                for j in range(17):
                    color = tuple(int(v) for v in (
                        (j * 15) % 256, (255 - j * 13) % 256, (j * 29 + 64) % 256))
                    cv.circle(img, (int(kp[j, 0]), int(kp[j, 1])), 3, color, -1)
            x0, y0 = kp[:, 0].min() - 5, kp[:, 1].min() - 5
            x1, y1 = kp[:, 0].max() + 5, kp[:, 1].max() + 5
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kp.reshape(-1).tolist(), "num_keypoints": 17,
                "area": float((x1 - x0) * (y1 - y0)),
                "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                "iscrowd": 0,
            })
            ann_id += 1
        cv.imwrite(os.path.join(img_root, file_name), img)
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}]}
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as wf:
        json.dump(gt, wf)
    return img_root, ann_path, gt


# Canonical skeleton layout for the flip-symmetric corpus, in units of the
# per-person spread ``s`` (x = person's left = image +x for these
# front-facing bodies; y grows downward).  Joint order is COCO: 0 nose, then
# (left, right) interleaved pairs.  Min pairwise distance across the layout
# is ~0.6 s, so blobs (radius ~3 px at s >= 8) never overdraw each other.
_FLIPSYM_LAYOUT = {
    0: (0.0, -2.4),        # nose (unpaired)
    # pair index -> (|x| offset, y): both members share it, signs differ
    1: (0.45, -1.8),       # eyes
    2: (1.05, -2.1),       # ears
    3: (0.95, -1.0),       # shoulders
    4: (1.55, -0.2),       # elbows
    5: (1.75, 0.7),        # wrists
    6: (0.50, 0.45),       # hips
    7: (0.65, 1.45),       # knees
    8: (0.80, 2.4),        # ankles
}
# limb segments (joint-index pairs) drawn in a per-person gray so joints
# group visually by body (appearance is mirror-symmetric: gray, and the
# edge set maps to itself under the L/R joint swap)
_FLIPSYM_LIMBS = [
    (5, 7), (7, 9), (6, 8), (8, 10),     # arms
    (11, 13), (13, 15), (12, 14), (14, 16),  # legs
    (5, 6), (11, 12), (5, 11), (6, 12),  # torso
    (0, 5), (0, 6),                      # neck
]


def make_flipsym_coco(root, num_images=24, img_w=192, img_h=160, seed=100,
                      people_per_image=1, scale_range=(10.0, 16.0),
                      occlude_frac=0.0, blob_sigma=2.5, draw_limbs=True,
                      min_center_sep=2.8):
    """Flip-SYMMETRIC discriminative corpus: joint identity survives
    mirroring, so flip-test eval must be ~neutral-or-better here (the
    positive gate VERDICT r4 #1 asks for), unlike make_discriminative_coco
    where 17 distinct colors encode identity and mirroring is 50% label
    noise on every L/R pair (measured -0.66 AP, DISCRIM_AP.json).

    Construction (mirrors how real COCO resolves left/right):
      * each L/R pair shares ONE color (9-hue palette: nose + 8 pairs), so
        appearance is invariant under horizontal flip;
      * identity within a pair comes from a consistent body layout
        (_FLIPSYM_LAYOUT): the left member always sits at +x from the body
        axis, the right at -x, with positional jitter bounded so the side
        never crosses zero.  A horizontally flipped image + swapped pair
        labels (flip_joints) is therefore another in-distribution sample --
        exactly the property that makes both flip AUGMENTATION and
        flip-TEST (joint_utils.py:102-112 semantics) well-posed;
      * hardness levers kept from make_discriminative_coco: float (sub-
        pixel) GT vs rounded rendering, per-person scale sweep, optional
        occluders, 4:4:4 q98 JPEG.

    ``min_center_sep`` (units of the LARGER person's spread) controls
    crowding: 2.8 keeps bodies disjoint; ~1.3-1.7 makes bboxes overlap (the
    crowded detector-chain corpus, VERDICT r4 #2).

    Returns (img_root, ann_path, gt).
    """
    import cv2 as cv

    # 9 maximally-separated hues: index 0 = nose, 1 + pair_index for pairs
    palette = [
        tuple(int(v) for v in cv.cvtColor(
            np.uint8([[[int(c * 180 / 9), 255, 255]]]), cv.COLOR_HSV2BGR)[0, 0])
        for c in range(9)
    ]
    person_grays = [150.0, 195.0, 120.0, 225.0]  # limb shade cycles per instance
    jpeg_params = [cv.IMWRITE_JPEG_QUALITY, 98,
                   cv.IMWRITE_JPEG_SAMPLING_FACTOR, cv.IMWRITE_JPEG_SAMPLING_FACTOR_444]
    rng = np.random.default_rng(seed)
    img_root = os.path.join(root, "imgs")
    os.makedirs(img_root, exist_ok=True)
    if np.isscalar(people_per_image):
        people_per_image = [int(people_per_image)] * num_images
    assert len(people_per_image) == num_images
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        img = rng.integers(40, 120, size=(img_h, img_w, 3)).astype(np.float32)
        file_name = f"{img_id:012d}.jpg"
        images.append({"id": img_id, "width": img_w, "height": img_h,
                       "coco_url": f"http://x/{file_name}", "file_name": file_name})
        occluders, centers = [], []
        for pi in range(people_per_image[img_id - 1]):
            spread = rng.uniform(*scale_range)
            # body extent: x within +-2.05 s (wrist 1.75 + jitter 0.3),
            # y within +-2.8 s (ankle/nose 2.4 + jitter 0.4)
            for _try in range(40):
                cx = rng.uniform(2.1 * spread, img_w - 2.1 * spread)
                cy = rng.uniform(2.9 * spread, img_h - 2.9 * spread)
                if all((cx - a) ** 2 + (cy - b) ** 2 > (min_center_sep * max(spread, sp)) ** 2
                       for a, b, sp in centers):
                    break
            centers.append((cx, cy, spread))
            kp = np.zeros((17, 3), dtype=np.float64)
            for j in range(17):
                if j == 0:
                    ox, oy = _FLIPSYM_LAYOUT[0]
                else:
                    mag, oy = _FLIPSYM_LAYOUT[1 + (j - 1) // 2]
                    ox = mag if j % 2 == 1 else -mag  # odd = left = +x
                jx = float(np.clip(rng.normal(0.0, 0.12), -0.30, 0.30))
                jy = float(np.clip(rng.normal(0.0, 0.15), -0.40, 0.40))
                if j == 0:
                    jx = float(np.clip(jx, -0.25, 0.25))  # nose stays axial-ish
                kp[j, 0] = np.clip(cx + (ox + jx) * spread, 2.0, img_w - 3.0)
                kp[j, 1] = np.clip(cy + (oy + jy) * spread, 2.0, img_h - 3.0)
            kp[:, 2] = 2
            if draw_limbs:
                g = person_grays[pi % len(person_grays)]
                for a, b in _FLIPSYM_LIMBS:
                    cv.line(img, (int(round(kp[a, 0])), int(round(kp[a, 1]))),
                            (int(round(kp[b, 0])), int(round(kp[b, 1]))),
                            (g, g, g), 2)
            for j in range(17):
                ci = 0 if j == 0 else 1 + (j - 1) // 2
                cv.circle(img, (int(round(kp[j, 0])), int(round(kp[j, 1]))),
                          max(2, int(round(blob_sigma))), palette[ci], -1)
            for j in range(17):
                if rng.uniform() < occlude_frac:
                    occluders.append((kp[j, 0], kp[j, 1], max(2.0, blob_sigma * 2.5)))
            x0, y0 = kp[:, 0].min() - 5, kp[:, 1].min() - 5
            x1, y1 = kp[:, 0].max() + 5, kp[:, 1].max() + 5
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kp.reshape(-1).tolist(), "num_keypoints": 17,
                "area": float((x1 - x0) * (y1 - y0)),
                "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                "iscrowd": 0,
            })
            ann_id += 1
        for (ox, oy, r) in occluders:
            img[int(max(0, oy - r)):int(oy + r) + 1,
                int(max(0, ox - r)):int(ox + r) + 1] = 96.0
        cv.imwrite(os.path.join(img_root, file_name),
                   np.clip(img, 0, 255).astype(np.uint8), jpeg_params)
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}]}
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as wf:
        json.dump(gt, wf)
    return img_root, ann_path, gt


def make_discriminative_coco(root, num_images=24, img_w=192, img_h=160, seed=100,
                             people_per_image=2, scale_range=(6.0, 26.0),
                             occlude_frac=0.15, blob_sigma=1.6, joint_sep=0.0):
    """Harder synthetic corpus for a DISCRIMINATIVE AP benchmark: unlike the
    painted-marker overfit set (AP saturates at 1.0), a trained model lands
    strictly below 1.0 here, so tenths-of-AP parity drift (quant / export /
    sharding / decode variants) becomes measurable.

    Hardness levers vs make_synth_coco:
      * sub-pixel joints: each joint is a colored Gaussian blob rendered at
        its FLOAT position (no int snapping), so decoded coordinates carry
        sub-pixel error that OKS scores continuously;
      * instance scale sweep: per-person joint spread drawn from
        scale_range (small people = few pixels per blob);
      * occlusion: gray rectangles painted over ~occlude_frac of joints
        AFTER rendering (GT stays vis=2, the visual evidence is gone);
      * 2+ overlapping people per image (blob collisions/merges).

    joint_sep > 0 rejection-samples each joint to keep >= joint_sep px from
    the instance's other joints (best-of-40 fallback when the spread is too
    tight to satisfy it).  Without it 17 discs of radius ~blob_sigma overdraw
    each other inside the ~spread-px cluster, most joints have no visual
    evidence, and a trained net predicts the cluster prior instead of the
    markers (chip evidence: held-out mean error ~= spread, AP exactly 0,
    PROBE_DISCRIM_HARDNESS.json).

    Joint colors are 17 maximally-separated hues (full S/V), written as
    4:4:4 quality-98 JPEG: with the make_synth_coco RGB-ramp palette
    (neighboring joints 15-29 RGB steps apart) plus default 4:2:0 chroma
    subsampling, only ~25% of joints in the saved files were identifiable
    by nearest-palette color at the marker center -- joint IDENTITY was
    unrecoverable from local evidence, so memorization was the only
    solution SGD could find (train AP 1.0, held-out AP exactly 0.0 at both
    48 and 256 train images).  The hue palette alone restores 100%
    center-pixel identifiability in a 60-image offline trial.

    Returns (img_root, ann_path, gt).
    """
    import cv2 as cv

    # 17 maximally-separated hues (cv2 hue range is 0-179); painted in BGR
    # below since cv.imwrite takes BGR
    palette = [
        tuple(int(v) for v in cv.cvtColor(
            np.uint8([[[int(j * 180 / 17), 255, 255]]]), cv.COLOR_HSV2BGR)[0, 0])
        for j in range(17)
    ]
    jpeg_params = [cv.IMWRITE_JPEG_QUALITY, 98,
                   cv.IMWRITE_JPEG_SAMPLING_FACTOR, cv.IMWRITE_JPEG_SAMPLING_FACTOR_444]
    rng = np.random.default_rng(seed)
    img_root = os.path.join(root, "imgs")
    os.makedirs(img_root, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        img = rng.integers(40, 120, size=(img_h, img_w, 3)).astype(np.float32)
        centers = []
        file_name = f"{img_id:012d}.jpg"
        images.append({"id": img_id, "width": img_w, "height": img_h,
                       "coco_url": f"http://x/{file_name}", "file_name": file_name})
        occluders = []
        for _ in range(int(people_per_image)):
            spread = rng.uniform(*scale_range)
            for _try in range(20):  # keep instances separated enough to
                cx = rng.uniform(2.2 * spread, img_w - 2.2 * spread)  # be
                cy = rng.uniform(2.2 * spread, img_h - 2.2 * spread)  # learnable
                if all((cx - a) ** 2 + (cy - b) ** 2 > (2.5 * spread) ** 2
                       for a, b in centers):
                    break
            centers.append((cx, cy))
            kp = np.zeros((17, 3), dtype=np.float64)
            if joint_sep > 0:
                pts = []
                for _j in range(17):
                    best, best_d = None, -1.0
                    for _try in range(40):
                        x = float(np.clip(rng.normal(cx, spread), 2.0, img_w - 3.0))
                        y = float(np.clip(rng.normal(cy, spread * 1.25), 2.0, img_h - 3.0))
                        d = min(((x - a) ** 2 + (y - b) ** 2) ** 0.5
                                for a, b in pts) if pts else float("inf")
                        if d >= joint_sep:
                            best = (x, y)
                            break
                        if d > best_d:
                            best_d, best = d, (x, y)
                    pts.append(best)
                kp[:, 0] = [p[0] for p in pts]
                kp[:, 1] = [p[1] for p in pts]
            else:
                kp[:, 0] = np.clip(rng.normal(cx, spread, 17), 2.0, img_w - 3.0)
                kp[:, 1] = np.clip(rng.normal(cy, spread * 1.25, 17), 2.0, img_h - 3.0)
            kp[:, 2] = 2
            # solid color discs painted at the ROUNDED position; the GT keeps
            # the float coordinates, so a perfect marker-detector still
            # carries up to 0.5 px of irreducible sub-pixel error that OKS
            # scores continuously
            for j in range(17):
                cv.circle(img, (int(round(kp[j, 0])), int(round(kp[j, 1]))),
                          max(2, int(round(blob_sigma))), palette[j], -1)
            for j in range(17):
                if rng.uniform() < occlude_frac:
                    r = max(2.0, blob_sigma * 2.5)
                    occluders.append((kp[j, 0], kp[j, 1], r))
            x0, y0 = kp[:, 0].min() - 5, kp[:, 1].min() - 5
            x1, y1 = kp[:, 0].max() + 5, kp[:, 1].max() + 5
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kp.reshape(-1).tolist(), "num_keypoints": 17,
                "area": float((x1 - x0) * (y1 - y0)),
                "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                "iscrowd": 0,
            })
            ann_id += 1
        for (ox, oy, r) in occluders:  # paint after ALL people (can also
            img[int(max(0, oy - r)):int(oy + r) + 1,  # hide a neighbor's joint)
                int(max(0, ox - r)):int(ox + r) + 1] = 96.0
        cv.imwrite(os.path.join(img_root, file_name),
                   np.clip(img, 0, 255).astype(np.uint8), jpeg_params)
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}]}
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as wf:
        json.dump(gt, wf)
    return img_root, ann_path, gt
