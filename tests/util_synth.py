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
