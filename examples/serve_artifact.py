"""Serve poses from an AOT-exported artifact -- no model code, no checkpoint.

    python eval.py export --model-name resnet50 --weights pose.pth \
        --out pose_eval.stablehlo                       # once, anywhere
    python examples/serve_artifact.py --artifact pose_eval.stablehlo \
        --image person.jpg --box x1,y1,x2,y2 [--box ...] [--out out.jpg]

This is the consumer side of docs/SERVING.md: the server loads the
StableHLO artifact (jax + the file are the only requirements; the model
zoo, converter, and config system are not imported) and owns just the
preprocessing the reference also kept on host -- image decode and box ->
affine geometry (ops/affine.py, ~the same 15 lines the reference runs in
its dataloader, naive_data.py:33-56).  The artifact's metadata sidecar
(written by ``eval.py export``) supplies the static batch size, canvas and
crop shapes, so the caller doesn't have to remember the export contract.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_contract(artifact_path):
    """Read the input-contract sidecar ``eval.py export`` writes."""
    with open(artifact_path + ".json") as rf:
        return json.load(rf)


def boxes_to_batch(img_rgb, boxes, contract):
    """Host preprocessing: paste the image on the static canvas and turn
    each box into the crop/inverse affine pair the artifact expects."""
    from simple_pose_tpu.ops import affine as A

    b = contract["batch"]
    if not isinstance(b, int):  # batch-polymorphic artifact: any size works
        b = len(boxes)
    canvas_edge = contract["canvas"]
    in_w, in_h = contract["input_shape"]
    if len(boxes) > b:
        raise ValueError(f"{len(boxes)} boxes > artifact batch {b}; "
                         "chunk the request")
    h, w = img_rgb.shape[:2]
    if h > canvas_edge or w > canvas_edge:
        raise ValueError(f"image {w}x{h} exceeds the {canvas_edge} canvas; "
                         "export a larger canvas or downscale on host")
    canvas = np.zeros((b, canvas_edge, canvas_edge, 3), np.uint8)
    canvas[:, :h, :w] = img_rgb
    trans = np.zeros((b, 2, 3), np.float32)
    trans_inv = np.zeros((b, 2, 3), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        center, scale = A.box_to_center_scale(x1, y1, x2 - x1, y2 - y1, in_w / in_h)
        trans[i], _ = A.get_affine_transform(center, scale, 0, (in_w, in_h))
        _, trans_inv[i] = A.get_affine_transform(center, scale, 0,
                                                 (in_w // 4, in_h // 4))
    for i in range(len(boxes), b):  # pad slots reuse the first geometry
        trans[i], trans_inv[i] = trans[0], trans_inv[0]
    return canvas, trans, trans_inv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True, help="eval.py export output")
    ap.add_argument("--image", required=True)
    ap.add_argument("--box", action="append", required=True,
                    help="x1,y1,x2,y2 (repeatable, up to the artifact batch)")
    ap.add_argument("--kp-thresh", type=float, default=0.2)
    ap.add_argument("--out", default=None, help="write a skeleton overlay jpg")
    args = ap.parse_args()

    import cv2 as cv

    from simple_pose_tpu.evalkit.export import serving_fn

    contract = load_contract(args.artifact)
    if contract.get("external_weights"):
        sys.exit("artifact was exported with --external-weights; this demo "
                 "serves self-contained (baked) artifacts")
    if contract.get("decoder") == "dark_original":
        sys.exit("dark_original artifacts return raw heatmaps (host decode); "
                 "export with --decoder gauss_taylor for direct serving")
    predict = serving_fn(args.artifact)

    img = cv.imread(args.image)
    if img is None:
        sys.exit(f"cannot read {args.image}")
    boxes = [tuple(float(v) for v in s.split(",")) for s in args.box]
    canvas, trans, trans_inv = boxes_to_batch(img[..., ::-1], boxes, contract)
    out = predict(canvas, trans, trans_inv)
    kps = np.asarray(out["kps"])[: len(boxes)]
    conf = np.asarray(out["conf"])[: len(boxes)]
    scores = np.asarray(out["scores"])[: len(boxes)]

    print(json.dumps({
        "people": [
            {"box": list(boxes[i]), "score": float(scores[i]),
             "keypoints": np.concatenate([kps[i], conf[i]], -1)
                          .reshape(-1).round(2).tolist()}
            for i in range(len(boxes))
        ]
    }))
    if args.out:
        from simple_pose_tpu.utils.viz import draw_pose

        out_img = img.copy()
        for i, box in enumerate(boxes):
            joints = np.concatenate(
                [kps[i], (conf[i] > args.kp_thresh).astype(np.float32)], -1)
            out_img = draw_pose(out_img, joints, box=box)
        cv.imwrite(args.out, out_img)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
