"""Single-image pose demo: detect (or take a box) -> crop -> pose -> draw.

    python examples/demo_image.py --image person.jpg --weights pose.pth \
        [--box x1,y1,x2,y2 | --det-weights yolov5l.pth] [--out out.jpg]

With --box the detector is skipped (GT-box style inference); otherwise the
YOLOv5 person detector proposes boxes.  Output is the image with skeletons
drawn (utils/viz.py color tables).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--weights", default=None, help="pose checkpoint (.pth or orbax dir)")
    ap.add_argument("--model-type", default="pose_resnet_dconv")
    ap.add_argument("--model-name", default="resnet50")
    ap.add_argument("--reduction", action="store_true")
    ap.add_argument("--box", default=None, help="x1,y1,x2,y2 (skip the detector)")
    ap.add_argument("--det-weights", default=None)
    ap.add_argument("--scale-name", default="l")
    ap.add_argument("--flip-test", action="store_true")
    ap.add_argument("--quant", default=None, choices=["w8a8"],
                    help="int8 conv forward (models/quant.py)")
    ap.add_argument("--kp-thresh", type=float, default=0.2)
    ap.add_argument("--out", default="demo_out.jpg")
    args = ap.parse_args()

    import cv2 as cv

    from simple_pose_tpu.evalkit.workflows import PoseEvaluator
    from simple_pose_tpu.ops import affine as A
    from simple_pose_tpu.utils.viz import draw_pose

    img = cv.imread(args.image)
    if img is None:
        sys.exit(f"cannot read {args.image}")
    h, w = img.shape[:2]

    if args.box:
        boxes = [tuple(float(v) for v in args.box.split(","))]
    else:
        from simple_pose_tpu.detector.wrapper import YOLOv5Detector

        det = YOLOv5Detector(weights_path=args.det_weights, scale_name=args.scale_name,
                             conf_thresh=0.25, iou_thresh=0.5, canvas=max(1280, h, w))
        found = det.single_predict(img)
        boxes = [tuple(b[:4]) for b in found]
        print(f"detector: {len(boxes)} people")
        if not boxes:
            sys.exit("no people found")

    model_cfg = {"type": args.model_type, "name": args.model_name,
                 "num_joints": 17, "reduction": args.reduction}
    ev = PoseEvaluator(model_cfg, args.weights, (192, 256),
                       flip_test=args.flip_test, quant=args.quant)

    canvas_edge = int(np.ceil(max(h, w) / 64) * 64)
    out_img = img.copy()
    for box in boxes:
        x1, y1, x2, y2 = box
        center, scale = A.box_to_center_scale(x1, y1, x2 - x1, y2 - y1, 192 / 256)
        trans, _ = A.get_affine_transform(center, scale, 0, (192, 256))
        _, trans_inv = A.get_affine_transform(center, scale, 0, (48, 64))
        canvas = np.zeros((1, canvas_edge, canvas_edge, 3), np.uint8)
        canvas[0, :h, :w] = img[..., ::-1]  # RGB
        batch = {
            "canvas": canvas,
            "trans": np.asarray(trans, np.float32)[None],
            "trans_inv": np.asarray(trans_inv, np.float32)[None],
        }
        out = ev(batch)
        kps = np.asarray(out["kps"])[0]
        conf = np.asarray(out["conf"])[0]
        joints = np.concatenate([kps, (conf > args.kp_thresh).astype(np.float32)], axis=-1)
        out_img = draw_pose(out_img, joints, box=box)

    cv.imwrite(args.out, out_img)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
