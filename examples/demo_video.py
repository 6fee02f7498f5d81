"""Video pose demo: every frame through the ONE fused detect->pose program.

    python examples/demo_video.py --video in.mp4 --weights pose.pth \
        --det-weights yolov5l.pth [--out out.mp4] [--quant w8a8]

Frames batch through evalkit/fused.py's single XLA program (device letterbox
-> YOLOv5 person detector -> NMS -> crops -> pose -> decode); skeletons are
drawn with the same color tables as the single-image demo (utils/viz.py).
The reference has no video path (its closest artifact is the commented-out
draw_img debug blocks, coco.py:62-68); this is a serving-style consumer of
the fused program.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True, help="input video (anything cv2 opens)")
    ap.add_argument("--weights", default=None, help="pose checkpoint (.pth or orbax dir)")
    ap.add_argument("--model-type", default="pose_resnet_dconv")
    ap.add_argument("--model-name", default="resnet50")
    ap.add_argument("--reduction", action="store_true")
    ap.add_argument("--det-weights", default=None)
    ap.add_argument("--scale-name", default="l")
    ap.add_argument("--detector-family", default="yolov5", choices=["yolov5", "yolov4"])
    ap.add_argument("--batch", type=int, default=4, help="frames per device dispatch")
    ap.add_argument("--max-people", type=int, default=16)
    ap.add_argument("--det-conf", type=float, default=0.25)
    ap.add_argument("--det-size", type=int, default=640,
                    help="detector letterbox edge (static program shape)")
    ap.add_argument("--kp-thresh", type=float, default=0.2)
    ap.add_argument("--quant", default=None, choices=["w8a8"])
    ap.add_argument("--max-frames", type=int, default=0, help="0 = whole video")
    ap.add_argument("--out", default="demo_out.mp4")
    args = ap.parse_args()

    import cv2 as cv

    from simple_pose_tpu.detector.wrapper import paste_with_border
    from simple_pose_tpu.evalkit.fused import FusedDetectPose
    from simple_pose_tpu.utils.viz import draw_pose

    cap = cv.VideoCapture(args.video)
    if not cap.isOpened():
        sys.exit(f"cannot open {args.video}")
    fps = cap.get(cv.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv.CAP_PROP_FRAME_HEIGHT))
    canvas = int(np.ceil(max(h, w, 64) / 64) * 64)

    fused = FusedDetectPose(
        {"type": args.model_type, "name": args.model_name, "num_joints": 17,
         "reduction": args.reduction},
        args.weights, args.det_weights, scale_name=args.scale_name,
        max_people=args.max_people, det_conf=args.det_conf, canvas=canvas,
        det_size=(args.det_size, args.det_size),
        detector_family=args.detector_family, quant=args.quant)

    writer = cv.VideoWriter(args.out, cv.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        sys.exit(f"cannot open video writer for {args.out}")

    def flush(frames):
        """Run one padded batch through the fused program and write frames."""
        n = len(frames)
        canvases = np.zeros((args.batch, canvas, canvas, 3), np.uint8)
        for i, f in enumerate(frames):
            paste_with_border(canvases[i], f)
        out = fused(canvases, [(h, w)] * args.batch)
        for i in range(n):
            frame = frames[i]
            for p in range(args.max_people):
                if out["det_valid"][i, p] < 0.5:
                    continue
                joints = np.concatenate(
                    [out["kps"][i, p],
                     (out["kp_conf"][i, p] > args.kp_thresh).astype(np.float32)],
                    axis=-1)
                frame = draw_pose(frame, joints, box=tuple(out["boxes"][i, p]))
            writer.write(frame)
        return n

    total, buf = 0, []
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and total + len(buf) >= args.max_frames):
            break
        buf.append(frame)
        if len(buf) == args.batch:
            total += flush(buf)
            buf = []
            print(f"\r{total} frames", end="", flush=True)
    if buf:
        total += flush(buf)
    cap.release()
    writer.release()
    print(f"\nwrote {args.out} ({total} frames @ {fps:.1f} fps)")


if __name__ == "__main__":
    main()
