"""Evaluation entry point: the four reference eval.py workflows as a CLI.

    python eval.py gt          --img-root ... --ann ... --model-type pose_resnet_duc --weights ...
    python eval.py detections  --img-root ... --ann ... --dets COCO_val2017_detections_AP_H_56_person.json ...
    python eval.py gen-dets    --img-root ... --ann ... --det-weights yolov5l.pth
    python eval.py rescore     --preds predicts_kps_temp.json --ann ...
    python eval.py e2e         --img-root ... --ann ... --det-weights ... --weights ...
    python eval.py fused       --img-root ... --ann ... --det-weights ... --weights ...
    python eval.py export      --model-type ... --weights ... --out pose_eval.stablehlo

``export`` is an extra over the reference: it AOT-serializes the whole jitted
eval program (crop -> forward -> decode) to a StableHLO artifact for serving
(evalkit/export.py) -- a loader needs jax and the file, no model code.
"""

import argparse
import json


def _mesh(args):
    n = getattr(args, "mesh_devices", 0)
    if getattr(args, "multihost", False):
        # one process per host (reference evals on a single GPU; here every
        # host feeds its image shard and allgathers the full result list --
        # evalkit/fused.py + workflows._gather_results). The mesh must span
        # ALL global devices so every process dispatches the same program.
        from simple_pose_tpu.parallel.distributed import init_multihost

        print(init_multihost())
        n = n or -1
    if not n:
        return None
    from simple_pose_tpu.parallel.mesh import make_mesh

    return make_mesh({"data": n})


def _model_cfg(args):
    return {
        "type": args.model_type,
        "name": args.model_name,
        "num_joints": args.num_joints,
        "reduction": args.reduction,
    }


def main():
    ap = argparse.ArgumentParser(description="simple_pose_tpu evaluation")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, model=True):
        p.add_argument("--img-root", required=True)
        p.add_argument("--ann", required=True, help="person_keypoints_val2017.json")
        p.add_argument("--batch-size", type=int, default=32)
        p.add_argument("--debug", type=int, default=0)
        p.add_argument("--mesh-devices", type=int, default=0,
                       help="shard the eval batch over N devices (-1 = all; 0 = single-device)")
        p.add_argument("--multihost", action="store_true",
                       help="jax.distributed.initialize first (one process per "
                            "host; images shard per process, results allgather)")
        if model:
            p.add_argument("--model-type", default="pose_resnet_dconv")
            p.add_argument("--model-name", default="resnet50")
            p.add_argument("--num-joints", type=int, default=17)
            p.add_argument("--reduction", action="store_true")
            p.add_argument("--weights", default=None)
            p.add_argument("--input-w", type=int, default=192,
                           help="pose crop width (192 or the 288x384 configs)")
            p.add_argument("--input-h", type=int, default=256)
            p.add_argument("--decoder", default="gauss_taylor",
                           choices=["basic", "gauss_taylor", "dark_original"])
            p.add_argument("--flip-test", action="store_true")
            p.add_argument("--no-amp", action="store_true",
                           help="force float32 compute (default: bf16 on TPU)")
            p.add_argument("--quant", default=None, choices=["w8a8"],
                           help="int8 quantized conv forward (serving extra)")
            p.add_argument("--quant-calib", type=int, default=0, metavar="N",
                           help="calibrate static w8a8 activation scales on the "
                                "first N batches (kills the dynamic max-reduce)")
            p.add_argument("--scales", default=None,
                           help="load calibrated w8a8 scales json")
            p.add_argument("--save-scales", default=None,
                           help="write calibrated w8a8 scales json (with --quant-calib)")
            p.add_argument("--fused-layer1", action="store_true",
                           help="run layer1 as one fused VMEM-resident Pallas "
                                "chain (single-device serving fast path)")

    p = sub.add_parser("gt", help="GT-box eval")
    common(p)
    p.add_argument("--out", default="test_gt_kpt.json")

    p = sub.add_parser("detections", help="eval on a detection json + OKS-NMS rescoring")
    common(p)
    p.add_argument("--dets", required=True)
    p.add_argument("--out", default="predicts_kps_temp.json")

    p = sub.add_parser("gen-dets", help="run the YOLOv5 person detector over the val set")
    common(p, model=False)
    p.add_argument("--det-weights", default=None)
    p.add_argument("--rect", action="store_true",
                   help="minimum-rectangle letterbox via static mod-64 buckets")
    p.add_argument("--scale-name", default="l")
    p.add_argument("--detector-family", default="yolov5", choices=["yolov5", "yolov4"])
    p.add_argument("--no-amp", action="store_true",
                   help="force float32 compute (default: bf16 on TPU)")
    p.add_argument("--quant", default=None, choices=["w8a8"])
    p.add_argument("--quant-calib", type=int, default=0, metavar="N",
                   help="calibrate static w8a8 activation scales on the "
                        "first N batches (kills the dynamic max-reduce)")
    p.add_argument("--scales", default=None,
                   help="load calibrated w8a8 detector scales json")
    p.add_argument("--save-scales", default=None,
                   help="write calibrated w8a8 scales json (with --quant-calib)")
    p.add_argument("--canvas", type=int, default=1280)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--out", default="person_detections.json")

    p = sub.add_parser("export", help="AOT-export the eval program for serving "
                       "(jax.export StableHLO artifact; no model code needed to load)")
    p.add_argument("--model-type", default="pose_resnet_dconv")
    p.add_argument("--model-name", default="resnet50")
    p.add_argument("--num-joints", type=int, default=17)
    p.add_argument("--reduction", action="store_true")
    p.add_argument("--weights", default=None)
    p.add_argument("--decoder", default="gauss_taylor",
                   choices=["basic", "gauss_taylor", "dark_original"])
    p.add_argument("--flip-test", action="store_true")
    p.add_argument("--no-amp", action="store_true")
    p.add_argument("--quant", default=None, choices=["w8a8"])
    p.add_argument("--scales", default=None,
                   help="calibrated w8a8 scales json (eval.py gt --quant-calib "
                        "--save-scales): bakes a fully static int8 program, no "
                        "dynamic activation max-reduce in the artifact")
    p.add_argument("--batch-size", default="64",
                   help="static crop-batch size, or a symbolic-dim name "
                        "(e.g. 'b') for a batch-polymorphic artifact that "
                        "serves any batch size from one file")
    p.add_argument("--canvas", type=int, default=640)
    p.add_argument("--input-w", type=int, default=192)
    p.add_argument("--input-h", type=int, default=256)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. tpu,cpu "
                        "(default: current backend)")
    p.add_argument("--external-weights", action="store_true",
                   help="keep variables as a runtime argument instead of "
                        "baking them into the artifact")
    p.add_argument("--out", default="pose_eval.stablehlo")

    p = sub.add_parser("fused", help="detect -> pose e2e as ONE fused device "
                       "program per image batch (evalkit/fused.py)")
    common(p)
    p.add_argument("--det-weights", default=None)
    p.add_argument("--scale-name", default="l")
    p.add_argument("--detector-family", default="yolov5", choices=["yolov5", "yolov4"])
    p.add_argument("--max-people", type=int, default=16)
    p.add_argument("--canvas", type=int, default=1280)
    p.add_argument("--det-size", type=int, default=640,
                   help="square detector letterbox size")
    p.add_argument("--rect", action="store_true",
                   help="minimum-rectangle letterbox via static mod-64 buckets")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--out", default="fused_kps_temp.json")

    p = sub.add_parser("rescore", help="OKS-NMS rescoring of raw predictions")
    p.add_argument("--preds", required=True)
    p.add_argument("--ann", required=True)
    p.add_argument("--in-vis-thre", type=float, default=0.2)
    p.add_argument("--oks-thre", type=float, default=0.9)

    p = sub.add_parser("e2e", help="detect -> crop -> pose end to end")
    common(p)
    p.add_argument("--det-weights", default=None)
    p.add_argument("--scale-name", default="l")
    p.add_argument("--detector-family", default="yolov5", choices=["yolov5", "yolov4"])

    args = ap.parse_args()
    from simple_pose_tpu import evalkit

    def _quant_kwargs(a):
        if not getattr(a, "quant", None):
            return {"quant": None}
        scales = None
        if getattr(a, "scales", None):
            from simple_pose_tpu.models.quant import load_scales

            scales = load_scales(a.scales)
        return {"quant": a.quant, "quant_calib": a.quant_calib,
                "quant_scales": scales, "quant_scales_out": a.save_scales}

    if args.cmd == "gt":
        stats = evalkit.predicts_by_gt(
            args.img_root, args.ann, _model_cfg(args), weights=args.weights,
            batch_size=args.batch_size, decoder=args.decoder,
            input_shape=(args.input_w, args.input_h),
            flip_test=args.flip_test, out_path=args.out, debug=args.debug,
            amp=False if args.no_amp else "auto", mesh=_mesh(args),
            fused_layer1=args.fused_layer1, **_quant_kwargs(args),
        )
    elif args.cmd == "detections":
        stats = evalkit.predicts_by_detections(
            args.img_root, args.dets, args.ann, _model_cfg(args), weights=args.weights,
            batch_size=args.batch_size, decoder=args.decoder,
            input_shape=(args.input_w, args.input_h),
            flip_test=args.flip_test, out_path=args.out, debug=args.debug,
            amp=False if args.no_amp else "auto", mesh=_mesh(args),
            fused_layer1=args.fused_layer1, **_quant_kwargs(args),
        )
    elif args.cmd == "gen-dets":
        from simple_pose_tpu.evalkit.workflows import gen_detections

        from simple_pose_tpu.detector.wrapper import YOLOv5Detector

        scales = None
        if args.scales:
            from simple_pose_tpu.models.quant import load_scales

            scales = load_scales(args.scales)
        detector = YOLOv5Detector(
            weights_path=args.det_weights, scale_name=args.scale_name,
            conf_thresh=args.conf, iou_thresh=args.iou, canvas=args.canvas,
            model_family=args.detector_family, amp=False if args.no_amp else "auto",
            mesh=_mesh(args), rect=args.rect, quant=args.quant, quant_scales=scales)
        gen_detections(args.img_root, args.ann, detector=detector, out_path=args.out,
                       batch_size=args.batch_size, debug=args.debug, canvas=args.canvas,
                       quant_calib=args.quant_calib, quant_scales_out=args.save_scales)
        print(f"wrote {args.out}")
        return
    elif args.cmd == "export":
        from simple_pose_tpu.evalkit.export import export_evaluator, save_exported
        from simple_pose_tpu.evalkit.workflows import PoseEvaluator

        scales = None
        if args.scales:
            from simple_pose_tpu.models.quant import load_scales

            scales = load_scales(args.scales)
        evaluator = PoseEvaluator(
            _model_cfg(args), weights=args.weights,
            input_shape=(args.input_w, args.input_h), decoder=args.decoder,
            flip_test=args.flip_test, amp=False if args.no_amp else "auto",
            quant=args.quant, quant_scales=scales)
        try:
            batch = int(args.batch_size)
            if batch <= 0:
                ap.error(f"--batch-size must be > 0, got {batch}")
        except ValueError:  # non-numeric = symbolic-dim name ('b', '2*b', ...)
            batch = args.batch_size
        exported = export_evaluator(
            evaluator, batch, (args.canvas, args.canvas),
            bake_weights=not args.external_weights,
            platforms=args.platforms.split(",") if args.platforms else None)
        n = save_exported(exported, args.out)
        info = {
            "out": args.out, "bytes": n,
            "platforms": list(exported.platforms),
            "batch": batch, "canvas": args.canvas,
            "input_shape": [args.input_w, args.input_h],
            "model": _model_cfg(args), "decoder": args.decoder,
            "flip_test": args.flip_test, "quant": args.quant,
            "static_scales": bool(args.scales),
            "amp": not args.no_amp, "weights": args.weights,
            "external_weights": args.external_weights,
        }
        # sidecar: the artifact's input contract for serving consumers
        with open(args.out + ".json", "w") as wf:
            json.dump(info, wf, indent=1)
        print(json.dumps(info))
        return
    elif args.cmd == "fused":
        from simple_pose_tpu.evalkit.fused import fused_eval

        if args.flip_test:
            ap.error("fused runs one forward per crop; flip-test needs the "
                     "two-stage path (eval.py e2e --flip-test)")
        if args.decoder == "dark_original":
            ap.error("fused decodes in-program (basic/gauss_taylor); "
                     "dark_original's host decode needs the two-stage path")
        scales = None
        if args.scales:  # fused scales are per-net: {"detector": ..., "pose": ...}
            with open(args.scales) as rf:
                scales = {net: {k: float(v) for k, v in d.items()}
                          for net, d in json.load(rf).items()}
        stats = fused_eval(
            args.img_root, args.ann, _model_cfg(args), pose_weights=args.weights,
            detector_weights=args.det_weights, scale_name=args.scale_name,
            det_conf=args.conf, det_iou=args.iou, batch_size=args.batch_size,
            input_shape=(args.input_w, args.input_h),
            det_size=(args.det_size, args.det_size),
            max_people=args.max_people, canvas=args.canvas, decoder=args.decoder,
            detector_family=args.detector_family,
            amp=False if args.no_amp else "auto", mesh=_mesh(args),
            rect=args.rect, quant=args.quant, quant_calib=args.quant_calib,
            quant_scales=scales, quant_scales_out=args.save_scales,
            debug=args.debug, out_path=args.out)
    elif args.cmd == "rescore":
        stats = evalkit.rescore_and_filter(args.preds, args.ann, args.in_vis_thre, args.oks_thre)
    elif args.cmd == "e2e":
        from simple_pose_tpu.evalkit.workflows import detect_then_pose

        stats = detect_then_pose(
            args.img_root, args.ann, _model_cfg(args), pose_weights=args.weights,
            detector_weights=args.det_weights, scale_name=args.scale_name,
            batch_size=args.batch_size, input_shape=(args.input_w, args.input_h),
            flip_test=args.flip_test, debug=args.debug,
            detector_family=args.detector_family,
            amp=False if args.no_amp else "auto", mesh=_mesh(args),
            **_quant_kwargs(args),
        )
    print(json.dumps({k: round(float(v), 4) for k, v in stats.items()}, indent=2))


if __name__ == "__main__":
    main()
