"""Command-line entry points — the reference's six scripts as one CLI.

``python -m amyloid_yolo_tpu.cli.main <command>`` with commands:

* ``train``   — ``train.py`` (``/root/reference/train.py:27-210``)
* ``test``    — ``test.py`` mAP evaluation (``test.py:69-115``)
* ``detect``  — ``detect.py`` folder inference with merge / CAA-filter /
  CAA-pickle flags (``detect.py:30-171``; boolean flags accept both real
  booleans and the reference's ``"True"`` string convention)
* ``crop``    — ``crop.py`` WSI tiling
* ``clear``   — ``clear.py`` output reset
* ``bench``   — the tiles/sec benchmark (speedCheck's modern form)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _truthy(v) -> bool:
    """Accept bools and the reference's ``--flag True`` strings
    (``detect.py:132``)."""
    if isinstance(v, bool):
        return v
    return str(v) == "True" or str(v).lower() == "true" or str(v) == "1"


def _fast_path_kwargs(args) -> dict:
    """Detector kwargs for ``--fast_path True``: the gated non-parity fast
    stack (int8 + lazy sparse decode + approx top-k) — accuracy-gated on
    the 200 real prospective images (BENCH.md, ``tools/fastpath_gate.py``).
    Default off = box-for-box parity.

    ``--precision`` selects the int8 flavor: the default ``int8_early``
    (conservative: backbone-prefix int8) or ``int8_full`` — the bench.py
    headline stack (whole-graph int8, bf16 stem/head convs, s2d stem)."""
    if not _truthy(getattr(args, "fast_path", False)):
        ignored = [f"--{n}" for n in ("precision", "calib_percentile")
                   if getattr(args, n, None) is not None]
        if ignored:
            import warnings

            warnings.warn(
                f"{' and '.join(ignored)} only take effect with "
                f"--fast_path True — running the box-for-box parity "
                f"(bf16, amax) pipeline instead.", UserWarning,
                stacklevel=2)
        return {}
    precision = getattr(args, "precision", None) or "int8_early"
    kw = {"precision": precision, "lazy_decode": True, "approx_topk": True}
    if precision == "int8_early":
        kw["int8_downsample"] = 32
    elif precision == "int8_full":
        kw["s2d_stem"] = True
    pct = getattr(args, "calib_percentile", None)
    if pct is not None:
        kw["calib_percentile"] = float(pct)
    return kw


def _capacity_kwargs(args) -> dict:
    """``--nms_pool N``: raise BOTH the pre-NMS candidate pool and the
    returned-detection capacity to N (the reference loop is uncapped; the
    overflow counters report when the default 64 actually truncated)."""
    pool = getattr(args, "nms_pool", None)
    if pool:
        return {"capacity": int(pool), "nms_pool": int(pool)}
    return {}


def _spec_from_args(args):
    """Graph spec for non-train commands: ``--model_def <cfg>`` (reference
    ``--model_def`` semantics) or the native 2-class builder.  A checkpoint
    trained with re-estimated anchors (tools/estimate_anchors.py) has
    layout-identical params but decodes garbage under the wrong table, so
    every surface that loads one accepts the cfg."""
    from ..graphspec import from_cfg, yolov3_spec

    md = getattr(args, "model_def", None)
    return from_cfg(md) if md else yolov3_spec(num_classes=2)


def cmd_train(args) -> int:
    from ..training import Trainer, TrainConfig

    spec = None
    if getattr(args, "model_def", None):
        # reference train.py:31 --model_def: build the graph from a darknet
        # cfg (e.g. one with re-estimated anchors, tools/estimate_anchors.py)
        from ..graphspec import from_cfg

        spec = from_cfg(args.model_def)
    cfg = TrainConfig(
        data_config=args.data_config,
        epochs=args.epochs,
        batch_size=args.batch_size,
        gradient_accumulations=args.gradient_accumulations,
        img_size=args.img_size,
        multiscale=_truthy(args.multiscale_training),
        pretrained_weights=args.pretrained_weights,
        checkpoint_interval=args.checkpoint_interval,
        evaluation_interval=args.evaluation_interval,
        logdir=args.logdir,
        verbose=args.verbose,
        data_parallel=args.data_parallel,
        spatial_shard=args.spatial_shard,
        checkpoint_dir=args.checkpoint_dir,
        augment=not args.no_augment,
        max_batches_per_epoch=args.max_batches_per_epoch,
        grad_clip_norm=args.grad_clip_norm,
        learning_rate=args.learning_rate,
        burn_in=args.burn_in,
        compute_dtype=args.compute_dtype,
        cache_images=_truthy(args.cache_images),
        host_resize=_truthy(args.host_resize),
        s2d_stem=(None if args.s2d_stem == "auto"
                  else _truthy(args.s2d_stem)),
        image_layout=args.image_layout,
        ema_decay=args.ema_decay,
        eval_nms_capacity=args.eval_nms_capacity,
        keep_checkpoints=args.keep_checkpoints,
        distributed=_truthy(args.distributed),
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    trainer = Trainer(cfg, spec=spec)
    if args.resume:
        # orbax checkpoint resume incl. optimizer state (the reference's
        # --pretrained_weights reloads weights only, train.py:64-68)
        trainer.load_checkpoint(args.resume)
    trainer.train()
    return 0


def cmd_test(args) -> int:
    from ..evaluate import evaluate
    from ..graphspec import yolov3_spec
    from ..io import weights as W
    from ..parsecfg import load_classes, parse_data_config

    spec = _spec_from_args(args)
    data = parse_data_config(args.data_config)
    params = W.load_pretrained(spec, args.weights_path)
    out = evaluate(spec, params, data["valid"], iou_thres=args.iou_thres,
                   conf_thres=args.conf_thres, nms_thres=args.nms_thres,
                   img_size=args.img_size, batch_size=args.batch_size,
                   nms_capacity=args.nms_capacity)
    if out is None:
        print("no detections")
        return 1
    precision, recall, ap, f1, ap_class = out
    class_names = load_classes(data["names"]) if os.path.exists(data["names"]) else None
    print("Average Precisions:")
    for i, c in enumerate(ap_class):
        name = class_names[int(c)] if class_names else str(c)
        print(f"+ Class '{c}' ({name}) - AP: {ap[i]}")
    print(f"mAP: {ap.mean()}")
    return 0


def cmd_detect(args) -> int:
    from ..detectors import Detector
    from ..domain import CAAFilter, clear_output_dir, draw_detections, write_caa_detections
    from ..graphspec import yolov3_spec
    from ..io import weights as W
    from ..io.datasets import load_image_rgb
    from ..parsecfg import load_classes

    spec = _spec_from_args(args)
    params = W.load_pretrained(spec, args.weights_path) if args.weights_path else None
    classes = load_classes(args.class_path) if os.path.exists(args.class_path) \
        else ["CAA", "Cored"]
    det = Detector(spec, params, conf_thres=args.conf_thres, nms_thres=args.nms_thres,
                   model_size=args.img_size, **_fast_path_kwargs(args),
                   **_capacity_kwargs(args))
    if getattr(args, "calibration", None):
        det.load_calibration(args.calibration)
    caa_filter = None
    if _truthy(args.filter_CAA_detections_by_model):
        caa_filter = CAAFilter(model_pickle=args.caa_model_pickle,
                               normalization=args.caa_normalization, classes=classes)
    clear_output_dir(args.output_dir)
    if _truthy(args.write_CAA_detections_to_pickle):
        import pickle

        os.makedirs("pickles", exist_ok=True)
        with open("pickles/CAA_detections.pkl", "wb") as fh:
            pickle.dump({}, fh)
    results = det.detect_folder(
        args.image_folder, batch_size=args.batch_size,
        merge_boxes=_truthy(args.merge_boxes),
        caa_filter=(caa_filter.filter_path if caa_filter else None),
        fast_decode=_truthy(args.fast_decode),
        background_skip=_truthy(args.background_skip),
    )
    if getattr(args, "save_calibration", None) and det._act_scales is not None:
        print(f"calibration -> {det.save_calibration(args.save_calibration)}",
              flush=True)
    if det.overflow_images:
        print(f"WARNING: {det.overflow_images}/{det.images_seen} images "
              f"exceeded the NMS candidate pool (nms_pool={det.nms_pool}, "
              f"max seen {det.max_candidates_seen}); detections were "
              f"truncated on them — raise --nms_pool.", flush=True)
    from PIL import Image

    for path, dets in results.items():
        if dets is None:
            continue
        if _truthy(args.write_CAA_detections_to_pickle):
            write_caa_detections("pickles/CAA_detections.pkl", path, dets, classes)
        img = load_image_rgb(path)
        out = draw_detections(img, dets, classes)
        out_name = path.replace("/", "_")
        Image.fromarray(out).save(os.path.join(args.output_dir, out_name))
        for row in dets:
            print("\t+ Label: %s, Conf: %.5f" % (classes[int(row[6])], row[5]))
    return 0


def cmd_serve(args) -> int:
    """Long-running HTTP detection service (``serving.DetectionServer``):
    micro-batched fixed-shape dispatch, POST /v1/detect (encoded image
    body, or raw uint8 RGB with ``X-Image-Shape: H,W``), /healthz,
    /stats."""
    from ..detectors import Detector
    from ..domain import CAAFilter
    from ..graphspec import yolov3_spec
    from ..io import weights as W
    from ..parsecfg import load_classes
    from ..serving import DetectionServer

    spec = _spec_from_args(args)
    params = W.load_pretrained(spec, args.weights_path) if args.weights_path else None
    classes = load_classes(args.class_path) if os.path.exists(args.class_path) \
        else ["CAA", "Cored"]
    det = Detector(spec, params, conf_thres=args.conf_thres,
                   nms_thres=args.nms_thres, model_size=args.img_size,
                   host_resize=_truthy(args.host_resize),
                   **_fast_path_kwargs(args), **_capacity_kwargs(args))
    if getattr(args, "calibration", None):
        # persisted scales BEFORE the socket opens: the server starts
        # int8-calibrated with no --calibration_folder and no 48-tile
        # pass, and no early request can race an uncalibrated detector
        det.load_calibration(args.calibration)
    caa_filter = None
    if _truthy(args.filter_CAA_detections_by_model):
        caa_filter = CAAFilter(model_pickle=args.caa_model_pickle,
                               normalization=args.caa_normalization,
                               classes=classes)
    server = DetectionServer(
        det, classes, host=args.host, port=args.port,
        batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
        merge_boxes=_truthy(args.merge_boxes), caa_filter=caa_filter,
        native_decode=_truthy(args.native_decode),
        fast_decode=_truthy(args.fast_decode),
        max_queue=args.max_queue,
        max_body_bytes=int(args.max_body_mb * 1024 * 1024),
        max_side=args.max_side,
        request_timeout_s=args.request_timeout_s)
    server.start()
    print(f"serving on http://{args.host}:{server.port} "
          f"(batch {server.executor.batch_size}, precision {det.precision})",
          flush=True)
    if _truthy(args.warmup):
        if (det.precision.startswith("int8") and args.calibration_folder
                and det._act_scales is None):
            from ..io.datasets import ImageFolder

            # host_resize detectors calibrate on model-size input (the same
            # frame inference sees); the shared folder calibrator gathers
            # ~CALIB_TILES tiles, not one batch — 8-tile calibration cost
            # int8_full 2.7 mAP pts (tools/int8_calib_study.py, BENCH.md
            # "int8 calibration") — at the executor's batch size, so the
            # compiled probe shape IS the serving shape.
            folder = ImageFolder(
                args.calibration_folder, tile_size=det.tile_size,
                resize_to=det.model_size if det.host_resize else None)
            det._calibrate_from_folder(folder, server.executor.batch_size)
            if getattr(args, "save_calibration", None):
                print(f"calibration -> "
                      f"{det.save_calibration(args.save_calibration)}",
                      flush=True)
        if server.warmup():
            print("pipeline compiled; ready", flush=True)
        else:
            print("warmup skipped (uncalibrated int8 — pass "
                  "--calibration_folder); first request compiles", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
    return 0


def cmd_sweep(args) -> int:
    """Whole-slide sweep: per-WSI/per-tile plaque counts
    (``validation.py calculatePlaqueCountsPerWSI`` path)."""
    from ..analysis.validation import calculate_plaque_counts_per_wsi
    from ..detectors import Detector
    from ..domain import CAAFilter, wsis_with_most_caas
    from ..graphspec import yolov3_spec
    from ..io import weights as W

    spec = _spec_from_args(args)
    params = W.load_pretrained(spec, args.weights_path) if args.weights_path else None
    mesh = None
    if args.data_parallel and args.data_parallel > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel)
    det = Detector(spec, params, conf_thres=args.conf_thres,
                   nms_thres=args.nms_thres, mesh=mesh,
                   **_fast_path_kwargs(args), **_capacity_kwargs(args))
    caa_filter = None
    if _truthy(args.filter_CAA_detections_by_model):
        caa_filter = CAAFilter(model_pickle=args.caa_model_pickle,
                               normalization=args.caa_normalization)
    whitelist = None
    if args.top_caa_wsis and args.top_caa_counts_pickle:
        whitelist = wsis_with_most_caas(args.top_caa_counts_pickle, args.top_caa_wsis)
    counts = calculate_plaque_counts_per_wsi(
        args.directory, det, caa_filter=caa_filter, prefix=args.prefix,
        pickles_dir=args.pickles_dir, batch_size=args.batch_size,
        save_images=_truthy(args.save_images), wsi_whitelist=whitelist,
        cross_tile_merge=_truthy(args.cross_tile_merge),
        background_skip=_truthy(args.background_skip),
        background_max_bpp=args.background_max_bpp,
        background_min_tissue=args.background_min_tissue,
    )
    for wsi, c in counts.items():
        print(f"{wsi}: Cored={c['Cored']} CAA={c['CAA']}")
    return 0


def cmd_crop(args) -> int:
    from ..io import tiles

    failed = tiles.crop_wsis(args.wsi_dirs, args.save_dir,
                             temp_map_pickle=args.temp_map_pickle,
                             min_tissue_fraction=args.min_tissue_fraction)
    if failed:
        print("failed to tile: {}".format(failed))
    tiles.merge_1536_subdirectories(args.save_dir)
    if args.temp_map_pickle and os.path.exists(args.temp_map_pickle):
        tiles.rename_temp_directories(args.save_dir, args.temp_map_pickle)
    return 0


def cmd_export(args) -> int:
    """Convert between checkpoint formats: orbax <-> reference .pth <->
    darknet binary (``models.py:257-336`` formats)."""
    from ..graphspec import yolov3_spec
    from ..io import weights as W

    spec = _spec_from_args(args)
    src = args.src
    if os.path.isdir(src.removesuffix("#ema")):  # orbax checkpoint dir
        params = W.load_ckpt_params(src)  # accepts <dir>#ema
    else:
        params = W.load_pretrained(spec, src)
    dst = args.dst
    if dst.endswith(".pth"):
        import torch

        sd = {k: torch.from_numpy(v.copy()) if hasattr(v, "copy") else v
              for k, v in W.params_to_torch_state_dict(spec, params).items()}
        torch.save(sd, dst)
    elif dst.endswith(".weights") or "darknet" in os.path.basename(dst):
        W.save_darknet_weights(spec, params, dst, seen=args.seen)
    else:
        W.save_checkpoint(dst, {"params": params})
    print(f"exported {src} -> {dst}")
    return 0


def cmd_clear(args) -> int:
    from ..domain import clear_output_dir

    clear_output_dir(args.output_dir)
    return 0


def cmd_bench(args) -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "../../bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="amyolo")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train")
    t.add_argument("--model_def", type=str, default=None,
                   help="darknet cfg to build the model from (default: the "
                        "native yolov3_spec builder); reference train.py:31")
    t.add_argument("--epochs", type=int, default=100)
    t.add_argument("--batch_size", type=int, default=8)
    t.add_argument("--gradient_accumulations", type=int, default=2)
    t.add_argument("--data_config", type=str, default="config/custom.data")
    t.add_argument("--pretrained_weights", type=str)
    t.add_argument("--img_size", type=int, default=416)
    t.add_argument("--checkpoint_interval", type=int, default=1)
    t.add_argument("--evaluation_interval", type=int, default=1)
    t.add_argument("--multiscale_training", default=True)
    t.add_argument("--verbose", "-v", default=False, action="store_true")
    t.add_argument("--logdir", type=str, default="logs")
    t.add_argument("--data_parallel", type=int, default=None)
    t.add_argument("--spatial_shard", type=int, default=None,
                   help="shard image height over an sp mesh axis (composes "
                        "with --data_parallel; enables native-resolution "
                        "scale-matched training on a slice)")
    t.add_argument("--distributed", type=str, default="False",
                   help="multi-host (pod-scale) DP: one global mesh over "
                        "every host's chips; batch_size becomes the GLOBAL "
                        "batch and each host loads its own rows. On a TPU "
                        "pod the coordinator args may be omitted "
                        "(auto-discovered); launch one process per host.")
    t.add_argument("--coordinator_address", type=str, default=None)
    t.add_argument("--num_processes", type=int, default=None)
    t.add_argument("--process_id", type=int, default=None)
    t.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    t.add_argument("--no_augment", action="store_true")
    t.add_argument("--max_batches_per_epoch", type=int, default=None)
    t.add_argument("--grad_clip_norm", type=float, default=None)
    t.add_argument("--learning_rate", type=float, default=1e-3)
    t.add_argument("--burn_in", type=int, default=0,
                   help="darknet LR warmup steps (the cfg declares 1000; "
                        "the reference trainer ignores it — opt-in)")
    t.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="training compute dtype (bfloat16 = MXU-native; "
                        "params/optimizer/BN stats stay f32)")
    t.add_argument("--cache_images", type=str, default="False",
                   help="RAM-cache decoded training images across epochs "
                        "(~side²·3 bytes/image; JPEG decode dominates the "
                        "host pipeline otherwise)")
    t.add_argument("--host_resize", type=str, default="False",
                   help="apply the (bit-identical) nearest multiscale "
                        "resize on the host before transfer — ~13x less "
                        "host→device traffic; use on thin links")
    t.add_argument("--s2d_stem", type=str, default="auto",
                   help="space-to-depth training stem (auto/True/False): "
                        "computes layers 0-1 on the s2d grid with gradients "
                        "mapped back to the standard 3x3 weights — same "
                        "function/gradients up to f32 summation order")
    t.add_argument("--keep_checkpoints", type=int, default=None,
                   help="retention: keep only the most recent N epoch "
                        "checkpoints plus every tracked best epoch "
                        "(default: keep all, the reference behavior — "
                        "~650 MB per epoch for the full model)")
    t.add_argument("--eval_nms_capacity", type=int, default=128,
                   help="NMS candidate pool for the in-training eval; "
                        "raise when the per-epoch overflow warning fires "
                        "(early epochs routinely exceed 128 at conf .5)")
    t.add_argument("--ema_decay", type=float, default=None,
                   help="track an exponential moving average of the weights "
                        "(e.g. 0.999) and evaluate it alongside the raw "
                        "weights each eval epoch; checkpoints then carry an "
                        "ema_params tree (beyond-reference, default off)")
    t.add_argument("--image_layout", type=str, default="planar",
                   choices=["planar", "nhwc"],
                   help="in-step image pipeline layout; planar runs "
                        "resize+augment channel-first (W-minor VPU tiles), "
                        "identical results, ~8%% faster step")
    t.add_argument("--resume", type=str, default=None,
                   help="orbax checkpoint dir to resume from "
                        "(restores optimizer state too)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("test")
    e.add_argument("--model_def", type=str, default=None,
                   help="darknet cfg to build the graph from (e.g. a re-anchored cfg; default: the native 2-class builder)")
    e.add_argument("--batch_size", type=int, default=8)
    e.add_argument("--data_config", type=str, default="config/custom.data")
    e.add_argument("--weights_path", type=str, required=True)
    e.add_argument("--iou_thres", type=float, default=0.5)
    e.add_argument("--conf_thres", type=float, default=0.5)
    e.add_argument("--nms_thres", type=float, default=0.5)
    e.add_argument("--img_size", type=int, default=416)
    e.add_argument("--nms_capacity", type=int, default=128,
                   help="device NMS candidate pool; evaluate warns when any "
                        "image overflows it (truncation depresses mAP)")
    e.set_defaults(fn=cmd_test)

    d = sub.add_parser("detect")
    d.add_argument("--model_def", type=str, default=None,
                   help="darknet cfg to build the graph from (e.g. a re-anchored cfg; default: the native 2-class builder)")
    d.add_argument("--image_folder", type=str, default="data/samples")
    d.add_argument("--weights_path", type=str)
    d.add_argument("--class_path", type=str, default="data/custom/classes.names")
    d.add_argument("--conf_thres", type=float, default=0.8)
    d.add_argument("--nms_thres", type=float, default=0.4)
    d.add_argument("--batch_size", default="8",
                   help="int, or 'auto' (32 for deep queues, else 16)")
    d.add_argument("--img_size", type=int, default=416)
    d.add_argument("--output_dir", type=str, default="output")
    d.add_argument("--merge_boxes", type=str, default="False")
    d.add_argument("--write_CAA_detections_to_pickle", type=str, default="False")
    d.add_argument("--filter_CAA_detections_by_model", type=str, default="False")
    d.add_argument("--caa_model_pickle", type=str,
                   default="pickles/model_all_fold_3_thresholding_2_l2.pkl")
    d.add_argument("--caa_normalization", type=str, default="pickles/normalization.npy")
    d.add_argument("--fast_decode", type=str, default="False",
                   help="DCT-scaled JPEG decode on the native host path "
                        "(~12%% faster single-core; pixels are the scaled "
                        "rendition, not bit-identical)")
    d.add_argument("--precision", type=str, default=None,
                   choices=["int8_early", "int8_full"],
                   help="int8 flavor for --fast_path (default int8_early)")
    d.add_argument("--calib_percentile", type=float, default=None,
                   help="int8 activation-scale statistic for --fast_path: "
                        "omit = amax; e.g. 99.9 = that percentile of "
                        "|acts|, computed per probe batch and max-"
                        "combined (streaming upper bound, errs toward "
                        "amax; tools/int8_calib_study.py)")
    d.add_argument("--fast_path", type=str, default="False",
                   help="int8 early backbone + lazy decode + approx top-k "
                        "(gated fast stack; ~40%% faster, non-parity)")
    d.add_argument("--background_skip", type=str, default="False",
                   help="skip background tiles before full-size decode "
                        "(file-size stage + decode-confirm stage; the host "
                        "decode is the sweep bottleneck). Accuracy-gated "
                        "opt-in: tools/background_gate.py")
    d.add_argument("--calibration", type=str, default=None,
                   help="int8 scale sidecar (Detector.save_calibration) — "
                        "skips the lazy 48-tile folder calibration")
    d.add_argument("--save_calibration", type=str, default=None,
                   help="write the int8 scales used for this run (with "
                        "tile-list provenance) to this JSON sidecar")
    d.add_argument("--nms_pool", type=int, default=None,
                   help="raise the NMS candidate pool + detection capacity "
                        "(default 64); overflow warnings tell you when to")
    d.set_defaults(fn=cmd_detect)

    sv = sub.add_parser("serve")
    sv.add_argument("--model_def", type=str, default=None,
                    help="darknet cfg to build the graph from (e.g. a re-anchored cfg; default: the native 2-class builder)")
    sv.add_argument("--host", type=str, default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8498)
    sv.add_argument("--weights_path", type=str)
    sv.add_argument("--class_path", type=str, default="data/custom/classes.names")
    sv.add_argument("--conf_thres", type=float, default=0.8)
    sv.add_argument("--nms_thres", type=float, default=0.4)
    sv.add_argument("--img_size", type=int, default=416)
    sv.add_argument("--batch_size", type=int, default=16,
                    help="fixed micro-batch shape (one compiled program)")
    sv.add_argument("--max_wait_ms", type=float, default=5.0,
                    help="how long a lone request waits for company")
    sv.add_argument("--merge_boxes", type=str, default="True")
    sv.add_argument("--host_resize", type=str, default="False",
                    help="resize tiles host-side before transfer (thin links)")
    sv.add_argument("--warmup", type=str, default="True",
                    help="compile the pipeline before reporting ready")
    sv.add_argument("--calibration_folder", type=str, default=None,
                    help="representative tiles for int8 scale calibration "
                         "(int8 precisions; without it warmup is skipped — "
                         "never noise-calibrated — and the first real "
                         "request compiles + calibrates)")
    sv.add_argument("--filter_CAA_detections_by_model", type=str, default="False")
    sv.add_argument("--caa_model_pickle", type=str,
                    default="pickles/model_all_fold_3_thresholding_2_l2.pkl")
    sv.add_argument("--caa_normalization", type=str, default="pickles/normalization.npy")
    sv.add_argument("--precision", type=str, default=None,
                    choices=["int8_early", "int8_full"],
                    help="int8 flavor for --fast_path (default int8_early)")
    sv.add_argument("--calib_percentile", type=float, default=None,
                   help="int8 activation-scale statistic for --fast_path: "
                        "omit = amax; e.g. 99.9 = that percentile of "
                        "|acts|, computed per probe batch and max-"
                        "combined (streaming upper bound, errs toward "
                        "amax; tools/int8_calib_study.py)")
    sv.add_argument("--fast_path", type=str, default="False",
                    help="gated non-parity fast stack (int8 + lazy decode + "
                         "approx top-k)")
    sv.add_argument("--native_decode", type=str, default="True",
                    help="C++ in-memory JPEG decode for exact-tile requests "
                         "(bit-identical, GIL-free; PIL fallback otherwise)")
    sv.add_argument("--fast_decode", type=str, default="False",
                    help="DCT-scaled native decode when --host_resize True "
                         "(non-parity pixels, same opt-in as ImageFolder "
                         "fast_decode)")
    sv.add_argument("--max_queue", type=int, default=None,
                    help="bounded executor queue depth (default 8x batch); "
                         "bursts past it are shed with 503 + Retry-After")
    sv.add_argument("--max_body_mb", type=float, default=32.0,
                    help="reject request bodies larger than this (413, "
                         "checked on the Content-Length header)")
    sv.add_argument("--calibration", type=str, default=None,
                    help="int8 scale sidecar — start compiled+calibrated "
                         "with no --calibration_folder")
    sv.add_argument("--save_calibration", type=str, default=None,
                    help="write the folder-calibrated int8 scales to this "
                         "JSON sidecar for future --calibration starts")
    sv.add_argument("--max_side", type=int, default=None,
                    help="reject images whose longer side exceeds this "
                         "(default: the detector tile size; guards the "
                         "pad-to-square allocation)")
    sv.add_argument("--request_timeout_s", type=float, default=120.0,
                    help="per-request queue+device timeout (503 on expiry)")
    sv.add_argument("--nms_pool", type=int, default=None,
                   help="raise the NMS candidate pool + detection capacity "
                        "(default 64); overflow warnings tell you when to")
    sv.set_defaults(fn=cmd_serve)

    s = sub.add_parser("sweep")
    s.add_argument("--model_def", type=str, default=None,
                   help="darknet cfg to build the graph from (e.g. a re-anchored cfg; default: the native 2-class builder)")
    s.add_argument("--directory", type=str, required=True,
                   help="tiled WSI root (e.g. data/CERAD/1536_tiles/)")
    s.add_argument("--weights_path", type=str)
    s.add_argument("--prefix", type=str, default="CERAD_")
    s.add_argument("--pickles_dir", type=str, default="pickles")
    s.add_argument("--conf_thres", type=float, default=0.8)
    s.add_argument("--nms_thres", type=float, default=0.4)
    s.add_argument("--batch_size", default="8",
                   help="int, or 'auto' (32 for deep queues, else 16)")
    s.add_argument("--save_images", type=str, default="False")
    s.add_argument("--filter_CAA_detections_by_model", type=str, default="True")
    s.add_argument("--caa_model_pickle", type=str,
                   default="pickles/model_all_fold_3_thresholding_2_l2.pkl")
    s.add_argument("--caa_normalization", type=str, default="pickles/normalization.npy")
    s.add_argument("--top_caa_wsis", type=int, default=None)
    s.add_argument("--top_caa_counts_pickle", type=str, default=None)
    s.add_argument("--cross_tile_merge", type=str, default="False",
                   help="merge detections across adjacent tile boundaries "
                        "(new capability; the reference double-counts "
                        "boundary-straddling plaques)")
    s.add_argument("--data_parallel", type=int, default=None,
                   help="shard inference batches over an N-chip dp mesh")
    s.add_argument("--precision", type=str, default=None,
                   choices=["int8_early", "int8_full"],
                   help="int8 flavor for --fast_path (default int8_early)")
    s.add_argument("--calib_percentile", type=float, default=None,
                   help="int8 activation-scale statistic for --fast_path: "
                        "omit = amax; e.g. 99.9 = that percentile of "
                        "|acts|, computed per probe batch and max-"
                        "combined (streaming upper bound, errs toward "
                        "amax; tools/int8_calib_study.py)")
    s.add_argument("--fast_path", type=str, default="False",
                   help="int8 early backbone + lazy decode + approx top-k "
                        "(gated fast stack; ~40%% faster, non-parity)")
    s.add_argument("--background_skip", type=str, default="False",
                   help="skip background tiles before full-size decode "
                        "(file-size stage + decode-confirm stage; the host "
                        "decode is the sweep bottleneck). Accuracy-gated "
                        "opt-in: tools/background_gate.py")
    s.add_argument("--background_max_bpp", type=float, default=None,
                   help="stage-1 candidate threshold, bytes/pixel "
                        "(default 0.05)")
    s.add_argument("--background_min_tissue", type=float, default=None,
                   help="stage-2 skip threshold, tissue fraction "
                        "(default 0.02)")
    s.add_argument("--nms_pool", type=int, default=None,
                   help="raise the NMS candidate pool + detection capacity "
                        "(default 64); overflow warnings tell you when to")
    s.set_defaults(fn=cmd_sweep)

    c = sub.add_parser("crop")
    c.add_argument("--wsi_dirs", nargs="+", required=True)
    c.add_argument("--save_dir", type=str, default="data/CERAD/1536_tiles/")
    c.add_argument("--temp_map_pickle", type=str, default="pickles/temporary_WSI_map.pkl")
    c.add_argument("--min_tissue_fraction", type=float, default=0.0,
                   help="crop-time background suppression: tiles below this "
                        "tissue fraction are never written (0 = reference "
                        "behavior; PIL tiler path only — dzsave trees use "
                        "the sweep-time prefilter). Gate: "
                        "tools/background_gate.py")
    c.set_defaults(fn=cmd_crop)

    x = sub.add_parser("export")
    x.add_argument("--model_def", type=str, default=None,
                   help="darknet cfg to build the graph from (e.g. a re-anchored cfg; default: the native 2-class builder)")
    x.add_argument("--src", type=str, required=True,
                   help="orbax dir | .pth | darknet .weights")
    x.add_argument("--dst", type=str, required=True)
    x.add_argument("--seen", type=int, default=0)
    x.set_defaults(fn=cmd_export)

    cl = sub.add_parser("clear")
    cl.add_argument("--output_dir", type=str, default="output/")
    cl.set_defaults(fn=cmd_clear)

    b = sub.add_parser("bench")
    b.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
