"""Model FLOP accounting + MFU for the measured pipeline numbers.

Walks the GraphSpec and counts conv multiply-adds at the inference
resolution (the reference model's compute is ~entirely convs —
``models.py:237-255``), then reports model FLOPs utilization against the
v5e peak for each measured ms/batch you pass.

Usage:
    python tools/mfu.py [--img 416] [--batch 16] [--ms 12.65 9.32 8.88]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0  # peak, one chip
V5E_INT8_TOPS = 394.0


def conv_gflops(spec, img: int) -> float:
    """Forward conv GFLOPs per image (MACs × 2)."""
    from amyloid_yolo_tpu.graphspec import (ConvSpec, MaxPoolSpec, RouteSpec,
                                            UpsampleSpec)

    sizes = {}
    total_macs = 0
    cur = img
    for i, layer in enumerate(spec.layers):
        if isinstance(layer, ConvSpec):
            cur = cur // layer.stride
            total_macs += (cur * cur) * layer.out_ch * layer.in_ch \
                * layer.kernel * layer.kernel
        elif isinstance(layer, MaxPoolSpec):
            cur = cur // layer.stride  # tiny-YOLO cfgs downsample by pooling
        elif isinstance(layer, UpsampleSpec):
            cur = cur * layer.factor
        elif isinstance(layer, RouteSpec):
            cur = sizes[layer.layers[0]]
        sizes[i] = cur
    return 2.0 * total_macs / 1e9


def train_gflops(spec, img: int) -> float:
    """Train-step conv GFLOPs per image: forward + backward.

    Backward of a conv is two conv-shaped contractions of the same MAC
    count each (dL/dx: grads ⊛ w^T; dL/dw: x ⊛ grads), so fwd+bwd ≈ 3×
    forward.  Layer 0's dL/dx is never needed (x is the input) — at 416²
    that term is 416²·27·32 MACs, subtracted for honesty though it is
    <0.1% of the total.  BN/leaky/loss are elementwise noise next to the
    convs.
    """
    from amyloid_yolo_tpu.graphspec import ConvSpec

    fwd = conv_gflops(spec, img)
    l0 = spec.layers[0]
    l0_g = 0.0
    if isinstance(l0, ConvSpec):
        cur = img // l0.stride
        l0_g = 2.0 * (cur * cur) * l0.out_ch * l0.in_ch \
            * l0.kernel * l0.kernel / 1e9
    return 3.0 * fwd - l0_g


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=416)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ms", type=float, nargs="*", default=None,
                    help="ms/batch rates (default: the BENCH.md inference "
                         "table; empty in --train mode)")
    ap.add_argument("--train", action="store_true",
                    help="account a train step (fwd+bwd ≈ 3× fwd conv "
                         "FLOPs) instead of inference; pass --ms as "
                         "ms/step or --imgs_per_sec")
    ap.add_argument("--imgs_per_sec", type=float, nargs="*", default=[],
                    help="train-throughput alternative to --ms")
    args = ap.parse_args()

    from amyloid_yolo_tpu.graphspec import yolov3_spec

    spec = yolov3_spec(num_classes=2)
    if args.train:
        g = train_gflops(spec, args.img)
        print(f"train-step conv GFLOPs/image @ {args.img}² (fwd+bwd): "
              f"{g:.1f}  (batch {args.batch}: {g * args.batch / 1e3:.3f} "
              f"TFLOP)")
        rates = list(args.ms or [])
        for ips in args.imgs_per_sec:
            rates.append(args.batch / ips * 1e3)
    else:
        g = conv_gflops(spec, args.img)
        print(f"conv GFLOPs/image @ {args.img}²: {g:.1f}  "
              f"(batch {args.batch}: {g * args.batch / 1e3:.3f} TFLOP)")
        rates = list(args.ms if args.ms is not None
                     else [12.65, 12.29, 9.32, 8.88])
    for ms in rates:
        tflops = g * args.batch / (ms / 1e3) / 1e3
        print(f"  {ms:6.2f} ms/batch → {tflops:6.1f} TFLOP/s "
              f"= {tflops / V5E_BF16_TFLOPS * 100:5.1f}% of v5e bf16 peak")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
