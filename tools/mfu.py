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
    from amyloid_yolo_tpu.graphspec import (ConvSpec, RouteSpec,
                                            UpsampleSpec)

    sizes = {}
    total_macs = 0
    cur = img
    for i, layer in enumerate(spec.layers):
        if isinstance(layer, ConvSpec):
            cur = cur // layer.stride
            total_macs += (cur * cur) * layer.out_ch * layer.in_ch \
                * layer.kernel * layer.kernel
        elif isinstance(layer, UpsampleSpec):
            cur = cur * layer.factor
        elif isinstance(layer, RouteSpec):
            cur = sizes[layer.layers[0]]
        sizes[i] = cur
    return 2.0 * total_macs / 1e9


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=416)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ms", type=float, nargs="*",
                    default=[12.65, 12.29, 9.32, 8.88])
    args = ap.parse_args()

    from amyloid_yolo_tpu.graphspec import yolov3_spec

    spec = yolov3_spec(num_classes=2)
    g = conv_gflops(spec, args.img)
    print(f"conv GFLOPs/image @ {args.img}²: {g:.1f}  "
          f"(batch {args.batch}: {g * args.batch / 1e3:.3f} TFLOP)")
    for ms in args.ms:
        tflops = g * args.batch / (ms / 1e3) / 1e3
        print(f"  {ms:6.2f} ms/batch → {tflops:6.1f} TFLOP/s "
              f"= {tflops / V5E_BF16_TFLOPS * 100:5.1f}% of v5e bf16 peak")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
