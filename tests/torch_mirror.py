"""Independent PyTorch mirror of the YOLOv3 reference semantics, for parity tests.

This is TEST HARNESS code only — nothing here is imported by the framework.
It re-derives the reference's math (conv/BN/leaky stacks, grid decode, loss
reductions, target assignment) directly from torch primitives so that the
JAX implementation can be checked numerically against an independent oracle
with shared random weights.  Structured differently from the reference on
purpose: it consumes our GraphSpec instead of interpreting cfg blocks.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np
import torch
import torch.nn.functional as F

from amyloid_yolo_tpu.graphspec import (
    ConvSpec, GraphSpec, MaxPoolSpec, RouteSpec, ShortcutSpec, UpsampleSpec,
    YoloSpec,
)

BN_EPS = 1e-5


def params_to_torch(params) -> Dict[str, torch.Tensor]:
    """Convert our HWIO jnp params into torch OIHW tensors."""
    out: Dict[str, torch.Tensor] = {}
    for key, entry in params.items():
        for name, val in entry.items():
            arr = np.asarray(val)
            if name == "w":
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            out[f"{key}.{name}"] = torch.from_numpy(np.ascontiguousarray(arr)).double()
    return out


@torch.no_grad()
def forward_heads(spec: GraphSpec, tp: Dict[str, torch.Tensor], x: torch.Tensor) -> List[torch.Tensor]:
    """Eval-mode forward; returns raw NCHW maps at each yolo layer."""
    outputs: List[torch.Tensor] = []
    heads: List[torch.Tensor] = []
    cur = x
    for i, layer in enumerate(spec.layers):
        if isinstance(layer, ConvSpec):
            w = tp[f"conv_{i}.w"]
            cur = F.conv2d(cur, w, stride=layer.stride, padding=layer.pad)
            if layer.batch_normalize:
                mean = tp[f"bn_{i}.mean"]
                var = tp[f"bn_{i}.var"]
                g = tp[f"bn_{i}.scale"]
                b = tp[f"bn_{i}.bias"]
                cur = (cur - mean[None, :, None, None]) / torch.sqrt(
                    var[None, :, None, None] + BN_EPS
                ) * g[None, :, None, None] + b[None, :, None, None]
            else:
                cur = cur + tp[f"conv_{i}.b"][None, :, None, None]
            if layer.activation == "leaky":
                cur = F.leaky_relu(cur, 0.1)
        elif isinstance(layer, MaxPoolSpec):
            if layer.kernel == 2 and layer.stride == 1:
                cur = F.pad(cur, (0, 1, 0, 1))
                cur = F.max_pool2d(cur, 2, 1)
            else:
                cur = F.max_pool2d(cur, layer.kernel, layer.stride,
                                   padding=(layer.kernel - 1) // 2)
        elif isinstance(layer, UpsampleSpec):
            cur = F.interpolate(cur, scale_factor=layer.factor, mode="nearest")
        elif isinstance(layer, RouteSpec):
            cur = torch.cat([outputs[s] for s in layer.layers], dim=1)
        elif isinstance(layer, ShortcutSpec):
            cur = outputs[-1] + outputs[layer.from_index]
        elif isinstance(layer, YoloSpec):
            heads.append(cur)
        outputs.append(cur)
    return heads


@torch.no_grad()
def decode_head(raw: torch.Tensor, yolo: YoloSpec, img_dim: int) -> torch.Tensor:
    """Reference-equation inference decode → (B, A*g*g, 5+C)."""
    b, _, g, _ = raw.shape
    na = len(yolo.anchors)
    nch = 5 + yolo.num_classes
    stride = img_dim / g
    pred = raw.view(b, na, nch, g, g).permute(0, 1, 3, 4, 2).contiguous()
    x = torch.sigmoid(pred[..., 0])
    y = torch.sigmoid(pred[..., 1])
    w = pred[..., 2]
    h = pred[..., 3]
    conf = torch.sigmoid(pred[..., 4])
    cls = torch.sigmoid(pred[..., 5:])
    grid = torch.arange(g, dtype=pred.dtype)
    gx = grid.repeat(g, 1).view(1, 1, g, g)
    gy = grid.repeat(g, 1).t().view(1, 1, g, g)
    anchors = torch.tensor(yolo.anchors, dtype=pred.dtype) / stride
    bx = x + gx
    by = y + gy
    bw = torch.exp(w) * anchors[:, 0].view(1, na, 1, 1)
    bh = torch.exp(h) * anchors[:, 1].view(1, na, 1, 1)
    boxes = torch.stack([bx, by, bw, bh], dim=-1) * stride
    out = torch.cat([boxes, conf.unsqueeze(-1), cls], dim=-1)
    return out.view(b, -1, nch)


def build_targets_torch(pred_boxes, pred_cls, target, anchors, ignore_thres):
    """Torch-CPU re-derivation of the reference target assignment
    (``utils/utils.py:276-330`` semantics, last-writer-wins)."""
    nB, nA, nG = pred_boxes.shape[0], pred_boxes.shape[1], pred_boxes.shape[2]
    nC = pred_cls.shape[-1]
    dt = pred_boxes.dtype

    obj_mask = torch.zeros(nB, nA, nG, nG, dtype=torch.bool)
    noobj_mask = torch.ones(nB, nA, nG, nG, dtype=torch.bool)
    class_mask = torch.zeros(nB, nA, nG, nG, dtype=dt)
    iou_scores = torch.zeros(nB, nA, nG, nG, dtype=dt)
    tx = torch.zeros(nB, nA, nG, nG, dtype=dt)
    ty = torch.zeros(nB, nA, nG, nG, dtype=dt)
    tw = torch.zeros(nB, nA, nG, nG, dtype=dt)
    th = torch.zeros(nB, nA, nG, nG, dtype=dt)
    tcls = torch.zeros(nB, nA, nG, nG, nC, dtype=dt)

    tb = target[:, 2:6] * nG
    gxy = tb[:, :2]
    gwh = tb[:, 2:]

    def wh_iou(anchor, wh):
        w1, h1 = anchor
        w2, h2 = wh[:, 0], wh[:, 1]
        inter = torch.min(w1, w2) * torch.min(h1, h2)
        return inter / (w1 * h1 + 1e-16 + w2 * h2 - inter)

    target = target.to(dt)
    tb = tb.to(dt)
    gxy = gxy.to(dt)
    gwh = gwh.to(dt)
    ious = torch.stack([wh_iou(a, gwh) for a in anchors])
    best_ious, best_n = ious.max(0)
    b, labels = target[:, :2].long().t()
    gx, gy = gxy.t()
    gw, gh = gwh.t()
    gi, gj = gxy.long().t()
    obj_mask[b, best_n, gj, gi] = 1
    noobj_mask[b, best_n, gj, gi] = 0
    for i, anchor_ious in enumerate(ious.t()):
        noobj_mask[b[i], anchor_ious > ignore_thres, gj[i], gi[i]] = 0
    tx[b, best_n, gj, gi] = gx - gx.floor()
    ty[b, best_n, gj, gi] = gy - gy.floor()
    tw[b, best_n, gj, gi] = torch.log(gw / anchors[best_n][:, 0] + 1e-16)
    th[b, best_n, gj, gi] = torch.log(gh / anchors[best_n][:, 1] + 1e-16)
    tcls[b, best_n, gj, gi, labels] = 1
    class_mask[b, best_n, gj, gi] = (
        pred_cls[b, best_n, gj, gi].argmax(-1) == labels).to(dt)

    def box_iou_xywh(b1, b2):
        b1x1, b1x2 = b1[:, 0] - b1[:, 2] / 2, b1[:, 0] + b1[:, 2] / 2
        b1y1, b1y2 = b1[:, 1] - b1[:, 3] / 2, b1[:, 1] + b1[:, 3] / 2
        b2x1, b2x2 = b2[:, 0] - b2[:, 2] / 2, b2[:, 0] + b2[:, 2] / 2
        b2y1, b2y2 = b2[:, 1] - b2[:, 3] / 2, b2[:, 1] + b2[:, 3] / 2
        ix1 = torch.max(b1x1, b2x1)
        iy1 = torch.max(b1y1, b2y1)
        ix2 = torch.min(b1x2, b2x2)
        iy2 = torch.min(b1y2, b2y2)
        inter = (ix2 - ix1 + 1).clamp(0) * (iy2 - iy1 + 1).clamp(0)
        a1 = (b1x2 - b1x1 + 1) * (b1y2 - b1y1 + 1)
        a2 = (b2x2 - b2x1 + 1) * (b2y2 - b2y1 + 1)
        return inter / (a1 + a2 - inter + 1e-16)

    iou_scores[b, best_n, gj, gi] = box_iou_xywh(pred_boxes[b, best_n, gj, gi], tb)
    tconf = obj_mask.to(dt)
    return iou_scores, class_mask, obj_mask, noobj_mask, tx, ty, tw, th, tcls, tconf


def yolo_head_loss_torch(raw: torch.Tensor, yolo: YoloSpec, img_dim: int,
                         target: torch.Tensor):
    """Reference loss math for one head (``models.py:171-191``)."""
    b, _, g, _ = raw.shape
    na = len(yolo.anchors)
    nch = 5 + yolo.num_classes
    stride = img_dim / g
    pred = raw.view(b, na, nch, g, g).permute(0, 1, 3, 4, 2).contiguous()
    x = torch.sigmoid(pred[..., 0])
    y = torch.sigmoid(pred[..., 1])
    w = pred[..., 2]
    h = pred[..., 3]
    conf = torch.sigmoid(pred[..., 4])
    cls = torch.sigmoid(pred[..., 5:])
    anchors = torch.tensor(yolo.anchors, dtype=pred.dtype) / stride
    grid = torch.arange(g, dtype=pred.dtype)
    gx = grid.repeat(g, 1).view(1, 1, g, g)
    gy = grid.repeat(g, 1).t().view(1, 1, g, g)
    pred_boxes = torch.stack(
        [x + gx, y + gy,
         torch.exp(w) * anchors[:, 0].view(1, na, 1, 1),
         torch.exp(h) * anchors[:, 1].view(1, na, 1, 1)], dim=-1)

    (iou_scores, class_mask, obj_mask, noobj_mask,
     tx, ty, tw, th, tcls, tconf) = build_targets_torch(
        pred_boxes, cls, target, anchors, yolo.ignore_thres)

    mse = torch.nn.MSELoss()
    bce = torch.nn.BCELoss()
    loss_x = mse(x[obj_mask], tx[obj_mask])
    loss_y = mse(y[obj_mask], ty[obj_mask])
    loss_w = mse(w[obj_mask], tw[obj_mask])
    loss_h = mse(h[obj_mask], th[obj_mask])
    loss_conf_obj = bce(conf[obj_mask], tconf[obj_mask])
    loss_conf_noobj = bce(conf[noobj_mask], tconf[noobj_mask])
    loss_conf = yolo.obj_scale * loss_conf_obj + yolo.noobj_scale * loss_conf_noobj
    loss_cls = bce(cls[obj_mask], tcls[obj_mask])
    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    return {
        "total": total, "x": loss_x, "y": loss_y, "w": loss_w, "h": loss_h,
        "conf": loss_conf, "cls": loss_cls,
        "obj_mask": obj_mask, "noobj_mask": noobj_mask,
        "tx": tx, "ty": ty, "tw": tw, "th": th, "tcls": tcls,
        "iou_scores": iou_scores, "class_mask": class_mask,
    }
