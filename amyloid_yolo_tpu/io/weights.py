"""Weight import/export: darknet binaries, torch ``.pth`` state dicts, orbax.

Parity targets:

* ``Darknet.load_darknet_weights`` / ``save_darknet_weights``
  (``/root/reference/models.py:257-336``): int32[5] header (``seen`` at
  index 3), then a flat float32 stream per convolutional block — BN blocks
  store [bn_bias, bn_weight, running_mean, running_var] then conv weights
  (OIHW); BN-free blocks store [conv_bias] then conv weights.  The
  backbone-only cutoff (75 blocks when the filename contains
  ``darknet53.conv.74``) is honored.
* ``.pth`` checkpoints produced by the reference trainer
  (``train.py:205-206``) — torch state_dicts keyed
  ``module_list.{i}.conv_{i}.weight`` etc.  Torch (CPU) is used only for
  deserialization, never in the compute path, and is imported lazily.

Our canonical checkpoint format is orbax (:func:`save_checkpoint` /
:func:`load_checkpoint`) storing params + BN stats + optimizer state — the
reference never checkpoints optimizer state (SURVEY §5), we do.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..graphspec import ConvSpec, GraphSpec


def _conv_layers(spec: GraphSpec, cutoff: Optional[int]):
    for i in spec.conv_indices:
        if cutoff is not None and i >= cutoff:
            break
        yield i, spec.layers[i]


def load_darknet_weights(spec: GraphSpec, path: str, params: Optional[Dict] = None
                         ) -> Tuple[Dict, np.ndarray]:
    """Read a raw darknet weight file into (params, header).

    If ``params`` is given it is used as the base (missing tail layers keep
    their values — the backbone-only case); otherwise all layers must be
    covered by the file.
    """
    with open(path, "rb") as fh:
        header = np.fromfile(fh, dtype=np.int32, count=5)
        weights = np.fromfile(fh, dtype=np.float32)

    cutoff = 75 if "darknet53.conv.74" in os.path.basename(path) else None
    out: Dict[str, Dict[str, jnp.ndarray]] = (
        {k: dict(v) for k, v in params.items()} if params else {}
    )
    ptr = 0
    for i, layer in _conv_layers(spec, cutoff):
        assert isinstance(layer, ConvSpec)
        oc = layer.out_ch
        if layer.batch_normalize:
            bn_b = weights[ptr:ptr + oc]; ptr += oc
            bn_w = weights[ptr:ptr + oc]; ptr += oc
            bn_rm = weights[ptr:ptr + oc]; ptr += oc
            bn_rv = weights[ptr:ptr + oc]; ptr += oc
            out[f"bn_{i}"] = {
                "scale": jnp.asarray(bn_w), "bias": jnp.asarray(bn_b),
                "mean": jnp.asarray(bn_rm), "var": jnp.asarray(bn_rv),
            }
            entry = {}
        else:
            cb = weights[ptr:ptr + oc]; ptr += oc
            entry = {"b": jnp.asarray(cb)}
        num_w = oc * layer.in_ch * layer.kernel * layer.kernel
        w = weights[ptr:ptr + num_w]; ptr += num_w
        # darknet stores OIHW; our layout is HWIO
        w = w.reshape(oc, layer.in_ch, layer.kernel, layer.kernel).transpose(2, 3, 1, 0)
        entry["w"] = jnp.asarray(np.ascontiguousarray(w))
        out[f"conv_{i}"] = entry
    if ptr != len(weights) and cutoff is None:
        raise ValueError(f"weight file size mismatch: consumed {ptr} of {len(weights)}")
    return out, header


def save_darknet_weights(spec: GraphSpec, params: Dict, path: str,
                         seen: int = 0, cutoff: int = -1) -> None:
    """Write params in darknet binary format (parity ``models.py:310-336``)."""
    header = np.array([0, 0, 0, seen, 0], dtype=np.int32)
    layer_limit = None if cutoff == -1 else cutoff
    with open(path, "wb") as fh:
        header.tofile(fh)
        for i, layer in _conv_layers(spec, layer_limit):
            if layer.batch_normalize:
                bn = params[f"bn_{i}"]
                np.asarray(bn["bias"], np.float32).tofile(fh)
                np.asarray(bn["scale"], np.float32).tofile(fh)
                np.asarray(bn["mean"], np.float32).tofile(fh)
                np.asarray(bn["var"], np.float32).tofile(fh)
            else:
                np.asarray(params[f"conv_{i}"]["b"], np.float32).tofile(fh)
            w = np.asarray(params[f"conv_{i}"]["w"], np.float32)
            w.transpose(3, 2, 0, 1).tofile(fh)  # HWIO -> OIHW


def load_torch_state_dict(spec: GraphSpec, path: str) -> Dict:
    """Import a reference ``.pth`` checkpoint (torch state_dict).

    Key layout produced by the reference model builder:
    ``module_list.{i}.conv_{i}.weight`` (+``.bias`` for BN-free convs) and
    ``module_list.{i}.batch_norm_{i}.{weight,bias,running_mean,running_var}``.
    """
    import torch  # lazy: host-side deserialization only

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return torch_state_dict_to_params(spec, {k: v.numpy() for k, v in sd.items()})


def torch_state_dict_to_params(spec: GraphSpec, sd: Dict[str, np.ndarray]) -> Dict:
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for i in spec.conv_indices:
        layer: ConvSpec = spec.layers[i]  # type: ignore[assignment]
        w = sd[f"module_list.{i}.conv_{i}.weight"]
        entry = {"w": jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0)))}
        if layer.batch_normalize:
            prefix = f"module_list.{i}.batch_norm_{i}"
            params[f"bn_{i}"] = {
                "scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"]),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                "var": jnp.asarray(sd[f"{prefix}.running_var"]),
            }
        else:
            entry["b"] = jnp.asarray(sd[f"module_list.{i}.conv_{i}.bias"])
        params[f"conv_{i}"] = entry
    return params


def params_to_torch_state_dict(spec: GraphSpec, params: Dict) -> Dict[str, np.ndarray]:
    """Export params in the reference's state_dict key layout (numpy values),
    enabling round-trips back into the reference codebase."""
    sd: Dict[str, np.ndarray] = {}
    for i in spec.conv_indices:
        layer: ConvSpec = spec.layers[i]  # type: ignore[assignment]
        w = np.asarray(params[f"conv_{i}"]["w"], np.float32)
        sd[f"module_list.{i}.conv_{i}.weight"] = np.ascontiguousarray(w.transpose(3, 2, 0, 1))
        if layer.batch_normalize:
            bn = params[f"bn_{i}"]
            prefix = f"module_list.{i}.batch_norm_{i}"
            sd[f"{prefix}.weight"] = np.asarray(bn["scale"], np.float32)
            sd[f"{prefix}.bias"] = np.asarray(bn["bias"], np.float32)
            sd[f"{prefix}.running_mean"] = np.asarray(bn["mean"], np.float32)
            sd[f"{prefix}.running_var"] = np.asarray(bn["var"], np.float32)
            sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)
        else:
            sd[f"module_list.{i}.conv_{i}.bias"] = np.asarray(params[f"conv_{i}"]["b"], np.float32)
    return sd


def load_pretrained(spec: GraphSpec, path: str, params: Optional[Dict] = None) -> Dict:
    """Dispatch on extension like the reference CLIs (``train.py:64-68``).

    An orbax directory path may carry an ``#ema`` suffix
    (``checkpoints/yolov3_ckpt_41#ema``) to select the checkpoint's
    EMA-of-weights tree (``ema_params``, written when training ran with
    ``--ema_decay``) instead of the raw params — usable from every weights
    surface (train ``--pretrained_weights``, detect/test ``--weights_path``,
    the gate and parity-study tools).
    """
    use_ema = path.endswith("#ema")
    if use_ema:
        path = path[: -len("#ema")]
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"weights file not found: {path!r} (expected a darknet binary, "
            f"a torch .pth/.pt/.pkl state dict, or an orbax directory)")
    if os.path.isdir(path):
        # orbax checkpoint directory (a Trainer save): params-only restore —
        # matches the reference's --pretrained_weights semantics, which
        # reload weights but never optimizer state (train.py:64-68).  Use
        # --resume instead to also restore optimizer state.  The #ema
        # selection lives in ONE place (load_ckpt_params) so every
        # checkpoint surface keeps identical semantics.
        return load_ckpt_params(path + ("#ema" if use_ema else ""))
    if use_ema:
        raise ValueError(
            f"'#ema' selects the EMA tree of an orbax checkpoint directory; "
            f"{path!r} is not a directory")
    if path.endswith(".pth") or path.endswith(".pt") or path.endswith(".pkl"):
        return load_torch_state_dict(spec, path)
    loaded, _ = load_darknet_weights(spec, path, params)
    return loaded


def load_ckpt_params(path: str):
    """Params tree of an orbax checkpoint directory, honoring the ``#ema``
    suffix (select the EMA-of-weights tree saved by ``--ema_decay`` runs).
    Shared by the gate / parity-study / export tools so every checkpoint
    surface accepts ``<dir>#ema``."""
    use_ema = path.endswith("#ema")
    if use_ema:
        path = path[: -len("#ema")]
    tree = load_checkpoint(path)
    if use_ema:
        if not (isinstance(tree, dict) and tree.get("ema_params") is not None):
            raise KeyError(
                f"{path!r} has no 'ema_params' tree — it was saved by a run "
                f"without --ema_decay")
        return tree["ema_params"]
    return tree["params"] if isinstance(tree, dict) and "params" in tree else tree


# -- orbax native checkpoints ------------------------------------------------

def save_checkpoint(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)


def load_checkpoint(path: str):
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    apath = os.path.abspath(path)
    try:
        return ckptr.restore(apath)
    except Exception:
        # restoring on a different device topology than the save (e.g. CLI
        # process vs 8-device test mesh): restore as host numpy arrays,
        # which any caller can re-place
        meta = ckptr.metadata(apath)
        tree = getattr(meta, "item_metadata", meta)
        if hasattr(tree, "tree"):
            tree = tree.tree
        restore_args = jax.tree.map(
            lambda _m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(apath, restore_args=restore_args)


__all__ = [
    "load_darknet_weights", "save_darknet_weights", "load_torch_state_dict",
    "torch_state_dict_to_params", "params_to_torch_state_dict",
    "load_pretrained", "save_checkpoint", "load_checkpoint",
]
