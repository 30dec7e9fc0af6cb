"""The "consensus-of-2" secondary CNN classifier, in JAX.

Parity target: ``Net`` (``/root/reference/core.py:161-208``): six
conv3×3(pad 1) + BN + ReLU + maxpool2 stages with widths
16→32→48→64→80→96 over 256² RGB crops, then a single linear layer
96·4·4 → 3 multilabel logits (cored, diffuse, CAA); predictions are
sigmoids (``getClassPreds``, ``core.py:210-221``).

The reference consumes this model as a *pickled pretrained torch module*
(``pickles/model_all_fold_3_thresholding_2_l2.pkl``) and re-loads it from
disk for every image (``core.py:432``); here it is a functional NHWC JAX
model loaded once, with a torch-pickle importer for the published weights,
and the CAA filter batches every crop of a tile through it in one device
call.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

STAGE_WIDTHS = (16, 32, 48, 64, 80, 96)
BN_EPS = 1e-5
NUM_CLASSES = 3


def init_params(rng: jax.Array) -> Dict[str, Dict[str, jnp.ndarray]]:
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    in_ch = 3
    for i, out_ch in enumerate(STAGE_WIDTHS):
        rng, k1, k2 = jax.random.split(rng, 3)
        fan_in = 3 * 3 * in_ch
        params[f"conv_{i}"] = {
            "w": jax.random.normal(k1, (3, 3, in_ch, out_ch)) * np.sqrt(2.0 / fan_in),
            "b": jnp.zeros((out_ch,)),
        }
        params[f"bn_{i}"] = {
            "scale": jnp.ones((out_ch,)),
            "bias": jnp.zeros((out_ch,)),
            "mean": jnp.zeros((out_ch,)),
            "var": jnp.ones((out_ch,)),
        }
        in_ch = out_ch
    rng, k = jax.random.split(rng)
    params["fc"] = {
        "w": jax.random.normal(k, (96 * 4 * 4, NUM_CLASSES)) * 0.01,
        "b": jnp.zeros((NUM_CLASSES,)),
    }
    return params


def apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """Forward (eval mode): NHWC float input (B, 256, 256, 3) → (B, 3) logits."""
    for i in range(len(STAGE_WIDTHS)):
        w = params[f"conv_{i}"]["w"]
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv_{i}"]["b"]
        bn = params[f"bn_{i}"]
        x = (x - bn["mean"]) * jax.lax.rsqrt(bn["var"] + BN_EPS) * bn["scale"] + bn["bias"]
        x = jnp.maximum(x, 0.0)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID",
        )
    # torch flattens NCHW (C, H, W) order — transpose before reshape so the
    # FC weight layout matches imported torch weights
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
    return x @ params["fc"]["w"] + params["fc"]["b"]


def predict_probs(params, x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid multilabel probabilities (cored, diffuse, CAA)."""
    return jax.nn.sigmoid(apply(params, x))


def from_torch_pickle(path: str):
    """Import the reference's pickled torch ``Net`` module."""
    import torch

    mod = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}
    return from_torch_state_dict(sd)


def from_torch_state_dict(sd: Dict[str, np.ndarray]):
    """Map torch ``features.{idx}`` / ``classifier.0`` keys to our tree.

    The torch Sequential indices per stage i are conv=4i, bn=4i+1
    (conv, bn, relu, maxpool blocks of 4).
    """
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for i in range(len(STAGE_WIDTHS)):
        cw = sd[f"features.{4 * i}.weight"]
        cb = sd[f"features.{4 * i}.bias"]
        params[f"conv_{i}"] = {
            "w": jnp.asarray(np.ascontiguousarray(cw.transpose(2, 3, 1, 0))),
            "b": jnp.asarray(cb),
        }
        params[f"bn_{i}"] = {
            "scale": jnp.asarray(sd[f"features.{4 * i + 1}.weight"]),
            "bias": jnp.asarray(sd[f"features.{4 * i + 1}.bias"]),
            "mean": jnp.asarray(sd[f"features.{4 * i + 1}.running_mean"]),
            "var": jnp.asarray(sd[f"features.{4 * i + 1}.running_var"]),
        }
    params["fc"] = {
        "w": jnp.asarray(sd["classifier.0.weight"].T),
        "b": jnp.asarray(sd["classifier.0.bias"]),
    }
    return params


def load_normalization(path: Optional[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Load the reference's ``normalization.npy`` mean/std dict
    (``core.py:49``); fall back to an identity normalization when the
    artifact is unavailable (it is a git-LFS stub in the mount)."""
    if path is not None:
        try:
            d = np.load(path, allow_pickle=True).item()
            return jnp.asarray(d["mean"], jnp.float32), jnp.asarray(d["std"], jnp.float32)
        except Exception:
            pass
    return jnp.zeros((3,), jnp.float32), jnp.ones((3,), jnp.float32)


__all__ = [
    "init_params", "apply", "predict_probs", "from_torch_pickle",
    "from_torch_state_dict", "load_normalization", "STAGE_WIDTHS",
]
