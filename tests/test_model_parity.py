"""Numerical parity of the JAX model against an independent torch oracle.

Shared random weights, same inputs; the JAX forward (NHWC) must match the
torch forward (NCHW) to float32 tolerance at every yolo head, the decode
must match the reference decode equations, and BN-folded inference must
match unfolded eval.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from amyloid_yolo_tpu.models import darknet, heads
from amyloid_yolo_tpu.graphspec import YoloSpec

from minispec import mini_spec
import torch_mirror as tm


@pytest.fixture(scope="module")
def setup():
    spec = mini_spec(num_classes=2, img_size=64)
    params = darknet.init_params(jax.random.PRNGKey(7), spec)
    tp = tm.params_to_torch(params)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    return spec, params, tp, x


def test_forward_heads_match_torch(setup):
    spec, params, tp, x = setup
    maps, _ = darknet.apply(params, spec, jnp.asarray(x))
    t_heads = tm.forward_heads(spec, tp, torch.from_numpy(x.transpose(0, 3, 1, 2)).double())
    assert len(maps) == len(t_heads) == 3
    for jm, th in zip(maps, t_heads):
        ref = th.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        np.testing.assert_allclose(np.asarray(jm), ref, rtol=2e-4, atol=2e-5)


def test_decode_matches_torch(setup):
    spec, params, tp, x = setup
    maps, _ = darknet.apply(params, spec, jnp.asarray(x))
    out = heads.decode_all(maps, spec, 64)
    t_heads = tm.forward_heads(spec, tp, torch.from_numpy(x.transpose(0, 3, 1, 2)).double())
    yolos = [l for l in spec.layers if isinstance(l, YoloSpec)]
    t_out = torch.cat(
        [tm.decode_head(h, y, 64) for h, y in zip(t_heads, yolos)], dim=1
    ).numpy()
    assert out.shape == t_out.shape
    np.testing.assert_allclose(np.asarray(out), t_out, rtol=2e-4, atol=2e-4)


def test_bn_folding_matches_eval(setup):
    spec, params, tp, x = setup
    maps, _ = darknet.apply(params, spec, jnp.asarray(x))
    folded = darknet.fold_batchnorm(params, spec)
    maps_f = darknet.apply_folded(folded, spec, jnp.asarray(x), compute_dtype=jnp.float32)
    for a, b in zip(maps, maps_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_bf16_inference_close(setup):
    spec, params, _, x = setup
    maps, _ = darknet.apply(params, spec, jnp.asarray(x))
    folded = darknet.fold_batchnorm(params, spec)
    maps_bf = darknet.apply_folded(folded, spec, jnp.asarray(x), compute_dtype=jnp.bfloat16)
    # bf16 has ~3 decimal digits; activations here are O(1)
    for a, b in zip(maps, maps_bf):
        diff = np.abs(np.asarray(a) - np.asarray(b, np.float32))
        assert np.median(diff) < 0.05


def test_batchnorm_train_stats_update(setup):
    spec, params, tp, x = setup
    _, new_stats = darknet.apply(params, spec, jnp.asarray(x), train=True)
    # check one BN layer against torch's update rule on the same conv output
    i = spec.conv_indices[0]
    w = tp[f"conv_{i}.w"]
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2)).double()
    out = torch.nn.functional.conv2d(tx, w, stride=1, padding=1)
    bn = torch.nn.BatchNorm2d(out.shape[1], momentum=0.9, eps=1e-5).double()
    with torch.no_grad():
        bn.weight.copy_(tp[f"bn_{i}.scale"])
        bn.bias.copy_(tp[f"bn_{i}.bias"])
    bn.train()
    bn(out)
    # f32 sequential reductions over B*H*W elements accumulate ~1e-4
    # absolute error vs the f64 oracle; semantics are what is under test
    np.testing.assert_allclose(
        np.asarray(new_stats[f"bn_{i}"]["mean"]),
        bn.running_mean.numpy(), rtol=1e-2, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(new_stats[f"bn_{i}"]["var"]),
        bn.running_var.numpy(), rtol=1e-2, atol=1e-3,
    )
