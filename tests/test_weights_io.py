"""Weight I/O round trips: darknet binary, torch state_dict, orbax."""

import numpy as np
import jax
import pytest

from amyloid_yolo_tpu.io import weights as W
from amyloid_yolo_tpu.models import darknet

from minispec import mini_spec


@pytest.fixture(scope="module")
def spec_params():
    spec = mini_spec()
    params = darknet.init_params(jax.random.PRNGKey(3), spec)
    return spec, params


def tree_equal(a, b):
    for k in a:
        for kk in a[k]:
            np.testing.assert_allclose(
                np.asarray(a[k][kk]), np.asarray(b[k][kk]), rtol=1e-6, atol=1e-7,
                err_msg=f"{k}.{kk}")


def test_darknet_binary_roundtrip(spec_params, tmp_path):
    spec, params = spec_params
    p = str(tmp_path / "model.weights")
    W.save_darknet_weights(spec, params, p, seen=42)
    loaded, header = W.load_darknet_weights(spec, p)
    assert header[3] == 42
    tree_equal(params, loaded)


def test_darknet_binary_backbone_cutoff(tmp_path):
    """A file named darknet53.conv.74 loads only the first 75 layers.

    Uses the full yolov3 spec (weight IO is pure numpy, no compile): the
    mini spec has no conv at index >= 75 so it cannot span the cutoff.
    """
    from amyloid_yolo_tpu.graphspec import yolov3_spec

    spec = yolov3_spec(num_classes=2)
    params = darknet.init_params(jax.random.PRNGKey(3), spec)
    p = str(tmp_path / "darknet53.conv.74")
    W.save_darknet_weights(spec, params, p, cutoff=75)
    base = darknet.init_params(jax.random.PRNGKey(9), spec)
    loaded, _ = W.load_darknet_weights(spec, p, params=base)
    # layers below 75 replaced, layers at/after 75 untouched
    low = [i for i in spec.conv_indices if i < 75]
    high = [i for i in spec.conv_indices if i >= 75]
    assert low and high  # mini spec spans the cutoff
    for i in low:
        np.testing.assert_allclose(
            np.asarray(loaded[f"conv_{i}"]["w"]), np.asarray(params[f"conv_{i}"]["w"]))
    for i in high:
        np.testing.assert_allclose(
            np.asarray(loaded[f"conv_{i}"]["w"]), np.asarray(base[f"conv_{i}"]["w"]))


def test_torch_state_dict_roundtrip(spec_params):
    spec, params = spec_params
    sd = W.params_to_torch_state_dict(spec, params)
    back = W.torch_state_dict_to_params(spec, sd)
    tree_equal(params, back)


def test_torch_pth_import(spec_params, tmp_path):
    """Round-trip through an actual torch-serialized .pth file."""
    import torch

    spec, params = spec_params
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          W.params_to_torch_state_dict(spec, params).items()}
    p = str(tmp_path / "ckpt.pth")
    torch.save(sd, p)
    loaded = W.load_torch_state_dict(spec, p)
    tree_equal(params, loaded)


def test_forward_identical_after_roundtrip(spec_params, tmp_path):
    """The imported weights must produce identical head maps."""
    import jax.numpy as jnp

    spec, params = spec_params
    p = str(tmp_path / "model.weights")
    W.save_darknet_weights(spec, params, p)
    loaded, _ = W.load_darknet_weights(spec, p)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    m1, _ = darknet.apply(params, spec, x)
    m2, _ = darknet.apply(loaded, spec, x)
    for a, b in zip(m1, m2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_roundtrip(spec_params, tmp_path):
    spec, params = spec_params
    path = str(tmp_path / "ckpt")
    W.save_checkpoint(path, {"params": params})
    restored = W.load_checkpoint(path)["params"]
    tree_equal(params, restored)


def test_load_pretrained_orbax_dir(spec_params, tmp_path):
    """--pretrained_weights pointed at an orbax Trainer checkpoint directory
    restores params only (the reference's resume semantics, train.py:64-68)."""
    spec, params = spec_params
    path = str(tmp_path / "yolov3_ckpt_7")
    W.save_checkpoint(path, {"params": params, "step": np.asarray(7),
                             "seen": np.asarray(99)})
    loaded = W.load_pretrained(spec, path)
    tree_equal(params, loaded)


def test_load_pretrained_missing_file_message(spec_params):
    """`amyolo test --weights_path /nonexistent` must fail with a clear
    FileNotFoundError naming the path, not a torch/struct traceback."""
    spec, _ = spec_params
    with pytest.raises(FileNotFoundError, match="nonexistent.pth"):
        W.load_pretrained(spec, "/nonexistent.pth")
