"""UNeXt2 flax model vs its torch twin: converter + numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from biahub_tpu.models.convert import torch_state_dict_to_flax
from biahub_tpu.models.torch_twin import TorchUNeXt2
from biahub_tpu.models.unext2 import UNeXt2

CFG = dict(
    in_channels=1,
    out_channels=2,
    in_stack_depth=5,
    encoder_blocks=(1, 1, 2, 1),
    dims=(8, 16, 32, 64),
    decoder_conv_blocks=2,
    stem_kernel_size=(5, 4, 4),
)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def test_converter_matches_flax_param_tree_layer_by_layer():
    torch.manual_seed(0)
    twin = TorchUNeXt2(**CFG)
    converted = torch_state_dict_to_flax(twin.state_dict())

    model = UNeXt2(**CFG)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 5, 64, 64)))
    ref_shapes = _tree_shapes(ref["params"])
    got_shapes = _tree_shapes(converted["params"])
    assert ref_shapes == got_shapes  # every layer present, every shape right


def test_flax_output_matches_torch_twin():
    torch.manual_seed(1)
    twin = TorchUNeXt2(**CFG).eval()
    variables = jax.tree.map(jnp.asarray, torch_state_dict_to_flax(twin.state_dict()))

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 1, 5, 64, 64), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()

    model = UNeXt2(**CFG)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 2, 5, 64, 64)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_flax_output_matches_torch_twin_nondefault_depths():
    cfg = dict(CFG, out_stack_depth=3, in_stack_depth=10, stem_kernel_size=(5, 4, 4))
    torch.manual_seed(3)
    twin = TorchUNeXt2(**cfg).eval()
    variables = jax.tree.map(jnp.asarray, torch_state_dict_to_flax(twin.state_dict()))
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 1, 10, 32, 32), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()
    got = np.asarray(UNeXt2(**cfg).apply(variables, jnp.asarray(x)))
    assert got.shape == (1, 2, 3, 32, 32)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=0)


def test_lightning_checkpoint_roundtrip(tmp_path):
    from biahub_tpu.models.convert import load_torch_checkpoint

    torch.manual_seed(5)
    twin = TorchUNeXt2(**CFG)
    ckpt = {
        "state_dict": {f"model.{k}": v for k, v in twin.state_dict().items()},
        "epoch": 83,
    }
    path = tmp_path / "epoch=83.ckpt"
    torch.save(ckpt, path)
    variables = load_torch_checkpoint(str(path))
    ref = UNeXt2(**CFG).init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 5, 64, 64)))
    assert _tree_shapes(variables["params"]) == _tree_shapes(ref["params"])
