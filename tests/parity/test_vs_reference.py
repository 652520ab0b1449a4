"""Activation-level parity vs the PyTorch reference implementation.

These tests use the reference repo (if present at /root/reference) purely as a
numerical oracle: build its torch modules with random weights, convert the
state dict with cabinet_tpu.utils.torch_convert, and require the Flax forward
to match within float tolerance. This validates BOTH the architecture
re-implementation and the checkpoint converter — the prerequisites for loading
the published HF checkpoints (BASELINE.md north star).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _ref_available():
    import pathlib

    return pathlib.Path(REF, "src", "models", "cabinet.py").is_file()


pytestmark = pytest.mark.skipif(not _ref_available(),
                                reason="reference repo not available")


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    try:
        from src.models.cabinet import CABiNet as TorchCABiNet
        from src.models.mobilenetv3 import mobilenetv3_small
    finally:
        sys.path.remove(REF)
    return TorchCABiNet, mobilenetv3_small


SMALL_CFGS = [
    [3, 1, 16, 1, 0, 2],
    [3, 4.5, 24, 0, 0, 2],
    [3, 3.67, 24, 0, 0, 1],
    [5, 4, 40, 1, 1, 2],
    [5, 6, 40, 1, 1, 1],
    [5, 6, 40, 1, 1, 1],
    [5, 3, 48, 1, 1, 1],
    [5, 3, 48, 1, 1, 1],
    [5, 6, 96, 1, 1, 2],
    [5, 6, 96, 1, 1, 1],
    [5, 6, 96, 1, 1, 1],
]


def _randomize(model):
    torch.manual_seed(3)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand_like(v) + 0.5
            elif "running_mean" in k:
                sd[k] = torch.randn_like(v) * 0.05
            else:
                sd[k] = torch.randn_like(v) * 0.05
    model.load_state_dict(sd)
    return model


def test_cabinet_small_logit_parity(ref_modules):
    TorchCABiNet, _ = ref_modules
    import jax

    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.utils.torch_convert import torch_to_flax

    tmodel = TorchCABiNet(n_classes=8, mode="small", cfgs=SMALL_CFGS)
    tmodel = _randomize(tmodel).eval()

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out, t_aux = tmodel(torch.from_numpy(x))

    variables = torch_to_flax(tmodel.state_dict(), SMALL_CFGS)
    fmodel = CABiNet(n_classes=8, mode="small", cfgs=SMALL_CFGS)
    f_out, f_aux = fmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jax.numpy.asarray(x.transpose(0, 2, 3, 1)), train=False)

    f_out = np.asarray(f_out).transpose(0, 3, 1, 2)
    f_aux = np.asarray(f_aux).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(f_out, t_out.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(f_aux, t_aux.numpy(), atol=2e-4, rtol=1e-3)


def test_backbone_parity(ref_modules):
    _, mobilenetv3_small = ref_modules
    import jax.numpy as jnp

    from cabinet_tpu.models import MOBILENETV3_SMALL_CFGS, MobileNetV3
    from cabinet_tpu.utils.torch_convert import backbone_torch_to_flax

    tmodel = _randomize(mobilenetv3_small(num_classes=10)).eval()
    x = np.random.default_rng(1).normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        t_feat = tmodel(torch.from_numpy(x))

    variables = backbone_torch_to_flax(tmodel.state_dict(), MOBILENETV3_SMALL_CFGS)
    fmodel = MobileNetV3(cfgs=tuple(map(tuple, MOBILENETV3_SMALL_CFGS)), mode="small")
    f_feat = fmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    f_feat = np.asarray(f_feat).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(f_feat, t_feat.numpy(), atol=2e-4, rtol=1e-3)


def test_roundtrip_flax_torch_flax(ref_modules):
    TorchCABiNet, _ = ref_modules
    from cabinet_tpu.utils.torch_convert import flax_to_torch, torch_to_flax

    tmodel = _randomize(TorchCABiNet(n_classes=8, mode="small", cfgs=SMALL_CFGS))
    variables = torch_to_flax(tmodel.state_dict(), SMALL_CFGS)
    back = flax_to_torch(variables, SMALL_CFGS)
    fwd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
           if "num_batches_tracked" not in k}
    for k, v in back.items():
        np.testing.assert_array_equal(v, fwd[k], err_msg=k)
    # every float tensor except the (unused) classifier head must round-trip
    missing = {k for k in fwd if k not in back and "classifier" not in k}
    assert not missing, missing
