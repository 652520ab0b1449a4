"""Flagship CABiNet-Large numeric parity vs the PyTorch reference.

Every other parity test builds the SMALL variant; these cover the exact
path the north-star numbers run on: the full published large cfg table
(reference mobilenetv3.py:240-257), the MODEL_CONFIG["large"] attention
planes (reference constants.py:10-19) and the 960-channel backbone head —
logit-level, converter round-trip in BOTH directions, and the full eval
protocol's confusion matrix on Large geometry.

Input sizes are reduced (256² logits / 256-crop sliding window) to stay
CPU-cheap, but chosen so the CAB's PSP sees a /32 grid of 8×8 tokens —
the pool-DOWN direction for every PSP bin size (1,3,6,8), matching what
the 1024² north-star protocol exercises.
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

# Full published large table — reference mobilenetv3.py:240-257.
LARGE_CFGS = [
    [3, 1, 16, 0, 0, 1],
    [3, 4, 24, 0, 0, 2],
    [3, 3, 24, 0, 0, 1],
    [5, 3, 40, 1, 0, 2],
    [5, 3, 40, 1, 0, 1],
    [5, 3, 40, 1, 0, 1],
    [3, 6, 80, 0, 1, 2],
    [3, 2.5, 80, 0, 1, 1],
    [3, 2.3, 80, 0, 1, 1],
    [3, 2.3, 80, 0, 1, 1],
    [3, 6, 112, 1, 1, 1],
    [3, 6, 112, 1, 1, 1],
    [5, 6, 160, 1, 1, 2],
    [5, 6, 160, 1, 1, 1],
    [5, 6, 160, 1, 1, 1],
]


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    try:
        from src.models.cabinet import CABiNet as TorchCABiNet
        from src.models.mobilenetv3 import mobilenetv3_large
    finally:
        sys.path.remove(REF)
    return TorchCABiNet, mobilenetv3_large


def _randomize(model, seed=3):
    torch.manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand_like(v) + 0.5
            else:
                sd[k] = torch.randn_like(v) * 0.05
    model.load_state_dict(sd)
    return model


def test_large_cfg_table_matches_reference(ref_modules):
    """Our committed MOBILENETV3_LARGE_CFGS must BE the published table."""
    _, mobilenetv3_large = ref_modules
    from cabinet_tpu.models import MOBILENETV3_LARGE_CFGS

    ref_cfgs = mobilenetv3_large(num_classes=2).cfgs
    assert [list(map(float, row)) for row in MOBILENETV3_LARGE_CFGS] == \
        [list(map(float, row)) for row in ref_cfgs]
    assert [list(map(float, row)) for row in LARGE_CFGS] == \
        [list(map(float, row)) for row in ref_cfgs]


def test_cabinet_large_logit_parity(ref_modules):
    """torch->flax direction on the flagship: both heads within 2e-4 at a
    256² input (8×8 CAB tokens — every PSP bin pools DOWN, as at 1024²)."""
    TorchCABiNet, _ = ref_modules
    import jax

    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.utils.torch_convert import torch_to_flax

    tmodel = TorchCABiNet(n_classes=8, mode="large", cfgs=LARGE_CFGS)
    tmodel = _randomize(tmodel).eval()

    x = np.random.default_rng(0).normal(size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        t_out, t_aux = tmodel(torch.from_numpy(x))

    variables = torch_to_flax(tmodel.state_dict(), LARGE_CFGS)
    fmodel = CABiNet(n_classes=8, mode="large", cfgs=LARGE_CFGS)
    f_out, f_aux = fmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jax.numpy.asarray(x.transpose(0, 2, 3, 1)), train=False)

    f_out = np.asarray(f_out).transpose(0, 3, 1, 2)
    f_aux = np.asarray(f_aux).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(f_out, t_out.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(f_aux, t_aux.numpy(), atol=2e-4, rtol=1e-3)


def test_large_backbone_parity(ref_modules):
    """MobileNetV3-Large trunk: 960-channel pre-pool feature parity
    (reference mobilenetv3.py:202-205 forward contract)."""
    _, mobilenetv3_large = ref_modules
    import jax.numpy as jnp

    from cabinet_tpu.models import MOBILENETV3_LARGE_CFGS, MobileNetV3
    from cabinet_tpu.utils.torch_convert import backbone_torch_to_flax

    tmodel = _randomize(mobilenetv3_large(num_classes=10)).eval()
    x = np.random.default_rng(1).normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        t_feat = tmodel(torch.from_numpy(x))
    assert t_feat.shape[1] == 960

    variables = backbone_torch_to_flax(tmodel.state_dict(), MOBILENETV3_LARGE_CFGS)
    fmodel = MobileNetV3(cfgs=tuple(map(tuple, MOBILENETV3_LARGE_CFGS)),
                         mode="large")
    f_feat = fmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    f_feat = np.asarray(f_feat).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(f_feat, t_feat.numpy(), atol=2e-4, rtol=1e-3)


def test_large_roundtrip_flax_torch_flax(ref_modules):
    """flax->torch direction: every float tensor of the Large state dict
    (except the unused backbone classifier) round-trips bit-exactly."""
    TorchCABiNet, _ = ref_modules
    from cabinet_tpu.utils.torch_convert import flax_to_torch, torch_to_flax

    tmodel = _randomize(TorchCABiNet(n_classes=8, mode="large", cfgs=LARGE_CFGS))
    variables = torch_to_flax(tmodel.state_dict(), LARGE_CFGS)
    back = flax_to_torch(variables, LARGE_CFGS)
    fwd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
           if "num_batches_tracked" not in k}
    for k, v in back.items():
        np.testing.assert_array_equal(v, fwd[k], err_msg=k)
    missing = {k for k in fwd if k not in back and "classifier" not in k}
    assert not missing, missing


def test_large_msc_eval_parity(ref_modules):
    """Full eval protocol (multi-scale, flip TTA, 5/6-stride sliding window,
    confusion matrix) on the LARGE network: our MscEval vs the reference's
    MscEvalV0 running the same converted weights on the same input.

    Geometry: 320×288 image, 256 crop -> 2×2 tiles at scale 1.0 (the CAB
    sees 8×8 tokens per tile, the same pool-down regime as 1024² crops),
    pad-then-unpad single tile at scale 0.5."""
    TorchCABiNet, _ = ref_modules

    # The reference script imports hydra/omegaconf/torchvision at module
    # scope; only the MscEvalV0 class is needed here, so stub the imports
    # (same machinery as tests/parity/test_eval_parity.py).
    import types

    hydra_stub = types.ModuleType("hydra")
    hydra_stub.main = lambda **kw: (lambda f: f)
    oc_stub = types.ModuleType("omegaconf")
    oc_stub.DictConfig = dict
    oc_stub.OmegaConf = types.SimpleNamespace(to_yaml=lambda c: str(c))
    sys.modules.setdefault("hydra", hydra_stub)
    sys.modules.setdefault("omegaconf", oc_stub)
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Compose = lambda ts: ts
    tvt.ToTensor = type("ToTensor", (), {})
    tvt.Normalize = type("Normalize", (), {"__init__": lambda s, **k: None})
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)

    sys.path.insert(0, REF)
    try:
        from src.scripts.evaluate import MscEvalV0
    finally:
        sys.path.remove(REF)

    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.utils.torch_convert import torch_to_flax

    tmodel = TorchCABiNet(n_classes=5, mode="large", cfgs=LARGE_CFGS)
    tmodel = _randomize(tmodel, seed=0).eval()

    rng = np.random.default_rng(0)
    images = rng.normal(size=(1, 320, 288, 3)).astype(np.float32)
    labels = rng.integers(0, 5, (1, 320, 288)).astype(np.int64)
    labels[0, :16] = 255

    class OneBatch:
        def __iter__(self):
            yield (torch.from_numpy(images.transpose(0, 3, 1, 2)),
                   torch.from_numpy(labels))

    ref = MscEvalV0(tmodel, OneBatch(), n_classes=5, ignore_label=255,
                    scales=(0.5, 1.0), flip=True, cropsize=256,
                    device=torch.device("cpu"))
    ref_out = ref.evaluate()

    variables = torch_to_flax(tmodel.state_dict(), LARGE_CFGS)
    fmodel = CABiNet(n_classes=5, mode="large", cfgs=LARGE_CFGS)
    ev = MscEval(lambda v, x, train=False: fmodel.apply(v, x, train=train),
                 n_classes=5, ignore_label=255, scales=(0.5, 1.0),
                 flip=True, cropsize=256)
    res = ev.evaluate(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        [(images, labels)])

    # Same tie-flip allowance as the Small protocol test: random weights
    # leave some pixels within fp noise of an argmax tie between torch-CPU
    # and XLA-CPU; a real protocol divergence moves far more than 5 of 92k.
    diff = np.abs(res["confusion_matrix"]
                  - ref_out["confusion_matrix"]).sum() / 2
    assert diff <= 5, f"{diff} pixels disagree with the reference protocol"
    assert abs(res["mIoU"] - ref_out["mIoU"]) < 2e-3
    assert abs(res["accuracy"] - ref_out["accuracy"]) < 1e-3
