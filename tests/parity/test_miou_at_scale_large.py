"""At-scale mIoU gate on the LARGE variant (VERDICT r4 weak #5).

Round 4 gave Large logit/protocol parity at reduced size, but the
deterministic at-scale mIoU gate — the strongest offline stand-in for the
published-checkpoint north star — only ever executed Small geometry. This
runs the same committed-trained-fixture machinery (tests/parity/
miou_fixture.py) on the FULL published large cfg table
(reference mobilenetv3.py:240-257) end to end:

  - committed fixture tests/fixtures/miou_large_cabinet_v1.npz, trained on
    the palette task until the explicit confidence gate passes;
  - margin-gated confusion-matrix comparison against the reference's own
    torch network + MscEvalV0 (reference evaluate.py:89-159), cached in
    tests/fixtures/miou_ref_outputs_large_v1.npz keyed by weights+protocol;
  - the bf16 fast-chain guard on the same trained Large weights.

Protocol: 2 scales (0.75 + 1.25) with flip TTA on 512^2 images — the two
legs every resize/accumulate divergence must pass through (input downscale
and prob-map return trip); the full 6-scale protocol runs on the Small
fixture (test_miou_at_scale.py) where the 1-core CI budget allows it.
"""

import hashlib
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.parity.miou_fixture import (
    FIXTURE_DIR,
    N_CLASSES,
    PALETTE,
    TIE_EPS,
    load_or_train,
    probs_ties_hist,
    synthetic,
)
from tests.parity.test_eval_parity import _ref_available, ref_eval  # noqa: F401
from tests.parity.test_large_parity import LARGE_CFGS

pytestmark = pytest.mark.skipif(not _ref_available(),
                                reason="reference repo not available")

FIXTURE = FIXTURE_DIR / "miou_large_cabinet_v1.npz"
REF_FIXTURE = FIXTURE.with_name("miou_ref_outputs_large_v1.npz")
SCALES = (0.75, 1.25)
CROPSIZE = 256


@pytest.fixture(scope="module")
def trained_large_variables():
    return load_or_train(FIXTURE, "large", LARGE_CFGS)


def test_miou_parity_at_scale_large(ref_eval, trained_large_variables):  # noqa: F811
    TorchCABiNet, MscEvalV0 = ref_eval
    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.eval.metrics import metrics_from_hist
    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.utils.torch_convert import flax_to_torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch(trained_large_variables,
                                    LARGE_CFGS).items()}
    tmodel = TorchCABiNet(n_classes=N_CLASSES, mode="large", cfgs=LARGE_CFGS)
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k or k.startswith("mobile.classifier")
               for k in missing), missing
    tmodel.eval()

    rng = np.random.default_rng(13)
    protocol = json.dumps({
        "scales": SCALES, "cropsize": CROPSIZE, "n_classes": N_CLASSES,
        "palette": PALETTE.tolist(), "rng": 13, "ignore_rows": 32,
        "multi_block": 64, "mode": "large",
    }, sort_keys=True)
    weights_sha = hashlib.sha256(FIXTURE.read_bytes()
                                 + protocol.encode()).hexdigest()
    ref_cache = {}
    if REF_FIXTURE.exists():
        data = np.load(REF_FIXTURE, allow_pickle=False)
        if str(data["weights_sha"]) == weights_sha:
            ref_cache = {k: data[k] for k in data.files if k != "weights_sha"}

    def run_ref(images, labels, key):
        if f"{key}_hist" in ref_cache:
            return {"confusion_matrix": ref_cache[f"{key}_hist"],
                    "mIoU": float(ref_cache[f"{key}_miou"])}

        class OneBatch:
            def __iter__(self):
                yield (torch.from_numpy(images.transpose(0, 3, 1, 2)),
                       torch.from_numpy(labels))

        ref = MscEvalV0(tmodel, OneBatch(), n_classes=N_CLASSES,
                        ignore_label=255, scales=SCALES, flip=True,
                        cropsize=CROPSIZE, device=torch.device("cpu"))
        out = ref.evaluate()
        ref_cache[f"{key}_hist"] = np.asarray(out["confusion_matrix"])
        ref_cache[f"{key}_miou"] = np.float64(out["mIoU"])
        np.savez_compressed(REF_FIXTURE, weights_sha=weights_sha, **ref_cache)
        return out

    ev = MscEval(lambda v, x, train=False: CABiNet(
        n_classes=N_CLASSES, mode="large", cfgs=LARGE_CFGS).apply(
            v, x, train=train),
        n_classes=N_CLASSES, ignore_label=255, scales=SCALES, flip=True,
        cropsize=CROPSIZE)

    # ---- margin-gated bit-exactness on a single-class 512^2 image --------
    lbl = np.full((512, 512), 0, np.int64)
    img = (PALETTE[lbl] + rng.normal(0, 0.02, (512, 512, 3))
           ).astype(np.float32)
    lbl[:32] = 255
    im, lb = img[None], lbl[None]
    ties, n_pix, hist = probs_ties_hist(ev, trained_large_variables, im, lb)
    assert ties < 1e-3 * n_pix, (
        f"{ties} near-tie pixels — the Large fixture is not confident "
        "enough for a bit-exactness claim")
    ref_out = run_ref(im, lb, "c0")
    diff = np.abs(hist - ref_out["confusion_matrix"]).sum() / 2
    assert diff <= ties, (
        f"{diff} pixels disagree but only {ties} are within {TIE_EPS} of a "
        "tie — a real protocol divergence at Large geometry")
    assert hist[0, 0] > 0.95 * (512 - 32) * 512

    # ---- multi-class image: ties at block boundaries allowed fp noise ----
    image, mlbl = synthetic(rng, 512, 64)
    mlbl[:32] = 255
    im, lb = image[None], mlbl[None]
    ref_out = run_ref(im, lb, "multi")
    _, _, hist = probs_ties_hist(ev, trained_large_variables, im, lb)
    res = metrics_from_hist(hist)
    total = hist.sum()
    diff = np.abs(hist - ref_out["confusion_matrix"]).sum() / 2
    assert diff <= 1e-3 * total, f"{diff} of {total} pixels disagree"
    assert abs(res["mIoU"] - ref_out["mIoU"]) < 5e-3
    assert res["mIoU"] > 0.9  # the task was learned at Large geometry


def test_bf16_fast_chain_on_trained_large_fixture(trained_large_variables):
    """bf16 serving-chain quality guard on TRAINED Large weights — the
    Large sibling of test_bf16_fast_chain_on_trained_fixture (same margin
    gating; 960-channel backbone + Large attention widths exercised)."""
    import jax.numpy as jnp

    from cabinet_tpu.eval.evaluator import MscEval
    from cabinet_tpu.eval.metrics import metrics_from_hist
    from cabinet_tpu.models import CABiNet

    model = CABiNet(n_classes=N_CLASSES, mode="large", cfgs=LARGE_CFGS)
    common = dict(n_classes=N_CLASSES, ignore_label=255,
                  scales=(1.25,), flip=True, cropsize=CROPSIZE)
    ev_f32 = MscEval(model.apply, **common)
    ev_b16 = MscEval(model.apply, compute_dtype=jnp.bfloat16, **common)

    rng = np.random.default_rng(33)
    image, lbl = synthetic(rng, 512, 64)
    lbl[:32] = 255
    im, lb = image[None], lbl[None]

    probs_f = np.asarray(ev_f32.prob_batch(trained_large_variables, im))
    pred_f = probs_f.argmax(-1)
    pred_b = np.asarray(ev_b16.prob_batch(trained_large_variables, im)
                        .astype(np.float32)).argmax(-1)

    dis = pred_f != pred_b
    assert dis.mean() < 1e-3, f"bf16 flipped {dis.mean():.2%} of pixels"
    top2 = np.partition(probs_f, -2, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    if dis.any():
        assert float(margin[dis].max()) < 0.05 * float(np.median(margin)), (
            "bf16 flipped a CONFIDENT pixel "
            f"(margin {margin[dis].max():.4f}) — a real chain divergence")

    def hist_of(pred):
        valid = lb != 255
        idx = pred[valid] * N_CLASSES + lb[valid]
        return np.bincount(idx.astype(np.int64), minlength=N_CLASSES ** 2
                           ).reshape(N_CLASSES, N_CLASSES).astype(np.float64)

    miou_f = metrics_from_hist(hist_of(pred_f))["mIoU"]
    miou_b = metrics_from_hist(hist_of(pred_b))["mIoU"]
    assert miou_f > 0.85  # the comparison is not vacuous
    assert abs(miou_b - miou_f) < 0.01, (
        f"bf16 chain moved mIoU {miou_f:.4f} -> {miou_b:.4f}")
