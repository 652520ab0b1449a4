"""Shared machinery for the at-scale trained-fixture mIoU gates.

Used by test_miou_at_scale.py (Small) and test_miou_at_scale_large.py
(Large — VERDICT r4 weak #5): a committed trained fixture on the palette
task, an explicit confidence gate verifying the bit-exactness premise, and
the one-pass probs/ties/histogram extraction both gates share.
"""

from pathlib import Path

import numpy as np

N_CLASSES = 5
# Class color prototypes chosen far apart so bilinear blends at block edges
# stay unambiguous (argmax margins large enough that torch-vs-XLA fp noise
# cannot flip a prediction).
PALETTE = np.array([
    [220, 40, 40],
    [40, 220, 40],
    [40, 40, 220],
    [220, 220, 40],
    [140, 40, 220],
], np.float32) / 255.0

FIXTURE_DIR = Path(__file__).resolve().parent.parent / "fixtures"
# Near-tie threshold on the SUMMED multi-scale probability map (range ~[0,6]):
# torch-CPU vs XLA-CPU f32 reorder noise is ~1e-6; pixels with a smaller
# top-2 margin may legitimately argmax differently between frameworks.
TIE_EPS = 1e-5


def synthetic(rng, size, block):
    """Blocky label map + its palette rendering with mild noise."""
    grid = rng.integers(0, N_CLASSES, (size // block, size // block))
    labels = np.kron(grid, np.ones((block, block), np.int64))
    image = PALETTE[labels] + rng.normal(0, 0.02, (*labels.shape, 3))
    return image.astype(np.float32), labels


def flatten_vars(variables):
    from flax.traverse_util import flatten_dict

    return {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(variables).items()}


def unflatten_vars(arrays):
    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict

    # the committed fixture stores f32 weights as f16 (halves the blob);
    # the model runs in f32 — the f16 values ARE the checkpoint
    return unflatten_dict(
        {tuple(k.split("/")):
         jnp.asarray(v, jnp.float32 if v.dtype == np.float16 else v.dtype)
         for k, v in arrays.items()})


def confidence_gate(variables, mode, cfgs):
    """The fixture premise, verified explicitly: on fresh single-class
    images the model must predict the class on >=99.9% of pixels and have
    <0.1% of pixels within 0.1 of a softmax tie."""
    import jax
    import jax.numpy as jnp

    from cabinet_tpu.models import CABiNet

    model = CABiNet(n_classes=N_CLASSES, mode=mode, cfgs=cfgs)
    rng = np.random.default_rng(99)
    imgs = np.stack([
        (PALETTE[np.full((256, 256), c, np.int64)]
         + rng.normal(0, 0.02, (256, 256, 3))).astype(np.float32)
        for c in range(N_CLASSES)])
    logits, _ = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(imgs))
    probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))
    top2 = np.partition(probs, -2, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    for c in range(N_CLASSES):
        correct = float(np.mean(np.argmax(probs[c], -1) == c))
        weak = float(np.mean(margin[c] < 0.1))
        if correct < 0.999 or weak > 1e-3:
            return False, f"class {c}: correct={correct:.4f} weak={weak:.4f}"
    return True, "ok"


def train_fixture(fixture_path, mode, cfgs, seed=7):
    """Train a CABiNet on the palette task until the confidence gate passes
    (up to 1000 steps), then persist to fixture_path."""
    import jax
    import jax.numpy as jnp
    import optax

    from cabinet_tpu.models import CABiNet
    from cabinet_tpu.train.trainer import create_train_state, make_train_step

    model = CABiNet(n_classes=N_CLASSES, mode=mode, cfgs=cfgs)
    rng = np.random.default_rng(seed)
    S = 96
    x0 = jnp.zeros((4, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)

    tx = optax.adam(2e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(model.apply, tx, n_min=4 * S * S // 16,
                           loss_type="ce")
    info = "never gated"
    # Block size 48 keeps class-boundary pixels (which CABiNet's /8-grid
    # upsampled logits cannot sharpen) a small fraction of the loss, so the
    # dual-head CE converges to a confident interior.
    for i in range(1000):
        imgs, lbls = zip(*[synthetic(rng, S, 48) for _ in range(4)])
        state, loss = step(state, jnp.asarray(np.stack(imgs)),
                           jnp.asarray(np.stack(lbls)))
        if i >= 249 and (i + 1) % 50 == 0 and float(loss) < 0.5:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            ok, info = confidence_gate(variables, mode, cfgs)
            if ok:
                fixture_path.parent.mkdir(parents=True, exist_ok=True)
                np.savez_compressed(
                    fixture_path,
                    **{k: (v.astype(np.float16)
                           if v.dtype == np.float32 else v)
                       for k, v in flatten_vars(variables).items()})
                # reload so the test runs the EXACT committed (f16) weights
                data = np.load(fixture_path)
                return unflatten_vars({k: data[k] for k in data.files})
    raise AssertionError(
        f"fixture training never reached the confidence gate: {info}; "
        f"last loss {float(loss):.3f}")


def load_or_train(fixture_path, mode, cfgs, seed=7):
    """Cached trained checkpoint (deterministic across environments once
    committed); regenerated + gated if the file is missing."""
    if fixture_path.exists():
        data = np.load(fixture_path)
        variables = unflatten_vars({k: data[k] for k in data.files})
        ok, info = confidence_gate(variables, mode, cfgs)
        assert ok, f"committed fixture fails its confidence gate: {info}"
        return variables
    return train_fixture(fixture_path, mode, cfgs, seed=seed)


def probs_ties_hist(ev, variables, images, labels):
    """(ties, n_pix, hist) from ONE full-protocol pass: the summed
    multi-scale probability map is the exact tensor the protocol argmaxes
    (evaluator._program), so near-tie margins and the rows=pred/cols=label
    confusion matrix (eval/metrics.py one_hot convention) are recomputed on
    host bit-identically instead of running a second device program."""
    probs = ev.prob_batch(variables, images)
    top2 = np.partition(probs, -2, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    pred = probs.argmax(-1)
    valid = labels != 255
    idx = pred[valid] * N_CLASSES + labels[valid]
    hist = np.bincount(idx.astype(np.int64), minlength=N_CLASSES ** 2
                       ).reshape(N_CLASSES, N_CLASSES).astype(np.float64)
    return int((margin < TIE_EPS).sum()), margin.size, hist
