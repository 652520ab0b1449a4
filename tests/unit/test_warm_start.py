"""Cross-dataset warm start: name+shape-matched tensors transfer, classifier
heads (sized by num_classes) auto-skip (reference train.py:126-176,
test_training_pipeline.py:838-946)."""

import jax
import jax.numpy as jnp
import numpy as np

from cabinet_tpu.models import CABiNet
from cabinet_tpu.utils.torch_convert import merge_variables

CFGS = [[3, 1, 16, 1, 0, 2], [3, 4.5, 24, 0, 0, 2], [5, 4, 40, 1, 1, 2],
        [5, 6, 96, 1, 1, 2]]


def _init(n_classes, seed):
    model = CABiNet(n_classes=n_classes, mode="small", cfgs=CFGS)
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)),
                      train=False)


def test_warm_start_transfers_backbone_skips_heads():
    donor = _init(n_classes=8, seed=0)       # e.g. UAVid-trained
    target = _init(n_classes=12, seed=1)     # e.g. AeroScapes fresh

    merged = merge_variables(target, donor, match_shapes=True)

    # backbone/CAB/FFM tensors transfer (shapes match)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["mobile"]["stem"]["kernel"]),
        np.asarray(donor["params"]["mobile"]["stem"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["ffm"]["convblk"]["conv"]["kernel"]),
        np.asarray(donor["params"]["ffm"]["convblk"]["conv"]["kernel"]))

    # classifier heads keep the TARGET values (8 vs 12 classes -> skip)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["ab"]["b4"]["kernel"]),
        np.asarray(target["params"]["ab"]["b4"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["conv_out"]["conv_out"]["kernel"]),
        np.asarray(target["params"]["conv_out"]["conv_out"]["kernel"]))

    # batch stats ride along where shapes match
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["mobile"]["stem_bn"]["mean"]),
        np.asarray(donor["batch_stats"]["mobile"]["stem_bn"]["mean"]))


def test_warm_start_partial_tree():
    target = _init(n_classes=8, seed=1)
    partial = {"params": {"sb": jax.tree_util.tree_map(
        lambda x: x * 0 + 7.0, target["params"]["sb"])}}
    merged = merge_variables(target, partial)
    assert float(np.asarray(
        merged["params"]["sb"]["conv1"]["conv"]["kernel"]).mean()) == 7.0
    # everything else untouched
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["ab"]["conva"]["kernel"]),
        np.asarray(target["params"]["ab"]["conva"]["kernel"]))


def test_remat_same_params_and_outputs():
    """remat=True reuses the exact same parameter tree and reproduces the
    non-remat forward bit-for-bit (it only changes backward memory)."""
    a = CABiNet(n_classes=8, mode="small", cfgs=CFGS, remat=False)
    b = CABiNet(n_classes=8, mode="small", cfgs=CFGS, remat=True)
    x = jnp.zeros((1, 32, 32, 3))
    va = a.init(jax.random.PRNGKey(0), x, train=False)
    vb = b.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb))
    oa, _ = a.apply(va, x, train=False)
    ob, _ = b.apply(va, x, train=False)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
