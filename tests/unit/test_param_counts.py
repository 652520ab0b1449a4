"""Parameter-count regression guards against architecture drift.

Targets are the reference's published tables (/root/reference/README.md:54-60):
CABiNet-Large 9.17M / CABiNet-Small 5.36M (exact-match architectures) and the
YOLO26-sem family 1.63/6.50/14.32/17.87/40.16M (in-repo equivalents,
calibrated within ~1%). Counting uses jax.eval_shape — no arrays materialize.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _count_params(model):
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    return sum(int(np.prod(a.shape))
               for a in jax.tree_util.tree_leaves(shapes["params"]))


@pytest.mark.parametrize("mode,want_m", [("large", 9.17), ("small", 5.36)])
def test_cabinet_param_counts(mode, want_m):
    from cabinet_tpu.models import CABiNet

    n = _count_params(CABiNet(n_classes=8, mode=mode))
    assert n / 1e6 == pytest.approx(want_m, rel=0.005), n


@pytest.mark.parametrize("variant,want_m", [
    ("n", 1.63), ("s", 6.50), ("m", 14.32), ("l", 17.87), ("x", 40.16),
])
def test_yolosem_param_counts(variant, want_m):
    from cabinet_tpu.models.yolosem import YOLOSem

    n = _count_params(YOLOSem(n_classes=8, variant=variant))
    # The variant table is co-calibrated against BOTH published columns
    # (params AND GFLOPs within ~2%; see YOLOSEM_VARIANTS comment), so the
    # params tolerance is 2.5% rather than exact.
    assert n / 1e6 == pytest.approx(want_m, rel=0.025), n
