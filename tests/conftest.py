"""Shared test fixtures.

Tests run on CPU with a virtual 8-device mesh so every psum/sharding path is
exercised without TPU hardware (SURVEY §4: the reference never tests its
distributed path — we do).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and rewrites
# jax_platforms; unit tests must run on the virtual 8-device CPU mesh, so
# override after import, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound on small CI
# hosts (a cold unit+parity run spends most of its wall clock in XLA-CPU
# compiles of the multi-scale eval programs). Warm re-runs skip them.
_cache_dir = os.environ.get("CABINET_TEST_COMP_CACHE",
                            os.path.join(os.path.expanduser("~"), ".cache",
                                         "cabinet_tpu_xla_test_cache"))
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Cache EVERY program: the suite is ~hundreds of sub-2s XLA-CPU
        # compiles, so a nonzero threshold (the old 2s) left a warm run
        # nearly as compile-bound as a cold one (measured: 20 min -> the
        # threshold was the reason; see NOTES.md test-runtime entry).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(15)


@pytest.fixture
def np_rng():
    return np.random.default_rng(15)


@pytest.fixture(scope="session")
def small_cabinet():
    """A tiny CABiNet built from a truncated cfg table (fast init), mirroring
    the reference's mock_small_model fixture (tests/conftest.py:94-146)."""
    from cabinet_tpu.models import CABiNet

    cfgs = [
        # k, t, c, SE, HS, s
        [3, 1, 16, 1, 0, 2],
        [3, 4.5, 24, 0, 0, 2],
        [5, 4, 40, 1, 1, 2],
        [5, 6, 96, 1, 1, 2],
    ]
    model = CABiNet(n_classes=8, mode="small", cfgs=cfgs)
    x = jax.numpy.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def _make_fake_seg_tree(root, splits, n_images, size=(16, 16), num_classes=8,
                        img_ext=".png"):
    """Tiny images/+masks/ tree used by dataset tests."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in splits:
        img_dir = root / "images" / split
        mask_dir = root / "masks" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        mask_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            img = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
            mask = rng.integers(0, num_classes, size, dtype=np.uint8)
            Image.fromarray(img).save(img_dir / f"seq{i}_{i:04d}{img_ext}")
            Image.fromarray(mask, mode="L").save(mask_dir / f"seq{i}_{i:04d}.png")
    return root


@pytest.fixture
def fake_seg_tree(tmp_path):
    return lambda **kw: _make_fake_seg_tree(tmp_path, **kw)


def pytest_collection_modifyitems(config, items):
    """Auto-mark integration/ and parity/ tests as slow (XLA compile-heavy):
    `pytest -m "not slow"` is the fast unit loop, the full run is CI's job."""
    for item in items:
        parts = item.path.parts if hasattr(item, "path") else ()
        if "integration" in parts or "parity" in parts:
            item.add_marker(pytest.mark.slow)
