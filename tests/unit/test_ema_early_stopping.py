"""EMA decay-ramp and early-stopping semantics
(reference test_ema.py / test_early_stopping.py analogs)."""

import jax.numpy as jnp
import numpy as np

from cabinet_tpu.train.early_stopping import EarlyStopping
from cabinet_tpu.train.ema import ema_init, ema_update


def test_ema_decay_ramp_matches_reference_formula():
    v = {"w": jnp.ones((2, 2)), "count": jnp.zeros((), jnp.int32)}
    ema = ema_init(v, decay=0.9999, tau=2000.0)

    live = {"w": jnp.zeros((2, 2)), "count": jnp.asarray(5, jnp.int32)}
    expect = np.ones((2, 2))
    for u in range(1, 6):
        ema = ema_update(ema, live)
        d = 0.9999 * (1 - np.exp(-u / 2000.0))
        expect = expect * d
        # f32 cancellation in (1 - exp(-u/tau)) costs ~2.5e-3 relative per
        # step for tiny u; errors compound multiplicatively across steps.
        np.testing.assert_allclose(np.asarray(ema.variables["w"]), expect,
                                   rtol=2e-2)
    # Integer leaves never averaged (reference ema.py:61-65).
    assert int(ema.variables["count"]) == 0
    assert int(ema.updates) == 5


def test_ema_early_updates_track_live_model():
    # With small `updates`, decay ~ 0 so EMA follows the live weights closely.
    v = {"w": jnp.full((3,), 10.0)}
    ema = ema_init(v, decay=0.9999, tau=2000.0)
    ema = ema_update(ema, {"w": jnp.zeros((3,))})
    assert float(jnp.abs(ema.variables["w"]).max()) < 0.01


def test_early_stopping_patience():
    stopper = EarlyStopping(patience=3)
    assert not stopper(0, 0.5)
    assert not stopper(1, 0.4)
    assert not stopper(2, 0.4)
    assert stopper(3, 0.4)  # 3 - 0 >= 3


def test_early_stopping_improvement_resets():
    stopper = EarlyStopping(patience=2)
    assert not stopper(0, 0.5)
    assert not stopper(1, 0.6)
    assert not stopper(2, 0.5)
    assert stopper(3, 0.5)


def test_early_stopping_none_fitness_noop():
    stopper = EarlyStopping(patience=1)
    assert not stopper(0, 0.5)
    assert not stopper(5, None)  # no-op epoch
    assert stopper(1, 0.4)


def test_early_stopping_zero_patience_disables():
    stopper = EarlyStopping(patience=0)
    for e in range(100):
        assert not stopper(e, 0.1)


def test_early_stopping_state_roundtrip():
    a = EarlyStopping(patience=5)
    a(0, 0.7)
    b = EarlyStopping(patience=5)
    b.load_state_dict(a.state_dict())
    assert b.best_fitness == 0.7 and b.best_epoch == 0
