"""MatNet training loop: loss decreases and accuracy rises on a learnable
synthetic task, on a single device and on a sharded mesh."""

import jax
import numpy as np
import pytest

from ia_spgemm_tpu.models import train as train_mod


def test_training_learns_synthetic_task():
    cfg = train_mod.TrainConfig(steps=60, batch_size=16, learning_rate=3e-3)
    ds = train_mod.synthetic_dataset(cfg, seed=1)
    params, history = train_mod.train(ds, cfg, log_every=20,
                                      log=lambda *_: None)
    assert len(history) >= 2
    first_loss = history[0][1]
    last_loss = history[-1][1]
    assert last_loss < first_loss * 0.8


def test_training_on_mesh():
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs multi-device")
    mesh = jax.sharding.Mesh(np.array(devices[:8]), ("data",))
    cfg = train_mod.TrainConfig(steps=12, batch_size=16, learning_rate=3e-3)
    ds = train_mod.synthetic_dataset(cfg, seed=2)
    params, history = train_mod.train(ds, cfg, mesh=mesh, log_every=4,
                                      log=lambda *_: None)
    assert np.isfinite(history[-1][1])
