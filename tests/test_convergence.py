"""Integration: training actually learns (loss decreases when overfitting
a tiny fixed problem). This is the end-to-end autodiff sanity the
reference never had."""

import numpy as np
import pytest

from deepvcp_tpu import DeepVCPConfig
from deepvcp_tpu.config import TrainConfig
from deepvcp_tpu.data import SyntheticDataset, batch_iterator
from deepvcp_tpu.train import Trainer


@pytest.mark.slow
def test_overfit_reduces_loss():
    model_cfg = DeepVCPConfig.tiny(num_points=64, use_normal=False)
    train_cfg = TrainConfig(
        num_epochs=1, batch_size=2, learning_rate=3e-3, metrics_path=None,
        log_every=1000,
    )
    ds = SyntheticDataset(num_clouds=2, num_points=64, extent=2.0)
    trainer = Trainer(model_cfg, train_cfg)
    # fixed batch: same pair every step (epoch=0 seeding)
    batch = next(batch_iterator(ds, 2, epoch=0, seed=0))
    trainer.setup(batch)

    import jax.numpy as jnp

    losses = []
    for _ in range(30):
        trainer.state, m = trainer._train_step(
            trainer.state, *(jnp.asarray(a) for a in batch)
        )
        losses.append(float(m["loss"]))

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.9, (first, last, losses[::5])
