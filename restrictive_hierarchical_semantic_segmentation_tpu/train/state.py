"""Train state + optimizer.

Reference: ``torch.optim.AdamW(model.parameters(), lr)`` (train.py:513-516,
torch defaults betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01) with a
host-driven ReduceLROnPlateau (train.py:603-611). The learning rate is a
dynamic leaf of the optimizer state (``optax.inject_hyperparams``) so the
plateau scheduler can update it without recompiling the jitted step.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state", "set_learning_rate"]


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def lr(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])


def make_optimizer(lr: float, weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def create_train_state(model, rng, sample_input, lr: float,
                       weight_decay: float = 0.01) -> tuple:
    """Initialize params/batch_stats and the optimizer. Returns (state, tx)."""
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(lr, weight_decay)
    opt_state = tx.init(params)
    return (
        TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR update (plateau scheduler) without recompilation."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    opt_state = state.opt_state._replace(hyperparams=hp)
    return state.replace(opt_state=opt_state)
