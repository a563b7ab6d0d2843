"""Occupancy predictor wrapper + ensemble training utilities.

Reference: models/predictors/map_predictor_model.py:7-50
OccupancyPredictor (UNet + cross-entropy) and pytorch_utils/base_trainer.py
(generic train loop / checkpointing).  Here: flax module + optax Adam +
a compact ensemble trainer over stored episodes (HabitatDataOffline
analog), each member seeded differently and trained on a bootstrap subset
(`dataset_percentage`, reference train_options.py).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .networks import ResNetUNet


def cross_entropy_loss(logits, labels):
    """labels: (B, H, W) int class ids (reference map_predictor_model.py
    CE loss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


class OccupancyPredictor:
    def __init__(self, rng_key, grid_channels: int = 3, base: int = 16):
        self.model = ResNetUNet(n_channel_out=grid_channels, base=base)
        dummy = jnp.zeros((1, 64, 64, grid_channels))
        self.params = self.model.init(rng_key, dummy)
        self.tx = optax.adam(1e-3)
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()

    def _build_step(self):
        model, tx = self.model, self.tx

        @jax.jit
        def step(params, opt_state, inputs, labels):
            def loss_fn(p):
                logits = model.apply(p, inputs)
                return cross_entropy_loss(logits, labels)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss
        return step

    def train_step(self, inputs, labels) -> float:
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, jnp.asarray(inputs),
            jnp.asarray(labels))
        return float(loss)

    def predict(self, inputs):
        logits = self.model.apply(self.params, jnp.asarray(inputs))
        return jax.nn.softmax(logits, axis=-1)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.params), f)

    def load(self, path: str):
        with open(path, "rb") as f:
            self.params = jax.device_put(pickle.load(f))


class PredictorEnsemble:
    """N independently-seeded predictors; mean prediction + disagreement
    (reference UPEN uses ensemble variance as exploration uncertainty,
    models/UPEN.py:22-110)."""

    def __init__(self, n_members: int = 4, seed: int = 0, base: int = 16):
        keys = jax.random.split(jax.random.PRNGKey(seed), n_members)
        self.members = [OccupancyPredictor(k, base=base) for k in keys]

    def train(self, inputs: np.ndarray, labels: np.ndarray, epochs: int = 4,
              batch_size: int = 8, dataset_percentage: float = 1.0,
              seed: int = 0) -> list[float]:
        rng = np.random.default_rng(seed)
        n = len(inputs)
        losses = []
        for m_i, member in enumerate(self.members):
            keep = rng.random(n) < dataset_percentage if \
                dataset_percentage < 1.0 else np.ones(n, bool)
            idx_all = np.nonzero(keep)[0]
            if len(idx_all) == 0:
                idx_all = np.arange(n)
            last = 0.0
            for _ep in range(epochs):
                order = rng.permutation(idx_all)
                for i in range(0, len(order), batch_size):
                    b = order[i:i + batch_size]
                    last = member.train_step(inputs[b], labels[b])
            losses.append(last)
        return losses

    def predict(self, inputs):
        preds = jnp.stack([m.predict(inputs) for m in self.members])
        return preds.mean(axis=0), preds.var(axis=0), preds

    def save(self, dir_path: str):
        for i, m in enumerate(self.members):
            m.save(os.path.join(dir_path, f"member_{i}.pkl"))

    def load(self, dir_path: str):
        for i, m in enumerate(self.members):
            m.load(os.path.join(dir_path, f"member_{i}.pkl"))
