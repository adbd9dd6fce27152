"""Timestep schedule samplers (reference ttts/utils/resample.py:9-196).

UniformSampler is what diffusion training effectively uses
(diffusion/train.py:170 draws plain uniform ints); LossSecondMomentResampler
implements importance sampling over timesteps by loss second moment, with the
cross-replica history sync replaced by deterministic local history (the
reference's _update_with_all_losses gathered via torch.distributed;
under pjit the per-step losses are already global)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


class UniformSampler:
    """w_t = 1 for all t (resample.py:62-70)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key, batch: int):
        t = jax.random.randint(key, (batch,), 0, self.num_timesteps)
        weights = jnp.ones((batch,))
        return t, weights


class DeterministicSampler:
    """Cycles timesteps deterministically (resample.py:71-90, debug tool)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._next = 0

    def sample(self, key, batch: int):
        t = (np.arange(batch) + self._next) % self.num_timesteps
        self._next = int((self._next + batch) % self.num_timesteps)
        return jnp.asarray(t), jnp.ones((batch,))


class LossSecondMomentResampler:
    """Importance-sample t ∝ sqrt(E[loss²]) with 10-sample history per t and
    uniform fallback until warm (resample.py:159-196). State is host-side
    numpy (update happens between steps, like the reference)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_timesteps, history_per_term), np.float64)
        self._loss_counts = np.zeros((num_timesteps,), np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones((self.num_timesteps,), np.float64) / self.num_timesteps
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w /= w.sum()
        w = w * (1 - self.uniform_prob) + self.uniform_prob / len(w)
        return w

    def sample(self, key, batch: int):
        w = self.weights()
        t = jax.random.choice(key, self.num_timesteps, (batch,), p=jnp.asarray(w))
        # importance weights 1/(N p(t))
        weights = 1.0 / (self.num_timesteps * jnp.asarray(w)[t])
        return t, weights

    def update_with_losses(self, ts, losses):
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            t = int(t)
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Factory (resample.py:9-30)."""
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "deterministic":
        return DeterministicSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(name)
