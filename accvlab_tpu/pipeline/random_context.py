"""Randomness injection for pipeline steps.

DALI ops draw from the pipeline's internal RNG streams
(``fn.random.uniform`` etc.); the TPU-native framework instead hands every
step an explicit :class:`RandomContext`:

* :class:`HostRandomContext` — numpy ``Generator`` (host steps),
* :class:`DeviceRandomContext` — splits a ``jax.random`` key functionally
  (device steps, per-sample under ``vmap``),
* :class:`ScriptedRandomContext` — returns scripted sequences matched by
  value range; the test-injection pattern of the reference's
  ``DaliFakeRandomGenerator``
  (``tests/processing_steps/_dali_fake_random_generator.py:8-40``).

All draws are shape-explicit, so step code is identical for host and device
execution.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Sequence, Tuple

import numpy as np


class RandomContext(ABC):
    """Source of randomness handed to pipeline steps."""

    @abstractmethod
    def uniform(self, low: float = 0.0, high: float = 1.0, shape: Tuple[int, ...] = ()):
        """Uniform floats in ``[low, high)``."""

    @abstractmethod
    def normal(self, mean: float = 0.0, stddev: float = 1.0, shape: Tuple[int, ...] = ()):
        """Normal floats."""

    @abstractmethod
    def randint(self, low: int, high: int, shape: Tuple[int, ...] = ()):
        """Uniform ints in ``[low, high)``."""

    def coin_flip(self, probability: float = 0.5, shape: Tuple[int, ...] = ()):
        """Bernoulli draw (True with ``probability``)."""
        return self.uniform(0.0, 1.0, shape) < probability


class HostRandomContext(RandomContext):
    """numpy-backed context for host-side (per-sample) steps."""

    def __init__(self, seed_or_generator):
        if isinstance(seed_or_generator, np.random.Generator):
            self._rng = seed_or_generator
        else:
            self._rng = np.random.default_rng(seed_or_generator)

    def uniform(self, low=0.0, high=1.0, shape=()):
        return self._rng.uniform(low, high, shape).astype(np.float32)

    def normal(self, mean=0.0, stddev=1.0, shape=()):
        return self._rng.normal(mean, stddev, shape).astype(np.float32)

    def randint(self, low, high, shape=()):
        return self._rng.integers(low, high, shape, dtype=np.int32)


class DeviceRandomContext(RandomContext):
    """``jax.random``-backed context. Functional under the hood: every draw
    splits the held key, so draws are deterministic given the batch key and
    the (static) order of draws in the traced program."""

    def __init__(self, key):
        self._key = key

    def _next(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def uniform(self, low=0.0, high=1.0, shape=()):
        import jax

        return jax.random.uniform(
            self._next(), shape, minval=low, maxval=high, dtype="float32"
        )

    def normal(self, mean=0.0, stddev=1.0, shape=()):
        import jax

        return mean + stddev * jax.random.normal(self._next(), shape, dtype="float32")

    def randint(self, low, high, shape=()):
        import jax

        return jax.random.randint(self._next(), shape, low, high, dtype="int32")


class ScriptedRandomContext(RandomContext):
    """Deterministic scripted randomness for tests.

    Sequences are registered per ``(low, high)`` range (uniform/randint) or
    per ``(mean, stddev)`` (normal); each draw pops the next scripted value,
    broadcast to the requested shape. Unregistered ranges raise — a test
    exercising a new random draw must script it explicitly.
    """

    def __init__(self):
        self._uniform_seqs = {}
        self._normal_seqs = {}
        self._randint_seqs = {}

    def script_uniform(self, low, high, values: Sequence[float]):
        self._uniform_seqs.setdefault((float(low), float(high)), []).extend(values)

    def script_normal(self, mean, stddev, values: Sequence[float]):
        self._normal_seqs.setdefault((float(mean), float(stddev)), []).extend(values)

    def script_randint(self, low, high, values: Sequence[int]):
        self._randint_seqs.setdefault((int(low), int(high)), []).extend(values)

    @staticmethod
    def _pop(seqs, key, kind):
        if key not in seqs or not seqs[key]:
            raise AssertionError(f"No scripted {kind} values for range {key}")
        return seqs[key].pop(0)

    def uniform(self, low=0.0, high=1.0, shape=()):
        v = self._pop(self._uniform_seqs, (float(low), float(high)), "uniform")
        return np.full(shape, v, np.float32) if shape else np.float32(v)

    def normal(self, mean=0.0, stddev=1.0, shape=()):
        v = self._pop(self._normal_seqs, (float(mean), float(stddev)), "normal")
        return np.full(shape, v, np.float32) if shape else np.float32(v)

    def randint(self, low, high, shape=()):
        v = self._pop(self._randint_seqs, (int(low), int(high)), "randint")
        return np.full(shape, v, np.int32) if shape else np.int32(v)
