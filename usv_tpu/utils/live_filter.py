"""Streaming IIR filtering.

Two forms of the reference's ``LiveLFilter`` (utils/live_filter.py:20-40):

* :class:`LiveLFilter` — the same stateful scalar difference-equation filter
  (host-side, for the gym adapter / interactive tools).
* :func:`iir_filter_scan` — the TPU-native form: filter a whole (batched)
  signal under ``lax.scan`` in one fused program, for on-device action
  smoothing of vectorized envs.
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np


class LiveFilter:
    """Base class: NaN passthrough + __call__ sugar (reference :4-18)."""

    def process(self, x):
        if np.isnan(x):
            return x
        return self._process(x)

    def __call__(self, x):
        return self.process(x)

    def _process(self, x):
        raise NotImplementedError


class LiveLFilter(LiveFilter):
    """Difference-equation filter from scipy-style (b, a) coefficients."""

    def __init__(self, b, a):
        self.b = np.asarray(b, dtype=np.float64)
        self.a = np.asarray(a, dtype=np.float64)
        self._xs = deque([0.0] * len(b), maxlen=len(b))
        self._ys = deque([0.0] * (len(a) - 1), maxlen=len(a) - 1)

    def _process(self, x):
        self._xs.appendleft(x)
        y = np.dot(self.b, self._xs) - np.dot(self.a[1:], self._ys)
        y = y / self.a[0]
        self._ys.appendleft(y)
        return y


def iir_filter_scan(b, a, signal, zi=None):
    """Apply the same difference equation over the leading time axis.

    signal: (T,) or (T, B...); returns (filtered_signal, final_state) where
    state is (xs, ys) ring contents. Equivalent per-sample to LiveLFilter.
    """
    b = jnp.asarray(b, dtype=signal.dtype)
    a = jnp.asarray(a, dtype=signal.dtype)
    nb, na = b.shape[0], a.shape[0] - 1
    tail_shape = signal.shape[1:]
    if zi is None:
        xs0 = jnp.zeros((nb,) + tail_shape, signal.dtype)
        ys0 = jnp.zeros((na,) + tail_shape, signal.dtype)
    else:
        xs0, ys0 = zi

    def step(carry, x):
        xs, ys = carry
        xs = jnp.concatenate([x[None], xs[:-1]], axis=0)
        y = (
            jnp.tensordot(b, xs, axes=(0, 0))
            - jnp.tensordot(a[1:], ys, axes=(0, 0))
        ) / a[0]
        ys = jnp.concatenate([y[None], ys[:-1]], axis=0)
        return (xs, ys), y

    (xs, ys), out = jax.lax.scan(step, (xs0, ys0), signal)
    return out, (xs, ys)
