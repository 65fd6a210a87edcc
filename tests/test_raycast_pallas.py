"""Pallas raycast kernel: interpret-mode correctness on CPU (compiled-mode
correctness and the 1.7x step speedup are exercised on TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.ops.raycast import raycast, raycast_first_hit_compat
from usv_tpu.ops.raycast_pallas import raycast_pallas_batched


def _scene(B=16, K=12, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, 20, (B, 3)), jnp.float32)
    oxy = jnp.asarray(rng.uniform(0, 20, (B, K, 2)), jnp.float32)
    orr = jnp.asarray(rng.uniform(0.15, 0.5, (B, K)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, K)) > 0.3)
    return pos, oxy, orr, mask


@pytest.mark.parametrize("first_hit", [True, False])
def test_interpret_matches_xla(first_hit):
    pos, oxy, orr, mask = _scene()
    got = raycast_pallas_batched(
        pos, oxy, orr, mask, 64, 100.0, first_hit=first_hit, interpret=True
    )
    if first_hit:
        want = jax.vmap(
            lambda p, o, r, m: raycast_first_hit_compat(p, o, r, m, 64, 100.0)
        )(pos, oxy, orr, mask)
    else:
        want = jax.vmap(lambda p, o, r, m: raycast(p, o, r, m, 64, 100.0))(
            pos, oxy, orr, mask
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.parametrize("first_hit", [True, False])
@pytest.mark.parametrize("n_acc", [2, 3, 4])
def test_multi_accumulator_matches_single_chain(first_hit, n_acc):
    """The stride-interleaved accumulator split (an ILP experiment; measured
    slower on v5e, kept as an option) must be semantics-preserving."""
    pos, oxy, orr, mask = _scene(seed=3)
    base = raycast_pallas_batched(
        pos, oxy, orr, mask, 64, 100.0, first_hit=first_hit, interpret=True
    )
    got = raycast_pallas_batched(
        pos, oxy, orr, mask, 64, 100.0, first_hit=first_hit,
        interpret=True, n_acc=n_acc,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-6)


def test_interpret_handles_nonmultiple_batch():
    pos, oxy, orr, mask = _scene(B=7)
    got = raycast_pallas_batched(
        pos, oxy, orr, mask, 32, 100.0, first_hit=True, interpret=True
    )
    assert got.shape == (7, 32)
    want = jax.vmap(
        lambda p, o, r, m: raycast_first_hit_compat(p, o, r, m, 32, 100.0)
    )(pos, oxy, orr, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)
