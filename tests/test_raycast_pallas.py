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


def test_defer_sqrt_matches_in_loop_form():
    """The squared-space hit test (sqrt hoisted out of the obstacle loop)
    must reproduce the in-loop-sqrt kernel exactly away from the
    measure-zero equality tie; several scene scales including rays that
    start inside obstacles and hits near max_range."""
    for seed, scale in [(0, 20.0), (1, 100.0), (2, 200.0)]:
        rng = np.random.default_rng(seed)
        B, K = 32, 12
        pos = jnp.asarray(rng.uniform(-scale, scale, (B, 3)), jnp.float32)
        oxy = jnp.asarray(rng.uniform(-scale, scale, (B, K, 2)), jnp.float32)
        orr = jnp.asarray(rng.uniform(0.15, 6.0, (B, K)), jnp.float32)
        mask = jnp.asarray(rng.uniform(0, 1, (B, K)) > 0.3)
        base = raycast_pallas_batched(
            pos, oxy, orr, mask, 64, 100.0, first_hit=True, interpret=True,
            defer_sqrt=False,
        )
        got = raycast_pallas_batched(
            pos, oxy, orr, mask, 64, 100.0, first_hit=True, interpret=True,
            defer_sqrt=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


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


# ---------------------------------------------------------------------------
# Adversarial tangency suite (VERDICT r3 next-#4): grazing-incidence scenes
# quantify the v4 lateral-offset fold's f32 caveat — the cancellation in
# (r^2 - d^2) + xk^2 carries ~ulp(d^2) absolute error into the tangency test
# (ops/raycast_pallas.py:86-97) — against the f64 C++ oracle. Measured on
# this suite (512 scenes/case, interpret mode = the kernel's f32 arithmetic):
#   fused (v4, default): 0 flips anywhere for |b - r| >= 1e-2 m out to the
#     100 m max range; |b - r| = 1e-3 at d = 100 flips 1/512 (0.2%);
#     |b - r| = 1e-4 flips 76/512 at d = 50 and 230/512 at d = 100.
#   unfused (fold_lateral=False): 0 flips down to |b - r| = 1e-4 at all d,
#     max hit-distance error 5e-4 (vs 3.6e-2 fused at the 1e-4 knife edge).
# b is the ray->circle impact parameter; a "flip" is any ray whose hit/miss
# classification differs from the f64 oracle.
# ---------------------------------------------------------------------------

_R16, _MAXR = 16, 100.0
_RES16 = (2.0 / 3.0) * 2.0 * np.pi / _R16


def _tangency_scenes(d, eps, n, seed):
    """n single-obstacle scenes whose impact parameter vs ray 8 is exactly
    r +/- eps (alternating sides), at center distance d, random pose/psi."""
    rng = np.random.default_rng(seed)
    psi = rng.uniform(-np.pi, np.pi, n)
    pos = np.stack([rng.uniform(-5, 5, n), rng.uniform(-5, 5, n), psi], axis=1)
    th = psi - 2 * np.pi / 3 + 8 * _RES16
    r = np.full(n, 1.0)
    b = r + np.where(np.arange(n) % 2, 1.0, -1.0) * eps
    cx = pos[:, 0] + d * np.cos(th) - b * np.sin(th)
    cy = pos[:, 1] + d * np.sin(th) + b * np.cos(th)
    return (
        pos.astype(np.float32), cx.astype(np.float32),
        cy.astype(np.float32), r.astype(np.float32),
    )


def _tangency_flips(d, eps, n=256, fold_lateral=True):
    """(flip_scene_count, max |dist err| on rays both sides call hits)."""
    import usv_tpu.native as native

    pos, cx, cy, r = _tangency_scenes(d, eps, n, seed=int(d * 1000 + eps * 1e7))
    got = np.asarray(raycast_pallas_batched(
        jnp.asarray(pos), jnp.stack([cx, cy], axis=-1)[:, None, :],
        jnp.asarray(r)[:, None], jnp.ones((n, 1), bool),
        _R16, _MAXR, first_hit=True, interpret=True,
        fold_lateral=fold_lateral,
    ))
    flips, max_err = 0, 0.0
    for i in range(n):
        oracle = native.raycast(
            pos[i].astype(np.float64), np.array([np.float64(cx[i])]),
            np.array([np.float64(cy[i])]), np.array([np.float64(r[i])]),
            _R16, _MAXR, _RES16,
        )
        ohit = oracle < _MAXR - 1e-9
        ghit = got[i] < _MAXR - 1e-9
        flips += int(np.any(ohit != ghit))
        both = ohit & ghit
        if np.any(both):
            max_err = max(max_err, float(np.max(np.abs(got[i][both] - oracle[both]))))
    return flips, max_err


try:  # the 3 kernel tests above compare vs XLA and never need the oracle
    import usv_tpu.native  # noqa: F401
    _HAVE_NATIVE = True
except Exception:
    _HAVE_NATIVE = False

needs_native = pytest.mark.skipif(
    not _HAVE_NATIVE, reason="tangency oracle needs the native (g++) build"
)


@needs_native
@pytest.mark.parametrize("d", [5.0, 20.0, 50.0, 100.0])
@pytest.mark.parametrize("eps", [1e-1, 1e-2])
def test_tangency_no_flips_above_1cm(d, eps):
    """The fused v4 kernel never flips a tangency whose impact parameter is
    >= 1 cm from the radius, at any range up to sensor_max_range, and its
    hit distances stay within 2 cm of the f64 oracle there."""
    flips, max_err = _tangency_flips(d, eps, fold_lateral=True)
    assert flips == 0, f"d={d} |b-r|={eps}: {flips} flip scenes"
    assert max_err < 2e-2, f"d={d} |b-r|={eps}: dist err {max_err}"


@needs_native
def test_tangency_grazing_flip_rate_bounded():
    """At the millimeter knife edge (|b-r| = 1e-3 m at d = 100 m, where
    |b^2 - r^2| ~ ulp(d^2)) the fused kernel's flip rate stays below 2%
    (measured 1/512); hit-distance error stays below 5 cm."""
    flips, max_err = _tangency_flips(100.0, 1e-3, n=512, fold_lateral=True)
    assert flips <= 10, f"flip rate {flips}/512 exceeds the 2% bound"
    assert max_err < 5e-2


@needs_native
def test_tangency_unfused_is_flip_free_at_knife_edge():
    """The opt-out (fold_lateral=False, the v2 lateral form) is the escape
    hatch the ADVICE r3 finding asked to document: at |b-r| = 1e-4 m —
    where the fused kernel measurably flips (230/512 at d=100) — the
    unfused form has ZERO flips and sub-mm distance error at every range."""
    for d in (50.0, 100.0):
        flips, max_err = _tangency_flips(d, 1e-4, fold_lateral=False)
        assert flips == 0, f"unfused flipped at d={d}"
        assert max_err < 1e-3
    # and the fused kernel's knife-edge flips are real (the caveat is not
    # hypothetical) — keeps this suite honest if the kernel changes
    flips_fused, _ = _tangency_flips(100.0, 1e-4, n=256, fold_lateral=True)
    assert flips_fused > 0, "expected measurable knife-edge flips at 1e-4"
