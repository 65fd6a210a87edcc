"""Pallas TPU kernel for the ray-cast sensor (batched).

The XLA formulation (ops/raycast.py) materializes (batch, rays, obstacles)
intermediates in HBM; this kernel loops over the obstacle axis inside VMEM,
keeping only (rays, env-tile) running minima — no (B, R, K) tensor ever
touches HBM, and both reduction semantics (true min and the reference's
first-hit-in-boundary-order) happen in one pass.

Layout: the env batch rides the LANE axis (tiles of 128 envs), rays ride the
sublane axis, and the per-obstacle scalars are stored obstacle-major (K, B)
so the obstacle loop indexes the sublane dimension (dynamic sublane indexing
is legal on TPU; dynamic lane indexing is not). The wrapper transposes
to/from the (B, ...) caller layout.

Integration with the vmapped env step is via ``jax.custom_batching
.custom_vmap``: the single-env call lowers to the XLA formulation, the
batched call to this kernel (see :func:`make_raycast_compat`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENV_TILE = 128  # envs per program (lane width)

# Kernel v5 (round 4): the per-obstacle sqrt moves out of the hot loop —
# carry the winner's (xk, delta) and test hit-ness in squared space, one
# sqrt on the winner after the loop. Same-session A/B/A/B at the 4096-env
# bench protocol: 27.24/26.98 (v4) vs 28.66/28.60 M env-steps/s (v5),
# +5.6%. Parity: bitwise-identical to the in-loop form on random scenes
# (interpret mode; tests/test_raycast_pallas.py::
# test_defer_sqrt_matches_in_loop_form); the only divergence is the
# measure-zero exact-equality tie noted in the kernel. Default ON;
# USV_RAYCAST_DEFER_SQRT=0 restores v4 for A/B measurement
# process-by-process (the env-var form lets bench.py A/B the full
# production program with envs untouched).
import os as _os


def _env_bool(name, default):
    v = _os.environ.get(name, "").strip().lower()
    if not v:
        return default
    if v in ("1", "true", "on", "yes"):
        return True
    if v in ("0", "false", "off", "no"):
        return False
    raise ValueError(f"{name}={v!r}: expected a boolean (1/0/true/false)")


def _env_int(name, default):
    v = _os.environ.get(name, "").strip()
    if not v:
        return default
    try:
        return int(v)
    except ValueError:
        raise ValueError(f"{name}={v!r}: expected an integer") from None


# USV_RAYCAST_DEFER_SQRT / USV_RAYCAST_NACC are parsed lazily at the
# first call that leaves the kwarg as None (ADVICE r4 #3): a malformed
# value then errors at the call site instead of breaking every
# `import usv_tpu`, and setting the var after import still takes effect.
def _defer_sqrt_default():
    return _env_bool("USV_RAYCAST_DEFER_SQRT", True)


# Accumulator split (see the n_acc comment in the kernel): re-measured
# per process via env var since v5 lengthened the loop-carried select
# chain to 3 selects. Same-session A/B/A/B, v5e, v5 kernel, 4096-env
# bench protocol: n_acc=1 28.76/28.76 vs n_acc=2 27.87/27.88 M — the
# split is still 3.1% SLOWER; default stays 1.
def _nacc_default():
    return _env_int("USV_RAYCAST_NACC", 1)


def _batched_kernel(
    *refs,
    sensor_count, max_range, resolution, first_hit, n_obs, n_acc,
    angle_addition, fold_lateral, defer_sqrt,
):
    if angle_addition:
        pose_ref, ox_ref, oy_ref, or_ref, aux_ref, ray_ref, out_ref = refs
    else:
        pose_ref, ox_ref, oy_ref, or_ref, aux_ref, out_ref = refs
    x = pose_ref[0:1, :]    # (1, T)
    y = pose_ref[1:2, :]
    psi = pose_ref[2:3, :]

    if angle_addition:
        # cos/sin of (psi + ray_angle) via the addition identity: the
        # per-ray cos/sin are host-precomputed constants (ray_ref, shared
        # by every program), so the 2*(R, T) transcendental sweeps collapse
        # to 2*(1, T) plus FMAs over the tile. Round-3 kernel v3: measured
        # same-session A/B/A/B at the 4096-env bench protocol
        # 23.8/23.9 -> 25.2/25.3 M env-steps/s (+6% on the full autoreset
        # step; max deviation vs the direct cos/sin 1.1e-4 at 10 m range —
        # rounding of the identity, within every parity gate).
        ray_c = ray_ref[0:sensor_count, 0:1]             # (R, 1)
        ray_s = ray_ref[sensor_count:2 * sensor_count, 0:1]
        cp = jnp.cos(psi)   # (1, T)
        sp = jnp.sin(psi)
        c = cp * ray_c - sp * ray_s      # (R, T)
        s = sp * ray_c + cp * ray_s
    else:
        ray = jax.lax.broadcasted_iota(
            jnp.int32, (sensor_count, 1), 0
        ).astype(jnp.float32)
        angles = psi + (-2.0 * np.pi / 3.0) + ray * resolution   # (R, T)
        c = jnp.cos(angles)
        s = jnp.sin(angles)

    # (A boat-projection hoist — xk = (c*ox + s*oy) - px with px = c*x+s*y
    # per tile — was measured NEUTRAL-TO-NEGATIVE here: the (R, T) px
    # temporary stays live across the whole unrolled loop and the added
    # pressure outweighs the one saved op per obstacle. Keep the (1, T)
    # nx/ny form.)

    def init():
        if first_hit and defer_sqrt:
            # carry (key, xk, delta) and take ONE sqrt after the loop
            return (
                jnp.full((sensor_count, ENV_TILE), jnp.inf, jnp.float32),
                jnp.zeros((sensor_count, ENV_TILE), jnp.float32),
                jnp.full((sensor_count, ENV_TILE), jnp.inf, jnp.float32),
            )
        return (
            jnp.full((sensor_count, ENV_TILE), jnp.inf, jnp.float32),
            jnp.full((sensor_count, ENV_TILE), max_range, jnp.float32),
        )

    def body(k, carry):
        nx = ox_ref[pl.ds(k, 1), :] - x          # (1, T)
        ny = oy_ref[pl.ds(k, 1), :] - y
        xk = c * nx + s * ny                     # (R, T)
        if fold_lateral:
            # rotation invariance: yk^2 = d^2 - xk^2 with d^2 = nx^2 + ny^2,
            # so delta = r^2 - yk^2 = (r^2 - d^2) + xk^2 — the (r^2 - d^2)
            # term is ray-independent and prefolded on the XLA side
            # (or_ref carries q = r^2 - d^2), removing the yk transform and
            # its square from the hot loop. f32 caveat: the cancellation in
            # (r^2 - d^2) + xk^2 carries ~ulp(d^2) absolute error into
            # delta — ~1e-3 m^2 at d=100 m — which can flip knife-edge
            # tangencies; measured max hit-distance deviation stays ~1e-3
            # at bench scenes and every parity gate holds.
            q = or_ref[pl.ds(k, 1), :]           # r^2 - d^2 (prefolded)
            delta = q + xk * xk
        else:
            r2 = or_ref[pl.ds(k, 1), :]          # radius SQUARED (prefolded)
            yk = s * nx - c * ny
            delta = r2 - yk * yk
        if first_hit and defer_sqrt:
            # Kernel v5 candidate: keep the sqrt OUT of the per-obstacle
            # loop by carrying (xk, delta) of the current winner and
            # testing hit-ness in squared space:
            #   dist < max_range  <=>  sqrt(delta) > xk - max_range
            #                     <=>  delta >= max(xk - max_range, 0)^2
            # (both sides non-negative once xk >= 0; >= keeps the
            # delta == 0 grazing hit, and differs from the sqrt form only
            # at exact f32 equality of delta and (xk - max_range)^2 — a
            # measure-zero tie the unstable-argsort reference semantics
            # do not pin). One sqrt on the winning (R, T) pair replaces
            # n_obs sqrts.
            best_key, best_xk, best_delta = carry
            key_k = aux_ref[pl.ds(k, 1), :]      # (1, T)
            t = jnp.maximum(xk - max_range, 0.0)
            better = (
                (xk >= 0.0) & (delta >= t * t) & (key_k < best_key)
            )
            best_xk = jnp.where(better, xk, best_xk)
            best_delta = jnp.where(better, delta, best_delta)
            best_key = jnp.where(better, key_k, best_key)
            return best_key, best_xk, best_delta
        if first_hit:
            best_key, best_dist = carry
            # No delta>=0 test and no maximum(delta, 0): a miss (delta < 0)
            # makes sqrt return NaN, NaN poisons dist, and `dist < max_range`
            # is then false — the IEEE semantics do the gating for free.
            dist = xk - jnp.sqrt(delta)
            # aux is the ordering key with +inf in masked-out slots (folded
            # on the XLA side), so invalid obstacles can never win the
            # strict < below and no separate mask test is needed. Processing
            # slots in ascending order with a strict < keeps the first
            # occurrence on exact key ties (the reference's argsort is
            # unstable, so any tie order is equally faithful).
            key_k = aux_ref[pl.ds(k, 1), :]      # (1, T)
            better = (
                (xk >= 0.0) & (dist < max_range) & (key_k < best_key)
            )
            best_dist = jnp.where(better, dist, best_dist)
            best_key = jnp.where(better, key_k, best_key)
            return best_key, best_dist
        best_key, best_dist = carry
        # true-min folds dist into a running minimum, so NaN must be
        # clamped out here (jnp.minimum would propagate it)
        dist = xk - jnp.sqrt(jnp.maximum(delta, 0.0))
        m = aux_ref[pl.ds(k, 1), :]
        valid = (xk >= 0.0) & (delta >= 0.0) & (m > 0.5)
        best_dist = jnp.minimum(best_dist, jnp.where(valid, dist, max_range))
        return best_key, best_dist

    # Mosaic supports only full unroll; K<=64 keeps the unrolled body small
    # and lets the scheduler overlap the independent per-obstacle geometry.
    # The reduction is associative (min over the ordering key / plain min),
    # so n_acc > 1 splits it into stride-interleaved accumulators merged at
    # the end — shortening the loop-carried select chain from n_obs to
    # n_obs/n_acc dependent steps. MEASURED NEGATIVE on v5e (4096 envs x
    # 128 rays x 32 obstacles): n_acc=2/4 run 2-5% SLOWER than the single
    # chain — Mosaic already pipelines the unrolled geometry across the
    # short select chain, and the extra accumulators only add merge ops and
    # register pressure. Default stays 1; the option remains for wider
    # obstacle counts where the chain could actually dominate.
    # (Tie order across accumulators differs from the single-chain order;
    # the reference's argsort is unstable, so any tie order is faithful.)
    parts = []
    for a in range(n_acc):
        n_a = len(range(a, n_obs, n_acc))

        def chain(i, carry, a=a):
            return body(a + i * n_acc, carry)

        parts.append(
            jax.lax.fori_loop(0, n_a, chain, init(), unroll=max(n_a, 1))
            if n_a else init()
        )
    if first_hit and defer_sqrt:
        best_key, best_xk, best_delta = parts[0]
        for key_a, xk_a, delta_a in parts[1:]:
            take = key_a < best_key
            best_key = jnp.where(take, key_a, best_key)
            best_xk = jnp.where(take, xk_a, best_xk)
            best_delta = jnp.where(take, delta_a, best_delta)
        # the deferred sqrt: never-updated slots have best_delta = +inf, so
        # dist = -inf there; the isfinite(best_key) select masks them anyway.
        # Clamp to max_range: the squared-space acceptance (delta >= t*t)
        # admits boundary hits whose f32-rounded distance lands a ~1-ulp
        # band ABOVE max_range (not just the exact-equality tie), where the
        # in-loop form's `dist < max_range` guaranteed strictly-below
        # outputs — downstream normalization by max_range must never see
        # values > 1.0 (ADVICE r4 #1).
        best_dist = jnp.minimum(best_xk - jnp.sqrt(best_delta), max_range)
        out_ref[:, :] = jnp.where(jnp.isfinite(best_key), best_dist, max_range)
        return
    best_key, best_dist = parts[0]
    for key_a, dist_a in parts[1:]:
        if first_hit:
            take = key_a < best_key
            best_key = jnp.where(take, key_a, best_key)
            best_dist = jnp.where(take, dist_a, best_dist)
        else:
            best_dist = jnp.minimum(best_dist, dist_a)
    if first_hit:
        out_ref[:, :] = jnp.where(jnp.isfinite(best_key), best_dist, max_range)
    else:
        out_ref[:, :] = best_dist


def raycast_pallas_batched(
    position,       # (B, 3)
    obs_xy,         # (B, K, 2)
    obs_r,          # (B, K)
    obs_mask,       # (B, K) bool
    sensor_count: int,
    sensor_max_range: float,
    sensor_span: float = (2.0 / 3.0) * 2.0 * np.pi,
    boundary_distance=None,   # (B, K)
    first_hit: bool = True,
    interpret: bool = False,
    n_acc: int = None,
    angle_addition: bool = True,
    fold_lateral: bool = True,
    defer_sqrt: bool = None,
):
    """Batched raycast -> (B, R). B is padded up to a multiple of 128."""
    if defer_sqrt is None:
        defer_sqrt = _defer_sqrt_default()
    if n_acc is None:
        n_acc = _nacc_default()
    B, K = obs_r.shape
    resolution = sensor_span / sensor_count

    if boundary_distance is None:
        n = obs_xy - position[:, None, :2]
        boundary_distance = jnp.hypot(n[..., 0], n[..., 1]) - obs_r

    pad = (-B) % ENV_TILE
    if pad:
        position = jnp.pad(position, ((0, pad), (0, 0)))
        obs_xy = jnp.pad(obs_xy, ((0, pad), (0, 0), (0, 0)))
        obs_r = jnp.pad(obs_r, ((0, pad), (0, 0)))
        obs_mask = jnp.pad(obs_mask, ((0, pad), (0, 0)))
        boundary_distance = jnp.pad(boundary_distance, ((0, pad), (0, 0)))
    Bp = B + pad

    # obstacle-major layouts (sublane-indexable); pose padded to 4 rows
    pose_t = jnp.concatenate(
        [position.T.astype(jnp.float32), jnp.zeros((1, Bp), jnp.float32)], axis=0
    )  # (4, Bp)
    ox_t = obs_xy[..., 0].T.astype(jnp.float32)       # (K, Bp)
    oy_t = obs_xy[..., 1].T.astype(jnp.float32)
    r32 = obs_r.astype(jnp.float32)
    if fold_lateral:
        # q = r^2 - d^2 (center distance squared), ray-independent — see
        # the kernel's fold_lateral branch
        nx = obs_xy[..., 0].astype(jnp.float32) - position[:, 0:1].astype(jnp.float32)
        ny = obs_xy[..., 1].astype(jnp.float32) - position[:, 1:2].astype(jnp.float32)
        or_t = (r32 * r32 - (nx * nx + ny * ny)).T
    else:
        or_t = (r32 * r32).T                          # radius squared
    if first_hit:
        # fold the validity mask into the ordering key (inf never wins)
        aux_t = jnp.where(
            obs_mask, boundary_distance.astype(jnp.float32), jnp.inf
        ).T
    else:
        aux_t = obs_mask.T.astype(jnp.float32)

    kernel = functools.partial(
        _batched_kernel,
        sensor_count=sensor_count,
        max_range=float(sensor_max_range),
        resolution=float(resolution),
        first_hit=first_hit,
        n_obs=K,
        n_acc=max(1, min(int(n_acc), K)),
        angle_addition=angle_addition,
        fold_lateral=fold_lateral,
        defer_sqrt=defer_sqrt,
    )
    grid = (Bp // ENV_TILE,)

    def col_spec(rows):
        return pl.BlockSpec(
            (rows, ENV_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    operands = [pose_t, ox_t, oy_t, or_t, aux_t]
    in_specs = [col_spec(4)] + [col_spec(K)] * 4
    if angle_addition:
        base = -2.0 * np.pi / 3.0 + np.arange(sensor_count) * resolution
        ray_const = np.zeros((2 * sensor_count, ENV_TILE), np.float32)
        ray_const[:sensor_count, 0] = np.cos(base)
        ray_const[sensor_count:, 0] = np.sin(base)
        operands.append(jnp.asarray(ray_const))
        # every program reads the same constant block
        in_specs.append(pl.BlockSpec(
            (2 * sensor_count, ENV_TILE), lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((sensor_count, Bp), jnp.float32),
        in_specs=in_specs,
        out_specs=col_spec(sensor_count),
        interpret=interpret,
    )(*operands)
    return out.T[:B]


def make_raycast_compat(sensor_count, sensor_max_range, sensor_span, first_hit=True):
    """custom_vmap raycast: single env -> XLA formulation; batched -> Pallas.

    Returns fn(position(3,), obs_xy(K,2), obs_r(K,), obs_mask(K,),
    boundary(K,)) -> (R,), usable inside a vmapped env step.
    """
    from usv_tpu.ops.raycast import raycast, raycast_first_hit_compat

    @jax.custom_batching.custom_vmap
    def fn(position, obs_xy, obs_r, obs_mask, boundary):
        if first_hit:
            return raycast_first_hit_compat(
                position, obs_xy, obs_r, obs_mask,
                sensor_count, sensor_max_range, sensor_span,
                boundary_distance=boundary,
            )
        return raycast(
            position, obs_xy, obs_r, obs_mask,
            sensor_count, sensor_max_range, sensor_span,
        )

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, position, obs_xy, obs_r, obs_mask, boundary):
        # broadcast any unbatched operand (e.g. many boats sharing one
        # obstacle field) to the batch axis before the batched kernel
        args = [
            a if batched else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, batched in zip(
                (position, obs_xy, obs_r, obs_mask, boundary), in_batched
            )
        ]
        out = raycast_pallas_batched(
            args[0], args[1], args[2], args[3],
            sensor_count, sensor_max_range, sensor_span,
            boundary_distance=args[4], first_hit=first_hit,
        )
        return out, True

    return fn
