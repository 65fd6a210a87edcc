"""Decompose the autoreset step cost: raw step vs reset-recompute vs RNG.

The branch-free autoreset (usv_tpu/envs/autoreset.py) recomputes a full
domain-randomized reset for EVERY env on EVERY step and selects it where
``done`` — measured faster than pooled/gather alternatives at 4096 envs, but
it puts the whole reset sampling pipeline (threefry draws for path,
obstacles, velocities) on the per-step critical path. This tool attributes
that cost in one session:

  raw        vmapped step only, dones ignored (no reset, no select)
  autoreset  the production path (anchor; equals tools/bench_all.py rows)
  reset_only vmapped reset alone per scan step
  rbg        autoreset with RBG-keyed env states: same distributions,
             different (non-threefry) random stream — jax.random.key(...,
             impl='rbg') is far cheaper on TPU's vector units

Usage: python tools/bench_step_anatomy.py [--env usv-simple] [--envs 4096]
           [--steps 2048] [--ignore-obstacles]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from functools import partial


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=2048)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--ignore-obstacles", action="store_true")
    p.add_argument("--cost-analysis", action="store_true",
                   help="also print XLA cost_analysis (flops/bytes) of the "
                        "one-step programs for the roofline table")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from usv_tpu.envs import make
    from usv_tpu.envs.autoreset import make_autoreset_step

    kw = {"ignore_obstacles": True} if args.ignore_obstacles else {}
    handle = make(args.env, **kw)
    cfg = handle.cfg
    B, T = args.envs, args.steps

    vreset = jax.vmap(partial(handle.reset, cfg))
    vstep = jax.vmap(partial(handle.step, cfg))
    vauto = jax.vmap(
        make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)
    )

    def scan_prog(body, init):
        def run(key):
            carry, _ = jax.lax.scan(body, init(key), None, length=T)
            # consume EVERY float carry element so nothing is loop-dead
            # (XLA's while-loop simplifier removes dead tuple elements,
            # which would silently drop the work being measured)
            leaves = [
                x for x in jax.tree.leaves(carry)
                if not jax.dtypes.issubdtype(x.dtype, jax.dtypes.extended)
                and jnp.issubdtype(x.dtype, jnp.floating)
            ]
            return sum(jnp.sum(x) for x in leaves)
        return jax.jit(run)

    def time_prog(run):
        def sync(key):
            out = run(key)
            return float(jnp.ravel(out)[0])
        sync(jax.random.key(0))
        best = float("inf")
        for i in range(args.repeats):
            t0 = time.perf_counter()
            sync(jax.random.key(i + 1))
            best = min(best, time.perf_counter() - t0)
        return best

    zeros = jnp.zeros((B, cfg.action_dim), dtype=jnp.float32)

    def init_states(key, impl=None):
        keys = jax.random.split(
            jax.random.key(0, impl=impl) if impl else key, B
        )
        return vreset(keys)

    progs = {}

    def state_body(stepper):
        def body(state, _):
            state, ts = stepper(state, zeros)
            return state, None
        return body

    progs["raw"] = scan_prog(
        state_body(lambda s, a: vstep(s, a)), init_states
    )
    progs["autoreset"] = scan_prog(state_body(vauto), init_states)

    # --- round-5 decomposition of the autoreset increment (VERDICT r4 #2):
    # autoreset - raw = fresh-reset recompute + pytree select + obs select.
    # `select_only` replaces the fresh reset with a CONSTANT pre-reset state
    # (key threading kept) so the increment over `raw` prices the selects
    # and key split alone; `reset_share` = autoreset - select_only is then
    # the per-step reset-math recompute as paid in situ (fused into the
    # production program — reset_only prices it as a standalone program).
    from usv_tpu.envs.autoreset import _get_key, _select, _set_key
    from usv_tpu.envs.types import TimeStep as _TS

    def make_const_autoreset(template_state):
        def auto_step(state, action):
            new_state, ts = handle.step(cfg, state, action)
            done = ts.done
            next_key, reset_key = jax.random.split(_get_key(new_state))
            fresh = _set_key(template_state, next_key)
            out_state = _select(done, fresh, _set_key(new_state, next_key))
            obs = jnp.where(done, handle.reset_obs(cfg, fresh), ts.obs)
            return out_state, _TS(
                obs=obs, reward=ts.reward, terminated=ts.terminated,
                truncated=ts.truncated, info=dict(ts.info),
            )
        return auto_step

    def select_only_prog():
        # one concrete reset state as the shared constant template
        template = jax.tree.map(
            lambda x: x[0], vreset(jax.random.split(jax.random.key(42), B))
        )
        vconst = jax.vmap(make_const_autoreset(template))
        return scan_prog(state_body(vconst), init_states)

    progs["select_only"] = select_only_prog()

    # (A prototype "fused single-threefry-sweep reset" variant lived here
    # during round 5; it WON the same-session A/B — autoreset 128.5 ->
    # 111.0 us — and was promoted into envs/simple.py::reset (and the CA
    # env's _build_core), so the production `autoreset` row now measures
    # the fused form. The recorded A/B lives in docs/PERFORMANCE.md
    # "round-5 anatomy"; the prototype was removed to keep this tool from
    # silently desynchronizing from the production layout.)

    def reset_body(carry, _):
        key, acc = carry
        key, kr = jax.random.split(key)
        st = vreset(jax.random.split(kr, B))
        # consume one (float) leaf so the reset is not dead code
        leaf = [
            x for x in jax.tree.leaves(st)
            if not jax.dtypes.issubdtype(x.dtype, jax.dtypes.extended)
            and jnp.issubdtype(x.dtype, jnp.floating)
        ][0]
        return (key, acc + jnp.sum(leaf[..., :1])), None

    progs["reset_only"] = scan_prog(reset_body, lambda k: (k, jnp.zeros(())))

    # bench-path decomposition: what the production rollout_scan pays on
    # top of the bare autoreset state recursion.
    def reward_body(carry, _):
        state, rsum = carry
        state, ts = vauto(state, zeros)
        return (state, rsum + jnp.sum(ts.reward)), None

    progs["autoreset_rewardsum"] = scan_prog(
        reward_body, lambda k: (init_states(k), jnp.zeros(()))
    )

    def obs_body(carry, _):
        state, obs, rsum = carry
        state, ts = vauto(state, zeros)
        return (state, ts.obs, rsum + jnp.sum(ts.reward)), None

    progs["autoreset_obs_carry"] = scan_prog(
        obs_body,
        lambda k: (init_states(k),
                   jnp.zeros((B, cfg.obs_dim), jnp.float32), jnp.zeros(())),
    )

    from usv_tpu.vector.rollout import rollout_scan

    # call the production jitted program directly and index on the host —
    # wrapping it in an outer jit that returns only reward_sum would DCE
    # the obs output right back out
    _bench_run = rollout_scan(handle, B, T)
    progs["bench_exact"] = lambda key: _bench_run(key)[2]

    # rollout_scan body verbatim, but scan over length=T instead of a
    # presplit (T,) key array (keys are unused with the zero-action policy)
    vreset_obs = jax.vmap(partial(handle.reset_obs, cfg))

    def nokeys_body(carry, _):
        state, obs, rsum, dcount = carry
        state, ts = vauto(state, zeros)
        return (state, ts.obs, rsum + jnp.sum(ts.reward),
                dcount + jnp.sum(ts.done)), None

    def init_full(key):
        st = init_states(key)
        return (st, vreset_obs(st), jnp.zeros(()), jnp.zeros((), jnp.int32))

    progs["bench_nokeys"] = scan_prog(nokeys_body, init_full)

    for name, run in progs.items():
        dt = time_prog(run)
        print(json.dumps({
            "config": name,
            "env": args.env,
            "ignore_obstacles": args.ignore_obstacles,
            "ms_per_batched_step": round(1e3 * dt / T, 4),
            "steps_per_second": round(B * T / dt, 1),
        }), flush=True)

    if args.cost_analysis:
        # XLA's own accounting of the compiled one-step programs: flops,
        # transcendentals, bytes accessed — the inputs to the roofline
        # table in docs/PERFORMANCE.md (measured time vs these vs chip
        # peaks). One-step jits (not the scan) so the numbers are per step.
        def one_step_cost(fn, with_state=True):
            st = init_states(jax.random.key(0))
            c = jax.jit(fn).lower(st, zeros).compile().cost_analysis()
            return {k: c.get(k) for k in
                    ("flops", "transcendentals", "bytes accessed")}

        for name, fn in (
            ("raw_step", lambda s, a: vstep(s, a)),
            ("autoreset_step", vauto),
        ):
            print(json.dumps({"cost_analysis": name, **one_step_cost(fn)}),
                  flush=True)
        st = init_states(jax.random.key(0))
        keys = jax.random.split(jax.random.key(1), B)
        c = jax.jit(lambda k: vreset(k)).lower(keys).compile().cost_analysis()
        print(json.dumps({"cost_analysis": "reset_only", **{
            k: c.get(k) for k in
            ("flops", "transcendentals", "bytes accessed")}}), flush=True)


if __name__ == "__main__":
    main()
