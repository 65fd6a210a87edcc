"""Throughput for every env family — regenerates the docs/PERFORMANCE.md table.

Usage: python tools/bench_all.py [--envs 4096] [--steps 256]
Prints one JSON line per family (plus a closing summary line).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--families", nargs="*", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from usv_tpu.envs import make, registered_ids
    from usv_tpu.envs.autoreset import make_autoreset_step

    results = []
    for env_id in args.families or sorted(registered_ids()):
        h = make(env_id)
        cfg = h.cfg
        state = jax.vmap(lambda k: h.reset(cfg, k))(
            jax.random.split(jax.random.key(0), args.envs)
        )
        actions = jnp.zeros((args.envs, cfg.action_dim), jnp.float32)
        auto = jax.vmap(
            make_autoreset_step(cfg, h.step, h.reset, h.reset_obs)
        )

        @jax.jit
        def run(state):
            def body(s, _):
                s, ts = auto(s, actions)
                return s, jnp.sum(ts.reward)

            s, rs = jax.lax.scan(body, state, None, length=args.steps)
            return jnp.sum(rs)

        float(run(state))  # compile + sync
        t0 = time.perf_counter()
        float(run(state))
        dt = time.perf_counter() - t0
        rec = dict(
            env=env_id,
            ms_per_step=round(dt / args.steps * 1e3, 3),
            steps_per_second=round(args.envs * args.steps / dt),
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"num_envs": args.envs, "families": results}))


if __name__ == "__main__":
    main()
