"""Same-session A/B: is the sharded program free on one chip?

VERDICT r3 next-#3, part 1: the closest single-chip proxy for "sharding
costs nothing" is the SAME 4096-env autoreset program compiled (a) plain
vmapped and (b) with an n=1 `env`-mesh NamedSharding on the batch axis —
identical math, identical device; any delta is pure partitioner overhead.
Protocol mirrors bench.py (scan-amortized, obs kept alive, scalar-sync
timing) and interleaves A/B/A/B to cancel session drift.

Run on the real TPU:  python tools/sharding_overhead_ab.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="usv-simple")
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--steps", type=int, default=2048)
    p.add_argument("--reps", type=int, default=2,
                   help="A/B pairs (interleaved)")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from usv_tpu.envs import make
    from usv_tpu.envs.autoreset import make_autoreset_step
    from usv_tpu.parallel.mesh import (
        batch_sharding,
        make_env_mesh,
        shard_env_batch,
    )

    handle = make(args.env)
    cfg = handle.cfg
    auto = jax.vmap(
        make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)
    )
    keys = jax.random.split(jax.random.key(0), args.num_envs)
    state0 = jax.vmap(lambda k: handle.reset(cfg, k))(keys)
    actions = jnp.zeros((args.num_envs, cfg.action_dim), jnp.float32)

    def build_run():
        @jax.jit
        def run(state, actions):
            def body(s, _):
                s, ts = auto(s, actions)
                # consume every output (honest-bench protocol: obs alive)
                return s, (jnp.sum(ts.obs), jnp.sum(ts.reward))
            s, (os_, rs) = jax.lax.scan(body, state, None, length=args.steps)
            return s, jnp.sum(os_) + jnp.sum(rs)
        return run

    mesh = make_env_mesh(jax.devices()[:1])
    state_sharded = shard_env_batch(state0, mesh)
    actions_sharded = jax.device_put(actions, batch_sharding(mesh))

    run_plain = build_run()
    run_sharded = build_run()

    # compile both
    float(run_plain(state0, actions)[1])
    float(run_sharded(state_sharded, actions_sharded)[1])

    def timed(run, state, acts):
        t0 = time.perf_counter()
        s, out = run(state, acts)
        float(out)  # scalar sync (block_until_ready unreliable on axon)
        return args.num_envs * args.steps / (time.perf_counter() - t0)

    results = {"plain": [], "sharded_n1": []}
    for _ in range(args.reps):
        results["plain"].append(timed(run_plain, state0, actions))
        results["sharded_n1"].append(timed(run_sharded, state_sharded,
                                           actions_sharded))

    mean = lambda xs: sum(xs) / len(xs)
    summary = dict(
        env=args.env,
        num_envs=args.num_envs,
        steps=args.steps,
        backend=jax.default_backend(),
        plain_steps_per_s=[round(x) for x in results["plain"]],
        sharded_n1_steps_per_s=[round(x) for x in results["sharded_n1"]],
        overhead_pct=round(
            100.0 * (1.0 - mean(results["sharded_n1"]) / mean(results["plain"])),
            2,
        ),
    )
    print(json.dumps(summary), flush=True)
    if args.json_out:
        Path(args.json_out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json_out).write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
