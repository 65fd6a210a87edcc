"""Multi-device scaling check: rollout throughput vs mesh size.

Measures aggregate env-steps/s of the sharded batch at 1, 2, 4, ... devices
(weak scaling: envs-per-device held constant) and reports parallel
efficiency. On a TPU pod slice this is the BASELINE scaling-efficiency
protocol; on a dev box run it against virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_check.py --envs-per-device 128 --steps 200
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
    p.add_argument("--envs-per-device", type=int, default=512)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--force-cpu-devices", type=int, default=0,
                   help="force N virtual CPU devices (must run before backend init)")
    args = p.parse_args()

    import os

    if args.force_cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        ).strip()

    import jax

    if args.force_cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from usv_tpu.envs import make
    from usv_tpu.envs.autoreset import make_autoreset_step
    from usv_tpu.parallel.mesh import batch_sharding, make_env_mesh, shard_env_batch

    handle = make(args.env)
    cfg = handle.cfg
    auto = jax.vmap(
        make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)
    )

    if jax.default_backend() == "cpu":
        print(json.dumps({
            "note": "virtual CPU devices share physical cores - efficiency "
                    "numbers are NOT meaningful here, only the mechanism is "
                    "being validated; run on a real pod slice for the metric"
        }))

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= n_dev]
    results = []
    base = None
    for k in sizes:
        mesh = make_env_mesh(jax.devices()[:k])
        num_envs = args.envs_per_device * k
        keys = jax.random.split(jax.random.key(0), num_envs)
        state = jax.vmap(lambda kk: handle.reset(cfg, kk))(keys)
        state = shard_env_batch(state, mesh)
        actions = jax.device_put(
            jnp.zeros((num_envs, cfg.action_dim), jnp.float32),
            batch_sharding(mesh),
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
        sps = num_envs * args.steps / dt
        if base is None:
            base = sps
        eff = sps / (base * k)
        results.append(
            dict(devices=k, num_envs=num_envs, steps_per_second=round(sps),
                 efficiency=round(eff, 3))
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
