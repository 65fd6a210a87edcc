"""Policy-serving benchmark: inference throughput/latency of a policy bundle.

The reference's deployment story is an SB3 ``model.zip`` evaluated one
observation at a time inside a DummyVecEnv rollout (notebooks/
plot_agent_aitsmc_vec.ipynb cell 2) — it publishes no serving numbers. This
tool measures the two quantities a deployment actually cares about for a
bundle exported by ``usv_tpu.train.policy.export_policy``:

1. **Batch throughput** (actions/s) at several batch widths — the batch
   inference / fleet-serving regime. Timed as a chain of data-dependent
   policy applies inside one ``lax.scan`` program, so the number reflects
   device compute, not per-dispatch host latency (which on the sandbox's
   tunneled TPU is seconds and would swamp any honest measurement —
   CLAUDE.md "amortize everything into lax.scan").
2. **Per-dispatch latency** (ms) of a single jitted ``obs -> action`` call —
   the on-vehicle control-loop regime. On a locally attached device this is
   the real control-period bound; over the sandbox tunnel it measures the
   tunnel, so it is reported separately and labeled.

Usage:
    python tools/bench_policy.py [--bundle runs/.../policy_best]
                                 [--batch 1 256 4096] [--chain 512]

Without ``--bundle`` a fresh SAC-architecture policy (400x300, the
config_sac net) is initialized so the tool runs standalone.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # The sandbox sitecustomize pre-imports jax pinned to the TPU platform;
    # honor an explicit CPU request via jax.config (effective until the
    # first backend use), as tests/conftest.py does.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def _fresh_policy(obs_dim: int = 143, action_dim: int = 2,
                  frame_stack: int = 5):
    """A randomly initialized policy with the reference SAC architecture
    (config.py:32 net 400x300) for bundle-free runs."""
    import jax

    from usv_tpu.train.policy import Policy

    meta = dict(
        kind="sac", obs_dim=obs_dim * frame_stack, action_dim=action_dim,
        hidden=[400, 300], log_std_init=-3.0,
        action_low=[-1.0, -1.0], action_high=[1.0, 1.0],
        use_sde=False, frame_stack=frame_stack,
    )
    pol = Policy(meta, params=None)
    params = pol._net.init(
        jax.random.key(0), np.zeros((1, meta["obs_dim"]), np.float32)
    )
    return Policy(meta, params)


def bench_policy(policy, batch_sizes=(1, 256, 4096), chain: int = 512,
                 latency_calls: int = 50) -> list[dict]:
    """Measure serving throughput/latency of a ``Policy``; returns one dict
    per batch width. ``chain`` data-dependent applies run per timing rep."""
    import jax
    import jax.numpy as jnp

    obs_dim = policy.obs_dim
    act = policy._act  # jitted (params, obs) -> action
    rows = []
    for bs in batch_sizes:
        obs0 = jnp.asarray(
            np.random.default_rng(0).standard_normal((bs, obs_dim)),
            jnp.float32,
        )

        @jax.jit
        def chained(params, obs):
            def body(o, _):
                a = act(params, o)
                # feed the action back so applies are data-dependent and
                # XLA cannot collapse or reorder the chain
                o = o + jnp.pad(a, ((0, 0), (0, obs_dim - a.shape[1])))
                return jnp.tanh(o), a[0, 0]
            o, last = jax.lax.scan(body, obs, None, length=chain)
            return last[-1]

        float(chained(policy.params, obs0))  # compile + warm
        reps, best = 3, float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(policy.params, obs0))  # scalar fetch = sync
            best = min(best, time.perf_counter() - t0)
        actions_s = bs * chain / best

        # per-dispatch latency: single jitted call, scalar-fetch synced.
        # Warm up first: `act` was only ever traced INSIDE the chained
        # program above, so the first direct call compiles a fresh
        # executable (seconds over the tunnel) and would corrupt p50/p95.
        float(act(policy.params, obs0)[0, 0])
        lat = []
        for _ in range(latency_calls):
            t0 = time.perf_counter()
            float(act(policy.params, obs0)[0, 0])
            lat.append(time.perf_counter() - t0)
        lat_ms = sorted(lat)
        rows.append(dict(
            batch=bs,
            actions_per_s=actions_s,
            us_per_action=1e6 / actions_s,
            dispatch_ms_p50=1e3 * lat_ms[len(lat_ms) // 2],
            dispatch_ms_p95=1e3 * lat_ms[int(len(lat_ms) * 0.95)],
        ))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bundle", default=None,
                   help="policy bundle dir (default: fresh 400x300 SAC net)")
    p.add_argument("--batch", type=int, nargs="+", default=[1, 256, 4096])
    p.add_argument("--chain", type=int, default=512,
                   help="chained applies per timing rep")
    p.add_argument("--latency-calls", type=int, default=50)
    args = p.parse_args(argv)

    if args.bundle:
        from usv_tpu.train.policy import load_policy

        policy = load_policy(args.bundle)
        src = args.bundle
    else:
        policy = _fresh_policy()
        src = "fresh 400x300 SAC net (no --bundle)"

    import jax

    print(f"# policy: {src}  obs_dim={policy.obs_dim} "
          f"act_dim={policy.action_dim}  device={jax.devices()[0].platform}")
    for row in bench_policy(policy, tuple(args.batch), args.chain,
                            args.latency_calls):
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in row.items()}))


if __name__ == "__main__":
    main()
