"""Like-for-like single-env throughput on the reference's OWN protocol.

The reference's only throughput protocol is one env, a Python loop, 10k
zero-action steps (/root/reference/tools/profile_env.py:1-8). Every repo
headline so far is the batched scan-amortized TPU protocol — this tool
fills the literal "beats the reference on its own protocol" cells
(VERDICT r4 next-#4): the reference's actual ``UsvSimpleEnv`` and our
``compat.UsvSimpleEnv`` adapter, stepped by the same host loop, plus the
batch-size crossover where the vmapped design overtakes any plausible
njit number.

One measurement per process (the JAX platform is fixed per process; the
axon sandbox allows only one TPU process at a time). Results append to
``docs/artifacts/single_env_protocol_r5.json``.

Usage:
  python tools/reference_protocol_bench.py --side ref                # CPU
  python tools/reference_protocol_bench.py --side compat --platform cpu
  python tools/reference_protocol_bench.py --side compat --platform tpu
  python tools/reference_protocol_bench.py --side core --platform cpu
  python tools/reference_protocol_bench.py --side crossover --platform cpu
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import argparse
import importlib.util
import json
import time

ARTIFACT = REPO / "docs" / "artifacts" / "single_env_protocol_r5.json"


def _record(entry):
    data = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    data[entry.pop("name")] = entry
    ARTIFACT.write_text(json.dumps(data, indent=2) + "\n")
    print(json.dumps(entry))


def _set_platform(platform):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # platform == "tpu": leave the sandbox default (axon tunnel) in place
    return jax.devices()[0].platform


def _loop_steps_per_s(step_fn, n_steps, sync=None, warmup=100):
    """Time a host Python loop of ``step_fn()`` calls (the reference's
    protocol shape). ``sync`` fetches a scalar to force completion (the
    axon platform does not reliably block otherwise)."""
    for _ in range(warmup):
        step_fn()
    if sync:
        sync()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step_fn()
    if sync:
        sync()
    dt = time.perf_counter() - t0
    return n_steps / dt, dt


def _load_reference_simple_env():
    """The parity tests' stub installer, reused by file path (it loads the
    reference's modules WITHOUT executing gym_usv/__init__, with numba
    stubbed to a passthrough njit exactly as BASELINE.md's 270 steps/s row
    was measured)."""
    spec = importlib.util.spec_from_file_location(
        "_ref_env_parity", REPO / "tests" / "test_reference_env_parity.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._install_stub_packages()
    from gym_usv.envs.simple_env import UsvSimpleEnv

    return UsvSimpleEnv


def side_ref(args):
    """Reference UsvSimpleEnv, host loop, zero actions — njit interpreted
    (numba is not installable here; BASELINE.md rows 3-5 give the measured
    270 steps/s and the 2-10k njit estimate this pairs with)."""
    import numpy as np

    cls = _load_reference_simple_env()
    env = cls(render_mode="rgb_array")
    env.reset(seed=args.seed)
    zero = np.zeros(2)
    sps, dt = _loop_steps_per_s(lambda: env.step(zero), args.steps)
    _record(dict(
        name="ref_cpu_interpreted",
        steps_per_second=sps, seconds=dt, steps=args.steps,
        note="reference UsvSimpleEnv, njit stubbed (interpreted raycast); "
             "protocol of /root/reference/tools/profile_env.py",
    ))


def side_compat(args):
    """Our gymnasium adapter, same host loop — per-step jit dispatch
    included (this is exactly what an SB3/DummyVecEnv user pays)."""
    import numpy as np

    platform = _set_platform(args.platform)
    from usv_tpu.compat.gym_adapter import UsvSimpleEnv

    env = UsvSimpleEnv(render_mode=None)
    env.reset(seed=args.seed)
    zero = np.zeros(2)

    def one_step():
        # the adapter already converts obs to host numpy each step, which
        # forces completion; float() on the reward makes the sync explicit
        _, r, _, _, _ = env.step(zero)
        return float(r)

    sps, dt = _loop_steps_per_s(one_step, args.steps, warmup=args.warmup)
    _record(dict(
        name=f"compat_{platform}_loop",
        steps_per_second=sps, seconds=dt, steps=args.steps,
        note="usv_tpu.compat.UsvSimpleEnv, host loop, per-step dispatch "
             f"on {platform}",
    ))


def side_core(args):
    """Functional core at batch=1, scan-amortized — the design's own
    protocol shape at the reference's batch size."""
    platform = _set_platform(args.platform)
    from usv_tpu.envs import make
    from usv_tpu.vector import throughput

    handle = make("usv-simple")
    out = throughput(handle, num_envs=1, n_steps=args.steps, repeats=3)
    _record(dict(
        name=f"core_scan_{platform}_b1",
        steps_per_second=out["steps_per_second"], seconds=out["seconds"],
        steps=args.steps,
        note=f"functional core, lax.scan-amortized, batch=1, {platform}",
    ))


def side_crossover(args):
    """Aggregate steps/s vs batch size under HOST-LOOP dispatch (one jit
    call per step, the SB3-shaped usage) and scan-amortized, on this
    process's platform: where does the vmapped design overtake the njit
    estimate band (2k-10k steps/s, BASELINE.md row 5)?"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    platform = _set_platform(args.platform)
    from usv_tpu.envs import make
    from usv_tpu.vector import throughput
    from usv_tpu.vector.batch import BatchedEnv

    handle = make("usv-simple")
    rows = []
    for b in args.batches:
        env = BatchedEnv(handle, num_envs=b)
        state, _ = env.reset(jax.random.key(args.seed))
        zero = jnp.zeros((b, 2))
        last = {}

        def one_step(env=env, zero=zero, last=last):
            nonlocal state
            state, ts = env.step(state, zero)
            last["r"] = ts.reward

        n = max(200, min(args.steps, 200_000 // b))
        sps, _ = _loop_steps_per_s(
            one_step, n,
            sync=lambda: float(np.asarray(last["r"])[0]),
            warmup=20,
        )
        amortized = throughput(handle, num_envs=b, n_steps=2048, repeats=2)
        rows.append(dict(
            batch=b,
            loop_aggregate_steps_per_second=sps * b,
            scan_aggregate_steps_per_second=amortized["steps_per_second"],
        ))
        print(rows[-1])
    _record(dict(
        name=f"crossover_{platform}",
        rows=rows,
        note="aggregate env-steps/s: host-loop dispatch (per-step jit "
             "call) vs lax.scan-amortized, by batch size",
    ))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", required=True,
                   choices=["ref", "compat", "core", "crossover"])
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batches", type=int, nargs="*",
                   default=[1, 4, 16, 64, 256, 1024])
    args = p.parse_args()
    dict(ref=side_ref, compat=side_compat, core=side_core,
         crossover=side_crossover)[args.side](args)


if __name__ == "__main__":
    main()
