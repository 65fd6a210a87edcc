"""True multi-process jax.distributed test (2 hosts x 4 virtual devices).

Validates the usv_tpu.parallel.dist path end-to-end: two separate processes
rendezvous via jax.distributed.initialize, build one global 8-device mesh,
shard an env batch across all devices of both processes, and agree on a
psum-reduced metric. This is the CPU stand-in for the multi-host pod-slice
protocol (SURVEY.md §2.3).
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from usv_tpu.parallel.dist import fold_host_key, initialize_distributed

    pid = int(sys.argv[1])
    initialize_distributed(
        coordinator_address="127.0.0.1:%PORT%", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8  # global
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from usv_tpu.envs import make
    from usv_tpu.envs.autoreset import make_autoreset_step
    from usv_tpu.parallel.mesh import make_env_mesh

    handle = make("usv-simple")
    cfg = handle.cfg
    mesh = make_env_mesh()  # all 8 global devices
    sharding = NamedSharding(mesh, P("env"))

    B = 16  # global batch; 8 envs per host
    key = fold_host_key(jax.random.key(0))
    local_keys = jax.random.split(key, B // 2)
    local_state = jax.vmap(lambda k: handle.reset(cfg, k))(local_keys)

    # assemble the global sharded pytree from per-host shards
    def to_global(x):
        return jax.make_array_from_process_local_data(sharding, x)

    state = jax.tree.map(to_global, local_state)
    actions = to_global(jnp.zeros((B // 2, 2), jnp.float32))

    auto = jax.vmap(
        make_autoreset_step(cfg, handle.step, handle.reset, handle.reset_obs)
    )

    @jax.jit
    def sharded_step(state, actions):
        state, ts = auto(state, actions)
        return state, jnp.mean(ts.reward)  # global mean => cross-host psum

    state, mean_reward = sharded_step(state, actions)
    print(json.dumps({"pid": pid, "mean_reward": float(mean_reward)}))
    """
)


_SAC_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from usv_tpu.parallel.dist import initialize_distributed

    pid = int(sys.argv[1])
    initialize_distributed(
        coordinator_address="127.0.0.1:%PORT%", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    from jax.sharding import NamedSharding, PartitionSpec as P

    from usv_tpu.envs import make
    from usv_tpu.parallel.mesh import make_env_mesh
    from usv_tpu.train.sac import SacConfig, SacLearner

    mesh = make_env_mesh()  # all 8 global devices
    batch = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())

    B = 16
    cfg = SacConfig(
        num_envs=B, buffer_size=256, batch_size=32, learning_starts=0,
        train_freq=2, gradient_steps=2, hidden=(32, 32), frame_stack=2,
    )
    learner = SacLearner(make("usv-simple"), cfg)
    # both processes compute the identical full state (same seed), then
    # assemble the global sharded train state from their local halves
    ts = jax.device_get(learner.init(seed=0))

    def g(sharding, x):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            return jax.random.wrap_key_data(g(sharding, jax.random.key_data(x)))
        x = np.asarray(x)
        if x.ndim == 0:
            sharding = repl  # counters (ptr/size) replicate
        elif sharding is batch:
            n = x.shape[0] // 2
            x = x[pid * n:(pid + 1) * n]
        return jax.make_array_from_process_local_data(sharding, x)

    def g_tree(sharding, tree):
        return jax.tree.map(lambda x: g(sharding, x), tree)

    ts = ts.replace(
        actor_params=g_tree(repl, ts.actor_params),
        critic_params=g_tree(repl, ts.critic_params),
        target_critic_params=g_tree(repl, ts.target_critic_params),
        log_alpha=g(repl, ts.log_alpha),
        actor_opt=g_tree(repl, ts.actor_opt),
        critic_opt=g_tree(repl, ts.critic_opt),
        alpha_opt=g_tree(repl, ts.alpha_opt),
        buffer=g_tree(batch, ts.buffer),
        env_state=g_tree(batch, ts.env_state),
        frames=g_tree(batch, ts.frames),
        key=g(repl, ts.key),
        env_steps=g(repl, ts.env_steps),
        grad_steps=g(repl, ts.grad_steps),
        # per-env gSDE exploration matrices ride the batch axis (the
        # use_sde=True default since the config_sac parity flip)
        sde=g_tree(batch, ts.sde) if ts.sde is not None else None,
    )

    # the FULL train cycle (collect + replay insert + updates) as one SPMD
    # program across both processes
    ts, reward = learner.train_rounds(ts, 2)
    leaf = jax.tree.leaves(ts.actor_params)[0]
    print(json.dumps({
        "pid": pid,
        "reward": float(reward),
        "grad_steps": int(ts.grad_steps),
        "param0": float(jax.device_get(leaf).ravel()[0]),
    }))
    """
)


_PPO_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from usv_tpu.parallel.dist import initialize_distributed

    pid = int(sys.argv[1])
    initialize_distributed(
        coordinator_address="127.0.0.1:%PORT%", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    from jax.sharding import NamedSharding, PartitionSpec as P

    from usv_tpu.envs import make
    from usv_tpu.parallel.mesh import make_env_mesh
    from usv_tpu.train.ppo import PpoConfig, PpoLearner

    mesh = make_env_mesh()  # all 8 global devices
    batch = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())

    B = 16
    cfg = PpoConfig(
        n_steps=32, batch_size=32, n_epochs=2, num_envs=B,
        pi_hidden=(32, 32), vf_hidden=(32, 32), frame_stack=2,
    )
    learner = PpoLearner(make("usv-simple"), cfg)
    # both processes compute the identical full state (same seed), then
    # assemble the global sharded train state from their local halves
    ts = jax.device_get(learner.init(seed=0))

    def g(sharding, x):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            return jax.random.wrap_key_data(g(sharding, jax.random.key_data(x)))
        x = np.asarray(x)
        if x.ndim == 0:
            sharding = repl  # counters replicate
        elif sharding is batch:
            n = x.shape[0] // 2
            x = x[pid * n:(pid + 1) * n]
        return jax.make_array_from_process_local_data(sharding, x)

    def g_tree(sharding, tree):
        return jax.tree.map(lambda x: g(sharding, x), tree)

    ts = ts.replace(
        params=g_tree(repl, ts.params),
        opt_state=g_tree(repl, ts.opt_state),
        env_state=g_tree(batch, ts.env_state),
        frames=g_tree(batch, ts.frames),
        key=g(repl, ts.key),
        update_count=g(repl, ts.update_count),
        sde=g_tree(batch, ts.sde) if ts.sde is not None else None,
    )

    # one FULL PPO iteration (sharded rollout + GAE scan + minibatch
    # permutation over the sharded axis + epochs of updates) as one SPMD
    # program across both processes — the PPO path crosses hosts differently
    # from SAC (no replay; the shuffle gathers rows across shards)
    ts, reward = learner.train_iteration(ts)
    leaf = jax.tree.leaves(ts.params)[0]
    print(json.dumps({
        "pid": pid,
        "reward": float(reward),
        "update_count": int(ts.update_count),
        "param0": float(jax.device_get(leaf).ravel()[0]),
    }))
    """
)


def _run_two_process(tmp_path, script_template):
    import concurrent.futures
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(script_template.replace("%PORT%", str(port)))
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "PYTHONPATH": os.getcwd(),
        "HOME": os.environ.get("HOME", "/root"),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    try:
        # drain both pipes concurrently (a worker blocked on a full pipe
        # would stall the collective it shares with its sibling)
        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            futures = [ex.submit(p.communicate, timeout=420) for p in procs]
            results = [f.result(timeout=440) for f in futures]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = []
    for p, (out, err) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def test_two_process_distributed_sac_training(tmp_path):
    """BASELINE config 5: sharded env batch on 2 processes feeding one SAC
    learner — collect, replay insert, and gradient updates run as one SPMD
    program; both processes must agree on the psum-reduced results."""
    outs = _run_two_process(tmp_path, _SAC_WORKER)
    assert outs[0]["reward"] == pytest.approx(outs[1]["reward"], rel=1e-6)
    assert outs[0]["grad_steps"] == outs[1]["grad_steps"] == 4
    # replicated params stayed bit-identical across hosts after updates
    assert outs[0]["param0"] == pytest.approx(outs[1]["param0"], abs=0.0)


def test_two_process_distributed_ppo_training(tmp_path):
    """VERDICT r2 next-#4: the PPO rollout-sharded update path (GAE scan +
    cross-shard minibatch permutation, no replay) as a real 2-process SPMD
    program — psum-reduced reward and replicated params must agree
    bit-identically across hosts."""
    outs = _run_two_process(tmp_path, _PPO_WORKER)
    assert outs[0]["reward"] == pytest.approx(outs[1]["reward"], rel=1e-6)
    # update_count counts train_iteration calls (train/ppo.py:328)
    assert outs[0]["update_count"] == outs[1]["update_count"] == 1
    assert outs[0]["param0"] == pytest.approx(outs[1]["param0"], abs=0.0)


def test_two_process_distributed_env_step(tmp_path):
    outs = _run_two_process(tmp_path, _WORKER)
    # both hosts computed the SAME global psum-reduced metric
    assert outs[0]["mean_reward"] == pytest.approx(outs[1]["mean_reward"], rel=1e-6)
