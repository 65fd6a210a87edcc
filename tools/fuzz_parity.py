"""Randomized differential parity sweep vs the reference (VERDICT r4 #6).

The committed parity tests pin a handful of seeds with scripted or fixed
action streams. This harness fuzzes: N seeds x random action sequences per
parity-capable family — the reference's ACTUAL classes (pure-Python ones
directly; the C++-backed ones via the native-oracle ``usv_libs_py`` stub)
against our gymnasium adapters in ``reference_reset_sampling`` mode —
auto-comparing obs/reward/termination every step and recording the drift
distribution plus which termination branches were hit.

Knife-edge raycast flips (f32 kernel vs the reference's f64 geometry at
grazing incidence — quantified in tests/test_raycast_pallas.py) are
*transient* in every family (sensors feed obs/reward, never the dynamics),
so a flipped sensor slot is detected (normalized err > 0.02 where ordinary
f32 drift is ~1e-4), counted, and excluded from the drift statistic; a
termination mismatch on a flip step is classified flip-induced, any other
flag mismatch is a real parity break.

Families: usv-simple, usv-asmc-simple, usv-aitsmc-simple, usv-asmc-ca-v0,
and the legacy trio (reference step/reset paths cited per family in
docs/COMPONENT_MAP.md).

Usage:
  python tools/fuzz_parity.py --seeds 100 --out docs/artifacts/fuzz_parity_r5.json
  python tools/fuzz_parity.py --seeds 8 --families usv-simple usv-pid-v0
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import argparse
import json

import numpy as np

FLIP_THRESHOLD = 0.02   # normalized sensor units; f32 drift is ~1e-4
MODERN = ("usv-simple", "usv-asmc-simple", "usv-aitsmc-simple")
LEGACY = ("usv-asmc-v0", "usv-pid-v0", "usv-asmc-ye-int-v0")
ALL_FAMILIES = MODERN + ("usv-asmc-ca-v0",) + LEGACY

HORIZON = {
    # every horizon sits BELOW the family's registered TimeLimit: our
    # adapters embed the limit in-core (in-state step counter) while the
    # raw reference classes rely on the gymnasium wrapper this harness
    # bypasses, so at the limit step only our side would truncate
    # (aitsmc's limit is 150 -> horizon 149)
    "usv-simple": 200, "usv-asmc-simple": 150, "usv-aitsmc-simple": 149,
    "usv-asmc-ca-v0": 300,
    "usv-asmc-v0": 200, "usv-pid-v0": 200, "usv-asmc-ye-int-v0": 200,
}
# sensor slots are the LAST R entries of the obs (observe() layout /
# reference simple_env.py:91-96, usv_asmc_ca_env.py:283-288)
N_SENSORS = {
    "usv-simple": 128, "usv-asmc-simple": 128, "usv-aitsmc-simple": 128,
    "usv-asmc-ca-v0": 16,
    "usv-asmc-v0": 0, "usv-pid-v0": 0, "usv-asmc-ye-int-v0": 0,
}
# obs indices holding an angle normalized by pi to [-1, 1]: at the +-pi
# wrap boundary an f32-vs-f64 ulp legitimately flips the sign (raw err
# ~2.0); compare circularly (err = min(e, 2 - e)) and count raw-err > 0.5
# there as a wrap flip (transient, like a sensor graze — the step's
# reward is excluded from the drift stat, CA's reward has a -|angle|/pi
# term fed by it). simple family: idx 3 = angle-to-target/pi
# (simple_env.py:72-80); CA: idx 4 = tracking-error angle
# (usv_asmc_ca_env.py:283-288).
CIRCULAR_IDX = {
    "usv-simple": (3,), "usv-asmc-simple": (3,), "usv-aitsmc-simple": (3,),
    "usv-asmc-ca-v0": (4,),
    "usv-asmc-v0": (), "usv-pid-v0": (), "usv-asmc-ye-int-v0": (),
}


def _sample_actions(rng, n_steps, dim, low, high, style):
    """Random action stream: white noise or an OU-smoothed walk (clipped),
    alternated across seeds for both jitter and sustained-motion coverage."""
    if style == "white":
        return rng.uniform(low, high, (n_steps, dim))
    x = rng.uniform(low, high, (dim,))
    out = np.empty((n_steps, dim))
    for t in range(n_steps):
        x = x + 0.3 * (rng.uniform(low, high, (dim,)) - x)
        out[t] = np.clip(x, low, high)
    return out


class _Family:
    """One parity-capable family: builds the reference env + our adapter
    once, then drives seed -> episode comparisons."""

    def __init__(self, env_id):
        self.env_id = env_id
        self.api5 = env_id not in LEGACY
        self.n_sensors = N_SENSORS[env_id]
        self._build()

    def _build(self):
        from usv_tpu.compat import gym_adapter

        eid = self.env_id
        self.circular_idx = CIRCULAR_IDX[eid]
        # a FRESH reference env per seed: the reference's reset does not
        # clear last_action/sensor_data (a quirk this harness found — see
        # tests/test_seed_parity.py::test_simple_stale_reset_carryover_quirk), so a
        # reused instance diverges from our stateless reset by design;
        # fresh-per-seed compares like against like
        if eid in ("usv-simple", "usv-asmc-simple"):
            from test_reference_env_parity import _install_stub_packages

            _install_stub_packages()
            if eid == "usv-simple":
                from gym_usv.envs.simple_env import UsvSimpleEnv as RefCls

                self.make_ref = lambda: RefCls(render_mode="rgb_array")
                self.ours = gym_adapter.UsvSimpleEnv(
                    render_mode=None, reference_reset_sampling=True)
            else:
                import gym_usv.envs.simple_env_asmc as m

                self.make_ref = lambda: m.UsvSimpleASMCEnv(
                    render_mode="rgb_array")
                self.ours = gym_adapter.UsvSimpleASMCEnv(
                    render_mode=None, reference_reset_sampling=True)
            self.act_low, self.act_high, self.act_dim = -1.0, 1.0, 2
        elif eid == "usv-aitsmc-simple":
            from test_seed_parity import _reference_aitsmc_simple

            m = _reference_aitsmc_simple()
            self.make_ref = lambda: m.UsvSimpleAITSMCEnv(
                render_mode="rgb_array", options={})
            self.ours = gym_adapter.UsvSimpleAITSMCEnv(
                render_mode=None, reference_reset_sampling=True)
            self.act_low, self.act_high, self.act_dim = -1.0, 1.0, 2
        elif eid == "usv-asmc-ca-v0":
            from test_reference_ca_parity import _load_reference_ca_env

            RefCls = _load_reference_ca_env()
            self.make_ref = lambda: RefCls(render_mode="rgb_array")
            self.ours = gym_adapter.UsvAsmcCaEnv(
                render_mode=None, reference_reset_sampling=True)
            self.act_low, self.act_high, self.act_dim = -1.0, 1.0, 2
        else:
            from test_reference_legacy_parity import (
                _reference_env as legacy_ref,
            )

            self._legacy_ref = legacy_ref
            adapters = {
                "usv-asmc-v0": gym_adapter.UsvAsmcEnv,
                "usv-pid-v0": gym_adapter.UsvPidEnv,
                "usv-asmc-ye-int-v0": gym_adapter.UsvAsmcYeIntEnv,
            }
            self.make_ref = None  # built per seed (global-np.random protocol)
            self.ours = adapters[eid](
                render_mode=None, reference_reset_sampling=True)
            # legacy action: scalar desired-psi offset in +-pi/2
            # (usv_asmc_env.py action space)
            self.act_low, self.act_high, self.act_dim = (
                -np.pi / 2, np.pi / 2, 1)

    def _reset_pair(self, seed):
        if self.env_id in LEGACY:
            ref = self._legacy_ref(self.env_id, seed)
            ref_obs0 = np.asarray(ref.state, np.float64)
            our_obs0 = self.ours.reset(seed=seed)
            return ref, ref_obs0, np.asarray(our_obs0, np.float64)
        ref = self.make_ref()
        if self.env_id == "usv-asmc-ca-v0":
            np.random.seed(seed)
            ref_obs0, _ = ref.reset()
        else:
            ref_obs0, _ = ref.reset(seed=seed)
        our_obs0, _ = self.ours.reset(seed=seed)
        return ref, np.asarray(ref_obs0, np.float64), np.asarray(
            our_obs0, np.float64)

    def _classify_end(self, term, trunc, rew):
        eid = self.env_id
        if eid == "usv-asmc-ca-v0":
            # usv_asmc_ca_env.py:295-310: arrive -> done; collision ->
            # truncated; far tracking -> done with -100; oob -> done+trunc
            if term and trunc:
                return "out_of_bounds"
            if trunc:
                return "collision"
            if term:
                return "far_tracking" if rew < -50.0 else "arrive"
        elif eid in MODERN:
            if term:
                return "collision"
            if trunc:
                return "out_of_bounds"
        else:
            if term:
                return "done"
        return "horizon"

    def run_seed(self, seed):
        ref, ref_obs0, our_obs0 = self._reset_pair(seed)
        rec = dict(
            seed=seed,
            reset_obs_err=float(np.max(np.abs(ref_obs0 - our_obs0))),
            max_obs_err=0.0, max_sensor_err=0.0, max_rew_err=0.0,
            flip_steps=0, wrap_steps=0, steps=0, end="horizon",
            flag_mismatch=None, flip_flag_mismatch=None,
        )
        ns = self.n_sensors
        style = "white" if seed % 2 == 0 else "ou"
        rng = np.random.default_rng(seed + 99991)
        actions = _sample_actions(
            rng, HORIZON[self.env_id], self.act_dim,
            self.act_low, self.act_high, style)
        for i in range(len(actions)):
            a = actions[i]
            if self.env_id in LEGACY:
                ro, rr, rterm, _ = ref.step(float(a[0]))
                oo, orew, oterm, _ = self.ours.step(np.float32(a[0]))
                rtrunc = otrunc = False
            else:
                ro, rr, rterm, rtrunc, _ = ref.step(a)
                oo, orew, oterm, otrunc, _ = self.ours.step(
                    a.astype(np.float32))
            rec["steps"] = i + 1
            err = np.abs(np.asarray(ro, np.float64) - np.asarray(oo, np.float64))
            wrap_flip = False
            for j in self.circular_idx:
                if err[j] > 0.5:
                    wrap_flip = True
                err[j] = min(err[j], 2.0 - err[j])
            sens = err[len(err) - ns:] if ns else np.zeros(0)
            core = err[:len(err) - ns] if ns else err
            flipped = sens > FLIP_THRESHOLD
            n_flip = int(np.sum(flipped))
            rec["flip_steps"] += 1 if n_flip else 0
            rec["wrap_steps"] += 1 if wrap_flip else 0
            rec["max_obs_err"] = max(rec["max_obs_err"], float(np.max(core)))
            if ns and not n_flip:
                rec["max_sensor_err"] = max(
                    rec["max_sensor_err"], float(np.max(sens)))
            if not n_flip and not wrap_flip:
                # reward depends on min(sensors) and the wrapped angle:
                # only drift-compare it on flip-free steps (a flip shifts
                # it discretely)
                rec["max_rew_err"] = max(
                    rec["max_rew_err"], abs(float(rr) - float(orew)))
            if (bool(rterm), bool(rtrunc)) != (bool(oterm), bool(otrunc)):
                key = ("flip_flag_mismatch" if (n_flip or wrap_flip)
                       else "flag_mismatch")
                rec[key] = dict(
                    step=i, ref=[bool(rterm), bool(rtrunc)],
                    ours=[bool(oterm), bool(otrunc)],
                )
                rec["end"] = "mismatch"
                break
            if rterm or rtrunc:
                rec["end"] = self._classify_end(
                    bool(rterm), bool(rtrunc), float(rr))
                break
        return rec


def run_family(env_id, seeds, base_seed=0):
    fam = _Family(env_id)
    episodes = [fam.run_seed(base_seed + s) for s in range(seeds)]
    ends = {}
    for e in episodes:
        ends[e["end"]] = ends.get(e["end"], 0) + 1
    errs = [e["max_obs_err"] for e in episodes]
    # log10 histogram of per-episode worst core-obs drift
    bins = [0, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2, np.inf]
    hist = np.histogram(errs, bins=bins)[0].tolist()
    return dict(
        env_id=env_id,
        seeds=seeds,
        termination_branches=ends,
        drift_hist_bins="[0,1e-6,1e-5,1e-4,1e-3,1e-2,inf]",
        drift_hist=hist,
        worst_core_obs_err=float(np.max(errs)),
        worst_sensor_err_nonflip=float(
            np.max([e["max_sensor_err"] for e in episodes])),
        worst_rew_err=float(np.max([e["max_rew_err"] for e in episodes])),
        worst_reset_obs_err=float(
            np.max([e["reset_obs_err"] for e in episodes])),
        flip_episodes=int(sum(1 for e in episodes if e["flip_steps"])),
        flip_steps=int(sum(e["flip_steps"] for e in episodes)),
        wrap_steps=int(sum(e["wrap_steps"] for e in episodes)),
        flag_mismatches=[
            dict(seed=e["seed"], **e["flag_mismatch"]) for e in episodes
            if e["flag_mismatch"]],
        flip_flag_mismatches=[
            dict(seed=e["seed"], **e["flip_flag_mismatch"]) for e in episodes
            if e["flip_flag_mismatch"]],
        steps_compared=int(sum(e["steps"] for e in episodes)),
    )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=100)
    p.add_argument("--base-seed", type=int, default=0)
    p.add_argument("--families", nargs="*", default=list(ALL_FAMILIES))
    p.add_argument("--out", default=None)
    args = p.parse_args()

    results = {}
    for eid in args.families:
        print(f"== {eid} ({args.seeds} seeds)", flush=True)
        results[eid] = run_family(eid, args.seeds, args.base_seed)
        print(json.dumps({k: v for k, v in results[eid].items()
                          if k != "env_id"}), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
