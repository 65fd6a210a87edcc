"""AITSMC golden-trace tests — pin the reconstruction to the reference's
OBSERVABLE behavior (VERDICT r1, next-#3).

The reference's AITSMC control law lives in non-vendored C++
(`usv_libs_py.controller.AITSMC`, driven from simple_env_aitsmc.py:77-111),
so bit parity is impossible; what IS recoverable is the notebook's
diagnostic protocol (`notebooks/plot_agent_aitsmc_vec.ipynb`):

* cell 2 param overrides: k_r=0.75, kmin_r=0.001, mu_r=0.025, mu_u=0.01
* cell 1 impulse perturbation: Iy=10, Iz=20 for 100 < step < 150
  (the cell's active `return np.zeros(3)` disables it; the array return
  below is the experiment the cell was written for — both are pinned here)
* cells 5+ plot: e_u/e_r decay envelopes, Ka_u/Ka_r growth shapes,
  thruster traces within the published [-30, 36.5] saturation.

These tests run the same protocol on `usv-aitsmc-simple` and assert the
envelope/monotonicity/saturation shapes those plots show.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usv_tpu.control.aitsmc import AitsmcGains
from usv_tpu.envs import make, simple_aitsmc

# notebook cell 2 overrides on defaultParams()
NOTEBOOK_GAINS = AitsmcGains(k_r=0.75, kmin_r=0.001, mu_r=0.025, mu_u=0.01)


def _notebook_perturb(step):
    """plot_agent_aitsmc_vec.ipynb cell 1 (the non-disabled branch)."""
    window = (step > 100) & (step < 150)
    return jnp.where(
        window,
        jnp.array([0.0, 10.0, 20.0], jnp.float32),
        jnp.zeros(3, jnp.float32),
    )


def _rollout(n_steps, action, gains=NOTEBOOK_GAINS, perturb=False, seed=0):
    """Constant-action rollout of usv-aitsmc-simple; returns stacked info."""
    kwargs = {}
    if perturb:
        kwargs["perturb_fn"] = _notebook_perturb
    handle = make("usv-aitsmc-simple", **kwargs)
    cfg = handle.cfg
    state = handle.reset(cfg, jax.random.key(seed))
    action = jnp.asarray(action, jnp.float32)

    def body(state, _):
        state, ts = simple_aitsmc.step(cfg, state, action, gains=gains)
        keep = {
            k: ts.info[k]
            for k in ("e_u", "e_r", "Ka_u", "Ka_r",
                      "left_thruster", "right_thruster", "setpoint_u")
        }
        return state, keep

    _, hist = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n_steps)
    )(state)
    return {k: np.asarray(v) for k, v in hist.items()}


@pytest.fixture(scope="module")
def trace():
    # the notebook's policy action is scaled into u ~ [0, 0.5] (action0*0.5)
    # and r ~ [-3, 3] (action1*3, cell 4); a straight cruise (u=0.4, r=0) is
    # the cleanest controlled probe of the surge/thruster envelopes
    return _rollout(300, [0.4, 0.0])


@pytest.fixture(scope="module")
def turn_trace():
    # yaw-channel probe: the round-3 faithfulness fix starts the model at
    # ZERO velocity (the reference recreates DynamicModel at reset,
    # simple_env_aitsmc.py:43), so a straight cruise no longer produces a
    # yaw transient — the notebook's e_r/Ka_r shapes come from the policy
    # COMMANDING r; a sustained turn command reproduces them
    return _rollout(300, [0.4, 0.3])


def test_surge_error_decays_to_band(trace):
    """Notebook e_u plot: visible initial error (ref setpoint vs ~0 speed),
    decay to a small band and stay there (measured: late mean 0.0014)."""
    e_u = np.abs(trace["e_u"])
    assert e_u[:5].mean() > 0.05          # initial tracking error is visible
    assert e_u[150:].mean() < 0.02        # settled band
    assert e_u[150:].max() < 0.1          # no late re-divergence


def test_yaw_rate_error_decays_to_band(turn_trace):
    """Measured (faithful zero-velocity start, sustained turn command):
    |e_r| starts 0.13, settles to late mean 4.6e-4, late max 5.2e-3."""
    e_r = np.abs(turn_trace["e_r"])
    assert e_r[:5].mean() > 0.1
    assert e_r[150:].mean() < 0.05
    assert e_r[150:].max() < 0.1


def test_adaptive_gains_grow_until_deadzone_then_stop(turn_trace):
    """Notebook Ka plot shape: growth from ~0 while |sigma| > mu, then the
    dead zone stops growth — the gain peaks and the late band flattens far
    below the growth range (measured on the turn probe: Ka_u peaks 0.50,
    late band 0.39-0.43; Ka_r peaks 3.70, late band 2.77-3.12)."""
    for ch in ("Ka_u", "Ka_r"):
        ka = turn_trace[ch]
        # growth phase from (near) zero
        assert abs(ka[0]) < 0.01
        assert ka[10] > ka[0]
        # dead zone engaged: the late band is far below the peak
        late = ka[150:]
        assert late.max() - late.min() < 0.5 * (ka.max() - ka[0])
        assert late.max() < ka.max()
        # bounded overall (adaptation does not wind up)
        assert ka.max() < 100.0


def test_thrusters_respect_published_saturation(trace):
    """[-30, 36.5] asymmetric limits (usv_asmc_env.py:182-185)."""
    for ch in ("left_thruster", "right_thruster"):
        t = trace[ch]
        assert t.min() >= -30.0 - 1e-5
        assert t.max() <= 36.5 + 1e-5


def test_thruster_transient_then_steady_cruise(trace):
    """Thruster trace shape: fast-changing effort during the reaching
    phase, then a near-constant cruise thrust holding u against drag
    (measured: per-step |delta| ~0.6 early vs <0.01 late)."""
    left = trace["left_thruster"]
    early_delta = np.abs(np.diff(left[:10])).mean()
    late_delta = np.abs(np.diff(left[250:])).mean()
    assert early_delta > 3.0 * late_delta, (early_delta, late_delta)
    # steady cruise: sustained positive forward thrust on both sides
    assert trace["left_thruster"][250:].min() > 0.0
    assert trace["right_thruster"][250:].min() > 0.0


def test_impulse_perturbation_bumps_then_recovers():
    """Notebook cell 1 experiment: body-force impulse (Iy=10, Iz=20) for
    100 < step < 150. The yaw-rate error must visibly respond inside the
    window, the adaptive gain must react, and the error must re-settle
    after the window — the disturbance-rejection property the notebook's
    perturb plots exercise."""
    quiet = _rollout(300, [0.4, 0.3], perturb=False)
    bumped = _rollout(300, [0.4, 0.3], perturb=True)

    # identical before the window opens (pure function of step index)
    np.testing.assert_allclose(
        bumped["e_r"][:100], quiet["e_r"][:100], atol=1e-6
    )
    # inside the window the perturbed run deviates measurably
    delta_in = np.abs(bumped["e_r"][105:148] - quiet["e_r"][105:148])
    assert delta_in.max() > 0.1
    # after the window it re-settles into a small band (measured 0.007)
    assert np.abs(bumped["e_r"][250:]).mean() < 0.05
    # adaptation responded: Ka_r re-grew well above the quiet run's level
    assert bumped["Ka_r"][200] > quiet["Ka_r"][200] + 0.1


def test_notebook_params_change_adaptation_speed():
    """The k_r=0.75 override (vs the 0.2 default) must visibly accelerate
    yaw-gain adaptation — pins that the params plumb through to the law."""
    fast = _rollout(80, [0.4, 0.5], gains=NOTEBOOK_GAINS)
    slow = _rollout(80, [0.4, 0.5], gains=AitsmcGains())
    assert fast["Ka_r"][30] > slow["Ka_r"][30]


def test_beta_sensitivity_envelopes_stable():
    """β (the unknown terminal exponent) is the reconstruction's main free
    parameter; the observable envelopes the notebook plots must be robust
    to it (study recorded in docs/AITSMC.md)."""
    finals = {}
    for beta in (0.3, 0.5, 0.7, 0.9):
        tr = _rollout(
            200, [0.4, 0.2],
            gains=AitsmcGains(
                k_r=0.75, kmin_r=0.001, mu_r=0.025, mu_u=0.01, beta=beta
            ),
        )
        finals[beta] = np.abs(tr["e_u"][150:]).mean()
        # every beta settles the surge error into the band (measured under
        # the faithful zero-velocity start: 7e-4 .. 0.059 — high beta
        # weakens the integral-terminal action and leaves a small steady
        # offset; the reconstruction default 0.5 sits at 0.023)
        assert finals[beta] < 0.08, (beta, finals[beta])
    # and the spread across betas stays small vs the ~0.4 initial error
    assert max(finals.values()) - min(finals.values()) < 0.08
