"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform and splitting it into 8 virtual devices (SURVEY.md §4). The harness
may have pre-imported jax and pinned a TPU platform via sitecustomize, so the
platform is overridden through jax.config (effective until the first backend
is initialized) rather than env vars alone.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
_externally_set = "xla_force_host_platform_device_count" in _flags
if not _externally_set:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import re  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _externally_set:
    _m = re.search(r"xla_force_host_platform_device_count=(\d+)", _flags)
    _expected = int(_m.group(1)) if _m else None
else:
    _expected = 8
if _expected is not None:
    assert jax.local_device_count() == _expected, (
        f"expected {_expected} virtual CPU devices; got "
        f"{jax.local_device_count()} on {jax.devices()[:1]} — a backend was "
        "likely initialized before the XLA flag could take effect"
    )
