"""The driver-facing entry points must work in the DRIVER's environment,
not just under pytest: the round-1 multichip artifact failed because an
eager op initialized a hardware backend before the CPU mesh was built
(MULTICHIP_r01.json — libtpu version mismatch on the first
convert_element_type).  These tests run ``dryrun_multichip`` in a fresh
subprocess WITHOUT ``JAX_PLATFORMS=cpu`` exported, mimicking the driver."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env(jax_platforms):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if jax_platforms is not None:
        env["JAX_PLATFORMS"] = jax_platforms
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def _run(env):
    return subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)


def test_dryrun_multichip_no_jax_platforms_env():
    """Driver shape #1: JAX_PLATFORMS absent; an ambient sitecustomize may
    still force a hardware platform via jax.config — the dryrun must pin
    itself to CPU regardless."""
    r = _run(_driver_env(None))
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK" in r.stdout


def test_dryrun_multichip_hardware_platform_env():
    """Driver shape #2: JAX_PLATFORMS names a hardware backend first (the
    kernel env sets 'axon').  dryrun_multichip must override to CPU before
    any backend initializes — no eager op may land on hardware."""
    r = _run(_driver_env("axon,cpu"))
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK" in r.stdout
