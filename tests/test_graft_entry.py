"""Driver-contract tests for ``__graft_entry__.py``.

Round-1 regression: ``dryrun_multichip`` leaked array creation onto the
default (tunneled-TPU) backend and the driver's 8-device check crashed
(``MULTICHIP_r01.json ok=false``). The dryrun must be hermetic to the CPU
backend even when the process default platform is the TPU — this test
reproduces the driver's environment (no JAX_PLATFORMS override, so the
machine's sitecustomize default "axon,cpu" applies, plus 8 virtual host
devices) in a subprocess and requires all three legs to pass without ever
initializing the TPU client.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_hermetic_to_cpu():
    env = dict(os.environ)
    # Simulate the driver: it does NOT force the CPU platform for us; the
    # machine default (sitecustomize "axon,cpu") must not be touched.
    env.pop("JAX_PLATFORMS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK8')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed under TPU-default platform:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}")
    assert "OK8" in proc.stdout
    assert "DP train step over 8 devices" in proc.stdout
    assert "combined mesh (data=2, spatial=4)" in proc.stdout
    assert "DP eval" in proc.stdout
    assert "TP over 8 devices" in proc.stdout


def test_dryrun_multihost():
    """The DCN-analogue leg: 2 processes x 4 virtual CPU devices with gloo
    cross-process collectives must run a DP train step (gradient psum over
    the process boundary, loss == single-device) and a collective Orbax
    checkpoint save/restore. Driver-shaped: spawned exactly as
    ``dryrun_multihost`` does it."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import __graft_entry__ as g; g.dryrun_multihost(); print('OKMH')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, (
        f"dryrun_multihost failed:\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-4000:]}")
    assert "OKMH" in proc.stdout
    assert "gloo cross-process collectives" in proc.stdout
    assert "halo ppermute across the process boundary" in proc.stdout
    assert "shipped Trainer epoch over 2 processes" in proc.stdout
