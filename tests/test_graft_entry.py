"""The driver hooks (__graft_entry__.py) must always work: entry() compiles
single-device; dryrun_multichip runs a full sharded train step on the
8-device CPU mesh (dp + fsdp)."""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 1000)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_like_driver():
    """Simulate the driver: a fresh process with only ONE jax device calls
    dryrun_multichip(8) directly (no conftest, no XLA_FLAGS device-count
    override). The hook must self-provision an 8-device CPU mesh in a
    subprocess and succeed (round-1 MULTICHIP artifact failed exactly here).
    """
    import os
    import subprocess

    env = dict(os.environ)
    # strip any pre-provisioned virtual device count (conftest sets it)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('DRIVER_SIM_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_SIM_OK" in proc.stdout
