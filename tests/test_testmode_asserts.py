"""Test-mode physics assertions (the reference's TESTMODE
assert_testmodeonly, sn3d.h:145-152): zero-cost when off, and inside jitted
code they trip a host-callback error on violated invariants when
ARTIS_TESTMODE=1."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp


def test_noop_when_disabled():
    from artis_tpu import devutil

    assert not devutil.TESTMODE

    @jax.jit
    def f(x):
        devutil.assert_testmodeonly(x > 0, "positive")
        return x * 2

    # a violated invariant is silently ignored when testmode is off
    out = f(jnp.array([-1.0, 1.0]))
    np.testing.assert_array_equal(np.asarray(out), [-2.0, 2.0])


def test_masked_lanes_exempt(monkeypatch):
    from artis_tpu import devutil

    monkeypatch.setattr(devutil, "TESTMODE", True)

    @jax.jit
    def f(x, alive):
        devutil.assert_testmodeonly(x > 0, "positive", mask=alive)
        return x

    # dead lanes may violate the invariant
    jax.block_until_ready(f(jnp.array([-1.0, 1.0]), jnp.array([False, True])))


def test_violation_raises(monkeypatch):
    from artis_tpu import devutil

    monkeypatch.setattr(devutil, "TESTMODE", True)

    @jax.jit
    def f(x):
        devutil.assert_testmodeonly(x > 0, "positive")
        return x

    raised = False
    try:
        jax.block_until_ready(f(jnp.array([-1.0, 1.0])))
    except Exception as exc:  # JaxRuntimeError wrapping the callback raise
        raised = "testmode assert failed" in str(exc)
    assert raised


def test_full_timestep_clean_under_testmode():
    """A real transport timestep runs with every physics invariant armed
    (the reference CI's TESTMODE=ON build, ci.yml testmode jobs)."""
    script = r"""
import os
os.environ["ARTIS_TESTMODE"] = "1"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
import tempfile
from artis_tpu.driver import Simulation
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.synthdata import make_run
d = tempfile.mkdtemp()
make_run(d, ncells=4, ntimesteps=3, tmax_days=2.0, ngreyts=1)
opts = kilonova_lte(npkts=128, grid_type=GridType.SPHERICAL1D,
                    mintemp=1000.0, maxtemp=20000.0, tablesize=12,
                    linewalk_chunk=64)
sim = Simulation(d, opts, datadir="/root/reference/data")
sim.do_timestep(0)
sim.do_timestep(1)
print("TESTMODE_CLEAN")
"""
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "TESTMODE_CLEAN" in res.stdout
