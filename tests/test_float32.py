"""float32 device-mode smoke test (the TPU fast path).

TPUs have no native float64, so the production path runs with JAX x64
disabled and ``transport_dtype="float32"``: sampling tables normalised to
[0, 1], packet energies in units of e0, and range-safe kernel expressions
(nu**3 and r**3 at CGS scales overflow float32).

x64 is process-global in JAX, so the f32 run happens in a subprocess.
"""

import json
import os
import subprocess
import sys
import tempfile

import pytest

_SCRIPT = r"""
import os, json, tempfile
os.environ["ARTIS_X64"] = "0"
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from artis_tpu.driver import Simulation
from artis_tpu.options import GridType, kilonova_lte
from artis_tpu.synthdata import make_run

d = tempfile.mkdtemp(prefix="f32run")
make_run(d, ncells=8, ntimesteps=4, tmax_days=2.0, ngreyts=1)
opts = kilonova_lte(npkts=256, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
                    maxtemp=20000.0, tablesize=16, transport_dtype="float32")
sim = Simulation(d, opts, datadir="/root/reference/data")
assert str(sim.state.pos.dtype) == "float32", sim.state.pos.dtype
for nts in range(3):
    sim.do_timestep(nts)
j = np.asarray(sim.prev_est.j)
pos = np.asarray(sim.state.pos)
print("RESULT " + json.dumps({
    "j_finite": bool(np.all(np.isfinite(j))),
    "j_positive": bool(np.any(j > 0)),
    "pos_finite": bool(np.all(np.isfinite(pos))),
    "te": np.asarray(sim.cells.Te).tolist(),
    "gamma_dep": sim.gamma_dep_ts[:3].tolist(),
}))
"""


@pytest.mark.slow
def test_float32_end_to_end():
    env = dict(os.environ, ARTIS_X64="0", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, cwd=tempfile.gettempdir(),
        capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    assert res["j_finite"], res
    assert res["j_positive"], res
    assert res["pos_finite"], res
    # temperatures evolved off their initial assignment and stayed physical
    te = res["te"]
    assert all(1000.0 <= t <= 20000.0 for t in te), te
    # gamma deposition is positive (in erg after e0 rescale) once decays begin
    assert res["gamma_dep"][1] > 0, res
