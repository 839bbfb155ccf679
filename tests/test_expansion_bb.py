"""Bound-bound events in expansion-opacity mode with THERMALISATION < 0.

All the reference presets set RPKT_BOUNDBOUND_THERMALISATION_PROBABILITY = -1,
in which case a bb event resolves a specific line within the hit wavelength
bin and activates the macro-atom (rpkt.cc:238-262, 703-705) — it does NOT
scatter coherently. Coherent scattering in a high-kappa bin traps packets for
~tau^2 scatters (the immortal-packet failure mode diagnosed on the r2 bench).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_sample_bb_line_segments_and_weights():
    from artis_tpu.transport import expansionopacity as expo
    from artis_tpu.constants import CLIGHT

    # synthetic descending-frequency line list: three lines share the bin
    # [570, 605.5) Angstrom, the rest live elsewhere
    lam = np.array([600.0, 601.0, 604.0, 2000.0, 2010.0, 34000.0])
    nu = 1e8 * CLIGHT / lam[::-1]  # ascending lam = descending nu
    nu = np.sort(nu)[::-1].copy()

    class DummyDad:
        line_nu = jnp.asarray(nu)

    ncells = 2
    nlines = lam.size
    tau = jnp.asarray(
        np.array([[2.0, 0.0, 1.0, 3.0, 3.0, 0.5],
                  [0.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
    )
    wcum, binoff = expo.build_line_selection(tau, DummyDad, 1.0)
    assert wcum.shape == (ncells, nlines)
    binoff = np.asarray(binoff)
    # bin of the first three lines
    b0 = int((600.0 - expo.LAMBDA_MIN) / expo.DELTA_LAMBDA)
    assert binoff[b0 + 1] - binoff[b0] == 3  # 600/601/604 share a bin

    # events in cell 0 at a frequency inside that bin select only lines
    # from the bin's segment
    nu_ev = jnp.full((256,), 1e8 * CLIGHT / 602.0)
    cellidx = jnp.zeros((256,), jnp.int32)
    mask = jnp.ones((256,), bool)
    line, ok = expo.sample_bb_line(
        jax.random.PRNGKey(0), wcum, binoff, cellidx, nu_ev, mask, chunk=4)
    line = np.asarray(line)
    ok = np.asarray(ok)
    assert ok.all()
    lam_sel = 1e8 * CLIGHT / nu[line]
    assert np.all(lam_sel >= expo.LAMBDA_MIN + b0 * expo.DELTA_LAMBDA)
    assert np.all(lam_sel < expo.LAMBDA_MIN + (b0 + 1) * expo.DELTA_LAMBDA)
    # weights ~ (1 - e^-tau): the tau=2 line must dominate the tau=0 line
    counts = {l: int(np.sum(np.isclose(lam_sel, l, atol=0.4)))
              for l in (600.0, 601.0, 604.0)}
    assert counts[601.0] == 0
    assert counts[600.0] > counts[604.0] > 0

    # a zero-weight cell reports ok=False
    _, ok1 = expo.sample_bb_line(
        jax.random.PRNGKey(1), wcum, binoff, jnp.ones((8,), jnp.int32),
        nu_ev[:8], mask[:8], chunk=4)
    assert not np.asarray(ok1).any()


@pytest.fixture(scope="module")
def expo_run(tmp_path_factory):
    from make_run import make_run
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte

    d = str(tmp_path_factory.mktemp("expo_bb"))
    make_run(d, ncells=8, ntimesteps=4, tmax_days=3.0, ngreyts=0)
    opts = kilonova_lte(
        npkts=2048, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=12, linewalk_chunk=64,
        expansionopacities_on=True,
        rpkt_boundbound_thermalisation_probability=-1.0,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    for ts in range(3):
        sim.do_timestep(ts)
    return sim


def test_expansion_bb_activates_macroatom(expo_run):
    """With p_therm < 0, bb expansion events must feed the macro-atom
    machine (MA activations > 0) rather than coherent-scattering."""
    from artis_tpu import stats

    sim = expo_run
    counters = np.asarray(sim.prev_est.counters, dtype=np.float64)
    assert counters[stats.MA_STAT_ACTIVATION_BB] > 0
    assert np.isfinite(np.asarray(sim.cells.Te)).all()
    assert int(sim.total_rpkt_steps) > 0
