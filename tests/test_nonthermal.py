"""Spencer-Fano non-thermal solver tests (reference: nonthermal.cc:2391-2541).

Physics check: the Kozma & Fransson behaviour — as the ionisation fraction
x_e = nne/nniontot drops, more of the deposited energy goes into ionisation
and excitation and less into heating of thermal electrons.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from artis_tpu import atomic
from artis_tpu.io import atomicdata
from artis_tpu.plasma import nonthermal
from artis_tpu.synthdata import write_synthetic_atomicdata


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    folder = tmp_path_factory.mktemp("atomic_nt")
    write_synthetic_atomicdata(folder, elements=((26, 3), (28, 2)), nlevels_per_ion=6)
    ad = atomicdata.read_atomicdata(str(folder))
    dad = atomic.to_device(ad)
    ntd = nonthermal.build_nonthermal_data(
        ad, dad, "/root/reference/data", sf_points=192
    )
    return ad, dad, ntd


def test_collion_shells_matched(setup):
    ad, dad, ntd = setup
    # Fe I-III and Ni I-II have Younger-fit shells in collion.txt
    assert ntd.nshells > 0
    assert ntd.nexc > 0
    ionpots = np.asarray(ntd.shell_ionpot_ev)
    assert np.all(ionpots >= ntd.sf_emin)
    assert np.all(ionpots < 2e4)


def test_heating_fraction_drops_with_xe(setup):
    ad, dad, ntd = setup
    nions = dad.nlevels_total  # placeholder; use real nions below
    nions = dad.nions_total
    ncells = 3
    nnion = jnp.zeros((ncells, nions)).at[:, 0].set(1e8)
    pops = jnp.zeros((ncells, dad.nlevels_total)).at[:, dad.ion_level_start[0]].set(1e8)
    heats = []
    for xe in (1.0, 0.1, 0.01):
        out = nonthermal.solve_spencerfano_cells(
            ntd, dad, pops, nnion, jnp.full(ncells, 1e8 * xe)
        )
        y = np.asarray(out["y"])
        assert np.all(np.isfinite(y))
        h = float(out["frac_heating"][0])
        i = float(out["frac_ionization"][0])
        e = float(out["frac_excitation"][0])
        assert 0.0 <= h <= 1.0 and 0.0 <= i <= 1.0 and 0.0 <= e <= 1.0
        # genuine energy closure: frac_heating is computed directly from
        # K&F eq 3 (incl. the E<SF_EMIN N_e term), NOT clamped to 1-i-e,
        # so the three fractions summing to one tests energy conservation
        # of the solved degradation spectrum (reference:
        # nonthermal.cc:1060-1095 + analyse_sf_solution)
        assert h + i + e == pytest.approx(1.0, abs=2e-3)
        heats.append(h)
    # high x_e -> nearly all heating (Axelrod limit ~0.97)
    assert heats[0] > 0.9
    # monotonic decline of heating as x_e drops (Kozma & Fransson 1992)
    assert heats[0] > heats[1] > heats[2]
    assert heats[2] < 0.8


def test_eff_ionpot_positive_for_included_ions(setup):
    ad, dad, ntd = setup
    nions = dad.nions_total
    ncells = 2
    # spread population over all ions
    nnion = jnp.full((ncells, nions), 1e7)
    pops = jnp.zeros((ncells, dad.nlevels_total)).at[:, dad.ion_level_start].set(1e7)
    out = nonthermal.solve_spencerfano_cells(
        ntd, dad, pops, nnion, jnp.full(ncells, 1e7)
    )
    eff = np.asarray(out["eff_ionpot"])
    shells = np.unique(np.asarray(ntd.shell_ion))
    assert np.all(eff[:, shells] > 0)
    # rate coefficient: positive for ions with shells when deposition > 0
    rate = nonthermal.nt_ionization_ratecoeff(
        jnp.full(ncells, 1e-10), jnp.sum(nnion, axis=1), out["eff_ionpot"]
    )
    assert np.all(np.asarray(rate)[:, shells] > 0)


def test_lotz_rows_synthesised_for_missing_ions(setup):
    """Ions without collion.txt data get per-shell Lotz rows with the
    approximate shell occupancies (reference: nonthermal.cc:640-700)."""
    ad, dad, ntd = setup
    ions_with_rows = set(np.unique(np.asarray(ntd.shell_ion)).tolist())
    # every included ion must have at least one shell (Younger or Lotz)
    assert ions_with_rows == set(range(dad.nions_total))
    # Lotz xs vectors are finite and non-negative
    xs = np.asarray(ntd.shell_xs)
    assert np.all(np.isfinite(xs)) and np.all(xs >= 0)
    assert xs.shape == (ntd.nshells, ntd.sf_points)


def test_shell_occupancies():
    from artis_tpu.plasma.nonthermal import approx_shell_occupancies

    # neutral Fe: 1s2 2s2 2p6 3s2 3p6 3d6 4s2
    q = approx_shell_occupancies(26, 0)
    assert q.sum() == 26
    assert q[0] == 2 and q[1] == 2 and q[2] + q[3] == 6
    assert q[9] == 2  # 4s filled for neutrals
    assert q[7] + q[8] == 6  # 3d6
    # Fe II (charge 1): 3d7 4s1 per the reference's filling rule
    q1 = approx_shell_occupancies(25, 1)
    assert q1.sum() == 25 and q1[9] == 1 and q1[7] + q1[8] == 6
    # Fe III (charge 2): no 4s
    q2 = approx_shell_occupancies(24, 2)
    assert q2.sum() == 24 and q2[9] == 0


def test_auger_probabilities_sum_to_one(setup):
    ad, dad, ntd = setup
    pa = np.asarray(ntd.shell_prob_auger)
    # the K&M table rows carry 10 probability columns; the reference
    # reads 9 (nonthermal.cc:386-410), so sums can be ~0.9958
    np.testing.assert_allclose(pa.sum(axis=1), 1.0, atol=5e-3)
    assert np.all(pa >= 0)
    # K-shell rows of Fe/Ni should have Auger data (non-trivial distribution)
    assert np.any(pa[:, 1:] > 0.5)
    en = np.asarray(ntd.shell_en_auger_ev)
    assert np.all(np.isfinite(en)) and np.all(en >= 0)


def test_solver_auger_outputs(setup):
    ad, dad, ntd = setup
    nions = dad.nions_total
    ncells = 2
    nnion = jnp.full((ncells, nions), 1e7)
    pops = jnp.zeros((ncells, dad.nlevels_total)).at[:, dad.ion_level_start].set(1e7)
    out = nonthermal.solve_spencerfano_cells(
        ntd, dad, pops, nnion, jnp.full(ncells, 1e7)
    )
    for key in ("prob_num_auger", "ionenfrac_num_auger"):
        p = np.asarray(out[key])
        assert p.shape == (ncells, nions, ntd.nt_max_auger + 1)
        assert np.all(p >= -1e-9)
        np.testing.assert_allclose(p.sum(axis=2), 1.0, atol=5e-3)
    # exc ratecoeff per deposition: finite, non-negative
    ex = np.asarray(out["exc_ratecoeff_perdep"])
    assert ex.shape == (ncells, ntd.nexc)
    assert np.all(np.isfinite(ex)) and np.all(ex >= 0)


def test_excitation_level_caps(setup):
    """The excitation table honours NTEXCITATION_MAXNLEVELS_LOWER/_UPPER
    (reference: nonthermal.cc:1785-1806)."""
    ad, dad, ntd = setup
    lower = np.asarray(ntd.exc_lower)
    upper = np.asarray(ntd.exc_upper)
    starts = np.asarray(dad.ion_level_start)[np.asarray(dad.level_ion)[lower]]
    assert np.all(lower - starts < 5)
    assert np.all(upper - starts < 250)


@pytest.mark.slow
def test_nt_excitation_channel_end_to_end(tmp_path):
    """NT_EXCITATION_ON equivalent: deposited leptons can activate macro-atoms
    at excitation upper levels (reference: nonthermal.cc:2353-2385); the run
    must stay finite and the three NT outcome counters must account for every
    deposited lepton."""
    import numpy as np
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, nltenebular
    from artis_tpu.synthdata import make_run
    from artis_tpu import stats

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=4, tmax_days=2.0, ngreyts=0,
             num_lte_timesteps=1)
    opts = nltenebular(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=16, linewalk_chunk=64, sf_points=48,
        nt_excitation_on=True, radfieldbincount=32,
        detailed_bf_estimators_usefromtimestep=1,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    total = np.zeros(3)
    for ts in range(3):
        sim.do_timestep(ts)
        c = np.asarray(sim.est.counters)
        total += [c[stats.NT_STAT_TO_IONIZATION], c[stats.NT_STAT_TO_EXCITATION],
                  c[stats.NT_STAT_TO_KPKT]]
    assert np.all(np.isfinite(np.asarray(sim.cells.Te)))
    # leptons were deposited and routed through the NT outcome channels
    assert total.sum() > 0


def test_wf_oneoverw_factor(setup):
    """Work-function approximation prefactor (reference:
    nonthermal.cc:566-597, 1136-1156): positive for every ion with bound
    electrons, larger for more loosely bound (lower-stage) ions of the
    same element."""
    ad, dad, ntd = setup
    f = nonthermal.wf_oneoverw_factor(ad, dad, "/root/reference/data")
    assert f.shape == (dad.nions_total,)
    assert np.all(f > 0)
    # loosely-bound neutral has larger 1/W than its higher ion stages
    ion_elem = np.asarray(dad.ion_element)
    for el in np.unique(ion_elem):
        rows = np.where(ion_elem == el)[0]
        if len(rows) >= 2:
            assert f[rows[0]] > f[rows[-1]]


def test_wf_mode_end_to_end(tmp_path):
    """NT_ON without NT_SOLVE_SPENCERFANO: the NLTE ionisation balance uses
    the work-function Gamma_NT (nonthermal.cc:2269), the heating fraction is
    the 0.97 constant (nonthermal.cc:2150-2152), and deposited leptons all
    thermalise (no NT macro-atom channel, nonthermal.cc:2313-2315)."""
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, nltenebular
    from artis_tpu.synthdata import make_run
    from artis_tpu import stats

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=4, tmax_days=2.0, ngreyts=0,
             num_lte_timesteps=1)
    opts = nltenebular(
        npkts=512, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=16, linewalk_chunk=64,
        nt_solve_spencerfano=False, radfieldbincount=32,
        detailed_bf_estimators_usefromtimestep=1,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    assert sim.ntd is None and sim.nt_wf is not None
    total = np.zeros(3)
    for ts in range(3):
        sim.do_timestep(ts)
        c = np.asarray(sim.est.counters)
        total += [c[stats.NT_STAT_TO_IONIZATION], c[stats.NT_STAT_TO_EXCITATION],
                  c[stats.NT_STAT_TO_KPKT]]
    assert np.all(np.isfinite(np.asarray(sim.cells.Te)))
    # WF mode: every deposited lepton goes straight to the k-packet channel
    assert total[0] == 0 and total[1] == 0


def test_sf_solution_reuse_across_timesteps(tmp_path):
    """sf_max_ts_between_solutions: a carried Spencer-Fano solution is kept
    across timesteps while x_e moved < 5% AND the solution is within the age
    cap AND was solved after the LTE phase (reference keep-conditions,
    nonthermal.cc:2432-2442).  Knob 0 forces a cross-timestep re-solve; a
    large knob reuses the carried solution with identical physics.

    Probes _plasma_call directly with a controlled carry so the gate
    decision is exact: the same grid update is evaluated three times on
    bit-identical inputs, differing only in the carried solution's age and
    the knob value."""
    import jax.numpy as jnp
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, nltenebular
    from artis_tpu.synthdata import make_run

    d = str(tmp_path)
    make_run(d, ncells=4, ntimesteps=6, tmax_days=2.5, ngreyts=0,
             num_lte_timesteps=1)
    opts = nltenebular(
        npkts=256, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=16, linewalk_chunk=64, sf_points=48,
        radfieldbincount=32, detailed_bf_estimators_usefromtimestep=1,
        nlte_enabled=False,  # single-pass SF branch: fully deterministic
        sf_max_ts_between_solutions=0,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    assert sim.ntd is not None
    sim.do_timestep(0)
    sim.do_timestep(1)  # the nt_sf_skip timestep: carry stays default

    # fresh solve at nts=3: the default carry is stale, every cell solves
    mode, res = sim._plasma_call(3)
    assert mode == "nlte"
    carry = res[-1]
    assert np.all(np.asarray(carry["ts_last_solved"]) == 3)
    assert np.all(np.asarray(carry["xe_when_solved"]) > 0)

    # age the solution: pretend it was solved at ts2
    aged = dict(carry, ts_last_solved=jnp.full_like(
        carry["ts_last_solved"], 2))

    # knob 0: age 3-2 > 0 -> stale -> re-solve everywhere
    sim._sf_carry = aged
    _, res0 = sim._plasma_call(3)
    assert np.all(np.asarray(res0[-1]["ts_last_solved"]) == 3)

    # knob 5: within the age cap, x_e unchanged (same inputs) -> reuse
    sim.opts = sim.opts.replace(sf_max_ts_between_solutions=5)
    sim._sf_carry = aged
    _, res5 = sim._plasma_call(3)
    assert np.all(np.asarray(res5[-1]["ts_last_solved"]) == 2)

    # identical physics: the re-solved run (identical inputs) and the reused
    # carry agree — frac_heating, the NT ionisation split and T_e all match
    np.testing.assert_allclose(
        np.asarray(res5[-1]["frac_heating"]),
        np.asarray(res0[-1]["frac_heating"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res5[9]), np.asarray(res0[9]), rtol=1e-6)  # frac_ionization
    np.testing.assert_allclose(
        np.asarray(res5[0].Te), np.asarray(res0[0].Te), rtol=1e-6)

    # solved-during-LTE-phase solutions are never reused: ts_last <= num_lte
    lte_aged = dict(carry, ts_last_solved=jnp.full_like(
        carry["ts_last_solved"], 1))
    sim._sf_carry = lte_aged
    _, res_lte = sim._plasma_call(3)
    assert np.all(np.asarray(res_lte[-1]["ts_last_solved"]) == 3)
