"""Grid/model/timestep tests (reference behaviours: grid.cc, input.cc:1844)."""

import math
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from artis_tpu.constants import CLIGHT, DAY
from artis_tpu.io import inputparams, model as model_io
from artis_tpu import grid as grid_mod
from artis_tpu.options import GridType, TimeStepSizeMethod


def write_1d_model(tmpdir, ncells=10, vmax_kmps=30000.0, t_model_days=0.05):
    path = tmpdir / "model.txt"
    lines = [f"{ncells}", f"{t_model_days}"]
    lines.append("#inputcellid velocity_outer logrho X_Fegroup X_Ni56 X_Co56 X_Fe52 X_Cr48")
    for i in range(ncells):
        vout = vmax_kmps * (i + 1) / ncells
        logrho = -14.0 - 0.2 * i
        lines.append(f"{i + 1} {vout} {logrho} 0.5 0.2 0.01 0.0 0.0")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def write_3d_model(tmpdir, n=4, vmax=2.0e9, t_model_days=1.0, rho=1e-14):
    path = tmpdir / "model.txt"
    t_model = t_model_days * DAY
    xmax = vmax * t_model
    lines = [f"{n**3}", f"{t_model_days}", f"{vmax}"]
    lines.append("#inputcellid pos_x_min pos_y_min pos_z_min rho X_Fegroup X_Ni56 X_Co56 X_Fe52 X_Cr48")
    cid = 1
    for iz in range(n):
        for iy in range(n):
            for ix in range(n):
                px = -xmax + 2 * xmax * ix / n
                py = -xmax + 2 * xmax * iy / n
                pz = -xmax + 2 * xmax * iz / n
                # empty corner cells
                r = math.sqrt((px + xmax / n) ** 2 + (py + xmax / n) ** 2 + (pz + xmax / n) ** 2)
                cellrho = rho if r < xmax else 0.0
                lines.append(f"{cid} {px} {py} {pz} {cellrho} 1.0 0.9 0.0 0.0 0.0")
                cid += 1
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_time_init_logarithmic():
    tmin, tmax, nts = 0.4 * DAY, 10.0 * DAY, 20
    ts = inputparams.time_init(tmin, tmax, nts, TimeStepSizeMethod.LOGARITHMIC)
    assert ts.start[0] == pytest.approx(tmin)
    np.testing.assert_allclose(ts.start[:-1] + ts.width[:-1], ts.start[1:], rtol=1e-12)
    # logarithmic: constant ratio
    ratios = ts.start[1:-1] / ts.start[:-2]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-10)
    assert ts.start[-1] == tmax and ts.width[-1] == 0.0


def test_read_1d_model(tmp_path):
    tmin = 0.4 * DAY
    path = write_1d_model(tmp_path)
    m = model_io.read_model(path, tmin)
    assert m.dim == 1
    assert m.npts_model == 10
    assert m.vmax == pytest.approx(30000.0e5)
    # density scaled by (t_model/tmin)^3
    expected_rho0 = 10.0**-14.0 * (0.05 * DAY / tmin) ** 3
    assert m.rho_tmin[0] == pytest.approx(expected_rho0)
    assert m.ffegrp[0] == pytest.approx(0.5)
    assert list(m.nuc_z) == [28, 27, 26, 24]
    assert list(m.nuc_a) == [56, 56, 52, 48]
    assert m.initnucmassfrac[0, 0] == pytest.approx(0.2)  # Ni56


def test_read_3d_model(tmp_path):
    tmin = 2.0 * DAY
    path = write_3d_model(tmp_path)
    m = model_io.read_model(path, tmin)
    assert m.dim == 3
    assert m.npts_model == 64
    assert m.ncoord_model == (4, 4, 4)
    assert m.vmax == pytest.approx(2.0e9)
    assert (m.rho_tmin == 0).sum() > 0  # some empty corner cells


def test_grid_init_1d(tmp_path):
    tmin = 0.4 * DAY
    m = model_io.read_model(write_1d_model(tmp_path), tmin)
    g = grid_mod.grid_init(m, tmin, GridType.SPHERICAL1D)
    assert g.ngrid == 10
    assert g.nonempty_npts == 10
    # shell boundaries contiguous
    np.testing.assert_allclose(
        np.asarray(g.cell_pos_max[:-1, 0]), np.asarray(g.cell_pos_min[1:, 0]), rtol=1e-12
    )
    assert float(g.cell_pos_max[-1, 0]) == pytest.approx(g.rmax)


def test_grid_init_1d_model_on_3d_grid(tmp_path):
    tmin = 0.4 * DAY
    m = model_io.read_model(write_1d_model(tmp_path), tmin)
    g = grid_mod.grid_init(m, tmin, GridType.CARTESIAN3D, ncoordgrid_xyz=(20, 20, 20))
    assert g.ngrid == 8000
    # central cells should be mapped to inner shells; corners empty
    mgi = np.asarray(g.mgi_of_cell).reshape(20, 20, 20)
    assert mgi[0, 0, 0] == m.npts_model  # corner is outside the sphere -> empty
    centre = mgi[10, 10, 10]
    assert centre < m.npts_model


def test_boundary_distance_cartesian_radial_ray(tmp_path):
    """A packet flying outward along +x must cross successive x cells and
    eventually escape with snext == -99."""
    tmin = 2.0 * DAY
    m = model_io.read_model(write_3d_model(tmp_path), tmin)
    g = grid_mod.grid_init(m, tmin, GridType.CARTESIAN3D)

    pos = jnp.array([[1e10, 1e10, 1e10]])
    t = jnp.array([tmin])
    cell = grid_mod.get_cellindex_from_pos(g, pos, t)
    dirvec = jnp.array([[1.0, 0.0, 0.0]])

    ncross = 0
    escaped = False
    for _ in range(50):
        dist, snext = grid_mod.boundary_distance(g, dirvec, pos, t, cell)
        assert float(dist[0]) >= 0
        pos = pos + dirvec * dist[0]
        t = t + dist / CLIGHT
        if int(snext[0]) == grid_mod.BOUNDARY_ESCAPE:
            escaped = True
            break
        if int(snext[0]) != int(cell[0]):
            ncross += 1
        cell = snext
    assert escaped
    assert ncross >= 1


def test_boundary_distance_spherical(tmp_path):
    tmin = 0.4 * DAY
    m = model_io.read_model(write_1d_model(tmp_path), tmin)
    g = grid_mod.grid_init(m, tmin, GridType.SPHERICAL1D)

    # radially outward packet in shell 0
    r0 = 0.5 * float(g.cell_pos_max[0, 0])
    pos = jnp.array([[r0, 0.0, 0.0]])
    t = jnp.array([tmin])
    cell = jnp.array([0], dtype=jnp.int32)
    dirvec = jnp.array([[1.0, 0.0, 0.0]])

    nstep = 0
    escaped = False
    while nstep < 500:
        dist, snext = grid_mod.boundary_distance(g, dirvec, pos, t, cell)
        pos = pos + dirvec * dist[0]
        t = t + dist / CLIGHT
        if int(snext[0]) == grid_mod.BOUNDARY_ESCAPE:
            escaped = True
            break
        cell = jnp.where(snext >= 0, snext, cell)
        nstep += 1
    assert escaped
    # boundary velocity vmax=0.1c: an outward photon from near centre escapes
    # well before 2x light crossing time
    assert float(t[0]) < tmin + 3 * g.rmax / CLIGHT


def test_boundary_distance_spherical_inward_through_centre(tmp_path):
    """Inward packet must pass through inner shells then come back out."""
    tmin = 0.4 * DAY
    m = model_io.read_model(write_1d_model(tmp_path), tmin)
    g = grid_mod.grid_init(m, tmin, GridType.SPHERICAL1D)

    r0 = 0.99 * float(g.cell_pos_max[5, 0])
    pos = jnp.array([[r0, 0.0, 0.0]])
    t = jnp.array([tmin])
    cell = jnp.array([5], dtype=jnp.int32)
    dirvec = jnp.array([[-1.0, 0.0, 0.0]])

    cells_visited = [5]
    for _ in range(200):
        dist, snext = grid_mod.boundary_distance(g, dirvec, pos, t, cell)
        pos = pos + dirvec * dist[0]
        t = t + dist / CLIGHT
        if int(snext[0]) == grid_mod.BOUNDARY_ESCAPE:
            break
        if int(snext[0]) != int(cell[0]):
            cells_visited.append(int(snext[0]))
        cell = snext
    assert min(cells_visited) < 5  # went inward
    assert int(snext[0]) == grid_mod.BOUNDARY_ESCAPE  # eventually escaped


def test_cellindex_from_pos_roundtrip(tmp_path):
    tmin = 2.0 * DAY
    m = model_io.read_model(write_3d_model(tmp_path), tmin)
    g = grid_mod.grid_init(m, tmin, GridType.CARTESIAN3D)
    rng = np.random.default_rng(1)
    pos = rng.uniform(-0.9, 0.9, (64, 3)) * g.rmax
    t = np.full(64, tmin)
    cells = np.asarray(grid_mod.get_cellindex_from_pos(g, jnp.asarray(pos), jnp.asarray(t)))
    # verify position within cell bounds
    pmin = np.asarray(g.cell_pos_min)[cells]
    pmax = np.asarray(g.cell_pos_max)[cells]
    assert np.all(pos >= pmin - 1e-6) and np.all(pos <= pmax + 1e-6)


def test_parameterfile_roundtrip(tmp_path):
    content = textwrap.dedent("""\
        1281360349               # pre_zseed
        20                       # ntimesteps
        000 009                  # timestep_start timestep_finish
        0.4 010                  # tmin tmax days
        1.33  1.330000001        # UNUSED
        80                       # UNUSED
        3. 0.037                 # UNUSED
        1                        # UNUSED
        4                        # UNUSED
        1                        # UNUSED
        1.0                      # UNUSED
        -1                       # gamma grey opacity
        0 0 1                    # UNUSED syn_dir
        4                        # opacity_case
        1.0e-10                  # rho_crit_para
        -1                       # UNUSED debug
        0                        # continue
        1e-6                     # UNUSED rfcut
        999                      # num_lte_timesteps
        0.0 5                    # thick threshold, grey steps
        -1                       # UNUSED max_bf_continua
        4                        # nprocs_exspec
        1                        # do_emission_res
        0.001 1000               # kpkt diffusion
    """)
    p = tmp_path / "input.txt"
    p.write_text(content)
    params = inputparams.read_parameterfile(str(p))
    assert params.pre_zseed == 1281360349
    assert params.ntimesteps == 20
    assert params.timestep_start == 0 and params.timestep_finish == 9
    assert params.tmin == pytest.approx(0.4 * DAY)
    assert params.tmax == pytest.approx(10.0 * DAY)
    assert params.gamma_kappagrey == -1.0
    assert params.opacity_case == 4
    assert params.rho_crit_para == pytest.approx(1e-10)
    assert not params.simulation_continued_from_saved
    assert params.num_lte_timesteps == 999
    assert params.num_grey_timesteps == 5
    assert params.nprocs_exspec == 4
    assert params.do_emission_res
    assert params.kpktdiffusion_timescale == pytest.approx(0.001)
    assert params.n_kpktdiffusion_timesteps == 1000

    # restart rewrite (reference: input.cc:1770-1841)
    inputparams.update_parameterfile(str(p), nts=7, timestep_finish=9, nprocs=4)
    params2 = inputparams.read_parameterfile(str(p))
    assert params2.timestep_start == 7
    assert params2.simulation_continued_from_saved


def test_opacity_case3_rho_crit_regime_switch(tmp_path):
    """opacity_case 3 recomputes rho_crit every timestep and switches
    kappagrey between the rho-proportional and rho-independent regimes as
    the ejecta dilutes (reference: update_grid.cc:1090-1097, 893-907)."""
    from artis_tpu.driver import Simulation
    from artis_tpu.options import GridType, kilonova_lte
    from artis_tpu.synthdata import make_run

    d = str(tmp_path)
    make_run(d, ncells=6, ntimesteps=6, tmin_days=0.4, tmax_days=8.0,
             ngreyts=6, opacity_case=3, rho_crit_para=7.5e-9,
             num_lte_timesteps=999)
    opts = kilonova_lte(
        npkts=64, grid_type=GridType.SPHERICAL1D, mintemp=1000.0,
        maxtemp=20000.0, tablesize=16,
    )
    sim = Simulation(d, opts, datadir="/root/reference/data")
    assert sim.params.opacity_case == 3

    mgi = sim.mgi_of_nonempty
    full = sim.opcase3_normal * (0.9 * sim.model.ffegrp[mgi] + 0.1)

    sim.update_grid(0)
    rho0 = np.asarray(sim.cells.rho)
    k0 = np.asarray(sim.cells.kappagrey)
    dense0 = rho0 > sim.rho_crit
    # early: the inner cells are above the critical density -> reduced,
    # rho-independent product kappa*rho = opcase3_normal*(0.9 ffe+0.1)*rho_crit
    assert dense0.any(), "test setup: no cell above rho_crit at ts 0"
    np.testing.assert_allclose(
        k0[dense0], full[dense0] * sim.rho_crit / rho0[dense0], rtol=1e-12)
    np.testing.assert_allclose(k0[~dense0], full[~dense0], rtol=1e-12)
    rho_crit_0 = sim.rho_crit

    sim.update_grid(4)
    rho4 = np.asarray(sim.cells.rho)
    k4 = np.asarray(sim.cells.kappagrey)
    # rho_crit falls as 1/t_mid while rho falls as t^-3: the regime switch
    # engages and every cell drops below the critical density
    assert sim.rho_crit < rho_crit_0
    assert np.all(rho4 < sim.rho_crit)
    np.testing.assert_allclose(k4, full, rtol=1e-12)
