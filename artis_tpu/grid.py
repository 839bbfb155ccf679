"""Propagation grid: 1D-spherical / 2D-cylindrical / 3D-Cartesian geometry.

TPU-native rebuild of the reference grid layer (reference: grid.cc:1048-1137
setup, grid.cc:470-527 model->grid mapping, grid.cc:2332-2597
get_cellindex_from_pos / boundary_distance, grid.cc:1222-1312
expanding_shell_intersection).

Design: all per-cell quantities are flat (ngrid,...) device arrays inside a
``GridData`` pytree; every geometric routine is a pure vectorised function of
packet batches — the reference's per-packet scalar recursion becomes masked
element-wise arithmetic plus gathers on the cell index. The grid type is a
static Python value, so XLA compiles exactly one geometry's code (mirroring
the reference's ``if constexpr`` dispatch).

Cells are indexed x-fastest ("increment X first, then Y, then Z",
reference: grid.cc:1419-1445). snext == -99 encodes escape from the grid.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .constants import CLIGHT_PROP, PI
from .options import GridType
from .io.model import ModelData


BOUNDARY_ESCAPE = -99


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "cell_pos_min",
        "cell_pos_max",
        "mgi_of_cell",
        "nonemptymgi_of_cell",
        "cell_of_nonemptymgi",
        "rho_tmin_mgi",
        "numpropcells_mgi",
        "vout_model",
        "initial_radial_pos_sum_mgi",
    ],
    meta_fields=["grid_type", "ncoordgrid", "ngrid", "npts_model", "nonempty_npts", "tmin", "rmax", "vmax", "model_dim", "model_ncoord"],
)
@dataclasses.dataclass(frozen=True)
class GridData:
    """Static propagation-grid geometry + model-cell association."""

    # geometry per propagation cell, at t=tmin, in grid coordinates
    cell_pos_min: jax.Array  # (ngrid, ndim)
    cell_pos_max: jax.Array  # (ngrid, ndim)
    # model-cell association (reference: grid.cc:198-204, 470-527)
    mgi_of_cell: jax.Array  # (ngrid,) int32; == npts_model for empty cells
    nonemptymgi_of_cell: jax.Array  # (ngrid,) int32; -1 for empty
    cell_of_nonemptymgi: jax.Array  # (nonempty_npts,) a representative propcell
    rho_tmin_mgi: jax.Array  # (npts_model+1,) density at tmin (0 for empty sentinel)
    numpropcells_mgi: jax.Array  # (npts_model+1,) int32
    vout_model: jax.Array  # (npts_model,) 1D shells' outer velocity (dummy otherwise)
    initial_radial_pos_sum_mgi: jax.Array  # (npts_model+1,) sum of propcell radial mids at tmin

    # static metadata
    grid_type: GridType
    ncoordgrid: tuple
    ngrid: int
    npts_model: int
    nonempty_npts: int
    tmin: float
    rmax: float
    vmax: float
    model_dim: int = 0  # dimensionality of the INPUT model (1D model on a
    # 3D grid keeps radial cell->model mapping, grid.cc:470-487)
    model_ncoord: tuple = ()  # the INPUT model's coordinate counts

    @property
    def ndim(self) -> int:
        return {GridType.SPHERICAL1D: 1, GridType.CYLINDRICAL2D: 2, GridType.CARTESIAN3D: 3}[
            self.grid_type
        ]

    @property
    def max_path_step(self) -> float:
        # reference: update_grid.cc:1147
        return min(1e35, self.rmax / 10.0)


class GridHost:
    """Host (numpy) mirrors of the GridData index/geometry arrays the driver
    needs, avoiding device->host transfers during setup (each transfer over
    the tunneled TPU backend is expensive and, mid-worker-restart, hangs)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def grid_init(model: ModelData, tmin: float, grid_type: GridType,
              ncoordgrid_xyz=(50, 50, 50), with_host: bool = False):
    """Build the propagation grid and map model cells onto it
    (reference: grid.cc:2206-2325 grid_init, 1048-1137 setup_grid_*)."""
    vmax = model.vmax
    rmax = vmax * tmin

    if grid_type == GridType.SPHERICAL1D:
        assert model.dim == 1
        ncoordgrid = (model.npts_model, 1, 1)
        ngrid = model.npts_model
        v_inner = np.concatenate([[0.0], model.vout_model[:-1]])
        pos_min = (v_inner * tmin)[:, None]
        pos_max = (model.vout_model * tmin)[:, None]
        mgi_of_cell = np.arange(ngrid, dtype=np.int32)
        # zero-density shells are empty (reference: grid.cc:521-526 analogue)
        mgi_of_cell = np.where(model.rho_tmin > 0, mgi_of_cell, model.npts_model).astype(np.int32)
    elif grid_type == GridType.CYLINDRICAL2D:
        assert model.dim == 2
        n_rcyl, n_z = model.ncoord_model
        ncoordgrid = (n_rcyl, n_z, 1)
        ngrid = n_rcyl * n_z
        i_r = np.arange(ngrid) % n_rcyl
        i_z = np.arange(ngrid) // n_rcyl
        pos_min = np.stack(
            [i_r * rmax / n_rcyl, rmax * (-1.0 + i_z * 2.0 / n_z)], axis=-1
        )
        pos_max = np.stack(
            [(i_r + 1) * rmax / n_rcyl, rmax * (-1.0 + (i_z + 1) * 2.0 / n_z)], axis=-1
        )
        mgi_of_cell = np.where(
            model.rho_tmin > 0, np.arange(ngrid), model.npts_model
        ).astype(np.int32)
    elif grid_type == GridType.CARTESIAN3D:
        if model.dim == 3:
            ncoordgrid = tuple(model.ncoord_model)
        else:
            ncoordgrid = tuple(ncoordgrid_xyz)
        nx, ny, nz = ncoordgrid
        assert nx == ny == nz, "reference assumes cubic cells (grid.cc:1069-1070)"
        ngrid = nx * ny * nz
        idx = np.arange(ngrid)
        ix = idx % nx
        iy = (idx // nx) % ny
        iz = idx // (nx * ny)
        wid = 2.0 * rmax / nx
        pos_min = np.stack(
            [-rmax + 2.0 * ix * rmax / nx, -rmax + 2.0 * iy * rmax / ny, -rmax + 2.0 * iz * rmax / nz],
            axis=-1,
        )
        pos_max = pos_min + wid

        if model.dim == 3:
            mgi_of_cell = np.where(model.rho_tmin > 0, idx, model.npts_model).astype(np.int32)
        elif model.dim == 1:
            # map 1D shells onto the 3D grid by cell-centre radial velocity
            # (reference: grid.cc:470-487 map_1dmodelto3dgrid)
            pos_mid = pos_min + 0.5 * wid
            cellvmid = np.linalg.norm(pos_mid, axis=-1) / tmin
            mgi = np.searchsorted(model.vout_model, cellvmid, side="left")
            inside = mgi < model.npts_model
            rho_ok = np.where(inside, model.rho_tmin[np.minimum(mgi, model.npts_model - 1)] > 0, False)
            mgi_of_cell = np.where(inside & rho_ok, mgi, model.npts_model).astype(np.int32)
        elif model.dim == 2:
            # map 2D cylindrical model cells onto the 3D grid
            # (reference: grid.cc:489-517 map_2dmodelto3dgrid)
            pos_mid = pos_min + 0.5 * wid
            rcyl = np.sqrt(pos_mid[:, 0] ** 2 + pos_mid[:, 1] ** 2)
            n_rcyl_model, n_z_model = model.ncoord_model
            i_r = (rcyl / tmin / vmax * n_rcyl_model).astype(np.int64)
            i_z = ((pos_mid[:, 2] / tmin + vmax) / (2 * vmax) * n_z_model).astype(np.int64)
            valid = (i_r >= 0) & (i_r < n_rcyl_model) & (i_z >= 0) & (i_z < n_z_model)
            mgi = np.where(valid, i_z * n_rcyl_model + i_r, model.npts_model)
            rho_ok = model.rho_tmin[np.minimum(mgi, model.npts_model - 1)] > 0
            mgi_of_cell = np.where(valid & rho_ok, mgi, model.npts_model).astype(np.int32)
        else:
            raise ValueError(model.dim)
    else:
        raise ValueError(grid_type)

    npts = model.npts_model
    numpropcells = np.bincount(mgi_of_cell, minlength=npts + 1).astype(np.int32)
    # non-empty model cells: associated propcells AND rho > 0
    # (reference: grid.cc:304-468 allocate_nonemptymodelcells)
    is_nonempty = (numpropcells[:npts] > 0) & (model.rho_tmin > 0)
    nonemptymgi_of_mgi = np.full(npts + 1, -1, dtype=np.int32)
    nonemptymgi_of_mgi[:npts][is_nonempty] = np.arange(is_nonempty.sum(), dtype=np.int32)
    nonemptymgi_of_cell = nonemptymgi_of_mgi[mgi_of_cell]
    nonempty_npts = int(is_nonempty.sum())

    # a representative propagation cell for each nonempty model cell
    cell_of_nonemptymgi = np.zeros(nonempty_npts, dtype=np.int32)
    seen = np.full(nonempty_npts, False)
    for cellidx in range(ngrid):
        nemgi = nonemptymgi_of_cell[cellidx]
        if nemgi >= 0 and not seen[nemgi]:
            cell_of_nonemptymgi[nemgi] = cellidx
            seen[nemgi] = True

    rho_tmin_mgi = np.concatenate([model.rho_tmin, [0.0]])
    vout = model.vout_model if model.vout_model is not None else np.zeros(npts)

    # per-model-cell sum of propcell radial midpoints at tmin
    # (reference: grid.cc:304-333, get_cellradialposmid)
    if grid_type == GridType.CARTESIAN3D:
        mid = pos_min + 0.5 * (pos_max - pos_min)
        radial_mid = np.linalg.norm(mid, axis=1)
    elif grid_type == GridType.CYLINDRICAL2D:
        rmid = 0.5 * (pos_min[:, 0] + pos_max[:, 0])
        zmid = 0.5 * (pos_min[:, 1] + pos_max[:, 1])
        radial_mid = np.sqrt(rmid**2 + zmid**2)
    else:
        radial_mid = 0.5 * (pos_min[:, 0] + pos_max[:, 0])
    initial_radial_pos_sum = np.zeros(npts + 1)
    np.add.at(initial_radial_pos_sum, mgi_of_cell, radial_mid)

    host = GridHost(
        cell_pos_min=np.asarray(pos_min, dtype=np.float64),
        cell_pos_max=np.asarray(pos_max, dtype=np.float64),
        mgi_of_cell=mgi_of_cell,
        nonemptymgi_of_cell=nonemptymgi_of_cell,
        cell_of_nonemptymgi=cell_of_nonemptymgi,
        numpropcells_mgi=numpropcells,
        initial_radial_pos_sum_mgi=initial_radial_pos_sum,
    )
    gd = GridData(
        cell_pos_min=jnp.asarray(pos_min),
        cell_pos_max=jnp.asarray(pos_max),
        mgi_of_cell=jnp.asarray(mgi_of_cell),
        nonemptymgi_of_cell=jnp.asarray(nonemptymgi_of_cell),
        cell_of_nonemptymgi=jnp.asarray(cell_of_nonemptymgi),
        rho_tmin_mgi=jnp.asarray(rho_tmin_mgi),
        numpropcells_mgi=jnp.asarray(numpropcells),
        vout_model=jnp.asarray(vout),
        initial_radial_pos_sum_mgi=jnp.asarray(initial_radial_pos_sum),
        grid_type=grid_type,
        ncoordgrid=ncoordgrid,
        ngrid=ngrid,
        npts_model=npts,
        nonempty_npts=nonempty_npts,
        tmin=float(tmin),
        rmax=float(rmax),
        vmax=float(vmax),
        model_dim=int(model.dim),
        model_ncoord=tuple(int(v) for v in model.ncoord_model),
    )
    if with_host:
        return gd, host
    return gd


def cellcoordpointnum(grid: GridData, cellindex: jax.Array, axis: int) -> jax.Array:
    """Integer coordinate of a cell along an axis (reference: grid.cc:1419-1445)."""
    n0, n1, n2 = grid.ncoordgrid
    if grid.grid_type == GridType.SPHERICAL1D:
        return cellindex
    if axis == 0:
        return cellindex % n0
    if axis == 1:
        return (cellindex // n0) % n1
    return (cellindex // (n0 * n1)) % n2


def _expanding_shell_intersection(
    pos, dirvec, speed, shellradius_tstart, isinnerboundary: bool, tstart
):
    """Closest forward distance to an expanding spherical shell / circle.

    Vectorised over packets; returns -1 where no valid intersection
    (reference: grid.cc:1222-1312)."""
    dirdot = jnp.sum(dirvec * dirvec, axis=-1)
    a = dirdot - (shellradius_tstart / tstart / speed) ** 2
    b = 2.0 * (jnp.sum(dirvec * pos, axis=-1) - shellradius_tstart**2 / tstart / speed)
    c = jnp.sum(pos * pos, axis=-1) - shellradius_tstart**2
    disc = b * b - 4.0 * a * c

    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    dist1 = (-b + sqrt_disc) / 2.0 / a
    dist2 = (-b - sqrt_disc) / 2.0 / a

    posfinal1 = pos + dist1[..., None] * dirvec
    posfinal2 = pos + dist2[..., None] * dirvec

    v_rad_shell = shellradius_tstart / tstart
    r1 = jnp.sqrt(jnp.sum(posfinal1 * posfinal1, axis=-1))
    r2 = jnp.sqrt(jnp.sum(posfinal2 * posfinal2, axis=-1))
    v_rad_final1 = jnp.sum(dirvec * posfinal1, axis=-1) * speed / jnp.where(r1 > 0, r1, 1.0)
    v_rad_final2 = jnp.sum(dirvec * posfinal2, axis=-1) * speed / jnp.where(r2 > 0, r2, 1.0)

    if isinnerboundary:
        # packet catching up to the inner shell from below passes through
        bad1 = v_rad_final1 > v_rad_shell
        bad2 = v_rad_final2 > v_rad_shell
    else:
        bad1 = v_rad_final1 < v_rad_shell
        bad2 = v_rad_final2 < v_rad_shell

    # float32 ping-pong guard: exclude re-intersections within roundoff of
    # the shell radius (a packet on the shell it just crossed would otherwise
    # bounce between cells forever without advancing in time); inactive in
    # float64 where roundoff is far below any physical distance
    eps = (2e-6 * shellradius_tstart) if pos.dtype == jnp.float32 else 0.0
    dist1 = jnp.where(bad1 | (dist1 < eps), -1.0, dist1)
    dist2 = jnp.where(bad2 | (dist2 < eps), -1.0, dist2)

    both_neg = (dist1 < 0) & (dist2 < 0)
    result = jnp.where(
        both_neg,
        -1.0,
        jnp.where(
            dist2 < 0, dist1, jnp.where(dist1 < 0, dist2, jnp.minimum(dist1, dist2))
        ),
    )
    # discriminant <= 0: no (or tangential) intersection
    return jnp.where(disc > 0, result, -1.0)


def boundary_distance(grid: GridData, dirvec, pos, tstart, cellindex):
    """Distance to the current cell's boundary and the next cell index.

    Vectorised over packets. Returns (distance, snext); snext == -99 means the
    packet escapes the grid; snext == cellindex with distance == max_path_step
    means an intra-cell step cap (reference: grid.cc:2349-2597)."""
    tmin = grid.tmin
    big = jnp.finfo(pos.dtype).max

    if grid.grid_type == GridType.SPHERICAL1D:
        r = jnp.sqrt(jnp.sum(pos * pos, axis=-1))
        speed = jnp.sqrt(jnp.sum(dirvec * dirvec, axis=-1)) * CLIGHT_PROP
        coordmax = jnp.take(grid.cell_pos_max[:, 0], cellindex)
        coordmin = jnp.take(grid.cell_pos_min[:, 0], cellindex)

        r_outer = coordmax * tstart / tmin
        d_max = _expanding_shell_intersection(pos, dirvec, speed, r_outer, False, tstart)
        distance = jnp.where((d_max >= 0) & (d_max < big), d_max, big)
        at_outer_edge = cellindex == (grid.ncoordgrid[0] - 1)
        snext = jnp.where(
            (d_max >= 0),
            jnp.where(at_outer_edge, BOUNDARY_ESCAPE, cellindex + 1),
            -1,
        )

        r_inner = coordmin * tstart / tmin
        d_min_raw = _expanding_shell_intersection(pos, dirvec, speed, r_inner, True, tstart)
        d_min = jnp.where(r_inner > 0, d_min_raw, -1.0)
        take_min = (d_min >= 0) & (d_min < distance)
        distance = jnp.where(take_min, d_min, distance)
        snext = jnp.where(
            take_min,
            jnp.where(cellindex == 0, BOUNDARY_ESCAPE, cellindex - 1),
            snext,
        )

    elif grid.grid_type == GridType.CYLINDRICAL2D:
        n0 = grid.ncoordgrid[0]
        posnoz = pos[..., :2]
        dirxylen = jnp.sqrt(dirvec[..., 0] ** 2 + dirvec[..., 1] ** 2)
        safe_dirxylen = jnp.where(dirxylen > 0, dirxylen, 1.0)
        xyspeed = dirxylen * CLIGHT_PROP
        dirnoz = dirvec[..., :2] / safe_dirxylen[..., None]

        coordmax_r = jnp.take(grid.cell_pos_max[:, 0], cellindex)
        coordmin_r = jnp.take(grid.cell_pos_min[:, 0], cellindex)
        coordmax_z = jnp.take(grid.cell_pos_max[:, 1], cellindex)
        coordmin_z = jnp.take(grid.cell_pos_min[:, 1], cellindex)
        i_r = cellindex % n0
        i_z = cellindex // n0

        distance = jnp.full(tstart.shape, big, dtype=pos.dtype)
        snext = jnp.full(tstart.shape, -1, dtype=jnp.int32)

        r_outer = coordmax_r * tstart / tmin
        d_rcyl_max = _expanding_shell_intersection(
            posnoz, dirnoz, xyspeed, r_outer, False, tstart
        )
        d_z_from_rmax = d_rcyl_max / jnp.where(xyspeed > 0, xyspeed, 1.0) * dirvec[..., 2] * CLIGHT_PROP
        d_max = jnp.sqrt(d_rcyl_max**2 + d_z_from_rmax**2)
        ok = (d_rcyl_max >= 0) & (d_max > 0) & (d_max < distance)
        distance = jnp.where(ok, d_max, distance)
        snext = jnp.where(
            ok,
            jnp.where(i_r == n0 - 1, BOUNDARY_ESCAPE, cellindex + 1),
            snext,
        )

        r_inner = coordmin_r * tstart / tmin
        d_rcyl_min = _expanding_shell_intersection(
            posnoz, dirnoz, xyspeed, r_inner, True, tstart
        )
        d_rcyl_min = jnp.where(r_inner > 0, d_rcyl_min, -1.0)
        d_z_from_rmin = d_rcyl_min / jnp.where(xyspeed > 0, xyspeed, 1.0) * dirvec[..., 2] * CLIGHT_PROP
        d_min = jnp.sqrt(d_rcyl_min**2 + d_z_from_rmin**2)
        ok = (d_rcyl_min >= 0) & (d_min >= 0) & (d_min < distance)
        distance = jnp.where(ok, d_min, distance)
        snext = jnp.where(
            ok,
            jnp.where(i_r == 0, BOUNDARY_ESCAPE, cellindex - 1),
            snext,
        )

        # z boundary, Cartesian-style
        velz = dirvec[..., 2] * CLIGHT_PROP
        posz = pos[..., 2]
        moving_up = (velz * tstart) > posz
        coordbound_z = jnp.where(moving_up, coordmax_z, coordmin_z)
        t_zbound = (posz - velz * tstart) / (coordbound_z - velz * tmin) * tmin - tstart
        d_z = CLIGHT_PROP * t_zbound
        ok = (d_z >= 0) & (d_z < distance)
        n1 = grid.ncoordgrid[1]
        at_edge = jnp.where(moving_up, i_z == n1 - 1, i_z == 0)
        step = jnp.where(moving_up, n0, -n0)
        distance = jnp.where(ok, d_z, distance)
        snext = jnp.where(ok, jnp.where(at_edge, BOUNDARY_ESCAPE, cellindex + step), snext)

    elif grid.grid_type == GridType.CARTESIAN3D:
        nx, ny, nz = grid.ncoordgrid
        ncoord = (nx, ny, nz)
        increments = (1, nx, nx * ny)
        distance = jnp.full(tstart.shape, big, dtype=pos.dtype)
        snext = jnp.full(tstart.shape, -1, dtype=jnp.int32)
        pos_min = jnp.take(grid.cell_pos_min, cellindex, axis=0)
        pos_max = jnp.take(grid.cell_pos_max, cellindex, axis=0)
        for d in range(3):
            veld = dirvec[..., d] * CLIGHT_PROP
            posd = pos[..., d]
            moving_up = (veld * tstart) > posd
            coordbound = jnp.where(moving_up, pos_max[..., d], pos_min[..., d])
            t_bound = (posd - veld * tstart) / (coordbound - veld * tmin) * tmin - tstart
            d_bound = CLIGHT_PROP * t_bound
            ok = (d_bound >= 0) & (d_bound < distance)
            coordpoint = cellcoordpointnum(grid, cellindex, d)
            at_edge = jnp.where(moving_up, coordpoint == ncoord[d] - 1, coordpoint == 0)
            step = jnp.where(moving_up, increments[d], -increments[d])
            distance = jnp.where(ok, d_bound, distance)
            snext = jnp.where(
                ok, jnp.where(at_edge, BOUNDARY_ESCAPE, cellindex + step), snext
            )
    else:
        raise ValueError(grid.grid_type)

    # cap step length; stay in the same cell (reference: grid.cc:2592-2594)
    capped = distance > grid.max_path_step
    distance = jnp.where(capped, grid.max_path_step, distance)
    snext = jnp.where(capped, cellindex, snext)
    return distance, snext


def get_cellindex_from_pos(grid: GridData, pos, time):
    """Propagation cell containing an xyz position (reference: grid.cc:2332-2346)."""
    if grid.grid_type == GridType.CARTESIAN3D:
        nx = grid.ncoordgrid[0]
        vmax = grid.vmax
        ii = ((pos / time[..., None] + vmax) / (2 * vmax) * nx).astype(jnp.int32)
        ii = jnp.clip(ii, 0, nx - 1)
        return ii[..., 0] + nx * ii[..., 1] + nx * nx * ii[..., 2]
    if grid.grid_type == GridType.CYLINDRICAL2D:
        n0, n1 = grid.ncoordgrid[0], grid.ncoordgrid[1]
        rcyl = jnp.sqrt(pos[..., 0] ** 2 + pos[..., 1] ** 2)
        i_r = jnp.clip((rcyl / time / grid.vmax * n0).astype(jnp.int32), 0, n0 - 1)
        i_z = jnp.clip(
            ((pos[..., 2] / time + grid.vmax) / (2 * grid.vmax) * n1).astype(jnp.int32),
            0,
            n1 - 1,
        )
        return i_z * n0 + i_r
    # SPHERICAL1D: non-uniform shells, need a searchsorted on outer radii
    r = jnp.sqrt(jnp.sum(pos * pos, axis=-1))
    v = r / time
    idx = jnp.searchsorted(grid.vout_model, v, side="left")
    return jnp.clip(idx, 0, grid.ngrid - 1).astype(jnp.int32)


def get_cell_volume_tmin(grid: GridData, host=None) -> np.ndarray:
    """Propagation-cell volumes at tmin, (ngrid,) (reference: grid.cc:1358-1366).

    Host-side float64: r**3 at CGS scales (1e42+) overflows float32, and
    volumes are only ever consumed by host-side normalisation code.
    """
    if grid.grid_type == GridType.CARTESIAN3D:
        wid = 2.0 * float(grid.rmax) / grid.ncoordgrid[0]
        return np.full((grid.ngrid,), wid**3)
    if host is not None:
        pos_min = host.cell_pos_min
        pos_max = host.cell_pos_max
    else:
        pos_min = np.asarray(grid.cell_pos_min, dtype=np.float64)
        pos_max = np.asarray(grid.cell_pos_max, dtype=np.float64)
    if grid.grid_type == GridType.CYLINDRICAL2D:
        dz = pos_max[:, 1] - pos_min[:, 1]
        return dz * PI * (pos_max[:, 0] ** 2 - pos_min[:, 0] ** 2)
    return 4.0 / 3.0 * PI * (pos_max[:, 0] ** 3 - pos_min[:, 0] ** 3)
