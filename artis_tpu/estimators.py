"""Monte Carlo estimator accumulators.

TPU-native rebuild of the reference estimator arrays (reference:
globals.h:206-232 J/nuJ/ffheating/deposition arrays, sn3d.cc:263-348
mpi_reduce_estimators, stats.h:47-82 event counters).

The reference accumulates with atomicadd during transport and MPI_Allreduces
afterwards; here each transport step produces per-packet contributions that
are segment-summed into (ncells,) arrays inside the jitted step, and a single
``psum`` over the device mesh replaces the Allreduce.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "j", "nuj", "ffheating", "dep_gamma", "dep_electron", "dep_positron",
        "dep_alpha", "gammaestimator", "bfheatingestimator",
        "cmf_lum", "pellet_decays", "nesc",
        "gamma_emission", "positron_emission", "electron_emission", "alpha_emission",
        "counters", "radfieldbin_j", "radfieldbin_nuj", "radfieldbin_count",
        "vspec",
        "gamma_dep_discrete", "positron_dep_discrete", "electron_dep_discrete",
        "alpha_dep_discrete", "bfrate", "jblue_raw", "jblue_count",
        "ion_stats", "vgrid", "line_emisscount", "line_absorbcount",
        "malog", "malog_n",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Estimators:
    # per-cell path-based estimators (reference: globals.h:206-232)
    j: jax.Array  # (ncells,)
    nuj: jax.Array
    ffheating: jax.Array
    dep_gamma: jax.Array
    dep_electron: jax.Array
    dep_positron: jax.Array
    dep_alpha: jax.Array
    # LUT estimators per ground continuum (reference: globals.h:214-215)
    gammaestimator: jax.Array  # (ncells, nbfcontinua_ground)
    bfheatingestimator: jax.Array  # (ncells, nbfcontinua_ground)
    # per-timestep scalars (reference: globals.h TimeStep fields)
    cmf_lum: jax.Array
    pellet_decays: jax.Array
    nesc: jax.Array
    gamma_emission: jax.Array
    counters: jax.Array  # (stats.N_COUNTERS,) event counters
    radfieldbin_j: jax.Array  # (ncells, nbins) multibin radfield J
    radfieldbin_nuj: jax.Array  # (ncells, nbins)
    radfieldbin_count: jax.Array  # (ncells, nbins) contribution counts
    vspec: jax.Array  # (nobs, nspec, vmtbins, vmnubins, 3) virtual-packet Stokes
    positron_emission: jax.Array
    electron_emission: jax.Array
    alpha_emission: jax.Array
    gamma_dep_discrete: jax.Array
    positron_dep_discrete: jax.Array
    electron_dep_discrete: jax.Array
    alpha_dep_discrete: jax.Array
    # detailed per-continuum photoionisation-rate estimators
    # (reference: radfield.cc:70-71, 204-233; (1,1) placeholder when off)
    bfrate: jax.Array  # (ncells, nbfcontinua)
    # detailed line J_b_lu estimators: accumulated every time a packet's
    # comoving frequency sweeps through a selected line's resonance
    # (reference: radfield.cc:57-68 Jb_lu_raw, 761-771 update_lineestimator;
    # (1,1) placeholders when off)
    jblue_raw: jax.Array  # (ncells, njblue)
    jblue_count: jax.Array  # (ncells, njblue)
    # per-ion-per-cell event statistics (reference: stats.h:12-44
    # ionstattypes, stats.cc:36-154 increment_ion_stats; (1,1,1) when off)
    ion_stats: jax.Array  # (ncells, nions, N_ION_STATS)
    # virtual-packet velocity-grid polarisation maps
    # (reference: vpkt.cc:66-160; (1,1,1,1,3) when off)
    vgrid: jax.Array  # (nobs, nwl, vgrid_ny, vgrid_nz, 3)
    # per-line emission/absorption counters (reference: RECORD_LINESTAT,
    # sn3d.cc:64-98, 640-660 linestat.out; (1,) when off)
    line_emisscount: jax.Array  # (nlines,)
    line_absorbcount: jax.Array  # (nlines,)
    # bounded per-interaction macro-atom event rows (reference: LOG_MACROATOM
    # macroatom.cc:413-421): [mgi, level_in, level_out, activline, nu_cmf_in,
    # nu_cmf_out, nu_rf_in, nu_rf_out]; ((1, 8) placeholder when off)
    malog: jax.Array  # (capacity, 8)
    malog_n: jax.Array  # int32 total events seen (may exceed capacity)

    def replace(self, **kw) -> "Estimators":
        return dataclasses.replace(self, **kw)


def zero_estimators(ncells: int, nbfcontinua_ground: int, dtype=jnp.float64,
                    nradfieldbins: int = 1,
                    vspec_shape=(1, 1, 1, 1, 3),
                    nbfrate: int = 1, nbfrate_cells: int = 1,
                    njblue: int = 1, njblue_cells: int = 1,
                    nion_stats_cells: int = 1, nion_stats_ions: int = 1,
                    nion_stats: int = 1,
                    vgrid_shape=(1, 1, 1, 1, 3),
                    nlinestat: int = 1,
                    nmalog: int = 1) -> Estimators:
    z = jnp.zeros((), dtype)
    return Estimators(
        j=jnp.zeros(ncells, dtype),
        nuj=jnp.zeros(ncells, dtype),
        ffheating=jnp.zeros(ncells, dtype),
        dep_gamma=jnp.zeros(ncells, dtype),
        dep_electron=jnp.zeros(ncells, dtype),
        dep_positron=jnp.zeros(ncells, dtype),
        dep_alpha=jnp.zeros(ncells, dtype),
        gammaestimator=jnp.zeros((ncells, nbfcontinua_ground), dtype),
        bfheatingestimator=jnp.zeros((ncells, nbfcontinua_ground), dtype),
        cmf_lum=z,
        pellet_decays=jnp.zeros((), jnp.int32),
        nesc=jnp.zeros((), jnp.int32),
        gamma_emission=z,
        counters=jnp.zeros((33,), dtype),
        radfieldbin_j=jnp.zeros((ncells, nradfieldbins), dtype),
        radfieldbin_nuj=jnp.zeros((ncells, nradfieldbins), dtype),
        radfieldbin_count=jnp.zeros((ncells, nradfieldbins), dtype),
        vspec=jnp.zeros(vspec_shape, dtype),
        positron_emission=z,
        electron_emission=z,
        alpha_emission=z,
        gamma_dep_discrete=z,
        positron_dep_discrete=z,
        electron_dep_discrete=z,
        alpha_dep_discrete=z,
        bfrate=jnp.zeros((nbfrate_cells, nbfrate), dtype),
        jblue_raw=jnp.zeros((njblue_cells, njblue), dtype),
        jblue_count=jnp.zeros((njblue_cells, njblue), dtype),
        ion_stats=jnp.zeros((nion_stats_cells, nion_stats_ions, nion_stats), dtype),
        vgrid=jnp.zeros(vgrid_shape, dtype),
        line_emisscount=jnp.zeros((nlinestat,), jnp.int32),
        line_absorbcount=jnp.zeros((nlinestat,), jnp.int32),
        malog=jnp.zeros((nmalog, 8), dtype),
        malog_n=jnp.zeros((), jnp.int32),
    )


def cell_add(array: jax.Array, nonemptymgi: jax.Array, contrib: jax.Array, active) -> jax.Array:
    """Segment-sum per-packet contributions into a per-cell array.

    Replaces the reference's atomicadd on shared estimators (sn3d.h:164-184).
    """
    safe_idx = jnp.where(active & (nonemptymgi >= 0), nonemptymgi, 0)
    vals = jnp.where(active & (nonemptymgi >= 0), contrib, 0.0)
    return array.at[safe_idx].add(vals)


def psum_estimators(est: Estimators, axis_name: str) -> Estimators:
    """All-reduce over the packet-sharded mesh axis (replaces
    MPI_Allreduce(SUM), reference: sn3d.cc:263-348)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), est)
