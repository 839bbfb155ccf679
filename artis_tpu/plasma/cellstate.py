"""Per-cell plasma state container (reference: grid.h:19-48 ModelGridCell +
node-shared arrays; update_grid.cc:869-1072 per-timestep updates).

All fields are (ncells, ...) device arrays over NON-EMPTY model cells, batched
so the whole grid updates as single fused XLA ops instead of the reference's
per-cell loop (update_grid.cc:1116-1124).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CLIGHT, STEBO
from ..atomic import DeviceAtomicData


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "rho", "nne", "nnetot", "Te", "TR", "TJ", "W", "kappagrey", "thick",
        "ffegrp", "elem_massfrac", "elem_meanweight", "ion_groundlevelpops",
        "ion_partfuncts", "elements_uppermost_ion", "totalcooling",
        "ion_cooling_contribs", "grey_depth",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class CellState:
    rho: jax.Array  # (ncells,) current density [g/cm3]
    nne: jax.Array  # free electron density [/cm3]
    nnetot: jax.Array  # all-electron density (for Compton) [/cm3]
    Te: jax.Array  # electron temperature [K]
    TR: jax.Array  # radiation temperature [K]
    TJ: jax.Array  # from J estimator [K]
    W: jax.Array  # dilution factor
    kappagrey: jax.Array  # grey opacity [cm2/g]
    thick: jax.Array  # int32: 0 normal, 1 grey, 2 vpkt-thick
    ffegrp: jax.Array  # Fe-group mass fraction
    elem_massfrac: jax.Array  # (ncells, nelements)
    elem_meanweight: jax.Array  # (ncells, nelements) [g]
    ion_groundlevelpops: jax.Array  # (ncells, nions_total)
    ion_partfuncts: jax.Array  # (ncells, nions_total)
    elements_uppermost_ion: jax.Array  # (ncells, nelements) int32
    totalcooling: jax.Array  # (ncells,)
    ion_cooling_contribs: jax.Array  # (ncells, nions_total)
    grey_depth: jax.Array  # (ncells,)

    @property
    def ncells(self) -> int:
        return self.rho.shape[0]

    def replace(self, **kw) -> "CellState":
        return dataclasses.replace(self, **kw)

    def elem_numberdens(self) -> jax.Array:
        """(ncells, nelements) [/cm3] (reference: grid.h get_elem_numberdens)."""
        return self.elem_massfrac * self.rho[:, None] / self.elem_meanweight


def init_cellstate(
    dad: DeviceAtomicData,
    ncells: int,
    rho_tmin: np.ndarray,
    ffegrp: np.ndarray,
    mintemp: float,
    maxtemp: float,
) -> CellState:
    nelem = dad.nelements
    nions = dad.nions_total
    return CellState(
        rho=jnp.asarray(rho_tmin),
        nne=jnp.zeros(ncells),
        nnetot=jnp.zeros(ncells),
        Te=jnp.full(ncells, mintemp),
        TR=jnp.full(ncells, mintemp),
        TJ=jnp.full(ncells, mintemp),
        W=jnp.ones(ncells),
        kappagrey=jnp.zeros(ncells),
        thick=jnp.zeros(ncells, jnp.int32),
        ffegrp=jnp.asarray(ffegrp),
        elem_massfrac=jnp.zeros((ncells, nelem)),
        elem_meanweight=jnp.broadcast_to(dad.elem_meanweight_init, (ncells, nelem)),
        ion_groundlevelpops=jnp.zeros((ncells, nions)),
        ion_partfuncts=jnp.ones((ncells, nions)),
        elements_uppermost_ion=jnp.broadcast_to(dad.elem_nions - 1, (ncells, nelem)).astype(jnp.int32),
        totalcooling=jnp.full(ncells, -1.0),
        ion_cooling_contribs=jnp.zeros((ncells, nions)),
        grey_depth=jnp.zeros(ncells),
    )


def assign_initial_temperatures(
    cells: CellState, rho_tmin, decayedenergy_per_mass, tmin: float, tstart: float,
    mintemp: float, maxtemp: float,
) -> CellState:
    """Trapped-radiation LTE initial temperature estimate
    (reference: grid.cc:918-965)."""
    t_initial = (
        CLIGHT / 4.0 / STEBO * (tmin / tstart) ** 3 * rho_tmin * decayedenergy_per_mass
    ) ** 0.25
    t_initial = jnp.clip(t_initial, mintemp, maxtemp)
    return cells.replace(
        Te=t_initial, TJ=t_initial, TR=t_initial,
        W=jnp.ones_like(t_initial), thick=jnp.zeros_like(cells.thick),
    )


def calculate_nnetot(cells: CellState, dad: DeviceAtomicData) -> jax.Array:
    """nnetot = sum_elements n_element * Z (reference: decay.cc:1220-1227)."""
    return jnp.sum(cells.elem_numberdens() * dad.elem_z[None, :], axis=1)
