"""Non-thermal electron degradation: the Spencer-Fano solver.

TPU-native rebuild of the reference non-thermal machinery (reference:
nonthermal.cc:2391-2541 solve_spencerfano, 1785-1833 sfmatrix_add_excitation,
1835-1940 sfmatrix_add_ionization, 933-948 electron_loss_rate, 955-973
xs_impactionization (Younger 1981), 1355-1408 get_xs_excitation_vector,
1060-1095 calculate_frac_heating, 1157-1168 frac_ionization per shell,
1225-1330 calculate_eff_ionpot_auger_rates, 1340-1349
nt_ionization_ratecoeff_sf).

Design: the reference builds and LU-solves one SFPTS x SFPTS upper-triangular
system per cell with GSL. Here the system is built for ALL cells at once:

- the excitation term has banded structure M[i, j] += sum_t A_t[j] 1[j-i <
  eps_t/dE], which contracts into a single (ntrans) x (energy, band) MXU
  matmul with a fractional band indicator that reproduces the reference's
  partial-bin endpoint exactly;
- the ionisation term is a lax.scan over collion.txt shells of closed-form
  (S, S) updates;
- the solve is one batched triangular solve over the cell axis.

Differences from the reference (documented): the Lotz cross-section fallback
for A<0 shells and multi-Auger-electron emission are not yet implemented
(prob_num_auger[0] = 1 equivalent); the third (E < SF_EMIN) term of
calculate_frac_heating is omitted and frac_heating is clamped so the three
fractions sum to one.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..atomic import DeviceAtomicData
from ..constants import EV, H, ME, PI, QE, EULERGAMMA

A_NAUGHT_SQUARED = 2.800285203e-17  # Bohr radius squared [cm^2]
H_IONPOT = 13.5979996 * EV


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "shell_ion", "shell_ionpot_ev", "shell_a", "shell_b", "shell_c", "shell_d",
        "exc_lower", "exc_eps_ev", "exc_collstr", "exc_osc", "exc_forbidden",
        "exc_glower",
    ],
    meta_fields=["sf_points", "sf_emin", "sf_emax", "nshells", "nexc"],
)
@dataclasses.dataclass(frozen=True)
class NonthermalData:
    # impact-ionisation shells from collion.txt matched to included ions
    shell_ion: jax.Array  # (nshells,) ion index into dad arrays
    shell_ionpot_ev: jax.Array  # (nshells,)
    shell_a: jax.Array
    shell_b: jax.Array
    shell_c: jax.Array
    shell_d: jax.Array
    # excitation transitions (the frequency-sorted linelist re-used)
    exc_lower: jax.Array  # (nexc,) unique lower level
    exc_eps_ev: jax.Array  # (nexc,) transition energy [eV]
    exc_collstr: jax.Array
    exc_osc: jax.Array
    exc_forbidden: jax.Array
    exc_glower: jax.Array
    sf_points: int
    sf_emin: float
    sf_emax: float
    nshells: int
    nexc: int

    @property
    def delta_e(self) -> float:
        return (self.sf_emax - self.sf_emin) / (self.sf_points - 1)

    def engrid(self):
        return self.sf_emin + jnp.arange(self.sf_points) * self.delta_e


def read_collion(path: str):
    """Parse collion.txt (reference: nonthermal.cc:598-660 read_collion_data).

    Format: count line, then rows 'Z ionstage n l ionpot_ev A B C D'."""
    rows = []
    with open(path) as f:
        f.readline()
        for line in f:
            parts = line.split()
            if len(parts) < 9:
                continue
            z, ionstage, n, l = int(parts[0]), int(parts[1]), int(parts[2]), int(parts[3])
            ionpot, a, b, c, d = (float(x) for x in parts[4:9])
            rows.append((z, ionstage, n, l, ionpot, a, b, c, d))
    return rows


def build_nonthermal_data(
    ad, dad: DeviceAtomicData, datadir: str,
    sf_points: int = 256, sf_emin: float = 0.1, sf_emax: float = 16000.0,
) -> NonthermalData:
    """Match collion shells to the included ions and collect the excitation
    transition table (host, once per run)."""
    rows = read_collion(f"{datadir}/collion.txt")
    ion_z = np.asarray(dad.ion_element)  # element index per ion
    elem_z = np.asarray(ad.elem_z)
    ion_stage = np.asarray(dad.ion_stage)
    ion_by_zstage = {}
    for i in range(dad.nions_total):
        ion_by_zstage[(int(elem_z[ion_z[i]]), int(ion_stage[i]))] = i

    sh = [r for r in rows
          if (r[0], r[1]) in ion_by_zstage and r[4] >= sf_emin and r[5] >= 0]
    nshells = len(sh)
    shell_ion = np.array([ion_by_zstage[(r[0], r[1])] for r in sh], np.int32)
    arr = np.array([[r[4], r[5], r[6], r[7], r[8]] for r in sh], np.float64) \
        if sh else np.zeros((0, 5))

    # excitation transitions: the up entries of the flat transition list
    is_up = ~np.asarray(dad.trans_is_down)
    owner = np.asarray(dad.trans_owner)[is_up]
    target_inion = np.asarray(dad.trans_target)[is_up]
    level_ion = np.asarray(dad.level_ion)
    ion_level_start = np.asarray(dad.ion_level_start)
    level_energy = np.asarray(dad.level_energy)
    target = ion_level_start[level_ion[owner]] + target_inion
    eps_ev = (level_energy[target] - level_energy[owner]) / EV
    coll_str = np.asarray(dad.trans_coll_str)[is_up]
    forbidden = np.asarray(dad.trans_forbidden)[is_up].astype(bool)
    osc = np.asarray(dad.trans_osc_strength)[is_up]
    keep = eps_ev >= sf_emin
    lower = owner[keep]
    g_lower = np.asarray(dad.level_g)[lower]
    f64 = lambda x: jnp.asarray(np.asarray(x, np.float64))

    return NonthermalData(
        shell_ion=jnp.asarray(shell_ion),
        shell_ionpot_ev=f64(arr[:, 0]),
        shell_a=f64(arr[:, 1]), shell_b=f64(arr[:, 2]),
        shell_c=f64(arr[:, 3]), shell_d=f64(arr[:, 4]),
        exc_lower=jnp.asarray(lower.astype(np.int32)),
        exc_eps_ev=f64(eps_ev[keep]),
        exc_collstr=f64(coll_str[keep]),
        exc_osc=f64(osc[keep]),
        exc_forbidden=jnp.asarray(forbidden[keep]),
        exc_glower=f64(g_lower),
        sf_points=sf_points, sf_emin=sf_emin, sf_emax=sf_emax,
        nshells=nshells, nexc=int(keep.sum()),
    )


def electron_loss_rate_ev(energy_ev, nne):
    """Electron energy-loss rate / EV (reference: nonthermal.cc:933-948)."""
    energy = energy_ev * EV
    omegap = jnp.sqrt(4 * PI * nne * QE**2 / ME)
    zetae = H * omegap / 2 / PI
    highe = 2 * PI * QE**4 / energy * jnp.log(2 * energy / zetae)
    v = jnp.sqrt(2 * energy / jnp.asarray(ME, energy.dtype))
    lowe = 2 * PI * QE**4 / energy * jnp.log(
        ME * v**3 / (EULERGAMMA * QE**2 * omegap)
    )
    return nne * jnp.where(energy > 14 * EV, highe, lowe) / EV


def xs_impactionization(engrid_ev, ionpot_ev, a, b, c, d):
    """Younger 1981 fit (reference: nonthermal.cc:955-973). (S,) per shell."""
    u = engrid_ev / ionpot_ev
    safe_u = jnp.maximum(u, 1.0 + 1e-10)
    xs = 1e-14 * (
        a * (1 - 1 / safe_u) + b * (1 - 1 / safe_u) ** 2
        + c * jnp.log(safe_u) + d * jnp.log(safe_u) / safe_u
    ) / (safe_u * ionpot_ev**2)
    return jnp.where(u > 1.0, jnp.maximum(xs, 0.0), 0.0)


def xs_excitation_batch(ntd: NonthermalData):
    """(nexc, S) excitation cross sections (reference: nonthermal.cc:1355-1408).

    coll_str >= 0: Li+2012 eq. 11; permitted dipole: Mewe 1972 van-Regemorter
    with g_bar = 0.28 ln U + 0.15; forbidden without coll_str: zero."""
    en = ntd.engrid()[None, :]  # (1, S) in eV
    eps = ntd.exc_eps_ev[:, None]  # (nexc, 1)
    above = en >= eps
    # collision-strength branch
    cs = (H_IONPOT / (en * EV)) ** 2 / ntd.exc_glower[:, None] \
        * ntd.exc_collstr[:, None] * PI * A_NAUGHT_SQUARED
    # Mewe permitted branch
    prefactor = 45.585750051  # 8 pi^2 / sqrt(3)
    constantfactor = eps * prefactor * A_NAUGHT_SQUARED \
        * (H_IONPOT / (eps * EV)) ** 2 * ntd.exc_osc[:, None]
    g_bar = 0.28 * jnp.log(jnp.maximum(en / eps, 1.0)) + 0.15
    mewe = constantfactor * g_bar / en
    xs = jnp.where(
        ntd.exc_collstr[:, None] >= 0, cs,
        jnp.where(~ntd.exc_forbidden[:, None], jnp.maximum(mewe, 0.0), 0.0),
    )
    return jnp.where(above, xs, 0.0)


def solve_spencerfano_cells(
    ntd: NonthermalData,
    dad: DeviceAtomicData,
    levelpops: jax.Array,  # (ncells, nlevels)
    nnion_cells: jax.Array,  # (ncells, nions)
    nne: jax.Array,  # (ncells,)
):
    """Solve the Spencer-Fano equation for every cell.

    Returns dict with y (ncells, S) [the degradation spectrum], frac_heating,
    frac_ionization, frac_excitation (ncells,), frac_ion_by_ion and
    eff_ionpot (ncells, nions) [erg]."""
    S = ntd.sf_points
    dtype = nne.dtype
    de = jnp.asarray(ntd.delta_e, dtype)
    en = ntd.engrid().astype(dtype)  # (S,) eV
    ncells = nne.shape[0]
    nions = dad.nions_total
    nniontot = jnp.maximum(jnp.sum(nnion_cells, axis=1), 1e-300)

    # source: spread over the top ~3.3% of the grid (nonthermal.cc:108-139)
    spread_pts = int(S * 0.03333) + 1
    src = np.zeros(S)
    src[S - spread_pts:] = 1.0 / (spread_pts * float(ntd.delta_e))
    e_init_ev = float(np.sum(src * float(ntd.delta_e) * np.asarray(ntd.sf_emin + np.arange(S) * ntd.delta_e)))
    rhs_np = np.zeros(S)
    acc = 0.0
    for i in range(S - 1, -1, -1):
        rhs_np[i] = acc * float(ntd.delta_e)
        acc += src[i]
    rhs = jnp.asarray(rhs_np, dtype)

    # --- loss term (diagonal) ---
    loss = electron_loss_rate_ev(en[None, :], nne[:, None])  # (ncells, S)

    # --- excitation: banded contraction on the MXU ---
    xs_exc = xs_excitation_batch(ntd).astype(dtype)  # (nexc, S)
    nnlower = levelpops[:, ntd.exc_lower]  # (ncells, nexc)
    widths = ntd.exc_eps_ev.astype(dtype) / de  # (nexc,) band width (fractional)
    dgrid = jnp.arange(S, dtype=dtype)
    wmat = jnp.clip(widths[:, None] - dgrid[None, :], 0.0, 1.0)  # (nexc, S)
    # B[c,t,j] = nnlevel * xs * dE ; C[c,j,d] = sum_t B W
    bmat = nnlower[:, :, None] * xs_exc[None, :, :] * de  # (ncells, nexc, S)
    cmat = jnp.einsum("ctj,td->cjd", bmat, wmat)  # (ncells, S, S)
    ii = jnp.arange(S)
    dmap = jnp.clip(ii[None, :] - ii[:, None], 0, S - 1)  # (S, S): j - i
    # m_exc[c,i,j] = cmat[c, j, j-i] for j >= i
    jidx = jnp.broadcast_to(ii[None, :], (S, S))  # (i, j) -> j
    m_exc = cmat[:, jidx, dmap]  # (ncells, S, S)
    m_exc = jnp.where((ii[None, :] >= ii[:, None])[None, :, :], m_exc, 0.0)

    # --- ionisation shells (nonthermal.cc:1835-1900) ---
    def shell_term(carry, s):
        m_ion = carry
        ion = ntd.shell_ion[s]
        ionpot = ntd.shell_ionpot_ev[s].astype(dtype)
        jconst = 0.6 * ionpot  # get_J (Opal et al. exceptions are H/He/Ne/Ar)
        xs = xs_impactionization(
            en, ionpot, ntd.shell_a[s].astype(dtype), ntd.shell_b[s].astype(dtype),
            ntd.shell_c[s].astype(dtype), ntd.shell_d[s].astype(dtype),
        )  # (S,)
        nnion_s = nnion_cells[:, ion]  # (ncells,)
        eps_upper = jnp.minimum((en + ionpot) / 2, en)  # (S,) at E' = en[j]
        int_upper = jnp.arctan((eps_upper - ionpot) / jconst)
        pref = xs / jnp.maximum(jnp.arctan((en - ionpot) / 2 / jconst), 1e-300)
        e_i = en[:, None]
        e_j = en[None, :]
        upper_j = int_upper[None, :]
        # first integral: epsilon_lower = max(E'-E, I)
        int_low1 = jnp.arctan((jnp.maximum(e_j - e_i, ionpot) - ionpot) / jconst)
        t1 = jnp.where(
            (e_j >= e_i) & (int_low1 <= upper_j) & (xs[None, :] > 0),
            pref[None, :] * (upper_j - int_low1) * de, 0.0,
        )
        # second integral: epsilon_lower = E + I -> atan(E/J); E' >= 2E + I
        int_low2 = jnp.arctan(e_i / jconst)
        t2 = jnp.where(
            (e_j >= 2 * e_i + ionpot) & (int_low2 <= upper_j) & (xs[None, :] > 0),
            pref[None, :] * (upper_j - int_low2) * de, 0.0,
        )
        contrib = (t1 - t2)[None, :, :] * nnion_s[:, None, None]
        return m_ion + contrib, None

    if ntd.nshells > 0:
        m_ion, _ = jax.lax.scan(
            shell_term, jnp.zeros((ncells, S, S), dtype), jnp.arange(ntd.nshells)
        )
    else:
        m_ion = jnp.zeros((ncells, S, S), dtype)

    eye = jnp.eye(S, dtype=dtype)
    sfmat = loss[:, :, None] * eye[None, :, :] + m_exc + m_ion
    y = jax.scipy.linalg.solve_triangular(
        sfmat, jnp.broadcast_to(rhs, (ncells, S)), lower=False
    )  # (ncells, S)

    # --- analysis (nonthermal.cc:1060-1330) ---
    # per-shell ionisation fractions
    if ntd.nshells > 0:
        xs_all = jax.vmap(
            lambda s: xs_impactionization(
                en, ntd.shell_ionpot_ev[s].astype(dtype),
                ntd.shell_a[s].astype(dtype), ntd.shell_b[s].astype(dtype),
                ntd.shell_c[s].astype(dtype), ntd.shell_d[s].astype(dtype),
            )
        )(jnp.arange(ntd.nshells))  # (nshells, S)
        ydotxs = jnp.einsum("cs,ks->ck", y, xs_all) * de  # (ncells, nshells)
        nnion_sh = nnion_cells[:, ntd.shell_ion]  # (ncells, nshells)
        frac_sh = nnion_sh * ntd.shell_ionpot_ev[None, :].astype(dtype) * ydotxs / e_init_ev
        frac_ion_by_ion = jnp.zeros((ncells, nions), dtype).at[:, ntd.shell_ion].add(frac_sh)
        eta_over_pot = jnp.zeros((ncells, nions), dtype).at[:, ntd.shell_ion].add(
            frac_sh / (ntd.shell_ionpot_ev[None, :].astype(dtype) * EV)
        )
        x_ion = nnion_cells / nniontot[:, None]
        eff_ionpot = jnp.where(eta_over_pot > 0, x_ion / jnp.maximum(eta_over_pot, 1e-300), 0.0)
        # the top ion of each element cannot be further ionised
        elem = dad.ion_element
        if nions > 1:
            top_mask = jnp.concatenate(
                [elem[:-1] != elem[1:], jnp.ones((1,), bool)]
            )
        else:
            top_mask = jnp.ones((nions,), bool)
        frac_ion_by_ion = jnp.where(top_mask[None, :], 0.0, frac_ion_by_ion)
        frac_ionization = jnp.sum(frac_ion_by_ion, axis=1)
    else:
        frac_ion_by_ion = jnp.zeros((ncells, nions), dtype)
        eff_ionpot = jnp.zeros((ncells, nions), dtype)
        frac_ionization = jnp.zeros((ncells,), dtype)

    # excitation fraction: sum_t n_t eps_t integral(xs_t y) / E_init
    ydotxs_exc = jnp.einsum("cs,ts->ct", y, xs_exc) * de  # (ncells, nexc)
    frac_excitation = jnp.sum(
        nnlower * ntd.exc_eps_ev[None, :].astype(dtype) * ydotxs_exc, axis=1
    ) / e_init_ev

    frac_heating = jnp.clip(1.0 - frac_ionization - frac_excitation, 0.0, 1.0)

    return dict(
        y=y,
        frac_heating=frac_heating,
        frac_ionization=jnp.clip(frac_ionization, 0.0, 1.0),
        frac_excitation=jnp.clip(frac_excitation, 0.0, 1.0),
        frac_ion_by_ion=frac_ion_by_ion,
        eff_ionpot=eff_ionpot,
    )


def nt_ionization_ratecoeff(dep_rate_density, nniontot, eff_ionpot):
    """Gamma_NT per ion [1/s] (reference: nonthermal.cc:1340-1349)."""
    return jnp.where(
        (eff_ionpot > 0) & (dep_rate_density[:, None] > 0),
        dep_rate_density[:, None] / jnp.maximum(nniontot, 1e-300)[:, None]
        / jnp.maximum(eff_ionpot, 1e-300),
        0.0,
    )
