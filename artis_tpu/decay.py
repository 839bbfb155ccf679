"""Nuclear decay network: nuclides, decay paths, Bateman chains, energy release.

TPU-native rebuild of the reference decay module (reference: decay.cc:840-999
init_nuclides, decay.cc:354-429 find_decaypaths, decay.cc:503-537
calculate_decaychain, decay.cc:544-605 get_nuc_massfrac, decay.cc:1035-1061
setup_decaypath_energy_per_mass, decay.cc:1157-1260 update_abundances,
decay.cc:1311-1402 setup_radioactive_pellet).

Design: the network is enumerated once at setup on the host (NumPy, float64)
into *padded* per-path arrays (lambdas, branch products, end-nuclide energies),
so every per-timestep quantity — mass fractions, decay power, energy release
between times — becomes a vectorised Bateman evaluation over (npaths,) followed
by a (ncells, npaths) contraction against the initial-abundance matrix. The
reference's per-cell per-path double loops (decay.cc:1049-1057) disappear.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from .constants import DAY, MEV, MH

# decay types (reference: decay.h:14-25)
DECAYTYPE_ALPHA = 0
DECAYTYPE_ELECTRONCAPTURE = 1
DECAYTYPE_BETAPLUS = 2
DECAYTYPE_BETAMINUS = 3
DECAYTYPE_NONE = 4
DECAYTYPE_COUNT = 5
ALL_DECAYTYPES = (
    DECAYTYPE_ALPHA,
    DECAYTYPE_ELECTRONCAPTURE,
    DECAYTYPE_BETAPLUS,
    DECAYTYPE_BETAMINUS,
    DECAYTYPE_NONE,
)


def nucmass(z: int, a) -> float:
    """Nuclide mass [g] (reference: decay.h:52)."""
    return np.asarray(a) * MH


def decay_daughter_z(z_parent: int, decaytype: int) -> int:
    """(reference: decay.cc:66-88)"""
    if decaytype == DECAYTYPE_ALPHA:
        return z_parent - 2
    if decaytype in (DECAYTYPE_BETAPLUS, DECAYTYPE_ELECTRONCAPTURE):
        return z_parent - 1
    if decaytype == DECAYTYPE_BETAMINUS:
        return z_parent + 1
    return -1


def decay_daughter_a(a_parent: int, decaytype: int) -> int:
    """(reference: decay.cc:91-112)"""
    if decaytype == DECAYTYPE_ALPHA:
        return a_parent - 4
    if decaytype in (DECAYTYPE_BETAPLUS, DECAYTYPE_ELECTRONCAPTURE, DECAYTYPE_BETAMINUS):
        return a_parent
    return -1


@dataclasses.dataclass
class Nuclide:
    z: int
    a: int
    meanlife: float = -1.0  # [s]; <=0 means stable
    endecay_electron: float = 0.0  # [erg] per beta- decay
    endecay_positron: float = 0.0  # [erg] per beta+ decay
    endecay_gamma: float = 0.0  # [erg] per decay in gammas
    endecay_alpha: float = 0.0  # [erg] per alpha decay
    endecay_q: tuple = (0.0,) * DECAYTYPE_COUNT
    branchprobs: tuple = (0.0,) * DECAYTYPE_COUNT


def _standard_nuclides() -> list[Nuclide]:
    """The built-in Type-Ia network (reference: decay.cc:843-878)."""

    def mk(z, a, meanlife, **kw):
        n = Nuclide(z=z, a=a, meanlife=meanlife)
        bp = [0.0] * DECAYTYPE_COUNT
        eq = [0.0] * DECAYTYPE_COUNT
        for k, v in kw.items():
            if k.startswith("bp_"):
                bp[int(k[3:])] = v
            elif k.startswith("eq_"):
                eq[int(k[3:])] = v
            else:
                setattr(n, k, v)
        n.branchprobs = tuple(bp)
        n.endecay_q = tuple(eq)
        return n

    return [
        mk(28, 57, 51.36 * 60, endecay_positron=0.354 * MEV,
           **{f"bp_{DECAYTYPE_BETAPLUS}": 0.436, f"bp_{DECAYTYPE_ELECTRONCAPTURE}": 1 - 0.436}),
        mk(28, 56, 8.80 * DAY, **{f"bp_{DECAYTYPE_ELECTRONCAPTURE}": 1.0}),
        mk(27, 56, 113.7 * DAY, endecay_positron=0.63 * MEV,
           **{f"bp_{DECAYTYPE_BETAPLUS}": 0.19, f"bp_{DECAYTYPE_ELECTRONCAPTURE}": 0.81}),
        mk(24, 48, 1.29602 * DAY, **{f"bp_{DECAYTYPE_ELECTRONCAPTURE}": 1.0}),
        mk(23, 48, 23.0442 * DAY, endecay_positron=0.290 * MEV * 0.499,
           **{f"bp_{DECAYTYPE_BETAPLUS}": 1.0}),
        mk(27, 57, 392.03 * DAY, **{f"bp_{DECAYTYPE_ELECTRONCAPTURE}": 1.0}),
        mk(26, 52, 0.497429 * DAY, **{f"bp_{DECAYTYPE_ELECTRONCAPTURE}": 1.0}),
        mk(25, 52, 0.0211395 * DAY, **{f"bp_{DECAYTYPE_ELECTRONCAPTURE}": 1.0}),
    ]


def nucdecayenergyparticle(nuc: Nuclide, decaytype: int) -> float:
    """Kinetic particle energy per decay (reference: decay.cc:195-216)."""
    if decaytype == DECAYTYPE_ALPHA:
        return nuc.endecay_alpha
    if decaytype == DECAYTYPE_BETAPLUS:
        return nuc.endecay_positron
    if decaytype == DECAYTYPE_BETAMINUS:
        return nuc.endecay_electron
    return 0.0


def nucdecayenergy(nuc: Nuclide, decaytype: int) -> float:
    """Gamma + particle energy per decay (reference: decay.cc:230-234)."""
    return nuc.endecay_gamma + nucdecayenergyparticle(nuc, decaytype)


@dataclasses.dataclass
class DecayData:
    """The enumerated decay network with padded per-path arrays."""

    nuclides: list  # list[Nuclide]
    nucindex_of_za: dict  # (z, a) -> nucindex

    # per-path padded arrays; L = max path length
    npaths: int
    maxlen: int
    path_len: np.ndarray  # (npaths,)
    path_nucindex: np.ndarray  # (npaths, L) int, -1 padded
    path_z: np.ndarray  # (npaths, L)
    path_a: np.ndarray  # (npaths, L)
    path_decaytype: np.ndarray  # (npaths, L)
    path_lambdas: np.ndarray  # (npaths, L+1); entry [len] is the 0 sink
    path_branchproduct: np.ndarray  # (npaths,)
    path_endecay_last: np.ndarray  # (npaths,) energy per end-of-chain decay [erg]
    path_top_nucindex: np.ndarray  # (npaths,)
    path_end_nucindex: np.ndarray  # (npaths,)
    path_end_decaytype: np.ndarray  # (npaths,)
    path_final_daughter_z: np.ndarray  # (npaths,)
    path_final_daughter_a: np.ndarray  # (npaths,)

    # per-nuclide flat arrays
    nuc_z: np.ndarray
    nuc_a: np.ndarray
    nuc_meanlife: np.ndarray
    nuc_endecay_gamma: np.ndarray
    nuc_branchprobs: np.ndarray  # (nnuc, DECAYTYPE_COUNT)
    nuc_endecay_particle: np.ndarray  # (nnuc, DECAYTYPE_COUNT)
    nuc_endecay_q: np.ndarray  # (nnuc, DECAYTYPE_COUNT)

    t_model: float = 0.0  # [s] set by caller after model read

    def get_nucindex(self, z: int, a: int) -> int:
        return self.nucindex_of_za.get((z, a), -1)

    @property
    def num_nuclides(self) -> int:
        return len(self.nuclides)

    def set_nucdecayenergygamma(self, nucindex: int, value: float) -> None:
        """(reference: decay.cc:804) — used by gamma-line data loading."""
        self.nuclides[nucindex].endecay_gamma = value
        self.nuc_endecay_gamma[nucindex] = value
        self.refresh_path_energies()

    def refresh_path_energies(self) -> None:
        """Recompute per-path end-decay energies after endecay_gamma changes.

        The reference looks this up dynamically (decay.cc:258-262); our padded
        table must be refreshed whenever gamma energies are loaded."""
        end = self.path_end_nucindex
        if len(end):
            self.path_endecay_last[:] = (
                self.nuc_endecay_gamma[end]
                + self.nuc_endecay_particle[end, self.path_end_decaytype]
            )


def _read_betaminus(path: str) -> list[Nuclide]:
    """Parse betaminusdecays.txt: A Z Q[MeV] Egamma[MeV] Eelec[MeV] Enu[MeV]
    tau[s] (reference: decay.cc:899-922)."""
    out = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            t = s.split()
            a, z = int(t[0]), int(t[1])
            q_mev, e_gamma, e_elec = float(t[2]), float(t[3]), float(t[4])
            tau_sec = float(t[6])
            if q_mev > 0:
                bp = [0.0] * DECAYTYPE_COUNT
                bp[DECAYTYPE_BETAMINUS] = 1.0
                eq = [0.0] * DECAYTYPE_COUNT
                eq[DECAYTYPE_BETAMINUS] = q_mev * MEV
                out.append(
                    Nuclide(z=z, a=a, meanlife=tau_sec, endecay_electron=e_elec * MEV,
                            endecay_gamma=e_gamma * MEV, branchprobs=tuple(bp), endecay_q=tuple(eq))
                )
    return out


def _apply_alphadecays(path: str, nuclides: list, index: dict) -> None:
    """Parse alphadecays.txt: A Z br_alpha br_beta halflife[s] Qa[MeV] Qb[MeV]
    Ealpha Egamma Ebeta [MeV] (reference: decay.cc:924-958)."""
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            t = s.split()
            a, z = int(t[0]), int(t[1])
            branch_alpha, branch_beta = float(t[2]), float(t[3])
            halflife = float(t[4])
            q_alpha, q_beta = float(t[5]), float(t[6])
            e_alpha, e_gamma = float(t[7]), float(t[8])
            if (branch_alpha > 0 or branch_beta > 0) and halflife > 0:
                tau_sec = halflife / math.log(2)
                if (z, a) in index:
                    nuc = nuclides[index[(z, a)]]
                else:
                    nuc = Nuclide(z=z, a=a, meanlife=tau_sec, endecay_gamma=e_gamma * MEV)
                    index[(z, a)] = len(nuclides)
                    nuclides.append(nuc)
                nuc.endecay_alpha = e_alpha * MEV
                bp = list(nuc.branchprobs)
                eq = list(nuc.endecay_q)
                bp[DECAYTYPE_BETAMINUS] = branch_beta
                eq[DECAYTYPE_BETAMINUS] = q_beta * MEV
                bp[DECAYTYPE_ALPHA] = branch_alpha
                eq[DECAYTYPE_ALPHA] = q_alpha * MEV
                nuc.branchprobs = tuple(bp)
                nuc.endecay_q = tuple(eq)


def init_nuclides(custom_zlist, custom_alist, datadir: str | None = None) -> DecayData:
    """Build the nuclide list + all decay paths (reference: decay.cc:840-999)."""
    nuclides = _standard_nuclides()
    standard = [(n.z, n.a) for n in nuclides]
    index = {(n.z, n.a): i for i, n in enumerate(nuclides)}

    custom_pairs = [(int(z), int(a)) for z, a in zip(custom_zlist, custom_alist) if z >= 0 and a >= 0]
    use_custom = any(p not in index for p in custom_pairs)

    if use_custom:
        assert datadir is not None, "custom nuclides require betaminusdecays.txt/alphadecays.txt"
        for nuc in _read_betaminus(f"{datadir}/betaminusdecays.txt"):
            assert (nuc.z, nuc.a) not in index
            index[(nuc.z, nuc.a)] = len(nuclides)
            nuclides.append(nuc)
        _apply_alphadecays(f"{datadir}/alphadecays.txt", nuclides, index)

    # any extra custom nuclides not in the decay files: stable placeholders
    for z, a in custom_pairs:
        if (z, a) not in index:
            index[(z, a)] = len(nuclides)
            nuclides.append(Nuclide(z=z, a=a, meanlife=-1))

    # --- enumerate decay paths (reference: decay.cc:354-429) ---
    paths: list[dict] = []

    def extend(path):
        """depth-first extension to all descendants (reference: decay.cc:322-352)."""
        zlast, alast, dtlast = path["z"][-1], path["a"][-1], path["dt"][-1]
        dz, da = decay_daughter_z(zlast, dtlast), decay_daughter_a(alast, dtlast)
        if (dz, da) in index:
            dnuc = index[(dz, da)]
            for dt2 in ALL_DECAYTYPES:
                if nuclides[dnuc].branchprobs[dt2] == 0.0:
                    continue
                assert (dz, da) not in zip(path["z"], path["a"]), "decay chain loop"
                newpath = {
                    "z": path["z"] + [dz],
                    "a": path["a"] + [da],
                    "nucindex": path["nucindex"] + [dnuc],
                    "dt": path["dt"] + [dt2],
                }
                paths.append(newpath)
                extend(newpath)

    allowed_tops = set(standard) | set(custom_pairs)
    for startidx, nuc in enumerate(nuclides):
        if (nuc.z, nuc.a) not in allowed_tops:
            continue
        for dt in ALL_DECAYTYPES:
            if nuc.branchprobs[dt] == 0.0 or nuc.meanlife <= 0:
                continue
            p = {"z": [nuc.z], "a": [nuc.a], "nucindex": [startidx], "dt": [dt]}
            paths.append(p)
            extend(p)

    # sort: by mass number, then Z, then length (reference: decay.cc:390-407)
    def sortkey(p):
        return (tuple(zip(p["a"], p["z"])), len(p["z"]))

    paths.sort(key=sortkey)

    # filter nuclides not connected to input-specified nuclei
    # (reference: decay.cc:432-473)
    keep = set(standard) | set(custom_pairs)
    for p in paths:
        keep.update(zip(p["z"], p["a"]))
        keep.add(
            (decay_daughter_z(p["z"][-1], p["dt"][-1]), decay_daughter_a(p["a"][-1], p["dt"][-1]))
        )
    newnuclides = [n for n in nuclides if (n.z, n.a) in keep]
    index = {(n.z, n.a): i for i, n in enumerate(newnuclides)}
    nuclides = newnuclides
    for p in paths:
        p["nucindex"] = [index[(z, a)] for z, a in zip(p["z"], p["a"])]

    npaths = len(paths)
    maxlen = max((len(p["z"]) for p in paths), default=1)

    path_len = np.zeros(npaths, dtype=np.int32)
    path_nucindex = np.full((npaths, maxlen), -1, dtype=np.int32)
    path_z = np.zeros((npaths, maxlen), dtype=np.int32)
    path_a = np.zeros((npaths, maxlen), dtype=np.int32)
    path_decaytype = np.full((npaths, maxlen), DECAYTYPE_NONE, dtype=np.int32)
    path_lambdas = np.zeros((npaths, maxlen + 1))
    path_branchproduct = np.zeros(npaths)
    path_endecay_last = np.zeros(npaths)
    path_final_daughter_z = np.zeros(npaths, dtype=np.int32)
    path_final_daughter_a = np.zeros(npaths, dtype=np.int32)

    for i, p in enumerate(paths):
        plen = len(p["z"])
        path_len[i] = plen
        path_nucindex[i, :plen] = p["nucindex"]
        path_z[i, :plen] = p["z"]
        path_a[i, :plen] = p["a"]
        path_decaytype[i, :plen] = p["dt"]
        branchprod = 1.0
        for j, (nucidx, dt) in enumerate(zip(p["nucindex"], p["dt"])):
            ml = nuclides[nucidx].meanlife
            # all but the last nuclide must be unstable (reference: decay.cc:410-412)
            assert ml > 0 or j == plen - 1
            path_lambdas[i, j] = 1.0 / ml if ml > 0 else 0.0
            branchprod *= nuclides[nucidx].branchprobs[dt]
        path_branchproduct[i] = branchprod
        endnuc = nuclides[p["nucindex"][-1]]
        path_endecay_last[i] = nucdecayenergy(endnuc, p["dt"][-1])
        path_final_daughter_z[i] = decay_daughter_z(p["z"][-1], p["dt"][-1])
        path_final_daughter_a[i] = decay_daughter_a(p["a"][-1], p["dt"][-1])

    nnuc = len(nuclides)
    nuc_branchprobs = np.array([n.branchprobs for n in nuclides]) if nnuc else np.zeros((0, 5))
    nuc_endecay_particle = np.array(
        [[nucdecayenergyparticle(n, dt) for dt in range(DECAYTYPE_COUNT)] for n in nuclides]
    ) if nnuc else np.zeros((0, 5))
    nuc_endecay_q = np.array([n.endecay_q for n in nuclides]) if nnuc else np.zeros((0, 5))

    return DecayData(
        nuclides=nuclides,
        nucindex_of_za=index,
        npaths=npaths,
        maxlen=maxlen,
        path_len=path_len,
        path_nucindex=path_nucindex,
        path_z=path_z,
        path_a=path_a,
        path_decaytype=path_decaytype,
        path_lambdas=path_lambdas,
        path_branchproduct=path_branchproduct,
        path_endecay_last=path_endecay_last,
        path_top_nucindex=path_nucindex[:, 0].copy(),
        path_end_nucindex=path_nucindex[np.arange(npaths), path_len - 1].copy()
        if npaths
        else np.zeros(0, dtype=np.int32),
        path_end_decaytype=path_decaytype[np.arange(npaths), path_len - 1].copy()
        if npaths
        else np.zeros(0, dtype=np.int32),
        path_final_daughter_z=path_final_daughter_z,
        path_final_daughter_a=path_final_daughter_a,
        nuc_z=np.array([n.z for n in nuclides], dtype=np.int32),
        nuc_a=np.array([n.a for n in nuclides], dtype=np.int32),
        nuc_meanlife=np.array([n.meanlife for n in nuclides]),
        nuc_endecay_gamma=np.array([n.endecay_gamma for n in nuclides]),
        nuc_branchprobs=nuc_branchprobs,
        nuc_endecay_particle=nuc_endecay_particle,
        nuc_endecay_q=nuc_endecay_q,
    )


def calculate_decaychain_batch(
    lambdas: np.ndarray, num_nuclides: np.ndarray, timediff: float, useexpansionfactor: bool = False
) -> np.ndarray:
    """Vectorised Bateman chain factor for unit initial abundance.

    lambdas: (npaths, L) decay constants, zero-padded beyond num_nuclides[i].
    Returns (npaths,) = lambdaproduct * sum_j w_j(t) / prod_{p!=j}(l_p - l_j)
    (reference: decay.cc:503-537).
    """
    npaths, L = lambdas.shape
    n = np.asarray(num_nuclides)
    jmask = np.arange(L)[None, :] < n[:, None]  # (npaths, L)

    # lambdaproduct over j < n-1
    lprodmask = np.arange(L)[None, :] < (n - 1)[:, None]
    lambdaproduct = np.prod(np.where(lprodmask, lambdas, 1.0), axis=-1)

    # denominators: prod over p != j, p < n of (lambda_p - lambda_j)
    diff = lambdas[:, None, :] - lambdas[:, :, None]  # [i, j, p] = l_p - l_j
    pmask = jmask[:, None, :] & ~np.eye(L, dtype=bool)[None, :, :]
    denom = np.prod(np.where(pmask, diff, 1.0), axis=-1)  # (npaths, L) over p

    if not useexpansionfactor:
        w = np.exp(-lambdas * timediff)
    else:
        # photon-energy expansion weighting (reference: decay.cc:526-529)
        with np.errstate(divide="ignore", invalid="ignore"):
            lt = lambdas * timediff
            w = np.where(
                lambdas > 0,
                (1.0 + 1.0 / np.where(lt != 0, lt, 1.0)) * np.exp(-lt)
                - 1.0 / np.where(lt != 0, lt, 1.0),
                0.0,
            )

    terms = np.where(jmask & (denom != 0), w / np.where(denom != 0, denom, 1.0), 0.0)
    return lambdaproduct * np.sum(terms, axis=-1)


def _top_initabund_per_path(dec: DecayData, initnucmassfrac: np.ndarray) -> np.ndarray:
    """(ncells, npaths): chain-top initial number abundance per unit mass."""
    top = dec.path_top_nucindex
    return initnucmassfrac[:, top] / nucmass(dec.nuc_z[top], dec.nuc_a[top])[None, :]


def endecay_to_tinf_per_ejectamass_at_time(
    dec: DecayData, initnucmassfrac: np.ndarray, time: float
) -> np.ndarray:
    """(ncells, npaths) energy [erg/g] remaining from ``time`` to infinity per
    path (reference: decay.cc:610-638)."""
    t_afterinit = time - dec.t_model
    abund_endplusone = calculate_decaychain_batch(
        dec.path_lambdas, dec.path_len + 1, t_afterinit
    )
    top = _top_initabund_per_path(dec, initnucmassfrac)
    ndecays_remaining = dec.path_branchproduct[None, :] * top * (1.0 - abund_endplusone[None, :])
    return ndecays_remaining * dec.path_endecay_last[None, :]


def setup_decaypath_energy_per_mass(
    dec: DecayData, initnucmassfrac: np.ndarray, time_min_decay: float, tmax: float
) -> np.ndarray:
    """(ncells, npaths) energy [erg/g] released in [time_min_decay, tmax]
    (reference: decay.cc:683-694, 1035-1061)."""
    e_low = endecay_to_tinf_per_ejectamass_at_time(dec, initnucmassfrac, time_min_decay)
    e_high = endecay_to_tinf_per_ejectamass_at_time(dec, initnucmassfrac, tmax)
    endiff = e_low - e_high
    assert np.all(np.isfinite(endiff))
    return np.maximum(endiff, 0.0)


def endecay_t0_to_time_withexpansion(
    dec: DecayData, initnucmassfrac: np.ndarray, tstart: float
) -> np.ndarray:
    """(ncells,) decay energy [erg/g] from t_model to tstart with 1/t photon
    expansion losses — used for initial temperatures
    (reference: decay.cc:1003-1024, grid.cc:918)."""
    factor = calculate_decaychain_batch(
        dec.path_lambdas, dec.path_len + 1, tstart - dec.t_model, useexpansionfactor=True
    )
    top = _top_initabund_per_path(dec, initnucmassfrac)
    chain = dec.path_branchproduct[None, :] * top * factor[None, :] * dec.path_endecay_last[None, :]
    return chain.sum(axis=1)


def get_nuc_massfrac_all(dec: DecayData, initnucmassfrac: np.ndarray, time: float):
    """Mass fraction of every network nuclide in every cell at ``time``.

    Returns (ncells, num_nuclides). Whereas the reference computes one nuclide
    at a time by scanning all paths (decay.cc:544-605), here we evaluate the
    per-path Bateman end-abundance once and scatter-add into end nuclides.
    """
    t_afterinit = time - dec.t_model
    endfactor = calculate_decaychain_batch(dec.path_lambdas, dec.path_len, t_afterinit)
    top = _top_initabund_per_path(dec, initnucmassfrac)  # (ncells, npaths)
    end_nuc = dec.path_end_nucindex
    contrib = (
        dec.path_branchproduct[None, :]
        * top
        * endfactor[None, :]
        * nucmass(dec.nuc_z[end_nuc], dec.nuc_a[end_nuc])[None, :]
    )
    out = np.zeros((initnucmassfrac.shape[0], dec.num_nuclides))
    np.add.at(out.T, end_nuc, contrib.T)
    # stable nuclides in network keep their initial abundance (decay.cc:600-602)
    stable = dec.nuc_meanlife <= 0
    out[:, stable] += initnucmassfrac[:, stable]
    return out


def get_nuc_massfrac_offnetwork(
    dec: DecayData, initnucmassfrac: np.ndarray, time: float, z: int, a: int
) -> np.ndarray:
    """Mass fraction of an off-network (z, a): sum over paths whose final
    daughter is (z, a), evaluated one-past-the-end (reference: decay.cc:567,
    584-594). Also handles the He4 alpha-sink special case (decay.cc:560)."""
    t_afterinit = time - dec.t_model
    is_he4 = z == 2 and a == 4 and (2, 4) not in dec.nucindex_of_za
    if is_he4:
        match = dec.path_end_decaytype == DECAYTYPE_ALPHA
    else:
        match = (dec.path_final_daughter_z == z) & (dec.path_final_daughter_a == a)
    if not match.any():
        return np.zeros(initnucmassfrac.shape[0])
    factor = calculate_decaychain_batch(
        dec.path_lambdas[match], dec.path_len[match] + 1, t_afterinit
    )
    top = _top_initabund_per_path(dec, initnucmassfrac)[:, match]
    contrib = dec.path_branchproduct[None, match] * top * factor[None, :] * nucmass(z, a)
    return contrib.sum(axis=1)


def get_particle_injection_rate(
    dec: DecayData, initnucmassfrac: np.ndarray, t: float, decaytype: int
) -> np.ndarray:
    """(ncells,) kinetic-particle energy release rate [erg/s/g]
    (reference: decay.cc:1073-1095)."""
    massfrac = get_nuc_massfrac_all(dec, initnucmassfrac, t)
    unstable = dec.nuc_meanlife > 0
    en = dec.nuc_endecay_particle[:, decaytype]
    rate = np.where(
        unstable & (en > 0),
        dec.nuc_branchprobs[:, decaytype] * en / np.where(unstable, dec.nuc_meanlife, 1.0)
        / nucmass(dec.nuc_z, dec.nuc_a),
        0.0,
    )
    return massfrac @ rate


def get_gamma_emission_rate(dec: DecayData, initnucmassfrac: np.ndarray, t: float) -> np.ndarray:
    """(ncells,) gamma energy release rate [erg/s/g] (reference: decay.cc:1098-1119)."""
    massfrac = get_nuc_massfrac_all(dec, initnucmassfrac, t)
    unstable = dec.nuc_meanlife > 0
    rate = np.where(
        unstable & (dec.nuc_endecay_gamma > 0),
        dec.nuc_endecay_gamma / np.where(unstable, dec.nuc_meanlife, 1.0)
        / nucmass(dec.nuc_z, dec.nuc_a),
        0.0,
    )
    return massfrac @ rate


def get_qdot(dec: DecayData, initnucmassfrac: np.ndarray, t: float, decaytype: int) -> np.ndarray:
    """(ncells,) total Q-value release rate incl. neutrinos [erg/s/g]
    (reference: decay.cc:1122-1141)."""
    massfrac = get_nuc_massfrac_all(dec, initnucmassfrac, t)
    unstable = dec.nuc_meanlife > 0
    q = dec.nuc_endecay_q[:, decaytype] * dec.nuc_branchprobs[:, decaytype]
    rate = np.where(
        unstable & (q > 0),
        q / np.where(unstable, dec.nuc_meanlife, 1.0) / nucmass(dec.nuc_z, dec.nuc_a),
        0.0,
    )
    return massfrac @ rate


def get_particle_power_pergram(dec: DecayData, initnucmassfrac: np.ndarray,
                               t: float, decaytype: int) -> np.ndarray:
    """(ncells,) kinetic-particle energy release rate [erg/s/g] for one decay
    type (reference: sn3d.cc:113-131 eps_*_ana_power terms)."""
    massfrac = get_nuc_massfrac_all(dec, initnucmassfrac, t)
    unstable = dec.nuc_meanlife > 0
    e_part = dec.nuc_endecay_particle[:, decaytype] * dec.nuc_branchprobs[:, decaytype]
    rate = np.where(
        unstable & (e_part > 0),
        e_part / np.where(unstable, dec.nuc_meanlife, 1.0) / nucmass(dec.nuc_z, dec.nuc_a),
        0.0,
    )
    return massfrac @ rate


def get_global_etot_t0_tinf(dec: DecayData, totmassradionuclide_of_nuc: np.ndarray) -> float:
    """Total energy ever released by the network [erg] (reference: decay.cc:1143-1154)."""
    top = dec.path_top_nucindex
    return float(
        np.sum(
            dec.path_branchproduct
            * totmassradionuclide_of_nuc[top]
            / nucmass(dec.nuc_z[top], dec.nuc_a[top])
            * dec.path_endecay_last
        )
    )


def update_abundances(
    dec: DecayData,
    initnucmassfrac: np.ndarray,
    stable_initabund: np.ndarray,
    init_stable_meannucmass: np.ndarray,
    element_z: np.ndarray,
    t_current: float,
):
    """Elemental mass fractions and mean nuclear weights at ``t_current``.

    stable_initabund: (ncells, nelements) untracked-stable mass fractions.
    Returns (elem_massfrac (ncells, nelements), elem_meanweight).
    (reference: decay.cc:1157-1260)
    """
    ncells = initnucmassfrac.shape[0]
    nelements = len(element_z)
    massfrac_net = get_nuc_massfrac_all(dec, initnucmassfrac, t_current)

    elem_massfrac = np.zeros((ncells, nelements))
    elem_invmass = np.zeros((ncells, nelements))

    for el in range(nelements):
        zel = int(element_z[el])
        a_done = set()
        for nucindex in range(dec.num_nuclides):
            nz, na = int(dec.nuc_z[nucindex]), int(dec.nuc_a[nucindex])
            if nz == zel:
                if na not in a_done:
                    a_done.add(na)
                    mf = massfrac_net[:, nucindex]
                    elem_massfrac[:, el] += mf
                    elem_invmass[:, el] += mf / nucmass(zel, na)
            else:
                for dt in ALL_DECAYTYPES:
                    dz, da = decay_daughter_z(nz, dt), decay_daughter_a(na, dt)
                    if (
                        dz == zel
                        and (dz, da) not in dec.nucindex_of_za
                        and dec.nuc_branchprobs[nucindex, dt] > 0
                        and da not in a_done
                    ):
                        a_done.add(da)
                        mf = get_nuc_massfrac_offnetwork(dec, initnucmassfrac, t_current, dz, da)
                        elem_massfrac[:, el] += mf
                        elem_invmass[:, el] += mf / nucmass(dz, da)
        if zel == 2 and (2, 4) not in dec.nucindex_of_za and 4 not in a_done:
            mf = get_nuc_massfrac_offnetwork(dec, initnucmassfrac, t_current, 2, 4)
            elem_massfrac[:, el] += mf
            elem_invmass[:, el] += mf / nucmass(2, 4)

        elem_massfrac[:, el] += stable_initabund[:, el]
        elem_invmass[:, el] += stable_initabund[:, el] / init_stable_meannucmass[el]

    with np.errstate(divide="ignore", invalid="ignore"):
        meanweight = np.where(
            elem_invmass > 0, elem_massfrac / np.where(elem_invmass > 0, elem_invmass, 1.0),
            init_stable_meannucmass[None, :],
        )
    return elem_massfrac, meanweight
