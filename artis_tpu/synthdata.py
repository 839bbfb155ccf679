"""Synthetic atomic datasets and demo run directories.

Used for tests, benchmarks, and the compile-check entry points (the real
atomic datasets are downloaded tarballs in the reference CI, unavailable in a
zero-egress environment). File formats follow the reference parsers
(input.cc:912-1255, 228-327).
"""

import numpy as np


def write_synthetic_atomicdata(
    folder,
    elements=((26, 3), (27, 2)),  # (Z, nions)
    nlevels_per_ion=5,
    nphixspoints=20,
    nphixsnuincrement=0.1,
    seed=42,
    nphixs_levels=2,  # lower levels per ion pair given phixs tables
    trans_lo_max=None,  # cap the lower level of written transitions
):
    rng = np.random.default_rng(seed)
    folder = str(folder)

    # compositiondata.txt
    with open(f"{folder}/compositiondata.txt", "w") as f:
        f.write(f"{len(elements)}\n0\n0\n")
        for z, nions in elements:
            mass = 2.0 * z  # rough A ~ 2Z
            f.write(f"{z} {nions} 1 {nions} -1 0.0 {mass}\n")

    # adata.txt: per-(Z, ionstage) blocks; also include an extra ionstage
    # beyond uppermost to exercise skipping
    with open(f"{folder}/adata.txt", "w") as f:
        for z, nions in elements:
            for ionstage in range(1, nions + 2):  # one extra block to skip at end
                nlev = nlevels_per_ion if ionstage <= nions else 2
                ionpot_ev = 7.0 + 5.0 * ionstage + 0.1 * z
                f.write(f"{z} {ionstage} {nlev} {ionpot_ev:.4f}\n")
                # random (but deterministic) level energies below the
                # ionpot: regular ladder spacings make many transitions
                # exactly or nearly degenerate, which creates unphysical
                # zero-distance resonance-interlocking loops that real
                # atomic data cannot produce
                fracs = np.sort(rng.uniform(0.08, 0.93, nlev - 1))
                for lev in range(1, nlev + 1):
                    energy = 0.0 if lev == 1 else ionpot_ev * fracs[lev - 2]
                    g = 2.0 * lev  # distinct stat weights
                    f.write(f"{lev} {energy:.8f} {g:.1f} {max(lev - 1, 0)}\n")

    # transitiondata.txt: same block order; downward transitions with random A
    with open(f"{folder}/transitiondata.txt", "w") as f:
        for z, nions in elements:
            for ionstage in range(1, nions + 2):
                nlev = nlevels_per_ion if ionstage <= nions else 2
                rows = []
                lo_hi = nlev if trans_lo_max is None else min(
                    trans_lo_max, nlev)
                for lo in range(1, lo_hi + 1):
                    for up in range(lo + 1, nlev + 1):
                        A = 10.0 ** rng.uniform(4, 8)
                        coll_str = -1.0
                        forbidden = 0
                        rows.append(f"{lo} {up} {A:.4e} {coll_str} {forbidden}")
                f.write(f"{z} {ionstage} {len(rows)}\n")
                f.write("\n".join(rows) + "\n")

    # phixsdata_v2.txt: ground + excited-level tables for each non-top ion
    with open(f"{folder}/phixsdata_v2.txt", "w") as f:
        f.write(f"{nphixspoints}\n{nphixsnuincrement}\n")
        for z, nions in elements:
            for ionstage in range(1, nions):  # lower ion of each pair
                nlo = min(max(nphixs_levels, 1), nlevels_per_ion)
                for lowerlevel in range(1, nlo + 1):  # 1-based
                    if lowerlevel == 1:
                        # multi-target table
                        f.write(f"{z} {ionstage + 1} -1 {ionstage} {lowerlevel} 10.0\n")
                        f.write("2\n1 0.7\n2 0.3\n")
                    else:
                        f.write(f"{z} {ionstage + 1} 1 {ionstage} {lowerlevel} 10.0\n")
                    sigma0 = rng.uniform(1.0, 10.0)  # Mb
                    xs = sigma0 * (1.0 + np.arange(nphixspoints) * nphixsnuincrement) ** -3
                    f.write("\n".join(f"{x:.6e}" for x in xs) + "\n")

    return folder


import numpy as np


INPUT_TXT = """\
42                       # pre_zseed
{ntimesteps}             # ntimesteps
000 {tsfinish:03d}       # timestep_start timestep_finish
{tmin_days} {tmax_days}  # tmin_days tmax_days
1.33  1.330000001        # UNUSED
80                       # UNUSED
3. 0.037                 # UNUSED
1                        # UNUSED
4                        # UNUSED
1                        # UNUSED
1.0                      # UNUSED
-1                       # gamma grey opacity (<0: detailed)
0 0 1                    # UNUSED syn_dir
{opacity_case}                        # opacity_case
{rho_crit_para}                  # rho_crit_para
-1                       # UNUSED debug
0                        # continue
1e-6                     # UNUSED rfcut
{nltets}                  # num_lte_timesteps
0.0 {ngreyts}            # cell_is_optically_thick num_grey_timesteps
-1                       # UNUSED max_bf_continua
1                        # nprocs_exspec
1                        # do_emission_res
0.001 1000               # kpkt diffusion
"""


def make_run(folder, ncells=10, ntimesteps=8, tmin_days=0.4, tmax_days=3.0,
             ngreyts=3, vmax_kmps=30000.0, t_model_days=0.05, x_ni56=0.5,
             num_lte_timesteps=999, logrho0=-9.0, logrho_slope=-0.25,
             model_dim=1, opacity_case=4, rho_crit_para=1.0e-10):
    """Write a synthetic Ni56-powered run directory.

    model_dim selects the model.txt dimensionality (mirroring the reference's
    auto-detected formats, grid.cc:1841-1886): 1 = radial shells (ncells
    shells), 2 = cylindrical (ncells x 2*ncells grid of (rcyl, z) cells),
    3 = Cartesian cube (ncells^3 cells). The 2D/3D density fields are the
    same radial power-law profile evaluated at the cell midpoint.
    """
    folder = str(folder)
    with open(f"{folder}/input.txt", "w") as f:
        f.write(INPUT_TXT.format(ntimesteps=ntimesteps, tsfinish=ntimesteps - 1,
                                 tmin_days=tmin_days, tmax_days=tmax_days, ngreyts=ngreyts,
                                 nltets=num_lte_timesteps,
                                 opacity_case=opacity_case,
                                 rho_crit_para=rho_crit_para))

    vmax_cms = vmax_kmps * 1e5
    t_model_s = t_model_days * 86400.0

    def rho_at(vfrac):
        """Density at t_model for a cell whose midpoint speed is vfrac*vmax,
        matching the 1D shells' 10**(logrho0 + slope*i) ladder."""
        return 10.0 ** (logrho0 + logrho_slope * vfrac * (ncells - 1))

    if model_dim == 1:
        npts = ncells
        with open(f"{folder}/model.txt", "w") as f:
            f.write(f"{ncells}\n{t_model_days}\n")
            f.write("#inputcellid velocity_outer logrho X_Fegroup X_Ni56 X_Co56 X_Fe52 X_Cr48\n")
            for i in range(ncells):
                vout = vmax_kmps * (i + 1) / ncells
                logrho = logrho0 + logrho_slope * i
                f.write(f"{i + 1} {vout} {logrho} 1.0 {x_ni56} 0.0 0.0 0.0\n")
    elif model_dim == 2:
        n_rcyl, n_z = ncells, 2 * ncells
        npts = n_rcyl * n_z
        d_rcyl = vmax_cms * t_model_s / n_rcyl
        d_z = 2.0 * vmax_cms * t_model_s / n_z
        with open(f"{folder}/model.txt", "w") as f:
            f.write(f"{n_rcyl} {n_z}\n{t_model_days}\n{vmax_cms:.6e}\n")
            f.write("#inputcellid pos_rcyl_mid pos_z_mid rho X_Fegroup X_Ni56 X_Co56 X_Fe52 X_Cr48\n")
            cid = 1
            for iz in range(n_z):
                for ir in range(n_rcyl):
                    rmid = (ir + 0.5) * d_rcyl
                    zmid = -vmax_cms * t_model_s + (iz + 0.5) * d_z
                    vfrac = min(np.hypot(rmid, zmid) / (vmax_cms * t_model_s), 1.0)
                    rho = rho_at(vfrac) if vfrac < 1.0 else 0.0
                    f.write(f"{cid} {rmid:.6e} {zmid:.6e} {rho:.6e} "
                            f"1.0 {x_ni56} 0.0 0.0 0.0\n")
                    cid += 1
    elif model_dim == 3:
        n = ncells
        npts = n ** 3
        wid = 2.0 * vmax_cms * t_model_s / n
        with open(f"{folder}/model.txt", "w") as f:
            f.write(f"{npts}\n{t_model_days}\n{vmax_cms:.6e}\n")
            f.write("#inputcellid pos_x_min pos_y_min pos_z_min rho X_Fegroup X_Ni56 X_Co56 X_Fe52 X_Cr48\n")
            cid = 1
            for iz in range(n):
                for iy in range(n):
                    for ix in range(n):
                        xm = -vmax_cms * t_model_s + (ix + 0.5) * wid
                        ym = -vmax_cms * t_model_s + (iy + 0.5) * wid
                        zm = -vmax_cms * t_model_s + (iz + 0.5) * wid
                        vfrac = np.sqrt(xm * xm + ym * ym + zm * zm) / (vmax_cms * t_model_s)
                        rho = rho_at(vfrac) if vfrac < 1.0 else 0.0
                        f.write(f"{cid} {xm - 0.5 * wid:.6e} {ym - 0.5 * wid:.6e} "
                                f"{zm - 0.5 * wid:.6e} {rho:.6e} "
                                f"1.0 {x_ni56} 0.0 0.0 0.0\n")
                        cid += 1
    else:
        raise ValueError(f"model_dim must be 1, 2 or 3, got {model_dim}")

    # pure Fe/Co/Ni-ish gas: element Z=26,27,28 fractions (abundances.txt
    # columns are Z=1..30); all mass in Ni (Z=28) to match X_Ni56 decaying
    with open(f"{folder}/abundances.txt", "w") as f:
        for i in range(npts):
            ab = np.zeros(30)
            ab[27] = 0.6  # Z=28 Ni (>= X_Ni56 so stable Ni remains)
            ab[25] = 0.3  # Z=26 Fe
            ab[26] = 0.1  # Z=27 Co
            f.write(f"{i + 1} " + " ".join(f"{v:g}" for v in ab) + "\n")

    write_synthetic_atomicdata(
        folder, elements=((26, 3), (27, 2), (28, 2)), nlevels_per_ion=8
    )
    return folder
