"""Generate a small, physically-plausible synthetic atomic dataset.

Used instead of the reference's downloaded tarball (zero-egress environment).
File formats follow the reference parsers (input.cc:912-1255, 228-327).
"""

import numpy as np


def write_synthetic_atomicdata(
    folder,
    elements=((26, 3), (27, 2)),  # (Z, nions)
    nlevels_per_ion=5,
    nphixspoints=20,
    nphixsnuincrement=0.1,
    seed=42,
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
                # increasing level energies below and above the ionpot
                for lev in range(1, nlev + 1):
                    energy = (lev - 1) * ionpot_ev / (nlev + 1)
                    g = 2.0 * lev  # distinct stat weights
                    f.write(f"{lev} {energy:.6f} {g:.1f} {max(lev - 1, 0)}\n")

    # transitiondata.txt: same block order; downward transitions with random A
    with open(f"{folder}/transitiondata.txt", "w") as f:
        for z, nions in elements:
            for ionstage in range(1, nions + 2):
                nlev = nlevels_per_ion if ionstage <= nions else 2
                rows = []
                for lo in range(1, nlev + 1):
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
                for lowerlevel in range(1, 3):  # levels 1,2 (1-based)
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
