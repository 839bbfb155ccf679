"""Ejecta model (`model.txt`) and elemental abundance (`abundances.txt`) readers.

TPU-native rebuild of the reference model input path
(reference: grid.cc:1836-2119 read_ejecta_model, grid.cc:599-775 header/column
parsing, grid.cc:528-597 abundances_read). Behaviour preserved:

- dimension auto-detection: two ints on line 1 => 2D; a bare vmax after
  t_model => 3D; otherwise 1D (grid.cc:1841-1886);
- optional '#' header line naming custom columns; default headers for
  unlabelled files, with the X_Ni57/X_Co57 extension rule (grid.cc:725-751);
- one- or two-lines-per-cell layouts (grid.cc:739-747);
- densities rescaled from t_model to tmin by (t_model/tmin)^3
  (grid.cc:1930, 1989, 2066);
- 'q' column scaled by t_model/tmin (grid.cc:689), cellYe passthrough.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..constants import DAY, PI

ELSYMBOLS = (
    "n H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn Fe Co Ni Cu Zn "
    "Ga Ge As Se Br Kr Rb Sr Y Zr Nb Mo Tc Ru Rh Pd Ag Cd In Sn Sb Te I Xe Cs Ba La Ce "
    "Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf Ta W Re Os Ir Pt Au Hg Tl Pb Bi Po At Rn "
    "Fr Ra Ac Th Pa U Np Pu Am Cm Bk Cf Es Fm Md No Lr Rf Db Sg Bh Hs Mt Ds Rg Cn Uut "
    "Fl Uup Lv Uus Uuo"
).split()
Z_MAX = len(ELSYMBOLS) - 1


def get_nucstring_z(strnuc: str) -> int:
    """Atomic number from e.g. 'Ni56' (reference: decay.cc:807-820)."""
    sym = "".join(c for c in strnuc if c.isalpha())
    try:
        return ELSYMBOLS.index(sym)
    except ValueError:
        return -1


def get_nucstring_a(strnuc: str) -> int:
    """Mass number from e.g. 'Ni56' (reference: decay.cc:822-835)."""
    digits = "".join(c for c in strnuc if c.isdigit())
    return int(digits) if digits else -1


@dataclasses.dataclass
class ModelData:
    """Parsed ejecta model, densities already scaled to t=tmin."""

    dim: int  # 1, 2, or 3
    npts_model: int
    ncoord_model: tuple  # (n_r,) / (n_rcyl, n_z) / (nx, ny, nz)
    t_model: float  # [s] time at which input densities were correct
    vmax: float  # [cm/s]
    rho_tmin: np.ndarray  # (npts_model,) density at tmin [g/cm3]
    ffegrp: np.ndarray  # (npts_model,) Fe-group mass fraction
    nuc_z: np.ndarray  # (num_nuclides_in_file,) atomic numbers
    nuc_a: np.ndarray  # (num_nuclides_in_file,) mass numbers
    initnucmassfrac: np.ndarray  # (npts_model, num_nuclides_in_file)
    vout_model: np.ndarray | None  # 1D only: shell outer velocities [cm/s]
    init_ye: np.ndarray | None  # electron fraction per cell, if cellYe column
    initenergyq: np.ndarray | None  # initial energy release [erg/g], if q col
    first_cellindex: int = 1


def _default_headerline(dim: int, colcount_extra: bool) -> str:
    if dim == 1:
        header = "#inputcellid vel_r_max_kmps logrho"
    elif dim == 2:
        header = "#inputcellid pos_rcyl_mid pos_z_mid rho"
    else:
        header = "#inputcellid pos_x_min pos_y_min pos_z_min rho"
    header += " X_Fegroup X_Ni56 X_Co56 X_Fe52 X_Cr48"
    if colcount_extra:
        header += " X_Ni57 X_Co57"
    return header


def _parse_headerline(tokens: list[str], dim: int):
    """Classify header columns (reference: grid.cc:599-648).

    Returns (colnames, zlist, alist) for the abundance-ish columns that follow
    the fixed geometry/density columns.
    """
    colnames: list[str] = []
    zlist: list[int] = []
    alist: list[int] = []
    for tok in tokens:
        if tok in ("#inputcellid", "velocity_outer", "vel_r_max_kmps", "logrho", "rho"):
            continue
        if tok.startswith("pos_"):
            continue
        if tok.startswith("X_") and tok != "X_Fegroup":
            z = get_nucstring_z(tok[2:])
            a = get_nucstring_a(tok[2:])
            assert z >= 0 and a >= 0, f"bad nuclide column {tok}"
            colnames.append(tok)
            zlist.append(z)
            alist.append(a)
        else:
            # includes X_Fegroup, cellYe, q, tracercount — handled by name
            colnames.append(tok)
            zlist.append(-1)
            alist.append(-1)
    return colnames, zlist, alist


def read_model(path: str, tmin: float) -> ModelData:
    """Read model.txt with dimension auto-detection (reference: grid.cc:1836)."""
    with open(path) as f:
        rawlines = f.readlines()

    # split off leading comments lazily; we need comment-awareness throughout
    lines = rawlines
    idx = 0

    def next_noncomment():
        nonlocal idx
        while idx < len(lines):
            line = lines[idx]
            idx += 1
            if line.strip() and not line.lstrip().startswith("#"):
                return line
        raise ValueError("unexpected end of model.txt")

    # first line: one int (1D/3D npts) or two ints (2D n_r n_z)
    first = next_noncomment().split()
    dim2d = len(first) >= 2
    npts_0 = int(first[0])
    npts_1 = int(first[1]) if dim2d else 0

    t_model = float(next_noncomment()) * DAY

    vmax = None
    dim = 2 if dim2d else None
    # peek: a bare single float next (non-comment) means vmax (2D/3D)
    save_idx = idx
    while idx < len(lines) and (not lines[idx].strip() or lines[idx].lstrip().startswith("#")):
        idx += 1
    if idx < len(lines):
        toks = lines[idx].split()
        isvmax = False
        if len(toks) == 1:
            try:
                float(toks[0])
                isvmax = "." in toks[0] or "e" in toks[0].lower() or dim2d
                # reference: any single parseable number after t_model is vmax
                isvmax = True
            except ValueError:
                isvmax = False
        if isvmax:
            vmax = float(toks[0])
            idx += 1
            if dim is None:
                dim = 3
        else:
            idx = save_idx
            if dim is None:
                dim = 1
    if dim is None:
        dim = 1

    npts_model = npts_0 * npts_1 if dim == 2 else npts_0

    # header line (comment) directly before data?
    header_tokens = None
    while idx < len(lines) and not lines[idx].strip():
        idx += 1
    if idx < len(lines) and lines[idx].lstrip().startswith("#"):
        header_tokens = lines[idx].split()
        idx += 1

    # count data columns of the first cell to detect one/two-line layout
    data_start = idx
    firstdata = lines[idx].split()
    ngeomcols = {1: 3, 2: 4, 3: 5}[dim]
    if header_tokens is None:
        default5 = _default_headerline(dim, False).split()
        if len(firstdata) >= len(default5):
            one_line_per_cell = True
            total = len(firstdata)
        else:
            one_line_per_cell = False
            total = len(firstdata) + len(lines[idx + 1].split())
        header_tokens = _default_headerline(dim, total > len(default5)).split()
        assert total == len(header_tokens), (
            f"model.txt has {total} columns, default header has {len(header_tokens)}"
        )
    else:
        one_line_per_cell = len(firstdata) >= len(header_tokens)

    colnames, zlist, alist = _parse_headerline(header_tokens, dim)
    ncols_abund = len(colnames)

    nuc_mask = np.array([z > 0 for z in zlist], dtype=bool)
    nuc_z = np.array([z for z in zlist if z > 0], dtype=np.int32)
    nuc_a = np.array([a for a, z in zip(alist, zlist) if z > 0], dtype=np.int32)

    rho_tmin = np.zeros(npts_model)
    ffegrp = np.zeros(npts_model)
    initnucmassfrac = np.zeros((npts_model, len(nuc_z)))
    init_ye = np.zeros(npts_model) if "cellYe" in colnames else None
    initenergyq = np.zeros(npts_model) if "q" in colnames else None
    vout_model = np.zeros(npts_model) if dim == 1 else None

    idx = data_start
    first_cellindex = None
    for mgi in range(npts_model):
        toks = next_noncomment().split()
        if not one_line_per_cell:
            toks = toks + next_noncomment().split()
        cellnumberin = int(toks[0])
        if first_cellindex is None:
            first_cellindex = cellnumberin
        assert cellnumberin == mgi + first_cellindex, f"cell index mismatch at {mgi}"

        if dim == 1:
            vout_model[mgi] = float(toks[1]) * 1e5  # km/s -> cm/s
            rho_tmin[mgi] = 10.0 ** float(toks[2]) * (t_model / tmin) ** 3
        elif dim == 2:
            rho = float(toks[3])
            assert rho >= 0
            rho_tmin[mgi] = rho * (t_model / tmin) ** 3
        else:
            rho = float(toks[4])
            assert rho >= 0
            rho_tmin[mgi] = rho * (t_model / tmin) ** 3

        abund_vals = [float(v) for v in toks[ngeomcols:]]
        assert len(abund_vals) == ncols_abund, (
            f"cell {mgi}: expected {ncols_abund} abundance columns, got {len(abund_vals)}"
        )
        nucpos = 0
        for colpos, (name, val) in enumerate(zip(colnames, abund_vals)):
            if nuc_mask[colpos]:
                initnucmassfrac[mgi, nucpos] = val
                nucpos += 1
            elif name == "X_Fegroup":
                ffegrp[mgi] = val
            elif name == "cellYe":
                init_ye[mgi] = val
            elif name == "q":
                initenergyq[mgi] = val * t_model / tmin

    if dim == 1:
        vmax = float(vout_model[-1])
        ncoord = (npts_model,)
    elif dim == 2:
        ncoord = (npts_0, npts_1)
    else:
        n = round(npts_0 ** (1.0 / 3.0))
        assert n * n * n == npts_model, "3D model must be a cube"
        ncoord = (n, n, n)

    return ModelData(
        dim=dim,
        npts_model=npts_model,
        ncoord_model=ncoord,
        t_model=t_model,
        vmax=vmax,
        rho_tmin=rho_tmin,
        ffegrp=ffegrp,
        nuc_z=nuc_z,
        nuc_a=nuc_a,
        initnucmassfrac=initnucmassfrac,
        vout_model=vout_model,
        init_ye=init_ye,
        initenergyq=initenergyq,
        first_cellindex=first_cellindex,
    )


def read_abundances(path: str, npts_model: int, first_cellindex: int = 1) -> np.ndarray:
    """Read per-cell elemental mass fractions for Z=1..max
    (reference: grid.cc:528-597). Returns (npts_model, 150) raw values
    (normalisation is applied later per the 3D/1D rules)."""
    out = np.zeros((npts_model, 150))
    # abundances.txt is a pure numeric table: use the native parser
    # (native/fasttable.c) and fall back to Python parsing on ragged rows
    from .fasttable import loadtxt_fast

    flat = loadtxt_fast(path)
    if flat.size % npts_model == 0 and flat.size >= npts_model * 2:
        ncols = flat.size // npts_model
        table = flat.reshape(npts_model, ncols)
        cellnums = table[:, 0].astype(np.int64)
        if np.array_equal(cellnums, np.arange(npts_model) + first_cellindex):
            vals = table[:, 1:]
            vals[vals < np.finfo(np.float32).tiny] = 0.0
            out[:, : vals.shape[1]] = vals
            return out
    mgi = 0
    with open(path) as f:
        for line in f:
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            toks = line.split()
            cellnumber = int(toks[0])
            assert cellnumber == mgi + first_cellindex
            vals = np.array([float(v) for v in toks[1:]])
            vals[vals < np.finfo(np.float32).tiny] = 0.0
            out[mgi, : len(vals)] = vals
            mgi += 1
            if mgi == npts_model:
                break
    assert mgi == npts_model, f"abundances.txt has {mgi} cells, expected {npts_model}"
    return out


def model_cell_volume_at_tmin(model: ModelData, tmin: float) -> np.ndarray:
    """Input-cell volume at tmin (reference: grid.cc:777-796)."""
    if model.dim == 1:
        v_inner = np.concatenate([[0.0], model.vout_model[:-1]])
        return (model.vout_model**3 - v_inner**3) * 4.0 * PI * tmin**3 / 3.0
    if model.dim == 2:
        n_rcyl = np.arange(model.npts_model) % model.ncoord_model[0]
        dcoord_rcyl = model.vmax * model.t_model / model.ncoord_model[0]
        dcoord_z = 2.0 * model.vmax * model.t_model / model.ncoord_model[1]
        return (
            (tmin / model.t_model) ** 3
            * dcoord_z
            * PI
            * (((n_rcyl + 1) * dcoord_rcyl) ** 2 - (n_rcyl * dcoord_rcyl) ** 2)
        )
    ngrid = int(np.prod(model.ncoord_model))
    return np.full(model.npts_model, (2.0 * model.vmax * tmin) ** 3 / ngrid)
