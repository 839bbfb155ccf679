"""Run configuration: the TPU-native replacement for ``artisoptions.h``.

The reference selects physics via ~70 ``constexpr`` flags compiled into the
binary (reference: artisoptions_doc.md, artisoptions_classic.h:9-153). Here the
same switches live in one frozen, hashable dataclass that is passed as a
*static* argument to jitted functions, so XLA still specialises the program on
every flag exactly like the C++ compiler did — without recompiling the package.

Preset constructors mirror the five reference variants
(artisoptions_{classic,kilonova_lte,nltenebular,nltewithoutnonthermal,
christinenonthermal}.h).
"""

from __future__ import annotations

import dataclasses
import enum

from .constants import CLIGHT


class GridType(enum.Enum):
    SPHERICAL1D = 1  # 1D radial shells (non-uniform dr)
    CYLINDRICAL2D = 2  # 2D cylindrical, uniform dz, drcyl
    CARTESIAN3D = 3  # 3D Cartesian cubic, uniform dx=dy=dz


class TimeStepSizeMethod(enum.Enum):
    LOGARITHMIC = 1
    CONSTANT = 2
    LOGARITHMIC_THEN_CONSTANT = 3
    CONSTANT_THEN_LOGARITHMIC = 4


class ThermalisationScheme(enum.Enum):
    INSTANT = 1
    DETAILED = 2
    DETAILEDWITHGAMMAPRODUCTS = 3
    BARNES = 4
    WOLLAEGER = 5
    GUTTMAN = 6


@dataclasses.dataclass(frozen=True)
class Options:
    """Physics/feature flags (reference: artisoptions_kilonova_lte.h:9-153)."""

    # packet count per replica (reference MPKTS)
    npkts: int = 15000

    grid_type: GridType = GridType.CARTESIAN3D
    ncoordgrid_x: int = 50
    ncoordgrid_y: int = 50
    ncoordgrid_z: int = 50
    force_spherical_escape_surface: bool = False

    nlteiter: int = 30
    # NLTE level selection: (Z, ionstage) -> max level treated in NLTE
    # (None = pure LTE like LEVEL_IS_NLTE returning false everywhere)
    nlte_enabled: bool = False
    # outer NLTE iteration cap per grid update (the reference's NLTEITER,
    # artisoptions_*.h:17): [SF -> T_e -> pops -> nne] iterates per cell
    # until both fracdiffs drop below nlte_convergence_tol or the cap hits
    # (update_grid.cc:670-763)
    nlte_outer_iters: int = 30
    nlte_convergence_tol: float = 0.04
    write_estimator_files: bool = True
    # Spencer-Fano energy grid (reference: SFPTS/SF_EMIN/SF_EMAX,
    # artisoptions_nltenebular.h:104-108; fewer points by default on TPU)
    sf_points: int = 256
    sf_emin: float = 0.1
    sf_emax: float = 16000.0
    # superlevel compression (reference: LEVEL_IS_NLTE,
    # artisoptions_nltenebular.h:19-24): levels above the cap collapse into
    # one Boltzmann-distributed superlevel per ion
    nlte_all_levels: bool = False
    nlte_maxlevel: int = 80
    # temperature at which recombrates.txt calibrates the phixs tables
    # (reference: RECOMBCALIBRATION_T_ELEC, artisoptions_nltenebular.h:50)
    recombcalibration_t_elec: float = 6000.0
    nlte_maxlevel_fe2: int = 197  # Fe II exception
    # Z-band cap used by the christinenonthermal preset: when >= 0, elements
    # with Z < 22 use this cap instead (artisoptions_christinenonthermal.h:19-24)
    nlte_maxlevel_lowz: int = -1
    # LU iterative-refinement passes, keeping the best residual
    # (reference: nltepop.cc:623-746)
    nlte_refine_iters: int = 4

    ltepop_excitation_use_tj: bool = True
    force_saha_ion_balance: bool = True
    single_level_top_ion: bool = False
    single_ground_level: bool = False

    uniform_pellet_energies: bool = True
    direct_col_heat: bool = True
    initial_packets_on: bool = True
    record_linestat: bool = False
    use_model_initial_energy: bool = True

    # rate-coefficient LUT temperature grid
    tablesize: int = 200
    mintemp: float = 500.0
    maxtemp: float = 150000.0
    recombcalibration_t_elec: float = 6000.0

    dipole: bool = False
    pol_on: bool = False
    vpkt_on: bool = False
    vpkt_nobs: int = 1
    vpkt_vmtbins: int = 30
    vpkt_vmnubins: int = 1000

    minpop: float = 1e-40

    nu_min_r: float = 1e13  # rpkt frequency window
    nu_max_r: float = 5e16

    multibin_radfield: bool = False
    radfieldbincount: int = 256
    first_nlte_radfield_timestep: int = 12
    nu_lower_first_initial: float = CLIGHT / 40000e-8
    nu_upper_last_initial: float = CLIGHT / 1085e-8
    nu_upper_superbin: float = CLIGHT / 10e-8
    t_r_min: float = 500.0
    t_r_max: float = 250000.0

    # detailed line J_b_lu estimators replacing the binned/dilute-BB field in
    # radiative-excitation rates for selected lines (reference:
    # radfield.cc:57-68, 520-552 selection, 761-771 update; macroatom.cc:719)
    detailed_line_estimators_on: bool = False
    jblue_elem_z: int = 26  # 0 = all elements (radfield.cc:523)
    jblue_max_lowerlevel: int = 15  # radfield.cc:540
    use_lut_photoion: bool = True
    use_lut_bfheating: bool = True
    # per-ion-per-cell event statistics (reference: TRACK_ION_STATS,
    # stats.h:12-44); feeds the MC-vs-analytic rate columns in estimator files
    track_ion_stats: bool = False
    # per-interaction macro-atom log -> macroatom_0-0.out (reference:
    # LOG_MACROATOM macroatom.cc:35, 413-421, 630-641). Events are captured
    # in a bounded device-side row buffer scattered at bb radiative
    # deactivation and drained by the driver once per timestep; rows past
    # the capacity within one timestep are counted but dropped.
    log_macroatom: bool = False
    log_macroatom_capacity: int = 65536

    # non-thermal solver
    # detailed per-continuum MC photoionisation-rate estimators
    # (reference: radfield.cc:70-73, 204-233; DETAILED_BF_ESTIMATORS_ON)
    detailed_bf_estimators_on: bool = False
    detailed_bf_estimators_usefromtimestep: int = 13
    nt_on: bool = False
    nt_solve_spencerfano: bool = False
    sf_max_ts_between_solutions: int = 0
    nt_max_fracdiff_nneperion: float = 0.05
    ntexcitation_maxnlevels_lower: int = 5
    ntexcitation_maxnlevels_upper: int = 250
    max_nt_excitations_stored: int = 25000
    nt_excitation_on: bool = False
    nt_use_valence_ionpotential: bool = False
    nt_max_auger_electrons: int = 2
    sf_auger_contribution_on: bool = True
    sf_auger_contribution_distribute_en: bool = False

    temperature_solver_accuracy: float = 1e-3
    continuum_nu_integral_accuracy: float = 1e-3
    ratecoeff_integral_accuracy: float = 1e-3
    iongamma_popfrac_levels_included: float = 0.999

    use_relativistic_doppler_shift: bool = True
    use_calculated_meanatomicweight: bool = True

    timestep_size_method: TimeStepSizeMethod = TimeStepSizeMethod.LOGARITHMIC
    fixed_timestep_width: float = -1.0
    timestep_transition_time: float = -1.0

    bfcooling_uselevelpop: bool = False
    expansionopacities_on: bool = False
    rpkt_boundbound_thermalisation_probability: float = -1.0
    use_xcom_gammaphotoion: bool = False

    particle_thermalisation_scheme: ThermalisationScheme = ThermalisationScheme.DETAILED
    gamma_thermalisation_scheme: ThermalisationScheme = ThermalisationScheme.DETAILED

    # --- TPU-native knobs (no reference equivalent) ---
    # main floating dtype for transport state ("float64" or "float32")
    transport_dtype: str = "float64"
    # iterations per device dispatch: bounds single-execution runtime (remote
    # TPU relays impose per-dispatch deadlines) and lets the host observe
    # progress; the driver loops until the wavefront drains
    dispatch_chunk_iters: int = 512
    # macro-atom jumps resolved per wavefront iteration; unresolved macro
    # atoms carry their level in the packet state to the next iteration,
    # bounding the cost of any single device dispatch
    ma_max_jumps_per_iter: int = 16
    # macro-atom phase compaction: active macro atoms are gathered into a
    # buffer of npkts//ma_compact_divisor lanes before the jump loop runs, so
    # its cost scales with the number of macro atoms, not the packet count
    # (overflow stays in the packet state for the next iteration)
    ma_compact_divisor: int = 8
    # same compaction for the k-packet cooling-channel selection (per-lane
    # ion cumsums + chunked continuum/level/transition selects)
    kpkt_compact_divisor: int = 8
    # r-packet phase compaction: when the active r-packet count fits in
    # npkts//rpkt_compact_divisor lanes, the whole rpkt step (opacities, line
    # walk, moves) runs on the compacted buffer — the wavefront-tail answer to
    # the reference's sort-escaped-packets-to-the-end (update_packets.cc:281)
    rpkt_compact_divisor: int = 8
    # r-packets advance through up to this many boundary crossings inside one
    # rpkt dispatch before the (much heavier) event-application and
    # kpkt/macro-atom phases run; crossings outnumber events ~10:1
    rpkt_crossings_per_dispatch: int = 8
    # fuse the whole multi-crossing propagation into one Pallas TPU kernel
    # (transport/pallas_rpkt.py); falls back to the XLA path off-TPU or for
    # unsupported configurations (non-spherical grids, expansion opacities,
    # multibin radfield, VMEM-oversized tables, float64 transport)
    use_pallas_rpkt: bool = False
    # line tables above this element count are HBM-streamed (per-block DMA in
    # the kernel's Sobolev walk) instead of VMEM-resident
    pallas_stream_threshold: int = 1_500_000
    # bf-continuum tables above this continuum count are HBM-streamed in
    # nu-windowed chunks of pallas_bf_chunk (lifts the former 512-continuum
    # VMEM cap to nebular-scale atomic data; reference windowed bf sum
    # rpkt.cc:833-893)
    pallas_bf_stream_threshold: int = 512
    pallas_bf_chunk: int = 256
    pallas_block: int = 1024
    # tile-sorted dispatch for O(100^3) 3D models (CARTESIAN3D grids with a
    # 3D input model): the wavefront is sorted by cell-tile so every kernel
    # block touches one pallas_tile-cell slice of the prop/mgi tables —
    # per-crossing cost stays flat in the model size (PERF.md design; the
    # TPU answer to the reference's per-cell recursion over the 3D grid,
    # grid.cc:1048-1096).  Engaged automatically when the untiled kernel's
    # VMEM estimate exceeds the budget; pallas_force_tiled engages it
    # unconditionally (testing).
    pallas_tile: int = 1024
    pallas_force_tiled: bool = False
    # wavefront-tail dispatch: once the active packet count fits in a buffer
    # of npkts//tail_width_divisor lanes (min 1024), the driver gathers the
    # stragglers into that narrow buffer and dispatches a second compiled
    # program with tail_crossings_per_dispatch in-kernel crossings per
    # iteration — diffusion-trapped packets need millions of scatters, and at
    # full width they leave >98% of lanes idle (the TPU answer to the
    # reference's sort-escaped-to-the-end, update_packets.cc:281-332)
    tail_width_divisor: int = 16
    tail_crossings_per_dispatch: int = 1024
    # while-iterations per tail dispatch: the device-side loop exits on its
    # own when every packet reaches t2, so a large cap means ONE host
    # round-trip per drained timestep instead of one per few iterations
    # (~244 ms each through a tunneled backend); bounded so a single device
    # execution stays under the remote relay's ~100 s deadline
    tail_chunk_iters: int = 64
    # smallest buffer in the descending tail-width ladder (each 4x step down
    # is its own compiled program; kernel wall time scales with buffer width)
    tail_min_width: int = 256
    # device-side chunk early-exit: a transport chunk's while_loop exits as
    # soon as the active packet count drops to exit_below or fewer (after at
    # least one iteration), so the driver re-gathers the stragglers into the
    # next-narrower tail buffer instead of paying further wide iterations;
    # 0 = run to max_iters / drain.  Set per compiled width by the driver.
    exit_below: int = 0
    # sort lanes so moving r-packets are contiguous before a fused-kernel
    # dispatch: trailing blocks then see no moving lane and early-exit their
    # crossing loop, so kernel wall time scales with the moving-lane count
    # instead of the buffer width (partial-occupancy wavefronts, e.g. while
    # pellets are still decaying mid-timestep)
    pallas_compact_moving: bool = True
    # wall-clock cap per timestep's transport (seconds; <=0 = no cap). For
    # BENCHMARKING only: stragglers past the cap stay mid-timestep. The f32
    # fast path cannot advance packets whose scatter step falls below the
    # float32 ulp of absolute time (~0.03s at t~5d) — use float64 transport
    # when that regime matters physically.
    transport_wall_budget: float = -1.0
    # whole-body compaction: when the total active packet count fits in
    # npkts//wavefront_compact_divisor lanes, the entire wavefront iteration
    # runs on a compacted buffer (one gather/scatter for all phases)
    wavefront_compact_divisor: int = 8
    # events advanced per compacted wavefront iteration: straggler packets
    # (e.g. diffusing in a dense core) take thousands of micro-steps, so the
    # compacted buffer loops several times before scattering back
    compact_micro_iters: int = 8
    # number of packet "advance one event" micro-steps fused per device launch
    transport_chunk_steps: int = 64
    # line-walk chunk width (lines scanned per vector step in get_event)
    linewalk_chunk: int = 256
    # PROFILING ONLY: wavefront phases to skip at trace time ("conv", "kpkt",
    # "gamma", "rpkt", "ma", "eventpass") so profile_transport.py can
    # attribute per-iteration cost; physics is wrong with any phase off
    phase_ablate: tuple = ()
    # escape-direction binning (reference exspec.h: MABINS=100)
    ncosthetabins: int = 10
    nphibins: int = 10

    def replace(self, **kw) -> "Options":
        return dataclasses.replace(self, **kw)

    @property
    def mabins(self) -> int:
        return self.ncosthetabins * self.nphibins


def kilonova_lte(**overrides) -> Options:
    """Preset mirroring artisoptions_kilonova_lte.h (reference lines 9-153)."""
    return Options(
        npkts=15000,
        grid_type=GridType.CARTESIAN3D,
        nlte_enabled=False,
        ltepop_excitation_use_tj=True,
        force_saha_ion_balance=True,
        nt_on=False,
        nt_solve_spencerfano=False,
        use_relativistic_doppler_shift=True,
        particle_thermalisation_scheme=ThermalisationScheme.DETAILED,
        gamma_thermalisation_scheme=ThermalisationScheme.DETAILED,
    ).replace(**overrides)


def classic(**overrides) -> Options:
    """Preset mirroring artisoptions_classic.h (LTE Type Ia mode)."""
    return Options(
        npkts=1000000,
        grid_type=GridType.CARTESIAN3D,
        nlte_enabled=False,
        ltepop_excitation_use_tj=True,
        force_saha_ion_balance=False,
        initial_packets_on=False,
        use_model_initial_energy=False,
        uniform_pellet_energies=True,
        dipole=True,
        pol_on=True,
        nt_on=False,  # artisoptions_classic.h:89 NT_ON = false
        nt_solve_spencerfano=False,
        use_relativistic_doppler_shift=False,
        particle_thermalisation_scheme=ThermalisationScheme.INSTANT,
        gamma_thermalisation_scheme=ThermalisationScheme.DETAILED,
    ).replace(**overrides)


def nltewithoutnonthermal(**overrides) -> Options:
    """Preset mirroring artisoptions_nltewithoutnonthermal.h (reference lines
    9-153): early-phase NLTE mode — hot temperature range, fine radfield
    binning, polarised packets, NT solver on but without NT excitation."""
    return Options(
        npkts=10000,
        grid_type=GridType.CARTESIAN3D,
        nlte_enabled=True,
        nlte_all_levels=False,
        nlte_maxlevel=80,
        nlte_maxlevel_fe2=197,
        ltepop_excitation_use_tj=False,
        force_saha_ion_balance=False,
        single_level_top_ion=True,   # artisoptions_nltewithoutnonthermal.h:30
        single_ground_level=True,    # :32
        initial_packets_on=True,     # :39
        record_linestat=True,        # :40
        tablesize=200,               # :44
        mintemp=4000.0,              # :45
        maxtemp=140000.0,            # :46
        recombcalibration_t_elec=15000.0,  # :48
        dipole=True,                 # :50
        pol_on=True,                 # :51
        nu_min_r=1e14,               # :60
        nu_max_r=5e16,               # :61
        multibin_radfield=True,
        radfieldbincount=512,        # :67
        nu_upper_last_initial=CLIGHT / 100e-8,  # :72
        use_lut_photoion=False,      # :86
        use_lut_bfheating=False,     # :88
        detailed_bf_estimators_on=True,
        detailed_line_estimators_on=True,
        nt_on=True,                  # :92
        nt_solve_spencerfano=True,   # :94
        nt_excitation_on=False,      # :111
        temperature_solver_accuracy=1e-2,  # :123
        iongamma_popfrac_levels_included=1.0,  # :129
        fixed_timestep_width=0.1,    # :139
        timestep_transition_time=5.0,  # :141
        bfcooling_uselevelpop=True,  # :145
        use_relativistic_doppler_shift=False,
    ).replace(**overrides)


def christinenonthermal(**overrides) -> Options:
    """Preset mirroring artisoptions_christinenonthermal.h: non-thermal
    study mode — deep Z-banded NLTE level coverage (Z<22: 200 levels, else
    300), coarse 64-bin radfield, polarised packets."""
    return Options(
        npkts=10000,
        grid_type=GridType.CARTESIAN3D,
        nlte_enabled=True,
        nlte_all_levels=False,
        nlte_maxlevel=300,           # artisoptions_christinenonthermal.h:23
        nlte_maxlevel_fe2=300,       # no Fe II exception in this preset
        nlte_maxlevel_lowz=200,      # :20-22 (Z < 22)
        ltepop_excitation_use_tj=False,
        force_saha_ion_balance=False,
        initial_packets_on=True,     # :41
        tablesize=100,
        mintemp=3000.0,              # :47
        maxtemp=140000.0,            # :48
        recombcalibration_t_elec=15000.0,  # :50
        dipole=True,
        pol_on=True,
        nu_max_r=5e16,               # :63
        multibin_radfield=True,
        radfieldbincount=64,         # :69
        nu_upper_last_initial=CLIGHT / 500e-8,  # :74
        nu_upper_superbin=CLIGHT / 50e-8,  # :75
        use_lut_photoion=False,      # :88
        use_lut_bfheating=False,     # :90
        detailed_bf_estimators_on=True,
        detailed_line_estimators_on=True,
        nt_on=True,                  # :94
        nt_solve_spencerfano=True,   # :96
        nt_excitation_on=False,      # :113
        sf_points=256,  # SFPTS=4096 (:98); 256 keeps the vmapped SF solve
        # in-memory at CI scale — raise per-run for production fidelity
        use_relativistic_doppler_shift=False,
    ).replace(**overrides)


def nltenebular(**overrides) -> Options:
    """Preset mirroring artisoptions_nltenebular.h (NLTE + Spencer-Fano)."""
    return Options(
        npkts=1000000,
        grid_type=GridType.CARTESIAN3D,
        nlte_enabled=True,
        nlte_all_levels=False,  # levels above the cap form superlevels
        # (artisoptions_nltenebular.h:19-24)
        ltepop_excitation_use_tj=False,
        force_saha_ion_balance=False,
        nt_on=True,
        nt_solve_spencerfano=True,
        nt_excitation_on=False,
        multibin_radfield=True,
        use_lut_photoion=False,
        use_lut_bfheating=False,
        detailed_bf_estimators_on=True,
        detailed_line_estimators_on=True,
        use_relativistic_doppler_shift=False,
    ).replace(**overrides)
