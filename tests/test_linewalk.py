"""Line-walk (get_event) tests against a direct scalar transcription of the
reference algorithm (reference: rpkt.cc:77-197, rpkt.h:55-117)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from artis_tpu.constants import CLIGHT_PROP, HCLIGHTOVERFOURPI
from artis_tpu.transport import linewalk


class FakeDad:
    """Minimal stand-in for DeviceAtomicData in the line walk."""

    def __init__(self, line_nu, blu, bul, lower, upper, nlevels):
        self.nlines = len(line_nu)
        self.line_nu = jnp.asarray(line_nu)
        self.line_blu = jnp.asarray(blu)
        self.line_bul = jnp.asarray(bul)
        self.line_lowerunique = jnp.asarray(lower)
        self.line_upperunique = jnp.asarray(upper)


def reference_get_event(dad, levelpops_row, nu_cmf, prop_time, next_trans, chi_cont,
                        tau_rnd, abort_dist, nu_cmf_abort, d_nu_on_d_l, relativistic):
    """Scalar transcription of the reference algorithm for verification."""
    line_nu = np.asarray(dad.line_nu)
    nlines = dad.nlines
    pops = np.asarray(levelpops_row)
    blu_arr = np.asarray(dad.line_blu)
    bul_arr = np.asarray(dad.line_bul)
    low = np.asarray(dad.line_lowerunique)
    up = np.asarray(dad.line_upperunique)

    tau = 0.0
    dist = 0.0
    nu = nu_cmf
    t = prop_time
    cursor = next_trans

    while True:
        # closest_transition
        if cursor > nlines - 1 or nu < line_nu[nlines - 1]:
            lineindex = -1
        elif cursor > 0:
            lineindex = cursor
        elif nu >= line_nu[0]:
            lineindex = 0
        else:
            lineindex = int(np.searchsorted(-line_nu, -nu, side="left"))
            if lineindex >= nlines:
                lineindex = -1

        if lineindex >= 0:
            nu_trans = line_nu[lineindex]
            cursor = lineindex + 1
            if nu <= nu_trans:
                ldist = 0.0
            elif relativistic:
                ldist = (nu_trans - nu) / d_nu_on_d_l
            else:
                ldist = CLIGHT_PROP * t * (nu / nu_trans - 1)
            tau_cont = chi_cont * ldist
            if tau_rnd - tau > tau_cont:
                if nu_trans < nu_cmf_abort:
                    return np.inf, cursor - 1, False, -99
                tau_line = max(
                    (blu_arr[lineindex] * pops[low[lineindex]]
                     - bul_arr[lineindex] * pops[up[lineindex]])
                    * HCLIGHTOVERFOURPI * t,
                    0.0,
                )
                if tau_rnd - tau > tau_cont + tau_line:
                    dist += ldist
                    tau += tau_cont + tau_line
                    if relativistic:
                        # rpkt.cc:147 anchors at the original packet nu
                        nu = nu_cmf + d_nu_on_d_l * dist
                    else:
                        # first-order mode conserves t * nu_cmf exactly
                        nu = nu * t / (t + ldist / CLIGHT_PROP)
                    t += ldist / CLIGHT_PROP
                else:
                    return dist + ldist, cursor, True, lineindex
            else:
                return dist + (tau_rnd - tau) / chi_cont, cursor - 1, False, -99
        else:
            tau_cont = chi_cont * (abort_dist - dist)
            if tau_rnd - tau > tau_cont:
                return np.inf, cursor, False, -99
            return dist + (tau_rnd - tau) / chi_cont, nlines + 1, False, -99


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    nlines = 400
    nlevels = 100
    line_nu = np.sort(rng.uniform(1e14, 2e15, nlines))[::-1].copy()
    blu = 10.0 ** rng.uniform(5, 9, nlines)
    bul = blu * rng.uniform(0.1, 1.0, nlines)
    lower = rng.integers(0, nlevels, nlines)
    upper = rng.integers(0, nlevels, nlines)
    dad = FakeDad(line_nu, blu, bul, lower, upper, nlevels)
    pops = 10.0 ** rng.uniform(-18, -8, (3, nlevels))
    return dad, pops, rng


@pytest.mark.parametrize("relativistic", [True, False])
@pytest.mark.parametrize("chunkn", [7, 64, 1024])
def test_get_event_matches_reference(setup, relativistic, chunkn):
    dad, pops, _ = setup
    rng = np.random.default_rng(42)
    n = 64
    t0 = 2.0e5
    nu0 = rng.uniform(3e14, 2.2e15, n)
    tau_rnd = rng.exponential(1.0, n) + 1e-3
    abort_dist = rng.uniform(1e12, 1e15, n)
    # frequency drops by up to ~3% over the abort distance
    nu_abort = nu0 * rng.uniform(0.97, 0.9999, n)
    dndl = (nu_abort - nu0) / abort_dist
    chi_cont = 10.0 ** rng.uniform(-16, -13, n)
    next_trans = np.where(rng.uniform(size=n) < 0.5, -1, rng.integers(0, 500, n))
    cellidx = rng.integers(0, 3, n)

    tau_factor = linewalk.build_tau_factor(dad, jnp.asarray(pops))
    res = linewalk.get_event_batch(
        dad, tau_factor, jnp.asarray(cellidx), jnp.asarray(nu0),
        jnp.full(n, t0), jnp.asarray(next_trans.astype(np.int32)),
        jnp.asarray(chi_cont), jnp.asarray(tau_rnd), jnp.asarray(abort_dist),
        jnp.asarray(nu_abort), jnp.asarray(dndl), jnp.ones(n, bool),
        relativistic, chunk=chunkn,
    )

    for i in range(n):
        e_ref, nt_ref, bb_ref, act_ref = reference_get_event(
            dad, pops[cellidx[i]], nu0[i], t0, int(next_trans[i]), chi_cont[i],
            tau_rnd[i], abort_dist[i], nu_abort[i], dndl[i], relativistic,
        )
        e_got = float(res.edist[i])
        assert int(res.next_trans[i]) == nt_ref, f"packet {i} cursor"
        assert bool(res.is_boundbound[i]) == bb_ref, f"packet {i} event type"
        if np.isinf(e_ref):
            assert np.isinf(e_got), f"packet {i} expected no-event"
        else:
            assert e_got == pytest.approx(e_ref, rel=1e-10), f"packet {i} edist"
        if bb_ref:
            assert int(res.activating_line[i]) == act_ref
