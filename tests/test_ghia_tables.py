"""Internal-consistency checks of the Ghia (1982) benchmark tables.

These exist because the reference's transcription
(``cavity_flow.py:29-124``) shipped corrupted v-rows for Re >= 5000 —
each row's first interior entry was the same-Re U-table entry (a copy
slip), Re=5000's near-wall peak triple was reversed, and tails carried
u-values from other Re rows.  The round-5 fix (validation.py GHIA_V)
restored the published Table II columns, cross-validated against
independently converged Newton solutions at 511^2 and 1023^2
(SCALE_RUNS.jsonl newton-chain rows: u- and v-errors both ~4% at
Re=10000, vs 23-26% concentrated entirely in v against the corrupt
rows).  These tests pin the properties any faithful transcription has,
so a regression of this class cannot return silently.
"""

import numpy as np

from naviflow_tpu.postprocessing.validation import (GHIA_U, GHIA_V, GHIA_X,
                                                    GHIA_Y)


def test_wall_values():
    for re, u in GHIA_U.items():
        assert u[0] == 0.0 and u[-1] == 1.0, re  # no-slip floor, moving lid
    for re, v in GHIA_V.items():
        assert v[0] == 0.0 and v[-1] == 0.0, re  # side walls


def test_no_uv_copy_slip():
    """The corruption signature: v[1] == u[1] to all digits (impossible
    for independent physical profiles)."""
    for re in GHIA_U:
        assert GHIA_V[re][1] != GHIA_U[re][1], re


def test_v_extrema_physical():
    """No published v-value in Table II exceeds ~0.6 in magnitude (the
    corrupt Re=10000 row had -0.68439)."""
    for re, v in GHIA_V.items():
        assert np.max(np.abs(v)) < 0.6, (re, np.max(np.abs(v)))


def test_near_wall_peak_trend():
    """|v| at x=0.9688 (first interior point, downflow at the right wall)
    deepens monotonically with Re as the boundary layer sharpens."""
    res = sorted(GHIA_V)
    vals = [abs(GHIA_V[re][1]) for re in res]
    assert vals == sorted(vals), dict(zip(res, vals))


def test_shapes():
    for re in GHIA_U:
        assert len(GHIA_U[re]) == len(GHIA_Y)
        assert len(GHIA_V[re]) == len(GHIA_X)
