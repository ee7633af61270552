"""The local driver simulator must mirror the REAL driver harness's failure
modes — in particular it must refuse non-scalar cells in oracle-compared
outputs instead of tuple-izing them (the round-4 text_fingerprint ERR the
sim masked)."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "driver_sim", Path(__file__).resolve().parent.parent / "scripts" / "driver_sim.py"
)
driver_sim = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_SPEC and driver_sim)


@pytest.mark.parametrize(
    "cell",
    [np.array([1, 2, 3]), [1, 2, 3], (1, 2), {"k": 1}],
    ids=["ndarray", "list", "tuple", "dict"],
)
def test_norm_cell_rejects_non_scalars(cell):
    with pytest.raises(driver_sim.NonScalarCell):
        driver_sim.norm_cell(cell)


def test_canon_rejects_array_column():
    # the exact shape of the pre-fix text_fingerprint result frame
    df = pd.DataFrame({"doc_id": [1], "fingerprint": [np.array([7, 8], dtype=np.int64)]})
    with pytest.raises(driver_sim.NonScalarCell):
        driver_sim.canon(df)


def test_canon_accepts_scalar_frame():
    df = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    cols, rows = driver_sim.canon(df)
    assert cols == ["a", "b"]
    assert len(rows) == 2
