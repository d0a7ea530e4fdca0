"""Vectorized spreadsheet cell formatting — docs/SPANS.md §3.5.

Exact rule set of the reference cell formatter
(/root/reference/ocr_toolkit/processors/excel_processor.py:206-242), applied
as masked NumPy/pandas operations over ALL cells of a batch at once instead of
per-cell Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ISO_DT = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"
_INT = r"^[+-]?\d+$"
_FLOAT = r"^[+-]?(\d+\.\d*|\.\d+|\d+\.)([eE][+-]?\d+)?$|^[+-]?\d+[eE][+-]?\d+$"


def format_cells(cells: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """Format a Series of raw cell strings per the reference rules.

    Returns (formatted, nonfinite_mask).  A cell like '1e999' matches the
    float regex but floats to ±inf; the oracle's per-cell str(int(x)) raises
    OverflowError there, which its per-doc containment turns into an error
    row.  The vectorized kernel must not let one such cell fail the whole
    Spark task, so those cells pass through unformatted and are flagged in
    nonfinite_mask — the caller marks the owning documents as error rows
    with the oracle's exact message."""
    s = cells.fillna("").astype(str)
    out = s.copy()
    nonfinite = np.zeros(len(s), dtype=bool)

    empty = s.eq("")
    is_dt = ~empty & s.str.match(_ISO_DT)
    is_int = ~empty & ~is_dt & s.str.match(_INT)
    is_float = ~empty & ~is_dt & ~is_int & s.str.match(_FLOAT)
    is_str = ~empty & ~is_dt & ~is_int & ~is_float

    if is_dt.any():
        out[is_dt] = s[is_dt].str.replace("T", " ", regex=False)
    # int literals render unchanged (str(int(x)) round-trips)
    if is_float.any():
        f = s[is_float].astype(float)
        finite = np.isfinite(f.to_numpy())
        nonfinite[is_float.to_numpy()] = ~finite
        whole = (f == np.trunc(f)) & finite
        rendered = s[is_float].copy()  # non-finite cells pass through raw
        rendered[finite] = f[finite].map("{:.2f}".format)
        # python int conversion, not astype(int64): whole floats beyond
        # ±2^63 must render exactly like the oracle's str(int(x))
        rendered[whole] = f[whole].map(lambda v: str(int(v)))
        out[is_float] = rendered
    if is_str.any():
        t = s[is_str].str.replace("|", "\\|", regex=False)
        long = t.str.len() > 100
        t[long] = t[long].str.slice(0, 97) + "..."
        out[is_str] = t
    return out, nonfinite
