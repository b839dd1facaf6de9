"""Distributed exact second-moment statistics (variance / standard
deviation / covariance / correlation) per group.

Floating-point summation is order-dependent, so a distributed engine
can never bitwise-match a sequential engine's ``VAR_SAMP`` by summing
doubles.  This stage takes the same route as the repo's money handling
(`pipelines/relational/_shared.py:_cents`): values are integer units (cents),
all moments are EXACT integer sums, and floating point enters only in
the final scalar expression — which the DuckDB oracles mirror
operand-for-operand (HUGEINT moment arithmetic, one CAST to DOUBLE per
operand, the same division/sqrt order), so results are bit-identical
and partitioning-invariant.

Scale shape: one vectorized per-block pass builds per-(block, group)
moment partials — ``n``, ``Σx``, ``Σx²`` (and ``Σy``, ``Σy²``, ``Σxy``
for pairs) — then ONE ``sorted_group_aggregate`` merges them (the
shuffle moves one row per group per block, never data rows).  Squares
and the global sums are ``decimal128(38, 0)``: an int64 Σx² overflows
at ~10¹⁹ (a single 10⁶-row block of 10⁷-cent values crosses it), while
decimal128 holds 10³⁸ — enough for 10¹² rows of 10¹³-cent² squares.
Arrow's C++ hash aggregate sums decimal128 natively, so the partial
pass stays vectorized.  The finalize pass runs exact Python-int
arithmetic over the REDUCED output (one row per group) — unbounded
precision where magnitudes are largest and row counts smallest.

Semantics match SQL aggregates over non-null inputs: rows where the
value (either value, for pairs) is NULL are excluded, matching
``VAR_SAMP`` / ``CORR`` null handling; groups with n <= 1 yield NULL
variance (n <= 1) / NULL correlation (zero variance), as in SQL.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import sorted_group_aggregate

__all__ = ["grouped_var_std", "grouped_corr", "grouped_regression",
           "grouped_skew_kurt"]

_DEC = pa.decimal128(38, 0)
# element products are computed in int64 numpy (Arrow's decimal multiply
# derives precision 19+19+1 > 38 for int64 operands, so it can't express
# this); the guard keeps |x·y| provably inside int64 — cents-scale data
# is orders of magnitude below it (3e9 cents = $30M per single value)
_EL_MAX = 3_037_000_499  # floor(sqrt(2^63 - 1))


def _np(col: pa.Array) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _check_el(x: np.ndarray, y: np.ndarray | None = None) -> None:
    hi = int(np.abs(x).max(initial=0))
    if y is not None:
        hi = max(hi, int(np.abs(y).max(initial=0)))
    if hi > _EL_MAX:
        raise ValueError(
            f"element magnitude {hi} exceeds the int64-safe product bound "
            f"{_EL_MAX}; rescale the unit before grouped moments")


def _sq_dec(col: pa.Array) -> pa.Array:
    x = _np(col)
    _check_el(x)
    return pc.cast(pa.array(x * x, type=pa.int64()), _DEC)


def _prod_dec(a: pa.Array, b: pa.Array) -> pa.Array:
    x, y = _np(a), _np(b)
    _check_el(x, y)
    return pc.cast(pa.array(x * y, type=pa.int64()), _DEC)


def _valid_mask(*cols):
    m = None
    for c in cols:
        v = pc.is_valid(c)
        m = v if m is None else pc.and_(m, v)
    return m


def grouped_var_std(ds, key: str, x_col: str):
    """Per-group sample variance + stddev over an int64 column.

    Returns a Dataset ``(key, n:int64, sum_x:int64, var_x:double,
    std_x:double)`` with ``var_x = (n·Σx² − (Σx)²) / (n·(n−1))``
    evaluated as ``float(exact_int) / float(exact_int)`` — the same
    IEEE steps as the oracle's ``CAST(HUGEINT AS DOUBLE) / CAST(HUGEINT
    AS DOUBLE)`` — and ``std_x = sqrt(var_x)`` (IEEE sqrt is correctly
    rounded in both engines).  NULL x rows are excluded; n <= 1 groups
    get NULL var/std.
    """
    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(_valid_mask(batch.column(x_col)))
        if b.num_rows == 0:
            return pa.table({key: pa.array([], type=batch.schema.field(key).type),
                             "n": pa.array([], type=pa.int64()),
                             "sx": pa.array([], type=_DEC),
                             "sxx": pa.array([], type=_DEC)})
        x = b.column(x_col).combine_chunks()
        t = pa.table({key: b.column(key),
                      "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                      "sx": pc.cast(x, _DEC),
                      "sxx": _sq_dec(x)})
        g = t.group_by(key, use_threads=False).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sxx", "sum")])
        return pa.table({key: g.column(key), "n": g.column("n_sum"),
                         "sx": g.column("sx_sum"), "sxx": g.column("sxx_sum")})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    merged = sorted_group_aggregate(
        partials, key, [("n", "sum"), ("sx", "sum"), ("sxx", "sum")],
        precombine=False)

    def finalize(batch: pa.Table) -> pa.Table:
        # exact big-int arithmetic over the reduced rows (one per group)
        ns = batch.column("n").to_pylist()
        sxs = [int(v) for v in batch.column("sx").to_pylist()]
        sxxs = [int(v) for v in batch.column("sxx").to_pylist()]
        var = []
        std = []
        for n, sx, sxx in zip(ns, sxs, sxxs):
            if n <= 1:
                var.append(None)
                std.append(None)
                continue
            v = float(n * sxx - sx * sx) / float(n * (n - 1))
            var.append(v)
            std.append(math.sqrt(v))
        return pa.table({key: batch.column(key),
                         "n": batch.column("n"),
                         "sum_x": pc.cast(batch.column("sx"), pa.int64()),
                         "var_x": pa.array(var, type=pa.float64()),
                         "std_x": pa.array(std, type=pa.float64())})

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


_SK_EL_MAX = 31_622_776  # x² < 10^15 keeps x³ in decimal128(25), x⁴ in (33)


def _pow_dec(x_arr: pa.Array) -> tuple:
    """Exact elementwise x³ and x⁴ as decimal128 columns.

    int64 holds x² for any cents-scale value but x⁴ of a 10⁵-cent value
    is already 10²⁰, so the higher powers go through Arrow decimal
    multiply: x → decimal(8), x² → decimal(16) (int64 squares are exact
    under the guard), then decimal×decimal gives precision 25 (x³) and
    33 (x⁴) — both inside decimal128.  Arrow only casts int64 to
    decimal(19+), hence the two-step cast down to the narrow types.
    """
    x = _np(x_arr)
    hi = int(np.abs(x).max(initial=0))
    if hi > _SK_EL_MAX:
        raise ValueError(
            f"element magnitude {hi} exceeds the decimal128-safe 4th-moment "
            f"bound {_SK_EL_MAX}; rescale the unit before grouped moments")
    d19 = pa.decimal128(19, 0)
    dx = pc.cast(pc.cast(pa.array(x, type=pa.int64()), d19),
                 pa.decimal128(8, 0))
    dxx = pc.cast(pc.cast(pa.array(x * x, type=pa.int64()), d19),
                  pa.decimal128(16, 0))
    x3 = pc.cast(pc.multiply(dx, dxx), _DEC)
    x4 = pc.cast(pc.multiply(dxx, dxx), _DEC)
    return x3, x4


def grouped_skew_kurt(ds, key: str, x_col: str):
    """Per-group skewness and excess kurtosis over an int64 column, on
    the exact-moment plan: per-(block, group) partials carry ``n, Σx,
    Σx², Σx³, Σx⁴`` as decimal128 integer sums (order-independent), one
    ``sorted_group_aggregate`` merges them, and floating point enters
    only in the final mirrored expression over the reduced rows:

        μ  = Σx/n                      (every operand CAST from exact)
        m2 = Σx²/n − μ²
        m3 = Σx³/n − 3μ(Σx²/n) + 2μ³
        m4 = Σx⁴/n − 4μ(Σx³/n) + 6μ²(Σx²/n) − 3μ⁴
        skew = m3 / (√m2)³ ;  kurt = m4/m2² − 3

    (population moments — the convention-free form; the oracle mirrors
    the identical IEEE step order so results are bit-identical).  NULL
    x rows are excluded; n ≤ 1 or non-positive float m2 (all-equal
    groups, or cancellation at extreme μ/σ ratios) yields NULL —
    gated on the mirrored float so both engines agree on the boundary.

    Returns ``(key, n:int64, skew_x:double, kurt_x:double)``.
    """
    moments = ("sx", "sxx", "sx3", "sx4")

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(_valid_mask(batch.column(x_col)))
        if b.num_rows == 0:
            return pa.table({key: pa.array([], type=batch.schema.field(key).type),
                             "n": pa.array([], type=pa.int64()),
                             **{c: pa.array([], type=_DEC) for c in moments}})
        x = b.column(x_col).combine_chunks()
        x3, x4 = _pow_dec(x)
        t = pa.table({key: b.column(key),
                      "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                      "sx": pc.cast(x, _DEC), "sxx": _sq_dec(x),
                      "sx3": x3, "sx4": x4})
        aggs = [("n", "sum")] + [(c, "sum") for c in moments]
        g = t.group_by(key, use_threads=False).aggregate(aggs)
        return pa.table({key: g.column(key),
                         **{c: g.column(f"{c}_sum") for c, _ in aggs}})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    aggs = [("n", "sum")] + [(c, "sum") for c in moments]
    merged = sorted_group_aggregate(partials, key, aggs, precombine=False)

    def finalize(batch: pa.Table) -> pa.Table:
        ns = batch.column("n").to_pylist()
        ints = {c: [int(v) for v in batch.column(c).to_pylist()]
                for c in moments}
        skews, kurts = [], []
        for i, n in enumerate(ns):
            if n <= 1:
                skews.append(None)
                kurts.append(None)
                continue
            nd = float(n)
            f_sx, f_sxx = float(ints["sx"][i]), float(ints["sxx"][i])
            f_sx3, f_sx4 = float(ints["sx3"][i]), float(ints["sx4"][i])
            mu = f_sx / nd
            m2 = f_sxx / nd - mu * mu
            if m2 <= 0.0:
                skews.append(None)
                kurts.append(None)
                continue
            m3 = f_sx3 / nd - 3.0 * mu * (f_sxx / nd) + 2.0 * mu * mu * mu
            m4 = (f_sx4 / nd - 4.0 * mu * (f_sx3 / nd)
                  + 6.0 * mu * mu * (f_sxx / nd) - 3.0 * mu * mu * mu * mu)
            s = math.sqrt(m2)
            skews.append(m3 / (s * s * s))
            kurts.append(m4 / (m2 * m2) - 3.0)
        return pa.table({key: batch.column(key),
                         "n": batch.column("n"),
                         "skew_x": pa.array(skews, type=pa.float64()),
                         "kurt_x": pa.array(kurts, type=pa.float64())})

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_corr(ds, key: str, x_col: str, y_col: str):
    """Per-group sample covariance + Pearson correlation over two int64
    columns.  Rows where either value is NULL are excluded (SQL ``CORR``
    semantics).

    Returns ``(key, n:int64, covar_xy:double, corr_xy:double)`` with
    ``covar_xy = (n·Σxy − Σx·Σy) / (n·(n−1))`` and
    ``corr_xy = (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² −
    (Σy)²)`` — numerator/denominators exact ints, then the identical
    IEEE step order as the oracle (cast, sqrt, two divisions).  Zero
    variance on either side yields NULL corr; n <= 1 yields NULL both.
    """
    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(_valid_mask(batch.column(x_col), batch.column(y_col)))
        empty_cols = {key: pa.array([], type=batch.schema.field(key).type),
                      "n": pa.array([], type=pa.int64()),
                      **{c: pa.array([], type=_DEC)
                         for c in ("sx", "sy", "sxx", "syy", "sxy")}}
        if b.num_rows == 0:
            return pa.table(empty_cols)
        x = b.column(x_col).combine_chunks()
        y = b.column(y_col).combine_chunks()
        t = pa.table({key: b.column(key),
                      "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                      "sx": pc.cast(x, _DEC), "sy": pc.cast(y, _DEC),
                      "sxx": _sq_dec(x), "syy": _sq_dec(y),
                      "sxy": _prod_dec(x, y)})
        aggs = [("n", "sum")] + [(c, "sum")
                                 for c in ("sx", "sy", "sxx", "syy", "sxy")]
        g = t.group_by(key, use_threads=False).aggregate(aggs)
        return pa.table({key: g.column(key),
                         **{c: g.column(f"{c}_sum")
                            for c, _ in aggs}})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    aggs = [("n", "sum")] + [(c, "sum")
                             for c in ("sx", "sy", "sxx", "syy", "sxy")]
    merged = sorted_group_aggregate(partials, key, aggs, precombine=False)

    def finalize(batch: pa.Table) -> pa.Table:
        ns = batch.column("n").to_pylist()
        ints = {c: [int(v) for v in batch.column(c).to_pylist()]
                for c in ("sx", "sy", "sxx", "syy", "sxy")}
        cov = []
        corr = []
        for i, n in enumerate(ns):
            if n <= 1:
                cov.append(None)
                corr.append(None)
                continue
            sx, sy = ints["sx"][i], ints["sy"][i]
            sxx, syy, sxy = ints["sxx"][i], ints["syy"][i], ints["sxy"][i]
            num = n * sxy - sx * sy
            cov.append(float(num) / float(n * (n - 1)))
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx <= 0 or dy <= 0:
                corr.append(None)
                continue
            corr.append(float(num) / math.sqrt(float(dx))
                        / math.sqrt(float(dy)))
        return pa.table({key: batch.column(key),
                         "n": batch.column("n"),
                         "covar_xy": pa.array(cov, type=pa.float64()),
                         "corr_xy": pa.array(corr, type=pa.float64())})

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def grouped_regression(ds, key: str, x_col: str, y_col: str):
    """Per-group simple linear regression (least squares) over two
    int64 columns, on the same exact-decimal128-moments plan as
    ``grouped_corr``: numerators/denominators are exact Python ints
    from the reduced partials, then ONE mirrored IEEE expression each —

        slope     = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Rows with a NULL on either side are excluded (SQL ``REGR_*``
    semantics); n ≤ 1 or zero x-variance yields NULL slope/intercept.
    Returns ``(key, n:int64, slope:double, intercept:double)``."""
    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(_valid_mask(batch.column(x_col),
                                     batch.column(y_col)))
        empty_cols = {key: pa.array([], type=batch.schema.field(key).type),
                      "n": pa.array([], type=pa.int64()),
                      **{c: pa.array([], type=_DEC)
                         for c in ("sx", "sy", "sxx", "sxy")}}
        if b.num_rows == 0:
            return pa.table(empty_cols)
        x = b.column(x_col).combine_chunks()
        y = b.column(y_col).combine_chunks()
        t = pa.table({key: b.column(key),
                      "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                      "sx": pc.cast(x, _DEC), "sy": pc.cast(y, _DEC),
                      "sxx": _sq_dec(x), "sxy": _prod_dec(x, y)})
        aggs = [("n", "sum")] + [(c, "sum")
                                 for c in ("sx", "sy", "sxx", "sxy")]
        g = t.group_by(key, use_threads=False).aggregate(aggs)
        return pa.table({key: g.column(key),
                         **{c: g.column(f"{c}_sum") for c, _ in aggs}})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    aggs = [("n", "sum")] + [(c, "sum") for c in ("sx", "sy", "sxx", "sxy")]
    merged = sorted_group_aggregate(partials, key, aggs, precombine=False)

    def finalize(batch: pa.Table) -> pa.Table:
        ns = batch.column("n").to_pylist()
        ints = {c: [int(v) for v in batch.column(c).to_pylist()]
                for c in ("sx", "sy", "sxx", "sxy")}
        slopes, inters = [], []
        for i, n in enumerate(ns):
            sx, sy = ints["sx"][i], ints["sy"][i]
            sxx, sxy = ints["sxx"][i], ints["sxy"][i]
            dx = n * sxx - sx * sx
            if n <= 1 or dx <= 0:
                slopes.append(None)
                inters.append(None)
                continue
            sl = float(n * sxy - sx * sy) / float(dx)
            slopes.append(sl)
            inters.append((float(sy) - sl * float(sx)) / float(n))
        return pa.table({key: batch.column(key),
                         "n": batch.column("n"),
                         "slope": pa.array(slopes, type=pa.float64()),
                         "intercept": pa.array(inters, type=pa.float64())})

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)
