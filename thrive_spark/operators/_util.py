"""Shared helpers for oracle-parity arithmetic.

The driver compares Spark results to DuckDB with an *exact* value
hash, so any aggregate whose floating-point summation order is
engine- or schedule-dependent must be made deterministic. Plain double
sums are not even self-consistent across Spark runs (partial-merge
order varies with task timing), and DECIMAL(38,10) accumulation costs
~3× in the hot path (measured at sf0.1).

The recipe used everywhere: **fixed-point long summation** —
``sum(floor(x*10^4 + 0.5))/10^4``. Every step (multiply, add, floor)
is IEEE-deterministic and identical in Spark and DuckDB; the sum is
exact integer arithmetic at any scale and any merge order; whole-stage
codegen sums longs faster than doubles. ``floor(x+0.5)`` is used
instead of ``round`` because the engines disagree on round-half mode
(Spark HALF_UP on exact decimal expansion, DuckDB half-away on the
double) — floor has no mode.

Semantics note: this computes the sum of inputs pre-rounded to 4
decimals, which for money-scale data is the natural fixed-point
semantics. Headroom: the scaled sum must stay under 2^63 — at 10^4
scaling that is ~9·10^14 in column units, fine up to ~10^9 rows of
~10^5-magnitude values per group; beyond that, widen to DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"
SCALE = 10000


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fixed(col: Column | str, scale: int = SCALE) -> Column:
    """x → floor(x*scale + 0.5) as long (engine-exact fixed point)."""
    return F.floor(_c(col) * scale + 0.5).cast("long")


def dsum(col: Column | str, scale: int = SCALE) -> Column:
    """Order-insensitive engine-exact sum of doubles (→ double)."""
    return F.sum(fixed(col, scale)) / float(scale)


def dsum_over(col: Column | str, w, scale: int = SCALE) -> Column:
    """Windowed engine-exact sum (DuckDB evaluates sliding frames with
    segment trees — different association order than Spark)."""
    return F.sum(fixed(col, scale)).over(w) / float(scale)


def r4(col: Column | str, nd: int = 4) -> Column:
    return F.round(_c(col), nd)


def osum(expr: str, scale: int = SCALE) -> str:
    """DuckDB SQL twin of :func:`dsum`."""
    return (
        f"sum(CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)) / {scale}.0"
    )


def osum_over(expr: str, w: str, scale: int = SCALE) -> str:
    """DuckDB SQL twin of :func:`dsum_over` (``w`` is the window name)."""
    return (
        f"sum(CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)) OVER {w} / {scale}.0"
    )


def ffix(col: Column | str, nd: int = 4) -> Column:
    """Engine-exact output rounding: floor(x·10^nd + 0.5)/10^nd.

    For a double that is already bit-identical across engines (every
    upstream op deterministic), this emits the 4-decimal presentation
    value without `round`'s engine-divergent half mode.
    """
    s = 10**nd
    return F.floor(_c(col) * s + 0.5) / float(s)


def ofix(expr: str, nd: int = 4) -> str:
    """DuckDB SQL twin of :func:`ffix`."""
    s = 10**nd
    return f"floor(({expr}) * {s} + 0.5) / {s}.0"


def oround(expr: str, nd: int = 4) -> str:
    """DuckDB round with the float→double cast (SURVEY §2: DuckDB round
    on FLOAT leaves float32 artifacts)."""
    return f"round(CAST(({expr}) AS DOUBLE), {nd})"


#: Below this row count, iterative-loop state (edge lists, label/rank
#: tables) is laid out on a single partition: per-round scheduler/task
#: fixed cost dominates on toy graphs (measured ~2x/round), and one
#: task of <=2M narrow rows is well under an executor's memory.  Above
#: it, the natural wide partitioning is kept — at 100 TB a near-dup
#: edge list is billions of rows and a single-partition round would
#: serialize them through one core (r5 verdict scale flag).
SMALL_ITER_STATE_MAX_ROWS = 2_000_000


#: regime-probe memo for compact_iter_state (r12 verdict #8, the
#: llm._FANOUT_CACHE pattern): the measured row count of a derivation
#: over an IMMUTABLE input is a constant — bench warm reps and driver
#: retries shouldn't re-run the sizing job. Caches the COUNT only;
#: the localCheckpoint itself must still happen per invocation (the
#: loop consumes those materialized blocks).
_ITER_STATE_N_CACHE: dict = {}


def compact_iter_state(
    df, small_max_rows: int | None = None, cache_key=None
):
    """Materialize loop-invariant state once and pick its layout by
    MEASURED size, not by assumption.

    Returns ``(df, n_rows)``.  The upstream derivation runs exactly
    once (``localCheckpoint`` first), so the sizing ``count()`` is a
    cheap scan of materialized blocks, not a recompute; the
    small-regime ``coalesce(1)`` is a narrow op on top of the
    checkpoint, not a second materialization.  ``small_max_rows=None``
    reads :data:`SMALL_ITER_STATE_MAX_ROWS` at call time (tests force
    the wide path by monkeypatching it to 0). ``cache_key`` (pass
    ``f"{op}:{sf_dir}"`` for a derivation of an immutable table) memos
    the measured count across invocations so repeated bench reps skip
    the probe job; the regime DECISION still reads the live
    ``small_max_rows`` each call."""
    if small_max_rows is None:
        small_max_rows = SMALL_ITER_STATE_MAX_ROWS
    df = df.localCheckpoint()
    if cache_key is not None and cache_key in _ITER_STATE_N_CACHE:
        n = _ITER_STATE_N_CACHE[cache_key]
    else:
        n = df.count()
        if cache_key is not None:
            _ITER_STATE_N_CACHE[cache_key] = n
    if n <= small_max_rows:
        df = df.coalesce(1)
    return df, n


def unit_rows(x):
    """Row-normalize a 2-D numpy array, leaving zero-norm rows ZERO
    instead of dividing by zero (r12 verdict #2): a zero vector has no
    direction, a zero row can never win a cosine comparison, and the
    masked divide keeps the ANN builders free of numpy
    ``invalid value encountered in divide`` RuntimeWarnings — the
    numpy twin of functions/vectors.py's NONZERO_EMB_SQL guard."""
    import numpy as np

    n = np.linalg.norm(x, axis=1, keepdims=True)
    out = np.zeros_like(x, dtype=np.float64)
    np.divide(x, n, out=out, where=n > 0)
    return out


_FAN_OUT_NPART_CACHE: dict = {}


def fan_out(df, target: int | None = None, cache_key=None):
    """Widen a NARROW scan to the session's core count before a heavy
    per-row map stage (r13). A small or single parquet file arrives as
    ONE input split, serializing md5/shingle/fold compute through one
    core no matter how many the session has; at real scale the input
    already lands in more splits than cores and this is a no-op — it
    never SHRINKS partitioning. Costs one round-robin shuffle of the
    projected columns, so call it only in front of map work that
    dominates that shuffle (per-shingle hashing, signature folds,
    tokenizer passes). Explicit-N repartition is deliberately used:
    AQE would coalesce a small hash-shuffle back to one partition.

    The ``df.rdd.getNumPartitions()`` probe is a driver-side physical
    planning pass on every call; pass ``cache_key`` (e.g.
    ``(sf_dir, "documents")``) to memoize the measured split count per
    immutable input — the same per-input pattern as llm._FANOUT_CACHE
    (r13 verdict #7). Keyless calls probe every time, unchanged."""
    if df.isStreaming:  # .rdd is illegal on a streaming DF; micro-
        return df       # batch sizing is the engine's job anyway
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    cur = (
        _FAN_OUT_NPART_CACHE.get(cache_key) if cache_key is not None else None
    )
    if cur is None:
        cur = df.rdd.getNumPartitions()
        if cache_key is not None:
            _FAN_OUT_NPART_CACHE[cache_key] = cur
    if cur < n:
        df = df.repartition(n)
    return df
