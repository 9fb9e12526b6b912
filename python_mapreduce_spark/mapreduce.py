"""MapReduce compatibility facade.

The reference's entire query surface is two user-supplied Python
functions: ``map_function(line, aux) -> [(key, value), ...]`` run over
input lines (reference mapper.py:41-73, template README.txt:254-261) and
``reduce_function(group, aux) -> [items]`` run over each sorted key group
(reducer.py:73-93, template README.txt:286-291), with a JSON auxiliary
document broadcast to every task (mapper.py:150-157).

This module re-expresses that surface over DataFrames so any reference
program ports line-for-line:

  * :func:`flat_map`       ≈ the map phase (O6) — mapInPandas, Arrow-batched
  * :func:`reduce_groups`  ≈ sort+group+reduce (O14+O17+O18) — applyInPandas
  * :func:`broadcast_aux`  ≈ auxiliary data (O22) — a real Spark broadcast
  * :func:`run_mapreduce`  ≈ one whole reference job (scan -> map ->
    shuffle -> reduce), minus the cluster babysitting (SURVEY.md §3)

Scale contract: both hooks run arbitrary Python, which is the slow path
by design — this is the escape hatch, not the default. Anything
expressible as built-in DataFrame ops should use the named operators in
``operators/``. ``reduce_groups`` materializes one key group per pandas
DataFrame (unlike the reference's DiskList streaming escape hatch,
disk_list.py:6-63); for groups that can exceed executor memory, use an
algebraic rewrite or ``rdd.groupByKey`` iterators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _field_names(schema: str) -> list[str]:
    """Column names from a DDL schema string ('token string, n long')."""
    return [part.strip().split()[0] for part in schema.split(",")]


def resolve_function(
    qualified: str,
    *,
    project_dir: str | None = None,
    reload: bool = True,
) -> Callable:
    """Resolve a user function BY NAME, re-importing its module so
    on-disk edits take effect per job — the reference's dynamic function
    registry (mapper.py:44-53: ``sys.path.insert(project_path); import
    map_functions; reload(map_functions)`` then pick the function by its
    configured name; same in reducer.py for reduce_functions).

    ``qualified`` is ``'module:function'`` (or dotted
    ``'pkg.module.function'``). ``project_dir``, when given, is
    prepended to ``sys.path`` for the import and removed after — the
    reference's per-project source layout. ``reload=False`` skips the
    re-import for callers that resolve once per process.

    Resolution happens on the DRIVER at plan-build time; the resolved
    callable is then shipped in the task closure like any other. (The
    reference reloads on every job start, not per task — same cadence.)
    """
    import importlib  # noqa: PLC0415
    import sys  # noqa: PLC0415

    if ":" in qualified:
        mod_name, _, fn_name = qualified.partition(":")
    else:
        mod_name, _, fn_name = qualified.rpartition(".")
    if not mod_name or not fn_name:
        raise ValueError(
            f"expected 'module:function' or 'pkg.module.function', got {qualified!r}"
        )
    added = False
    if project_dir is not None and project_dir not in sys.path:
        sys.path.insert(0, project_dir)
        added = True
    try:
        mod = importlib.import_module(mod_name)
        if reload:
            mod = importlib.reload(mod)
        fn = getattr(mod, fn_name)
    finally:
        if added:
            sys.path.remove(project_dir)
    if not callable(fn):
        raise TypeError(f"{qualified} resolved to non-callable {type(fn).__name__}")
    if project_dir is not None:
        # Project modules live on the driver only — executors can't
        # import them. Registering the module for by-value pickling
        # ships the CURRENT function code inside the task closure (and
        # keeps reload semantics honest on workers: each job serializes
        # the freshly reloaded code, no stale executor-side import).
        try:  # pragma: no cover - depends on bundled cloudpickle API
            from pyspark import cloudpickle  # noqa: PLC0415

            cloudpickle.register_pickle_by_value(mod)
        except (ImportError, AttributeError):
            pass
    return fn


def _as_callable(fn: Callable | str, project_dir: str | None = None) -> Callable:
    """Accept a callable or a 'module:function' name (reference O7)."""
    if callable(fn):
        return fn
    return resolve_function(fn, project_dir=project_dir)


def broadcast_aux(spark: SparkSession, aux: Any):
    """Ship auxiliary data to every task (reference O22).

    The reference re-reads a JSON file from shared disk in every map and
    reduce task (mapper.py:150-157, reducer.py:141-148); a Spark
    broadcast ships it once per executor.
    """
    return spark.sparkContext.broadcast(aux)


def flat_map(
    df: DataFrame,
    fn: Callable[[tuple, Any], Iterable[tuple]] | str,
    schema: str,
    aux: Any = None,
    project_dir: str | None = None,
) -> DataFrame:
    """The reference map phase (O6): one input row -> zero or more output
    rows.

    ``fn(row, aux)`` receives each input row as a tuple (single-column
    inputs are unwrapped to the bare value, matching the reference's
    "raw line in" contract, mapper.py:58-59) and returns an iterable of
    output tuples matching ``schema``. Rows flow through Arrow batches;
    only the user function itself is per-row Python. ``fn`` may also be
    a ``'module:function'`` name, resolved from ``project_dir`` with
    per-job reload semantics (:func:`resolve_function`).
    """
    fn = _as_callable(fn, project_dir)
    out_cols = _field_names(schema)
    in_cols = df.columns
    unwrap = len(in_cols) == 1
    b = broadcast_aux(df.sparkSession, aux)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = b.value
        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False, name=None):
                out.extend(fn(row[0] if unwrap else row, a))
            if out:
                yield pd.DataFrame(out, columns=out_cols)

    return df.mapInPandas(gen, schema)


def reduce_groups(
    df: DataFrame,
    keys: str | Sequence[str],
    fn: Callable[[tuple, pd.DataFrame, Any], Iterable[tuple] | pd.DataFrame] | str,
    schema: str,
    aux: Any = None,
    project_dir: str | None = None,
) -> DataFrame:
    """The reference reduce phase (O17+O18): the whole group for one key,
    as one call.

    ``fn(key, group_pdf, aux)`` sees every row for ``key`` at once —
    exactly the reference's sorted-group contract (disk_sort.py:39-75) —
    and returns output tuples or a pandas DataFrame matching ``schema``.
    Row order within the group is NOT deterministic (shuffle arrival
    order); order-sensitive reduces must sort ``group_pdf`` themselves,
    and float summations should use ``math.fsum`` for order-independent
    exactness. ``fn`` may also be a ``'module:function'`` name, resolved
    from ``project_dir`` with per-job reload (:func:`resolve_function`).
    """
    fn = _as_callable(fn, project_dir)
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    out_cols = _field_names(schema)
    b = broadcast_aux(df.sparkSession, aux)

    def apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        out = fn(key, pdf, b.value)
        if isinstance(out, pd.DataFrame):
            return out
        return pd.DataFrame(list(out), columns=out_cols)

    return df.groupBy(*key_cols).applyInPandas(apply, schema)


def reduce_groups_streaming(
    df: DataFrame,
    keys: str | Sequence[str],
    fn: Callable[[tuple, Iterator[tuple], Any], Iterable[tuple]],
    schema: str,
    aux: Any = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Whole-group reduce for groups that may EXCEED executor memory —
    the Spark twin of the reference's DiskList escape hatch
    (disk_based_input, reducer.py:76-86, disk_list.py:6-63).

    Where :func:`reduce_groups` materializes each group as one pandas
    DataFrame, here ``fn(key, rows_iter, aux)`` receives the group as a
    LAZY iterator of value tuples: PySpark's ``groupByKey`` backs it
    with an external (spilling) merge, so a single huge group streams
    from disk instead of OOM-ing — same contract the reference offers.

    Slow path squared (pickled rows, no Arrow, no codegen): use only
    when a group genuinely can't fit; prefer an algebraic rewrite
    (partial aggregation) or :func:`reduce_groups` otherwise.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    val_cols = [c for c in df.columns if c not in key_cols]
    b = broadcast_aux(df.sparkSession, aux)

    def run(kv: tuple) -> Iterable[tuple]:
        key, rows = kv
        return fn(key, iter(rows), b.value)

    pairs = df.rdd.map(
        lambda row: (
            tuple(row[k] for k in key_cols),
            tuple(row[c] for c in val_cols),
        )
    )
    grouped = (
        pairs.groupByKey(num_partitions) if num_partitions else pairs.groupByKey()
    )
    return df.sparkSession.createDataFrame(grouped.flatMap(run), schema)


def to_pairs(df: DataFrame, key_col: str, value_cols: Sequence[str] | None = None):
    """Expose a DataFrame as the reference's raw (key, value) RDD surface
    (item = (key, value), README.txt:259-261; key = item[0],
    mapper.py:61).

    Only for genuinely imperative per-partition logic — everything
    relational should stay in DataFrames where Catalyst can see it.
    """
    cols = value_cols or [c for c in df.columns if c != key_col]
    return df.rdd.map(lambda row: (row[key_col], tuple(row[c] for c in cols)))


def pairs_to_df(pairs, schema: str) -> DataFrame:
    """Back from (key, value-tuple) pairs to a typed DataFrame."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return spark.createDataFrame(pairs.map(lambda kv: (kv[0], *kv[1])), schema)


def run_mapreduce(
    df: DataFrame,
    map_fn: Callable[[tuple, Any], Iterable[tuple]] | str,
    map_schema: str,
    reduce_fn: Callable[[tuple, pd.DataFrame, Any], Iterable[tuple] | pd.DataFrame] | str,
    reduce_schema: str,
    aux: Any = None,
    key: str | Sequence[str] | None = None,
    project_dir: str | None = None,
) -> DataFrame:
    """One reference job end-to-end: map -> shuffle on the first output
    column -> whole-group reduce (the fixed physical pipeline of
    SURVEY.md §0: scan -> flatMap -> hash shuffle -> sort -> group ->
    reduce). Key defaults to the first map-output column, matching
    ``item[0]`` (reference mapper.py:61).

    ``map_fn`` / ``reduce_fn`` may be ``'module:function'`` names,
    resolved from ``project_dir`` with per-job reload — the reference's
    full project layout (map_functions.py / reduce_functions.py resolved
    by configured name, mapper.py:44-53)."""
    map_fn = _as_callable(map_fn, project_dir)
    reduce_fn = _as_callable(reduce_fn, project_dir)
    mapped = flat_map(df, map_fn, map_schema, aux=aux)
    group_key = key if key is not None else _field_names(map_schema)[0]
    return reduce_groups(mapped, group_key, reduce_fn, reduce_schema, aux=aux)
