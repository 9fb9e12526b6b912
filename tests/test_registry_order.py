"""Registry-order contract: the driver verifies a prefix window of
``all_queries()`` (50 entries in round 1), so iteration order IS
correctness coverage. Pin that the window spans every module and that
every windowed query is oracle-checkable and canonicalizer-safe."""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from python_mapreduce_spark.registry import (
    DRIVER_PRIORITY,
    all_queries,
    core,
    extra,
    joins,
    llm,
    mr,
    streaming,
    tpch2,
    tpch3,
    windows,
)

WINDOW = 50
SF_DIR = "/root/testdata/sf0.001"


def test_priority_prefix_is_the_window():
    names = list(all_queries())
    assert names[: len(DRIVER_PRIORITY)] == list(DRIVER_PRIORITY)
    # The first WINDOW entries are what the driver checks; entries past
    # that are an explicitly-ordered tail head (next in line if the
    # window ever widens), so the list may exceed WINDOW but not fall
    # short of it.
    assert len(DRIVER_PRIORITY) >= WINDOW


def test_window_spans_every_module():
    window = set(DRIVER_PRIORITY)
    for mod in (core, extra, tpch2, tpch3, joins, windows, mr, llm, streaming):
        assert window & set(mod.QUERIES), f"no {mod.__name__} query in driver window"


# The only registry entries with no DuckDB oracle: non-SQL-expressible
# sketch/ANN result sets and the zlib signal (DuckDB has no zlib). Each
# has an oracle-checked eval twin (q_dedup_simhash_eval,
# q_sim_ann_*_recall, q_compression_ratio_eval); the driver records a
# rows-only check for the raw form.
ROWS_ONLY_OK = {
    "q_dedup_simhash",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_sim_ann_ivf_pq",  # approximate result set; hash-green recall twin
    "q_compression_ratio",
    "q_dedup_embedding_precluster",  # IVF centroids aren't SQL-expressible
    "q_zorder_layout",  # file extents depend on range-partitioner sampling
}


def test_window_queries_all_have_oracles():
    qs = all_queries()
    missing = [
        n for n in DRIVER_PRIORITY if qs[n].sql is None and n not in ROWS_ONLY_OK
    ]
    assert not missing, f"driver-window queries without SQL oracle: {missing}"
    # every rows-only window entry must have an oracle-checked eval twin
    assert {
        "q_dedup_simhash_eval",
        "q_sim_ann_lsh_recall",
        "q_sim_ann_ivf_recall",
        "q_sim_ann_ivf_pq_recall",
        "q_compression_ratio_eval",
        "q_zorder_code",  # the deterministic curve-math twin of q_zorder_layout
    } <= set(qs)


# The driver round the current DRIVER_PRIORITY rotation was computed
# against (``tools/driver_coverage.py --plan-full`` over CORRECTNESS_r01..
# r{AS_OF}). Bump this when rotating at the start of each round — the
# invariant below is checked against that snapshot so the test stays
# green when the NEXT round's CORRECTNESS file lands.
ROTATION_AS_OF = 9


def _driver_rows_as_of(as_of: int) -> dict[str, tuple[int, dict]]:
    """name -> (latest driver round with a row, that row), files <= as_of."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m or int(m.group(1)) > as_of:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict) and (name not in rows or rnd >= rows[name][0]):
                rows[name] = (rnd, row)
    return rows


def _row_green(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        return isinstance(row.get("spark_rows"), int) and row["spark_rows"] >= 0
    return (
        not row.get("err")
        and row.get("hash_match") is True
        and bool(row.get("rows_match") and row.get("schema_match"))
    )


def test_rotation_invariant_red_before_never_before_stale():
    """The driver-coverage contract (VERDICT r6 stretch 8 + r9 item 1).

    DRIVER_PRIORITY must be four blocks, as of the rotation snapshot:
    [RED rows] + [never-checked] + [checked, ascending by latest driver
    round] + [new additions appended behind the staleness block]. Red
    rows jump the queue — a fixed-but-red query must be re-observed by
    the driver next round, not wait out its staleness position.
    Concretely: (a) every red row precedes every non-red checked row,
    (b) the non-red checked subsequence's rounds are non-decreasing,
    and (c) unchecked names sit only between the red block and the
    staleness block, or at the tail — never sandwiched inside the
    staleness block.
    """
    rows = _driver_rows_as_of(ROTATION_AS_OF)
    red = {n for n, (_, row) in rows.items() if not _row_green(row)}
    # (a) red rows first among checked entries
    checked_idx = [i for i, n in enumerate(DRIVER_PRIORITY) if n in rows]
    red_idx = [i for i in checked_idx if DRIVER_PRIORITY[i] in red]
    nonred_idx = [i for i in checked_idx if DRIVER_PRIORITY[i] not in red]
    if red_idx and nonred_idx:
        assert max(red_idx) < min(nonred_idx), "red rows must head the rotation"
    # (b) staleness queue ascending by last-checked round
    rs = [rows[DRIVER_PRIORITY[i]][0] for i in nonred_idx]
    assert rs == sorted(rs), "staleness block not sorted by last-checked round"
    # (c) unchecked names never sandwiched inside the staleness block
    if nonred_idx:
        first_stale, last_stale = nonred_idx[0], nonred_idx[-1]
        sandwiched = [
            n
            for i, n in enumerate(DRIVER_PRIORITY)
            if n not in rows and first_stale < i < last_stale
        ]
        assert not sandwiched, (
            f"unchecked queries interleaved with the staleness block: {sandwiched}"
        )


def test_no_duplicate_or_dangling_priority_names():
    qs = all_queries()
    assert len(set(DRIVER_PRIORITY)) == len(DRIVER_PRIORITY)
    assert set(DRIVER_PRIORITY) <= set(qs)


def test_lazy_window_queries_emit_atomic_columns_only(spark):
    # The driver canonicalizer (pandas sort_values over every column)
    # crashes on array/map cells — every windowed query must emit atomic
    # types. Wide decimals (precision > 18) are equally banned: Spark's
    # toPandas delivers decimal.Decimal objects where DuckDB delivers
    # float64, and the driver's value hash is representation-sensitive
    # (q_table_checksum, the one red driver row of round 8). Lazy
    # relational modules are checked here; llm/mr/streaming execute work
    # at build time and are covered by tools/audit_schemas.py plus their
    # own tests.
    from pyspark.sql.types import DecimalType

    lazy = {}
    for mod in (core, extra, tpch2, tpch3, joins, windows):
        lazy.update(mod.QUERIES)
    offenders = {}
    for name in DRIVER_PRIORITY:
        if name not in lazy:
            continue
        df = lazy[name].fn(spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ] + [
            f"{f.name} (decimal p={f.dataType.precision})"
            for f in df.schema.fields
            if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed driver-window outputs: {offenders}"
