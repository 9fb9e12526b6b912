"""Property-based tests (hypothesis): operators whose correctness has a
trusted independent formulation are checked on randomized inputs, not
just fixtures — the reference's behavior-space is user programs, so edge
shapes (dup timestamps, empty keys, one-sided keys) matter.

Spark session startup dominates per-example cost, so each property runs
a moderate number of examples against one shared session.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


_ts = st.integers(min_value=0, max_value=50)
_key = st.sampled_from(["a", "b", "c"])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_key, _ts, st.integers(-100, 100)), max_size=12),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # The window-based distributed as-of join (operators/joins.py) must
    # agree with pandas.merge_asof (backward, by-key, <= semantics) on
    # arbitrary key/timestamp shapes: duplicate timestamps, keys missing
    # on one side, empty right side.
    ldf = spark.createDataFrame(
        [(k, t) for k, t in left], "k string, ts long"
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for k, t, v in right], "k string, ts long, v long"
    )
    from python_mapreduce_spark.operators.joins import asof_join

    got = (
        asof_join(ldf, rdf, "k", "ts", "ts", ["v"])
        .orderBy("k", "ts")
        .toPandas()
    )

    lp = pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(right, columns=["k", "ts", "v"])
        if right
        else pd.DataFrame({"k": pd.Series(dtype=object), "ts": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")})
    )
    # With duplicate right timestamps the window formulation
    # deterministically carries the GREATEST v per (k, ts) (value
    # tiebreak in the window ordering); reduce the pandas side the same
    # way before merge_asof, whose own dup handling is insertion-order.
    rp = rp.groupby(["k", "ts"], as_index=False).max().sort_values("ts", kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    exp = exp.sort_values(["k", "ts"], kind="stable").reset_index(drop=True)

    got_vals = [
        (r.k, r.ts, None if pd.isna(r.v_asof) else int(r.v_asof))
        for r in got.itertuples()
    ]
    exp_vals = [
        (r.k, r.ts, None if pd.isna(r.v) else int(r.v))
        for r in exp.itertuples()
    ]
    assert sorted(got_vals) == sorted(exp_vals)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    )
)
def test_dsum_is_partition_order_independent(spark, vals):
    # dsum's DECIMAL(18,6) accumulation must give the identical rounded
    # result at any parallelism — the money-sum determinism contract
    # (functions/scalar.py).
    from python_mapreduce_spark.functions.scalar import dsum

    cents = [round(v, 2) for v in vals]
    one = spark.createDataFrame([(v,) for v in cents], "x double").coalesce(1)
    many = spark.createDataFrame([(v,) for v in cents], "x double").repartition(7)
    a = one.agg(dsum(F.col("x")).alias("s")).collect()[0].s
    b = many.agg(dsum(F.col("x")).alias("s")).collect()[0].s
    assert a == b


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_key, _ts, st.integers(-100, 100)), max_size=12),
)
def test_asof_join_forward_matches_pandas_merge_asof(spark, left, right):
    # Forward direction: earliest right row with ts >= left ts. The right
    # side is deduped to one row per (k, ts) BEFORE the join — with
    # duplicate right timestamps both engines pick an arbitrary member,
    # so the property is only well-defined on deduped input.
    from python_mapreduce_spark.operators.joins import asof_join

    rp = (
        pd.DataFrame(right, columns=["k", "ts", "v"])
        if right
        else pd.DataFrame({"k": pd.Series(dtype=object), "ts": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")})
    )
    rp = rp.groupby(["k", "ts"], as_index=False).last().sort_values("ts", kind="stable")

    ldf = spark.createDataFrame([(k, t) for k, t in left], "k string, ts long")
    rdf = spark.createDataFrame(
        [(r.k, int(r.ts), int(r.v)) for r in rp.itertuples()] or [],
        "k string, ts long, v long",
    )
    got = (
        asof_join(ldf, rdf, "k", "ts", "ts", ["v"], direction="forward")
        .orderBy("k", "ts")
        .toPandas()
    )

    lp = pd.DataFrame(left, columns=["k", "ts"]).sort_values("ts", kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    exp = exp.sort_values(["k", "ts"], kind="stable").reset_index(drop=True)

    got_vals = [
        (r.k, r.ts, None if pd.isna(r.v_asof) else int(r.v_asof))
        for r in got.itertuples()
    ]
    exp_vals = [
        (r.k, r.ts, None if pd.isna(r.v) else int(r.v))
        for r in exp.itertuples()
    ]
    assert sorted(got_vals) == sorted(exp_vals)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(st.integers(-20, 120), min_size=1, max_size=25),
    ranges=st.lists(
        st.tuples(st.integers(-10, 100), st.integers(0, 40), st.integers(0, 2)),
        min_size=1,
        max_size=6,
    ),
    width=st.sampled_from([3.0, 7.0, 50.0]),
)
def test_bucketed_range_join_matches_nlj(spark, facts, ranges, width):
    # The bucket-grid rewrite must equal the nested-loop range join on
    # arbitrary (possibly overlapping, empty, or misaligned) ranges and
    # any bucket width.
    from python_mapreduce_spark.operators.joins import bucketed_range_join, range_join

    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(facts)], "fid long, value double"
    )
    rdf = spark.createDataFrame(
        [(float(lo), float(lo + span), f"r{tag}{j}") for j, (lo, span, tag) in enumerate(ranges)],
        "lo double, hi double, tag string",
    )
    nlj = {
        (r.fid, r.tag) for r in range_join(fdf, rdf, "value", "lo", "hi").collect()
    }
    bucketed = {
        (r.fid, r.tag)
        for r in bucketed_range_join(
            fdf, rdf, "value", "lo", "hi", bucket_width=width
        ).collect()
    }
    assert bucketed == nlj


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40))
def test_global_row_number_matches_sorted_enumeration(spark, vals):
    # Distributed numbering must equal sorted enumeration for any input,
    # including duplicate order-key values (tiebroken by id).
    from python_mapreduce_spark.operators.windows import global_row_number

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r.id: r.rn
        for r in global_row_number(df, ["v", "id"], num_partitions=4).collect()
    }
    want = {
        i: rn + 1
        for rn, (i, _) in enumerate(sorted(enumerate(vals), key=lambda t: (t[1], t[0])))
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    # Distributed min-label propagation vs a trusted driver-side
    # union-find on arbitrary graphs: self-loops, duplicate edges,
    # multiple islands, chains.
    from python_mapreduce_spark.llm.dedup import connected_components

    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.node: r.cluster for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    # Docs assembled from a tiny word pool so near-dup pairs actually
    # occur; the data parameter draws per-doc choices inside the test.
    data=st.data(),
    n_docs=st.integers(min_value=2, max_value=7),
)
def test_incremental_dedup_equals_batch_canonical_min(spark, tmp_path_factory, data, n_docs):
    # The incremental corpus dedup (streaming/dedup.py) must reach the
    # SAME decisions as the one-shot batch canonical-min rule (dup iff
    # an exact-Jaccard >= 0.8 pair with a lower-id doc) on arbitrary
    # corpora and an arbitrary ingest split — including all-in-first,
    # all-in-second, chains of copies, and no-dup corpora. Banding is
    # densified (16x2) so candidate recall at borderline j~0.8 is
    # ~1-1e-7 — the default 8x4 misses ~1.5% of j=0.8 pairs, which
    # would make this test flaky; precision is unaffected (exact
    # verification filters false candidates).
    from python_mapreduce_spark.llm.dedup import ngram_jaccard_pairs
    from python_mapreduce_spark.streaming.dedup import incremental_minhash_dedup

    base_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = []
    for i in range(n_docs):
        if i > 0 and data.draw(st.booleans(), label=f"copy_{i}"):
            # near-copy of an earlier doc with a small suffix change
            src = data.draw(st.integers(0, i - 1), label=f"src_{i}")
            docs.append((i, docs[src][1] + " " + data.draw(st.sampled_from(base_words), label=f"suffix_{i}")))
        else:
            words = data.draw(
                st.lists(st.sampled_from(base_words), min_size=12, max_size=20),
                label=f"words_{i}",
            )
            docs.append((i, " ".join(words)))
    split = data.draw(st.integers(0, n_docs), label="split")

    tmp = tmp_path_factory.mktemp("incr_prop")
    in_dir, state = str(tmp / "in"), str(tmp / "state")
    frames = []
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    if split > 0:
        ddf.filter(F.col("doc_id") < split).coalesce(1).write.mode("append").parquet(in_dir)
        frames.append(
            incremental_minhash_dedup(spark, in_dir, state, str(tmp / "ck"), bands=16, rows=2)
        )
    if split < n_docs:
        ddf.filter(F.col("doc_id") >= split).coalesce(1).write.mode("append").parquet(in_dir)
        frames.append(
            incremental_minhash_dedup(spark, in_dir, state, str(tmp / "ck"), bands=16, rows=2)
        )

    got = {}
    for f in frames:
        got.update(dict(zip(f["id"], f["is_dup"])))

    # ground truth: exact Jaccard pairs over the whole corpus
    pairs = ngram_jaccard_pairs(ddf, "doc_id", "text", n=3, threshold=0.8).collect()
    dup_ids = {r.id2 for r in pairs}
    want = {i: (i in dup_ids) for i, _ in docs}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40, unique=True),
    w_train=st.floats(min_value=0.0, max_value=1.0),
    w_val=st.floats(min_value=0.0, max_value=1.0),
    salt=st.sampled_from(["", "v2", "epoch-3"]),
)
def test_hash_split_matches_hashlib_replay(spark, ids, w_train, w_val, salt):
    # A third, independent engine: replay the md5-bucket rule with
    # Python's hashlib on arbitrary ids/weights/salts and require
    # Spark's assignment to agree row-for-row. This pins the exact rule
    # (hex rendering, strict <, cumulative thresholds, full-coverage
    # clause) rather than just its aggregate proportions.
    import hashlib

    from python_mapreduce_spark.operators.relational import hash_split

    splits = (("train", w_train), ("val", w_val), ("test", 0.1))
    total = w_train + w_val + 0.1
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = dict(
        hash_split(df, "doc_id", splits, salt=salt).select("doc_id", "split").collect()
    )

    def expect(i: int) -> str:
        bucket = hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:4]
        cum = 0.0
        for name, w in splits[:-1]:
            cum += w / total
            t = round(cum * 65536)
            if t >= 65536 or bucket < format(min(0xFFFF, max(0, t)), "04x"):
                return name
        return splits[-1][0]

    assert got == {i: expect(i) for i in ids}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.floats(min_value=-0.5, max_value=1.5, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
)
def test_weighted_sample_matches_hashlib_replay(spark, rows):
    # Same independent replay for the per-row rule, including weights
    # outside [0, 1] (clamped by the >= 1 / <= 0 branches).
    import hashlib
    import math

    from python_mapreduce_spark.operators.relational import weighted_sample

    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r.doc_id for r in weighted_sample(df, "doc_id", "w").collect()}

    def keeps(i: int, w: float) -> bool:
        if w >= 1.0:
            return True
        if w <= 0.0:
            return False
        bucket = hashlib.md5(str(i).encode()).hexdigest()[:4]
        return bucket < format(math.floor(w * 65536), "04x")

    assert got == {i for i, w in rows if keeps(i, w)}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.floats(min_value=-0.5, max_value=3.5, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    ),
)
def test_repeat_sample_matches_hashlib_replay(spark, rows):
    # Independent replay of the multiplicity rule: floor(w) copies plus
    # an md5-bucket fractional extra, copies numbered 1..n.
    import hashlib
    import math

    from python_mapreduce_spark.operators.relational import repeat_sample

    df = spark.createDataFrame(rows, "doc_id long, w double")
    got: dict[int, set[int]] = {}
    for r in repeat_sample(df, "doc_id", "w").collect():
        got.setdefault(r.doc_id, set()).add(r.copy)

    def mult(i: int, w: float) -> int:
        n = math.floor(w)
        frac = w - n
        if frac > 0:
            bucket = hashlib.md5(str(i).encode()).hexdigest()[:4]
            if bucket < format(math.floor(frac * 65536), "04x"):
                n += 1
        return max(n, 0)

    want = {i: set(range(1, mult(i, w) + 1)) for i, w in rows if mult(i, w) > 0}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40, unique=True),
    k=st.integers(min_value=1, max_value=5),
    salt=st.sampled_from(["", "v2"]),
)
def test_group_reservoir_matches_hashlib_replay(spark, ids, k, salt):
    # Independent replay of the reservoir ranking: sort each group by
    # (md5(id || salt), id), keep the first k.
    import hashlib

    from python_mapreduce_spark.operators.relational import group_reservoir

    df = spark.createDataFrame([(i, i % 2) for i in ids], "doc_id long, grp long")
    got = {
        (r.grp, r.doc_id, r.rk)
        for r in group_reservoir(df, "grp", "doc_id", k, salt=salt).collect()
    }
    want = set()
    for g in (0, 1):
        members = sorted(
            (i for i in ids if i % 2 == g),
            key=lambda i: (hashlib.md5(f"{i}{salt}".encode()).hexdigest(), i),
        )
        want |= {(g, i, rk) for rk, i in enumerate(members[:k], start=1)}
    assert got == want


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(_word, min_size=0, max_size=10), min_size=1, max_size=8
    )
)
def test_segment_dedup_matches_python_replay(spark, docs):
    # segment_dedup's global first-occurrence rule replayed in plain
    # Python over arbitrary small corpora: duplicate segments within and
    # across docs, partial tail segments, empty docs.
    from python_mapreduce_spark.llm.text import segment_dedup

    seg = 3
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    got = {
        r.id: (r.n_segments, r.n_kept, r.text_dedup)
        for r in segment_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id", "text", seg_tokens=seg,
        ).collect()
    }

    owner: dict[str, tuple[int, int]] = {}
    segments: dict[int, list[tuple[int, str]]] = {}
    for i, words in enumerate(docs):
        segs = [" ".join(words[p : p + seg]) for p in range(0, len(words), seg)]
        segments[i] = list(enumerate(segs))
        for pos, s in enumerate(segs):
            if s not in owner or (i, pos) < owner[s]:
                owner[s] = (i, pos)
    for i, words in enumerate(docs):
        kept = [s for pos, s in segments[i] if owner[s] == (i, pos)]
        assert got[i] == (len(segments[i]), len(kept), " ".join(kept)), (i, docs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),            # user
            st.integers(0, 30),           # ts (ms)
            st.sampled_from(["v", "c", "b"]),  # step
        ),
        min_size=0,
        max_size=25,
    )
)
def test_funnel_matches_python_replay(spark, events):
    # funnel's sequential strictly-after mins replayed in plain Python:
    # duplicate timestamps, missing steps, users entering mid-funnel.
    from python_mapreduce_spark.operators.events import funnel

    df = spark.createDataFrame(
        [(u, t, s) for u, t, s in events], "u long, ms long, s string"
    ).select("u", F.timestamp_millis("ms").alias("ts"), "s")
    got = {
        r.step: r.n_users
        for r in funnel(df, "u", "ts", "s", ["v", "c", "b"]).collect()
    }

    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, t, s in events:
        by_user.setdefault(u, []).append((t, s))
    counts = [0, 0, 0]
    for u, evs in by_user.items():
        cur = None
        for i, step in enumerate(["v", "c", "b"]):
            if i == 0:
                ts_ = [t for t, s in evs if s == step]
            else:
                ts_ = [t for t, s in evs if s == step and t > cur]
            if not ts_:
                break
            cur = min(ts_)
            counts[i] += 1
    assert [got[1], got[2], got[3]] == counts, events


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 2),           # key
            st.integers(0, 20),          # ts ms
            st.integers(100, 104),       # unique-ified below
            st.sampled_from(["A", "B", None]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_scd2_history_matches_python_replay(spark, obs):
    # scd2_history replayed in Python: change-point detection with
    # NULL states, same-ms ties broken by a unique event id.
    from python_mapreduce_spark.operators.windows import scd2_history

    rows = [(k, t, i, a) for i, (k, t, _, a) in enumerate(obs)]
    df = spark.createDataFrame(
        rows, "k long, ms long, eid long, a string"
    ).select("k", F.timestamp_millis("ms").alias("ts"), "eid", "a")
    got = {}
    for r in scd2_history(df, "k", "ts", "a", tiebreak="eid").collect():
        got.setdefault(r.key, []).append(
            (r.attr, int(r.valid_from.timestamp() * 1000),
             None if r.valid_to is None else int(r.valid_to.timestamp() * 1000),
             r.is_current)
        )
    for v in got.values():
        v.sort(key=lambda x: (x[1], x[2] is None, x[2] if x[2] is not None else 0))

    expect: dict[int, list] = {}
    by_key: dict[int, list] = {}
    for k, t, i, a in rows:
        by_key.setdefault(k, []).append((t, i, a))
    for k, evs in by_key.items():
        evs.sort()
        marks = []
        prev = object()
        for t, i, a in evs:
            if a != prev:
                marks.append((a, t))
            prev = a
        out = []
        for j, (a, t) in enumerate(marks):
            nxt = marks[j + 1][1] if j + 1 < len(marks) else None
            out.append((a, t, nxt, nxt is None))
        expect[k] = out
    assert got == expect, rows


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 1),                    # key
            st.integers(0, 500_000),              # ts ms
            st.integers(-50, 50),                 # value
        ),
        min_size=1,
        max_size=20,
    )
)
def test_resample_locf_matches_python_replay(spark, obs):
    # resample_locf replayed in Python: ms-exact last-per-bucket with
    # value tiebreak, full grid per key span, forward fill.
    from python_mapreduce_spark.operators.windows import resample_locf

    step = 60  # seconds
    df = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in obs], "k long, ms long, v double"
    ).select("k", F.timestamp_millis("ms").alias("ts"), "v")
    got = {
        (r.k, int(r.bucket_ts.timestamp())): (r.value, r.filled)
        for r in resample_locf(df, ["k"], "ts", "v", interval_seconds=step).collect()
    }

    by_key: dict[int, dict[int, tuple[int, float]]] = {}
    for k, t, v in obs:
        b = (t // (step * 1000)) * step
        cur = by_key.setdefault(k, {}).get(b)
        if cur is None or (t, float(v)) > cur:
            by_key[k][b] = (t, float(v))
    expect = {}
    for k, buckets in by_key.items():
        lo, hi = min(buckets), max(buckets)
        last = None
        for b in range(lo, hi + step, step):
            if b in buckets:
                last = buckets[b][1]
                expect[(k, b)] = (last, False)
            else:
                expect[(k, b)] = (last, True)
    assert got == expect, obs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    samples=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 30), st.integers(0, 40)),
        min_size=1,
        max_size=20,
    )
)
def test_counter_increase_matches_python_replay(spark, samples):
    from python_mapreduce_spark.operators.windows import counter_increase

    df = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in samples], "k long, ms long, v double"
    ).select("k", F.timestamp_millis("ms").alias("ts"), "v")
    # exact-duplicate (k, ts, v) rows put a None increase next to a 0.0
    # one — tuple sort would compare None < float and crash, so the
    # tiebreak key is None-safe (None sorts first)
    none_safe = lambda r: (r[0], r[1], r[2], r[3] is not None, r[3] or 0.0)  # noqa: E731
    got = sorted(
        (
            (r.k, int(r.ts.timestamp() * 1000), r.value, r.increase)
            for r in counter_increase(df, ["k"], "ts", "v").collect()
        ),
        key=none_safe,
    )
    by_key: dict[int, list[tuple[int, float]]] = {}
    for k, t, v in samples:
        by_key.setdefault(k, []).append((t, float(v)))
    expect = []
    for k, evs in by_key.items():
        evs.sort()
        prev = None
        for t, v in evs:
            inc = None if prev is None else (v - prev if v >= prev else v)
            expect.append((k, t, v, inc))
            prev = v
    assert got == sorted(expect, key=none_safe), samples


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    activity=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 12)),  # (user, day offset)
        min_size=1,
        max_size=25,
    )
)
def test_cohort_retention_matches_python_replay(spark, activity):
    import datetime

    from python_mapreduce_spark.operators.events import cohort_retention

    base = datetime.date(2024, 3, 1)
    rows = [
        (u, (base + datetime.timedelta(days=d)).isoformat()) for u, d in activity
    ]
    df = spark.createDataFrame(rows, "u long, d string").select(
        "u", F.to_timestamp("d").alias("ts")
    )
    got = {
        r.cohort.isoformat(): (r.n_users, r.n_day1, r.n_day7)
        for r in cohort_retention(df, "u", "ts", horizons=(1, 7)).collect()
    }

    first: dict[int, int] = {}
    days: dict[int, set] = {}
    for u, d in activity:
        first[u] = min(first.get(u, d), d)
        days.setdefault(u, set()).add(d)
    expect: dict[str, list] = {}
    for u, f0 in first.items():
        key = (base + datetime.timedelta(days=f0)).isoformat()
        e = expect.setdefault(key, [0, 0, 0])
        e[0] += 1
        e[1] += 1 if (f0 + 1) in days[u] else 0
        e[2] += 1 if (f0 + 7) in days[u] else 0
    assert got == {k: tuple(v) for k, v in expect.items()}, activity


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=9),
        min_size=1,
        max_size=6,
    )
)
def test_remove_duplicate_spans_matches_python_replay(spark, docs):
    # Lee-et-al span removal replayed in Python: overlapping covered
    # positions union; spans removed from ALL copies; n=3 grams.
    from python_mapreduce_spark.llm.text import remove_duplicate_spans

    n = 3
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    got = {
        r.id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id", "text", n=n, min_df=2,
        ).collect()
    }

    gram_docs: dict[tuple, set] = {}
    for i, ws in enumerate(docs):
        for p in range(len(ws) - n + 1):
            gram_docs.setdefault(tuple(ws[p : p + n]), set()).add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    for i, ws in enumerate(docs):
        covered = set()
        for p in range(len(ws) - n + 1):
            if tuple(ws[p : p + n]) in dup:
                covered.update(range(p, p + n))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        assert got[i] == (len(ws), len(covered), " ".join(kept)), (i, docs)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.dictionaries(st.integers(0, 8), st.integers(0, 3), max_size=8),
    b=st.dictionaries(st.integers(0, 8), st.integers(0, 3), max_size=8),
)
def test_diff_tables_matches_python_replay(spark, a, b):
    from python_mapreduce_spark.operators.relational import diff_tables

    da = spark.createDataFrame(list(a.items()) or [(None, None)], "id long, v long")
    db = spark.createDataFrame(list(b.items()) or [(None, None)], "id long, v long")
    if not a:
        da = da.filter("id IS NOT NULL")
    if not b:
        db = db.filter("id IS NOT NULL")
    got = {r.id: r.status for r in diff_tables(da, db, "id", ["v"]).collect()}
    expect = {}
    for k in set(a) | set(b):
        if k not in b:
            expect[k] = "only_a"
        elif k not in a:
            expect[k] = "only_b"
        else:
            expect[k] = "same" if a[k] == b[k] else "changed"
    assert got == expect, (a, b)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.sets(st.integers(0, 500), min_size=2, max_size=25),
    salt=st.sampled_from(["", "e2"]),
)
def test_negative_samples_matches_hashlib_replay(spark, ids, salt):
    # the full negative assignment replayed with hashlib: md5 rank, the
    # stride rule, self-pair skip.
    import hashlib

    from python_mapreduce_spark.operators.windows import negative_samples

    k = 2
    df = spark.createDataFrame([(i,) for i in sorted(ids)], "doc_id long")
    got = sorted(
        (r.anchor_id, r.j, r.neg_id)
        for r in negative_samples(df, "doc_id", k=k, salt=salt).collect()
    )
    ranked = sorted(ids, key=lambda i: (hashlib.md5(f"{i}{salt}".encode()).hexdigest(), i))
    rank_of = {i: r + 1 for r, i in enumerate(ranked)}
    n = len(ids)
    step = max(n // (k + 1), 1)
    expect = []
    for i in ids:
        r = rank_of[i]
        for j in (1, 2):
            nr = ((r - 1 + step * j) % n) + 1
            if nr != r:
                expect.append((i, j, ranked[nr - 1]))
    assert got == sorted(expect), (sorted(ids), salt)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 30)), min_size=1, max_size=15
    ),
    seq_len=st.sampled_from([1, 4, 16]),
    salt=st.sampled_from(["", "e2"]),
)
def test_chunk_pack_matches_python_replay(spark, rows, seq_len, salt):
    # chunk_pack must equal the obvious sequential replay: unique ids in
    # md5(id||salt) order, tokens laid end-to-end, chunked every seq_len
    # tokens. Covers zero-token docs (emit nothing), doc > seq_len
    # (straddles many), and re-dealing salts.
    import hashlib

    from python_mapreduce_spark.operators.windows import chunk_pack

    dedup = {i: t for i, t in rows}  # unique ids (module contract)
    df = spark.createDataFrame(list(dedup.items()), "id long, t long")
    got = {
        (r.id, r.seq_id): (r.doc_offset, r.seq_offset, r.n_tokens)
        for r in chunk_pack(df, "id", "t", seq_len, salt=salt).collect()
    }
    expect = {}
    pos = 0
    order = sorted(
        dedup, key=lambda i: (hashlib.md5((str(i) + salt).encode()).hexdigest(), i)
    )
    for i in order:
        t = dedup[i]
        start, end = pos, pos + t
        pos = end
        if t == 0:
            continue
        for s in range(start // seq_len, (end - 1) // seq_len + 1):
            g0, g1 = max(start, s * seq_len), min(end, (s + 1) * seq_len)
            expect[(i, s)] = (g0 - start, g0 - s * seq_len, g1 - g0)
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 60), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=25,
    ),
    salt=st.sampled_from(["", "s1"]),
)
def test_stratified_exact_split_matches_python_replay(spark, rows, salt):
    # Exact stratified split must equal the sequential replay: within
    # each stratum, md5 order, first floor(0.8n) train, next to
    # floor(0.9n) val, rest test. Covers 1-row strata (everything
    # lands in test: floor(0.8*1) = 0).
    import hashlib

    from python_mapreduce_spark.operators.relational import stratified_exact_split

    dedup = {i: s for i, s in rows}
    df = spark.createDataFrame(list(dedup.items()), "id long, s string")
    got = {
        r.id: r.split
        for r in stratified_exact_split(df, ["s"], "id", salt=salt).collect()
    }
    expect = {}
    by_s = {}
    for i, sv in dedup.items():
        by_s.setdefault(sv, []).append(i)
    for sv, ids in by_s.items():
        ids.sort(key=lambda i: (hashlib.md5((str(i) + salt).encode()).hexdigest(), i))
        n = len(ids)
        cut1, cut2 = int(0.8 * n), int((0.8 + 0.1) * n)
        for rank, i in enumerate(ids, start=1):
            expect[i] = "train" if rank <= cut1 else ("val" if rank <= cut2 else "test")
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    b=st.lists(st.integers(0, 40), min_size=1, max_size=30),
)
def test_ks_statistic_matches_python_replay(spark, a, b):
    # The packed-composite distributed KS must equal the textbook
    # sequential ECDF sweep: D = max over distinct values of
    # |ECDF_a - ECDF_b|. Covers ties, disjoint supports, one-point
    # samples.
    from python_mapreduce_spark.operators.aggregates import ks_statistic

    da = spark.createDataFrame([(float(v),) for v in a], "value double")
    db = spark.createDataFrame([(float(v),) for v in b], "value double")
    row = ks_statistic(da, db, "value").collect()[0]

    vals = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    ca = cb = 0
    d = 0.0
    for v in vals:
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        d = max(d, abs(ca / na - cb / nb))
    import math

    assert (row.n_a, row.n_b) == (na, nb)
    assert math.isclose(row.ks_stat, math.floor(d * 1e6 + 0.5) / 1e6, abs_tol=1e-9)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ref=st.lists(st.integers(0, 30), min_size=2, max_size=40),
    cur=st.lists(st.integers(0, 30), min_size=2, max_size=40),
)
def test_psi_drift_matches_python_replay(spark, ref, cur):
    # PSI over reference-decile buckets must match the sequential
    # replay: numpy linear percentiles rounded 1e-6, strict-< bucket
    # rule, eps-floored proportions, per-term 1e-8 round, final 1e-6
    # round. ln() may differ by an ulp between JVM and libm, so the
    # comparison carries a 2e-6 tolerance.
    import math

    import numpy as np

    from python_mapreduce_spark.operators.aggregates import psi_drift

    dr = spark.createDataFrame([("k", float(v)) for v in ref], "g string, value double")
    dc = spark.createDataFrame([("k", float(v)) for v in cur], "g string, value double")
    row = psi_drift(dr, dc, ["g"], "value", n_bins=10).collect()[0]

    def dround(x, s):
        m = 10**s
        return math.floor(x * m + 0.5) / m

    thr = [dround(float(np.percentile(ref, q * 10)), 6) for q in range(1, 10)]
    buckets = {}
    for side, data in (("r", ref), ("c", cur)):
        for v in data:
            b = 1 + sum(1 for t in thr if t < v)
            buckets.setdefault(b, [0, 0])
            buckets[b][0 if side == "r" else 1] += 1
    tr, tc = float(len(ref)), float(len(cur))
    psi = 0.0
    for b, (nr, nc) in buckets.items():
        pr = max(nr / tr, 1e-4)
        pc = max(nc / tc, 1e-4)
        psi += dround((pc - pr) * math.log(pc / pr), 8)
    assert (row.n_ref, row.n_cur) == (len(ref), len(cur))
    assert math.isclose(row.psi, dround(psi, 6), abs_tol=2e-6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=24).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_cdc_chunk_dedup_matches_python_replay(spark, docs):
    # Content-defined chunking must equal the sequential replay:
    # boundaries where md5(prev + ' ' + tok)[0:8] as int % 8 == 0,
    # chunks judged duplicated when their content recurs in ANOTHER
    # document. Covers empty docs and whole-doc single chunks.
    import hashlib
    import math
    import re

    from python_mapreduce_spark.llm.dedup import cdc_chunk_dedup

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r.id: (r.n_tokens, r.n_chunks, r.n_dup_chunks, r.dup_token_coverage)
        for r in cdc_chunk_dedup(df, "doc_id", "text", boundary_mod=8).collect()
    }

    chunks_by_doc = {}
    for i, text in enumerate(docs):
        toks = re.findall(r"[a-z]+", text.lower())
        chunks, cur = [], []
        for p, tok in enumerate(toks):
            if p > 0:
                h = int(hashlib.md5(f"{toks[p-1]} {tok}".encode()).hexdigest()[:8], 16)
                if h % 8 == 0:
                    chunks.append(cur)
                    cur = []
            cur.append(tok)
        if cur:
            chunks.append(cur)
        chunks_by_doc[i] = chunks
    owners = {}
    for i, chunks in chunks_by_doc.items():
        for c in chunks:
            owners.setdefault(" ".join(c), set()).add(i)
    for i, chunks in chunks_by_doc.items():
        n_tokens = sum(len(c) for c in chunks)
        n_dup = sum(1 for c in chunks if len(owners[" ".join(c)]) > 1)
        dup_toks = sum(len(c) for c in chunks if len(owners[" ".join(c)]) > 1)
        cov = math.floor(dup_toks / n_tokens * 1e6 + 0.5) / 1e6 if n_tokens else 0.0
        assert got[i] == (n_tokens, len(chunks), n_dup, cov), f"doc {i}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 80), st.integers(0, 500)),
        min_size=2,
        max_size=40,
    ),
    salt=st.sampled_from(["", "e2"]),
)
def test_length_buckets_matches_python_replay(spark, rows, salt):
    # Length-bucketed batching must equal the sequential replay:
    # global quartile thresholds (numpy linear, rounded 1e-6), strict-<
    # bucket rule, md5(id||salt) deal order, batches of 4. Covers
    # heavily-duplicated lengths (uneven buckets) and 1-row buckets.
    import hashlib
    import math

    import numpy as np

    from python_mapreduce_spark.operators.windows import length_buckets

    dedup = {i: ln for i, ln in rows}
    df = spark.createDataFrame(list(dedup.items()), "id long, len long")
    got = {
        (r.bucket, r.batch_id): (r.n_rows, r.min_len, r.max_len, r.sum_len, r.padding_tokens)
        for r in length_buckets(df, "id", "len", n_buckets=4, batch_size=4, salt=salt).collect()
    }

    lens = list(dedup.values())
    thr = [
        math.floor(float(np.percentile(lens, q)) * 1e6 + 0.5) / 1e6 for q in (25, 50, 75)
    ]
    by_bucket = {}
    for i, ln in dedup.items():
        b = 1 + sum(1 for t in thr if t < ln)
        by_bucket.setdefault(b, []).append(i)
    expect = {}
    for b, ids in by_bucket.items():
        ids.sort(key=lambda i: (hashlib.md5((str(i) + salt).encode()).hexdigest(), i))
        for bi in range(0, len(ids), 4):
            batch = ids[bi : bi + 4]
            ls = [dedup[i] for i in batch]
            expect[(b, bi // 4)] = (
                len(batch),
                min(ls),
                max(ls),
                sum(ls),
                len(batch) * max(ls) - sum(ls),
            )
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=12).map(" ".join),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_ngram_diversity_matches_python_replay(spark, docs):
    # n-gram diversity must equal the sequential set replay per
    # (source, n). Covers docs shorter than n (no grams at that order)
    # and sources whose docs are all empty.
    import math
    import re

    from python_mapreduce_spark.llm.text import ngram_diversity

    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(docs)], "doc_id long, source string, text string"
    )
    got = {
        (r.source, r.n): (r.total_grams, r.distinct_grams, r.diversity)
        for r in ngram_diversity(df, ["source"], "text", max_n=3).collect()
    }
    expect = {}
    for s, t in docs:
        toks = re.findall(r"[a-z]+", t.lower())
        for n in (1, 2, 3):
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            tot, dis = expect.setdefault((s, n), [0, set()])
            expect[(s, n)][0] += len(grams)
            expect[(s, n)][1].update(grams)
    for key, (tot, dis) in expect.items():
        div = math.floor(len(dis) / tot * 1e6 + 0.5) / 1e6 if tot else None
        assert got[key] == (tot, len(dis), div), key
    assert set(got) == set(expect)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8).map(" ".join),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_chi2_terms_matches_python_replay(spark, docs):
    # Every returned (label, term) row's incidence count and chi2 must
    # match the textbook 2x2 contingency replay (1e-3 tolerance covers
    # expression-order float drift), and ranks must be 1..k ordered by
    # (chi2 DESC, term ASC).
    import math
    import re

    from python_mapreduce_spark.llm.text import chi2_terms

    df = spark.createDataFrame(
        [(i, l, t) for i, (l, t) in enumerate(docs)], "doc_id long, lang string, text string"
    )
    rows = chi2_terms(df, "doc_id", "lang", "text", k=3).collect()

    inc = {}
    n_l = {}
    for i, (l, t) in enumerate(docs):
        n_l[l] = n_l.get(l, 0) + 1
        for term in set(re.findall(r"[a-z]+", t.lower())):
            inc.setdefault((term, l), set()).add(i)
    df_t = {}
    for (term, l), s in inc.items():
        df_t[term] = df_t.get(term, 0) + len(s)
    n = len(docs)
    by_label = {}
    for r in rows:
        a = len(inc.get((r.term, r.label), set()))
        assert r.n_label_docs_with_term == a, (r.label, r.term)
        b = df_t[r.term] - a
        c = n_l[r.label] - a
        d = n - n_l[r.label] - b
        denom = (a + b) * (c + d) * (a + c) * (b + d)
        chi2 = n * (a * d - b * c) * (a * d - b * c) / denom if denom > 0 else 0.0
        assert math.isclose(r.chi2, math.floor(chi2 * 1e4 + 0.5) / 1e4, abs_tol=1e-3)
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: (-r.chi2, r.term))
        assert [r.term for r in ordered] == [r.term for r in rs]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    convs=st.lists(st.tuples(_key, st.integers(0, 100)), min_size=1, max_size=10),
    touches=st.lists(st.tuples(_key, st.integers(0, 100)), max_size=12),
    window=st.sampled_from([1, 5, 100]),
)
def test_last_touch_attribution_matches_python_replay(spark, convs, touches, window):
    # Last-touch attribution must equal the sequential replay: the
    # latest touch at-or-before each conversion (ties -> max touch id),
    # credited only within the window. Covers no-touch users, exact-tie
    # timestamps, and windows that exclude everything.
    from datetime import datetime, timezone

    from python_mapreduce_spark.operators.events import last_touch_attribution

    def ts(minute):
        return datetime(2024, 1, 1, minute // 60, minute % 60, tzinfo=timezone.utc)

    conv_rows = [(i, u, ts(m)) for i, (u, m) in enumerate(convs)]
    touch_rows = [(1000 + i, u, ts(m)) for i, (u, m) in enumerate(touches)]
    cdf = spark.createDataFrame(conv_rows, "event_id long, user_id string, ts timestamp")
    tdf = spark.createDataFrame(
        touch_rows or [(0, "zz", ts(0))], "event_id long, user_id string, ts timestamp"
    )
    if not touch_rows:
        tdf = tdf.filter("event_id < 0")
    got = {
        r.conv_id: (r.touch_id, r.attributed)
        for r in last_touch_attribution(
            cdf, tdf, "user_id", "ts", "event_id", window_minutes=window
        ).collect()
    }
    for i, (u, m) in enumerate(convs):
        cands = [
            (tm, 1000 + j)
            for j, (tu, tm) in enumerate(touches)
            if tu == u and tm <= m
        ]
        best = max(cands) if cands else None
        if best and (m - best[0]) <= window:
            assert got[i] == (best[1], True), i
        else:
            assert got[i] == (None, False), i


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from(["a", "b", "c", "d"])),
        min_size=1,
        max_size=30,
    )
)
def test_assoc_rules_matches_python_replay(spark, rows):
    # Support/confidence/lift must equal the set-based replay over
    # distinct baskets. Covers repeated (basket, item) rows (must
    # dedup) and items never co-occurring (absent from output).
    import math

    from python_mapreduce_spark.operators.events import assoc_rules

    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r.antecedent, r.consequent): (r.n_both, r.support, r.confidence, r.lift)
        for r in assoc_rules(df, "b", "i").collect()
    }
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    items = sorted({i for _, i in rows})
    n_b = len(baskets)
    n_item = {i: sum(1 for s in baskets.values() if i in s) for i in items}
    expect = {}
    for a in items:
        for c in items:
            if a == c:
                continue
            both = sum(1 for s in baskets.values() if a in s and c in s)
            if both < 1:
                continue

            def dr(x):
                return math.floor(x * 1e6 + 0.5) / 1e6

            expect[(a, c)] = (
                both,
                dr(both / n_b),
                dr(both / n_item[a]),
                dr(both / n_item[a] / (n_item[c] / n_b)),
            )
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.sampled_from(["x", "y", "z", None])),
        min_size=1,
        max_size=30,
    )
)
def test_mix_entropy_matches_python_replay(spark, rows):
    # Entropy must equal the sequential replay (1e-8 term round, sum,
    # 1e-6 final round; ln ulp drift -> 2e-6 tolerance). NULL categories
    # count as their own category; single-category groups normalize to 0.
    import math

    from python_mapreduce_spark.operators.aggregates import mix_entropy

    df = spark.createDataFrame(rows, "g string, c string")
    got = {
        r.g: (r.n_rows, r.n_categories, r.entropy, r.entropy_norm)
        for r in mix_entropy(df, ["g"], "c").collect()
    }

    def dr(x, s):
        m = 10**s
        return math.floor(x * m + 0.5) / m

    groups = {}
    for g, c in rows:
        groups.setdefault(g, {}).setdefault(c, 0)
        groups[g][c] += 1
    for g, counts in groups.items():
        t = sum(counts.values())
        ent = dr(sum(dr(-(n / t) * math.log(n / t), 8) for n in counts.values()), 6)
        k = len(counts)
        norm = dr(ent / math.log(k), 6) if k > 1 else 0.0
        rn, rk, re_, rnorm = got[g]
        assert (rn, rk) == (t, k)
        assert math.isclose(re_, ent, abs_tol=2e-6)
        assert math.isclose(rnorm, norm, abs_tol=2e-6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 100)),  # (day offset, int value)
        min_size=1,
        max_size=40,
    ),
    period=st.sampled_from([2, 7]),
)
def test_seasonal_residual_matches_python_replay(spark, obs, period):
    # Seasonal-naive residuals must equal the sequential replay: daily
    # integer-exact totals, CALENDAR-lag baseline (the total observed
    # exactly `period` days earlier, NULL when that day has no data —
    # sparse days must NOT slide the baseline onto a different weekday),
    # MAD threshold at 3x. Covers gaps and all-zero residuals (MAD 0 ->
    # nothing flagged).
    import math
    from datetime import datetime, timezone

    import numpy as np

    from python_mapreduce_spark.operators.windows import seasonal_residual

    rows = [
        ("k", datetime(2024, 1, 1 + d, 12, 0, tzinfo=timezone.utc), float(v))
        for d, v in obs
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = {
        str(r.day): (r.daily_total, r.baseline, r.residual, r.is_anomaly)
        for r in seasonal_residual(df, ["k"], "ts", "value", period_days=period).collect()
    }
    daily = {}
    for d, v in obs:
        daily[d] = daily.get(d, 0) + v
    days = sorted(daily)
    resid = {}
    for d in days:
        base = daily.get(d - period)
        resid[d] = (daily[d], base, None if base is None else daily[d] - base)
    rs = [abs(r) for _, _, r in resid.values() if r is not None]
    mad = math.floor(float(np.percentile(rs, 50)) * 1e6 + 0.5) / 1e6 if rs else None
    for d in days:
        tot, base, r = resid[d]
        key = f"2024-01-{1 + d:02d}"
        anom = r is not None and mad is not None and mad > 0 and abs(r) >= 3.0 * mad
        gt, gb, gr, ga = got[key]
        assert gt == float(tot) and gb == (None if base is None else float(base))
        assert gr == (None if r is None else float(r)) and ga == anom, key


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),
            st.integers(0, 5),  # minute -> recency
            st.one_of(st.none(), st.integers(0, 9)),  # value (nullable)
            st.one_of(st.none(), st.sampled_from(["p", "q"])),  # props (nullable)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_golden_record_matches_python_replay(spark, rows):
    # The max(struct) survivor must equal the sequential survivorship
    # replay: most fields populated, then latest, then highest id.
    # Covers all-NULL payloads and exact recency ties.
    from datetime import datetime, timezone

    from python_mapreduce_spark.operators.relational import golden_record

    data = [
        (i, u, datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc),
         None if v is None else float(v), p)
        for i, (u, m, v, p) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id string, ts timestamp, value double, props string"
    )
    got = {
        r.user_id: (r.completeness, r.tiebreak, r.value, r.props)
        for r in golden_record(
            df, ["user_id"], ["value", "props"], "ts", "event_id", ["value", "props"]
        ).collect()
    }
    best = {}
    for i, (u, m, v, p) in enumerate(rows):
        score = (int(v is not None) + int(p is not None), m, i)
        if u not in best or score > best[u][0]:
            best[u] = (score, (score[0], i, None if v is None else float(v), p))
    assert got == {u: payload for u, (_, payload) in best.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.tuples(_key, st.integers(0, 50), st.integers(0, 30)), max_size=12),
    b=st.lists(st.tuples(_key, st.integers(0, 50), st.integers(0, 30)), max_size=12),
    width=st.sampled_from([1, 7, 100]),
)
def test_interval_overlap_join_matches_bruteforce(spark, a, b, width):
    # The bucket-grid interval join must emit exactly the brute-force
    # overlap pair set, each pair once, at any bucket width. Covers
    # touching endpoints, spans >> width, and empty sides.
    from python_mapreduce_spark.operators.joins import interval_overlap_join

    arows = [(i, k, s, s + d) for i, (k, s, d) in enumerate(a)]
    brows = [(100 + i, k, s, s + d) for i, (k, s, d) in enumerate(b)]
    schema = "id long, k string, start long, end long"
    adf = spark.createDataFrame(arows or [(0, "zz", 0, 0)], schema)
    bdf = spark.createDataFrame(brows or [(0, "zz", 0, 0)], schema)
    if not arows:
        adf = adf.filter("id < 0")
    if not brows:
        bdf = bdf.filter("id < 0")
    got = {
        (r.k, r.a_id, r.b_id): (r.overlap_start, r.overlap_end, r.overlap_ms)
        for r in interval_overlap_join(
            adf, bdf, ["k"], "id", "id", bucket_width=width
        ).collect()
    }
    expect = {}
    for i, k, s1, e1 in arows:
        for j, k2, s2, e2 in brows:
            if k == k2 and s1 <= e2 and s2 <= e1:
                os_, oe = max(s1, s2), min(e1, e2)
                expect[(k, i, j)] = (os_, oe, oe - os_)
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 1000)),  # (x day, y cents)
        min_size=1,
        max_size=30,
    )
)
def test_group_ols_matches_numpy_polyfit(spark, rows):
    # The sufficient-statistics OLS must agree with the closed-form
    # replay on exact sums (1e-5 tolerance absorbs expression-order
    # float drift). Degenerate x variance -> NULL slope; constant y ->
    # NULL r2.
    import math

    from python_mapreduce_spark.operators.aggregates import group_ols

    data = [("g", float(x), y / 100.0) for x, y in rows]
    df = spark.createDataFrame(data, "g string, x double, y double")
    r = group_ols(df, ["g"], "x", "y").collect()[0]

    n = len(rows)
    xs = [x for x, _ in rows]
    ys = [y / 100.0 for _, y in rows]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    assert r.n == n
    if var_x <= 0:
        assert r.slope is None and r.intercept is None and r.r2 is None
    else:
        slope = cov_n / var_x
        assert math.isclose(r.slope, slope, abs_tol=1e-5)
        assert math.isclose(r.intercept, (sy - slope * sx) / n, abs_tol=1e-5)
        if var_y <= 0:
            assert r.r2 is None
        else:
            assert math.isclose(r.r2, cov_n * cov_n / (var_x * var_y), abs_tol=1e-5)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=3, max_size=10).map(
            " ".join
        ),
        min_size=2,
        max_size=8,
    )
)
def test_containment_pairs_matches_set_replay(spark, docs):
    # Directed containment must equal the set replay
    # |sh(src) ∩ sh(dst)| / |sh(src)| over distinct 3-gram shingles,
    # thresholded at 0.6 on the 1e-4-rounded value, both directions.
    import math
    import re

    from python_mapreduce_spark.llm.dedup import containment_pairs

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_pairs(df, "doc_id", "text", n=3, threshold=0.6).collect()
    }
    sh = {}
    for i, t in enumerate(docs):
        toks = re.findall(r"[a-z]+", t.lower())
        sh[i] = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
    expect = {}
    for i in sh:
        for j in sh:
            if i == j or not sh[i]:
                continue
            c = math.floor(len(sh[i] & sh[j]) / len(sh[i]) * 1e4 + 0.5) / 1e4
            if c >= 0.6 and sh[i] & sh[j]:
                expect[(i, j)] = c
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(_key, st.integers(0, 15), st.integers(0, 5)),  # (key, day, user)
        min_size=1,
        max_size=30,
    ),
    window=st.sampled_from([1, 3, 7]),
)
def test_rolling_distinct_matches_python_replay(spark, obs, window):
    # Trailing-window distinct actors must equal the brute-force
    # replay over observed days only. Covers users active several days
    # of one window (no double count) and gap days (absent from output).
    from datetime import datetime, timezone

    from python_mapreduce_spark.operators.events import rolling_distinct

    rows = [
        (k, datetime(2024, 1, 1 + d, 3, 0, tzinfo=timezone.utc), u) for k, d, u in obs
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    got = {
        (r.k, str(r.day)): r.rolling_distinct
        for r in rolling_distinct(df, ["k"], "ts", "id", window_days=window).collect()
    }
    activity = {}
    for k, d, u in obs:
        activity.setdefault(k, set()).add((d, u))
    expect = {}
    for k, pairs in activity.items():
        for d in {d for d, _ in pairs}:
            users = {u for dd, u in pairs if d - window < dd <= d}
            expect[(k, f"2024-01-{1 + d:02d}")] = len(users)
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 5000)),  # (item, minute)
        min_size=1,
        max_size=25,
    )
)
def test_decayed_trending_matches_python_replay(spark, events):
    # Decayed scores must equal the sequential replay: per-event
    # 2^(-age/halflife) rounded 1e-8, summed, rounded 1e-6; ranks by
    # (score DESC, item ASC). pow() ulp drift absorbed by tolerance.
    import math
    from datetime import datetime, timedelta, timezone

    from python_mapreduce_spark.operators.events import decayed_trending

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [(it, base + timedelta(minutes=m)) for it, m in events]
    df = spark.createDataFrame(rows, "item string, ts timestamp")
    got = {
        r.item: (r.n_events, r.score, r.rank)
        for r in decayed_trending(df, "item", "ts", halflife_hours=1.0, k=10).collect()
    }

    def dr(x, s):
        m = 10**s
        return math.floor(x * m + 0.5) / m

    mx = max(m for _, m in events)
    scores = {}
    counts = {}
    for it, m in events:
        counts[it] = counts.get(it, 0) + 1
        scores[it] = scores.get(it, 0.0) + dr(2.0 ** (-(mx - m) * 60_000 / 3_600_000.0), 8)
    ranked = sorted(scores, key=lambda it: (-dr(scores[it], 6), it))
    for rank, it in enumerate(ranked[:10], start=1):
        n, s, r = got[it]
        assert (n, r) == (counts[it], rank), it
        assert math.isclose(s, dr(scores[it], 6), abs_tol=2e-6)
    assert len(got) == min(len(ranked), 10)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "zh"]),
            st.sampled_from(["ab cd!", "x9 7y", "", "hello, world 42", "a.b.c"]),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_tokenizer_fertility_matches_python_replay(spark, docs):
    # Fertility counters must equal the regex replay (chars, \S+ words,
    # BPE-ish tokens) and the rounded ratios.
    import math
    import re

    from python_mapreduce_spark.llm.text import tokenizer_fertility

    df = spark.createDataFrame(
        [(i, l, t) for i, (l, t) in enumerate(docs)], "doc_id long, lang string, text string"
    )
    got = {
        r.lang: (r.n_docs, r.total_chars, r.total_words, r.total_tokens,
                 r.chars_per_token, r.tokens_per_word)
        for r in tokenizer_fertility(df, ["lang"], "text").collect()
    }
    bpe = re.compile(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]")
    agg = {}
    for l, t in docs:
        a = agg.setdefault(l, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(t)
        a[2] += len(re.findall(r"\S+", t))
        a[3] += len(bpe.findall(t))
    for l, (n, ch, w, tk) in agg.items():
        cpt = math.floor(ch / tk * 1e4 + 0.5) / 1e4 if tk else None
        tpw = math.floor(tk / w * 1e4 + 0.5) / 1e4 if w else None
        assert got[l] == (n, ch, w, tk, cpt, tpw), l


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(_key, st.integers(0, 10)),  # (group, value) with heavy ties
        min_size=1,
        max_size=30,
    )
)
def test_quantile_normalize_matches_python_replay(spark, rows):
    # percent_rank must equal (count strictly less) / (n - 1) with ties
    # sharing a rank; single-row groups map to 0.0.
    import math

    from python_mapreduce_spark.operators.windows import quantile_normalize

    data = [(g, i, float(v)) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, id long, value double")
    got = {
        r.id: r.pctile
        for r in quantile_normalize(df, ["g"], "id", "value").collect()
    }
    groups = {}
    for g, i, v in data:
        groups.setdefault(g, []).append((i, v))
    for g, members in groups.items():
        n = len(members)
        for i, v in members:
            less = sum(1 for _, w in members if w < v)
            exp = 0.0 if n == 1 else math.floor(less / (n - 1) * 1e6 + 0.5) / 1e6
            assert got[i] == exp, (g, i)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(st.sampled_from(["a", "b", "c", None]), min_size=1, max_size=30)
)
def test_class_weights_matches_python_replay(spark, rows):
    # The balanced rule N/(k*n) and frequencies must equal the replay;
    # NULL labels form their own class; mean weighted frequency is 1/k
    # per class by construction.
    import math

    from python_mapreduce_spark.operators.aggregates import class_weights

    df = spark.createDataFrame([(i, l) for i, l in enumerate(rows)], "id long, label string")
    got = {r.label: (r.n, r.freq, r.weight) for r in class_weights(df, "label").collect()}
    counts = {}
    for l in rows:
        counts[l] = counts.get(l, 0) + 1
    n_total, k = len(rows), len(counts)

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for l, n in counts.items():
        assert got[l] == (n, dr(n / n_total), dr(n_total / (k * n))), l
    assert set(got) == set(counts)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(minutes=st.lists(st.integers(0, 59), min_size=1, max_size=25))
def test_time_split_embargo_matches_rule(spark, minutes):
    # Every row lands in exactly one of train/embargo/test per the
    # boundary rule (train strictly before, test at-or-after, purged
    # only in between; boundaries: embargo start inclusive, end
    # exclusive).
    from datetime import datetime, timezone

    from python_mapreduce_spark.operators.relational import time_split_embargo

    rows = [
        (i, datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc)) for i, m in enumerate(minutes)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = {
        r.id: (r.split, r.purged)
        for r in time_split_embargo(
            df, "ts", train_end="2024-01-01 00:20:00", test_start="2024-01-01 00:40:00"
        ).collect()
    }
    for i, m in enumerate(minutes):
        exp = "train" if m < 20 else ("test" if m >= 40 else "embargo")
        assert got[i] == (exp, exp == "embargo"), (i, m)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.booleans()), min_size=1, max_size=40
    )
)
def test_auc_matches_pairwise_replay(spark, rows):
    # The rank identity must equal the O(n^2) pairwise definition:
    # wins + half-ties over pos x neg pairs. Scores 0..5 force heavy
    # ties so the half-credit path is exercised.
    import math

    from python_mapreduce_spark.operators.aggregates import auc_score

    df = spark.createDataFrame(
        [(float(s), y) for s, y in rows], "score double, y boolean"
    )
    got = auc_score(df, "score", "y").collect()
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    assert len(got) == 1
    r = got[0]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    if not pos or not neg:
        assert r.auc is None
        return
    num2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    exp = math.floor(num2 / (2.0 * len(pos) * len(neg)) * 1e6 + 0.5) / 1e6
    assert r.auc == exp


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.sampled_from(["a", "b", "d", None]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_classification_report_and_kappa_match_replay(spark, rows):
    # Per-class P/R/F1 and kappa against direct Python computation;
    # 'c' never predicted and 'd' never actual exercise the
    # full-outer class assembly (support 0 / predicted 0 -> NULLs).
    import math

    from python_mapreduce_spark.operators.aggregates import (
        classification_report,
        cohens_kappa,
    )

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    df = spark.createDataFrame(rows, "l string, p string")
    got = {r["class"]: r for r in classification_report(df, "l", "p").collect()}
    classes = set(l for l, _ in rows) | set(p for _, p in rows)
    assert set(got) == classes
    for c in classes:
        sup = sum(1 for l, _ in rows if l == c)
        prd = sum(1 for _, p in rows if p == c)
        tp = sum(1 for l, p in rows if l == p == c)
        r = got[c]
        assert (r.support, r.predicted, r.tp) == (sup, prd, tp)
        prec = tp / prd if prd else None
        rec = tp / sup if sup else None
        assert r.precision == (dr(prec) if prec is not None else None)
        assert r.recall == (dr(rec) if rec is not None else None)
        if prec is not None and rec is not None and prec + rec > 0:
            assert r.f1 == dr(2.0 * prec * rec / (prec + rec))
        else:
            assert r.f1 is None

    k = cohens_kappa(df, "l", "p").collect()[0]
    n = len(rows)
    agree = sum(1 for l, p in rows if l == p)
    po = agree / n
    pe = sum(
        sum(1 for l, _ in rows if l == c) * sum(1 for _, p in rows if p == c)
        for c in classes
    ) / (float(n) * n)
    assert (k.n, k.po, k.pe) == (n, dr(po), dr(pe))
    if pe < 1.0:
        assert k.kappa == dr((po - pe) / (1.0 - pe))
    else:
        assert k.kappa is None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 100), st.booleans()), min_size=1, max_size=40
    )
)
def test_calibration_report_matches_replay(spark, rows):
    # Bin assignment, conf/acc/gap, and the exact-decimal ECE/Brier
    # must equal an integer-micro replay (sums carried as micro/1e-8
    # integers exactly like the DECIMAL columns).
    import math

    from python_mapreduce_spark.operators.aggregates import calibration_report

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    data = [(s / 100.0, y) for s, y in rows]
    df = spark.createDataFrame(data, "score double, y boolean")
    bins = {}
    for s, y in data:
        b = min(int(math.floor(s * 10)), 9)
        n, ssm, sy, sqm = bins.get(b, (0, 0, 0, 0))
        bins[b] = (
            n + 1,
            ssm + math.floor(s * 1e6 + 0.5),
            sy + int(y),
            sqm + math.floor((s - int(y)) ** 2 * 1e8 + 0.5),
        )
    got = {r.bin: r for r in calibration_report(df, "score", "y", n_bins=10).collect()}
    assert set(got) == set(bins)
    for b, (n, ssm, sy, _) in bins.items():
        r = got[b]
        conf = (ssm / 1e6) / n
        acc = sy / n
        assert (r.n, r.conf, r.acc, r.gap) == (n, dr(conf), dr(acc), dr(abs(conf - acc)))
    summ = calibration_report(df, "score", "y", n_bins=10, summary=True).collect()[0]
    n_tot = sum(n for n, _, _, _ in bins.values())
    brier = sum(sqm for _, _, _, sqm in bins.values()) / 1e8 / n_tot
    ece = sum(abs(ssm - sy * 10**6) for _, ssm, sy, _ in bins.values()) / 1e6 / n_tot
    assert (summ.n, summ.brier, summ.ece) == (n_tot, dr(brier), dr(ece))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_auc_grouped_matches_pairwise_replay(spark, rows):
    # The group-partitioned window path must equal the per-group
    # pairwise definition.
    import math

    from python_mapreduce_spark.operators.aggregates import auc_score

    df = spark.createDataFrame(
        [(f"g{g}", float(s), y) for g, s, y in rows], "grp string, score double, y boolean"
    )
    got = {r.grp: r for r in auc_score(df, "score", "y", group_cols=["grp"]).collect()}
    groups = set(f"g{g}" for g, _, _ in rows)
    assert set(got) == groups
    for grp in groups:
        pos = [s for g, s, y in rows if f"g{g}" == grp and y]
        neg = [s for g, s, y in rows if f"g{g}" == grp and not y]
        r = got[grp]
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        if not pos or not neg:
            assert r.auc is None
            continue
        num2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
        exp = math.floor(num2 / (2.0 * len(pos) * len(neg)) * 1e6 + 0.5) / 1e6
        assert r.auc == exp, grp


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c", None])),
        min_size=1,
        max_size=40,
    )
)
def test_markov_transitions_matches_replay(spark, rows):
    # Transition counts/probs must equal a sequential replay per key;
    # NULL states are excluded BEFORE pairing (so A, NULL, B yields the
    # A->B transition).
    import math

    from python_mapreduce_spark.operators.events import markov_transitions

    data = [(k, i, s) for i, (k, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, seq long, st string")
    got = {
        (r.from_state, r.to_state): (r.n, r.prob)
        for r in markov_transitions(df, "k", ["seq"], "st").collect()
    }
    seqs = {}
    for k, i, s in sorted(data, key=lambda t: t[1]):
        if s is not None:
            seqs.setdefault(k, []).append(s)
    counts = {}
    for states in seqs.values():
        for a, b in zip(states, states[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    totals = {}
    for (a, _), n in counts.items():
        totals[a] = totals.get(a, 0) + n
    assert set(got) == set(counts)
    for (a, b), n in counts.items():
        exp = math.floor(n / float(totals[a]) * 1e6 + 0.5) / 1e6
        assert got[(a, b)] == (n, exp), (a, b)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x", "y", None]), st.sampled_from(["u", "v", "w", None])
        ),
        min_size=1,
        max_size=40,
    )
)
def test_mutual_information_matches_replay(spark, rows):
    # MI/entropies vs direct computation with the 1e-8 term-rounding
    # scheme; NULLs are real categories on both sides.
    import math

    from python_mapreduce_spark.operators.aggregates import mutual_information

    def r8(x):
        return math.floor(x * 1e8 + 0.5) / 1e8

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    df = spark.createDataFrame(rows, "a string, b string")
    [got] = mutual_information(df, "a", "b").collect()
    n = len(rows)
    joint, ma, mb = {}, {}, {}
    for a, b in rows:
        joint[(a, b)] = joint.get((a, b), 0) + 1
        ma[a] = ma.get(a, 0) + 1
        mb[b] = mb.get(b, 0) + 1
    mi = sum(
        r8(c / n * math.log(c * float(n) / (ma[a] * mb[b])))
        for (a, b), c in joint.items()
    )
    ha = sum(r8(-(c / n) * math.log(c / n)) for c in ma.values())
    hb = sum(r8(-(c / n) * math.log(c / n)) for c in mb.values())
    assert got.n == n
    assert (got.h_a, got.h_b, got.mi) == (dr(ha), dr(hb), dr(mi))
    if ha > 0 and hb > 0:
        assert got.nmi == dr(mi / math.sqrt(ha * hb))
    else:
        assert got.nmi is None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", None]), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_woe_encode_matches_replay(spark, rows):
    import math

    from python_mapreduce_spark.operators.aggregates import woe_encode

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    df = spark.createDataFrame(rows, "cat string, y boolean")
    got = {r.category: r for r in woe_encode(df, "cat", "y", eps=0.5).collect()}
    pt = float(sum(1 for _, y in rows if y))
    nt = float(sum(1 for _, y in rows if not y))
    cats = set(c for c, _ in rows)
    assert set(got) == cats
    for c in cats:
        np_ = sum(1 for cc, y in rows if cc == c and y)
        nn = sum(1 for cc, y in rows if cc == c and not y)
        r = got[c]
        assert (r.n, r.n_pos, r.n_neg) == (np_ + nn, np_, nn)
        if pt > 0 and nt > 0:
            woe = dr(math.log(((np_ + 0.5) / pt) / ((nn + 0.5) / nt)))
            assert r.woe == woe
            assert r.iv == dr((np_ / pt - nn / nt) * woe)
        else:
            assert r.woe is None and r.iv is None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.sampled_from(["s1", "s2", "s3", "s4", None])),
        min_size=1,
        max_size=40,
    )
)
def test_nucleus_categories_matches_replay(spark, rows):
    # The keep rule (mass before < p), shares, and the ordering
    # (count desc, category) vs a sequential replay; >=1 kept per
    # group; NULL groups and categories handled.
    import math

    from python_mapreduce_spark.operators.relational import nucleus_categories

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    df = spark.createDataFrame(
        [(None if g == 0 else "g", c) for g, c in rows], "grp string, cat string"
    )
    out = nucleus_categories(df, ["grp"], "cat", p=0.6).collect()
    got = {(r.grp, r.category): r for r in out}
    data = [(None if g == 0 else "g", c) for g, c in rows]
    groups = set(g for g, _ in data)
    seen = set()
    for grp in groups:
        counts = {}
        for g, c in data:
            if g == grp:
                counts[c] = counts.get(c, 0) + 1
        t = sum(counts.values())
        order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0] is None, kv[0]))
        cum = 0
        kept_any = False
        for c, n in order:
            r = got[(grp, c)]
            seen.add((grp, c))
            exp_kept = cum < 0.6 * t
            cum += n
            assert (r.n, r.share, r.cum_share, r.kept) == (
                n, dr(n / t), dr(cum / t), exp_kept
            ), (grp, c)
            kept_any = kept_any or exp_kept
        assert kept_any
    assert seen == set(got)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.sampled_from(["x", "y", "z", None]), max_size=30),
    b=st.lists(st.sampled_from(["x", "y", "w", None]), max_size=30),
)
def test_jsd_drift_matches_replay(spark, a, b):
    # Symmetric, one-sided categories finite, NULL when one side empty,
    # zero rows when both empty; terms follow the 1e-8 scheme.
    import math

    from python_mapreduce_spark.operators.aggregates import jsd_drift

    def r8(x):
        return math.floor(x * 1e8 + 0.5) / 1e8

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    da = spark.createDataFrame([(v,) for v in a], "c string")
    db = spark.createDataFrame([(v,) for v in b], "c string")
    rows = jsd_drift(da, db, "c").collect()
    if not a and not b:
        assert rows == []
        return
    [r] = rows
    cats = set(a) | set(b)
    assert (r.n_a, r.n_b, r.n_categories) == (len(a), len(b), len(cats))
    if not a or not b:
        assert r.jsd is None
        return
    exp = 0.0
    for c in cats:
        p = a.count(c) / len(a)
        q = b.count(c) / len(b)
        m = (p + q) / 2.0
        t = (0.5 * p * math.log(p / m) if p > 0 else 0.0) + (
            0.5 * q * math.log(q / m) if q > 0 else 0.0
        )
        exp += r8(t)
    assert r.jsd == dr(exp)
    # symmetry
    [r2] = jsd_drift(db, da, "c").collect()
    assert r2.jsd == r.jsd


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
    )
)
def test_top_paths_matches_replay(spark, rows):
    # Path construction (first `depth` states in order), counts, and
    # deterministic tie ranking vs a sequential replay.
    from python_mapreduce_spark.operators.events import top_paths

    data = [(k, i, s) for i, (k, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, seq long, st string")
    out = top_paths(df, "k", ["seq"], "st", depth=2, k=100).collect()
    seqs = {}
    for k, i, s in sorted(data, key=lambda t: t[1]):
        seqs.setdefault(k, []).append(s)
    counts = {}
    for states in seqs.values():
        p = ">".join(states[:2])
        counts[p] = counts.get(p, 0) + 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = sorted(out, key=lambda r: r.rank)
    assert [(r.path, r.n_keys) for r in got] == expected
    assert [r.rank for r in got] == list(range(1, len(expected) + 1))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 4), st.integers(1, 5)), min_size=1, max_size=40
    )
)
def test_user_churn_matches_set_replay(spark, rows):
    # The two-row fan-out must equal literal day-over-day set algebra.
    from datetime import datetime, timezone

    from python_mapreduce_spark.operators.events import user_churn

    data = [
        (u, datetime(2024, 1, d, u % 24, tzinfo=timezone.utc)) for d, u in rows
    ]
    df = spark.createDataFrame(data, "u long, ts timestamp")
    got = {r.day: r for r in user_churn(df, "u", "ts").collect()}
    by_day = {}
    for d, u in rows:
        by_day.setdefault(d, set()).add(u)
    assert set(got) == {f"2024-01-{d:02d}" for d in by_day}
    for d, users in by_day.items():
        prev = by_day.get(d - 1, set())
        r = got[f"2024-01-{d:02d}"]
        assert (r.active, r.retained, r.new_users, r.churned) == (
            len(users), len(users & prev), len(users - prev), len(prev - users)
        ), d


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=1e-3, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    )
)
def test_benford_audit_matches_replay(spark, vals):
    import math

    from python_mapreduce_spark.operators.aggregates import (
        BENFORD_EXPECTED,
        benford_audit,
    )

    def dr(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.digit: r for r in benford_audit(df, "v").collect()}
    # leading digit via the same decimal(38,6)-string rule
    counts = {}
    for v in vals:
        s = f"{v:.6f}"
        lead = next((c for c in s if c in "123456789"), None)
        if lead:
            counts[int(lead)] = counts.get(int(lead), 0) + 1
    t = float(sum(counts.values()))
    assert set(got) == set(counts)
    for d, n in counts.items():
        r = got[d]
        p = BENFORD_EXPECTED[d]
        assert (r.n, r.share, r.expected) == (n, dr(n / t), dr(p))
        assert r.chi2_term == dr((n - p * t) ** 2 / (p * t)), d


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
    )
)
def test_triangle_stats_matches_bruteforce_on_random_graphs(spark, edges):
    # The degree-ordered orientation must count EXACTLY the brute-force
    # triangles on arbitrary graphs (self-loops and duplicate/reversed
    # edges included in the input).
    import math
    from itertools import combinations

    from python_mapreduce_spark.llm.dedup import triangle_stats

    df = spark.createDataFrame(edges, "id1 long, id2 long")
    rows = triangle_stats(df).collect()
    eset = set((min(a, b), max(a, b)) for a, b in edges if a != b)
    if not eset:
        assert rows == []
        return
    [r] = rows
    verts = sorted(set(v for e in eset for v in e))
    tri = sum(
        1
        for a, b, c in combinations(verts, 3)
        if (a, b) in eset and (a, c) in eset and (b, c) in eset
    )
    deg = {v: sum(1 for e in eset if v in e) for v in verts}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (len(verts), len(eset), tri)
    if wedges:
        assert r.clustering == math.floor(3.0 * tri / wedges * 1e6 + 0.5) / 1e6
    else:
        assert r.clustering is None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 200)), min_size=2, max_size=40
    )
)
def test_rfm_scores_match_threshold_replay(spark, rows):
    # Score assignment must equal "1 + thresholds strictly below" on
    # numpy's interpolated percentiles (the Spark/DuckDB percentile
    # semantics), with recency inverted.
    from datetime import datetime, timezone

    import numpy as np

    from python_mapreduce_spark.operators.events import rfm_segments

    data = [
        (u, datetime(2024, 1, 1 + (v % 20), v % 24, tzinfo=timezone.utc), float(v))
        for u, v in rows
    ]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    got = {}
    for r in rfm_segments(df, "user_id", "ts", "value").collect():
        got[(r.r_score, r.f_score, r.m_score)] = (
            got.get((r.r_score, r.f_score, r.m_score), 0) + r.n_users
        )
    # python replay
    per_user = {}
    am = max(ts for _, ts, _ in data)
    for u, ts, v in data:
        last, f, m = per_user.get(u, (None, 0, 0.0))
        per_user[u] = (ts if last is None or ts > last else last, f + 1, m + round(v, 4))
    am_ms = int(am.timestamp() * 1000)
    users = {
        u: (
            (am_ms - int(last.timestamp() * 1000)) // 86_400_000,
            f,
            round(m, 4),
        )
        for u, (last, f, m) in per_user.items()
    }
    qs = [20, 40, 60, 80]
    tr = np.percentile([r for r, _, _ in users.values()], qs)
    tf = np.percentile([f for _, f, _ in users.values()], qs)
    tm = np.percentile([m for _, _, m in users.values()], qs)
    exp = {}
    for r_, f_, m_ in users.values():
        rs = 6 - (1 + sum(1 for t in tr if t < r_))
        fs = 1 + sum(1 for t in tf if t < f_)
        ms = 1 + sum(1 for t in tm if t < m_)
        exp[(rs, fs, ms)] = exp.get((rs, fs, ms), 0) + 1
    assert got == exp


def test_model_eval_degenerate_margins(spark):
    # VERDICT r5 stretch 7: the canonical-formula margins that random
    # generation may never hit — all-tied scores, single-class inputs,
    # perfect/inverted separation, boundary scores — pinned
    # deterministically for auc_score / cohens_kappa /
    # calibration_report.
    from python_mapreduce_spark.operators.aggregates import (
        auc_score,
        calibration_report,
        cohens_kappa,
    )

    def auc_of(rows):
        df = spark.createDataFrame(rows, "score double, y boolean")
        return auc_score(df, "score", "y").collect()[0]

    # all scores tied, both classes present: every pos x neg pair is a
    # half-credit tie -> AUC = 0.5 exactly
    r = auc_of([(0.7, True)] * 3 + [(0.7, False)] * 5)
    assert (r.n_pos, r.n_neg, r.auc) == (3, 5, 0.5)
    # single-class margins: AUC undefined, NULL not 0/1
    assert auc_of([(0.1, True), (0.9, True)]).auc is None
    assert auc_of([(0.1, False), (0.9, False)]).auc is None
    # perfect separation -> 1.0; perfectly inverted -> 0.0
    assert auc_of([(0.9, True), (0.8, True), (0.2, False)]).auc == 1.0
    assert auc_of([(0.1, True), (0.9, False)]).auc == 0.0

    def kappa_of(rows):
        df = spark.createDataFrame(rows, "l string, p string")
        return cohens_kappa(df, "l", "p").collect()[0]

    # one class on both sides: p_e = 1, kappa undefined (NULL), even
    # though agreement is perfect — the classic kappa singularity
    k = kappa_of([("a", "a")] * 4)
    assert (k.po, k.pe, k.kappa) == (1.0, 1.0, None)
    # perfect agreement over 2 balanced classes: po=1, pe=0.5, kappa=1
    k = kappa_of([("a", "a"), ("b", "b")])
    assert (k.po, k.pe, k.kappa) == (1.0, 0.5, 1.0)
    # chance-level agreement: po == pe -> kappa = 0 exactly
    k = kappa_of([("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")])
    assert (k.po, k.pe, k.kappa) == (0.5, 0.5, 0.0)

    # calibration: boundary scores 0.0 and 1.0 land in bins 0 and
    # n_bins-1 (the 1.0 clamp), a constant score concentrates in one
    # bin with gap = |conf - acc| by the canonical formula
    rows = [(0.0, False), (1.0, True), (1.0, False)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    bins = {r.bin: r for r in calibration_report(df, "score", "y", n_bins=10).collect()}
    assert set(bins) == {0, 9}
    assert (bins[0].n, bins[0].conf, bins[0].acc, bins[0].gap) == (1, 0.0, 0.0, 0.0)
    assert (bins[9].n, bins[9].conf, bins[9].acc, bins[9].gap) == (2, 1.0, 0.5, 0.5)
    [s] = calibration_report(df, "score", "y", n_bins=10, summary=True).collect()
    # brier = mean((s-y)^2) = (0 + 0 + 1)/3; ece = (0 + |2-1|)/3
    assert s.n == 3
    assert abs(s.brier - 1.0 / 3.0) < 2e-6
    assert abs(s.ece - 1.0 / 3.0) < 2e-6
    # all-one-class calibration still well-defined (acc constant 1)
    df1 = spark.createDataFrame([(0.25, True)] * 4, "score double, y boolean")
    [b] = calibration_report(df1, "score", "y", n_bins=4).collect()
    assert (b.bin, b.n, b.conf, b.acc, b.gap) == (1, 4, 0.25, 1.0, 0.75)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.booleans()), min_size=1, max_size=40
    )
)
def test_pr_curve_matches_threshold_replay(spark, rows):
    # Every PR point must equal the brute-force "predict positive iff
    # score >= t" counts; scores 0..6 force tied thresholds.
    import math

    from python_mapreduce_spark.operators.aggregates import pr_curve

    df = spark.createDataFrame(
        [(float(s), y) for s, y in rows], "score double, y boolean"
    )
    got = {
        r.threshold: (r.n_pred, r.tp, r.precision, r.recall, r.f1)
        for r in pr_curve(df, "score", "y").collect()
    }
    assert set(got) == {float(s) for s, _ in rows}
    pos_total = sum(1 for _, y in rows if y)

    def dr(x):
        return None if x is None else math.floor(x * 1e6 + 0.5) / 1e6

    for t in got:
        n_pred = sum(1 for s, _ in rows if s >= t)
        tp = sum(1 for s, y in rows if s >= t and y)
        prec = tp / n_pred
        rec = tp / pos_total if pos_total else None
        f1 = (
            2 * prec * rec / (prec + rec)
            if rec is not None and prec + rec > 0
            else None
        )
        assert got[t] == (n_pred, tp, dr(prec), dr(rec), dr(f1)), t


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 15), st.booleans()), min_size=1, max_size=30
    )
)
def test_survival_curve_matches_km_replay(spark, obs):
    # Kaplan-Meier vs the sequential textbook computation with the
    # exact rounding schedule, under random censoring patterns
    # including whole-risk-set deaths (survival exactly 0).
    import math

    from python_mapreduce_spark.operators.events import survival_curve

    df = spark.createDataFrame(
        [(float(d), e) for d, e in obs], "dur double, ev boolean"
    )
    got = {r.duration: r for r in survival_curve(df, "dur", "ev").collect()}
    n_risk = len(obs)
    cln8 = 0
    for t in sorted({d for d, _ in obs}):
        d = sum(1 for u, e in obs if u == t and e)
        c = sum(1 for u, e in obs if u == t and not e)
        if d == 0:
            term8 = 0
        elif d < n_risk:
            term8 = math.floor(math.log(1.0 - d / n_risk) * 1e8 + 0.5)
        else:
            term8 = -(10**12)
        cln8 += term8
        s = math.floor(math.exp(cln8 / 1e8) * 1e6 + 0.5) / 1e6
        r = got[float(t)]
        assert (r.n_risk, r.n_events, r.n_censored, r.survival) == (n_risk, d, c, s)
        n_risk -= d + c


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    big_keys=st.lists(st.one_of(st.integers(0, 50), st.none()), min_size=1, max_size=60),
    small_keys=st.lists(st.integers(0, 50), min_size=1, max_size=20),
)
def test_bloom_semi_join_equivalence_property(spark, big_keys, small_keys):
    # For ANY key sets (NULLs included), the bloom-accelerated semi
    # join must equal the exact semi join — false positives must die in
    # the residual join, false negatives must not exist.
    from python_mapreduce_spark.operators.joins import bloom_semi_join

    big = spark.createDataFrame([(k, i) for i, k in enumerate(big_keys)], "k long, i long")
    small = spark.createDataFrame([(k,) for k in small_keys], "k long")
    got = {(r.k, r.i) for r in bloom_semi_join(big, small, "k", m_bits=256, k=2).collect()}
    want = {(r.k, r.i) for r in big.join(small, "k", "left_semi").collect()}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 100), st.integers(-50, 50)),
        min_size=1,
        max_size=30,
    )
)
def test_time_weighted_avg_matches_replay(spark, obs):
    # TWAP vs the sequential replay on irregular (minute, value)
    # samples — duplicate timestamps take the (ts, value) order, the
    # last sample carries zero weight.
    import math
    from datetime import datetime, timedelta, timezone

    from python_mapreduce_spark.operators.events import time_weighted_avg

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [("k", t0 + timedelta(minutes=m), float(v)) for m, v in obs]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    [r] = time_weighted_avg(df, ["g"], "ts", "v").collect()
    samples = sorted((m * 60_000, float(v)) for m, v in obs)
    ws, span = 0.0, 0
    for i, (t, v) in enumerate(samples):
        dt = samples[i + 1][0] - t if i + 1 < len(samples) else 0
        ws += math.floor(v * dt * 1e6 + 0.5) / 1e6
        span += dt
    assert (r.n_samples, r.span_ms) == (len(obs), span)
    if span == 0:
        assert r.twavg is None
    else:
        assert r.twavg == math.floor(ws / span * 1e6 + 0.5) / 1e6


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.floats(-2, 2, allow_nan=False, width=32), min_size=8, max_size=8),
        min_size=1,
        max_size=25,
    )
)
def test_lsh_candidate_estimate_upper_bounds_join_property(spark, vecs):
    # The budget guard's safety contract for ANY vector set: the
    # linear-cost bucket bound is >= the distinct candidate pairs the
    # banded join materializes (a pair colliding in b bands counts b
    # times in the bound, once in the join).
    from python_mapreduce_spark.llm.similarity import (
        banded_lsh_candidate_pairs,
        lsh_candidate_estimate,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(bands=4, rows_per_band=2, dim=8, seed=11)
    est = lsh_candidate_estimate(emb, "vec_id", "embedding", **kw)
    actual = banded_lsh_candidate_pairs(emb, "vec_id", "embedding", **kw).count()
    assert est >= actual


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    masses=st.lists(st.integers(0, 50), min_size=1, max_size=12),
)
def test_gini_and_pareto_match_python_replay(spark, masses):
    from python_mapreduce_spark.operators.aggregates import (
        gini_concentration,
        pareto_share,
    )

    rows = [(i, float(m)) for i, m in enumerate(masses)]
    df = spark.createDataFrame(rows, "g int, x double")

    [gr] = gini_concentration(df, ["g"], "x").collect()
    xs = sorted(masses)
    n, tot = len(xs), float(sum(xs))
    assert gr.n_groups == n
    if tot > 0:
        expect = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (
            n + 1
        ) / n
        assert abs(gr.gini - expect) < 1e-6
        assert -1e-9 <= gr.gini < 1.0
    else:
        assert gr.gini is None

    [pr] = pareto_share(df, "g", "x", fractions=(0.5,)).collect()
    if tot > 0:
        import math

        cut = math.ceil(n * 0.5)
        top = sorted(masses, reverse=True)[:cut]
        assert abs(pr.share_top_50 - sum(top) / tot) < 1e-6
    else:
        assert pr.share_top_50 is None


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows_a=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3", None]),
            st.integers(0, 15),
            st.sampled_from(["x", "y", None]),
        ),
        max_size=16,
        unique_by=lambda r: r[1],
    ),
    rows_b=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3", None]),
            st.integers(0, 15),
            st.sampled_from(["x", "y", None]),
        ),
        max_size=16,
        unique_by=lambda r: r[1],
    ),
)
def test_replication_audit_matches_python_replay(spark, rows_a, rows_b):
    # Two-phase digest+drilldown audit (operators/relational.py::
    # replication_audit) must agree with a brute-force per-group replay
    # on arbitrary shapes: NULL groups, NULL values, empty sides,
    # group movers (ids are unique per side — the snapshot contract).
    from python_mapreduce_spark.operators.relational import replication_audit

    schema = "grp string, id long, v string"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)
    got = {
        r.grp: r
        for r in replication_audit(a, b, "id", ["v"], group_by="grp").collect()
    }

    by_ga = {}
    for g, i, v in rows_a:
        by_ga.setdefault(g, {})[i] = v
    by_gb = {}
    for g, i, v in rows_b:
        by_gb.setdefault(g, {})[i] = v
    assert set(got) == set(by_ga) | set(by_gb)
    for g in set(by_ga) | set(by_gb):
        da, db = by_ga.get(g, {}), by_gb.get(g, {})
        r = got[g]
        assert (r.n_rows_a, r.n_rows_b) == (len(da), len(db))
        only_a = len(set(da) - set(db))
        only_b = len(set(db) - set(da))
        changed = sum(1 for i in set(da) & set(db) if da[i] != db[i])
        same = sum(1 for i in set(da) & set(db) if da[i] == db[i])
        if not db:
            expect = "only_a"
        elif not da:
            expect = "only_b"
        elif only_a or only_b or changed:
            expect = "mismatch"
        else:
            expect = "match"
        assert r.verdict == expect, (g, r)
        assert (r.n_row_only_a, r.n_row_only_b, r.n_row_changed, r.n_row_same) == (
            only_a,
            only_b,
            changed,
            same,
        ), (g, r)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    ),
    allowance=st.floats(min_value=0, max_value=3, allow_nan=False),
    target=st.floats(min_value=-5, max_value=5, allow_nan=False),
)
def test_cusum_prefix_form_equals_sequential_recurrence(
    spark, xs, allowance, target
):
    # cusum_changepoints computes S+ = P - min(0, running_min(P)) with
    # two window frames; the definition is the sequential recurrence
    # S+_i = max(0, S+_{i-1} + d_i). The closed form must equal the
    # fold for ANY series, allowance, and target — including NULLs
    # (zero evidence) and all-negative deviations (sums pinned at 0).
    from python_mapreduce_spark.operators.windows import cusum_changepoints

    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "key string, i long, x double"
    )
    got = (
        cusum_changepoints(
            df, ["key"], [F.col("i")], "x",
            target=target, allowance=allowance, threshold=4.0,
        )
        .orderBy("i")
        .collect()
    )
    sp = sn = 0.0
    for row, x in zip(got, xs):
        d = 0.0 if x is None else x - target
        sp = max(0.0, sp + d - allowance)
        sn = max(0.0, sn - d - allowance)
        assert abs(row.cusum_pos - sp) < 1e-6
        assert abs(row.cusum_neg - sn) < 1e-6
        assert row.alarm == (row.cusum_pos > 4.0 or row.cusum_neg > 4.0)


# ---------------------------------------------------------------------------
# Rank-free rank statistics (round-7 continuation staging): the
# distinct-value running-sum formulation must agree with a brute-force
# sort-and-average-ranks replay on ARBITRARY tie shapes — all-distinct,
# all-tied, and everything between (integer grids force heavy ties).


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xa=st.lists(st.integers(0, 8), min_size=1, max_size=25),
    xb=st.lists(st.integers(0, 8), min_size=1, max_size=25),
)
def test_mannwhitney_u_matches_bruteforce_on_any_tie_shape(spark, xa, xb):
    from python_mapreduce_spark.operators.aggregates import mann_whitney_u

    rows = [("a", float(v)) for v in xa] + [("b", float(v)) for v in xb]
    df = spark.createDataFrame(rows, "s string, x double")
    got = mann_whitney_u(df, "s", "x", a="a", b="b").first()

    allv = sorted([(v, 0) for v in xa] + [(v, 1) for v in xb])
    r_a = 0.0
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j][0] == allv[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        r_a += avg * sum(1 for t in range(i, j) if allv[t][1] == 0)
        i = j
    u_a = r_a - len(xa) * (len(xa) + 1) / 2.0
    assert got.n_a == len(xa) and got.n_b == len(xb)
    assert abs(got.u_a - u_a) < 1e-9
    assert abs(got.u_b - (len(xa) * len(xb) - u_a)) < 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=2,
        max_size=30,
    )
)
def test_spearman_matches_scipy_style_avg_rank_replay(spark, pts):
    from python_mapreduce_spark.operators.aggregates import spearman_corr

    xs = [float(x) for x, _ in pts]
    ys = [float(y) for _, y in pts]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = spearman_corr(df, "x", "y", x_scale=1.0, y_scale=1.0).first()

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[order[j]] == vals[order[i]]:
                j += 1
            for t in range(i, j):
                ranks[order[t]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    if vx <= 0 or vy <= 0:
        assert got.spearman_rho is None
    else:
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        assert abs(got.spearman_rho - cov / (vx * vy) ** 0.5) < 1e-5


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ps=st.lists(
        st.floats(0.0, 1.0, allow_nan=False, width=32),
        min_size=1,
        max_size=30,
    ),
    alpha=st.sampled_from([0.01, 0.05, 0.2]),
)
def test_bh_fdr_rejection_set_matches_step_up_definition(spark, ps, alpha):
    from python_mapreduce_spark.operators.aggregates import bh_fdr

    ps = [round(p, 6) for p in ps]
    rows = [(f"h{i:03d}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "h string, p double")
    got = {r.h: r.rejected for r in bh_fdr(df, ["h"], "p", alpha=alpha).collect()}

    m = len(ps)
    order = sorted(range(m), key=lambda i: (ps[i], f"h{i:03d}"))
    kstar = 0
    for rank, i in enumerate(order, start=1):
        if ps[i] <= rank * alpha / m:
            kstar = rank
    for rank, i in enumerate(order, start=1):
        assert got[f"h{i:03d}"] == (rank <= kstar), (rank, ps[i], alpha)
