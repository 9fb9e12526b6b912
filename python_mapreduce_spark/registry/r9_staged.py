"""Round-9 STAGED registry entries — built and oracle-verified in
round 9, deliberately NOT wired into ``all_queries()`` yet.

The round-9 rotation already spends its addition budget on the z-order
evidence pair (VERDICT r8 item 4 caps additions so the r03 staleness
block keeps draining); this module is the NEXT batch, fully built to
the staged evidence bar — Spark query + DuckDB oracle + standing
pytest gate (``tests/test_r8_staged_oracles.py`` runs the exact
check_oracle comparison over BOTH staged modules at sf0.001) +
degenerate-replica gate (``tools/check_staged.py``, which gates
r8_staged ∪ r9_staged).
Round 10 registers it by merging ``QUERIES`` into
``registry/__init__.all_queries()`` and appending the names behind the
staleness block.

Operators covered: incremental label propagation (VERDICT r8 stretch
item 7) — the graph member of the additive-state streaming family:
per-epoch edge-delta ingest into idempotent ``ingest_epoch=N``
partitions + checkpointed per-node labels, oracle = the batch LPA
unroll verbatim on the union of epochs.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_mapreduce_spark.registry import Query
from python_mapreduce_spark.registry._util import table
from python_mapreduce_spark.registry.r8_staged import SQL_LABEL_PROPAGATION


def q_stream_incremental_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Incremental community detection (streaming/dedup.py::
    # incremental_label_propagation): the near-dup edge stream arrives
    # in two waves (split by pmod(id1+id2, 2) so both waves carry edges
    # of the same communities — the interleaving a naive
    # per-wave-compute-then-union would get wrong); each checkpointed
    # pass ingests ONLY the new edge files into an idempotent
    # ingest_epoch=N partition and recomputes the fixed-round
    # synchronous LPA over the compact edge state, checkpointing the
    # per-node labels. The edge set is union-additive and the recompute
    # is a pure function of it, so the final communities equal the
    # batch LPA on ALL edges — the oracle is q_label_propagation's
    # 4-round unroll VERBATIM. Raw text is scanned once to derive
    # edges; the epochs touch only (a, b) pairs.
    from python_mapreduce_spark.llm.dedup import ngram_jaccard_pairs  # noqa: PLC0415
    from python_mapreduce_spark.streaming.dedup import (  # noqa: PLC0415
        incremental_label_propagation,
        read_lpa_communities,
    )

    docs = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, max_shingle_df=100
    ).select("id1", "id2")
    work = tempfile.mkdtemp(prefix="incr_lpa_")
    in_dir, ckpt, state = (
        os.path.join(work, "in"),
        os.path.join(work, "ckpt"),
        os.path.join(work, "state"),
    )
    edges.filter(F.pmod(F.col("id1") + F.col("id2"), F.lit(2)) == 0).write.mode(
        "append"
    ).parquet(in_dir)
    incremental_label_propagation(spark, in_dir, ckpt, state)
    edges.filter(F.pmod(F.col("id1") + F.col("id2"), F.lit(2)) == 1).write.mode(
        "append"
    ).parquet(in_dir)
    incremental_label_propagation(spark, in_dir, ckpt, state)
    return read_lpa_communities(spark, state)


QUERIES: dict[str, Query] = {
    "q_stream_incremental_lpa": Query(
        q_stream_incremental_lpa,
        SQL_LABEL_PROPAGATION,
        "incremental LPA communities: per-epoch edge deltas + checkpointed labels; oracle = batch LPA on the union",
    ),
}
