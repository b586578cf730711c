"""Sequence-packing invariants (operators/packing.py, r15): the
oracle differ pins value-equality with the recursive-CTE twin; these
pin the PROPERTIES (budget respected, bins contiguous, greedy
tightness, determinism under partitioning) on shapes the testdata
doesn't exercise — oversized documents, empty input, budget edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_macropulse_br_spark.operators.packing import pack_sequences


def _pack(spark, rows, budget, n_shards=4):
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(
        df, F.col("n_tok"), budget=budget, n_shards=n_shards
    )
    return {r["doc_id"]: (r["shard"], r["bin"], r["n_tok"]) for r in out.collect()}


def test_greedy_packing_respects_budget_and_contiguity(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]
    budget = 128
    got = _pack(spark, rows, budget)
    assert len(got) == 200
    # rebuild per-(shard,bin) fills
    fills: dict[tuple, int] = {}
    members: dict[tuple, list] = {}
    for doc, (shard, b, t) in got.items():
        assert shard == doc % 4
        fills[(shard, b)] = fills.get((shard, b), 0) + t
        members.setdefault((shard, b), []).append(doc)
    for (shard, b), fill in fills.items():
        # a bin over budget can only be a single oversized doc
        assert fill <= budget or len(members[(shard, b)]) == 1
    # bins are contiguous 0..max per shard
    for shard in range(4):
        bs = sorted({b for (s, b) in fills if s == shard})
        assert bs == list(range(len(bs)))
    # greedy tightness: consecutive docs in one shard split bins
    # ONLY when the running fill would overflow
    for shard in range(4):
        docs = sorted(d for d in got if got[d][0] == shard)
        fill = 0
        prev_bin = None
        for d in docs:
            _, b, t = got[d]
            if prev_bin is None:
                assert b == 0
                fill = t
            elif b == prev_bin:
                fill += t
                assert fill <= budget
            else:
                assert b == prev_bin + 1
                assert fill + t > budget  # split was forced
                fill = t
            prev_bin = b


def test_oversized_doc_gets_its_own_bin(spark):
    # budget 10; doc 5 (t=50) must sit alone; neighbors pack around
    rows = [(1, 4), (5, 50), (9, 4), (13, 3)]  # all shard 1 (n=4)
    got = _pack(spark, rows, budget=10, n_shards=4)
    assert got[1] == (1, 0, 4)
    assert got[5] == (1, 1, 50)   # alone, over budget
    assert got[9] == (1, 2, 4)    # forced out of the oversized bin
    assert got[13] == (1, 2, 3)  # joins doc 9's bin (4 + 3 <= 10)


def test_packing_is_partitioning_invariant(spark):
    rows = [(i, (i * 17) % 60 + 5) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = pack_sequences(df, F.col("n_tok"), budget=100, n_shards=3)
    b = pack_sequences(
        df.repartition(7), F.col("n_tok"), budget=100, n_shards=3
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_packing_edge_params(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, F.col("n_tok"), budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, F.col("n_tok"), budget=10, n_shards=0)
    empty = spark.createDataFrame([], "doc_id long, n_tok long")
    assert pack_sequences(
        empty, F.col("n_tok"), budget=10
    ).count() == 0


def test_oversized_shard_raises_loudly(spark):
    """r16 (VERDICT r15 wrong #3): applyInPandas materializes a whole
    shard as ONE pandas frame, so a shard over ``max_shard_rows``
    must fail with a message naming the fix (raise n_shards), not
    silently ship a multi-GB Arrow batch to one core. Red without
    the guard (the packer would just pack), green with it."""
    rows = [(i, 5) for i in range(0, 40, 4)]  # 10 docs, all shard 0
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(
        df, F.col("n_tok"), budget=100, n_shards=4, max_shard_rows=9
    )
    with pytest.raises(Exception, match="max_shard_rows"):
        out.collect()
    # at the bound (10 rows <= 10) it packs normally
    ok = pack_sequences(
        df, F.col("n_tok"), budget=100, n_shards=4, max_shard_rows=10
    )
    assert ok.count() == 10


def test_null_token_count_fails_fast_with_doc_ids(spark):
    """r16 (ADVICE r15 #4): a NULL token count used to surface as an
    opaque ``int(NaN)`` ValueError inside the Arrow stage; it must
    name the offending doc ids instead."""
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "doc_id long, n_tok long"
    )
    out = pack_sequences(df, F.col("n_tok"), budget=100, n_shards=1)
    with pytest.raises(Exception, match="NULL token count"):
        out.collect()


def test_pack_chunks_properties_and_prefix_sum_equality(spark):
    from etl_macropulse_br_spark.operators.packing import pack_chunks

    rows = [(i, (i * 29) % 70 + 6) for i in range(150)]
    budget = 100
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: (r["shard"], r["bin"], r["n_tok"])
        for r in pack_chunks(
            df, F.col("n_tok"), budget=budget, n_shards=3
        ).collect()
    }
    assert len(got) == 150
    # closed form: bin == floor(prefix_sum_before / budget), computed
    # independently here
    for shard in range(3):
        docs = sorted(d for d in got if got[d][0] == shard)
        cum = 0
        for d in docs:
            _, b, t = got[d]
            assert b == cum // budget, (d, b, cum)
            cum += t
    # overflow bound: a bin exceeds the budget by at most the last
    # doc that STARTS inside it (straddles the cut)
    fills: dict[tuple, list] = {}
    for d, (s, b, t) in got.items():
        fills.setdefault((s, b), []).append((d, t))
    for (s, b), members in fills.items():
        total = sum(t for _, t in members)
        last_t = max(members)[1]  # highest doc_id = last to start
        assert total <= budget + last_t
    # bins contiguous per shard
    for shard in range(3):
        bs = sorted({b for (s, b) in fills if s == shard})
        assert bs == list(range(min(bs), min(bs) + len(bs)))
        assert bs[0] == 0
    # partitioning invariance
    again = pack_chunks(
        df.repartition(11), F.col("n_tok"), budget=budget, n_shards=3
    )
    assert sorted(
        (r["doc_id"], r["bin"]) for r in again.collect()
    ) == sorted((d, got[d][1]) for d in got)
