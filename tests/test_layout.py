"""Sorted-layout sink: per-file parquet footer min/max stats must be
narrow and mostly disjoint (the property file skipping depends on),
verified from the actual footers via pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq


def _file_ranges(base_dir: str, col: str) -> list[tuple]:
    out = []
    for f in glob.glob(f"{base_dir}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        out.append((lo, hi))
    return sorted(out)


def test_write_sorted_layout_produces_disjoint_file_ranges(spark, tmp_path):
    from etl_macropulse_br_spark.sinks.writers import write_sorted_layout

    df = (
        spark.range(0, 100_000)
        .selectExpr("id", "cast(id % 97 as long) as k")
        .repartition(8)  # scrambled input: every partition spans all ids
    )
    plain = str(tmp_path / "plain")
    df.write.mode("overwrite").parquet(plain)
    sorted_dir = str(tmp_path / "sorted")
    write_sorted_layout(df, sorted_dir, ["id"], target_files=8)

    plain_ranges = _file_ranges(plain, "id")
    sorted_ranges = _file_ranges(sorted_dir, "id")
    assert len(sorted_ranges) >= 4

    # plain files all span ~the full domain; sorted files are narrow
    def width(r):
        return r[1] - r[0]

    assert all(width(r) > 80_000 for r in plain_ranges)
    assert all(width(r) < 30_000 for r in sorted_ranges)
    # and consecutive sorted files don't overlap (range partitioning)
    for (lo1, hi1), (lo2, hi2) in zip(sorted_ranges, sorted_ranges[1:]):
        assert hi1 <= lo2

    # the data itself is unchanged
    assert (
        spark.read.parquet(sorted_dir).agg({"id": "sum"}).first()[0]
        == df.agg({"id": "sum"}).first()[0]
    )


def test_write_sorted_layout_with_hive_partitions(spark, tmp_path):
    from etl_macropulse_br_spark.sinks.writers import write_sorted_layout

    df = spark.range(0, 10_000).selectExpr(
        "id", "cast(id % 2 as int) as bucket"
    )
    out = str(tmp_path / "hive_sorted")
    write_sorted_layout(
        df, out, ["id"], partition_cols=["bucket"], target_files=4
    )
    files = glob.glob(f"{out}/bucket=*/**/*.parquet", recursive=True)
    assert files
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert set(r["bucket"] for r in back.select("bucket").distinct().collect()) == {0, 1}


def test_write_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-order vs single-column sort on a 2D-uniform table, judged
    from the REAL parquet footers: (a) the z-ordered layout makes
    BOTH columns' per-file ranges narrow (each file a spatial tile),
    while the x-sorted layout leaves y spanning ~the full domain in
    every file; (b) a conjunctive point-range predicate intersects
    only a small minority of z-ordered files (the skip decision
    Spark's reader makes from these same stats); (c) rows survive
    byte-exact."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.sinks.writers import (
        write_sorted_layout,
        write_zorder_layout,
    )

    n = 1 << 14
    # x: scrambled row order; y: decorrelated from x (bit-reversal
    # of the low 7 bits times a spread) — every (x, y) region hit
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("x"),
            ((F.col("id") * 2654435761) % n).alias("y"),
        )
        .repartition(8)
    )
    zdir = str(tmp_path / "zorder")
    write_zorder_layout(df, zdir, ["x", "y"], target_files=16)
    sdir = str(tmp_path / "xsorted")
    write_sorted_layout(df, sdir, ["x"], target_files=16)

    zx, zy = _file_ranges(zdir, "x"), _file_ranges(zdir, "y")
    sy = _file_ranges(sdir, "y")
    assert len(zx) >= 8

    # (a) tiles: a few files straddle range-partition boundaries of
    # the z curve (inherent — the partitioner cuts the curve, not
    # the quadrants), so judge AGGREGATE width: the MEAN per-file
    # range of BOTH z-ordered dimensions is well under half the
    # domain, while the x-sorted layout leaves y essentially
    # full-domain in EVERY file.
    def mean_width(ranges):
        return sum(hi - lo for lo, hi in ranges) / len(ranges)

    assert mean_width(zx) < n * 0.55
    assert mean_width(zy) < n * 0.55
    assert all(hi - lo > int(n * 0.9) for lo, hi in sy)

    # (b) the pruning decision itself: a y-only window predicate
    # (y <= n/8) — the case a single-column x-sort structurally
    # cannot prune — skips most z-ordered files from footer stats
    # alone, and prunes NOTHING in the x-sorted layout.
    w = n // 8

    def y_hits(ranges):
        return sum(1 for lo, hi in ranges if lo <= w)

    assert y_hits(zy) <= len(zy) // 2, (y_hits(zy), len(zy))
    assert y_hits(sy) == len(sy)

    # (c) data unchanged
    back = spark.read.parquet(zdir)
    assert back.count() == n
    assert (
        back.agg(F.sum("x"), F.sum("y")).first()
        == df.agg(F.sum("x"), F.sum("y")).first()
    )


def test_write_zorder_layout_degenerate_and_typed_columns(spark, tmp_path):
    """Guard pins for the z-order scaler: (a) a double column whose
    values differ but truncate to ONE bigint (span would be 0 — a
    null key sends everything to a single file) degenerates to a
    constant rank instead of nulling the key, so the OTHER column
    still tiles; (b) a timestamp z-column works (epoch-seconds cast
    — driver-side int(min) would raise on datetime)."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.sinks.writers import write_zorder_layout

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("x"),
        (F.lit(2.1) + F.col("id") / F.lit(10 * n)).alias("flat"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60).alias(
            "ts"
        ),
    )
    out = str(tmp_path / "degenerate")
    write_zorder_layout(df, out, ["x", "flat"], target_files=8)
    ranges = _file_ranges(out, "x")
    assert len(ranges) >= 4
    # flat column contributed a constant rank; x still partitions
    assert sum(hi - lo for lo, hi in ranges) / len(ranges) < n * 0.6
    assert spark.read.parquet(out).count() == n

    out_ts = str(tmp_path / "ts_z")
    write_zorder_layout(df, out_ts, ["x", "ts"], target_files=8)
    assert spark.read.parquet(out_ts).count() == n


def test_write_zorder_layout_wide_bigint_span_no_overflow(spark, tmp_path):
    """r9 pin (ADVICE r8 #1): a z-column spanning > 2^47 (epoch-micros
    over years, wide id domains) must still produce a monotone layout.
    The pre-fix scaler computed (v - min) * 65535 in LONG arithmetic —
    silent wraparound for the upper domain, garbage Morton keys, files
    whose ranges span everything. Post-fix (double offset) every
    file's range of the wide column is narrow and ordered."""
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.sinks.writers import write_zorder_layout

    n = 4096
    # span = n * 2^41 ≈ 2^53: (span * 65535) overflows int64 by ~2^16
    df = spark.range(n).select(
        (F.col("id") * F.lit(1 << 41)).alias("wide"),
        F.col("id").alias("x"),
    )
    out = str(tmp_path / "wide_z")
    write_zorder_layout(df, out, ["wide", "x"], target_files=8)
    ranges = _file_ranges(out, "wide")
    assert len(ranges) >= 4
    span = (n - 1) * (1 << 41)
    # every file narrow — overflow produced full-span files
    assert all(hi - lo < span * 0.6 for lo, hi in ranges)
    # and consecutive file ranges are ordered (wide dominates the
    # interleave's high bits only jointly with x, so allow overlap,
    # but the aggregate width must shrink)
    assert sum(hi - lo for lo, hi in ranges) / len(ranges) < span * 0.55
    back = spark.read.parquet(out)
    assert back.count() == n
    assert back.agg(F.sum("wide")).first()[0] == df.agg(F.sum("wide")).first()[0]
