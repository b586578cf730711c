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
