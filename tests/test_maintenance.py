"""Table maintenance: small-file compaction + schema-drift union reads."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def small_files_dir(tmp_path):
    d = tmp_path / "frag"
    d.mkdir()
    for i in range(40):
        pq.write_table(
            pa.table({"k": pa.array([i] * 50, pa.int64()),
                      "v": pa.array([f"row{i}-{j}" for j in range(50)], pa.string())}),
            d / f"part-{i:04d}.parquet",
        )
    return str(d)


class TestCompactParquet:
    def test_compacts_and_preserves_rows(self, ray_session, small_files_dir, tmp_path):
        import ray.data as rd

        from edge_deid_studio_ray.pipelines.maintenance import compact_parquet

        out = str(tmp_path / "compacted")
        stats = compact_parquet(small_files_dir, out, target_bytes=1 << 30)
        assert stats["files_before"] == 40
        assert stats["files_after"] < stats["files_before"]
        assert stats["rows"] == 2000
        # content identical (sorted)
        a = rd.read_parquet(small_files_dir).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        b = rd.read_parquet(out).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        assert a.equals(b)

    def test_empty_dir_fails_loudly(self, ray_session, tmp_path):
        from edge_deid_studio_ray.pipelines.maintenance import compact_parquet

        empty = tmp_path / "none"
        empty.mkdir()
        with pytest.raises(ValueError, match="no parquet files"):
            compact_parquet(str(empty), str(tmp_path / "out"))


class TestReadParquetUnion:
    def _dirs(self, tmp_path):
        old = tmp_path / "v1"
        new = tmp_path / "v2"
        old.mkdir(); new.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a", "b"], pa.string())}),
            old / "p.parquet",
        )
        pq.write_table(
            pa.table({"doc_id": pa.array([3], pa.int64()),
                      "text": pa.array(["c"], pa.string()),
                      "lang": pa.array(["en"], pa.string()),
                      "score": pa.array([0.5], pa.float64())}),
            new / "p.parquet",
        )
        return str(old), str(new)

    def test_union_schema_with_typed_nulls(self, ray_session, tmp_path):
        from edge_deid_studio_ray.pipelines.maintenance import read_parquet_union

        old, new = self._dirs(tmp_path)
        ds = read_parquet_union([old, new])
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(df.columns) == ["doc_id", "text", "lang", "score"]
        assert df["lang"].tolist()[:2] == [None, None]
        assert df["lang"].tolist()[2] == "en"
        assert df["score"].isna().tolist() == [True, True, False]
        assert len(df) == 3

    def test_conflicting_types_fail_loudly(self, ray_session, tmp_path):
        from edge_deid_studio_ray.pipelines.maintenance import read_parquet_union

        a = tmp_path / "a"; b = tmp_path / "b"
        a.mkdir(); b.mkdir()
        pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), a / "p.parquet")
        pq.write_table(pa.table({"x": pa.array(["s"], pa.string())}), b / "p.parquet")
        with pytest.raises(ValueError, match="conflicting types"):
            read_parquet_union([str(a), str(b)])
