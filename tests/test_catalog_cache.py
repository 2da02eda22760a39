"""_events_ts_is_nanos cache semantics (ADVICE r3 / VERDICT r3 #6): the
sniff is cached per (path, mtime, size), so regenerating a fixture IN PLACE
with a different timestamp unit must invalidate the cached answer — a stale
True/False silently scales every events timestamp by 1000. Empty dataset
directories must error loudly, not cache a guess.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
    _events_ts_is_nanos,
)


def _write_events(path: str, unit: str) -> None:
    t = pa.table({"ts": pa.array([1_700_000_000_000], type=pa.timestamp(unit))})
    pq.write_table(t, path, store_schema=False)


def test_cache_invalidates_on_inplace_regeneration(tmp_path):
    p = str(tmp_path / "events.parquet")
    _write_events(p, "ns")
    assert _events_ts_is_nanos(p) is True
    # Regenerate IN PLACE with µs timestamps; bump mtime past ns resolution
    # collisions just in case the filesystem is coarse.
    _write_events(p, "us")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert _events_ts_is_nanos(p) is False


def test_empty_dataset_dir_errors(tmp_path):
    d = tmp_path / "events.parquet"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        _events_ts_is_nanos(str(d))


def test_prune_stale_cache_siblings(tmp_path):
    """ADVICE r3: publishing a new mtime-keyed cache slug must sweep the
    previous generation's copy, but spare fresh .tmp staging dirs (a
    concurrent builder) and other prefixes."""
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
        prune_stale_cache_siblings,
    )

    base = tmp_path / "cache"
    old = base / "root_testdata_sf0.1_111_222"
    old4 = base / "root_testdata_sf0.1_111_222_333_444"  # two-table slug
    new = base / "root_testdata_sf0.1_333_444"
    staging = base / "root_testdata_sf0.1_555_666.tmp.12345"
    other = base / "root_testdata_sf1_777_888"
    # r4 ADVICE: a fixture whose slug EXTENDS this prefix is a different
    # fixture (sf0.1 vs sf0.1_alt) — its live cache must not be swept.
    extended = base / "root_testdata_sf0.1_alt_999_111"
    for d in (old, old4, new, staging, other, extended):
        d.mkdir(parents=True)
        (d / "data").write_text("x")
    prune_stale_cache_siblings(str(base), "root_testdata_sf0.1", str(new))
    assert not old.exists()          # previous generation swept
    assert not old4.exists()         # multi-key slug generation swept too
    assert new.exists()              # the published root kept
    assert staging.exists()          # fresh concurrent stage spared
    assert other.exists()            # different prefix untouched
    assert extended.exists()         # prefix-extending fixture untouched
