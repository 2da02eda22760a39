"""S10/S11 ingest parity tests: idempotent fetch + tar.gz extraction,
including the distributed unpack variant."""

import os
import tarfile

import pytest

from distributed_deep_learning_with_apache_spark_spark.sources.ingest import (
    download_if_absent,
    extract_archives_distributed,
    extract_tar_gz,
)


@pytest.fixture()
def archive(tmp_path):
    src = tmp_path / "tree" / "pos"
    src.mkdir(parents=True)
    for i in range(3):
        (src / f"doc{i}.txt").write_text(f"document {i}")
    path = tmp_path / "corpus.tar.gz"
    with tarfile.open(path, "w:gz") as tar:
        tar.add(tmp_path / "tree", arcname="tree")
    return path


def test_download_if_absent_is_idempotent(tmp_path, archive):
    url = f"file://{archive}"
    dest = str(tmp_path / "fetched" / "corpus.tar.gz")
    assert download_if_absent(url, dest) is True
    assert os.path.exists(dest)
    # second call: exists-check short-circuits (DataUtilities.java:38)
    assert download_if_absent(url, dest) is False


def test_extract_tar_gz(tmp_path, archive):
    out = tmp_path / "out"
    names = extract_tar_gz(str(archive), str(out))
    assert sorted(os.path.basename(n) for n in names) == ["doc0.txt", "doc1.txt", "doc2.txt"]
    assert (out / "tree" / "pos" / "doc0.txt").read_text() == "document 0"


def test_extract_archives_distributed(spark, tmp_path, archive):
    df = extract_archives_distributed(spark, str(tmp_path), "*.tar.gz")
    rows = df.collect()
    assert len(rows) == 3
    assert all(r.size > 0 for r in rows)
    assert {os.path.basename(r.member) for r in rows} == {"doc0.txt", "doc1.txt", "doc2.txt"}
