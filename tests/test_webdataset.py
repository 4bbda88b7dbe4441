"""WebDataset tar shard sink/source (sources/webdataset.py): byte
determinism, the closed-form archive length, member order, NULL member
omission, the md5 shard contract, and a write/read roundtrip."""

import hashlib
import io
import tarfile

import pytest
from pyspark.sql import functions as F

from webscraping_spark.sources import webdataset as wds


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (f"k{i:03d}", bytes([i % 251]) * (i * 37 % 900), f"caption {i}" if i % 5 else None)
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "image_id string, payload binary, caption string")


MEMBERS = {"bin": "payload", "txt": "caption"}


def test_build_deterministic_bytes(spark, pairs):
    a = {r["shard_id"]: bytes(r["tar"]) for r in wds.build_shards(pairs, MEMBERS, n_shards=4).collect()}
    b = {r["shard_id"]: bytes(r["tar"]) for r in wds.build_shards(pairs, MEMBERS, n_shards=4).collect()}
    assert a == b
    # and stable under a different input partitioning
    c = {
        r["shard_id"]: bytes(r["tar"])
        for r in wds.build_shards(pairs.repartition(7), MEMBERS, n_shards=4).collect()
    }
    assert a == c


def test_tar_structure_and_member_order(spark, pairs):
    for r in wds.build_shards(pairs, MEMBERS, n_shards=4).collect():
        with tarfile.open(fileobj=io.BytesIO(bytes(r["tar"]))) as tf:
            names = [ti.name for ti in tf.getmembers()]
            infos = tf.getmembers()
        # keys sorted; exts sorted within key; fixed metadata
        assert names == sorted(names)
        for ti in infos:
            assert ti.mtime == 0 and ti.uid == 0 and ti.gid == 0
            assert ti.mode == 0o644 and ti.uname == "" and ti.gname == ""
        assert r["n_entries"] == len(names)


def test_closed_form_length_and_manifest(spark, pairs):
    rows = wds.build_shards(pairs, MEMBERS, n_shards=4).collect()
    seen_keys = set()
    for r in rows:
        with tarfile.open(fileobj=io.BytesIO(bytes(r["tar"]))) as tf:
            sizes = [ti.size for ti in tf.getmembers()]
            keys = sorted({ti.name.rpartition(".")[0] for ti in tf.getmembers()})
        assert len(bytes(r["tar"])) == wds.expected_tar_len(sizes)
        assert r["payload_bytes"] == sum(sizes)
        assert r["n_keys"] == len(keys)
        digest = hashlib.md5(",".join(keys).encode()).hexdigest()
        assert r["keys_digest"] == digest
        seen_keys |= set(keys)
    assert len(seen_keys) == 40  # every pair landed in exactly one shard


def test_null_member_omitted_empty_kept(spark):
    df = spark.createDataFrame(
        [("a", b"x", None), ("b", b"y", "")],
        "image_id string, payload binary, caption string",
    )
    (r,) = wds.build_shards(df, MEMBERS, n_shards=1).collect()
    with tarfile.open(fileobj=io.BytesIO(bytes(r["tar"]))) as tf:
        names = {ti.name: ti.size for ti in tf.getmembers()}
    assert "a.txt" not in names  # NULL caption -> member omitted
    assert names["b.txt"] == 0  # empty caption -> zero-byte member
    assert r["n_entries"] == 3


def test_shard_assignment_matches_md5_contract(spark, pairs):
    import duckdb

    got = {
        r["image_id"]: r["sid"]
        for r in pairs.select(
            "image_id", wds.shard_id_col(F.col("image_id"), 4).alias("sid")
        ).collect()
    }
    con = duckdb.connect()
    for k, sid in got.items():
        (exp,) = con.execute(
            "SELECT ('0x' || substr(md5(? || ':wds'), 1, 8))::UBIGINT % 4", [k]
        ).fetchone()
        assert sid == exp, k


def test_write_read_roundtrip(spark, pairs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = wds.write_webdataset(pairs, out, MEMBERS, n_shards=4).collect()
    assert sum(r["n_keys"] for r in manifest) == 40
    back = wds.read_webdataset(spark, out)
    wide = {
        r["key"]: r
        for r in back.groupBy("key")
        .pivot("ext", ["bin", "txt"])
        .agg(F.first("data"))
        .collect()
    }
    orig = {r["image_id"]: r for r in pairs.collect()}
    assert set(wide) == set(orig)
    for k, o in orig.items():
        assert bytes(wide[k]["bin"]) == bytes(o["payload"])
        if o["caption"] is None:
            assert wide[k]["txt"] is None
        else:
            assert bytes(wide[k]["txt"]).decode() == o["caption"]
