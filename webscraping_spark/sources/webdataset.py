"""WebDataset-style tar shard sink + source for image-caption pairs.

Reference tie-in: the reference persists harvested media one file at a
time (``Download.save_as`` download.py:596-616, md5-named files in a
directory tree via ``FSCache`` pdict.py:501-597). At training scale
that layout is unusable — dataloaders stream *shards*: POSIX tar
archives holding a few thousand samples each, every sample's members
named ``<key>.<ext>`` (the WebDataset convention, Aizman et al. 2019;
LAION-400M/5B ship exactly this way). This module is that packaging
stage: deterministic tar shards built from the pair table the harvest +
curation pipeline produces.

Determinism contract (any engine re-derives the manifest bit-exactly):

- shard assignment: the engine's cross-engine md5 contract
  (sampling._hash_bucket device) — ``conv(substr(md5(key || ':' ||
  salt), 1, 8), 16, 10) % n_shards``. Content-hash sharding, not
  row_number: no global sort, no single-task window, reshuffle-stable.
- member order: keys sort lexicographically within a shard; member
  extensions sort within a key. NULL member values are omitted (a
  pair with no caption writes only its payload member); empty strings
  write zero-byte members.
- tar bytes: USTAR format, mtime=0, uid=gid=0, mode=0644, empty
  uname/gname — two identical builds are byte-identical, and the
  archive length has a closed form any SQL engine can compute:
  ``ceil((sum_members(512 + ceil(size/512)*512) + 1024) / 10240) *
  10240`` (per-member header + 512-padded data, two zero end blocks,
  record-size padding — the POSIX.1-1988 layout tarfile emits).

Scale shape: one exchange keyed on ``shard_id`` (uniform by md5 —
no skew), then each shard packs inside its own ``applyInPandas``
group and writes its own file; the driver never sees payload bytes.
Python here is the I/O packaging layer (a sink, like sinks.py), not a
relational operator — the per-member loop is bounded by shard size,
so ``n_shards`` must keep shards at the usual 0.1-1 GB (10^10 pairs
=> ~10^6-10^7 shards, each group a bounded pandas frame).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TAR_BLOCK = 512
TAR_RECORD = 10240  # tarfile RECORDSIZE: archives pad to this multiple

MANIFEST_SCHEMA = (
    "shard_id int, n_keys int, n_entries int, payload_bytes long, "
    "keys_digest string"
)


def shard_id_col(key_col: Column, n_shards: int, salt: str = "wds") -> Column:
    """Deterministic shard for a sample key (cross-engine md5 contract).

    DuckDB twin: ``('0x' || substr(md5(key || ':wds'), 1, 8))::UBIGINT
    % n_shards``."""
    h = F.conv(
        F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_shards)).cast("int")


def _pack_group(pdf, exts, out_dir):
    """Pack one shard's rows (already one shard_id) into tar bytes.

    Returns one manifest row; when ``out_dir`` is set the tar is written
    to ``shard-%05d.tar`` inside the task and the bytes column is
    omitted, otherwise the bytes ride the result (test/oracle mode)."""
    import pandas as pd

    pdf = pdf.sort_values("_key", kind="mergesort")
    shard_id = int(pdf["shard_id"].iloc[0])
    buf = io.BytesIO()
    n_entries = 0
    payload_bytes = 0
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, *vals in zip(pdf["_key"], *[pdf[e] for e in exts]):
            for ext, v in zip(exts, vals):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                ti = tarfile.TarInfo(f"{key}.{ext}")
                ti.size = len(data)
                ti.mtime = 0
                ti.mode = 0o644
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                tf.addfile(ti, io.BytesIO(data))
                n_entries += 1
                payload_bytes += len(data)
    tar = buf.getvalue()
    digest = hashlib.md5(",".join(pdf["_key"]).encode("utf-8")).hexdigest()
    row = {
        "shard_id": shard_id,
        "n_keys": len(pdf),
        "n_entries": n_entries,
        "payload_bytes": payload_bytes,
        "keys_digest": digest,
    }
    if out_dir is None:
        row["tar"] = tar
    else:
        path = os.path.join(out_dir, f"shard-{shard_id:05d}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(tar)
        os.rename(tmp, path)  # atomic like State.save (download.py:931-945)
    return pd.DataFrame([row])


def build_shards(
    df: DataFrame,
    members: dict[str, str],
    key_col: str = "image_id",
    n_shards: int = 8,
    salt: str = "wds",
    out_dir: str | None = None,
) -> DataFrame:
    """Pair rows -> one manifest row per shard.

    ``members`` maps tar extension -> source column (string columns
    encode utf-8, binary columns pass through). With ``out_dir`` each
    group writes its own ``shard-%05d.tar`` (the distributed sink path);
    without it the tar bytes return as a column (tests / the manifest
    oracle). Keys must be distinct — duplicate keys would collide on
    member names (dedup upstream; that is what the dedup operators are
    for)."""
    exts = sorted(members)
    src = df.select(
        F.col(key_col).cast("string").alias("_key"),
        shard_id_col(F.col(key_col), n_shards, salt).alias("shard_id"),
        *[F.col(c).alias(e) for e, c in sorted(members.items())],
    )
    schema = MANIFEST_SCHEMA if out_dir else MANIFEST_SCHEMA + ", tar binary"
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    return src.groupBy("shard_id").applyInPandas(
        lambda pdf: _pack_group(pdf, exts, out_dir), schema
    )


def write_webdataset(
    df: DataFrame,
    path: str,
    members: dict[str, str],
    key_col: str = "image_id",
    n_shards: int = 8,
    salt: str = "wds",
) -> DataFrame:
    """Write ``shard-%05d.tar`` files under ``path``; returns the
    manifest DataFrame (materialize it to drive the write)."""
    return build_shards(
        df, members, key_col=key_col, n_shards=n_shards, salt=salt, out_dir=path
    )


def read_webdataset(spark, path: str) -> DataFrame:
    """Shard tars -> long member table ``(shard_file, key, ext, data)``.

    binaryFile scan + mapInPandas untar (Arrow-batched; one task per
    shard file — the standard webdataset loading parallelism)."""

    def untar(batches):
        import pandas as pd

        for pdf in batches:
            out = {"shard_file": [], "key": [], "ext": [], "data": []}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for ti in tf.getmembers():
                        key, _, ext = ti.name.rpartition(".")
                        out["shard_file"].append(os.path.basename(fpath))
                        out["key"].append(key)
                        out["ext"].append(ext)
                        out["data"].append(tf.extractfile(ti).read())
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(os.path.join(path, "*.tar"))
    return files.select("path", "content").mapInPandas(
        untar, "shard_file string, key string, ext string, data binary"
    )


def expected_tar_len(member_sizes: list[int]) -> int:
    """Closed-form archive length (the oracle formula, Python twin)."""
    data = sum(TAR_BLOCK + -(-s // TAR_BLOCK) * TAR_BLOCK for s in member_sizes)
    data += 2 * TAR_BLOCK
    return -(-data // TAR_RECORD) * TAR_RECORD
