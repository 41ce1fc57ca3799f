"""Training-shard export — the terminal operator of a curation pipeline.

A curated corpus hands off to a training job as N reproducible, sized
shards plus a manifest the job (and any auditor) can re-verify. The two
properties that matter at 100 TB:

- **Deterministic global shuffle without a global sort.** Training data
  must be decorrelated from ingest order (crawl locality, source
  grouping), and re-running the export on a differently-partitioned
  cluster must produce the same shards. Both come from hashing: shard =
  H(salt, id) mod N, within-shard order = H(salt', id). One hash
  partitioning shuffle — never a total-order range sort, whose sampling
  pass and skew handling are pure overhead when the order only needs to
  be *pseudorandom and stable*, not globally monotone.
- **Sized shards with a verifiable manifest.** A training job wants
  shards near a target token budget (loader parallelism, restart
  granularity); ops wants a witness that what landed is what was
  computed. The manifest records per-shard rows / token sums / a
  content checksum, all computed from the SAME assignment expression
  that wrote the files, and ``verify_shards`` re-derives it from the
  landed parquet.

Hash families mirror the bloom-join precedent (`operators/bloom.py`):
``md5`` is the cross-engine family any SQL engine reproduces (the
declared-suite oracle checks it against DuckDB), ``xxhash64`` is the
production family (JVM-side, no hex round-trip).

No counterpart in the reference repo (its export is a single-table
anonymised write, `src/executor/executor.ts`); the sizing/manifest shape
follows public training-data pipelines (e.g. Dolma/RedPajama shard
layouts).
"""

from __future__ import annotations

import json
import math
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 60-bit md5-prefix hash — the package-wide cross-engine construction
#: (`('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB).
_HEX_PREFIX = 15

MANIFEST_NAME = "_manifest.json"


def _md5_long(expr: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(expr), 1, _HEX_PREFIX), 16, 10).cast("long")


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard-v1",
    hash_family: str = "md5",
) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) and ``_ord`` (within-shard sort key)
    columns — the deterministic global shuffle as pure column arithmetic.

    Both are functions of (salt, id) only: independent of partitioning,
    retry-stable, reproducible by any engine with the hash (md5 family).
    ``_ord`` is a raw 60-bit hash, NOT a dense position — rank needs a
    per-shard sort, which only the writer pays (as ``sortWithinPartitions``
    inside the write shuffle, never a separate window job).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    clash = [c for c in ("shard", "_ord") if c in df.columns]
    if clash:
        # withColumn would silently OVERWRITE user data (and the manifest
        # would checksum the overwritten values) — refuse loudly instead
        raise ValueError(
            f"input already has column(s) {clash}, which shard assignment "
            "would overwrite; rename them before exporting"
        )
    if hash_family == "md5":
        sid = F.col(id_col).cast("string")
        shard = _md5_long(F.concat(F.lit(salt), sid)) % n_shards
        ord_ = _md5_long(F.concat(F.lit(salt + "#ord"), sid))
    elif hash_family == "xxhash64":
        shard = F.pmod(F.xxhash64(F.lit(salt), F.col(id_col)), F.lit(n_shards))
        ord_ = F.xxhash64(F.lit(salt + "#ord"), F.col(id_col))
    else:
        raise ValueError("hash_family must be 'md5' or 'xxhash64'")
    return df.withColumn("shard", shard.cast("long")).withColumn("_ord", ord_)


def _row_checksum(cols: list[str]) -> F.Column:
    """Per-row 60-bit content hash over every exported column (NULL-safe:
    a NULL and the string 'NULL' differ via the unit separator join) —
    summed per shard into the manifest checksum. Decimal accumulator:
    ~2^60 per row would overflow BIGINT sums under ANSI at ~2^3 rows."""
    joined = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    return _md5_long(joined).cast("decimal(38,0)")


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int | None = None,
    tokens_per_shard: int | None = None,
    n_tokens_col: str | None = None,
    salt: str = "shard-v1",
    hash_family: str = "xxhash64",
    overwrite: bool = False,
) -> dict:
    """Materialize ``df`` as ``n_shards`` training shards under
    ``out_dir`` (``shard=K/`` parquet directories) plus a verifiable
    ``_manifest.json``; returns the manifest dict.

    Sizing: pass ``n_shards`` directly, or ``tokens_per_shard`` +
    ``n_tokens_col`` to derive it from one SUM aggregate (shards land
    near the budget in expectation; hash assignment balances them to
    ±O(sqrt) like any hash partitioning).

    Scale shape: ONE hash-partitioning shuffle (`repartition(n_shards,
    shard)`) with the within-shard order produced by
    ``sortWithinPartitions`` inside the same exchange — no global sort,
    no window. Every shard's rows land in exactly one task, so
    ``partitionBy`` emits ONE file per shard. The manifest aggregate is
    a second pass over the assignment expressions (a groupBy collapsing
    to n_shards rows — driver memory is O(n_shards), never O(rows)).
    The write stages into a temp sibling and atomically renames into
    place: a crashed export leaves no partial ``out_dir``.
    """
    if (n_shards is None) == (tokens_per_shard is None):
        raise ValueError("pass exactly one of n_shards / tokens_per_shard")
    if tokens_per_shard is not None:
        if n_tokens_col is None:
            raise ValueError("tokens_per_shard requires n_tokens_col")
        total = df.agg(F.sum(n_tokens_col).alias("t")).first()["t"] or 0
        n_shards = max(1, math.ceil(total / tokens_per_shard))

    out = Path(out_dir)
    if out.exists():
        if not overwrite:
            raise FileExistsError(f"{out_dir} exists (pass overwrite=True)")
    out.parent.mkdir(parents=True, exist_ok=True)

    data_cols = df.columns
    a = shard_assign(df, id_col, n_shards, salt=salt, hash_family=hash_family)

    staging = Path(tempfile.mkdtemp(prefix=out.name + ".staging-", dir=out.parent))
    try:
        (
            a.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "_ord", id_col)
            .drop("_ord")
            .write.partitionBy("shard")
            .parquet(str(staging / "data"), mode="overwrite")
        )

        agg = [
            F.count(F.lit(1)).alias("rows"),
            F.sum(_row_checksum(data_cols)).alias("checksum"),
        ]
        if n_tokens_col is not None:
            agg.append(F.sum(n_tokens_col).alias("n_tokens"))
        per_shard = {
            int(r["shard"]): {
                "rows": int(r["rows"]),
                "checksum": str(r["checksum"]),
                **(
                    {"n_tokens": int(r["n_tokens"] or 0)}
                    if n_tokens_col is not None
                    else {}
                ),
            }
            for r in a.groupBy("shard").agg(*agg).collect()
        }
        manifest = {
            "n_shards": n_shards,
            "id_col": id_col,
            "salt": salt,
            "hash_family": hash_family,
            "columns": data_cols,
            "total_rows": sum(s["rows"] for s in per_shard.values()),
            "shards": {str(k): per_shard[k] for k in sorted(per_shard)},
        }
        (staging / MANIFEST_NAME).write_text(json.dumps(manifest, indent=1))

        if out.exists():  # overwrite=True: swap, then drop the old tree
            old = out.parent / (out.name + ".old")
            # a crashed prior overwrite can leave the .old tree behind;
            # it is garbage by definition (its export already left `out`)
            if old.exists():
                shutil.rmtree(old)
            out.rename(old)
            staging.rename(out)
            shutil.rmtree(old)
        else:
            staging.rename(out)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return manifest


def read_shard(spark: SparkSession, out_dir: str, shard: int) -> DataFrame:
    """One shard in its written (deterministic) order — the training
    loader's unit of work. Partition-dir read, never a full-export scan."""
    return spark.read.parquet(f"{out_dir}/data/shard={shard}")


def verify_shards(spark: SparkSession, out_dir: str) -> dict:
    """Re-derive per-shard rows/checksum from the LANDED parquet and
    compare against the manifest — the integrity witness a training job
    runs before trusting an export (and the resume check after moving
    shards between stores). Returns {'ok': bool, 'mismatched': [shard]}.
    One scan of the export, collapsing to n_shards rows."""
    manifest = json.loads((Path(out_dir) / MANIFEST_NAME).read_text())
    cols = manifest["columns"]
    got = {
        int(r["shard"]): (int(r["rows"]), str(r["checksum"]))
        for r in spark.read.parquet(f"{out_dir}/data")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(_row_checksum(cols)).alias("checksum"),
        )
        .collect()
    }
    bad = []
    for k, want in manifest["shards"].items():
        if got.get(int(k), (None, None)) != (want["rows"], want["checksum"]):
            bad.append(int(k))
    for k in got:
        if str(k) not in manifest["shards"]:
            bad.append(k)
    return {"ok": not bad, "mismatched": sorted(bad)}
