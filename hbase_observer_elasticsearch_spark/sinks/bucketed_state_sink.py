"""Incremental bucketed state sink: per-epoch IO proportional to the
TOUCHED key set, not the whole state — with ATOMIC epoch commits.

`EmulatedEsSink` (state_sink.py) rewrites the full cell state every epoch —
correct and atomic, but O(|state|) per micro-batch, which at 100 TB of doc
state is a non-starter. This sink hash-partitions the state by
``bkt = pmod(xxhash64(rowkey), n_buckets)`` and, per epoch:

1. computes the buckets touched by the batch (a collect of ≤ n_buckets
   small ints — driver-safe at any scale);
2. reads ONLY those bucket partitions (path-level pruning via the
   manifest);
3. LWW-merges the batch in (state_sink.merge_epoch — identical semantics);
4. writes the touched buckets' NEW VERSIONS to the side
   (``bkt=K/v=N+1``), then atomically swaps a single ``_MANIFEST``
   pointer file mapping bucket → live version.

Per-epoch cost: O(|touched buckets|) ≈ O(|touched keys|) for realistic
n_buckets. The reference's analog is per-region locality: an HBase
mutation touches one region's files, never the whole table.

Atomicity: readers resolve bucket paths through ``_MANIFEST`` (swapped
with ``os.replace``), so a crash anywhere mid-epoch — mid-write,
between bucket publishes, before the swap — leaves the manifest pointing
at the complete OLD versions; a crash after the swap exposes the complete
NEW versions. Partial state is unobservable, even before checkpoint
replay (which remains idempotent via merge_epoch and deterministic
version numbering). This is the write-temp-then-rename layout production
lakehouse table formats (Delta/Iceberg) implement with a commit log; the
manifest is the single-writer miniature of it.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .state_sink import CELLS_SCHEMA, EsSinkConfig, _with_family, merge_epoch

N_BUCKETS = 32

_MANIFEST = "_MANIFEST"


class BucketedStateSink:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        config: EsSinkConfig | None = None,
        n_buckets: int = N_BUCKETS,
    ):
        self.spark = spark
        self.root = root
        self.config = config or EsSinkConfig()
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    def _bkt(self) -> F.Column:
        return F.pmod(F.xxhash64("rowkey"), F.lit(self.n_buckets))

    # -- manifest plumbing --------------------------------------------------
    def _manifest(self) -> dict[int, int]:
        """bucket → live version. Missing manifest = empty state."""
        p = os.path.join(self.root, _MANIFEST)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {int(k): int(v) for k, v in json.load(f)["buckets"].items()}

    def _swap_manifest(self, man: dict[int, int]) -> None:
        tmp = os.path.join(self.root, _MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"buckets": {str(k): v for k, v in man.items()}}, f)
        os.replace(tmp, os.path.join(self.root, _MANIFEST))

    def _bucket_path(self, bkt: int, version: int) -> str:
        return os.path.join(self.root, f"bkt={bkt}", f"v={version}")

    # -- read ---------------------------------------------------------------
    def read_cells(self, buckets: list[int] | None = None) -> DataFrame:
        man = self._manifest()
        if buckets is not None:
            keep = set(buckets)
            man = {b: v for b, v in man.items() if b in keep}
        paths = [self._bucket_path(b, v) for b, v in sorted(man.items())]
        if not paths:
            return self.spark.createDataFrame([], CELLS_SCHEMA)
        # mergeSchema + null-fill tolerate bucket versions written before a
        # schema column existed (e.g. pre-family state dirs).
        df = _with_family(
            self.spark.read.option("mergeSchema", "true").parquet(*paths)
        )
        return df.select(*[f.name for f in CELLS_SCHEMA.fields])

    # -- write --------------------------------------------------------------
    def _publish_bucket(self, src: str, dst: str) -> None:
        """Move one bucket's new version into place (crash-injectable in
        tests; never observable through the manifest until the swap)."""
        if os.path.exists(dst):  # replayed epoch: rebuild deterministically
            shutil.rmtree(dst)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(src, dst)

    def apply(
        self, cells: DataFrame, dels: DataFrame, epoch_id: int | None = None
    ) -> None:
        touched = sorted(
            r["bkt"]
            for r in cells.select(self._bkt().alias("bkt"))
            .unionByName(dels.select(self._bkt().alias("bkt")))
            .distinct()
            .collect()
        )
        if not touched:
            return
        man = self._manifest()
        cur = self.read_cells(buckets=touched)
        next_state = merge_epoch(cur, cells, dels).withColumn("bkt", self._bkt())

        # One job writes every touched bucket's next version to the side.
        tmp = os.path.join(self.root, f".epoch-{uuid.uuid4().hex[:12]}")
        (
            next_state.repartition("bkt")
            .write.mode("overwrite")
            .partitionBy("bkt")
            .parquet(tmp)
        )
        try:
            for b in touched:
                src = os.path.join(tmp, f"bkt={b}")
                if not os.path.exists(src):
                    # A touched bucket always yields >=1 row (cells or
                    # persistent tombstones) — guard anyway with an empty
                    # version so the manifest never points at nothing.
                    self.spark.createDataFrame([], CELLS_SCHEMA).write.mode(
                        "overwrite"
                    ).parquet(src)
                self._publish_bucket(src, self._bucket_path(b, man.get(b, 0) + 1))
            # THE commit point: readers flip to all new versions at once.
            self._swap_manifest({**man, **{b: man.get(b, 0) + 1 for b in touched}})
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        self._gc(keep={b: man.get(b, 0) + 1 for b in touched})

    def _gc(self, keep: dict[int, int]) -> None:
        """Drop versions older than the previous one (kept for rollback)
        and stale epoch temp dirs from crashed writers."""
        for b, v in keep.items():
            bdir = os.path.join(self.root, f"bkt={b}")
            for name in os.listdir(bdir):
                if name.startswith("v=") and int(name[2:]) < v - 1:
                    shutil.rmtree(os.path.join(bdir, name), ignore_errors=True)

    # -- document view ------------------------------------------------------
    def read_state(self) -> DataFrame:
        """(rowkey, doc): the ES-document view (same contract as
        EmulatedEsSink.read_state)."""
        return (
            self.read_cells()
            .filter(F.col("qualifier").isNotNull())
            .groupBy("rowkey")
            .agg(
                F.map_from_entries(
                    F.array_sort(F.collect_list(F.struct("qualifier", "value")))
                ).alias("doc")
            )
        )
