"""LakeTable — Iceberg-shaped table format implemented from scratch.

Layout (all paths relative to the table root)::

    _meta/v{N}.json      immutable snapshot: schema list + current schema id,
                         partition spec, file manifest (path, bucket, schema_id,
                         rows), committed_epoch, lineage metrics, parent version
    _meta/current        text file holding "N"; swapped atomically (os.replace)
    data/v{N}/bucket=K/  data files written by snapshot N (copy-on-write:
                         a snapshot's manifest mixes its own new files with
                         carried-over files from parent snapshots)

Semantics ported from the Iceberg spec (public), not from any runtime:
- snapshot isolation: readers resolve ``current`` once and read only that
  manifest's files; old snapshots stay readable (time travel via version=N);
- atomic commit: write ``v{N}.json`` fully, then ``os.replace`` a temp file
  onto ``current`` — POSIX-atomic, torn commits impossible; a crash before
  the swap leaves only orphan files, never a corrupt table;
- idempotent epoch commit (exactly-once sink, SURVEY.md P3): every snapshot
  records ``committed_epoch``; the ingest driver skips any epoch <= that,
  so replayed micro-batches are no-ops;
- add-column schema evolution (P7): each snapshot carries the full schema
  list + the id each file was written with; the reader projects EVERY file
  through the current schema (missing columns -> nulls) in one
  ``spark.read.schema(current).parquet(*paths)`` call — no per-file pass;
- manifest-level partition pruning: ``read(buckets=...)`` selects files by
  the manifest's bucket entries — no directory listing, no Spark partition
  discovery, mirroring Iceberg's scan planning.

Partition spec: ``bucket(conv_id, B)`` = ``pmod(xxhash64(conv_id), B)``,
computed in-JVM on write and recomputed on read when needed (cheaper than
storing it; files do not contain the bucket column, the directory name and
manifest do).

Single-writer assumption (one streaming ingest job), like a Connect task
owning its topic partitions.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

BUCKET_EXPR = "pmod(hash({col}), {b})"
DEFAULT_BUCKET_BY = "conv_id"
DEFAULT_KEY_COLS = ("conv_id", "turn_idx")


def bucket_col(bucket_count: int, col: str = DEFAULT_BUCKET_BY):
    """bucket(col) = pmod(murmur3(col), B) — deliberately the SAME
    function Spark's HashPartitioning uses, so ``df.repartition(B,
    col(<col>))`` yields partition_id == bucket. Writers then emit plain
    parquet (no partitionBy => no per-task sort of wide rows) and the
    manifest derives each file's bucket from its ``part-NNNNN`` index.
    Verified in tests: spark_partition_id() == bucket_col for all rows."""
    return F.pmod(F.hash(F.col(col)), F.lit(bucket_count)).cast("int")


def repartition_by_bucket(df: DataFrame, bucket_count: int,
                          col: str = DEFAULT_BUCKET_BY) -> DataFrame:
    """Cluster rows so partition id == bucket id (one exchange; downstream
    groupBy(col, ...) reuses it — subset clustering satisfaction)."""
    return df.repartition(bucket_count, F.col(col))


class LakeTableError(RuntimeError):
    pass


class LakeTableNotFound(LakeTableError):
    """Raised when ``root`` holds no table at all (no ``_meta/current``).

    A dedicated type so callers that open-or-create (IngestPipeline.table)
    can branch structurally instead of substring-matching the message —
    any OTHER LakeTableError (corrupt snapshot, schema mismatch) must
    propagate, never silently trigger table creation."""


class LakeTable:
    def __init__(self, root: str):
        self.root = root
        self._snapshot: dict | None = None
        self._load()

    # ---------- metadata ----------
    @property
    def meta_dir(self) -> str:
        return os.path.join(self.root, "_meta")

    def _load(self) -> None:
        cur = os.path.join(self.meta_dir, "current")
        if not os.path.exists(cur):
            raise LakeTableNotFound(f"not a lake table: {self.root}")
        with open(cur) as f:
            v = int(f.read().strip())
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            self._snapshot = json.load(f)

    def refresh(self) -> "LakeTable":
        self._load()
        return self

    @property
    def snapshot(self) -> dict:
        assert self._snapshot is not None
        return self._snapshot

    @property
    def version(self) -> int:
        return self.snapshot["version"]

    @property
    def committed_epoch(self) -> int:
        return self.snapshot["committed_epoch"]

    @property
    def bucket_count(self) -> int:
        return self.snapshot["bucket_count"]

    @property
    def bucket_by(self) -> str:
        """Partition column (pre-r3 snapshots default to conv_id)."""
        return self.snapshot.get("bucket_by", DEFAULT_BUCKET_BY)

    @property
    def key_cols(self) -> list[str]:
        """MERGE/resolution key columns (pre-r3 snapshots default to the
        transcript key)."""
        return list(self.snapshot.get("key_cols", DEFAULT_KEY_COLS))

    @property
    def schema(self) -> StructType:
        sid = self.snapshot["schema_id"]
        for s in self.snapshot["schemas"]:
            if s["id"] == sid:
                return StructType.fromJson(s["spark"])
        raise LakeTableError(f"schema id {sid} missing")

    def snapshot_at(self, version: int) -> dict:
        with open(os.path.join(self.meta_dir, f"v{version}.json")) as f:
            return json.load(f)

    # ---------- create ----------
    @classmethod
    def create(cls, root: str, schema: StructType, bucket_count: int = 64,
               bucket_by: str = DEFAULT_BUCKET_BY,
               key_cols=DEFAULT_KEY_COLS) -> "LakeTable":
        names = {f.name for f in schema.fields}
        missing = [c for c in [bucket_by, *key_cols] if c not in names]
        if missing:
            raise LakeTableError(
                f"bucket/key columns {missing} not in table schema")
        meta = os.path.join(root, "_meta")
        os.makedirs(meta, exist_ok=False)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        snap = {
            "format": "cdcrypt-lake/1",
            "version": 0,
            "parent": None,
            "schema_id": 0,
            "schemas": [{"id": 0, "spark": schema.jsonValue()}],
            "partition_spec": f"bucket({bucket_by}, {bucket_count})",
            "bucket_by": bucket_by,
            "key_cols": list(key_cols),
            "bucket_count": bucket_count,
            "files": [],
            "committed_epoch": -1,
            "lineage": {},
            "created_ms": int(time.time() * 1000),
        }
        with open(os.path.join(meta, "v0.json"), "w") as f:
            json.dump(snap, f)
        cls._swap_current(meta, 0)
        return cls(root)

    @staticmethod
    def _swap_current(meta_dir: str, version: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=meta_dir, prefix=".current.")
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(meta_dir, "current"))  # atomic

    # ---------- commit lock ----------
    # flock(2) on a well-known file: acquisition is ATOMIC in the kernel
    # (no read-pid/overwrite race — two stealers of the old pid-file
    # scheme could both enter the critical section) and the lock dies
    # WITH the holder (kernel releases on process exit), so crashed
    # writers leave nothing to steal and a same-pid-under-another-user
    # EPERM can never be mistaken for a dead holder. The lock file itself
    # is never unlinked (unlink + recreate would let two processes hold
    # flocks on different inodes of the same path). One-host scope, like
    # the pid lock before it; across hosts a real catalog provides the
    # CAS, as in Iceberg.
    @property
    def _lock_path(self) -> str:
        return os.path.join(self.meta_dir, "commit.lock")

    def _acquire_commit_lock(self, purpose: str) -> int:
        import fcntl
        fd = os.open(self._lock_path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            holder = b""
            try:
                holder = os.pread(fd, 32, 0)
            except OSError:
                pass
            os.close(fd)
            raise LakeTableError(
                f"commit conflict: another writer holds the commit lock "
                f"(holder pid {holder.decode(errors='replace').strip() or '?'}, "
                f"while acquiring for {purpose}); retry later")
        try:  # holder pid recorded for debugging only, not for liveness
            os.ftruncate(fd, 0)
            os.pwrite(fd, str(os.getpid()).encode(), 0)
        except OSError:
            pass
        return fd

    @staticmethod
    def _release_commit_lock(fd: int) -> None:
        os.close(fd)  # closing the fd releases the flock

    # ---------- commit ----------
    def commit(
        self,
        *,
        epoch: int,
        keep_files: list[dict],
        new_files: list[dict],
        lineage: dict,
        new_schema: StructType | None = None,
    ) -> int:
        """Write snapshot v{N+1} and atomically swap ``current``.

        ``keep_files``/``new_files``: manifest entries
        ``{path, bucket, schema_id, rows}`` (paths relative to root).
        """
        prev = self.snapshot
        version = prev["version"] + 1
        schemas = list(prev["schemas"])
        schema_id = prev["schema_id"]
        if new_schema is not None:
            cur_json = json.dumps(self.schema.jsonValue(), sort_keys=True)
            new_json = json.dumps(new_schema.jsonValue(), sort_keys=True)
            if cur_json != new_json:
                schema_id = max(s["id"] for s in schemas) + 1
                schemas.append({"id": schema_id, "spark": new_schema.jsonValue()})
        # files written by this commit carry the commit's schema id
        new_files = [
            {**f, "schema_id": schema_id} if f.get("schema_id") is None else f
            for f in new_files
        ]
        snap = {
            "format": "cdcrypt-lake/1",
            "version": version,
            "parent": prev["version"],
            "schema_id": schema_id,
            "schemas": schemas,
            "partition_spec": prev["partition_spec"],
            "bucket_by": prev.get("bucket_by", DEFAULT_BUCKET_BY),
            "key_cols": list(prev.get("key_cols", DEFAULT_KEY_COLS)),
            "bucket_count": prev["bucket_count"],
            "files": keep_files + new_files,
            "committed_epoch": epoch,
            "lineage": lineage,
            "created_ms": int(time.time() * 1000),
        }
        path = os.path.join(self.meta_dir, f"v{version}.json")
        # Commit lock: the write-snapshot -> swap-pointer sequence is not
        # atomic, so the orphan-recovery path below must not mistake a
        # writer currently INSIDE that window for a crash orphan; see
        # _acquire_commit_lock for why flock (not a pid file).
        lock_fd = self._acquire_commit_lock("commit")
        try:
            try:
                # O_EXCL create = optimistic concurrency (Iceberg commit
                # semantics): a v{N+1} that already exists means either a
                # COMMITTED snapshot from another writer (current advanced
                # -> hard conflict, refresh and retry) or an orphan left by
                # a crash between snapshot write and pointer swap (current
                # still behind; safe under the lock held here)
                with open(path, "x") as f:
                    json.dump(snap, f)
                    f.flush()
                    os.fsync(f.fileno())
            except FileExistsError as e:
                with open(os.path.join(self.meta_dir, "current")) as f:
                    cur_v = int(f.read().strip())
                if cur_v >= version:
                    raise LakeTableError(
                        f"commit conflict: snapshot v{version} already "
                        "committed by another writer; refresh() and retry"
                    ) from e
                fd, tmp = tempfile.mkstemp(dir=self.meta_dir, prefix=".snap.")
                with os.fdopen(fd, "w") as f:
                    json.dump(snap, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, path)
            self._swap_current(self.meta_dir, version)
        finally:
            self._release_commit_lock(lock_fd)
        self._snapshot = snap
        return version

    # ---------- read ----------
    def files(self, buckets: set[int] | None = None, version: int | None = None) -> list[dict]:
        snap = self.snapshot if version is None else self.snapshot_at(version)
        out = snap["files"]
        if buckets is not None:
            out = [f for f in out if f["bucket"] in buckets]
        return out

    def read(
        self,
        spark: SparkSession,
        buckets: set[int] | None = None,
        version: int | None = None,
        with_bucket: bool = False,
    ) -> DataFrame:
        """Scan the table (optionally bucket-pruned / time-traveled).

        One parquet read for ALL files of a kind regardless of schema id:
        the current schema is pushed as the read schema, so old files yield
        nulls for added columns (add-column evolution on read).

        Merge-on-read: when the scope contains delta files (appended change
        batches — see operators/merge.py MoR path), base and delta rows are
        unioned and resolved last-writer-wins per key, deletes dropped —
        Iceberg MoR semantics. Tables maintained copy-on-write never have
        deltas and skip all of this (plain scan, no shuffle).
        """
        snap_schema = (
            self.schema
            if version is None
            else StructType.fromJson(
                next(
                    s["spark"]
                    for s in self.snapshot_at(version)["schemas"]
                    if s["id"] == self.snapshot_at(version)["schema_id"]
                )
            )
        )
        fs = self.files(buckets, version)
        base_fs = [f for f in fs if f.get("kind", "base") == "base"]
        # log-only deltas (compacted=True) were folded into a base file by
        # the commit that references them — they exist for the incremental
        # change feed only, and reading them here would double-apply rows
        delta_fs = [f for f in fs
                    if f.get("kind", "base") == "delta"
                    and not f.get("compacted")]

        def _scan(files: list[dict], schema: StructType) -> DataFrame:
            if not files:
                return spark.createDataFrame([], schema)
            paths = [os.path.join(self.root, f["path"]) for f in files]
            return spark.read.schema(schema).parquet(*paths)

        if not delta_fs:
            df = _scan(base_fs, snap_schema)
        else:
            from pyspark.sql.types import LongType, StringType, StructField

            from cdcrypt.operators.dedup import resolve_latest_agg

            delta_schema = StructType(
                list(snap_schema.fields)
                + [StructField("op", StringType(), True),
                   StructField("epoch", LongType(), True)]
            )
            base = (
                _scan(base_fs, snap_schema)
                .withColumn("op", F.lit("I"))
                .withColumn("epoch", F.lit(-1).cast("long"))
            )
            delta = _scan(delta_fs, delta_schema)
            resolved = resolve_latest_agg(base.unionByName(delta),
                                          key_cols=self.key_cols)
            df = resolved.where(
                F.coalesce(F.col("op") != "D", F.lit(True))
            ).drop("op", "epoch").select(*[f.name for f in snap_schema.fields])
        if with_bucket:
            df = df.withColumn(
                "bucket", bucket_col(self.bucket_count, self.bucket_by))
        return df

    def total_rows(self) -> int:
        return sum(f["rows"] for f in self.snapshot["files"])

    # ---------- incremental read (CDC out) ----------
    def read_incremental(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """The raw change rows committed in snapshots ``(from, to]`` — an
        incremental CDC-out feed (Iceberg incremental append scan).

        MoR delta files ARE the change log: each carries the post-resolution
        change rows plus (op, epoch), so the incremental scan is simply
        "delta files first referenced by a snapshot in range", walked
        per-step so deltas later compacted away are still found via the
        intermediate snapshot JSONs. A delta folded into a base by its OWN
        commit (fused append+compact) is referenced log-only
        (``compacted=True``) and is served here all the same — the feed is
        complete even for epochs that triggered compaction.
        Compaction-produced base files are rewrites, not changes, and are
        excluded by kind. Copy-on-write commits carry no change log —
        raise rather than silently return a wrong feed."""
        to_version = self.version if to_version is None else to_version
        if not 0 <= from_version <= to_version <= self.version:
            raise LakeTableError(
                f"bad incremental range ({from_version}, {to_version}]")
        prev_paths = {f["path"]
                      for f in self.snapshot_at(from_version)["files"]}
        picked: list[dict] = []
        for v in range(from_version + 1, to_version + 1):
            snap = self.snapshot_at(v)
            if snap.get("lineage", {}).get("mode") == "cow":
                raise LakeTableError(
                    "incremental read requires merge-on-read deltas; "
                    f"snapshot v{v} was committed copy-on-write")
            added = [f for f in snap["files"] if f["path"] not in prev_paths]
            picked.extend(f for f in added if f.get("kind") == "delta")
            prev_paths = {f["path"] for f in snap["files"]}
        from pyspark.sql.types import LongType, StringType, StructField

        delta_schema = StructType(
            list(self.schema.fields)
            + [StructField("op", StringType(), True),
               StructField("epoch", LongType(), True)])
        if not picked:
            return spark.createDataFrame([], delta_schema)
        paths = [os.path.join(self.root, f["path"]) for f in picked]
        return spark.read.schema(delta_schema).parquet(*paths)

    # ---------- maintenance ----------
    def expire_snapshots(self, keep_last: int = 2,
                         orphan_grace_ms: int = 600_000) -> dict:
        """Iceberg-style snapshot expiration: keep the most recent
        ``keep_last`` snapshot JSONs, delete the rest, and remove data
        files no retained snapshot references. Time travel to expired
        versions stops working — by design; incremental reads remain
        possible across the retained window.

        Concurrency safety (ADVICE r2): runs under the commit lock, so a
        concurrent commit cannot swap the pointer (or write a v{N+1}.json
        this pass would treat as expired) mid-expiration. Data files are
        staged by executors BEFORE commit() is ever called, though — the
        lock cannot see those — so files referenced by NO snapshot at all
        are deleted only when older than ``orphan_grace_ms`` (Iceberg's
        orphan-file grace window): a fresh unreferenced file is an
        in-flight commit's staging, an old one is a crash leftover.
        Files referenced only by EXPIRED snapshots are positively known
        garbage and are removed regardless of age."""
        if keep_last < 1:
            raise LakeTableError("keep_last must be >= 1")
        lock_fd = self._acquire_commit_lock("expire_snapshots")
        try:
            self._load()  # re-resolve under the lock
            cur = self.version
            all_versions = {
                int(n[1:-5]) for n in os.listdir(self.meta_dir)
                if n.startswith("v") and n.endswith(".json")}
            keep_versions = {v for v in all_versions
                             if cur - keep_last + 1 <= v <= cur}
            retained_ref: set[str] = set()
            expired_ref: set[str] = set()
            for v in all_versions:
                try:
                    paths = {f["path"] for f in self.snapshot_at(v)["files"]}
                except (json.JSONDecodeError, KeyError, OSError) as e:
                    if v <= cur:
                        # a COMMITTED snapshot must parse — surface, don't
                        # guess which data files it referenced
                        raise LakeTableError(
                            f"corrupt committed snapshot v{v}.json") from e
                    # torn crash-orphan beyond current (writer died mid
                    # json.dump before the pointer swap): unreadable, so it
                    # references nothing; its json is removed with the other
                    # non-kept versions below. Without this, one torn file
                    # would fail every future expire_snapshots pass.
                    continue
                (retained_ref if v in keep_versions else expired_ref).update(paths)
            now_ms = time.time() * 1000
            removed_files = 0
            data_root = os.path.join(self.root, "data")
            for dirpath, _, names in os.walk(data_root, topdown=False):
                for n in names:
                    full = os.path.join(dirpath, n)
                    rel = os.path.relpath(full, self.root)
                    if not n.endswith(".parquet") or rel in retained_ref:
                        continue
                    if rel not in expired_ref:
                        # referenced by no snapshot: possibly an in-flight
                        # commit's staged file — only old ones are orphans
                        try:
                            age_ms = now_ms - os.stat(full).st_mtime * 1000
                        except OSError:
                            continue
                        if age_ms < orphan_grace_ms:
                            continue
                    os.remove(full)
                    removed_files += 1
                if not os.listdir(dirpath):
                    os.rmdir(dirpath)
            removed_snaps = 0
            for v in all_versions - keep_versions:
                os.remove(os.path.join(self.meta_dir, f"v{v}.json"))
                removed_snaps += 1
            return {"removed_snapshots": removed_snaps,
                    "removed_data_files": removed_files,
                    "kept_versions": sorted(keep_versions)}
        finally:
            self._release_commit_lock(lock_fd)
