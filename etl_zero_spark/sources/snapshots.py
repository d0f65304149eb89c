"""Versioned snapshot tables: manifest-pinned parquet with time travel.

The reference's zones are plain MySQL databases (data_extraction.py:
13-16): an overwrite is a DROP + re-INSERT, so a reader racing a
refresh sees a half-loaded table, and yesterday's state is simply gone.
A bare parquet directory on a lake has the same failure modes — plus
eventually-consistent listings — and at 100 TB "re-run the pipeline"
is not a rollback strategy.

This module is the smallest table format that fixes that, built from
two primitives object stores and POSIX both give us:

* data files are IMMUTABLE — every commit writes fresh part files into
  its own ``data/commit-<uuid>/`` directory and never touches existing
  bytes;
* a version is a MANIFEST — one JSON file listing exactly the data
  files that make up that version — published with an atomic
  create-if-absent (``os.link``), which doubles as optimistic
  concurrency control: two writers racing the same parent version
  produce one winner and one ``CommitConflict``, never interleaved
  state.

Everything else falls out of those two rules:

* **Readers never block writers** (and vice versa): a query plans
  against the explicit file list of one manifest, so an overwrite
  committed mid-query changes nothing the query reads.
* **Time travel** is reading an old manifest (``read(version=3)``).
* **Rollback** is a new commit whose file list is copied from an old
  manifest — history moves forward only, the bad version stays
  auditable.
* **Incremental consumption** (``read_changes``) is the file-list diff
  between two manifests — an append-only feed costs exactly the new
  files, never a rescan. This is what the materialized-view refresher
  (operators/matview.py) consumes.
* **Vacuum** deletes data files unreferenced by every retained
  manifest — and only those, so pinned history stays readable.

Scale notes: a manifest holds file paths and footer row counts, never
rows — its size is O(files), kept in check by layout.compact; commits
are metadata-atomic regardless of data volume (the multi-terabyte part
writes happen BEFORE the single link() publish, so a crashed writer
leaves invisible orphan files, cleaned by vacuum, not a corrupt
table). The same manifest-CAS design is how Delta Lake / Iceberg
commits work; this is the dependency-free core of it.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Another writer published this version first (optimistic
    concurrency loss). Re-read, re-apply, retry."""


def _norm_stat(v):
    """Normalize a stats/bound value to a JSON-storable type whose
    ordering matches the column's: numbers as-is (numpy scalars and
    Decimal fold to int/float through the abstract-number registries,
    so a caller's ``np.int64`` bound means what it says), strings
    as-is, datetimes/dates as fixed-width ISO strings (lexicographic
    order == chronological order at equal precision). Returns None for
    types we don't model (bool, bytes that aren't UTF-8, structs, ...)
    — callers MUST distinguish "value was None" from "value didn't
    normalize" (see ``delete_where``): conflating them turns an
    unmodeled bound into an open range end."""
    import datetime as _dt
    import decimal
    import numbers

    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, numbers.Integral):
        return int(v)
    if isinstance(v, numbers.Real):
        return float(v)
    if isinstance(v, decimal.Decimal):
        return int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, bytes):
        try:
            return v.decode()
        except UnicodeDecodeError:
            return None
    return None


def _version_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version:08d}.json")


#: Bloom geometry: 8192 bits (1 KiB/file/column in the manifest after
#: b64), 6 hash probes — ~1% false positives at ~850 distinct values
#: per file, degrading gracefully (false positives only cost a read).
_BLOOM_BITS = 8192
_BLOOM_K = 6

#: Bloom HASH-INPUT format version, stamped into every manifest that
#: carries blooms. Version 2 = the type-canonical ``_bloom_key`` form;
#: version 1 (implicit — manifests with no ``bloom_format`` field) was
#: ``md5(str(value))``. The two formats place equal values at
#: DIFFERENT bit positions, so consulting a v1 bloom with v2 probes
#: yields FALSE NEGATIVES — files silently skipped, wrong (empty)
#: point reads. Readers therefore ignore (conservatively keep all
#: files for) any bloom section whose manifest is not stamped with the
#: CURRENT format; re-index via ``compact(index=[...])`` or a fresh
#: ``commit(index=[...])`` to upgrade a pre-v2 table.
_BLOOM_FORMAT = 2


def _inherited_bloom_format(parent_manifest: dict | None):
    """Format tag for a manifest whose bloom section may mix freshly
    built blooms (current format) with blooms inherited from
    ``parent_manifest``. Fresh-only → current. A parent carrying
    blooms under a different (or unstamped, pre-v2) format makes the
    merged section mixed-format, so the parent's tag is propagated —
    the read side then distrusts the WHOLE section (keeps every file)
    rather than wrongly skipping files through stale bit positions."""
    if parent_manifest is None or not parent_manifest.get("bloom"):
        return _BLOOM_FORMAT
    return parent_manifest.get("bloom_format")


def _bloom_key(value) -> str:
    """CANONICAL string for bloom hashing. The build side hashes
    pyarrow ``to_pylist`` values and the query side hashes whatever
    Python literal the caller wrote; any two values that are equal
    under the column's (Spark) equality must map to the SAME key or
    the filter produces FALSE NEGATIVES — ``read_point(col, 5)``
    silently returning no rows while ``read_point(col, 5.0)`` finds
    them. So, mirroring ``_norm_stat``: all numerics fold to one form
    (integral-valued floats print as the integer — 5, 5.0 and
    np.int64(5) collide, exactly like Spark's 5 == 5.0), datetimes and
    dates to the fixed ISO form, UTF-8 bytes to their text. A type tag
    prefixes each class so e.g. the STRING '5' stays distinct from the
    number 5 (Spark would not equate those without a cast either)."""
    import datetime as _dt
    import decimal
    import math
    import numbers

    if isinstance(value, bool) or type(value).__name__ == "bool_":
        return f"bool:{bool(value)}"
    if isinstance(value, str):
        return f"str:{value}"
    if isinstance(value, numbers.Integral):
        return f"num:{int(value)}"
    if isinstance(value, (numbers.Real, decimal.Decimal)):
        f = float(value)
        if math.isfinite(f) and f.is_integer():
            return f"num:{int(f)}"
        return f"num:{f!r}"
    if isinstance(value, _dt.datetime):
        return f"ts:{value.strftime('%Y-%m-%d %H:%M:%S.%f')}"
    if isinstance(value, _dt.date):
        return f"ts:{value.strftime('%Y-%m-%d')} 00:00:00.000000"
    if isinstance(value, bytes):
        try:
            return f"str:{value.decode()}"
        except UnicodeDecodeError:
            return f"bin:{value.hex()}"
    return f"{type(value).__name__}:{value}"


def _bloom_positions(value) -> list[int]:
    """Stable hash positions for a value: md5 over the value's
    CANONICAL form (``_bloom_key`` — stable across processes/versions
    AND across the Python types an equal value can arrive in), split
    into k independent 32-bit probes."""
    import hashlib

    digest = hashlib.md5(_bloom_key(value).encode()).digest()
    out = []
    for i in range(_BLOOM_K):
        chunk = digest[(i * 2) % 14 : (i * 2) % 14 + 4]
        out.append(int.from_bytes(chunk, "little") % _BLOOM_BITS)
    return out


def _build_bloom(values) -> str:
    """Base64 bloom filter over an iterable of non-null values."""
    import base64

    bits = bytearray(_BLOOM_BITS // 8)
    for v in values:
        for p in _bloom_positions(v):
            bits[p // 8] |= 1 << (p % 8)
    return base64.b64encode(bytes(bits)).decode()


def _bloom_maybe_contains(b64: str, value) -> bool:
    import base64

    bits = base64.b64decode(b64)
    return all(
        bits[p // 8] & (1 << (p % 8)) for p in _bloom_positions(value)
    )


class SnapshotTable:
    """A versioned parquet table rooted at ``root``.

    Layout::

        root/
          data/commit-<uuid>/part-*.parquet   (immutable)
          _manifests/v00000001.json           (one per version)
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)

    # -- manifest access ---------------------------------------------------

    def versions(self) -> list[int]:
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        out = []
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        with open(_version_path(self.root, version)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        """Newest-first commit log (version, operation, rows, files,
        timestamp) — the audit trail the reference's drop-and-reload
        zones cannot produce."""
        out = []
        for v in reversed(self.versions()):
            m = self.manifest(v)
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "rows": m["rows"],
                    "n_files": len(m["files"]),
                    "committed_at": m["committed_at"],
                    "parent": m["parent"],
                }
            )
        return out

    # -- commit protocol ---------------------------------------------------

    def _stage(self, df: DataFrame) -> tuple[list[str], int, str, dict]:
        """Write ``df``'s part files into a fresh commit directory and
        return (relative file paths, row count, schema json, per-file
        column stats). Rows and stats come from the parquet footers the
        write just produced — no second Spark job; stats (min/max per
        numeric/string column, folded across row groups) ride the
        manifest and power ``read_where``'s file skipping."""
        import pyarrow.parquet as pq

        commit_dir = f"commit-{uuid.uuid4().hex[:16]}"
        abs_dir = os.path.join(self.root, _DATA_DIR, commit_dir)
        df.write.mode("overwrite").parquet(abs_dir)
        rel_files, rows, stats = [], 0, {}
        for f in sorted(os.listdir(abs_dir)):
            if f.endswith(".parquet"):
                rel = os.path.join(_DATA_DIR, commit_dir, f)
                rel_files.append(rel)
                meta = pq.ParquetFile(os.path.join(self.root, rel)).metadata
                rows += meta.num_rows
                fstats: dict[str, list] = {}
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            continue
                        mn, mx = _norm_stat(st.min), _norm_stat(st.max)
                        if mn is None or mx is None:
                            continue  # stats must stay JSON-comparable
                        name = col.path_in_schema
                        if name in fstats:
                            fstats[name] = [
                                min(fstats[name][0], mn),
                                max(fstats[name][1], mx),
                            ]
                        else:
                            fstats[name] = [mn, mx]
                if fstats:
                    stats[rel] = fstats
        return rel_files, rows, df.schema.json(), stats

    def _index_files(self, files: list[str], cols: list[str]) -> dict:
        """Per-file bloom filters for ``cols`` over freshly staged
        files: one LOCAL columnar read per file of just the indexed
        columns (pyarrow — no Spark job), ~1 KiB per (file, column) in
        the manifest."""
        import pyarrow.parquet as pq

        out: dict = {}
        for f in files:
            t = pq.read_table(os.path.join(self.root, f), columns=cols)
            fb = {}
            for c in cols:
                fb[c] = _build_bloom(
                    v for v in t.column(c).to_pylist() if v is not None
                )
            out[f] = fb
        return out

    def _publish(self, manifest: dict, version: int) -> int:
        """Atomically publish ``manifest`` as ``version``: write to a
        temp name, then ``os.link`` to the final name — link fails with
        EEXIST if any other writer published this version first, and a
        linked file appears fully written or not at all."""
        final = _version_path(self.root, version)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise CommitConflict(
                f"version {version} was committed by another writer; "
                "re-read the table and retry"
            ) from None
        finally:
            os.unlink(tmp)
        return version

    def commit(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        expected_version: int | None = None,
        index: list[str] | None = None,
        operation_prefix: str | None = None,
    ) -> int:
        """Commit ``df`` as a new version. ``mode='overwrite'`` replaces
        the logical table; ``mode='append'`` adds to it (the new
        manifest references the parent's files PLUS the new ones — no
        data is rewritten). ``operation_prefix`` tags the manifest's
        operation as ``{prefix}:{mode}`` — the epoch-ledger hook
        streaming writers use for replay detection (upsert has the
        same parameter).

        ``expected_version`` is the read-set guard for
        read-modify-write flows: pass the version you read, and the
        commit refuses (``CommitConflict``) if anyone committed since —
        even before the CAS race on the manifest file itself.

        ``index`` lists columns to bloom-index per file: min/max stats
        only skip files for CLUSTERED columns (a random key's range
        spans every file), blooms give point lookups (``read_point``)
        file skipping on any key at ~1 KiB of manifest per
        (file, column). Appends inherit the parent's blooms for its
        files.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode {mode!r}: use 'overwrite' or 'append'")
        parent = self.current_version()
        if expected_version is not None and parent != expected_version:
            raise CommitConflict(
                f"expected to commit on top of version {expected_version} "
                f"but current is {parent}"
            )
        if mode == "append" and parent is not None:
            # Schema guard: a manifest mixes old and new files into ONE
            # schema-pinned read, so the rules are Delta's: an append
            # may ADD columns (additive evolution — the manifest schema
            # widens, old files read NULL for the new fields via the
            # pinned-schema read), but may not DROP or RE-TYPE existing
            # ones; destructive evolution stays an explicit overwrite.
            prev = {
                f["name"]: str(f["type"])
                for f in json.loads(self.manifest(parent)["schema"])["fields"]
            }
            new = {
                f["name"]: str(f["type"])
                for f in json.loads(df.schema.json())["fields"]
            }
            missing = sorted(set(prev) - set(new))
            retyped = sorted(
                c for c in set(prev) & set(new) if prev[c] != new[c]
            )
            if missing or retyped:
                raise ValueError(
                    "append schema mismatch vs current version "
                    f"(dropped: {missing}; re-typed: {retyped}); additive "
                    "columns are allowed, destructive evolution needs "
                    "mode='overwrite'"
                )
        new_files, new_rows, schema_json, new_stats = self._stage(df)
        files, rows, stats = list(new_files), new_rows, dict(new_stats)
        bloom = self._index_files(new_files, index) if index else {}
        if mode == "append" and parent is not None:
            pm = self.manifest(parent)
            files = pm["files"] + files
            rows = pm["rows"] + new_rows
            stats = {**pm.get("stats", {}), **stats}
            bloom = {**pm.get("bloom", {}), **bloom}
            bloom_format = _inherited_bloom_format(pm)
        else:
            bloom_format = _BLOOM_FORMAT
        manifest = {
            "version": (parent + 1) if parent is not None else 0,
            "parent": parent,
            "operation": f"{operation_prefix}:{mode}" if operation_prefix else mode,
            "files": files,
            "added_files": new_files,
            "rows": rows,
            "schema": schema_json,
            "stats": stats,
            "bloom": bloom,
            "bloom_format": bloom_format,
            "committed_at": time.time(),
        }
        return self._publish(manifest, manifest["version"])

    def upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str,
        expected_version: int | None = None,
        operation_prefix: str | None = None,
        check_unique_keys: bool = True,
    ) -> int:
        """Row-level MERGE (upsert) with copy-on-write file pruning:
        rows in ``updates`` replace current rows with an equal ``key``;
        new keys insert. Only the files whose manifest key-range
        overlaps the update batch are rewritten — every other file is
        carried into the new manifest untouched, so a 100-row update
        against a 100 TB range-laid-out table rewrites a handful of
        files, not the table. (This is Delta/Iceberg's copy-on-write
        MERGE shape; clustering the table on the merge key —
        operators/layout.write_sorted — is what makes the pruning
        bite.)

        The overlap test uses the single [min, max] interval of the
        update keys (one tiny aggregate job, nothing collected beyond
        two scalars); files without stats for ``key`` are
        conservatively rewritten. Updates must match the table schema
        (same guard as append).

        NULL merge keys have no identity: a null-key update row matches
        no existing row (SQL null-equality, same as Delta/Iceberg MERGE)
        and therefore INSERTS on every application — a replayed batch
        with null keys accumulates its null-key rows. Scrub or
        surrogate-key nulls upstream (operators/validate.not_null is
        the gate) when replays are possible.

        DUPLICATE keys within one batch have no defined winner, and a
        merge applying them would silently break the table's key
        uniqueness (every later pruned upsert assumes one row per key).
        ``check_unique_keys`` (default on) spends one small aggregation
        job on the UPDATE BATCH — the small side by design — and raises
        instead; pre-collapse with ``incremental.merge_latest`` (the
        CDC keep-latest rule) or pass ``check_unique_keys=False`` when
        the feed is already collapsed and the job matters.
        """
        v = self.current_version()
        if v is None:
            files, rows, schema_json, stats = self._stage(updates)
            return self._publish(
                {
                    "version": 0,
                    "parent": None,
                    "operation": (
                        f"{operation_prefix}:overwrite"
                        if operation_prefix
                        else "overwrite"
                    ),
                    "files": files,
                    "added_files": files,
                    "rows": rows,
                    "schema": schema_json,
                    "stats": stats,
                    "committed_at": time.time(),
                },
                0,
            )
        if expected_version is not None and v != expected_version:
            raise CommitConflict(
                f"expected to upsert on top of version {expected_version} "
                f"but current is {v}"
            )
        m = self.manifest(v)
        prev = {
            (f["name"], str(f["type"]))
            for f in json.loads(m["schema"])["fields"]
        }
        new = {
            (f["name"], str(f["type"]))
            for f in json.loads(updates.schema.json())["fields"]
        }
        if prev != new:
            raise ValueError(
                "upsert schema mismatch vs current version "
                f"(only in table: {sorted(prev - new)}; only in updates: "
                f"{sorted(new - prev)})"
            )
        from pyspark.sql import functions as F

        if check_unique_keys:
            dup = (
                updates.where(F.col(key).isNotNull())
                .groupBy(key)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .limit(3)
                .collect()
            )
            if dup:
                sample = ", ".join(str(r[key]) for r in dup)
                raise ValueError(
                    f"upsert batch has duplicate values for key {key!r} "
                    f"(e.g. {sample}): no defined winner — pre-collapse "
                    "with incremental.merge_latest, or pass "
                    "check_unique_keys=False for an already-collapsed feed"
                )
        bounds = updates.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).first()
        if bounds is None or bounds["lo"] is None:
            return v  # empty update batch: nothing to do
        pr = self.prune_files(key, bounds["lo"], bounds["hi"], version=v)
        candidates, cand_set = pr["kept"], set(pr["kept"])
        untouched = [f for f in m["files"] if f not in cand_set]
        base_cand = self._read_files(spark, candidates, m["schema"])
        cols = [f["name"] for f in json.loads(m["schema"])["fields"]]
        merged = base_cand.join(
            updates.select(key).dropDuplicates(), key, "left_anti"
        ).select(*cols).unionByName(updates.select(*cols))
        new_files, new_rows, schema_json, new_stats = self._stage(merged)
        # untouched rows from their parquet footers (local metadata read)
        import pyarrow.parquet as pq

        untouched_rows = sum(
            pq.ParquetFile(os.path.join(self.root, f)).metadata.num_rows
            for f in untouched
        )
        old_stats = m.get("stats", {})
        op = f"upsert({len(candidates)}/{len(m['files'])} files rewritten)"
        if operation_prefix:
            op = f"{operation_prefix}:{op}"
        # Blooms survive for untouched files; files this merge REWROTE
        # are re-indexed on the columns the parent carried blooms for —
        # otherwise every upsert quietly widens point lookups (the
        # bloom-less rewritten files are conservatively kept forever
        # until an explicit indexed commit/compact). The re-index is a
        # local pyarrow column read per new file — noise next to the
        # rewrite that produced them.
        bloom_cols = sorted({c for fb in m.get("bloom", {}).values() for c in fb})
        manifest = {
            "version": v + 1,
            "parent": v,
            "operation": op,
            "files": untouched + new_files,
            "added_files": new_files,
            "rows": untouched_rows + new_rows,
            "schema": schema_json,
            "stats": {
                **{f: old_stats[f] for f in untouched if f in old_stats},
                **new_stats,
            },
            "bloom": {
                **{
                    f: b
                    for f, b in m.get("bloom", {}).items()
                    if f in set(untouched)
                },
                **(self._index_files(new_files, bloom_cols) if bloom_cols else {}),
            },
            "bloom_format": _inherited_bloom_format(m),
            "committed_at": time.time(),
        }
        return self._publish(manifest, manifest["version"])

    def delete_where(
        self,
        spark: SparkSession,
        column: str,
        lo,
        hi,
        expected_version: int | None = None,
    ) -> int:
        """Copy-on-write range delete: remove every row with
        ``lo <= column <= hi`` (open ends via None) as a new version.

        Three file classes, judged from manifest stats before any row
        work:

        * **disjoint** from the range — carried over untouched;
        * **fully covered** (file min/max inside the range, no nulls
          uncertainty — stats present) — DROPPED from the manifest
          without reading a byte: on a range-laid-out table a
          "delete last year" retention pass is metadata-only for
          almost every file, the reason table formats exist;
        * **boundary / unknown-stats** — rewritten with the residual
          NOT-in-range filter.

        Rows with NULL in ``column`` never match a range predicate and
        are preserved (rewritten files keep them explicitly; fully-
        covered classification requires stats, and parquet min/max
        stats say nothing about nulls — so files that MIGHT hold nulls
        are only ever dropped when their null_count metadata is absent
        from our stats model, hence full-cover drop additionally
        requires the rewrite check below to be impossible; we take the
        conservative route and only drop a file when its stats bound
        it inside the range AND a footer check shows zero nulls).
        """
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"snapshot table {self.root} has no commits")
        if expected_version is not None and v != expected_version:
            raise CommitConflict(
                f"expected to delete on top of version {expected_version} "
                f"but current is {v}"
            )
        import pyarrow.parquet as pq

        from pyspark.sql import functions as F

        m = self.manifest(v)
        stats = m.get("stats", {})
        lo_n, hi_n = _norm_stat(lo), _norm_stat(hi)
        # A non-None bound that _norm_stat can't model must NOT read as
        # an open range end: "covered" with a phantom -inf/+inf bound
        # drops files metadata-only that the real predicate would keep
        # — silent data loss from e.g. a bool bound. (Numpy scalars and
        # Decimal normalize fine; this guard is for genuinely unmodeled
        # types.) Conservative route: skip the stats classification and
        # rewrite every file with the exact predicate.
        unmodeled = (lo is not None and lo_n is None) or (
            hi is not None and hi_n is None
        )
        keep, drop, rewrite = [], [], []
        for f in m["files"]:
            s = None if unmodeled else stats.get(f, {}).get(column)
            if s is None:
                rewrite.append(f)
                continue
            mn, mx = s
            try:
                disjoint = (hi_n is not None and mn > hi_n) or (
                    lo_n is not None and mx < lo_n
                )
                covered = (lo_n is None or mn >= lo_n) and (
                    hi_n is None or mx <= hi_n
                )
            except TypeError:
                # bound/stat type mismatch (e.g. string bound on a
                # numeric column): no safe classification — rewrite
                rewrite.append(f)
                continue
            if disjoint:
                keep.append(f)
            elif covered:
                # stats bound all NON-NULL values inside the range; a
                # zero-null footer check makes the drop exact
                meta = pq.ParquetFile(os.path.join(self.root, f)).metadata
                nulls = 0
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema == column and col.statistics:
                            nulls += col.statistics.null_count or 0
                (drop if nulls == 0 else rewrite).append(f)
            else:
                rewrite.append(f)
        c = F.col(column)
        in_range = F.lit(True)
        if lo is not None:
            in_range = in_range & (c >= F.lit(lo))
        if hi is not None:
            in_range = in_range & (c <= F.lit(hi))
        survivors = self._read_files(spark, rewrite, m["schema"]).where(
            ~F.coalesce(in_range, F.lit(False))  # NULLs survive a range delete
        )
        new_files, new_rows, schema_json, new_stats = self._stage(survivors)
        kept_rows = sum(
            pq.ParquetFile(os.path.join(self.root, f)).metadata.num_rows
            for f in keep
        )
        manifest = {
            "version": v + 1,
            "parent": v,
            "operation": (
                f"delete({len(drop)} files dropped metadata-only, "
                f"{len(rewrite)} rewritten, {len(keep)} untouched)"
            ),
            "files": keep + new_files,
            "added_files": new_files,
            "rows": kept_rows + new_rows,
            "schema": schema_json,
            "stats": {
                **{f: stats[f] for f in keep if f in stats},
                **new_stats,
            },
            # kept files keep their blooms; rewritten survivors are
            # re-indexed on the parent's bloom columns (see upsert)
            "bloom": {
                **{f: b for f, b in m.get("bloom", {}).items() if f in set(keep)},
                **(
                    self._index_files(
                        new_files,
                        sorted(
                            {c for fb in m.get("bloom", {}).values() for c in fb}
                        ),
                    )
                    if m.get("bloom")
                    else {}
                ),
            },
            "bloom_format": _inherited_bloom_format(m),
            "committed_at": time.time(),
        }
        return self._publish(manifest, manifest["version"])

    def rollback(self, to_version: int) -> int:
        """Restore the table to ``to_version``'s contents via a NEW
        commit that references that version's files — no data moves,
        the rolled-back versions stay in history for audit."""
        m = self.manifest(to_version)
        parent = self.current_version()
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "operation": f"rollback-to-{to_version}",
            "files": m["files"],
            "added_files": [],
            "rows": m["rows"],
            "schema": m["schema"],
            "stats": m.get("stats", {}),
            "bloom": m.get("bloom", {}),
            "bloom_format": _inherited_bloom_format(m),
            "committed_at": time.time(),
        }
        return self._publish(manifest, manifest["version"])

    # -- reads -------------------------------------------------------------

    def _read_files(self, spark: SparkSession, files: list[str], schema_json: str) -> DataFrame:
        schema = StructType.fromJson(json.loads(schema_json))
        if not files:
            return spark.createDataFrame([], schema)
        # The manifest schema is authoritative: pinning it on the reader
        # (a) skips footer-merging across files and (b) makes ADDITIVE
        # schema evolution work — files written before a column existed
        # surface NULL for it, exactly like Delta's column mapping.
        return spark.read.schema(schema).parquet(
            *[os.path.join(self.root, f) for f in files]
        )

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the table as of ``version`` (default: latest). The plan
        pins the manifest's explicit file list, so concurrent commits
        and vacuum-of-other-versions cannot change what this query
        sees."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"snapshot table {self.root} has no commits")
        m = self.manifest(v)
        return self._read_files(spark, m["files"], m["schema"])

    def prune_files(
        self, column: str, lo, hi, version: int | None = None
    ) -> dict:
        """Manifest-level data skipping: which files can contain rows
        with ``lo <= column <= hi``, judged from the per-file min/max
        captured at commit time. Files with no stats for the column are
        conservatively kept. Zero Spark jobs, O(manifest)."""
        v = self.current_version() if version is None else version
        m = self.manifest(v)
        stats = m.get("stats", {})
        lo_n, hi_n = _norm_stat(lo), _norm_stat(hi)
        kept = []
        for f in m["files"]:
            s = stats.get(f, {}).get(column)
            try:
                skip = s is not None and (
                    (hi_n is not None and s[0] > hi_n)
                    or (lo_n is not None and s[1] < lo_n)
                )
            except TypeError:
                skip = False  # bound/stat type mismatch: keep (conservative)
            if not skip:
                kept.append(f)
        return {"kept": kept, "n_kept": len(kept), "n_total": len(m["files"])}

    def read_where(
        self, spark: SparkSession, column: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Range read with manifest-level file skipping: plans only the
        files whose stats overlap [lo, hi], then applies the exact
        predicate. On a range-laid-out or Z-ordered table
        (operators/layout.py) this is the snapshot-format version of
        partition pruning — the scan never opens the skipped files'
        footers, let alone their bytes.
        """
        v = self.current_version() if version is None else version
        pr = self.prune_files(column, lo, hi, version=v)
        df = self._read_files(spark, pr["kept"], self.manifest(v)["schema"])
        from pyspark.sql import functions as F

        c = F.col(column)
        if lo is not None:
            df = df.where(c >= F.lit(lo))
        if hi is not None:
            df = df.where(c <= F.lit(hi))
        return df

    def prune_files_point(
        self, column: str, value, version: int | None = None
    ) -> dict:
        """Point-lookup file skipping: a file is kept only if BOTH
        filters admit it — the per-file bloom recorded at commit time
        (``commit(index=[...])``; ~1% false positives at the default
        geometry, a false positive costs one extra read, never a wrong
        result) AND the manifest min/max stats treated as the
        degenerate range [value, value]. The stats half means point
        lookups on a CLUSTERED column prune even when the column was
        never bloom-indexed; files missing either structure for the
        column are conservatively kept by that structure."""
        v = self.current_version() if version is None else version
        m = self.manifest(v)
        # Bloom sections stamped with a different (or missing, pre-v2)
        # hash format would probe stale bit positions → false negatives
        # → files wrongly skipped. Distrust the whole section instead:
        # min/max stats still prune, blooms resume after a re-index.
        blooms = (
            m.get("bloom", {})
            if m.get("bloom_format") == _BLOOM_FORMAT
            else {}
        )
        stats = m.get("stats", {})
        v_n = _norm_stat(value)
        kept = []
        for f in m["files"]:
            b = blooms.get(f, {}).get(column)
            if b is not None and not _bloom_maybe_contains(b, value):
                continue
            s = stats.get(f, {}).get(column)
            if s is not None and v_n is not None:
                try:
                    if s[0] > v_n or s[1] < v_n:
                        continue
                except TypeError:
                    pass  # bound/stat type mismatch: keep (conservative)
            kept.append(f)
        return {"kept": kept, "n_kept": len(kept), "n_total": len(m["files"])}

    def read_point(
        self, spark: SparkSession, column: str, value, version: int | None = None
    ) -> DataFrame:
        """Exact point lookup: plan only the bloom-possible files, then
        apply the equality filter. On an indexed key this is the
        needle-in-100TB read: a handful of files regardless of how the
        key scatters across the layout."""
        v = self.current_version() if version is None else version
        pr = self.prune_files_point(column, value, version=v)
        from pyspark.sql import functions as F

        return self._read_files(spark, pr["kept"], self.manifest(v)["schema"]).where(
            F.col(column) == F.lit(value)
        )

    def create_view(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame:
        """Register a (versioned) read as a temp view on the free-SQL
        surface (Q1): ``spark.sql`` queries then run against a PINNED
        manifest — a long interactive session keeps a consistent table
        even while writers commit."""
        df = self.read(spark, version=version)
        df.createOrReplaceTempView(name)
        return df

    def rows(self, version: int | None = None) -> int:
        """Exact row count from the manifest — O(1), no Spark job (the
        counts were folded from parquet footers at commit time)."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"snapshot table {self.root} has no commits")
        return self.manifest(v)["rows"]

    def diff(self, from_version: int, to_version: int) -> dict:
        """File-level delta between two versions: which files were added
        and which removed. O(manifest) — no Spark job."""
        a = set(self.manifest(from_version)["files"])
        b = set(self.manifest(to_version)["files"])
        return {"added": sorted(b - a), "removed": sorted(a - b)}

    def read_changes(
        self, spark: SparkSession, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Rows in files added after ``since_version`` up to
        ``to_version`` (default latest) — the incremental-consumption
        read: an append-only feed costs exactly the new files.

        Raises if any file was REMOVED in the range (an overwrite or
        rollback happened): file-diff semantics only equal row-diff
        semantics on append-only history, and serving a wrong "delta"
        silently would corrupt every downstream incremental consumer.
        Callers catch this and fall back to a full recompute.
        """
        v_to = self.current_version() if to_version is None else to_version
        d = self.diff(since_version, v_to)
        if d["removed"]:
            raise ValueError(
                f"non-append history between v{since_version} and v{v_to}: "
                f"{len(d['removed'])} file(s) removed (overwrite/rollback); "
                "incremental read is not well-defined — recompute from the "
                "full snapshot instead"
            )
        return self._read_files(spark, d["added"], self.manifest(v_to)["schema"])

    def diff_rows(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        key: str | None = None,
    ) -> DataFrame:
        """Row-level changelog between two versions — the change-data
        feed for history ``read_changes`` refuses (overwrites,
        rollbacks, upserts).

        Without ``key``: multiset diff — each row tagged ``insert`` or
        ``delete`` (a changed row appears as both). With ``key``: keyed
        classification into ``insert`` / ``delete`` / ``update_pre`` /
        ``update_post`` (both images of an update emitted, Delta-CDF
        style; rows identical on both sides drop out first via the
        multiset diff, so unchanged keys never surface).

        Cost model: both versions' UNCHANGED SHARED FILES are skipped
        before any row work — a file present in both manifests
        contributes identical rows to both sides and cancels from a
        multiset diff by construction. After an upsert that rewrote
        1/1000 files, the diff reads 2 files, not 2000. The remaining
        rows diff with ``exceptAll`` (one shuffle each side).
        """
        v_to = self.current_version() if to_version is None else to_version
        a_m, b_m = self.manifest(from_version), self.manifest(v_to)
        shared = set(a_m["files"]) & set(b_m["files"])
        old = self._read_files(
            spark, [f for f in a_m["files"] if f not in shared], a_m["schema"]
        )
        new = self._read_files(
            spark, [f for f in b_m["files"] if f not in shared], b_m["schema"]
        )
        from pyspark.sql import functions as F

        ins = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        dels = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        if key is None:
            return ins.unionByName(dels)
        both = ins.unionByName(dels)
        kinds = both.groupBy(key).agg(
            F.count(F.when(F.col("_change_type") == "insert", 1)).alias("__i"),
            F.count(F.when(F.col("_change_type") == "delete", 1)).alias("__d"),
        )
        out = both.join(kinds, key)
        return out.select(
            *[c for c in both.columns if c != "_change_type"],
            F.when(
                (F.col("__i") > 0) & (F.col("__d") > 0),
                F.when(
                    F.col("_change_type") == "insert", F.lit("update_post")
                ).otherwise(F.lit("update_pre")),
            )
            .otherwise(F.col("_change_type"))
            .alias("_change_type"),
        ).drop("__i", "__d")

    # -- maintenance -------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        target_file_mb: int = 128,
        cluster_by: list[str] | str | None = None,
        index: list[str] | None = None,
        n_files: int | None = None,
    ) -> int:
        """Bin-pack the current version's files into ~``target_file_mb``
        outputs as a new commit (the snapshot-aware twin of
        operators/layout.compact): readers of old versions keep their
        files until vacuum.

        ``cluster_by`` re-sorts while compacting (range partition +
        sort within files on the given columns) so the rewritten
        files carry DISJOINT key ranges — after a streaming ingest's
        arrival-ordered small files, one maintenance pass restores the
        layout that makes ``read_where``/``delete_where`` prune
        (coalesce alone preserves the arrival scatter). ``index``
        rebuilds bloom indexes on the compacted files.

        Read-set guard: the version read is PINNED and passed as the
        commit's ``expected_version`` — a writer landing between
        compact's read and its publish raises ``CommitConflict`` (retry
        the maintenance pass) instead of being silently overwritten
        with pre-commit contents. The manifest CAS alone cannot catch
        that (the next version number is free either way); upsert/
        delete_where already pin their read version the same way."""
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"snapshot table {self.root} has no commits")
        cur = self.read(spark, version=v)
        total_bytes = sum(
            os.path.getsize(os.path.join(self.root, f))
            for f in self.manifest(v)["files"]
        )
        n = n_files or max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
        if cluster_by:
            cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
            out = cur.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
        else:
            out = cur.coalesce(n)
        return self.commit(out, mode="overwrite", index=index, expected_version=v)

    def vacuum(self, keep_versions: int = 2, dry_run: bool = False) -> dict:
        """Expire history: retain the last ``keep_versions`` manifests,
        delete older ones, then delete data files no retained manifest
        references. Returns what was (or would be) deleted.

        ``keep_versions >= 1`` always — the current version is never
        vacuumable. Readers still inside an expired version lose their
        files mid-query, exactly like Delta's VACUUM; retention is the
        operator's lever for how long time travel reaches back.
        """
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        import shutil

        vs = self.versions()
        keep, drop = vs[-keep_versions:], vs[:-keep_versions]
        # A manifest references a commit directory's parquet files
        # wholesale (append keeps whole parent commits, overwrite drops
        # whole commits), so liveness is per commit dir — which also
        # keeps Spark's _SUCCESS/.crc sidecars out of the accounting.
        live_dirs: set[str] = set()
        for v in keep:
            for rel in self.manifest(v)["files"]:
                live_dirs.add(os.path.basename(os.path.dirname(rel)))
        ddir = os.path.join(self.root, _DATA_DIR)
        dead_dirs = sorted(d for d in os.listdir(ddir) if d not in live_dirs)
        dead_files = [
            os.path.join(_DATA_DIR, d, f)
            for d in dead_dirs
            for f in sorted(os.listdir(os.path.join(ddir, d)))
            if f.endswith(".parquet")
        ]
        out = {"dropped_versions": drop, "deleted_files": dead_files}
        if dry_run:
            return out
        for v in drop:
            os.unlink(_version_path(self.root, v))
        for d in dead_dirs:
            shutil.rmtree(os.path.join(ddir, d), ignore_errors=True)
        return out


def committed_stream_epochs(table: "SnapshotTable") -> set[str]:
    """The ``stream@{batch_id}`` epoch tags already durable in a
    table's history — THE epoch-ledger parse (operation format
    ``{tag}:{mode}``), shared by snapshot_sink and both streaming
    state classes (near-dedup, search) so a tag-format change has one
    home (2nd R8 review)."""
    return {
        m["operation"].split(":", 1)[0]
        for m in table.history()
        if m["operation"].startswith("stream@")
    }


def snapshot_sink(
    stream_df,
    table: SnapshotTable,
    query_name: str,
    checkpoint: str,
    mode: str = "append",
    key: str | None = None,
):
    """Exactly-once streaming commit into a snapshot table via
    ``foreachBatch``: each micro-batch commits as one version whose
    manifest records the epoch id (operation ``stream@{batch_id}``),
    so a batch REPLAYED after a crash (Spark re-runs the last
    uncommitted epoch from the checkpoint) is detected in the history
    and skipped — the sink-side idempotence Structured Streaming
    requires from any exactly-once sink. The manifest CAS makes the
    data+ledger write a single atomic publish (the streaming-sink
    commit-ledger pattern, here unified with the table format instead
    of a side file).

    ``mode='append'`` lands events as-is; ``mode='upsert'`` (requires
    ``key``) is CDC APPLY — each micro-batch of a changelog stream
    MERGEs into the table through the stats-pruned copy-on-write
    upsert, so the table holds current state, exactly-once, while
    history stays time-travelable version-by-epoch. Multiple versions
    of one key INSIDE a micro-batch must be pre-collapsed (e.g.
    incremental.merge_latest semantics in the stream plan); the upsert
    applies the batch as one set.

    Returns the started StreamingQuery; the caller owns awaiting/
    stopping it. Downstream consumers get incremental reads for free:
    ``table.read_changes(spark, v)`` (append mode) or
    ``table.diff_rows(spark, v)`` (upsert mode).
    """
    if mode not in ("append", "upsert"):
        raise ValueError(f"mode {mode!r}: use 'append' or 'upsert'")
    if mode == "upsert" and not key:
        raise ValueError("mode='upsert' requires key=")

    # Epoch ledger, loaded ONCE per query start then maintained in the
    # writer's memory: scanning every manifest on every micro-batch is
    # O(versions²) JSON reads over a long-running stream. Restarts
    # rebuild the set from history (single writer per sink query — the
    # Structured Streaming execution model).
    seen_epochs = committed_stream_epochs(table)

    def _commit_batch(batch_df, batch_id: int) -> None:
        tag = f"stream@{batch_id}"
        if tag in seen_epochs:
            return  # replayed epoch — already durable
        if mode == "upsert":
            table.upsert(
                batch_df.sparkSession, batch_df, key=key, operation_prefix=tag
            )
            seen_epochs.add(tag)
            return
        files, rows, schema_json, stats = table._stage(batch_df)
        parent = table.current_version()
        pfiles, prows, pstats = [], 0, {}
        if parent is not None:
            pm = table.manifest(parent)
            pfiles, prows = pm["files"], pm["rows"]
            pstats = pm.get("stats", {})
        manifest = {
            "version": (parent + 1) if parent is not None else 0,
            "parent": parent,
            "operation": f"stream@{batch_id}",
            "files": pfiles + files,
            "added_files": files,
            "rows": prows + rows,
            "schema": schema_json,
            "stats": {**pstats, **stats},
            "bloom": (
                table.manifest(parent).get("bloom", {}) if parent is not None else {}
            ),
            "bloom_format": _inherited_bloom_format(
                table.manifest(parent) if parent is not None else None
            ),
            "committed_at": time.time(),
        }
        table._publish(manifest, manifest["version"])
        seen_epochs.add(tag)

    return (
        stream_df.writeStream.foreachBatch(_commit_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
