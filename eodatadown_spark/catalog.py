"""Parquet-backed catalog storage with atomic read-modify-write.

The reference mutates catalog rows in place through an RDBMS session
(SURVEY.md §2.11).  On immutable Parquet the equivalent is batched
read-modify-overwrite: compute the new table as a DataFrame, write it to a
versioned directory, then flip a pointer — never a partial in-place rewrite,
so a crashed job can't tear the catalog.

Layout per table::

    <root>/<table>/_CURRENT          # text file: name of live version dir
    <root>/<table>/v_<n>/...parquet  # data versions (date-partitioned)

At 100 TB scale the same pattern holds (the pointer flip is what table
formats like Delta/Iceberg formalize; those jars aren't in this image, so the
catalog implements the minimal version-pointer variant itself).  Sensor
tables are partitioned by ``year(date-col)`` so the reference's date-keyed
access patterns (F1/F2/F12) get partition pruning.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from contextlib import contextmanager
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eodatadown_spark import schemas

_CURRENT = "_CURRENT"
_SCHEMA_SIDECAR = "_SCHEMA.json"


def _has_parquet_files(path: str) -> bool:
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _as_string_schema(schema):
    """Same field names, all StringType — staging schema for JSON import."""
    from pyspark.sql import types as T

    return T.StructType([T.StructField(f.name, T.StringType(), True) for f in schema.fields])

# partition column derived from each table's natural date column
PARTITION_SOURCE: dict[str, str] = {
    name: col for name, col in schemas.WATERMARK_COLS.items()
}


def _partition_rel_dir(row, part_cols: list[str]) -> str:
    """Hive-style relative dir for a partition-value row."""
    return "/".join(
        f"{c}={row[c]}" if row[c] is not None else f"{c}=__HIVE_DEFAULT_PARTITION__"
        for c in part_cols
    )


def _partition_match_cond(changed, part_cols: list[str]):
    """Column predicate selecting rows in any of the ``changed`` partitions."""
    cond = F.lit(False)
    for r in changed:
        match = F.lit(True)
        for c in part_cols:
            match = match & (
                F.col(c).isNull() if r[c] is None else (F.col(c) == F.lit(r[c]))
            )
        cond = cond | match
    return cond


class ParquetCatalog:
    """Versioned Parquet tables under a root directory.

    ``retain_versions`` controls reader retention: the newest N version dirs
    survive each write (default 2 = current + previous), so a lazy DataFrame
    held from a read() stays valid across ONE subsequent write — older
    versions are garbage-collected by later writes, not deleted inline at
    flip time.  Holding a DataFrame across more than ``retain_versions - 1``
    writes is still undefined (raise N for long-lived readers).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        retain_versions: int = 2,
        partition_monthly: bool = False,
    ):
        self.spark = spark
        self.root = root
        self.retain_versions = max(1, retain_versions)
        # second partition level for very large catalogs: p_year/p_month.
        # Month-granular pruning AND month-granular selective merges — the
        # 100 TB knob; all code paths below are depth-generic.
        self.partition_monthly = partition_monthly
        os.makedirs(root, exist_ok=True)

    @property
    def _part_cols(self) -> list[str]:
        return ["p_year", "p_month"] if self.partition_monthly else ["p_year"]

    # -- paths ------------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _current_version(self, table: str) -> str | None:
        pointer = os.path.join(self._table_dir(table), _CURRENT)
        if not os.path.exists(pointer):
            return None
        with open(pointer, encoding="utf-8") as fh:
            return fh.read().strip()

    def data_path(self, table: str) -> str:
        version = self._current_version(table)
        if version is None:
            raise FileNotFoundError(f"catalog table not initialised: {table}")
        return os.path.join(self._table_dir(table), version)

    def exists(self, table: str) -> bool:
        return self._current_version(table) is not None

    # -- read/write -------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        path = self.data_path(table)
        # an empty partitioned write emits no part files → schema inference
        # fails; ONLY that case falls back to the declared schema (a blanket
        # except would turn transient read errors into silent catalog wipes)
        if not _has_parquet_files(path):
            declared = schemas.ALL_SCHEMAS.get(table)
            if declared is not None:
                return self.spark.createDataFrame([], schema=declared)
        stored = self._read_schema_sidecar(path)
        if stored is not None:
            # an evolved version mixes hard-linked pre-evolution files with
            # new-schema files; the sidecar pins the authoritative data-file
            # schema (absent columns in old files read as NULL) — schema
            # INFERENCE would nondeterministically pick one footer
            return self.spark.read.schema(stored).parquet(path)
        return self.spark.read.parquet(path)

    def _read_schema_sidecar(self, version_path: str):
        sidecar = os.path.join(version_path, _SCHEMA_SIDECAR)
        if not os.path.exists(sidecar):
            return None
        from pyspark.sql import types as T

        with open(sidecar, encoding="utf-8") as fh:
            return T.StructType.fromJson(json.load(fh))

    def _write_schema_sidecar(self, version_path: str, schema) -> None:
        """Record the authoritative DATA-FILE schema of a version (no
        partition columns — Spark appends those from the directory layout).
        Written before the pointer flip, like everything else in a version
        dir."""
        with open(
            os.path.join(version_path, _SCHEMA_SIDECAR), "w", encoding="utf-8"
        ) as fh:
            json.dump(schema.jsonValue(), fh)

    def _next_version(self, table: str) -> str:
        old = self._current_version(table)
        return "v_0" if old is None else f"v_{int(old.split('_')[1]) + 1}"

    @contextmanager
    def _commit_lock(self, table: str, timeout: float = 30.0,
                     steal_after: float = 120.0):
        """Exclusive commit section via an atomically-RENAMED claim dir
        (POSIX-local lock — the deployment shape of this catalog; on object
        stores use the Delta adapter, whose log IS the commit protocol).
        The lock dir is created pre-populated with its owner token, so a
        live lock is never empty and no rename can ever silently replace
        it.  A lock older than ``steal_after`` is presumed crash debris
        and stolen (rename-away + freshness re-check)."""
        lock = os.path.join(self._table_dir(table), "_COMMIT_LOCK")
        token = f"{os.getpid()}.{time.time_ns()}"
        deadline = time.time() + timeout
        while True:
            # Acquire by renaming a PRE-POPULATED claim dir into place: the
            # lock is born with its owner token inside, so a live lock dir
            # is never empty — rename(2) onto a non-empty dir fails with
            # ENOTEMPTY, which makes BOTH the acquire and the stealer's
            # rename-back collision-proof (a bare mkdir-then-write-owner
            # acquire has a microsecond empty-dir window a rename-back
            # could silently replace).  An owner-write failure (ENOSPC)
            # aborts before the lock exists instead of stranding an
            # ownerless held lock for steal_after seconds.
            claim = f"{lock}.claim.{os.getpid()}.{time.time_ns()}"
            try:
                os.mkdir(claim)
                with open(os.path.join(claim, "owner"), "w", encoding="utf-8") as fh:
                    fh.write(token)
            except OSError:
                # a real IO error (ENOSPC, perms) — surface it rather than
                # strand a half-built claim or an ownerless lock
                shutil.rmtree(claim, ignore_errors=True)
                raise
            try:
                os.rename(claim, lock)
                break  # acquired — the lock is born non-empty, token inside
            except OSError:
                shutil.rmtree(claim, ignore_errors=True)
            # lock held by someone else: steal if stale, else wait
            try:
                if time.time() - os.path.getmtime(lock) > steal_after:
                    # steal by ATOMIC RENAME to a unique name — exactly one
                    # stealer wins the rename; an rmdir here could delete a
                    # FRESH lock recreated by another stealer between our
                    # getmtime and the rmdir, letting two writers into the
                    # commit section at once
                    stale = f"{lock}.stale.{os.getpid()}.{time.time_ns()}"
                    os.rename(lock, stale)
                    # TOCTOU re-check (ADVICE r8): rename preserves mtime, so
                    # a FRESH renamed dir means the original holder released
                    # and another writer re-acquired between our getmtime and
                    # our rename — we stole a LIVE lock.  Restore it: since
                    # every live lock is born NON-EMPTY (owner inside), the
                    # rename-back fails with ENOTEMPTY iff a third writer
                    # already re-created the slot, in which case we drop the
                    # stolen dir — the live holder's token-checked release
                    # then leaves the third writer's lock alone.
                    try:
                        fresh = (
                            time.time() - os.path.getmtime(stale)
                            <= steal_after
                        )
                    except OSError:
                        fresh = False
                    if fresh:
                        try:
                            os.rename(stale, lock)
                        except OSError:
                            shutil.rmtree(stale, ignore_errors=True)
                    else:
                        shutil.rmtree(stale, ignore_errors=True)
                    continue
            except OSError:
                continue  # lock vanished / another stealer won the rename
            if time.time() > deadline:
                raise TimeoutError(
                    f"catalog commit lock busy for table {table!r}"
                )
            time.sleep(0.05)
        try:
            yield
        finally:
            # token-checked release: remove the lock only if it is still
            # OURS — after a mistaken steal-and-drop, the slot may already
            # hold another writer's live lock.  Residual TOCTOU: a steal
            # landing between this read and the rmdir requires our commit
            # section to have ALREADY exceeded steal_after (the lock was
            # steal-eligible while we held it) — keep commit sections far
            # under steal_after; they are pointer flips, not builds
            try:
                owner = os.path.join(lock, "owner")
                with open(owner, encoding="utf-8") as fh:
                    held = fh.read() == token
                if held:
                    os.remove(owner)
                    os.rmdir(lock)
            except OSError:
                pass

    def _flip_and_gc(self, table: str, version: str) -> None:
        """Atomic pointer flip + GC of versions beyond the retention window.

        Retention ranks only versions that were ever COMMITTED — i.e. at
        or below the pointer being replaced — plus the new version.  Dirs
        ABOVE the new pointer are crash debris from interrupted writes,
        and (since the exclusive version-dir claim of round 7) dirs
        strictly BETWEEN the previous pointer and the new one are
        claimed-but-never-committed debris too: a crashed writer's
        claimed dir, or a concurrent loser's build (which rebuilds via
        its conflict retry).  Both classes are deleted outright — were
        they ranked, an orphan would consume a retention slot and push a
        genuinely readable old version out of the window, breaking lazy
        readers.
        """
        table_dir = self._table_dir(table)
        prev = self._current_version(table)
        prev_v = int(prev.split("_")[1]) if prev else -1
        tmp_pointer = os.path.join(table_dir, _CURRENT + ".tmp")
        with open(tmp_pointer, "w", encoding="utf-8") as fh:
            fh.write(version)
        os.replace(tmp_pointer, os.path.join(table_dir, _CURRENT))  # atomic flip
        new_v = int(version.split("_")[1])
        on_disk = self._versions_on_disk(table)
        stale = [v for v in on_disk if v > new_v]  # crash debris
        stale += [v for v in on_disk if prev_v < v < new_v]  # unclaimed debris
        committed = sorted(
            (v for v in on_disk if v <= prev_v), reverse=True
        )
        stale += committed[max(self.retain_versions - 1, 0):]
        for stale_v in stale:
            shutil.rmtree(os.path.join(table_dir, f"v_{stale_v}"), ignore_errors=True)

    def _claim_version(self, table: str) -> tuple[str, str]:
        """Claim the next version dir EXCLUSIVELY via atomic ``mkdir``,
        bumping past any existing dir: a leftover same-numbered dir may be
        crash debris (GC clears it at the next flip) or a CONCURRENT
        writer's live build — either way, never rmtree-and-reuse it, which
        under concurrency would delete another writer's work mid-build.
        The pointer always flips LAST (and under :meth:`_commit_lock`), so
        claimed-but-uncommitted dirs are invisible to readers."""
        table_dir = self._table_dir(table)
        os.makedirs(table_dir, exist_ok=True)
        n = int(self._next_version(table).split("_")[1])
        while True:
            version = f"v_{n}"
            out = os.path.join(table_dir, version)
            try:
                os.makedirs(out)
                return version, out
            except FileExistsError:
                n += 1

    def _write_version(
        self, df: DataFrame, table: str, partition: bool = True,
        cluster_partitions: bool = True,
    ) -> tuple[str, str]:
        """Materialize ``df`` into a freshly CLAIMED (exclusive) version dir
        without flipping the pointer; the caller commits under
        :meth:`_commit_lock`.  Writes with mode('append') into the empty
        claimed dir — mode('overwrite') would momentarily DELETE the dir,
        releasing the exclusivity the atomic-mkdir claim just bought.
        A failed build removes its claimed dir (no orphan v_N debris)."""
        version, out = self._claim_version(table)
        try:
            part_src = PARTITION_SOURCE.get(table)
            writer = df.write.mode("append")
            if partition and part_src is not None and part_src in df.columns:
                df = df.withColumn("p_year", F.year(F.col(part_src)))
                if self.partition_monthly:
                    df = df.withColumn("p_month", F.month(F.col(part_src)))
                if cluster_partitions:
                    # cluster rows by the partition dirs before the write:
                    # without it every input task emits a file into every
                    # p_year(/p_month) dir, so files ~= tasks x partitions
                    # — the classic small-files write.  REBALANCE (AQE)
                    # both coalesces small dirs to ~one advisory-sized
                    # file and SPLITS an oversized year across tasks,
                    # where a plain repartition would bottleneck a hot
                    # year on one task.  Callers that size files
                    # deliberately (compact / z-order rewrites) pass
                    # cluster_partitions=False to keep their layout.
                    df = df.hint("rebalance", *self._part_cols)
                writer = df.write.mode("append").partitionBy(*self._part_cols)
            writer.parquet(out)
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        return version, out

    def _commit_if_base(self, table: str, version: str, out: str,
                        base: str | None) -> bool:
        """Flip the pointer to ``version`` under the commit lock IF the
        pointer still names ``base`` (optimistic-concurrency check); on a
        moved pointer the built dir is discarded and False returned so the
        caller can rebuild from the winner's commit."""
        with self._commit_lock(table):
            if self._current_version(table) != base:
                shutil.rmtree(out, ignore_errors=True)
                return False
            self._flip_and_gc(table, version)
        return True

    def write(self, df: DataFrame, table: str, partition: bool = True,
              occ_retries: int = 5, cluster_partitions: bool = True) -> None:
        """Atomically replace `table` with `df` (new version dir + pointer
        flip).  The version dir is claimed exclusively (atomic mkdir) and
        the flip happens under the commit lock, so a full replace can race
        concurrent merges without clobbering their claimed builds — the
        replace itself is intentionally last-writer-wins (it does not
        derive from the previous contents, so there is no base to check;
        replaces that DO derive from the table must use
        :meth:`replace_derived`).

        Build-vs-GC race (ADVICE r8): a concurrent merge commit GCs dirs
        strictly between ITS base and new pointer as unclaimed debris —
        a window this writer's live claimed dir can fall into.  That
        surfaces either as a parquet IO error mid-build or as a vanished
        dir at flip time; both legs detect the moved pointer / missing dir
        and re-claim + rebuild instead of surfacing a spurious error."""
        last_exc: Exception | None = None
        for _attempt in range(1 + occ_retries):
            base = self._current_version(table)
            try:
                version, out = self._write_version(
                    df, table, partition, cluster_partitions
                )
            except Exception as exc:
                if self._current_version(table) != base:
                    # conflict fallout: winner's GC hit our build — but keep
                    # the exception so a PERSISTENT build failure that keeps
                    # coinciding with pointer moves stays diagnosable
                    last_exc = exc
                    continue
                raise
            with self._commit_lock(table):
                # GC runs only under this lock, so these checks cannot race
                # another commit's cleanup.  The pointer-unmoved requirement
                # is deliberately stricter than isdir: a concurrent commit's
                # GC can rmtree our claimed dir MID-JOB and the job still
                # "succeed" with tasks recommitted into a recreated dir —
                # isdir passes but the version is silently partial.  Any
                # pointer movement during our build means our dir sat in a
                # GC window, so discard and rebuild (the replace is LWW:
                # the retry still flips last).
                if self._current_version(table) == base and os.path.isdir(out):
                    self._flip_and_gc(table, version)
                    return
                shutil.rmtree(out, ignore_errors=True)
            # conflicting commit landed during our build — rebuild
        raise RuntimeError(
            f"write lost the claimed-dir race {1 + occ_retries} times on "
            f"table {table!r}"
        ) from last_exc

    def replace_derived(
        self, table: str, build_fn, partition: bool = True,
        occ_retries: int = 5,
    ) -> None:
        """Read-modify-REPLACE with optimistic concurrency: ``build_fn``
        maps the table's CURRENT contents to the full replacement frame,
        and the pointer flips only if the base version is unchanged — on
        conflict the loop re-reads, re-derives, and rebuilds, exactly like
        :meth:`merge_updates`.

        This is the correct commit for any replace whose output DERIVES
        from the table's own contents (e.g. the continuous-dedup clusters
        table, where ``update_clusters`` folds a batch's pairs into the
        stored assignments): a plain :meth:`write` is last-writer-wins by
        contract and would silently drop a concurrent applier's fold
        (ADVICE r8).  Non-derived replaces should keep using
        :meth:`write` — re-running ``build_fn`` must be safe and cheap
        (pin batch-derived inputs before calling)."""
        last_exc: Exception | None = None
        for _attempt in range(1 + occ_retries):
            base = self._current_version(table)
            try:
                version, out = self._write_version(
                    build_fn(self.read(table)), table, partition
                )
            except Exception as exc:
                if self._current_version(table) != base:
                    last_exc = exc  # conflict fallout — kept for diagnosis
                    continue
                raise
            if self._commit_if_base(table, version, out, base):
                return
        raise RuntimeError(
            f"replace_derived lost the optimistic-commit race "
            f"{1 + occ_retries} times on table {table!r}"
        ) from last_exc

    def merge_updates(
        self, table: str, updates: DataFrame, key: str = "pid",
        occ_retries: int = 5,
    ) -> None:
        """M2 at catalog scale: apply a batched point-update set rewriting
        ONLY the ``p_year`` partitions that contain updated keys.

        Untouched partitions are hard-linked (same inode, zero data copied
        or shuffled) into the new version dir; only changed partitions pass
        through the join+overwrite.  On a 100 TB date-partitioned catalog a
        stage merge touching one month rewrites that month, not the decade.
        State-column updates never move a row across partitions, so the
        partition-source column must not appear in ``updates``.

        CONCURRENCY (optimistic): the base version is captured at read
        time; the pointer flip happens under :meth:`_commit_lock` only if
        the pointer still names that base.  A concurrent commit in the
        window → this writer discards its built version dir and REBUILDS
        from the new current (up to ``occ_retries`` times), so concurrent
        merges of different keys serialize with neither update lost —
        never last-writer-wins.  A build error is re-raised unless the
        pointer moved meanwhile (then it is conflict fallout — e.g. the
        winner's GC collected our base or claimed dir — and retries).

        Unpartitioned tables take a full (non-selective) rewrite but run the
        SAME optimistic protocol — base-checked flip under the commit lock,
        rebuild-on-conflict — so e.g. two concurrent dedupindex merges never
        lose each other's updates.
        """
        from eodatadown_spark.pipeline import apply_updates

        part_src = PARTITION_SOURCE.get(table)
        if part_src is not None and part_src in updates.columns:
            raise ValueError(
                f"merge_updates cannot change partition source {part_src!r}; "
                "use write() for partition-moving rewrites"
            )
        if any(c in updates.columns for c in ("p_year", "p_month")):
            # a patched physical partition column would silently break the
            # p_year/p_month == year/month(date_col) invariant pruning relies on
            raise ValueError("merge_updates cannot patch physical partition columns")
        for _attempt in range(1 + occ_retries):
            base = self._current_version(table)
            old_path = self.data_path(table)
            cur = self.read(table)
            # partition depth follows the ON-DISK layout, not the constructor
            # flag: a monthly table opened by a yearly-configured process must
            # still merge at month depth (a flag-based depth would hard-link
            # whole changed years as "untouched" and append a conflicting
            # yearly layout — unreadable table)
            part_cols = [c for c in ("p_year", "p_month") if c in cur.columns]
            if not part_cols or not _has_parquet_files(old_path):
                # same layout-preservation rule as append(): only an empty
                # table gets (re-)partitioned by the full write.  This path
                # still runs the FULL OCC protocol (unlike a plain write()):
                # the merged frame derives from the base contents, so two
                # concurrent merges on an unpartitioned table (e.g. the
                # dedupindex tables) must never both flip over the same base
                # — the loser rebuilds from the winner's commit.
                try:
                    version, out = self._write_version(
                        apply_updates(self.read_clean(table), updates, key),
                        table,
                        partition=not _has_parquet_files(old_path),
                    )
                except Exception:
                    if self._current_version(table) != base:
                        continue  # conflict fallout, not a real build error
                    raise
                if self._commit_if_base(table, version, out, base):
                    return
                continue
            out = None
            try:
                changed = (
                    cur.join(updates.select(key).distinct(), key, "left_semi")
                    .select(*part_cols)
                    .distinct()
                    .collect()
                )
                version, out = self._begin_selective_version(
                    table, old_path, changed, part_cols
                )
                if changed:
                    merged = apply_updates(
                        cur.where(_partition_match_cond(changed, part_cols)),
                        updates, key,
                    )
                    merged.write.mode("append").partitionBy(*part_cols).parquet(out)
            except Exception:
                # remove the claimed dir before retrying/raising — leaving it
                # would orphan a v_N that survives until a later commit's GC
                # and inflates subsequent claim numbering meanwhile
                if out is not None:
                    shutil.rmtree(out, ignore_errors=True)
                if self._current_version(table) != base:
                    continue  # conflict fallout, not a real build error
                raise
            if self._commit_if_base(table, version, out, base):
                return
        raise RuntimeError(
            f"merge_updates lost the optimistic-commit race {1 + occ_retries} "
            f"times on table {table!r}"
        )

    def _begin_selective_version(
        self, table: str, old_path: str, changed, part_cols: list[str]
    ) -> tuple[str, str]:
        """Start a partition-selective version: create the version dir and
        hard-link every LEAF partition dir NOT in ``changed`` (same inodes,
        no data movement; depth-generic over yearly / year-month layouts).
        Returns (version, out_dir); the caller appends changed-partition
        rewrites and flips the pointer last."""
        changed_rel = {_partition_rel_dir(r, part_cols) for r in changed}
        version, out = self._claim_version(table)
        try:
            # a previously-evolved table's sidecar must follow the
            # hard-linked files into every new version — old files under a
            # new pointer still need the authoritative schema
            prev_sidecar = os.path.join(old_path, _SCHEMA_SIDECAR)
            if os.path.exists(prev_sidecar):
                shutil.copyfile(
                    prev_sidecar, os.path.join(out, _SCHEMA_SIDECAR)
                )
            for dirpath, _dirs, files in os.walk(old_path):
                relp = os.path.relpath(dirpath, old_path)
                if relp == "." or not relp.startswith("p_"):
                    continue
                if not any(f.endswith(".parquet") for f in files):
                    continue  # intermediate level
                if relp.replace(os.sep, "/") in changed_rel:
                    continue
                dst = os.path.join(out, relp)
                os.makedirs(dst, exist_ok=True)
                for fname in files:
                    os.link(os.path.join(dirpath, fname), os.path.join(dst, fname))
        except Exception:
            # a failed link phase must not orphan the claimed dir
            shutil.rmtree(out, ignore_errors=True)
            raise
        return version, out

    def merge_into(
        self,
        table: str,
        source: DataFrame,
        on: list[str],
        when_matched_update=None,
        update_condition=None,
        when_matched_delete=None,
        when_not_matched_insert=True,
        insert_condition=None,
        validate_unique_source: bool = True,
        occ_retries: int = 5,
        schema_evolution: str = "strict",
    ) -> None:
        """Transactional MERGE INTO the catalog table — the Delta/Iceberg
        MERGE operation on the versioned-parquet layout, partition-selective.

        Clause semantics are operators.merge.merge_into's (update / delete /
        insert with conditions, ``t``/``s`` aliases, ANSI duplicate-source
        guard).  Physically:

        - partitions holding MATCHED keys pass through the merge join and
          are rewritten (skipped entirely when no matched clause is given);
        - every other partition hard-links into the new version (same
          inodes, zero data moved);
        - not-matched source rows append as new files into their derived
          partitions — including brand-new ones.

        Same crash posture as every write: version dir builds fully, pointer
        flips last.  Updating the partition-source date column is rejected
        (a partition-moving update needs a full write()).

        CONCURRENCY: same optimistic protocol as :meth:`merge_updates` —
        the merged frame derives from the base version, so the pointer flip
        is base-checked under the commit lock and a lost race rebuilds from
        the winner's commit (up to ``occ_retries`` times).

        ``schema_evolution`` governs INSERT-ALL mode
        (``when_not_matched_insert=True``) when the source carries columns
        the table lacks: ``"strict"`` (default) rejects them loudly (the
        old behavior dropped them silently); ``"add"`` widens the table
        first — a zero-row :meth:`append`-style evolution commit (sidecar,
        hard-linked files, no rewrite) — then merges against the widened
        schema, so the extras insert for new rows and read as NULL
        elsewhere.  Explicit insert/update MAPPINGS are untouched either
        way: there, extra source columns are ordinary expression inputs,
        not an ambiguity.  ``__``-prefixed source columns are exempt too —
        the codebase-wide convention for ephemeral bookkeeping (e.g. a CDC
        ``__op`` marker driving the clause conditions); they are never
        inserted and never widen the schema.
        """
        from eodatadown_spark.operators.merge import merge_into as _merge_df

        if schema_evolution not in ("strict", "add"):
            raise ValueError(
                f"unknown schema_evolution mode {schema_evolution!r}"
            )
        part_src = PARTITION_SOURCE.get(table)
        if when_not_matched_insert is True:
            cur0 = self.read(table)
            extras = [
                c for c in source.columns
                if c not in cur0.columns and not c.startswith("__")
            ]
            if extras and schema_evolution == "strict":
                raise ValueError(
                    f"merge_into insert-all: source columns {extras} not in "
                    f"table {table!r}; pass schema_evolution='add' to widen "
                    "the schema, or an explicit insert mapping (silent "
                    "dropping would be data loss)"
                )
            if extras:
                part0 = [c for c in ("p_year", "p_month") if c in cur0.columns]
                target0 = [c for c in cur0.columns if c not in part0]
                evolve_src = source.limit(0).select(
                    *[
                        F.col(c)
                        if c in source.columns
                        else F.lit(None).cast(cur0.schema[c].dataType).alias(c)
                        for c in target0
                    ],
                    *[F.col(c) for c in extras],
                )
                self._append_evolve(table, evolve_src, extras, occ_retries)
        if when_matched_update:
            forbidden = {part_src, "p_year", "p_month"} & set(when_matched_update)
            if forbidden:
                raise ValueError(
                    f"merge_into cannot update partition-source columns {sorted(forbidden)}; "
                    "use write() for partition-moving rewrites"
                )
        for _attempt in range(1 + occ_retries):
            base = self._current_version(table)
            cur = self.read(table)
            part_cols = [c for c in ("p_year", "p_month") if c in cur.columns]
            old_path = self.data_path(table)
            if not part_cols or not _has_parquet_files(old_path):
                merged = _merge_df(
                    self.read_clean(table), source, on,
                    when_matched_update, update_condition, when_matched_delete,
                    when_not_matched_insert, insert_condition, validate_unique_source,
                )
                try:
                    # layout-preservation rule shared with append()/merge_updates()
                    version, out = self._write_version(
                        merged, table, partition=not _has_parquet_files(old_path)
                    )
                except Exception:
                    if self._current_version(table) != base:
                        continue  # conflict fallout, not a real build error
                    raise
                if self._commit_if_base(table, version, out, base):
                    return
                continue

            target_cols = [c for c in cur.columns if c not in part_cols]
            # validate BEFORE any filesystem work: an abort below this point
            # would leave a fully-built orphan version dir
            if when_not_matched_insert and (part_src is None or part_src not in target_cols):
                raise ValueError(
                    f"cannot derive partitions for inserts: {table!r} has no "
                    "partition-source column; use an unpartitioned table"
                )
            out = None
            try:
                cur_keys = cur.select(*on).distinct()
                # split ONCE: matched source drives the partition rewrite,
                # unmatched source appends — merging only the
                # changed-partition subset would otherwise misclassify
                # out-of-subset matches as inserts
                matched_src = source.join(cur_keys, on, "left_semi")
                insert_src = source.join(cur_keys, on, "left_anti")

                has_matched_clause = (
                    bool(when_matched_update) or when_matched_delete is not None
                )
                if has_matched_clause:
                    changed = (
                        cur.join(matched_src.select(*on).distinct(), on, "left_semi")
                        .select(*part_cols)
                        .distinct()
                        .collect()
                    )
                else:
                    changed = []
                    if validate_unique_source:
                        # the matched-partition merge (which carries the
                        # distributed ANSI guard) is skipped entirely, so check
                        # here that no target key matches two source rows
                        dup = (
                            matched_src.groupBy(*on)
                            .count()
                            .where(F.col("count") > 1)
                            .limit(1)
                            .collect()
                        )
                        if dup:
                            raise ValueError(
                                "merge_into: multiple source rows matched target key "
                                f"({', '.join(str(dup[0][k]) for k in on)})"
                            )

                version, out = self._begin_selective_version(
                    table, old_path, changed, part_cols
                )

                def derive_parts(df: DataFrame) -> DataFrame:
                    df = df.withColumn("p_year", F.year(F.col(part_src)))
                    if "p_month" in part_cols:
                        df = df.withColumn("p_month", F.month(F.col(part_src)))
                    return df

                if changed:
                    target_sub = cur.where(
                        _partition_match_cond(changed, part_cols)
                    ).select(*target_cols)
                    merged = _merge_df(
                        target_sub, matched_src, on,
                        when_matched_update, update_condition, when_matched_delete,
                        False, None, validate_unique_source,
                    )
                    derive_parts(merged).write.mode("append").partitionBy(
                        *part_cols
                    ).parquet(out)

                if when_not_matched_insert:
                    # evaluate the condition / mapping against a frame that ALSO
                    # carries the target columns (all NULL) under alias 't', so an
                    # insert clause referencing t.<col> NULL-evaluates exactly as it
                    # does against operators.merge.merge_into's full-outer frame —
                    # without this, the same merge_into call would raise
                    # AnalysisException only on partitioned layouts.  A left join on
                    # a False condition against an empty build side is a no-op plan
                    # (BroadcastNestedLoopJoin with zero build rows).
                    t_nulls = cur.select(*target_cols).limit(0)
                    ins = insert_src.alias("s").join(
                        t_nulls.alias("t"), F.lit(False), "left"
                    )
                    if insert_condition is not None:
                        ins = ins.where(F.coalesce(insert_condition, F.lit(False)))
                    # column routing mirrors operators.merge.merge_into exactly:
                    # a mapping is authoritative for non-key columns (absent ones
                    # become NULL, not source values); key columns always come from
                    # the source; insert-all mode takes same-named source columns
                    cols = []
                    for c in target_cols:
                        if c in on:
                            val = F.col(f"s.{c}")
                        elif isinstance(when_not_matched_insert, Mapping):
                            val = when_not_matched_insert.get(c)
                            if val is None:
                                val = F.lit(None)
                        elif c in source.columns:
                            val = F.col(f"s.{c}")
                        else:
                            val = F.lit(None)
                        cols.append(val.cast(cur.schema[c].dataType).alias(c))
                    ins = ins.select(*cols)
                    derive_parts(ins).write.mode("append").partitionBy(
                        *part_cols
                    ).parquet(out)
            except ValueError:
                # deterministic user/validation error (e.g. the duplicate-
                # source guard) — never conflict fallout; clean up the claim
                if out is not None:
                    shutil.rmtree(out, ignore_errors=True)
                raise
            except Exception:
                if out is not None:
                    shutil.rmtree(out, ignore_errors=True)
                if self._current_version(table) != base:
                    continue  # conflict fallout, not a real build error
                raise
            if self._commit_if_base(table, version, out, base):
                return
        raise RuntimeError(
            f"merge_into lost the optimistic-commit race {1 + occ_retries} "
            f"times on table {table!r}"
        )

    def append(self, table: str, rows: DataFrame, occ_retries: int = 5,
               schema_evolution: str = "strict") -> None:
        """Append-only fast path: hard-link EVERY existing partition into a
        new version and add the new rows as extra files in their derived
        partitions — no join, no rewrite, no shuffle of existing data.

        The right ingest shape when keys are known-new (e.g. downstream of
        an anti-join the caller already ran, or an event log); use
        ``merge_into`` when dedup/upsert semantics are needed — append does
        NOT check for key collisions.  Same pointer-flip-last crash posture
        as every write, and the same optimistic-commit protocol as
        :meth:`merge_updates`: the new version hard-links the BASE version's
        files, so flipping over a concurrently-moved pointer would silently
        drop that commit — instead the loser re-links from the winner.

        ``schema_evolution`` governs incoming columns the table lacks:

        - ``"strict"`` (default) REJECTS them loudly — the pre-round-8
          behavior silently dropped them, which is data loss wearing a
          success exit code;
        - ``"add"`` widens the table: new columns (nullable, incoming
          types) join the schema, existing files are hard-linked untouched,
          and a ``_SCHEMA.json`` sidecar in the version dir pins the
          authoritative schema so readers see NULLs for pre-evolution rows
          (the Delta/Iceberg ADD COLUMNS semantics on the versioned-parquet
          layout — no data rewrite).
        """
        if schema_evolution not in ("strict", "add"):
            raise ValueError(
                f"unknown schema_evolution mode {schema_evolution!r}"
            )
        incoming = rows
        for _attempt in range(1 + occ_retries):
            base = self._current_version(table)
            cur = self.read(table)
            part_cols = [c for c in ("p_year", "p_month") if c in cur.columns]
            old_path = self.data_path(table)
            extras = [c for c in incoming.columns if c not in cur.columns]
            if extras and schema_evolution == "strict":
                raise ValueError(
                    f"append: incoming columns {extras} not in table "
                    f"{table!r}; pass schema_evolution='add' to widen the "
                    "schema (silent dropping would be data loss)"
                )
            if extras:
                return self._append_evolve(
                    table, incoming, extras, occ_retries
                )
            # cast incoming rows to the table schema up front (as the
            # merge_into insert path does) — appending rows with their
            # incoming dtypes would otherwise put mixed-schema parquet files
            # (int32 next to int64) inside one partition, failing or
            # coercing on later reads
            rows = incoming.select(
                *[F.col(c).cast(cur.schema[c].dataType).alias(c)
                  for c in cur.columns if c not in part_cols]
            )
            if not part_cols or not _has_parquet_files(old_path):
                base_df = self.read_clean(table)
                # an EMPTY table takes the standard layout; a table that HAS
                # data but no partition dirs was deliberately written flat —
                # preserve that rather than silently re-partitioning it
                try:
                    version, out = self._write_version(
                        base_df.unionByName(rows.select(*base_df.columns)),
                        table,
                        partition=not _has_parquet_files(old_path),
                    )
                except Exception:
                    if self._current_version(table) != base:
                        continue  # conflict fallout, not a real build error
                    raise
                if self._commit_if_base(table, version, out, base):
                    return
                continue
            part_src = PARTITION_SOURCE.get(table)
            if part_src is None:
                raise ValueError(
                    f"cannot derive partitions for appended rows: {table!r} has "
                    "no partition-source column"
                )
            out = None
            try:
                version, out = self._begin_selective_version(
                    table, old_path, [], part_cols
                )
                target_cols = [c for c in cur.columns if c not in part_cols]
                df = rows.select(*target_cols).withColumn(
                    "p_year", F.year(F.col(part_src))
                )
                if "p_month" in part_cols:
                    df = df.withColumn("p_month", F.month(F.col(part_src)))
                df.write.mode("append").partitionBy(*part_cols).parquet(out)
            except Exception:
                if out is not None:
                    shutil.rmtree(out, ignore_errors=True)
                if self._current_version(table) != base:
                    continue  # conflict fallout, not a real build error
                raise
            if self._commit_if_base(table, version, out, base):
                return
        raise RuntimeError(
            f"append lost the optimistic-commit race {1 + occ_retries} "
            f"times on table {table!r}"
        )

    def _append_evolve(
        self, table: str, incoming: DataFrame, extras: list[str],
        occ_retries: int,
    ) -> None:
        """append(schema_evolution='add') body: widen the table schema with
        ``extras`` (nullable, incoming types) without rewriting any existing
        file.  Partitioned tables hard-link every partition and pin the
        widened schema in the version's ``_SCHEMA.json`` sidecar (read()
        NULL-fills the old files); unpartitioned tables take a full rewrite
        (they are rewritten on every append anyway), which materializes the
        NULLs so no sidecar is needed.  Same OCC protocol as append()."""
        from pyspark.sql import types as T

        for _attempt in range(1 + occ_retries):
            base = self._current_version(table)
            cur = self.read(table)
            part_cols = [c for c in ("p_year", "p_month") if c in cur.columns]
            old_path = self.data_path(table)
            target_cols = [c for c in cur.columns if c not in part_cols]
            rows = incoming.select(
                *[F.col(c).cast(cur.schema[c].dataType).alias(c)
                  for c in target_cols],
                *[F.col(c) for c in extras],
            )
            if not part_cols or not _has_parquet_files(old_path):
                base_df = self.read_clean(table)
                merged = base_df.unionByName(rows, allowMissingColumns=True)
                try:
                    version, out = self._write_version(
                        merged, table,
                        partition=not _has_parquet_files(old_path),
                    )
                except Exception:
                    if self._current_version(table) != base:
                        continue  # conflict fallout, not a real build error
                    raise
                if self._commit_if_base(table, version, out, base):
                    return
                continue
            part_src = PARTITION_SOURCE.get(table)
            if part_src is None:
                raise ValueError(
                    f"cannot derive partitions for appended rows: {table!r} "
                    "has no partition-source column"
                )
            evolved = T.StructType(
                [cur.schema[c] for c in target_cols]
                + [
                    T.StructField(f.name, f.dataType, True)
                    for f in rows.schema.fields
                    if f.name in extras
                ]
            )
            out = None
            try:
                version, out = self._begin_selective_version(
                    table, old_path, [], part_cols
                )
                df = rows.withColumn("p_year", F.year(F.col(part_src)))
                if "p_month" in part_cols:
                    df = df.withColumn("p_month", F.month(F.col(part_src)))
                df.write.mode("append").partitionBy(*part_cols).parquet(out)
                # AFTER _begin_selective_version's prior-sidecar copy, so
                # the widened schema wins
                self._write_schema_sidecar(out, evolved)
            except Exception:
                if out is not None:
                    shutil.rmtree(out, ignore_errors=True)
                if self._current_version(table) != base:
                    continue  # conflict fallout, not a real build error
                raise
            if self._commit_if_base(table, version, out, base):
                return
        raise RuntimeError(
            f"append lost the optimistic-commit race {1 + occ_retries} "
            f"times on table {table!r}"
        )

    def changes_since(self, table: str, version: int, keys=("pid",)) -> DataFrame:
        """Change feed: CDC rows (keys + change_type) between a retained
        historical version and the CURRENT table — ``diff_snapshots`` over
        time travel, so a downstream consumer can ask "what changed since
        the version I last saw?" instead of re-reading the table.

        Only versions inside the retention window are diffable (raise
        ``retain_versions`` for longer-lived consumers).
        """
        from eodatadown_spark.operators.merge import diff_snapshots

        old = self.read_version(table, version)
        new = self.read(table)
        # drop() ignores absent columns, so flat tables pass through
        return diff_snapshots(
            old.drop("p_year", "p_month"), new.drop("p_year", "p_month"), list(keys)
        )

    def compact(
        self,
        table: str,
        target_rows_per_file: int = 1_000_000,
        zorder_by: list[str] | None = None,
        zorder_ranges: list[tuple[float, float]] | None = None,
        zorder_bits: int = 12,
    ) -> None:
        """Rewrite `table` with right-sized files — the maintenance pass for
        catalogs that accumulated small part files from repeated selective
        merges (each merge_updates append adds files to changed partitions).

        One full versioned write sized by row count per output file; at
        100 TB run it per-partition on a schedule, exactly like table-format
        OPTIMIZE jobs.  Safe under the same pointer-flip atomicity as write().

        ``zorder_by=[col, ...]`` additionally CLUSTERS the rewrite on the
        N-dim Morton key of those columns (``OPTIMIZE ... ZORDER BY`` on the
        plain-parquet catalog, matching the Delta adapter's compact):
        range-partition on the key + in-partition sort, so each output file
        covers a compact Z-curve interval and parquet min/max stats prune
        scans filtered on ANY subset of the clustered columns.
        ``zorder_ranges`` gives each column's (lo, hi) quantization range;
        when omitted they are measured with one min/max aggregate.  The key
        is computed on the fly and never stored — layout, not schema.
        """
        df = self.read_clean(table)
        n = df.count()
        n_files = max(1, -(-n // target_rows_per_file))
        if not zorder_by:
            self.write(
                df.repartition(n_files), table, cluster_partitions=False
            )
            return
        from eodatadown_spark.spatial import zorder_key_n

        if zorder_ranges is None:
            row = df.agg(
                *[F.min(c).cast("double").alias(f"__lo_{i}") for i, c in enumerate(zorder_by)],
                *[F.max(c).cast("double").alias(f"__hi_{i}") for i, c in enumerate(zorder_by)],
            ).first()
            zorder_ranges = [
                (row[f"__lo_{i}"], row[f"__hi_{i}"])
                for i in range(len(zorder_by))
            ]
            # constant or all-NULL columns measure a degenerate span, which
            # zorder_key_n rightly refuses — widen to a unit span (every
            # row lands in cell 0; the other dimensions still cluster)
            zorder_ranges = [
                (lo, hi)
                if lo is not None and hi is not None and hi > lo
                else ((lo or 0.0), (lo or 0.0) + 1.0)
                for lo, hi in zorder_ranges
            ]
        z = zorder_key_n(
            [F.col(c).cast("double") for c in zorder_by],
            zorder_ranges, zorder_bits,
        )
        self.write(
            df.repartitionByRange(n_files, z.alias("__z"))
            .sortWithinPartitions(z.alias("__z")),
            table,
            cluster_partitions=False,
        )

    def read_clean(self, table: str) -> DataFrame:
        """Read without the physical partition column(s)."""
        df = self.read(table)
        return df.drop(*[c for c in ("p_year", "p_month") if c in df.columns])

    # -- time travel (within the retention window) --------------------------
    def list_versions(self, table: str) -> list[int]:
        """Version numbers readable for time travel, ascending: on-disk
        versions AT OR BELOW the current pointer.  Only the newest
        ``retain_versions`` survive writes, so this is the travel horizon;
        a v_N directory ABOVE the pointer is a partially-written version
        from a crashed write (the pointer flips last) and is excluded — time
        travel must never serve a partial snapshot."""
        current = self._current_version(table)
        ceiling = int(current.split("_")[1]) if current else -1
        return [v for v in self._versions_on_disk(table) if v <= ceiling]

    def _versions_on_disk(self, table: str) -> list[int]:
        """All v_<n> DIRECTORIES present, ascending (single definition used
        by list_versions, fsck and GC so their notion of 'a version' can't
        drift — a stray v_N file is never a version)."""
        table_dir = self._table_dir(table)
        if not os.path.isdir(table_dir):
            return []
        return sorted(
            int(d.split("_")[1])
            for d in os.listdir(table_dir)
            if d.startswith("v_") and d.split("_")[1].isdigit()
            and os.path.isdir(os.path.join(table_dir, d))
        )

    def read_version(self, table: str, version: int) -> DataFrame:
        """Time travel: read a retained historical version (the minimal
        analog of table-format VERSION AS OF).  Raises if the version was
        garbage-collected or sits above the current pointer (a crashed
        write's partial dir) — raise ``retain_versions`` to keep more
        history.  Hard-linked leaves from selective merges share inodes
        across versions, so history costs only the rewritten partitions."""
        if version not in self.list_versions(table):
            raise FileNotFoundError(
                f"version {version} of {table!r} not readable "
                f"(retained: {self.list_versions(table)})"
            )
        path = os.path.join(self._table_dir(table), f"v_{version}")
        if not _has_parquet_files(path):
            declared = schemas.ALL_SCHEMAS.get(table)
            if declared is not None:
                return self.spark.createDataFrame([], schema=declared)
        stored = self._read_schema_sidecar(path)
        if stored is not None:
            # post-evolution versions mix pre- and post-widening files;
            # the version's own sidecar NULL-fills the old ones (same rule
            # as read())
            return self.spark.read.schema(stored).parquet(path)
        return self.spark.read.parquet(path)

    def file_stats(self, table: str, columns: list[str] | None = None) -> list[dict]:
        """Per-file min/max manifest from the parquet footers — the
        data-skipping index table formats keep in their transaction log,
        derived here directly from the files (footer reads only, no data
        scan).  Returns one dict per data file:
        ``{"path", "rows", "<col>_min", "<col>_max", ...}``; a column with
        no usable statistics in some file yields None bounds there (the
        pruner must treat that file as always-matching).

        Footer reads are driver-side by design: a manifest is metadata —
        O(files), not O(rows) — exactly like reading a Delta log.  At very
        large file counts, persist the result as a catalog table and
        refresh it incrementally per commit.
        """
        import pyarrow.parquet as pq

        root = self.data_path(table)
        out = []
        for dirpath, _dirs, files in os.walk(root):
            for fname in sorted(files):
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(dirpath, fname)
                meta = pq.ParquetFile(fpath).metadata
                names = [meta.schema.column(i).name for i in range(meta.num_columns)]
                want = columns if columns is not None else names
                entry: dict = {"path": fpath, "rows": meta.num_rows}
                mins: dict = {}
                maxs: dict = {}
                for rg in range(meta.num_row_groups):
                    row_group = meta.row_group(rg)
                    for ci in range(row_group.num_columns):
                        name = names[ci]
                        if name not in want:
                            continue
                        st = row_group.column(ci).statistics
                        if st is None or not st.has_min_max:
                            mins[name] = maxs[name] = None
                            continue
                        if mins.get(name, st.min) is not None:
                            mins[name] = min(mins.get(name, st.min), st.min)
                            maxs[name] = max(maxs.get(name, st.max), st.max)
                for name in want:
                    if name in names:
                        entry[f"{name}_min"] = mins.get(name)
                        entry[f"{name}_max"] = maxs.get(name)
                out.append(entry)
        return out

    def read_pruned(self, table: str, bounds: dict[str, tuple]) -> DataFrame:
        """Manifest-pruned read: keep only files whose per-column [min, max]
        intervals INTERSECT every requested ``{col: (lo, hi)}`` bound (None
        end = open), read just those paths, and re-apply the exact range
        predicate — so the file pruning is a performance fact, never a
        correctness input.  Files without usable stats for a bounded column
        are conservatively kept.

        The payoff compounds with :meth:`compact`'s ``zorder_by``: after a
        Z-order rewrite each file covers a compact key interval, so a
        selective range predicate keeps a handful of files out of thousands
        — the scan-level half of data skipping that partition pruning
        (p_year/p_month) can't express for non-partition columns.
        """
        stats = self.file_stats(table, list(bounds))
        keep = []
        for entry in stats:
            ok = True
            for col, (lo, hi) in bounds.items():
                fmin = entry.get(f"{col}_min")
                fmax = entry.get(f"{col}_max")
                if fmin is None or fmax is None:
                    continue  # no stats → cannot exclude
                if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                    ok = False
                    break
            if ok:
                keep.append(entry["path"])
        if not keep:
            df = self.read(table).limit(0)
        else:
            root = self.data_path(table)
            stored = self._read_schema_sidecar(root)
            # basePath keeps the hive partition columns (p_year/p_month)
            # when reading explicit leaf-file paths, so the pruned frame's
            # schema matches read()'s and bounds on partition columns apply
            reader = self.spark.read.option("basePath", root)
            if stored is not None:
                reader = reader.schema(stored)
            df = reader.parquet(*keep)
        for col, (lo, hi) in bounds.items():
            if col not in df.columns:
                raise ValueError(
                    f"read_pruned bound on unknown column {col!r} "
                    f"(table {table!r} has {df.columns})"
                )
            if lo is not None:
                df = df.where(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.where(F.col(col) <= F.lit(hi))
        return df

    def fsck(self, table: str) -> dict:
        """Catalog health report for `table`: pointer validity, orphan
        version dirs (above the pointer — crashed writes), GC candidates
        (below the retention window, normally impossible), and hard-link
        sharing between retained versions (how much history is free).

        Read-only; the returned dict is the input to an operator's cleanup
        decision (delete orphans, raise retention), never auto-acted on.
        """
        table_dir = self._table_dir(table)
        current = self._current_version(table)
        on_disk = self._versions_on_disk(table)
        readable = self.list_versions(table)
        orphans = [v for v in on_disk if v not in readable]

        def inodes(version: int) -> set[int]:
            out = set()
            for dirpath, _dirs, files in os.walk(
                os.path.join(table_dir, f"v_{version}")
            ):
                for fname in files:
                    if fname.endswith(".parquet"):
                        out.add(os.stat(os.path.join(dirpath, fname)).st_ino)
            return out

        shared = 0
        if len(readable) >= 2:
            newest, prev = inodes(readable[-1]), inodes(readable[-2])
            shared = len(newest & prev)
        return {
            "table": table,
            "pointer": current,
            "pointer_valid": current is not None
            and os.path.isdir(os.path.join(table_dir, current)),
            "versions_on_disk": on_disk,
            "readable_versions": readable,
            "orphan_versions": orphans,
            "shared_inodes_newest_prev": shared,
        }

    # -- bucketed tables (scale path: shuffle-free co-located joins) -------
    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str = "pid",
        n_buckets: int = 16,
    ) -> None:
        """Persist as a bucketed managed table so repeated joins/aggs on
        `bucket_col` (scene⋈plugin_results, obs-date bridges) need no
        exchange.  Bucketing requires the table catalog (saveAsTable); the
        data lands under spark.sql.warehouse.dir.
        """
        self.spark.sql(f"DROP TABLE IF EXISTS eodd_{table}")
        # a stale location without a metastore entry (fresh session, old
        # warehouse dir) blocks saveAsTable — clear it
        warehouse = self.spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        stale = os.path.join(warehouse.removeprefix("file:"), f"eodd_{table}")
        shutil.rmtree(stale, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .format("parquet")
            .saveAsTable(f"eodd_{table}")
        )

    def read_bucketed(self, table: str) -> DataFrame:
        return self.spark.table(f"eodd_{table}")

    def _bucketed_ident(self, name: str) -> tuple[str, str]:
        """(path, session table name) for an EXTERNAL bucketed snapshot of
        ``name``.  The table name hashes the catalog root so two catalogs
        in one session never collide in the shared session catalog."""
        import hashlib

        path = os.path.join(os.path.abspath(self.root), f"{name}_bucketed")
        tag = hashlib.md5(path.encode()).hexdigest()[:8]
        safe = "".join(c if c.isalnum() else "_" for c in name)
        return path, f"eodd_bkt_{safe}_{tag}"

    def publish_bucketed_snapshot(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: list[str] | str,
        n_buckets: int = 16,
    ) -> str:
        """Publish ``df`` as an EXTERNAL bucketed parquet snapshot INSIDE
        the catalog root (unlike :meth:`write_bucketed`, which lands a
        managed table in the session warehouse).  External + re-registered
        per session (:meth:`read_bucketed_snapshot`) is what lets separate
        CLI processes share the bucket layout without a persistent
        metastore: Spark encodes the bucket id in each file name, so a
        fresh session can re-declare ``CLUSTERED BY`` over the same files
        and get shuffle-free probe joins on the bucket keys.

        This is a PUBLISH face, not the source of truth — the OCC catalog
        table stays authoritative; republish after every fold.  Replace is
        drop+rewrite: single-writer, same contract as an index --build."""
        cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
        path, tbl = self._bucketed_ident(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(path, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, cols[0], *cols[1:])
            .sortBy(cols[0], *cols[1:])
            .option("path", path)
            .format("parquet")
            .saveAsTable(tbl)
        )
        # self-describing snapshot: the spec rides WITH the files (Spark
        # ignores underscore-prefixed names), so a reader can never apply
        # a stale/wrong bucket spec to these files — declaring the wrong
        # CLUSTERED BY over existing bucket files mis-assigns rows to
        # buckets and a bucketed join silently LOSES matches
        with open(os.path.join(path, "_bucket_spec.json"), "w",
                  encoding="utf-8") as fh:
            json.dump({"bucket_cols": cols, "n_buckets": n_buckets}, fh)
        return path

    def read_bucketed_snapshot(
        self,
        name: str,
        bucket_cols: list[str] | str,
        n_buckets: int = 16,
    ) -> DataFrame:
        """Open a :meth:`publish_bucketed_snapshot` table from ANY session:
        re-register the external bucketed definition over the snapshot path
        (schema inferred from the parquet footer) and return the table
        scan, bucketing info intact.

        The snapshot's own ``_bucket_spec.json`` is AUTHORITATIVE over the
        caller's ``bucket_cols``/``n_buckets`` (which serve as the
        fallback for pre-spec snapshots): declaring a wrong CLUSTERED BY
        over existing bucket files would mis-assign rows to buckets and a
        bucketed join would silently LOSE matches.

        The session registration is unconditionally dropped and recreated
        from the CURRENT sidecar + parquet footer on every read (ADVICE
        r12): comparing the sidecar against the caller's args alone let a
        long-lived session reuse a stale old-spec/old-schema registration
        after another process republished the snapshot — the exact silent
        row-loss the spec sidecar exists to prevent.  The registration is
        metadata-only (external table, schema from one footer read), so
        recreating per read costs milliseconds, not a scan."""
        cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
        path, tbl = self._bucketed_ident(name)
        spec_path = os.path.join(path, "_bucket_spec.json")
        if os.path.exists(spec_path):
            with open(spec_path, encoding="utf-8") as fh:
                spec = json.load(fh)
            cols, n_buckets = spec["bucket_cols"], spec["n_buckets"]
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        sch = self.spark.read.parquet(path).schema
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in sch.fields
        )
        quoted = ", ".join(f"`{c}`" for c in cols)
        self.spark.sql(
            f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({quoted}) SORTED BY ({quoted}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
        return self.spark.table(tbl)

    # -- JSON import/export (S6 / K1; ref eodatadownlandsatgoogsensor.py:2527-2687)
    def export_json(
        self, table: str, out_file: str, max_driver_rows: int = 100_000
    ) -> None:
        """Serialize a table to JSON, matching the reference's
        `export_db_to_json` dict shape for admin-sized catalogs.

        Tables above ``max_driver_rows`` never touch the driver: they stream
        out as a DIRECTORY of gzip JSONL part files written by the executors
        (`df.write.json`) — the scale path for 100 TB catalogs, where a
        single driver-side dict is a guaranteed OOM.  ``import_json`` accepts
        both shapes.
        """
        df = self.read_clean(table)
        # bounded existence probe — counts at most max_driver_rows+1 rows
        big = df.limit(max_driver_rows + 1).count() > max_driver_rows
        if big:
            (
                df.write.mode("overwrite")
                .option("compression", "gzip")
                .json(out_file)
            )
            return
        rows = [row.asDict(recursive=True) for row in df.collect()]
        # key by the unique pid as the reference does; composite-key tables
        # (plugin_results, obs_dates...) fall back to a running index so no
        # row is silently overwritten
        if "pid" in df.columns:
            payload = {str(row["pid"]): row for row in rows}
        else:
            payload = {str(i): row for i, row in enumerate(rows)}
        with open(out_file, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, default=str)

    def import_json(
        self,
        table: str,
        in_file: str,
        replace_path_dict: dict[str, str] | None = None,
        path_cols: tuple[str, ...] = ("download_path", "ardproduct_path"),
    ) -> None:
        """Load an exported JSON dict-of-rows (or a JSONL part directory from
        the large-table export path) back into `table`, optionally rewriting
        path prefixes (ref `import_sensor_db`,
        eodatadownlandsatgoogsensor.py:2605-2687)."""
        schema = schemas.ALL_SCHEMAS.get(table)
        if os.path.isdir(in_file):
            # distributed JSONL export: read executor-side, all-string staging
            # schema so the declared-schema casts below apply uniformly
            df = self.spark.read.schema(_as_string_schema(schema)).json(in_file)
        else:
            with open(in_file, encoding="utf-8") as fh:
                payload = json.load(fh)
            rows = list(payload.values())
            # export serialized dates/timestamps with default=str → parse back
            # per the declared schema (C1 multi-format semantics in the cast).
            df = self.spark.createDataFrame(
                [json.dumps(r) for r in rows], "string"
            ).select(F.from_json("value", _as_string_schema(schema)).alias("r")).select("r.*")
        for field in schema.fields:
            df = df.withColumn(field.name, F.col(field.name).cast(field.dataType))
        if replace_path_dict:
            from eodatadown_spark.functions.paths import rewrite_path_prefixes

            for col in path_cols:
                if col in df.columns:
                    df = df.withColumn(col, rewrite_path_prefixes(col, replace_path_dict))
        self.write(df, table)
