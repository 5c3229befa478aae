"""TimeFly — snapshot time travel on plain parquet datasets.

Re-implements the reference's snapshot-versioned dataset
(``src/pydala/dataset/timefly.py``) with the same on-disk shape:

    <base>/current/                      — live data (timefly.py:150-151)
    <base>/snapshot/<YYYYmmdd_HHMMSS>/   — immutable snapshots
    <base>/_dataset.json                 — metadata (the reference uses
                                           TOML, `_dataset.toml`
                                           timefly.py:50; JSON here because
                                           the runtime has no TOML writer —
                                           same keys, documented divergence)

Semantics preserved:

- snapshot ids are ``%Y%m%d_%H%M%S`` wall-clock strings (timefly.py:72-78);
- ``add_snapshot`` freezes the state of current under snapshot/<id>/ and
  records it in ``history.available`` (timefly.py:246-310);
- ``delete_snapshot`` removes it and moves the id available → deleted
  (timefly.py:313-325);
- ``load_snapshot`` restores a snapshot over current (timefly.py:355-387);
- **as-of rule**: given a timestamp, pick the FIRST snapshot strictly AFTER
  it, else current (timefly.py:337-352). This is deliberately the
  reference's rule (a snapshot taken at T captures state from before T), and
  deliberately NOT Delta's last-version-≤-ts rule — SURVEY §7.3.4.

**Snapshot mechanics diverge from the reference on purpose**: the reference
physically copies current → snapshot dir (timefly.py:246-310), an O(dataset)
cost per snapshot that is a non-starter at 100 TB. Here ``add_snapshot``
writes a *manifest* (``snapshot/<id>/_manifest.json``: the list of current
data files) — O(metadata), like a Delta/Iceberg commit. Copy-on-write
protects the referenced files: before any destructive rewrite of current/
(``write(mode="overwrite")``, ``load_snapshot``), files referenced by live
snapshots are *moved* (a rename, still O(metadata)) into ``<base>/_archive/``
and the manifests are repointed. ``delete_snapshot`` garbage-collects
archive files no longer referenced by any live manifest. Append/delta
writes only add files, so they never trigger the COW path.

Design note (Delta Lake): the natural Spark backend is a Delta table where
every commit is a version; delta-spark jars are not in this runtime, so the
engine implements the manifest log directly on parquet + JSON. The public
API (``as_of``, ``add_snapshot``, ``load_snapshot``) would be unchanged
over a Delta backend. Caveat: compacting or rewriting current/ by any path
other than this class (e.g. ``dataset/repartition.py`` pointed straight at
``<base>/current``) bypasses the COW hook — route such rewrites through
``TimeFly.write(mode="overwrite")``.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from pydatalake_spark.dataset.writer import write_dataset
from pydatalake_spark.sources.read import read_dataset

SNAPSHOT_FMT = "%Y%m%d_%H%M%S"


class TimeFly:
    def __init__(self, spark: SparkSession, base: str, fmt: str = "parquet") -> None:
        self.spark = spark
        self.base = base
        self.fmt = fmt
        self.config_path = os.path.join(base, "_dataset.json")
        self.current_path = os.path.join(base, "current")
        self.snapshot_root = os.path.join(base, "snapshot")
        self.archive_path = os.path.join(base, "_archive")
        self.config: dict = {}
        if os.path.exists(self.config_path):
            with open(self.config_path) as f:
                self.config = json.load(f)
        else:
            # read-side TOML compat: adopt a reference-written lake in place
            # (`_dataset.toml`, reference timefly.py:50). Snapshot dirs in
            # such a lake are physical copies, which the snapshot reader
            # handles natively (no _manifest.json → plain directory scan).
            toml_path = os.path.join(base, "_dataset.toml")
            if os.path.exists(toml_path):
                self.config = self._config_from_toml(toml_path)

    # --- metadata ---------------------------------------------------------
    @staticmethod
    def _config_from_toml(toml_path: str) -> dict:
        """Map the reference's ``_dataset.toml`` layout (``[dataset]`` info,
        ``[current]``, ``[snapshot]`` with available/deleted lists + one
        subtable per snapshot id — timefly.py:131-156, 246-310) onto this
        engine's config shape. Read-only adoption: the first write persists
        as ``_dataset.json``; the TOML stays untouched."""
        import tomllib

        with open(toml_path, "rb") as f:
            ref = tomllib.load(f)
        ds = ref.get("dataset", {})
        snap = ref.get("snapshot", {})
        config = {
            "name": ds.get("name", ""),
            "init": str(ds.get("init", "")),
            "description": ds.get("description", ""),
            "format": ref.get("current", {}).get("format") or "parquet",
            "current": {
                str(k): str(v) if not isinstance(v, (dict, list)) else v
                for k, v in ref.get("current", {}).items()
            },
            "history": {
                "available": [str(s) for s in snap.get("available", [])],
                "deleted": [str(s) for s in snap.get("deleted", [])],
            },
        }
        for snap_id, meta in snap.items():
            if isinstance(meta, dict):
                config[f"snapshot.{snap_id}"] = {
                    k: str(v) if not isinstance(v, (dict, list)) else v
                    for k, v in meta.items()
                }
        return config

    def _write_config(self) -> None:
        os.makedirs(self.base, exist_ok=True)
        with open(self.config_path, "w") as f:
            json.dump(self.config, f, indent=2, default=str)

    @staticmethod
    def _now_id(now: dt.datetime | None = None) -> str:
        return (now or dt.datetime.now()).strftime(SNAPSHOT_FMT)

    # --- lifecycle (T1-T5) ------------------------------------------------
    def init(self, name: str | None = None, description: str = "") -> "TimeFly":
        """Create current/ + snapshot/ + metadata (T1, timefly.py:131-156).
        Adopts any pre-existing root data files into current/ (T2,
        timefly.py:172-174)."""
        os.makedirs(self.current_path, exist_ok=True)
        os.makedirs(self.snapshot_root, exist_ok=True)
        for entry in os.listdir(self.base):
            full = os.path.join(self.base, entry)
            if os.path.isfile(full) and not entry.startswith(("_", ".")):
                shutil.move(full, os.path.join(self.current_path, entry))
        self.config = {
            "name": name or os.path.basename(self.base.rstrip("/")),
            "init": self._now_id(),
            "description": description,
            "format": self.fmt,
            "current": {"created": self._now_id()},
            "history": {"available": [], "deleted": []},
        }
        self._write_config()
        return self

    # --- manifest plumbing ------------------------------------------------
    def _manifest_path(self, snap_id: str) -> str:
        return os.path.join(self.snapshot_root, snap_id, "_manifest.json")

    def _read_manifest(self, snap_id: str) -> dict:
        with open(self._manifest_path(snap_id)) as f:
            return json.load(f)

    def _write_manifest(self, snap_id: str, manifest: dict) -> None:
        os.makedirs(os.path.join(self.snapshot_root, snap_id), exist_ok=True)
        with open(self._manifest_path(snap_id), "w") as f:
            json.dump(manifest, f, indent=2)

    def _current_files(self) -> list[str]:
        """Relative paths of data files under current/ (hive subdirs kept)."""
        out = []
        for root, _dirs, files in os.walk(self.current_path):
            for name in files:
                if name.startswith(("_", ".")) or name.endswith(".crc"):
                    continue
                out.append(
                    os.path.relpath(os.path.join(root, name), self.current_path)
                )
        return sorted(out)

    def _cow_protect(self) -> None:
        """Before a destructive rewrite of current/: move files referenced by
        live snapshots into _archive/ (a rename — O(metadata), no data copy)
        and repoint their manifests. Files shared by several snapshots move
        once."""
        moved: set[str] = set()
        for snap_id in self.snapshots():
            if not os.path.isfile(self._manifest_path(snap_id)):
                # physical snapshot (adopted reference lake): self-contained
                # copy, references nothing in current/
                continue
            manifest = self._read_manifest(snap_id)
            changed = False
            for entry in manifest["files"]:
                if entry["location"] != "current":
                    continue
                rel = entry["path"]
                if rel not in moved:
                    src = os.path.join(self.current_path, rel)
                    dst = os.path.join(self.archive_path, rel)
                    if os.path.exists(src):
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                        shutil.move(src, dst)
                    moved.add(rel)
                entry["location"] = "archive"
                changed = True
            if changed:
                self._write_manifest(snap_id, manifest)

    def repair(self) -> int:
        """Reconcile manifests with the filesystem after an interrupted
        copy-on-write: an entry whose file is missing at its recorded
        location but present at the other root is repointed. Returns the
        number of entries fixed.

        Crash story (tests/test_timefly.py fault-injection): the COW
        window is move-then-repoint, so a kill in between leaves
        (manifest: current, file: _archive). The lake stays READABLE
        without repair — `sources/read.py:read_manifest` and
        `load_snapshot` resolve each entry with a per-entry location
        fallback, and `_gc_archive` references location-blind — and
        _cow_protect itself is idempotent (re-running it skips the done
        move and completes the repoint). ``repair()`` is the explicit
        fsck that restores the recorded-location invariant without
        waiting for the next overwrite."""
        fixed = 0
        roots = {"current": self.current_path, "archive": self.archive_path}
        for snap_id in self.snapshots():
            if not os.path.isfile(self._manifest_path(snap_id)):
                continue
            manifest = self._read_manifest(snap_id)
            changed = False
            for entry in manifest["files"]:
                loc = entry["location"]
                other = "archive" if loc == "current" else "current"
                here = os.path.join(roots[loc], entry["path"])
                there = os.path.join(roots[other], entry["path"])
                if not os.path.exists(here) and os.path.exists(there):
                    entry["location"] = other
                    changed = True
                    fixed += 1
            if changed:
                self._write_manifest(snap_id, manifest)
        return fixed

    def _gc_archive(self) -> None:
        """Drop archive files no live manifest references any more.

        The referenced set counts manifest paths at EITHER location: a
        crash between _cow_protect's rename and its manifest repoint
        leaves a file physically in _archive/ while its entry still says
        "current" — filtering on the recorded location would GC (i.e.
        destroy) exactly that stranded file. Location-blind referencing
        makes GC safe in every half-committed state; ``repair()`` or the
        next COW re-run then fixes the manifest."""
        referenced = {
            entry["path"]
            for snap_id in self.snapshots()
            if os.path.isfile(self._manifest_path(snap_id))
            for entry in self._read_manifest(snap_id)["files"]
        }
        if not os.path.isdir(self.archive_path):
            return
        for root, _dirs, files in os.walk(self.archive_path, topdown=False):
            for name in files:
                full = os.path.join(root, name)
                rel = os.path.relpath(full, self.archive_path)
                if rel not in referenced:
                    os.remove(full)
            if not os.listdir(root):
                os.rmdir(root)

    def add_snapshot(self, now: dt.datetime | None = None, description: str = "") -> str:
        """Freeze the state of current as snapshot/<id>/ (T3,
        timefly.py:246-310) — metadata-only: a manifest of current's data
        files, not a copy. O(file count), never O(bytes)."""
        snap_id = self._now_id(now)
        dest = os.path.join(self.snapshot_root, snap_id)
        if os.path.exists(dest):
            raise FileExistsError(f"snapshot {snap_id} already exists")
        self._write_manifest(
            snap_id,
            {
                "created": snap_id,
                "description": description,
                "files": [
                    {"path": rel, "location": "current"}
                    for rel in self._current_files()
                ],
            },
        )
        self.config.setdefault("history", {"available": [], "deleted": []})
        self.config["history"]["available"].append(snap_id)
        self.config[f"snapshot.{snap_id}"] = {
            "created": snap_id,
            "description": description,
        }
        self._write_config()
        return snap_id

    def delete_snapshot(self, snap_id: str) -> None:
        """T4 (timefly.py:313-325) + garbage-collect newly unreferenced
        archive files."""
        dest = os.path.join(self.snapshot_root, snap_id)
        if os.path.exists(dest):
            shutil.rmtree(dest)
        hist = self.config.get("history", {"available": [], "deleted": []})
        if snap_id in hist["available"]:
            hist["available"].remove(snap_id)
        hist.setdefault("deleted", []).append(snap_id)
        self._gc_archive()
        self._write_config()

    def load_snapshot(self, snap_id: str) -> None:
        """Restore snapshot over current (T5, timefly.py:355-387).

        The one data-copying operation left: the snapshot's files are copied
        back into current/ so current stays a plain directory dataset. COW
        runs first, so the restore source is always the archive and no live
        snapshot loses a file."""
        snap_dir = os.path.join(self.snapshot_root, snap_id)
        has_manifest = os.path.isfile(self._manifest_path(snap_id))
        if not has_manifest and not os.path.isdir(snap_dir):
            raise FileNotFoundError(f"no snapshot {snap_id}")
        self._cow_protect()
        if not has_manifest:
            # physical snapshot from an adopted reference lake: copy it back
            # the way the reference does (timefly.py:355-387)
            shutil.rmtree(self.current_path)
            shutil.copytree(snap_dir, self.current_path)
            self.config["current"] = {
                "created": self._now_id(),
                "restored_from": snap_id,
            }
            self._write_config()
            return
        manifest = self._read_manifest(snap_id)
        # every live entry is in _archive/ here: _cow_protect just ran
        # (idempotent — it also completes the repoint for entries
        # stranded current by an earlier crash). Validate EVERY restore
        # source BEFORE the destructive rmtree of current/ — discovering
        # a missing file mid-copy would otherwise fail the restore AND
        # have destroyed the current state it was replacing.
        missing = [
            e["path"]
            for e in manifest["files"]
            if not os.path.exists(os.path.join(self.archive_path, e["path"]))
        ]
        if missing:
            raise FileNotFoundError(
                f"snapshot {snap_id} references files missing from the "
                f"archive (deleted outside TimeFly?): {missing[:5]}"
                f"{' …' if len(missing) > 5 else ''}; current/ left "
                "untouched"
            )
        shutil.rmtree(self.current_path)
        os.makedirs(self.current_path)
        for entry in manifest["files"]:
            src = os.path.join(self.archive_path, entry["path"])
            dst = os.path.join(self.current_path, entry["path"])
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
        self.config["current"] = {"created": self._now_id(), "restored_from": snap_id}
        self._write_config()

    # --- as-of resolution (T6, timefly.py:337-352) ------------------------
    def snapshots(self) -> list[str]:
        return sorted(self.config.get("history", {}).get("available", []))

    def resolve_as_of(self, as_of: dt.datetime | str | None) -> str:
        """Reference rule: first snapshot STRICTLY AFTER the timestamp, else
        current (timefly.py:346-347)."""
        if as_of is None:
            return self.current_path
        if isinstance(as_of, str):
            as_of = dt.datetime.fromisoformat(as_of)
        wanted = as_of.strftime(SNAPSHOT_FMT)
        later = [s for s in self.snapshots() if s > wanted]
        if later:
            return os.path.join(self.snapshot_root, later[0])
        return self.current_path

    # --- read / write (T7/T8) --------------------------------------------
    def read(self, as_of: dt.datetime | str | None = None) -> DataFrame:
        """As-of reader (T7, reader.py:584-680)."""
        return read_dataset(self.spark, self.resolve_as_of(as_of), fmt=self.fmt)

    def write(self, df: DataFrame, mode: str = "append", **kwargs) -> None:
        """Versioned writer into current/ (T8, writer.py:574-687); metadata
        updated after the write (W11, writer.py:646-687)."""
        if not self.config:
            self.init()
        if mode == "overwrite":
            # destructive rewrite of current/ — move snapshot-referenced
            # files aside first (rename-only; see _cow_protect)
            self._cow_protect()
        write_dataset(df, self.current_path, mode=mode, fmt=self.fmt, **kwargs)
        self.config["current"] = dict(
            self.config.get("current", {}), updated=self._now_id(), last_mode=mode
        )
        self._write_config()
