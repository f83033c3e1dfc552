"""Index snapshot / restore — the OpenSearch snapshot-repository API
(which the reference's indexes participate in via Lucene's segment-file
snapshot model) restated over this index layout.

Segments are IMMUTABLE once complete: build, merge, compaction and purge
always write NEW segment ids and retire old ones through the manifest.
That makes snapshots INCREMENTAL by construction — a repository stores
one copy of each segment directory ever snapshotted (content-addressed
by segment id), and a snapshot is just the index manifest frozen at
snapshot time pointing into that pool. Snapshotting an index twice after
one new segment copies exactly that one segment; restoring never copies
anything twice. This is precisely Lucene's SnapshotDeletionPolicy /
OpenSearch incremental-snapshot behavior.

Repository layout::

    repo/
      segments/<segment_id>/...   segment payload, written once, then
                                  immutable (finished marker: .complete)
      snapshots/<name>.json       manifest + tombstone state at snapshot
                                  time (atomic rename = commit point)

Tombstones (index/deletes.py) are part of the searchable state and ride
inside the snapshot record itself (they are tiny id lists, not files
worth pooling). Derived sidecars — doc-values, forward index, SEISMIC —
are NOT snapshotted: they are rebuilt from the corpus / postings by
their builders, the same reason OpenSearch does not snapshot field-data
caches.

Every step is idempotent and crash-safe: a re-run of ``snapshot_index``
skips pooled segments and rewrites the snapshot record atomically; a
half-copied segment (no ``.complete`` marker) is re-copied.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from .deletes import load_tombstones
from .manifest import IndexManifest

_COMPLETE_MARKER = ".complete"


def _copy_tree_once(src: str, dst: str) -> bool:
    """Copy a segment directory into the pool if not already there.
    Hardlinks when possible (same filesystem — segments are immutable so
    sharing bytes is safe), byte-copy otherwise. Returns True if copied."""
    if os.path.exists(os.path.join(dst, _COMPLETE_MARKER)):
        return False
    shutil.rmtree(dst, ignore_errors=True)  # half-copied: start over
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)

    def _link_or_copy(s, d, *, follow_symlinks=True):
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)

    shutil.copytree(src, tmp, copy_function=_link_or_copy)
    open(os.path.join(tmp, _COMPLETE_MARKER), "w").close()
    os.rename(tmp, dst)
    return True


def snapshot_index(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot the index into a repository. Returns a summary dict with
    ``segments_copied`` (the incremental cost) and ``segments_total``.

    Only COMPLETE segments are snapshotted (an in-flight build's partial
    segment is not yet part of the searchable state); the snapshot
    record freezes the manifest restricted to them plus the current
    tombstone set, so a restore reproduces the exact searchable view —
    including stale-stats delete semantics."""
    manifest = IndexManifest.load(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no index manifest in {index_dir}")
    os.makedirs(os.path.join(repo_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(repo_dir, "snapshots"), exist_ok=True)
    complete = {
        sid: seg
        for sid, seg in manifest.segments.items()
        if seg.get("complete")
    }
    copied = 0
    for sid in sorted(complete):
        src = os.path.join(index_dir, "segments", sid)
        dst = os.path.join(repo_dir, "segments", sid)
        copied += _copy_tree_once(src, dst)
    from dataclasses import asdict

    d = asdict(manifest)
    d["segments"] = complete
    record = {
        "name": name,
        "manifest": d,
        "tombstones": [int(x) for x in load_tombstones(index_dir)],
    }
    path = os.path.join(repo_dir, "snapshots", f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.rename(tmp, path)  # atomic commit point
    return {
        "name": name,
        "segments_total": len(complete),
        "segments_copied": copied,
        "tombstones": len(record["tombstones"]),
    }


def list_snapshots(repo_dir: str) -> list[str]:
    d = os.path.join(repo_dir, "snapshots")
    if not os.path.isdir(d):
        return []
    return sorted(
        f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")
    )


def restore_index(repo_dir: str, name: str, index_dir: str) -> IndexManifest:
    """Restore a snapshot into ``index_dir`` (must not already hold an
    index — restores never silently overwrite live state). Segment
    payloads hardlink out of the pool when possible; the manifest is
    written LAST so a crashed restore is invisible to readers and
    re-runnable."""
    path = os.path.join(repo_dir, "snapshots", f"{name}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    if os.path.exists(os.path.join(index_dir, "manifest.json")):
        raise FileExistsError(
            f"{index_dir} already holds an index; restore into a fresh "
            f"directory (restores never overwrite live state)"
        )
    with open(path) as f:
        record = json.load(f)
    os.makedirs(os.path.join(index_dir, "segments"), exist_ok=True)
    for sid in sorted(record["manifest"]["segments"]):
        src = os.path.join(repo_dir, "segments", sid)
        if not os.path.exists(os.path.join(src, _COMPLETE_MARKER)):
            raise FileNotFoundError(
                f"snapshot {name!r} references segment {sid} missing from "
                f"the repository pool"
            )
        dst = os.path.join(index_dir, "segments", sid)
        _copy_tree_once(src, dst)
        # the pool marker is repository bookkeeping, not index payload
        os.remove(os.path.join(dst, _COMPLETE_MARKER))
    if record["tombstones"]:
        from .deletes import delete_docs

        delete_docs(
            index_dir, np.asarray(record["tombstones"], dtype=np.int64)
        )
    manifest = IndexManifest.from_dict(record["manifest"])
    manifest.save(index_dir)
    return manifest
