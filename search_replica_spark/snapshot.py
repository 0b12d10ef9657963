"""Index snapshot/restore — ES snapshot-API parity for the engine.

The reference leans on Elasticsearch for durability (its own recovery
story is "reindex from Postgres", postgres/reindex.go); real ES operators
instead snapshot indices to a repository and restore them. This module
gives the engine that contract over plain directories:

  - ``snapshot_index``  — point-in-time copy of a (generational or plain)
    index into a snapshot directory. Hardlinks when source and repository
    share a filesystem (O(files) metadata cost, zero data copy — the same
    trick Lucene-based snapshots use, immutable segment files make links
    safe), byte-copy otherwise. The streaming checkpoint is deliberately
    NOT part of the snapshot (ES snapshots segments, not the translog): a
    restored index resumes replication with a fresh stream.
  - ``restore_index``   — materialize a snapshot at a target path.

Crash safety mirrors the generation commit protocol: everything stages
into ``<dest>.tmp`` and a single ``os.rename`` publishes it, so a
half-written snapshot or restore is never visible under the final name.
Snapshots are RELOCATABLE: generations.json's absolute ``dir`` entries are
rewritten to snapshot-relative names on the way in and re-absolutized on
restore, so a snapshot restores onto any path (or machine).
"""

from __future__ import annotations

import json
import os
import shutil

from search_replica_spark.streaming.incremental import GENS_FILE, _load_gens

# every live streaming checkpoint is excluded at EVERY depth: a restored
# index resumes replication with FRESH streams (epoch watermarks are
# stripped below to match), and hardlinked checkpoint files would let the
# live stream write through shared inodes into the snapshot
EXCLUDE = ("_checkpoint", "_inline_checkpoint", "_checkpoint_*")


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _copytree(src: str, dst: str, exclude: tuple = ()) -> int:
    n = 0
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if (
            name in exclude
            or name.endswith(".tmp")
            # "<prefix>*" entries exclude by prefix (per-table stream
            # checkpoints: _checkpoint_<source_name>)
            or any(e.endswith("*") and name.startswith(e[:-1]) for e in exclude)
        ):
            continue
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            # propagate the exclusion to every depth: a streaming
            # checkpoint nested inside a generation dir must not be
            # hardlinked into the snapshot (the live stream would write
            # through the shared inodes)
            n += _copytree(s, d, exclude)
        else:
            _link_or_copy(s, d)
            n += 1
    return n


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """Point-in-time snapshot of ``index_dir`` at ``snap_dir`` (must not
    already exist). Returns the snapshot manifest. Safe against a crashed
    writer: the rename at the end is the only visible effect."""
    if os.path.exists(snap_dir):
        raise FileExistsError(f"snapshot target already exists: {snap_dir}")
    gens = _load_gens(index_dir)
    if not gens and not os.path.exists(os.path.join(index_dir, "stats.json")):
        raise FileNotFoundError(f"no index at {index_dir}")
    tmp = snap_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # GENS_FILE is NEVER hardlinked (writing through a linked inode would
    # mutate the live index's commit log) — a fresh relocatable copy is
    # written below instead
    n_files = _copytree(index_dir, tmp, exclude=EXCLUDE + (GENS_FILE,))
    # no lock is shared with writers, so detect a concurrent
    # merge/add_generation: if the commit log changed while we copied, the
    # copied files may not match the log we captured — fail rather than
    # publish a snapshot whose generations.json references directories
    # that were merged away mid-copy
    if _load_gens(index_dir) != gens:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"index {index_dir} changed during snapshot (concurrent "
            "merge/ingest) — retry when the writer is quiescent"
        )
    if gens:
        # relocatable commit log: dir entries become snapshot-relative
        rel = [
            {**g, "dir": os.path.basename(g["dir"]) if g["dir"] else None}
            for g in gens
        ]
        with open(os.path.join(tmp, GENS_FILE), "w") as f:
            json.dump(rel, f, indent=2)
    manifest = {
        "generations": len(gens),
        "live_generations": sum(1 for g in gens if g["dir"]),
        "plain": not gens,
        "files": n_files,
    }
    with open(os.path.join(tmp, "_snapshot.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    os.makedirs(os.path.dirname(os.path.abspath(snap_dir)), exist_ok=True)
    os.rename(tmp, snap_dir)  # commit point
    return manifest


def restore_index(snap_dir: str, index_dir: str) -> dict:
    """Materialize a snapshot at ``index_dir`` (must not already contain an
    index — restoring over live data is never implicit, same as ES's
    closed-index requirement). Returns the snapshot manifest."""
    man_p = os.path.join(snap_dir, "_snapshot.json")
    if not os.path.exists(man_p):
        raise FileNotFoundError(f"no snapshot at {snap_dir}")
    if os.path.exists(index_dir) and os.listdir(index_dir):
        raise FileExistsError(
            f"restore target {index_dir} is not empty — refuse to overwrite"
        )
    with open(man_p) as f:
        manifest = json.load(f)
    tmp = index_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # same hardlink discipline: the commit log is re-written fresh (with
    # re-absolutized dirs), never linked back to the snapshot's inode
    _copytree(snap_dir, tmp, exclude=("_snapshot.json", GENS_FILE))
    src_gens_p = os.path.join(snap_dir, GENS_FILE)
    if os.path.exists(src_gens_p):
        with open(src_gens_p) as f:
            gens = json.load(f)
        for g in gens:
            if g["dir"]:
                g["dir"] = os.path.join(os.path.abspath(index_dir), g["dir"])
            # the streaming checkpoint is not part of the snapshot, so a
            # restored index replicates with a FRESH stream whose batch
            # ids restart at 0 — stale epoch watermarks would make
            # add_generation treat the new stream's first batches as
            # replays and silently drop them. Strip them.
            g["epoch_id"] = None
            g.pop("max_epoch", None)
            g.pop("max_epochs", None)
            g.pop("epoch_source", None)
        with open(os.path.join(tmp, GENS_FILE), "w") as f:
            json.dump(gens, f, indent=2)
    shutil.rmtree(index_dir, ignore_errors=True)  # empty dir allowed above
    os.rename(tmp, index_dir)  # commit point
    return manifest
