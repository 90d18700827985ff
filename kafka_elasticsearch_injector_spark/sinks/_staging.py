"""Atomic staged publication for shard-file exports.

Shared by the WebDataset tar and JSONL.gz writers: shard tasks write
into a hidden staging dir under the export path, and the previous
export's shard files are replaced only after the whole job succeeds —
a crashed or never-run export leaves the prior one intact. Each
individual file appears atomically (tmp + rename); the multi-file swap
itself is not atomic (POSIX has no multi-file exchange), but the
window exists only after a fully successful export.

FILESYSTEM CONTRACT: tasks use plain local file IO on the executors,
so the export path must be a filesystem shared between driver and
executors (local mode, NFS, FUSE-mounted object store).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable


def staged_publish(path: str, ext: str, run: Callable[[str], list],
                   allow_empty: bool = False,
                   manifest: bool = False) -> list:
    """Run `run(staging_dir)` (a Spark job whose tasks write
    `shard-*{ext}` files into staging_dir, returning manifest rows),
    then swap the staged files in: stale `shard-*{ext}` from a prior
    export are removed only AFTER success, and only finished files are
    published (a task that died between its tmp write and rename
    leaves `*.tmp-*` litter in staging, which must not escape).

    With `manifest=True`, the integrity manifest (see
    sinks/integrity.py) is written INTO the staging dir after the job
    succeeds and renamed into place as the LAST step of the swap — the
    only shards-without-matching-manifest window is the swap's own
    rename sequence, and the verifier reports that state loudly
    (mismatches / all-extra) rather than ever seeing a torn manifest.

    If the job produced ZERO staged shard files while prior shard
    files exist at `path`, the swap is REFUSED (the prior export is
    kept and ValueError raised) unless `allow_empty=True`: an
    accidentally empty re-run — empty input, over-filtered pipeline —
    must not silently destroy a previous export."""
    os.makedirs(path, exist_ok=True)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:8]}")
    os.makedirs(staging)
    try:
        rows = run(staging)
        staged_manifest = None
        if manifest:
            from .integrity import publish_manifest
            staged_manifest = publish_manifest(staging, rows)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    staged = [f for f in os.listdir(staging) if f.endswith(ext)]
    prior = [f for f in os.listdir(path)
             if f.startswith("shard-") and f.endswith(ext)]
    if not staged and prior and not allow_empty:
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            f"refusing to replace {len(prior)} existing shard file(s) at "
            f"{path} with an EMPTY export; pass allow_empty=True to "
            f"publish an intentionally empty result")
    for fname in os.listdir(path):
        if fname.startswith("shard-") and fname.endswith(ext):
            os.remove(os.path.join(path, fname))
    for fname in sorted(os.listdir(staging)):
        if fname.endswith(ext):
            os.replace(os.path.join(staging, fname),
                       os.path.join(path, fname))
    if staged_manifest is not None:
        os.replace(staged_manifest,
                   os.path.join(path, os.path.basename(staged_manifest)))
    else:
        # manifest=False must not leave a PRIOR export's manifest next
        # to freshly swapped shards — a later verify_shard_export would
        # report spurious mismatches against the stale record.
        from .integrity import MANIFEST_NAME
        stale = os.path.join(path, MANIFEST_NAME)
        if os.path.exists(stale):
            os.remove(stale)
    shutil.rmtree(staging)
    return rows


def write_shard_file(staging: str, name: str, data: bytes) -> None:
    """Atomic within-staging publication of one shard file."""
    final = os.path.join(staging, name)
    tmp = final + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        # Durability before visibility: rename may become durable
        # before the data blocks, and a published-then-torn shard is
        # exactly what the manifest verifier exists to never see from
        # our own writes. One fsync per shard — the write path is one
        # file per task, so this never serializes anything.
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)
