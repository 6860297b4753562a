"""Epoch-numbered checkpoints: frontier snapshots, append-only deltas,
seen-shard blobs, per-partition counters, and a lineage manifest.

Replaces the reference's durable backend + bus offsets + new_job_id epoch
fencing (SURVEY.md §2.9: job epochs / at-least-once idempotency). Layout:

    ckpt/
      init/                       seeds admitted, epoch "-1"
      epoch=0000/ … epoch=NNNN/
        queued/*.parquet          per-PARTITION QUEUED deltas (append-only;
                                  compaction rewrites drop tombstoned rows)
        done.parquet              append-only delta: rows resolved this epoch
        tombstones.parquet        fps scheduled but not yet compacted away
        out/*.parquet             fetched pages output (OUT schema)
        crawl_order.parquet       seq,url,epoch,fetched — deterministic order
        counters.parquet          COUNTERS schema, per epoch × partition
        seen/shard-K.bin          byte-stable SeenShard dumps
        manifest.json             WRITTEN LAST → the atomic completion marker
                                  (carries queued_map: partition → file list,
                                  root-relative, spanning earlier epoch dirs)

Resume = read the newest dir whose manifest exists (incomplete epochs are
invisible), reload the queued file map + seen blobs + seq counter, continue.
Re-running a finished epoch is idempotent: the seen set re-admits nothing
and the epoch dir is simply rewritten with identical bytes-level content.

Scale note (round-2 frontier update): the frontier is NEVER rewritten per
epoch — each epoch appends its per-partition admission deltas and records
the scheduled fps as tombstones; the full rewrite (dropping tombstones)
happens only when tombstones reach a configured fraction of the frontier.
Per-epoch write cost is O(delta), not O(frontier) — the 10^10-row path.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .. import schema as S


class Checkpoint:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ----------------------------------------------------------
    def epoch_dir(self, epoch: int) -> str:
        # NB: no "epoch=NNNN" naming — a key=value path segment would trigger
        # hive-partition inference in read_parquet and inject a string
        # `epoch` column into every table read from the checkpoint.
        return (
            os.path.join(self.root, "init")
            if epoch < 0
            else os.path.join(self.root, f"epoch-{epoch:04d}")
        )

    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "manifest.json")

    # -- write ----------------------------------------------------------
    def prepare(self, epoch: int) -> str:
        d = self.epoch_dir(epoch)
        # an epoch dir without a manifest is a crashed attempt — wipe it so
        # the replay is idempotent (write_parquet part names are unique per
        # run; stale parts would otherwise double the epoch's output)
        if os.path.isdir(d) and not os.path.exists(self.manifest_path(epoch)):
            import shutil

            shutil.rmtree(d)
        os.makedirs(os.path.join(d, "queued"), exist_ok=True)
        os.makedirs(os.path.join(d, "out"), exist_ok=True)
        os.makedirs(os.path.join(d, "seen"), exist_ok=True)
        return d

    def queued_dir(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "queued")

    # -- frontier file map + tombstones ---------------------------------
    def rel(self, path: str) -> str:
        return os.path.relpath(path, self.root)

    def rel_map(self, qmap: dict) -> dict:
        return {str(p): [self.rel(f) for f in files] for p, files in qmap.items()}

    def abs_map(self, rel_qmap: dict) -> dict:
        return {
            int(p): [os.path.join(self.root, f) for f in files]
            for p, files in rel_qmap.items()
        }

    def write_tombstones(self, epoch: int, fps) -> str:
        """Sorted uint64 fps → tombstones.parquet; returns root-relative path."""
        t = pa.table({"fp64": pa.array(fps, pa.uint64())})
        path = os.path.join(self.epoch_dir(epoch), "tombstones.parquet")
        pq.write_table(t, path)
        return self.rel(path)

    def write_tombstones_part(self, epoch: int, partition: int, fps) -> str:
        """One partition's new tombstoned fps for this epoch (round-4,
        VERDICT r3 #6: tombstones live as per-partition FILES; the driver
        holds only paths + counts, never a growing fp array). Returns the
        ABSOLUTE path (state map holds abs; manifests store rel)."""
        t = pa.table({"fp64": pa.array(fps, pa.uint64())})
        path = os.path.join(
            self.epoch_dir(epoch), f"tombstones-p{int(partition):05d}.parquet"
        )
        pq.write_table(t, path)
        return path

    def load_tombstones(self, relpath: str):
        import numpy as np

        t = pq.read_table(os.path.join(self.root, relpath))
        return t["fp64"].to_numpy(zero_copy_only=False).astype(np.uint64)

    def out_dir(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "out")

    def write_small(self, epoch: int, name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(self.epoch_dir(epoch), f"{name}.parquet"))

    def write_seen(self, epoch: int, blobs: list[bytes]) -> None:
        d = os.path.join(self.epoch_dir(epoch), "seen")
        for i, b in enumerate(blobs):
            with open(os.path.join(d, f"shard-{i}.bin"), "wb") as f:
                f.write(b)

    def finish(self, epoch: int, meta: dict) -> None:
        """Write the manifest LAST — the completion marker."""
        with open(self.manifest_path(epoch), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)

    # -- read -----------------------------------------------------------
    def latest_complete(self) -> int | None:
        """Largest epoch (or -1 for init) with a manifest; None if nothing."""
        best = None
        for name in os.listdir(self.root):
            if name == "init":
                e = -1
            elif name.startswith("epoch-"):
                e = int(name.split("-")[1])
            else:
                continue
            if os.path.exists(self.manifest_path(e)):
                best = e if best is None else max(best, e)
        return best

    def load_manifest(self, epoch: int) -> dict:
        with open(self.manifest_path(epoch)) as f:
            return json.load(f)

    def load_seen(self, epoch: int) -> list[bytes]:
        d = os.path.join(self.epoch_dir(epoch), "seen")
        blobs = []
        for i in range(len(os.listdir(d))):
            with open(os.path.join(d, f"shard-{i}.bin"), "rb") as f:
                blobs.append(f.read())
        return blobs

    # -- cross-epoch readers (final artifacts; tests/parity) ------------
    def _epochs_with(self, fname: str) -> list[str]:
        out = []
        e = 0
        while os.path.exists(self.manifest_path(e)):
            p = os.path.join(self.epoch_dir(e), fname)
            if os.path.exists(p):
                out.append(p)
            e += 1
        return out

    def read_all(self, fname: str) -> pa.Table | None:
        paths = self._epochs_with(fname)
        if not paths:
            return None
        return pa.concat_tables([pq.read_table(p) for p in paths])

    def read_all_out(self) -> pa.Table | None:
        tables = []
        e = 0
        while os.path.exists(self.manifest_path(e)):
            d = self.out_dir(e)
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    tables.append(pq.read_table(os.path.join(d, f)))
            e += 1
        if not tables:
            return None
        return pa.concat_tables([t.select(S.OUT.names) for t in tables])
