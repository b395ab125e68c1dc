"""Generic LSM-shaped incremental store for session index tables.

The reference indexes writes asynchronously: a batch lands in the object
store and an index queue applies it to the vector index in the
background (adapters/repos/db/vector_index_queue.go), so searches never
pay a full-corpus re-encode after ingest. The Spark analogue for the
session-persisted encoded tables (BQ/PQ/RQ codes — which also back the
IVF cell assignment): each append lands as a small immutable SEGMENT
(one localCheckpoint'ed encoded frame per micro-batch, O(batch) work)
and queries read a compacted generation. Compaction (last-write-wins by
id) runs lazily at the next resolve, or inside append once
``_MAX_SEGMENTS`` pile up — the only O(corpus) step, amortized exactly
like LSM compaction.

Every frame is localCheckpoint(eager=True): lineage never deepens with
batch count (and segments built inside a defunct foreachBatch don't
root in the dead stream), and replaced generations are reclaimed by
Spark's ContextCleaner when the last reference drops — no explicit
unpersist can race a query holding last generation's frame.

The near-dup index keeps its own multi-table variant of this pattern
(operators/dedup.py) because its three tables must swap as one atomic
generation; this store handles the single-frame indexes.
"""

from __future__ import annotations

import threading
from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MAX_SEGMENTS = 16


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


class SegmentStore:
    """Session store of compacted index frames + pending append
    segments. Each entry remembers its ``encode`` closure (the exact
    build pipeline over a batch) so appends re-encode only the batch —
    the caller of ``append`` never needs to know which variants
    (quantizers, dims, normalizations) were built under a corpus key."""

    def __init__(self, name: str):
        self.name = name
        self._lock = threading.RLock()
        # key -> {frame, segments, base, id_col, encode}
        self._state: dict[tuple, dict] = {}

    def resolve(
        self,
        key: tuple,
        base: tuple,
        id_col: str,
        build: Callable[[], DataFrame],
        encode: Callable[[DataFrame], DataFrame],
    ) -> DataFrame:
        """Return the compacted frame for ``key``, building it on first
        use and merging any pending segments first. ``base`` is the
        prefix appends match on (session + corpus key); ``encode`` maps
        a batch DataFrame to rows in the frame's schema."""
        with self._lock:
            st = self._state.get(key)
            if st is None:
                st = {
                    "frame": _ckpt(build()),
                    "segments": [],
                    "base": tuple(base),
                    "id_col": id_col,
                    "encode": encode,
                }
                self._state[key] = st
            elif st["segments"]:
                self._compact(st)
            return st["frame"]

    def append(self, base_prefix: tuple, batch_df: DataFrame) -> int:
        """Record ``batch_df`` as a pending segment for every index
        whose base starts with ``base_prefix``; O(batch) per index (one
        encode pass into a checkpointed segment). Returns the number of
        indexes appended to — 0 means nothing was ever built under the
        prefix (the next query builds from the full table anyway)."""
        prefix = tuple(base_prefix)
        n = 0
        with self._lock:
            for st in self._state.values():
                if st["base"][: len(prefix)] != prefix:
                    continue
                st["segments"].append(_ckpt(st["encode"](batch_df)))
                if len(st["segments"]) >= _MAX_SEGMENTS:
                    self._compact(st)
                n += 1
        return n

    def _compact(self, st: dict) -> None:
        """Merge pending segments into a new generation (caller holds
        the lock): last-write-wins per id across segments (a re-arrived
        id is a replacement — the reference's object-upsert semantics),
        then replaced/new ids evict their old-generation rows via a
        broadcast anti-join."""
        idc = st["id_col"]
        tagged = [
            s.withColumn("_seq", F.lit(i)) for i, s in enumerate(st["segments"])
        ]
        allr = reduce(lambda a, b: a.unionByName(b), tagged)
        w = Window.partitionBy(idc).orderBy(F.col("_seq").desc())
        latest = (
            allr.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_seq", "_rn")
        )
        ids = latest.select(idc)
        st["frame"] = _ckpt(
            st["frame"].join(F.broadcast(ids), idc, "left_anti").unionByName(latest)
        )
        st["segments"] = []

    def invalidate(self) -> None:
        with self._lock:
            for st in self._state.values():
                for frame in [st["frame"], *st["segments"]]:
                    try:
                        frame.unpersist()
                    except Exception:
                        pass
            self._state.clear()
