"""Search result cache with index-epoch invalidation (SURVEY §2 leaf/result
caches).

The reference caches leaf search results per (split, query) and full results
per request (quickwit-search/src/leaf_cache.rs, root.rs result cache —
behavior only): a repeated query over unchanged splits never re-runs the
collectors, and ANY metadata mutation (publish, merge, delete, retention)
invalidates affected entries because split ids change.

The Spark-first analog keys a bounded LRU of response dicts by
(index_signature, canonical request). ``index_signature`` captures the
metadata plane of a managed index directory — the set of live commit dirs,
their lineage mtimes and the checkpoint log — so the exact invalidation
events the reference gets from split-id turnover (publish/merge/delete/
retention all rewrite commits or lineage) change the signature here. Search
responses are driver-sized by construction (top-k pages + aggregate rows),
so caching them whole is bounded memory, the same argument as the
reference's byte-bounded caches.
"""

from __future__ import annotations

import copy
import glob
import hashlib
import json
import os
import threading
from collections import OrderedDict
from typing import Any, Callable


def index_signature(out_dir: str) -> str:
    """Cheap fs-scan fingerprint of a managed index's metadata plane.

    Changes whenever a commit is published, merged, deleted, retained-away
    or garbage-collected: commit dir set, per-commit lineage mtimes, the
    checkpoint log, delete opstamps and split-state marks all feed the hash.
    Data files are NOT hashed — the engine's own invariant (tested by
    test_concurrent_commit) is that the data plane only changes together
    with the metadata plane."""
    h = hashlib.sha256()
    for pattern in (
        os.path.join(out_dir, "sinks", "commit=*"),
        os.path.join(out_dir, "_lineage", "commit_id=*"),
        os.path.join(out_dir, "_checkpoints", "*.json"),
        os.path.join(out_dir, "_deletes", "*.json"),
        os.path.join(out_dir, "_splits.json"),
    ):
        for p in sorted(glob.glob(pattern)):
            h.update(p.encode())
            try:
                st = os.stat(p)
                h.update(str(st.st_mtime_ns).encode())
            except OSError:
                h.update(b"gone")
    return h.hexdigest()


def request_key(body: Any, scope: str = "") -> str:
    """Canonical hash of a search request (sorted-key JSON), optionally
    scoped (index pattern, endpoint)."""
    blob = json.dumps({"scope": scope, "body": body}, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()


class SearchCache:
    """Bounded LRU of search responses keyed by (index epoch, request).

    Thread-safe; entries from superseded epochs are dropped lazily on
    access and eagerly on ``evict_epoch``. ``get_or_compute`` is the one
    entry point callers need."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self._lru: OrderedDict[tuple[str, str], dict] = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, epoch: str, key: str) -> dict | None:
        with self._lock:
            entry = self._lru.get((epoch, key))
            if entry is None:
                self.misses += 1
                return None
            self._lru.move_to_end((epoch, key))
            self.hits += 1
        # deep copy: callers mutate responses (took, scroll ids)
        return copy.deepcopy(entry)

    def put(self, epoch: str, key: str, response: dict) -> None:
        with self._lock:
            self._lru[(epoch, key)] = copy.deepcopy(response)
            self._lru.move_to_end((epoch, key))
            while len(self._lru) > self.capacity:
                self._lru.popitem(last=False)

    def get_or_compute(
        self,
        out_dir: str,
        body: Any,
        compute: Callable[[], dict],
        scope: str = "",
    ) -> dict:
        """Return the cached response for ``body`` over the index at
        ``out_dir``'s CURRENT epoch, computing and storing on miss. A
        publish/merge/delete between two identical requests changes the
        epoch, so the second request recomputes — never stale reads."""
        epoch = index_signature(out_dir)
        key = request_key(body, scope)
        hit = self.get(epoch, key)
        if hit is not None:
            return hit
        response = compute()
        self.put(epoch, key, response)
        return response

    def evict_epoch(self, keep_epoch: str) -> int:
        """Drop every entry not belonging to ``keep_epoch`` (the janitor
        hook after a merge/GC cycle). Returns the number evicted."""
        with self._lock:
            stale = [k for k in self._lru if k[0] != keep_epoch]
            for k in stale:
                del self._lru[k]
        return len(stale)

    def stats(self) -> dict:
        with self._lock:
            return {
                "entries": len(self._lru),
                "capacity": self.capacity,
                "hits": self.hits,
                "misses": self.misses,
            }
