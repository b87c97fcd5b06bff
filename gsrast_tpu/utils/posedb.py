"""Camera-pose persistence.

Replaces the reference's LMDB singleton (/root/reference/Database.{hpp,cpp}:
env with named DBs, `cam_pose` table of memcpy'd structs, hidden `__`-prefixed
keys skipped on iteration — Database.cpp:151-180, Inspector.cpp:306-358).
A JSON file store keeps the same capabilities (put/get/remove/iterate with
hidden keys, pose save/restore tables) without a C dependency, and the data
is human-readable and mergeable.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Iterator, List, Optional, Tuple

from ..camera import Camera, pose_from_dict, pose_to_dict

HIDDEN_PREFIX = "__"  # Database.cpp:165-171 convention


class Store:
    """A tiny named-table key-value store backed by one JSON file."""

    def __init__(self, path: str = "gsrast_store.json"):
        self._path = path
        self._lock = threading.Lock()
        self._data: Dict[str, Dict[str, object]] = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    self._data = json.load(f)
            except (json.JSONDecodeError, OSError):
                self._data = {}

    def _flush(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1, sort_keys=True)
        os.replace(tmp, self._path)

    def put(self, table: str, key: str, value) -> None:
        with self._lock:
            self._data.setdefault(table, {})[key] = value
            self._flush()

    def get(self, table: str, key: str, default=None):
        return self._data.get(table, {}).get(key, default)

    def remove(self, table: str, key: str) -> bool:
        with self._lock:
            tbl = self._data.get(table, {})
            if key in tbl:
                del tbl[key]
                self._flush()
                return True
            return False

    def drop(self, table: str) -> None:
        with self._lock:
            self._data.pop(table, None)
            self._flush()

    def iterate(self, table: str, include_hidden: bool = False
                ) -> Iterator[Tuple[str, object]]:
        """Hidden `__` keys are skipped unless asked for (Database.cpp:165-171)."""
        for k, v in sorted(self._data.get(table, {}).items()):
            if not include_hidden and k.startswith(HIDDEN_PREFIX):
                continue
            yield k, v


class PoseDB:
    """Named camera poses (the Inspector's save/restore/delete table,
    Inspector.cpp:306-358, 408-427)."""

    TABLE = "cam_pose"

    def __init__(self, store: Optional[Store] = None, path: str = "gsrast_store.json"):
        self.store = store or Store(path)

    def save(self, name: str, camera: Camera) -> None:
        self.store.put(self.TABLE, name, pose_to_dict(camera))

    def load(self, name: str) -> Optional[Camera]:
        d = self.store.get(self.TABLE, name)
        return pose_from_dict(d) if d is not None else None

    def delete(self, name: str) -> bool:
        return self.store.remove(self.TABLE, name)

    def names(self) -> List[str]:
        return [k for k, _ in self.store.iterate(self.TABLE)]
