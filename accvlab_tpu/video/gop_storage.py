"""Persistent GOP bundle storage for demuxer-free decode.

Parity: reference ``on_demand_video_decoder/examples/demuxer_free_decode/
gop_storage.py:51`` (``GOPStorageManager.store_gops/load_gops_fast``): GOP
packet bundles are extracted once, written to per-GOP files with a JSON
index, and later loaded directly — training then decodes without ever
touching the original videos (no demux cost, sequential reads).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .decoder import GopDecoder


class GOPStorageManager:
    """Store/load serialized GOP bundles with a persistent JSON index."""

    INDEX_NAME = "gop_index.json"

    def __init__(self, storage_dir: str, decoder: Optional[GopDecoder] = None):
        self._dir = storage_dir
        os.makedirs(storage_dir, exist_ok=True)
        self._decoder = decoder or GopDecoder()
        self._index_path = os.path.join(storage_dir, self.INDEX_NAME)
        self._index: Dict[str, List[dict]] = {}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    def _save_index(self):
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def store_gops(self, video_path: str, frame_ids: Sequence[int]) -> int:
        """Extract and persist the GOPs containing ``frame_ids`` (each GOP is
        stored once). Returns the number of newly stored GOPs."""
        stored = 0
        entries = self._index.setdefault(video_path, [])
        for fid in frame_ids:
            if self._find_entry(video_path, fid) is not None:
                continue
            results = self._decoder.GetGOPList([video_path], [fid])
            bundle, firsts, lens = results[0]
            fname = f"{abs(hash(video_path)) % 10**10}_{firsts[0]:08d}.gop"
            self._decoder.SavePacketsToFile(bundle, os.path.join(self._dir, fname))
            entries.append(
                {"first_frame_id": firsts[0], "gop_len": lens[0], "file": fname}
            )
            stored += 1
        if stored:
            self._save_index()
        return stored

    def store_single_gop(self, clip_name: str, video_path: str, packets_tuple) -> bool:
        """Persist a pre-fetched ``GetGOP`` result without re-demuxing
        (parity: reference ``gop_storage.py:231``). ``clip_name`` prefixes the
        stored filename. Returns True on success."""
        try:
            bundle, firsts, lens = packets_tuple
            entries = self._index.setdefault(video_path, [])
            for first, length in zip(list(firsts), list(lens)):
                if self._find_entry(video_path, int(first)) is not None:
                    continue
                fname = f"{clip_name}_{int(first):08d}.gop"
                self._decoder.SavePacketsToFile(
                    np.asarray(bundle), os.path.join(self._dir, fname)
                )
                entries.append(
                    {"first_frame_id": int(first), "gop_len": int(length), "file": fname}
                )
            self._save_index()
            return True
        except Exception:
            return False

    def load_gops(
        self, frame_ids: Sequence[int], video_paths: Sequence[str]
    ) -> Optional[np.ndarray]:
        """Load the stored bundles for the requested frames, or ``None`` if
        any is missing (parity: reference ``gop_storage.py:326`` — note the
        ``frame_ids``-first argument order)."""
        try:
            merged, _, _ = self.load_gops_fast(list(video_paths), list(frame_ids))
            return merged
        except KeyError:
            return None

    def get_gop_stats(self, video_path: str) -> dict:
        """Statistics of stored GOPs for one video (parity: ``:460``)."""
        infos = self._index.get(video_path, [])
        total_frames = sum(e["gop_len"] for e in infos)
        return {
            "total_gops": len(infos),
            "total_frames": total_frames,
            "avg_gop_size": total_frames / len(infos) if infos else 0,
            "frame_ranges": [
                (e["first_frame_id"], e["first_frame_id"] + e["gop_len"] - 1)
                for e in infos
            ],
        }

    def _find_entry(self, video_path: str, frame_id: int) -> Optional[dict]:
        for e in self._index.get(video_path, []):
            if e["first_frame_id"] <= frame_id < e["first_frame_id"] + e["gop_len"]:
                return e
        return None

    def load_gops_fast(
        self, video_paths: Sequence[str], frame_ids: Sequence[int]
    ) -> Tuple[np.ndarray, List[int], List[int]]:
        """Load the stored bundles covering the requested frames (no demux).
        Raises ``KeyError`` if a frame's GOP was never stored."""
        files, firsts, lens = [], [], []
        for path, fid in zip(video_paths, frame_ids):
            entry = self._find_entry(path, fid)
            if entry is None:
                raise KeyError(f"No stored GOP covers frame {fid} of '{path}'")
            files.append(os.path.join(self._dir, entry["file"]))
            firsts.append(entry["first_frame_id"])
            lens.append(entry["gop_len"])
        merged, _, _ = GopDecoder.LoadGOPFromFiles(files)
        return merged, firsts, lens

    def decode(
        self, video_paths: Sequence[str], frame_ids: Sequence[int], as_bgr: bool = False
    ) -> List[np.ndarray]:
        """Demuxer-free decode of the requested frames from stored bundles."""
        merged, _, _ = self.load_gops_fast(video_paths, frame_ids)
        return self._decoder.DecodeFromGOPRGB(merged, video_paths, frame_ids, as_bgr)
