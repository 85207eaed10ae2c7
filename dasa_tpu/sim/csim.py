"""ctypes binding for the native dasasim engine.

Builds `libdasasim.so` on demand (make, g++ -O3) and exposes a
:class:`NativeEngine` whose batched reset/step/fill_obs calls replace the
Python per-episode loops on the hot path.  Geometry is identical to
dasa_tpu.sim.engine (tested for exact agreement in
tests/test_native_sim.py).
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_NATIVE_DIR, "native", "libdasasim.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.join(_NATIVE_DIR, "native")],
                       check=True, capture_output=True)
        return True
    except Exception:
        return False


def load_library() -> Optional[C.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = C.CDLL(_SO_PATH)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.dasasim_create.restype = C.c_void_p
        lib.dasasim_create.argtypes = [C.c_int]
        lib.dasasim_destroy.argtypes = [C.c_void_p]
        lib.dasasim_load_scan.restype = C.c_int
        lib.dasasim_load_scan.argtypes = [C.c_void_p, C.c_char_p]
        lib.dasasim_num_nodes.restype = C.c_int
        lib.dasasim_num_nodes.argtypes = [C.c_void_p, C.c_int]
        lib.dasasim_node_index.restype = C.c_int
        lib.dasasim_node_index.argtypes = [C.c_void_p, C.c_int, C.c_char_p]
        lib.dasasim_node_id.restype = C.c_char_p
        lib.dasasim_node_id.argtypes = [C.c_void_p, C.c_int, C.c_int]
        lib.dasasim_set_feat_rows.argtypes = [C.c_void_p, C.c_int, i32p]
        lib.dasasim_distance.restype = C.c_float
        lib.dasasim_distance.argtypes = [C.c_void_p, C.c_int, C.c_int,
                                         C.c_int]
        lib.dasasim_next_hop.restype = C.c_int
        lib.dasasim_next_hop.argtypes = [C.c_void_p, C.c_int, C.c_int,
                                         C.c_int]
        lib.dasasim_shortest_path.restype = C.c_int
        lib.dasasim_shortest_path.argtypes = [C.c_void_p, C.c_int, C.c_int,
                                              C.c_int, i32p, C.c_int]
        lib.dasasim_candidates.argtypes = [
            C.c_void_p, C.c_int, C.c_int, i32p, i32p, f32p, f32p, f32p,
            i32p]
        lib.dasasim_reset.argtypes = [C.c_void_p, C.c_int, i32p, i32p,
                                      i32p, i32p, f64p]
        lib.dasasim_step.argtypes = [C.c_void_p, C.c_int, i32p]
        lib.dasasim_teleport.argtypes = [C.c_void_p, C.c_int, C.c_int,
                                         C.c_int]
        lib.dasasim_get_state.argtypes = [C.c_void_p, C.c_int, i32p, i32p,
                                          i32p, i32p]
        lib.dasasim_fill_obs.argtypes = [
            C.c_void_p, C.c_int, C.c_int, i32p, i32p, f32p, f32p, i32p,
            i32p, f32p, f32p, i32p, i32p, i32p, f32p, f32p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load_library() is not None


class NativeEngine:
    """One engine instance: scan graphs + a batch of episodes."""

    def __init__(self, k_max: int = 16):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError("libdasasim.so unavailable")
        self.handle = C.c_void_p(self.lib.dasasim_create(k_max))
        self.k_max = k_max
        self._scan_handles: Dict[str, int] = {}
        self._batch = 0

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.dasasim_destroy(self.handle)
        except Exception:
            pass

    def load_scan(self, scan_id: str, connectivity_dir: str) -> int:
        if scan_id in self._scan_handles:
            return self._scan_handles[scan_id]
        path = os.path.join(connectivity_dir,
                            f"{scan_id}_connectivity.json")
        idx = self.lib.dasasim_load_scan(self.handle, path.encode())
        if idx < 0:
            raise RuntimeError(f"failed to load {path}")
        self._scan_handles[scan_id] = idx
        return idx

    def num_nodes(self, scan: int) -> int:
        return self.lib.dasasim_num_nodes(self.handle, scan)

    def node_index(self, scan: int, vid: str) -> int:
        return self.lib.dasasim_node_index(self.handle, scan, vid.encode())

    def node_id(self, scan: int, node: int) -> str:
        return self.lib.dasasim_node_id(self.handle, scan, node).decode()

    def set_feat_rows(self, scan: int, rows: np.ndarray) -> None:
        self.lib.dasasim_set_feat_rows(
            self.handle, scan, np.ascontiguousarray(rows, np.int32))

    def distance(self, scan: int, a: int, b: int) -> float:
        return self.lib.dasasim_distance(self.handle, scan, a, b)

    def next_hop(self, scan: int, a: int, b: int) -> int:
        return self.lib.dasasim_next_hop(self.handle, scan, a, b)

    def shortest_path(self, scan: int, a: int, b: int,
                      cap: int = 1024) -> np.ndarray:
        out = np.empty(cap, np.int32)
        n = self.lib.dasasim_shortest_path(self.handle, scan, a, b, out,
                                           cap)
        if n < 0:
            raise ValueError("no path")
        return out[:n]

    def candidates(self, scan: int, node: int):
        k = self.k_max
        nbr = np.empty(k, np.int32)
        point = np.empty(k, np.int32)
        nh = np.empty(k, np.float32)
        elev = np.empty(k, np.float32)
        rd = np.empty(k, np.float32)
        n = np.empty(1, np.int32)
        self.lib.dasasim_candidates(self.handle, scan, node, nbr, point,
                                    nh, elev, rd, n)
        m = int(n[0])
        return nbr[:m], point[:m], nh[:m], elev[:m], rd[:m]

    def reset(self, scans: np.ndarray, starts: np.ndarray,
              path0s: np.ndarray, goals: np.ndarray,
              headings: np.ndarray) -> None:
        self._batch = len(scans)
        self.lib.dasasim_reset(
            self.handle, self._batch,
            np.ascontiguousarray(scans, np.int32),
            np.ascontiguousarray(starts, np.int32),
            np.ascontiguousarray(path0s, np.int32),
            np.ascontiguousarray(goals, np.int32),
            np.ascontiguousarray(headings, np.float64))

    def step(self, actions: np.ndarray) -> None:
        self.lib.dasasim_step(self.handle, self._batch,
                              np.ascontiguousarray(actions, np.int32))

    def teleport(self, i: int, node: int, view: int) -> None:
        self.lib.dasasim_teleport(self.handle, i, node, view)

    def get_state(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
        b = self._batch
        scan = np.empty(b, np.int32)
        node = np.empty(b, np.int32)
        view = np.empty(b, np.int32)
        step = np.empty(b, np.int32)
        self.lib.dasasim_get_state(self.handle, b, scan, node, view, step)
        return scan, node, view, step

    def fill_obs(self, K: int) -> dict:
        b = self._batch
        out = {
            "feat_row": np.empty(b, np.int32),
            "view_index": np.empty(b, np.int32),
            "heading": np.empty(b, np.float32),
            "elevation": np.empty(b, np.float32),
            "cand_point_id": np.empty((b, K), np.int32),
            "cand_nbr_ix": np.empty((b, K), np.int32),
            "cand_heading": np.empty((b, K), np.float32),
            "cand_elevation": np.empty((b, K), np.float32),
            "cand_n": np.empty(b, np.int32),
            "teacher": np.empty(b, np.int32),
            "back_teacher": np.empty(b, np.int32),
            "distance": np.empty(b, np.float32),
            "progress": np.empty(b, np.float32),
        }
        self.lib.dasasim_fill_obs(
            self.handle, b, K, out["feat_row"], out["view_index"],
            out["heading"], out["elevation"],
            out["cand_point_id"].reshape(-1),
            out["cand_nbr_ix"].reshape(-1),
            out["cand_heading"].reshape(-1),
            out["cand_elevation"].reshape(-1), out["cand_n"],
            out["teacher"], out["back_teacher"], out["distance"],
            out["progress"])
        return out
