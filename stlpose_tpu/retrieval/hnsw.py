"""
ctypes binding for the native HNSW index (stlpose_tpu/native/hnsw.cpp) with
a numpy exact-search fallback.

API mirrors the hnswlib surface the reference uses
(reference: 06_fit_knn_tree.py:150-166, lib/pose_database.py:142-146):
``Index(space, dim)``, ``init_index``, ``set_ef``, ``add_items``,
``knn_query``, ``save_index``, ``load_index``. The shared library builds on
first use (``make -C stlpose_tpu/native``); without a compiler the exact
numpy backend serves the same contract (slower at scale, identical results
for the DB sizes the retrieval subsystem sees).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_NATIVE_DIR, "..", "native", "libstlpose_hnsw.so")
_LIB = None
_SPACES = {"l2": 0, "cosine": 1}


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(_SO_PATH)
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.dirname(so)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.hnsw_create.restype = ctypes.c_void_p
    lib.hnsw_create.argtypes = [ctypes.c_int] * 5
    lib.hnsw_free.argtypes = [ctypes.c_void_p]
    lib.hnsw_set_ef.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hnsw_size.argtypes = [ctypes.c_void_p]
    lib.hnsw_size.restype = ctypes.c_int
    lib.hnsw_add_items.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.hnsw_knn_query.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.hnsw_save.restype = ctypes.c_int
    lib.hnsw_load.argtypes = [ctypes.c_char_p]
    lib.hnsw_load.restype = ctypes.c_void_p
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class Index:
    """HNSW index over float32 vectors (hnswlib-compatible surface)."""

    def __init__(self, space: str = "l2", dim: int = 0):
        assert space in _SPACES, f"space must be one of {list(_SPACES)}"
        self.space = space
        self.dim = dim
        self._lib = _load_lib()
        self._handle = None
        self._ef = 10
        # numpy fallback state
        self._np_data = None
        self._np_labels = None

    # ----------------------------------------------------------- lifecycle
    def init_index(self, max_elements: int, ef_construction: int = 200,
                   M: int = 16):
        if self._lib is not None:
            self._handle = self._lib.hnsw_create(
                _SPACES[self.space], self.dim, max_elements, M,
                ef_construction)
        else:
            self._np_data = np.zeros((0, self.dim), np.float32)
            self._np_labels = np.zeros((0,), np.int32)

    def set_ef(self, ef: int):
        self._ef = ef
        if self._handle is not None:
            self._lib.hnsw_set_ef(self._handle, ef)

    def get_current_count(self) -> int:
        if self._handle is not None:
            return self._lib.hnsw_size(self._handle)
        return 0 if self._np_data is None else len(self._np_data)

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib:
            self._lib.hnsw_free(self._handle)
            self._handle = None

    # ------------------------------------------------------------- inserts
    def add_items(self, data, labels=None):
        data = np.ascontiguousarray(np.asarray(data, np.float32))
        if data.ndim == 1:
            data = data[None, :]
        n = len(data)
        if labels is None:
            labels = np.arange(self.get_current_count(),
                               self.get_current_count() + n)
        labels = np.ascontiguousarray(np.asarray(labels, np.int32))
        if self._handle is not None:
            self._lib.hnsw_add_items(
                self._handle,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)
        else:
            self._np_data = np.concatenate([self._np_data, data])
            self._np_labels = np.concatenate([self._np_labels, labels])

    # -------------------------------------------------------------- search
    def knn_query(self, queries, k: int = 1):
        queries = np.ascontiguousarray(np.asarray(queries, np.float32))
        if queries.ndim == 1:
            queries = queries[None, :]
        nq = len(queries)
        if self._handle is not None:
            ids = np.zeros((nq, k), np.int32)
            dists = np.zeros((nq, k), np.float32)
            self._lib.hnsw_knn_query(
                self._handle,
                queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                nq, k,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            return ids.astype(np.int64), dists
        # exact numpy search
        if self.space == "l2":
            d = ((queries[:, None, :] - self._np_data[None]) ** 2).sum(-1)
        else:
            qn = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
            dn = self._np_data / np.maximum(
                np.linalg.norm(self._np_data, axis=1, keepdims=True), 1e-30)
            d = 1.0 - qn @ dn.T
        order = np.argsort(d, axis=1)[:, :k]
        dists = np.take_along_axis(d, order, axis=1).astype(np.float32)
        ids = self._np_labels[order].astype(np.int64)
        return ids, dists

    # ----------------------------------------------------------------- io
    def save_index(self, path: str):
        if self._handle is not None:
            rc = self._lib.hnsw_save(self._handle, path.encode())
            if rc != 0:
                raise IOError(f"failed to save index to {path}")
        else:
            np.savez(path, data=self._np_data, labels=self._np_labels,
                     space=self.space)

    def load_index(self, path: str, max_elements: int = 0):
        if self._lib is not None and not path.endswith(".npz"):
            self._handle = self._lib.hnsw_load(path.encode())
            if not self._handle:
                raise IOError(f"failed to load index from {path}")
        else:
            p = path if path.endswith(".npz") else path + ".npz"
            blob = np.load(p, allow_pickle=False)
            self._np_data = blob["data"]
            self._np_labels = blob["labels"]
