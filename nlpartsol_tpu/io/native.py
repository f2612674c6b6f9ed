"""ctypes bindings for the C++ runtime library (native/nlps_native.cpp).

The reference's host-side runtime is C (GiD parser Read-GID-Mesh.c:49;
GramsBox topology build Read_GramsBox.c:57-150).  This module builds and
loads the C++ re-design lazily (g++; pybind11 is not in the image, so the
ABI is plain C consumed via ctypes).  Every entry point has a pure-Python
fallback in io/gid_mesh.py / io/builder.py — ``available()`` gates use.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "nlps_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libnlps_native.so")

_lib = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC)
    out = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return False
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    try:
        lib = C.CDLL(os.path.abspath(_LIB))
    except OSError:
        return None
    i64p = C.POINTER(C.c_int64)
    dp = C.POINTER(C.c_double)
    u8p = C.POINTER(C.c_uint8)
    lib.nlps_free.argtypes = [C.c_void_p]
    lib.nlps_read_gid_mesh.argtypes = [
        C.c_char_p, C.POINTER(C.c_int), C.POINTER(C.c_int),
        i64p, i64p, C.POINTER(dp), C.POINTER(i64p), C.c_char_p,
    ]
    lib.nlps_read_gid_mesh.restype = C.c_int
    lib.nlps_topology.argtypes = [
        C.c_int64, C.c_int64, C.c_int, C.c_int, i64p, dp,
        C.POINTER(i64p), C.POINTER(i64p), C.POINTER(i64p), C.POINTER(i64p),
        C.POINTER(u8p), dp,
    ]
    lib.nlps_topology.restype = C.c_int
    lib.nlps_ring_expand.argtypes = [
        C.c_int64, i64p, i64p, C.c_int, C.POINTER(i64p), C.POINTER(i64p)
    ]
    lib.nlps_ring_expand.restype = C.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _take_i64(lib, ptr, n) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(int(n),)).copy()
    lib.nlps_free(C.cast(ptr, C.c_void_p))
    return arr


def read_gid_mesh_native(path: str):
    """C++ GiD parser → (dim, elem_name, coords (n,dim) f64, conn (e,nnode) i64).
    Returns None if the native library is unavailable or parsing fails."""
    lib = _load()
    if lib is None:
        return None
    dim = C.c_int()
    nnode = C.c_int()
    n_nodes = C.c_int64()
    n_elems = C.c_int64()
    coords_p = C.POINTER(C.c_double)()
    conn_p = C.POINTER(C.c_int64)()
    name = C.create_string_buffer(32)
    rc = lib.nlps_read_gid_mesh(
        path.encode(), C.byref(dim), C.byref(nnode), C.byref(n_nodes),
        C.byref(n_elems), C.byref(coords_p), C.byref(conn_p), name,
    )
    if rc != 0:
        return None
    nn, ne, d, k = int(n_nodes.value), int(n_elems.value), dim.value, nnode.value
    coords = np.ctypeslib.as_array(coords_p, shape=(nn * d,)).copy().reshape(nn, d)
    lib.nlps_free(C.cast(coords_p, C.c_void_p))
    conn = _take_i64(lib, conn_p, ne * k).reshape(ne, k)
    return d, name.value.decode(), coords, conn


class Topology(NamedTuple):
    node_elem_off: np.ndarray  # (n_nodes+1,) CSR offsets
    node_elem_idx: np.ndarray  # node→element adjacency
    node_node_off: np.ndarray  # (n_nodes+1,) 1-ring CSR offsets
    node_node_idx: np.ndarray
    boundary: np.ndarray  # (n_nodes,) bool
    min_dx: float  # minimum edge length (DeltaX)


def mesh_topology(coords: np.ndarray, conn: np.ndarray, dim: int) -> Optional[Topology]:
    """Linear-time CSR topology build (replaces the reference's
    O(Nnodes·Nelems) get_sourrounding_elements scan).  None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    conn64 = np.ascontiguousarray(conn, dtype=np.int64)
    crd = np.ascontiguousarray(coords, dtype=np.float64)
    n_nodes, n_elems, nnode = coords.shape[0], conn.shape[0], conn.shape[1]
    i64p = C.POINTER(C.c_int64)
    ne_off = i64p(); ne_idx = i64p(); nn_off = i64p(); nn_idx = i64p()
    bnd = C.POINTER(C.c_uint8)()
    min_dx = C.c_double()
    rc = lib.nlps_topology(
        n_nodes, n_elems, nnode, dim,
        conn64.ctypes.data_as(i64p), crd.ctypes.data_as(C.POINTER(C.c_double)),
        C.byref(ne_off), C.byref(ne_idx), C.byref(nn_off), C.byref(nn_idx),
        C.byref(bnd), C.byref(min_dx),
    )
    if rc != 0:
        return None
    neo = _take_i64(lib, ne_off, n_nodes + 1)
    nei = _take_i64(lib, ne_idx, n_elems * nnode)
    nno = _take_i64(lib, nn_off, n_nodes + 1)
    nni = _take_i64(lib, nn_idx, nno[-1])
    b = np.ctypeslib.as_array(bnd, shape=(n_nodes,)).copy().astype(bool)
    lib.nlps_free(C.cast(bnd, C.c_void_p))
    return Topology(neo, nei, nno, nni, b, float(min_dx.value))


def ring_localities(top: Topology, rings: int = 2):
    """Ring-R nodal localities (fill_nodal_locality, Read_GramsBox.c:57-103).
    Returns (offsets, indices) CSR or None."""
    lib = _load()
    if lib is None:
        return None
    n_nodes = top.node_node_off.shape[0] - 1
    i64p = C.POINTER(C.c_int64)
    off = i64p(); idx = i64p()
    nno = np.ascontiguousarray(top.node_node_off)
    nni = np.ascontiguousarray(top.node_node_idx)
    rc = lib.nlps_ring_expand(
        n_nodes, nno.ctypes.data_as(i64p), nni.ctypes.data_as(i64p),
        rings, C.byref(off), C.byref(idx),
    )
    if rc != 0:
        return None
    offs = _take_i64(lib, off, n_nodes + 1)
    return offs, _take_i64(lib, idx, offs[-1])
