"""Binary file I/O, byte-compatible with the reference formats.

Formats (all little-endian):
  * vector ``.bin`` / ``.fbin`` / ``.u8bin`` / ``.i8bin``:
    ``[uint32 n][uint32 d]`` + row-major data
    (point_range.h:74-117 reader; docs/data_tools.md)
  * graph: ``[uint32 n][uint32 maxDeg]`` + ``uint32 degrees[n]`` +
    concatenated edge ids (graph.h:147-232)
  * ground truth ``ibin``: ``[uint32 n][uint32 k]`` + ``uint32 ids[n*k]`` +
    ``float32 dists[n*k]`` (types.h:48-97, compute_groundtruth.cpp:63-101)
  * range ground truth: ``[uint32 n][uint32 total]`` +
    ``uint32 sizes[n]`` + flat ``uint32 ids[total]`` (types.h:110-141)
  * ``.fvecs``/``.bvecs``/``.ivecs``: per row ``[int32 d]`` + d elements
    (vec_to_bin.cpp:10-36)

All functions use numpy on the host; device upload happens in
``PointSet``/``GraphIndexData``.
"""

from __future__ import annotations

import os

import numpy as np

_VEC_DTYPES = {
    "float": np.float32,
    "uint8": np.uint8,
    "int8": np.int8,
    "uint16": np.uint16,
}


def write_bin(path: str, data: np.ndarray) -> None:
    """Write an (n, d) array in big-ann ``.bin`` format."""
    data = np.ascontiguousarray(data)
    assert data.ndim == 2
    with open(path, "wb") as f:
        np.array(data.shape, dtype=np.uint32).tofile(f)
        data.tofile(f)


def read_bin(path: str, dtype=np.float32) -> np.ndarray:
    """Read a big-ann ``.bin`` file into an (n, d) array."""
    with open(path, "rb") as f:
        n, d = np.fromfile(f, dtype=np.uint32, count=2)
        data = np.fromfile(f, dtype=dtype, count=int(n) * int(d))
    return data.reshape(int(n), int(d))


def infer_bin_dtype(path: str) -> np.dtype:
    """Infer element dtype of a .bin file from its size and extension."""
    base = path.lower()
    if base.endswith((".u8bin", ".bvecs")):
        return np.dtype(np.uint8)
    if base.endswith(".i8bin"):
        return np.dtype(np.int8)
    if base.endswith((".fbin", ".fvecs")):
        return np.dtype(np.float32)
    with open(path, "rb") as f:
        n, d = np.fromfile(f, dtype=np.uint32, count=2)
    payload = os.path.getsize(path) - 8
    itemsize = payload // (int(n) * int(d)) if n and d else 4
    return np.dtype({1: np.uint8, 2: np.uint16, 4: np.float32}.get(itemsize, np.float32))


def read_vecs(path: str) -> np.ndarray:
    """Read .fvecs/.bvecs/.ivecs (per-row ``[int32 d] + d elems``).

    Reference: data_tools/vec_to_bin.cpp:10-36.
    """
    if path.endswith(".fvecs"):
        elem, esize = np.float32, 4
    elif path.endswith(".ivecs"):
        elem, esize = np.int32, 4
    elif path.endswith(".bvecs"):
        elem, esize = np.uint8, 1
    else:
        raise ValueError(f"unknown vecs extension: {path}")
    raw = np.fromfile(path, dtype=np.uint8)
    d = int(np.frombuffer(raw[:4], dtype=np.int32)[0])
    row_bytes = 4 + d * esize
    n = raw.size // row_bytes
    rows = raw[: n * row_bytes].reshape(n, row_bytes)
    return np.ascontiguousarray(rows[:, 4:]).view(elem).reshape(n, d)


def vecs_to_bin(in_path: str, out_path: str) -> None:
    write_bin(out_path, read_vecs(in_path))


def write_graph(path: str, neighbors: np.ndarray, degrees: np.ndarray) -> None:
    """Write graph in the reference's binary format (graph.h:206-232).

    ``neighbors``: (n, maxDeg) int32/uint32 padded adjacency;
    ``degrees``: (n,) valid counts per row.
    """
    n, max_deg = neighbors.shape
    degrees = degrees.astype(np.uint32)
    with open(path, "wb") as f:
        np.array([n, max_deg], dtype=np.uint32).tofile(f)
        degrees.tofile(f)
        # flatten ragged rows in 1M-row blocks to bound host memory
        block = 1_000_000
        nbrs = neighbors.astype(np.uint32)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            blk = nbrs[lo:hi]
            deg = degrees[lo:hi].astype(np.int64)
            mask = np.arange(max_deg)[None, :] < deg[:, None]
            blk[mask].tofile(f)


def read_graph(path: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Read the reference graph format → (neighbors (n,maxDeg) int32,
    degrees (n,) int32, maxDeg). Reference: graph.h:147-204."""
    with open(path, "rb") as f:
        n, max_deg = (int(x) for x in np.fromfile(f, dtype=np.uint32, count=2))
        degrees = np.fromfile(f, dtype=np.uint32, count=n).astype(np.int64)
        total = int(degrees.sum())
        edges = np.fromfile(f, dtype=np.uint32, count=total)
    neighbors = np.zeros((n, max_deg), dtype=np.uint32)
    offsets = np.concatenate([[0], np.cumsum(degrees)])
    mask = np.arange(max_deg)[None, :] < degrees[:, None]
    neighbors[mask] = edges
    return neighbors.astype(np.int32), degrees.astype(np.int32), max_deg


def write_ibin(path: str, ids: np.ndarray, dists: np.ndarray) -> None:
    """Ground-truth ibin writer (compute_groundtruth.cpp:63-101)."""
    n, k = ids.shape
    with open(path, "wb") as f:
        np.array([n, k], dtype=np.uint32).tofile(f)
        ids.astype(np.uint32).tofile(f)
        dists.astype(np.float32).tofile(f)


def read_ibin(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Ground-truth ibin reader → (ids (n,k) int32, dists (n,k) f32).
    Reference: types.h:48-73."""
    with open(path, "rb") as f:
        n, k = (int(x) for x in np.fromfile(f, dtype=np.uint32, count=2))
        ids = np.fromfile(f, dtype=np.uint32, count=n * k).reshape(n, k)
        dists = np.fromfile(f, dtype=np.float32, count=n * k).reshape(n, k)
    return ids.astype(np.int32), dists


def write_range_ibin(path: str, ids_per_query: list[np.ndarray]) -> None:
    """Range ground truth: [n, total] + sizes + flat ids (types.h:110-141,
    compute_range_groundtruth.cpp, docs/data_tools.md:53)."""
    sizes = np.array([len(x) for x in ids_per_query], dtype=np.uint32)
    flat = (
        np.concatenate([np.asarray(x, dtype=np.uint32) for x in ids_per_query])
        if len(ids_per_query)
        else np.zeros(0, np.uint32)
    )
    with open(path, "wb") as f:
        np.array([len(ids_per_query), flat.size], dtype=np.uint32).tofile(f)
        sizes.tofile(f)
        flat.tofile(f)


def read_range_ibin(path: str) -> list[np.ndarray]:
    with open(path, "rb") as f:
        n, total = (int(x) for x in np.fromfile(f, dtype=np.uint32, count=2))
        sizes = np.fromfile(f, dtype=np.uint32, count=n).astype(np.int64)
        flat = np.fromfile(f, dtype=np.uint32, count=total)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    return [flat[offsets[i] : offsets[i + 1]].astype(np.int32) for i in range(n)]


# diskannpy-style aliases (python/_files.py:63-95)
def vectors_to_file(vector_file: str, vectors) -> None:
    write_bin(vector_file, np.asarray(vectors))


def vectors_from_file(vector_file: str, dtype=None):
    return read_bin(vector_file, dtype if dtype is not None else infer_bin_dtype(vector_file))


def read_hdf5(path: str, dataset: str = "train") -> np.ndarray:
    """Read a 2-D dataset from an HDF5 file (h5_ops.hpp:14-63, the
    reference's optional SUPPORT_HDF5 point loader; ann-benchmarks files
    use datasets "train"/"test"). Requires h5py."""
    try:
        import h5py
    except ImportError as e:  # pragma: no cover - h5py is baked in here
        raise ImportError("HDF5 support requires h5py") from e
    with h5py.File(path, "r") as f:
        if dataset not in f:
            raise KeyError(
                f"dataset {dataset!r} not in {path} (has {list(f.keys())})"
            )
        arr = np.asarray(f[dataset])
    if arr.ndim != 2:
        raise ValueError(f"{path}:{dataset} is {arr.ndim}-D, expected 2-D")
    return arr


def write_hdf5(path: str, data: np.ndarray, dataset: str = "train") -> None:
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset(dataset, data=np.ascontiguousarray(data))
