"""Minimal mesh IO + surface sampling (no trimesh dependency).

The reference's real-scan path loads .glb/.obj meshes with trimesh and
samples 4096 surface points per frame (dataset/dataset_real.py:29-55).
trimesh is not in this image, so we parse the two formats the reference data
uses directly:

  * GLB (binary glTF 2.0): JSON chunk + BIN chunk; we read the first mesh
    primitive's POSITION accessor and indices.
  * OBJ: `v`/`f` lines (polygon faces fan-triangulated).

If trimesh IS importable it is used as the loader (broader format support);
sampling is always our numpy implementation for determinism.
"""

from __future__ import annotations

import json
import struct

import numpy as np

_GLTF_CTYPES = {5120: "b", 5121: "B", 5122: "h", 5123: "H", 5125: "I", 5126: "f"}
_GLTF_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def load_glb(path: str):
    """Returns (vertices (V, 3) float64, faces (F, 3) int64) of the first
    triangle primitive in a .glb file."""
    with open(path, "rb") as f:
        magic, _version, _length = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67, "not a GLB file"
        chunks = {}
        while True:
            head = f.read(8)
            if len(head) < 8:
                break
            clen, ctype = struct.unpack("<II", head)
            chunks[ctype] = f.read(clen)
    gltf = json.loads(chunks[0x4E4F534A].decode("utf-8"))
    binbuf = chunks.get(0x004E4942, b"")

    def read_accessor(idx):
        acc = gltf["accessors"][idx]
        view = gltf["bufferViews"][acc["bufferView"]]
        offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        n = acc["count"]
        ncomp = _GLTF_NCOMP[acc["type"]]
        fmt = _GLTF_CTYPES[acc["componentType"]]
        itemsize = struct.calcsize(fmt)
        stride = view.get("byteStride") or ncomp * itemsize
        out = np.empty((n, ncomp), dtype=np.float64 if fmt == "f" else np.int64)
        for i in range(n):
            base = offset + i * stride
            vals = struct.unpack_from(f"<{ncomp}{fmt}", binbuf, base)
            out[i] = vals
        return out

    mesh = gltf["meshes"][0]
    prim = mesh["primitives"][0]
    verts = read_accessor(prim["attributes"]["POSITION"]).astype(np.float64)
    if "indices" in prim:
        faces = read_accessor(prim["indices"]).reshape(-1, 3).astype(np.int64)
    else:
        faces = np.arange(len(verts), dtype=np.int64).reshape(-1, 3)
    # apply the node transform chain of the first node referencing this mesh
    node_mat = _find_node_transform(gltf, 0)
    if node_mat is not None:
        verts = verts @ node_mat[:3, :3].T + node_mat[:3, 3]
    return verts, faces


def _find_node_transform(gltf, mesh_idx):
    for node in gltf.get("nodes", []):
        if node.get("mesh") == mesh_idx:
            if "matrix" in node:
                return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
            m = np.eye(4)
            if "scale" in node:
                m[:3, :3] *= np.asarray(node["scale"])
            if "rotation" in node:
                x, y, z, w = node["rotation"]
                r = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
                ])
                m[:3, :3] = r @ m[:3, :3]
            if "translation" in node:
                m[:3, 3] = node["translation"]
            return m
    return None


def load_obj(path: str):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def load_mesh(path: str):
    """(vertices, faces) from .glb/.gltf/.obj; uses trimesh when available."""
    try:
        import trimesh

        obj = trimesh.load_mesh(path)
        if hasattr(obj, "geometry"):  # scene
            obj = list(obj.geometry.values())[0]
        return np.asarray(obj.vertices, np.float64), np.asarray(obj.faces, np.int64)
    except ImportError:
        pass
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "glb":
        return load_glb(path)
    if ext == "obj":
        return load_obj(path)
    raise ValueError(f"unsupported mesh format without trimesh: .{ext}")


def sample_surface(verts: np.ndarray, faces: np.ndarray, count: int,
                   rng: np.random.RandomState | None = None) -> np.ndarray:
    """Area-weighted uniform surface sampling (trimesh.sample.sample_surface
    equivalent): choose triangles ~ area, then uniform barycentric points."""
    if rng is None:
        rng = np.random.RandomState(0)
    tri = verts[faces]  # (F, 3, 3)
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    probs = area / area.sum()
    choice = rng.choice(len(faces), size=count, p=probs)
    r1 = np.sqrt(rng.uniform(size=(count, 1)))
    r2 = rng.uniform(size=(count, 1))
    a, b, c = tri[choice, 0], tri[choice, 1], tri[choice, 2]
    return (1 - r1) * a + r1 * (1 - r2) * b + r1 * r2 * c
