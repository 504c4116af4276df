"""Minimal OBJ reader for subdivision control cages.

The corpus stores subdiv control meshes as small OBJs
(scenes/*/subdivs/*.obj, written by Yocto/GL); only positions and face
topology matter for Catmull-Clark — normals are recomputed after
tessellation and the corpus cages carry no meaningful texcoords.
Faces may be tris or quads (n-gons up to 4); tris are kept as 3-gons
(nsides array), NOT fan-triangulated, because Catmull-Clark subdivides
an n-gon into n quads around its face point.
"""

from __future__ import annotations

import numpy as np


def load_obj_cage(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (positions f32 [V,3], faces i32 [F,4] (slot 3 repeats slot 2
    for tris), nsides i32 [F] in {3,4})."""
    pos: list[list[float]] = []
    faces: list[list[int]] = []
    nsides: list[int] = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                pos.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                # OBJ is 1-based; negative indices are relative to the
                # positions read SO FAR (resolved here, not left to wrap
                # through numpy fancy-indexing as garbage)
                raw = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(pos) + i for i in raw]
                if any(i < 0 for i in idx):
                    raise ValueError(f"{path}: face index out of range")
                if len(idx) < 3 or len(idx) > 4:
                    raise ValueError(
                        f"{path}: only tri/quad faces supported, got "
                        f"{len(idx)}-gon"
                    )
                nsides.append(len(idx))
                if len(idx) == 3:
                    idx = idx + [idx[2]]
                faces.append(idx)
    return (
        np.asarray(pos, np.float32),
        np.asarray(faces, np.int32).reshape(-1, 4),
        np.asarray(nsides, np.int32),
    )
