#!/usr/bin/env python
"""Write a 3-part articulated OBJ scan sequence for the real-domain driver
(body + revolute flap + prismatic slider — the round-2 TPU drive's scene,
now a repo script for reproducibility). Each frame is a watertight-ish
triangle soup; the real loader samples surfaces itself.

Usage: python scripts/make_real_scene.py [out_dir] [n_frames]
"""

import os
import sys

import numpy as np


def box(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                        [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                        [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                        [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
    faces = [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
             [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
             [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]]
    return corners, np.asarray(faces)


def rot_about(angle, center, axis="y"):
    c, s = np.cos(angle), np.sin(angle)
    if axis == "y":
        r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    else:
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    center = np.asarray(center, float)

    def apply(v):
        return (v - center) @ r.T + center
    return apply


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/real_scene"
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    os.makedirs(out, exist_ok=True)

    body_v, body_f = box([-0.5, -0.3, -0.25], [0.5, 0.3, 0.25])
    flap_v, flap_f = box([0.5, -0.25, 0.18], [1.05, 0.25, 0.26])
    slider_v, slider_f = box([-0.45, -0.28, -0.45], [0.35, 0.28, -0.27])

    for i in range(t):
        rot = rot_about(0.22 * i, [0.5, 0.0, 0.22])
        fl = rot(flap_v)
        sl = slider_v + np.array([0.12 * i, 0.0, 0.0])
        verts = np.concatenate([body_v, fl, sl])
        faces = np.concatenate([
            body_f, flap_f + len(body_v),
            slider_f + len(body_v) + len(flap_v)])
        lines = [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in verts]
        lines += [f"f {a + 1} {b + 1} {c + 1}" for a, b, c in faces]
        with open(os.path.join(out, f"scan_{i}.obj"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {t} OBJ frames to {out}", flush=True)


if __name__ == "__main__":
    main()
