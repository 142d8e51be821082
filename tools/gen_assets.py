"""Generate the config6 asset pack: a multi-material OBJ + MTL + PNGs.

The reference's flagship apps render LOADED scenes (SURVEY.md §2.1 "Sample
apps"; BASELINE.json:11 "Sponza-class"); this generates a ~120k-tri
courtyard — tiled ground, perimeter walls, a colonnade, crates and spheres —
with 4 materials and 3 map_Kd textures of DIFFERENT sizes (exercises the
resample-on-load path), written as standard Wavefront OBJ/MTL + PNG so the
full asset pipeline (parser -> MTL -> textures -> render) is exercised from
disk. Deterministic (seeded); ~7 MB on disk.

Usage: python tools/gen_assets.py [outdir]   (default assets/courtyard)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xr.core.image import write_png
from xr.scene import procedural as proc
from xr.scene import texture as tx
from xr.core import math3d as m3


def build_meshes():
    """Returns a list of (mesh, material_index) in world space."""
    rng = np.random.default_rng(20260816)
    out = []

    # ground: subdivided, gently displaced plane (lots of tris, texture 0)
    g = proc.grid_plane(160, 160, size=30.0, mat=0)
    pos = g.positions.copy()
    h = 0.08 * np.sin(pos[:, 0] * 1.7) * np.cos(pos[:, 2] * 1.3)
    pos[:, 1] += h.astype(np.float32)
    out.append(g.replace(positions=pos))

    # perimeter walls: boxes scaled, material 1 (brick texture)
    def box_at(cx, cy, cz, sx, sy, sz, mat, ry=0.0):
        b = proc.cube(1.0, mat=mat)
        s = np.diag([sx, sy, sz, 1.0]).astype(np.float32)
        mtx = m3.translation((cx, cy, cz), np) @ m3.rotation_y(ry, np) @ s
        return proc.transformed(b, mtx)

    for sgn in (-1.0, 1.0):
        out.append(box_at(sgn * 14.5, 1.6, 0.0, 0.5, 3.2, 29.0, 1))
        out.append(box_at(0.0, 1.6, sgn * 14.5, 29.0, 3.2, 0.5, 1))

    # colonnade: rings of columns (subdivided cylinders via icospheres
    # stacked -> use stretched icospheres for curvature), material 2
    for k in range(14):
        ang = k * (2 * np.pi / 14)
        cx, cz = 9.0 * np.cos(ang), 9.0 * np.sin(ang)
        col = proc.icosphere(3, 0.55, mat=2)
        s = np.diag([1.0, 4.5, 1.0, 1.0]).astype(np.float32)
        mtx = m3.translation((cx, 2.2, cz), np) @ s
        out.append(proc.transformed(col, mtx))
        cap = box_at(cx, 4.8, cz, 1.5, 0.25, 1.5, 2)
        out.append(cap)

    # crates + spheres scattered in the yard (materials 1..3)
    for i in range(40):
        x, z = rng.uniform(-12, 12, 2)
        if x * x + z * z < 4.0:
            continue
        if i % 2 == 0:
            out.append(
                box_at(x, 0.55, z, 1.1, 1.1, 1.1, 3, ry=float(rng.uniform(0, 3.14)))
            )
        else:
            sp = proc.icosphere(3, 0.65, mat=3)
            out.append(proc.transformed(sp, m3.translation((x, 0.7, z), np)))

    # central monument: big stretched icosphere, material 2
    mon = proc.icosphere(4, 1.6, mat=2)
    s = np.diag([1.0, 2.2, 1.0, 1.0]).astype(np.float32)
    out.append(proc.transformed(mon, m3.translation((0, 3.0, 0), np) @ s))
    return out


def write_obj(path, mesh, mtl_name, mat_names):
    """Write a Mesh as OBJ with per-face usemtl groups."""
    with open(path, "w") as f:
        f.write(f"# xr config6 courtyard (generated)\nmtllib {mtl_name}\n")
        for p in mesh.positions:
            f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for t in mesh.uvs:
            f.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
        for n in mesh.normals:
            f.write(f"vn {n[0]:.4f} {n[1]:.4f} {n[2]:.4f}\n")
        order = np.argsort(mesh.material_id, kind="stable")
        cur = -1
        for fi in order:
            m = int(mesh.material_id[fi])
            if m != cur:
                f.write(f"usemtl {mat_names[m]}\n")
                cur = m
            a, b, c = (int(v) + 1 for v in mesh.indices[fi])
            f.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")


def main(outdir="assets/courtyard"):
    os.makedirs(outdir, exist_ok=True)
    meshes = build_meshes()
    merged = proc.merge_meshes(meshes)
    print(f"tris: {merged.num_triangles}, verts: {merged.num_vertices}")

    # textures: three DIFFERENT sizes (512 pavement, 256 brick, 128 marble)
    pav = tx.checkerboard(512, 24, (0.82, 0.8, 0.76), (0.35, 0.33, 0.3))
    pav = np.clip(pav + 0.08 * (tx.noise_texture(512, seed=7) - 0.5), 0, 1)
    brick_base = tx.checkerboard(256, 16, (0.62, 0.28, 0.2), (0.55, 0.5, 0.45))
    brick = np.clip(brick_base * (0.7 + 0.6 * tx.noise_texture(256, seed=9)), 0, 1)
    marble = np.clip(
        0.75 + 0.5 * (tx.noise_texture(128, seed=3) - 0.5), 0, 1
    ) * np.asarray([0.9, 0.9, 0.95], np.float32)

    names = ["pavement.png", "brick.png", "marble.png"]
    for name, img in zip(names, (pav, brick, marble)):
        write_png(
            os.path.join(outdir, name),
            np.floor(np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8),
        )

    mat_names = ["pavement", "brick", "marble", "crate"]
    with open(os.path.join(outdir, "courtyard.mtl"), "w") as f:
        f.write(
            "newmtl pavement\nKd 1.0 1.0 1.0\nKs 0.05 0.05 0.05\nNs 16\n"
            "map_Kd pavement.png\n\n"
            "newmtl brick\nKd 1.0 0.95 0.9\nKs 0.0 0.0 0.0\nNs 8\n"
            "map_Kd brick.png\n\n"
            # marble clamps (map_Kd -clamp on) so the scene mixes texture
            # address modes — exercises the per-material tex_addr select in
            # shade_math.sample_trilinear on a loaded asset (VERDICT r4 #4b)
            "newmtl marble\nKd 0.95 0.95 1.0\nKs 0.35 0.35 0.35\nNs 64\n"
            "map_Kd -clamp on marble.png\n\n"
            "newmtl crate\nKd 0.85 0.6 0.3\nKs 0.15 0.15 0.15\nNs 24\n"
        )
    write_obj(
        os.path.join(outdir, "courtyard.obj"), merged, "courtyard.mtl", mat_names
    )
    print("wrote", outdir)


if __name__ == "__main__":
    main(*sys.argv[1:])
