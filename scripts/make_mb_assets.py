#!/usr/bin/env python
"""Synthesize the 0002_mb-style motion-blur regression assets.

The reference's regression/0002_mb references geo/mb/*.geo that the
offline image lacks (datafiles tarball), so — like round 4 did for
0031_hete's smoke grid — the moving geometry is generated here with the
repo's own .geo writer (io/geo.py save_geo, which emits the reference
motion layout: primid bit 60 + stride-2 (t0, t1) vertex pairs,
include/prims.h:37-47) and fed to BOTH renderers:

    python scripts/make_mb_assets.py          # writes data/golden/scenes/...
    scripts/build_reference.sh /tmp/corona-ref 0002_mb
    # copy scene+geo into the build tree, render the golden (see
    # scripts/render_goldens.sh render() for the command shape)

Scene: the 0030 camera/emitter/plane stage with a diffuse cube sweeping
+y by 1.6 units over the shutter.
"""
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from corona13_tpu.io import geo as geo_io  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), '..', 'data', 'golden',
                    'scenes')


def cube_tris(center, half):
    c = np.asarray(center, np.float32)
    h = float(half)
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32) + c
    faces = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for a, b, cc, d in faces:
        tris.append([v[a], v[b], v[cc]])
        tris.append([v[a], v[cc], v[d]])
    return np.asarray(tris, np.float32)


def main():
    geo_dir = os.path.join(ROOT, 'geo')
    scn_dir = os.path.join(ROOT, '0002_mb')
    os.makedirs(scn_dir, exist_ok=True)

    t0 = cube_tris((0.0, -0.8, 1.0), 0.7)
    t1 = t0 + np.array([0.0, 1.6, 0.0], np.float32)
    geo_io.save_geo(os.path.join(geo_dir, 'mbcube.geo'), t0, tri_vtx_t1=t1)

    with open(os.path.join(scn_dir, 'test.nra2'), 'w') as f:
        f.write("""black
8
diffuse # 0
colorcheckersg d # 1
mult 1 1 0 # 2 plane
color d 0 0 0 # 3
color e 200 200 200 1. # 4
mult 2 3 4 0 # 5 light
color d 0.7 0.25 0.2 # 6
mult 1 6 0 # 7 cube
3
5 ../geo/emitter
2 ../geo/plane
7 ../geo/mbcube
""")
    shutil.copy(os.path.join(ROOT, '0030_subsurf', 'test01.cam'),
                os.path.join(scn_dir, 'test01.cam'))
    print('wrote', scn_dir, 'and', os.path.join(geo_dir, 'mbcube.geo'))


if __name__ == '__main__':
    main()
