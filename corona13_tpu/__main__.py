"""Command-line front-end — the analogue of the reference's ``corona``
binary (corona-13 src/main.c: scene file + flags, progressive render,
PFM output + sidecar):

    python -m corona13_tpu scene.nra2 -s 64 -w 1024 -h 576 -x render
    python -m corona13_tpu scene.nra2 --sampler lt --retain-framebuffer

Writes <output>_fb00.pfm (camera XYZ like the reference's default
COL_camera=xyz), a sidecar .txt, and a resumable .fb checkpoint.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        prog='corona13_tpu', add_help=False,
        description='TPU-native spectral path tracer (corona-13 parity)')
    p.add_argument('--help', action='help')
    p.add_argument('scene', help='.nra2 scene file')
    p.add_argument('-s', '--spp', type=int, default=16,
                   help='progressions (samples per pixel)')
    p.add_argument('-w', '--width', type=int, default=1024)
    p.add_argument('-h', '--height', type=int, default=576)
    p.add_argument('-x', '--output', default='render',
                   help='output basename')
    p.add_argument('-c', '--cam', default=None, help='.cam camera file')
    p.add_argument('--sampler', default='ptdl',
                   choices=['pt', 'ptdl', 'lt', 'ptlt', 'bdpt', 'bdpt1',
                            'kmlt', 'vmlt', 'ppm', 'vis'])
    p.add_argument('--aov', default='normals',
                   choices=['normals', 'depth', 'prim', 'shader', 'uv'],
                   help='AOV kind for --sampler vis')
    p.add_argument('--max-verts', type=int, default=8)
    p.add_argument('--mf', type=int, default=4,
                   help='hero wavelengths per path')
    p.add_argument('--batch', type=int, default=0,
                   help='progressions per device launch (0 = auto)')
    p.add_argument('--media', action='store_true',
                   help='enable participating media')
    p.add_argument('--equiangular', action='store_true',
                   help='equiangular distance sampling for volume NEE '
                        '(homogeneous media; include/pathspace/equiangular.h)')
    p.add_argument('--pointsampler', default='rand',
                   choices=['rand', 'halton'])
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--retain-framebuffer', action='store_true',
                   help='resume accumulation from an existing .fb')
    p.add_argument('--dbor', action='store_true',
                   help='density-based outlier rejection: splat pt/ptdl '
                        'through the log2 luminance cascade and write the '
                        'trust-merged image plus the per-level buffers '
                        '(reference --dbor, view.c:497-522 + '
                        'tools/img/dbor.c)')
    args = p.parse_args(argv)

    from . import render as render_mod
    from . import scene as scene_mod
    from .io import fb as fb_io
    from .io import pfm as pfm_io
    from .samplers import pt as pt_mod

    # the reference 32-aligns view dims and refits the film back to the
    # pixel aspect on every camera load (view.c:295-297, 938-947)
    args.width = scene_mod.align32(args.width)
    args.height = scene_mod.align32(args.height)

    t0 = time.time()
    scene, cd = scene_mod.load_scene(args.scene, args.cam)
    scene = scene_mod.fit_film(scene, args.width, args.height)
    print(f'[corona13_tpu] scene loaded in {time.time() - t0:.1f}s: '
          f'{scene.geom.n_tris} tris, {scene.geom.n_spheres} spheres, '
          f'{scene.geom.n_lines} lines, {scene.lights.n_lights} lights')

    cfg = pt_mod.PTConfig(
        width=args.width, height=args.height, max_verts=args.max_verts,
        mf=args.mf, use_nee=(args.sampler != 'pt'),
        pointsampler=args.pointsampler, seed=args.seed, media=args.media,
        equiangular=args.equiangular)

    if args.sampler == 'vis':
        from .samplers import vis as vis_mod
        import jax.numpy as jnp
        img = np.asarray(vis_mod.render_aov(scene, cfg, jnp.uint32(0),
                                            kind=args.aov))
        pfm_io.write_pfm(args.output + '_fb00.pfm', img)
        print(f'[corona13_tpu] wrote {args.output}_fb00.pfm ({args.aov})')
        return 0

    fbf = fb_io.Framebuffer.open(args.output + '.fb', args.width,
                                 args.height,
                                 retain=args.retain_framebuffer)
    if fbf.spp:
        print(f'[corona13_tpu] resuming at {fbf.spp} spp from '
              f'{args.output}.fb')

    import jax.numpy as jnp
    if args.dbor and args.sampler in ('pt', 'ptdl'):
        # the ptdl_dbor technique (reference src/sampler.d/ptdl_dbor.c):
        # per-progression samples land in the log2-luminance cascade;
        # the written image is the trust-merged reassembly
        import jax
        from .ops import splat as splat_mod
        from .samplers import pt as pt_mod2
        from .spectral import cie
        n = cfg.width * cfg.height
        pixels = jnp.arange(n, dtype=jnp.uint32)

        @jax.jit
        def dstep(s, fbs):
            accum, lam, pi, pj = pt_mod.sample_paths(scene, cfg, s, pixels)
            accum = jnp.where(jnp.isfinite(accum), accum, 0.0)
            xyz = cie.spectral_to_xyz(lam, accum)
            return splat_mod.splat_dbor(fbs, pi, pj, xyz)

        fbs = jnp.zeros((splat_mod.N_DBOR, args.height, args.width, 3))
        t0 = time.time()
        for s in range(fbf.spp, fbf.spp + args.spp):
            fbs = dstep(jnp.uint32(s), fbs)
            print(f'  [{s + 1 - fbf.spp}/{args.spp}] '
                  f'{(time.time() - t0) / (s + 1 - fbf.spp):.3f}s/frame')
        merged = np.asarray(splat_mod.dbor_merge(fbs, spp=args.spp))
        for k in range(splat_mod.N_DBOR):
            pfm_io.write_pfm(f'{args.output}_dbor{k:02d}.pfm',
                             np.asarray(fbs[k]))
        fbf.accumulate(merged, args.spp)
    elif args.sampler in ('pt', 'ptdl'):
        res = render_mod.render(scene, cfg, spp=args.spp, batch=args.batch,
                                progress=True, path_hist=True)
        fbf.accumulate(res.fb, res.spp)
    elif args.sampler == 'lt':
        from .samplers import lt as lt_mod
        import jax
        step = jax.jit(lambda s: lt_mod.render_sample(scene, cfg, s))
        t0 = time.time()
        acc = None
        for s in range(fbf.spp, fbf.spp + args.spp):
            out = step(jnp.uint32(s))
            acc = out if acc is None else acc + out
            print(f'  [{s + 1 - fbf.spp}/{args.spp}] '
                  f'{(time.time() - t0) / (s + 1 - fbf.spp):.3f}s/frame')
        fbf.accumulate(np.asarray(acc), args.spp)
    elif args.sampler in ('bdpt', 'ptlt'):
        import jax
        if args.sampler == 'bdpt':
            from .samplers import bdpt as mod
            step = jax.jit(lambda s: mod.render_sample(scene, cfg, s))
        else:
            from .samplers import ptlt as mod
            step = jax.jit(lambda s: mod.render_sample(scene, cfg, s))
        t0 = time.time()
        acc = None
        for s in range(fbf.spp, fbf.spp + args.spp):
            out = step(jnp.uint32(s))
            acc = out if acc is None else acc + out
            print(f'  [{s + 1 - fbf.spp}/{args.spp}] '
                  f'{(time.time() - t0) / (s + 1 - fbf.spp):.3f}s/frame')
        fbf.accumulate(np.asarray(acc), args.spp)
    elif args.sampler == 'bdpt1':
        from .samplers import bdpt1 as bdpt1_mod
        table = bdpt1_mod.ConfigTable.create(cfg)
        acc = None
        t0 = time.time()
        for s in range(fbf.spp, fbf.spp + args.spp):
            out, table = bdpt1_mod.render_sample(scene, cfg, s, table)
            acc = np.asarray(out) if acc is None else acc + np.asarray(out)
            print(f'  [{s + 1 - fbf.spp}/{args.spp}] '
                  f'{(time.time() - t0) / (s + 1 - fbf.spp):.3f}s/frame')
        fbf.accumulate(acc, args.spp)
    elif args.sampler == 'ppm':
        from .samplers import ppm as ppm_mod
        import jax
        step = jax.jit(lambda s: ppm_mod.render_sample(scene, cfg, s))
        acc = None
        t0 = time.time()
        for s in range(fbf.spp, fbf.spp + args.spp):
            out = step(jnp.uint32(s))
            acc = out if acc is None else acc + out
            print(f'  [{s + 1 - fbf.spp}/{args.spp}] '
                  f'{(time.time() - t0) / (s + 1 - fbf.spp):.3f}s/frame')
        fbf.accumulate(np.asarray(acc), args.spp)
    elif args.sampler in ('kmlt', 'vmlt'):
        if args.sampler == 'kmlt':
            from .samplers import kmlt as kmlt_mod
        else:
            from .samplers import vmlt as kmlt_mod
        import jax
        step = jax.jit(lambda s: kmlt_mod.render_sample(scene, cfg, s))
        acc = None
        for s in range(fbf.spp, fbf.spp + args.spp):
            out = step(jnp.uint32(s))
            acc = out if acc is None else acc + out
        fbf.accumulate(np.asarray(acc), args.spp)

    fbf.flush(iso=float(scene.camera.iso))
    img = fbf.image
    pfm_io.write_pfm(args.output + '_fb00.pfm', img)
    with open(args.output + '.txt', 'w') as f:
        f.write('corona13_tpu render\n')
        f.write(f'scene    : {args.scene}\n')
        f.write(f'sampler  : {args.sampler}\n')
        f.write(f'spp      : {fbf.spp}\n')
        f.write(f'size     : {args.width}x{args.height}\n')
        f.write(f'mean     : {float(img.mean()):.6f}\n')
    print(f'[corona13_tpu] wrote {args.output}_fb00.pfm '
          f'({fbf.spp} spp total)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
