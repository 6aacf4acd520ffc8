import numpy as np, jax, jax.numpy as jnp, os, sys
sys.argv = ['x']
import importlib
import _proto_cull as P
from corona13_tpu import scene as scene_mod
from corona13_tpu.ops.trace import intersect

sc, _ = scene_mod.load_scene('/root/reference/regression/0010_pt/test.nra2')
sc = scene_mod.fit_film(sc, 1024, 576)
tri_v = np.stack([np.asarray(sc.geom.tri_v0),
                  np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e1),
                  np.asarray(sc.geom.tri_v0) + np.asarray(sc.geom.tri_e2)], axis=1)
boxes, prims = P.build_clusters(tri_v, P.G)
C = len(boxes)
boxes8 = jnp.asarray(np.concatenate([boxes, np.zeros((C,2),np.float32)],axis=1))
tris = jnp.asarray(P.pack_tri_data(tri_v, prims))
prims_d = jnp.asarray(prims.astype(np.int32))

from bench.traversal import make_rays
(org, d, borg, bdir, bt, bprim, st, sdir), n = make_rays(sc)

hit = intersect(sc.geom, borg, bdir, ignore_prim=bprim, t_max=bt)
t2, prim2, u2, v2 = P.traverse(boxes8, tris, prims_d, borg, bdir, bt, bprim)
rp, mp = np.asarray(hit.prim), np.asarray(prim2)
rt, mt = np.asarray(hit.t), np.asarray(t2)
both = (rp>=0)&(mp>=0)
print('ref hit, mine miss:', ((rp>=0)&(mp<0)).sum())
print('mine hit, ref miss:', ((mp>=0)&(rp<0)).sum())
print('both hit, diff prim:', (both&(rp!=mp)).sum())
same=both&(rp==mp)
print('both same prim, max t err:', np.abs(rt[same]-mt[same]).max())
dd = both&(rp!=mp)
print('diff prim t close (<1e-3):', (np.abs(rt[dd]-mt[dd])<1e-3).sum(), '/', dd.sum())
# check misses: are the missing hits in clusters at all?
miss = (rp>=0)&(mp<0)
idx = np.nonzero(miss)[0][:5]
print('sample missing prims:', rp[idx], 'ts:', rt[idx])
# which cluster contains each missing prim
pr2cl = {}
for c in range(C):
    for p in prims[c]:
        if p>=0: pr2cl[int(p)] = c
for i in idx:
    c = pr2cl[int(rp[i])]
    o = np.asarray(borg[i]); w = np.asarray(bdir[i])
    b = boxes[c]
    t0 = (b[:3]-o)/np.where(np.abs(w)<1e-20,1e-20,w); t1=(b[3:]-o)/np.where(np.abs(w)<1e-20,1e-20,w)
    tn = max(np.minimum(t0,t1).max(),0); tf = np.maximum(t0,t1).min()
    print(f'ray {i}: prim {rp[i]} in cluster {c}, slab tn={tn:.4f} tf={tf:.4f} hit_t={rt[i]:.4f} tmax={np.asarray(bt[i]):.3e}')
