"""On-chip A/B: the round-5 cluster kernels (multi / gmulti / gagg) vs
the sum of their single-call equivalents, at SevenNet-0 interior-block
shapes.  Fetch-forced scan timing per PROFILE.md.
"""

import json
import os
import sys
import time

import numpy as np

N_IT = 50


def main():
    sys.path.insert(0, '/root/repo')
    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from sevennet_finetuning_tpu.irreps import Irreps
    from sevennet_finetuning_tpu.ops.fused_conv import layout_from_spec
    from sevennet_finetuning_tpu.ops import fused_conv_agg as fca
    from sevennet_finetuning_tpu.ops import fused_conv_multi as fcm
    from sevennet_finetuning_tpu.ops.tensor_product import uvu_tp_spec

    spec = uvu_tp_spec(
        Irreps('128x0e+64x1e+32x2e'),
        Irreps('1x0e+1x1e+1x2e'),
        Irreps('128x0e+128x1e+128x2e'),
    )
    layout = layout_from_spec(spec)
    E, N = 21504, 776
    rng = np.random.default_rng(0)
    ybar = jnp.asarray(rng.standard_normal((N, layout.dim_msg)),
                       jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, layout.dim_x)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, layout.dim_sh)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, layout.dim_w)), jnp.float32)
    ct_x = jnp.asarray(rng.standard_normal((E, layout.dim_x)), jnp.float32)
    ct_sh = jnp.asarray(rng.standard_normal((E, layout.dim_sh)), jnp.float32)
    ct_w = jnp.asarray(rng.standard_normal((E, layout.dim_w)), jnp.float32)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    dst[-128:] = N
    dst = jnp.asarray(dst)

    def timeit(fn, *args):
        t0 = time.time()
        chk = float(fn(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        float(fn(*args))
        dt = (time.time() - t0) / (N_IT + 1) * 1e3
        return round(dt, 3), chk, round(compile_s, 1)

    def scan(body_fn):
        @jax.jit
        def run(*args):
            def body(carry, _):
                outs = body_fn(carry, *args)
                s = sum(jnp.asarray(o).reshape(-1)[0] for o in outs)
                return 1.0 + s * 1e-30, None
            s, _ = jax.lax.scan(body, jnp.float32(1.0), None,
                                length=N_IT)
            outs = body_fn(s, *args)
            return sum(jnp.sum(jnp.asarray(o) ** 2) for o in outs)
        return run

    results = {}

    # triple: multi(xn, shn, wn) vs three singles
    def multi_body(c, ybar, x, sh, w):
        return fcm.cg_node_multi(ybar * c, x, sh, w, dst,
                                 jobs=('xn', 'shn', 'wn'),
                                 layout=layout, n_node=N)

    def singles_body(c, ybar, x, sh, w):
        yb = ybar * c
        return (fca.cg_node_apply('xn', yb, sh, w, dst, layout, N),
                fca.cg_node_apply('shn', yb, x, w, dst, layout, N),
                fca.cg_node_apply('wn', yb, x, sh, dst, layout, N))

    for tag, body in (('multi_triple', multi_body),
                      ('singles_triple', singles_body)):
        dt, chk, cs = timeit(scan(body), ybar, x, sh, w)
        results[tag] = {'ms': dt, 'checksum': chk, 'compile_s': cs}
        print(f'{tag:16s} {dt:7.3f} ms  chk={chk:.8e}', flush=True)

    # gmulti: 4 jobs / 2 groups vs pair + 2 singles
    def gmulti_body(c, ybar, x, sh, w, ct_sh, ct_w, ct_x):
        pool = [ct_sh, w, sh, ct_w, x, ct_x]
        jobs = (('x', 0, 1, 'gx'), ('x', 2, 3, 'gx'),
                ('w', 4, 0, 'gw'), ('w', 5, 2, 'gw'))
        return fcm.cg_node_gmulti(ybar * c, pool, dst, jobs=jobs,
                                  groups=('gx', 'gw'), layout=layout,
                                  n_node=N)

    def gsingle_body(c, ybar, x, sh, w, ct_sh, ct_w, ct_x):
        yb = ybar * c
        gx = (fca.cg_node_apply('xn', yb, ct_sh, w, dst, layout, N)
              + fca.cg_node_apply('xn', yb, sh, ct_w, dst, layout, N))
        gw = (fca.cg_node_apply('wn', yb, x, ct_sh, dst, layout, N)
              + fca.cg_node_apply('wn', yb, ct_x, sh, dst, layout, N))
        return (gx, gw)

    for tag, body in (('gmulti_4job', gmulti_body),
                      ('singles_4job', gsingle_body)):
        dt, chk, cs = timeit(scan(body), ybar, x, sh, w, ct_sh, ct_w,
                             ct_x)
        results[tag] = {'ms': dt, 'checksum': chk, 'compile_s': cs}
        print(f'{tag:16s} {dt:7.3f} ms  chk={chk:.8e}', flush=True)

    # gagg: 3 terms vs three agg singles
    def gagg_body(c, x, sh, w, ct_x, ct_sh, ct_w):
        pool = [ct_x * c, sh, w, x, ct_sh, ct_w]
        return (fcm.cg_node_gagg(pool, dst,
                                 terms=((0, 1, 2), (3, 4, 2),
                                        (3, 1, 5)),
                                 layout=layout, n_node=N),)

    def agg3_body(c, x, sh, w, ct_x, ct_sh, ct_w):
        return ((fca.cg_node_apply('agg', ct_x * c, sh, w, dst, layout,
                                   N)
                 + fca.cg_node_apply('agg', x, ct_sh, w, dst, layout, N)
                 + fca.cg_node_apply('agg', x, sh, ct_w, dst, layout,
                                     N)),)

    for tag, body in (('gagg_3term', gagg_body),
                      ('singles_3agg', agg3_body)):
        dt, chk, cs = timeit(scan(body), x, sh, w, ct_x, ct_sh, ct_w)
        results[tag] = {'ms': dt, 'checksum': chk, 'compile_s': cs}
        print(f'{tag:16s} {dt:7.3f} ms  chk={chk:.8e}', flush=True)

    for a, b in (('multi_triple', 'singles_triple'),
                 ('gmulti_4job', 'singles_4job'),
                 ('gagg_3term', 'singles_3agg')):
        ca, cb = results[a]['checksum'], results[b]['checksum']
        rel = abs(ca - cb) / max(abs(ca), 1e-30)
        results[f'{a}_relerr'] = rel
        print(f'{a}: checksum rel diff {rel:.2e}', flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
