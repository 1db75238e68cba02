"""On-chip (non-interpreted) kernel == oracle regression suite.

Round-4 verdict weak #6: the Pallas kernels were unit-tested only in
interpret mode on CPU; on-chip correctness rested on uncommitted bench
A/B observations.  This runner executes every kernel family against its
XLA oracle ON THE TPU (Mosaic-compiled) and writes a committed,
re-runnable artifact experiments/kernels/RESULTS.json:

- cg_quadlinear per-edge modes (msg/x/sh/w), both layouts (small mixed-
  parity + SevenNet-0 interior block), non-tile-multiple edge counts
- cg_node 'agg' (scatter-fused fwd, feature-major compute + one-hot
  HIGHEST reduce) and the round-5 gather-fused backward modes
  (xn/shn/wn) incl. sentinel edges and multi-window spans
- sorted-segment scatter/gather (ops.pallas_scatter)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    tools/bench_kernels_onchip.py [--json experiments/kernels/RESULTS.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--json', default='experiments/kernels/RESULTS.json')
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from sevennet_finetuning_tpu.irreps import Irreps
    from sevennet_finetuning_tpu.ops import fused_conv_agg as fca
    from sevennet_finetuning_tpu.ops import pallas_scatter as ps
    from sevennet_finetuning_tpu.ops.fused_conv import (
        cg_apply,
        layout_from_spec,
        _xla_impl,
    )
    from sevennet_finetuning_tpu.ops.fused_conv_kernel import pallas_impl
    from sevennet_finetuning_tpu.ops.fused_conv_agg_kernel import agg_pallas
    from sevennet_finetuning_tpu.ops.fused_conv_bwd_kernel import bwd_pallas
    from sevennet_finetuning_tpu.ops.tensor_product import uvu_tp_spec

    dev = str(jax.devices()[0])
    results = {'device': dev, 'cases': [], 'summary': None}

    def record(name, got, want, tol):
        got = np.asarray(got)
        want = np.asarray(want)
        scale = max(float(np.abs(want).max()), 1e-30)
        err = float(np.abs(got - want).max()) / scale
        ok = bool(err <= tol)
        results['cases'].append(
            {'case': name, 'rel_err': err, 'tol': tol, 'ok': ok})
        print(f'{"OK " if ok else "FAIL"} {name:54s} rel_err={err:.2e}',
              flush=True)
        return ok

    specs = {
        'small_parity': uvu_tp_spec(
            Irreps('4x0e+3x1o+2x2e'), Irreps('1x0e+1x1o+1x2e'),
            Irreps('4x0e+4x1o+4x1e+4x2e')),
        'sevennet_block': uvu_tp_spec(
            Irreps('128x0e+64x1e+32x2e'), Irreps('1x0e+1x1e+1x2e'),
            Irreps('128x0e+128x1e+128x2e')),
    }

    rng = np.random.default_rng(0)
    for sname, spec in specs.items():
        layout = layout_from_spec(spec)
        E = 300 if sname == 'small_parity' else 2177   # non-tile counts
        N = 41
        legs = {
            'g': rng.standard_normal((layout.dim_msg, E)),
            'x': rng.standard_normal((layout.dim_x, E)),
            'sh': rng.standard_normal((layout.dim_sh, E)),
            'w': rng.standard_normal((layout.dim_w, E)),
        }
        legs = {k: jnp.asarray(v, jnp.float32) for k, v in legs.items()}
        from sevennet_finetuning_tpu.ops.fused_conv import _MODE_LEGS
        for mode in ('msg', 'x', 'sh', 'w'):
            a, b, c = (legs[l] for l in _MODE_LEGS[mode])
            want = _xla_impl(a, b, c, layout=layout, mode=mode)
            got = jax.jit(lambda a, b, c, _m=mode: pallas_impl(
                a, b, c, layout=layout, mode=_m))(a, b, c)
            record(f'cg_quad[{mode}] {sname} E={E}', got, want, 2e-6)

        # node family: agg + gather-fused backward modes
        ybar = jnp.asarray(
            rng.standard_normal((N, layout.dim_msg)), jnp.float32)
        x_e = legs['x'].T
        sh_e = legs['sh'].T
        w_e = legs['w'].T
        dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
        dst[-17:] = N                      # sentinel tail
        dst = jnp.asarray(dst)

        want = fca._impl(x_e, sh_e, w_e, dst, layout=layout, mode='agg',
                         n_node=N)
        got = jax.jit(lambda x, s, w: agg_pallas(
            x, s, w, dst, layout=layout, n_node=N))(x_e, sh_e, w_e)
        record(f'cg_node[agg] {sname} E={E}', got, want, 2e-6)

        nlegs = {'xn': (ybar, sh_e, w_e), 'shn': (ybar, x_e, w_e),
                 'wn': (ybar, x_e, sh_e)}
        for mode, (a, b, c) in nlegs.items():
            want = fca._impl(a, b, c, dst, layout=layout, mode=mode,
                             n_node=N)
            got = jax.jit(lambda a, b, c, _m=mode: bwd_pallas(
                a, b, c, dst, layout=layout, mode=_m, n_node=N))(a, b, c)
            record(f'cg_node[{mode}] {sname} E={E}', got, want, 2e-6)

        # fused multi-mode backward (round-5 cross-mode fusion): every
        # output must match its single-mode oracle
        from sevennet_finetuning_tpu.ops.fused_conv_bwd_kernel import (
            multi_pallas,
        )

        jobs = ('xn', 'shn', 'wn')
        gots = jax.jit(lambda y, x, s, w: multi_pallas(
            y, x, s, w, dst, layout=layout, jobs=jobs, n_node=N))(
                ybar, x_e, sh_e, w_e)
        for mode, got in zip(jobs, gots):
            a, b, c = nlegs[mode]
            want = fca._impl(a, b, c, dst, layout=layout, mode=mode,
                             n_node=N)
            record(f'cg_node_multi[{mode}] {sname} E={E}', got, want,
                   2e-6)

        # generalized multi (second fusion layer): two same-mode jobs
        # accumulating into one group + a lone job, one shared gather
        from sevennet_finetuning_tpu.ops.fused_conv_bwd_kernel import (
            gmulti_pallas,
        )

        gjobs = (('x', 0, 1, 'gx'), ('x', 2, 3, 'gx'),
                 ('w', 4, 0, 'gw'))
        ct_sh = jnp.asarray(
            rng.standard_normal(sh_e.shape), jnp.float32)
        ct_w = jnp.asarray(rng.standard_normal(w_e.shape), jnp.float32)
        pool = [ct_sh, w_e, sh_e, ct_w, x_e]
        g_gots = jax.jit(lambda y, *p: gmulti_pallas(
            y, list(p), dst, layout=layout, jobs=gjobs,
            groups=('gx', 'gw'), n_node=N))(ybar, *pool)
        want_gx = (fca._impl(ybar, ct_sh, w_e, dst, layout=layout,
                             mode='xn', n_node=N)
                   + fca._impl(ybar, sh_e, ct_w, dst, layout=layout,
                               mode='xn', n_node=N))
        want_gw = fca._impl(ybar, x_e, ct_sh, dst, layout=layout,
                            mode='wn', n_node=N)
        record(f'cg_node_gmulti[gx 2-job] {sname} E={E}', g_gots[0],
               want_gx, 2e-6)
        record(f'cg_node_gmulti[gw] {sname} E={E}', g_gots[1],
               want_gw, 2e-6)

        # grouped agg (second fusion layer, ybar-cotangent side): three
        # terms over a shared pool, one kernel, per-term accumulators
        from sevennet_finetuning_tpu.ops.fused_conv_agg_kernel import (
            gagg_pallas,
        )

        ct_x = jnp.asarray(rng.standard_normal(x_e.shape), jnp.float32)
        gg_pool = [ct_x, sh_e, w_e, x_e, ct_sh, ct_w]
        gg_terms = ((0, 1, 2), (3, 4, 2), (3, 1, 5))
        gg_got = jax.jit(lambda *p: gagg_pallas(
            list(p), dst, layout=layout, terms=gg_terms, n_node=N))(
                *gg_pool)
        gg_want = (fca._impl(ct_x, sh_e, w_e, dst, layout=layout,
                             mode='agg', n_node=N)
                   + fca._impl(x_e, ct_sh, w_e, dst, layout=layout,
                               mode='agg', n_node=N)
                   + fca._impl(x_e, sh_e, ct_w, dst, layout=layout,
                               mode='agg', n_node=N))
        record(f'cg_node_gagg[3-term] {sname} E={E}', gg_got, gg_want,
               2e-6)

    # multi-window spans for the backward kernels (WB=8 forces several
    # ybar windows per edge tile)
    os.environ['SEVENN_BWD_WINDOW'] = '8'
    spec = specs['small_parity']
    layout = layout_from_spec(spec)
    E, N = 500, 97
    ybar = jnp.asarray(rng.standard_normal((N, layout.dim_msg)),
                       jnp.float32)
    sh_e = jnp.asarray(rng.standard_normal((E, layout.dim_sh)),
                       jnp.float32)
    w_e = jnp.asarray(rng.standard_normal((E, layout.dim_w)),
                      jnp.float32)
    dst = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    want = fca._impl(ybar, sh_e, w_e, dst, layout=layout, mode='xn',
                     n_node=N)
    got = jax.jit(lambda a, b, c: bwd_pallas(
        a, b, c, dst, layout=layout, mode='xn', n_node=N))(
            ybar, sh_e, w_e)
    record('cg_node[xn] multi-window WB=8', got, want, 2e-6)
    del os.environ['SEVENN_BWD_WINDOW']

    # sorted segment scatter + gather-transpose (ops.pallas_scatter)
    E, N, D = 3000, 512, 384
    msg = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
    dstp = np.sort(rng.integers(0, N, E)).astype(np.int32)
    dstp[-32:] = N
    dstp = jnp.asarray(dstp)
    want = jax.ops.segment_sum(msg, dstp, num_segments=N,
                               indices_are_sorted=True)
    with ps.force_impl('pallas'):
        got = jax.jit(lambda m: ps.segment_sum_sorted(m, dstp, N))(msg)
    record('pallas_scatter segment_sum_sorted', got, want, 2e-5)

    idx = rng.integers(0, N, E).astype(np.int32)
    idx[-32:] = N
    perm = np.argsort(idx, kind='stable').astype(np.int32)
    xq = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    gq = jnp.asarray(rng.standard_normal((E, D)), jnp.float32)
    gq = gq.at[-32:].set(0.0)
    idxj, permj = jnp.asarray(idx), jnp.asarray(perm)

    def f_kernel(xx):
        with ps.force_impl('pallas'):
            return jnp.sum(ps.gather_rows(xx, idxj, permj) * gq)

    want = jax.grad(lambda xx: jnp.sum(xx[jnp.minimum(idxj, N - 1)]
                                       * gq))(xq)
    got = jax.jit(jax.grad(f_kernel))(xq)
    record('pallas_scatter gather_rows transpose', got, want, 2e-5)

    n_ok = sum(c['ok'] for c in results['cases'])
    results['summary'] = f'{n_ok}/{len(results["cases"])} passed'
    results['timestamp'] = time.strftime('%Y-%m-%d %H:%M:%S')
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, 'w') as f:
        json.dump(results, f, indent=2)
    print(results['summary'])
    sys.exit(0 if n_ok == len(results['cases']) else 1)


if __name__ == '__main__':
    main()
