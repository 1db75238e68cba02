"""Gather-fused Pallas kernels for the cg_node BACKWARD modes (xn/shn/wn).

Round 4 fused the forward direction ('agg': messages + sorted segment
sum in one kernel, no [E, dim_msg] HBM tensor).  The backward modes
still composed in XLA: gather ybar rows by dst into a [E, dim_msg]
cotangent tensor (~270 MB at bench shapes, written AND re-read), then
transpose every leg to feature-major around the per-edge kernels --
making each backward-mode call ~2.3-2.6 ms of almost pure HBM traffic
(PROFILE.md section 5; the round-5 DMA study in tools/bench_dma.py shows
Pallas pipelining is hard-capped at ~480 GB/s on this chip, so the only
lever is REMOVING traffic, not pipelining it better).

These kernels compute each backward mode in ONE pallas_call over edge
tiles with no edge x dim_msg HBM tensor anywhere:

- edge legs stream in/out EDGE-MAJOR (the primitive's native layout --
  zero XLA relayouts), transposed to feature-major IN-KERNEL (XLU
  vector transposes, VMEM-only) because the unrolled wigner-3j-sparse
  contraction is measurably faster feature-major (round-4 finding:
  edge-major compute pays lane-offset operand shifts at mul 32/64);
- the node cotangent is gathered INSIDE the kernel: dst is sorted (the
  collate / halo-plan contract), so each TE-edge tile touches one small
  contiguous node window; the kernel DMAs WB-row windows of ybar from
  HBM (dynamic, 8-aligned row offsets) and selects rows with a one-hot
  MXU matmul.  Selection through the MXU is EXACT at full bf16 rate via
  a 3-way bitmask split (f32 = hi + mid + lo, each field exactly
  representable in bf16; one-hot entries are exact; the f32
  accumulation hi+mid recombines the top 16 mantissa bits exactly, +lo
  restores all 24) -- so kernel == XLA oracle bitwise, unlike a plain
  f32 matmul at DEFAULT precision (single bf16 pass, truncates) or
  HIGHEST (exact but 6 passes, 2x slower).

Out-of-range dst (the padding sentinel, clamped host-side to n_node)
selects the zero-initialized pad row of ybar -- identical semantics to
the oracle's where(dst < n_node, ybar[dst], 0).

Reference counterpart: the backward of the convolution hot loop,
sevenn/nn/convolution.py:104-123 (autograd through message_gather).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_conv import CGLayout


def _tile_e() -> int:
    return int(os.environ.get('SEVENN_BWD_EDGE_TILE', '128'))


def _win(TE: int, E: int, n_node: int) -> int:
    """ybar gather-window rows per DMA.

    'auto' (default) sizes the window to ~8x the EXPECTED node span of
    a TE-edge tile (TE * n_node / E): dst is sorted, so consecutive
    edges target consecutive nodes and a tile rarely spans more than a
    few rows.  The round-5 on-chip sweep at bench shapes (span ~4.6,
    experiments/kernels/SWEEP_r05.txt) has a clear optimum at WB=40 =
    ~8x span: smaller windows pay extra loop iterations + DMA starts
    (WB=8: +16%), the round-4 fixed WB=64 overfetches (+12%).  Skewed
    tiles just take more loop iterations; correctness never depends on
    the choice."""
    wb = os.environ.get('SEVENN_BWD_WINDOW', 'auto')
    if wb != 'auto':
        wb = int(wb)
        assert wb % 8 == 0
        return wb
    span = TE * n_node / max(E, 1)
    return min(64, max(16, -(-int(8 * span) // 8) * 8))


def _pad128(d):
    return -(-d // 128) * 128


def _split3(v):
    """Exact 3-way bf16 split of f32: v == hi + mid + lo bitwise."""
    mask = jnp.uint32(0xFFFF0000)
    vi = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(vi & mask, jnp.float32)
    r1 = v - hi
    r1i = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    mid = jax.lax.bitcast_convert_type(r1i & mask, jnp.float32)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def _emit_values(layout: CGLayout, modes, g_at, x_T, sh_T, w_T,
                 out_dims, TE: int):
    """Feature-major contractions for one OR MORE backward modes,
    returning {mode: assembled [out_dim, TE] value}.

    ``g_at(off, n)`` returns rows [off:off+n] of the feature-major
    cotangent; ``x_T``/``sh_T``/``w_T`` are values (or None if unused
    by every requested mode).  Same unrolled wigner-3j-sparse math as
    fused_conv_kernel._emit, python-folded so shared products trace
    once -- and when several modes are emitted together (the fused
    multi-mode backward kernel), the per-(path, k) ``g*w`` products
    (used by 'x' and 'sh') and the per-(i, j) ``x*sh`` products (used
    by 'msg' and 'w') are computed once and shared across modes.
    """
    accs = {m: {} for m in modes}

    def add(m, off, n, expr):
        acc = accs[m]
        if off in acc:
            acc[off] = (n, acc[off][1] + expr)
        else:
            acc[off] = (n, expr)

    for grp in layout.groups:
        mul = grp.mul

        def x_sl(i, _g=grp):
            return x_T[_g.x_off + i * mul:_g.x_off + (i + 1) * mul, :]

        def sh_sl(j, _g=grp):
            return sh_T[_g.sh_off + j:_g.sh_off + j + 1, :]

        def w_sl(p, _m=mul):
            return w_T[p.w_off:p.w_off + _m, :]

        def g_sl(p, k, _m=mul):
            return g_at(p.msg_off + k * _m, _m)

        # shared per-group caches (keyed per path object / (i, j) pair)
        gw_cache = {}   # (id(p), k) -> g_sl(p, k) * w_sl(p)
        t_cache = {}    # (i, j) -> x_sl(i) * sh_sl(j)

        def gw(p, k):
            key = (id(p), k)
            if key not in gw_cache:
                gw_cache[key] = g_sl(p, k) * w_sl(p)
            return gw_cache[key]

        def t(i, j):
            if (i, j) not in t_cache:
                t_cache[(i, j)] = x_sl(i) * sh_sl(j)
            return t_cache[(i, j)]

        for mode in modes:
            if mode == 'msg':
                for p in grp.paths:
                    wp = w_sl(p)
                    for k in range(p.d_out):
                        expr = None
                        for (kk, i, j, cc) in p.nnz:
                            if kk != k:
                                continue
                            term = cc * t(i, j)
                            expr = term if expr is None else expr + term
                        if expr is not None:
                            add(mode, p.msg_off + k * mul, mul, expr * wp)
            elif mode == 'x':
                for p in grp.paths:
                    for (k, i, j, cc) in p.nnz:
                        add(mode, grp.x_off + i * mul, mul,
                            cc * sh_sl(j) * gw(p, k))
            elif mode == 'sh':
                # accumulate [mul, TE] per output component j and reduce
                # ONCE -- a sublane reduction per nnz term was the sh
                # mode's extra cost vs its siblings (round 5)
                jacc = {}
                for p in grp.paths:
                    for (k, i, j, cc) in p.nnz:
                        term = cc * x_sl(i) * gw(p, k)
                        jacc[j] = term if j not in jacc else jacc[j] + term
                for j, acc_j in jacc.items():
                    add(mode, grp.sh_off + j, 1,
                        jnp.sum(acc_j, axis=0, keepdims=True))
            elif mode == 'w':
                for p in grp.paths:
                    expr = None
                    for (k, i, j, cc) in p.nnz:
                        term = cc * t(i, j) * g_sl(p, k)
                        expr = term if expr is None else expr + term
                    if expr is not None:
                        add(mode, p.w_off, mul, expr)
            else:
                raise ValueError(mode)

    dt = jnp.float32
    out = {}
    for m in modes:
        parts = []
        pos = 0
        for off in sorted(accs[m]):
            n, expr = accs[m][off]
            assert off >= pos, 'overlapping output chunks'
            if off > pos:
                parts.append(jnp.zeros((off - pos, TE), dt))
            parts.append(expr)
            pos = off + n
        if pos < out_dims[m]:
            parts.append(jnp.zeros((out_dims[m] - pos, TE), dt))
        out[m] = jnp.concatenate(parts, axis=0)
    return out


def _emit_value(layout: CGLayout, mode: str, g_at, x_T, sh_T, w_T,
                out_dim: int, TE: int):
    """Single-mode wrapper over _emit_values (kept for the per-mode
    kernels; identical expression structure)."""
    return _emit_values(layout, (mode,), g_at, x_T, sh_T, w_T,
                        {mode: out_dim}, TE)[mode]


# map cg_node backward mode -> per-edge emit mode and leg roles
_EMIT_MODE = {'xn': 'x', 'shn': 'sh', 'wn': 'w'}
# legs after ybar, per fused_conv_agg._MODE_LEGS
_EDGE_LEGS = {'xn': ('sh', 'w'), 'shn': ('x', 'w'), 'wn': ('x', 'sh')}
_OUT_LEG = {'xn': 'x', 'shn': 'sh', 'wn': 'w'}
# which canonical edge legs each backward mode READS
_READS = {'xn': ('sh', 'w'), 'shn': ('x', 'w'), 'wn': ('x', 'sh')}


@functools.lru_cache(maxsize=None)
def _build_call(layout: CGLayout, mode: str, TE: int, WB: int,
                n_et: int, E_rows: int, d_b: int, d_c: int, d_out: int,
                dim_msg_p: int, n_node: int, interpret: bool):
    emit_mode = _EMIT_MODE[mode]
    legs = _EDGE_LEGS[mode]

    def kernel(dst_ref, ybar_hbm, b_ref, c_ref, out_ref, g_ref, win,
               sem):
        dst_t = dst_ref[0, :]                       # [TE] int32, sorted
        lo = dst_ref[0, 0]
        hi = dst_ref[0, TE - 1]
        nb0 = lo // WB
        nwin = hi // WB - nb0 + 1

        # sentinel padding (dst clamped to n_node) sorts to the END, so
        # a tile whose FIRST dst is the sentinel is pure padding: its
        # output is zero for every mode (each term carries a g factor
        # and the sentinel row of ybar is zero) -- skip gather+compute
        @pl.when(lo >= n_node)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(lo < n_node)
        def _():
            def start_cp(i, slot):
                start = pl.multiple_of((nb0 + i) * WB, WB)
                pltpu.make_async_copy(
                    ybar_hbm.at[pl.ds(start, WB), :], win.at[slot],
                    sem.at[slot]).start()

            # overlap the first window fetch with the leg transposes
            start_cp(0, 0)
            b_T = b_ref[:].T                        # [d_b, TE]
            c_T = c_ref[:].T                        # [d_c, TE]
            # g_ref needs no zero-init: nwin >= 1 and the i == 0 window
            # writes it directly

            def wbody(i, carry):
                slot = i % 2

                @pl.when(i + 1 < nwin)
                def _():
                    start_cp(i + 1, (i + 1) % 2)

                start = pl.multiple_of((nb0 + i) * WB, WB)
                pltpu.make_async_copy(
                    ybar_hbm.at[pl.ds(start, WB), :], win.at[slot],
                    sem.at[slot]).wait()
                rel = dst_t[None, :] - start        # [1, TE]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (WB, TE), 0)
                oh = (iota == rel).astype(jnp.bfloat16)  # [WB, TE]
                # ONE MXU pass instead of three: stack the exact bf16
                # bitsplit parts along the CONTRACTED axis (K = 3*WB)
                # with the one-hot tiled to match.  The f32 accumulator
                # sums hi+mid+lo of the selected row exactly as the
                # three += passes did (disjoint bit fields; each
                # product exact), so the result is bitwise identical --
                # but the selection streams the [dim_msg, TE] result
                # once per window, not three times.
                parts = jnp.concatenate(_split3(win[slot]), axis=0)
                oh3 = jnp.concatenate([oh, oh, oh], axis=0)
                acc = jax.lax.dot_general(
                    parts, oh3,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(i == 0)
                def _():
                    g_ref[:] = acc

                @pl.when(i > 0)
                def _():
                    g_ref[:] += acc

                return carry

            jax.lax.fori_loop(0, nwin, wbody, 0)

            vals = {legs[0]: b_T, legs[1]: c_T}

            def g_at(off, n):
                return g_ref[off:off + n, :]

            out_T = _emit_value(
                layout, emit_mode, g_at,
                vals.get('x'), vals.get('sh'), vals.get('w'),
                d_out, TE,
            )
            out_ref[:] = out_T.T

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_et,),
            in_specs=[
                pl.BlockSpec((1, TE), lambda e: (0, e),
                             memory_space=pltpu.VMEM),       # dst
                pl.BlockSpec(memory_space=pl.ANY),           # ybar HBM
                pl.BlockSpec((TE, d_b), lambda e: (e, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TE, d_c), lambda e: (e, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TE, d_out), lambda e: (e, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((dim_msg_p, TE), jnp.float32),    # g_T
                pltpu.VMEM((2, WB, dim_msg_p), jnp.float32),  # windows
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((E_rows, d_out), jnp.float32),
        interpret=interpret,
    )


def bwd_pallas(ybar, b, c, dst, *, layout: CGLayout, mode: str,
               n_node: int, interpret: bool = False):
    """One cg_node backward mode as a single gather-fused kernel.

    ybar: [n_node, dim_msg] node cotangent; b, c: edge-major legs per
    fused_conv_agg._MODE_LEGS[mode][1:]; dst: [E] sorted with
    out-of-range sentinel padding.  Returns [E, dim_out] edge-major.
    """
    E = dst.shape[0]
    TE = _tile_e()
    WB = _win(TE, E, n_node)
    E_pad = -(-E // TE) * TE

    dim_msg_p = _pad128(layout.dim_msg)
    # rows: real nodes + the sentinel row (zeros), rounded to WB
    NBR = -(-(n_node + 1) // WB) * WB
    ybar_p = jnp.pad(ybar, ((0, NBR - ybar.shape[0]),
                            (0, dim_msg_p - ybar.shape[1])))

    # edge legs and the output stay UNPADDED: they are BlockSpec-fed, so
    # Mosaic masks the partial last tile and packs non-128 minor dims in
    # VMEM without any HBM copy -- the round-4 jnp.pad of every leg to
    # lane multiples was ~1.4 GB/step of pure pad+slice traffic.  Rows
    # beyond E in the last tile read masked garbage, but every output
    # term carries a g factor and their dst is the sentinel (g = 0), and
    # the masked store drops those rows anyway.  Only dst (controls the
    # window bounds) and ybar (manual DMA) still pad.
    dstc = jnp.minimum(dst, n_node).astype(jnp.int32)
    if E_pad != E:
        dstc = jnp.pad(dstc, (0, E_pad - E), constant_values=n_node)

    d_out_real = {'xn': layout.dim_x, 'shn': layout.dim_sh,
                  'wn': layout.dim_w}[mode]
    call = _build_call(layout, mode, TE, WB, E_pad // TE, E,
                       b.shape[1], c.shape[1], d_out_real,
                       dim_msg_p, n_node, interpret)
    return call(dstc.reshape(1, E_pad), ybar_p, b, c)


# ---------------------------------------------------------------------------
# fused MULTI-mode backward: several cg_node backward modes that share one
# (ybar, dst) -- and therefore one window-DMA + one-hot selection, the
# dominant per-call cost (PROFILE.md section 6) -- in a single kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build_multi_call(layout: CGLayout, jobs, TE: int, WB: int,
                      n_et: int, E_rows: int, dim_x: int, dim_sh: int,
                      dim_w: int, dim_msg_p: int, n_node: int,
                      interpret: bool):
    emit_modes = tuple(_EMIT_MODE[m] for m in jobs)
    reads = sorted({leg for m in jobs for leg in _READS[m]})
    out_dims = {'xn': dim_x, 'shn': dim_sh, 'wn': dim_w}

    def kernel(dst_ref, ybar_hbm, x_ref, sh_ref, w_ref, *rest):
        out_refs = rest[:len(jobs)]
        g_ref, win, sem = rest[len(jobs):]
        dst_t = dst_ref[0, :]                       # [TE] int32, sorted
        lo = dst_ref[0, 0]
        hi = dst_ref[0, TE - 1]
        nb0 = lo // WB
        nwin = hi // WB - nb0 + 1

        @pl.when(lo >= n_node)
        def _():
            for o in out_refs:
                o[:] = jnp.zeros_like(o)

        @pl.when(lo < n_node)
        def _():
            def start_cp(i, slot):
                start = pl.multiple_of((nb0 + i) * WB, WB)
                pltpu.make_async_copy(
                    ybar_hbm.at[pl.ds(start, WB), :], win.at[slot],
                    sem.at[slot]).start()

            # overlap the first window fetch with the leg transposes
            start_cp(0, 0)
            legs_T = {}
            if 'x' in reads:
                legs_T['x'] = x_ref[:].T            # [dim_x, TE]
            if 'sh' in reads:
                legs_T['sh'] = sh_ref[:].T
            if 'w' in reads:
                legs_T['w'] = w_ref[:].T

            def wbody(i, carry):
                slot = i % 2

                @pl.when(i + 1 < nwin)
                def _():
                    start_cp(i + 1, (i + 1) % 2)

                start = pl.multiple_of((nb0 + i) * WB, WB)
                pltpu.make_async_copy(
                    ybar_hbm.at[pl.ds(start, WB), :], win.at[slot],
                    sem.at[slot]).wait()
                rel = dst_t[None, :] - start        # [1, TE]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (WB, TE), 0)
                oh = (iota == rel).astype(jnp.bfloat16)  # [WB, TE]
                parts = jnp.concatenate(_split3(win[slot]), axis=0)
                oh3 = jnp.concatenate([oh, oh, oh], axis=0)
                acc = jax.lax.dot_general(
                    parts, oh3,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(i == 0)
                def _():
                    g_ref[:] = acc

                @pl.when(i > 0)
                def _():
                    g_ref[:] += acc

                return carry

            jax.lax.fori_loop(0, nwin, wbody, 0)

            def g_at(off, n):
                return g_ref[off:off + n, :]

            vals = _emit_values(
                layout, emit_modes, g_at,
                legs_T.get('x'), legs_T.get('sh'), legs_T.get('w'),
                {_EMIT_MODE[m]: out_dims[m] for m in jobs}, TE,
            )
            for m, o in zip(jobs, out_refs):
                o[:] = vals[_EMIT_MODE[m]].T

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_et,),
            in_specs=[
                pl.BlockSpec((1, TE), lambda e: (0, e),
                             memory_space=pltpu.VMEM),       # dst
                pl.BlockSpec(memory_space=pl.ANY),           # ybar HBM
                pl.BlockSpec((TE, dim_x), lambda e: (e, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TE, dim_sh), lambda e: (e, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TE, dim_w), lambda e: (e, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TE, out_dims[m]), lambda e: (e, 0),
                             memory_space=pltpu.VMEM)
                for m in jobs
            ],
            scratch_shapes=[
                pltpu.VMEM((dim_msg_p, TE), jnp.float32),    # g_T
                pltpu.VMEM((2, WB, dim_msg_p), jnp.float32),  # windows
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((E_rows, out_dims[m]), jnp.float32)
            for m in jobs
        ],
        interpret=interpret,
    )


def multi_pallas(ybar, x, sh, w, dst, *, layout: CGLayout, jobs,
                 n_node: int, interpret: bool = False):
    """Several cg_node backward modes fused into ONE gather kernel.

    ybar: [n_node, dim_msg]; x/sh/w: edge-major canonical legs; dst:
    [E] sorted with out-of-range sentinel padding.  ``jobs`` is a
    static tuple drawn from ('xn', 'shn', 'wn'); returns one edge-major
    array per job, each bitwise-identical to the corresponding
    single-mode kernel (same window DMA, same stacked one-hot
    selection, same emit expressions -- only shared, not recomputed).
    """
    E = dst.shape[0]
    TE = _tile_e()
    WB = _win(TE, E, n_node)
    E_pad = -(-E // TE) * TE

    dim_msg_p = _pad128(layout.dim_msg)
    NBR = -(-(n_node + 1) // WB) * WB
    ybar_p = jnp.pad(ybar, ((0, NBR - ybar.shape[0]),
                            (0, dim_msg_p - ybar.shape[1])))

    dstc = jnp.minimum(dst, n_node).astype(jnp.int32)
    if E_pad != E:
        dstc = jnp.pad(dstc, (0, E_pad - E), constant_values=n_node)

    call = _build_multi_call(layout, tuple(jobs), TE, WB, E_pad // TE,
                             E, layout.dim_x, layout.dim_sh,
                             layout.dim_w, dim_msg_p, n_node, interpret)
    return call(dstc.reshape(1, E_pad), ybar_p, x, sh, w)


# ---------------------------------------------------------------------------
# GENERALIZED multi-mode backward: arbitrary jobs over ONE shared
# (ybar, dst) with per-job edge legs drawn from an array pool, and
# outputs grouped (jobs in one group accumulate) -- the kernel behind
# cg_node_gmulti (see ops/fused_conv_multi.py): the transpose of a
# joint JVP needs e.g. xn(ybar, ct_shn, w) + xn(ybar, sh, ct_wn) as one
# output, sharing the ybar gather/selection with its sibling groups.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build_gmulti_call(layout: CGLayout, jobs, groups, pool_dims,
                       TE: int, WB: int, n_et: int, E_rows: int,
                       dim_msg_p: int, n_node: int, interpret: bool):
    """jobs: tuple of (emit_mode, b_idx, c_idx, group); groups: tuple of
    group ids in OUTPUT order; pool_dims: dims of the pool arrays."""
    out_dim_of = {'x': layout.dim_x, 'sh': layout.dim_sh,
                  'w': layout.dim_w}
    group_dim = {}
    for (m, _, _, g) in jobs:
        group_dim.setdefault(g, out_dim_of[m])

    def kernel(dst_ref, ybar_hbm, *rest):
        pool_refs = rest[:len(pool_dims)]
        out_refs = rest[len(pool_dims):len(pool_dims) + len(groups)]
        g_ref, win, sem = rest[len(pool_dims) + len(groups):]
        dst_t = dst_ref[0, :]
        lo = dst_ref[0, 0]
        hi = dst_ref[0, TE - 1]
        nb0 = lo // WB
        nwin = hi // WB - nb0 + 1

        @pl.when(lo >= n_node)
        def _():
            for o in out_refs:
                o[:] = jnp.zeros_like(o)

        @pl.when(lo < n_node)
        def _():
            def start_cp(i, slot):
                start = pl.multiple_of((nb0 + i) * WB, WB)
                pltpu.make_async_copy(
                    ybar_hbm.at[pl.ds(start, WB), :], win.at[slot],
                    sem.at[slot]).start()

            start_cp(0, 0)
            # transpose every pool array once (overlaps first window)
            pool_T = [p_ref[:].T for p_ref in pool_refs]

            def wbody(i, carry):
                slot = i % 2

                @pl.when(i + 1 < nwin)
                def _():
                    start_cp(i + 1, (i + 1) % 2)

                start = pl.multiple_of((nb0 + i) * WB, WB)
                pltpu.make_async_copy(
                    ybar_hbm.at[pl.ds(start, WB), :], win.at[slot],
                    sem.at[slot]).wait()
                rel = dst_t[None, :] - start
                iota = jax.lax.broadcasted_iota(jnp.int32, (WB, TE), 0)
                oh = (iota == rel).astype(jnp.bfloat16)
                parts = jnp.concatenate(_split3(win[slot]), axis=0)
                oh3 = jnp.concatenate([oh, oh, oh], axis=0)
                acc = jax.lax.dot_general(
                    parts, oh3,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(i == 0)
                def _():
                    g_ref[:] = acc

                @pl.when(i > 0)
                def _():
                    g_ref[:] += acc

                return carry

            jax.lax.fori_loop(0, nwin, wbody, 0)

            def g_at(off, n):
                return g_ref[off:off + n, :]

            # per-job emit; accumulate per group IN JOB ORDER (the
            # transpose rule lists jobs in the same order it would have
            # summed the separate calls)
            acc_by_group = {}
            for (m, bi, ci, grp) in jobs:
                legs = {'x': None, 'sh': None, 'w': None}
                b_leg, c_leg = {'x': ('sh', 'w'), 'sh': ('x', 'w'),
                                'w': ('x', 'sh')}[m]
                legs[b_leg] = pool_T[bi]
                legs[c_leg] = pool_T[ci]
                val = _emit_values(
                    layout, (m,), g_at, legs['x'], legs['sh'],
                    legs['w'], {m: group_dim[grp]}, TE)[m]
                if grp in acc_by_group:
                    acc_by_group[grp] = acc_by_group[grp] + val
                else:
                    acc_by_group[grp] = val
            for grp, o in zip(groups, out_refs):
                o[:] = acc_by_group[grp].T

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_et,),
            in_specs=[
                pl.BlockSpec((1, TE), lambda e: (0, e),
                             memory_space=pltpu.VMEM),       # dst
                pl.BlockSpec(memory_space=pl.ANY),           # ybar HBM
            ] + [
                pl.BlockSpec((TE, d), lambda e: (e, 0),
                             memory_space=pltpu.VMEM)
                for d in pool_dims
            ],
            out_specs=[
                pl.BlockSpec((TE, group_dim[g]), lambda e: (e, 0),
                             memory_space=pltpu.VMEM)
                for g in groups
            ],
            scratch_shapes=[
                pltpu.VMEM((dim_msg_p, TE), jnp.float32),
                pltpu.VMEM((2, WB, dim_msg_p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((E_rows, group_dim[g]), jnp.float32)
            for g in groups
        ],
        interpret=interpret,
    )


def gmulti_pallas(ybar, pool, dst, *, layout: CGLayout, jobs, groups,
                  n_node: int, interpret: bool = False):
    """Generalized fused backward.  ``pool`` is a list of edge-major
    arrays; ``jobs`` a tuple of (emit_mode, b_idx, c_idx, group) where
    (b_idx, c_idx) index the pool in the mode's leg order; ``groups``
    the distinct group ids in output order.  Jobs of one group
    accumulate (f32, job order).  Gather + selection of ybar happen
    once for all jobs."""
    E = dst.shape[0]
    TE = _tile_e()
    WB = _win(TE, E, n_node)
    E_pad = -(-E // TE) * TE

    dim_msg_p = _pad128(layout.dim_msg)
    NBR = -(-(n_node + 1) // WB) * WB
    ybar_p = jnp.pad(ybar, ((0, NBR - ybar.shape[0]),
                            (0, dim_msg_p - ybar.shape[1])))

    dstc = jnp.minimum(dst, n_node).astype(jnp.int32)
    if E_pad != E:
        dstc = jnp.pad(dstc, (0, E_pad - E), constant_values=n_node)

    call = _build_gmulti_call(
        layout, tuple(jobs), tuple(groups),
        tuple(int(p.shape[1]) for p in pool), TE, WB, E_pad // TE, E,
        dim_msg_p, n_node, interpret)
    return call(dstc.reshape(1, E_pad), ybar_p, *pool)
