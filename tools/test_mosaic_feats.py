"""Feasibility probes for the gather-fused backward kernels (round 5).

Checks, each as a tiny standalone Pallas kernel compiled on the chip:
  1. in-kernel 2D transpose of a [256, 512] f32 tile (edge-major in,
     feature-major compute)
  2. bitcast + mask bf16x3 split (exact f32 = hi+mid+lo)
  3. dot_general contracting the LANE axis of both operands
  4. statically-sliced, predicated HBM->VMEM DMA (the ybar window)
Prints OK/FAIL per feature plus a correctness check vs numpy.
"""

import sys
import time

import numpy as np


def main():
    sys.path.insert(0, '/root/repo')
    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def check(name, fn):
        try:
            t0 = time.time()
            ok = fn()
            print(f'{name:28s} {"OK" if ok else "MISMATCH"} '
                  f'({time.time() - t0:.1f}s)', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{name:28s} FAIL: {type(e).__name__}: '
                  f'{str(e)[:200]}', flush=True)

    # 1. in-kernel transpose
    def t_transpose():
        x = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)

        def kern(i_ref, o_ref):
            o_ref[:] = i_ref[:].T

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return np.array_equal(np.asarray(out), np.asarray(x).T)

    # 2. bf16x3 split via bitcast+mask, exact reconstruction
    def t_split():
        v = jnp.asarray(rng.standard_normal((128, 256)) * 100,
                        jnp.float32)

        def kern(i_ref, o_ref):
            x = i_ref[:]
            xi = pltpu.bitcast(x, jnp.uint32)
            hi = pltpu.bitcast(xi & jnp.uint32(0xFFFF0000), jnp.float32)
            r1 = x - hi
            r1i = pltpu.bitcast(r1, jnp.uint32)
            mid = pltpu.bitcast(r1i & jnp.uint32(0xFFFF0000),
                                jnp.float32)
            lo = r1 - mid
            h = hi.astype(jnp.bfloat16).astype(jnp.float32)
            m = mid.astype(jnp.bfloat16).astype(jnp.float32)
            l_ = lo.astype(jnp.bfloat16).astype(jnp.float32)
            o_ref[:] = h + m + l_

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v)
        return np.array_equal(np.asarray(out), np.asarray(v))

    # 3. dot_general contracting lanes of both operands:
    #    [W, C] x [W, TE] -> [C, TE]  (contract dim 0 of both)
    def t_dotgen():
        a = jnp.asarray(rng.standard_normal((64, 384)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)

        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((384, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        ref = np.asarray(a).T @ np.asarray(b)
        return np.allclose(np.asarray(out), ref, atol=1e-4)

    # 4. predicated, statically-sliced HBM window DMA
    def t_winDMA():
        NB, WB, D = 12, 64, 384
        y = jnp.asarray(rng.standard_normal((NB * WB, D)), jnp.float32)
        # pick window 5 at runtime via a scalar-prefetch arg
        sel = jnp.array([5], jnp.int32)

        def kern(sel_ref, y_hbm, o_ref, buf, sem):
            s = sel_ref[0]
            for nb in range(NB):
                @pl.when(nb == s)
                def _(nb=nb):
                    cp = pltpu.make_async_copy(
                        y_hbm.at[nb * WB:(nb + 1) * WB, :], buf, sem)
                    cp.start()
                    cp.wait()
            o_ref[:] = buf[:]

        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((WB, D), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((WB, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(sel, y)
        return np.array_equal(np.asarray(out),
                              np.asarray(y)[5 * 64:6 * 64])

    check('in-kernel transpose', t_transpose)
    check('bf16x3 bitcast split', t_split)
    check('dot_general lane-contract', t_dotgen)
    check('predicated window DMA', t_winDMA)


if __name__ == '__main__':
    main()
