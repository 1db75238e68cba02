"""Measure the Pallas HBM pipelining ceiling vs XLA on identical traffic.

Round-4 found every fused kernel DMA-bound with Pallas sustaining only
~400 GB/s where plain XLA ops reach ~800 GB/s (PROFILE.md section 5).
This harness isolates the question: same slab, same tiles, copy-only --
sweep pipelining strategy (BlockSpec auto vs manual DMA), buffer depth,
tile size, layout, and read-only vs read+write.

Fetch-forced timing per PROFILE.md: each variant is one lax.scan
executable ending in a scalar fetch.
"""

import json
import sys
import time

E, D = 21504, 768            # ~66 MB f32 slab (bench-like shapes)
N_IT = 300


def main():
    sys.path.insert(0, '/root/repo')
    from sevennet_finetuning_tpu.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = 1.0000001

    def timed(make_step, x0, bytes_per_it, name, results):
        @jax.jit
        def run(x):
            def body(c, _):
                return make_step(c), None
            c, _ = jax.lax.scan(body, x, None, length=N_IT)
            return c.reshape(-1)[0]

        try:
            float(run(x0))           # compile + warm
            t0 = time.time()
            float(run(x0))
            dt = time.time() - t0
            gbs = bytes_per_it * N_IT / dt / 1e9
            results[name] = round(gbs, 1)
            print(f'{name:38s} {gbs:8.1f} GB/s', flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = f'FAIL: {type(e).__name__}: {e}'
            print(f'{name:38s} FAIL {e}', flush=True)

    x = jnp.full((E, D), 1.0, jnp.float32)
    xT = jnp.full((D, E), 1.0, jnp.float32)
    nbytes = E * D * 4

    results = {}

    # ---- overhead control: tiny scan, ~zero traffic ----
    tiny = jnp.ones((8, 128), jnp.float32)
    timed(lambda c: c * C, tiny, 2 * 8 * 128 * 4, 'overhead_tiny_scan',
          results)

    # ---- XLA controls ----
    timed(lambda c: c * C, x, 2 * nbytes, 'xla_copy_mul', results)
    timed(lambda c: c + c.sum() * 1e-30, x, 2 * nbytes,
          'xla_copy_plus_reduce', results)

    # ---- BlockSpec auto-pipelined copy ----
    def bs_copy(te, arr, fm=False):
        shape = arr.shape
        if fm:
            grid = (shape[1] // te,)
            spec = pl.BlockSpec((shape[0], te), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        else:
            grid = (shape[0] // te,)
            spec = pl.BlockSpec((te, shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def kern(i_ref, o_ref):
            o_ref[:] = i_ref[:] * C

        call = pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(grid=grid, in_specs=[spec],
                                  out_specs=spec),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )
        return call

    for te in (128, 256, 512, 1024):
        timed(bs_copy(te, x), x, 2 * nbytes, f'pl_blockspec_em_te{te}',
              results)
    for te in (256, 512):
        timed(bs_copy(te, xT, fm=True), xT, 2 * nbytes,
              f'pl_blockspec_fm_te{te}', results)

    # ---- BlockSpec read-only (accumulating reduce) ----
    def bs_read(te):
        grid = (E // te,)

        def kern(i_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
            o_ref[:] += jnp.sum(i_ref[:], axis=0, keepdims=True)

        call = pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[pl.BlockSpec((te, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, D), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        )

        def step(c):
            r = call(c)
            return c + r[0, 0] * 1e-30

        return step

    timed(bs_read(256), x, nbytes, 'pl_blockspec_read_te256', results)
    timed(bs_read(512), x, nbytes, 'pl_blockspec_read_te512', results)

    # ---- manual-DMA copy, S slots, fully unrolled ----
    def manual_copy(te, S, split=1):
        T = E // te
        csz = D // split

        def kern(x_hbm, y_hbm, ibuf, obuf, lsem, ssem):
            def load(t):
                return [pltpu.make_async_copy(
                    x_hbm.at[t, :, s * csz:(s + 1) * csz],
                    ibuf.at[t % S, :, s * csz:(s + 1) * csz],
                    lsem.at[t % S, s]) for s in range(split)]

            def store(t):
                return [pltpu.make_async_copy(
                    obuf.at[t % S, :, s * csz:(s + 1) * csz],
                    y_hbm.at[t, :, s * csz:(s + 1) * csz],
                    ssem.at[t % S, s]) for s in range(split)]

            for t in range(min(S, T)):
                for cp in load(t):
                    cp.start()
            for t in range(T):
                for cp in load(t):
                    cp.wait()
                if t >= S:
                    for cp in store(t - S):
                        cp.wait()
                obuf[t % S] = ibuf[t % S] * C
                for cp in store(t):
                    cp.start()
                if t + S < T:
                    for cp in load(t + S):
                        cp.start()
            for t in range(max(T - S, 0), T):
                for cp in store(t):
                    cp.wait()

        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                pltpu.VMEM((S, te, D), jnp.float32),
                pltpu.VMEM((S, te, D), jnp.float32),
                pltpu.SemaphoreType.DMA((S, split)),
                pltpu.SemaphoreType.DMA((S, split)),
            ]),
            out_shape=jax.ShapeDtypeStruct((T, te, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

        def step(c):
            return call(c.reshape(T, te, D)).reshape(E, D)

        return step

    for te, S in ((256, 2), (256, 3), (256, 4), (512, 2), (512, 4),
                  (1024, 2), (1024, 3)):
        timed(manual_copy(te, S), x, 2 * nbytes,
              f'pl_manual_te{te}_s{S}', results)
    timed(manual_copy(256, 4, split=2), x, 2 * nbytes,
          'pl_manual_te256_s4_split2', results)
    timed(manual_copy(512, 4, split=4), x, 2 * nbytes,
          'pl_manual_te512_s4_split4', results)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
