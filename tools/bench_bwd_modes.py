"""On-chip A/B: cg_node backward modes, XLA composition vs the
gather-fused Pallas kernels (round 5), at bench shapes.

SevenNet-0 interior-block shapes: x 128x0e+64x1e+32x2e, SH lmax 2,
21504 edges over 776 nodes (batch-8 HfO2 fine-tune batch).  Fetch-forced
scan timing per PROFILE.md.
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
    from sevennet_finetuning_tpu.ops.tensor_product import uvu_tp_spec

    spec = uvu_tp_spec(
        Irreps('128x0e+64x1e+32x2e'),
        Irreps('1x0e+1x1e+1x2e'),
        Irreps('128x0e+128x1e+128x2e'),
    )
    layout = layout_from_spec(spec)
    E, N = 21504, 776
    print(f'dims: x={layout.dim_x} sh={layout.dim_sh} w={layout.dim_w} '
          f'msg={layout.dim_msg}', flush=True)

    rng = np.random.default_rng(0)
    ybar = jnp.asarray(rng.standard_normal((N, layout.dim_msg)),
                       jnp.float32)
    x = jnp.asarray(rng.standard_normal((E, layout.dim_x)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((E, layout.dim_sh)),
                     jnp.float32)
    w = jnp.asarray(rng.standard_normal((E, layout.dim_w)), jnp.float32)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    dst[-128:] = N
    dst = jnp.asarray(dst)

    legs = {'xn': (ybar, sh, w), 'shn': (ybar, x, w),
            'wn': (ybar, x, sh), 'agg': (x, sh, w)}

    results = {}
    for use_kernel in (False, True):
        os.environ['SEVENN_FUSED_BWD'] = '1' if use_kernel else '0'
        tag = 'fused' if use_kernel else 'xla'
        for mode in ('xn', 'shn', 'wn', 'agg'):
            a, b, c = legs[mode]

            @jax.jit
            def run(a, b, c, _mode=mode):
                def body(carry, _):
                    out = fca.cg_node_apply(_mode, a * carry, b, c, dst,
                                            layout, N)
                    return 1.0 + out.reshape(-1)[0] * 1e-30, None
                s, _ = jax.lax.scan(body, jnp.float32(1.0), None,
                                    length=N_IT)
                out = fca.cg_node_apply(_mode, a * s, b, c, dst,
                                        layout, N)
                return jnp.sum(out * out)

            t0 = time.time()
            chk = float(run(a, b, c))
            compile_s = time.time() - t0
            t0 = time.time()
            float(run(a, b, c))
            dt = (time.time() - t0) / (N_IT + 1) * 1e3
            results[f'{mode}_{tag}'] = {'ms': round(dt, 3),
                                        'checksum': chk,
                                        'compile_s': round(compile_s, 1)}
            print(f'{mode:4s} {tag:5s} {dt:7.3f} ms  chk={chk:.8e}',
                  flush=True)

    for mode in ('xn', 'shn', 'wn', 'agg'):
        a = results[f'{mode}_xla']['checksum']
        b = results[f'{mode}_fused']['checksum']
        rel = abs(a - b) / max(abs(a), 1e-30)
        print(f'{mode}: checksum rel diff {rel:.2e}', flush=True)
        results[f'{mode}_relerr'] = rel

    print(json.dumps(results))


if __name__ == '__main__':
    main()
