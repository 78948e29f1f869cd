"""Bench the deformable-warp implementations on the real TPU.

Compares the XLA one-hot-matmul path (`ops/deform_conv.py`) against the
Pallas kernel (`ops/pallas_deform.py`) at TRACE's production shape
(clip of 8+1 frames, 128x128x32 features, 8 deform groups), f32 and bf16,
and checks parity on device. Timing uses the checksum-fetch barrier
(utils/profiling.force) because block_until_ready is not a reliable
barrier on the axon tunnel.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from romp_tpu.ops.deform_conv import deform_conv2d
    from romp_tpu.ops.pallas_deform import deform_conv2d_pallas

    B, H, W, C, G = 8, 128, 128, 32, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    off = jnp.asarray((rng.randn(B, H, W, G * 2 * 9) * 2.0
                       ).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)

    def timed(fn, *args, iters=20):
        f = jax.jit(fn)
        out = f(*args)
        float(jnp.sum(out))  # compile + settle
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        s = float(jnp.sum(out))  # checksum fetch = barrier
        dt = (time.time() - t0) / iters * 1000
        return dt, s, out

    results = {}
    for dt_name, cast in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        xx, ww = x.astype(cast), w.astype(cast)
        t_xla, s_xla, o_xla = timed(
            lambda a, o, b: deform_conv2d(a, o, b, G), xx, off, ww)
        t_pal, s_pal, o_pal = timed(
            lambda a, o, b: deform_conv2d_pallas(a, o, b, G), xx, off, ww)
        rel = float(jnp.max(jnp.abs(o_pal - o_xla))
                    / (jnp.max(jnp.abs(o_xla)) + 1e-9))
        results[dt_name] = (t_xla, t_pal, rel)
        print(f"[{dt_name}] xla {t_xla:.2f} ms  pallas {t_pal:.2f} ms  "
              f"speedup {t_xla / t_pal:.2f}x  max-rel-diff {rel:.2e}",
              flush=True)
    return results


if __name__ == "__main__":
    main()
