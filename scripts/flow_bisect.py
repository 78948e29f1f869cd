"""Bisect RAFT's per-iteration cost on the chip: lookup vs update block.

Standalone jitted calls all hit the tunnel's ~30 ms dispatch floor, so each
piece is timed IN-JIT: a lax.scan runs the piece N times with a data
dependence between iterations, and the per-iteration cost is the marginal
time between a long and a short scan — (t(N_hi) - t(N_lo)) / (N_hi - N_lo).

Pieces, at the TRACE parity config (B=8 pairs, 64x64 features, bf16 compute,
f32 correlation volume):

  lookup_*         the two lookup formulations standalone (all-channel
                   consumption — a sliced feedback lets XLA prune levels)
  full_{form}_{dt} one whole refinement iteration per lookup formulation
                   x correlation-volume dtype (the decision metric)
  update_block     motion encoder + SepConvGRU + flow head
  build_pyramid    all-pairs matmul + pools (per-clip, not per-iteration)

Run on TPU:  python scripts/flow_bisect.py
CPU check:   JAX_PLATFORMS=cpu python scripts/flow_bisect.py --check
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--reps", type=int, default=5,
                    help="timed repetitions per measurement (median)")
    ap.add_argument("--only", default="",
                    help="comma-separated substring filter on row names "
                         "(e.g. 'packed'); empty = measure everything")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        args.reps = 2

    from romp_tpu.models.layers import ParamStore
    from romp_tpu.models.raft import (
        CDIM, CORR_RADIUS, HDIM, _flow_head, _motion_encoder, _sep_conv_gru,
        build_corr_pyramid, corr_lookup, corr_lookup_onehot,
        corr_lookup_packed, corr_lookup_rowgather, init_raft_params,
        pack_corr_pyramid,
    )

    B = 8                      # pairs per clip
    H = W = 64 if not args.check else 16
    N_LO, N_HI = (2, 10) if not args.check else (1, 3)
    params = init_raft_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    fmap1 = jnp.asarray(rng.rand(B, H, W, 256).astype(np.float32))
    fmap2 = jnp.asarray(rng.rand(B, H, W, 256).astype(np.float32))
    coords0 = jnp.asarray(
        (rng.rand(B, H, W, 2) * np.asarray([W, H])).astype(np.float32))
    net0 = jnp.asarray(rng.rand(B, H, W, HDIM).astype(np.float32))
    inp = jnp.asarray(rng.rand(B, H, W, CDIM).astype(np.float32))

    force = lambda a: float(jnp.sum(a[..., 0].astype(jnp.float32)))

    pyramid = jax.jit(build_corr_pyramid)(fmap1, fmap2)
    pyramid = jax.tree_util.tree_map(lambda a: a.block_until_ready(), pyramid)
    ncorr = 4 * (2 * CORR_RADIUS + 1) ** 2

    def med(fn, *a):
        fn(*a)                              # warm (compile)
        force(fn(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            force(fn(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    def marginal(make_body):
        """make_body: () -> (carry0, ctx, body). Times body per-iteration.

        ctx carries every device array the body reads (pyramid, params,
        static inputs) as a jit ARGUMENT: closed-over device arrays are
        baked into the program as constants, and on the remote-compile
        tunnel a 0.5 GB constant-laden proto bounces with HTTP 413.
        """
        carry0, ctx, body = make_body()
        outs = {}
        for n in (N_LO, N_HI):
            @jax.jit
            def run(c, ctx, _n=n):
                c, _ = jax.lax.scan(lambda c, _: (body(c, ctx), None), c,
                                    None, length=_n)
                return jax.tree_util.tree_leaves(c)[0]
            outs[n] = med(run, carry0, ctx)
        return (outs[N_HI] - outs[N_LO]) / (N_HI - N_LO)

    rows = {"B": B, "H": H, "corr_dtype": str(pyramid[0].dtype)}
    only = [s for s in args.only.split(",") if s]

    def want(name):
        return not only or any(s in name for s in only)

    # --- lookup formulations: carry coords, derive next coords from corr.
    # The fed-back signal MUST consume every output channel (mean over all
    # 324), or XLA dead-code-eliminates the unread taps/levels and the
    # number measures a pruned lookup (levels 1-3 entirely dead for a
    # corr[..., :2] feedback — burned us once). ---
    def lookup_body(look, pyr):
        def body(coords, ctx):
            corr = look(ctx["pyr"], coords)
            m = jnp.mean(corr.astype(jnp.float32), axis=-1, keepdims=True)
            return coords + 1e-4 * jnp.concatenate([m, m], axis=-1)
        return coords0, {"pyr": pyr}, body

    pyramid_bf16 = jax.jit(
        lambda a, b: build_corr_pyramid(a, b, out_dtype=jnp.bfloat16))(
            fmap1, fmap2)
    pyramid_bf16 = jax.tree_util.tree_map(
        lambda a: a.block_until_ready(), pyramid_bf16)

    if want("lookup_onehot"):
        rows["lookup_onehot_ms_iter"] = round(
            marginal(lambda: lookup_body(corr_lookup_onehot, pyramid)), 2)
    if want("lookup_rowgather"):
        rows["lookup_rowgather_ms_iter"] = round(
            marginal(lambda: lookup_body(corr_lookup_rowgather, pyramid)), 2)

    # packed variant: the pyramid is packed ONCE outside the scan (as
    # raft_refine does); the body sees the (buffer, dims) pair.
    def packed_lookup_body(pyr):
        buf, dims = jax.jit(pack_corr_pyramid)(pyr)
        buf = buf.block_until_ready()

        def body(coords, ctx):
            corr = corr_lookup_packed((ctx["buf"], dims), coords)
            m = jnp.mean(corr.astype(jnp.float32), axis=-1, keepdims=True)
            return coords + 1e-4 * jnp.concatenate([m, m], axis=-1)
        return coords0, {"buf": buf}, body

    if want("lookup_packed"):
        rows["lookup_packed_ms_iter"] = round(
            marginal(lambda: packed_lookup_body(pyramid)), 2)
    if want("lookup_packed_bf16"):
        rows["lookup_packed_bf16_ms_iter"] = round(
            marginal(lambda: packed_lookup_body(pyramid_bf16)), 2)

    # --- update block: carry (net, coords); synth corr from net (shape-
    # and FLOP-faithful, keeps the data chain without a real lookup) ---
    def update_make():
        def body(carry, ctx):
            net_c, coords_c = carry
            st = ParamStore(ctx["params"], compute_dtype=jnp.bfloat16)
            corr = jnp.tile(net_c, (1, 1, 1, 3))[..., :ncorr]
            flow = coords_c - ctx["coords0"]
            motion = _motion_encoder(st, flow, corr)
            net_c = _sep_conv_gru(st, net_c,
                                  jnp.concatenate([ctx["inp"], motion], -1))
            delta = _flow_head(st, net_c)
            return net_c, coords_c + delta.astype(jnp.float32)
        return ((net0, coords0),
                {"params": params, "coords0": coords0, "inp": inp}, body)

    if want("update_block"):
        rows["update_block_ms_iter"] = round(marginal(update_make), 2)

    # --- full iteration (lookup + update), as raft_refine runs it ---
    def full_make(look, pyr):
        def body(carry, ctx):
            net_c, coords_c = carry
            st = ParamStore(ctx["params"], compute_dtype=jnp.bfloat16)
            corr = look(ctx["pyr"], coords_c)
            flow = coords_c - ctx["coords0"]
            motion = _motion_encoder(st, flow, corr)
            net_c = _sep_conv_gru(st, net_c,
                                  jnp.concatenate([ctx["inp"], motion], -1))
            delta = _flow_head(st, net_c)
            return net_c, coords_c + delta.astype(jnp.float32)
        return ((net0, coords0),
                {"params": params, "coords0": coords0, "inp": inp,
                 "pyr": pyr}, body)

    for name, look in (("onehot", corr_lookup_onehot),
                       ("rowgather", corr_lookup_rowgather)):
        for dt, pyr in (("f32", pyramid), ("bf16", pyramid_bf16)):
            if want(f"full_{name}_{dt}"):
                rows[f"full_{name}_{dt}_ms_iter"] = round(
                    marginal(lambda: full_make(look, pyr)), 2)

    def full_packed_make(pyr):
        buf, dims = jax.jit(pack_corr_pyramid)(pyr)
        buf = buf.block_until_ready()

        def body(carry, ctx):
            net_c, coords_c = carry
            st = ParamStore(ctx["params"], compute_dtype=jnp.bfloat16)
            corr = corr_lookup_packed((ctx["buf"], dims), coords_c)
            flow = coords_c - ctx["coords0"]
            motion = _motion_encoder(st, flow, corr)
            net_c = _sep_conv_gru(st, net_c,
                                  jnp.concatenate([ctx["inp"], motion], -1))
            delta = _flow_head(st, net_c)
            return net_c, coords_c + delta.astype(jnp.float32)
        return ((net0, coords0),
                {"params": params, "coords0": coords0, "inp": inp,
                 "buf": buf}, body)

    for dt, pyr in (("f32", pyramid), ("bf16", pyramid_bf16)):
        if want(f"full_packed_{dt}"):
            rows[f"full_packed_{dt}_ms_iter"] = round(
                marginal(lambda: full_packed_make(pyr)), 2)

    # --- per-clip pieces (single calls; floor-dominated but bounded) ---
    if want("build_pyramid"):
        pyr_fn = jax.jit(lambda a, b: build_corr_pyramid(a, b)[0])
        rows["build_pyramid_ms_call"] = round(med(pyr_fn, fmap1, fmap2), 2)

    print(json.dumps(rows, indent=1))
    if args.check:
        print("CHECK OK")


if __name__ == "__main__":
    main()
