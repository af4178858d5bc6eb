"""Micro-benchmark: incidence-transpose (scatter-add) strategies on TPU.

The training-mode separable-aggregation tail backward is dominated by the
gather transpose: scatter-add of a (B, M, K, C) cotangent into the (B, N, C)
support features.  This tool times the candidate implementations at encoder
stage shapes so the tail's custom VJP can pick the fastest exact one:

  scatter      — XLA autodiff default (`.at[].add()` / take_along_axis VJP)
  sorted       — pre-sorted by support id + scatter(indices_are_sorted)
  cumsumdiff   — sort once, fp32 cumulative sum + segment-boundary gather
                 differences (error ~ eps·sqrt(MK) of the FULL-array sum —
                 inexact, reported for reference)
  tail         — fwd+bwd of the real tail (gather → +dp → BN(train) → relu
                 → max over K) for context

Usage: python tools/scatter_micro_bench.py [B M N K C]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    args = [int(a) for a in sys.argv[1:]] or []
    B, M, N, K, C = (args + [4, 6000, 24000, 32, 128][len(args):])[:5]
    print(f"shapes: B={B} M={M} N={N} K={K} C={C}")
    rng = np.random.RandomState(0)
    # ball-query-like indices: spatially local (windowed) support ids
    centers = rng.randint(0, N, (B, M, 1))
    offs = rng.randint(-64, 65, (B, M, K))
    idx = jnp.asarray(np.clip(centers + offs, 0, N - 1).astype(np.int32))
    ct = jnp.asarray(rng.randn(B, M, K, C).astype(np.float32))
    hf = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def timeit(name, fn, *a):
        # axon: block_until_ready under-reports — force a scalar host fetch
        # (one per timed loop; ~1 ms roundtrip amortized over `it` runs)
        def wrapped(*a):
            o = fn(*a)
            return o, jnp.sum(o) * 0.0
        f = jax.jit(wrapped)
        out, z = f(*a)
        _ = float(z)
        t0 = time.perf_counter()
        it = 10
        for _ in range(it):
            out, z = f(*a)
        _ = float(z)
        dt = (time.perf_counter() - t0) / it * 1e3
        print(f"{name:12s} {dt:8.2f} ms")
        return out, dt

    # 1. plain scatter-add
    def scatter(ct, idx):
        flat = ct.reshape(B, M * K, C)
        ids = idx.reshape(B, M * K)
        out = jnp.zeros((B, N, C), jnp.float32)
        bi = jnp.arange(B)[:, None]
        return out.at[bi, ids].add(flat)

    ref, _ = timeit("scatter", scatter, ct, idx)

    # 2. sorted scatter (sort in the timed region: no precompute available
    #    to a single-block VJP; stage-shared idx would amortize the argsort)
    def sorted_scatter(ct, idx):
        flat = ct.reshape(B, M * K, C)
        ids = idx.reshape(B, M * K)
        order = jnp.argsort(ids, axis=1)
        sids = jnp.take_along_axis(ids, order, axis=1)
        sct = jnp.take_along_axis(flat, order[..., None], axis=1)
        out = jnp.zeros((B, N, C), jnp.float32)
        bi = jnp.arange(B)[:, None]
        return out.at[bi, sids].add(sct, indices_are_sorted=True)

    out2, _ = timeit("sorted", sorted_scatter, ct, idx)
    print("  sorted allclose:", bool(jnp.allclose(ref, out2, atol=1e-3)))

    # 2b. sorted scatter with the argsort precomputed (stage-shared)
    order_pre = jnp.argsort(idx.reshape(B, M * K), axis=1)

    def sorted_pre(ct, idx, order):
        flat = ct.reshape(B, M * K, C)
        ids = idx.reshape(B, M * K)
        sids = jnp.take_along_axis(ids, order, axis=1)
        sct = jnp.take_along_axis(flat, order[..., None], axis=1)
        out = jnp.zeros((B, N, C), jnp.float32)
        bi = jnp.arange(B)[:, None]
        return out.at[bi, sids].add(sct, indices_are_sorted=True)

    out2b, _ = timeit("sorted_pre", sorted_pre, ct, idx, order_pre)
    print("  sorted_pre allclose:", bool(jnp.allclose(ref, out2b, atol=1e-3)))

    # 3. cumsum + boundary difference (inexact: fp32 running sum)
    def cumsumdiff(ct, idx, order):
        flat = ct.reshape(B, M * K, C)
        ids = idx.reshape(B, M * K)
        sids = jnp.take_along_axis(ids, order, axis=1)
        sct = jnp.take_along_axis(flat, order[..., None], axis=1)
        cs = jnp.cumsum(sct, axis=1)
        cs = jnp.concatenate([jnp.zeros((B, 1, C)), cs], axis=1)
        # segment [start_n, end_n) in sorted order per support id
        pos = jnp.arange(M * K)
        start = jnp.zeros((B, N), jnp.int32)
        bi = jnp.arange(B)[:, None]
        # first occurrence: scatter-min of positions; end: scatter-max + 1
        start = jnp.full((B, N), M * K, jnp.int32).at[bi, sids].min(
            jnp.broadcast_to(pos, (B, M * K)).astype(jnp.int32),
            indices_are_sorted=True)
        end = jnp.zeros((B, N), jnp.int32).at[bi, sids].max(
            (jnp.broadcast_to(pos, (B, M * K)) + 1).astype(jnp.int32),
            indices_are_sorted=True)
        end = jnp.maximum(end, start)
        g_end = jnp.take_along_axis(cs, end[..., None], axis=1)
        g_start = jnp.take_along_axis(cs, start[..., None], axis=1)
        return g_end - g_start

    out3, _ = timeit("cumsumdiff", cumsumdiff, ct, idx, order_pre)
    err = float(jnp.max(jnp.abs(ref - out3)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"  cumsumdiff rel err: {err:.2e}")

    # 3b. dtype axis: is the engine row-bound or byte-bound?
    def scatter_bf16(ct, idx):
        flat = ct.reshape(B, M * K, C).astype(jnp.bfloat16)
        ids = idx.reshape(B, M * K)
        out = jnp.zeros((B, N, C), jnp.bfloat16)
        bi = jnp.arange(B)[:, None]
        return out.at[bi, ids].add(flat)

    timeit("scatter_bf16", scatter_bf16, ct, idx)

    def gather_bf16(hf, idx):
        h16 = hf.astype(jnp.bfloat16)
        return jnp.take_along_axis(
            h16, idx.reshape(B, M * K, 1), axis=1).reshape(B, M, K, C)

    timeit("gather_bf16", gather_bf16, hf, idx)

    def gather_f32(hf, idx):
        return jnp.take_along_axis(
            hf, idx.reshape(B, M * K, 1), axis=1).reshape(B, M, K, C)

    timeit("gather_f32", gather_f32, hf, idx)

    # 4. the real tail fwd+bwd for context
    wdp = jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.1)
    sup = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    q = sup[:, :M]
    scale = jnp.ones((C,))
    bias = jnp.zeros((C,))

    def tail_loss(hf):
        hj = jnp.take_along_axis(
            hf, idx.reshape(B, M * K, 1), axis=1).reshape(B, M, K, C)
        pj = jnp.take_along_axis(
            sup, idx.reshape(B, M * K, 1), axis=1).reshape(B, M, K, 3)
        dp = pj - q[:, :, None, :]
        h = hj + dp @ wdp
        mu = jnp.mean(h, axis=(0, 1, 2))
        var = jnp.maximum(jnp.mean(h * h, axis=(0, 1, 2)) - mu * mu, 0.0)
        y = (h - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        y = jax.nn.relu(y)
        return jnp.sum(jnp.max(y, axis=2))

    timeit("tail fwd", tail_loss, hf)
    timeit("tail f+b", lambda x: jax.grad(tail_loss)(x), hf)

    # 5. fused gather-reduce forward (never materializes (B,M,K,C))
    def gmax(hf):
        hj = jnp.take_along_axis(
            hf, idx.reshape(B, M * K, 1), axis=1).reshape(B, M, K, C)
        return jnp.sum(jnp.max(hj, axis=2))

    timeit("gather-max", gmax, hf)
    timeit("gmax f+b", lambda x: jax.grad(gmax)(x), hf)


if __name__ == "__main__":
    main()
