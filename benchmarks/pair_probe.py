"""Primitive-op cost probe for a per-ray (ray, row-group) diffuse path.

Exact diffuse is 1.5-2 MRays/s because a 256-ray tile of incoherent
rays genuinely touches ~616 segments (the union), while each RAY only
needs ~10 — per-tile granularity costs ~60x the per-ray work. Any fix
routes around the tile union with per-ray work lists, which on TPU
means one of:

  (a) bucketed ROUNDS: per-ray nearest-group lists; round r traces
      every ray's r-th group via per-tile dedup (tile-shaped, no big
      scatters; cost = rounds x tile-union-per-round + per-round glue);
  (b) pair EXTRACTION: flatten (ray, group) pairs, counting-sort by
      group, trace group-major pair blocks (one mt_resolve_fused "tile"
      per 256 pairs; cost = big scatter/gather glue).

Both decompose into the same primitive ops. This probe times each op
at bunny-diffuse shapes on the real TPU so the design is chosen by
measurement, not guess:

  A. dense (R, G) slab test + top-C nearest-group extraction
  B. per-tile dedupe: lax.sort of (T, 256) i32 rows
  C. mt_resolve_fused at pair shapes (T tiles x 1 super-block each)
  D. scatter (drop mode) of 3.3M packed pairs + 272-bin histogram
  E. gather of (3.3M, 8) ray features
  F. scatter-min fold of 3.3M pair results into R rays
  G. cumsum along R of (R, G) i32 (column-major pair positions)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pair_probe.py
"""

import time

import numpy as np


def _amortize(fn, n=8):
    import jax
    import jax.numpy as jnp

    def barrier(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.ravel(leaf)[:1])

    barrier(fn())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        barrier(outs[-1])
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
        time.sleep(0.8)
    return best


def main():
    from tinybvh_tpu.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse import packet2 as p2

    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    aux = bvh.packet_aux
    jax.block_until_ready(aux.gtab_pad)

    R = 409600
    T = R // 256
    S = aux.n_segs
    GS = 16                      # segments per group (= 256 gtab rows)
    G = -(-S // GS)
    C = 8
    print(f"segs {S}  groups {G} (x{GS} segs = {GS * p2.SEG_ROWS} rows)",
          flush=True)

    # group AABBs from the segment table (host, once)
    lo = np.asarray(aux.leaf_lo)[:, : G * GS].reshape(3, G, GS)
    hi = np.asarray(aux.leaf_hi)[:, : G * GS].reshape(3, G, GS)
    glo = jnp.asarray(lo.min(2).T)           # (G, 3)
    ghi = jnp.asarray(hi.max(2).T)

    rng = np.random.default_rng(0)
    blo, bhi = np.asarray(bvh.aabb[0]), np.asarray(bvh.aabb[1])
    o_np = (rng.random((R, 3), np.float32)
            * (bhi - blo) + blo).astype(np.float32)
    d_np = rng.normal(size=(R, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = jnp.asarray(o_np)
    d = jnp.asarray(d_np)
    rd = jnp.asarray(1.0 / np.where(np.abs(d_np) > 1e-20, d_np, 1e-20))

    # ---- A: dense slab + top-C nearest groups --------------------------
    @jax.jit
    def dense_topc(o, rd):
        t1 = (glo[None] - o[:, None]) * rd[:, None]     # (R, G, 3)
        t2 = (ghi[None] - o[:, None]) * rd[:, None]
        ten = jnp.maximum(jnp.minimum(t1, t2).max(2), 0.0)
        tex = jnp.maximum(t1, t2).min(2)
        ten = jnp.where(tex >= ten, ten, jnp.inf)        # (R, G) entry t
        ids = jnp.zeros((R, C), jnp.int32)
        ets = jnp.zeros((R, C), jnp.float32)
        cur = ten
        for c in range(C):
            a = jnp.argmin(cur, axis=1)
            m = jnp.take_along_axis(cur, a[:, None], axis=1)[:, 0]
            ids = ids.at[:, c].set(
                jnp.where(jnp.isfinite(m), a.astype(jnp.int32), -1))
            ets = ets.at[:, c].set(m)
            cur = cur.at[jnp.arange(R), a].set(jnp.inf)
        ovf = jnp.isfinite(cur.min(1))
        return ids, ets, ovf

    import os
    ids, ets, ovf = dense_topc(o, rd)
    n_hit = float(jnp.mean(jnp.sum(ids >= 0, 1)))
    if os.environ.get("PAIR_PROBE_TOPC"):
        dt = _amortize(lambda: dense_topc(o, rd))
        print(f"A dense+top{C}: {dt*1e3:7.2f} ms   mean groups/ray "
              f"{n_hit:.2f}  ovf {float(jnp.mean(ovf)):.4f}", flush=True)
    else:
        print(f"A (topc measured earlier: 132 ms) mean groups/ray "
              f"{n_hit:.2f}  ovf {float(jnp.mean(ovf)):.4f}", flush=True)

    # ---- B: per-tile dedupe sort ---------------------------------------
    col0 = ids[:, 0].reshape(T, 256)

    @jax.jit
    def tile_sort(x):
        return lax.sort(x, dimension=1)

    dt = _amortize(lambda: tile_sort(col0))
    srt = tile_sort(col0)
    uniq = jnp.sum((srt[:, 1:] != srt[:, :-1]) & (srt[:, 1:] >= 0), 1) + 1
    print(f"B tile sort (T,256): {dt*1e3:7.2f} ms   mean uniq/tile "
          f"{float(jnp.mean(uniq)):.2f} p99 "
          f"{float(jnp.percentile(uniq, 99)):.0f}", flush=True)

    # ---- A1: dense entry-t alone (no extraction) ------------------------
    @jax.jit
    def dense_only(o, rd):
        t1 = (glo[None] - o[:, None]) * rd[:, None]
        t2 = (ghi[None] - o[:, None]) * rd[:, None]
        ten = jnp.maximum(jnp.minimum(t1, t2).max(2), 0.0)
        tex = jnp.maximum(t1, t2).min(2)
        return jnp.where(tex >= ten, ten, jnp.inf)

    dt = _amortize(lambda: dense_only(o, rd))
    print(f"A1 dense entry-t (R,{G}): {dt*1e3:7.2f} ms", flush=True)

    # ---- C: mt_resolve_fused at pair shapes ----------------------------
    for T2, tps in ((1600, 8), (6400, 8), (6400, 32)):
        k_cap = GS
        offs = jnp.tile(
            (jnp.arange(GS, dtype=jnp.int32) * (p2.SEG_ROWS // aux.pack))[None],
            (T2, 1))
        counts = jnp.full((T2,), GS, jnp.int32)
        lbg = jnp.zeros((T2, 1, 1), jnp.float32)
        tmax = jnp.full((T2, 1), 1e30, jnp.float32)
        sel = jnp.arange(T2 * 256, dtype=jnp.int32) % R
        o_t = jnp.transpose(
            (o[sel] - aux.center).reshape(T2, 256, 3), (0, 2, 1))
        d_t = jnp.transpose(d[sel].reshape(T2, 256, 3), (0, 2, 1))
        t0 = jnp.full((T2, 256), 1e30, jnp.float32)
        fn = lambda: p2.mt_resolve_fused(
            offs, counts, lbg, tmax, o_t, d_t, aux.gtab_pad,
            k_cap=k_cap, tri_blk=256, t0=t0, tiles_per_step=tps,
            pack=aux.pack)
        dt = _amortize(fn)
        print(f"C pair-MT T={T2} tps={tps} (1 blk/tile): {dt*1e3:7.2f} ms   "
              f"{dt / T2 * 1e6:.2f} us/tile", flush=True)

    # ---- D: scatter drop + histogram -----------------------------------
    P = R * C
    flat_ids = ids.reshape(P)
    live = flat_ids >= 0
    tgt = jnp.where(live, jnp.arange(P, dtype=jnp.int32) % (P - 7), P * 4)

    @jax.jit
    def scat(v, t):
        out = jnp.zeros((P,), jnp.int32)
        return out.at[t].set(v, mode="drop")

    dt = _amortize(lambda: scat(flat_ids, tgt))
    print(f"D scatter-drop {P/1e6:.1f}M: {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def hist(idv):
        return jnp.zeros((G,), jnp.int32).at[
            jnp.where(idv >= 0, idv, G)].add(1, mode="drop")

    dt = _amortize(lambda: hist(flat_ids))
    print(f"D hist {P/1e6:.1f}M->{G}: {dt*1e3:7.2f} ms", flush=True)

    # ---- E: gather pair features ---------------------------------------
    feat = jnp.concatenate([o, d, rd[:, :2]], axis=1)    # (R, 8)
    pray = jnp.arange(P, dtype=jnp.int32) % R

    @jax.jit
    def gat(f, idx):
        return f[idx]

    dt = _amortize(lambda: gat(feat, pray))
    print(f"E gather ({P/1e6:.1f}M,8): {dt*1e3:7.2f} ms", flush=True)

    # ---- F: scatter-min fold -------------------------------------------
    vals = jnp.abs(ets.reshape(P)) + 1.0

    @jax.jit
    def fold(v, r):
        out = jnp.full((R,), jnp.inf, jnp.float32)
        return out.at[r].min(v, mode="drop")

    dt = _amortize(lambda: fold(vals, pray))
    print(f"F scatter-min {P/1e6:.1f}M->{R/1e3:.0f}k: {dt*1e3:7.2f} ms",
          flush=True)

    # ---- G: cumsum along R of (R, G) -----------------------------------
    bits = (ids[:, 0:1] == jnp.arange(G)[None, :]).astype(jnp.int32)

    @jax.jit
    def csum(b):
        return jnp.cumsum(b, axis=0)

    dt = _amortize(lambda: csum(bits))
    print(f"G cumsum (R,{G}): {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
