"""Ablation probe for the fused MT kernel: where do the per-tile
microseconds go?  Three kernel variants over identical synthetic inputs
(T tiles, nsb super-blocks each, real bunny gtab rows):

  full      — production path: 32 per-leaf DMAs per super-block (issue +
              drain) + 4 HIGHEST matmuls + epilogue
  bigdma    — ONE contiguous (128, 128) DMA per super-block (leaf ids
              ignored): isolates the per-leaf DMA issue/drain scalar cost
  nodma     — no DMA at all, matmuls run on whatever is in the buffer:
              isolates the math + epilogue cost

full - bigdma = per-leaf DMA scalar-loop cost; bigdma - nodma = cost of
one bulk DMA; nodma = math+epilogue.  Run standalone on the TPU.
"""

import functools
import time

import numpy as np


def main(T=1600, keys_per_tile=64, k_cap=256):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tinybvh_tpu.api import BVH
    from tinybvh_tpu.io.loaders import load_bin
    from tinybvh_tpu.traverse import packet2 as p2

    tris = load_bin("/root/reference/testdata/bunny.bin")
    bvh = BVH(tris)
    aux = bvh.packet_aux
    L = aux.n_leaves
    print("leaves:", L, "tiles:", T, "keys/tile:", keys_per_tile,
          flush=True)

    rng = np.random.RandomState(0)
    keys = np.full((T, k_cap), p2._I32MAX, np.int32)
    # CLUSTERED keys (a random base run per tile), mimicking production
    # culls where a tile's survivors come from a few contiguous BFS
    # blocks; fully random keys measured 10x worse DMA time than the
    # production path ever shows
    base = rng.randint(0, max(1, L - keys_per_tile), (T, 1))
    keys[:, :keys_per_tile] = base + np.arange(keys_per_tile)
    counts = np.full((T,), keys_per_tile, np.int32)
    nb = k_cap // 32
    lbg = np.zeros((T, 1, nb), np.float32)
    lbg[:, 0, (keys_per_tile + 31) // 32:] = np.inf
    tmax = np.full((T, 1), 1e30, np.float32)
    o_t = rng.randn(T, 3, 256).astype(np.float32)
    d_t = rng.randn(T, 3, 256).astype(np.float32)

    keys, counts, lbg, tmax, o_t, d_t = map(
        jnp.asarray, (keys, counts, lbg, tmax, o_t, d_t))

    def run(variant):
        kern = functools.partial(
            _ablation_kernel, k_cap=k_cap, variant=variant,
            leaf_bits=p2._LEAF_BITS)
        tbm = 8
        return pl.pallas_call(
            kern,
            grid=(T // tbm,),
            in_specs=[
                pl.BlockSpec((tbm, 1, k_cap), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tbm, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tbm, 1, nb), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tbm, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tbm, 3, 256), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tbm, 3, 256), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=(
                jax.ShapeDtypeStruct((T, 1, 256), jnp.float32),
                jax.ShapeDtypeStruct((T, 1, 256), jnp.int32),
            ),
            out_specs=(
                pl.BlockSpec((tbm, 1, 256), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tbm, 1, 256), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * 128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 32)),
            ],
        )(keys.reshape(T, 1, k_cap), counts.reshape(T, 1, 1), lbg,
          tmax.reshape(T, 1, 1), o_t, d_t, aux.gtab_pad)

    fns = {v: jax.jit(functools.partial(run, v))
           for v in ("full", "seg8", "seg32", "bigdma", "nodma", "bf16",
                     "mathonly", "skeleton")}
    for name, fn in fns.items():
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(10)]
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        np.asarray(jnp.ravel(leaf)[:1])
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:8s} {dt*1e3:7.2f} ms  ({dt/T*1e6:.2f} us/tile)",
              flush=True)
        time.sleep(2)


def _ablation_kernel(keys_ref, cnt_ref, lbg_ref, tmax_ref, o_ref, d_ref,
                     gtab_ref, t_ref, i_ref, buf_ref, sem_ref, *,
                     k_cap, variant, leaf_bits):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tinybvh_tpu.traverse.packet2 import TRI_BLK, TILE
    _LPB = TRI_BLK // 4   # this probe's keys are per-LEAF (pre-segment era)

    nb = lbg_ref.shape[2]
    tbm = keys_ref.shape[0]
    max_leaf_row = gtab_ref.shape[0] // 4 - 1

    def tile_body(ti, _):
        count = jnp.minimum(cnt_ref[ti, 0, 0], k_cap)
        nsb = (count + _LPB - 1) // _LPB
        d3 = d_ref[pl.ds(ti, 1)][0]
        o3 = o_ref[pl.ds(ti, 1)][0]
        ox, oy, oz = o3[0:1], o3[1:2], o3[2:3]
        dx, dy, dz = d3[0:1], d3[1:2], d3[2:3]
        cx = oy * dz - oz * dy
        cy = oz * dx - ox * dz
        cz = ox * dy - oy * dx
        ones = jnp.ones((1, TILE), jnp.float32)
        zeros = jnp.zeros((2, TILE), jnp.float32)
        f = jnp.concatenate([d3, cx, cy, cz, o3, ones, zeros], axis=0)
        tmax = tmax_ref[ti, 0, 0]
        rows = lax.broadcasted_iota(jnp.int32, (TRI_BLK, 1), 0)

        def leaf_dma(sb, i, slot):
            ki = sb * _LPB + i
            leaf = jnp.minimum(
                keys_ref[ti, 0, ki] & ((1 << leaf_bits) - 1), max_leaf_row)
            return pltpu.make_async_copy(
                gtab_ref.at[pl.ds(leaf * 4, 4), :],
                buf_ref.at[pl.ds(slot * TRI_BLK + i * 4, 4), :],
                sem_ref.at[slot, i],
            )

        def big_dma(sb, slot):
            return pltpu.make_async_copy(
                gtab_ref.at[pl.ds(0, TRI_BLK), :],
                buf_ref.at[pl.ds(slot * TRI_BLK, TRI_BLK), :],
                sem_ref.at[slot, 0],
            )

        def seg_dma(sb, i, slot, span):
            # ONE DMA covering `span` consecutive leaves, anchored at the
            # first key of the segment (clustered keys make this fetch the
            # right rows; production needs the cull to emit aligned
            # segment worklists)
            ki = sb * _LPB + i * span
            leaf = jnp.minimum(
                keys_ref[ti, 0, ki] & ((1 << leaf_bits) - 1),
                max_leaf_row - (span - 1))
            return pltpu.make_async_copy(
                gtab_ref.at[pl.ds(leaf * 4, 4 * span)],
                buf_ref.at[pl.ds(slot * TRI_BLK + i * 4 * span, 4 * span)],
                sem_ref.at[slot, i],
            )

        _span = {"seg8": 8, "seg32": 32}.get(variant, 0)

        def issue(sb, slot):
            if variant == "full":
                for i in range(_LPB):
                    leaf_dma(sb, i, slot).start()
            elif variant == "bigdma":
                big_dma(sb, slot).start()
            elif _span:
                for i in range(_LPB // _span):
                    seg_dma(sb, i, slot, _span).start()

        def drain(sb, slot):
            if variant == "full":
                for i in range(_LPB):
                    leaf_dma(sb, i, slot).wait()
            elif variant == "bigdma":
                big_dma(sb, slot).wait()
            elif _span:
                for i in range(_LPB // _span):
                    seg_dma(sb, i, slot, _span).wait()

        if variant == "skeleton":
            # per-tile fixed cost floor: loads + stores, no walk at all
            t_ref[pl.ds(ti, 1), 0, :] = (jnp.zeros((1, TILE), jnp.float32)
                                         + tmax + f[0:1])
            i_ref[pl.ds(ti, 1), 0, :] = jnp.full((1, TILE), count,
                                                 jnp.int32)
            return 0

        @pl.when(nsb > 0)
        def _():
            issue(0, 0)

        def cond(state):
            return state[1]

        def body(state):
            sb, _, best_t, best_i = state
            slot = lax.rem(sb, 2)
            drain(sb, slot)
            t_far = jnp.max(best_t)
            gate_n = lbg_ref[ti, 0, jnp.minimum(sb + 1, nb - 1)]
            nxt = (sb + 1 < nsb) & jnp.logical_not(gate_n > t_far)

            @pl.when(nxt)
            def _():
                issue(sb + 1, 1 - slot)

            off = pl.multiple_of(slot * TRI_BLK, TRI_BLK)
            g = buf_ref[pl.ds(off, TRI_BLK), :]
            prec = (lax.Precision.DEFAULT if variant == "bf16"
                    else lax.Precision.HIGHEST)
            det = jnp.dot(g[:, 0:12], f,
                          preferred_element_type=jnp.float32, precision=prec)
            up = jnp.dot(g[:, 12:24], f,
                         preferred_element_type=jnp.float32, precision=prec)
            vp = jnp.dot(g[:, 24:36], f,
                         preferred_element_type=jnp.float32, precision=prec)
            tp = jnp.dot(g[:, 36:48], f,
                         preferred_element_type=jnp.float32, precision=prec)
            if variant == "mathonly":
                # matmuls + minimal fold only: sizes the epilogue share
                m0 = jnp.min(det + up + vp + tp, axis=0).reshape(1, TILE)
                best_t = jnp.minimum(best_t, m0)
                return sb + 1, (sb + 1 < nsb), best_t, best_i
            s = jnp.where(det >= 0, 1.0, -1.0)
            ad = det * s
            us = up * s
            vs = vp * s
            ts = tp * s
            live = (sb * TRI_BLK + rows) < count * 4
            hit = ((us >= 0) & (vs >= 0) & (us + vs <= ad) & (ts > 0)
                   & (ad > 0))
            inv_ad2 = 1.0 / jnp.where(ad > 0, ad, 1.0)
            tt = jnp.where(hit & live, ts * inv_ad2, 1e30)
            m = jnp.min(tt, axis=0).reshape(1, TILE)
            am = jnp.argmin(tt, axis=0).astype(jnp.int32).reshape(1, TILE)
            better = m < best_t
            best_t = jnp.where(better, m, best_t)
            best_i = jnp.where(better, sb * TRI_BLK + am, best_i)
            return sb + 1, nxt, best_t, best_i

        init = (jnp.int32(0), nsb > 0,
                jnp.zeros((1, TILE), jnp.float32) + tmax,
                jnp.zeros((1, TILE), jnp.int32))
        _, _, best_t, best_i = lax.while_loop(cond, body, init)
        t_ref[pl.ds(ti, 1), 0, :] = best_t
        i_ref[pl.ds(ti, 1), 0, :] = best_i
        return 0

    lax.fori_loop(0, tbm, tile_body, 0)


if __name__ == "__main__":
    import sys

    main(keys_per_tile=int(sys.argv[1]) if len(sys.argv) > 1 else 64)
