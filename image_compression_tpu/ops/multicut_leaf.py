"""Fused Pallas leaf for the matrix-agg hierarchical multicut.

Profiling at production batch sizes (benchmarks/profile_batch.py) showed the
first two hierarchy levels are ~85% of the solver's wall at batch 128
(193 of 226 ms/batch): the XLA path materializes per-round one-hot tensors
([T, E, S] for the leaf pair aggregation, [T, P, S] for every slot-map
apply) in HBM, so those levels are bandwidth-bound. This kernel runs levels
0 and 1 of `ops/multicut_hier._hier_gaec_matrix` entirely in VMEM, one
16x16 supertile block at a time:

  * level-0 pair matrices need NO one-hot at all: entry ranks are the
    identity, so the aggregated [64, 64] matrix is the horizontal weights on
    the +1 band and the vertical weights on the +8 band (bf16-rounded like
    the XLA path, single contribution per pair => bit-exact);
  * GAEC rounds, compaction, the level-1 transition (freeze + child-matrix
    embedding + mid-line edges) and the level-1 rounds are the same
    slot-space matmuls as the XLA path, but their operands never leave VMEM;
  * only the level-1 state (pair matrices [T1, S1, S1], min-pixel vectors,
    pixel ranks, live counts, freeze bookkeeping) is written back — the
    coarser levels continue on the XLA path unchanged.

Decision arithmetic mirrors ops/multicut_hier.py statement by statement
(same bf16 weight rounding, f32 accumulation, first-index argmax, pointer
doubling count), so on integer-valued costs the fused leaf is bit-identical
to both the XLA matrix path and the pixel path (asserted in
tests/test_multicut_leaf.py and re-verified compiled on the TPU backend).
On real-valued costs, f32 sums regroup (the kernel contracts the 4 child
embeddings as separate dots where XLA uses one einsum), the same caveat the
matrix agg already documents vs the pixel agg.

Mosaic constraint that shaped the code: every tensor in the kernel keeps a
SINGLE leading batch dim (the supertile block) — the four level-0 children
are a Python-unrolled list of [tb, S, S] tensors, never a [tb, 4, S, S]
axis. Reshapes that split or merge the tiled (sublane/lane) dims compile to
wrong results or fail ("unsupported shape cast") on this toolchain; with
the per-child unroll the kernel contains no reshapes at all.

Replaces the leaf solve of the reference's RAMA wrapper
(rama_wrapper.cu:52-127; parallel edge contraction per arXiv:2109.01838).

mode="chain" only (the production profile); other modes stay on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S0 = 64  # level-0 slots = 8*8 pixels per leaf tile (caps[0] == 64 required)


def _child_major(arr_t0: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """[T0, ...] leaf-tile-row-major -> [T1, 4, ...] grouped per 16x16
    supertile, quad order (0,0), (0,1), (1,0), (1,1) — the arrangement
    _matrix_transition's reshape/transpose produces for its child tensors."""
    rest = arr_t0.shape[1:]
    return (arr_t0.reshape(th, 2, tw, 2, *rest)
            .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
            .reshape(th * tw, 4, *rest))


def _mid_edge_selectors() -> tuple[np.ndarray, np.ndarray]:
    """Static per-quad selection matrices [4, 64, 32]: column e picks the
    (quad, slot) holding edge e's endpoint pixel. Edge order matches
    _matrix_transition's mid-line build: 16 horizontal edges (y, 7)-(y, 8)
    for y in 0..15, then 16 vertical edges (7, x)-(8, x) for x in 0..15."""
    sel_a = np.zeros((4, 64, 32), np.float32)
    sel_b = np.zeros((4, 64, 32), np.float32)

    def qslot(y, x):  # supertile-local pixel -> (quad, slot)
        return (y // 8) * 2 + (x // 8), (y % 8) * 8 + (x % 8)

    for y in range(16):
        qa, sa = qslot(y, 7)
        qb, sb = qslot(y, 8)
        sel_a[qa, sa, y] = 1.0
        sel_b[qb, sb, y] = 1.0
    for x in range(16):
        qa, sa = qslot(7, x)
        qb, sb = qslot(8, x)
        sel_a[qa, sa, 16 + x] = 1.0
        sel_b[qb, sb, 16 + x] = 1.0
    return sel_a, sel_b


def _leaf_kernel(w0h_ref, w0v_ref, wmid_ref, pix_ref, sel_a_ref, sel_b_ref,
                 rank_ref, gid_ref, sym_ref, m_ref, ncand_ref, over_ref, *,
                 s1: int, r0: int, r1: int, sentinel: float, tb: int):
    """One block of `tb` supertiles. All shapes static; see leaf_levels_fused
    for the block layouts. Mirrors _hier_gaec_matrix levels 0-1 exactly."""
    f32 = jnp.float32

    def pick(ref_or_arr, q):
        """Child q of a [tb, 4, ...] block as [tb, ...] (static slice)."""
        return jax.lax.index_in_dim(ref_or_arr, q, 1, keepdims=False)

    def batch_dot(lhs, rhs, lc: int, rc: int):
        """[tb, ...] x [tb, ...] matmul contracting lhs dim `lc` with rhs
        dim `rc`, batching dim 0, f32 accumulation."""
        return jax.lax.dot_general(
            lhs, rhs, (((lc,), (rc,)), ((0,), (0,))),
            preferred_element_type=f32)

    def plain_dot(lhs, rhs):
        """[tb, I] (or [tb, S, I]) x [I, J] static-matrix product."""
        return jax.lax.dot_general(
            lhs, rhs, (((lhs.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def take(vec, idx, slots):
        """_take_slots mirror: vec[t, idx[t, i]] via a one-hot matmul.
        vec [tb, slots], idx [tb, I] f32-integer-valued; out-of-range
        (incl. -1) reads 0."""
        cols = jax.lax.broadcasted_iota(
            jnp.int32, idx.shape + (slots,), idx.ndim).astype(f32)
        oh = (idx[..., None] == cols).astype(f32)
        return batch_dot(oh, vec, oh.ndim - 1, 1)

    def rounds(sym, m, cmap, slots, nrounds):
        """_matrix_rounds mirror (mode="chain"): GAEC rounds + dense
        re-ranking, all in slot space. sym [tb, S, S], m/cmap [tb, S]."""
        ids = jax.lax.broadcasted_iota(jnp.int32, (tb, slots), 1).astype(f32)
        cols3 = jax.lax.broadcasted_iota(
            jnp.int32, (tb, slots, slots), 2).astype(f32)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (slots, slots), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (slots, slots), 1)
               ).astype(f32)

        for _ in range(nrounds):
            best = jnp.max(sym, axis=-1)
            # first-index argmax (jnp.argmax semantics) as min matching col
            partner = jnp.min(
                jnp.where(sym == best[..., None], cols3, float(slots)),
                axis=-1)
            merge = best > 0.0
            nxt = jnp.where(merge, partner, ids)
            nn = take(nxt, nxt, slots)
            two_cycle = (nn == ids) & (ids < nxt)
            nxt = jnp.where(two_cycle, ids, nxt)
            for _ in range(3):  # chain-mode pointer doublings
                nxt = take(nxt, nxt, slots)
            mm = (cols3 == nxt[..., None]).astype(f32)       # [tb, S, S]
            x = batch_dot(sym, mm, 2, 1)      # sum_b sym[a, b] mm[b, B]
            sym = batch_dot(mm, x, 1, 1)      # sum_a mm[a, A] x[a, B]
            sym = sym * (1.0 - eye)
            m = jnp.min(jnp.where(mm > 0, m[:, :, None], sentinel), axis=1)
            cmap = take(nxt, cmap, slots)

        alive = m < sentinel
        # cumsum along slots via an upper-triangular ones matmul (exact f32)
        upper = (jax.lax.broadcasted_iota(jnp.int32, (slots, slots), 0)
                 <= jax.lax.broadcasted_iota(jnp.int32, (slots, slots), 1)
                 ).astype(f32)
        new_rank = plain_dot(alive.astype(f32), upper) - 1.0
        n_alive = jnp.sum(alive.astype(f32), axis=1)  # == new_rank[:, -1]+1
        cc = (cols3 == jnp.where(alive, new_rank, -1.0)[..., None]
              ).astype(f32)
        x = batch_dot(sym, cc, 2, 1)
        sym = batch_dot(cc, x, 1, 1)
        m = jnp.min(jnp.where(cc > 0, m[:, :, None], sentinel), axis=1)
        cmap = take(new_rank, cmap, slots)
        return sym, m, cmap, n_alive

    # --- level 0: band-structured pair init + rounds, per child ------------
    rows = jax.lax.broadcasted_iota(jnp.int32, (S0, S0), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S0, S0), 1)
    band_r = ((cols == rows + 1) & (rows % 8 != 7)).astype(f32)  # p -> p+1
    band_d = (cols == rows + 8).astype(f32)                      # p -> p+8
    band_rt = ((rows == cols + 1) & (cols % 8 != 7)).astype(f32)
    band_dt = (rows == cols + 8).astype(f32)

    sym4, m4, r4, nal4 = [], [], [], []
    for q in range(4):
        # bf16 rounding mirrors `we = where(active, w.astype(bf16), 0)`;
        # the zero-masked entries round to 0 either way
        whb = pick(w0h_ref[...], q).astype(jnp.bfloat16).astype(f32)
        wvb = pick(w0v_ref[...], q).astype(jnp.bfloat16).astype(f32)
        sym_q = (whb[:, :, None] * band_r[None]
                 + wvb[:, :, None] * band_d[None]
                 + whb[:, None, :] * band_rt[None]
                 + wvb[:, None, :] * band_dt[None])
        m_q = pick(pix_ref[...], q)
        ids0 = jax.lax.broadcasted_iota(jnp.int32, (tb, S0), 1).astype(f32)
        sym_q, m_q, cmap_q, nal_q = rounds(sym_q, m_q, ids0, S0, r0)
        sym4.append(sym_q)
        m4.append(m_q)
        r4.append(cmap_q)  # entry ranks = identity => pixel ranks = cmap
        nal4.append(nal_q)

    # --- level-1 transition: offsets, freeze, embed, mid-line edges --------
    offs = [jnp.zeros((tb,), f32), nal4[0], nal4[0] + nal4[1],
            nal4[0] + nal4[1] + nal4[2]]                      # [tb] each
    total = nal4[0] + nal4[1] + nal4[2] + nal4[3]
    over_ref[...] = jnp.maximum(total - float(s1), 0.0)[:, None
                                                        ].astype(jnp.int32)

    cols_b = jax.lax.broadcasted_iota(jnp.int32, (tb, S0, s1), 2).astype(f32)
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, S0, s1), 1).astype(f32)
    sym1 = jnp.zeros((tb, s1, s1), f32)
    m1 = jnp.full((tb, s1), sentinel, f32)
    rank1 = []
    for q in range(4):
        cand = r4[q] + offs[q][:, None]
        newly = cand >= float(s1)
        minpix = take(m4[q], r4[q], S0)  # each region's smallest pixel id
        gid_ref[:, q, :] = jnp.where(newly, minpix, 0.0).astype(jnp.int32)
        rank1.append(jnp.where(newly, -1.0, cand))            # [tb, 64]

        embq = (cols_b == a_iota + offs[q][:, None, None]).astype(f32)
        xq = batch_dot(sym4[q], embq, 2, 1)                   # [tb, S0, s1]
        sym1 = sym1 + batch_dot(embq, xq, 1, 1)               # [tb, s1, s1]
        m1 = jnp.minimum(m1, jnp.min(
            jnp.where(embq > 0, m4[q][:, :, None], sentinel), axis=1))

    # newly active mid-line edges (post-freeze ranks; frozen = -1 -> no hit)
    a_e = jnp.zeros((tb, 32), f32)
    b_e = jnp.zeros((tb, 32), f32)
    for q in range(4):
        a_e = a_e + plain_dot(
            rank1[q], jax.lax.index_in_dim(sel_a_ref[...], q, 0, False))
        b_e = b_e + plain_dot(
            rank1[q], jax.lax.index_in_dim(sel_b_ref[...], q, 0, False))
    # bf16-round the weights like the XLA path; the one-hot product is
    # computed in f32 then cast (exact: one-hot entries are 0/1 and the
    # weight is already bf16-representable — Mosaic cannot broadcast a
    # minor dim onto bf16 directly)
    we = wmid_ref[...].astype(jnp.bfloat16).astype(f32)
    cols_e = jax.lax.broadcasted_iota(jnp.int32, (tb, 32, s1), 2).astype(f32)
    oh_aw = ((cols_e == a_e[..., None]).astype(f32)
             * we[..., None]).astype(jnp.bfloat16)
    oh_b = (cols_e == b_e[..., None]).astype(jnp.bfloat16)
    pair = batch_dot(oh_aw, oh_b, 1, 1)                       # [tb, s1, s1]
    pair_t = batch_dot(oh_b, oh_aw, 1, 1)                     # its transpose
    sym1 = sym1 + pair + pair_t

    # --- level-1 rounds + compact + pixel remap -----------------------------
    ids1 = jax.lax.broadcasted_iota(jnp.int32, (tb, s1), 1).astype(f32)
    sym1, m1, cmap1, nal1 = rounds(sym1, m1, ids1, s1, r1)
    for q in range(4):
        remap = take(cmap1, rank1[q], s1)
        rank_ref[:, q, :] = jnp.where(rank1[q] < 0, -1.0,
                                      remap).astype(jnp.int32)
    sym_ref[...] = sym1
    m_ref[...] = m1
    ncand_ref[...] = nal1[:, None].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("s1", "r0", "r1", "interpret",
                                             "block"))
def leaf_levels_fused(costs_f32: jnp.ndarray, s1: int, r0: int, r1: int,
                      interpret: bool = False, block: int = 8):
    """Run hierarchy levels 0 (side 8, 64 slots) and 1 (side 16, `s1` slots)
    of the matrix-agg GAEC in one fused Pallas kernel.

    Returns the exact loop state _hier_gaec_matrix carries entering level 2:
    (rank_img [H, W], ncand [T1], frozen [H, W], final_gid [H, W],
    overflow scalar, sym [T1, s1, s1], m [T1, s1]).
    """
    height, width = costs_f32.shape[:2]
    if height % 16 or width % 16:
        raise ValueError(f"fused leaf needs 16-divisible dims, "
                         f"got {height}x{width}")
    th, tw = height // 16, width // 16
    t1 = th * tw
    tb = next(t for t in (block, 8, 4, 2, 1) if block >= t and t1 % t == 0)
    costs = costs_f32.astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    wh0 = jnp.where(xs % 8 != 7, costs[..., 0], 0.0)
    wv0 = jnp.where(ys % 8 != 7, costs[..., 1], 0.0)

    def tiles8(img):  # [H, W] -> [T1, 4, 64] child-major
        t0 = (img.reshape(height // 8, 8, width // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, S0))
        return _child_major(t0, th, tw)

    w0h = tiles8(wh0)
    w0v = tiles8(wv0)
    pix = tiles8((ys * width + xs).astype(jnp.float32))
    wmid_h = (costs[:, 7::16, 0].reshape(th, 16, tw)
              .transpose(0, 2, 1).reshape(t1, 16))
    wmid_v = costs[7::16, :, 1].reshape(th, tw, 16).reshape(t1, 16)
    wmid = jnp.concatenate([wmid_h, wmid_v], axis=1)

    sel_a, sel_b = _mid_edge_selectors()
    kernel = functools.partial(_leaf_kernel, s1=s1, r0=r0, r1=r1,
                               sentinel=float(height * width), tb=tb)
    spec3 = lambda *shape: pl.BlockSpec(  # noqa: E731
        (tb,) + shape, lambda t, _n=len(shape): (t,) + (0,) * _n,
        memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec((4, S0, 32), lambda t: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    rank_cm, gid_cm, sym, m, ncand, over = pl.pallas_call(
        kernel,
        grid=(t1 // tb,),
        in_specs=[spec3(4, S0), spec3(4, S0), spec3(32), spec3(4, S0),
                  sel_spec, sel_spec],
        out_specs=(spec3(4, S0), spec3(4, S0), spec3(s1, s1), spec3(s1),
                   spec3(1), spec3(1)),
        out_shape=(
            jax.ShapeDtypeStruct((t1, 4, S0), jnp.int32),
            jax.ShapeDtypeStruct((t1, 4, S0), jnp.int32),
            jax.ShapeDtypeStruct((t1, s1, s1), jnp.float32),
            jax.ShapeDtypeStruct((t1, s1), jnp.float32),
            jax.ShapeDtypeStruct((t1, 1), jnp.int32),
            jax.ShapeDtypeStruct((t1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(w0h, w0v, wmid, pix, jnp.asarray(sel_a), jnp.asarray(sel_b))

    def untile(cm):  # [T1, 4, 64] child-major -> [H, W]
        return (cm.reshape(th, tw, 2, 2, 8, 8).transpose(0, 2, 4, 1, 3, 5)
                .reshape(height, width))

    rank_img = untile(rank_cm)
    final_gid = untile(gid_cm)
    frozen = rank_img < 0
    overflow = jnp.sum(over).astype(jnp.int32)
    return (rank_img, ncand[:, 0], frozen, final_gid, overflow, sym, m)
