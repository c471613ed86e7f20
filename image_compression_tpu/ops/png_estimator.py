"""On-device PNG/DEFLATE size estimator for masked segments.

Vectorized XLA re-design of the reference CUDA estimator
(png_size_estimator.cu:4-591): an analytic, encode-free model of the PNG byte
size of one segment rendered into its bounding box with everything outside
the segment zeroed. Per segment:

  1. per-row costs of the 5 PNG filters (None/Sub/Up/Avg/Paeth) with
     segment-masked neighbors and bbox-relative boundaries
     (compute_filter_costs_per_row_masked_kernel, :60-182);
  2. min-cost filter per row (:187-205), residual image (:210-275);
  3. per-channel 256-bin histograms over the bbox -> mean entropy H-bar
     (:281-328, :365-392);
  4. run-length match proxy on the residual stream in bbox row-major order
     (:397-463);
  5. S = overhead_base + h + N * b_data / 8,  b_data = (1-f)(H-bar + beta)
     + f*(b_match_token/L-bar + gamma)  (:10-43).

The whole batch of segments is computed at once (vmap over the k_max segment
slots); the reference instead launches 8 kernels per segment in a host loop
with a bbox readback per image (compute_rewards.cu:152-180) — the exact
pattern this rebuild vectorizes away.

Fidelity notes (documented divergences, both strict improvements):
  * run statistics are exact over the stream; the reference splits the stream
    into 65536 GPU-thread chunks (run_length_stats_kernel:416-424), which
    silently zeroes match statistics for any segment smaller than ~256k
    elements;
  * arithmetic in float32 (reference: float64); entropy sums over 256 bins
    are insensitive at this precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _as_int8_abs(r_u8: jnp.ndarray) -> jnp.ndarray:
    """|int8 reinterpretation| of a uint8 residual (the filter-cost heuristic,
    png_size_estimator.cu:120-151)."""
    return jnp.abs(jnp.where(r_u8 >= 128, r_u8 - 256, r_u8))


def _paeth(a, b, c):
    """PNG Paeth predictor (png_size_estimator.cu:47-55)."""
    p = a + b - c
    pa = jnp.abs(p - a)
    pb = jnp.abs(p - b)
    pc = jnp.abs(p - c)
    return jnp.where((pa <= pb) & (pa <= pc), a, jnp.where(pb <= pc, b, c))


def _segment_size_one(img_u8: jnp.ndarray, inverse: jnp.ndarray, k,
                      bbox, count, seg_valid, *, min_pixels: int, l_min: int,
                      beta: float, b_match_token: float, gamma: float,
                      overhead_base: float, adaptive_filter: bool,
                      entropy_correction: str = "none",
                      literal_hist: str = "all",
                      distance_window: int = 0,
                      max_period: int = 96):
    """Estimated PNG size of segment k. img_u8 [H, W, C] int32 (0..255),
    inverse [H, W] compact labels.

    Layout note: all per-element work runs on CHANNEL-INTERLEAVED 2D arrays
    [H, W*C] — the minor axis is the PNG byte stream itself. A [H, W, C]
    layout puts C (= 4) in the minor dimension and uses 4 of the 128 vector
    lanes, which made every elementwise pass here ~30x slower on TPU; in
    the interleaved view the minor axis is 128-1024 wide, the stream
    predecessor is a shift-by-1, and the flat reshape for the run scans is
    contiguous."""
    height, width, channels = img_u8.shape
    x0, y0, x1, y1 = bbox[0], bbox[1], bbox[2], bbox[3]
    w = x1 - x0 + 1
    h = y1 - y0 + 1
    n_cols = width * channels

    img2 = img_u8.reshape(height, n_cols)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, n_cols), 0)
    cs = jax.lax.broadcasted_iota(jnp.int32, (height, n_cols), 1)
    xs2 = cs // channels          # pixel x of each interleaved column
    ch2 = cs % channels           # channel of each interleaved column
    in_bbox2 = (xs2 >= x0) & (xs2 <= x1) & (ys >= y0) & (ys <= y1)

    in_seg2 = jnp.repeat(inverse == k, channels, axis=1)     # [H, W*C]
    cur = jnp.where(in_seg2, img2, 0)

    def shifted(arr, dy, dcol, fill=0):
        pad = ((max(0, dy), max(0, -dy)), (max(0, dcol), max(0, -dcol)))
        out = jnp.pad(arr, pad, constant_values=fill)
        return out[max(0, -dy):max(0, -dy) + height,
                   max(0, -dcol):max(0, -dcol) + n_cols]

    # masked neighbors with bbox-relative existence (x > x0 etc.,
    # compute_filter_costs_per_row_masked_kernel:98-117); the left pixel
    # neighbor of column j is column j - C
    has_left = xs2 > x0
    has_up = ys > y0
    left = jnp.where(has_left & shifted(in_seg2, 0, channels),
                     shifted(img2, 0, channels), 0)
    up = jnp.where(has_up & shifted(in_seg2, 1, 0),
                   shifted(img2, 1, 0), 0)
    upleft = jnp.where(has_left & has_up & shifted(in_seg2, 1, channels),
                       shifted(img2, 1, channels), 0)

    def residual(pred):
        return jnp.mod(cur - pred, 256)

    preds = [jnp.zeros_like(cur), left, up, (left + up) // 2,
             _paeth(left, up, upleft)]

    # per-row filter costs reduced immediately (never stack the residual
    # planes: a [5, H, W*C] temp per segment slot OOMs under vmap)
    if adaptive_filter:
        costs = jnp.stack([
            jnp.sum(_as_int8_abs(residual(p)) * in_bbox2,
                    axis=1) for p in preds])  # [5, H]
        filter_id = jnp.argmin(costs, axis=0)  # [H]; argmin takes lowest index
    else:
        filter_id = jnp.full((height,), 4, jnp.int32)

    # selected residual via elementwise select (fuses; no gather)
    fid = filter_id[:, None]
    res = residual(preds[0])
    for f in (1, 2, 3, 4):
        res = jnp.where(fid == f, residual(preds[f]), res)  # [H, W*C]

    # --- run-length match proxy in bbox row-major, channel-innermost order -
    # the interleaved minor axis IS the stream, so the in-row predecessor is
    # shift-by-1; the row-start column (x0*C) instead continues from the
    # previous bbox row's last stream element (y-1, x1, C-1)
    col_start = x0 * channels
    col_end = x1 * channels + channels - 1
    row_last = jnp.sum(jnp.where(cs == col_end, res, 0), axis=1)
    prev_row_last = jnp.concatenate([jnp.full((1,), -1, res.dtype),
                                     row_last[:-1]])
    prev = jnp.where(cs > col_start, shifted(res, 0, 1, fill=-1),
                     jnp.where(ys > y0, prev_row_last[:, None], -1))
    in_stream = in_bbox2
    same = in_stream & (res == prev) & (prev >= 0)
    is_start = in_stream & ~same

    # Window formulation of the run statistics (scan-free): a stream
    # position is in a run of length >= l_min iff some window of l_min
    # consecutive equal stream elements contains it, so
    #   sum over long runs of run length  = #(positions in long runs)
    #   #(long runs)                      = #(run starts in long runs).
    # A window starting at element e needs `same` at e+1..e+l_min-1;
    # composing single-step stream shifts realizes those flags and the
    # membership OR exactly, including row wrap-around (each step wraps one
    # boundary, so compositions cross as many rows as the data does). All
    # elementwise + per-row reductions: no scans, no flat reshape.
    def stream_next(b):
        head = jnp.any(b & (cs == col_start), axis=1)              # [H]
        next_head = jnp.concatenate([head[1:], jnp.zeros((1,), bool)])
        return jnp.where(cs < col_end, shifted(b, 0, -1),
                         jnp.where(cs == col_end, next_head[:, None], False))

    def stream_prev(b):
        tail = jnp.any(b & (cs == col_end), axis=1)
        prev_tail = jnp.concatenate([jnp.zeros((1,), bool), tail[:-1]])
        return jnp.where(cs > col_start, shifted(b, 0, 1),
                         jnp.where(cs == col_start, prev_tail[:, None],
                                   False))

    s_t = stream_next(same)          # same at stream offset +1
    w_ok = s_t
    for _ in range(l_min - 2):
        s_t = stream_next(s_t)
        w_ok = w_ok & s_t            # window starting here is all-equal
    longrun = w_ok
    back = w_ok
    for _ in range(l_min - 1):
        back = stream_prev(back)
        longrun = longrun | back     # OR over the l_min windows covering p

    match_symbols = jnp.sum((in_stream & longrun).astype(jnp.int32))
    match_count = jnp.sum((is_start & longrun).astype(jnp.int32))
    match_len_sum = match_symbols  # reference accumulates run_len into both

    # --- LZ-window distance term (calibration mode, round 5) --------------
    # The reference's run proxy prices match TOKENS but not match
    # REACHABILITY (png_size_estimator.cu:397-463 detects only distance-1
    # runs): content whose residual rows repeat with vertical period p is a
    # chain of near-free LZ77 matches at stream distance p*(w*C+1) — but
    # only when that distance fits zlib's window (32768 bytes). Slicing
    # shrinks the stream row and RESTORES reachability; this is the largest
    # real headroom class measured in round 4 (79% on-disk win,
    # BENCHMARKS.md headroom table) and it was invisible to the parity
    # model, so the fallback rejected it. distance_window > 0 (the zlib
    # window size) enables the term; 0 keeps reference parity at zero cost.
    #
    # Detection: integer row signatures (two independent weighted sums with
    # int32 wraparound — equal rows hash equal, unequal rows collide with
    # ~2^-64 probability) compared at every period p = 1..max_period, gated
    # by p*(w*C+1) <= distance_window at the SEGMENT's own stream geometry
    # (+1: each PNG stream row carries a filter-id byte). A matched row's
    # not-already-run-covered bytes join the match statistics as
    # ceil(bytes/258)-token matches (DEFLATE's max match length), and in
    # literal_hist="nonmatch" mode they leave the literal histogram — the
    # same treatment run-covered bytes get.
    matched_rows = jnp.zeros((height,), bool)
    if distance_window:
        cols = jnp.arange(n_cols, dtype=jnp.int32)
        wgt1 = cols * 1103515245 + 12345
        wgt2 = cols * 214013 + 2531011
        masked_res = jnp.where(in_stream, res, 0).astype(jnp.int32)
        sig1 = jnp.sum(masked_res * wgt1[None, :], axis=1)
        sig2 = jnp.sum(masked_res * wgt2[None, :], axis=1)
        ys_row = jnp.arange(height, dtype=jnp.int32)
        stream_row_bytes = w * channels + 1
        for p in range(1, max_period + 1):
            if p >= height:
                break
            reach = (p * stream_row_bytes) <= distance_window
            eq = jnp.concatenate([
                jnp.zeros((p,), bool),
                (sig1[p:] == sig1[:-p]) & (sig2[p:] == sig2[:-p])])
            ok_rows = (ys_row >= y0 + p) & (ys_row <= y1)
            matched_rows = matched_rows | (eq & ok_rows & reach)
        row_new = jnp.sum((in_stream & ~longrun).astype(jnp.int32), axis=1)
        psyms = jnp.sum(jnp.where(matched_rows, row_new, 0))
        ptokens = jnp.sum(jnp.where(matched_rows, (row_new + 257) // 258, 0))
        match_symbols = match_symbols + psyms
        match_count = match_count + ptokens
        match_len_sum = match_len_sum + psyms

    # --- entropy from per-channel histograms over the bbox ----------------
    # one-hot einsum instead of a segment_sum (the scatter-add lowers to a
    # serialized per-element update on TPU), factored by nibbles: bin
    # b = 16*hi + lo, so count[c, b] = sum_p hi_onehot[p,c,hi] *
    # lo_onehot[p,c,lo] — an MXU outer-product contraction. The naive
    # [P, C*256] one-hot costs P*1024 VPU compare/selects per slot (the
    # dominant estimator term at 256-crop slots); the factored form costs
    # P*32 plus a real matmul. Exact: 0/1 bf16 products accumulated in f32,
    # counts <= P < 2^24. (A [P, C*16]-packed variant computing all 4
    # histograms as diagonal blocks of one [64, 64] matmul forces the
    # one-hots to MATERIALIZE as matmul operands for every (image, slot) in
    # flight — 36 GB at batch 128 — where this per-channel [16, 16] form
    # fuses into a reduction; measured, do not repack.)
    if literal_hist == "nonmatch":
        # Calibration mode (BENCHMARKS.md round 4): the literal histogram
        # covers only bytes NOT already covered by a long run. The reference
        # histograms every bbox byte (png_size_estimator.cu:365-392), so on
        # mixed content (noise regions next to flat regions) the cheap
        # match-covered zeros flood the histogram and pull the literal
        # entropy far below what DEFLATE's literal code actually pays for
        # the noise bytes — measured 36% whole-image underpricing on a
        # noise|flat composite. DEFLATE prices literals with a code built
        # from literal occurrences only; this mode mirrors that.
        hist_mask2 = in_bbox2 & ~longrun & ~matched_rows[:, None]
    elif literal_hist == "all":
        hist_mask2 = in_bbox2
    else:
        raise ValueError(f"unknown literal_hist: {literal_hist}")
    res3 = res.reshape(height, width, channels).reshape(-1, channels)
    mask3 = hist_mask2.reshape(height, width, channels).reshape(-1, channels)
    nib = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((res3 // 16)[..., None] == nib).astype(jnp.bfloat16)
    oh_hi = oh_hi * mask3[..., None].astype(jnp.bfloat16)
    oh_lo = ((res3 % 16)[..., None] == nib).astype(jnp.bfloat16)
    hist = jnp.einsum("pch,pcl->chl", oh_hi, oh_lo,
                      preferred_element_type=jnp.float32
                      ).reshape(channels, 256)
    if literal_hist == "nonmatch":
        n_per_channel = jnp.sum(hist, axis=-1)           # [C] literal bytes
    else:
        n_per_channel = jnp.full((channels,), (w * h).astype(jnp.float32))
    p = hist / jnp.maximum(n_per_channel, 1.0)[:, None]
    h_c = -jnp.sum(jnp.where(hist > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0),
                   axis=-1)
    if entropy_correction == "miller_madow":
        # The plug-in (empirical) entropy is biased LOW by ~(K-1)/(2N ln 2)
        # bits for N samples over K occupied bins (Miller 1955) — on tiny
        # crops this under-prices slices badly enough that an always-slice
        # run predicted 0.90x of the bytes it really wrote (BENCHMARKS.md
        # round-3 calibration). Adding the first-order bias term fixes the
        # bias where it arises, per histogram, instead of the round-3
        # global fallback_margin fudge. Capped at 8 bits: a byte stream
        # can't exceed 8 bits/byte, and for N << K the MM term otherwise
        # overshoots. Reference parity mode ("none") keeps the uncorrected
        # formula of png_size_estimator.cu:281-309.
        k_occ = jnp.sum((hist > 0).astype(jnp.float32), axis=-1)
        h_c = h_c + (k_occ - 1.0) / (2.0 * jnp.maximum(n_per_channel, 1.0)
                                     * 0.6931471805599453)
        h_c = jnp.minimum(h_c, 8.0)
    elif entropy_correction != "none":
        raise ValueError(f"unknown entropy_correction: {entropy_correction}")
    h_bar = jnp.mean(h_c)

    # --- finalize (finalize_size_kernel / compute_size_device :10-43) ------
    n_total = (w * h * channels).astype(jnp.float32)
    f_match = jnp.where((n_total > 0) & (match_symbols > 0),
                        match_symbols / n_total, 0.0)
    l_bar = jnp.where(match_count > 0,
                      match_len_sum / jnp.maximum(match_count, 1),
                      float(l_min))
    b_lit = h_bar + beta
    b_match = b_match_token / jnp.maximum(l_bar, 1e-9) + gamma
    b_data = (1.0 - f_match) * b_lit + f_match * b_match
    s_est = overhead_base + h.astype(jnp.float32) + n_total * b_data / 8.0

    ok = seg_valid & (count >= min_pixels) & (w > 0) & (h > 0)
    return jnp.where(ok, s_est, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("min_pixels", "l_min", "beta",
                                    "b_match_token", "gamma", "overhead_base",
                                    "adaptive_filter", "chunk",
                                    "entropy_correction", "literal_hist",
                                    "distance_window", "max_period"))
def estimate_segment_png_sizes(img_u8: jnp.ndarray, inverse: jnp.ndarray,
                               counts: jnp.ndarray, bboxes: jnp.ndarray,
                               valid: jnp.ndarray, *, min_pixels: int = 1,
                               l_min: int = 4, beta: float = 0.012167,
                               b_match_token: float = 18.0,
                               gamma: float = 0.1,
                               overhead_base: float = 9.308622,
                               adaptive_filter: bool = True,
                               entropy_correction: str = "none",
                               literal_hist: str = "all",
                               distance_window: int = 0,
                               max_period: int = 96,
                               chunk: int = 8) -> jnp.ndarray:
    """Estimated PNG sizes for all segment slots of one image.

    img_u8: [H, W, C] uint8/int; inverse: [H, W] compact labels; counts
    [k_max]; bboxes [k_max, 4] (x0, y0, x1, y1); valid [k_max].
    Returns [k_max] float32 (0 for empty/skipped slots). Defaults mirror
    compute_rewards.cuh:9-16.

    Segment slots are processed `chunk` at a time (vmap inside lax.map) to
    bound live memory: each slot's working set is a handful of full-image
    planes, so a full k_max vmap would blow HBM on batched 256x256 inputs.
    """
    k_max = counts.shape[0]
    img_i32 = img_u8.astype(jnp.int32)
    fn = functools.partial(
        _segment_size_one, min_pixels=min_pixels, l_min=l_min, beta=beta,
        b_match_token=b_match_token, gamma=gamma,
        overhead_base=overhead_base, adaptive_filter=adaptive_filter,
        entropy_correction=entropy_correction, literal_hist=literal_hist,
        distance_window=distance_window, max_period=max_period)
    vfn = jax.vmap(fn, in_axes=(None, None, 0, 0, 0, 0))

    if k_max % chunk != 0 or k_max == chunk:
        return vfn(img_i32, inverse, jnp.arange(k_max, dtype=jnp.int32),
                   bboxes, counts, valid)

    n_chunks = k_max // chunk
    ks = jnp.arange(k_max, dtype=jnp.int32).reshape(n_chunks, chunk)
    sizes = jax.lax.map(
        lambda args: vfn(img_i32, inverse, *args),
        (ks, bboxes.reshape(n_chunks, chunk, 4),
         counts.reshape(n_chunks, chunk), valid.reshape(n_chunks, chunk)))
    return sizes.reshape(k_max)

def _classify_and_pack(bboxes, valid, class_sizes, caps, k_max):
    """Assign each slot the smallest crop class that fits its bbox, spilling
    to larger classes when a class cap is exceeded. Returns (effective_class
    [k_max], rank-within-class [k_max] 1-based, top-overflow mask)."""
    w = bboxes[:, 2] - bboxes[:, 0] + 1
    h = bboxes[:, 3] - bboxes[:, 1] + 1
    side = jnp.maximum(w, h)
    n_classes = len(class_sizes)
    cls = jnp.full((k_max,), n_classes - 1, jnp.int32)
    for c in range(n_classes - 1, -1, -1):
        cls = jnp.where(valid & (side <= class_sizes[c]), c, cls)
    cls = jnp.where(valid, cls, n_classes)  # invalid slots: no class

    rank = jnp.zeros((k_max,), jnp.int32)
    for c in range(n_classes):
        in_c = cls == c
        r = jnp.cumsum(in_c.astype(jnp.int32)) * in_c
        if c < n_classes - 1:
            spill = in_c & (r > caps[c])
            cls = jnp.where(spill, c + 1, cls)
            r = jnp.where(spill, 0, r)
        rank = jnp.where(in_c & (r > 0), r, rank)
    overflow = (cls == n_classes - 1) & (rank > caps[n_classes - 1])
    return cls, rank, overflow


@functools.partial(jax.jit,
                   static_argnames=("min_pixels", "l_min", "beta",
                                    "b_match_token", "gamma", "overhead_base",
                                    "adaptive_filter", "class_caps",
                                    "entropy_correction", "literal_hist",
                                    "distance_window", "max_period"))
def estimate_segment_png_sizes_fast(img_u8: jnp.ndarray, inverse: jnp.ndarray,
                                    counts: jnp.ndarray, bboxes: jnp.ndarray,
                                    valid: jnp.ndarray, *,
                                    min_pixels: int = 1, l_min: int = 4,
                                    beta: float = 0.012167,
                                    b_match_token: float = 18.0,
                                    gamma: float = 0.1,
                                    overhead_base: float = 9.308622,
                                    adaptive_filter: bool = True,
                                    entropy_correction: str = "none",
                                    literal_hist: str = "all",
                                    distance_window: int = 0,
                                    max_period: int = 96,
                                    class_caps: tuple | None = None
                                    ) -> jnp.ndarray:
    """Size-bucketed estimator: identical math to estimate_segment_png_sizes,
    but each segment is evaluated inside a static square crop of the smallest
    class that contains its bbox (dynamic_slice), so per-slot work scales
    with the bbox instead of the full image — the flat version's k_max
    full-image passes dominated the RL step.

    Class sizes are powers of two from 32 up to the image size; per-class
    slot caps spill upward, and slots beyond the largest class's cap fall
    back to a literal-only bound (8 bits/byte, i.e. S = overhead + h + N).
    Exactness: a crop that contains the bbox yields bit-identical filter
    costs, histograms, and run statistics (all estimator terms only read
    bbox-internal values) — asserted against the flat version in tests.
    """
    height, width, _channels = img_u8.shape
    k_max = counts.shape[0]
    img_i32 = img_u8.astype(jnp.int32)

    # square classes must fit both dims; the last class is the full image
    class_sizes = [s for s in (32, 64, 128, 256, 512)
                   if 32 <= s < min(height, width)] + [max(height, width)]
    class_crops = [(min(s, height), min(s, width)) for s in class_sizes]
    n_classes = len(class_sizes)
    if class_caps is not None:
        # workload-derived schedule (VERDICT round-2 next #8): callers that
        # know their segment-size histogram (e.g. the bench's trained
        # checkpoint at ~38 mostly-small segments/img) pass per-class caps
        # measured from it instead of the generic halving ramp. Spill
        # semantics are unchanged, so a too-tight cap degrades gracefully
        # (larger crop class, then the literal-only bound), never wrongly.
        if len(class_caps) != n_classes:
            raise ValueError(f"class_caps needs {n_classes} entries "
                             f"for {class_sizes}, got {class_caps}")
        caps = [int(c) for c in class_caps]
    else:
        caps = []
        for i, s in enumerate(class_sizes):
            if i == n_classes - 1:
                # full-image slots are the expensive ones; real segmentations
                # rarely have more than a few near-full-size segments
                caps.append(max(2, k_max // 16))
            else:
                caps.append(max(4, k_max // (2 ** i)))

    cls, rank, overflow = _classify_and_pack(bboxes, valid, class_sizes,
                                             caps, k_max)

    fn = functools.partial(
        _segment_size_one, min_pixels=min_pixels, l_min=l_min, beta=beta,
        b_match_token=b_match_token, gamma=gamma,
        overhead_base=overhead_base, adaptive_filter=adaptive_filter,
        entropy_correction=entropy_correction, literal_hist=literal_hist,
        distance_window=distance_window, max_period=max_period)

    sizes = jnp.zeros((k_max,), jnp.float32)
    slot_ids = jnp.arange(k_max, dtype=jnp.int32)

    for c, (crop_h, crop_w) in enumerate(class_crops):
        cap = caps[c]
        in_c = cls == c
        # slot ids of this class's members in rank order, padded with -1
        order = jnp.argsort(jnp.where(in_c, rank, k_max + 1))
        members = jnp.where(
            jnp.arange(k_max) < cap,
            jnp.where(in_c[order], order, -1), -1)[:cap].astype(jnp.int32)

        def one(slot):
            ok = slot >= 0
            slot_c = jnp.maximum(slot, 0)
            bb = bboxes[slot_c]
            y0 = jnp.clip(bb[1], 0, height - crop_h)
            x0 = jnp.clip(bb[0], 0, width - crop_w)
            img_crop = jax.lax.dynamic_slice(
                img_i32, (y0, x0, 0), (crop_h, crop_w, img_i32.shape[2]))
            inv_crop = jax.lax.dynamic_slice(inverse, (y0, x0),
                                             (crop_h, crop_w))
            bb_local = bb - jnp.stack([x0, y0, x0, y0])
            return fn(img_crop, inv_crop, slot_c, bb_local, counts[slot_c],
                      valid[slot_c] & ok)

        vals = jax.vmap(one)(members)
        sizes = sizes.at[jnp.where(members >= 0, members, k_max)].add(
            vals, mode="drop")

    # top-class overflow: literal-only upper bound (max-entropy bytes)
    w = (bboxes[:, 2] - bboxes[:, 0] + 1).astype(jnp.float32)
    h = (bboxes[:, 3] - bboxes[:, 1] + 1).astype(jnp.float32)
    n_total = w * h * img_i32.shape[2]
    fallback = overhead_base + h + n_total * (8.0 + beta) / 8.0
    ok_fb = overflow & (counts >= min_pixels)
    sizes = jnp.where(ok_fb, fallback, sizes)
    return jnp.where(valid, sizes, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("min_pixels", "l_min", "beta",
                                    "b_match_token", "gamma", "overhead_base",
                                    "adaptive_filter", "class_caps",
                                    "entropy_correction", "literal_hist",
                                    "distance_window", "max_period"))
def estimate_segment_png_sizes_packed(imgs_u8: jnp.ndarray,
                                      inverse: jnp.ndarray,
                                      counts: jnp.ndarray,
                                      bboxes: jnp.ndarray,
                                      valid: jnp.ndarray, *,
                                      class_caps: tuple,
                                      min_pixels: int = 1, l_min: int = 4,
                                      beta: float = 0.012167,
                                      b_match_token: float = 18.0,
                                      gamma: float = 0.1,
                                      overhead_base: float = 9.308622,
                                      adaptive_filter: bool = True,
                                      entropy_correction: str = "none",
                                      literal_hist: str = "all",
                                      distance_window: int = 0,
                                      max_period: int = 96
                                      ) -> jnp.ndarray:
    """Batch-packed estimator: `estimate_segment_png_sizes_fast` with the
    crop-class slot caps shared across the WHOLE BATCH instead of per image.

    imgs_u8 [B, H, W, C], inverse [B, H, W], counts/valid [B, k_max],
    bboxes [B, k_max, 4]; class_caps are batch TOTALS per class. Returns
    sizes [B, k_max].

    Why: the evaluated slot count is static, so per-image caps must cover
    the WORST image while the expensive large-crop classes are sparsely
    occupied on average (bench workload: per-image max 6 full-image
    segments, batch mean 3.0) — per-image packing computes padding slots at
    full crop cost. Pooling the caps over the batch sizes capacity to the
    batch SUM (law of large numbers), ~2x less top-class work at equal
    coverage; measured 1.00 -> 0.53 ms/img at batch 128 on the trained
    workload. Spill semantics are per-batch and batch-order dependent
    (earlier images claim capacity first), but every evaluated slot's value
    is bit-identical to the flat estimator's, and spilled slots degrade the
    same way (larger crop class, then the literal-only bound).
    """
    batch, height, width, chans = imgs_u8.shape
    k_max = counts.shape[1]
    n_flat = batch * k_max
    imgs_i32 = imgs_u8.astype(jnp.int32)

    class_sizes = [s for s in (32, 64, 128, 256, 512)
                   if 32 <= s < min(height, width)] + [max(height, width)]
    class_crops = [(min(s, height), min(s, width)) for s in class_sizes]
    n_classes = len(class_sizes)
    if len(class_caps) != n_classes:
        raise ValueError(f"class_caps needs {n_classes} entries "
                         f"for {class_sizes}, got {class_caps}")
    caps = [int(c) for c in class_caps]

    bboxes_f = bboxes.reshape(n_flat, 4)
    counts_f = counts.reshape(n_flat)
    valid_f = valid.reshape(n_flat)
    cls, rank, overflow = _classify_and_pack(bboxes_f, valid_f, class_sizes,
                                             caps, n_flat)

    fn = functools.partial(
        _segment_size_one, min_pixels=min_pixels, l_min=l_min, beta=beta,
        b_match_token=b_match_token, gamma=gamma,
        overhead_base=overhead_base, adaptive_filter=adaptive_filter,
        entropy_correction=entropy_correction, literal_hist=literal_hist,
        distance_window=distance_window, max_period=max_period)

    sizes = jnp.zeros((n_flat,), jnp.float32)
    for c, (crop_h, crop_w) in enumerate(class_crops):
        cap = caps[c]
        in_c = cls == c
        order = jnp.argsort(jnp.where(in_c, rank, n_flat + 1))
        members = jnp.where(
            jnp.arange(n_flat) < cap,
            jnp.where(in_c[order], order, -1), -1)[:cap].astype(jnp.int32)

        def one(slot):
            ok = slot >= 0
            slot_c = jnp.maximum(slot, 0)
            b = slot_c // k_max
            k = slot_c % k_max
            bb = bboxes_f[slot_c]
            y0 = jnp.clip(bb[1], 0, height - crop_h)
            x0 = jnp.clip(bb[0], 0, width - crop_w)
            img_crop = jax.lax.dynamic_slice(
                imgs_i32, (b, y0, x0, 0), (1, crop_h, crop_w, chans))[0]
            inv_crop = jax.lax.dynamic_slice(
                inverse, (b, y0, x0), (1, crop_h, crop_w))[0]
            bb_local = bb - jnp.stack([x0, y0, x0, y0])
            return fn(img_crop, inv_crop, k, bb_local, counts_f[slot_c],
                      valid_f[slot_c] & ok)

        vals = jax.vmap(one)(members)
        sizes = sizes.at[jnp.where(members >= 0, members, n_flat)].add(
            vals, mode="drop")

    w = (bboxes_f[:, 2] - bboxes_f[:, 0] + 1).astype(jnp.float32)
    h = (bboxes_f[:, 3] - bboxes_f[:, 1] + 1).astype(jnp.float32)
    n_total = w * h * chans
    fallback = overhead_base + h + n_total * (8.0 + beta) / 8.0
    ok_fb = overflow & (counts_f >= min_pixels)
    sizes = jnp.where(ok_fb, fallback, sizes)
    return jnp.where(valid_f, sizes, 0.0).reshape(batch, k_max)
