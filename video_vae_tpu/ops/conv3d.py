"""Direct 3D convolution Pallas kernel for small channel counts.

Why: the UNet decoder head dominates the flagship forward (67 of 104 ms,
tools/profile_components.py) because XLA's TPU conv emitter pads both channel
dims of every (3,k,k) conv to the 128-lane MXU width — at cin=12/cout=16 that
wastes ~99% of the systolic array. This kernel restores the lost contraction
size by packing ALL kt·kh·kw taps into the matmul K dimension:

    HBM → VMEM: the input stays in HBM; each grid step DMAs one halo'd
                (kt, th+kh-1, w+kw-1, cin) row-tile window (manual async copy —
                BlockSpecs cannot express overlapping halos, and a full frame
                would blow VMEM after lane padding)
    VMEM:       27 static shifted slices of that tile are stored at lane
                offsets into an im2col scratch (th·w, kt·kh·kw·cin)
    MXU:        ONE matmul (th·w, K) @ (K, cout) per tile, fp32 accumulate

K = 324 for a (3,3,3)@cin12 conv vs XLA's per-tap effective K≈cin, so the MXU
does ~27× more useful contraction per pass, and HBM sees the input ~kt times
instead of kt·kh·kw times.

Stride 1, SAME padding, NDHWC + channels-first entry points (the only conv
shapes the UNet/discriminator use; /root/reference/train/unet.py:13-21). Bias
fused. The cf backward is Pallas too at supported shapes: dx re-enters this
dispatch (flipped, IO-swapped kernel) and dW runs the im2col wgrad kernel
(_wgrad_kernel) — both XLA formulations of the filter gradient measured
~1/200 of peak at these channel counts. Off-TPU everything falls back to XLA.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tap_stride(cin: int) -> int:
    """Per-tap row stride in the im2col buffer: cin rounded up to the sublane
    granularity (8) so every tap's store offset is aligned."""
    return ((cin + 7) // 8) * 8


# ---------------------------------------------------------------------------
# Mesh safety. pallas_call is OPAQUE to GSPMD: under a sharded mesh an
# unpartitioned custom-call would silently all-gather its operands and run
# fully replicated on every device. The batch grid is embarrassingly parallel,
# so when a mesh is active the Pallas dispatches below wrap themselves in
# shard_map over the batch axes (data, fsdp) — each device runs the kernel on
# its local batch shard, zero collectives in the forward, one psum for the
# wgrad. When the batch doesn't divide the mesh the dispatch falls back to
# XLA (which GSPMD partitions natively) instead of risking the all-gather.
# ---------------------------------------------------------------------------

from video_vae_tpu.parallel.sharding import (  # mesh plumbing lives with
    # the rest of the sharding policy; conv keeps short local aliases
    clear_dispatch_log,
    dispatch_log,
    log_dispatch as _log_dispatch,
    mesh_info as _mesh_info,
    shard_map_unchecked as _shard_map,
)


def _env_interpret() -> bool:
    """VVT_PALLAS_INTERPRET=1 forces the Pallas paths in interpret mode off-TPU.

    Read at trace time (set per process, like every VVT_* knob). Used by the
    multichip dryrun so the driver-visible dispatch log proves
    shard_mapped-Pallas-under-mesh by exercise, not by absence (VERDICT r3
    weak #4) — off-TPU the platform gate would otherwise route everything to
    XLA. Shape gates still apply.
    """
    return os.environ.get("VVT_PALLAS_INTERPRET", "") == "1"


def _patch_budget(kh: int) -> int:
    """im2col scratch budget. The pallas_call raises vmem_limit_bytes to 64MB,
    so the scratch can exceed the default 16MB scoped cap. Measured on v5e:
    3×3 convs win with 12MB (th=16 row tiles at 256² — half the grid steps of
    th=8: 32→16@256 2.79 vs 2.93 ms), while the K-chunked 7×7 mixer LOSES with
    bigger tiles (4.9 vs 4.0 ms — worse DMA/compute overlap at csz=1) and
    keeps 6MB."""
    return (6 if kh > 3 else 12) * 1024 * 1024


def _pick_chunk(win: int, kh: int, kw: int, th: int, w: int, stride: int) -> Optional[int]:
    """Window frames per K-chunk: the im2col scratch holds only `csz` window
    frames' taps; the matmul streams chunk by chunk into an fp32 accumulator.
    Returns the largest csz ≤ win whose scratch fits the budget (None = even
    one frame's taps don't fit)."""
    budget = _patch_budget(kh)
    for csz in range(win, 0, -1):
        if csz * kh * kw * stride * th * w * 2 <= budget:
            return csz
    return None


def _pick_tile_h(h: int, win: int, kh: int, kw: int, w: int, stride: int) -> Optional[int]:
    """Largest row tile for which a K-chunking exists (output blocks need an
    8-divisible second-minor dim, so th ≥ 8)."""
    for th in (32, 16, 8):
        if h % th:
            continue
        if _pick_chunk(win, kh, kw, th, w, stride) is not None:
            return th
    return None


def _buf_rows(th: int, kh: int, h: int, w: int) -> int:
    """Rows the halo-window VMEM buffer holds per window frame.

    At w ≥ 128 a row boundary is 128-lane-aligned, so the DMA can start at
    the exact halo row: buffer = th + kh − 1 rows. At w = 64 a row offset is
    only 64-lane-aligned and Mosaic rejects the slice; instead the DMA start
    is rounded DOWN to an even row by construction (ph_dma = ph rounded up to
    the 2-row alignment, start = clip(row0 − ph_dma, 0, h − buf_rows): every
    term even) and the content is repaired with STATIC lane rolls per tile
    region in the kernel."""
    dma_rows = th + kh - 1
    if dma_rows >= h:
        return dma_rows  # whole-frame DMA at offset 0: always aligned
    ralign = max(1, 128 // w)
    if ralign == 1:
        return dma_rows
    ph = kh // 2
    ph_dma = -(-ph // ralign) * ralign
    return th + 2 * ph_dma


def _pick_frames(t: int, kt: int, kh: int, kw: int, cout: int, h: int, w: int, stride: int):
    """Temporal M-packing factor F (+ row tile): F output frames share one matmul.

    cout alone wastes the MXU's 128 M-rows (e.g. 16/128 = 12.5% for the UNet's
    base level); stacking F frames as (f·cout + co) rows with block-banded
    weights (frame f only reads window frames f..f+kt−1) fills M while the
    im2col taps are SHARED across frames — executed-FLOP overhead drops from
    128/cout to ≈ (F+kt−1)/kt · 128/(F·cout). Wide spatial kernels whose full
    im2col would blow VMEM stream K in window-frame chunks instead of
    shrinking F. Returns (frames, tile_h) — (1, None) = no fit.
    """
    for f in (8, 4, 2, 1):
        if f * cout <= 128 and t % f == 0 and (f * cout) % 8 == 0:
            th = _pick_tile_h(h, f + kt - 1, kh, kw, w, stride)
            if th is not None:
                return f, th
    return 1, _pick_tile_h(h, kt, kh, kw, w, stride)


def pallas_conv_supported(x_shape, kernel_shape) -> bool:
    """Shapes where the direct kernel is applicable and worth it."""
    b, t, h, w, cin = x_shape
    kt, kh, kw, _, cout = kernel_shape
    # w = 64 is also supported: every lane extent stays a multiple of 128
    # (th ∈ {8,16,32} → th·64 and (th+kh−1)·64 both divide by 128) and the
    # power-of-two column-id/roll tricks are width-agnostic. In-context this
    # beat XLA's conv at the 64² UNet level, which compiled to f32
    # channel-minor fusions at ~15% MFU plus layout copies (xplane r3).
    min_w = 64 if os.environ.get("VVT_PALLAS_64", "1") == "1" else 128
    if w % 128 and w != min_w:
        return False
    if h % 8 or (w & (w - 1)):  # power-of-two w: col id = iota&(w-1)
        return False
    if kh % 2 == 0 or kw % 2 == 0 or kt % 2 == 0:  # SAME halo assumes odd taps
        return False
    frames, th = _pick_frames(t, kt, kh, kw, cout, h, w, _tap_stride(cin))
    if (frames * cout) % 8:  # sublane dim of the (1, F·cout, th·w) out block
        return False
    # small spatial extents below 64²: XLA's padded conv is fine and the
    # per-tile overheads dominate — only take over the big-feature-map levels
    return th is not None and h * w >= min_w * min_w


def _conv_kernel(
    *refs,
    kt, kh, kw, th, h, w, t, frames, groups, stride, csz, pool, src_layout,
):
    """Channels-first direct conv v4: in-kernel SAME halo, K-streaming, fused pool.

    srcs:    one or more (b, t, ci, h·w) RAW activations, unpadded (v3
             pre-padded t/c/h host-side: a full extra HBM round trip per conv
             that the xplane trace showed as ~25% of UNet time in 'data
             formatting'). Multiple sources land in adjacent sublane ranges of
             the halo window (src_layout = ((offset, len), …)) — a conv over
             their channel concat with NO concatenated tensor in HBM (the
             UNet's UpBlock skip concats).
    w_ref:   (m_pad, K_pad) block-banded packed weights: row f·cout+co reads
             only window-frame columns f..f+kt−1 (see _pack_weights_mf)
    o_ref:   block (1, F·cout, th·w) — F output frames per grid step, frame
             and channel flattened so the sublane dim stays 8-aligned even
             for cout=12 (the patch-mixer)
    p_ref:   block (1, F·cout, th·w//4) fused 2×2 spatial max pool of the
             output (None when pool=False; see conv3d_cf_pooled)
    in_buf:  (frames+kt-1, stride, dma_rows·w) VMEM halo window
    patches: (csz·kh·kw·stride, th·w) im2col scratch for `csz` window frames —
             wide kernels (7×7 mixer) stream K window-frame-chunk by chunk
             into an fp32 accumulator instead of materializing all taps

    Halo handling (all in-kernel):
    * temporal: one async copy per window frame, slot-clamped; frames outside
      [0, t) zero their slot instead (SAME padding)
    * rows: constant-size DMA with the start clamped into [0, h−dma_rows];
      at the top/bottom tiles the data lands ph rows off — repaired with a
      STATIC lane roll of ph·w under @pl.when, then the halo rows are zeroed
    * channels: non-8-aligned cin is zero-padded to `stride` host-side (only
      the cin=12 convs; Mosaic requires 8-aligned sublane slice sizes)

    Lane shifts are hoisted: ONE roll+mask per dw≠0 over the whole window
    (kw−1 rolls total) instead of one per tap; a flat roll crosses row
    boundaries exactly at the columns the SAME-padding mask zeroes anyway
    (w is a power of two here, so the column id is iota&(w−1)).
    """
    n_src = len(src_layout)
    srcs = refs[:n_src]
    w_ref, b_ref, o_ref, *rest = refs[n_src:]
    if pool:
        p_ref, in_buf, patches_ref, sems = rest
    else:
        (in_buf, patches_ref, sems), p_ref = rest, None
    i = pl.program_id(0)
    tiles_per_frame = h // th
    win = frames + kt - 1
    ph, pt = kh // 2, kt // 2
    dma_rows = th + kh - 1
    rem = i % (groups * tiles_per_frame)
    b_idx = i // (groups * tiles_per_frame)
    g_idx = rem // tiles_per_frame
    row0 = (rem % tiles_per_frame) * th

    # ---- fill the halo window --------------------------------------------
    # cin == stride here: the wrapper pads non-8-aligned channel counts
    # host-side (Mosaic requires 8-aligned sublane slice sizes in DMAs).
    whole_frame = dma_rows >= h  # single row tile: DMA the full frame
    buf_rows = _buf_rows(th, kh, h, w)
    L = buf_rows * w  # per-frame buffer lanes (≥ dma_rows·w in aligned mode)
    aligned_mode = not whole_frame and buf_rows != dma_rows
    if whole_frame:
        lane0 = 0
    elif aligned_mode:
        # w < 128: DMA start rounded down to a 128-lane (= ralign-row)
        # boundary by construction — row0, ph_dma, h and buf_rows are all
        # ralign-multiples. Content lands ph_dma−ph rows early; repaired with
        # static rolls below. The clip runs in 128-lane block units so the
        # offset is SYNTACTICALLY blk·128 — Mosaic's divisibility analysis
        # cannot prove evenness through a clip of row-unit values.
        ralign = 128 // w
        ph_dma = (buf_rows - th) // 2
        blk = jnp.clip((row0 - ph_dma) // ralign, 0, (h - buf_rows) // ralign)
        lane0 = blk * 128
    else:
        lane0 = jnp.clip(row0 - ph, 0, h - dma_rows) * w

    f0 = g_idx * frames - pt
    copies = []
    for df in range(win):
        sf = f0 + df
        valid = jnp.logical_and(sf >= 0, sf < t)
        for si, x_hbm in enumerate(srcs):
            c_off, c_len = src_layout[si]
            if whole_frame:
                dst = in_buf.at[df, pl.ds(c_off, c_len), pl.ds(ph * w, h * w)]
                src = x_hbm.at[b_idx, jnp.clip(sf, 0, t - 1), :, :]
            else:
                dst = in_buf.at[df, pl.ds(c_off, c_len), :]
                src = x_hbm.at[b_idx, jnp.clip(sf, 0, t - 1), :, pl.ds(lane0, L)]
            copy = pltpu.make_async_copy(src, dst, sems.at[df, si])
            @pl.when(valid)
            def _start(copy=copy):
                copy.start()
            copies.append((valid, copy))
        @pl.when(jnp.logical_not(valid))
        def _zero(df=df):
            in_buf[df, :, :] = jnp.zeros((stride, L), in_buf.dtype)
    if whole_frame and ph:
        in_buf[:, :, : ph * w] = jnp.zeros((win, stride, ph * w), in_buf.dtype)
        in_buf[:, :, (ph + h) * w :] = jnp.zeros(
            (win, stride, L - (ph + h) * w), in_buf.dtype
        )
    for valid, copy in copies:
        @pl.when(valid)
        def _wait(copy=copy):
            copy.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (win, stride, L), dimension=2) >> (
        w.bit_length() - 1
    )  # lane → row index within the window (w is a power of two)
    if not whole_frame and ph:
        # top tile: buffer holds rows [0, …) but taps expect [row0−ph, …)
        # — shift content down ph rows, zero the halo. Identical in aligned
        # mode (the top tile's DMA start clips to 0 either way).
        @pl.when(row0 == 0)
        def _top():
            rolled = pltpu.roll(in_buf[:].astype(jnp.float32), shift=ph * w, axis=2)
            in_buf[:] = jnp.where(row_ids < ph, 0.0, rolled).astype(in_buf.dtype)

        # bottom tile: DMA start clipped ph rows (aligned: 2·ph_dma−ph rows)
        # early — shift content up, zero rows past the image (SAME padding).
        d_bot = (buf_rows - th - ph) if aligned_mode else ph  # = 2·ph_dma − ph
        @pl.when(row0 == h - th)
        def _bottom():
            rolled = pltpu.roll(
                in_buf[:].astype(jnp.float32), shift=(-d_bot * w) % L, axis=2
            )
            in_buf[:] = jnp.where(row_ids >= dma_rows - ph, 0.0, rolled).astype(
                in_buf.dtype
            )

        if aligned_mode and (buf_rows - th) // 2 - ph:
            # interior tiles: content ph_dma−ph rows early, nothing to zero
            # (the extra rows are real image rows; wrapped rows land past the
            # dma_rows read extent)
            d_int = (buf_rows - th) // 2 - ph

            @pl.when(jnp.logical_and(row0 > 0, row0 < h - th))
            def _interior():
                in_buf[:] = (
                    pltpu.roll(
                        in_buf[:].astype(jnp.float32), shift=(-d_int * w) % L, axis=2
                    ).astype(in_buf.dtype)
                )

    # ---- K-streamed im2col + matmul --------------------------------------
    # Lane shifts are hoisted PER CHUNK (one roll+mask per dw≠0 over the
    # chunk's window frames): same total roll work as whole-window hoisting,
    # but the live shifted copies shrink by win/csz — the kw=7 mixer's 6
    # whole-window copies alone would blow the 16MB scoped-VMEM limit.
    chunk_k = csz * kh * kw * stride
    out = None
    for dt0 in range(0, win, csz):
        ncf = min(csz, win - dt0)
        window = in_buf[dt0 : dt0 + ncf]  # (ncf, stride, L)
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (ncf, stride, L), dimension=2
        ) & (w - 1)
        shifted = {0: window}
        for dw in range(kw):
            shift = dw - kw // 2  # e.g. −1, 0, +1 for kw=3
            if shift == 0:
                continue
            # Mosaic's lane rotate only handles 32-bit elements
            rolled = pltpu.roll(window.astype(jnp.float32), shift=(-shift) % L, axis=2)
            if shift < 0:
                # output col j reads input col j+shift: data moved right; col 0
                # now holds the previous row's last pixel — zero it (SAME pad)
                rolled = jnp.where(col_ids < -shift, 0.0, rolled)
            else:
                rolled = jnp.where(col_ids >= w - shift, 0.0, rolled)
            shifted[shift] = rolled.astype(window.dtype)

        tap = 0
        for dt in range(ncf):
            for dh in range(kh):
                for dw in range(kw):
                    shift = dw - kw // 2
                    piece = shifted[shift][dt, :, dh * w : dh * w + th * w]
                    patches_ref[tap * stride : (tap + 1) * stride, :] = piece
                    tap += 1
        if ncf < csz:
            # trailing short chunk: the unwritten tap rows contract against
            # zero weight columns, but uninitialized VMEM can hold NaNs
            patches_ref[ncf * kh * kw * stride :, :] = jnp.zeros(
                ((csz - ncf) * kh * kw * stride, th * w), patches_ref.dtype
            )
        part = jnp.dot(
            w_ref[:, dt0 * kh * kw * stride : dt0 * kh * kw * stride + chunk_k],
            patches_ref[:],
            preferred_element_type=jnp.float32,
        )  # (m_pad, th·w); trailing short chunk contracts stale taps against
        # zero weight columns (w_ref columns past win·kh·kw·stride are zero)
        out = part if out is None else out + part
    out = out + b_ref[:].astype(jnp.float32)
    fcout = o_ref.shape[1]  # frames·cout
    out = out[:fcout]
    o_ref[...] = out[None].astype(o_ref.dtype)
    if pool:
        # Row pairs are CONTIGUOUS lane blocks of the flat output — reduce
        # them with plain static slices. The column (lane-strided) pair max
        # stays in the wrapper: Mosaic has no lane-dim strided loads, strided
        # value-slicing lowers to an unsupported gather, and lane-splitting
        # value reshapes are unsupported shape casts.
        for r2 in range(th // 2):
            v = jnp.maximum(
                out[:, (2 * r2) * w : (2 * r2 + 1) * w],
                out[:, (2 * r2 + 1) * w : (2 * r2 + 2) * w],
            )  # (f·c, w)
            p_ref[0, :, r2, :] = v.astype(p_ref.dtype)


def _pack_weights_mf(kernel, bias, frames, stride, m_pad, k_pad):
    """Block-banded (m_pad, K_pad) weights for temporal M-packing.

    Row f·cout+co, column ((dt'·kh+dh)·kw+dw)·stride+ci holds W[dt'−f,dh,dw,ci,co]
    when 0 ≤ dt'−f < kt, else 0 — output frame f of the window only contracts
    its own kt input frames; the im2col taps over the whole window are shared.
    Columns past win·kh·kw·stride (K-chunk round-up) stay zero: the trailing
    short chunk contracts garbage patch rows against them.
    """
    kt, kh, kw, cin, cout = kernel.shape
    blk = kh * kw * stride
    kflat = jnp.transpose(kernel, (4, 0, 1, 2, 3)).reshape(cout, kt, kh * kw, cin)
    pad_ci = jnp.zeros((cout, kt, kh * kw, stride - cin), kernel.dtype)
    packed = jnp.concatenate([kflat, pad_ci], axis=-1).reshape(cout, kt, blk)
    wmat = jnp.zeros((m_pad, k_pad), kernel.dtype)
    for f in range(frames):
        for dt in range(kt):
            wmat = wmat.at[
                f * cout : (f + 1) * cout, (f + dt) * blk : (f + dt + 1) * blk
            ].set(packed[:, dt])
    bias_col = jnp.zeros((m_pad, 1), jnp.float32).at[: frames * cout, 0].set(
        jnp.tile(bias.astype(jnp.float32), frames)
    )
    return wmat, bias_col


def _tapdot_kernel(*refs, kh, kw, th, h, w, t, stride, cout, pool, src_layout):
    """Direct conv via one MXU dot PER SPATIAL TAP — no im2col scratch.

    Applies to kt=1 convs with cin ≥ 128 (the s2d-packed UNet levels and
    their dgrads): there K = cin is already MXU-sized, so materializing
    kh·kw·cin-row im2col patches only multiplied VMEM traffic ~(kh·kw)× —
    the patch stores were the measured bottleneck of the im2col kernel at
    these shapes (~55% MFU on v5e). Here each tap (dh, dw) issues
    W[dh,dw] (cout, cin) @ window_shifted (cin, th·w) into an fp32
    accumulator; row shifts are free sublane slices of the halo buffer and
    the kw−1 lane shifts are hoisted whole-window rolls (identical trick to
    the im2col kernel).

    Halo preamble matches `_conv_kernel` simplified for kt=1: no temporal
    window, every frame valid (one DMA per source, no zero slots).
    """
    n_src = len(src_layout)
    srcs = refs[:n_src]
    w_ref, b_ref, o_ref, *rest = refs[n_src:]
    if pool:
        p_ref, in_buf, sems = rest
    else:
        (in_buf, sems), p_ref = rest, None
    i = pl.program_id(0)
    tiles_per_frame = h // th
    ph = kh // 2
    dma_rows = th + kh - 1
    rem = i % (t * tiles_per_frame)
    b_idx = i // (t * tiles_per_frame)
    t_idx = rem // tiles_per_frame
    row0 = (rem % tiles_per_frame) * th

    whole_frame = dma_rows >= h
    buf_rows = _buf_rows(th, kh, h, w)
    L = buf_rows * w
    if whole_frame:
        lane0 = 0
    else:
        # w ≥ 128 only (gated in the wrapper): row offsets are lane-aligned
        lane0 = jnp.clip(row0 - ph, 0, h - dma_rows) * w
    copies = []
    for si, x_hbm in enumerate(srcs):
        c_off, c_len = src_layout[si]
        if whole_frame:
            dst = in_buf.at[pl.ds(c_off, c_len), pl.ds(ph * w, h * w)]
            src = x_hbm.at[b_idx, t_idx, :, :]
        else:
            dst = in_buf.at[pl.ds(c_off, c_len), :]
            src = x_hbm.at[b_idx, t_idx, :, pl.ds(lane0, L)]
        copy = pltpu.make_async_copy(src, dst, sems.at[si])
        copy.start()
        copies.append(copy)
    if whole_frame and ph:
        in_buf[:, : ph * w] = jnp.zeros((stride, ph * w), in_buf.dtype)
        in_buf[:, (ph + h) * w :] = jnp.zeros(
            (stride, L - (ph + h) * w), in_buf.dtype
        )
    for copy in copies:
        copy.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (stride, L), dimension=1) >> (
        w.bit_length() - 1
    )
    if not whole_frame and ph:
        @pl.when(row0 == 0)
        def _top():
            rolled = pltpu.roll(in_buf[:].astype(jnp.float32), shift=ph * w, axis=1)
            in_buf[:] = jnp.where(row_ids < ph, 0.0, rolled).astype(in_buf.dtype)

        @pl.when(row0 == h - th)
        def _bottom():
            rolled = pltpu.roll(
                in_buf[:].astype(jnp.float32), shift=(-ph * w) % L, axis=1
            )
            in_buf[:] = jnp.where(row_ids >= dma_rows - ph, 0.0, rolled).astype(
                in_buf.dtype
            )

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (stride, L), dimension=1) & (w - 1)
    window = in_buf[:]
    shifted = {0: window}
    for dw in range(kw):
        shift = dw - kw // 2
        if shift == 0:
            continue
        rolled = pltpu.roll(window.astype(jnp.float32), shift=(-shift) % L, axis=1)
        if shift < 0:
            rolled = jnp.where(col_ids < -shift, 0.0, rolled)
        else:
            rolled = jnp.where(col_ids >= w - shift, 0.0, rolled)
        shifted[shift] = rolled.astype(window.dtype)

    acc = None
    for dh in range(kh):
        for dw in range(kw):
            piece = shifted[dw - kw // 2][:, dh * w : dh * w + th * w]
            part = jax.lax.dot_general(
                w_ref[dh * kw + dw], piece,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (cout, th·w)
            acc = part if acc is None else acc + part
    out = acc + b_ref[:].astype(jnp.float32)
    o_ref[...] = out[None].astype(o_ref.dtype)
    if pool:
        for r2 in range(th // 2):
            v = jnp.maximum(
                out[:, (2 * r2) * w : (2 * r2 + 1) * w],
                out[:, (2 * r2 + 1) * w : (2 * r2 + 2) * w],
            )
            p_ref[0, :, r2, :] = v.astype(p_ref.dtype)


def _tapdot_tile_h(h, kh, kw, w, stride, cout) -> Optional[int]:
    """Largest row tile whose window + shifted copies + accumulator fit a
    40MB VMEM working set (the pallas_call raises the scoped cap to 64MB)."""
    for th in (32, 16, 8):
        if h % th:
            continue
        L = (_buf_rows(th, kh, h, w)) * w
        window_b = stride * L * 2 * kw  # window + (kw−1) shifted bf16 copies
        roll_tmp = stride * L * 4  # f32 roll intermediate
        acc_b = cout * th * w * 4
        out_b = cout * th * w * 2 * 2  # double-buffered out block
        if window_b + roll_tmp + acc_b + out_b <= 40 * 1024 * 1024:
            return th
    return None


def tapdot_supported(cin, cout, kt, kh, kw, h, w) -> bool:
    # Default OFF: on-chip A/B at the flagship shapes was NEUTRAL both ways
    # (forward 43.32 vs 43.43 clips/s; train step 165.7 vs 167.7 ms) — the
    # im2col kernel's patch stores were NOT the bottleneck at cin ≥ 128, and
    # the tap-dot's hoisted lane rolls cost about what the stores did. Kept
    # env-gated for future shapes (e.g. larger cout where the banded-M
    # packing stops paying).
    return (
        kt == 1
        and w >= 128
        and cin >= 128
        and cin % 8 == 0
        and cout % 8 == 0
        and os.environ.get("VVT_TAPDOT", "0") == "1"
        and _tapdot_tile_h(h, kh, kw, w, cin, cout) is not None
    )


@functools.partial(jax.jit, static_argnames=("interpret", "pool"))
def _conv3d_tapdot_cf(xq, kernel, bias, interpret=False, pool=False):
    """Tap-dot dispatch: kt=1, cin ≥ 128 channels-first convs (and tuples of
    sources whose channel concat is the input, as in `_conv3d_pallas_cf`)."""
    xs = xq if isinstance(xq, (tuple, list)) else (xq,)
    b, t, _, h, w = xs[0].shape
    cins = [x.shape[2] for x in xs]
    cin = sum(cins)
    kt, kh, kw, _, cout = kernel.shape
    assert kt == 1 and cin % 8 == 0 and cout % 8 == 0
    th = _tapdot_tile_h(h, kh, kw, w, cin, cout)
    xs = tuple(x.reshape(b, t, c, h * w) for x, c in zip(xs, cins))
    offs = [sum(cins[:i]) for i in range(len(cins))]
    src_layout = tuple((o, c) for o, c in zip(offs, cins))
    # (kh·kw, cout, cin) tap-major weights: one transpose, no banded packing
    wmat = jnp.transpose(kernel[0], (3, 0, 1, 2)).reshape(cout, kh * kw, cin)
    wmat = jnp.transpose(wmat, (1, 0, 2))
    bias_col = bias.astype(jnp.float32)[:, None]
    tiles_per_frame = h // th
    grid = (b * t * tiles_per_frame,)
    kernel_pool = pool and w >= 128
    out_specs = [
        pl.BlockSpec(
            (1, cout, th * w),
            lambda i: (i // tiles_per_frame, 0, i % tiles_per_frame),
            memory_space=pltpu.VMEM,
        )
    ]
    dtype = xs[0].dtype
    out_shapes = [jax.ShapeDtypeStruct((b * t, cout, h * w), dtype)]
    if kernel_pool:
        out_specs.append(
            pl.BlockSpec(
                (1, cout, th // 2, w),
                lambda i: (i // tiles_per_frame, 0, i % tiles_per_frame, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((b * t, cout, h // 2, w), dtype))
    res = pl.pallas_call(
        functools.partial(
            _tapdot_kernel,
            kh=kh, kw=kw, th=th, h=h, w=w, t=t,
            stride=cin, cout=cout, pool=kernel_pool, src_layout=src_layout,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(xs)
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if kernel_pool else out_specs[0],
        out_shape=out_shapes if kernel_pool else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((cin, _buf_rows(th, kh, h, w) * w), dtype),
            pltpu.SemaphoreType.DMA((len(xs),)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*xs, wmat, bias_col)
    if kernel_pool:
        full, vpooled = res
        vpooled = vpooled.reshape(b, t, cout, h // 2, w)
        pooled = jnp.maximum(vpooled[..., 0::2], vpooled[..., 1::2])
        return full.reshape(b, t, cout, h, w), pooled
    if pool:
        full = res.reshape(b, t, cout, h, w)
        r = jnp.maximum(full[..., 0::2, :], full[..., 1::2, :])
        return full, jnp.maximum(r[..., 0::2], r[..., 1::2])
    return res.reshape(b, t, cout, h, w)


@functools.partial(jax.jit, static_argnames=("interpret", "pool"))
def _conv3d_pallas_cf(xq, kernel, bias, interpret=False, pool=False):
    """Pallas direct conv on channels-first input (b, t, cin, h, w) → same layout.

    ``xq`` may also be a TUPLE of channels-first activations: the conv then
    runs over their channel concatenation WITHOUT materializing it — each
    source DMAs into its own sublane range of the halo window (the UpBlock
    skip concats). Every source's channel count must be 8-aligned then.

    pool=True additionally returns the (1,2,2)-max-pooled output, computed in
    the kernel epilogue (returns a (full, pooled) tuple). At w = 64 the
    epilogue's 4-D pooled block would have a 64-lane minor dim (an unsupported
    Mosaic store reshape) — the pool runs in the wrapper over the full output
    instead (one extra XLA pass over a 64²-level tensor, sub-0.1 ms).
    """
    xs = xq if isinstance(xq, (tuple, list)) else (xq,)
    b, t, _, h, w = xs[0].shape
    cins = [x.shape[2] for x in xs]
    cin = sum(cins)
    kt, kh, kw, _, cout = kernel.shape
    if tapdot_supported(cin, cout, kt, kh, kw, h, w) and all(
        c % 8 == 0 for c in cins
    ):
        return _conv3d_tapdot_cf(xq, kernel, bias, interpret=interpret, pool=pool)
    kernel_pool = pool and w >= 128
    stride = _tap_stride(cin)
    frames, th = _pick_frames(t, kt, kh, kw, cout, h, w, stride)
    win = frames + kt - 1
    csz = _pick_chunk(win, kh, kw, th, w, stride)
    n_chunks = -(-win // csz)
    k_pad = n_chunks * csz * kh * kw * stride
    m_pad = max(128, (((frames * cout) + 127) // 128) * 128)
    dma_rows = th + kh - 1

    # raw activations, rows flattened into the lane dim (HBM-contiguous — a
    # free reshape); ALL SAME-padding happens inside the kernel via clamped
    # halo DMAs. Only non-8-aligned channel counts (the two cin=12 convs) pay
    # a pad copy — Mosaic requires 8-aligned sublane slice sizes in DMAs.
    if len(xs) == 1 and cin < stride:
        xs = (jnp.pad(xs[0], ((0, 0), (0, 0), (0, stride - cin), (0, 0), (0, 0))),)
        cins = [stride]
    assert all(c % 8 == 0 for c in cins), "multi-source channels must be 8-aligned"
    xs = tuple(x.reshape(b, t, c, h * w) for x, c in zip(xs, cins))
    offs = [sum(cins[:i]) for i in range(len(cins))]
    src_layout = tuple((o, c) for o, c in zip(offs, cins))

    wmat, bias_col = _pack_weights_mf(kernel, bias, frames, stride, m_pad, k_pad)

    tiles_per_frame = h // th
    groups = t // frames
    grid = (b * groups * tiles_per_frame,)
    # out rows are (frame, cout)-flattened so the sublane dim is F·cout
    # (8-aligned even when cout isn't, e.g. the cout=12 patch-mixer); the
    # (b·groups, F·cout, h·w) → (b, t, cout, h, w) reshape below is free.
    out_specs = [
        pl.BlockSpec(
            (1, frames * cout, th * w),
            lambda i: (i // tiles_per_frame, 0, i % tiles_per_frame),
            memory_space=pltpu.VMEM,
        )
    ]
    dtype = xs[0].dtype
    out_shapes = [jax.ShapeDtypeStruct((b * groups, frames * cout, h * w), dtype)]
    if kernel_pool:
        out_specs.append(
            pl.BlockSpec(
                (1, frames * cout, th // 2, w),
                lambda i: (i // tiles_per_frame, 0, i % tiles_per_frame, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((b * groups, frames * cout, h // 2, w), dtype)
        )
    res = pl.pallas_call(
        functools.partial(
            _conv_kernel,
            kt=kt, kh=kh, kw=kw, th=th, h=h, w=w, t=t,
            frames=frames, groups=groups, stride=stride, csz=csz,
            pool=kernel_pool, src_layout=src_layout,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(xs)  # manual halo DMA
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if kernel_pool else out_specs[0],
        out_shape=out_shapes if kernel_pool else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((win, stride, _buf_rows(th, kh, h, w) * w), dtype),
            pltpu.VMEM((csz * kh * kw * stride, th * w), dtype),
            pltpu.SemaphoreType.DMA((win, len(xs))),
        ],
        compiler_params=pltpu.CompilerParams(
            # the default 16MB scoped-VMEM cap counts double-buffered in/out
            # blocks; the pooled variant and the chunked 7×7 mixer need room
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*xs, wmat, bias_col)
    if kernel_pool:
        full, vpooled = res  # rows already pooled in-kernel; columns here
        vpooled = vpooled.reshape(b, t, cout, h // 2, w)
        pooled = jnp.maximum(vpooled[..., 0::2], vpooled[..., 1::2])
        return full.reshape(b, t, cout, h, w), pooled
    if pool:  # w = 64: pool outside the kernel (see docstring)
        full = res.reshape(b, t, cout, h, w)
        r = jnp.maximum(full[..., 0::2, :], full[..., 1::2, :])
        return full, jnp.maximum(r[..., 0::2], r[..., 1::2])
    return res.reshape(b, t, cout, h, w)  # (b·groups, F·cout, h·w) is contiguous as (b,t,cout,h,w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3d_pallas(x, kernel, bias, interpret=False):
    xq = jnp.transpose(x, (0, 1, 4, 2, 3))  # (b, t, cin, h, w)
    out = _conv3d_pallas_cf(xq, kernel, bias, interpret=interpret)
    return jnp.transpose(out, (0, 1, 3, 4, 2))


@functools.lru_cache(maxsize=None)
def _s2d_extent(k: int) -> int:
    """Block-domain kernel extent for an original spatial extent k (factor 2)."""
    lo = min((a + d) // 2 for a in (0, 1) for d in range(-(k // 2), k // 2 + 1))
    hi = max((a + d) // 2 for a in (0, 1) for d in range(-(k // 2), k // 2 + 1))
    return hi - lo + 1


def _s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a (kt,kh,kw,ci,co) kernel into its space-to-depth equivalent.

    Output (kt, EH, EW, 4ci, 4co) with phase-minor channel order (c, a, b):
    W_s2d[DH,DW, ci·4+pa·2+pb, co·4+a·2+b] = W[dt, dh, dw, ci, co]
    where for output phase a and tap offset d = dh−kh//2:
    r = a + d, DH = floor(r/2), pa = r mod 2 (same for columns).
    Pure index rearrangement + zero padding — mathematically identical conv.
    """
    kt, kh, kw, ci, co = kernel.shape
    eh, ew = _s2d_extent(kh), _s2d_extent(kw)
    # ONE gather, not kh·kw·4 scatters: the scatter-loop formulation lowered
    # to a ~(2·2·kh·kw)-long dynamic-update-slice fusion chain that XLA can
    # hoist out of an inference scan (weights loop-invariant) but re-executes
    # EVERY training step — ~15 ms/step of weight rearrangement at b1×16f
    # (xplane, v5e). The map (a,b,dh,dw) → (DH,DW,pa,pb) is a bijection onto
    # its image, so it inverts to a trace-time numpy index table into the
    # flattened taps (index P = the appended zero tap for unmapped slots).
    P = kh * kw
    idx = np.full((eh, ew, 2, 2, 2, 2), P, np.int32)  # (DH,DW,pa,pb,a,b)
    oh, ow = eh // 2, ew // 2  # center offsets in block domain
    for a in (0, 1):
        for b in (0, 1):
            for dh in range(kh):
                for dw in range(kw):
                    rh = a + (dh - kh // 2)
                    rw = b + (dw - kw // 2)
                    DH, pa = rh // 2 + oh, rh % 2
                    DW, pb = rw // 2 + ow, rw % 2
                    idx[DH, DW, pa, pb, a, b] = dh * kw + dw
    taps = jnp.concatenate(
        [
            kernel.reshape(kt, P, ci, co),
            jnp.zeros((kt, 1, ci, co), kernel.dtype),
        ],
        axis=1,
    )
    # (kt, eh, ew, pa, pb, a, b, ci, co) → rows ci·4+pa·2+pb, cols co·4+a·2+b
    g = jnp.take(taps, jnp.asarray(idx.reshape(-1)), axis=1).reshape(
        kt, eh, ew, 2, 2, 2, 2, ci, co
    )
    out = jnp.transpose(g, (0, 1, 2, 7, 3, 4, 8, 5, 6)).reshape(
        kt, eh, ew, ci * 4, co * 4
    )
    return out


def conv3d_s2d(x, kernel, bias):
    """Exact stride-1 SAME conv via space-to-depth (factor 2).

    (b,t,H,W,C) → pack 2×2 pixel phases into channels → conv at (H/2, W/2)
    with 4× the channels on both sides → unpack. Identical math, but the MXU
    sees 4ci×4co channel blocks instead of the tiny ci×co that XLA pads to
    128 lanes — the decisive fix for this model's 12-64 channel UNet convs.
    """
    b, t, h, w, c = x.shape
    kt, kh, kw, _, cout = kernel.shape
    # phase-minor packing: channel index = c·4 + a·2 + b
    xs = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    xs = jnp.transpose(xs, (0, 1, 2, 4, 6, 3, 5)).reshape(b, t, h // 2, w // 2, c * 4)
    ks = _s2d_kernel(kernel).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xs, ks, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + jnp.repeat(bias.astype(jnp.float32), 4)
    y = y.reshape(b, t, h // 2, w // 2, cout, 2, 2)
    y = jnp.transpose(y, (0, 1, 2, 5, 3, 6, 4)).reshape(b, t, h, w, cout)
    return y.astype(x.dtype)


def conv3d_decomposed2d(x, kernel, bias):
    """(kt,kh,kw) conv as kt temporally-shifted 2D convs (identical math).

    XLA's 2D conv emitter beats its 3D path on wide spatial kernels — the
    (3,7,7) UNet patch-mixer runs ~1.7× faster this way (tools/bench_conv3d.py).
    """
    b, t, h, w, c = x.shape
    kt = kernel.shape[0]
    cout = kernel.shape[-1]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    y = None
    for dt in range(kt):
        xt = jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1).reshape(b * t, h, w, c)
        part = jax.lax.conv_general_dilated(
            xt, kernel[dt], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        y = part if y is None else y + part
    y = y + bias.astype(jnp.float32)
    return y.reshape(b, t, h, w, cout).astype(x.dtype)


def _conv3d_xla(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


def _wgrad_kernel(
    *refs,
    kt, kh, kw, th, h, w, t, stride, csz, src_layout,
):
    """Filter gradient dW = im2col(x) @ gᵀ, accumulated across the grid.

    Reuses the forward kernel's halo-DMA + flat-lane im2col structure with a
    kt-frame window (no temporal M-packing — the output M dim is already the
    large tap·cin axis). Like the forward, MULTIPLE sources may DMA into
    adjacent sublane ranges of the halo window (src_layout) — the wgrad of a
    conv over a channel concat without materializing the concat (the UpBlock
    skip concats; ~270 MB/call at 256² otherwise re-created every backward).
    g arrives as a regular (1, cout, th·w) block; the single (K_pad, cout)
    fp32 output block has a CONSTANT index map, so it lives in VMEM across
    the whole sequential grid and accumulates in place.

    Why: both the hand-rolled channel-as-batch wgrad and XLA's native conv
    filter-gradient run ~1/200 of peak at these tiny channel counts — the
    (3,7,7) mixer's wgrad alone was 56 ms/step (xplane, v5e).
    """
    n_src = len(src_layout)
    srcs = refs[:n_src]
    g_ref, o_ref, in_buf, patches_ref, sems = refs[n_src:]
    i = pl.program_id(0)
    tiles_per_frame = h // th
    ph, pt = kh // 2, kt // 2
    dma_rows = th + kh - 1
    L = dma_rows * w
    rem = i % (t * tiles_per_frame)
    b_idx = i // (t * tiles_per_frame)
    t_idx = rem // tiles_per_frame
    row0 = (rem % tiles_per_frame) * th

    whole_frame = dma_rows >= h
    if whole_frame:
        rs = 0
    else:
        rs = jnp.clip(row0 - ph, 0, h - dma_rows)

    copies = []
    for df in range(kt):
        sf = t_idx - pt + df
        valid = jnp.logical_and(sf >= 0, sf < t)
        for si, x_hbm in enumerate(srcs):
            c_off, c_len = src_layout[si]
            if whole_frame:
                dst = in_buf.at[df, pl.ds(c_off, c_len), pl.ds(ph * w, h * w)]
                src = x_hbm.at[b_idx, jnp.clip(sf, 0, t - 1), :, :]
            else:
                dst = in_buf.at[df, pl.ds(c_off, c_len), :]
                src = x_hbm.at[b_idx, jnp.clip(sf, 0, t - 1), :, pl.ds(rs * w, L)]
            copy = pltpu.make_async_copy(src, dst, sems.at[df, si])
            @pl.when(valid)
            def _start(copy=copy):
                copy.start()
            copies.append((valid, copy))
        @pl.when(jnp.logical_not(valid))
        def _zero(df=df):
            in_buf[df, :, :] = jnp.zeros((stride, L), in_buf.dtype)
    if whole_frame and ph:
        in_buf[:, :, : ph * w] = jnp.zeros((kt, stride, ph * w), in_buf.dtype)
        in_buf[:, :, (ph + h) * w :] = jnp.zeros(
            (kt, stride, L - (ph + h) * w), in_buf.dtype
        )
    for valid, copy in copies:
        @pl.when(valid)
        def _wait(copy=copy):
            copy.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kt, stride, L), dimension=2) >> (
        w.bit_length() - 1
    )
    if not whole_frame and ph:
        @pl.when(row0 == 0)
        def _top():
            rolled = pltpu.roll(in_buf[:].astype(jnp.float32), shift=ph * w, axis=2)
            in_buf[:] = jnp.where(row_ids < ph, 0.0, rolled).astype(in_buf.dtype)

        @pl.when(row0 == h - th)
        def _bottom():
            rolled = pltpu.roll(
                in_buf[:].astype(jnp.float32), shift=(-ph * w) % L, axis=2
            )
            in_buf[:] = jnp.where(row_ids >= dma_rows - ph, 0.0, rolled).astype(
                in_buf.dtype
            )

    g = g_ref[0]  # (cout, th·w)
    chunk_k = csz * kh * kw * stride
    for dt0 in range(0, kt, csz):
        ncf = min(csz, kt - dt0)
        window = in_buf[dt0 : dt0 + ncf]
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (ncf, stride, L), dimension=2
        ) & (w - 1)
        shifted = {0: window}
        for dw in range(kw):
            shift = dw - kw // 2
            if shift == 0:
                continue
            rolled = pltpu.roll(window.astype(jnp.float32), shift=(-shift) % L, axis=2)
            if shift < 0:
                rolled = jnp.where(col_ids < -shift, 0.0, rolled)
            else:
                rolled = jnp.where(col_ids >= w - shift, 0.0, rolled)
            shifted[shift] = rolled.astype(window.dtype)

        tap = 0
        for dt in range(ncf):
            for dh in range(kh):
                for dw in range(kw):
                    shift = dw - kw // 2
                    piece = shifted[shift][dt, :, dh * w : dh * w + th * w]
                    patches_ref[tap * stride : (tap + 1) * stride, :] = piece
                    tap += 1
        part = jax.lax.dot_general(  # (chunk_k, cout): contract the pixel dim
            patches_ref[: ncf * kh * kw * stride, :], g,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows = slice(dt0 * kh * kw * stride, dt0 * kh * kw * stride + ncf * kh * kw * stride)
        @pl.when(i == 0)
        def _init(rows=rows, part=part):
            o_ref[rows, :] = part
        @pl.when(i > 0)
        def _acc(rows=rows, part=part):
            o_ref[rows, :] = o_ref[rows, :] + part


@functools.partial(jax.jit, static_argnames=("kt", "kh", "kw", "interpret"))
def _conv3d_wgrad_pallas_cf(x, g, kt, kh, kw, interpret=False):
    """dW (kt,kh,kw,cin,cout) for a stride-1 SAME cf conv via the Pallas
    im2col wgrad kernel. x: (b,t,cin,h,w) — or a TUPLE of cf activations
    whose CHANNEL CONCAT is the conv input (each 8-aligned; the concat never
    materializes, mirroring the forward's multi-source halo DMA).
    g: (b,t,cout,h,w) cotangent."""
    xs = x if isinstance(x, (tuple, list)) else (x,)
    b, t, _, h, w = xs[0].shape
    cins = [s.shape[2] for s in xs]
    cin = sum(cins)
    cout = g.shape[2]
    stride = _tap_stride(cin)
    if len(xs) == 1 and cin < stride:
        xs = (jnp.pad(xs[0], ((0, 0), (0, 0), (0, stride - cin), (0, 0), (0, 0))),)
        cins = [stride]
    assert all(c % 8 == 0 for c in cins), "multi-source channels must be 8-aligned"
    # row tile / K-chunking over the kt window frames
    th = _pick_tile_h(h, kt, kh, kw, w, stride)
    csz = _pick_chunk(kt, kh, kw, th, w, stride)
    k_pad = kt * kh * kw * stride
    dma_rows = th + kh - 1
    xf = tuple(s.reshape(b, t, c, h * w) for s, c in zip(xs, cins))
    offs = [sum(cins[:i]) for i in range(len(cins))]
    src_layout = tuple((o, c) for o, c in zip(offs, cins))
    gf = g.reshape(b * t, cout, h * w)
    tiles_per_frame = h // th
    grid = (b * t * tiles_per_frame,)
    out = pl.pallas_call(
        functools.partial(
            _wgrad_kernel,
            kt=kt, kh=kh, kw=kw, th=th, h=h, w=w, t=t, stride=stride, csz=csz,
            src_layout=src_layout,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(xf)  # manual halo DMA
        + [
            pl.BlockSpec(
                (1, cout, th * w),
                lambda i: (i // tiles_per_frame, 0, i % tiles_per_frame),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (k_pad, cout), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kt, stride, dma_rows * w), xs[0].dtype),
            pltpu.VMEM((csz * kh * kw * stride, th * w), xs[0].dtype),
            pltpu.SemaphoreType.DMA((kt, len(xf))),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # sequential: o_ref accumulates
        ),
        interpret=interpret,
    )(*xf, gf)
    dw = out.reshape(kt, kh, kw, stride, cout)[:, :, :, :cin, :]
    return dw


def pallas_wgrad_supported(x_shape, kernel_shape) -> bool:
    b, t, h, w, cin = x_shape
    kt, kh, kw, _, cout = kernel_shape
    if w % 128 or h % 8 or (w & (w - 1)):
        return False
    if kh % 2 == 0 or kw % 2 == 0 or kt % 2 == 0:
        return False
    stride = _tap_stride(cin)
    th = _pick_tile_h(h, kt, kh, kw, w, stride)
    return th is not None and h * w >= 128 * 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3d_direct(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME NDHWC conv3d.

    impl: "auto" picks per shape — Pallas direct kernel on TPU for large
    feature maps, temporal-decomposed 2D convs for wide spatial kernels
    (kh>3, e.g. the 7×7 patch mixer), plain XLA conv3d otherwise.
    """
    interpret = interpret or _env_interpret()
    on_tpu = jax.devices()[0].platform == "tpu"
    even_hw = x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0
    if impl == "auto":
        # per-shape winners measured on v5e (tools/bench_unet_parts.py):
        # the Pallas direct kernel at every supported shape (incl. the 7x7
        # mixer via K-chunking); temporally-decomposed 2D convs for wide
        # kernels it can't take; s2d at mid-size even maps; XLA otherwise.
        if (
            (on_tpu or interpret)
            and x.dtype.itemsize == 2  # VMEM budgets assume 2-byte elements
            and pallas_conv_supported(x.shape, kernel.shape)
        ):
            impl = "pallas"
        elif on_tpu and kernel.shape[1] > 3 and x.shape[2] * x.shape[3] >= 128 * 128:
            impl = "decomposed"
        elif on_tpu and kernel.shape[1] <= 3 and even_hw and x.shape[2] >= 32:
            impl = "s2d"
        else:
            impl = "xla"
    if impl == "pallas":
        mesh, axes = _mesh_info(x.shape[0])
        if mesh is not None and axes is None:
            impl = "xla"  # sharded mesh, batch not mappable — GSPMD-safe path
        else:
            _log_dispatch("conv3d_direct", "pallas", axes)
            if mesh is None:
                return _conv3d_pallas(x, kernel, bias, interpret=interpret)
            from jax.sharding import PartitionSpec as P

            return _shard_map(
                lambda xs, ks, bs: _conv3d_pallas(xs, ks, bs, interpret=interpret),
                mesh, (P(axes), P(), P()), P(axes),
            )(x, kernel, bias)
    _log_dispatch("conv3d_direct", impl, None)
    if impl == "s2d":
        return conv3d_s2d(x, kernel, bias)
    if impl == "decomposed":
        return conv3d_decomposed2d(x, kernel, bias)
    return _conv3d_xla(x, kernel, bias)


def _conv3d_fwd(x, kernel, bias, impl, interpret):
    return conv3d_direct(x, kernel, bias, impl, interpret), (x, kernel)


def _conv3d_bwd(impl, interpret, residuals, g):
    """Gradients via XLA convolutions (correct, not yet Pallas-accelerated).

    dx: correlation of g with the spatially-flipped, IO-swapped kernel.
    dw: correlation of x with g over the batch·spatial dims.
    db: sum of g over batch·spatial dims.
    """
    x, kernel = residuals
    g = g.astype(jnp.float32)
    kt, kh, kw, cin, cout = kernel.shape
    flipped = jnp.flip(kernel, axis=(0, 1, 2))  # (kt,kh,kw,cin,cout)
    flipped = jnp.swapaxes(flipped, 3, 4)  # → (kt,kh,kw,cout,cin)
    dx = jax.lax.conv_general_dilated(
        g, flipped.astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # wgrad through XLA's NATIVE conv filter-gradient (see _conv3d_cf_bwd:
    # hand-rolled channel-as-batch formulations run ~1/200 of peak on TPU).
    _, vjp_k = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ),
        kernel.astype(jnp.float32),
    )
    (dkernel,) = vjp_k(g)
    dkernel = dkernel.astype(kernel.dtype)
    dbias = jnp.sum(g, axis=(0, 1, 2, 3)).astype(jnp.float32)
    return dx, dkernel, dbias


conv3d_direct.defvjp(_conv3d_fwd, _conv3d_bwd)


# ---------------------------------------------------------------------------
# Channels-first path (b, t, c, h, w)
#
# The UNet runs its activations channels-first end-to-end so the Pallas direct
# kernel (internally channels-first) never pays per-call NDHWC↔NCDHW transposes
# — measured at ~0.8 ms per 256² conv on v5e (CLAUDE.md round-1 backlog). The
# fallback impls express the same conv through XLA dimension_numbers instead of
# materialized transposes so XLA may fuse any layout change it still wants.
# ---------------------------------------------------------------------------

_CF_DIMS = ("NDCHW", "DHWIO", "NDCHW")  # (b, t, c, h, w) in, DHWIO kernel


def _conv3d_xla_cf(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=_CF_DIMS,
        preferred_element_type=jnp.float32,
    )
    return (y + bias.astype(jnp.float32)[None, None, :, None, None]).astype(x.dtype)


def s2d_pack_cf(x: jnp.ndarray) -> jnp.ndarray:
    """(b,t,c,h,w) → (b,t,4c,h/2,w/2) with phase-minor channels c·4+a·2+b
    (the _s2d_kernel convention)."""
    b, t, c, h, w = x.shape
    xs = x.reshape(b, t, c, h // 2, 2, w // 2, 2)
    return jnp.transpose(xs, (0, 1, 2, 4, 6, 3, 5)).reshape(b, t, c * 4, h // 2, w // 2)


def s2d_unpack_cf(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d_pack_cf`."""
    b, t, c4, hh, ww = x.shape
    c = c4 // 4
    y = x.reshape(b, t, c, 2, 2, hh, ww)
    return jnp.transpose(y, (0, 1, 2, 5, 3, 6, 4)).reshape(b, t, c, 2 * hh, 2 * ww)


def _s2d1d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Width-only (factor 2) space-to-depth kernel transform.

    Output (kt, kh, EW, 2ci, 2co) with phase-minor channel order (c, b):
    W1d[dt, dh, DW, ci·2+pb, co·2+b] = W[dt, dh, dw, ci, co] where for output
    phase b and tap offset d = dw − kw//2: r = b + d, DW = floor(r/2) + center,
    pb = r mod 2. Pure index rearrangement — mathematically identical conv.

    Rationale vs the 2-D transform (_s2d_kernel): 2-D packing multiplies true
    FLOPs by 4 for a 3×3 kernel (each (DH,DW) tap's 4ci×4co block is 75%
    structural zeros that the MXU contracts anyway); width-only packing wastes
    only 2× while still doubling the contraction depth and halving the lane
    width (256-px rows → 128 lanes, exactly one full lane tile).
    """
    kt, kh, kw, ci, co = kernel.shape
    ew = _s2d_extent(kw)
    P = kw
    idx = np.full((ew, 2, 2), P, np.int32)  # (DW, pb, b)
    ow = ew // 2
    for b_ in (0, 1):
        for dw in range(kw):
            r = b_ + (dw - kw // 2)
            DW, pb = r // 2 + ow, r % 2
            idx[DW, pb, b_] = dw
    taps = jnp.concatenate(
        [kernel, jnp.zeros((kt, kh, 1, ci, co), kernel.dtype)], axis=2
    )  # (kt, kh, kw+1, ci, co)
    g = jnp.take(taps, jnp.asarray(idx.reshape(-1)), axis=2).reshape(
        kt, kh, ew, 2, 2, ci, co
    )
    # rows ci·2+pb, cols co·2+b
    return jnp.transpose(g, (0, 1, 2, 5, 3, 6, 4)).reshape(kt, kh, ew, ci * 2, co * 2)


def s2d1d_pack_cf(x: jnp.ndarray) -> jnp.ndarray:
    """(b,t,c,h,w) → (b,t,2c,h,w/2) with phase-minor channels c·2+b
    (the _s2d1d_kernel convention)."""
    b, t, c, h, w = x.shape
    xs = x.reshape(b, t, c, h, w // 2, 2)
    return jnp.transpose(xs, (0, 1, 2, 5, 3, 4)).reshape(b, t, c * 2, h, w // 2)


def s2d1d_unpack_cf(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d1d_pack_cf`."""
    b, t, c2, h, ww = x.shape
    c = c2 // 2
    y = x.reshape(b, t, c, 2, h, ww)
    return jnp.transpose(y, (0, 1, 2, 4, 5, 3)).reshape(b, t, c, h, 2 * ww)


def conv3d_s2d_cf(x, kernel, bias):
    """Space-to-depth (factor 2) conv, channels-first. Same math as conv3d_s2d."""
    b, t, c, h, w = x.shape
    kt, kh, kw, _, cout = kernel.shape
    # phase-minor packing: channel index = c·4 + a·2 + b (matches _s2d_kernel)
    xs = x.reshape(b, t, c, h // 2, 2, w // 2, 2)
    xs = jnp.transpose(xs, (0, 1, 2, 4, 6, 3, 5)).reshape(b, t, c * 4, h // 2, w // 2)
    ks = _s2d_kernel(kernel).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xs, ks, (1, 1, 1), "SAME",
        dimension_numbers=_CF_DIMS,
        preferred_element_type=jnp.float32,
    )
    y = y + jnp.repeat(bias.astype(jnp.float32), 4)[None, None, :, None, None]
    y = y.reshape(b, t, cout, 2, 2, h // 2, w // 2)
    y = jnp.transpose(y, (0, 1, 2, 5, 3, 6, 4)).reshape(b, t, cout, h, w)
    return y.astype(x.dtype)


def conv3d_decomposed2d_cf(x, kernel, bias):
    """(kt,kh,kw) conv as kt temporally-shifted 2D convs, channels-first."""
    b, t, c, h, w = x.shape
    kt = kernel.shape[0]
    cout = kernel.shape[-1]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    y = None
    for dt in range(kt):
        xt = jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1).reshape(b * t, c, h, w)
        part = jax.lax.conv_general_dilated(
            xt, kernel[dt], (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        y = part if y is None else y + part
    y = y + bias.astype(jnp.float32)[None, :, None, None]
    return y.reshape(b, t, cout, h, w).astype(x.dtype)


def _cf_auto_impl(x_shape, dtype, kernel_shape, on_tpu: bool, interpret: bool) -> str:
    """Measured on v5e (tools/bench_unet_parts.py, channels-first, in-context
    methodology): the Pallas M-packed kernel wins 2-11× over s2d/XLA/decomposed
    at every supported shape — including the (3,7,7) patch-mixer via K-chunking
    (4.0 ms vs 9.9 decomposed / 8.9 s2d at 12ch@256²); at w < 128 plain XLA is
    near-free (0.1-0.7 ms) while s2d collapses (3-25 ms — the phase pack/unpack
    shuffles at ≤64-lane widths dominate)."""
    b, t, c, h, w = x_shape
    if (
        (on_tpu or interpret)
        and jnp.dtype(dtype).itemsize == 2  # VMEM budgets assume 2-byte elements
        and pallas_conv_supported((b, t, h, w, c), kernel_shape)
    ):
        return "pallas"
    if on_tpu and kernel_shape[1] > 3 and h * w >= 128 * 128:
        return "decomposed"
    return "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3d_cf(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME conv3d on channels-first (b, t, c, h, w) activations.

    Kernel stays DHWIO (checkpoint-compatible with the channels-last path).
    """
    interpret = interpret or _env_interpret()
    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = _cf_auto_impl(x.shape, x.dtype, kernel.shape, on_tpu, interpret)
    if impl == "pallas":
        mesh, axes = _mesh_info(x.shape[0])
        if mesh is not None and axes is None:
            impl = "xla"  # sharded mesh, batch not mappable — GSPMD-safe path
        else:
            _log_dispatch("conv3d_cf", "pallas", axes)
            if mesh is None:
                return _conv3d_pallas_cf(x, kernel, bias, interpret=interpret)
            from jax.sharding import PartitionSpec as P

            return _shard_map(
                lambda xs, ks, bs: _conv3d_pallas_cf(xs, ks, bs, interpret=interpret),
                mesh, (P(axes), P(), P()), P(axes),
            )(x, kernel, bias)
    _log_dispatch("conv3d_cf", impl, None)
    if impl == "s2d":
        return conv3d_s2d_cf(x, kernel, bias)
    if impl == "decomposed":
        return conv3d_decomposed2d_cf(x, kernel, bias)
    return _conv3d_xla_cf(x, kernel, bias)


def _conv3d_cf_fwd(x, kernel, bias, impl, interpret):
    return conv3d_cf(x, kernel, bias, impl, interpret), (x, kernel)


def _cf_grads(srcs, kernel, interpret, g):
    """Shared cf-layout gradient core over one-or-more channel-concat sources.

    dx is itself a stride-1 SAME conv (spatially flipped, IO-swapped kernel),
    so it re-enters conv3d_cf's dispatch and runs on the Pallas direct kernel
    at supported shapes — XLA's padded conv made the backward as MXU-hostile
    as the round-1 forward. Matches the forward's precision (bf16 operands,
    fp32 accumulation). Returns the FULL (c1+…+cn)-channel dx; cat2 callers
    slice it per source.

    wgrad: the Pallas im2col wgrad kernel where supported — BOTH the
    hand-rolled channel-as-batch formulation and XLA's native conv
    filter-gradient run ~1/200 of peak at these channel counts (the (3,7,7)
    mixer's wgrad alone was 56 ms/step in the v5e train-step trace, both
    ways). Multi-source inputs go through the kernel's multi-source halo DMA
    (no concat materialization); off the supported shapes the XLA fallback
    concats (cheap there — those are the small/CPU shapes).
    """
    x0 = srcs[0]
    interpret = interpret or _env_interpret()
    kt, kh, kw, cin, cout = kernel.shape
    flipped = jnp.swapaxes(jnp.flip(kernel, axis=(0, 1, 2)), 3, 4)  # (kt,kh,kw,cout,cin)
    dx = conv3d_cf(
        g.astype(x0.dtype),
        flipped.astype(x0.dtype),
        jnp.zeros((cin,), jnp.float32),
        "auto",
        interpret,
    )
    b, t, _, h, w = x0.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    mesh, axes = _mesh_info(b)
    multi_ok = len(srcs) == 1 or all(s.shape[2] % 8 == 0 for s in srcs)
    if (
        (on_tpu or interpret)
        and x0.dtype.itemsize == 2
        and multi_ok
        and pallas_wgrad_supported((b, t, h, w, cin), kernel.shape)
        and not (mesh is not None and axes is None)
    ):
        xs = srcs[0] if len(srcs) == 1 else tuple(srcs)
        if mesh is None:
            dkernel = _conv3d_wgrad_pallas_cf(
                xs, g.astype(x0.dtype), kt, kh, kw, interpret=interpret
            ).astype(kernel.dtype)
        else:
            # per-shard partial wgrads contract only the local batch; the
            # filter gradient needs the cross-shard sum
            from jax.sharding import PartitionSpec as P

            _log_dispatch("conv3d_cf_wgrad", "pallas", axes)
            n = len(srcs)

            def _wgrad_psum(*args):
                xs_l, gs = (args[0] if n == 1 else tuple(args[:n])), args[n]
                dw = _conv3d_wgrad_pallas_cf(xs_l, gs, kt, kh, kw, interpret=interpret)
                return jax.lax.psum(dw, axes)

            dkernel = _shard_map(
                _wgrad_psum, mesh, (P(axes),) * (n + 1), P()
            )(*srcs, g.astype(x0.dtype)).astype(kernel.dtype)
    else:
        x = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=2)
        _, vjp_k = jax.vjp(
            lambda k: jax.lax.conv_general_dilated(
                x.astype(jnp.float32), k, (1, 1, 1), "SAME",
                dimension_numbers=_CF_DIMS,
                preferred_element_type=jnp.float32,
            ),
            kernel.astype(jnp.float32),
        )
        (dkernel,) = vjp_k(g.astype(jnp.float32))
        dkernel = dkernel.astype(kernel.dtype)
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 3, 4))
    return dx, dkernel, dbias


def _conv3d_cf_bwd(impl, interpret, residuals, g):
    x, kernel = residuals
    return _cf_grads((x,), kernel, interpret, g)


conv3d_cf.defvjp(_conv3d_cf_fwd, _conv3d_cf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3d_cf_pooled(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    impl: str = "auto",
    interpret: bool = False,
):
    """Stride-1 SAME conv3d + fused (1,2,2) max pool, channels-first.

    Returns ``(full, pooled)`` — the conv output and its 2×2 spatial max pool,
    computed in the Pallas kernel epilogue when the direct kernel applies
    (zero extra HBM reads; XLA's reduce-window on a separate pass costs ~ms at
    256²). NOTE: only valid where the pool directly follows the conv — the
    UNet's DownBlocks pool after GroupNorm+SiLU (non-monotonic), so they can
    NOT use this; it exists for conv→pool patterns (e.g. discriminator-style
    heads) and as the fused building block it is.
    """
    from video_vae_tpu.ops.norm import max_pool_2x_cf

    interpret = interpret or _env_interpret()
    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = _cf_auto_impl(x.shape, x.dtype, kernel.shape, on_tpu, interpret)
    if impl == "pallas":
        mesh, axes = _mesh_info(x.shape[0])
        if mesh is not None and axes is None:
            impl = "xla"
        else:
            _log_dispatch("conv3d_cf_pooled", "pallas", axes)
            if mesh is None:
                return _conv3d_pallas_cf(x, kernel, bias, interpret=interpret, pool=True)
            from jax.sharding import PartitionSpec as P

            return _shard_map(
                lambda xs, ks, bs: _conv3d_pallas_cf(
                    xs, ks, bs, interpret=interpret, pool=True
                ),
                mesh, (P(axes), P(), P()), (P(axes), P(axes)),
            )(x, kernel, bias)
    full = conv3d_cf(x, kernel, bias, impl, interpret)
    return full, max_pool_2x_cf(full)


def _conv3d_cf_pooled_fwd(x, kernel, bias, impl, interpret):
    full, pooled = conv3d_cf_pooled(x, kernel, bias, impl, interpret)
    return (full, pooled), (x, kernel, full)


def _conv3d_cf_pooled_bwd(impl, interpret, residuals, g):
    """Route the pooled cotangent through max-pool's VJP (argmax selection on
    the saved conv output), then one shared conv backward."""
    from video_vae_tpu.ops.norm import max_pool_2x_cf

    x, kernel, full = residuals
    g_full, g_pool = g
    _, pool_vjp = jax.vjp(max_pool_2x_cf, full)
    (g_from_pool,) = pool_vjp(g_pool.astype(full.dtype))
    return _conv3d_cf_bwd(
        impl, interpret, (x, kernel), g_full.astype(jnp.float32) + g_from_pool.astype(jnp.float32)
    )


conv3d_cf_pooled.defvjp(_conv3d_cf_pooled_fwd, _conv3d_cf_pooled_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3d_cf_cat2(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME conv3d over the CHANNEL CONCAT of two cf activations.

    Mathematically ``conv3d_cf(concat([x1, x2], axis=2), kernel, bias)`` —
    kernel cin = c1+c2 — but the Pallas path DMAs each source into its own
    sublane range of the halo window, so the concatenated tensor never exists
    in HBM (the UNet UpBlocks concat a same-shape skip before each conv1;
    at 256² the concat write+read is ~270 MB of traffic per call).
    """
    b, t, c1, h, w = x1.shape
    c2 = x2.shape[2]
    interpret = interpret or _env_interpret()
    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = _cf_auto_impl(
            (b, t, c1 + c2, h, w), x1.dtype, kernel.shape, on_tpu, interpret
        )
    if impl == "pallas" and c1 % 8 == 0 and c2 % 8 == 0:
        mesh, axes = _mesh_info(b)
        if mesh is not None and axes is None:
            impl = "xla"
        else:
            _log_dispatch("conv3d_cf_cat2", "pallas", axes)
            if mesh is None:
                return _conv3d_pallas_cf((x1, x2), kernel, bias, interpret=interpret)
            from jax.sharding import PartitionSpec as P

            return _shard_map(
                lambda a, bsrc, ks, bs: _conv3d_pallas_cf(
                    (a, bsrc), ks, bs, interpret=interpret
                ),
                mesh, (P(axes), P(axes), P(), P()), P(axes),
            )(x1, x2, kernel, bias)
    return conv3d_cf(
        jnp.concatenate([x1, x2], axis=2), kernel, bias, impl, interpret
    )


def _conv3d_cf_cat2_fwd(x1, x2, kernel, bias, impl, interpret):
    return conv3d_cf_cat2(x1, x2, kernel, bias, impl, interpret), (x1, x2, kernel)


def _conv3d_cf_cat2_bwd(impl, interpret, residuals, g):
    """No materialized concat in the backward either: dx never needs x at all
    (it's a conv of g), and the wgrad DMAs both sources into the halo window
    (see _cf_grads / _wgrad_kernel src_layout)."""
    x1, x2, kernel = residuals
    c1 = x1.shape[2]
    dx, dkernel, dbias = _cf_grads((x1, x2), kernel, interpret, g)
    return dx[:, :, :c1], dx[:, :, c1:], dkernel, dbias


conv3d_cf_cat2.defvjp(_conv3d_cf_cat2_fwd, _conv3d_cf_cat2_bwd)
