"""Pallas TPU kernel: fused residual-unit stack (BASELINE.json:5
"causal/dilated conv blocks ... fused as Pallas kernels"; SURVEY.md §3 #3).

A SEANet stage applies 3 residual units (snake -> dilated k3 conv -> snake ->
1x1 conv -> residual add) back-to-back. The XLA lowering round-trips the full
(B, T, C) activation through HBM ~8x per stage; profiling shows those convs
are MEMORY-bound (~5 ms each at stage-1/2 sizes regardless of C). This kernel
runs the WHOLE stage per time-tile in VMEM:

  DMA x[tile - halo : tile_end] -> VMEM once
  for each unit (static unroll):
      snake -> 3 shifted (T', C)x(C, C) MXU matmuls (dilated k3) -> snake
            -> 1x1 matmul -> aligned residual add   (all VMEM)
  write y[tile] once

halo = sum(2 * d) over unit dilations; the host wrapper left-pads by a
128-row-aligned halo allocation (zeros == causal padding), so tile 0 is
exact. Mosaic requires DMA slices aligned to the (8, 128) tile, so the
wrapper passes a lane-packed (B, T'*C/128, 128) view of the signal and the
kernel reshapes to (rows, C) in VMEM — this supports any power-of-two C.

Numerics: same ops in the same dtype as the reference path; equality is
float-tolerance (bf16 reordering), tested in tests/unit/test_pallas_stack.py.
Inference path only — training uses the reference lowering (clean VJPs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 2048


def _snake(x, alpha, eps=1e-9):
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + eps)


def _snake_fast(x, alpha, eps=1e-9):
    """Polynomial sin^2 variant (same formula as ops.conv.snake_fast)."""
    import numpy as np
    from nsc_tpu.ops.conv import _SIN_SQ_C0, _SIN_SQ_C1, _SIN_SQ_C2, _SIN_SQ_C3

    t = (alpha * x).astype(jnp.float32)
    r = t - jnp.round(t * (1.0 / np.pi)) * np.pi
    u = r * r
    q = _SIN_SQ_C0 + u * (_SIN_SQ_C1 + u * (_SIN_SQ_C2 + u * _SIN_SQ_C3))
    return x + ((u * q) / (alpha.astype(jnp.float32) + eps)).astype(x.dtype)


def _stack_kernel(
    xp_hbm, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref, out_ref,
    seg, sem, *, dilations, halo_alloc, tile_t, c, fast_act,
):
    act = _snake_fast if fast_act else _snake
    # The signal arrives channel-padded to >=128 lanes: Mosaic requires
    # manual-DMA slices aligned to the (8, 128) tile. The compute below runs
    # on the first `c` lanes only.
    ib = pl.program_id(0)
    jt = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[ib, pl.ds(jt * tile_t, tile_t + halo_alloc)], seg, sem
    )
    dma.start()
    dma.wait()

    full = seg[:]
    buf = full[:, 0:c] if full.shape[1] != c else full
    off = 0
    for u, d in enumerate(dilations):
        length = tile_t + halo_alloc - off
        alpha1 = a1_ref[pl.ds(u, 1), :]  # (1, C) — keep 2D for Mosaic
        alpha2 = a2_ref[pl.ds(u, 1), :]
        bias1 = b1_ref[pl.ds(u, 1), :]
        bias2 = b2_ref[pl.ds(u, 1), :]
        a1v = act(buf, alpha1)
        y = jax.lax.dot_general(
            a1v[0 : length - 2 * d], w1_ref[u, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            a1v[d : length - d], w1_ref[u, 1],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            a1v[2 * d : length], w1_ref[u, 2],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        y = (y + bias1.astype(jnp.float32)).astype(buf.dtype)
        a2v = act(y, alpha2)
        z = jax.lax.dot_general(
            a2v, w2_ref[u],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        z = (z + bias2.astype(jnp.float32)).astype(buf.dtype)
        buf = buf[2 * d : length] + z
        off += 2 * d
        # Reference semantics: every conv zero-pads its own (activated)
        # input. On tile 0 the remaining halo rows correspond to t < 0 and
        # must stay zero, or the next unit's taps see the zero-input
        # response (bias ripple) the reference never produces.
        rem = halo_alloc - off
        if rem > 0:
            row = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 0)
            keep = (row >= rem) | (jt > 0)
            buf = jnp.where(keep, buf, 0)

    surplus = halo_alloc - off
    res = buf[surplus:] if surplus else buf  # (tile_t, C)
    out_ref[0] = res


@functools.partial(
    jax.jit, static_argnames=("dilations", "interpret", "tile_t", "fast_act")
)
def residual_stack_pallas(
    x: jax.Array,
    w1: jax.Array,  # (U, 3, C, C) materialized conv weights
    b1: jax.Array,  # (U, C)
    a1: jax.Array,  # (U, C) snake alphas
    w2: jax.Array,  # (U, C, C) 1x1 weights
    b2: jax.Array,  # (U, C)
    a2: jax.Array,  # (U, C)
    *,
    dilations: tuple,
    interpret: bool = False,
    tile_t: int | None = None,
    fast_act: bool = False,
) -> jax.Array:
    """x (B, T, C) -> (B, T, C): the full residual-unit stack of one stage."""
    b, t, c = x.shape
    halo = sum(2 * d for d in dilations)
    halo_alloc = ((halo + 7) // 8) * 8  # sublane alignment for the DMA rows
    if tile_t is None:
        # keep the unrolled unit-loop's live values within VMEM: the stack
        # holds ~6 (tile, C) f32 buffers, so budget tile*C ~= 128k elements
        tile_t = max(128, min(TILE_T, (1 << 17) // c))
    assert tile_t % 8 == 0, tile_t
    pad_t = (-t) % tile_t
    c_pad = max(c, 128)  # lane alignment for the DMA minor dim
    xp = jnp.pad(x, ((0, 0), (halo_alloc, pad_t), (0, c_pad - c)))
    t_tot = t + pad_t
    n_tiles = t_tot // tile_t

    out = pl.pallas_call(
        functools.partial(
            _stack_kernel, dilations=dilations, halo_alloc=halo_alloc,
            tile_t=tile_t, c=c, fast_act=fast_act,
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed signal; manual DMA
            pl.BlockSpec(w1.shape, lambda ib, jt: (0,) * 4, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(a1.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda ib, jt: (0,) * 3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(a2.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, c), lambda ib, jt: (ib, jt, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_tot, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_t + halo_alloc, c_pad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1, b1, a1, w2, b2, a2)
    return out[:, :t]


def pack_stage_params(units, cfg) -> tuple:
    """Stack a stage's residual-unit params for the kernel.
    units: list of unit param dicts (seanet layout). Requires snake
    activation and weight-norm/plain conv weights."""
    from nsc_tpu.ops.conv import materialize_weight

    w1 = jnp.stack([
        jnp.transpose(materialize_weight(u["conv1"]), (0, 1, 2))  # (3, C, C)
        for u in units
    ])
    b1 = jnp.stack([u["conv1"]["b"] for u in units])
    a1 = jnp.stack([u["act1"]["alpha"] for u in units])
    w2 = jnp.stack([materialize_weight(u["conv2"])[0] for u in units])  # (C, C)
    b2 = jnp.stack([u["conv2"]["b"] for u in units])
    a2 = jnp.stack([u["act2"]["alpha"] for u in units])
    return w1, b1, a1, w2, b2, a2


# ---------------------------------------------------------------------------
# CT-layout variant (round 2)
# ---------------------------------------------------------------------------
#
# The (T, C)-layout kernel above must lane-pad C to 128 (4x DMA + ALU waste at
# C=32), which is why it measured 1.8x SLOWER than XLA (docs/PERFORMANCE.md).
# This variant keeps channels on SUBLANES and time on LANES ((B, C, T)), so
# every op runs at full lane utilization for any C >= 8:
#
#   * snake: (C, 1) alpha broadcast over T lanes — full-rate VPU.
#   * k3 dilated conv: 3 static-lane-shifted (Cin, Cout)^T x (Cin, L) MXU
#     matmuls (same contraction XLA's conv uses, shifted views instead of
#     im2col).
#   * XLA's conv<->fusion layout flips (the {0,2,1}<->{1,2,0} copies that
#     cost ~10 ms per snake sandwich at stage-1 size — docs/PERFORMANCE.md
#     round-2 notes) never happen: the whole stage is one custom call.
#
# Halos: host-side tile gather with left halo (zero-padded => causal), the
# same pattern as ops/pallas/stft.py; duplication ~(1 + halo/tile) ~= 1.06x.

TILE_T_CT = 8192


def _snake_ct(x, alpha_col, eps=1e-9):
    s = jnp.sin(alpha_col * x)
    return x + s * s / (alpha_col + eps)


def _snake_fast_ct(x, alpha_col, eps=1e-9):
    import numpy as np
    from nsc_tpu.ops.conv import _SIN_SQ_C0, _SIN_SQ_C1, _SIN_SQ_C2, _SIN_SQ_C3

    f = (alpha_col * x).astype(jnp.float32)
    r = f - jnp.round(f * (1.0 / np.pi)) * np.pi
    u = r * r
    q = _SIN_SQ_C0 + u * (_SIN_SQ_C1 + u * (_SIN_SQ_C2 + u * _SIN_SQ_C3))
    inv = 1.0 / (alpha_col.astype(jnp.float32) + eps)
    return x + ((u * q) * inv).astype(x.dtype)


def _stack_ct_kernel(
    seg_ref, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref, out_ref,
    *, dilations, halo, tile_t, fast_act,
):
    act = _snake_fast_ct if fast_act else _snake_ct
    jt = pl.program_id(1)
    buf = seg_ref[0, 0]  # (C, halo + tile_t)
    off = 0
    for u, d in enumerate(dilations):
        length = halo + tile_t - off
        a1 = a1_ref[:, pl.ds(u, 1)]  # (C, 1) columns — lane-broadcast
        a2 = a2_ref[:, pl.ds(u, 1)]
        bi1 = b1_ref[:, pl.ds(u, 1)]
        bi2 = b2_ref[:, pl.ds(u, 1)]
        a1v = act(buf, a1)
        dn = (((0,), (0,)), ((), ()))  # contract Cin (sublanes)
        y = jax.lax.dot_general(
            w1_ref[u, 0], a1v[:, 0 : length - 2 * d], dn,
            preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            w1_ref[u, 1], a1v[:, d : length - d], dn,
            preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            w1_ref[u, 2], a1v[:, 2 * d : length], dn,
            preferred_element_type=jnp.float32,
        )
        y = (y + bi1.astype(jnp.float32)).astype(buf.dtype)
        a2v = act(y, a2)
        z = jax.lax.dot_general(
            w2_ref[u], a2v, dn, preferred_element_type=jnp.float32
        )
        z = (z + bi2.astype(jnp.float32)).astype(buf.dtype)
        buf = buf[:, 2 * d : length] + z
        off += 2 * d
        # reference semantics: remaining halo lanes of tile 0 are t < 0 and
        # must stay zero or later taps see bias ripple the reference lacks
        rem = halo - off
        if rem > 0:
            col = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)
            keep = (col >= rem) | (jt > 0)
            buf = jnp.where(keep, buf, 0)
    surplus = halo - off
    out_ref[0] = buf[:, surplus:] if surplus else buf


@functools.partial(
    jax.jit, static_argnames=("dilations", "interpret", "tile_t", "fast_act")
)
def residual_stack_ct_pallas(
    x: jax.Array,   # (B, C, T) — channels-on-sublanes layout
    w1: jax.Array,  # (U, 3, Cin, Cout) materialized conv weights
    b1: jax.Array,  # (U, C)
    a1: jax.Array,  # (U, C)
    w2: jax.Array,  # (U, Cin, Cout)
    b2: jax.Array,  # (U, C)
    a2: jax.Array,  # (U, C)
    *,
    dilations: tuple,
    interpret: bool = False,
    tile_t: int | None = None,
    fast_act: bool = False,
) -> jax.Array:
    """x (B, C, T) -> (B, C, T): full residual-unit stack of one stage.

    NOTE (measured, r2): fusing the stage's trailing activation (down_act/
    up_act) into this kernel is a net LOSS (+10 ms end-to-end) — the XLA
    standalone snake that follows doubles as a free layout converter between
    this kernel's {2,1,0} output and the strided conv's preferred {0,2,1}
    input; fused away, that conversion becomes a raw full-tensor copy. A
    standalone CT elementwise snake pass loses even more (+32 ms: extra HBM
    round trip). Hence the kernel ends at the last residual add."""
    import numpy as np

    b, c, t = x.shape
    halo = sum(2 * d for d in dilations)
    halo_pad = ((halo + 127) // 128) * 128  # lane alignment
    if tile_t is None:
        # ~6 live (C, tile) f32 buffers; keep them well under the VMEM scope
        tile_t = max(512, min(TILE_T_CT, (1 << 19) // c // 128 * 128))
    pad_t = (-t) % tile_t
    t_tot = t + pad_t
    n_tiles = t_tot // tile_t
    seg_len = halo_pad + tile_t

    # left halo_pad zeros == causal padding; right pad to the tile grid
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo_pad, pad_t)))
    seg_idx = (
        np.arange(n_tiles)[:, None] * tile_t
        + np.arange(seg_len)[None, :]
    )
    segs = jnp.moveaxis(xp[:, :, seg_idx], 2, 1)  # (B, n_tiles, C, seg_len)

    # params transposed so per-unit columns broadcast over lanes
    a1t, a2t = a1.T, a2.T  # (C, U)
    b1t, b2t = b1.T, b2.T

    out = pl.pallas_call(
        functools.partial(
            _stack_ct_kernel, dilations=dilations, halo=halo_pad,
            tile_t=tile_t, fast_act=fast_act,
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, c, seg_len), lambda ib, jt: (ib, jt, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(w1.shape, lambda ib, jt: (0,) * 4, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1t.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(a1t.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda ib, jt: (0,) * 3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2t.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(a2t.shape, lambda ib, jt: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, tile_t), lambda ib, jt: (ib, 0, jt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, t_tot), x.dtype),
        interpret=interpret,
    )(segs, w1, b1t, a1t, w2, b2t, a2t)
    return out[:, :, :t]
