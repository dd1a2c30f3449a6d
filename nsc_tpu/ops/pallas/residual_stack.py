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
            pl.BlockSpec(memory_space=pl.ANY),  # packed signal; manual DMA
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


def _zero_stale_halo(buf, rem, jt):
    """Zero lanes [0, rem) on tile 0: they correspond to t < 0 and a conv's
    bias would otherwise leave non-zero values the reference never sees."""
    if rem > 0:
        col = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)
        buf = jnp.where((col >= rem) | (jt > 0), buf, 0)
    return buf


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
# Lanes of left context carried across grid steps in VMEM scratch (>= the
# stage's receptive field sum(2*d); 128 keeps every store lane-aligned).
CARRY_CT = 128


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
    x_ref, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref, out_ref,
    *scratch, dilations, tile_t, fast_act,
):
    """One non-overlapping (C, tile_t) input block per grid step; each unit's
    left context (last CARRY_CT lanes of ITS OWN input) persists in VMEM
    scratch across the sequential time-grid — no host-side halo gather, no
    input duplication, and tile 0's zeroed carry IS the causal zero padding
    (so no stale-bias masking is needed: carries are true previous-tile
    values, exactly like streaming conv state)."""
    act = _snake_fast_ct if fast_act else _snake_ct
    jt = pl.program_id(1)
    c = x_ref.shape[-2]
    buf = x_ref[0]  # (C, tile_t)
    dn = (((0,), (0,)), ((), ()))  # contract Cin (sublanes)
    for u, d in enumerate(dilations):
        scr = scratch[u]  # (C, CARRY_CT + tile_t)

        @pl.when(jt == 0)
        def _():
            scr[:, 0:CARRY_CT] = jnp.zeros((c, CARRY_CT), buf.dtype)

        scr[:, CARRY_CT:] = buf
        full = scr[:, :]  # (C, CARRY_CT + tile_t) = [carry | this tile]
        a1 = a1_ref[:, pl.ds(u, 1)]  # (C, 1) columns — lane-broadcast
        a2 = a2_ref[:, pl.ds(u, 1)]
        bi1 = b1_ref[:, pl.ds(u, 1)]
        bi2 = b2_ref[:, pl.ds(u, 1)]
        a1v = act(full, a1)
        y = jax.lax.dot_general(
            w1_ref[u, 0], a1v[:, CARRY_CT - 2 * d : CARRY_CT - 2 * d + tile_t],
            dn, preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            w1_ref[u, 1], a1v[:, CARRY_CT - d : CARRY_CT - d + tile_t],
            dn, preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            w1_ref[u, 2], a1v[:, CARRY_CT : CARRY_CT + tile_t],
            dn, preferred_element_type=jnp.float32,
        )
        y = (y + bi1.astype(jnp.float32)).astype(buf.dtype)
        a2v = act(y, a2)
        z = jax.lax.dot_general(
            w2_ref[u], a2v, dn, preferred_element_type=jnp.float32
        )
        z = (z + bi2.astype(jnp.float32)).astype(buf.dtype)
        # next grid step's carry = this tile's last CARRY_CT input lanes
        scr[:, 0:CARRY_CT] = full[:, tile_t:]
        buf = buf + z  # residual add
    out_ref[0] = buf


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

    r2b rewrite: the halo is carried in VMEM scratch across the sequential
    time grid (see _stack_ct_kernel) instead of a host-side overlapping-tile
    gather. The gather was measured at ~24 ms device time at stage-1 bench
    size (vs an 8 ms copy floor) — a hidden per-stage input tax; the scratch
    carry eliminates it entirely (input blocks are plain non-overlapping
    BlockSpec tiles).

    NOTE (measured, r2): fusing the stage's trailing activation (down_act/
    up_act) into this kernel is a net LOSS (+10 ms end-to-end) — the XLA
    standalone snake that follows doubles as a free layout converter between
    this kernel's {2,1,0} output and the strided conv's preferred {0,2,1}
    input; fused away, that conversion becomes a raw full-tensor copy. A
    standalone CT elementwise snake pass loses even more (+32 ms: extra HBM
    round trip). Hence the kernel ends at the last residual add. Fusing the
    whole boundary (act + strided conv, fused_stage_ct_pallas below) was
    also measured a wash-to-loss: the phase-decomposition lane shuffle it
    needs costs as much as the layout flips it removes (docs/PERFORMANCE.md
    r2b)."""
    b, c, t = x.shape
    halo = sum(2 * d for d in dilations)
    assert halo <= CARRY_CT, (dilations, "receptive field exceeds CARRY_CT")
    if tile_t is None:
        # ~6 live (C, tile) f32 buffers; keep them well under the VMEM scope
        tile_t = max(512, min(TILE_T_CT, (1 << 19) // c // 128 * 128))
        # short inputs (streaming chunks, final partial segments): shrink the
        # tile to the input so the masked partial-block region stays < 128
        # lanes instead of most of a default-size tile
        if t < tile_t:
            tile_t = max(128, -(-t // 128) * 128)
    assert tile_t % 128 == 0, tile_t  # keeps every scratch store lane-aligned
    # No host-side pad/trim: Pallas masks the non-dividing final block (its
    # padded lanes only feed outputs that the masked write drops — causal
    # convs never read rightward), and the next batch row re-zeros the carry.
    n_tiles = (t + tile_t - 1) // tile_t

    # params transposed so per-unit columns broadcast over lanes
    a1t, a2t = a1.T, a2.T  # (C, U)
    b1t, b2t = b1.T, b2.T
    # conv weights in the COMPUTE dtype, exactly like the XLA reference
    # (conv1d casts w to x.dtype): parity improves AND bf16xbf16 dots run at
    # full MXU rate instead of mixed-precision f32 passes
    w1, w2 = w1.astype(x.dtype), w2.astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _stack_ct_kernel, dilations=dilations,
            tile_t=tile_t, fast_act=fast_act,
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, c, tile_t), lambda ib, jt: (ib, 0, jt),
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
        out_shape=jax.ShapeDtypeStruct((b, c, t), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, CARRY_CT + tile_t), x.dtype) for _ in dilations
        ],
        interpret=interpret,
    )(x, w1, b1t, a1t, w2, b2t, a2t)
    return out


# ---------------------------------------------------------------------------
# Boundary-fused variant (round 2b): stage kernel with optional strided head
# and transposed tail
# ---------------------------------------------------------------------------
#
# The CT unit-stack kernel above still leaves one standalone snake site per
# stage boundary (encoder down_act, decoder up_act, ~10 ms of XLA layout
# copies each at stage-1/2 sizes — docs/PERFORMANCE.md r2). Fusing the act
# alone into the kernel tail was measured SLOWER because the following
# strided conv still wants a different layout. This variant fuses the WHOLE
# boundary — activation AND strided conv — so activations stay in the CT
# (channels-on-sublanes) layout across the entire encoder/decoder and the
# boundary layout flips disappear:
#
#   * Encoder HEAD (down_act + strided down-conv, kernel 2S stride S): a
#     strided conv needs input lanes at stride S — an in-kernel strided lane
#     gather is illegal under Mosaic, so the HOST gather phase-decomposes the
#     previous stage's output: seg[(c*S + p), u] = x[c, S*u + p - (S-1)]
#     (left-halo zeros == causal pad). The down conv then becomes 2 shifted
#     full-lane matmuls contracting (Cin*S) sublanes:
#       out[t'] = W0^T a[t'-1] + W1^T a[t'],  W_j[(c*S+p), co] = w[S*j+p, c, co]
#     and the stage's residual units follow in the same kernel invocation.
#   * Decoder TAIL (up_act + transposed up-conv, kernel 2S stride S): the
#     scatter out[S*u + p] += a[u] @ w[p] + a[u-1] @ w[S+p] groups by OUTPUT
#     phase, so the kernel emits a phase-major (Cout*S, T') block — 2 shifted
#     matmuls again — and the host de-interleaves with one transpose (the
#     same single copy XLA used to spend on the up_act layout flip).
#
# Numerics: identical op order/dtypes to the reference path per element
# (snake(0) == 0, so activating gathered zero padding == padding after
# activation); float-tolerance contract like the base CT kernel
# (tests/unit/test_pallas_stack.py::*fused_boundary*).


def _fused_stage_kernel(
    *refs, dilations, halo, tile_t, fast_act, has_head, has_tail,
):
    act = _snake_fast_ct if fast_act else _snake_ct
    jt = pl.program_id(1)
    i = 0
    seg_ref = refs[i]; i += 1
    if has_head:
        hw_ref, hb_ref, ha_ref = refs[i : i + 3]; i += 3
    w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref = refs[i : i + 6]; i += 6
    if has_tail:
        ta_ref, tw_ref, tb_ref = refs[i : i + 3]; i += 3
    out_ref = refs[i]

    dn = (((0,), (0,)), ((), ()))  # contract Cin (sublanes)
    buf = seg_ref[0, 0]  # (Cin_eff, halo + tile_t)
    off = 0
    if has_head:
        length = halo + tile_t
        av = act(buf, ha_ref[:, :])
        y = jax.lax.dot_general(
            hw_ref[0], av[:, 0 : length - 1], dn,
            preferred_element_type=jnp.float32,
        )
        y += jax.lax.dot_general(
            hw_ref[1], av[:, 1:length], dn,
            preferred_element_type=jnp.float32,
        )
        buf = (y + hb_ref[:, :].astype(jnp.float32)).astype(buf.dtype)
        off = 1
        buf = _zero_stale_halo(buf, halo - off, jt)

    for u, d in enumerate(dilations):
        length = halo + tile_t - off
        a1 = a1_ref[:, pl.ds(u, 1)]
        a2 = a2_ref[:, pl.ds(u, 1)]
        bi1 = b1_ref[:, pl.ds(u, 1)]
        bi2 = b2_ref[:, pl.ds(u, 1)]
        a1v = act(buf, a1)
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
        buf = _zero_stale_halo(buf, halo - off, jt)

    surplus = halo - off
    if has_tail:
        # out[(co*S+p), u] = w[p]^T a[u] + w[S+p]^T a[u-1]; lane u-1 at u=0 is
        # the (zeroed-on-tile-0) halo lane == the scatter's i >= 0 constraint.
        xt = buf[:, surplus - 1 :]  # (C, tile_t + 1)
        av = act(xt, ta_ref[:, :])
        z = jax.lax.dot_general(
            tw_ref[0], av[:, 1:], dn, preferred_element_type=jnp.float32
        )
        z += jax.lax.dot_general(
            tw_ref[1], av[:, 0:tile_t], dn, preferred_element_type=jnp.float32
        )
        out_ref[0] = (z + tb_ref[:, :].astype(jnp.float32)).astype(buf.dtype)
    else:
        out_ref[0] = buf[:, surplus:] if surplus else buf


@functools.partial(
    jax.jit,
    static_argnames=(
        "dilations", "s_head", "s_tail", "interpret", "tile_t", "fast_act",
    ),
)
def fused_stage_ct_pallas(
    x: jax.Array,           # (B, Cin, T_in); pre-phase-decomposition if head
    head_params,            # None | (hw (2, Cin*S, Cmid), hb (Cmid,1), ha (Cin*S,1))
    w1, b1, a1, w2, b2, a2, # unit-stack params as in residual_stack_ct_pallas
    tail_params,            # None | (ta (Cmid,1), tw (2, Cmid, Cout*S), tb (Cout*S,1))
    *,
    dilations: tuple,
    s_head: int = 1,        # down-conv stride (kernel 2S); 1 = no head
    s_tail: int = 1,        # up-conv stride (kernel 2S);   1 = no tail
    interpret: bool = False,
    tile_t: int | None = None,
    fast_act: bool = False,
) -> jax.Array:
    """One SEANet stage with its boundary convs fused in.

    head: snake(down_act) + causal strided conv (C_prev -> Cmid, k=2S,
      stride S) — x is the PREVIOUS stage's (B, C_prev, T_in) output.
    tail: snake(up_act) + causal transposed conv (Cmid -> Cout, k=2S,
      stride S) — returns (B, Cout, T_units * S), de-interleaved.
    Without head/tail this reduces to residual_stack_ct_pallas.
    """
    import numpy as np

    b, cin, t_in = x.shape
    has_head = head_params is not None
    has_tail = tail_params is not None
    s = s_head if has_head else 1
    assert (s > 1) == has_head and (s_tail > 1) == has_tail

    c_mid = w1.shape[2]
    cin_eff = cin * s
    cout_eff = tail_params[1].shape[2] if has_tail else c_mid
    t_units = -(-t_in // s)  # frames after the (causal, ceil) strided head

    units_halo = sum(2 * d for d in dilations)
    halo = units_halo + (1 if has_head else 0)
    halo_pad = ((halo + 127) // 128) * 128  # lane alignment
    if tile_t is None:
        weff = max(cin_eff, c_mid, cout_eff)
        tile_t = max(256, min(TILE_T_CT, (1 << 19) // weff // 128 * 128))
    pad_t = (-t_units) % tile_t
    t_tot = t_units + pad_t
    n_tiles = t_tot // tile_t
    seg_len = halo_pad + tile_t

    # Host gather, phase-decomposed when head: seg[(c*S+p), u] =
    # x[c, S*(t0 - halo_pad + u) + p - (S-1)]; with left pad
    # S*halo_pad + S - 1 the index simplifies to S*(t0 + u) + p over xp.
    pad_l = s * halo_pad + (s - 1)
    idx_max = s * (t_tot + halo_pad - 1) + (s - 1)
    pad_r = max(0, idx_max + 1 - pad_l - t_in)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad_l, pad_r)))
    idx = (
        s * (np.arange(n_tiles)[:, None, None] * tile_t
             + np.arange(seg_len)[None, None, :])
        + np.arange(s)[None, :, None]
    )  # (n_tiles, S, seg_len)
    segs = xp[:, :, idx]                       # (B, Cin, nt, S, L)
    segs = jnp.moveaxis(segs, 1, 2)            # (B, nt, Cin, S, L)
    segs = segs.reshape(b, n_tiles, cin_eff, seg_len)

    a1t, a2t = a1.T, a2.T
    b1t, b2t = b1.T, b2.T

    def _const_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda ib, jt, _n=arr.ndim: (0,) * _n,
            memory_space=pltpu.VMEM,
        )

    inputs = [segs]
    in_specs = [
        pl.BlockSpec(
            (1, 1, cin_eff, seg_len), lambda ib, jt: (ib, jt, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    if has_head:
        inputs += list(head_params)
        in_specs += [_const_spec(p) for p in head_params]
    inputs += [w1, b1t, a1t, w2, b2t, a2t]
    in_specs += [_const_spec(p) for p in (w1, b1t, a1t, w2, b2t, a2t)]
    if has_tail:
        inputs += list(tail_params)
        in_specs += [_const_spec(p) for p in tail_params]

    out = pl.pallas_call(
        functools.partial(
            _fused_stage_kernel, dilations=dilations, halo=halo_pad,
            tile_t=tile_t, fast_act=fast_act, has_head=has_head,
            has_tail=has_tail,
        ),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, cout_eff, tile_t), lambda ib, jt: (ib, 0, jt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout_eff, t_tot), x.dtype),
        interpret=interpret,
    )(*inputs)
    out = out[:, :, :t_units]
    if has_tail:
        c_out = cout_eff // s_tail
        out = out.reshape(b, c_out, s_tail, t_units)
        out = jnp.swapaxes(out, 2, 3).reshape(b, c_out, t_units * s_tail)
    return out


def pack_head_params(act_p, conv_p, s: int, dtype) -> tuple:
    """down_act + strided down-conv params -> kernel head operands."""
    from nsc_tpu.ops.conv import materialize_weight

    w = materialize_weight(conv_p).astype(dtype)  # (2S, Cin, Cmid)
    k, cin, cout = w.shape
    assert k == 2 * s, (k, s)
    hw = w.reshape(2, s, cin, cout).transpose(0, 2, 1, 3).reshape(
        2, cin * s, cout
    )
    hb = conv_p["b"].reshape(cout, 1)
    ha = jnp.repeat(act_p["alpha"], s).reshape(cin * s, 1)
    return hw, hb, ha


def pack_tail_params(act_p, conv_p, s: int, dtype) -> tuple:
    """up_act + transposed up-conv params -> kernel tail operands."""
    from nsc_tpu.ops.conv import materialize_weight

    w = materialize_weight(conv_p).astype(dtype)  # (2S, Cmid, Cout)
    k, cin, cout = w.shape
    assert k == 2 * s, (k, s)
    tw = w.reshape(2, s, cin, cout).transpose(0, 2, 3, 1).reshape(
        2, cin, cout * s
    )
    tb = jnp.repeat(conv_p["b"], s).reshape(cout * s, 1)
    ta = act_p["alpha"].reshape(cin, 1)
    return ta, tw, tb
