"""Torch twin of the codec (SURVEY.md §5 "Parity tests": torch-CPU reference
implementations of each block built from the same weights).

Purpose: with the reference repo absent (SURVEY.md §0), this module stands in
for "the PyTorch reference" so the checkpoint converter and the bit-exact
index parity harness (BASELINE.json:5) are real, tested machinery — pointable
at actual NSC checkpoints the moment they appear. Weight layouts follow torch
conventions (Conv1d: (Cout, Cin, K); ConvTranspose1d: (Cin, Cout, K);
weight-norm g: (Cout, 1, 1)) so a genuine torch state_dict converts the same
way.

Everything here runs on CPU and is used only by tests/parity and the
converter round-trip tests — never on the TPU compute path.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn

from nsc_tpu.configs import CodecConfig


class WNConv1d(nn.Module):
    """Conv1d with explicit weight-norm params (v, g) matching
    nsc_tpu.ops.conv.materialize_weight: w = v * g / ||v||_(Cin,K) with the
    same 1e-12 epsilon."""

    def __init__(self, in_ch, out_ch, kernel, weight_norm=True):
        super().__init__()
        w = torch.empty(out_ch, in_ch, kernel)
        nn.init.kaiming_uniform_(w, a=5**0.5)  # same family as our init
        b = torch.zeros(out_ch)
        self.weight_norm = weight_norm
        if weight_norm:
            self.v = nn.Parameter(w)
            self.g = nn.Parameter(
                torch.sqrt((w * w).sum(dim=(1, 2), keepdim=True))
            )  # (Cout, 1, 1)
        else:
            self.w = nn.Parameter(w)
        self.b = nn.Parameter(b)

    def weight(self):
        if not self.weight_norm:
            return self.w
        norm = torch.sqrt((self.v * self.v).sum(dim=(1, 2), keepdim=True) + 1e-12)
        return self.v * (self.g / norm)

    def forward(self, x, stride=1, dilation=1, causal=True):
        k = self.weight().shape[-1]
        eff = (k - 1) * dilation
        if causal:
            x = F.pad(x, (eff, 0))
        else:
            x = F.pad(x, (eff // 2, eff - eff // 2))
        return F.conv1d(x, self.weight(), self.b, stride=stride, dilation=dilation)


class WNConvTranspose1d(nn.Module):
    """Transposed conv with torch layout (Cin, Cout, K) and causal right-trim
    of (K - stride) — matching nsc_tpu.ops.conv.conv_transpose1d."""

    def __init__(self, in_ch, out_ch, kernel):
        super().__init__()
        w = torch.empty(in_ch, out_ch, kernel)
        nn.init.kaiming_uniform_(w, a=5**0.5)
        self.v = nn.Parameter(w)
        self.g = nn.Parameter(torch.sqrt((w * w).sum(dim=(0, 2), keepdim=True)))
        self.b = nn.Parameter(torch.zeros(out_ch))

    def weight(self):
        norm = torch.sqrt((self.v * self.v).sum(dim=(0, 2), keepdim=True) + 1e-12)
        return self.v * (self.g / norm)

    def forward(self, x, stride, causal=True):
        k = self.weight().shape[-1]
        y = F.conv_transpose1d(x, self.weight(), self.b, stride=stride)
        trim = k - stride
        if trim <= 0:
            return y
        if causal:
            return y[..., :-trim]
        left = trim // 2
        return y[..., left : left + x.shape[-1] * stride]


class Snake(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(channels))

    def forward(self, x):
        a = self.alpha[None, :, None]
        s = torch.sin(a * x)
        return x + s * s / (a + 1e-9)


class SnakeFast(nn.Module):
    """Torch twin of ops.conv.snake_fast: the IDENTICAL deg-3 even minimax
    polynomial for sin^2, same op order, so f32 evaluation is bit-exact with
    the JAX path (torch.round and jnp.round both round half-to-even) — the
    serving-path activation is parity-tested, not just the exact-sine one."""

    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(channels))

    def forward(self, x):
        from nsc_tpu.ops.conv import (
            _SIN_SQ_C0, _SIN_SQ_C1, _SIN_SQ_C2, _SIN_SQ_C3,
        )
        import math

        a = self.alpha[None, :, None]
        inv = 1.0 / (a + 1e-9)  # multiply-by-reciprocal, same as the JAX op
        f = (a * x).float()
        r = f - torch.round(f * (1.0 / math.pi)) * math.pi
        u = r * r
        q = _SIN_SQ_C0 + u * (_SIN_SQ_C1 + u * (_SIN_SQ_C2 + u * _SIN_SQ_C3))
        return x + (u * q) * inv


def _make_act(ch, cfg: CodecConfig):
    if cfg.activation == "snake":
        return Snake(ch)
    if cfg.activation == "snake_fast":
        return SnakeFast(ch)
    return nn.ELU()


class ResidualUnit(nn.Module):
    def __init__(self, ch, kernel, dilation, cfg: CodecConfig):
        super().__init__()
        self.dilation = dilation
        self.act1 = _make_act(ch, cfg)
        self.conv1 = WNConv1d(ch, ch, kernel)
        self.act2 = _make_act(ch, cfg)
        self.conv2 = WNConv1d(ch, ch, 1)
        self.causal = cfg.causal

    def forward(self, x):
        h = self.conv1(self.act1(x), dilation=self.dilation, causal=self.causal)
        h = self.conv2(self.act2(h), causal=self.causal)
        return x + h


class _Stage(nn.Module):
    def __init__(self, ch, stride, cfg: CodecConfig):
        super().__init__()
        self.stride = stride
        self.units = nn.ModuleList(
            [ResidualUnit(ch, cfg.residual_kernel, d, cfg) for d in cfg.dilations]
        )
        self.down_act = _make_act(ch, cfg)
        self.down = WNConv1d(ch, 2 * ch, 2 * stride)
        self.causal = cfg.causal

    def forward(self, x):
        for u in self.units:
            x = u(x)
        return self.down(self.down_act(x), stride=self.stride, causal=self.causal)


class TorchEncoder(nn.Module):
    def __init__(self, cfg: CodecConfig):
        super().__init__()
        self.cfg = cfg
        self.stem = WNConv1d(cfg.channels, cfg.base_width, cfg.stem_kernel)
        self.stages = nn.ModuleList(
            [
                _Stage(cfg.base_width * (2**i), s, cfg)
                for i, s in enumerate(cfg.strides)
            ]
        )
        fw = cfg.base_width * (2 ** len(cfg.strides))
        self.final_act = _make_act(fw, cfg)
        self.final = WNConv1d(fw, cfg.latent_dim, cfg.last_kernel)

    def forward(self, x):
        """(N, 1, T) -> (N, D, T/hop)"""
        h = self.stem(x, causal=self.cfg.causal)
        for st in self.stages:
            h = st(h)
        return self.final(self.final_act(h), causal=self.cfg.causal)


class _UpStage(nn.Module):
    def __init__(self, ch, stride, cfg: CodecConfig):
        super().__init__()
        self.stride = stride
        self.causal = cfg.causal
        self.up_act = _make_act(ch, cfg)
        self.up = WNConvTranspose1d(ch, ch // 2, 2 * stride)
        self.units = nn.ModuleList(
            [
                ResidualUnit(ch // 2, cfg.residual_kernel, d, cfg)
                for d in cfg.dilations
            ]
        )

    def forward(self, x):
        x = self.up(self.up_act(x), stride=self.stride, causal=self.causal)
        for u in self.units:
            x = u(x)
        return x


class TorchDecoder(nn.Module):
    def __init__(self, cfg: CodecConfig):
        super().__init__()
        self.cfg = cfg
        fw = cfg.base_width * (2 ** len(cfg.strides))
        self.stem = WNConv1d(cfg.latent_dim, fw, cfg.last_kernel)
        self.stages = nn.ModuleList(
            [
                _UpStage(fw // (2**i), s, cfg)
                for i, s in enumerate(reversed(cfg.strides))
            ]
        )
        self.final_act = _make_act(cfg.base_width, cfg)
        self.final = WNConv1d(cfg.base_width, cfg.channels, cfg.stem_kernel)

    def forward(self, z):
        """(N, D, F) -> (N, 1, F*hop)"""
        h = self.stem(z, causal=self.cfg.causal)
        for st in self.stages:
            h = st(h)
        return torch.tanh(self.final(self.final_act(h), causal=self.cfg.causal))


class TorchRVQ(nn.Module):
    """Same fixed distance formula and tie-break as nsc_tpu.ops.rvq."""

    def __init__(self, cfg: CodecConfig):
        super().__init__()
        self.codebooks = nn.Parameter(
            torch.randn(cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim)
        )

    @torch.no_grad()
    def quantize(self, z, n_q=None):
        """(N, D, F) -> (N, F, n_q) int32"""
        books = self.codebooks if n_q is None else self.codebooks[:n_q]
        r = z.transpose(1, 2).reshape(-1, z.shape[1]).float()  # (M, D)
        idxs = []
        for cb in books:
            c = cb.float()
            scores = (c * c).sum(-1)[None, :] - 2.0 * r @ c.T
            idx = torch.argmin(scores, dim=-1)
            r = r - c[idx]
            idxs.append(idx)
        out = torch.stack(idxs, dim=-1)
        return out.reshape(z.shape[0], z.shape[2], -1).to(torch.int32)

    @torch.no_grad()
    def dequantize(self, indices, n_q=None):
        """(N, F, n_q) -> (N, D, F)"""
        used = indices.shape[-1] if n_q is None else n_q
        out = 0
        for q in range(used):
            out = out + self.codebooks[q][indices[..., q].long()]
        return out.transpose(1, 2)


class TorchCodec(nn.Module):
    def __init__(self, cfg: CodecConfig):
        super().__init__()
        self.cfg = cfg
        self.encoder = TorchEncoder(cfg)
        self.decoder = TorchDecoder(cfg)
        self.rvq = TorchRVQ(cfg)
        # factorized codes (codebook_dim != latent_dim): trained linear
        # projections around the RVQ, mirroring models/codec.py _project_in/out
        self.factorized = cfg.codebook_dim != cfg.latent_dim
        if self.factorized:
            self.proj_in = nn.Linear(cfg.latent_dim, cfg.codebook_dim, bias=False)
            self.proj_out = nn.Linear(cfg.codebook_dim, cfg.latent_dim, bias=False)

    @torch.no_grad()
    def encode(self, wav, n_q=None):
        """(N, T) -> (N, F, n_q)"""
        z = self.encoder(wav[:, None, :])
        if self.factorized:
            z = self.proj_in(z.transpose(1, 2).float()).transpose(1, 2)
        return self.rvq.quantize(z, n_q)

    @torch.no_grad()
    def decode(self, indices, n_q=None):
        z = self.rvq.dequantize(indices, n_q)
        if self.factorized:
            z = self.proj_out(z.transpose(1, 2).float()).transpose(1, 2)
        return self.decoder(z)[:, 0, :]
