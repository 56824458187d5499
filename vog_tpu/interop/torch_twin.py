"""Torch twin of the flax VOGNet + checkpoint export.

Two purposes:

1. **Cross-framework parity oracle**: an independent PyTorch
   implementation of the exact same equations (GloVe -> packed BiLSTM ->
   span pool + role + verb arg reps; prop/seg encoders; post-LN object
   transformer; *materialized* relative-position multimodal transformer;
   cross-MLP grounding head + mm residual logit).  Loading a flax
   checkpoint into it and matching logits end-to-end independently
   validates every piece of the flax math — including the arg-decomposed
   first mm layer, which the twin implements in the materialized form the
   decomposition must equal.

2. **Torch export path**: users who need to serve from PyTorch can load a
   trained vog_tpu checkpoint via ``flax_params_to_torch`` and run this
   module (reference parity surface: the reference is a torch codebase,
   SURVEY §2; its model-side symbols map onto these layers).

Kept dependency-light: torch-CPU only, no flax import needed at inference.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as Fn

NEG = torch.finfo(torch.float32).min  # matches jnp.finfo(...).min masking


def sinusoidal_pe(frame_ids: torch.Tensor, dim: int) -> torch.Tensor:
    """Identical to vog_tpu.model.transformer.sinusoidal_pe."""
    pos = frame_ids.float()[:, None]
    half = dim // 2
    freq = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    ang = pos * freq[None, :]
    pe = torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)
    if pe.shape[-1] < dim:
        pe = Fn.pad(pe, (0, dim - pe.shape[-1]))
    return pe


class _TxLayer(nn.Module):
    """Post-LN encoder layer (mirrors transformer.TxLayer, eval mode)."""

    def __init__(self, D: int, heads: int, ff_mult: int, relative: bool, rpe_k: int):
        super().__init__()
        self.H = heads
        self.qkv = nn.Linear(D, 3 * D)
        self.out = nn.Linear(D, D)
        self.ln1 = nn.LayerNorm(D, eps=1e-6)
        self.ff1 = nn.Linear(D, ff_mult * D)
        self.ff2 = nn.Linear(ff_mult * D, D)
        self.ln2 = nn.LayerNorm(D, eps=1e-6)
        self.relative = relative
        if relative:
            self.rpe_table = nn.Parameter(torch.zeros(heads, 2 * rpe_k + 1))
            self.rpe_k = rpe_k

    def _mha(self, x, key_mask, frame_ids):
        B, T, D = x.shape
        H = self.H
        dh = D // H
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q = q.view(B, T, H, dh).transpose(1, 2)
        k = k.view(B, T, H, dh).transpose(1, 2)
        v = v.view(B, T, H, dh).transpose(1, 2)
        logits = q @ k.transpose(-1, -2) / math.sqrt(dh)
        if self.relative:
            fr = frame_ids
            nf = int(fr.max()) + 1
            ff = torch.arange(nf)
            dist = (ff[:, None] - ff[None, :]).clamp(-self.rpe_k, self.rpe_k) + self.rpe_k
            fbias = self.rpe_table[:, dist]  # (H,F,F)
            tok_bias = fbias[:, fr][:, :, fr]  # (H,T,T)
            logits = logits + tok_bias[None]
        logits = torch.where(key_mask[:, None, None, :] > 0, logits, NEG)
        w = logits.softmax(-1)
        o = (w @ v).transpose(1, 2).reshape(B, T, D)
        return self.out(o)

    def forward(self, x, key_mask, frame_ids=None):
        x = self.ln1(x + self._mha(x, key_mask, frame_ids))
        h = self.ff2(torch.relu(self.ff1(x)))
        return self.ln2(x + h)


class TorchVOGNet(nn.Module):
    """Torch mirror of vog_tpu.model.grounding.VOGNet (deterministic/eval).

    Construct from the flax config + glove shape, then load weights with
    ``flax_params_to_torch(params)`` -> ``load_state_dict``.
    """

    def __init__(self, cfg, vocab_size: int, emb_dim: int, variant: str = "vog"):
        super().__init__()
        m = cfg.mdl
        D, H2 = m.vis_dim, 2 * m.lstm_dim
        self.D, self.A_heads = D, m.n_heads
        self.variant = variant  # img_grnd | vid_grnd | vog
        self.embed = nn.Embedding(vocab_size, emb_dim)
        self.lstm = nn.LSTM(
            emb_dim, m.lstm_dim, batch_first=True, bidirectional=True
        )
        self.role_embed = nn.Embedding(cfg.ds.num_roles, m.role_dim)
        self.arg_proj = nn.Linear(H2 + m.role_dim + H2, D)
        self.prop_proj = nn.Linear(cfg.ds.prop_dim + 5, D)
        self.seg_proj = nn.Linear(cfg.ds.seg_dim, D)
        if variant in ("vid_grnd", "vog"):
            self.obj_layers = nn.ModuleList(
                _TxLayer(D, m.n_heads, m.ff_mult, False, m.rpe_max_dist)
                for _ in range(m.obj_tx_layers)
            )
        if variant == "vog":
            self.mm_proj_vis = nn.Linear(D, D)
            self.mm_proj_arg = nn.Linear(D, D, bias=False)
            self.mm_layers = nn.ModuleList(
                _TxLayer(D, m.n_heads, m.ff_mult, True, m.rpe_max_dist)
                for _ in range(m.mm_tx_layers)
            )
            self.mm_head = nn.Linear(D, 1)
        # grounding head (cross-MLP fusion; param names match the flax head)
        self.fuse_vis = nn.Linear(D, D)
        self.fuse_lang = nn.Linear(D, D, bias=False)
        self.fuse_cross = nn.Linear(D, D, bias=False)
        self.head1 = nn.Linear(D, D // 2)
        self.head2 = nn.Linear(D // 2, 1)

    # -- language ----------------------------------------------------------
    def _lang(self, tokens, seq_len, spans, roles, verb_idx):
        x = self.embed(tokens)  # (B,L,emb)
        packed = nn.utils.rnn.pack_padded_sequence(
            x, seq_len.cpu(), batch_first=True, enforce_sorted=False
        )
        y, _ = self.lstm(packed)
        y, _ = nn.utils.rnn.pad_packed_sequence(
            y, batch_first=True, total_length=tokens.shape[1]
        )  # (B,L,2H), zeros beyond length (packed-seq semantics)

        B, L, _ = y.shape
        t = torch.arange(L)[None, None, :]
        in_span = (
            (t >= spans[..., 0:1]) & (t <= spans[..., 1:2])
            & (t < seq_len[:, None, None])
        ).float()  # (B,A,L)
        denom = in_span.sum(-1, keepdim=True).clamp(min=1.0)
        arg_span = (in_span / denom) @ y  # (B,A,2H)

        verb_rep = y[torch.arange(B), verb_idx]  # (B,2H)
        A = arg_span.shape[1]
        verb_tiled = verb_rep[:, None].expand(B, A, verb_rep.shape[-1])
        arg = torch.relu(
            self.arg_proj(
                torch.cat([arg_span, self.role_embed(roles), verb_tiled], -1)
            )
        )
        return arg

    def forward(self, clip: Dict[str, torch.Tensor]) -> torch.Tensor:
        arg = self._lang(
            clip["tokens"], clip["seq_len"], clip["srl_spans"],
            clip["srl_roles"], clip["verb_idx"],
        )  # (B,A,D)
        vis = torch.relu(
            self.prop_proj(torch.cat([clip["props"], clip["boxes"]], -1))
        )
        seg = torch.relu(self.seg_proj(clip["seg"]))  # (B,F,D)
        vis = vis + seg[:, clip["frame_ids"]]  # (B,T,D)

        mask, fr = clip["mask"], clip["frame_ids"]
        if self.variant in ("vid_grnd", "vog"):
            x = vis + sinusoidal_pe(fr, self.D)[None]
            for layer in self.obj_layers:
                x = layer(x, mask, fr)
            vis = x

        cross = vis[:, None] * arg[:, :, None]
        h = torch.relu(
            self.fuse_vis(vis)[:, None]
            + self.fuse_lang(arg)[:, :, None]
            + self.fuse_cross(cross)
        )
        logits = self.head2(torch.relu(self.head1(h)))[..., 0]
        if self.variant != "vog":
            return logits

        B, T, D = vis.shape
        A = arg.shape[1]
        m = self.mm_proj_vis(vis)
        g = self.mm_proj_arg(arg)
        tok = (m[:, None] + g[:, :, None]).reshape(B * A, T, D)
        mask_a = mask.repeat_interleave(A, dim=0)
        for layer in self.mm_layers:
            tok = layer(tok, mask_a, fr)
        mm = tok.view(B, A, T, D)
        return logits + self.mm_head(torch.relu(mm))[..., 0]


def _detect_variant_flat(flat) -> str:
    if ("mm_proj_vis", "kernel") in flat:
        return "vog"
    if ("obj_tx", "layer0", "attn", "qkv", "kernel") in flat:
        return "vid_grnd"
    return "img_grnd"


def detect_variant(params: Dict) -> str:
    """Which model zoo member a flax param tree belongs to
    (img_grnd | vid_grnd | vog) — pass as TorchVOGNet's ``variant``."""
    from flax import traverse_util

    return _detect_variant_flat(traverse_util.flatten_dict(params))


def _lin(flat, prefix):
    """flax Dense {kernel (in,out), bias?} -> torch Linear tensors."""
    out = {"weight": torch.from_numpy(np.asarray(flat[prefix + ("kernel",)]).T.copy())}
    b = flat.get(prefix + ("bias",))
    if b is not None:
        out["bias"] = torch.from_numpy(np.asarray(b).copy())
    return out


def flax_params_to_torch(params: Dict) -> Dict[str, torch.Tensor]:
    """Map a vog_tpu VOGNet flax param tree onto TorchVOGNet's state_dict."""
    from flax import traverse_util

    flat = {
        k: np.asarray(v) for k, v in traverse_util.flatten_dict(params).items()
    }
    variant = _detect_variant_flat(flat)
    if ("head", "fuse_vis_kernel") not in flat:
        raise ValueError(
            "param tree uses a non-default grounding head (mdl.head_type) — "
            "the torch twin covers the reference-faithful cross-MLP head"
        )
    sd: Dict[str, torch.Tensor] = {}

    def put(name, prefix):
        for k, v in _lin(flat, prefix).items():
            sd[f"{name}.{k}"] = v

    sd["embed.weight"] = torch.from_numpy(np.asarray(flat[("lang", "embed")]).copy())
    # LSTM: flax stores (in, 4H) transposed; gate order i,f,g,o both sides
    for d, suf in (("f", ""), ("b", "_reverse")):
        sd[f"lstm.weight_ih_l0{suf}"] = torch.from_numpy(
            np.asarray(flat[("lang", "bilstm", f"w_ih_{d}")]).T.copy()
        )
        sd[f"lstm.weight_hh_l0{suf}"] = torch.from_numpy(
            np.asarray(flat[("lang", "bilstm", f"w_hh_{d}")]).T.copy()
        )
        sd[f"lstm.bias_ih_l0{suf}"] = torch.from_numpy(
            np.asarray(flat[("lang", "bilstm", f"b_ih_{d}")]).copy()
        )
        sd[f"lstm.bias_hh_l0{suf}"] = torch.from_numpy(
            np.asarray(flat[("lang", "bilstm", f"b_hh_{d}")]).copy()
        )
    sd["role_embed.weight"] = torch.from_numpy(
        np.asarray(flat[("lang", "role_embed", "embedding")]).copy()
    )
    put("arg_proj", ("lang", "arg_proj"))
    put("prop_proj", ("prop_enc", "prop_proj"))
    put("seg_proj", ("seg_enc", "seg_proj"))

    def tx(name, scope, i, relative):
        base = (scope, f"layer{i}")
        put(f"{name}.{i}.qkv", base + ("attn", "qkv"))
        put(f"{name}.{i}.out", base + ("attn", "out"))
        if relative:
            sd[f"{name}.{i}.rpe_table"] = torch.from_numpy(
                np.asarray(flat[base + ("attn", "rpe_table")]).copy()
            )
        for ln in ("ln1", "ln2"):
            sd[f"{name}.{i}.{ln}.weight"] = torch.from_numpy(
                np.asarray(flat[base + (ln, "scale")]).copy()
            )
            sd[f"{name}.{i}.{ln}.bias"] = torch.from_numpy(
                np.asarray(flat[base + (ln, "bias")]).copy()
            )
        put(f"{name}.{i}.ff1", base + ("ff1",))
        put(f"{name}.{i}.ff2", base + ("ff2",))

    if variant in ("vid_grnd", "vog"):
        i = 0
        while ("obj_tx", f"layer{i}", "attn", "qkv", "kernel") in flat:
            tx("obj_layers", "obj_tx", i, relative=False)
            i += 1
    if variant == "vog":
        i = 0
        while ("mm_tx", f"layer{i}", "attn", "qkv", "kernel") in flat:
            tx("mm_layers", "mm_tx", i, relative=True)
            i += 1
        put("mm_proj_vis", ("mm_proj_vis",))
        put("mm_proj_arg", ("mm_proj_arg",))
        put("mm_head", ("mm_head",))
    # grounding head: raw-param names (grounding.GroundingHead)
    sd["fuse_vis.weight"] = torch.from_numpy(
        np.asarray(flat[("head", "fuse_vis_kernel")]).T.copy()
    )
    sd["fuse_vis.bias"] = torch.from_numpy(
        np.asarray(flat[("head", "fuse_vis_bias")]).copy()
    )
    sd["fuse_lang.weight"] = torch.from_numpy(
        np.asarray(flat[("head", "fuse_lang_kernel")]).T.copy()
    )
    sd["fuse_cross.weight"] = torch.from_numpy(
        np.asarray(flat[("head", "fuse_cross_kernel")]).T.copy()
    )
    sd["head1.weight"] = torch.from_numpy(
        np.asarray(flat[("head", "head1_kernel")]).T.copy()
    )
    sd["head1.bias"] = torch.from_numpy(np.asarray(flat[("head", "head1_bias")]).copy())
    sd["head2.weight"] = torch.from_numpy(
        np.asarray(flat[("head", "head2_kernel")]).T.copy()
    )
    sd["head2.bias"] = torch.from_numpy(np.asarray(flat[("head", "head2_bias")]).copy())
    return sd
