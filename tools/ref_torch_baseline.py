"""Measure the reference-equation training throughput in PyTorch (CPU).

Purpose (BASELINE.md §3 / round-1 verdict item 5): the reference repo
publishes no throughput numbers, its mount is empty, and its 2020-era GPU
environment does not exist here — so the only *measurable* denominator for
``bench.py``'s ``vs_baseline`` is the reference's own equations implemented
in stock PyTorch, timed on this machine's CPU (torch-CPU is the installed
parity oracle).  This script builds a faithful torch VOGNet training step —
GloVe embed -> BiLSTM -> span pool, prop/seg Linear encoders, 1-layer
object transformer (post-LN MHA + FFN), 1-layer *materialized* relative-
position multimodal transformer over (B·A, T, D) tokens, cross-MLP
grounding head, masked BCE, Adam — at the benchmark config (VOGNet, SPAT,
GT5, batch 16 groups of 4 videos) and reports query-clip pairs/sec.

Usage:  python tools/ref_torch_baseline.py [steps] [batch]

The result (and this method note) feed REF_PAIRS_PER_SEC in bench.py.
Caveat recorded in BASELINE.md: this is torch on host CPU, not the paper's
GPU; it measures the same equations on the hardware available to both
frameworks' host, and makes vs_baseline measured-over-measured.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import torch
import torch.nn as nn

# benchmark config = bench.py's: VOGNet SPAT GT5
B = 16  # groups per batch
V = 4  # videos per group (SPAT concat)
F = 10  # frames
P = 5  # proposals/frame (GT5)
T = F * P * V  # 200 tokens after SPAT concat
A = 5  # SRL args
L = 40  # query tokens
D = 512
HEADS = 4
LSTM = 256
PROP_DIM = 2048
SEG_DIM = 3072
EMB = 300
VOCAB = 4000
RPE_K = 10


class RefVOGNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Embedding(VOCAB, EMB)
        self.lstm = nn.LSTM(EMB, LSTM, batch_first=True, bidirectional=True)
        self.role_emb = nn.Embedding(24, 128)
        self.arg_proj = nn.Linear(2 * LSTM + 128, D)
        self.prop_enc = nn.Linear(PROP_DIM + 5, D)
        self.seg_enc = nn.Linear(SEG_DIM, D)
        # object transformer (1 layer, post-LN)
        self.obj_qkv = nn.Linear(D, 3 * D)
        self.obj_out = nn.Linear(D, D)
        self.obj_ln1 = nn.LayerNorm(D)
        self.obj_ff1 = nn.Linear(D, 4 * D)
        self.obj_ff2 = nn.Linear(4 * D, D)
        self.obj_ln2 = nn.LayerNorm(D)
        # multimodal transformer (1 layer, relative position bias)
        self.mm_proj_vis = nn.Linear(D, D)
        self.mm_proj_arg = nn.Linear(D, D, bias=False)
        self.mm_qkv = nn.Linear(D, 3 * D)
        self.mm_out = nn.Linear(D, D)
        self.mm_ln1 = nn.LayerNorm(D)
        self.mm_ff1 = nn.Linear(D, 4 * D)
        self.mm_ff2 = nn.Linear(4 * D, D)
        self.mm_ln2 = nn.LayerNorm(D)
        self.rpe = nn.Parameter(torch.randn(HEADS, 2 * RPE_K + 1) * 0.02)
        self.mm_head = nn.Linear(D, 1)
        # grounding head (cross-MLP fusion)
        self.fuse_vis = nn.Linear(D, D)
        self.fuse_lang = nn.Linear(D, D, bias=False)
        self.fuse_cross = nn.Linear(D, D, bias=False)
        self.head1 = nn.Linear(D, D // 2)
        self.head2 = nn.Linear(D // 2, 1)

    def _mha(self, x, qkv, out, heads=HEADS, bias=None):
        Bx, Tx, Dx = x.shape
        dh = Dx // heads
        q, k, v = qkv(x).chunk(3, dim=-1)
        q = q.view(Bx, Tx, heads, dh).transpose(1, 2)
        k = k.view(Bx, Tx, heads, dh).transpose(1, 2)
        v = v.view(Bx, Tx, heads, dh).transpose(1, 2)
        logits = q @ k.transpose(-1, -2) / dh**0.5
        if bias is not None:
            logits = logits + bias
        w = logits.softmax(-1)
        o = (w @ v).transpose(1, 2).reshape(Bx, Tx, Dx)
        return out(o)

    def forward(self, batch):
        tokens, spans, roles, props, boxes, seg, frame_ids = batch
        # language: GloVe -> BiLSTM -> span mean + role emb -> arg rep
        h, _ = self.lstm(self.embed(tokens))  # (B, L, 2*LSTM)
        t = torch.arange(L)[None, None, :]
        m = (t >= spans[..., 0:1]) & (t <= spans[..., 1:2])
        m = m.float()
        pool = (m @ h) / m.sum(-1, keepdim=True).clamp(min=1.0)  # (B, A, 2LSTM)
        arg = self.arg_proj(torch.cat([pool, self.role_emb(roles)], -1))

        # visual tokens
        vis = self.prop_enc(torch.cat([props, boxes], -1))  # (B, T, D)
        vis = vis + self.seg_enc(seg)[:, frame_ids]

        # object transformer
        x = vis
        x = self.obj_ln1(x + self._mha(x, self.obj_qkv, self.obj_out))
        x = self.obj_ln2(x + self.obj_ff2(torch.relu(self.obj_ff1(x))))
        vis = x

        # multimodal transformer: materialized (B*A, T, D) tokens + RPE
        mtok = (self.mm_proj_vis(vis)[:, None] + self.mm_proj_arg(arg)[:, :, None])
        mtok = mtok.reshape(B * A, T, D)
        dist = (frame_ids[:, None] - frame_ids[None, :]).clamp(-RPE_K, RPE_K) + RPE_K
        bias = self.rpe[:, dist]  # (H, T, T)
        y = self.mm_ln1(
            mtok + self._mha(mtok, self.mm_qkv, self.mm_out, bias=bias[None])
        )
        y = self.mm_ln2(y + self.mm_ff2(torch.relu(self.mm_ff1(y))))
        mm = y.reshape(B, A, T, D)

        # grounding head: cross-MLP fusion + multimodal residual logit
        cross = vis[:, None] * arg[:, :, None]  # (B, A, T, D)
        hh = torch.relu(
            self.fuse_vis(vis)[:, None]
            + self.fuse_lang(arg)[:, :, None]
            + self.fuse_cross(cross)
        )
        logits = self.head2(torch.relu(self.head1(hh)))[..., 0]
        return logits + self.mm_head(torch.relu(mm))[..., 0]  # (B, A, T)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    model = RefVOGNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    tokens = torch.from_numpy(rng.integers(0, VOCAB, (B, L)).astype(np.int64))
    s0 = rng.integers(0, L - 3, (B, A, 1))
    spans = torch.from_numpy(
        np.concatenate([s0, s0 + rng.integers(0, 3, (B, A, 1))], -1).astype(np.int64)
    )
    roles = torch.from_numpy(rng.integers(0, 24, (B, A)).astype(np.int64))
    props = torch.from_numpy(rng.normal(size=(B, T, PROP_DIM)).astype(np.float32))
    boxes = torch.from_numpy(rng.uniform(size=(B, T, 5)).astype(np.float32))
    seg = torch.from_numpy(rng.normal(size=(B, F, SEG_DIM)).astype(np.float32))
    frame_ids = torch.from_numpy(
        (np.arange(T) // (P * V)).astype(np.int64)
    )
    targets = torch.from_numpy(
        (rng.uniform(size=(B, A, T)) > 0.9).astype(np.float32)
    )
    mask = torch.ones(B, A, T)
    batch = (tokens, spans, roles, props, boxes, seg, frame_ids)

    def step():
        opt.zero_grad()
        logits = model(batch)
        bce = nn.functional.binary_cross_entropy_with_logits(
            logits, targets, reduction="none"
        )
        loss = (bce * mask).sum() / mask.sum()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    pairs = steps * B * V
    print(
        f"torch-CPU reference step: {dt / steps * 1e3:.1f} ms/step, "
        f"{pairs / dt:.2f} query-clip pairs/s "
        f"(threads={torch.get_num_threads()})"
    )


if __name__ == "__main__":
    main()
