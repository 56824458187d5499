"""The model zoo: ImgGrnd, VidGrnd, VOGNet (+ selector).

Reference parity (SURVEY §2):
  * ImgGrnd — per-frame image-grounding baseline: language-conditioned
    per-proposal scoring, fuse(vis_prop, lang_arg) -> MLP -> logit per
    (arg, proposal); no cross-frame reasoning.
  * VidGrnd — ImgGrnd + object transformer (multi-head self-attention over
    all proposals across frames + temporal position encoding).
  * VOGNet — VidGrnd + multimodal transformer: per-proposal visual feature
    concatenated with the per-arg language feature, self-attention with
    relative position encoding, head scores each (arg, proposal).
    (``code/mdl_vog.py`` / ``code/mdl_conc*.py`` + ``transformer_code.py``
    [C-MED file names].)

All models consume the unified *clip view* produced by
``vog_tpu.sampling.assemble_batch`` and emit logits (B', A, T); the
conc-type-specific reshaping lives entirely in the sampling layer, so one
forward path serves SVSQ/SEP/TEMP/SPAT (the reference spreads this over
mdl_conc_single.py / mdl_conc.py wrappers).

TPU-first notes: the (arg × proposal) fusion is expressed as three matmuls
(W_v·vis + W_l·arg + W_x·(vis⊙arg)) so the MXU sees large batched GEMMs;
the per-(arg,token) intermediate is rematerialized in the backward pass
(nn.remat) to keep HBM pressure flat in the P100 regime (T = 4000).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vog_tpu.config import Cfg
from vog_tpu.model.dtypes import act_dtype
from vog_tpu.model.encoders import LangEncoder, PropEncoder, SegEncoder
from vog_tpu.model.loss import masked_bce_loss, masked_rank_loss
from vog_tpu.model.transformer import (
    ObjectTransformer,
    RelTransformer,
    RelTransformerDecomposed,
)


class GroundingHead(nn.Module):
    """fuse(vis, lang_arg) -> logit per (arg, token).

    Reference: the ``do_cross``-style fusion + scoring MLP in the model
    files (SURVEY §2 ImgGrnd row) [C-MED exact fusion].  Fusion used here:
    h = relu(W_v vis + W_l arg + W_x (vis ⊙ arg)); logit = MLP(h).

    On TPU the whole fusion runs as one Pallas kernel
    (``kernels/grounding_head.py``) so the (B,A,T,D) intermediates never
    hit HBM (they were 9.2 ms of the 17 ms GT5 step); ``mdl.head_kernel``
    gates it, and non-TPU backends / unaligned dims fall back to the
    identical XLA math below.
    """

    cfg: Cfg
    use_kernel: bool = False

    @nn.compact
    def __call__(self, vis: jnp.ndarray, arg: jnp.ndarray) -> jnp.ndarray:
        # vis (B,T,D); arg (B,A,D) -> logits (B,A,T)
        from vog_tpu.kernels.grounding_head import (
            fused_grounding_head,
            head_kernel_supported,
        )

        D = self.cfg.mdl.vis_dim
        Dh = D // 2
        din = vis.shape[-1]
        kinit = nn.initializers.lecun_normal()
        zinit = nn.initializers.zeros
        # params mirror the previous nn.Dense stack (same shapes + init)
        wv_k = self.param("fuse_vis_kernel", kinit, (din, D))
        wv_b = self.param("fuse_vis_bias", zinit, (D,))
        wl_k = self.param("fuse_lang_kernel", kinit, (din, D))
        wx_k = self.param("fuse_cross_kernel", kinit, (din, D))
        w1_k = self.param("head1_kernel", kinit, (D, Dh))
        w1_b = self.param("head1_bias", zinit, (Dh,))
        w2_k = self.param("head2_kernel", kinit, (Dh, 1))
        w2_b = self.param("head2_bias", zinit, (1,))

        dt = act_dtype(self.cfg)
        # under bf16 the fusion intermediates (the step's HBM hot spot)
        # store bf16; the params are cast per-matmul (no fp32 promote),
        # and the returned logits are always fp32 (loss/eval contract)
        wv = vis @ wv_k.astype(dt) + wv_b.astype(dt)  # (B,T,D)
        wl = arg @ wl_k.astype(dt)  # (B,A,D)
        if self.use_kernel and head_kernel_supported(din, D, vis.shape[1]):
            # kernel operands stay fp32 (see model/dtypes.py)
            f32 = jnp.float32
            return fused_grounding_head(
                vis.astype(f32), arg.astype(f32), wv.astype(f32),
                wl.astype(f32), wx_k, w1_k, w1_b, w2_k[:, 0], w2_b[0],
            )
        cross = jnp.einsum("btd,bad->batd", vis, arg)  # (B,A,T,D)
        h = nn.relu(wv[:, None] + wl[:, :, None] + cross @ wx_k.astype(dt))
        h1 = nn.relu(h @ w1_k.astype(dt) + w1_b.astype(dt))
        return (
            jnp.einsum(
                "batd,dk->batk", h1, w2_k.astype(dt),
                preferred_element_type=jnp.float32,
            )[..., 0]
            + w2_b[0]
        )


class DotGroundingHead(nn.Module):
    """Factorized alternative head: score = <MLP_v(vis_t), MLP_l(arg_a)>.

    O(B(T+A)D^2) with no (B,A,T,D) intermediate — ~none of the fused
    head's HBM traffic (the dominant GT5 step cost).  Different capacity
    than the reference's fused head, so it is opt-in
    (``--mdl.head_type=dot``); the default stays reference-faithful.
    """

    cfg: Cfg

    @nn.compact
    def __call__(self, vis: jnp.ndarray, arg: jnp.ndarray) -> jnp.ndarray:
        D = self.cfg.mdl.vis_dim
        dt = act_dtype(self.cfg)
        v = nn.Dense(D, dtype=dt, name="v2")(
            nn.relu(nn.Dense(D, dtype=dt, name="v1")(vis))
        )
        l = nn.Dense(D, dtype=dt, name="l2")(
            nn.relu(nn.Dense(D, dtype=dt, name="l1")(arg))
        )
        bias = self.param("score_bias", nn.initializers.zeros, ())
        return jnp.einsum(
            "bad,btd->bat", l, v, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(D)) + bias


class ImgGrnd(nn.Module):
    """Per-proposal scoring with no cross-frame reasoning."""

    cfg: Cfg
    glove: np.ndarray
    n_frames: int  # frames in the clip view (static)
    remat_head: bool = False  # rematerialize the (B,A,T,D) head (P100 memory)

    def setup(self):
        self.lang = LangEncoder(self.cfg, self.glove)
        self.prop_enc = PropEncoder(self.cfg)
        self.seg_enc = SegEncoder(self.cfg)
        if self.cfg.mdl.head_type == "dot":
            self.head = DotGroundingHead(self.cfg)
        else:
            import jax

            from vog_tpu.kernels.grounding_head import head_kernel_supported

            # decide kernel eligibility HERE with the static dims (din =
            # D = vis_dim; T from the clip view) — previously only the
            # backend was checked, so an unsupported-dims config would
            # skip remat yet fall back to the un-rematted XLA path at
            # call time, reintroducing the (B,A,T,D) HBM residuals
            # remat_head exists to drop (round-2 ADVICE)
            D = self.cfg.mdl.vis_dim
            T = self.n_frames * self.cfg.ds.num_prop_per_frm * (
                self.cfg.ds.num_cmp if self.cfg.ds.conc_type == "spat" else 1
            )
            use_kernel = (
                self.cfg.mdl.head_kernel
                and jax.default_backend() == "tpu"
                and head_kernel_supported(D, D, T)
            )
            # the Pallas kernel recomputes its tiles internally, so remat
            # (which exists to drop the (B,A,T,D) residuals) is redundant
            remat = self.remat_head and not use_kernel
            head_cls = nn.remat(GroundingHead) if remat else GroundingHead
            self.head = head_cls(self.cfg, use_kernel=use_kernel)

    def encode(self, clip: Dict, deterministic: bool):
        lang = self.lang(
            clip["tokens"],
            clip["seq_len"],
            clip["srl_spans"],
            clip["srl_roles"],
            clip["verb_idx"],
        )
        penc = self.prop_enc(clip["props"], clip["boxes"])  # (B,T,D)
        senc = self.seg_enc(clip["seg"])  # (B,F,D)
        seg_tok = senc[:, clip["frame_ids"]]  # (B,T,D)
        return penc + seg_tok, lang

    def __call__(self, clip: Dict, deterministic: bool = True) -> jnp.ndarray:
        vis, lang = self.encode(clip, deterministic)
        return self.head(vis, lang["arg_rep"])


class VidGrnd(ImgGrnd):
    """ImgGrnd + object transformer (temporal PE self-attention)."""

    def setup(self):
        super().setup()
        self.obj_tx = ObjectTransformer(self.cfg)

    def __call__(self, clip: Dict, deterministic: bool = True) -> jnp.ndarray:
        vis, lang = self.encode(clip, deterministic)
        vis = self.obj_tx(vis, clip["mask"], clip["frame_ids"], deterministic)
        return self.head(vis, lang["arg_rep"])


class VOGNet(ImgGrnd):
    """VidGrnd + multimodal transformer with relative position encoding."""

    def setup(self):
        super().setup()
        self.obj_tx = ObjectTransformer(self.cfg)
        if self.cfg.mdl.decomposed_mm:
            self.mm_tx = RelTransformerDecomposed(self.cfg, self.n_frames)
        else:
            self.mm_tx = RelTransformer(self.cfg, self.n_frames)
        # Dense([vis;arg]) split into two halves applied pre-broadcast:
        # identical math, but the (B,A,T,2D) concat intermediate (320MB in
        # the P100 regime) never materializes — only the (B,A,T,D) sum does
        dt = act_dtype(self.cfg)
        self.mm_proj_vis = nn.Dense(self.cfg.mdl.vis_dim, dtype=dt)
        self.mm_proj_arg = nn.Dense(self.cfg.mdl.vis_dim, dtype=dt, use_bias=False)
        self.mm_head = nn.Dense(1, dtype=dt)

    def __call__(self, clip: Dict, deterministic: bool = True) -> jnp.ndarray:
        vis, lang = self.encode(clip, deterministic)
        vis = self.obj_tx(vis, clip["mask"], clip["frame_ids"], deterministic)
        arg = lang["arg_rep"]  # (B,A,D)
        B, T, D = vis.shape
        A = arg.shape[1]
        # multimodal tokens: proj(vis_t) + proj(arg_a) per (a, t)
        m = self.mm_proj_vis(vis)  # (B,T,D)
        g = self.mm_proj_arg(arg)  # (B,A,D)
        if self.cfg.mdl.decomposed_mm:
            # first mm layer shares the QK matmul across args (exact)
            mm = self.mm_tx(m, g, clip["mask"], clip["frame_ids"], deterministic)
        else:
            tokens = (m[:, None] + g[:, :, None]).reshape(B * A, T, D)
            key_mask = jnp.repeat(clip["mask"], A, axis=0)
            mm = self.mm_tx(tokens, key_mask, clip["frame_ids"], deterministic)
        mm = mm.reshape(B, A, T, D)
        # direct ImgGrnd-style path + multimodal head (residual scoring);
        # logits are fp32 regardless of the activation dtype
        logits = self.head(vis, arg)
        mm_logit = self.mm_head(nn.relu(mm))[..., 0].astype(jnp.float32)
        return logits.astype(jnp.float32) + mm_logit


MODELS = {"img_grnd": ImgGrnd, "vid_grnd": VidGrnd, "vog": VOGNet}


def get_model(cfg: Cfg, glove: np.ndarray, n_frames: int):
    """Reference ``code/mdl_selector.py §get_mdl_loss_eval`` (model part)."""
    # remat the (B,A,T,D) head only when the clip view is long enough for
    # memory to matter (P100 regimes); short views pay the recompute for
    # nothing (~15% of the GT5 step)
    tokens = n_frames * cfg.ds.num_prop_per_frm * (
        cfg.ds.num_cmp if cfg.ds.conc_type == "spat" else 1
    )
    # n_frames already folds the TEMP concat; spat folds props instead
    remat = tokens >= 1024
    return MODELS[cfg.mdl.name](
        cfg=cfg, glove=glove, n_frames=n_frames, remat_head=remat
    )


def compute_loss(
    logits: jnp.ndarray,
    clip: Dict,
    pos_weight: float = 1.0,
    loss_type: str = "bce",
    rank_weight: float = 1.0,
    rank_num_cmp: int = 1,
) -> Tuple[jnp.ndarray, Dict]:
    """Masked BCE (reference LossB) + optional listwise ranking term
    ("rank" adds it; "bce" is the plain reference loss).

    ``rank_num_cmp``: for conc_type=sep pass V (videos/group) so the rank
    term re-joins the group's batch-folded rows and normalizes across all
    videos' candidates; 1 elsewhere (TEMP/SPAT span videos along T)."""
    # the loss always runs fp32 (models emit fp32 logits even under the
    # bf16 activation policy; this upcast is belt-and-braces)
    logits = logits.astype(jnp.float32)
    mask = (
        clip["srl_arg_mask"][:, :, None]
        * clip["mask"][:, None, :]
        * clip["batch_mask"][:, None, None]
    )
    loss = masked_bce_loss(logits, clip["targets"], mask, pos_weight)
    if loss_type == "rank":
        loss = loss + rank_weight * masked_rank_loss(
            logits, clip["targets"], mask, rank_num_cmp
        )
    return loss, {"loss": loss}
