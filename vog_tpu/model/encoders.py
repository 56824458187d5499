"""Language and visual encoders.

Reference parity (SURVEY §2):
  * Language encoder — ``code/mdl_srl_utils.py``: GloVe 300-d embedding ->
    BiLSTM over the full query; per-SRL-arg phrase representation by
    pooling hidden states over the arg's token span + a learned role-label
    embedding; verb representation = hidden state at the verb token.
  * Visual encoder — RoI fc6 2048-d + 5-d normalized box -> Linear ->
    vis_dim; TSN segment feature (3072-d) -> Linear -> vis_dim, added to
    every proposal of its frame.

[C-MED] details reconstructed (to verify once the mount is live): span
pooling = masked mean over span tokens; arg rep = Linear([span_pool ;
role_emb]); fusion convention in the grounding head lives in
``grounding.py``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vog_tpu.config import Cfg
from vog_tpu.model.dtypes import act_dtype
from vog_tpu.model.lstm import TorchBiLSTM


def span_pool(hidden: jnp.ndarray, spans: jnp.ndarray, seq_len: jnp.ndarray) -> jnp.ndarray:
    """Masked mean of hidden states over each arg's token span.

    hidden (B,L,D); spans (B,A,2) inclusive; -> (B,A,D).  Empty/padded args
    produce zeros (their mask handles downstream).
    """
    B, L, D = hidden.shape
    t = jnp.arange(L, dtype=jnp.int32)[None, None, :]  # (1,1,L)
    s, e = spans[..., 0:1], spans[..., 1:2]  # (B,A,1)
    in_span = (t >= s) & (t <= e) & (t < seq_len[:, None, None])
    w = in_span.astype(hidden.dtype)  # (B,A,L)
    denom = jnp.maximum(w.sum(-1, keepdims=True), 1.0)
    return jnp.einsum("bal,bld->bad", w / denom, hidden)


class LangEncoder(nn.Module):
    """GloVe embed -> BiLSTM -> per-arg span rep (+role emb), verb rep, q rep."""

    cfg: Cfg
    glove: np.ndarray  # (vocab, emb_dim) initial embedding table

    @nn.compact
    def __call__(self, tokens, seq_len, srl_spans, srl_roles, verb_idx) -> Dict:
        m = self.cfg.mdl
        emb_init = lambda *_: jnp.asarray(self.glove, jnp.float32)
        emb_table = self.param("embed", emb_init, self.glove.shape)
        if not m.train_embeddings:
            emb_table = jax.lax.stop_gradient(emb_table)
        x = emb_table[tokens]  # (B,L,emb)

        y, (h_n, _) = TorchBiLSTM(hidden=m.lstm_dim, name="bilstm")(x, seq_len)
        lang_dim = 2 * m.lstm_dim

        arg_span = span_pool(y, srl_spans, seq_len)  # (B,A,2H)
        role_emb = nn.Embed(
            self.cfg.ds.num_roles, m.role_dim, name="role_embed"
        )(srl_roles)  # (B,A,role_dim)

        B, L, _ = y.shape
        verb_rep = jnp.take_along_axis(
            y, verb_idx[:, None, None].astype(jnp.int32).repeat(lang_dim, -1), axis=1
        )[:, 0]  # (B,2H)

        # per-arg rep conditions on span pool + role label + the verb
        # (reference builds the verb rep alongside the arg reps — SURVEY §2
        # language-encoder row; the fusion detail is [C-MED])
        A = arg_span.shape[1]
        verb_tiled = jnp.broadcast_to(verb_rep[:, None], (B, A, lang_dim))
        arg_rep = nn.Dense(m.vis_dim, name="arg_proj")(
            jnp.concatenate([arg_span, role_emb, verb_tiled], axis=-1)
        )
        arg_rep = nn.relu(arg_rep)
        # the language path itself stays fp32 (the BiLSTM is parity
        # sensitive and tiny); only the rep handed to the visual fusion
        # follows the activation-dtype policy
        arg_rep = arg_rep.astype(act_dtype(self.cfg))
        # NOTE: no separate query-level projection — no model variant
        # consumes one (a q rep would pool from ``y``/``h_n`` here if the
        # reference verification pass shows a head that needs it)
        return {"arg_rep": arg_rep, "verb_rep": verb_rep, "hidden": y}


class PropEncoder(nn.Module):
    """RoI fc6 + 5-d box -> vis_dim (reference ``prop_encoder``)."""

    cfg: Cfg

    @nn.compact
    def __call__(self, props: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        # features may arrive bf16 (misc.half_feats); compute follows the
        # activation-dtype policy (fp32 parity default)
        dt = act_dtype(self.cfg)
        x = jnp.concatenate([props.astype(dt), boxes.astype(dt)], axis=-1)
        x = nn.Dense(self.cfg.mdl.vis_dim, dtype=dt, name="prop_proj")(x)
        return nn.relu(x)


class SegEncoder(nn.Module):
    """TSN segment feature -> vis_dim (reference ``seg_encoder``)."""

    cfg: Cfg

    @nn.compact
    def __call__(self, seg: jnp.ndarray) -> jnp.ndarray:
        dt = act_dtype(self.cfg)
        x = nn.Dense(self.cfg.mdl.vis_dim, dtype=dt, name="seg_proj")(
            seg.astype(dt)
        )
        return nn.relu(x)
