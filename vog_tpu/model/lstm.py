"""BiLSTM with torch ``nn.LSTM`` semantics, as a masked ``lax.scan``.

Reference parity: the reference query/role encoder runs GloVe embeddings
through a packed-sequence bidirectional ``torch.nn.LSTM``
(``code/mdl_srl_utils.py``, SURVEY §2 "Language encoder").  SURVEY §7 ranks
fp32 parity with ATen LSTM semantics the #1 hard part; the contract
implemented here (validated in ``tests/test_lstm_parity.py`` against
torch-CPU):

  * gate order i, f, g, o in the stacked (4H, …) weights;
  * two bias vectors (b_ih + b_hh) both added, as torch does;
  * packed-sequence behavior: outputs beyond a sample's length are zeros,
    the reverse direction starts at the *actual* last token, and the final
    states are taken at each sample's length.

TPU-first notes: the scan carries (h, c) with a per-step validity mask —
no dynamic shapes, so XLA compiles one executable for the padded length.
Weights are stored transposed, (in, 4H), so each step is a single MXU
matmul; the input projection for all timesteps is hoisted out of the scan
(x @ W_ih is computed once as a batched matmul).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_scan(
    x_proj: jnp.ndarray,  # (B, L, 4H) = x @ w_ih + b_ih + b_hh
    w_hh: jnp.ndarray,  # (H, 4H)
    mask: jnp.ndarray,  # (B, L) 1.0 where valid
    hidden: int,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    B = x_proj.shape[0]
    h0 = jnp.zeros((B, hidden), x_proj.dtype)
    c0 = jnp.zeros((B, hidden), x_proj.dtype)

    def step(carry, inp):
        h, c = carry
        xp, m = inp  # (B,4H), (B,)
        gates = xp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m[:, None]
        h = jnp.where(m > 0, h_new, h)
        c = jnp.where(m > 0, c_new, c)
        y = jnp.where(m > 0, h_new, jnp.zeros_like(h_new))
        return (h, c), y

    (hT, cT), ys = jax.lax.scan(
        step, (h0, c0), (x_proj.transpose(1, 0, 2), mask.T)
    )
    return ys.transpose(1, 0, 2), (hT, cT)


def _reverse_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence within its valid length (packed-seq reversal).

    x (B, L, D); positions >= length map onto position 0's slot after the
    flip but are masked out downstream, so their value is irrelevant.
    """
    B, L = x.shape[0], x.shape[1]
    t = jnp.arange(L)[None, :]  # (1, L)
    idx = jnp.clip(lengths[:, None] - 1 - t, 0, L - 1)  # (B, L)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class TorchBiLSTM(nn.Module):
    """Single-layer bidirectional LSTM matching torch packed-seq semantics.

    Returns (outputs (B,L,2H), (h_n (B,2H), c_n (B,2H))) where h_n/c_n
    concatenate the forward state at t=len-1 and the backward state after
    consuming the sequence in reverse (torch's h_n for each direction).
    """

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        B, L, Din = x.shape
        H = self.hidden
        dtype = x.dtype

        def mk(name, shape, gain=1.0):
            # torch init: U(-1/sqrt(H), 1/sqrt(H)) for all LSTM params
            bound = 1.0 / (H**0.5)
            return self.param(
                name,
                lambda k, s: jax.random.uniform(k, s, dtype, -bound, bound),
                shape,
            )

        params = {
            d: dict(
                w_ih=mk(f"w_ih_{d}", (Din, 4 * H)),
                w_hh=mk(f"w_hh_{d}", (H, 4 * H)),
                b_ih=mk(f"b_ih_{d}", (4 * H,)),
                b_hh=mk(f"b_hh_{d}", (4 * H,)),
            )
            for d in ("f", "b")
        }

        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(dtype)  # (B,L)

        # forward direction
        pf = params["f"]
        xp_f = x @ pf["w_ih"] + pf["b_ih"] + pf["b_hh"]
        y_f, (h_f, c_f) = _lstm_scan(xp_f, pf["w_hh"], mask, H)

        # backward direction: reverse within length, scan, reverse back
        pb = params["b"]
        x_rev = _reverse_padded(x, lengths)
        xp_b = x_rev @ pb["w_ih"] + pb["b_ih"] + pb["b_hh"]
        y_b_rev, (h_b, c_b) = _lstm_scan(xp_b, pb["w_hh"], mask, H)
        y_b = _reverse_padded(y_b_rev, lengths) * mask[:, :, None]

        y = jnp.concatenate([y_f, y_b], axis=-1)
        h_n = jnp.concatenate([h_f, h_b], axis=-1)
        c_n = jnp.concatenate([c_f, c_b], axis=-1)
        return y, (h_n, c_n)
