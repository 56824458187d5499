"""fp32 parity of TorchBiLSTM (lax.scan) vs torch.nn.LSTM packed sequences.

SURVEY §7 hard part #1: gate order, dual biases, packed-sequence reversal
and zero-padding semantics must match ATen exactly.  torch-CPU is the
oracle (SURVEY §4 item 1).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vog_tpu.model.lstm import TorchBiLSTM


def torch_bilstm_ref(x, lengths, params, hidden):
    """Run torch's packed bidirectional LSTM with given params."""
    B, L, Din = x.shape
    lstm = torch.nn.LSTM(
        Din, hidden, num_layers=1, batch_first=True, bidirectional=True
    )
    with torch.no_grad():
        # our storage is (in, 4H); torch wants (4H, in)
        lstm.weight_ih_l0.copy_(torch.from_numpy(params["w_ih_f"].T))
        lstm.weight_hh_l0.copy_(torch.from_numpy(params["w_hh_f"].T))
        lstm.bias_ih_l0.copy_(torch.from_numpy(params["b_ih_f"]))
        lstm.bias_hh_l0.copy_(torch.from_numpy(params["b_hh_f"]))
        lstm.weight_ih_l0_reverse.copy_(torch.from_numpy(params["w_ih_b"].T))
        lstm.weight_hh_l0_reverse.copy_(torch.from_numpy(params["w_hh_b"].T))
        lstm.bias_ih_l0_reverse.copy_(torch.from_numpy(params["b_ih_b"]))
        lstm.bias_hh_l0_reverse.copy_(torch.from_numpy(params["b_hh_b"]))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths, batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        out, (h_n, c_n) = lstm(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=L
    )
    # h_n: (2, B, H) -> (B, 2H)
    h_n = torch.cat([h_n[0], h_n[1]], dim=-1)
    c_n = torch.cat([c_n[0], c_n[1]], dim=-1)
    return out.numpy(), h_n.numpy(), c_n.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_bilstm_matches_torch(seed):
    rng = np.random.default_rng(seed)
    B, L, Din, H = 4, 9, 6, 5
    x = rng.normal(size=(B, L, Din)).astype(np.float32)
    lengths = np.array([9, 4, 1, 7])

    model = TorchBiLSTM(hidden=H)
    variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(x), jnp.asarray(lengths))
    params = {k: np.asarray(v) for k, v in variables["params"].items()}

    y, (h_n, c_n) = model.apply(variables, jnp.asarray(x), jnp.asarray(lengths))
    ty, th, tc = torch_bilstm_ref(x, lengths, params, H)

    np.testing.assert_allclose(np.asarray(y), ty, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_n), th, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_n), tc, atol=2e-6, rtol=1e-5)


def test_bilstm_padding_is_zero():
    rng = np.random.default_rng(2)
    B, L, Din, H = 3, 7, 4, 3
    x = rng.normal(size=(B, L, Din)).astype(np.float32)
    lengths = np.array([3, 7, 5])
    model = TorchBiLSTM(hidden=H)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
    y, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(lengths))
    y = np.asarray(y)
    for b, l in enumerate(lengths):
        if l < L:
            assert np.abs(y[b, l:]).max() == 0.0


def test_bilstm_length_independence():
    """Padded tail must not influence valid outputs."""
    rng = np.random.default_rng(3)
    B, L, Din, H = 2, 6, 4, 3
    x1 = rng.normal(size=(B, L, Din)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 4:] = 99.0  # garbage in the padding
    lengths = np.array([4, 4])
    model = TorchBiLSTM(hidden=H)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(lengths))
    y1, (h1, c1) = model.apply(variables, jnp.asarray(x1), jnp.asarray(lengths))
    y2, (h2, c2) = model.apply(variables, jnp.asarray(x2), jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
