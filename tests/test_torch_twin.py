"""Cross-framework parity: flax VOGNet vs the independent torch twin
(vog_tpu/interop/torch_twin.py) with converted weights.

This is the strongest parity evidence available while the reference mount
is empty: every equation (BiLSTM, span pool, encoders, object
transformer, relative-position multimodal transformer, cross-MLP head) is
validated against a second implementation in a different framework.  The
flax side runs its production path (arg-decomposed first mm layer); the
torch twin materializes the (B*A, T) tokens, so the test also re-proves
the decomposition's exactness end-to-end."""

import numpy as np
import pytest
import torch

import jax

from __graft_entry__ import _cfg, _glove, _random_batch
from vog_tpu.interop import TorchVOGNet, flax_params_to_torch
from vog_tpu.sampling import assemble_batch
from vog_tpu.train.state import init_state


def _clip_to_torch(clip):
    out = {}
    for k in (
        "tokens", "seq_len", "verb_idx", "srl_roles", "srl_spans",
        "props", "boxes", "seg", "mask", "frame_ids",
    ):
        v = np.asarray(clip[k])
        t = torch.from_numpy(v.copy())
        out[k] = t.long() if v.dtype.kind in "iu" else t
    return out


@pytest.mark.parametrize("decomposed", [True, False])
def test_vognet_torch_twin_forward_parity(decomposed):
    cfg = _cfg(tiny=True)
    cfg.mdl.decomposed_mm = decomposed
    cfg.mdl.dropout = 0.0
    B = 2
    state = init_state(cfg, _glove(cfg, 400), jax.random.PRNGKey(0), B)

    batch = {k: jax.numpy.asarray(v) for k, v in _random_batch(cfg, B, seed=3).items()}
    clip = assemble_batch(batch, cfg.ds.conc_type)
    flax_logits = np.asarray(
        state.apply_fn({"params": state.params}, clip, deterministic=True)
    )

    twin = TorchVOGNet(cfg, vocab_size=400, emb_dim=cfg.mdl.emb_dim)
    sd = flax_params_to_torch(state.params)
    twin.load_state_dict(sd, strict=True)
    twin.eval()
    with torch.no_grad():
        torch_logits = twin(_clip_to_torch(clip)).numpy()

    assert flax_logits.shape == torch_logits.shape
    scale = np.abs(flax_logits).max()
    err = np.abs(flax_logits - torch_logits).max()
    assert err <= 2e-4 * max(scale, 1.0), (err, scale)


def test_state_dict_covers_all_params():
    """Conversion must populate every torch twin parameter (strict load)
    and consume recognizable flax names — guards both sides of the map."""
    cfg = _cfg(tiny=True)
    state = init_state(cfg, _glove(cfg, 400), jax.random.PRNGKey(0), 2)
    twin = TorchVOGNet(cfg, vocab_size=400, emb_dim=cfg.mdl.emb_dim)
    sd = flax_params_to_torch(state.params)
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    assert not missing, missing
    assert not unexpected, unexpected


def test_vognet_torch_twin_gradient_parity():
    """Full backward parity: the identical masked-BCE loss backprops
    through both frameworks and every parameter's gradient must match
    through the same name map used for weights.  Extends the forward
    check to the training path — BiLSTM BPTT, span-pool scatter, the
    decomposed mm layer's VJP, and the loss masking/normalization are
    all exercised (the strongest cross-framework evidence available for
    the reconstructed training equations while the reference mount is
    empty; SURVEY §0)."""
    import torch.nn.functional as F

    from vog_tpu.model.grounding import compute_loss

    cfg = _cfg(tiny=True)
    cfg.mdl.dropout = 0.0
    B = 2
    state = init_state(cfg, _glove(cfg, 400), jax.random.PRNGKey(0), B)
    batch = {
        k: jax.numpy.asarray(v) for k, v in _random_batch(cfg, B, seed=7).items()
    }
    clip = assemble_batch(batch, cfg.ds.conc_type)

    def loss_fn(params):
        logits = state.apply_fn({"params": params}, clip, deterministic=True)
        loss, _ = compute_loss(logits, clip, pos_weight=1.0, loss_type="bce")
        return loss

    flax_loss, flax_grads = jax.value_and_grad(loss_fn)(state.params)
    # grads share the params tree structure, so the SAME weight-name map
    # (incl. its transposes / gate reorders — linear index moves, hence
    # grad-valid) converts them to torch parameter names
    g_sd = {k: v for k, v in flax_params_to_torch(flax_grads).items()}

    twin = TorchVOGNet(cfg, vocab_size=400, emb_dim=cfg.mdl.emb_dim)
    twin.load_state_dict(flax_params_to_torch(state.params), strict=True)
    twin.eval()  # dropout already 0; keeps fwd identical to the fwd test
    if not cfg.mdl.train_embeddings:
        # flax stop_gradients the GloVe table (encoders.py); mirror it so
        # both sides agree the embedding grad is zero
        twin.embed.weight.requires_grad_(False)
    tclip = _clip_to_torch(clip)
    logits = twin(tclip)
    mask = (
        torch.from_numpy(np.asarray(clip["srl_arg_mask"]).copy())[:, :, None]
        * torch.from_numpy(np.asarray(clip["mask"]).copy())[:, None, :]
        * torch.from_numpy(np.asarray(clip["batch_mask"]).copy())[:, None, None]
    )
    targets = torch.from_numpy(np.asarray(clip["targets"]).copy())
    per = F.binary_cross_entropy_with_logits(logits, targets, reduction="none")
    torch_loss = (per * mask).sum() / mask.sum().clamp(min=1.0)
    torch_loss.backward()

    assert abs(float(flax_loss) - float(torch_loss.detach())) <= 1e-5 * max(
        abs(float(flax_loss)), 1.0
    )
    checked = 0
    for name, p in twin.named_parameters():
        assert name in g_sd, f"no converted flax grad for {name}"
        g_flax = np.asarray(g_sd[name])
        g_torch = p.grad.numpy() if p.grad is not None else np.zeros_like(g_flax)
        scale = max(np.abs(g_flax).max(), np.abs(g_torch).max(), 1e-6)
        err = np.abs(g_flax - g_torch).max()
        assert err <= 2e-4 * max(scale, 1e-3), (name, err, scale)
        checked += 1
    assert checked == len(list(twin.named_parameters())) and checked > 10


@pytest.mark.parametrize("variant", ["img_grnd", "vid_grnd"])
def test_baseline_twin_forward_parity(variant):
    """ImgGrnd / VidGrnd twins: same conversion + forward parity."""
    from vog_tpu.interop import detect_variant

    cfg = _cfg(tiny=True)
    cfg.mdl.name = variant
    cfg.mdl.dropout = 0.0
    B = 2
    state = init_state(cfg, _glove(cfg, 400), jax.random.PRNGKey(0), B)
    assert detect_variant(state.params) == variant

    batch = {k: jax.numpy.asarray(v) for k, v in _random_batch(cfg, B, seed=5).items()}
    clip = assemble_batch(batch, cfg.ds.conc_type)
    flax_logits = np.asarray(
        state.apply_fn({"params": state.params}, clip, deterministic=True)
    )
    twin = TorchVOGNet(cfg, vocab_size=400, emb_dim=cfg.mdl.emb_dim, variant=variant)
    twin.load_state_dict(flax_params_to_torch(state.params), strict=True)
    twin.eval()
    with torch.no_grad():
        torch_logits = twin(_clip_to_torch(clip)).numpy()
    scale = np.abs(flax_logits).max()
    assert np.abs(flax_logits - torch_logits).max() <= 2e-4 * max(scale, 1.0)
