import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import small_cfg
from vog_tpu.data import get_data
from vog_tpu.sampling import (
    assemble_batch,
    frame_ids,
    scores_to_canonical,
    video_ids,
    view_dims,
)

B, V, F, P, A = 2, 4, 3, 2, 2
D, SD = 4, 3


def tiny_batch(rng):
    batch = {
        "props": rng.normal(size=(B, V, F, P, D)).astype(np.float32),
        "prop_boxes": rng.uniform(0, 1, (B, V, F, P, 5)).astype(np.float32),
        "prop_mask": np.ones((B, V, F, P), np.float32),
        "seg_feats": rng.normal(size=(B, V, F, SD)).astype(np.float32),
        "targets": (rng.uniform(size=(B, V, A, F, P)) > 0.8).astype(np.float32),
        "tokens": np.ones((B, 5), np.int32),
        "seq_len": np.full((B,), 5, np.int32),
        "verb_idx": np.ones((B,), np.int32),
        "srl_roles": np.ones((B, A), np.int32),
        "srl_spans": np.ones((B, A, 2), np.int32),
        "srl_arg_mask": np.ones((B, A), np.float32),
        "batch_mask": np.ones((B,), np.float32),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.parametrize("conc_type", ["sep", "temp", "spat"])
def test_targets_roundtrip(conc_type, rng):
    """assemble -> scores_to_canonical over targets is the identity."""
    batch = tiny_batch(rng)
    clip = assemble_batch(batch, conc_type)
    back = scores_to_canonical(clip["targets"], conc_type, B, V, F, P)
    want = np.transpose(np.asarray(batch["targets"]), (0, 2, 1, 3, 4))
    np.testing.assert_array_equal(np.asarray(back), want)


def test_svsq_roundtrip(rng):
    batch = tiny_batch(rng)
    batch = {
        k: (v[:, :1] if v.ndim >= 2 and v.shape[1] == V and k != "srl_spans" else v)
        for k, v in batch.items()
    }
    batch["targets"] = batch["targets"][:, :1] if batch["targets"].shape[1] != 1 else batch["targets"]
    clip = assemble_batch(batch, "svsq")
    back = scores_to_canonical(clip["targets"], "svsq", B, 1, F, P)
    want = np.transpose(np.asarray(batch["targets"]), (0, 2, 1, 3, 4))
    np.testing.assert_array_equal(np.asarray(back), want)


def test_temp_token_order(rng):
    """TEMP: token t of video v at frame f prop p sits at ((v*F)+f)*P+p."""
    batch = tiny_batch(rng)
    clip = assemble_batch(batch, "temp")
    props = np.asarray(batch["props"])
    got = np.asarray(clip["props"])
    for v in range(V):
        for f in range(F):
            for p in range(P):
                t = (v * F + f) * P + p
                np.testing.assert_array_equal(got[0, t], props[0, v, f, p])
    fids = np.asarray(frame_ids("temp", V, F, P))
    vids = np.asarray(video_ids("temp", V, F, P))
    assert fids[0] == 0 and fids[-1] == V * F - 1
    assert vids[0] == 0 and vids[-1] == V - 1


def test_spat_token_order_and_shift(rng):
    """SPAT: token of frame f video v prop p sits at (f*V+v)*P+p; x shifted by v."""
    batch = tiny_batch(rng)
    clip = assemble_batch(batch, "spat")
    props = np.asarray(batch["props"])
    boxes = np.asarray(batch["prop_boxes"])
    got_p = np.asarray(clip["props"])
    got_b = np.asarray(clip["boxes"])
    for f in range(F):
        for v in range(V):
            for p in range(P):
                t = (f * V + v) * P + p
                np.testing.assert_array_equal(got_p[1, t], props[1, v, f, p])
                want_box = boxes[1, v, f, p].copy()
                want_box[0] += v
                want_box[2] += v
                np.testing.assert_allclose(got_b[1, t], want_box, atol=1e-6)
    vids = np.asarray(video_ids("spat", V, F, P))
    assert vids[:P].tolist() == [0] * P
    assert vids[P : 2 * P].tolist() == [1] * P


def test_sep_language_tiling(rng):
    batch = tiny_batch(rng)
    clip = assemble_batch(batch, "sep")
    assert clip["props"].shape[0] == B * V
    toks = np.asarray(clip["tokens"])
    for b in range(B):
        for v in range(V):
            np.testing.assert_array_equal(toks[b * V + v], np.asarray(batch["tokens"])[b])


def test_view_dims():
    assert view_dims("svsq", 1, 10, 5) == (1, 10, 5)
    assert view_dims("sep", 4, 10, 5) == (4, 10, 5)
    assert view_dims("temp", 4, 10, 5) == (1, 40, 5)
    assert view_dims("spat", 4, 10, 5) == (1, 10, 20)


def test_assemble_real_batch(fixture_dir):
    cfg = small_cfg(fixture_dir, **{"ds.conc_type": "spat"})
    data = get_data(cfg, global_batch_size=2)
    batch = next(iter(data.train_dl))
    clip = assemble_batch({k: jnp.asarray(v) for k, v in batch.items()}, "spat")
    T = cfg.ds.num_frms * cfg.ds.num_cmp * cfg.ds.num_prop_per_frm
    assert clip["props"].shape == (2, T, cfg.ds.prop_dim)
    assert clip["targets"].shape == (2, cfg.ds.max_srl_args, T)
