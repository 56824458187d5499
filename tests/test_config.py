from vog_tpu.config import get_default_cfg, post_proc_config, update_from_dict


def test_defaults_and_postproc():
    cfg = get_default_cfg()
    assert cfg.ds.num_prop_per_frm == 5  # gt5
    assert cfg.ds.num_cmp == 1  # svsq

    update_from_dict(cfg, {"ds.exp_setting": "p100", "ds.conc_type": "spat"})
    post_proc_config(cfg)
    assert cfg.ds.num_prop_per_frm == 100
    assert cfg.ds.num_cmp == 4


def test_dotted_overrides_type_coercion():
    cfg = get_default_cfg()
    update_from_dict(
        cfg,
        {
            "train.lr": "0.001",
            "train.bs": "8",
            "mdl.use_pallas_attn": "false",
            "--mdl.name": "vid_grnd",
        },
    )
    assert cfg.train.lr == 0.001 and isinstance(cfg.train.lr, float)
    assert cfg.train.bs == 8 and isinstance(cfg.train.bs, int)
    assert cfg.mdl.use_pallas_attn is False
    assert cfg.mdl.name == "vid_grnd"


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("ds:\n  conc_type: temp\ntrain:\n  epochs: 3\n")
    cfg = get_default_cfg(str(p))
    assert cfg.ds.conc_type == "temp"
    assert cfg.train.epochs == 3
    assert cfg.ds.num_cmp == 4


def test_unknown_key_rejected():
    cfg = get_default_cfg()
    try:
        update_from_dict(cfg, {"ds.nonexistent": 1})
        raise AssertionError("should have raised")
    except KeyError:
        pass
