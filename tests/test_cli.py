import sys

from tests.conftest import small_cfg  # noqa: F401  (env setup side effect)
from vog_tpu.cli.train import main, parse_argv


def test_parse_argv():
    uid, over, flags = parse_argv(
        ["exp1", "--ds.conc_type=spat", "--train.bs=2", "--only_val"]
    )
    assert uid == "exp1"
    assert over == {"ds.conc_type": "spat", "train.bs": "2"}
    assert flags == {"only_val"}


def test_cli_only_val(fixture_dir, tmp_path):
    m = main(
        [
            "cli_test",
            f"--ds.data_dir={fixture_dir}",
            f"--ds.prop_dim=64",
            f"--ds.seg_dim=48",
            f"--ds.glove_dim=32",
            "--mdl.emb_dim=32",
            "--mdl.lstm_dim=16",
            "--mdl.vis_dim=32",
            "--mdl.role_dim=8",
            "--mdl.n_heads=2",
            "--mdl.name=img_grnd",
            "--mdl.use_pallas_attn=false",
            "--train.bs=2",
            "--misc.mesh_data=1",
            f"--misc.tmp_path={tmp_path}/tmp",
            "--only_val",
        ]
    )
    assert "acc" in m and 0.0 <= m["acc"] <= 1.0
