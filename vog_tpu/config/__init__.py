from vog_tpu.config.defaults import (
    Cfg,
    DsCfg,
    MdlCfg,
    MiscCfg,
    TrainCfg,
    apply_matmul_precision,
    get_default_cfg,
    post_proc_config,
    update_from_dict,
)

__all__ = [
    "apply_matmul_precision",
    "Cfg",
    "DsCfg",
    "MdlCfg",
    "MiscCfg",
    "TrainCfg",
    "get_default_cfg",
    "post_proc_config",
    "update_from_dict",
]
