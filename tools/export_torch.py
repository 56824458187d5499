"""Export a trained vog_tpu checkpoint to a PyTorch state_dict (.pt).

Usage:
  python tools/export_torch.py <ckpt_dir> <out.pt>

<ckpt_dir> is an orbax checkpoint directory written by the Learner
(e.g. tmp/models/<uid>/best).  The output .pt loads strict into
``vog_tpu.interop.TorchVOGNet`` (see tests/test_torch_twin.py for the
end-to-end parity guarantee).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    if len(args) != 2:
        raise SystemExit(__doc__)
    ckpt_dir, out_path = args

    import torch
    import orbax.checkpoint as ocp

    from vog_tpu.interop import detect_variant, flax_params_to_torch

    # restore without a template: orbax returns the raw array tree, so no
    # model construction (or shape knowledge) is needed for export
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(Path(ckpt_dir).absolute())
    variant = detect_variant(restored["params"])
    sd = flax_params_to_torch(restored["params"])
    torch.save({"variant": variant, "state_dict": sd}, out_path)
    n = sum(v.numel() for v in sd.values())
    print(
        f"wrote {out_path}: variant={variant}, {len(sd)} tensors, "
        f"{n / 1e6:.2f} M params"
    )


if __name__ == "__main__":
    main()
