"""No-ungated-kernel policy (VERDICT r4 next #2): every kernel module in
vog_tpu/kernels/ must have an on-chip check in tools/verify_kernels.py.

Round-4 shipped a kernel (gather.py) default-on with no gate entry and it
failed Mosaic lowering in production.  This test makes that structurally
impossible: adding a kernel module without touching the gate fails CI.
The mapping below is the explicit contract — extend BOTH sides when
adding a kernel (docs/ARCHITECTURE.md §kernel gate).
"""

import ast
import pathlib

KERNELS_DIR = pathlib.Path(__file__).resolve().parents[1] / "vog_tpu" / "kernels"
GATE = pathlib.Path(__file__).resolve().parents[1] / "tools" / "verify_kernels.py"

# kernel module -> substring(s) that must appear in the gate's check names
GATED = {
    "attention.py": "flash_",
    "mm_attention.py": "mm_",
    "grounding_head.py": "head_",
    "gather.py": "gather_",
    "ring_attention.py": "ring_",
}


def _gate_check_names():
    """Names written into results[...] by tools/verify_kernels.py §run."""
    src = GATE.read_text()
    tree = ast.parse(src)
    names = set()
    for node in ast.walk(tree):
        # results["name"] = ... and _compare(f"prefix_{tag}", ...)
        if isinstance(node, ast.JoinedStr) or isinstance(node, ast.Constant):
            v = getattr(node, "value", None)
            if isinstance(node, ast.JoinedStr):
                for part in node.values:
                    if isinstance(part, ast.Constant) and isinstance(
                        part.value, str
                    ):
                        names.add(part.value)
            elif isinstance(v, str):
                names.add(v)
    return names


def test_every_kernel_module_is_gated():
    modules = sorted(
        p.name
        for p in KERNELS_DIR.glob("*.py")
        if p.name != "__init__.py"
    )
    names = _gate_check_names()
    missing = []
    for m in modules:
        assert m in GATED, (
            f"vog_tpu/kernels/{m} has no entry in tests/test_kernel_gate.py "
            "GATED — add an on-chip check to tools/verify_kernels.py first"
        )
        if not any(GATED[m] in n for n in names):
            missing.append(m)
    assert not missing, (
        f"kernels missing verify_kernels.py gate checks: {missing}"
    )


def test_gate_has_no_stale_entries():
    modules = {
        p.name for p in KERNELS_DIR.glob("*.py") if p.name != "__init__.py"
    }
    stale = set(GATED) - modules
    assert not stale, f"GATED lists removed kernel modules: {stale}"
