"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 failure: the driver calls ``dryrun_multichip(8)`` *in-process* on the
1-chip axon platform; the function must self-bootstrap a virtual 8-device CPU
mesh in that case (VERDICT round 1, item 1).
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_in_process_on_full_mesh(capsys):
    # Test env already has 8 virtual CPU devices -> in-process path.
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out


def test_dryrun_subprocess_bootstrap(capsys):
    # Ask for more devices than the current platform has: must re-exec in a
    # subprocess with a wider virtual CPU platform, as the driver relies on.
    n = len(jax.devices()) + 4
    graft.dryrun_multichip(n)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out
    assert f"devices={n}" in out


def test_dryrun_subprocess_failure_raises(monkeypatch):
    # The subprocess path must propagate failure as an exception (rc!=0 must
    # not be swallowed), so the driver records ok=false correctly.
    import subprocess

    real_run = subprocess.run

    def fake_run(*a, **k):
        r = real_run([sys.executable, "-c", "import sys; sys.exit(3)"],
                     capture_output=True, text=True)
        return r

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="rc=3"):
        graft._dryrun_in_subprocess(99)
