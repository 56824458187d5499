"""Terminal progress bar (vog_tpu/train/progress.py) — throttle, render,
enable modes."""

import io

from vog_tpu.train.progress import ProgressBar, progress_enabled


def test_progress_enabled_modes():
    class Tty(io.StringIO):
        def isatty(self):
            return True

    assert progress_enabled("on", io.StringIO())
    assert not progress_enabled("off", Tty())
    assert progress_enabled("auto", Tty())
    assert not progress_enabled("auto", io.StringIO())


def test_progress_renders_and_closes():
    buf = io.StringIO()
    bar = ProgressBar(10, desc="ep 0", enabled=True, file=buf, min_interval=0.0)
    for _ in range(10):
        bar.update(1, loss=0.5)
    bar.close("done")
    out = buf.getvalue()
    assert "ep 0" in out and "10/10" in out and "100%" in out
    assert "loss=0.5000" in out
    assert out.endswith("done\n")


def test_progress_disabled_writes_nothing():
    buf = io.StringIO()
    bar = ProgressBar(5, enabled=False, file=buf)
    bar.update(5)
    bar.close()
    assert buf.getvalue() == ""


def test_progress_throttles():
    buf = io.StringIO()
    bar = ProgressBar(1000, enabled=True, file=buf, min_interval=3600.0)
    for _ in range(999):
        bar.update(1)
    # first update draws (last_draw starts at 0), then the interval gate
    # suppresses everything until n reaches total
    assert buf.getvalue().count("\r") == 1
    bar.update(1)
    assert buf.getvalue().count("\r") == 2
    assert "1000/1000" in buf.getvalue()
