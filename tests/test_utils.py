"""Foundation utils: cleanup registry, log-file tee, phase timer."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cleanup_registry(tmp_path):
    from kmernator_tpu.utils import cleanup
    d = tmp_path / "tmpdir"
    d.mkdir()
    (d / "x").write_text("1")
    f = tmp_path / "file.fifo"
    f.write_text("")
    cleanup.register_path(str(d))
    cleanup.register_path(str(f))
    hits = []
    cleanup.register_callback(lambda: hits.append(1))
    cleanup._flush()
    assert not d.exists() and not f.exists() and hits == [1]


def test_cleanup_unregister(tmp_path):
    from kmernator_tpu.utils import cleanup
    f = tmp_path / "keep"
    f.write_text("1")
    cleanup.register_path(str(f))
    cleanup.unregister_path(str(f))
    cleanup._flush()
    assert f.exists()


def test_cleanup_on_sigterm(tmp_path):
    """A SIGTERM'd process must remove its registered temp files
    (ref: Utils.h Cleanup signal handlers)."""
    import signal
    import time
    target = tmp_path / "doomed"
    target.mkdir()
    code = (
        "import sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from kmernator_tpu.utils.cleanup import register_path\n"
        "register_path(%r)\n"
        "print('ready', flush=True)\n"
        "time.sleep(30)\n" % (REPO, str(target)))
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE)
    assert p.stdout.readline().strip() == b"ready"
    p.send_signal(signal.SIGTERM)
    p.wait(timeout=10)
    assert not target.exists()


def test_log_file_tee(tmp_path):
    from kmernator_tpu.utils.logging import Log
    path = str(tmp_path / "x.log")
    old_level = Log.verbose_level
    Log.verbose_level = 1
    Log.set_log_file(path)
    try:
        Log.verbose(1, "hello-tee")
        Log.warn("warn-tee")
    finally:
        Log.set_log_file("")
        Log.verbose_level = old_level
    text = open(path).read()
    assert "hello-tee" in text and "warn-tee" in text


def test_phase_timer():
    from kmernator_tpu.utils.timers import PhaseTimer
    t = PhaseTimer()
    t.reset("phase")
    t.record("a")
    t.record("b")
    rep = t.report()
    assert "a" in rep and "b" in rep


def test_fast_temp_dir_modes(tmp_path):
    """RAM-backed when the estimate clearly fits, default tempdir when the
    estimate is absurd; always mkdtemp-fresh and writable."""
    import os
    from kmernator_tpu.utils.memory import fast_temp_dir
    small = fast_temp_dir(1 << 20, prefix="kmtest-")
    huge = fast_temp_dir(1 << 60, prefix="kmtest-")
    try:
        for d in (small, huge):
            assert os.path.isdir(d)
            with open(os.path.join(d, "x"), "wb") as f:
                f.write(b"ok")
        assert not huge.startswith("/dev/shm")
    finally:
        import shutil
        shutil.rmtree(small, ignore_errors=True)
        shutil.rmtree(huge, ignore_errors=True)
