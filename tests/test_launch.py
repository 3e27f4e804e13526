"""Stall-supervisor behavior (gpflowpilco_tpu/utils/launch.py): forwarding,
exit codes, and kill-and-restart on output silence. Pure subprocess logic —
no jax, runs in milliseconds."""
import io
import sys

from gpflowpilco_tpu.utils.launch import supervise


def test_clean_run_forwards_output_and_exit_code():
    buf = io.StringIO()
    rc = supervise(
        [sys.executable, "-c", "print('hello'); raise SystemExit(7)"],
        stall_timeout=30.0,
        max_restarts=0,
        stdout=buf,
    )
    assert rc == 7
    assert "hello" in buf.getvalue()


def test_stall_triggers_restart_then_success(tmp_path):
    # First attempt finds no marker file and hangs silently; the supervisor
    # kills it, and the retry (marker now present) exits 0 — the persistent-
    # compile-cache recovery pattern in miniature.
    marker = tmp_path / "cache"
    script = (
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    print('warm'); sys.exit(0)\n"
        "open(m, 'w').close()\n"
        "print('cold', flush=True)\n"
        "time.sleep(300)\n"
    )
    buf = io.StringIO()
    # stall_timeout must exceed interpreter startup (~1 s on this box): the
    # silence clock starts at launch, not at first output
    rc = supervise(
        [sys.executable, "-c", script],
        stall_timeout=5.0,
        max_restarts=1,
        stdout=buf,
    )
    assert rc == 0
    text = buf.getvalue()
    assert "cold" in text and "warm" in text and "restart 1/1" in text


def test_persistent_stall_returns_124():
    buf = io.StringIO()
    rc = supervise(
        [sys.executable, "-c", "import time; time.sleep(300)"],
        stall_timeout=1.5,
        max_restarts=1,
        stdout=buf,
    )
    assert rc == 124


def test_early_crash_retries_with_backoff(tmp_path):
    # Transient startup failure (backend UNAVAILABLE from a stale pool claim):
    # first attempt exits 1 immediately; the retry (marker present) succeeds.
    marker = tmp_path / "claim"
    script = (
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    print('claimed'); sys.exit(0)\n"
        "open(m, 'w').close()\n"
        "print('unavailable', flush=True)\n"
        "sys.exit(1)\n"
    )
    buf = io.StringIO()
    rc = supervise(
        [sys.executable, "-c", script],
        stall_timeout=30.0,
        max_restarts=2,
        stdout=buf,
        crash_backoff=0.1,
    )
    assert rc == 0
    assert "exit 1 within startup window" in buf.getvalue()
    assert "claimed" in buf.getvalue()
