"""Stall-tolerant launcher for TPU runs behind a remote-compile tunnel.

First compiles of large scan+grad graphs go through a remote-compile service
and occasionally stall indefinitely (observed ~once per session). A stalled
POST cannot be interrupted from inside the process, so the recovery unit is the
whole process: run the command as a subprocess, watch its combined output
stream, and if it goes silent for longer than ``stall_timeout`` kill the
process group and start over. Restarts are cheap because every completed
compile landed in the persistent compilation cache (``/root/.jax_cache``) —
a retried run fast-forwards through everything already compiled.

A *legitimate* slow compile is silent too, so the timeout must exceed the
worst-case genuine compile (~15 min observed); the default is 30 min. Genuine
stalls are indefinite, so any finite threshold separates the two.

Usage:
    python -m gpflowpilco_tpu.utils.launch [--stall-timeout 1800] \
        [--max-restarts 2] -- python examples/cartpole_swingup/run_tpu_full.py ...

(No reference counterpart: the reference runs local TF kernels and never
remote-compiles.)
"""
from __future__ import annotations

import argparse
import codecs
import os
import selectors
import signal
import subprocess
import sys
import time


def supervise(
    cmd: list[str],
    stall_timeout: float = 1800.0,
    max_restarts: int = 2,
    stdout=None,
    crash_backoff: float = 30.0,
    late_crash_retries: int = 0,
) -> int:
    """Run ``cmd``, restarting (up to ``max_restarts`` times) whenever its
    combined stdout/stderr produces nothing for ``stall_timeout`` seconds OR
    it exits nonzero within its first few minutes (transient backend-init
    failures: a freshly killed predecessor can hold the single-chip pool claim
    briefly, and the next process then dies with UNAVAILABLE at startup —
    observed in production). Crash restarts wait ``crash_backoff`` seconds for
    the stale claim to clear. Output is forwarded line-buffered to ``stdout``
    (default: this process's stdout). Returns the command's final exit code,
    or 124 if the last attempt also stalled."""
    out = stdout or sys.stdout
    reason = ""
    for attempt in range(max_restarts + 1):
        if attempt:
            print(
                f"[launch] restart {attempt}/{max_restarts} ({reason})",
                file=out,
                flush=True,
            )
        start = time.monotonic()
        proc = subprocess.Popen(
            cmd,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            start_new_session=True,  # own process group: kill children too
        )
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        # one incremental decoder across chunks: a multi-byte UTF-8 character
        # split on a 64 KiB read boundary must not decode as two U+FFFDs
        decoder = codecs.getincrementaldecoder("utf-8")(errors="replace")
        stalled = False
        last_output = time.monotonic()
        while True:
            events = sel.select(timeout=min(stall_timeout, 60.0))
            if events:
                chunk = os.read(proc.stdout.fileno(), 65536)
                if chunk:
                    last_output = time.monotonic()
                    out.write(decoder.decode(chunk))
                    out.flush()
                    continue
                break  # EOF: process finished (or closed its streams)
            if proc.poll() is not None:
                break
            if time.monotonic() - last_output > stall_timeout:
                stalled = True
                break
        sel.unregister(proc.stdout)
        out.write(decoder.decode(b"", final=True))
        if not stalled:
            # EOF only proves the streams closed, not that the process exited —
            # a child that redirects away its output and then hangs must still
            # be covered by the watchdog
            try:
                rc = proc.wait(timeout=stall_timeout)
            except subprocess.TimeoutExpired:
                stalled = True
            else:
                # early nonzero exit = transient startup failure worth retrying
                # (backend UNAVAILABLE from a stale pool claim); a late nonzero
                # exit is a genuine run failure — surface it
                early = time.monotonic() - start < max(300.0, 2 * crash_backoff)
                if rc != 0 and early and attempt < max_restarts:
                    reason = f"exit {rc} within startup window"
                    print(f"[launch] {reason}; backing off "
                          f"{crash_backoff:.0f}s", file=out, flush=True)
                    time.sleep(crash_backoff)
                    continue
                if rc != 0 and not early and late_crash_retries > 0:
                    # mid-run TPU worker crash (`UNAVAILABLE`) — the round-3
                    # mm_island run lost its final episode to exactly this.
                    # Numbered atomic checkpoints make a restart resume from
                    # the last completed episode, so retrying is safe; back
                    # off longer than the ~45 s the tunnel needs to recover.
                    late_crash_retries -= 1
                    reason = f"late exit {rc} (worker crash?); resuming from checkpoint"
                    print(f"[launch] {reason}; backing off "
                          f"{2 * crash_backoff:.0f}s", file=out, flush=True)
                    time.sleep(2 * crash_backoff)
                    continue
                return rc
        if stalled:
            reason = f"{stall_timeout:.0f}s of silence (compile-tunnel stall)"
            # kill the exact process group we started (never by pattern)
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            continue
    return 124


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--stall-timeout", type=float, default=1800.0)
    p.add_argument("--max-restarts", type=int, default=2)
    p.add_argument("--crash-backoff", type=float, default=30.0,
                   help="seconds to wait before retrying a crashed start "
                        "(the tunnel's TPU worker needs ~45-120 s to recover "
                        "after an UNAVAILABLE crash)")
    p.add_argument("--late-crash-retries", type=int, default=3,
                   help="also retry NONZERO exits past the startup window "
                        "(mid-run TPU worker crashes); safe because runs "
                        "resume from their numbered checkpoints")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to run (prefix with --)")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given")
    return supervise(cmd, args.stall_timeout, args.max_restarts,
                     crash_backoff=args.crash_backoff,
                     late_crash_retries=args.late_crash_retries)


if __name__ == "__main__":
    sys.exit(main())
