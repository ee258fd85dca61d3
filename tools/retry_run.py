#!/usr/bin/env python
"""Progress-watchdog retry driver for long TPU runs on the flaky remote
service (the client can wedge mid-run; see ROADMAP reliability findings).

Runs a command as a subprocess; if the watched log file shows no progress
(mtime) for --idle-timeout seconds, kills the child and relaunches (the
pipeline resumes from its Phase A breadcrumbs / checkpoints).

Usage: retry_run.py --log <file-to-watch> [--idle-timeout 900]
                    [--attempts 6] -- cmd args...
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--idle-timeout", type=float, default=900.0)
    ap.add_argument("--attempts", type=int, default=6)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    assert cmd, "no command given"

    for attempt in range(1, args.attempts + 1):
        print(f"[retry_run] attempt {attempt}/{args.attempts}: "
              f"{' '.join(cmd)}", flush=True)
        child = subprocess.Popen(cmd, start_new_session=True)
        start = time.time()
        while True:
            rc = child.poll()
            if rc is not None:
                if rc == 0:
                    print("[retry_run] success", flush=True)
                    return 0
                print(f"[retry_run] child exited rc={rc}", flush=True)
                break
            try:
                # clamp to child start: a pre-existing log from a previous
                # (wedged) run must not count as staleness for this attempt
                age = time.time() - max(os.path.getmtime(args.log), start)
            except OSError:
                age = time.time() - start
            if age > args.idle_timeout:
                print(f"[retry_run] no progress on {args.log} for "
                      f"{age:.0f}s — killing pg {child.pid}", flush=True)
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                child.wait()
                break
            time.sleep(20)
    print("[retry_run] attempts exhausted", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
