"""Stall-guard supervisor for long chip jobs on a flaky remote runtime.

The shared-tunnel TPU runtime occasionally WEDGES a long-lived client:
the process blocks forever on a remote RPC (main thread in futex wait,
tunnel socket idle) while fresh sessions work fine — observed twice
during the r4 Tmall rehearsal, each time freezing a multi-hour
retrieval scan mid-slice. A wedged RPC cannot be recovered in-process;
the only cure is kill + restart, which the mid-scan resumable
retrieval store (rat_tpu/data/loader.py::_PartialRetrievalStore) and
the split-level caches make cheap.

This wrapper runs a command, watches a set of progress artifacts (any
file matching the given globs; a growing/rewritten file counts as
progress), and kills + restarts the child whenever NOTHING has
progressed for --stall-secs. Exits with the child's code when the
child exits on its own (0 or nonzero after --max-restarts).

Usage:
    python scripts/stall_guard.py --stall-secs 1500 \
        --watch 'exps/rehearsal_r4b.log' --watch 'data/tmall*/**/*.h5' \
        -- python scripts/tmall_rehearsal.py
"""

import argparse
import glob
import os
import signal
import subprocess
import sys
import time


def _progress_stamp(patterns):
    """Newest mtime + total size over all files matching the globs —
    either moving means the child is alive and working."""
    newest, total = 0.0, 0
    for pat in patterns:
        for p in glob.glob(pat, recursive=True):
            try:
                st = os.stat(p)
            except OSError:
                continue
            newest = max(newest, st.st_mtime)
            total += st.st_size
    return newest, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall-secs", type=float, default=1500.0)
    ap.add_argument("--poll-secs", type=float, default=30.0)
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("--watch", action="append", required=True,
                    help="glob of progress artifacts (repeatable)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to supervise")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use -- cmd ...)")

    restarts = 0
    while True:
        # new process group so the kill takes helpers with it but
        # never anything outside this child
        child = subprocess.Popen(cmd, start_new_session=True)
        sys.stderr.write("[stall_guard] started pid %d (restart %d)\n"
                         % (child.pid, restarts))
        last_stamp = _progress_stamp(args.watch)
        last_move = time.time()
        while True:
            try:
                child.wait(timeout=args.poll_secs)
                break
            except subprocess.TimeoutExpired:
                pass
            stamp = _progress_stamp(args.watch)
            now = time.time()
            if stamp != last_stamp:
                last_stamp, last_move = stamp, now
            elif now - last_move > args.stall_secs:
                sys.stderr.write(
                    "[stall_guard] no artifact progress for %.0fs — "
                    "killing pid %d\n" % (now - last_move, child.pid))
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                child.wait()
                break
        if child.returncode == 0:
            sys.stderr.write("[stall_guard] child finished ok\n")
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            sys.stderr.write("[stall_guard] giving up after %d restarts\n"
                             % args.max_restarts)
            return child.returncode or 1
        time.sleep(5.0)


if __name__ == "__main__":
    sys.exit(main())
