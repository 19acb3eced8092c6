"""Shared 2-process launcher for the multi-host tests.

Two jobs beyond a bare Popen pair:

 - DIAGNOSABILITY: on failure, the assertion message carries the tail of
   EVERY worker's output, not just the first non-zero one.  When a peer
   dies, the survivor fails with a Gloo "Connection closed by peer"
   JaxRuntimeError — rank 0's traceback alone cannot say WHY rank 1 died
   (observed in a full-suite run on this box, 2026-08-19).

 - FLAKE CONTAINMENT: gloo-over-TCP on a loopback 1-core host can tear a
   connection down under scheduler pressure with no bug anywhere.  The
   launch retries ONCE, and only when every failing worker's output is a
   pure transport error (Gloo / connection-closed / DEADLINE_EXCEEDED from
   the coordination service).  A worker that shows its own Python
   traceback for any other reason fails immediately — a real bug must
   never ride the retry.
"""

import json
import os
import re
import socket
import subprocess
import sys

_TRANSPORT_PAT = re.compile(
    r"Gloo\w* \w+ failed|Connection closed by peer|Connection reset by peer"
    r"|DEADLINE_EXCEEDED|coordination service.*unavailable", re.I)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def _is_transport_flake(out: str) -> bool:
    """True iff the failure signature is transport-only: the Gloo/TCP
    pattern appears AND no Python exception other than the wrapping
    JaxRuntimeError does."""
    if not _TRANSPORT_PAT.search(out):
        return False
    # match message-less final traceback lines too (bare "AssertionError",
    # "KeyboardInterrupt") — a real failure must never ride the retry
    tb_errors = re.findall(
        r"^(\w+(?:\.\w+)*(?:Error|Exception|Interrupt|Exit))(?::|\s*$)",
        out, re.M)
    return all("JaxRuntimeError" in e or "XlaRuntimeError" in e
               for e in tb_errors)


def launch_pair(worker: str, cfg: str, result_paths, repo: str,
                timeout: int = 1500, attempts: int = 2):
    """Run the 2-process worker pair to completion; return the parsed
    result JSONs. Retries (attempts-1) times on pure transport flakes."""
    last_report = None
    for attempt in range(attempts):
        port = free_port()
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs = [subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), cfg,
             result_paths[pid]],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            return [json.load(open(r)) for r in result_paths]
        failing = [(pid, out) for pid, (p, out) in
                   enumerate(zip(procs, outs)) if p.returncode != 0]
        last_report = "\n".join(
            f"--- worker {pid} (rc={procs[pid].returncode}) ---\n"
            f"{out[-4000:]}" for pid, out in failing)
        if attempt + 1 < attempts and all(_is_transport_flake(out)
                                          for _, out in failing):
            print(f"mh_launch: transport flake on attempt {attempt}; "
                  f"retrying\n{last_report}", file=sys.stderr)
            continue
        break
    raise AssertionError(f"worker(s) failed:\n{last_report}")
