"""Capture a jax.profiler trace of one flagship frame (TensorBoard/XProf
viewable) — the round-2+ starting point for kernel-level optimization.

Usage: python scripts/trace_frame.py [outdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from havatar_tpu.utils.profiling import trace


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/havatar_trace"
    from __graft_entry__ import _build_flagship

    forward, args = _build_flagship()
    fn = jax.jit(forward)
    out = fn(*args)               # compile outside the trace
    jax.block_until_ready(out)

    with trace(outdir):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"trace written to {outdir} (open with TensorBoard)")


if __name__ == "__main__":
    main()
