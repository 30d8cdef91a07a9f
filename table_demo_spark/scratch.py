"""Scratch-space placement for streaming checkpoints and sink state.

Structured Streaming's per-batch constant is dominated by many small
file operations: offset WAL commits, state-store delta files, and the
foreachBatch parquet sinks. On this box /tmp is disk-backed while
/dev/shm is a tmpfs, so placing per-run scratch directories there cuts
the fixed IO cost of every micro-batch (measured in BASELINE.md's
round-3 streaming A/B). On a real cluster the checkpoint location must
be durable shared storage instead — callers that need durability
across machine loss pass an explicit path; these helpers are for
per-run scratch whose lifetime is the query run.
"""

from __future__ import annotations

import os
import tempfile

_SHM = "/dev/shm"


def scratch_root() -> str | None:
    """The fast scratch root (tmpfs) if present and writable."""
    return _SHM if os.path.isdir(_SHM) and os.access(_SHM, os.W_OK) else None


def scratch_dir(prefix: str) -> str:
    """mkdtemp on tmpfs when available, else the default temp dir."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
