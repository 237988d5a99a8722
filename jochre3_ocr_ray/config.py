"""Ray Data context configuration (one place for execution knobs)."""

from __future__ import annotations

import os


def configure_context() -> None:
    """Apply this engine's recommended DataContext settings. Safe to
    call multiple times; callers that own a Ray session (bench, CLI,
    tests) invoke it right after ``ray.init``."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # rows are independent until the conv_id grouping; never pay for
    # output-order preservation
    ctx.execution_options.preserve_order = False
    block_mb = int(os.environ.get("GRAFT_TARGET_BLOCK_MB", "128"))
    ctx.target_max_block_size = block_mb * 1024 * 1024
    # input bundling threshold: the default 1 MiB coalesces small
    # blocks into one task, which serializes COMPUTE-BOUND per-row
    # UDFs (extraction ~0.4 ms/row: a 1 MiB bundle is ~30 s of work).
    # Our stages' cost tracks rows, not bytes — keep the floor low so
    # override_num_blocks actually yields that many tasks. At real
    # scale blocks are >= target_max_block_size and this knob is moot.
    min_kb = int(os.environ.get("GRAFT_TARGET_MIN_BLOCK_KB", "64"))
    ctx.target_min_block_size = min_kb * 1024
