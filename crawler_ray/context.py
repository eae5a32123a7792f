"""DataContext tuning profiles.

Centralizes the execution knobs the Ray guide calls out, so pipelines
pick a profile instead of scattering magic numbers:

- ``configure_default``: quiet logs/progress; defaults otherwise.
- ``configure_for_wide_rows``: large interleaved/media rows — bigger
  target block size so span/binary columns aren't split into absurdly
  small blocks, smaller recommended batch sizes at call sites.
"""

from __future__ import annotations

from ray.data import DataContext

MIB = 1024 * 1024


def configure_default(quiet: bool = True) -> DataContext:
    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    return ctx


def configure_for_wide_rows(target_block_mib: int = 256, quiet: bool = True) -> DataContext:
    """For datasets whose rows carry large span lists or binary media
    payloads: raise the block-size target (fewer, fatter blocks) and let
    the object store spill rather than fragmenting."""
    ctx = configure_default(quiet)
    ctx.target_max_block_size = target_block_mib * MIB
    return ctx
