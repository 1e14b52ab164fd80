"""MemFlow checkpoint name table.

MemFlow (arXiv:2404.04808; loaded by the reference via cfg.restore_ckpt,
memflow_loader.py:53 / memflow_inference_isolated.py) shares VideoFlow's
component stack — twins_svt_large fnet/cnet, GMA att, SKFlow update
block — so the dotted->slashed rewrite is the VideoFlow one
(convert.videoflow_name_map's `_rewrite_videoflow_key`).

The memory-specific modules (context-key / motion-value projections and
the readout) are named by their role (qk_proj / v_proj /
memory_reader.out_proj).  The table is proven end-to-end against the
torch mirror (tests/mirrors/memflow_torch.py — conversion-total +
forward parity, tests/test_memflow_parity.py), the same method that
validated the VideoFlow table.  Upstream's exact attribute names for the
memory modules cannot be read from this snapshot (the MemFlow submodule
is empty); if a live checkpoint differs, the strict match-rate gate in
load_torch_checkpoint_as_params fails loudly and `describe_state_dict` +
`suggest_mapping` finalize the rename in one rewrite rule.
"""

from __future__ import annotations

from typing import Tuple

from .convert import _rewrite_videoflow_key, default_name_map

MEMFLOW_IGNORE = (
    r"^(fnet|cnet)\.svt\.(blocks|patch_embeds|pos_block|pos_drops)\.[23]\.",
    r"^(fnet|cnet)\.svt\.(head|norm)\.",
    r"^att\.pos_emb\.",
    r"\.num_batches_tracked$",
    r"^update_block\.aggregator\.pos_emb\.",
)


def memflow_name_map(torch_key: str) -> Tuple[str, str]:
    k = _rewrite_videoflow_key(torch_key)
    return default_name_map(k)
